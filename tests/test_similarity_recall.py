"""ANN quality: multi-probe LSH recall must beat single-probe recall,
measured against brute-force ground truth."""

from __future__ import annotations

import importlib

from tests.conftest import SF_SMOKE

entry_mod = importlib.import_module("__spark_entry__")


def _topk_pairs(spark, name):
    df = entry_mod.queries()[name](spark, SF_SMOKE)
    return {(r.qid, r.nid) for r in df.collect() if r.qid < 50 and r.rank <= 3}


def test_multiprobe_recall_beats_single_probe(spark):
    # ground truth: brute force computes exact top-5; take its top-3 pairs
    truth = {
        (r.qid, r.nid)
        for r in entry_mod.queries()["sim_topk_cosine_bruteforce"](
            spark, SF_SMOKE
        ).collect()
        if r.rank <= 3
    }
    single = _topk_pairs(spark, "sim_lsh_bucketed_topk")
    multi = _topk_pairs(spark, "sim_lsh_multiprobe_topk")
    # brute force covers qid<10 only; restrict comparison to those queries
    truth_q = {q for q, _ in truth}
    single = {(q, n) for q, n in single if q in truth_q}
    multi = {(q, n) for q, n in multi if q in truth_q}
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    assert recall_multi >= recall_single
    assert recall_multi > 0


def test_ivf_recall_against_bruteforce(spark):
    truth = {
        (r.qid, r.nid)
        for r in entry_mod.queries()["sim_topk_cosine_bruteforce"](
            spark, SF_SMOKE
        ).collect()
        if r.rank <= 3
    }
    truth_q = {q for q, _ in truth}
    ivf = {
        (r.qid, r.nid)
        for r in entry_mod.queries()["sim_ivf_topk"](spark, SF_SMOKE).collect()
        if r.qid in truth_q
    }
    # measured 0.967 at this SF with k=16/nprobe=2; 0.5 is the alarm line
    assert len(ivf & truth) / len(truth) >= 0.5


def test_quantized_cosine_tracks_full_precision(spark):
    """int8 quantization must preserve neighbor structure: quantized
    cosine within 0.02 of full-precision cosine for every reported pair
    (64-dim vectors; max quantization error per lane is 1/254)."""
    from gravity_books_datalakehouse_spark.operators.similarity import (
        cosine,
        sim_quantized_topk,
    )
    from gravity_books_datalakehouse_spark.sources.catalog import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    topq = sim_quantized_topk(spark, SF_SMOKE)
    e = load_table(spark, SF_SMOKE, "embeddings")
    a = e.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("vb"))
    joined = (
        topq.join(a, "qid").join(b, "nid")
        .select("qid", "nid", "cos_sim_q", cosine("va", "vb").alias("cos_full"))
    )
    rows = joined.collect()
    assert len(rows) == 50
    assert all(abs(r.cos_sim_q - r.cos_full) < 0.02 for r in rows)


def test_mmr_oracle(spark, duck):
    from gravity_books_datalakehouse_spark.operators.similarity import (
        _mmr_oracle_sql, sim_mmr_rerank,
    )
    from tests.conftest import SF_CORRECT, assert_matches_oracle

    assert_matches_oracle(sim_mmr_rerank(spark, SF_CORRECT), duck, _mmr_oracle_sql())


def test_mmr_contract(spark):
    """Structure: 5 ranks per query, no repeats, rank-1 == the cosine
    top-1 (step 1 of greedy MMR is pure relevance)."""
    from gravity_books_datalakehouse_spark.operators.similarity import (
        _MMR_K, sim_mmr_rerank, sim_topk_cosine_bruteforce,
    )
    from tests.conftest import SF_CORRECT

    rows = sim_mmr_rerank(spark, SF_CORRECT).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    top1 = {
        r["qid"]: r["nid"]
        for r in sim_topk_cosine_bruteforce(spark, SF_CORRECT).collect()
        if r["rank"] == 1
    }
    for qid, sel in by_q.items():
        assert sorted(r["rank"] for r in sel) == list(range(1, _MMR_K + 1))
        nids = [r["nid"] for r in sel]
        assert len(set(nids)) == _MMR_K
        assert next(r["nid"] for r in sel if r["rank"] == 1) == top1[qid]


def test_mmr_selection_is_more_diverse_than_topk(spark):
    """The point of MMR: across queries, the selected set's mean pairwise
    cosine must be lower than the plain cosine top-k's."""
    import numpy as np

    from gravity_books_datalakehouse_spark.operators.similarity import (
        sim_mmr_rerank, sim_topk_cosine_bruteforce,
    )
    from tests.conftest import SF_CORRECT

    emb = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(
            SF_CORRECT + "/embeddings.parquet"
        ).collect()
    }

    def mean_pairwise(sel_by_q):
        sims = []
        for nids in sel_by_q.values():
            for i in range(len(nids)):
                for j in range(i + 1, len(nids)):
                    a, b = emb[nids[i]], emb[nids[j]]
                    sims.append(
                        float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                    )
        return sum(sims) / len(sims)

    mmr, topk = {}, {}
    for r in sim_mmr_rerank(spark, SF_CORRECT).collect():
        mmr.setdefault(r["qid"], []).append(int(r["nid"]))
    for r in sim_topk_cosine_bruteforce(spark, SF_CORRECT).collect():
        topk.setdefault(r["qid"], []).append(int(r["nid"]))
    assert mean_pairwise(mmr) < mean_pairwise(topk)


def test_mmr_plan_stays_truncated(spark):
    """Regression guard: without the per-step localCheckpoint the greedy
    unroll re-expands the whole lineage every step (~5400 physical nodes
    by step 5). The checkpointed form stays ~160 lines."""
    from gravity_books_datalakehouse_spark.operators.similarity import (
        sim_mmr_rerank,
    )
    from tests.conftest import SF_SMOKE

    plan = (
        sim_mmr_rerank(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("\n") < 1000


def test_hard_negatives_oracle(spark, duck):
    from gravity_books_datalakehouse_spark.operators.similarity import (
        _HARDNEG_SQL,
        sim_hard_negatives,
    )
    from tests.conftest import SF_CORRECT, assert_matches_oracle

    assert_matches_oracle(
        sim_hard_negatives(spark, SF_CORRECT), duck, _HARDNEG_SQL
    )


def test_hard_negatives_first_principles(spark):
    """Numpy recomputation: per query, the top-5 other-label neighbors
    by cosine, the best same-label positive, margins, and the violation
    flag — all must match the operator exactly (selection and flags are
    discrete; scores to 6 dp)."""
    import numpy as np

    from gravity_books_datalakehouse_spark.operators.similarity import (
        _TOPK,
        _TOPK_QUERIES,
        sim_hard_negatives,
    )

    rows = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    vecs = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label) for r in rows}
    got = sim_hard_negatives(spark, SF_SMOKE).collect()

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(range(_TOPK_QUERIES))
    for qid, items in by_q.items():
        va, ql = vecs[qid]
        scored = [
            (cos(va, v), nid, lab)
            for nid, (v, lab) in vecs.items()
            if nid != qid
        ]
        pos_best = max(c for c, _, lab in scored if lab == ql)
        negs = sorted(
            ((c, nid, lab) for c, nid, lab in scored if lab != ql),
            key=lambda t: (-t[0], t[1]),
        )[:_TOPK]
        assert [r.rank for r in sorted(items, key=lambda r: r.rank)] == list(
            range(1, _TOPK + 1)
        )
        for r, (c, nid, lab) in zip(sorted(items, key=lambda r: r.rank), negs):
            assert (r.nid, r.n_label) == (nid, lab)
            assert abs(r.cos_neg - round(c, 6)) <= 1e-6
            assert abs(r.margin - round(pos_best - c, 6)) <= 1e-6
            assert r.is_violating == (c > pos_best)
            assert r.n_label != r.q_label
