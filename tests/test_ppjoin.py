"""Prefix-filtered set-similarity join (dedup_prefix_cosine_pairs).

The contract under test is EXACTNESS: unlike the LSH legs, the PPJoin
form must return every pair with set-cosine >= t and nothing below —
the prefix filter is a lossless pruning, not an approximation. So the
hard test here is a from-first-principles all-pairs recomputation in
plain Python, not just the DuckDB oracle (which shares the CTE shape).
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.dedup import (
    _PPJOIN_DEN2,
    _PPJOIN_NUM2,
    _PPJOIN_SQL,
    _cached_bigrams,
    dedup_prefix_cosine_pairs,
)

from tests.conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


def _bigram_sets(sf_dir: str) -> dict[int, frozenset[str]]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    out: dict[int, frozenset[str]] = {}
    for doc_id, text in rows:
        toks = re.split(r"\s+", text.strip().lower())
        grams = frozenset(
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        )
        if grams:
            out[doc_id] = grams
    return out


def _brute_force_pairs(sets: dict[int, frozenset[str]]) -> set[tuple]:
    """All-pairs exact set cosine >= t, integer acceptance rule as in
    the operator: t^2 = NUM2/DEN2, accept iff DEN2*o^2 >= NUM2*la*lb."""
    ids = sorted(sets)
    found = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            o = len(sets[a] & sets[b])
            la, lb = len(sets[a]), len(sets[b])
            if _PPJOIN_DEN2 * o * o >= _PPJOIN_NUM2 * la * lb:
                found.add((a, b, la, lb, o))
    return found


def test_ppjoin_matches_oracle(spark, duck):
    assert_matches_oracle(
        dedup_prefix_cosine_pairs(spark, SF_CORRECT), duck, _PPJOIN_SQL
    )


def test_ppjoin_exact_vs_brute_force(spark):
    """No false negatives from the prefix filter, no false positives
    from the verify stage — the result IS the all-pairs answer."""
    sets = _bigram_sets(SF_SMOKE)
    want = _brute_force_pairs(sets)
    got_rows = dedup_prefix_cosine_pairs(spark, SF_SMOKE).collect()
    got = {
        (r.doc_a, r.doc_b, r.size_a, r.size_b, r.n_common) for r in got_rows
    }
    assert got == want
    assert len(want) > 0, "smoke corpus should contain planted near-dups"
    # reported cosine agrees with the definition
    for r in got_rows:
        assert r.cos_sim == pytest.approx(
            r.n_common / math.sqrt(r.size_a * r.size_b), abs=1e-6
        )
        assert r.cos_sim >= math.sqrt(_PPJOIN_NUM2 / _PPJOIN_DEN2) - 1e-9


def test_ppjoin_prefix_actually_prunes(spark):
    """The prefix relation must be materially smaller than the full
    bigram relation (t=0.8 keeps ~36% of each set + 1), otherwise the
    candidate join degenerates toward all-pairs-on-shared-token."""
    bg = _cached_bigrams(spark, SF_CORRECT)
    n_all = bg.count()
    sz = bg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("l"))
    n_prefix = (
        sz.select(
            F.sum(
                F.col("l")
                - F.expr(
                    f"({_PPJOIN_NUM2} * l + {_PPJOIN_DEN2 - 1})"
                    f" div {_PPJOIN_DEN2}"
                )
                + 1
            ).alias("p")
        ).collect()[0]["p"]
    )
    assert n_prefix < 0.5 * n_all


def test_ppjoin_plan_has_no_cartesian(spark):
    plan = dedup_prefix_cosine_pairs(spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# --------------------------------------------------------------------------
# Greedy coverage selection (pipeline_greedy_coverage) — shares the
# shingle machinery under test in this module.


def test_greedy_coverage_matches_oracle(spark, duck):
    from gravity_books_datalakehouse_spark.operators.dedup import (
        _coverage_oracle_sql,
        pipeline_greedy_coverage,
    )

    assert_matches_oracle(
        pipeline_greedy_coverage(spark, SF_CORRECT),
        duck,
        _coverage_oracle_sql(),
    )


def test_greedy_coverage_python_replay(spark):
    """Replay the greedy argmax in pure python over 3-shingle sets and
    demand the identical selection, gains, and running coverage; pin
    the submodular diminishing-returns invariant (non-increasing
    gains)."""
    import re as _re

    import duckdb as _duckdb

    from gravity_books_datalakehouse_spark.operators.dedup import (
        _COVERAGE_K,
        pipeline_greedy_coverage,
    )

    con = _duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    sets = {}
    for doc_id, text in docs:
        toks = _re.split(r"\s+", text.strip().lower())
        s = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        if s:
            sets[doc_id] = s
    covered: set[str] = set()
    chosen: set[int] = set()
    want = []
    for step in range(1, _COVERAGE_K + 1):
        best = max(
            ((len(s - covered), -d) for d, s in sets.items() if d not in chosen
             and len(s - covered) > 0),
            default=None,
        )
        assert best is not None
        gain, neg_d = best
        d = -neg_d
        covered |= sets[d]
        chosen.add(d)
        want.append((step, d, gain, len(covered)))
    got = [
        (r.step, r.doc_id, r.new_shingles, r.covered_total)
        for r in pipeline_greedy_coverage(spark, SF_SMOKE).collect()
    ]
    assert got == want
    gains = [g for _, _, g, _ in got]
    assert gains == sorted(gains, reverse=True)  # diminishing returns


def test_greedy_coverage_antijoin_escape_hatch(spark, monkeypatch):
    """Force the large-covered-set path (broadcast anti-join instead of
    the InSet literal) and demand the identical selection — the two
    not-covered filters must be semantically interchangeable."""
    from gravity_books_datalakehouse_spark.operators import dedup

    baseline = [
        (r.step, r.doc_id, r.new_shingles, r.covered_total)
        for r in dedup.pipeline_greedy_coverage(spark, SF_SMOKE).collect()
    ]
    monkeypatch.setattr(dedup, "_COVERED_LITERAL_MAX", 0)
    via_join = [
        (r.step, r.doc_id, r.new_shingles, r.covered_total)
        for r in dedup.pipeline_greedy_coverage(spark, SF_SMOKE).collect()
    ]
    assert via_join == baseline


# --------------------------------------------------------------------------
# Sorted Neighborhood Method (dedup_sorted_neighborhood)


def test_snm_matches_oracle(spark, duck):
    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    assert_matches_oracle(
        qs["dedup_sorted_neighborhood"](spark, SF_CORRECT),
        duck,
        osql["dedup_sorted_neighborhood"],
    )


def test_snm_window_semantics(spark, tmp_path):
    """Adjacent-in-sort near-dups pair up; records more than W-1 ranks
    apart never compare even with identical keys' prefixes; candidate
    degree is bounded by W-1 regardless of key skew."""
    from gravity_books_datalakehouse_spark.operators.dedup import (
        _SNM_WINDOW,
        dedup_sorted_neighborhood,
    )

    # 20 docs sharing the bucket prefix 'aa', keys ascending; doc 0 and
    # doc 1 are near-identical (lev 1), doc 0 vs doc 19 identical heads
    # would match on lev but sit 19 ranks apart -> outside the window.
    rows = [(0, "s", "aardvark unique text zero")]
    rows += [(1, "s", "aardvark unique text zeroo")]
    rows += [
        (i, "s", f"aa{chr(ord('b') + i)} filler document {i}")
        for i in range(2, 19)
    ]
    rows += [(19, "s", "aardvark unique text zero")]  # dup of 0, far in id
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df = df.withColumn("n_chars", F.length("text")).withColumn("lang", F.lit("en"))
    d = str(tmp_path / "snm")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup_sorted_neighborhood(spark, d).collect()
    }
    # the three aardvark docs sort adjacently: all three pairs found
    assert {(0, 1), (0, 19), (1, 19)} <= pairs
    # degree bound: no record participates in more than W-1 pairs
    from collections import Counter

    deg = Counter()
    for x, y in pairs:
        deg[x] += 1
        deg[y] += 1
    assert max(deg.values()) <= 2 * (_SNM_WINDOW - 1)


def test_blocking_quality_metrics_sane(spark):
    """Both methods: candidates <= all pairs, found <= min(true,
    candidates), ratios in [0,1]; ground truth is non-empty on the
    planted-dup corpus."""
    import __spark_entry__ as m

    rows = m.queries()["dedup_blocking_quality"](spark, SF_CORRECT).collect()
    assert {r.method for r in rows} == {
        "prefix_block",
        "sorted_neighborhood",
        "snm_multipass",
    }
    for r in rows:
        assert r.n_true_pairs > 0
        assert 0 <= r.n_true_found <= min(r.n_true_pairs, r.n_candidates)
        assert 0.0 <= r.reduction_ratio <= 1.0
        assert 0.0 <= r.pairs_completeness <= 1.0
    by = {r.method: r for r in rows}
    # the multipass geometry is a superset of pass 1: candidates and
    # found-true counts can only grow, completeness can only rise —
    # this row-pair IS the measured recall lift of the rotated pass
    assert (
        by["snm_multipass"].n_candidates
        >= by["sorted_neighborhood"].n_candidates
    )
    assert (
        by["snm_multipass"].n_true_found
        >= by["sorted_neighborhood"].n_true_found
    )
    assert (
        by["snm_multipass"].pairs_completeness
        >= by["sorted_neighborhood"].pairs_completeness
    )


# --------------------------------------------------------------------------
# Exact containment join (dedup_containment_pairs)


def test_containment_exact_vs_brute_force(spark):
    """Directed containment: no false negatives from the asymmetric
    prefix filter, none from the size prune; acceptance is the integer
    rule 10*o >= 9*la."""
    from gravity_books_datalakehouse_spark.operators.dedup import (
        _CONTAIN_DEN,
        _CONTAIN_NUM,
        dedup_containment_pairs,
    )

    sets = _bigram_sets(SF_SMOKE)
    want = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            o = len(sa & sb)
            if _CONTAIN_DEN * o >= _CONTAIN_NUM * len(sa):
                want.add((a, b, len(sa), len(sb), o))
    got = {
        (r.doc_a, r.doc_b, r.size_a, r.size_b, r.n_common)
        for r in dedup_containment_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert want, "smoke corpus should contain near-subset pairs"


def test_source_overlap_matrix_python_replay(spark):
    """Recompute two arbitrary cells from raw text and check the full
    triangle's structural invariants."""
    import re as _re

    import duckdb as _duckdb

    import __spark_entry__ as m

    rows = m.queries()["dedup_source_overlap_matrix"](spark, SF_SMOKE).collect()
    n_sources = len({r.source_a for r in rows} | {r.source_b for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2
    con = _duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    vocab = {}
    for _, src, text in docs:
        toks = _re.split(r"\s+", text.strip().lower())
        vocab.setdefault(src, set()).update(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    for r in rows[:2] + rows[-2:]:
        sa, sb = vocab[r.source_a], vocab[r.source_b]
        assert (r.n_shingles_a, r.n_shingles_b) == (len(sa), len(sb))
        assert r.n_shared == len(sa & sb)
        assert r.jaccard == round(len(sa & sb) / len(sa | sb), 6)


def test_multiplicity_histogram_constructed(spark, tmp_path):
    """3 copies of one doc + a pair + two uniques -> histogram rows for
    multiplicities 1, 2, 3 with exact removable counts; whitespace-
    normalized match groups '  hello   world ' with 'hello world'."""
    from gravity_books_datalakehouse_spark.operators.dedup import (
        dedup_multiplicity_histogram,
    )

    rows = [
        (1, "s", "same text three times"),
        (2, "s", "same text three times"),
        (3, "s", "  same   text three  times "),
        (4, "s", "a pair here"),
        (5, "s", "a pair here"),
        (6, "s", "unique one"),
        (7, "s", "unique two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df = df.withColumn("n_chars", F.length("text")).withColumn("lang", F.lit("en"))
    d = str(tmp_path / "mult")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = {
        r.n_copies: (r.n_groups, r.n_docs, r.n_removable)
        for r in dedup_multiplicity_histogram(spark, d).collect()
    }
    assert got == {1: (2, 2, 0), 2: (1, 2, 1), 3: (1, 3, 2)}


def test_snm_banded_pairs_equal_bruteforce_window(spark):
    """The rank-block banded join must produce EXACTLY the within-W
    rank-window pairs — on adversarial bucket sizes (empty, 1, W-1, W,
    W+1, 3W+2) so block boundaries, the 2x fan-out, and the residual
    range are all exercised. A banding bug (wrong block width, missed
    next-block probe) silently loses pairs; this pins the geometry."""
    from pyspark.sql import Window, functions as F

    from gravity_books_datalakehouse_spark.operators.dedup import (
        _SNM_WINDOW,
        _snm_window_pairs,
    )

    rows = []
    did = 0
    for bkt, n in [("aa", 0), ("bb", 1), ("cc", _SNM_WINDOW - 1),
                   ("dd", _SNM_WINDOW), ("ee", _SNM_WINDOW + 1),
                   ("ff", 3 * _SNM_WINDOW + 2)]:
        for rn in range(1, n + 1):
            rows.append((did, bkt, rn))
            did += 1
    r = spark.createDataFrame(rows, "doc_id long, bkt string, rn int")
    got = {
        (x.doc_a, x.doc_b) for x in _snm_window_pairs(r).collect()
    }
    a = r.selectExpr("doc_id id_a", "bkt b_a", "rn r_a")
    b = r.selectExpr("doc_id id_b", "bkt b_b", "rn r_b")
    want = {
        (min(x.id_a, x.id_b), max(x.id_a, x.id_b))
        for x in a.join(
            b,
            (F.col("b_a") == F.col("b_b"))
            & (F.col("r_b") > F.col("r_a"))
            & (F.col("r_b") < F.col("r_a") + _SNM_WINDOW),
        ).collect()
    }
    assert got == want and len(want) > 0
