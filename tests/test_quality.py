"""Semantic properties of the corpus-quality operators (quality.py,
ranking.py, sampling additions) on hand-built corpora — the oracle SQL
proves engine agreement; these prove the *semantics* are the intended
ones (known repetition fractions, cross-doc removal, BM25 ordering)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, rows):
    """rows: list of (doc_id, text, lang, source). Writes documents.parquet
    into tmp_path so the (spark, sf_dir) query signature works as-is."""
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for (i, t, lang, src) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_repetition_stats_known_fractions(spark, tmp_path):
    from gravity_books_datalakehouse_spark.operators.quality import (
        text_repetition_stats,
    )

    # doc 1: "a b" * 4 -> bigrams: ab,ba,ab,ba,ab,ba,ab (7 total, 2 distinct)
    # doc 2: 40 all-distinct tokens -> zero duplicate n-grams, and long
    # enough that the top bigram's mass (1/39) clears the corpus-tuned
    # TOP_2GRAM_MAX threshold
    sf = _write_docs(spark, tmp_path, [
        (1, "a b a b a b a b", "en", "s1"),
        (2, " ".join(f"t{i}" for i in range(40)), "en", "s1"),
    ])
    rows = {r.doc_id: r for r in text_repetition_stats(spark, sf).collect()}
    r1, r2 = rows[1], rows[2]
    assert r1.n_tokens == 8 and r2.n_tokens == 40
    assert r1.dup_2gram_frac == pytest.approx((7 - 2) / 7, abs=1e-6)
    assert r1.dup_5gram_frac == pytest.approx((4 - 2) / 4, abs=1e-6)
    assert r1.top_2gram_frac == pytest.approx(4 / 7, abs=1e-6)
    assert not r1.gopher_keep
    assert r2.dup_2gram_frac == 0.0 and r2.dup_5gram_frac == 0.0
    assert r2.top_2gram_frac == pytest.approx(1 / 39, abs=1e-6)
    assert r2.gopher_keep


def test_segment_dedup_removes_cross_doc_only(spark, tmp_path):
    from gravity_books_datalakehouse_spark.operators.quality import (
        SEG_TOKENS,
        text_segment_dedup,
    )

    shared = " ".join(["dup"] * SEG_TOKENS)          # one full shared segment
    uniq_a = " ".join(f"a{i}" for i in range(SEG_TOKENS))
    uniq_b = " ".join(f"b{i}" for i in range(SEG_TOKENS))
    sf = _write_docs(spark, tmp_path, [
        (1, f"{shared} {uniq_a}", "en", "s1"),
        (2, f"{shared} {uniq_b}", "en", "s1"),
        (3, uniq_a.replace("a", "c"), "en", "s1"),   # fully unique doc
    ])
    out = {r.doc_id: r for r in text_segment_dedup(spark, sf).collect()}
    assert out[1].n_segs == 2 and out[1].n_removed == 1
    assert out[2].n_segs == 2 and out[2].n_removed == 1
    assert out[3].n_segs == 1 and out[3].n_removed == 0
    # reassembled text of doc 1 is exactly its unique segment
    import hashlib
    assert out[1].clean_fp == hashlib.md5(uniq_a.encode()).hexdigest()
    # doc 3 untouched: fingerprint of the original text
    assert out[3].clean_fp == hashlib.md5(
        uniq_a.replace("a", "c").encode()
    ).hexdigest()


def test_segment_dedup_partition_invariant(spark, tmp_path):
    """Same clean fingerprints regardless of input partitioning — the
    layout-invariance every content-hash operator must keep."""
    from gravity_books_datalakehouse_spark.operators.quality import (
        text_segment_dedup,
    )

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(25)), "en", "s1")
        for i in range(40)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    base = {
        (r.doc_id, r.n_removed, r.clean_fp)
        for r in text_segment_dedup(spark, sf).collect()
    }
    # re-write the same table shuffled into many partitions
    df = spark.read.parquet(f"{sf}/documents.parquet").repartition(7)
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    again = {
        (r.doc_id, r.n_removed, r.clean_fp)
        for r in text_segment_dedup(spark, sf).collect()
    }
    assert base == again


def test_bm25_orders_by_relevance(spark, tmp_path):
    from gravity_books_datalakehouse_spark.operators.ranking import (
        text_bm25_topk,
    )

    filler = " ".join(f"x{i}" for i in range(20))
    sf = _write_docs(spark, tmp_path, [
        (1, f"join join join stream window {filler}", "en", "s1"),
        (2, f"join stream {filler}", "en", "s1"),
        (3, f"join {filler}", "en", "s1"),
        (4, filler, "en", "s1"),
    ])
    got = text_bm25_topk(spark, sf).collect()
    ids = [r.doc_id for r in got]
    # doc 4 has no query terms: absent. More matched terms/occurrences,
    # same length -> higher score.
    assert 4 not in ids
    assert ids[0] == 1 and set(ids) == {1, 2, 3}
    scores = [r.bm25 for r in got]
    assert scores == sorted(scores, reverse=True)


def test_temperature_mix_rates(spark, tmp_path):
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        op_sample_temperature_mix,
    )

    rows = [(i, f"tok{i} text body", "en", "big" if i < 160 else "small")
            for i in range(170)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in op_sample_temperature_mix(spark, sf).collect()}
    # smallest source keeps rate 1.0 -> everything kept
    assert out["small"].rate == pytest.approx(1.0)
    assert out["small"].n_kept == out["small"].n_raw == 10
    # alpha=0.5: big rate = sqrt(10/160) = 0.25
    assert out["big"].rate == pytest.approx(0.25, abs=1e-6)
    assert out["big"].n_kept < out["big"].n_raw


def test_cap_per_source(spark, tmp_path):
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        _CAP,
        op_cap_per_source,
    )

    rows = [(i, f"doc {i} body", "en", "huge" if i < 100 else "tiny")
            for i in range(104)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in op_cap_per_source(spark, sf).collect()}
    assert out["huge"].n_capped == _CAP
    assert out["tiny"].n_capped == 4


def test_zipf_ols_first_principles(spark, duck):
    """OLS sufficient statistics vs a plain-python regression over the
    same deterministically selected (rank, freq) points, plus the
    oracle hash gate."""
    import math
    import re
    from collections import Counter

    import duckdb as _duckdb

    from gravity_books_datalakehouse_spark.operators.lm import (
        _ZIPF_TOP,
        text_zipf_ols,
    )
    from gravity_books_datalakehouse_spark.plans.operator_queries import (
        oracle_sql,
    )
    from tests.conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(
        text_zipf_ols(spark, SF_CORRECT), duck, oracle_sql()["text_zipf_ols"]
    )

    con = _duckdb.connect()
    docs = con.execute(
        f"SELECT lang, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    freq: dict[str, Counter] = {}
    for lang, text in docs:
        freq.setdefault(lang, Counter()).update(
            re.split(r"\s+", text.strip().lower())
        )
    got = {r.lang: r for r in text_zipf_ols(spark, SF_SMOKE).collect()}
    assert set(got) == set(freq)
    for lang, cnt in freq.items():
        pts = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOP]
        xs = [math.log(i + 1) for i in range(len(pts))]
        ys = [math.log(f) for _, f in pts]
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        r = got[lang]
        assert r.n_terms == n
        assert abs(r.zipf_slope - round(slope, 4)) <= 1e-4
        assert abs(r.intercept - round((sy - slope * sx) / n, 4)) <= 1e-4
        assert abs(r.r2 - round(r2, 4)) <= 1e-4
        assert r.zipf_slope < 0  # frequency decreases in rank


# --------------------------------------------------------------------------
# Cross-document n-gram novelty (text_ngram_novelty)


def test_ngram_novelty_constructed_semantics(spark, tmp_path):
    """A verbatim duplicate pair flags as memorization risk (novelty 0);
    a unique doc scores novelty 1; a doc under 5 tokens drops out."""
    import __spark_entry__ as m

    rows = [
        (1, "src_a", "alpha beta gamma delta epsilon zeta eta"),
        (2, "src_a", "alpha beta gamma delta epsilon zeta eta"),  # verbatim dup
        (3, "src_b", "one two three four five six seven eight"),  # unique
        (4, "src_b", "too short"),                                # no 5-gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df = df.withColumn("n_chars", F.length("text")).withColumn(
        "lang", F.lit("en")
    )
    d = str(tmp_path / "novelty")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = {
        r.source: (r.n_docs, r.mean_novelty, r.n_memorization_risk)
        for r in m.queries()["text_ngram_novelty"](spark, d).collect()
    }
    # src_a: both docs fully shared -> novelty 0, both risky
    assert out["src_a"] == (2, 0.0, 2)
    # src_b: only doc 3 has 5-grams; fully novel, not risky
    assert out["src_b"] == (1, 1.0, 0)


def test_vocab_oov_rate_boundary_tie(spark, tmp_path, monkeypatch):
    """The top-V cut breaks count ties token-ASC: with V=2 and three
    tokens at equal frequency, 'aa'/'bb' enter the vocab and 'cc' is
    OOV everywhere it occurs."""
    from gravity_books_datalakehouse_spark.operators import text as text_ops
    import __spark_entry__ as m

    monkeypatch.setattr(text_ops, "OOV_VOCAB_SIZE", 2)
    rows = [
        (1, "s1", "aa bb cc"),
        (2, "s2", "aa bb cc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df = df.withColumn("n_chars", F.length("text")).withColumn("lang", F.lit("en"))
    d = str(tmp_path / "oov")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = {
        r.source: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in text_ops.text_vocab_oov_rate(spark, d).collect()
    }
    assert out == {
        "s1": (3, 1, round(1 / 3, 6)),
        "s2": (3, 1, round(1 / 3, 6)),
    }


def test_length_bucket_padding_beats_global(spark):
    """Bucketed padded capacity must be <= global-max padding, strictly
    less when lengths vary; real-token totals must be conserved."""
    import __spark_entry__ as m
    from tests.conftest import SF_CORRECT

    rows = m.queries()["text_length_bucket_padding"](spark, SF_CORRECT).collect()
    assert len(rows) > 1, "corpus should span multiple length buckets"
    n_docs = sum(r.n_docs for r in rows)
    n_tokens = sum(r.n_tokens for r in rows)
    padded = sum(r.padded_tokens for r in rows)
    global_padded = n_docs * max(r.bucket_max for r in rows)
    assert n_tokens <= padded < global_padded
    # per-bucket waste is bounded by the bucket width
    for r in rows:
        assert 0.0 <= r.waste_frac < 32.0 / r.bucket_max + 1e-9


def test_token_budget_mix_invariants(spark):
    """Knapsack invariants: total allocation == budget (= total div 2),
    allocation is monotone in the greedy quality order (full, then one
    partial, then zeros), and no source exceeds its own tokens."""
    import __spark_entry__ as m
    from tests.conftest import SF_CORRECT

    rows = m.queries()["pipeline_token_budget_mix"](spark, SF_CORRECT).collect()
    total = sum(r.n_tokens for r in rows)
    budget = total // 2
    assert sum(r.allocated_tokens for r in rows) == budget
    for r in rows:
        assert 0 <= r.allocated_tokens <= r.n_tokens
    # in greedy order: fulls, at most one partial, then zeros
    # round(), not int(): 0.37*1e6 can float to 369999.99..., and the
    # reconstruction must match the operator's integer div key
    order = sorted(
        rows,
        key=lambda r: (-round(r.quality_frac * 10**6), r.source),
    )
    state = "full"
    for r in order:
        if state == "full" and r.allocated_tokens == r.n_tokens:
            continue
        if state == "full" and 0 < r.allocated_tokens < r.n_tokens:
            state = "zero"
            continue
        assert r.allocated_tokens == 0
        state = "zero"


def test_compression_ratio_exact_zlib_replay(spark):
    """zlib at a fixed level is deterministic: replay every doc's ratio
    in python and demand the identical per-source report."""
    import zlib
    from collections import defaultdict

    import duckdb as _duckdb

    import __spark_entry__ as m
    from gravity_books_datalakehouse_spark.operators.quality import (
        _RATIO_HIGH,
        _RATIO_LOW,
        _ZLIB_LEVEL,
    )
    from tests.conftest import SF_CORRECT

    con = _duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM read_parquet('{SF_CORRECT}/documents.parquet')"
    ).fetchall()
    con.close()
    per = defaultdict(list)
    for src, text in docs:
        raw = text.encode("utf-8")
        per[src].append(len(zlib.compress(raw, _ZLIB_LEVEL)) / len(raw) if raw else 1.0)
    want = {
        src: (
            len(rs),
            round(sum(rs) / len(rs), 6),
            sum(1 for r in rs if r < _RATIO_LOW),
            sum(1 for r in rs if r > _RATIO_HIGH),
        )
        for src, rs in per.items()
    }
    got = {
        r.source: (r.n_docs, r.mean_ratio, r.n_boilerplate, r.n_noise)
        for r in m.queries()["text_compression_ratio"](spark, SF_CORRECT).collect()
    }
    # mean: python sums in list order, Spark in partition order -> 1e-12
    for src in want:
        assert got[src][0] == want[src][0]
        assert abs(got[src][1] - want[src][1]) <= 1e-6
        assert got[src][2:] == want[src][2:]


def test_compression_ratio_is_arrow_batched(spark):
    """The UDF must plan as ArrowEvalPython (vectorized), never
    BatchEvalPython (row-at-a-time pickling)."""
    import __spark_entry__ as m
    from tests.conftest import SF_SMOKE

    plan = (
        m.queries()["text_compression_ratio"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_compression_ratio_null_text_propagates(spark):
    """A NULL text row must yield a NULL ratio (engine-style null
    propagation), not an AttributeError inside the Arrow batch
    (ADVICE r8)."""
    from gravity_books_datalakehouse_spark.operators.quality import (
        compression_ratio_col,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", "hello hello hello"), ("b", None), ("c", "")],
        ["k", "text"],
    )
    rows = {
        r.k: r.ratio
        for r in df.select(
            "k", compression_ratio_col()(F.col("text")).alias("ratio")
        ).collect()
    }
    assert rows["b"] is None
    assert rows["c"] == 1.0
    assert 0.0 < rows["a"] <= 2.0
