"""Substring-span dedup (Lee et al. 2021 shape) + exact-k sampling."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_substring_spans_semantics(spark):
    """Every reported span: (a) is >= k tokens long, (b) its bounds are
    consistent, (c) the doc's tokens over the span really do appear in
    some OTHER document (the cross-doc duplication claim)."""
    from gravity_books_datalakehouse_spark.operators.dedup import (
        _SPAN_K,
        dedup_substring_spans,
    )
    from gravity_books_datalakehouse_spark.operators.text import tokens_col

    spans = dedup_substring_spans(spark, SF_SMOKE).collect()
    assert spans, "testdata is known to contain cross-doc duplicated spans"
    toks = {
        r.doc_id: r.toks
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", tokens_col().alias("toks"))
        .collect()
    }
    # index: first k-window of every doc span text -> owning docs
    for s in spans[:20]:  # bounded sample; each check is O(corpus)
        assert s.span_len == s.span_end - s.span_start + 1
        assert s.span_len >= _SPAN_K
        window = toks[s.doc_id][s.span_start : s.span_start + _SPAN_K]
        needle = " ".join(window)
        others = [
            d
            for d, ts in toks.items()
            if d != s.doc_id and needle in " ".join(ts)
        ]
        assert others, f"span of doc {s.doc_id} not found in any other doc"


def test_substring_spans_are_maximal_islands(spark):
    """No two spans of the same doc touch or overlap — the island merge
    must have coalesced them."""
    from gravity_books_datalakehouse_spark.operators.dedup import (
        dedup_substring_spans,
    )

    df = dedup_substring_spans(spark, SF_SMOKE)
    rows = df.orderBy("doc_id", "span_start").collect()
    prev = {}
    for r in rows:
        if r.doc_id in prev:
            # a gap of exactly 1 would have been merged (pos > end + 1 rule)
            assert r.span_start > prev[r.doc_id] + 1, r
        prev[r.doc_id] = r.span_end


def test_exact_k_sample_is_partitioning_invariant(spark):
    """The whole point vs df.sample(): identical row set no matter how
    the input is partitioned, and exactly k rows."""
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        _EXACT_K,
        op_sample_exact_k,
    )

    base = op_sample_exact_k(spark, SF_SMOKE)
    got = {r.doc_id for r in base.collect()}
    assert len(got) == _EXACT_K

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").repartition(17)
    h = F.md5(F.col("doc_id").cast("string"))
    re_got = {
        r.doc_id
        for r in docs.select("doc_id", h.alias("__h"))
        .orderBy("__h", "doc_id")
        .limit(_EXACT_K)
        .collect()
    }
    assert re_got == got


def test_substring_spans_property_planted_duplicates(spark):
    """Property: plant a shared >=k-token block inside two otherwise
    distinct documents at arbitrary offsets — the span pipeline must
    report a span in each doc covering exactly the planted block (the
    surrounding unique text must not join the span)."""
    from hypothesis import given, settings, strategies as st

    from gravity_books_datalakehouse_spark.operators.dedup import (
        _SPAN_K,
        substring_spans,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        block_len=st.integers(_SPAN_K, _SPAN_K + 4),
        off_a=st.integers(0, 6),
        off_b=st.integers(0, 6),
        tail_a=st.integers(0, 6),
        tail_b=st.integers(0, 6),
    )
    def run(block_len, off_a, off_b, tail_a, tail_b):
        # unique filler vocabularies so nothing else repeats across docs
        block = [f"dup{i}" for i in range(block_len)]
        a = [f"ua{i}" for i in range(off_a)] + block + [f"za{i}" for i in range(tail_a)]
        b = [f"ub{i}" for i in range(off_b)] + block + [f"zb{i}" for i in range(tail_b)]
        docs = spark.createDataFrame(
            [(0, " ".join(a)), (1, " ".join(b))], "doc_id long, text string"
        )
        spans = {r.doc_id: r for r in substring_spans(docs, _SPAN_K).collect()}
        assert set(spans) == {0, 1}
        sa, sb = spans[0], spans[1]
        assert (sa.span_start, sa.span_end) == (off_a, off_a + block_len - 1)
        assert (sb.span_start, sb.span_end) == (off_b, off_b + block_len - 1)
        assert sa.span_len == block_len == sb.span_len

    run()


def test_fuzzy_prefix_oracle(spark, duck):
    from gravity_books_datalakehouse_spark.operators.dedup import (
        dedup_fuzzy_prefix,
    )
    from gravity_books_datalakehouse_spark.plans.operator_queries import (
        oracle_sql,
    )
    from tests.conftest import SF_CORRECT, assert_matches_oracle

    assert_matches_oracle(
        dedup_fuzzy_prefix(spark, SF_CORRECT),
        duck,
        oracle_sql()["dedup_fuzzy_prefix"],
    )


def test_fuzzy_prefix_finds_planted_typo_dup(spark, tmp_path):
    """A same-block copy with 2 character edits inside the key MUST be
    flagged; a copy whose FIRST block characters differ must not (the
    documented blocking approximation)."""
    import os

    from pyspark.sql import functions as F

    from gravity_books_datalakehouse_spark.operators.dedup import (
        _FUZZY_MAX_LEV, dedup_fuzzy_prefix,
    )
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    base = docs.filter(F.col("doc_id") == 7).collect()[0]
    t = base["text"]
    typo = t[:10] + "xy" + t[12:]          # 2 edits inside the 24-char key
    other_block = "zzzz" + t[4:]           # block prefix broken
    extra = spark.createDataFrame(
        [
            (900001, typo, base["lang"], base["source"], len(typo)),
            (900002, other_block, base["lang"], base["source"], len(other_block)),
        ],
        docs.schema,
    )
    alt = str(tmp_path / "alt")
    os.makedirs(alt)
    docs.unionByName(extra).write.parquet(os.path.join(alt, "documents.parquet"))

    pairs = {
        (r["doc_a"], r["doc_b"]): r["lev"]
        for r in dedup_fuzzy_prefix(spark, alt).collect()
    }
    assert (7, 900001) in pairs and pairs[(7, 900001)] == 2 <= _FUZZY_MAX_LEV
    assert not any(900002 in p for p in pairs)


def test_fuzzy_prefix_cross_engine_agrees_on_non_ascii(spark, tmp_path):
    """Regression (round-7 review): Spark levenshtein counts code points
    but DuckDB's counts BYTES, so without the ASCII projection a
    multi-byte character inside the key gives the engines different
    distances. Plant accented/smart-quote heads and hash-compare the
    full pair list against the oracle on the modified corpus."""
    import os

    import duckdb
    from pyspark.sql import functions as F

    from gravity_books_datalakehouse_spark.operators.dedup import (
        dedup_fuzzy_prefix,
    )
    from gravity_books_datalakehouse_spark.plans.operator_queries import (
        oracle_sql,
    )
    from tests.conftest import SF_SMOKE, normalize

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    base = docs.filter(F.col("doc_id") == 7).collect()[0]
    t = base["text"]
    extra = spark.createDataFrame(
        [
            (900001, "café " + t[5:], base["lang"], base["source"], 10),
            (900002, "cafe " + t[5:], base["lang"], base["source"], 10),
            (900003, t[:8] + "’" + t[9:], base["lang"], base["source"], 10),
        ],
        docs.schema,
    )
    alt = str(tmp_path / "alt")
    os.makedirs(alt)
    docs.unionByName(extra).write.parquet(os.path.join(alt, "documents.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{alt}/documents.parquet/*.parquet')"
    )
    got = normalize(dedup_fuzzy_prefix(spark, alt).toPandas())
    want = normalize(con.execute(oracle_sql()["dedup_fuzzy_prefix"]).fetchdf())
    con.close()
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)
    # the smart-quote doc pairs with its source at the projected distance
    pairs = {
        (r["doc_a"], r["doc_b"]): r["lev"]
        for r in dedup_fuzzy_prefix(spark, alt).collect()
    }
    assert pairs.get((7, 900003)) == 1
