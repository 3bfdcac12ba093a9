"""Equivalence proof for the histogram discrete percentile.

q_order_to_ship_lag (plans/advanced_queries.py) computes
percentile_disc-style statistics from cumulative (group, value) counts
instead of buffering every row's value in an ObjectHashAggregate —
the form that survives 100 TB. These tests pin the selection-rule
claim: "smallest value whose cume_dist >= p" over the histogram is
bit-equal to Spark's percentile_disc for any integer distribution,
including the exact cume_dist == p boundary (n divisible by 10 at
p=0.9, even n at p=0.5).
"""

from __future__ import annotations

import random

from pyspark.sql import Row, Window
from pyspark.sql import functions as F


def _hist_percentiles(df, ps):
    cnt = df.groupBy("g", "x").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("g").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("g")
    cum = cnt.select(
        "g", "x",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    cd = F.col("cum").cast("double") / F.col("n").cast("double")
    return cum.groupBy("g").agg(
        *[
            F.min(F.when(cd >= F.lit(p), F.col("x"))).alias(f"p{int(p*100)}")
            for p in ps
        ]
    )


def test_histogram_percentile_matches_percentile_disc(spark):
    rng = random.Random(3)
    rows = []
    # groups engineered to hit the boundary cases: n % 10 == 0 (p90
    # lands exactly on cume_dist == 0.9), even n (p50 on 0.5), n == 1
    for g, n in enumerate([1, 2, 9, 10, 20, 100, 101, 250, 1000]):
        rows += [Row(g=g, x=rng.randint(0, 30)) for _ in range(n)]
    df = spark.createDataFrame(rows).repartition(5)
    ref = {
        r.g: (r.p50, r.p90)
        for r in df.groupBy("g").agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").alias("p50"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY x)").alias("p90"),
        ).collect()
    }
    got = {
        r.g: (r.p50, r.p90)
        for r in _hist_percentiles(df, [0.5, 0.9]).collect()
    }
    assert got == ref


def test_grouped_operator_matches_percentile_disc(spark):
    from gravity_books_datalakehouse_spark.operators.percentile_hist import (
        grouped_disc_percentiles,
    )

    rng = random.Random(17)
    rows = [
        Row(g=g, x=rng.randint(0, 15))
        for g in range(4)
        for _ in range(rng.choice([10, 33, 100]))
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.g: (r.n, r.p50, r.p90)
        for r in grouped_disc_percentiles(
            df, ["g"], "x", [0.5, 0.9], ["p50", "p90"]
        ).collect()
    }
    ref = {
        r.g: (r.n, r.p50, r.p90)
        for r in df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").alias("p50"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY x)").alias("p90"),
        ).collect()
    }
    assert got == ref


def test_grouped_operator_excludes_nulls(spark):
    from gravity_books_datalakehouse_spark.operators.percentile_hist import (
        grouped_disc_percentiles,
    )

    # group 0 mixes NULLs in; group 1 is all-NULL (drops from output)
    rows = [
        Row(g=0, x=v) for v in [10, None, 30, None, 50]
    ] + [Row(g=1, x=None)]
    df = spark.createDataFrame(rows, schema="g int, x bigint")
    got = {
        r.g: (r.n, r.p50)
        for r in grouped_disc_percentiles(df, ["g"], "x", [0.5], ["p50"]).collect()
    }
    # NULLs neither count toward n nor shift the percentile (without the
    # isNotNull filter this reads n=5, p50=10 — the NULL cell sorts first)
    assert got == {0: (3, 30)}


def test_global_operator_null_and_empty_semantics(spark):
    from gravity_books_datalakehouse_spark.operators.percentile_hist import (
        global_disc_percentiles,
    )

    # NULLs excluded from count and percentiles, like percentile_disc
    df = spark.createDataFrame(
        [Row(x=v) for v in [1, None, 3, None, 5]],
        schema="x bigint",
    )
    r = global_disc_percentiles(df, "x", [0.5], ["p50"]).collect()[0]
    assert (r.n, r.p50) == (3, 3)
    # all-NULL column: count 0, percentile NULL (single row, not empty)
    empty = spark.createDataFrame([Row(x=None)], schema="x bigint")
    r2 = global_disc_percentiles(empty, "x", [0.5], ["p50"]).collect()
    assert len(r2) == 1 and (r2[0].n, r2[0].p50) == (0, None)


def test_histogram_percentile_constant_and_skewed_groups(spark):
    rows = (
        [Row(g=0, x=7)] * 50                       # constant group
        + [Row(g=1, x=0)] * 99 + [Row(g=1, x=100)]  # extreme skew
    )
    df = spark.createDataFrame(rows)
    ref = {
        r.g: (r.p50, r.p90)
        for r in df.groupBy("g").agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").alias("p50"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY x)").alias("p90"),
        ).collect()
    }
    got = {
        r.g: (r.p50, r.p90)
        for r in _hist_percentiles(df, [0.5, 0.9]).collect()
    }
    assert got == ref


def test_grouped_weighted_percentiles(spark):
    """Weighted median: the smallest value whose cumulative weight share
    reaches 1/2, integer cross-multiplied; non-positive/NULL weights
    excluded."""
    from gravity_books_datalakehouse_spark.operators.percentile_hist import (
        grouped_weighted_disc_percentiles,
    )

    rows = [
        # group 0: value 10 carries weight 1, value 100 carries weight 9
        # -> weighted median 100, even though the doc median would be 10
        Row(g=0, x=10, w=1),
        Row(g=0, x=100, w=9),
        # group 1: equal weights -> first value reaching half
        Row(g=1, x=1, w=5),
        Row(g=1, x=2, w=5),
        # excluded observations
        Row(g=1, x=3, w=0),
        Row(g=1, x=4, w=None),
        Row(g=1, x=None, w=7),
    ]
    df = spark.createDataFrame(rows, schema="g int, x bigint, w bigint")
    got = {
        r.g: (r.w_total, r.p50)
        for r in grouped_weighted_disc_percentiles(
            df, ["g"], "x", "w", [(1, 2)], ["p50"]
        ).collect()
    }
    assert got == {0: (10, 100), 1: (10, 1)}


def test_weighted_median_len_replay(spark):
    """Registry query: both medians recomputed in pure python from the
    raw documents."""
    import re as _re

    import duckdb as _duckdb

    import __spark_entry__ as m
    from tests.conftest import SF_SMOKE

    con = _duckdb.connect()
    docs = con.execute(
        f"SELECT source, n_chars, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    con.close()
    per_src = {}
    for src, n_chars, text in docs:
        n_tok = len(_re.split(r"\s+", text.strip().lower()))
        if n_tok > 0:
            per_src.setdefault(src, []).append((n_chars, n_tok))
    want = {}
    for src, obs in per_src.items():
        obs.sort()
        c_tot, w_tot = len(obs), sum(w for _, w in obs)
        c_cum = w_cum = 0
        md = mt = None
        for v, w in obs:
            c_cum += 1
            w_cum += w
            if md is None and 2 * c_cum >= c_tot:
                md = v
            if mt is None and 2 * w_cum >= w_tot:
                mt = v
        want[src] = (w_tot, md, mt)
    got = {
        r.source: (r.total_tokens, r.median_len_docs, r.median_len_tokens)
        for r in m.queries()["text_weighted_median_len"](spark, SF_SMOKE).collect()
    }
    assert got == want
