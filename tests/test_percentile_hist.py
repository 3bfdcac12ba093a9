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
