"""AQE skew-join: a hot key must be split at runtime (skew=true in the
final adaptive plan) — the zero-code answer to fact-side skew that
operators/skew.py's salting complements."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture
def skew_session_confs(spark):
    """Aggressive AQE thresholds so a local-scale skew triggers the
    optimization (production defaults target multi-GB partitions)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # session.py round-7 split the thresholds: the AQE runtime one
        # must ALSO be disabled or AQE upgrades the tiny build side to a
        # broadcast join at runtime and the skew split never applies
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is not None:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_session_confs):
    # ~95% of left rows on ONE key: that key's shuffle partition is ~100x
    # the median and must be split
    left = spark.range(60_000).select(
        F.when(F.col("id") < 57_000, 0).otherwise(F.col("id") % 200).alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
    )
    right = spark.range(200).select(F.col("id").alias("k"), F.col("id").alias("rv"))
    # no aggregation downstream: a skew split duplicates partitions, so AQE
    # only applies it when nothing downstream requires the hash distribution
    joined = left.join(right, "k")
    # execute THIS dataframe's own query execution so AQE finalizes it
    rows = joined.collect()
    assert len(rows) == 60_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, f"AQE did not mark skew:\n{plan[:1500]}"


def test_salted_join_matches_plain_join(spark):
    from gravity_books_datalakehouse_spark.operators.skew import salted_join

    fact = spark.range(5_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("d"))
    got = salted_join(fact, dim, "k", salt_buckets=4)
    want = fact.join(dim, "k")
    assert got.count() == want.count() == 5_000
    assert got.exceptAll(want).count() == 0


def test_salted_join_left_keeps_unmatched_fact_rows_once(spark):
    from gravity_books_datalakehouse_spark.operators.skew import salted_join

    fact = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(0, "zero")], "k long, d string")
    got = salted_join(fact, dim, "k", salt_buckets=4, how="left")
    assert got.count() == 100  # unmatched fact rows exactly once
    assert got.filter(F.col("d").isNull()).count() == 80


def test_salting_spreads_hot_key_across_shuffle_partitions(spark):
    """Metrics-backed skew demonstration: with 95% of fact rows on one
    key, a plain hash-partition-on-key puts ~95% of rows in one task;
    the salted key spreads the hot key across salt_buckets partitions.
    (Distribution is deterministic — hash partitioning — so this is a
    stable assertion, unlike wall-clock.)"""
    # 2x more salt values than partitions so hash collisions of the
    # (key, salt) combos still average ~2 combos per partition
    n, hot_share, buckets, n_parts = 40_000, 0.95, 16, 8
    fact = spark.range(n).select(
        F.when(F.col("id") < int(n * hot_share), 0)
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("v"),
    )

    def max_partition_share(df, *cols):
        parts = (
            df.repartition(n_parts, *cols)
            .select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .collect()
        )
        return max(r["count"] for r in parts) / n

    plain = max_partition_share(fact, "k")
    salt = (F.abs(F.xxhash64("k", "v")) % buckets).cast("int")
    salted = max_partition_share(fact.withColumn("__salt", salt), "k", "__salt")
    assert plain >= hot_share  # one straggler partition holds the hot key
    # salting spreads the hot key: the straggler partition collapses to a
    # small multiple of the ideal 1/n_parts share
    assert salted < plain / 3
    assert salted < 2.5 / n_parts


def test_op_j_skewed_salted_plan_spreads_hot_key(spark):
    """The registered skew demo query: (a) physical join keys must include
    the salt (the shuffle distributes on (key, salt), not key alone), and
    (b) the hot key (~20% of events remapped to user 0) must spread across
    multiple shuffle partitions instead of landing in one straggler."""
    import os

    import pytest

    from gravity_books_datalakehouse_spark.plans.operator_queries import (
        op_j_skewed_salted,
    )
    from gravity_books_datalakehouse_spark.streaming.event_queries import load_events

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = op_j_skewed_salted(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan, f"salt column absent from physical plan:\n{plan[:1500]}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    # physical spread: hash-distributing the salted fact on (key, salt)
    # caps the hot key's largest partition far below its plain share
    n_parts, buckets = 8, 8
    e = load_events(spark, sf_dir).select(
        F.when(F.col("event_type") == "click", F.lit(0).cast("bigint"))
        .otherwise(F.col("user_id"))
        .alias("skew_uid"),
        "value",
    )
    n = e.count()
    hot = e.filter(F.col("skew_uid") == 0).count()
    assert hot / n > 0.15  # the skew is real

    def hot_key_max_share(df, *cols):
        parts = (
            df.repartition(n_parts, *cols)
            .filter(F.col("skew_uid") == 0)
            .select(F.spark_partition_id().alias("pid"))
            .groupBy("pid").count().collect()
        )
        return max(r["count"] for r in parts) / hot

    salt = (F.abs(F.xxhash64("skew_uid", "value")) % buckets).cast("int")
    plain = hot_key_max_share(e, "skew_uid")
    salted = hot_key_max_share(e.withColumn("__salt", salt), "skew_uid", "__salt")
    assert plain == 1.0  # plain hash partitioning: whole hot key in one task
    assert salted <= 0.5  # salted: spread across partitions


def test_salted_join_rejects_outer_joins(spark):
    """Right/full outer would emit each unmatched dim row once per salt
    replica — the operator must refuse instead of silently duplicating."""
    from gravity_books_datalakehouse_spark.operators.skew import salted_join

    fact = spark.range(10).select(F.col("id").alias("k"))
    dim = spark.range(10).select(F.col("id").alias("k"))
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(fact, dim, "k", how=how)
