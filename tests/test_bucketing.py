"""Bucketed joins must plan without any shuffle exchange."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    write_bucketed(
        load_table(spark, SF_SMOKE, "lineitem"), "b_lineitem", "l_orderkey",
        num_buckets=8,
    )
    write_bucketed(
        load_table(spark, SF_SMOKE, "orders"), "b_orders", "o_orderkey",
        num_buckets=8,
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle_exchange(spark, bucketed_tables):
    """With broadcast disabled (forcing the large-table join path — at
    100 TB neither side broadcasts), the bucketed join must plan as a
    sort-merge over co-located buckets with NO shuffle exchange."""
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, f"unexpected shuffle:\n{plan[:2000]}"
    assert "Bucketed: true" in plan


def test_bucketed_join_correct_row_count(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
    plain = (
        load_table(spark, SF_SMOKE, "lineitem")
        .join(
            load_table(spark, SF_SMOKE, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    assert joined.count() == plain.count()


def test_bucketed_aggregation_reuses_distribution(spark, bucketed_tables):
    """groupBy on the bucket key must also avoid a shuffle."""
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
