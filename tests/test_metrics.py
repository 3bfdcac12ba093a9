"""metrics.py: executed-plan SQLMetrics + status-tracker job profiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.metrics import (
    job_group_profile,
    plan_metric_sum,
    plan_metrics_sum,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_plan_metrics_single_walk_matches_single_metric(spark):
    df = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()
    both = plan_metrics_sum(df, ["shuffleBytesWritten", "spillSize"])
    assert both["shuffleBytesWritten"] == plan_metric_sum(df, "shuffleBytesWritten")
    assert both["shuffleBytesWritten"] > 0  # one exchange for the groupBy
    assert both["spillSize"] == 0  # 6 k rows never spill


def test_job_group_profile_counts_stages_and_tasks(spark):
    sc = spark.sparkContext
    sc.setJobGroup("profile-test#0", "metrics test")
    try:
        (
            load_table(spark, SF_SMOKE, "lineitem")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
            .collect()
        )
    finally:
        sc.setJobGroup("profile-test-idle", "done")
    prof = job_group_profile(spark, "profile-test#0")
    assert prof["jobs"] >= 1
    assert prof["stages"] >= 2  # scan stage + post-shuffle agg stage
    assert prof["tasks"] >= prof["stages"]
