"""Approximate aggregation sketches — the 100 TB substitutes for exact ops.

Exact COUNT(DISTINCT) and exact percentiles require a full shuffle of the
distinct values / a sorted pass; at 100 TB both are the wrong tool. The
sketch versions are single-pass, bounded-memory, mergeable (partial
sketches combine associatively across partitions — the same partial/final
split as any hash aggregate):

- ``approx_count_distinct`` — HyperLogLog++, rsd-tunable.
- ``percentile_approx``     — t-digest-style quantile sketch, accuracy
  parameter = max number of centroids.

No DuckDB oracle (different sketch implementations produce different
estimates); correctness is bounded-error vs the exact operators —
tests/test_sketches.py asserts the bounds hold on real data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table


def approx_user_counts(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )


def approx_value_quantiles(events: DataFrame, accuracy: int = 10_000) -> DataFrame:
    return events.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(accuracy)).alias("p50_approx"),
        F.percentile_approx("value", F.lit(0.99), F.lit(accuracy)).alias("p99_approx"),
    )


@register("op_sketch_approx_stats", None)  # rows-only: sketch estimates
def op_sketch_approx_stats(spark, sf_dir):
    """HLL + t-digest estimates per event type. No SQL oracle by design
    (sketches are implementation-specific); error bounds are asserted
    against the exact operators in tests/test_sketches.py."""
    from gravity_books_datalakehouse_spark.streaming.event_queries import load_events

    ev = load_events(spark, sf_dir)
    return approx_user_counts(ev).join(approx_value_quantiles(ev), "event_type")
