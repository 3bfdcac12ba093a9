"""Sketch accuracy: approximate aggregates within bounds of exact ones."""

from __future__ import annotations

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.sketches import (
    approx_user_counts,
    approx_value_quantiles,
)
from gravity_books_datalakehouse_spark.streaming.event_queries import load_events
from tests.conftest import SF_SMOKE


def test_hll_within_rsd_bound(spark):
    ev = load_events(spark, SF_SMOKE)
    approx = {r.event_type: r.approx_users for r in approx_user_counts(ev).collect()}
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(1, 0.1 * n), (t, approx[t], n)


def test_tdigest_quantiles_close_to_exact(spark):
    ev = load_events(spark, SF_SMOKE)
    approx = {r.event_type: r.p50_approx
              for r in approx_value_quantiles(ev).collect()}
    exact = {r.event_type: r.p50
             for r in ev.groupBy("event_type")
             .agg(F.expr("percentile(value, 0.5)").alias("p50")).collect()}
    for t in exact:
        # percentile_approx at high accuracy returns an actual data value
        # near the true quantile; tolerate a small relative gap
        assert abs(approx[t] - exact[t]) <= max(1.0, 0.05 * abs(exact[t]))
