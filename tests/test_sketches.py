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


def test_mad_tdigest_within_band_of_exact(spark):
    """The sketch-based MAD outlier query tracks the exact one: medians
    and MADs within 5% relative, outlier counts within 10% + 2."""
    from gravity_books_datalakehouse_spark.plans.advanced_queries import (
        op_outliers_mad,
        op_outliers_mad_tdigest,
    )

    exact = {r.p_brand: r for r in op_outliers_mad(spark, SF_SMOKE).collect()}
    approx = {r.p_brand: r for r in op_outliers_mad_tdigest(spark, SF_SMOKE).collect()}
    assert set(exact) == set(approx)
    for b, e in exact.items():
        a = approx[b]
        assert a.n == e.n, b
        assert abs(a.median_price - e.median_price) <= 0.05 * e.median_price, b
        assert abs(a.mad_price - e.mad_price) <= max(1.0, 0.05 * e.mad_price), b
        assert abs(a.n_outliers - e.n_outliers) <= 2 + 0.1 * e.n_outliers, b
