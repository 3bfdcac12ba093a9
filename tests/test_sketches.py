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


def test_hll_distinct_error_band(spark):
    """Hand-built md5-HLL estimate within the standard-error band of the
    exact distinct count (sigma = 1.04/sqrt(m); assert 3 sigma, ~19.5%
    at m = 256 — loose enough for any corpus, tight enough to catch a
    broken register/rank pipeline which lands orders of magnitude off).

    This test is also the documented CONSUMER of the published sketch
    state: the operator deliberately emits the RAW alpha*m^2/Sum
    estimate (no ln() in either engine — libm-dependent), so the
    small-range linear-counting correction of Flajolet et al. §4
    (E <= 5/2 m and V > 0  ->  E* = m ln(m/V)) is applied here, exactly
    as a downstream consumer would from n_zero_registers."""
    import math

    from gravity_books_datalakehouse_spark.operators.sketches import (
        _HLL_M,
        op_sketch_hll_distinct,
    )

    rows = op_sketch_hll_distinct(spark, SF_SMOKE).collect()
    assert rows
    band = 3 * 1.04 / _HLL_M**0.5
    for r in rows:
        est = r["raw_hll_estimate"]
        if est <= 2.5 * _HLL_M and r["n_zero_registers"] > 0:
            est = _HLL_M * math.log(_HLL_M / r["n_zero_registers"])
        rel = (est - r["exact_distinct"]) / r["exact_distinct"]
        assert abs(rel) <= band, (r["event_type"], rel, r["raw_hll_estimate"])
        # published raw estimate and rel_error are mutually consistent
        assert abs(
            r["raw_hll_estimate"] - r["exact_distinct"] * (1 + r["rel_error"])
        ) <= 1e-6 * r["exact_distinct"]
