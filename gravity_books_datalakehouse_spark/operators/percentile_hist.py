"""Exact discrete percentiles from value histograms — the form that
survives 100 TB.

``percentile_disc`` buffers EVERY row's value per group inside an
ObjectHashAggregate — unbounded executor memory at warehouse scale. When
the value domain is small (integer day/second lags, bucketed measures),
the exact same statistic falls out of a (group, value, count) histogram:
the fact collapses map-side to at most |groups| x |domain| partial
counts before the one shuffle, and the percentile is the smallest value
whose cumulative relative frequency reaches p.

Selection rule: ``cume_dist >= p`` with the SAME double comparison
Spark's percentile_disc applies internally — fuzz-verified bit-equal
against percentile_disc across tie/boundary cases in
tests/test_percentile_hist.py (n divisible by 10 at p=0.9, even n at
p=0.5, constant and skewed groups). The running-sum form used here is
equivalent to the total-count rule even under duplicate values: the
cumulative count is monotone over rows, so the first qualifying row
always falls inside the tie-group of the value the histogram rule
selects.

Used by plans/advanced_queries.q_order_to_ship_lag (per-priority lag
percentiles) and streaming/event_queries.ev_funnel_time_to_convert
(global conversion-gap percentiles). NOT applied where the domain is
dense enough that the histogram stops compressing — see
plans/advanced_queries.op_outliers_mad's docstring for the measured
counter-example.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_disc_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    ps: Sequence[float],
    aliases: Sequence[str],
    n_alias: str = "n",
) -> DataFrame:
    """Per-group exact discrete percentiles of ``value`` (one output row
    per key group: keys, n_alias, one column per p). Rows collapse to
    the per-group value histogram before any shuffle; the cumulative
    window sorts spill-able histogram rows partitioned by the keys.

    NULL values are excluded before the histogram, matching both
    percentile_disc semantics and the global variant below — without the
    filter a NULL cell would sort first in the cumulative window and
    inflate ``_n``, shifting every percentile. Caveat vs a plain
    ``GROUP BY``: a group whose values are ALL NULL disappears from this
    output entirely (SQL would keep the key with NULL percentiles and
    n=0); callers needing the empty-group spine should left-join this
    result back onto the distinct keys."""
    keys = list(keys)
    hist = (
        df.filter(F.col(value).isNotNull())
        .groupBy(*keys, value)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*keys)
    cum = hist.select(
        *keys,
        value,
        F.sum("cnt").over(w_cum).alias("_cum"),
        F.sum("cnt").over(w_all).alias("_n"),
    )
    cd = F.col("_cum").cast("double") / F.col("_n").cast("double")
    return cum.groupBy(*keys).agg(
        F.max("_n").alias(n_alias),
        *[
            F.min(F.when(cd >= F.lit(p), F.col(value))).alias(a)
            for p, a in zip(ps, aliases)
        ],
    )


def global_disc_percentiles(
    df: DataFrame,
    value: str,
    ps: Sequence[float],
    aliases: Sequence[str],
    n_alias: str = "n",
) -> DataFrame:
    """Single-row exact discrete percentiles of ``value`` over the whole
    frame (NULLs excluded, as percentile_disc does; count coalesces to
    0 on an all-NULL column). The unpartitioned cumulative window runs
    over the HISTOGRAM — bounded by the value domain, not the row count
    — which is exactly why this form is safe where a global
    percentile_disc (buffering all rows in one aggregate) is not."""
    hist = (
        df.filter(F.col(value).isNotNull())
        .groupBy(value)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = Window.orderBy(value).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(value).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        value,
        F.sum("cnt").over(w_cum).alias("_cum"),
        F.sum("cnt").over(w_all).alias("_n"),
    )
    cd = F.col("_cum").cast("double") / F.col("_n").cast("double")
    return cum.agg(
        F.coalesce(F.max("_n"), F.lit(0)).alias(n_alias),
        *[
            F.min(F.when(cd >= F.lit(p), F.col(value))).alias(a)
            for p, a in zip(ps, aliases)
        ],
    )


def grouped_weighted_disc_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    weight: str,
    ps_rational: Sequence[tuple[int, int]],
    aliases: Sequence[str],
    w_alias: str = "w_total",
) -> DataFrame:
    """Per-group exact WEIGHTED discrete percentiles: the smallest value
    whose cumulative weight share reaches p. The selection rule is the
    integer cross-multiplication den*cum >= num*total (ps given as
    rationals), so no float ever gates the choice — the weighted
    generalization of the grouped variant above with zero comparison-
    boundary risk. NULL values and NULL/non-positive weights are
    excluded (a NULL weight is an absent observation, not a zero)."""
    keys = list(keys)
    hist = (
        df.filter(F.col(value).isNotNull() & (F.col(weight) > 0))
        .groupBy(*keys, value)
        .agg(F.sum(weight).alias("wc"))
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*keys)
    cum = hist.select(
        *keys,
        value,
        F.sum("wc").over(w_cum).alias("_cum"),
        F.sum("wc").over(w_all).alias("_w"),
    )
    return cum.groupBy(*keys).agg(
        F.max("_w").cast("bigint").alias(w_alias),
        *[
            F.min(
                F.when(
                    F.col("_cum") * F.lit(den) >= F.lit(num) * F.col("_w"),
                    F.col(value),
                )
            ).alias(a)
            for (num, den), a in zip(ps_rational, aliases)
        ],
    )
