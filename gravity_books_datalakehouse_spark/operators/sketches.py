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


# --------------------------------------------------------------------------
# Hand-built HyperLogLog (Flajolet et al. 2007) — the ORACLE-BACKED
# distinct sketch. op_sketch_approx_stats above uses the engine's
# HLL++, which no other engine reproduces (rows-only check by design);
# this one derives every register from md5, so the full sketch state
# AND the estimate are reproduced bit-for-bit by DuckDB — the same
# hash-verified-not-just-error-bounded discipline as the Count-Min and
# Bloom builds. Exactness discipline: the harmonic denominator
# Σ 2^-M_j is kept as the EXACT integer Σ 2^(49-M_j) (fits bigint:
# ≤ 256·2^49 = 2^57), so the only float op is one shared-literal
# multiply-divide; no engine pow(), no order-dependent float sum. The
# small-range linear-counting correction needs ln() (libm-dependent) —
# deliberately NOT applied; n_zero_registers is published so a consumer
# can apply it downstream.

_HLL_M = 256          #: registers (2 md5 nibbles)
_HLL_RANK_NIBBLES = 12  #: 48 hash bits scanned for the leading-zero rank
_HLL_MAX_RANK = 4 * _HLL_RANK_NIBBLES + 1
#: alpha_256 * m^2 * 2^49 — the single float literal shared by both
#: engines (estimate = this / sum_scaled).
_HLL_NUM = repr(
    0.7213 / (1.0 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * float(1 << 49)
)

_HLL_SQL = f"""WITH h AS (
    SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
  b0 AS (
    SELECT event_type, hx,
           length(regexp_extract(substr(hx, 3, {_HLL_RANK_NIBBLES}),
                                 '^(0*)', 1)) AS nz
    FROM h),
  b AS (
    SELECT event_type,
           (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS bucket,
           CASE WHEN nz >= {_HLL_RANK_NIBBLES} THEN {_HLL_MAX_RANK}
                ELSE 4 * nz + 1
                     + CASE WHEN v >= 8 THEN 0
                            WHEN v >= 4 THEN 1
                            WHEN v >= 2 THEN 2
                            ELSE 3 END
           END AS rnk
    FROM (SELECT *,
                 strpos('0123456789abcdef', substr(hx, 3 + nz, 1)) - 1 AS v
          FROM b0)),
  regs AS (
    SELECT event_type, bucket, MAX(rnk) AS m_j FROM b GROUP BY 1, 2),
  agg AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_present,
           CAST(SUM(1::BIGINT << (49 - m_j)) AS BIGINT) AS present_sum
    FROM regs GROUP BY 1),
  ex AS (
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
    FROM events GROUP BY 1),
  est AS (
    SELECT a.event_type,
           CAST({_HLL_M} AS INT) AS m,
           CAST({_HLL_M} - a.n_present AS BIGINT) AS n_zero_registers,
           CAST(a.present_sum
                + ({_HLL_M} - a.n_present) * (1::BIGINT << 49)
                AS BIGINT) AS sum_scaled,
           ex.exact_distinct
    FROM agg a JOIN ex ON ex.event_type = a.event_type)
  SELECT event_type, m, n_zero_registers, sum_scaled,
         {_HLL_NUM} / CAST(sum_scaled AS DOUBLE) AS raw_hll_estimate,
         exact_distinct,
         ({_HLL_NUM} / CAST(sum_scaled AS DOUBLE)
          - CAST(exact_distinct AS DOUBLE))
           / CAST(exact_distinct AS DOUBLE) AS rel_error
  FROM est ORDER BY event_type"""


@register("op_sketch_hll_distinct", _HLL_SQL)
def op_sketch_hll_distinct(spark, sf_dir):
    """Per-event-type distinct-user HyperLogLog with md5-derived
    registers, hash-verified against DuckDB: bucket = first 2 hex
    nibbles (m = 256), rank = leading-zero count of the next 48 bits
    + 1 (nibble-wise: 4*nz + lz(first nonzero nibble) + 1, capped at
    49). Publishes the exact scaled harmonic sum, the raw alpha*m²/Σ
    estimate, the exact distinct count, and the realized relative
    error — tests/test_sketches.py asserts the error band.

    Scale shape: building the sketch is ONE groupBy over (type, bucket)
    with a max — partial aggregation caps every partition's exchange
    contribution at m rows per type regardless of corpus size (the
    mergeability that makes HLL the 100 TB distinct-count tool); zero
    registers are counted arithmetically (m - n_present), never via a
    spine join. The exact-distinct leg exists for the error readout and
    is the expensive half — a production run drops it and keeps the
    sketch. Floats: estimate and rel_error are single shared-literal
    expressions over exact integers, emitted unrounded (the round-8
    display-rounding lesson); the harness compares at 4 dp."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("hx")
    )
    b0 = h.select(
        "event_type",
        "hx",
        F.length(
            F.regexp_extract(
                F.substring("hx", 3, _HLL_RANK_NIBBLES), "^(0*)", 1
            )
        ).alias("nz"),
    )
    b = b0.withColumn(
        "v",
        F.conv(F.expr("substring(hx, 3 + nz, 1)"), 16, 10).cast("int"),
    ).select(
        "event_type",
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("int").alias("bucket"),
        F.when(F.col("nz") >= _HLL_RANK_NIBBLES, F.lit(_HLL_MAX_RANK))
        .otherwise(
            4 * F.col("nz")
            + 1
            + F.when(F.col("v") >= 8, 0)
            .when(F.col("v") >= 4, 1)
            .when(F.col("v") >= 2, 2)
            .otherwise(3)
        )
        .alias("rnk"),
    )
    regs = b.groupBy("event_type", "bucket").agg(F.max("rnk").alias("m_j"))
    agg = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 49 - m_j)"))
        .cast("bigint")
        .alias("present_sum"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    num = F.lit(float(_HLL_NUM))
    est = agg.join(ex, "event_type").select(
        "event_type",
        F.lit(_HLL_M).cast("int").alias("m"),
        (F.lit(_HLL_M) - F.col("n_present")).cast("bigint").alias(
            "n_zero_registers"
        ),
        (
            F.col("present_sum")
            + (F.lit(_HLL_M) - F.col("n_present"))
            * F.expr("shiftleft(cast(1 as bigint), 49)")
        )
        .cast("bigint")
        .alias("sum_scaled"),
        "exact_distinct",
    )
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    return est.select(
        "event_type",
        "m",
        "n_zero_registers",
        "sum_scaled",
        (num / F.col("sum_scaled").cast("double")).alias("raw_hll_estimate"),
        "exact_distinct",
        (
            (
                num / F.col("sum_scaled").cast("double")
                - F.col("exact_distinct").cast("double")
            )
            / F.col("exact_distinct").cast("double")
        ).alias("rel_error"),
    ).transform(bounded_sort, "event_type")


# --------------------------------------------------------------------------
# HLL MERGEABILITY across day partitions — the property that makes the
# sketch the 100 TB distinct tool. A production pipeline never sketches
# a year of data in one pass: it keeps one 256-register sketch PER DAY
# (partition) and merges by register-wise max — associative, so any
# re-aggregation (day -> week -> all-time, or across backfills) is
# exact with respect to the sketch state. This op computes the per-day
# partial registers, max-merges them, counts register mismatches
# against the direct whole-corpus build (must be 0 — the identity is
# data-independent), and publishes the estimate FROM THE MERGED PATH
# beside the exact distinct count. Same md5-derived registers as
# op_sketch_hll_distinct, so DuckDB reproduces the full merge
# bit-for-bit.

_HLL_MERGE_SQL = f"""WITH h AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
           md5(CAST(user_id AS VARCHAR)) AS hx
    FROM events),
  b0 AS (
    SELECT event_type, d, hx,
           length(regexp_extract(substr(hx, 3, {_HLL_RANK_NIBBLES}),
                                 '^(0*)', 1)) AS nz
    FROM h),
  b AS (
    SELECT event_type, d,
           (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) AS bucket,
           CASE WHEN nz >= {_HLL_RANK_NIBBLES} THEN {_HLL_MAX_RANK}
                ELSE 4 * nz + 1
                     + CASE WHEN v >= 8 THEN 0
                            WHEN v >= 4 THEN 1
                            WHEN v >= 2 THEN 2
                            ELSE 3 END
           END AS rnk
    FROM (SELECT *,
                 strpos('0123456789abcdef', substr(hx, 3 + nz, 1)) - 1 AS v
          FROM b0)),
  day_regs AS (
    SELECT event_type, d, bucket, MAX(rnk) AS m_j
    FROM b GROUP BY 1, 2, 3),
  merged AS (
    SELECT event_type, bucket, MAX(m_j) AS m_j
    FROM day_regs GROUP BY 1, 2),
  direct AS (
    SELECT event_type, bucket, MAX(rnk) AS m_j FROM b GROUP BY 1, 2),
  mism AS (
    SELECT COALESCE(m.event_type, g.event_type) AS event_type,
           CAST(SUM(CASE WHEN m.m_j IS DISTINCT FROM g.m_j
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
    FROM merged m
    FULL OUTER JOIN direct g
      ON g.event_type = m.event_type AND g.bucket = m.bucket
    GROUP BY 1),
  nd AS (
    SELECT event_type, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days
    FROM h GROUP BY 1),
  agg AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_present,
           CAST(SUM(1::BIGINT << (49 - m_j)) AS BIGINT) AS present_sum
    FROM merged GROUP BY 1),
  ex AS (
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
    FROM events GROUP BY 1)
  SELECT a.event_type,
         nd.n_days,
         mism.n_mismatch AS n_register_mismatches,
         CAST({_HLL_M} - a.n_present AS BIGINT) AS n_zero_registers,
         CAST(a.present_sum
              + ({_HLL_M} - a.n_present) * (1::BIGINT << 49)
              AS BIGINT) AS sum_scaled,
         {_HLL_NUM} / CAST(a.present_sum
              + ({_HLL_M} - a.n_present) * (1::BIGINT << 49) AS DOUBLE)
           AS merged_hll_estimate,
         ex.exact_distinct
  FROM agg a
  JOIN nd USING (event_type)
  JOIN mism USING (event_type)
  JOIN ex ON ex.event_type = a.event_type
  ORDER BY a.event_type"""


@register("op_sketch_hll_merge_days", _HLL_MERGE_SQL)
def op_sketch_hll_merge_days(spark, sf_dir):
    """Register-wise max-merge of per-day HLL sketches, hash-verified:
    (event_type, n_days, n_register_mismatches, n_zero_registers,
    sum_scaled, merged_hll_estimate, exact_distinct). The mismatch
    column compares the merged registers against a direct whole-corpus
    build over the same hash stream — 0 by the associativity of max,
    witnessed relationally on both engines every round; the estimate is
    computed FROM the merged path. This is the re-aggregation path a
    100 TB pipeline actually runs (day partials -> any rollup window),
    costing one (type, day, bucket) groupBy — partial aggregation caps
    each partition's exchange at days x m rows per type — then a
    m-rows-per-type merge.

    Floats: the estimate is one shared-literal division over the exact
    scaled harmonic sum (the op_sketch_hll_distinct discipline);
    everything else is bigint."""
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        F.md5(F.col("user_id").cast("string")).alias("hx"),
    )
    b0 = h.select(
        "event_type",
        "d",
        "hx",
        F.length(
            F.regexp_extract(
                F.substring("hx", 3, _HLL_RANK_NIBBLES), "^(0*)", 1
            )
        ).alias("nz"),
    )
    b = b0.withColumn(
        "v",
        F.conv(F.expr("substring(hx, 3 + nz, 1)"), 16, 10).cast("int"),
    ).select(
        "event_type",
        "d",
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("int").alias("bucket"),
        F.when(F.col("nz") >= _HLL_RANK_NIBBLES, F.lit(_HLL_MAX_RANK))
        .otherwise(
            4 * F.col("nz")
            + 1
            + F.when(F.col("v") >= 8, 0)
            .when(F.col("v") >= 4, 1)
            .when(F.col("v") >= 2, 2)
            .otherwise(3)
        )
        .alias("rnk"),
    ).localCheckpoint()  # hash stream shared by 3 consumers below
    day_regs = b.groupBy("event_type", "d", "bucket").agg(
        F.max("rnk").alias("m_j")
    )
    merged = day_regs.groupBy("event_type", "bucket").agg(
        F.max("m_j").alias("m_j")
    )
    direct = b.groupBy("event_type", "bucket").agg(F.max("rnk").alias("m_j"))
    mism = (
        merged.withColumnRenamed("m_j", "mm")
        .join(direct.withColumnRenamed("m_j", "gm"), ["event_type", "bucket"], "full")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    ~F.col("mm").eqNullSafe(F.col("gm")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_register_mismatches")
        )
    )
    nd = h.groupBy("event_type").agg(
        F.count_distinct("d").cast("bigint").alias("n_days")
    )
    agg = merged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 49 - m_j)"))
        .cast("bigint")
        .alias("present_sum"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    num = F.lit(float(_HLL_NUM))
    sum_scaled = (
        F.col("present_sum")
        + (F.lit(_HLL_M) - F.col("n_present"))
        * F.expr("shiftleft(cast(1 as bigint), 49)")
    ).cast("bigint")
    return (
        agg.join(nd, "event_type")
        .join(mism, "event_type")
        .join(ex, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_register_mismatches",
            (F.lit(_HLL_M) - F.col("n_present"))
            .cast("bigint")
            .alias("n_zero_registers"),
            sum_scaled.alias("sum_scaled"),
            (num / sum_scaled.cast("double")).alias("merged_hll_estimate"),
            "exact_distinct",
        )
        .transform(bounded_sort, "event_type")
    )
