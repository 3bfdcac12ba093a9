"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join`` attaches to each left row the most recent right row at or
before its timestamp, per key — the classic trades⋈quotes / event⋈state
lookup. Implemented as a *composition of built-ins* (SURVEY.md §2.8
custom-operator rule a): union both sides, one window pass per key with
``last(..., ignorenulls=True)``, keep left rows.

Why this shape at 100 TB: the naive formulation (inequality join +
per-left-row max) explodes to |L|·|R| pairs per key before aggregating.
The union+window form is linear — one shuffle on the key, one ordered
scan per partition, zero pair blowup. Skewed keys degrade to a single
task per key; salt by time-bucket if a key's history exceeds a task.

The DuckDB oracle uses its native ``ASOF JOIN`` (>= semantics, matching
this implementation) — a true independent re-derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row: latest right row with right_ts <= left_ts, per ``by``.

    Returns the left columns plus ``value_cols`` (null when no prior right
    row exists). Right rows at exactly left_ts match (>= semantics).
    """
    lt = left.withColumn("__is_left", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(by, right_ts, *value_cols)
        .withColumn("__is_left", F.lit(0))
        .withColumn("__ts", F.col(right_ts))
    )
    # align schemas: left gets null value_cols, right gets null left cols
    for c in value_cols:
        lt = lt.withColumn(f"__v_{c}", F.lit(None).cast(dict(rt.dtypes)[c]))
    rt = rt.select(
        by,
        "__is_left",
        "__ts",
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    lt_cols = [c for c in lt.columns if not c.startswith("__v_")]
    unioned = lt.select(
        *lt_cols, *[f"__v_{c}" for c in value_cols]
    ).unionByName(
        rt.select(
            *[F.lit(None).cast(dict(lt.dtypes)[c]).alias(c)
              for c in lt_cols if c not in (by, "__is_left", "__ts")],
            by, "__is_left", "__ts",
            *[f"__v_{c}" for c in value_cols],
        ),
        allowMissingColumns=False,
    )
    # right rows sort BEFORE left rows at equal ts (asc __is_left) → a
    # same-instant right row is visible to the left row (>= semantics)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    keep = [c for c in lt_cols if c not in ("__is_left", "__ts")]
    return filled.filter(F.col("__is_left") == 1).select(*keep, *value_cols)


@register(
    "op_asof_join_prev_purchase",
    """SELECT c.event_id, c.user_id, c.ts::TIMESTAMP AS click_ts,
              p.ts::TIMESTAMP AS prev_purchase_ts,
              p.value AS prev_purchase_value
       FROM (SELECT * FROM events WHERE event_type = 'click') c
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
         ON c.user_id = p.user_id AND c.ts >= p.ts""",
)
def op_asof_join_prev_purchase(spark, sf_dir):
    """As-of join: each click gets the user's most recent prior (or
    same-instant) purchase. Oracle is DuckDB's native ASOF JOIN — an
    independent implementation of the same semantics."""
    from gravity_books_datalakehouse_spark.streaming.event_queries import load_events

    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("ts").alias("prev_purchase_ts"),
        F.col("value").alias("prev_purchase_value"),
    )
    return asof_join(
        clicks, purchases, "user_id", "click_ts", "p_ts",
        ["prev_purchase_ts", "prev_purchase_value"],
    )


@register(
    "op_asof_join_tolerance",
    """SELECT c.event_id, c.user_id, c.ts::TIMESTAMP AS click_ts,
              CASE WHEN p.ts IS NOT NULL
                        AND date_diff('second', p.ts::TIMESTAMP, c.ts::TIMESTAMP) <= 3600
                   THEN p.ts::TIMESTAMP END AS prev_purchase_ts,
              CASE WHEN p.ts IS NOT NULL
                        AND date_diff('second', p.ts::TIMESTAMP, c.ts::TIMESTAMP) <= 3600
                   THEN p.value END AS prev_purchase_value
       FROM (SELECT * FROM events WHERE event_type = 'click') c
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
         ON c.user_id = p.user_id AND c.ts >= p.ts""",
)
def op_asof_join_tolerance(spark, sf_dir):
    """Tolerance-bounded as-of join: each click gets the most recent
    prior purchase ONLY if it happened within the last hour — matches
    pandas ``merge_asof(tolerance=...)`` / kdb wj semantics, the form
    sensor/tick pipelines actually need (a match from last week is not
    'the prevailing value'). Same union+window linear plan as the
    unbounded as-of; the tolerance is a post-join null-out, not a range
    join — no pair fan-out at any scale."""
    joined = op_asof_join_prev_purchase(spark, sf_dir)
    in_tol = (
        F.col("prev_purchase_ts").isNotNull()
        & (
            F.unix_timestamp("click_ts") - F.unix_timestamp("prev_purchase_ts")
            <= 3600
        )
    )
    return joined.select(
        "event_id",
        "user_id",
        "click_ts",
        F.when(in_tol, F.col("prev_purchase_ts")).alias("prev_purchase_ts"),
        F.when(in_tol, F.col("prev_purchase_value")).alias("prev_purchase_value"),
    )
