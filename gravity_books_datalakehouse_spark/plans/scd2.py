"""SCD Type-2 dimension builder — Kimball change tracking.

The reference rebuilds dimensions from scratch every run (full refresh,
etl_script_dlh/etl_lakehouse.py:21-35), losing history. Type-2 keeps it:
each natural key carries versioned rows with [valid_from, valid_to)
ranges and an is_current flag.

``build_scd2`` derives the versioned dimension from a *change feed*
(snapshots or CDC rows: natural key, attributes, change timestamp) in one
window pass per key: dedupe consecutive identical attribute rows, then
``lead(change_ts)`` closes each version. Linear, one shuffle on the
natural key — no iterative merge.

Pairs with the as-of join (operators/asof.py): fact rows look up the
dimension version valid at their event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_scd2(
    changes: DataFrame,
    natural_key: str,
    attr_cols: list[str],
    change_ts: str,
) -> DataFrame:
    """Versioned dimension from a change feed.

    Consecutive rows with identical attributes collapse into one version
    (idempotent under snapshot re-delivery). Output: natural key, attrs,
    valid_from, valid_to (null = open), is_current, version (1-based).
    """
    # drop consecutive duplicates: attribute fingerprint vs previous row
    fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in attr_cols]))
    # Both windows order by (change_ts, attribute fingerprint): snapshot/
    # CDC feeds routinely deliver two change rows for the same natural key
    # with identical timestamps, and ordering by timestamp alone makes
    # lag/lead/row_number nondeterministic between runs. The fingerprint
    # tiebreak pins a total order (ties with identical attributes collapse
    # in the dedupe step anyway, so the arbitrary-but-stable choice among
    # equal-ts distinct-attr rows is documented behavior, not chance).
    w_ordered = Window.partitionBy(natural_key).orderBy(
        F.col(change_ts).asc(), F.col("__fp").asc()
    )
    deduped = (
        changes.withColumn("__fp", fp)
        .withColumn("__prev_fp", F.lag("__fp").over(w_ordered))
        .filter(F.col("__prev_fp").isNull() | (F.col("__fp") != F.col("__prev_fp")))
    )
    w2 = Window.partitionBy(natural_key).orderBy(
        F.col(change_ts).asc(), F.col("__fp").asc()
    )
    return (
        deduped.withColumn("valid_from", F.col(change_ts))
        .withColumn("valid_to", F.lead(change_ts).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.row_number().over(w2))
        .select(natural_key, *attr_cols, "valid_from", "valid_to", "is_current", "version")
    )


def lookup_at(dim_scd2: DataFrame, natural_key: str, at_ts) -> DataFrame:
    """Point-in-time dimension slice: versions valid at ``at_ts``."""
    at_col = F.lit(at_ts).cast("timestamp")
    return dim_scd2.filter(
        (F.col("valid_from") <= at_col)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at_col))
    )


from gravity_books_datalakehouse_spark.plans.operator_queries import (
    _cents,
    _money_sum,
    register,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table


@register(
    "op_scd2_priority_history",
    """WITH ch AS (
         SELECT o_custkey AS k, o_orderpriority AS attr,
                CAST(o_orderdate AS TIMESTAMP) AS ts
         FROM orders),
       fp AS (SELECT k, attr, ts, md5(CAST(attr AS VARCHAR)) AS f FROM ch),
       ordered AS (
         SELECT *, lag(f) OVER (PARTITION BY k ORDER BY ts, f) AS pf FROM fp),
       dedup AS (SELECT * FROM ordered WHERE pf IS NULL OR f <> pf),
       ver AS (
         SELECT k, attr, ts AS valid_from,
                lead(ts) OVER (PARTITION BY k ORDER BY ts, f) AS valid_to
         FROM dedup)
       SELECT attr AS o_orderpriority,
              CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_current,
              CAST(COUNT(*) AS BIGINT) AS n_versions
       FROM ver GROUP BY 1 ORDER BY 1""",
)
def op_scd2_priority_history(spark, sf_dir):
    """SCD Type-2 history derived from the orders change feed (customer's
    order priority as the tracked attribute): consecutive-duplicate
    collapse + lead() version closing, reported as versions and open
    (current) rows per priority. Puts the SCD2 builder — previously
    test-only — under the driver's hash gate; the oracle re-derives the
    identical versioning with the same (ts, fingerprint) total order,
    so tie-handling is pinned cross-engine, not just cross-run."""
    o = load_table(spark, sf_dir, "orders")
    changes = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderpriority").alias("attr"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
    )
    dim = build_scd2(changes, "k", ["attr"], "ts")
    return (
        dim.groupBy(F.col("attr").alias("o_orderpriority"))
        .agg(
            F.sum(F.when(F.col("is_current"), 1).otherwise(0))
            .cast("bigint").alias("n_current"),
            F.count(F.lit(1)).cast("bigint").alias("n_versions"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "op_scd2_temporal_join",
    """WITH ch AS (
         SELECT o_custkey AS k, o_orderpriority AS attr,
                CAST(o_orderdate AS TIMESTAMP) AS ts
         FROM orders),
       fp AS (SELECT k, attr, ts, md5(CAST(attr AS VARCHAR)) AS f FROM ch),
       ordered AS (
         SELECT *, lag(f) OVER (PARTITION BY k ORDER BY ts, f) AS pf FROM fp),
       dedup AS (SELECT * FROM ordered WHERE pf IS NULL OR f <> pf),
       ver AS (
         SELECT k, attr, ts AS valid_from,
                lead(ts) OVER (PARTITION BY k ORDER BY ts, f) AS valid_to
         FROM dedup),
       purch AS (
         SELECT user_id, ts::TIMESTAMP AS ts, value FROM events
         WHERE event_type = 'purchase')
       SELECT COALESCE(v.attr, 'none') AS priority_at_purchase,
              CAST(COUNT(*) AS BIGINT) AS n_purchases,
              CAST(SUM(CAST(p.value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
       FROM purch p
       LEFT JOIN ver v
         ON p.user_id = v.k
        AND v.valid_from <= p.ts
        AND (v.valid_to IS NULL OR v.valid_to > p.ts)
       GROUP BY 1 ORDER BY 1""",
)
def op_scd2_temporal_join(spark, sf_dir):
    """Temporal (point-in-time) join: each purchase event resolves the
    SCD2 dimension version valid AT its event time — the query SCD2
    exists to answer ('what was this customer's priority when they
    bought?'). The oracle spells the BETWEEN range join; the Spark plan
    uses the as-of operator instead: versions tile each key's timeline
    ([valid_from, next valid_from)), so the LATEST valid_from <= ts IS
    the valid version — one union+window linear pass, no inequality-
    join fan-out, no BroadcastNestedLoopJoin at any scale. Events
    before a user's first version (or for users with no orders) roll up
    under 'none'."""
    from gravity_books_datalakehouse_spark.operators.asof import asof_join
    from gravity_books_datalakehouse_spark.sources.catalog import load_table
    from gravity_books_datalakehouse_spark.streaming.event_queries import load_events

    o = load_table(spark, sf_dir, "orders")
    changes = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderpriority").alias("attr"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
    )
    dim = build_scd2(changes, "user_id", ["attr"], "ts")
    # Zero-width versions (valid_from == valid_to, produced when a key has
    # two same-timestamp change rows with different attributes) can never
    # satisfy the oracle's range predicate valid_from <= ts < valid_to, so
    # drop them BEFORE the as-of join. Without this filter the as-of
    # window's last() among same-__ts right rows picks whichever tied
    # version the sort happens to emit last — correct today only via an
    # implementation detail of Spark's sort stability, not a contract.
    versions = dim.filter(
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from"))
    ).select(
        "user_id",
        F.col("valid_from"),
        F.col("attr").alias("priority_then"),
    )
    purch = (
        load_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("ev_ts"), "value")
    )
    joined = asof_join(
        purch, versions, "user_id", "ev_ts", "valid_from", ["priority_then"]
    )
    return (
        joined.groupBy(
            F.coalesce("priority_then", F.lit("none")).alias("priority_at_purchase")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            _money_sum(_cents("value", 4), 4).cast("double").alias("total_value"),
        )
        .orderBy("priority_at_purchase")
    )
