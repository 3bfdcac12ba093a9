"""MERGE-shaped upsert exercised end-to-end as an oracle-backed query.

The reference's DWH lifecycle is truncate + full reload per run
(etl_script_dwh/etl_dwh.py:21-28,108); the lakehouse-native counterpart
is a keyed MERGE into a versioned table. Delta/Iceberg are unavailable
here (no jars), so the merge runs on the snapshots module
(sources/snapshots.py): update-matched + insert-unmatched in one
anti-join + union, committed atomically via the version-pointer flip.

The registered query materializes a base snapshot of orders, merges an
increment that both UPDATES existing keys and INSERTS new ones, and
returns an aggregate over the merged table — all replayable in DuckDB
with NOT EXISTS + UNION ALL, which makes the merge semantics (not just
the plumbing) oracle-verified by the driver.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table
from gravity_books_datalakehouse_spark.sources.snapshots import (
    merge_snapshot,
    read_snapshot,
    write_snapshot,
)

_CUT = "1997-06-01"


def _base(orders: DataFrame) -> DataFrame:
    """Initial table state: pre-cutoff orders."""
    return orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    ).filter(F.col("o_orderdate") < F.lit(_CUT).cast("date"))


def _increment(orders: DataFrame) -> DataFrame:
    """Change feed: every 10th order (any date) with doubled price and
    forced status — overlaps the base (updates) and the post-cutoff
    range (inserts)."""
    return orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("M").alias("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 2)
        .cast("double")
        .alias("o_totalprice"),
    )


@register(
    "op_merge_upsert_snapshot",
    f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderdate < DATE '{_CUT}'
    ),
    upd AS (
      SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    merged AS (
      SELECT * FROM upd
      UNION ALL
      SELECT b.* FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM merged
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def op_merge_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base snapshot -> MERGE increment -> aggregate the merged table.

    The snapshot table lives under a per-(user, sf) temp dir rebuilt on
    every call, so the query is a pure function of sf_dir."""
    orders = load_table(spark, sf_dir, "orders")
    table_dir = os.path.join(
        tempfile.gettempdir(),
        f"gravity-merge-demo-{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(table_dir, ignore_errors=True)
    write_snapshot(_base(orders), table_dir)
    merge_snapshot(_increment(orders), table_dir, ["o_orderkey"])
    return (
        read_snapshot(spark, table_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


_DEL_COND = "o_orderstatus = 'M' AND o_orderkey % 3 = 0"


@register(
    "op_snapshot_diff",
    f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderdate < DATE '{_CUT}'
    ),
    upd AS (
      SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    merged AS (
      SELECT * FROM upd
      UNION ALL
      SELECT b.* FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)
    ),
    final AS (
      SELECT * FROM merged
      WHERE NOT COALESCE(({_DEL_COND}), FALSE)
    ),
    diff AS (
      SELECT CASE
               WHEN o.o_orderkey IS NULL THEN 'inserted'
               WHEN n.o_orderkey IS NULL THEN 'deleted'
               WHEN o.o_orderstatus != n.o_orderstatus
                 OR o.o_totalprice != n.o_totalprice
                 OR o.o_custkey != n.o_custkey THEN 'updated'
               ELSE 'unchanged'
             END AS change_type
      FROM base o FULL OUTER JOIN final n ON o.o_orderkey = n.o_orderkey
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM diff GROUP BY change_type ORDER BY change_type
    """,
)
def op_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two snapshot VERSIONS: base (v1) -> MERGE
    an increment (v2) -> targeted DELETE (v3), then classify every key
    by full-outer-joining v1 against the latest version — inserted /
    updated / deleted / unchanged counts, i.e. the table_changes()
    report Delta's CDF produces, computed from plain time travel.

    The diff itself is the scale-relevant operator: one full outer join
    keyed on the table key (hash-partitioned both sides, no broadcast
    needed at any SF) + a map-side-collapsing 4-group aggregate. The
    oracle replays all three table states relationally (the merge's
    NOT EXISTS + UNION ALL, the delete's NULL-safe predicate), so the
    versioning semantics — not just the plumbing — are hash-verified.
    """
    from gravity_books_datalakehouse_spark.sources.snapshots import (
        delete_where,
    )

    orders = load_table(spark, sf_dir, "orders")
    table_dir = os.path.join(
        tempfile.gettempdir(),
        f"gravity-diff-demo-{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(table_dir, ignore_errors=True)
    write_snapshot(_base(orders), table_dir)
    merge_snapshot(_increment(orders), table_dir, ["o_orderkey"])
    delete_where(spark, table_dir, _DEL_COND)

    old = read_snapshot(spark, table_dir, version=1).alias("o")
    new = read_snapshot(spark, table_dir).alias("n")
    joined = old.join(
        new, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    )
    change = (
        F.when(F.col("o.o_orderkey").isNull(), F.lit("inserted"))
        .when(F.col("n.o_orderkey").isNull(), F.lit("deleted"))
        .when(
            (F.col("o.o_orderstatus") != F.col("n.o_orderstatus"))
            | (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
            | (F.col("o.o_custkey") != F.col("n.o_custkey")),
            F.lit("updated"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .orderBy("change_type")
    )


@register(
    "op_incremental_agg_maintenance",
    """WITH base AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM orders WHERE o_orderkey % 10 != 0 GROUP BY 1),
    delta AS (
      SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM orders WHERE o_orderkey % 10 = 0 GROUP BY 1),
    merged AS (
      SELECT month, SUM(n_orders) AS n_orders, SUM(total) AS total
      FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
      GROUP BY month)
    SELECT month,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(total AS DOUBLE) AS total_price
    FROM merged ORDER BY month""",
)
def op_incremental_agg_maintenance(spark, sf_dir):
    """Incremental materialized-aggregate maintenance: the monthly sales
    rollup updated by COMBINING the standing partial aggregate (the
    materialized gold table, here the o_orderkey % 10 != 0 base) with
    the ingest batch's partial aggregate — never re-scanning the base
    fact. Correct because COUNT and the exact integer-cents SUM are
    commutative monoids: merge = per-key union + re-aggregate, the
    same algebra Spark's own partial/final HashAggregate split relies
    on. The DuckDB oracle recomputes the identical decomposition; the
    pytest additionally pins merge == full recompute (the MV
    maintenance correctness property).

    Scale shape: the merge stage shuffles 2x|months| partial rows —
    independent of fact size; only the DELTA batch is scanned at
    refresh time in production (the base partials are a read of the
    gold table; both sides are computed here because registry queries
    are pure functions of sf_dir). The month key is an explicit ISO
    string on both engines."""
    o = load_table(spark, sf_dir, "orders")
    from gravity_books_datalakehouse_spark.plans.operator_queries import (
        _cents,
        _money_sum,
    )

    def partial(side):
        return (
            o.where(side)
            .select(
                F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias(
                    "month"
                ),
                _cents("o_totalprice").alias("cents"),
            )
            .groupBy("month")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                _money_sum(F.col("cents"), 2).alias("total"),
            )
        )

    base = partial(F.col("o_orderkey") % 10 != 0)
    delta = partial(F.col("o_orderkey") % 10 == 0)
    merged = (
        base.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("total").alias("total"),
        )
    )
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    return merged.select(
        "month",
        "n_orders",
        F.col("total").cast("double").alias("total_price"),
    ).transform(bounded_sort, "month")
