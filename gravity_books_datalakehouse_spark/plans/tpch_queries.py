"""TPC-H-shaped analytics beyond the reference's 5 queries.

The reference's SQL surface (test_queries/test_queries.py:15-68) stops at
3-way star joins + group-by + top-k. These queries extend the engine's
proven surface to the classic warehouse shapes a lakehouse user actually
runs — full-scan pricing summaries, EXISTS decorrelation, co-location
constraints inside a join, aggregate join-backs — each with a DuckDB
oracle and the repo-wide cross-engine money discipline (DECIMAL(18,2)
pre-SUM, DOUBLE after; see operator_queries module docstring).

Scale notes are per-query; the common rule: nation/region are forced
broadcasts (fixed cardinality 25/5 forever), customer/orders/supplier
join strategy is left to AQE because they grow with SF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import (
    _money,
    register,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table

def _one() -> F.Column:
    # built lazily: F.lit at module import would require a live SparkContext
    return F.lit(1).cast("decimal(18,2)")


def _disc_price() -> F.Column:
    """l_extendedprice * (1 - l_discount), exact: scale 2+2 = 4."""
    return (_money("l_extendedprice") * (_one() - _money("l_discount"))).cast(
        "decimal(18,4)"
    )


@register(
    "q_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_base_price,
              CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l_discount AS DECIMAL(18,2)))
                            AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l_discount AS DECIMAL(18,2)))
                            AS DECIMAL(18,4)) *
                       (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
                AS sum_charge,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*) AS avg_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*) AS avg_price,
              CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*) AS avg_disc,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
)
def q_pricing_summary(spark, sf_dir):
    """TPC-H q1 shape: the canonical full-scan pricing summary — 8
    aggregates over ~all of lineitem, grouped by two low-cardinality
    flags. The scan reads 7 columns of 11 (pruned ReadSchema), the date
    predicate pushes to Parquet, and partial aggregation collapses each
    input partition to ≤ 6 groups before the one tiny shuffle — the
    plan whose cost is pure scan bandwidth, exactly what you want for a
    100 TB table sweep.

    Intermediates stay exact: disc_price has scale 4 by construction
    (2+2 digits), charge scale 6 within DECIMAL(38,...) in both engines,
    so the DOUBLE casts at the end are bit-equal. Averages are computed
    as exact-decimal SUM / COUNT rather than AVG() because engines
    disagree on streaming-mean accumulation order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _disc_price()
    charge = disc_price * (_one() + _money("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_money("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_money("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_money("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(_money("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_priority_with_returns",
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_returnflag = 'R')
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""",
)
def q_priority_with_returns(spark, sf_dir):
    """TPC-H q4 shape: per-priority count of orders with ≥1 returned
    line — EXISTS decorrelated to a left-semi join. The semi join never
    materializes matched lineitem rows (probe stops at first match) and
    the returnflag filter prunes the build side at the scan; Spark plans
    the same hash-semi-join MySQL/DuckDB reach via their EXISTS rewrite.
    """
    o = load_table(spark, sf_dir, "orders")
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_local_supplier_volume",
    """SELECT n.n_name AS nation_name,
              CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                            AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
                      AND c.c_nationkey = s.s_nationkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
       GROUP BY n.n_name
       ORDER BY revenue DESC, nation_name ASC""",
)
def q_local_supplier_volume(spark, sf_dir):
    """TPC-H q5 shape: revenue served by LOCAL suppliers (customer and
    supplier in the same nation) within one region. The signature move
    is the two-column join condition on supplier — an extra equality
    (c_nationkey = s_nationkey) rides along the equi-join on l_suppkey,
    so it stays a hash join with a composite residual, never a
    nested-loop. Nation/region broadcast and their ASIA filter prunes
    customers *before* the big joins via the broadcast semi-effect.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation_name"))
    )


@register(
    "q_returned_item_customers",
    """SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
              CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                            AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE l.l_returnflag = 'R'
       GROUP BY c.c_custkey, c.c_name, n.n_name
       ORDER BY revenue DESC, c.c_custkey ASC
       LIMIT 20""",
)
def q_returned_item_customers(spark, sf_dir):
    """TPC-H q10 shape: top-20 customers by revenue lost to returns.
    The returnflag predicate is pushed into the lineitem scan (~1/3
    selectivity before any join), the group-by keys ride the customer
    row, and the final top-k is TakeOrderedAndProject — no global sort
    materialization at any SF.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_small_qty_revenue",
    """SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                       AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
              COUNT(*) AS n_lines
       FROM lineitem l
       JOIN (SELECT l_partkey AS pk,
                    0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                                AS DOUBLE) / COUNT(*)) AS half_avg_qty
             FROM lineitem GROUP BY l_partkey) a
         ON l.l_partkey = a.pk
       WHERE l.l_quantity < a.half_avg_qty""",
)
def q_small_qty_revenue(spark, sf_dir):
    """TPC-H q17 shape: revenue from orders far below a part's average
    quantity — the correlated scalar subquery (per-part AVG) decorrelated
    into an aggregate + join-back. lineitem is scanned twice by design:
    a fused single-scan alternative (window AVG over partkey) would
    shuffle the FULL row payload through one window exchange, while the
    agg side here shuffles only (partkey, sum, count) — far less traffic
    at 100 TB. The join-back keys on l_partkey, and AQE decides whether
    the ~#parts-row aggregate fits a broadcast.

    The half-average is exact-decimal sum / count in both engines before
    the one double multiply, so the `<` cut is bit-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.5)
            * (F.sum(_money("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("half_avg_qty")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (F.sum(_money("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_large_volume_customers",
    """SELECT c.c_custkey, c.c_name, o.o_orderkey,
              CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                AS total_price,
              CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_qty
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey
                              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180)
       GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
       ORDER BY total_price DESC, o.o_orderkey ASC
       LIMIT 100""",
)
def q_large_volume_customers(spark, sf_dir):
    """TPC-H q18 shape: customers behind the largest-volume orders — a
    HAVING-filtered aggregate used as a semi-join filter, then the same
    fact re-joined for the detail rows. The heavy-orders set (sum qty >
    180, ~10% of orders in this data) is the semi build side; at scale
    it beats pre-joining customer×orders×lineitem and filtering late,
    because the filter collapses *before* the wide join fans rows out.
    Top-k by order value is TakeOrderedAndProject (no full sort).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_money("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 180)
        .select(F.col("l_orderkey").alias("heavy_key"))
    )
    return (
        o.join(heavy, o.o_orderkey == F.col("heavy_key"), "left_semi")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            _money("o_totalprice").cast("double").alias("total_price"),
        )
        .agg(F.sum(_money("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q_top_supplier_revenue",
    """WITH rev AS (
         SELECT l_suppkey,
                SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (1 - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(18,4))) AS total_rev
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1996-07-01'
         GROUP BY l_suppkey
       )
       SELECT s.s_suppkey, s.s_name,
              CAST(r.total_rev AS DOUBLE) AS total_rev
       FROM supplier s
       JOIN rev r ON s.s_suppkey = r.l_suppkey
       WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
       ORDER BY s.s_suppkey""",
)
def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H q15 shape: supplier(s) achieving the maximum half-year
    revenue — an aggregate reused twice (per-supplier totals AND their
    max) plus an equality against a scalar subquery. The rev aggregate
    is computed once and self-referenced; the max is one broadcast
    scalar, so the filter is map-side. Equality on exact decimals is
    safe cross-engine (no double epsilon games); ties → multiple rows,
    handled identically by both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1996-07-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price()).alias("total_rev"))
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q_disjunctive_predicates",
    """SELECT CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                          (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                          AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
              COUNT(*) AS n_lines
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity BETWEEN 1 AND 11)
          OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
              AND l.l_quantity BETWEEN 10 AND 20)
          OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
              AND l.l_quantity BETWEEN 20 AND 30)""",
)
def q_disjunctive_predicates(spark, sf_dir):
    """TPC-H q19 shape: OR-of-ANDs across both join sides. Catalyst
    splits the disjunction: the part-only disjuncts (brand OR brand OR
    brand) and the lineitem-only bounds (quantity ∈ [1,30]) are each
    implied by the full predicate, so both get derived, pushed to their
    scans as residual-OR filters, and the exact mixed predicate is
    evaluated after the join — scan output shrinks on BOTH sides even
    though no single conjunct spans the whole WHERE."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(cond)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
