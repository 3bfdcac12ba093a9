"""TPC-H-shaped analytics beyond the reference's 5 queries.

The reference's SQL surface (test_queries/test_queries.py:15-68) stops at
3-way star joins + group-by + top-k. These queries extend the engine's
proven surface to the classic warehouse shapes a lakehouse user actually
runs — full-scan pricing summaries, EXISTS decorrelation, co-location
constraints inside a join, aggregate join-backs — each with a DuckDB
oracle and the repo-wide cross-engine money discipline: integer-cents
LONG arithmetic in the hot path, exact-decimal recombine per group,
DOUBLE only at the boundary (bit-equal to the oracle's DECIMAL(18,2)
SUM; see _cents/_money_sum in operator_queries).

Scale notes are per-query; the common rule: nation/region are forced
broadcasts (fixed cardinality 25/5 forever), customer/orders/supplier
join strategy is left to AQE because they grow with SF.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

from gravity_books_datalakehouse_spark.plans.operator_queries import (
    _cents,
    _day_ge,
    _day_lt,
    _money,
    _money_sum,
    register,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table

def _disc_price_u() -> F.Column:
    """l_extendedprice * (1 - l_discount) in exact 1e-4-unit LONGs — the
    codegen-primitive form for hot aggregates: ``_money_sum(
    _disc_price_u(), 4)`` is bit-identical to summing the DECIMAL(18,2)
    -cast product (both round the same exact rational once; see the
    oracle SQL, which spells that decimal form) at ~4x the per-row
    throughput."""
    return _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))


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

    Intermediates stay exact but integer: the 2-dp money doubles become
    integer cents (LONG), disc_price/charge become 1e-4/1e-6-unit longs,
    and the overflow-safe hi/lo split-sum recombines in exact decimal
    once per group (see _cents/_money_sum). The final DOUBLE casts are
    bit-equal to the DuckDB oracle's decimal SUM + double cast because
    both round the same exact rational once.
    Averages are computed as exact SUM / COUNT rather than AVG() because
    engines disagree on streaming-mean accumulation order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Integer-cents hot path (_cents/_money_sum docstrings): per-row
    # arithmetic is pure long math in codegen, materialized ONCE per
    # unit column by the pre-aggregation projection; the exact decimal
    # rescale happens once per GROUP. disc_price is in 1e-4 units
    # (cents x (100 - disc_cents)), charge in 1e-6. Measured 2.8s ->
    # 1.2s on the 30M-row replica set, bit-identical output.
    cnt = F.count(F.lit(1))
    return (
        li.filter(_day_lt("l_shipdate", "1998-09-03"))
        .select(
            "l_returnflag",
            "l_linestatus",
            _cents("l_quantity").alias("qty_c"),
            _cents("l_extendedprice").alias("price_c"),
            _cents("l_discount").alias("disc_c"),
            _cents("l_tax").alias("tax_c"),
            (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
            .alias("disc_price_u"),
        )
        .withColumn(
            "charge_u",
            F.col("disc_price_u") * (F.lit(100) + F.col("tax_c")),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(F.col("qty_c"), 2).cast("double").alias("sum_qty"),
            _money_sum(F.col("price_c"), 2).cast("double").alias("sum_base_price"),
            _money_sum(F.col("disc_price_u"), 4).cast("double").alias("sum_disc_price"),
            _money_sum(F.col("charge_u"), 6).cast("double").alias("sum_charge"),
            (_money_sum(F.col("qty_c"), 2).cast("double") / cnt).alias("avg_qty"),
            (_money_sum(F.col("price_c"), 2).cast("double") / cnt).alias("avg_price"),
            (_money_sum(F.col("disc_c"), 2).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .transform(bounded_sort, "l_returnflag", "l_linestatus")
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
        .transform(bounded_sort, "o_orderpriority")
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
        .agg(_money_sum(_disc_price_u(), 4).cast("double").alias("revenue"))
        .transform(bounded_sort, F.desc("revenue"), F.asc("nation_name"))
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
        .agg(_money_sum(_disc_price_u(), 4).cast("double").alias("revenue"))
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
            * (_money_sum(_cents("l_quantity"), 2).cast("double") / F.count(F.lit(1)))
        ).alias("half_avg_qty")
    )
    return (
        li.join(per_part, li.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (_money_sum(_cents("l_extendedprice"), 2).cast("double") / F.lit(7.0))
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

    The join-back keeps lineitem as a pure PROBE side: the semi-filtered
    heavy-orders set carries a shuffle_hash hint, so Catalyst builds a
    hash table from the small side instead of sort-merging — which
    would SORT the full fact (measured 9.2s -> 3.6s on the 30M-row
    replica; the sort dominated). Scale-safe: the build side is the
    HAVING-filtered ~10% of orders, partitioned on orderkey, and
    shuffle partition counts grow with the cluster, so per-partition
    build stays bounded where an unfiltered build would not be.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(_money_sum(_cents("l_quantity"), 2).alias("qty"))
        .filter(F.col("qty") > 180)
        .select(F.col("l_orderkey").alias("heavy_key"))
        .hint("shuffle_hash")
    )
    return (
        o.join(heavy, o.o_orderkey == F.col("heavy_key"), "left_semi")
        .hint("shuffle_hash")
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            _money("o_totalprice").cast("double").alias("total_price"),
        )
        .agg(_money_sum(_cents("l_quantity"), 2).cast("double").alias("sum_qty"))
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
            _day_ge("l_shipdate", "1996-01-01")
            & _day_lt("l_shipdate", "1996-07-01")
        )
        .groupBy("l_suppkey")
        .agg(_money_sum(_disc_price_u(), 4).alias("total_rev"))
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev")
        )
        .transform(bounded_sort, "s_suppkey")
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
            _money_sum(_disc_price_u(), 4).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# The testdata has no partsupp table; where a classic shape needs one, a
# partsupp-like relation is DERIVED from lineitem (distinct l_partkey ×
# l_suppkey, with min observed unit price standing in for ps_supplycost).
# The derivation is itself a scale statement: one groupBy over the fact
# produces a dimension-sized relation, after which the classic plan applies.
# ---------------------------------------------------------------------------


@register(
    "q_min_cost_supplier",
    """WITH ps AS (
         SELECT l_partkey AS pk, l_suppkey AS sk,
                MIN(l_extendedprice / l_quantity) AS unit_cost
         FROM lineitem GROUP BY l_partkey, l_suppkey
       ),
       eps AS (
         SELECT ps.pk, ps.sk, ps.unit_cost, s.s_name, s.s_acctbal
         FROM ps
         JOIN supplier s ON ps.sk = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'EUROPE'
       )
       SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal,
              CAST(e.unit_cost AS DOUBLE) AS unit_cost
       FROM eps e
       JOIN (SELECT pk, MIN(unit_cost) AS min_cost FROM eps GROUP BY pk) mn
         ON e.pk = mn.pk AND e.unit_cost = mn.min_cost
       JOIN part p ON p.p_partkey = e.pk
       WHERE p.p_type = 'STANDARD' AND p.p_size <= 25
       ORDER BY p.p_partkey, e.s_name""",
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H q2 shape: for each qualifying part, the supplier(s) offering
    the minimum cost within one region — the classic correlated MIN
    subquery, decorrelated to aggregate + join-back (the q17 pattern).

    Round-7 reshape — ONE fact exchange total, dim filter BEFORE it:

    1. The region predicate resolves to a European supplier-key set
       (supplier ⋈ broadcast nation ⋈ broadcast region — dim-sized) that
       SEMI-FILTERS lineitem via broadcast before anything shuffles: at
       100 TB this cuts the only fact-sized exchange by the region
       selectivity (~5x) instead of carrying non-qualifying suppliers
       through the aggregate, which is the join-order DuckDB's optimizer
       reaches and round 6's plan (filter after the groupBy) paid for.
    2. The filtered fact is hash-partitioned ONCE on l_partkey; that
       single distribution satisfies BOTH the (pk, sk) aggregate
       (clustering on a key subset co-locates every (pk, sk) pair) AND
       the per-part min window — so groupBy → window runs with zero
       further exchanges. The old partial/final split bought almost
       nothing here anyway: lineitem has only ~1.2 rows per (pk, sk)
       pair, so partial aggregation shuffled ~full-fact row counts.
    3. Supplier names ride a broadcast join AFTER the min cut (few rows),
       same for the part attributes.

    The per-part min stays a WINDOW, not aggregate + join-back:
    join-back would re-derive the subtree (Spark does not reuse
    uncached subplans — observed as a second full lineitem scan).
    unit_cost stays an IEEE double in both engines (same division,
    same min), so the equality cut is bit-exact cross-engine.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 25)
    )
    eu_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    li_eu = li.join(
        F.broadcast(eu_sup.select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    )
    ps = (
        li_eu.select(
            F.col("l_partkey").alias("pk"),
            F.col("l_suppkey").alias("sk"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"),
        )
        .repartition(F.col("pk"))
        .groupBy("pk", "sk")
        .agg(F.min("cost").alias("unit_cost"))
    )
    min_cost = F.min("unit_cost").over(Window.partitionBy("pk"))
    return (
        ps.withColumn("min_cost", min_cost)
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(eu_sup), F.col("sk") == F.col("s_suppkey"))
        .join(p, p.p_partkey == F.col("pk"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "s_acctbal",
            F.col("unit_cost").cast("double").alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_name")
    )


@register(
    "q_profit_by_nation_year",
    """SELECT n.n_name AS nation_name,
              year(o.o_orderdate) AS o_year,
              CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                            AS DECIMAL(18,4))) AS DOUBLE)
              - 0.5 * CAST(SUM(CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) *
                                    CAST(l.l_quantity AS DECIMAL(18,2))
                                    AS DECIMAL(18,4))) AS DOUBLE) AS profit
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN part p ON l.l_partkey = p.p_partkey
       WHERE p.p_type = 'PROMO'
       GROUP BY n.n_name, year(o.o_orderdate)
       ORDER BY nation_name, o_year""",
)
def q_profit_by_nation_year(spark, sf_dir):
    """TPC-H q9 shape: profit by supplier nation × order year. Real q9
    prices cost from partsupp; with none in the testdata, cost basis is
    0.5 × retailprice × qty — the SHAPE (fact joined to 4 tables, two
    independent money aggregates combined after grouping) is what's
    exercised. Both sums stay exact DECIMAL(18,4) through aggregation
    and the 0.5× scaling happens once, in double, after the casts — so
    the arithmetic is bit-identical cross-engine. The PROMO filter on
    part prunes the probe via the part join; nation broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cost_u = _cents("p_retailprice") * _cents("l_quantity")  # exact 1e-4-unit longs
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            (
                _money_sum(_disc_price_u(), 4).cast("double")
                - F.lit(0.5) * _money_sum(cost_u, 4).cast("double")
            ).alias("profit")
        )
        .transform(bounded_sort, "nation_name", "o_year")
    )


@register(
    "q_important_part_value",
    """WITH val AS (
         SELECT l.l_partkey AS pk,
                SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS v
         FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE n.n_name = 'NATION_7'
         GROUP BY l.l_partkey
       )
       SELECT pk AS p_partkey, CAST(v AS DOUBLE) AS part_value
       FROM val
       WHERE CAST(v AS DOUBLE) >
             0.001 * (SELECT CAST(SUM(v) AS DOUBLE) FROM val)
       ORDER BY part_value DESC, p_partkey ASC""",
)
def q_important_part_value(spark, sf_dir):
    """TPC-H q11 shape: parts representing a significant share of one
    nation's traded value — a grouped aggregate filtered against a
    scalar fraction of its own total. The per-part aggregate is computed
    once; its re-aggregation to the grand total is a one-row DataFrame
    cross-joined back as a broadcast, so the HAVING-style cut is
    map-side (no second scan of lineitem, no shuffle for the scalar).
    Value sums are exact decimals; the 0.001× threshold and comparison
    run in double identically on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    val = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(_money_sum(_cents("l_extendedprice"), 2).alias("v"))
    )
    total = val.agg((F.lit(0.001) * F.sum("v").cast("double")).alias("threshold"))
    return (
        val.join(F.broadcast(total), F.col("v").cast("double") > F.col("threshold"))
        .select(
            F.col("pk").alias("p_partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


@register(
    "q_late_shipment_priority",
    """SELECT l.l_linestatus,
              COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 END) AS high_line_count,
              COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 END) AS low_line_count
       FROM orders o
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
       GROUP BY l.l_linestatus
       ORDER BY l.l_linestatus""",
)
def q_late_shipment_priority(spark, sf_dir):
    """TPC-H q12 shape: late shipments split by order priority — the
    conditional-count pivot (CASE inside COUNT) over a fact-to-fact
    join. Real q12 compares commit/receipt dates the testdata lacks;
    'late' here is shipped ≥60 days after order date, which preserves
    the defining feature: the predicate spans BOTH join inputs, so it
    cannot push below the join — it runs as a post-join filter and the
    planner knows it. Both counts come from one aggregation pass.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.expr("l_shipdate >= o_orderdate + INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .transform(bounded_sort, "l_linestatus")
    )


@register(
    "q_customer_order_distribution",
    """SELECT c_count, COUNT(*) AS custdist
       FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
             FROM customer c
             LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                               AND o.o_orderpriority <> '1-URGENT'
             GROUP BY c.c_custkey) t
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC""",
)
def q_customer_order_distribution(spark, sf_dir):
    """TPC-H q13 shape: the distribution of per-customer order counts —
    a LEFT join with a predicate INSIDE the join condition (customers
    with zero qualifying orders must survive with count 0, so the
    priority filter cannot be a WHERE), then two stacked aggregations.
    The second groupBy keys on the first's output (tiny), so the only
    real shuffle is the first count — and COUNT(o_orderkey) counts
    non-null matches only, preserving the zero bucket.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .transform(bounded_sort, F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q_promo_revenue",
    """SELECT CAST(100.0 *
                   CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                                           (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                                           AS DECIMAL(18,4))
                                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   / CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                                   (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                                   AS DECIMAL(18,4))) AS DOUBLE)
                   AS DOUBLE) AS promo_revenue
       FROM lineitem l
       JOIN part p ON l.l_partkey = p.p_partkey
       WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
         AND l.l_shipdate <  TIMESTAMP '1995-11-01'""",
)
def q_promo_revenue(spark, sf_dir):
    """TPC-H q14 shape: promo revenue share for a window — conditional
    numerator and unconditional denominator in ONE aggregation pass
    (no self-join, no second scan). The ship-date range pushes into the
    lineitem Parquet scan before the part join; both sums stay exact
    (1e-4-unit long products, decimal recombine per group) and the
    ratio is one double division at the end.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-11-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    # integer-cents fast path, CASE branches picking long units or 0
    promo = _money_sum(
        F.when(F.col("p_type") == "PROMO", _disc_price_u()).otherwise(F.lit(0)), 4
    ).cast("double")
    total = _money_sum(_disc_price_u(), 4).cast("double")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * promo / total).cast("double").alias("promo_revenue"))
    )


@register(
    "q_part_supplier_counts",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
       SELECT p.p_brand, p.p_type, p.p_size,
              COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
       FROM ps
       JOIN part p ON p.p_partkey = ps.l_partkey
       WHERE p.p_brand <> 'Brand#45'
         AND p.p_type <> 'PROMO'
         AND p.p_size IN (1, 9, 19, 23, 36, 45)
         AND ps.l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p.p_brand, p.p_type, p.p_size
       ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""",
)
def q_part_supplier_counts(spark, sf_dir):
    """TPC-H q16 shape: how many suppliers can provide each part class,
    excluding a blacklist — DISTINCT-derived partsupp, negated IN-list
    as a left-anti join (safe here: s_suppkey is never null, so NOT IN
    and ANTI agree), then COUNT(DISTINCT) over three grouping columns.

    Round-7 reshape: the part predicate keeps ~8% of parts (6 of ~50
    sizes × brand/type cuts), so the qualifying part KEYS semi-filter
    lineitem via broadcast BEFORE the fact-wide DISTINCT — the only
    fact-sized shuffle now carries ~8% of the (partkey, suppkey) pairs
    instead of all of them, which is the join order a cost-based
    optimizer reaches. The anti join's build side (negative-balance
    suppliers) broadcasts as before.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .transform(bounded_sort, F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q_sole_blame_suppliers",
    """SELECT s_name, COUNT(*) AS numwait
       FROM (
         SELECT DISTINCT s.s_name, l1.l_orderkey
         FROM supplier s
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
         JOIN orders o ON o.o_orderkey = l1.l_orderkey
         WHERE r.r_name = 'ASIA'
           AND o.o_orderstatus = 'F'
           AND l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
       )
       GROUP BY s_name
       ORDER BY numwait DESC, s_name
       LIMIT 100""",
)
def q_sole_blame_suppliers(spark, sf_dir):
    """TPC-H q21 shape: suppliers SOLELY responsible for a problem in a
    multi-supplier order ('returned' standing in for 'late' — the
    testdata has no commit/receipt dates). The classic form is a triple
    correlated EXISTS / NOT-EXISTS self-join on lineitem (the oracle
    keeps it, counting each (supplier, order) pair once via DISTINCT —
    NOT via TPC-H's min-linenumber idiom, because this testdata does
    not keep l_linenumber unique per order: sf0.1 carries 143k
    duplicate (orderkey, linenumber) pairs, and a tie at the min made
    the guard double-count exactly one qualifying order at sf0.1);
    the Spark plan replaces all three self-joins with ONE aggregation
    over lineitem:

        per order: distinct suppliers, distinct R-flag suppliers, and
        (iff exactly one) that supplier's key

    then filters n_supp > 1 ∧ n_r_supp = 1 — the EXISTS, NOT-EXISTS and
    dedup all fall out of one groupBy. At 100 TB that is one shuffle of
    (orderkey, 3 small columns) versus three fact×fact semi-joins; the
    blamed-supplier counting, orders status filter, and broadcast
    nation/region dims all act on order-cardinality rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    is_r = F.col("l_returnflag") == "R"
    # Two-phase distinct: collapsing to (orderkey, suppkey) grain first
    # shuffles each pair once, where the single-groupBy count_distinct
    # form Expands every lineitem row 3x before the exchange (~3x the
    # shuffle bytes at 100 TB for the same answer).
    # Round-7: hash-partition ONCE on l_orderkey up front — that single
    # distribution satisfies BOTH stacked groupBys (clustering on the
    # key subset co-locates every (orderkey, suppkey) pair), so the
    # second aggregate runs exchange-free. The partial/final split the
    # explicit repartition displaces bought little: lineitem carries
    # ~1.1 rows per (orderkey, suppkey) pair, so partial aggregation
    # shuffled near-full row counts anyway.
    pair_stats = (
        li.select("l_orderkey", "l_suppkey", is_r.cast("int").alias("is_r"))
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_r").alias("has_r"))
    )
    order_stats = pair_stats.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_r_supp"),
        F.max(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias(
            "blame_supp"
        ),
    )
    blamed = order_stats.filter(
        (F.col("n_supp") > 1) & (F.col("n_r_supp") == 1)
    ).join(o, F.col("l_orderkey") == o.o_orderkey, "left_semi")
    return (
        blamed.join(s, F.col("blame_supp") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "q_idle_rich_customers",
    """SELECT c.c_mktsegment, COUNT(*) AS numcust,
              CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                AS totacctbal
       FROM customer c
       WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                        AS DOUBLE) / COUNT(*)
                            FROM customer WHERE c_acctbal > 0)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderdate >= TIMESTAMP '2000-01-01')
       GROUP BY c.c_mktsegment
       ORDER BY c.c_mktsegment""",
)
def q_idle_rich_customers(spark, sf_dir):
    """TPC-H q22 shape: above-average-balance customers with no recent
    orders (market segment standing in for the phone country code the
    testdata lacks). Two decorrelations in one query: the scalar AVG
    subquery becomes a one-row broadcast joined with the comparison AS
    the join condition (map-side filter, no shuffle), and NOT EXISTS
    becomes a left-anti join against date-filtered orders — the date
    predicate pushes into the orders scan, shrinking the anti build
    side to recent orders only. Average is exact-decimal SUM / COUNT,
    the repo-wide rule for cross-engine mean equality.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (_money_sum(_cents("c_acctbal"), 2).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _money_sum(_cents("c_acctbal"), 2).cast("double").alias("totacctbal"),
        )
        .transform(bounded_sort, "c_mktsegment")
    )
