"""Per-operator query/oracle pairs covering SURVEY.md §2 row by row.

Each entry exercises one inventory operator over the driver's testdata
and carries a DuckDB oracle with identical column aliases (the driver
hash-compares values order-insensitively, so aliases must line up —
computed columns are aliased on BOTH sides).

Cross-engine numeric discipline: money sums run on the integer-cents
fast path (_cents/_money_sum below — primitive long arithmetic per row,
exact-decimal recombine per group, double only at the boundary), which
is bit-equal to the oracles' DECIMAL(18,2)-cast SUM + DOUBLE cast;
genuinely floating results (stddev) are rounded to 4 dp inside the
query on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.sort import bounded_sort
from gravity_books_datalakehouse_spark.sources.catalog import load_table

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query + oracle."""

    def deco(fn):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import side-effect modules that register additional pairs."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from gravity_books_datalakehouse_spark.operators import (  # noqa: F401
        dedup,
        similarity,
        text,
        multimodal,
        grouped_map,
        asof,
        packing,
        pca,
        pii,
        sketches,
        components,
        udtf_ops,
        quality,
        ranking,
        lm,
        kmeans,
        countmin,
        expectations,
        layout,
        graph,
    )
    from gravity_books_datalakehouse_spark.streaming import (  # noqa: F401
        event_queries,
    )
    from gravity_books_datalakehouse_spark.plans import (  # noqa: F401
        advanced_queries,
        merge_queries,
        sampling_queries,
        scd2,
        tpch_queries,
    )


def _money(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def lit_rows_df(
    spark: SparkSession, schema: list[tuple[str, str]], rows: list[tuple]
) -> DataFrame:
    """Small literal DataFrame as a pure-JVM relation.

    Round-13 optimization finding: ``spark.createDataFrame(local_rows)``
    backs the frame with a PYTHON RDD (``applySchemaToPythonRDD``) whose
    every scan round-trips through a Python worker — measured ~0.5-0.7 s
    PER SCAN on the bench host, and AQE materializes each broadcast/query
    stage separately so a 4-row horizons frame scanned in three plan
    branches cost multiple seconds (ev_survival_rmst: 9.9 s → 0.7 s from
    this one substitution). Building the same rows as
    ``range(1) → explode(array(struct(lit...)))`` keeps the values
    identical (same casts) but the scan is pure JVM codegen.

    Use for model-sized frames (horizons, query terms, collected model
    rows) — a thousands-of-rows literal would bloat the plan; keep
    ``createDataFrame`` for those.
    """
    if not rows:
        # JVM relation here too (ADVICE r13): createDataFrame([], schema)
        # is Python-RDD-backed — exactly the 'Scan ExistingRDD' shape this
        # helper exists to eliminate; a degenerate empty input must not
        # flip the plan shape the tests pin.
        return spark.range(0).select(
            *[F.lit(None).cast(t).alias(n) for n, t in schema]
        )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(t).alias(n)
                for (n, t), v in zip(schema, row)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
    )


def _cents(col: str, scale: int = 2) -> F.Column:
    """Exact integer hundredths of a 2-dp money column, as LONG.

    The testdata money columns (l_quantity/extendedprice/discount/tax,
    o_totalprice, c_acctbal, p_retailprice) are exactly-two-decimal
    doubles, so the double product ``x * 100`` lands within 1 ulp of the
    true integer and ``floor(x*100 + 0.5)`` recovers it exactly (for
    any sign — floor(v + 0.5) is nearest-integer for v within
    (n-0.5, n+0.5), and the half-way case cannot occur here).

    floor() stays a primitive Math.floor in whole-stage codegen —
    measured 4x faster than both F.round (which allocates a
    java.math.BigDecimal per row) and the DECIMAL(18,2) cast chain on
    the 30M-row pricing-summary shape. Downstream arithmetic is then
    pure long math.

    ``scale`` generalizes to other exactly-k-dp columns (events.value
    is exactly 4-dp → ``_cents("value", 4)`` gives exact 1e-4 units).
    """
    return F.floor(F.col(col) * (10 ** scale) + F.lit(0.5))


def _money_sum(units: F.Column, scale: int) -> F.Column:
    """Overflow-safe exact sum of integer money subunits (LONG column in
    10^-scale units; _cents -> scale 2, cents x (100 +/- cents) products
    -> scale 4/6), returned as an exact decimal.

    A single long accumulator would overflow at warehouse scale: charge
    subunits reach ~10^11 per row, so ~10^8 rows per partial sum hits
    2^63 (ANSI mode would fail the query, pre-ANSI would silently
    wrap). Instead the row value is split hi = units >> 20,
    lo = units & 0xFFFFF (exact for negatives too: two's-complement
    arithmetic shift + mask satisfy units = hi*2^20 + lo), summed as
    TWO primitive long accumulators, and recombined per GROUP in
    decimal: headroom becomes ~10^13 rows per group for hi (and 2^43
    rows for lo) — comfortably past 100 TB — while the per-row cost
    stays shift/and/add in whole-stage codegen (~2.5x faster than the
    decimal accumulator on the 30M-row shape).

    The recombine is exact by construction: DECIMAL(20,0) holds any
    long; hi*2^20 + lo is DECIMAL(29,0); multiplying by the exact
    10^-scale literal DECIMAL(scale+1,scale) yields precision
    31+scale <= 37 <= 38, so Catalyst computes the EXACT product (no
    precision-loss rounding). A final .cast("double") is then the
    single correct rounding of the true rational — bit-identical to
    summing DECIMAL(18,2)-cast inputs and casting that sum to double,
    and to DuckDB's decimal SUM + double cast (oracle-verified).
    """
    hi = F.sum(F.shiftright(units, 20)).cast("decimal(20,0)")
    lo = F.sum(units.bitwiseAND(F.lit((1 << 20) - 1))).cast("decimal(20,0)")
    ten = F.lit(10.0 ** -scale).cast(f"decimal({scale + 1},{scale})")
    return (hi * F.lit(1 << 20).cast("decimal(7,0)") + lo) * ten


def _day_lt(col: str, next_day: str) -> F.Column:
    """``CAST(col AS DATE) <= D`` expressed as ``col < D+1 day`` on the
    raw timestamp — pass ``next_day`` = the day AFTER the inclusive
    bound. Exactly equivalent for every timestamp (date-cast truncates
    toward midnight in the session zone; the literal is midnight in the
    same zone).

    Honesty note: Spark 4's UnwrapCastInBinaryComparison already
    rewrites the date-cast form into this same pushed primitive compare
    (verified in tests/test_money_exact.py), so at equal plans this is
    a readability/robustness choice, not a measured win here — it keeps
    the Parquet pushdown + partition pruning guaranteed by construction
    rather than contingent on an optimizer rule recognizing the cast,
    which matters for engines/forks where that rule is narrower.
    """
    return F.col(col) < F.lit(next_day).cast("timestamp")


def _day_ge(col: str, day: str) -> F.Column:
    """``CAST(col AS DATE) >= D`` as a raw-timestamp compare (see
    _day_lt): every timestamp on/after D's midnight."""
    return F.col(col) >= F.lit(day).cast("timestamp")


# ---------------------------------------------------------------------------
# S-class: scans / SQL surface (SURVEY.md §2.1)
# ---------------------------------------------------------------------------

@register(
    "op_s1_scan_projection",
    "SELECT r_regionkey, r_name FROM region",
)
def op_s1_scan_projection(spark, sf_dir):
    """S3+P1 — Parquet scan with column projection (pruned ReadSchema).

    Reference: pd.read_parquet + df[[cols]] (etl_lakehouse.py:51, etl_dwh.py:72).
    """
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "op_s6_sql_over_views",
    """SELECT l_returnflag, COUNT(*) AS n
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def op_s6_sql_over_views(spark, sf_dir):
    """S6/S7 — temp-view registration + spark.sql execution.

    Reference: DuckDB views over gold parquet (test_queries.py:91-97).
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM v_lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )


# ---------------------------------------------------------------------------
# P-class: projections / renames / casts / null handling (§2.2)
# ---------------------------------------------------------------------------

@register(
    "op_p2_rename",
    """SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
              s_acctbal AS account_balance
       FROM supplier""",
)
def op_p2_rename(spark, sf_dir):
    """P2 — bulk rename (reference df.rename, etl_dwh.py:73)."""
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal")
        .withColumnsRenamed(
            {"s_suppkey": "supplier_id", "s_name": "supplier_name",
             "s_acctbal": "account_balance"}
        )
    )


@register(
    "op_p4_p5_casts",
    """SELECT l_orderkey, CAST(l_quantity AS INT) AS qty_int,
              CAST(l_shipdate AS DATE) AS ship_date
       FROM lineitem""",
)
def op_p4_p5_casts(spark, sf_dir):
    """P4/P5 — int cast + timestamp→date truncation (etl_dwh.py:138-148)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


@register(
    "op_p3_dropna_after_left_join",
    """SELECT p.p_partkey, s.n_sold
       FROM part p
       LEFT JOIN (SELECT l_partkey, COUNT(*) AS n_sold FROM lineitem GROUP BY l_partkey) s
         ON p.p_partkey = s.l_partkey
       WHERE s.n_sold IS NOT NULL""",
)
def op_p3_dropna_after_left_join(spark, sf_dir):
    """P3 — left join introduces nulls, dropna removes them BEFORE casts
    (reference fact dropna, etl_dwh.py:145, etl_lakehouse.py:130)."""
    part = load_table(spark, sf_dir, "part")
    sold = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_sold"))
    )
    return (
        part.join(sold, part.p_partkey == sold.l_partkey, "left")
        .select("p_partkey", "n_sold")
        .na.drop(subset=["n_sold"])
    )


@register(
    "op_where_filter_pushdown",
    """SELECT l_orderkey, l_quantity, l_extendedprice
       FROM lineitem
       WHERE l_quantity > 30 AND l_returnflag = 'R'""",
)
def op_where_filter_pushdown(spark, sf_dir):
    """WHERE predicates (absent from the reference ETL but table stakes;
    SURVEY.md §2.2 note). Both predicates reach the Parquet scan as
    PushedFilters."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# J-class: joins (§2.3)
# ---------------------------------------------------------------------------

@register(
    "op_j_inner_chain",
    """SELECT c.c_mktsegment, r.r_name AS region_name, COUNT(*) AS n_orders
       FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY c.c_mktsegment, r.r_name
       ORDER BY c.c_mktsegment, region_name""",
)
def op_j_inner_chain(spark, sf_dir):
    """J1–J4 — inner equi-join chain through lookup dims (etl_dwh.py:68-71);
    nation/region broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("c_mktsegment", F.col("r_name").alias("region_name"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("c_mktsegment", "region_name")
    )


@register(
    "op_j_left_nulls_kept",
    """SELECT p.p_partkey, p.p_name, s.n_sold
       FROM part p
       LEFT JOIN (SELECT l_partkey, COUNT(*) AS n_sold FROM lineitem GROUP BY l_partkey) s
         ON p.p_partkey = s.l_partkey""",
)
def op_j_left_nulls_kept(spark, sf_dir):
    """J5/J6 — left join preserving unmatched rows as nulls (etl_dwh.py:84-85)."""
    part = load_table(spark, sf_dir, "part")
    sold = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_sold"))
    )
    return part.join(sold, part.p_partkey == sold.l_partkey, "left").select(
        "p_partkey", "p_name", "n_sold"
    )


@register(
    "op_j10_differing_key_names",
    """SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name
       FROM supplier s
       LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey""",
)
def op_j10_differing_key_names(spark, sf_dir):
    """J10 — left join on differently-named keys
    (left_on='shipping_method_id', right_on='method_id', etl_dwh.py:129)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey, "left"
    ).select("s_suppkey", "s_name", F.col("n_name").alias("nation_name"))


@register(
    "op_j_semi",
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def op_j_semi(spark, sf_dir):
    """Left-semi join (beyond reference; engine completeness). Planned as a
    semi hash join — no row duplication, no payload columns moved."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "op_j_anti",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def op_j_anti(spark, sf_dir):
    """Left-anti join (beyond reference): customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "op_j_skewed_salted",
    """WITH skewed AS (
         SELECT CASE WHEN event_type = 'click' THEN 0 ELSE user_id END
                  AS skew_uid,
                value
         FROM events)
       SELECT c.c_mktsegment,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              ROUND(SUM(value), 2) AS total_value
       FROM skewed e
       JOIN customer c ON e.skew_uid = c.c_custkey
       GROUP BY c.c_mktsegment
       ORDER BY c.c_mktsegment""",
)
def op_j_skewed_salted(spark, sf_dir):
    """Salted join under a deliberately hot key: all 'click' events are
    remapped to user 0, putting ~20% of the fact on ONE join key — the
    single-straggler-task shape AQE skew-join can't always fix (e.g.
    when a downstream aggregation wants the hash distribution AQE would
    have to break to split the partition). ``salted_join``
    (operators/skew.py) scatters the hot key across 8 content-derived
    salt buckets — deterministic xxhash64 salt, so retries/speculative
    tasks reproduce the same placement — while the dim side is exploded
    x8 so every (key, salt) probe hits. Result is salt-invariant (the
    oracle is a plain join), and tests/test_aqe_skew.py asserts the
    physical spread of the hot key across shuffle partitions."""
    from gravity_books_datalakehouse_spark.operators.skew import salted_join
    from gravity_books_datalakehouse_spark.streaming.event_queries import load_events

    e = load_events(spark, sf_dir).select(
        F.when(F.col("event_type") == "click", F.lit(0).cast("bigint"))
        .otherwise(F.col("user_id"))
        .alias("skew_uid"),
        "value",
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("skew_uid"), "c_mktsegment"
    )
    return (
        salted_join(e, c, "skew_uid", salt_buckets=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# A-class: aggregations (§2.4)
# ---------------------------------------------------------------------------

@register(
    "op_a1_group_concat_sorted",
    """SELECT n_regionkey, string_agg(n_name, ', ' ORDER BY n_name) AS nations
       FROM nation GROUP BY n_regionkey""",
)
def op_a1_group_concat_sorted(spark, sf_dir):
    """A1 — the reference's only UDAF-shaped op: per-group ', '.join
    (etl_dwh.py:86). Native collect_list→array_sort→concat_ws; defined
    order replaces pandas' accidental merge order (SURVEY.md §7)."""
    from gravity_books_datalakehouse_spark.operators.aggregates import (
        group_concat_sorted,
    )

    return group_concat_sorted(
        load_table(spark, sf_dir, "nation"),
        ["n_regionkey"],
        "n_name",
        alias="nations",
    )


@register(
    "op_a2_global_minmax",
    """SELECT CAST(MIN(CAST(o_orderdate AS DATE)) AS DATE) AS first_day,
              CAST(MAX(CAST(o_orderdate AS DATE)) AS DATE) AS last_day,
              COUNT(*) AS n_orders
       FROM orders""",
)
def op_a2_global_minmax(spark, sf_dir):
    """A2 — global min/max bounding the calendar (etl_dwh.py:53-54)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.agg(
        F.min(d).alias("first_day"),
        F.max(d).alias("last_day"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "op_a3_distinct",
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders""",
)
def op_a3_distinct(spark, sf_dir):
    """A3 — distinct over a projection (dim_shipping feed, etl_lakehouse.py:95)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


@register(
    "op_a_stats_kit",
    """SELECT l_returnflag,
              COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
              ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
              COUNT(DISTINCT l_partkey) AS n_parts
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def op_a_stats_kit(spark, sf_dir):
    """A4–A8 — count / sum / avg / count-distinct group-by (TPC-H q1 shape;
    reference q1/q4/q5 shapes, test_queries.py:16-26,50-67). Partial
    aggregation before the shuffle is automatic."""
    li = load_table(spark, sf_dir, "lineitem")
    sum_qty = _money_sum(_cents("l_quantity"), 2).cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            sum_qty.alias("sum_qty"),
            _money_sum(_cents("l_extendedprice"), 2).cast("double").alias("sum_price"),
            F.round(sum_qty / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# O-class: sorts / top-k (§2.5)
# ---------------------------------------------------------------------------

@register(
    "op_o_topk_desc_tiebreak",
    """SELECT o_custkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders GROUP BY o_custkey
       ORDER BY total DESC, o_custkey ASC LIMIT 7""",
)
def op_o_topk_desc_tiebreak(spark, sf_dir):
    """O2/O3 — top-k with desc + deterministic tiebreak
    (test_queries.py:35-36,47-48). Planned as TakeOrderedAndProject:
    per-partition local top-k, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(_money_sum(_cents("o_totalprice"), 2).cast("double").alias("total"))
        .orderBy(F.desc("total"), F.asc("o_custkey"))
        .limit(7)
    )


# ---------------------------------------------------------------------------
# F-class: date kit (§2.6) — the dim itself, standalone
# ---------------------------------------------------------------------------

@register(
    "op_f_date_dim_kit",
    """SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_sk,
              CAST(d AS DATE) AS full_date,
              day(d) AS day_val, month(d) AS month_val, year(d) AS year_val,
              quarter(d) AS quarter_val, dayname(d) AS day_name,
              monthname(d) AS month_name
       FROM (
         SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
         FROM (SELECT CAST(MIN(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS lo,
                      CAST(MAX(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS hi
               FROM orders)
       )""",
)
def op_f_date_dim_kit(spark, sf_dir):
    """F1–F4 — calendar generation: sequence+explode, yyyymmdd key,
    day/month/year/quarter, English day/month names
    (etl_dwh.py:52-64, etl_lakehouse.py:100-110)."""
    from gravity_books_datalakehouse_spark.functions.datekit import (
        date_dim_from_bounds,
    )

    return date_dim_from_bounds(load_table(spark, sf_dir, "orders"), "o_orderdate")


# ---------------------------------------------------------------------------
# Set operations (§2.7 — absent in reference, built-in here)
# ---------------------------------------------------------------------------

@register(
    "op_set_union_intersect_except",
    """SELECT 'active' AS src, c_custkey AS custkey FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders)
       UNION ALL
       SELECT 'dormant' AS src, c_custkey AS custkey FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
)
def op_set_union_intersect_except(spark, sf_dir):
    """Set ops: unionByName of disjoint semi/anti splits (engine
    completeness; SURVEY.md §2.7 marks them ABSENT in the reference)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    active = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        F.lit("active").alias("src"), F.col("c_custkey").alias("custkey")
    )
    dormant = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("dormant").alias("src"), F.col("c_custkey").alias("custkey")
    )
    return active.unionByName(dormant)


# ---------------------------------------------------------------------------
# W-class: window functions (§2.7 — introduced by this engine)
# ---------------------------------------------------------------------------

@register(
    "op_w_topn_per_group",
    """SELECT c_custkey, c_name, nation, rank_in_nation FROM (
         SELECT c_custkey, c_name, n_name AS nation,
                row_number() OVER (PARTITION BY n_name
                                   ORDER BY c_acctbal DESC, c_custkey ASC)
                  AS rank_in_nation
         FROM customer JOIN nation ON c_nationkey = n_nationkey
       ) WHERE rank_in_nation <= 3""",
)
def op_w_topn_per_group(spark, sf_dir):
    """row_number window — top-3 customers per nation by balance. The
    PARTITION BY distributes the window (contrast the single-partition
    dim-SK window, operators/surrogate_keys.py)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("nation").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal")
        .withColumn("rank_in_nation", F.row_number().over(w))
        .filter(F.col("rank_in_nation") <= 3)
        .select("c_custkey", "c_name", "nation", "rank_in_nation")
    )


@register(
    "op_w_running_total",
    """SELECT ym,
              CAST(month_rev AS DOUBLE) AS month_rev,
              CAST(SUM(month_rev) OVER (ORDER BY ym
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                AS cumulative_rev
       FROM (
         SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS ym,
                SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS month_rev
         FROM orders GROUP BY 1
       ) ORDER BY ym""",
)
def op_w_running_total(spark, sf_dir):
    """Running (cumulative) monthly revenue — ordered window aggregate.
    Decimal accumulation keeps it bit-equal with the oracle."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.date_format("o_orderdate", "yyyyMM").cast("int").alias("ym")
        ).agg(_money_sum(_cents("o_totalprice"), 2).alias("month_rev"))
    )
    w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return monthly.select(
        "ym",
        F.col("month_rev").cast("double").alias("month_rev"),
        F.sum("month_rev").over(w).cast("double").alias("cumulative_rev"),
    ).orderBy("ym")


# ---------------------------------------------------------------------------
# Multi-dimensional aggregation: rollup / cube (engine completeness; the
# reference has no grouping sets — SURVEY.md §2.4 notes their absence)
# ---------------------------------------------------------------------------

@register(
    "op_a_rollup",
    """SELECT o_orderstatus, o_orderpriority,
              GROUPING(o_orderstatus, o_orderpriority) AS gid,
              COUNT(*) AS n,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders
       GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
)
def op_a_rollup(spark, sf_dir):
    """ROLLUP with grouping_id — subtotal hierarchy (status → priority →
    grand total) in one pass; Spark expands grouping sets before the hash
    aggregate, so it is still a single shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            _money_sum(_cents("o_totalprice"), 2).cast("double").alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


@register(
    "op_a_cube",
    """SELECT l_returnflag, l_linestatus,
              GROUPING(l_returnflag, l_linestatus) AS gid,
              COUNT(*) AS n
       FROM lineitem
       GROUP BY CUBE(l_returnflag, l_linestatus)""",
)
def op_a_cube(spark, sf_dir):
    """CUBE over two low-cardinality flags — all 2² grouping sets."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n"))
        .select("l_returnflag", "l_linestatus", "gid", "n")
    )


# ---------------------------------------------------------------------------
# Richer analytics shapes (TPC-H-style; beyond the reference's 5 queries)
# ---------------------------------------------------------------------------

@register(
    "q_revenue_range_filter",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS promo_revenue,
              COUNT(*) AS n_lines
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
         AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
         AND l_discount BETWEEN 0.02 AND 0.09
         AND l_quantity < 24""",
)
def q_revenue_range_filter(spark, sf_dir):
    """TPC-H q6 shape: pure scan + range predicates + global agg. Every
    predicate reaches the Parquet scan; zero joins, one partial+final agg
    — the cheapest possible plan for a 100 TB revenue probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            _day_ge("l_shipdate", "1995-01-01")
            & _day_lt("l_shipdate", "1996-01-01")
            & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # cents x cents product -> exact 1e-4-unit long; see _money_sum
            _money_sum(_cents("l_extendedprice") * _cents("l_discount"), 4)
            .cast("double")
            .alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_top_urgent_orders",
    """SELECT o.o_orderkey, c.c_mktsegment,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                       (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS order_value
       FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O'
       GROUP BY o.o_orderkey, c.c_mktsegment
       ORDER BY order_value DESC, o.o_orderkey ASC
       LIMIT 10""",
)
def q_top_urgent_orders(spark, sf_dir):
    """TPC-H q3 shape: selective dim filters, 3-way join, grouped revenue,
    top-k. Order/status predicates prune the orders scan before the join.
    orders/customer grow with SF, so broadcasting is AQE's runtime call
    (it will at small SF, and falls back to shuffle join at 100 TB where
    a forced broadcast would OOM the driver)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    )
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    # integer-cents fast path: exact 1e-4-unit long product per row
    value = _money_sum(
        _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")), 4
    ).cast("double")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "c_mktsegment")
        .agg(value.alias("order_value"))
        .orderBy(F.desc("order_value"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "op_profile_columns",
    """SELECT 'o_totalprice' AS column_name,
              COUNT(*) AS n_rows,
              COUNT(o_totalprice) AS n_non_null,
              CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_val,
              CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_val,
              COUNT(DISTINCT o_custkey) AS n_distinct_custkey
       FROM orders""",
)
def op_profile_columns(spark, sf_dir):
    """Data-quality profiling (Deequ-lite): row/null/min/max/distinct in a
    single scan — the validation pass a lakehouse runs after every load.
    One pass, one partial+final agg, no matter the table size."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.lit("o_totalprice").alias("column_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_non_null"),
        F.min(_money("o_totalprice")).cast("double").alias("min_val"),
        F.max(_money("o_totalprice")).cast("double").alias("max_val"),
        F.countDistinct("o_custkey").alias("n_distinct_custkey"),
    )


@register(
    "op_pivot_event_counts",
    """SELECT user_id,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
              CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
              CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
       FROM events GROUP BY user_id""",
)
def op_pivot_event_counts(spark, sf_dir):
    """Pivot (long→wide): per-user event-type counts. The explicit value
    list keeps the output schema static — mandatory at scale (a dynamic
    pivot needs an extra distinct pass and breaks schema stability)."""
    from gravity_books_datalakehouse_spark.streaming.event_queries import load_events

    ev = load_events(spark, sf_dir)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c)
          for c in ["click", "view", "purchase", "signup", "error"]],
    )


@register(
    "op_percentiles_exact",
    """SELECT event_type,
              ROUND(quantile_cont(value, 0.25), 6) AS p25,
              ROUND(quantile_cont(value, 0.50), 6) AS p50,
              ROUND(quantile_cont(value, 0.90), 6) AS p90
       FROM events GROUP BY event_type""",
)
def op_percentiles_exact(spark, sf_dir):
    """Exact percentiles (linear interpolation) per group — Spark
    ``percentile`` vs DuckDB ``quantile_cont``, two independent
    implementations of the same estimator. At 100 TB swap for
    ``percentile_approx`` (t-digest sketch, single pass, bounded memory) —
    same call shape, sketch-accuracy trade documented here."""
    from gravity_books_datalakehouse_spark.streaming.event_queries import load_events

    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.90)"), 6).alias("p90"),
    )


@register(
    "q_nation_pair_flows",
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              COUNT(*) AS n_lines,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                       (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
       FROM lineitem l
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation sn ON s.s_nationkey = sn.n_nationkey
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation cn ON c.c_nationkey = cn.n_nationkey
       WHERE sn.n_name != cn.n_name
       GROUP BY sn.n_name, cn.n_name
       ORDER BY revenue DESC, supp_nation ASC, cust_nation ASC
       LIMIT 25""",
)
def q_nation_pair_flows(spark, sf_dir):
    """TPC-H q7 shape: cross-border revenue flows between (supplier
    nation, customer nation) pairs — two independent dimension chains
    hanging off the fact, scanned once. The 25-row nation splits are
    forced broadcasts; supplier/orders/customer grow with SF, so their
    join strategy is left to AQE (broadcast at small SF, shuffle at
    cluster scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    # integer-cents fast path: exact 1e-4-unit long product per row
    revenue = _money_sum(
        _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")), 4
    ).cast("double")
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.count(F.lit(1)).alias("n_lines"), revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("supp_nation"), F.asc("cust_nation"))
        .limit(25)
    )


@register(
    "q_heavy_suppliers_semi",
    """SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name
       FROM supplier s
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE s.s_suppkey IN (
         SELECT l_suppkey FROM lineitem
         GROUP BY l_suppkey
         HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >
                (SELECT 0.5 * SUM(CAST(l_quantity AS DECIMAL(18,2)))
                        / COUNT(DISTINCT l_suppkey) FROM lineitem)
       )""",
)
def q_heavy_suppliers_semi(spark, sf_dir):
    """TPC-H q20 shape: semi-join against an aggregated subquery with a
    scalar-subquery threshold (suppliers moving > 50% of the mean
    per-supplier volume). The threshold is one tiny scalar plan; the
    HAVING filter shrinks the semi-join build side, whose size is
    data-dependent — AQE picks broadcast when it actually fits."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    totals = li.groupBy("l_suppkey").agg(
        _money_sum(_cents("l_quantity"), 2).alias("vol")
    )
    thr = li.agg(
        (F.lit(0.5) * _money_sum(_cents("l_quantity"), 2).cast("double")
         / F.countDistinct("l_suppkey")).alias("thr")
    )
    heavy = totals.crossJoin(F.broadcast(thr)).filter(
        F.col("vol").cast("double") > F.col("thr")
    ).select("l_suppkey")
    return (
        s.join(heavy, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation_name"))
    )


@register(
    "q_market_share_by_year",
    """SELECT year(o.o_orderdate) AS order_year,
              CAST(SUM(CASE WHEN r.r_name = 'EUROPE'
                            THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
              / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                AS europe_share,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY year(o.o_orderdate)
       ORDER BY order_year""",
)
def q_market_share_by_year(spark, sf_dir):
    """TPC-H q8 shape: one region's revenue share per year — conditional
    aggregation ratio (numerator CASE inside SUM) computed in the same
    single pass as the denominator; no self-join, no second scan."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # conditional sum on the integer-cents fast path: the CASE picks a
    # long (cents or 0), both branches primitive in codegen
    price_c = _cents("l_extendedprice")
    europe = _money_sum(
        F.when(F.col("r_name") == "EUROPE", price_c).otherwise(F.lit(0)), 2
    ).cast("double")
    total = _money_sum(price_c, 2).cast("double")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg((europe / total).alias("europe_share"), total.alias("total_rev"))
        .transform(bounded_sort, "order_year")
    )


@register(
    "op_w_ntile_deciles",
    """SELECT decile,
              COUNT(*) AS n_customers,
              CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal,
              CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal
       FROM (SELECT c_acctbal,
                    ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS decile
             FROM customer)
       GROUP BY decile""",
)
def op_w_ntile_deciles(spark, sf_dir):
    """ntile window: customers bucketed into balance deciles, then
    per-decile stats — the segmentation pattern (cohorting, A/B splits).

    NOT the single-partition ``ntile() OVER (ORDER BY …)`` the oracle
    spells: distributed_ntile (operators/sort.py) range-partitions the
    sort, ranks locally, and derives the exact same tile from closed-form
    (rank, N) arithmetic — identical output, no global-window funnel."""
    from gravity_books_datalakehouse_spark.operators.sort import (
        distributed_ntile,
    )

    c = load_table(spark, sf_dir, "customer")
    tiled = distributed_ntile(
        c.select("c_acctbal", "c_custkey"),
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        10,
        "decile",
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min(_money("c_acctbal")).cast("double").alias("min_bal"),
            F.max(_money("c_acctbal")).cast("double").alias("max_bal"),
        )
    )


@register(
    "op_w_mom_growth",
    """SELECT ym,
              CAST(month_rev AS DOUBLE) AS month_rev,
              CAST(month_rev - lag(month_rev) OVER (ORDER BY ym) AS DOUBLE) AS mom_delta
       FROM (
         SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS ym,
                SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS month_rev
         FROM orders GROUP BY 1
       ) ORDER BY ym""",
)
def op_w_mom_growth(spark, sf_dir):
    """lag window: month-over-month revenue delta (decimal-exact, so the
    subtraction is bit-equal cross-engine; NULL for the first month)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyyMM").cast("int").alias("ym")
    ).agg(_money_sum(_cents("o_totalprice"), 2).alias("month_rev"))
    w = Window.orderBy("ym")
    return monthly.select(
        "ym",
        F.col("month_rev").cast("double").alias("month_rev"),
        (F.col("month_rev") - F.lag("month_rev").over(w)).cast("double").alias("mom_delta"),
    ).orderBy("ym")


@register(
    "op_f_string_kit",
    """SELECT p_partkey,
              upper(p_brand) AS brand_upper,
              substr(p_name, 1, 10) AS name_prefix,
              replace(p_type, ' ', '_') AS type_snake,
              length(p_name) AS name_len,
              levenshtein(p_brand, 'Brand#11') AS brand_dist
       FROM part""",
)
def op_f_string_kit(spark, sf_dir):
    """String function surface: case, substring, replace, length, edit
    distance — all JVM built-ins with exact DuckDB twins."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.length("p_name").alias("name_len"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#11")).alias("brand_dist"),
    )


@register(
    "op_f_array_kit",
    """SELECT vec_id,
              len(embedding) AS dim,
              ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
              ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
              ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
              ROUND(CAST(embedding[len(embedding)] AS DOUBLE), 6) AS last_val
       FROM embeddings""",
)
def op_f_array_kit(spark, sf_dir):
    """Array function surface over the embedding column: size, min/max,
    positional access — the building blocks under the similarity ops."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.element_at("embedding", -1).cast("double"), 6).alias("last_val"),
    )


@register(
    "op_f_date_kit",
    """SELECT o_orderkey,
              datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
              CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
              last_day(CAST(o_orderdate AS DATE)) AS month_end,
              CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start,
              isodow(CAST(o_orderdate AS DATE)) - 1 AS weekday_idx
       FROM orders""",
)
def op_f_date_kit(spark, sf_dir):
    """Date arithmetic surface: day diffs, month offsets (end-of-month
    clamped identically in both engines), month/quarter boundaries, and
    ISO weekday index — all JVM built-ins, no shuffle (pure projection)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.add_months(d, 3).alias("plus3m"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "quarter").alias("quarter_start"),
        F.weekday(d).alias("weekday_idx"),
    )


@register(
    "op_f_regex_kit",
    """SELECT o_orderkey,
              regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS prio_num,
              split_part(o_orderpriority, '-', 2) AS prio_word,
              len(regexp_extract_all(o_orderstatus, '[OF]')) AS of_flags,
              regexp_matches(o_orderpriority, 'URGENT|HIGH') AS is_rush
       FROM orders""",
)
def op_f_regex_kit(spark, sf_dir):
    """Regex function surface: capture-group extract, delimiter split,
    match counting, boolean match — projection-only, codegen'd."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1).alias("prio_num"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(2)).alias("prio_word"),
        F.regexp_count(F.col("o_orderstatus"), F.lit("[OF]")).alias("of_flags"),
        (F.regexp_count(F.col("o_orderpriority"), F.lit("URGENT|HIGH")) > 0).alias("is_rush"),
    )
