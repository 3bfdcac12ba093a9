"""Medallion pipeline: layer materialization + gold ≡ in-memory star."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.medallion import (
    register_gold_views,
    run_medallion,
)
from gravity_books_datalakehouse_spark.plans.star import build_star, q1_monthly_sales
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    lake_dir = str(tmp_path_factory.mktemp("lake"))
    paths = run_medallion(spark, SF_SMOKE, lake_dir)
    return lake_dir, paths


def test_all_layers_written(spark, lake):
    lake_dir, paths = lake
    assert len([k for k in paths if k.startswith("bronze/")]) == 10
    assert len([k for k in paths if k.startswith("silver/")]) == 5
    assert len([k for k in paths if k.startswith("gold/")]) == 5


def test_gold_fact_matches_star(spark, lake):
    lake_dir, _ = lake
    star_fact = build_star(spark, SF_SMOKE)["fact_sales"]
    gold_fact = spark.read.parquet(f"{lake_dir}/gold/fact_sales")
    assert gold_fact.count() == star_fact.count()
    # partition column materialized and consistent with date_sk
    bad = gold_fact.filter(
        F.col("month_sk") != (F.col("date_sk") / 100).cast("int")
    ).count()
    assert bad == 0


def test_gold_views_answer_q1(spark, lake):
    lake_dir, _ = lake
    register_gold_views(spark, lake_dir)
    via_views = spark.sql(
        """SELECT d.year_val, d.month_val, d.month_name,
                  COUNT(f.part_sk) AS num_sold,
                  CAST(SUM(CAST(f.extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           FROM fact_sales f JOIN dim_date d ON f.date_sk = d.date_sk
           GROUP BY d.year_val, d.month_val, d.month_name
           ORDER BY d.year_val, d.month_val"""
    ).collect()
    via_star = q1_monthly_sales(spark, SF_SMOKE).collect()
    assert via_views == via_star


def test_partition_pruning_on_gold_fact(spark, lake):
    """A month predicate must prune partitions at the scan."""
    lake_dir, _ = lake
    fact = spark.read.parquet(f"{lake_dir}/gold/fact_sales")
    one_month = fact.filter(F.col("month_sk") == 199501)
    plan = one_month._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    partition_filters = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "month_sk" in partition_filters
    assert one_month.count() > 0


def test_incremental_append_touches_only_target_partition(spark, lake):
    from gravity_books_datalakehouse_spark.plans.medallion import (
        append_fact_increment,
    )

    lake_dir, _ = lake
    fact_path = f"{lake_dir}/gold/fact_sales"
    before = spark.read.parquet(fact_path)
    months = sorted(
        r.month_sk for r in before.select("month_sk").distinct().collect()
    )
    target, untouched = months[0], months[1]
    n_target_before = before.filter(F.col("month_sk") == target).count()
    n_untouched_before = before.filter(F.col("month_sk") == untouched).count()

    # replacement increment for the target month: single synthetic row
    incr = spark.createDataFrame(
        [(1, 1, 1, target * 100 + 1, 1.0, 10.0, 0.0, 0.0)],
        "customer_sk int, part_sk int, priority_sk int, date_sk int, "
        "quantity double, extendedprice double, discount double, tax double",
    )
    append_fact_increment(spark, lake_dir, incr)

    after = spark.read.parquet(fact_path)
    assert after.filter(F.col("month_sk") == target).count() == 1
    assert after.filter(F.col("month_sk") == untouched).count() == n_untouched_before
    assert n_target_before > 1  # it really replaced a populated partition


GOLD_QUERIES_SQL = {
    # the 5 reference-shape queries over gold views — executable verbatim
    # by Spark (temp views) AND DuckDB (views over the same parquet files),
    # mirroring test_queries/test_queries.py:70-101 in the reference
    "g1": """SELECT d.year_val, d.month_val, d.month_name,
                    COUNT(f.part_sk) AS num_sold,
                    CAST(SUM(CAST(f.extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             FROM fact_sales f JOIN dim_date d ON f.date_sk = d.date_sk
             GROUP BY d.year_val, d.month_val, d.month_name
             ORDER BY d.year_val, d.month_val""",
    "g2": """SELECT f.part_sk, p.p_name, p.p_brand, COUNT(f.part_sk) AS units_sold
             FROM fact_sales f JOIN dim_part p ON f.part_sk = p.part_sk
             GROUP BY f.part_sk, p.p_name, p.p_brand
             ORDER BY units_sold DESC, p.p_name ASC, f.part_sk ASC LIMIT 10""",
    "g3": """SELECT f.customer_sk, c.c_name, c.nation_name,
                    CAST(SUM(CAST(f.extendedprice AS DECIMAL(18,2)) *
                             (1 - CAST(f.discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_spend
             FROM fact_sales f JOIN dim_customer c ON f.customer_sk = c.customer_sk
             GROUP BY f.customer_sk, c.c_name, c.nation_name
             ORDER BY total_spend DESC, f.customer_sk ASC LIMIT 5""",
    "g4": """SELECT c.nation_name,
                    CAST(SUM(CAST(f.extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
             FROM fact_sales f JOIN dim_customer c ON f.customer_sk = c.customer_sk
             GROUP BY c.nation_name
             ORDER BY total_sales DESC, c.nation_name ASC""",
    "g5": """SELECT p.order_priority, COUNT(*) AS num_uses
             FROM fact_sales f JOIN dim_priority p ON f.priority_sk = p.priority_sk
             GROUP BY p.order_priority
             ORDER BY num_uses DESC, p.order_priority ASC""",
}


def test_all_five_reference_queries_on_gold_vs_duckdb(spark, lake):
    """The reference harness architecture end-to-end (test_queries.py):
    identical SQL strings run by two engines over the SAME materialized
    gold parquet, compared cell-by-cell."""
    import duckdb
    import glob as g

    lake_dir, _ = lake
    register_gold_views(spark, lake_dir)
    con = duckdb.connect()
    for t in ("dim_customer", "dim_part", "dim_priority", "dim_date", "fact_sales"):
        files = sorted(g.glob(f"{lake_dir}/gold/{t}/**/*.parquet", recursive=True))
        assert files, t
        # hive_partitioning restores month_sk from the fact's directory layout
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet({files!r}, hive_partitioning=true)"
        )
    from tests.conftest import normalize

    for name, sql in GOLD_QUERIES_SQL.items():
        got = normalize(spark.sql(sql).toPandas())
        want = normalize(con.execute(sql).fetchdf())
        assert list(got.columns) == list(want.columns), name
        assert got.equals(want), f"{name} differs"
    con.close()


def test_dynamic_partition_pruning_from_dim_filter(spark, lake):
    """A dim-side filter must prune gold fact partitions at RUNTIME via
    dynamic partition pruning — the fact scan carries a dynamicpruning
    subquery on month_sk, so a year's query reads a year's partitions
    even though the months are only known after filtering dim_date."""
    lake_dir, _ = lake
    fact = spark.read.parquet(f"{lake_dir}/gold/fact_sales")
    dim = (
        spark.read.parquet(f"{lake_dir}/gold/dim_date")
        .filter(F.col("year_val") == 1996)
        .withColumn("month_sk", (F.col("date_sk") / 100).cast("int"))
        .select("month_sk")
        .distinct()
    )
    j = fact.join(dim, "month_sk").agg(F.count(F.lit(1)).alias("n"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert j.first().n > 0


def test_late_arriving_dimension_kept_and_reconciled(spark):
    """Early-arriving facts survive the SK lookup as UNRESOLVED_SK and a
    later reconcile resolves exactly them, leaving others untouched."""
    from pyspark.sql import functions as F

    from gravity_books_datalakehouse_spark.plans.medallion import (
        UNRESOLVED_SK,
        reconcile_late_dims,
        resolve_with_late_dims,
    )

    fact = spark.createDataFrame(
        [(101, 10.0), (102, 20.0), (999, 30.0)],  # 999 has no dim member yet
        "cust_nk long, amount double",
    )
    dim_v1 = spark.createDataFrame(
        [(1, 101), (2, 102)], "customer_sk int, cust_nk long"
    )
    loaded = resolve_with_late_dims(fact, dim_v1, "cust_nk", "customer_sk")
    rows = {r.cust_nk: r.customer_sk for r in loaded.collect()}
    assert rows == {101: 1, 102: 2, 999: UNRESOLVED_SK}
    assert loaded.count() == 3  # nothing dropped

    # the dim catches up; reconcile touches only the unresolved row
    dim_v2 = dim_v1.union(
        spark.createDataFrame([(3, 999)], "customer_sk int, cust_nk long")
    )
    fixed = reconcile_late_dims(loaded, dim_v2, "cust_nk", "customer_sk")
    rows = {r.cust_nk: (r.customer_sk, r.amount) for r in fixed.collect()}
    assert rows == {101: (1, 10.0), 102: (2, 20.0), 999: (3, 30.0)}

    # still-missing members stay UNRESOLVED (idempotent under no-op dim)
    again = reconcile_late_dims(loaded, dim_v1, "cust_nk", "customer_sk")
    assert {r.customer_sk for r in again.filter(F.col("cust_nk") == 999).collect()} == {
        UNRESOLVED_SK
    }


def test_reconcile_late_dims_keeps_null_sk_rows(spark):
    """A NULL sk (e.g. from a plain left-join loader) is unresolved, not
    droppable — reconcile must re-probe it, never lose it (round-4
    review repro)."""
    from gravity_books_datalakehouse_spark.plans.medallion import (
        UNRESOLVED_SK,
        reconcile_late_dims,
    )

    fact = spark.createDataFrame(
        [(101, 1, 10.0), (999, UNRESOLVED_SK, 20.0), (555, None, 30.0)],
        "cust_nk long, customer_sk int, amount double",
    )
    dim = spark.createDataFrame(
        [(1, 101), (7, 555)], "customer_sk int, cust_nk long"
    )
    fixed = reconcile_late_dims(fact, dim, "cust_nk", "customer_sk")
    rows = {r.cust_nk: r.customer_sk for r in fixed.collect()}
    assert rows == {101: 1, 999: UNRESOLVED_SK, 555: 7}
