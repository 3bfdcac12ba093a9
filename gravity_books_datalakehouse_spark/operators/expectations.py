"""Declarative data-quality expectations (beyond-reference, §2.8).

The validation layer every production lakehouse runs at ingest — the
public analogs are dbt tests, Great Expectations suites, and Delta
CHECK constraints. An expectation is (table, rule name, boolean
predicate); the gate evaluates every rule over its table in ONE
conditional-aggregation pass per table (no per-rule scans) and reports
row/violation counts with a pass flag.

Scale shape: each table contributes exactly one scan and one
single-row aggregate (partial aggregation collapses every partition to
one row of counters before a singleton exchange); rules are columns,
not jobs, so adding a rule is free. The union of per-table reports is
driver-sized.

Reference parity note: the reference has no validation at all —
etl_script_dwh/etl_dwh.py loads whatever the OLTP source holds; this
is the layer that would have caught its silent NULL keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table

#: (table, rule_name, spark_predicate, duckdb_predicate) — predicate is
#: TRUE for GOOD rows; a violation is NOT predicate (nulls count as
#: violations via the coalesce in the evaluator).
RULES: list[tuple[str, str, str]] = [
    ("lineitem", "quantity_in_1_50", "l_quantity BETWEEN 1 AND 50"),
    ("lineitem", "discount_in_0_0.1", "l_discount BETWEEN 0.00 AND 0.10"),
    ("lineitem", "shipdate_not_null", "l_shipdate IS NOT NULL"),
    ("lineitem", "extendedprice_positive", "l_extendedprice > 0"),
    ("orders", "totalprice_positive", "o_totalprice > 0"),
    ("orders", "orderdate_not_null", "o_orderdate IS NOT NULL"),
    ("orders", "status_known", "o_orderstatus IN ('O', 'F', 'P')"),
    ("documents", "n_chars_matches_text", "n_chars = length(text)"),
    ("documents", "text_nonempty", "length(text) > 0"),
]


def expectations_report(
    spark: SparkSession, sf_dir: str, rules: list[tuple[str, str, str]] = RULES
) -> DataFrame:
    """One row per rule: (table_name, rule, n_rows, n_violations, pass)."""
    per_table: dict[str, list[tuple[str, str]]] = {}
    for table, name, pred in rules:
        per_table.setdefault(table, []).append((name, pred))

    reports: list[DataFrame] = []
    for table, table_rules in per_table.items():
        df = load_table(spark, sf_dir, table)
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(
                    F.when(~F.coalesce(F.expr(pred), F.lit(False)), 1).otherwise(0)
                ).alias(f"v_{i}")
                for i, (_, pred) in enumerate(table_rules)
            ],
        )
        entries = F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"), F.col(f"v_{i}").alias("n_violations")
                )
                for i, (name, _) in enumerate(table_rules)
            ]
        )
        reports.append(
            agg.select(
                F.lit(table).alias("table_name"),
                "n_rows",
                F.explode(entries).alias("e"),
            ).select(
                "table_name",
                F.col("e.rule").alias("rule"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("e.n_violations").cast("bigint").alias("n_violations"),
                (F.col("e.n_violations") == 0).alias("pass"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("table_name", "rule")


def _expectations_sql() -> str:
    parts = []
    for table, name, pred in RULES:
        parts.append(
            f"""SELECT '{table}' AS table_name, '{name}' AS rule,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(CASE WHEN NOT COALESCE({pred}, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violations,
                 SUM(CASE WHEN NOT COALESCE({pred}, FALSE) THEN 1 ELSE 0 END) = 0
                   AS pass
          FROM {table}"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY table_name, rule"


@register("op_expectations_check", _expectations_sql())
def op_expectations_check(spark, sf_dir):
    """Run the expectation suite (RULES) over the lakehouse tables. The
    oracle evaluates the identical predicates per rule; the Spark plan
    evaluates all of a table's rules inside one aggregate scan. Wire
    this before a MERGE (sources/snapshots.py) to gate bad batches —
    the quarantine split is the same predicate as a filter."""
    return expectations_report(spark, sf_dir)
