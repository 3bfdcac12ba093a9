"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query at sf0.001 (smoke check).
- ``queries()``      — name → (spark, sf_dir) → DataFrame, one per
  implemented operator/query from SURVEY.md §2.
- ``oracle_sql()``   — matching DuckDB SQL per query name (identical
  column aliases; driver hash-compares values order-insensitively).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gravity_books_datalakehouse_spark.plans.star import (
    q1_monthly_sales,
    star_queries,
    star_oracle_sql,
)

_REGISTRY: list[tuple[dict, dict]] = []


def _registry() -> tuple[dict, dict]:
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    qs.update(star_queries())
    oracles.update(star_oracle_sql())

    from gravity_books_datalakehouse_spark.plans import operator_queries

    qs.update(operator_queries.queries())
    oracles.update(operator_queries.oracle_sql())
    return qs, oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_monthly_sales(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
