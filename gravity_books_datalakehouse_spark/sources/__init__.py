"""Sources & sinks: scans (S1–S3, S6–S8) and writes (S2, S4, S5).

Reference inventory: SURVEY.md §2.1 — JDBC full-table scan, Parquet
read/write per medallion layer, SQL-view registration, JDBC append sink,
layer reset. Re-expressed as lazy Spark readers/writers.
"""

from gravity_books_datalakehouse_spark.sources.catalog import (
    TESTDATA_TABLES,
    load_table,
    load_tables,
    register_views,
)
from gravity_books_datalakehouse_spark.sources.readers import (
    read_jdbc_table,
    read_parquet,
)
from gravity_books_datalakehouse_spark.sources.writers import (
    overwrite_parquet,
    append_jdbc,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_jdbc_table",
    "read_parquet",
    "overwrite_parquet",
    "append_jdbc",
]
