"""Readers: JDBC full-table scan (S1) and Parquet scan (S3).

Reference: ``pd.read_sql_table(table, engine)`` eagerly pulls whole MySQL
tables through a single connection (etl_script_dwh/etl_dwh.py:42,
etl_script_dlh/etl_lakehouse.py:42) and ``pd.read_parquet`` pulls whole
objects (etl_lakehouse.py:51,80-82). Both are single-threaded and read all
columns. Spark-first replacements are lazy and parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Lazy, pruning/pushdown-capable Parquet scan (S3)."""
    return spark.read.parquet(path)


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Parallel JDBC scan (S1).

    Unlike the reference's single-connection full read, passing
    ``partition_column`` + bounds splits the table into ``num_partitions``
    concurrent range reads — the only way a 100 TB-adjacent OLTP extract
    finishes. Left unset, it degrades to one connection (fine for the
    tiny lookup tables).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    return reader.load()


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV scan with declared schema (never inferSchema at scale — schema
    inference is an extra full pass over 100 TB). ``mode`` PERMISSIVE
    nulls malformed columns; DROPMALFORMED / FAILFAST for stricter loads.
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """JSON-lines scan with declared schema (same no-inference rule)."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — Spark-native columnar alternative to Parquet, with the
    same pruning/pushdown behavior (vectorized reader, predicate pushdown
    via ORC stripe statistics). Useful when upstream systems (Hive, some
    CDC sinks) land ORC instead of Parquet."""
    return spark.read.orc(path)


def read_text(
    spark: SparkSession,
    path: str,
    *,
    whole_file: bool = False,
) -> DataFrame:
    """Raw-text scan: one row per line (column ``value``), or one row per
    file with ``whole_file=True`` — the ingestion shape for unstructured
    training corpora before parsing into the documents schema. Lines
    split on newline JVM-side; no Python in the read path."""
    return spark.read.text(path, wholetext=whole_file)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written across schema generations (columns added
    over time) as ONE DataFrame: ``mergeSchema`` unions the footers'
    schemas and files missing a column yield nulls for it — the
    schema-evolution read a lakehouse bronze layer needs when producers
    add fields. Merge cost is per-footer at planning time (at scale,
    prefer a declared read schema once the latest shape is known —
    Spark then projects/backfills without footer reconciliation).
    Column pruning and filter pushdown still apply per file."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
