"""Writers: Parquet overwrite (S2, S5) and JDBC append (S4).

Reference: ``df.to_parquet('s3://…/layer/t.parquet', index=False)`` one
object per table (etl_script_dlh/etl_lakehouse.py:43,58,66,72,113-116,134)
and chunked ``df.to_sql(..., if_exists='append', chunksize=1000)``
(etl_script_dwh/etl_dwh.py:108,152). Layer reset (S5) is truncate/rm —
here simply ``mode("overwrite")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def overwrite_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    coalesce: int | None = None,
) -> None:
    """Full-refresh Parquet write (S2 + S5 semantics).

    ``partition_by`` is the 100 TB lever the reference lacks (it writes one
    unpartitioned object per table): partition the fact by a date column so
    downstream range queries prune files. ``coalesce`` caps the output file
    count for small dims (avoid 32 tiny files for a 4-row table).
    """
    if coalesce is not None:
        df = df.coalesce(coalesce)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def append_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """Chunked JDBC append (S4); ``batchsize`` replaces pandas chunksize."""
    props = {"batchsize": str(batchsize), **(properties or {})}
    df.write.mode("append").options(**props).jdbc(url, table, properties=props)


def overwrite_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    coalesce: int | None = None,
) -> None:
    """Full-refresh ORC write — same contract as overwrite_parquet for
    pipelines whose downstream consumers (Hive, Presto/Trino legacy
    catalogs) expect ORC."""
    if coalesce is not None:
        df = df.coalesce(coalesce)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
