"""Small-file compaction: rewrite a parquet table into target-sized files.

The long-running-lakehouse problem the reference never meets: streaming
and incremental writes (streaming/events.py, plans/medallion.py
append_fact_increment) accumulate small files; scans then pay per-file
open cost and lose row-group-sized reads. Compaction bin-packs data back
into ~target-sized files, preserving partition directories.

Spark-first: sizing is computed from the table's actual on-disk bytes;
the rewrite is one job (scan → repartition(n) → overwrite). For
partitioned tables, pass partition_by so directory layout (and partition
pruning) is preserved. At 100 TB run it per-partition on a schedule,
compacting only partitions whose small-file count crosses a threshold.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def table_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a parquet table directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite ``path`` into ceil(total/target) files; returns (files
    before, files after). Overwrite goes through a staging read so the
    source is fully materialized before the destructive write."""
    n_before, total = table_file_stats(path)
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    staged = df.repartition(n_files)
    staged.cache()
    staged.count()  # materialize before overwriting the input
    writer = staged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    staged.unpersist()
    n_after, _ = table_file_stats(path)
    return n_before, n_after
