"""Bucketed tables: pre-shuffled storage for exchange-free fact joins.

The one non-broadcast join in the whole star build is lineitem ⋈ orders
on orderkey (plans/star.py). At 100 TB that is THE shuffle: every row of
both tables crosses the network once per run. Bucketing amortizes it to
zero: write both tables bucketed by the join key into the warehouse
catalog, and every subsequent join on that key is planned WITHOUT any
Exchange — each task zips bucket i of both sides locally.

This is the write-once/join-many trade: the bucketed write pays one
shuffle; every downstream run saves one. For a daily 100 TB pipeline
with N consumers that is a 1:N·runs exchange saving. (Delta/Iceberg
equivalents: clustered write / sorted files + storage-partitioned joins.)

tests/test_bucketing.py asserts the joined plan contains no
Exchange/ShuffleExchange nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    *,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets additionally removes the per-task sort from
    downstream sort-merge joins — the join becomes a pure zip merge.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket keys."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
