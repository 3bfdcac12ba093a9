"""Surrogate-key generation (P6, SURVEY.md §7 'hard parts').

Reference SKs are dense, 1-based, insertion-ordered: ``df.insert(0, sk,
range(1, 1+len(df)))`` (etl_script_dlh/etl_lakehouse.py:88,92,97) or MySQL
AUTO_INCREMENT + read-back (etl_script_dwh/etl_dwh.py:103-118). Spark has
no auto-increment; three strategies with different scale trade-offs:

- ``dense`` (default for the star build) — dense 1..N with the SAME total
  order as ``row_number() OVER (ORDER BY k)`` but fully distributed:
  range-repartition on the key (global order across partitions), local
  row_number per partition (window keyed on spark_partition_id — shuffles
  by pid, never funnels through one task), then add broadcast per-
  partition offsets (a metadata-sized aggregate). Stays entirely JVM-side
  — no Python/RDD round-trip — and is exactly oracle-replayable, so it is
  safe at billion-row dimension scale AND hash-identical to the DuckDB
  oracle at test scale.
- ``row_number`` — dense 1..N over a global ``Window.orderBy(natural_key)``.
  Same values as ``dense``, but the unpartitioned window funnels all rows
  through ONE task: only for small lookup tables.
- ``zip_index`` — dense via ``zipWithIndex`` after a sort: distributed,
  but crosses the Python RDD boundary (row-at-a-time serialization) —
  kept for API parity; prefer ``dense``.
- ``hash`` — ``xxhash64(natural_key)``: embarrassingly parallel, stable
  across runs, not dense. The scale answer when density does NOT matter
  (joins only need consistency between dim and fact within a run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_surrogate_key(
    df: DataFrame,
    order_by: str | list[str],
    sk_name: str,
    *,
    method: str = "row_number",
) -> DataFrame:
    """Prepend surrogate key ``sk_name`` ordered by ``order_by``."""
    keys = [order_by] if isinstance(order_by, str) else list(order_by)
    if method == "dense":
        key_cols = [F.col(k) for k in keys]
        # Range partitioning puts partition i's keys strictly before
        # partition i+1's, so (partition offset + local row_number)
        # reproduces the global row_number order without a global window.
        ordered = df.repartitionByRange(*key_cols).withColumn(
            "__pid", F.spark_partition_id()
        )
        counts = ordered.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
        # offsets: running sum over the (n_partitions)-row counts table —
        # the only single-partition window is over this metadata, not data
        w_off = (
            Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = counts.withColumn(
            "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
        ).select("__pid", "__off")
        w_local = Window.partitionBy("__pid").orderBy(*key_cols)
        out = (
            ordered.withColumn("__rn", F.row_number().over(w_local))
            .join(F.broadcast(offsets), "__pid")
            .withColumn(sk_name, (F.col("__off") + F.col("__rn")).cast("int"))
        )
        return out.select(sk_name, *[c for c in df.columns])
    if method == "row_number":
        w = Window.orderBy(*[F.col(k) for k in keys])
        out = df.withColumn(sk_name, F.row_number().over(w).cast("int"))
    elif method == "zip_index":
        ordered = df.orderBy(*keys)
        schema = ordered.schema
        rdd = ordered.rdd.zipWithIndex().map(lambda p: (p[1] + 1, *p[0]))
        out = ordered.sparkSession.createDataFrame(
            rdd, schema=f"{sk_name} long, " + ",".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            ),
        )
        return out
    elif method == "hash":
        out = df.withColumn(sk_name, F.xxhash64(*[F.col(k) for k in keys]))
    else:
        raise ValueError(f"unknown SK method: {method}")
    return out.select(sk_name, *[c for c in df.columns])
