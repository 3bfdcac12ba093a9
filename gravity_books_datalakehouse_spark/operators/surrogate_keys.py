"""Surrogate-key generation (P6, SURVEY.md §7 'hard parts').

Reference SKs are dense, 1-based, insertion-ordered: ``df.insert(0, sk,
range(1, 1+len(df)))`` (etl_script_dlh/etl_lakehouse.py:88,92,97) or MySQL
AUTO_INCREMENT + read-back (etl_script_dwh/etl_dwh.py:103-118). Spark has
no auto-increment; three strategies with different scale trade-offs:

- ``row_number`` — dense 1..N over a global ``Window.orderBy(natural_key)``.
  Deterministic and oracle-replayable (``row_number() OVER (ORDER BY k)``),
  but the unpartitioned window funnels all rows through ONE task. Correct
  choice for *dimensions* (≤ millions of rows), never for 100 TB facts.
- ``zip_index`` — dense 0..N-1 via ``zipWithIndex`` after a sort: fully
  distributed (per-partition counts + offset), the scale answer when
  density matters. Two jobs (count pass + map pass).
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
