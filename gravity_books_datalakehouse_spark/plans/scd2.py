"""SCD Type-2 dimension builder — Kimball change tracking.

The reference rebuilds dimensions from scratch every run (full refresh,
etl_script_dlh/etl_lakehouse.py:21-35), losing history. Type-2 keeps it:
each natural key carries versioned rows with [valid_from, valid_to)
ranges and an is_current flag.

``build_scd2`` derives the versioned dimension from a *change feed*
(snapshots or CDC rows: natural key, attributes, change timestamp) in one
window pass per key: dedupe consecutive identical attribute rows, then
``lead(change_ts)`` closes each version. Linear, one shuffle on the
natural key — no iterative merge.

Pairs with the as-of join (operators/asof.py): fact rows look up the
dimension version valid at their event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_scd2(
    changes: DataFrame,
    natural_key: str,
    attr_cols: list[str],
    change_ts: str,
) -> DataFrame:
    """Versioned dimension from a change feed.

    Consecutive rows with identical attributes collapse into one version
    (idempotent under snapshot re-delivery). Output: natural key, attrs,
    valid_from, valid_to (null = open), is_current, version (1-based).
    """
    # drop consecutive duplicates: attribute fingerprint vs previous row
    fp = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in attr_cols]))
    # Both windows order by (change_ts, attribute fingerprint): snapshot/
    # CDC feeds routinely deliver two change rows for the same natural key
    # with identical timestamps, and ordering by timestamp alone makes
    # lag/lead/row_number nondeterministic between runs. The fingerprint
    # tiebreak pins a total order (ties with identical attributes collapse
    # in the dedupe step anyway, so the arbitrary-but-stable choice among
    # equal-ts distinct-attr rows is documented behavior, not chance).
    w_ordered = Window.partitionBy(natural_key).orderBy(
        F.col(change_ts).asc(), F.col("__fp").asc()
    )
    deduped = (
        changes.withColumn("__fp", fp)
        .withColumn("__prev_fp", F.lag("__fp").over(w_ordered))
        .filter(F.col("__prev_fp").isNull() | (F.col("__fp") != F.col("__prev_fp")))
    )
    w2 = Window.partitionBy(natural_key).orderBy(
        F.col(change_ts).asc(), F.col("__fp").asc()
    )
    return (
        deduped.withColumn("valid_from", F.col(change_ts))
        .withColumn("valid_to", F.lead(change_ts).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.row_number().over(w2))
        .select(natural_key, *attr_cols, "valid_from", "valid_to", "is_current", "version")
    )


def lookup_at(dim_scd2: DataFrame, natural_key: str, at_ts) -> DataFrame:
    """Point-in-time dimension slice: versions valid at ``at_ts``."""
    at_col = F.lit(at_ts).cast("timestamp")
    return dim_scd2.filter(
        (F.col("valid_from") <= at_col)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at_col))
    )
