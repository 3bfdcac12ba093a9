"""Data clustering for scan skipping: range-cluster a table on query keys.

Partitioning (directories) prunes coarse predicates; *clustering* (row
order within/across files) is the second skipping lever: Parquet stores
per-file and per-row-group min/max statistics, and a reader skips any
file whose [min, max] range misses the predicate. Random row order makes
every file's range span the whole domain — no skipping; range-clustered
writes give each file a narrow range.

``cluster_write``: repartitionByRange (global range exchange with
sampled bounds) + sortWithinPartitions, then write. This is the
single-column analog of Delta's OPTIMIZE ZORDER; for multi-column
clustering compose a composite range key or interleave bits.

tests/test_clustering.py verifies the claim from the parquet footers:
after clustering, per-file min/max ranges are disjoint-ish slivers of
the domain rather than full-domain spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_col: str,
    *,
    num_files: int = 8,
) -> None:
    """Write ``df`` range-clustered on ``cluster_col`` into ``num_files``
    files with narrow per-file statistics."""
    (
        df.repartitionByRange(num_files, F.col(cluster_col))
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key(x: F.Column, y: F.Column, *, bits: int = 8) -> F.Column:
    """Bit-interleaved Morton (Z-order) key over two pre-normalized int
    columns in [0, 2^bits) — ``x`` and ``y`` contribute alternating bits,
    so proximity on the curve implies proximity in BOTH dimensions.

    Pure shift/mask expressions: stays inside whole-stage codegen, no
    UDF. 2×8 bits covers 65,536 curve cells — plenty for file-level
    skipping (files ≫ cells would be the only reason to raise it)."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def normalize_to_bits(col: F.Column, lo: F.Column, hi: F.Column, *, bits: int = 8) -> F.Column:
    """Scale a numeric column to an integer rank in [0, 2^bits) given its
    domain bounds (pass min/max from a prior 1-row agg or table stats)."""
    cells = F.lit((1 << bits) - 1)
    return F.least(
        cells,
        F.floor((col - lo) / ((hi - lo) + F.lit(1e-12)) * (cells + F.lit(1))).cast("int"),
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    *,
    num_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` clustered on the Z-order curve of (col_x, col_y):
    multi-column scan skipping, the manual form of Delta/Iceberg
    ``OPTIMIZE ZORDER BY``.

    Single-column range clustering (``cluster_write``) gives perfect
    skipping on ONE key and none on any other; Z-order trades a little
    of each for useful skipping on BOTH — per-file min/max footers end
    up narrow in x AND y, so predicates on either column prune files.

    The domain bounds come from one tiny agg (at production scale, from
    table statistics); the write itself is repartitionByRange on the
    curve key + an in-partition sort — one range exchange, same cost
    shape as single-column clustering."""
    lo_x, hi_x, lo_y, hi_y = (
        df.agg(
            F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
        ).first()
    )
    z = zorder_key(
        normalize_to_bits(F.col(col_x), F.lit(lo_x), F.lit(hi_x), bits=bits),
        normalize_to_bits(F.col(col_y), F.lit(lo_y), F.lit(hi_y), bits=bits),
        bits=bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
