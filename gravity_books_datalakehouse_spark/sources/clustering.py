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
