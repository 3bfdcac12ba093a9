"""Equi-joins (J1–J18, SURVEY.md §2.3) with scale-aware physical hints.

The reference's joins are all eager pandas hash-merges (``pd.merge``,
etl_script_dwh/etl_dwh.py:68-71,84-87,125-140). Spark-first: declare the
join, let Catalyst pick broadcast-hash vs sort-merge — but *hint*
broadcast for known-small dims so a 100 TB fact never shuffles to meet a
4-row lookup table.

Duplicate non-key columns: pandas silently suffixes ``_x/_y``; here the
caller projects/renames before joining (the library raises early instead
of producing ambiguous columns).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    *,
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join with optional broadcast hint on the build side.

    ``on`` accepts a column name / list (same-name keys, J1–J9) or a join
    Column expression for differing key names (J10:
    ``left.shipping_method_id == right.method_id``).

    Scale: broadcasting a small dim turns a full shuffle of the probe side
    into a map-side hash join — at 1000 executors that is the difference
    between moving 100 TB and moving 10 MB. AQE can also demote/promote at
    runtime from observed sizes.
    """
    r = F.broadcast(right) if broadcast_right else right
    if isinstance(on, str):
        return left.join(r, on, how)
    if isinstance(on, Column):
        return left.join(r, on, how)
    return left.join(r, list(on), how)
