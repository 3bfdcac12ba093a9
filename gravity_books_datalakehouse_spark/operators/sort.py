"""Sorts / limits / top-k (O1–O5, SURVEY.md §2.5).

Every reference query carries a total ORDER BY with deterministic
tiebreakers (test_queries/test_queries.py:25,35,47,57,66) because its
harness compares order-sensitively. We preserve the tiebreakers.

Scale: ``orderBy(...).limit(k)`` is planned as TakeOrderedAndProject —
each partition keeps only its local top-k and the driver merges k·P rows,
never a global sort. A full ORDER BY without limit is a range-partitioned
sort (sampling + exchange); keep those for final small outputs only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """O2/O3 — true top-k: ``orderBy(*order).limit(k)``.

    Pass fully-tiebroken ``order`` columns (e.g. ``[desc("cnt"),
    asc("title")]``) so the selected k rows are deterministic.
    """
    return df.orderBy(*order).limit(k)
