"""Aggregations (A1–A8, SURVEY.md §2.4) as native JVM-side aggregates.

The reference's only custom aggregator is the Python callable
``groupby('book_id')['author_name'].apply(', '.join)``
(etl_script_dwh/etl_dwh.py:86) — a UDAF-shaped slow path. Re-expressed
with ``collect_list → array_sort → concat_ws``: pure built-ins, Arrow-free,
runs as partial+final hash aggregation with map-side combine. The sort
fixes the reference's accidental (merge-order-dependent) concatenation
order into a defined one — the DuckDB oracle mirrors it with
``string_agg(x, ', ' ORDER BY x)``.

COUNT/SUM/MIN/MAX/DISTINCT group-bys (A2–A8) are plain ``groupBy().agg``:
Spark plans partial aggregation before the shuffle automatically, so
high-cardinality group-bys move pre-combined partials, not raw rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_concat_sorted(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    *,
    sep: str = ", ",
    alias: str | None = None,
) -> DataFrame:
    """A1 — per-group sorted string concatenation (author lists).

    DuckDB oracle: ``string_agg(value, sep ORDER BY value)``.
    """
    out = alias or value
    return df.groupBy(*keys).agg(
        F.concat_ws(sep, F.array_sort(F.collect_list(value))).alias(out)
    )


def distinct_rows(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """A3 — distinct over a projection (reference dim_shipping feed,
    etl_script_dlh/etl_lakehouse.py:95). Planned as a hash aggregate with
    partial dedup before the shuffle."""
    if columns:
        df = df.select(*columns)
    return df.distinct()
