"""Projections / renames / casts / null filters (P1–P5, SURVEY.md §2.2).

Reference pandas forms: ``df[[cols]].copy()`` (etl_script_dwh/etl_dwh.py:72),
``df.rename(columns={...})`` (:73), ``df.dropna(inplace=True)`` (:145),
``astype(int)`` (:147-148), ``pd.to_datetime(col).dt.date`` (:138-139).

Each maps to a narrow (no-shuffle) Spark transformation that stays inside
whole-stage codegen; projections additionally feed Catalyst's column
pruning so only referenced Parquet columns are read at all.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame


def project(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """P1 — column projection. Unlike pandas' copy, this *shrinks the scan*:
    Catalyst pushes the column set into the Parquet reader (ReadSchema)."""
    return df.select(*columns)


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P2 — bulk column rename (metadata-only, zero cost)."""
    return df.withColumnsRenamed(dict(mapping))


def cast_columns(df: DataFrame, types: Mapping[str, str]) -> DataFrame:
    """P4/P5 — cast named columns to Spark SQL type strings
    (e.g. ``{"customer_sk": "int", "order_date": "date"}``)."""
    return df.withColumns({c: df[c].cast(t) for c, t in types.items()})


def drop_null_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """P3 — drop rows with any null in ``subset`` (reference: fact rows whose
    dim lookup failed, etl_dwh.py:145). Order matters vs casting: drop
    nulls *before* int casts, as the reference does."""
    return df.na.drop(subset=list(subset) if subset else None)
