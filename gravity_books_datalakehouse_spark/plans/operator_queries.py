"""Per-operator query/oracle pairs covering SURVEY.md §2 row by row.

Each entry exercises one inventory operator over the driver's testdata
and has a DuckDB oracle with identical column aliases. Populated
incrementally as operators land.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable, sql: str | None) -> None:
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import all modules that self-register query/oracle pairs."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
