"""Session-scoped memo keys for persisted intermediate DataFrames.

Keyed by Spark applicationId (unique per session), NOT ``id(spark)`` —
CPython reuses object ids after GC, so an id-keyed cache could hand a
DataFrame of a stopped session to a new one. A driver that builds a
fresh SparkSession per query gets a fresh cache entry per session.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def session_key(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    return (spark.sparkContext.applicationId, sf_dir)
