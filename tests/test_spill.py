"""Graceful-spill demonstration: memory-pressure behavior, asserted.

At 100 TB some partition will always exceed executor memory; the engine
contract is that operators SPILL and finish with correct results, never
OOM. Executor heap can't be shrunk at runtime in local mode, but the
SQL operators' in-memory row thresholds are runtime-settable confs —
forcing them to tiny values makes window/sort/aggregate paths take
their spill branch on ordinary testdata, which is exactly the code path
a memory-starved executor takes. plan_metrics_sum reads the actual
'spill size' SQLMetrics to prove the spill happened.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.metrics import plan_metrics_sum
from tests.conftest import SF_SMOKE

#: runtime-settable in-memory row thresholds (rows kept before the
#: buffer hands off to UnsafeExternalSorter / the sorter spills). Kept
#: moderate — a pathological threshold (e.g. 16) forces hundreds of
#: spill files per group and OOMs the shared test JVM on buffer
#: overhead, which is the opposite of the graceful behavior under test.
_SPILL_CONFS = {
    "spark.sql.windowExec.buffer.in.memory.threshold": "256",
    "spark.sql.windowExec.buffer.spill.threshold": "512",
}


@pytest.fixture
def tiny_spill_thresholds(spark):
    old = {k: spark.conf.get(k, None) for k in _SPILL_CONFS}
    for k, v in _SPILL_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _running(spark):
    """A single-group running sum over lineitem — one window partition
    far larger than the buffer threshold, so WindowExec must hand its
    buffer to the external sorter and spill. Deliberately NOT a
    rank-filter query: rank<=k gets rewritten to WindowGroupLimitExec
    (per-partition pre-limit) and only k rows per key would ever reach
    the window buffer. The skewed one-big-group shape is exactly the
    memory-pressure case a 100 TB run hits."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_rev"),
    )


def _order_rollup(li):
    from pyspark.sql import functions as F

    return li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def test_hash_aggregate_sort_fallback_spills_and_stays_correct(spark):
    """Memory-pressure behavior of the OTHER big spilling operator class:
    HashAggregateExec. When the aggregation hash map cannot grow, the
    task hands its map to the external sorter and finishes sort-based —
    ``spark.sql.TungstenAggregate.testFallbackStartsAt`` (Spark's own
    fallback-injection conf, runtime-settable) forces that branch at a
    tiny row count, which is exactly the code path a memory-starved
    executor takes on a 100 TB high-cardinality groupBy. Asserted via the
    plan's real SQLMetrics: tasks fell back, bytes spilled, and the
    result set is identical to the default in-memory run."""
    key = "spark.sql.TungstenAggregate.testFallbackStartsAt"
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    spark.conf.set(key, "100,200")
    try:
        df = _order_rollup(li)
        rows = df.collect()
        m = plan_metrics_sum(df, ["spillSize", "numTasksFallBacked"])
        assert m["numTasksFallBacked"] > 0, "fallback injection did not fire"
        assert m["spillSize"] > 0, "sort-based fallback must spill bytes"
    finally:
        spark.conf.unset(key)
    want = _order_rollup(li).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want))


def test_window_spills_gracefully_and_stays_correct(spark, tiny_spill_thresholds):
    df = _running(spark)
    rows = df.collect()
    spilled = plan_metrics_sum(df, ["spillSize"])["spillSize"]
    assert spilled > 0, (
        "the 256-row window buffer over one corpus-sized group must spill"
    )
    # correctness under spill: identical result set with default buffers
    for k in _SPILL_CONFS:
        spark.conf.unset(k)
    want = _running(spark).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want))
