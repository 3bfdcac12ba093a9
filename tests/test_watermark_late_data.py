"""Watermark semantics: once a window is finalized and emitted (append
mode), a later-arriving event for it is dropped — no duplicate emission,
no state resurrection.

Note Spark's *documented* guarantee is one-sided: data within the
watermark is never dropped; data beyond it MAY still be merged if the
window's state has not been evicted yet (eviction runs at batch end).
So the correct assertable behavior needs the eviction to happen in an
EARLIER batch than the late arrival — three micro-batches below."""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA


def _write_chunk(spark, rows, out_dir, name, mtime):
    tmp = out_dir + f"_{name}_tmp"
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.makedirs(out_dir, exist_ok=True)
    dst = shutil.copy(glob.glob(tmp + "/part-*.parquet")[0],
                      os.path.join(out_dir, name))
    shutil.rmtree(tmp)
    os.utime(dst, (mtime, mtime))
    return dst


def test_late_event_dropped_after_window_finalized(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "late_src")
    now = time.time()

    # batch 0: opens window [00:00, 01:00)
    _write_chunk(
        spark,
        [(1, base + dt.timedelta(minutes=10), 1, "click", 1.0, "{}")],
        src, "01.parquet", now - 200,
    )
    # batch 1: advances the watermark to 04:00 (takes effect next batch)
    _write_chunk(
        spark,
        [(2, base + dt.timedelta(hours=5), 1, "click", 1.0, "{}")],
        src, "02.parquet", now - 100,
    )
    # batch 2: runs WITH watermark 04:00 → evicts + emits the 00:00 window
    _write_chunk(
        spark,
        [(4, base + dt.timedelta(hours=5, minutes=30), 1, "click", 1.0, "{}")],
        src, "03.parquet", now - 50,
    )
    # batch 3: event for the already-finalized 00:00 window → dropped
    _write_chunk(
        spark,
        [(3, base + dt.timedelta(minutes=20), 1, "click", 1.0, "{}")],
        src, "04.parquet", now,
    )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM late_test").collect()
    emissions = [r for r in rows if r.ws == base]
    # exactly one emission for the finalized window, with only the on-time
    # event; the late event neither re-emitted nor resurrected state
    assert len(emissions) == 1 and emissions[0].n == 1, rows
