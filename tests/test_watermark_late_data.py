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


def test_two_pass_prefix_max_equals_naive_cummax(spark):
    """ev_watermark_lateness_profile's bucketed two-pass prefix max must
    equal the naive global running max on synthetic arrival orders that
    stress bucket boundaries: per-event lateness replayed in pandas
    (cummax over the md5 arrival order) and compared exactly. Seeds and
    sizes chosen to cover single-bucket, all-distinct-bucket, and
    skewed-bucket layouts."""
    import hashlib

    import pandas as pd

    from pyspark.sql import Window, functions as F

    for seed, n in [(1, 257), (2, 40), (3, 1000)]:
        # synthetic events: ts values deliberately non-monotone in id
        rows = [
            (i, ((i * 2654435761 + seed * 97) % 9973))
            for i in range(n)
        ]
        pdf = pd.DataFrame(rows, columns=["event_id", "ts_off"])
        pdf["h"] = pdf["event_id"].map(
            lambda x: hashlib.md5(str(x).encode()).hexdigest()
        )
        pdf = pdf.sort_values(["h", "event_id"]).reset_index(drop=True)
        pdf["wm"] = pdf["ts_off"].cummax()
        want = sorted((pdf["wm"] - pdf["ts_off"]).tolist())

        df = spark.createDataFrame(
            rows, "event_id long, ts_off long"
        ).select(
            "event_id",
            F.timestamp_seconds(F.col("ts_off") + 1_600_000_000).alias("ts"),
            F.md5(F.col("event_id").cast("string")).alias("h"),
        ).withColumn("bkt", F.substring("h", 1, 2))
        w_in = (
            Window.partitionBy("bkt")
            .orderBy("h", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        bmax = df.groupBy("bkt").agg(F.max("ts").alias("bts"))
        w_carry = Window.orderBy("bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        carry = bmax.select(
            "bkt", F.max("bts").over(w_carry).alias("carry_ts")
        )
        wm = F.greatest(
            F.col("in_max"), F.coalesce(F.col("carry_ts"), F.col("in_max"))
        )
        got = sorted(
            r.late
            for r in df.withColumn("in_max", F.max("ts").over(w_in))
            .join(F.broadcast(carry), "bkt")
            .select(
                (
                    F.unix_timestamp(wm) - F.unix_timestamp("ts")
                ).alias("late")
            )
            .collect()
        )
        assert got == want, f"seed={seed} n={n}"
