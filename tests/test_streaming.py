"""Structured Streaming: incremental execution must equal batch execution.

Writes the events table as several parquet chunks into a temp source dir,
streams them with availableNow + memory sink, and asserts the windowed
aggregation equals the batch twin (ev_tumbling_hourly shape)."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.streaming.event_queries import load_events
from gravity_books_datalakehouse_spark.streaming.events import (
    run_stream_to_memory,
    windowed_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture
def event_source_dir(spark, tmp_path):
    """Chunked parquet copies of events (ts normalized to µs)."""
    src = str(tmp_path / "events_stream")
    (
        load_events(spark, SF_SMOKE)
        .repartition(4)
        .write.mode("overwrite")
        .parquet(src)
    )
    yield src
    shutil.rmtree(src, ignore_errors=True)


def test_stream_equals_batch(spark, event_source_dir):
    q = run_stream_to_memory(spark, event_source_dir, query_name="ev_test")
    q.awaitTermination(120)
    streamed = spark.sql(
        "SELECT * FROM ev_test ORDER BY window_start, event_type"
    ).collect()
    batch = (
        windowed_counts(load_events(spark, SF_SMOKE).withWatermark("ts", "1 hour"))
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert len(streamed) > 0
    assert streamed == batch


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: state must persist across micro-batches."""
    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.stateful import (
        running_type_totals,
    )

    src = str(tmp_path / "stateful_src")
    base = load_events(spark, SF_SMOKE)
    base.limit(400).coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_type_totals(stream)
        .writeStream.format("memory")
        .queryName("type_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per type must equal the batch totals over the same input
    got = {
        r.event_type: r.n_events
        for r in spark.sql(
            """SELECT event_type, n_events FROM (
                 SELECT *, row_number() OVER (PARTITION BY event_type
                                              ORDER BY n_events DESC) rn
                 FROM type_totals) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.event_type: r.cnt
        for r in spark.read.parquet(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_stream_to_gold_materializes_partitioned_aggregates(spark, tmp_path):
    from gravity_books_datalakehouse_spark.streaming.events import stream_to_gold

    src = str(tmp_path / "gold_src")
    load_events(spark, SF_SMOKE).coalesce(2).write.mode("overwrite").parquet(src)
    gold = str(tmp_path / "gold_hourly")
    q = stream_to_gold(spark, src, gold, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    out = spark.read.parquet(gold)
    assert "day_sk" in out.columns
    # totals must equal the batch aggregation over the same input
    want = (
        windowed_counts(load_events(spark, SF_SMOKE).withWatermark("ts", "1 hour"))
        .agg(F.sum("n_events").alias("s"))
        .first().s
    )
    got = out.agg(F.sum("n_events").alias("s")).first().s
    assert got == want


def test_stream_to_gold_multi_batch_same_day_keeps_all_windows(spark, tmp_path):
    """Regression: with maxFilesPerTrigger=4, a source dir with >4 files
    splits one day's windows across micro-batches. The per-batch dynamic
    partition overwrite must not delete windows of the same day that were
    written by an earlier batch (round-1 bug: gold partitioned at day
    grain lost every window the later batch didn't re-emit)."""
    import datetime as dt
    from gravity_books_datalakehouse_spark.streaming.events import (
        EVENT_SCHEMA,
        stream_to_gold,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    src = str(tmp_path / "mb_src")
    # 8 part-files -> 2 micro-batches; all events on ONE day, each hour a
    # distinct (hour, event_type) cell. repartitionByRange(8, ts) orders
    # part files by event time, so trigger 1 (first 4 files) and trigger 2
    # get disjoint hours of the same day — trigger 2 never re-emits
    # trigger 1's windows.
    rows = [
        (i * 100 + j, base + dt.timedelta(hours=i, minutes=j), j,
         "click" if i % 2 == 0 else "purchase", 1.0, "{}")
        for i in range(8)
        for j in range(5)
    ]
    (
        spark.createDataFrame(rows, EVENT_SCHEMA)
        .repartitionByRange(8, "ts")
        .write.mode("overwrite")
        .parquet(src)
    )
    prior_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static")

    gold = str(tmp_path / "mb_gold")
    q = stream_to_gold(spark, src, gold, str(tmp_path / "mb_ckpt"))
    q.awaitTermination(120)

    out = spark.read.parquet(gold)
    # every one of the 8 hourly windows must survive, 5 events each
    assert out.count() == 8
    assert out.agg(F.sum("n_events").alias("s")).first().s == 40
    assert {r.hour for r in out.select("hour").collect()} == set(range(8))
    # session-wide config must be untouched, not left mutated
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode").lower() == prior_mode.lower()


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Duplicate event_ids redelivered in a later micro-batch (within the
    watermark) must be dropped."""
    import datetime as dt
    from gravity_books_datalakehouse_spark.streaming.events import (
        EVENT_SCHEMA,
        deduped_event_stream,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "dedup_src")
    rows1 = [(i, base + dt.timedelta(minutes=i), 1, "click", 1.0, "{}")
             for i in range(10)]
    # batch 2 redelivers ids 5..9 and adds 10..12
    rows2 = [(i, base + dt.timedelta(minutes=i), 1, "click", 1.0, "{}")
             for i in range(5, 13)]
    spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(src + "/d1")
    spark.createDataFrame(rows2, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(src + "/d2")

    import glob as g, shutil, time, os
    merged = str(tmp_path / "dedup_merged")
    os.makedirs(merged)
    f1 = shutil.copy(g.glob(src + "/d1/part-*.parquet")[0], merged + "/01.parquet")
    f2 = shutil.copy(g.glob(src + "/d2/part-*.parquet")[0], merged + "/02.parquet")
    now = time.time()
    os.utime(f1, (now - 100, now - 100)); os.utime(f2, (now, now))

    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(merged))
    q = (deduped_event_stream(stream)
         .writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    ids = [r.event_id for r in spark.sql("SELECT event_id FROM dedup_stream").collect()]
    assert sorted(ids) == list(range(13))  # 13 unique, no redelivered dupes
    assert len(ids) == len(set(ids))


def test_stream_stream_interval_join_equals_batch(spark, event_source_dir):
    """The watermarked stream-stream purchase⋈click join must emit exactly
    the pairs the equivalent batch join produces."""
    from gravity_books_datalakehouse_spark.streaming.events import (
        purchase_click_interval_join,
        read_event_stream,
    )

    streamed_q = (
        purchase_click_interval_join(read_event_stream(spark, event_source_dir))
        .writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    streamed_q.awaitTermination(180)
    streamed = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM ssj_test").collect()
    }

    batch = purchase_click_interval_join(load_events(spark, SF_SMOKE))
    expected = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert len(expected) > 0
    assert streamed == expected


def test_stream_to_snapshot_exactly_once(spark, event_source_dir, tmp_path):
    """Snapshot sink: content equals the batch aggregate, replayed epochs
    are no-ops (txn idempotence), and a fresh increment merges as a new
    version."""
    from gravity_books_datalakehouse_spark.sources.snapshots import (
        last_txn_version,
        list_versions,
        read_snapshot,
    )
    from gravity_books_datalakehouse_spark.streaming.events import (
        stream_to_snapshot,
        windowed_counts,
    )

    table = str(tmp_path / "snap_gold")
    q = stream_to_snapshot(spark, event_source_dir, table, str(tmp_path / "ck"))
    q.awaitTermination(120)

    batch = (
        windowed_counts(spark.read.parquet(event_source_dir).withWatermark("ts", "1 hour"))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    snap = (
        read_snapshot(spark, table)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert batch.equals(snap[batch.columns.tolist()])

    # replay: re-running the whole stream from the SAME source with the
    # SAME checkpoint must not write any new version
    before = list_versions(table)
    q2 = stream_to_snapshot(spark, event_source_dir, table, str(tmp_path / "ck"))
    q2.awaitTermination(120)
    assert list_versions(table) == before

    # a replayed epoch id is skipped even without the checkpoint's help
    last = last_txn_version(table, "events-to-snapshot")
    assert last >= 0


def test_transform_with_state_running_user_spend(spark, tmp_path):
    """transformWithStateInPandas (typed ValueState on RocksDB): running
    per-user spend must persist across micro-batches and match the batch
    totals over the same input.

    The TWS python worker speaks protobuf to the JVM state server;
    skip when google.protobuf is unavailable (environment-blocked, like
    Kafka/Delta — re-probe each round)."""
    pytest.importorskip("google.protobuf.descriptor")
    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.tws import running_user_spend

    src = str(tmp_path / "tws_src")
    base = load_events(spark, SF_SMOKE)
    base.filter(F.col("user_id") < 40).coalesce(1).write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            running_user_spend(stream)
            .writeStream.format("memory")
            .queryName("user_spend")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got = {
        r.user_id: (r.n_events, round(r.total_value, 4))
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                                              ORDER BY n_events DESC) rn
                 FROM user_spend) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 4))
        for r in spark.read.parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_cdc_apply_log_python_replay(spark):
    """Last-writer-wins fold recomputed in pure python: per key the
    (ts, event_id)-max op decides; delete tombstones the key."""
    import duckdb as _duckdb

    import __spark_entry__ as m
    from tests.conftest import SF_CORRECT

    con = _duckdb.connect()
    rows = con.execute(
        "SELECT user_id, ts, event_id, event_type, value FROM "
        f"read_parquet('{SF_CORRECT}/events.parquet')"
    ).fetchall()
    con.close()
    by_user = {}
    for uid, ts, eid, etype, val in rows:
        by_user.setdefault(uid, []).append((ts, eid, etype, val))
    want = {}
    for uid, ops in by_user.items():
        ops.sort()
        ts, eid, etype, val = ops[-1]
        op = {"signup": "insert", "error": "delete"}.get(etype, "update")
        if op != "delete":
            want[uid] = (len(ops), op, val)
    got = {
        r.user_id: (r.n_ops, r.last_op, r.last_value)
        for r in m.queries()["op_cdc_apply_log"](spark, SF_CORRECT).collect()
    }
    assert got == want


def test_ab_ztest_python_replay(spark):
    """Replay the arm split, conversion counts, and the float z-test in
    python; the integer flag must agree with the float |z| >= 1.96
    decision away from the knife-edge."""
    import hashlib
    import math

    import duckdb as _duckdb

    import __spark_entry__ as m
    from tests.conftest import SF_CORRECT

    con = _duckdb.connect()
    rows = con.execute(
        "SELECT user_id, event_type FROM "
        f"read_parquet('{SF_CORRECT}/events.parquet')"
    ).fetchall()
    con.close()
    users = {}
    for uid, et in rows:
        d = users.setdefault(uid, [0, 0])
        if et == "click":
            d[0] = 1
        elif et == "purchase":
            d[1] = 1
    stats = {"A": [0, 0], "B": [0, 0]}
    for uid, (clicked, purchased) in users.items():
        if not clicked:
            continue
        arm = "A" if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8" else "B"
        stats[arm][0] += 1
        stats[arm][1] += purchased
    (n_a, c_a), (n_b, c_b) = stats["A"], stats["B"]
    r = m.queries()["ev_ab_conversion_ztest"](spark, SF_CORRECT).collect()[0]
    assert (r.n_a, r.c_a, r.n_b, r.c_b) == (n_a, c_a, n_b, c_b)
    p1, p2 = c_a / n_a, c_b / n_b
    p = (c_a + c_b) / (n_a + n_b)
    if p in (0.0, 1.0):
        # degenerate pooled rate: the float z is 0/0, but the integer
        # form is well-defined — both rates equal p, so diff = 0 and
        # the flag must be False (0 > 0 fails)
        assert (p1, p2) == (p, p) and r.significant is False
    else:
        z = (p1 - p2) / math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
        assert r.significant == (abs(z) >= 1.96) or abs(abs(z) - 1.96) < 1e-9


def test_ztest_integer_rule_boundary(spark):
    """The DECIMAL(38) exact-integer significance rule: (a) agrees with
    the float z-square rule on non-marginal count tuples up to the
    documented ~5e6/arm bound, and (b) past the bound overflows to a
    LOUD NULL flag (Spark decimal overflow), never a silently wrong
    boolean — the docstring's escape-hatch contract."""
    from pyspark.sql import functions as F

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _ZTEST_CRIT2_DEN,
        _ZTEST_CRIT2_NUM,
    )

    def spark_flag(n_a, c_a, n_b, c_b):
        df = spark.createDataFrame(
            [(n_a, c_a, n_b, c_b)], "n_a long, c_a long, n_b long, c_b long"
        )
        d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
        diff = F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a")
        n_tot = F.col("n_a") + F.col("n_b")
        c_tot = F.col("c_a") + F.col("c_b")
        return df.select(
            (
                F.lit(_ZTEST_CRIT2_DEN) * d38(diff) * d38(diff) * d38(n_tot)
                > F.lit(_ZTEST_CRIT2_NUM)
                * d38(c_tot)
                * d38(n_tot - c_tot)
                * d38(F.col("n_a"))
                * d38(F.col("n_b"))
            ).alias("significant")
        ).collect()[0].significant

    def py_flag(n_a, c_a, n_b, c_b):
        # same rule in Python's arbitrary-precision ints (escape hatch a)
        diff = c_a * n_b - c_b * n_a
        n, c = n_a + n_b, c_a + c_b
        return (
            _ZTEST_CRIT2_DEN * diff * diff * n
            > _ZTEST_CRIT2_NUM * c * (n - c) * n_a * n_b
        )

    # (a) inside the documented domain — including counts right at the
    # 1e6/arm scale the docstring quotes — decimal and bigint agree
    in_domain = [
        (1_000, 100, 1_000, 130),
        (1_000_000, 100_000, 1_000_000, 100_900),
        (1_000_000, 100_000, 1_000_000, 100_100),
        (4_000_000, 400_000, 4_000_000, 401_000),
    ]
    for t in in_domain:
        assert spark_flag(*t) == py_flag(*t), t

    # (b) past the bound: diff ~ n^2 with n = 5e7/arm makes
    # 1e4 * diff^2 * N exceed 38 digits -> Spark refuses LOUDLY
    # (ANSI ArithmeticException; NULL flag with ansi off) — never a
    # silently wrong boolean
    over = (50_000_000, 40_000_000, 50_000_000, 1_000_000)
    assert py_flag(*over) is True  # exact answer exists...
    import pyspark.errors

    try:
        flag = spark_flag(*over)
    except pyspark.errors.ArithmeticException:
        flag = None
    assert flag is None  # ...decimal path refuses, not lies


def test_streaming_first_seen_equals_batch_new_users(spark, event_source_dir):
    """ev_cumulative_new_users' first-seen identity has a direct
    streaming twin: a stateful MIN(event date) per user over the stream
    (complete mode) must land on exactly the batch op's per-day
    new-user counts — regardless of arrival order across micro-batches
    (the aggregate is order-free state, unlike a naive streaming
    dropDuplicates, which keys on ARRIVAL order and would break under
    the fixture's shuffled files)."""
    from pyspark.sql import functions as F

    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        ev_cumulative_new_users,
    )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_source_dir)
    )
    fs = stream.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    q = (
        fs.writeStream.format("memory")
        .queryName("first_seen_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r.day: r.n
        for r in spark.sql(
            "SELECT date_format(first_day, 'yyyy-MM-dd') AS day,"
            " COUNT(*) AS n FROM first_seen_stream GROUP BY 1"
        ).collect()
    }
    batch = {
        r.day: r.n_new_users
        for r in ev_cumulative_new_users(spark, SF_SMOKE).collect()
    }
    assert len(batch) > 0
    assert streamed == batch


def test_streaming_twa_equals_batch(spark, tmp_path):
    """The per-user GroupState TWA fold, fed a time-ordered two-file
    source (one state handoff across the micro-batch boundary), must
    sum to exactly the batch ev_time_weighted_avg_value totals —
    including holding intervals that SPAN the batch boundary (the case
    a stateless per-batch computation loses)."""
    import glob as g
    import os
    import shutil
    import time as _time

    from gravity_books_datalakehouse_spark.plans.operator_queries import (
        _cents,
    )
    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.stateful import (
        streaming_twa_contributions,
    )

    ev = load_events(spark, SF_SMOKE)
    cut = ev.agg(
        F.timestamp_seconds(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP"
                " (ORDER BY unix_timestamp(ts))"
            )
        ).alias("c")
    ).first().c
    src = str(tmp_path / "twa_src")
    ev.where(F.col("ts") <= cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d1"
    )
    ev.where(F.col("ts") > cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d2"
    )
    merged = str(tmp_path / "twa_merged")
    os.makedirs(merged)
    f1 = shutil.copy(
        g.glob(src + "/d1/part-*.parquet")[0], merged + "/01.parquet"
    )
    f2 = shutil.copy(
        g.glob(src + "/d2/part-*.parquet")[0], merged + "/02.parquet"
    )
    now = _time.time()
    os.utime(f1, (now - 100, now - 100))
    os.utime(f2, (now, now))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
        .select(
            "user_id", "ts", "event_id", "event_type",
            _cents("value", 4).alias("units"),
        )
    )
    q = (
        streaming_twa_contributions(stream)
        .writeStream.format("memory")
        .queryName("twa_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_type: (r.s, r.d)
        for r in spark.sql(
            "SELECT event_type, SUM(s) AS s, SUM(d) AS d FROM twa_stream"
            " GROUP BY event_type"
        ).collect()
    }

    # batch twin over the same input, same integer algebra
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select(
            "user_id", "ts", "event_id", "event_type",
            _cents("value", 4).alias("units"),
        )
        .select(
            "event_type",
            "units",
            (
                F.unix_timestamp(F.lead("ts").over(w))
                - F.unix_timestamp(F.col("ts"))
            ).alias("dt"),
        )
        .where(F.col("dt").isNotNull())
    )
    want = {
        r.event_type: (r.s, r.d)
        for r in seq.groupBy("event_type")
        .agg(
            F.sum(F.col("units") * F.col("dt")).alias("s"),
            F.sum("dt").alias("d"),
        )
        .collect()
    }
    assert len(want) > 0
    assert got == want


def test_streaming_ewma_equals_batch(spark, tmp_path):
    """The per-type GroupState EWMA fold, fed an hour-aligned two-file
    source (state handoff across the micro-batch boundary, including
    zero-fill hours that SPAN it), must reproduce the batch
    ev_ewma_control rows exactly — same hours, same counts, same exact
    integer S, same alert flags."""
    import glob as g
    import os
    import time as _time

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _EWMA_LAGS,
        _EWMA_MIN_COUNT,
        ev_ewma_control,
    )
    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.stateful import (
        _EWMA_TWIN_LAGS,
        _EWMA_TWIN_MIN_COUNT,
        _EWMA_TWIN_NORM,
        streaming_ewma_alerts,
    )

    # the twin's constants are pins of the batch operator's
    assert _EWMA_TWIN_LAGS == _EWMA_LAGS
    assert _EWMA_TWIN_MIN_COUNT == _EWMA_MIN_COUNT

    ev = load_events(spark, SF_SMOKE)
    # split at the median timestamp TRUNCATED TO THE HOUR so no hour
    # bucket straddles the micro-batch boundary (the twin's contract)
    cut = (
        ev.agg(
            F.date_trunc(
                "hour",
                F.timestamp_seconds(
                    F.expr(
                        "percentile_disc(0.5) WITHIN GROUP"
                        " (ORDER BY unix_timestamp(ts))"
                    )
                ),
            ).alias("c")
        )
        .first()
        .c
    )
    src = str(tmp_path / "ewma_src")
    ev.where(F.col("ts") < cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d1"
    )
    ev.where(F.col("ts") >= cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d2"
    )
    merged = str(tmp_path / "ewma_merged")
    os.makedirs(merged)
    f1 = shutil.copy(
        g.glob(src + "/d1/part-*.parquet")[0], merged + "/01.parquet"
    )
    f2 = shutil.copy(
        g.glob(src + "/d2/part-*.parquet")[0], merged + "/02.parquet"
    )
    now = _time.time()
    os.utime(f1, (now - 100, now - 100))
    os.utime(f2, (now, now))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
        .select("event_type", "ts")
    )
    q = (
        streaming_ewma_alerts(stream)
        .writeStream.format("memory")
        .queryName("ewma_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_type, r.window_start): (r.x, r.s, r.alert_flag)
        for r in spark.sql("SELECT * FROM ewma_stream").collect()
    }

    want = {}
    for r in ev_ewma_control(spark, SF_SMOKE).collect():
        # reconstruct the exact integer S from the batch row: the twin
        # emits S raw; the batch rounds S/NORM to 6 dp for display and
        # decides the alert on the integers — recompute S-consistency
        # via the alert flag and the rounded ewma
        want[(r.event_type, r.window_start)] = (r.x, r.ewma, r.alert_flag)

    assert set(got) == set(want), (
        len(got),
        len(want),
        sorted(set(want) - set(got))[:3],
        sorted(set(got) - set(want))[:3],
    )
    for k, (x, s, alert) in got.items():
        bx, bewma, balert = want[k]
        assert x == bx, k
        assert alert == balert, k
        # the batch ewma is round(S / NORM, 6): the twin's integer S
        # must reproduce it
        assert abs(s / _EWMA_TWIN_NORM - bewma) <= 5e-7, (k, s, bewma)


def test_streaming_seasonal_ewma_equals_batch(spark, tmp_path):
    """The 168-hour GroupState seasonal fold, fed an hour-aligned
    two-file source, must reproduce the batch ev_seasonal_ewma_control
    rows exactly — same hours, same counts, same exact integer level
    and seasonal sums, same three alert flags — including the state
    handoff across the micro-batch boundary."""
    import glob as g
    import os
    import time as _time

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _EWMA_LAGS,
        _EWMA_MIN_COUNT,
        _EWMA_NORM,
        _SEWMA_NORM,
        _SEWMA_PERIOD,
        _SEWMA_SEASONS,
        ev_seasonal_ewma_control,
    )
    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.stateful import (
        _EWMA_TWIN_LAGS,
        _EWMA_TWIN_MIN_COUNT,
        _EWMA_TWIN_NORM,
        _SEWMA_TWIN_NORM,
        _SEWMA_TWIN_PERIOD,
        _SEWMA_TWIN_SEASONS,
        streaming_seasonal_ewma_alerts,
    )

    # the twin's constants are pins of the batch operator's
    assert _EWMA_TWIN_LAGS == _EWMA_LAGS
    assert _EWMA_TWIN_MIN_COUNT == _EWMA_MIN_COUNT
    assert _SEWMA_TWIN_SEASONS == _SEWMA_SEASONS
    assert _SEWMA_TWIN_PERIOD == _SEWMA_PERIOD
    assert _SEWMA_TWIN_NORM == _SEWMA_NORM

    ev = load_events(spark, SF_SMOKE)
    cut = (
        ev.agg(
            F.date_trunc(
                "hour",
                F.timestamp_seconds(
                    F.expr(
                        "percentile_disc(0.5) WITHIN GROUP"
                        " (ORDER BY unix_timestamp(ts))"
                    )
                ),
            ).alias("c")
        )
        .first()
        .c
    )
    src = str(tmp_path / "sewma_src")
    ev.where(F.col("ts") < cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d1"
    )
    ev.where(F.col("ts") >= cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d2"
    )
    merged = str(tmp_path / "sewma_merged")
    os.makedirs(merged)
    f1 = shutil.copy(
        g.glob(src + "/d1/part-*.parquet")[0], merged + "/01.parquet"
    )
    f2 = shutil.copy(
        g.glob(src + "/d2/part-*.parquet")[0], merged + "/02.parquet"
    )
    now = _time.time()
    os.utime(f1, (now - 100, now - 100))
    os.utime(f2, (now, now))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
        .select("event_type", "ts")
    )
    q = (
        streaming_seasonal_ewma_alerts(stream)
        .writeStream.format("memory")
        .queryName("sewma_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_type, r.window_start): (
            r.x, r.s_lvl, r.s_sea, r.level_alert, r.seasonal_alert,
            r.alert_flag,
        )
        for r in spark.sql("SELECT * FROM sewma_stream").collect()
    }

    want = {
        (r.event_type, r.window_start): (
            r.x, r.level_ewma, r.seasonal_ewma, r.level_alert,
            r.seasonal_alert, r.alert_flag,
        )
        for r in ev_seasonal_ewma_control(spark, SF_SMOKE).collect()
    }

    assert set(got) == set(want), (
        len(got),
        len(want),
        sorted(set(want) - set(got))[:3],
        sorted(set(got) - set(want))[:3],
    )
    assert got, "seasonal chart produced no rows at smoke scale"
    for k, (x, s_lvl, s_sea, lvl, sea, alert) in got.items():
        bx, blvl_ewma, bsea_ewma, blvl, bsea, balert = want[k]
        assert x == bx, k
        assert (lvl, sea, alert) == (blvl, bsea, balert), k
        # batch displays round(S / NORM, 6): the twin's integer sums
        # must reproduce both baselines
        assert abs(s_lvl / _EWMA_TWIN_NORM - blvl_ewma) <= 5e-7, k
        assert abs(s_sea / _SEWMA_TWIN_NORM - bsea_ewma) <= 5e-7, k


def test_seasonal_ewma_numpy_replay(spark):
    """Batch ev_seasonal_ewma_control vs a direct numpy fold over the
    gap-filled hourly series: exact integer baselines, exact flags."""
    import numpy as np

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _EWMA_LAGS,
        _EWMA_MIN_COUNT,
        _EWMA_NORM,
        _SEWMA_NORM,
        _SEWMA_PERIOD,
        _SEWMA_SEASONS,
        ev_seasonal_ewma_control,
    )

    ev = load_events(spark, SF_SMOKE)
    hourly = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("x"))
        .select("event_type", F.col("w.start").alias("h"), "x")
        .collect()
    )
    series: dict[str, dict] = {}
    for r in hourly:
        series.setdefault(r.event_type, {})[r.h] = r.x
    want = {}
    for et, cells in series.items():
        h0, h1 = min(cells), max(cells)
        hours, xs = [], []
        h = h0
        while h <= h1:
            hours.append(h)
            xs.append(cells.get(h, 0))
            h = h + __import__("datetime").timedelta(hours=1)
        x = np.array(xs, dtype=np.int64)
        horizon = _SEWMA_SEASONS * _SEWMA_PERIOD
        for t in range(horizon, len(x)):
            s_lvl = int(
                sum(
                    int(x[t - j]) << (_EWMA_LAGS - j)
                    for j in range(1, _EWMA_LAGS + 1)
                )
            )
            s_sea = int(
                sum(
                    int(x[t - j * _SEWMA_PERIOD]) << (_SEWMA_SEASONS - j)
                    for j in range(1, _SEWMA_SEASONS + 1)
                )
            )
            guard = int(x[t]) >= _EWMA_MIN_COUNT
            want[(et, hours[t])] = (
                int(x[t]),
                round(s_lvl / _EWMA_NORM, 6),
                round(s_sea / _SEWMA_NORM, 6),
                bool(guard and int(x[t]) * _EWMA_NORM > 2 * s_lvl),
                bool(guard and int(x[t]) * _SEWMA_NORM > 2 * s_sea),
                bool(
                    guard
                    and int(x[t]) * _EWMA_NORM > 2 * s_lvl
                    and int(x[t]) * _SEWMA_NORM > 2 * s_sea
                ),
            )
    got = {
        (r.event_type, r.window_start): (
            r.x, r.level_ewma, r.seasonal_ewma, r.level_alert,
            r.seasonal_alert, r.alert_flag,
        )
        for r in ev_seasonal_ewma_control(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_streaming_cusum_equals_batch(spark, tmp_path):
    """The O(1)-state online-CUSUM fold, fed an hour-aligned two-file
    source, must reproduce the batch ev_cusum_online rows exactly —
    the reflection identity IS the incremental recursion, so the
    integer S and both flags match bit for bit across the micro-batch
    boundary."""
    import glob as g
    import os
    import time as _time

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _CUSUM_WARMUP,
        ev_cusum_online,
    )
    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.stateful import (
        _CUSUM_TWIN_WARMUP,
        streaming_cusum_alerts,
    )

    assert _CUSUM_TWIN_WARMUP == _CUSUM_WARMUP

    ev = load_events(spark, SF_SMOKE)
    cut = (
        ev.agg(
            F.date_trunc(
                "hour",
                F.timestamp_seconds(
                    F.expr(
                        "percentile_disc(0.5) WITHIN GROUP"
                        " (ORDER BY unix_timestamp(ts))"
                    )
                ),
            ).alias("c")
        )
        .first()
        .c
    )
    src = str(tmp_path / "cusum_src")
    ev.where(F.col("ts") < cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d1"
    )
    ev.where(F.col("ts") >= cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d2"
    )
    merged = str(tmp_path / "cusum_merged")
    os.makedirs(merged)
    f1 = shutil.copy(
        g.glob(src + "/d1/part-*.parquet")[0], merged + "/01.parquet"
    )
    f2 = shutil.copy(
        g.glob(src + "/d2/part-*.parquet")[0], merged + "/02.parquet"
    )
    now = _time.time()
    os.utime(f1, (now - 100, now - 100))
    os.utime(f2, (now, now))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
        .select("event_type", "ts")
    )
    q = (
        streaming_cusum_alerts(stream)
        .writeStream.format("memory")
        .queryName("cusum_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_type, r.window_start.strftime("%Y-%m-%d %H:%M:%S")): (
            r.x, r.t0, r.cusum_scaled, r.alert_flag
        )
        for r in spark.sql("SELECT * FROM cusum_stream").collect()
    }
    want = {}
    for r in ev_cusum_online(spark, SF_SMOKE).collect():
        want[(r.event_type, r.window_start)] = (
            r.x,
            round(r.mu0 * _CUSUM_WARMUP),  # t0 back from the display mean
            r.cusum_scaled,
            r.alert_flag,
        )
    assert set(got) == set(want), (len(got), len(want))
    assert got, "cusum twin produced no rows at smoke scale"
    for k, v in got.items():
        assert v == want[k], (k, v, want[k])


def test_streaming_change_point_equals_batch(spark, tmp_path):
    """The SIXTH batch/stream twin: the anytime change-point fold, fed
    an hour-aligned two-file source, must end (per type) on exactly the
    batch ev_change_point_cusum row — change hour, N, T, and the scaled
    deviation bit-equal, the two displayed means reproduced by the
    emitted integer sufficient statistics — and every INTERMEDIATE row
    must equal the batch operator run on the stream-so-far (checked at
    the micro-batch boundary)."""
    import glob as g
    import os
    import time as _time
    from decimal import ROUND_HALF_UP, Decimal

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        ev_change_point_cusum,
    )
    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.stateful import (
        streaming_change_point,
    )

    ev = load_events(spark, SF_SMOKE)
    cut = (
        ev.agg(
            F.date_trunc(
                "hour",
                F.timestamp_seconds(
                    F.expr(
                        "percentile_disc(0.5) WITHIN GROUP"
                        " (ORDER BY unix_timestamp(ts))"
                    )
                ),
            ).alias("c")
        )
        .first()
        .c
    )
    src = str(tmp_path / "cp_src")
    ev.where(F.col("ts") < cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d1"
    )
    ev.where(F.col("ts") >= cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d2"
    )
    merged = str(tmp_path / "cp_merged")
    os.makedirs(merged)
    f1 = shutil.copy(
        g.glob(src + "/d1/part-*.parquet")[0], merged + "/01.parquet"
    )
    f2 = shutil.copy(
        g.glob(src + "/d2/part-*.parquet")[0], merged + "/02.parquet"
    )
    now = _time.time()
    os.utime(f1, (now - 100, now - 100))
    os.utime(f2, (now, now))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
        .select("event_type", "ts")
    )
    q = (
        streaming_change_point(stream)
        .writeStream.format("memory")
        .queryName("cp_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM cp_stream").collect()
    assert rows, "change-point twin produced no rows at smoke scale"

    def half_up6(num: int, den: int) -> float:
        return float(
            Decimal(repr(num / den)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    # final row per type == the batch op on the full input
    last = {}
    for r in rows:
        if (
            r.event_type not in last
            or r.window_start > last[r.event_type].window_start
        ):
            last[r.event_type] = r
    want = {r.event_type: r for r in ev_change_point_cusum(spark, SF_SMOKE).collect()}
    assert set(last) == set(want)
    for t, b in want.items():
        s = last[t]
        assert s.change_hour == b.change_hour, t
        assert s.n_hours == b.n_hours and s.n_events == b.n_events, t
        assert s.max_scaled_dev == b.max_scaled_dev, t
        assert half_up6(s.best_prefix, s.best_i) == b.mean_before, t
        assert (
            half_up6(s.n_events - s.best_prefix, s.n_hours - s.best_i)
            == b.mean_after
        ), t

    # an intermediate row equals the batch op on the truncated input:
    # pick each type's last row BEFORE the cut and replay the batch
    # argmax in python over the truncated hourly series
    import numpy as np
    import pandas as pd

    pdf = ev.select("event_type", "ts").toPandas()

    for t, b in want.items():
        pre = [
            r for r in rows
            if r.event_type == t and r.window_start < cut
        ]
        if not pre:
            continue
        s = max(pre, key=lambda r: r.window_start)
        upto = s.window_start + pd.Timedelta(hours=1)
        sub = pdf[(pdf.event_type == t) & (pdf.ts < upto)]
        hours = (sub.ts.astype("int64") // 10**9) // 3600
        h0 = hours.min()
        # the twin's spine extends through the row's hour even when the
        # trailing hours are empty (batch-2 gap backfill), so pad the
        # replayed histogram to the same length
        slots = int(s.window_start.timestamp()) // 3600 - h0 + 1
        xs = np.bincount((hours - h0).astype(int), minlength=slots)
        n, tot = len(xs), int(xs.sum())
        pref = np.cumsum(xs)
        best_d, best_i = -1, -1
        for i in range(1, n):
            d = abs(n * int(pref[i - 1]) - i * tot)
            if d > best_d:
                best_d, best_i = d, i
        assert s.n_hours == n and s.n_events == tot
        assert s.max_scaled_dev == best_d and s.best_i == best_i


def test_streaming_attribution_journeys_equals_batch(spark, tmp_path):
    """The SEVENTH batch/stream twin: per-user journey transitions fed
    a mid-session two-file split plus a flush file must (a) sum to the
    transition matrix an independent pure-python sessionizer computes
    from the same events, and (b) reproduce the batch
    ev_markov_attribution table bit-for-bit when fed through the shared
    _attribution_rows_from_tm arithmetic."""
    import glob as g
    import os
    import time as _time
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _attribution_rows_from_tm,
        ev_markov_attribution,
    )
    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.stateful import (
        FLUSH_SENTINEL,
        streaming_attribution_journeys,
    )

    ev = load_events(spark, SF_SMOKE)
    cut = ev.agg(
        F.timestamp_seconds(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP"
                " (ORDER BY unix_timestamp(ts))"
            )
        ).alias("c")
    ).first().c
    src = str(tmp_path / "attr_src")
    ev.where(F.col("ts") < cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d1"
    )
    ev.where(F.col("ts") >= cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d2"
    )
    # flush file: one sentinel per user AFTER that user's last event
    mx = ev.agg(
        F.max("ts").alias("mt"), F.max("event_id").alias("me")
    ).first()
    flush = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            (F.lit(mx.me) + F.row_number().over(
                Window.orderBy("user_id")
            )).cast("long").alias("event_id"),
            (F.lit(mx.mt) + F.expr("INTERVAL 1 DAY")).alias("ts"),
            F.col("user_id").cast("long"),
            F.lit(FLUSH_SENTINEL).alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    flush.coalesce(1).write.mode("overwrite").parquet(src + "/d3")
    merged = str(tmp_path / "attr_merged")
    os.makedirs(merged)
    now = _time.time()
    for i, d in enumerate(("d1", "d2", "d3")):
        f = shutil.copy(
            g.glob(src + f"/{d}/part-*.parquet")[0],
            merged + f"/0{i + 1}.parquet",
        )
        os.utime(f, (now - 100 + i * 50, now - 100 + i * 50))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
        .select("user_id", "ts", "event_id", "event_type")
    )
    q = (
        streaming_attribution_journeys(stream)
        .writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM attr_stream").collect()
    assert rows, "journey twin produced no rows at smoke scale"
    streamed_tm: dict = defaultdict(int)
    for r in rows:
        streamed_tm[(r.f, r.t)] += r.n

    # independent python sessionizer oracle over the same events
    pdf = ev.select("user_id", "ts", "event_id", "event_type").toPandas()
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    want_tm: dict = defaultdict(int)
    gap = 30 * 60 * 1_000_000_000

    def emit(types, purchased):
        toks = ["START"] + types + ["CONV" if purchased else "NOCONV"]
        for a, b in zip(toks, toks[1:]):
            want_tm[(a, b)] += 1

    for _, grp in pdf.groupby("user_id", sort=False):
        last = None
        types: list = []
        purchased = False
        for ts, etype in zip(grp["ts"].astype("int64"), grp["event_type"]):
            if last is not None and ts > last + gap:
                emit(types, purchased)
                types, purchased = [], False
            if not purchased:
                if etype == "purchase":
                    purchased = True
                else:
                    types.append(etype)
            last = ts
        emit(types, purchased)

    assert dict(streamed_tm) == dict(want_tm)

    # shared arithmetic on the streamed matrix == the batch table
    got = _attribution_rows_from_tm(
        [(f, t, n) for (f, t), n in sorted(streamed_tm.items())]
    )
    want = [
        tuple(r)
        for r in ev_markov_attribution(spark, SF_SMOKE)
        .orderBy("channel")
        .collect()
    ]
    assert got == want


def test_streaming_survival_durations_equals_batch(spark, tmp_path):
    """The EIGHTH batch/stream twin: per-user error-budget survival
    durations fed a mid-stream two-file split plus a flush file must
    (a) reproduce the batch _error_budget_durations frame EXACTLY
    (every user, duration and censoring flag), and (b) yield the batch
    ev_survival_km_error_budget table bit-for-bit when the emitted rows
    run through the shared _km_readout fold."""
    import glob as g
    import os
    import time as _time

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _KM_BUDGET,
        _error_budget_durations,
        _km_readout,
        ev_survival_km_error_budget,
    )
    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.stateful import (
        FLUSH_SENTINEL,
        SURV_BUDGET,
        streaming_survival_durations,
    )

    assert SURV_BUDGET == _KM_BUDGET  # the twin's constant is a pin

    ev = load_events(spark, SF_SMOKE)
    cut = ev.agg(
        F.timestamp_seconds(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP"
                " (ORDER BY unix_timestamp(ts))"
            )
        ).alias("c")
    ).first().c
    src = str(tmp_path / "surv_src")
    ev.where(F.col("ts") < cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d1"
    )
    ev.where(F.col("ts") >= cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d2"
    )
    mx = ev.agg(
        F.max("ts").alias("mt"), F.max("event_id").alias("me")
    ).first()
    flush = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            (F.lit(mx.me) + F.row_number().over(
                Window.orderBy("user_id")
            )).cast("long").alias("event_id"),
            (F.lit(mx.mt) + F.expr("INTERVAL 1 DAY")).alias("ts"),
            F.col("user_id").cast("long"),
            F.lit(FLUSH_SENTINEL).alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    flush.coalesce(1).write.mode("overwrite").parquet(src + "/d3")
    merged = str(tmp_path / "surv_merged")
    os.makedirs(merged)
    now = _time.time()
    for i, d in enumerate(("d1", "d2", "d3")):
        f = shutil.copy(
            g.glob(src + f"/{d}/part-*.parquet")[0],
            merged + f"/0{i + 1}.parquet",
        )
        os.utime(f, (now - 100 + i * 50, now - 100 + i * 50))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
        .select("user_id", "ts", "event_id", "event_type")
    )
    q = (
        streaming_survival_durations(stream)
        .writeStream.format("memory")
        .queryName("surv_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM surv_stream").collect()
    assert rows, "survival twin produced no rows at smoke scale"

    got = sorted((r.user_id, r.d, r.ev) for r in rows)
    want = sorted(
        (r.user_id, r.d, r.ev)
        for r in _error_budget_durations(ev).collect()
    )
    assert got == want
    assert len(got) == len({u for u, _, _ in got})  # one row per user

    # shared KM fold on the streamed frame == the batch op, bit-for-bit
    dur_df = spark.createDataFrame(
        [(u, d, e) for u, d, e in got],
        "user_id long, d long, ev int",
    )
    km_stream = [
        tuple(r)
        for r in _km_readout(spark, dur_df)
        .orderBy("horizon_hours")
        .collect()
    ]
    km_batch = [
        tuple(r)
        for r in ev_survival_km_error_budget(spark, SF_SMOKE)
        .orderBy("horizon_hours")
        .collect()
    ]
    assert km_stream == km_batch


def test_streaming_competing_durations_equals_batch(spark, tmp_path):
    """The NINTH batch/stream twin: per-user competing-risks durations
    fed a mid-stream two-file split plus a flush file must (a)
    reproduce the batch _competing_durations frame EXACTLY (duration
    and cause per user, ties-to-exhaustion rule included), and (b)
    yield the batch ev_survival_competing_risks table bit-for-bit
    through the shared _cr_readout fold."""
    import glob as g
    import os
    import time as _time

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _competing_durations,
        _cr_readout,
        ev_survival_competing_risks,
    )
    from gravity_books_datalakehouse_spark.streaming.events import EVENT_SCHEMA
    from gravity_books_datalakehouse_spark.streaming.stateful import (
        FLUSH_SENTINEL,
        streaming_competing_durations,
    )

    ev = load_events(spark, SF_SMOKE)
    cut = ev.agg(
        F.timestamp_seconds(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP"
                " (ORDER BY unix_timestamp(ts))"
            )
        ).alias("c")
    ).first().c
    src = str(tmp_path / "cr_src")
    ev.where(F.col("ts") < cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d1"
    )
    ev.where(F.col("ts") >= cut).coalesce(1).write.mode("overwrite").parquet(
        src + "/d2"
    )
    mx = ev.agg(
        F.max("ts").alias("mt"), F.max("event_id").alias("me")
    ).first()
    flush = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            (F.lit(mx.me) + F.row_number().over(
                Window.orderBy("user_id")
            )).cast("long").alias("event_id"),
            (F.lit(mx.mt) + F.expr("INTERVAL 1 DAY")).alias("ts"),
            F.col("user_id").cast("long"),
            F.lit(FLUSH_SENTINEL).alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )
    flush.coalesce(1).write.mode("overwrite").parquet(src + "/d3")
    merged = str(tmp_path / "cr_merged")
    os.makedirs(merged)
    now = _time.time()
    for i, d in enumerate(("d1", "d2", "d3")):
        f = shutil.copy(
            g.glob(src + f"/{d}/part-*.parquet")[0],
            merged + f"/0{i + 1}.parquet",
        )
        os.utime(f, (now - 100 + i * 50, now - 100 + i * 50))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(merged)
        .select("user_id", "ts", "event_id", "event_type")
    )
    q = (
        streaming_competing_durations(stream)
        .writeStream.format("memory")
        .queryName("cr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM cr_stream").collect()
    assert rows, "competing-risks twin produced no rows at smoke scale"

    got = sorted((r.user_id, r.d, r.cause) for r in rows)
    want = sorted(
        (r.user_id, r.d, r.cause)
        for r in _competing_durations(ev).collect()
    )
    assert got == want
    # conversion competes at every scale; censoring/exhaustion only
    # appear at larger SFs (sf0.001: every user purchases first)
    assert 2 in {c for _, _, c in got}
    assert len(got) == len({u for u, _, _ in got})  # one row per user

    dur_df = spark.createDataFrame(
        [(u, d, c) for u, d, c in got],
        "user_id long, d long, cause int",
    )
    aj_stream = [
        tuple(r)
        for r in _cr_readout(spark, dur_df)
        .orderBy("horizon_hours")
        .collect()
    ]
    aj_batch = [
        tuple(r)
        for r in ev_survival_competing_risks(spark, SF_SMOKE)
        .orderBy("horizon_hours")
        .collect()
    ]
    assert aj_stream == aj_batch
