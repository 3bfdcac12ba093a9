"""Structured Streaming ingest of the events stream (SURVEY.md §2.7 ext).

The reference is purely batch (full-refresh pandas ETL); this module is
the streaming-native counterpart the brief asks for: file-source ingest →
event-time tumbling windows with watermarked late-data handling → append
sink. The aggregation expressions are shared with the batch twins in
streaming/event_queries.py, so the DuckDB oracle validates the semantics
and the streaming test (tests/test_streaming.py) validates incremental
execution equals batch execution.

Scale notes: file/Kafka sources shard across executors; the window
aggregation's state store is keyed by (window, event_type) — bounded
cardinality — and the 1-hour watermark bounds state retention. At
production rates swap the file source for Kafka and enable RocksDB state
store; the query shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import (
    _cents,
    _money_sum,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Schema for streamed event batches (ts already µs — the streaming path
#: takes normalized parquet written by the ingest tooling, not the raw
#: nanos file; see tests/test_streaming.py).
EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over a directory of event parquet files."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )


def windowed_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour per-type aggregation with late-data watermark.

    Identical expression to the batch ev_tumbling_hourly; under streaming
    the watermark lets Spark finalize + evict window state once event time
    passes window_end + watermark.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(_cents("value", 4), 4).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
    )


def run_stream_to_memory(
    spark: SparkSession, source_dir: str, query_name: str = "ev_hourly"
) -> "StreamingQuery":  # noqa: F821
    """Start the windowed aggregation into an in-memory sink (complete
    mode) and return the StreamingQuery; caller awaits termination or
    processes availableNow. Used by tests; a production job would write
    ``.format("delta"/"parquet").option("checkpointLocation", …)``."""
    events = read_event_stream(spark, source_dir)
    return (
        windowed_counts(events)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def stream_to_gold(
    spark: SparkSession,
    source_dir: str,
    gold_path: str,
    checkpoint_dir: str,
) -> "StreamingQuery":  # noqa: F821
    """Continuously maintain a gold hourly-aggregate table from the event
    stream: watermarked windowed aggregation → foreachBatch upsert into a
    date-partitioned Parquet table (dynamic partition overwrite — the
    Delta-less MERGE used across this repo, plans/medallion.py).

    foreachBatch gives exactly-once-per-epoch batch semantics against the
    checkpoint. In ``update`` mode each micro-batch carries ONLY the
    (window, event_type) aggregates that changed in that batch — but each
    carried value is the full re-aggregate from the state store, so the
    latest emission for a key is always authoritative. The gold table is
    therefore partitioned at exactly that key granularity
    (day_sk/hour/event_type): a dynamic partition overwrite replaces
    precisely the cells this batch updated and cannot clobber sibling
    windows or types that were finalized in earlier batches (the round-1
    bug when a day's files spanned >1 trigger). No read-modify-write of
    the gold table is needed, so there is no read-while-overwrite hazard.

    Partition-count note at scale: cardinality is days x 24 x |types| —
    the same bounded cardinality as the streaming state itself; compact
    historical days into day-grain files offline if small files matter
    (sources/compaction.py).
    """
    from pyspark.sql import functions as F

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Writer-level option, not a session conf mutation: foreachBatch
        # runs against a cloned session, and a session-wide set would both
        # miss the clone and leak into the user's session.
        (
            batch_df.withColumn(
                "day_sk",
                F.date_format("window_start", "yyyyMMdd").cast("int"),
            )
            .withColumn("hour", F.hour("window_start"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day_sk", "hour", "event_type")
            .parquet(gold_path)
        )

    events = read_event_stream(spark, source_dir)
    return (
        windowed_counts(events)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def stream_to_snapshot(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    app_id: str = "events-to-snapshot",
) -> "StreamingQuery":  # noqa: F821
    """Stream → versioned-snapshot sink with end-to-end exactly-once
    semantics — Delta's ``txnAppId``/``txnVersion`` idempotent-writer
    protocol on the log-free snapshot store (sources/snapshots.py).

    foreachBatch is at-least-once per epoch: after a crash between the
    sink completing and the checkpoint advancing, Structured Streaming
    REPLAYS the last epoch. The sink therefore records the epoch id
    inside the snapshot commit itself (``_txn.json`` renamed into place
    atomically with the data) and skips any epoch ≤ the last committed
    one — a replayed batch is a no-op instead of a duplicate merge, and
    a torn commit (crash mid-stage) leaves no version and no txn marker,
    so the replay redoes it cleanly.

    The merge keys are the aggregate grain (window_start, event_type):
    update-mode re-emissions of a window replace the stale row, late
    arrivals within the watermark upsert, and finalized windows from
    earlier epochs are untouched.
    """
    from gravity_books_datalakehouse_spark.sources.snapshots import (
        last_txn_version,
        merge_snapshot,
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= last_txn_version(table_dir, app_id):
            return  # replayed epoch: already inside a committed snapshot
        if batch_df.isEmpty():
            return
        merge_snapshot(
            batch_df,
            table_dir,
            ["window_start", "event_type"],
            txn=(app_id, epoch_id),
        )

    events = read_event_stream(spark, source_dir)
    return (
        windowed_counts(events)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def deduped_event_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact-dedup on event_id within the watermark horizon —
    the at-least-once → effectively-once repair for sources that redeliver
    (Kafka producer retries, file re-drops). State holds one key per
    event_id seen within the watermark and is evicted as event time
    advances; without the watermark bound the state would grow forever.
    Batch twin: dropDuplicates (operators/dedup.py exact dedup)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def purchase_click_interval_join(
    events: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream self-join: each purchase paired with the same user's
    clicks from the preceding ``lookback`` window (click-to-purchase
    attribution, incrementally).

    The batch twin is the bucketized range join
    (plans/advanced_queries.py:op_j_range_bucketed); here the SAME
    interval semantics run incrementally: both sides carry watermarks and
    the join condition bounds click event-time relative to purchase
    event-time, which lets Spark (a) buffer each side's rows in the state
    store only until the other side's watermark passes the interval, and
    (b) emit matches exactly once. Without the time bound the state would
    grow without limit — Spark rejects an unbounded stream-stream inner
    join with watermarks for this reason.

    State is keyed by user_id; at production rates the state store shards
    across executors on that key (RocksDB backend recommended beyond
    memory-sized state)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return purchases.join(clicks, cond, "inner").select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id"), "p_ts", "c_ts"
    )
