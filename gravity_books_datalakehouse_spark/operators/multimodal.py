"""Multimodal column plumbing (beyond-reference, SURVEY.md §2.8).

Pattern: media lives as opaque ``binary`` payloads with typed metadata
columns; decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages. The image/audio codecs are NOT in this container,
so the decode kernel is STUBBED deterministically (documented below) —
but everything Spark-cares-about is real and tested: the binary column
handling, the Arrow batch shapes, the output schema contract, and the
partition-parallel execution.

The testdata has no binary table, so payloads are derived by encoding
``documents.text`` to UTF-8 bytes — the plumbing is identical for real
JPEG/WAV bytes.

Scale notes: mapInPandas streams Arrow batches (no per-row Python
overhead); media payloads stay columnar and are never shuffled — decode
happens map-side straight off the scan, and only the (small) extracted
features move on. For 100 TB of media, size
``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits
executor memory, and write features back partitioned by media_type.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table

#: Output contract of the decode stage.
DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, "
    "n_frames int, checksum string"
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + media-type metadata column."""
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        media.alias("media_type"),
    )


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode kernel (deterministic fake).

    A real deployment replaces the body with PIL/librosa/ffmpeg calls —
    the signature, Arrow batch flow, and output schema stay identical.
    The fake derives 'dimensions' from payload bytes so results are
    stable and assertable. Raises NotImplementedError for real codec
    requests to make the stub boundary explicit.
    """
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"].map(bytes)
        n = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n,
                "width": payloads.map(lambda b: 64 + b[0] % 64 if b else 0),
                "height": payloads.map(lambda b: 64 + b[-1] % 64 if b else 0),
                "n_frames": (1 + n % 48).where(pdf["media_type"] != "image", 1),
                "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


def decode_media(docs_with_payload: DataFrame) -> DataFrame:
    """Partition-parallel decode via mapInPandas (Arrow-batched)."""
    return docs_with_payload.mapInPandas(decode_media_batch, schema=DECODE_SCHEMA)


@register(
    "mm_payload_metadata",
    """SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image'
                   WHEN doc_id % 3 = 1 THEN 'audio'
                   ELSE 'video' END AS media_type,
              octet_length(encode(text)) AS n_bytes,
              md5(text) AS checksum
       FROM documents""",
)
def mm_payload_metadata(spark, sf_dir):
    """Typed metadata over binary payloads — pure column ops (byte length,
    content checksum) that never leave the JVM. SQL-expressible, so this
    leg of the multimodal suite is oracle-verified; n_bytes counts UTF-8
    bytes, not characters."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("checksum"),
    )


@register("mm_decode_features", None)  # rows-only: mapInPandas stage
def mm_decode_features(spark, sf_dir):
    """Decode/feature-extract stage through real mapInPandas plumbing with
    the stubbed kernel. No SQL oracle (Python stage) — driver records the
    rows-only check; tests/test_multimodal.py asserts the deterministic
    fake features instead."""
    return decode_media(with_payload(load_table(spark, sf_dir, "documents")))


@register(
    "mm_frame_sample",
    """SELECT doc_id,
              unnest(generate_series(0, (1 + octet_length(encode(text)) % 48) - 1, 8))
                AS frame_idx
       FROM documents
       WHERE doc_id % 3 = 2""",
)
def mm_frame_sample(spark, sf_dir):
    """Frame sampling for video payloads: every 8th frame index via
    sequence+explode — the row-expansion side of multimodal processing
    (decode of the sampled frames would then run through decode_media)."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    videos = docs.filter(F.col("media_type") == "video").select(
        "doc_id", (1 + F.octet_length("payload") % 48).alias("n_frames")
    )
    return videos.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(8))
        ).alias("frame_idx"),
    )


def decode_media_arrow_batch(batches):
    """mapInArrow variant of the decode kernel: consumes/produces raw
    pyarrow RecordBatches — no pandas materialization at all, the lowest
    overhead Python batch path (useful when the real codec consumes
    buffers directly, e.g. libjpeg/ffmpeg bindings over Arrow memory)."""
    import hashlib

    import pyarrow as pa

    for batch in batches:
        payloads = batch.column("payload").to_pylist()
        media = batch.column("media_type").to_pylist()
        n = [len(b) for b in payloads]
        yield pa.RecordBatch.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "media_type": batch.column("media_type"),
                "n_bytes": pa.array(n, pa.int32()),
                "width": pa.array(
                    [64 + b[0] % 64 if b else 0 for b in payloads], pa.int32()
                ),
                "height": pa.array(
                    [64 + b[-1] % 64 if b else 0 for b in payloads], pa.int32()
                ),
                "n_frames": pa.array(
                    [1 if m == "image" else 1 + k % 48 for m, k in zip(media, n)],
                    pa.int32(),
                ),
                "checksum": pa.array(
                    [hashlib.md5(b).hexdigest() for b in payloads], pa.string()
                ),
            }
        )


def decode_media_arrow(docs_with_payload: DataFrame) -> DataFrame:
    """decode_media, but through mapInArrow (same output contract)."""
    return docs_with_payload.mapInArrow(decode_media_arrow_batch, schema=DECODE_SCHEMA)


@register(
    "mm_payload_dedup",
    """SELECT payload_fp, media_type,
              CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_copies,
              CAST(MAX(n_bytes) AS BIGINT) AS payload_bytes
       FROM (
         SELECT doc_id,
                md5(text) AS payload_fp,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS media_type,
                octet_length(encode(text)) AS n_bytes
         FROM documents)
       GROUP BY payload_fp, media_type
       HAVING COUNT(*) >= 2
       ORDER BY payload_fp, media_type""",
)
def mm_payload_dedup(spark, sf_dir):
    """Exact dedup over OPAQUE BINARY payloads: group by md5 of the raw
    bytes — the multimodal twin of dedup_exact (image/audio/video blobs
    dedupe on content digest before any decode; at 100 TB the 16-byte
    digest is the only thing that shuffles, never the media). Emits only
    duplicated payloads with a representative id and byte size. The
    Spark side hashes the binary column directly; the oracle hashes the
    identical UTF-8 byte string (same bytes — the testdata payload is
    the encoded text, multimodal.py:51)."""
    docs = load_table(spark, sf_dir, "documents")
    p = with_payload(docs)
    return (
        p.select(
            "doc_id",
            "media_type",
            F.md5("payload").alias("payload_fp"),
            F.length("payload").alias("n_bytes"),
        )
        .groupBy("payload_fp", "media_type")
        .agg(
            F.min("doc_id").cast("bigint").alias("rep_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.max("n_bytes").cast("bigint").alias("payload_bytes"),
        )
        .filter(F.col("n_copies") >= 2)
        .orderBy("payload_fp", "media_type")
    )


# --------------------------------------------------------------------------
# Audio windowing plan: the segmentation step every audio feature
# pipeline runs before the codec touches a byte (fixed windows with
# overlap -> one feature-extraction task per window). The PLAN is pure
# integer arithmetic over metadata — window offsets, not samples — so
# it is exactly oracle-checkable even though the decode itself is
# stubbed; a real deployment feeds these (doc_id, start, end) spans to
# the mapInPandas decode kernel above.

AUDIO_SAMPLE_RATE = 16000
AUDIO_WINDOW = 8000  #: samples per window (0.5 s @ 16 kHz)
AUDIO_HOP = 4000  #: hop (50% overlap)


@register(
    "mm_audio_window_plan",
    f"""WITH audio AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             octet_length(encode(text)) * 8 AS n_samples
      FROM documents
      WHERE doc_id % 3 = 1),
    planned AS (
      SELECT doc_id, n_samples,
             CASE WHEN n_samples < {AUDIO_WINDOW} THEN 1
                  ELSE (n_samples - {AUDIO_WINDOW}) // {AUDIO_HOP} + 1
             END AS n_windows
      FROM audio),
    exploded AS (
      SELECT doc_id, n_samples,
             unnest(generate_series(0, n_windows - 1)) AS w
      FROM planned)
    SELECT doc_id,
           CAST(w AS INT) AS window_idx,
           CAST(w * {AUDIO_HOP} AS BIGINT) AS start_sample,
           CAST(LEAST(w * {AUDIO_HOP} + {AUDIO_WINDOW}, n_samples)
                AS BIGINT) AS end_sample,
           w * {AUDIO_HOP} + {AUDIO_WINDOW} > n_samples AS padded
    FROM exploded
    ORDER BY doc_id, window_idx""",
)
def mm_audio_window_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window segmentation plan for the audio-typed
    payloads (0.5 s windows, 50% hop at the synthetic 16 kHz):
    one row per (doc, window) with exact sample offsets, the final
    window clamped and flagged when it would read past the end; audio
    shorter than one window yields a single padded window. Sample
    counts derive from payload byte length (the metadata stand-in for
    the stubbed codec's header parse — the plan logic is codec-free by
    design).

    Plan shape: a metadata projection (payload bytes never move),
    integer window count per doc, then sequence+explode — output rows
    proportional to total audio duration over hop, the plan's own
    size. At 100 TB the window plan co-partitions with the payload
    scan, so the downstream decode (mapInPandas over payload + spans)
    reads each payload exactly once, map-side."""
    docs = load_table(spark, sf_dir, "documents")
    audio = docs.where(F.col("doc_id") % 3 == 1).select(
        "doc_id",
        (F.length(F.encode(F.col("text"), "UTF-8")) * 8).alias("n_samples"),
    )
    planned = audio.withColumn(
        "n_windows",
        F.when(F.col("n_samples") < AUDIO_WINDOW, F.lit(1)).otherwise(
            F.expr(f"(n_samples - {AUDIO_WINDOW}) div {AUDIO_HOP} + 1")
        ),
    )
    return (
        planned.select(
            "doc_id",
            "n_samples",
            F.explode(
                F.sequence(F.lit(0), F.col("n_windows").cast("int") - 1)
            ).alias("window_idx"),
        )
        .select(
            "doc_id",
            "window_idx",
            (F.col("window_idx").cast("bigint") * AUDIO_HOP).alias(
                "start_sample"
            ),
            F.least(
                F.col("window_idx").cast("bigint") * AUDIO_HOP + AUDIO_WINDOW,
                F.col("n_samples").cast("bigint"),
            ).alias("end_sample"),
            (
                F.col("window_idx").cast("bigint") * AUDIO_HOP + AUDIO_WINDOW
                > F.col("n_samples")
            ).alias("padded"),
        )
        .orderBy("doc_id", "window_idx")
    )


# --------------------------------------------------------------------------
# Image tiling plan — the 2D sibling of the audio window plan above:
# vision pipelines cut large images into fixed tiles before the encoder
# (ViT patching, SAM tiling). The PLAN is integer arithmetic over
# metadata dimensions; the stubbed decode consumes (doc_id, x0, y0,
# x1, y1) spans.

TILE = 32


@register(
    "mm_image_tile_plan",
    f"""WITH img AS (
      SELECT doc_id,
             64 + doc_id % 97 AS w,
             64 + (doc_id * 7) % 89 AS h
      FROM documents WHERE doc_id % 3 = 0),
    planned AS (
      SELECT doc_id, w, h,
             (w + {TILE - 1}) // {TILE} AS nx,
             (h + {TILE - 1}) // {TILE} AS ny
      FROM img),
    ex AS (
      SELECT doc_id, w, h, ny,
             unnest(generate_series(0, nx - 1)) AS tx
      FROM planned),
    exy AS (
      SELECT doc_id, w, h, tx,
             unnest(generate_series(0, ny - 1)) AS ty
      FROM ex)
    SELECT doc_id,
           CAST(tx AS INT) AS tile_x,
           CAST(ty AS INT) AS tile_y,
           CAST(tx * {TILE} AS BIGINT) AS x0,
           CAST(ty * {TILE} AS BIGINT) AS y0,
           CAST(LEAST(tx * {TILE} + {TILE}, w) AS BIGINT) AS x1,
           CAST(LEAST(ty * {TILE} + {TILE}, h) AS BIGINT) AS y1,
           tx * {TILE} + {TILE} > w OR ty * {TILE} + {TILE} > h AS padded
    FROM exy
    ORDER BY doc_id, tile_x, tile_y""",
)
def mm_image_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-overlapping 32x32 tiling plan for the image-typed payloads:
    one row per (doc, tile) with exact pixel spans, edge tiles clamped
    and flagged. Dimensions are a deterministic metadata stand-in
    (64 + doc_id%97 by 64 + 7*doc_id%89 — the stubbed codec's header
    parse; the plan logic is codec-free by design, exactly like
    mm_audio_window_plan's sample counts).

    Plan shape: metadata projection, integer tile counts, two nested
    sequence explodes — rows proportional to total image area over
    tile area, the plan's own size; co-partitions with the payload
    scan so the decode reads each image once."""
    docs = load_table(spark, sf_dir, "documents")
    img = docs.where(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        (F.lit(64) + F.col("doc_id") % 97).alias("w"),
        (F.lit(64) + (F.col("doc_id") * 7) % 89).alias("h"),
    )
    planned = img.select(
        "doc_id",
        "w",
        "h",
        F.expr(f"(w + {TILE - 1}) div {TILE}").alias("nx"),
        F.expr(f"(h + {TILE - 1}) div {TILE}").alias("ny"),
    )
    tiled = (
        planned.select(
            "doc_id",
            "w",
            "h",
            "ny",
            F.explode(
                F.sequence(F.lit(0), F.col("nx").cast("int") - 1)
            ).alias("tx"),
        )
        .select(
            "doc_id",
            "w",
            "h",
            "tx",
            F.explode(
                F.sequence(F.lit(0), F.col("ny").cast("int") - 1)
            ).alias("ty"),
        )
    )
    x0 = F.col("tx").cast("bigint") * TILE
    y0 = F.col("ty").cast("bigint") * TILE
    return tiled.select(
        "doc_id",
        F.col("tx").cast("int").alias("tile_x"),
        F.col("ty").cast("int").alias("tile_y"),
        x0.alias("x0"),
        y0.alias("y0"),
        F.least(x0 + TILE, F.col("w").cast("bigint")).alias("x1"),
        F.least(y0 + TILE, F.col("h").cast("bigint")).alias("y1"),
        ((x0 + TILE > F.col("w")) | (y0 + TILE > F.col("h"))).alias("padded"),
    ).orderBy("doc_id", "tile_x", "tile_y")


@register(
    "mm_modality_mix_report",
    """SELECT source,
              CASE WHEN doc_id % 3 = 0 THEN 'image'
                   WHEN doc_id % 3 = 1 THEN 'audio'
                   ELSE 'video' END AS media_type,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(octet_length(encode(text))) AS BIGINT)
                AS payload_bytes,
              ROUND(SUM(octet_length(encode(text))) * 1.0 /
                    SUM(SUM(octet_length(encode(text))))
                      OVER (PARTITION BY source), 6) AS byte_share
       FROM documents
       GROUP BY 1, 2
       ORDER BY source, media_type""",
)
def mm_modality_mix_report(spark, sf_dir):
    """Payload bytes by source x modality with the within-source byte
    share — the capacity-planning number a multimodal training mix is
    budgeted from (modality decides decode cost and tokens-per-byte, so
    the byte mix IS the compute mix). Pure metadata aggregation: the
    payload column contributes only its LENGTH, computed map-side off
    the scan; binary bytes never shuffle (the module's standing
    contract). The share divides exact integer byte sums; the window
    runs over the |sources| x 3 cell frame."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    cells = (
        docs.select(
            "source",
            media.alias("media_type"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("nb"),
        )
        .groupBy("source", "media_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nb").cast("bigint").alias("payload_bytes"),
        )
    )
    w_src = Window.partitionBy("source")
    return (
        cells.select(
            "source",
            "media_type",
            "n_docs",
            "payload_bytes",
            F.round(
                F.col("payload_bytes")
                * F.lit(1.0)
                / F.sum("payload_bytes").over(w_src),
                6,
            ).alias("byte_share"),
        )
        .orderBy("source", "media_type")
    )
