"""Sequence packing for LLM training pipelines (beyond-reference, §2.8).

Pretraining consumes fixed-length token sequences (e.g. 2048); packing
concatenates documents shard-by-shard and slices the stream at capacity
boundaries, so a document may straddle two adjacent bins. The assignment
here is the *contiguous-fill* strategy used by streaming tokenizers:
bin(i) = floor(cumulative_tokens_before(i) / capacity).

Scale design: a single global cumsum would be one reducer over 100 TB.
Instead the corpus is sharded by (lang, md5-bucket(doc_id)) — the same
portable-hash trick as plans/sampling_queries.py — and each shard packs
independently under one window partition. Shards are the unit of
parallelism AND of reproducibility: re-partitioning the input never
changes any document's bin, and the DuckDB oracle re-derives the exact
assignment. With 4-nibble buckets that is 65k-way parallelism per
language; capacity misuse is bounded (≤ one partially-filled tail bin
per shard).

Reference has no packing (no text pipeline at all); cited for parity
scope only: etl_script_dlh/etl_lakehouse.py handles fixed relational
rows end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table

#: Tokens per packed training sequence.
CAPACITY = 2048

#: Hex nibbles of md5(doc_id) used as the shard key. 1 nibble = 16
#: shards/lang keeps the sf0.01 result readable; production would use 4+.
SHARD_NIBBLES = 1


def ntok_col() -> F.Column:
    """Whitespace token count — matches text.tokens_col()/the oracle."""
    return F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))


def pack_assignments(docs, capacity: int = CAPACITY):
    """Per-document packing assignment: shard, first_bin, last_bin.

    One shuffle (the window partition on (lang, shard)); everything else
    is a narrow projection. first_bin != last_bin marks a straddler that
    the tokenizer splits across two sequences.
    """
    sharded = docs.select(
        "lang",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, SHARD_NIBBLES).alias(
            "shard"
        ),
        "doc_id",
        ntok_col().alias("ntok"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_excl = (F.sum("ntok").over(w) - F.col("ntok")).alias("cum_excl")
    return sharded.select(
        "lang",
        "shard",
        "doc_id",
        "ntok",
        F.floor(cum_excl / capacity).cast("bigint").alias("first_bin"),
        F.floor((cum_excl + F.col("ntok") - 1) / capacity)
        .cast("bigint")
        .alias("last_bin"),
    )


@register(
    "pipeline_pack_sequences",
    f"""WITH t AS (
          SELECT lang,
                 substring(md5(CAST(doc_id AS VARCHAR)), 1, {SHARD_NIBBLES}) AS shard,
                 doc_id,
                 len(string_split_regex(lower(trim(text)), '\\s+')) AS ntok
          FROM documents),
        c AS (
          SELECT lang, shard, ntok,
                 SUM(ntok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - ntok AS cum_excl
          FROM t)
        SELECT lang, shard,
               COUNT(*) AS n_docs,
               CAST(SUM(ntok) AS BIGINT) AS total_tokens,
               CAST(MAX((cum_excl + ntok - 1) // {CAPACITY}) + 1 AS BIGINT) AS n_bins,
               CAST(SUM(CASE WHEN cum_excl // {CAPACITY}
                             <> (cum_excl + ntok - 1) // {CAPACITY}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers,
               ROUND(SUM(ntok) * 1.0
                     / ((MAX((cum_excl + ntok - 1) // {CAPACITY}) + 1) * {CAPACITY}),
                     4) AS fill_ratio
        FROM c
        GROUP BY lang, shard
        ORDER BY lang, shard""",
)
def pipeline_pack_sequences(spark, sf_dir):
    """Pack the corpus into CAPACITY-token training sequences and report
    per-shard bin usage: bins produced, straddling documents, and fill
    ratio (tokens / bin capacity — the waste metric packing exists to
    drive toward 1.0). Two shuffles total: the per-shard window and the
    64-group report aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    a = pack_assignments(docs)
    return (
        a.groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("total_tokens"),
            (F.max("last_bin") + 1).cast("bigint").alias("n_bins"),
            F.sum(
                F.when(F.col("first_bin") != F.col("last_bin"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_straddlers"),
            F.round(
                F.sum("ntok").cast("double")
                / ((F.max("last_bin") + 1) * CAPACITY),
                4,
            ).alias("fill_ratio"),
        )
        .orderBy("lang", "shard")
    )


# --------------------------------------------------------------------------
# Context-length efficiency curve — the sizing table for CAPACITY
# itself. pack_assignments packs at ONE capacity; this publishes, for a
# sweep of context lengths, what each strategy costs on the actual
# corpus length distribution: chunk-and-pad (every doc padded to its own
# ceil(t/L) sequences — the no-cross-doc-attention strategy) vs
# concat-and-chop (the GPT-style packed stream; utilization ~1 by
# construction, docs may straddle). All quantities are exact integer
# arithmetic over the (n_tok -> count) histogram, so the whole curve is
# one map-side histogram collapse + a 4-row rollup — nothing re-scans
# the corpus per L.

_CURVE_LENGTHS = (512, 1024, 2048, 4096)

_PACK_CURVE_SQL = f"""WITH lens AS (
    SELECT len(string_split_regex(lower(trim(text)), '\\s+')) AS t
    FROM documents),
  lv AS (SELECT unnest([{", ".join(str(L) for L in _CURVE_LENGTHS)}]) AS l),
  per AS (
    SELECT lv.l,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN t > lv.l THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_over,
           CAST(SUM(t) AS BIGINT) AS total_tokens,
           CAST(SUM((t + lv.l - 1) // lv.l) AS BIGINT) AS seqs_chunked
    FROM lens CROSS JOIN lv GROUP BY lv.l)
  SELECT l AS context_len, n_docs, n_docs_over, total_tokens,
         seqs_chunked,
         CAST(seqs_chunked * l - total_tokens AS BIGINT) AS pad_waste,
         ROUND(total_tokens * 1.0 / NULLIF(seqs_chunked * l, 0), 6)
           AS util_chunked,
         CAST((total_tokens + l - 1) // l AS BIGINT) AS seqs_packed,
         ROUND(total_tokens * 1.0
               / NULLIF(((total_tokens + l - 1) // l) * l, 0), 6)
           AS util_packed
  FROM per ORDER BY context_len"""


@register("pipeline_packing_efficiency_curve", _PACK_CURVE_SQL)
def pipeline_packing_efficiency_curve(spark, sf_dir):
    """Packing-strategy cost at context lengths 512/1024/2048/4096 from
    ONE token-length histogram (the sim_ivf_nprobe_curve pattern: sweep
    the knob from one pass, never re-scan per level). Per length L:
    docs over L (must chunk or straddle), chunk-and-pad sequence count
    Σ ceil(t/L) with its padding waste and utilization, and the packed
    stream's ceil(Σt/L) sequences with utilization ~1 — the table that
    decides whether cross-document attention contamination (packing) is
    worth the pad waste it avoids (cf. the packing discussion in
    Raffel et al. 2020 §2.2, and Krell et al. 2021 on pad waste).

    Exactness: every count is integer (ceil via (t+L-1) div L both
    engines); the two utilizations are single IEEE divisions rounded 6.
    Plan: token counting is a size(split()) projection (text never
    explodes), collapsed map-side to the value-domain-bounded length
    histogram; the 4-level sweep aggregates histogram rows, not docs."""
    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.select(ntok_col().alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wide = hist.agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.sum(F.col("cnt") * F.col("t")).cast("bigint").alias("total_tokens"),
        *[
            F.sum(
                F.col("cnt") * F.expr(f"(t + {L} - 1) div {L}")
            ).cast("bigint").alias(f"seqs_{L}")
            for L in _CURVE_LENGTHS
        ],
        *[
            F.sum(F.when(F.col("t") > L, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias(f"over_{L}")
            for L in _CURVE_LENGTHS
        ],
    )
    # melt the one-row wide aggregate with a single explode — a 4-leg
    # union would duplicate the aggregate subtree once per level in the
    # plan (exchange reuse usually rescues it at runtime, but the melted
    # plan doesn't need rescuing)
    entries = F.array(
        *[
            F.struct(
                F.lit(L).cast("int").alias("context_len"),
                F.col("n_docs").alias("n_docs"),
                F.col(f"over_{L}").alias("n_docs_over"),
                F.col("total_tokens").alias("total_tokens"),
                F.col(f"seqs_{L}").alias("seqs_chunked"),
                (F.col(f"seqs_{L}") * L - F.col("total_tokens"))
                .cast("bigint")
                .alias("pad_waste"),
                F.round(
                    F.col("total_tokens")
                    * F.lit(1.0)
                    / F.nullif(F.col(f"seqs_{L}") * L, F.lit(0)),
                    6,
                ).alias("util_chunked"),
                F.expr(f"(total_tokens + {L} - 1) div {L}")
                .cast("bigint")
                .alias("seqs_packed"),
                F.round(
                    F.col("total_tokens")
                    * F.lit(1.0)
                    / F.nullif(
                        F.expr(f"((total_tokens + {L} - 1) div {L}) * {L}"),
                        F.lit(0),
                    ),
                    6,
                ).alias("util_packed"),
            )
            for L in _CURVE_LENGTHS
        ]
    )
    return (
        wide.select(F.explode(entries).alias("e"))
        .select("e.*")
        .orderBy("context_len")
    )
