"""Corpus quality filters for LLM training data (beyond-reference, §2.8).

Two families of operators the big public pipelines run before training:

- **Repetition statistics** (Gopher, Rae et al. 2021 §A1.1, public
  literature): per-document duplicate n-gram fractions and the
  most-frequent-bigram mass. Excessively repetitive documents are the
  classic low-quality signal; the thresholds here mirror the paper's
  shape (fractions, not counts), tuned to the synthetic corpus.
- **Cross-document segment dedup** (C4, Raffel et al. 2020 §2.2 runs
  this at the *line* level; the synthetic corpus has no newlines, so
  the unit is a disjoint 10-token segment — same operator shape):
  segments whose content hash appears in >=2 distinct documents are
  removed everywhere, and each document is reassembled in order.

Scale notes: repetition's dup-fractions are pure array math (zero
shuffle); its top-bigram mass and segment dedup shuffle on (doc_id,
gram) / content-hash keys — both carry 16-byte digests + counts, never
full text, and partial aggregation combines map-side. Reassembly
shuffles one (pos, segment) struct list per doc, the same shape
operators/packing.py already proves out.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.text import (
    TOKS_SQL,
    tokens_col,
)
from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table

#: DuckDB list-comprehension twins of shingle_array_col(toks, k).
BIGRAMS_SQL = (
    f"[t.toks[i] || ' ' || t.toks[i+1] for i in range(1, len(t.toks))]"
)
FIVEGRAMS_SQL = (
    "[t.toks[i] || ' ' || t.toks[i+1] || ' ' || t.toks[i+2] || ' ' || "
    "t.toks[i+3] || ' ' || t.toks[i+4] for i in range(1, len(t.toks) - 3)]"
)

#: Gopher-style keep thresholds (fractions of n-gram occurrences).
DUP_5GRAM_MAX = 0.15
TOP_2GRAM_MAX = 0.08


#: Standalone oracle for the repetition stats (also reused as a CTE body
#: by pipeline_curate_corpus).
REPETITION_STATS_SQL = f"""WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        g AS (SELECT doc_id, {BIGRAMS_SQL} AS bg, {FIVEGRAMS_SQL} AS fg
              FROM t),
        top AS (
          SELECT doc_id,
                 MAX(cnt) * 1.0 / SUM(cnt) AS top_frac
          FROM (SELECT doc_id, bg_one, COUNT(*) AS cnt
                FROM (SELECT doc_id, unnest(bg) AS bg_one FROM g)
                GROUP BY doc_id, bg_one)
          GROUP BY doc_id)
        SELECT g.doc_id,
               CAST(len(bg) + 1 AS BIGINT) AS n_tokens,
               ROUND((len(bg) - len(list_distinct(bg))) * 1.0
                     / greatest(len(bg), 1), 6) AS dup_2gram_frac,
               ROUND((len(fg) - len(list_distinct(fg))) * 1.0
                     / greatest(len(fg), 1), 6) AS dup_5gram_frac,
               ROUND(top.top_frac, 6) AS top_2gram_frac,
               (len(fg) - len(list_distinct(fg))) * 1.0
                 / greatest(len(fg), 1) <= {DUP_5GRAM_MAX}
                 AND top.top_frac <= {TOP_2GRAM_MAX} AS gopher_keep
        FROM g JOIN top ON g.doc_id = top.doc_id"""


def _ngram_doc_stats(docs, k: int):
    """(doc_id, total_k, distinct_k, max_k): per-doc k-gram occurrence
    stats from an index explode + two-level aggregation.

    Why exploded counts and not array expressions (size/array_distinct
    over a shingle array): any array expression over a computed shingle
    column is one optimizer move away from quadratic — CollapseProject
    inlines the tokenizing split into the per-element lambda, and
    predicate pushdown (e.g. a downstream filter on gopher_keep, as in
    pipeline_curate_corpus) relocates the whole expression into a
    scan-side Filter where it is evaluated again (measured 18 s vs 2 s
    at sf0.1). The exploded form has no per-element references to
    rebuild: the index sequence is cheap to inline, each k-gram is k
    O(1) element_at lookups, and both aggregations combine map-side."""
    t = docs.select("doc_id", tokens_col().alias("toks"))
    n_win = F.size("toks") - (k - 1)
    idx = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
        F.array().cast("array<int>")
    )
    gram = F.concat_ws(
        " ", *[F.element_at("toks", F.col("i") + off) for off in range(k)]
    )
    return (
        t.select("doc_id", "toks", F.explode(idx).alias("i"))
        .select("doc_id", gram.alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias(f"total_{k}"),
            F.count(F.lit(1)).alias(f"distinct_{k}"),
            F.max("cnt").alias(f"max_{k}"),
        )
    )


@register("text_repetition_stats", REPETITION_STATS_SQL)
def text_repetition_stats(spark, sf_dir):
    """Gopher-style repetition filters: duplicate 2-/5-gram fractions and
    the fraction of bigram occurrences claimed by the single most
    frequent bigram, plus the keep verdict. All statistics derive from
    exploded (doc_id, gram) counts — see _ngram_doc_stats for why that
    beats array expressions under composition — joined per-doc (narrow
    rows, co-partitioned aggregation outputs)."""
    docs = load_table(spark, sf_dir, "documents")
    s2 = _ngram_doc_stats(docs, 2)
    s5 = _ngram_doc_stats(docs, 5)
    dup2 = (F.col("total_2") - F.col("distinct_2")) / F.greatest(
        F.col("total_2"), F.lit(1)
    )
    # left join + coalesce(0): a 2-4-token doc has bigrams but no
    # 5-grams; the oracle's empty-array form scores it dup5=0
    dup5 = F.coalesce(
        (F.col("total_5") - F.col("distinct_5"))
        / F.greatest(F.col("total_5"), F.lit(1)),
        F.lit(0.0),
    )
    top_frac = F.col("max_2") * 1.0 / F.col("total_2")
    return (
        s2.join(s5, "doc_id", "left")
        .select(
            "doc_id",
            (F.col("total_2") + 1).cast("bigint").alias("n_tokens"),
            F.round(dup2, 6).alias("dup_2gram_frac"),
            F.round(dup5, 6).alias("dup_5gram_frac"),
            F.round(top_frac, 6).alias("top_2gram_frac"),
            (
                (dup5 <= DUP_5GRAM_MAX) & (top_frac <= TOP_2GRAM_MAX)
            ).alias("gopher_keep"),
        )
    )


SEG_TOKENS = 10


@register(
    "text_segment_dedup",
    f"""WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        segs AS (
          SELECT doc_id, start_pos,
                 array_to_string(toks[start_pos : start_pos + {SEG_TOKENS - 1}], ' ') AS seg
          FROM (SELECT doc_id, toks,
                       unnest(generate_series(1, greatest(len(toks), 1), {SEG_TOKENS}))
                         AS start_pos
                FROM t)),
        dup AS (
          SELECT md5(seg) AS seg_md5
          FROM segs GROUP BY md5(seg)
          HAVING COUNT(DISTINCT doc_id) >= 2)
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_segs,
               CAST(SUM(CASE WHEN d.seg_md5 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_removed,
               md5(COALESCE(string_agg(CASE WHEN d.seg_md5 IS NULL THEN s.seg END,
                                       ' ' ORDER BY s.start_pos), '')) AS clean_fp
        FROM segs s LEFT JOIN dup d ON md5(s.seg) = d.seg_md5
        GROUP BY s.doc_id""",
)
def text_segment_dedup(spark, sf_dir):
    """C4-style cross-document duplicate-span removal at 10-token
    segment granularity: any segment whose hash occurs in >=2 distinct
    documents is dropped from all of them, and each document's surviving
    segments are reassembled in order (reported content-addressed, as
    the md5 of the cleaned text).

    Scale shape: the duplicate set is found by a count over 16-byte
    segment digests (never text); the membership join is hash-keyed and
    co-partitioned with that count; reassembly is one (pos, seg) list
    per doc with an in-memory sort — no window, no full-text shuffle
    beyond the segments themselves."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_col().alias("toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(SEG_TOKENS)
    )
    segs = t.select(
        "doc_id", F.explode(starts).alias("start_pos"), "toks"
    ).select(
        "doc_id",
        "start_pos",
        F.array_join(F.slice("toks", F.col("start_pos"), SEG_TOKENS), " ").alias("seg"),
    ).withColumn("seg_md5", F.md5("seg"))
    dup = (
        segs.groupBy("seg_md5")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("seg_md5")
    )
    flagged = segs.join(
        dup.withColumn("is_dup", F.lit(True)), "seg_md5", "left"
    )
    kept_struct = F.when(
        F.col("is_dup").isNull(), F.struct("start_pos", "seg")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segs"),
            F.sum(
                F.when(F.col("is_dup").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_removed"),
            F.md5(
                F.coalesce(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(kept_struct)),
                            lambda s: s.seg,
                        ),
                        " ",
                    ),
                    F.lit(""),
                )
            ).alias("clean_fp"),
        )
    )


#: Curation thresholds for the end-to-end pipeline.
MIN_CHARS = 100


def _curate_sql() -> str:
    """Oracle for the composite pipeline: minhash pair CTEs + repetition
    verdict as a nested-WITH CTE + keep-first dedup + length filter."""
    from gravity_books_datalakehouse_spark.operators.dedup import _MINHASH_SQL

    return (
        _MINHASH_SQL
        + f""",
  rep AS ({REPETITION_STATS_SQL}),
  dropped AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
  SELECT d.lang,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
  FROM documents d
  JOIN rep r ON d.doc_id = r.doc_id
  LEFT JOIN dropped x ON d.doc_id = x.doc_id
  WHERE x.doc_id IS NULL AND r.gopher_keep AND d.n_chars >= {MIN_CHARS}
  GROUP BY d.lang
  ORDER BY d.lang"""
    )


def _register_curate():
    @register("pipeline_curate_corpus", _curate_sql())
    def pipeline_curate_corpus(spark, sf_dir):
        """End-to-end corpus curation in ONE declarative plan — the
        integration the individual operators exist for:

        1. repetition verdict (text_repetition_stats.gopher_keep),
        2. near-dup removal with the keep-first rule (a document is
           dropped iff it has a smaller-id MinHash+LSH partner — the
           pairwise form of cluster-representative selection, chosen
           because it is exactly SQL-expressible, so the WHOLE pipeline
           stays under the DuckDB oracle; the cluster-exact variant is
           dedup_clusters_connected_components),
        3. minimum-length floor,
        reported as kept docs/chars per language.

        Every stage reuses the session-cached shingle/pair frames, so
        the composite costs one anti-join + one broadcast verdict join
        over what the component queries already pay."""
        from gravity_books_datalakehouse_spark.operators.dedup import (
            dedup_minhash_lsh_pairs,
        )
        from gravity_books_datalakehouse_spark.sources.catalog import (
            load_table as _load,
        )

        docs = _load(spark, sf_dir, "documents")
        rep = text_repetition_stats(spark, sf_dir).select("doc_id", "gopher_keep")
        dropped = (
            dedup_minhash_lsh_pairs(spark, sf_dir)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        return (
            docs.join(rep, "doc_id")
            .filter(F.col("gopher_keep") & (F.col("n_chars") >= MIN_CHARS))
            .join(dropped, "doc_id", "left_anti")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_kept"),
                F.sum("n_chars").cast("bigint").alias("kept_chars"),
            )
            .orderBy("lang")
        )

    return pipeline_curate_corpus


pipeline_curate_corpus = _register_curate()


#: Keep the top fraction of documents by LM score within each language.
PCT_KEEP = 0.60


def _percentile_cut_sql() -> str:
    from gravity_books_datalakehouse_spark.operators.lm import (
        BIGRAM_LOGPROB_SQL,
    )

    return f"""WITH scored AS (
          SELECT d.lang, s.doc_id, s.avg_logprob,
                 percent_rank() OVER (
                   PARTITION BY d.lang
                   ORDER BY s.avg_logprob DESC, s.doc_id ASC) AS pr
          FROM ({BIGRAM_LOGPROB_SQL}) s JOIN documents d ON s.doc_id = d.doc_id)
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               ROUND(MIN(avg_logprob), 6) AS cutoff_logprob
        FROM scored
        WHERE pr <= {PCT_KEEP}
        GROUP BY lang
        ORDER BY lang"""


@register("text_quality_percentile_cut", _percentile_cut_sql())
def text_quality_percentile_cut(spark, sf_dir):
    """Percentile-based quality cut: keep the top 60% of documents per
    language by bigram-LM score — the rank-normalized form of model-based
    filtering (absolute LM thresholds drift with corpus mix; a per-stratum
    percentile is self-calibrating, the rule CCNet applies with its
    perplexity buckets). One window shuffle partitioned by lang; the LM
    scoring reuses text_bigram_logprob's co-partitioned count joins."""
    from pyspark.sql import Window

    from gravity_books_datalakehouse_spark.operators.lm import (
        text_bigram_logprob,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = text_bigram_logprob(spark, sf_dir).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("avg_logprob"), F.asc("doc_id")
    )
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= PCT_KEEP)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.round(F.min("avg_logprob"), 6).alias("cutoff_logprob"),
        )
        .orderBy("lang")
    )


def _manifest_sql() -> str:
    from gravity_books_datalakehouse_spark.operators.dedup import _MINHASH_SQL

    return (
        _MINHASH_SQL
        + f""",
  rep AS ({REPETITION_STATS_SQL}),
  dropped AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
  kept AS (
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    JOIN rep r ON d.doc_id = r.doc_id
    LEFT JOIN dropped x ON d.doc_id = x.doc_id
    WHERE x.doc_id IS NULL AND r.gopher_keep AND d.n_chars >= {MIN_CHARS})
  SELECT CASE WHEN h < 'cccc' THEN 'train'
              WHEN h < 'e666' THEN 'val'
              ELSE 'test' END AS split,
         lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM (SELECT lang, n_chars,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
        FROM kept)
  GROUP BY 1, 2
  ORDER BY split, lang"""
    )


def _register_manifest():
    @register("pipeline_mixture_manifest", _manifest_sql())
    def pipeline_mixture_manifest(spark, sf_dir):
        """The end artifact of the curation pipeline: the training
        mixture manifest. Curated keep-set (repetition verdict +
        keep-first LSH dedup + length floor — pipeline_curate_corpus's
        rules) crossed with the 80/10/10 content-hash split
        (op_split_train_eval's bands, applied AFTER curation so split
        membership is a pure function of doc_id and survives any
        curation-rule change), reported as docs/chars per (split,
        lang) — exactly the table a training-run config consumes.
        Still ONE declarative plan, hash-verified end-to-end."""
        from gravity_books_datalakehouse_spark.operators.dedup import (
            dedup_minhash_lsh_pairs,
        )
        from gravity_books_datalakehouse_spark.plans.sampling_queries import (
            _T80,
            _T90,
            hash_fraction_hex,
        )
        from gravity_books_datalakehouse_spark.sources.catalog import (
            load_table as _load,
        )

        docs = _load(spark, sf_dir, "documents")
        rep = text_repetition_stats(spark, sf_dir).select("doc_id", "gopher_keep")
        dropped = (
            dedup_minhash_lsh_pairs(spark, sf_dir)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        kept = (
            docs.join(rep, "doc_id")
            .filter(F.col("gopher_keep") & (F.col("n_chars") >= MIN_CHARS))
            .join(dropped, "doc_id", "left_anti")
        )
        h = hash_fraction_hex(F.col("doc_id"))
        split = (
            F.when(h < _T80, "train").when(h < _T90, "val").otherwise("test")
        )
        return (
            kept.select(split.alias("split"), "lang", "n_chars")
            .groupBy("split", "lang")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
            )
            .orderBy("split", "lang")
        )

    return pipeline_mixture_manifest


pipeline_mixture_manifest = _register_manifest()


# --------------------------------------------------------------------------
# Token-budget mixture allocation: the curation step between scoring and
# training — given a token budget, fill it greedily from the
# highest-quality sources, splitting the straddling source pro rata. The
# greedy order on a per-source quality signal is the fractional-knapsack
# optimum for a budget constraint; allocations are pure integers.

_MIX_BUDGET_NUM = 1  #: budget = 1/2 of total corpus tokens
_MIX_BUDGET_DEN = 2


def _mix_sql() -> str:
    from gravity_books_datalakehouse_spark.operators.text import TOKS_SQL

    return f"""WITH per_src AS (
      SELECT source,
             CAST(SUM(len({TOKS_SQL})) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ok,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    tot AS (SELECT SUM(n_tokens) AS t FROM per_src),
    ranked AS (
      SELECT source, n_tokens, n_ok, n_docs,
             SUM(n_tokens) OVER (ORDER BY n_ok * 1000000 // n_docs DESC,
                                 source ROWS UNBOUNDED PRECEDING)
               AS cum_tokens,
             (SELECT t FROM tot) // {_MIX_BUDGET_DEN} * {_MIX_BUDGET_NUM}
               AS budget
      FROM per_src)
    SELECT source,
           n_tokens,
           ROUND(CAST(n_ok AS DOUBLE) / n_docs, 6) AS quality_frac,
           CAST(CASE
             WHEN cum_tokens <= budget THEN n_tokens
             WHEN cum_tokens - n_tokens < budget
               THEN budget - (cum_tokens - n_tokens)
             ELSE 0 END AS BIGINT) AS allocated_tokens
    FROM ranked
    ORDER BY source"""


@register("pipeline_token_budget_mix", _mix_sql())
def pipeline_token_budget_mix(spark, sf_dir):
    """Greedy token-budget mixture: sources rank by quality (share of
    non-short docs — integer rank key n_ok*10^6/n_docs with source-ASC
    ties, so the ORDER is decided by integer division, never a float),
    then fill half the corpus token budget best-first; the straddling
    source gets exactly the remaining tokens, everything after gets 0.
    The fractional-knapsack greedy is optimal for a budget constraint;
    every allocation is exact integer arithmetic (the displayed
    quality_frac is one correctly-rounded division).

    Plan shape: one scan collapsing map-side to per-source sums, one
    STRATA-sized running-sum window (|sources| rows — bounded at any
    corpus size), broadcast scalar total. The output is the manifest a
    sampler (op_sample_temperature_mix / op_cap_per_source) consumes."""
    from pyspark.sql import Window as W

    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort
    from gravity_books_datalakehouse_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.sum(F.size(tokens_col())).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("n_chars") >= 100, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ok"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    tot = per_src.agg(F.sum("n_tokens").alias("t"))
    rank_key = F.expr("n_ok * 1000000 div n_docs")
    w = W.orderBy(F.desc(rank_key), F.asc("source")).rowsBetween(
        W.unboundedPreceding, 0
    )
    budget = F.expr(f"t div {_MIX_BUDGET_DEN} * {_MIX_BUDGET_NUM}")
    ranked = (
        per_src.join(F.broadcast(tot))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("budget", budget)
    )
    alloc = (
        F.when(F.col("cum_tokens") <= F.col("budget"), F.col("n_tokens"))
        .when(
            F.col("cum_tokens") - F.col("n_tokens") < F.col("budget"),
            F.col("budget") - (F.col("cum_tokens") - F.col("n_tokens")),
        )
        .otherwise(0)
    )
    return ranked.select(
        "source",
        "n_tokens",
        F.round(F.col("n_ok").cast("double") / F.col("n_docs"), 6).alias(
            "quality_frac"
        ),
        alloc.cast("bigint").alias("allocated_tokens"),
    ).transform(bounded_sort, "source")


# --------------------------------------------------------------------------
# Compression-ratio quality signal (the Gopher/FineWeb heuristic: text
# that zlib squeezes hard is repetitive boilerplate; text that barely
# compresses is high-entropy noise — both tails are low-quality). zlib
# is deterministic at a fixed level, so the scores are exactly
# reproducible — but no SQL engine exposes it, making this the
# documented Arrow-batched-UDF leg of the quality kit (rows-only driver
# check; tests/test_quality.py replays zlib exactly).

_ZLIB_LEVEL = 6
_RATIO_LOW = 0.30   #: below: repetitive/boilerplate tail
_RATIO_HIGH = 0.90  #: above: high-entropy/noise tail


def compression_ratio_col():
    """Vectorized zlib ratio pandas_udf: compressed_bytes / raw_bytes of
    the UTF-8 text. Arrow-batched (one Python call per batch, zlib
    releases the GIL) — never a row-at-a-time Python UDF."""
    import zlib

    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf's signature inference rejects string hints;
    # hint-less defaults to the SCALAR Series->Series eval type
    @pandas_udf("double")
    def _ratio(texts):
        def one(t) -> float:
            # NULL text arrives as None inside the Arrow batch; propagate
            # NULL like every engine-side operator instead of crashing the
            # whole batch on t.encode (ADVICE r8).
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, _ZLIB_LEVEL)) / len(raw)

        return texts.map(one)

    return _ratio


@register("text_compression_ratio", None)  # rows-only: zlib has no SQL twin
def text_compression_ratio(spark, sf_dir):
    """Per-source compression-ratio profile: mean ratio plus both
    low-quality tails (ratio < 0.30 boilerplate, > 0.90 noise). The
    ratio itself is exact and deterministic (fixed zlib level, UTF-8
    bytes); only the SQL-oracle CHANNEL is missing, so the driver
    records rows-only and the pytest replays zlib bit-exactly.

    Plan shape: ONE ArrowEvalPython stage computes the per-doc ratio
    map-side off the scan (payloads never shuffle); the per-source
    rollup is strata-sized. At 100 TB this is the shape every
    model-scored quality filter runs — the UDF swaps for a classifier,
    the plumbing stands."""
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    docs = load_table(spark, sf_dir, "documents")
    ratio = compression_ratio_col()(F.col("text")).alias("ratio")
    scored = docs.select("source", ratio)
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("ratio"), 6).alias("mean_ratio"),
            F.sum(F.when(F.col("ratio") < _RATIO_LOW, 1).otherwise(0))
            .cast("bigint")
            .alias("n_boilerplate"),
            F.sum(F.when(F.col("ratio") > _RATIO_HIGH, 1).otherwise(0))
            .cast("bigint")
            .alias("n_noise"),
        )
        .transform(bounded_sort, "source")
    )


# --------------------------------------------------------------------------
# Temperature-scaled source mixture — the multilingual/source-balancing
# knob (the p_i^alpha / sum p_j^alpha rule of XLM-R, mT5, and the BLOOM
# data card): raw token shares over-train hefty sources, alpha < 1
# flattens the mixture toward uniform. Cross-engine exactness is why
# the alpha grid is {1, 1/2, 1/4}: t^(1/2) = sqrt(t) and
# t^(1/4) = sqrt(sqrt(t)) are correctly-rounded IEEE ops (bit-equal on
# both engines), unlike a libm pow(t, 0.3). The share denominators sum
# irrational terms, so BOTH engines accumulate them with an in-order
# running sum (ORDER BY source) and read the total off the last row —
# float addition is not associative, and pinning the order is what
# keeps the 6-dp rounds off the boundary.


@register(
    "pipeline_temperature_mixture",
    """WITH tok AS (
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(COALESCE(len(string_split_regex(
                    lower(trim(text)), '\\s+')), 0)) AS BIGINT) AS total_tokens
         FROM documents GROUP BY source),
       s AS (SELECT source, n_docs, total_tokens,
                    sqrt(CAST(total_tokens AS DOUBLE)) AS sq,
                    sqrt(sqrt(CAST(total_tokens AS DOUBLE))) AS qq
             FROM tok),
       r AS (SELECT *,
                    SUM(total_tokens) OVER () AS tot,
                    SUM(sq) OVER (ORDER BY source
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS rs_sq,
                    SUM(qq) OVER (ORDER BY source
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS rs_qq
             FROM s),
       d AS (SELECT *, MAX(rs_sq) OVER () AS den_sq,
                    MAX(rs_qq) OVER () AS den_qq
             FROM r)
       SELECT source, n_docs, total_tokens,
              ROUND(total_tokens * 1.0 / tot, 6) AS share_natural,
              ROUND(sq / den_sq, 6) AS share_alpha_half,
              ROUND(qq / den_qq, 6) AS share_alpha_quarter,
              ROUND((sq / den_sq) / (total_tokens * 1.0 / tot), 6)
                AS boost_alpha_half
       FROM d ORDER BY source""",
)
def pipeline_temperature_mixture(spark, sf_dir):
    """Per-source training-mixture shares at sampling temperatures
    alpha in {1, 1/2, 1/4}: (source, n_docs, total_tokens,
    share_natural, share_alpha_half, share_alpha_quarter,
    boost_alpha_half). share_alpha = t^alpha / sum t^alpha over token
    masses; boost = how much alpha=1/2 oversamples the source vs its
    natural share (>1 for small sources — the up-weighting the
    temperature exists to provide).

    Exactness: token masses are exact integers (one zero-shuffle
    size(split) projection per doc); t^(1/2)/t^(1/4) are sqrt chains
    (correctly-rounded IEEE, bit-equal across engines — the reason
    this grid and not pow(t, 0.3)); the irrational denominators are
    accumulated by an ORDER BY source running sum on BOTH engines so
    the addition order is pinned; every displayed number is one
    rounded division of bit-identical doubles.

    Scale shape: one map-side projection + one groupBy(source) —
    source-cardinality output; the temperature table is free at any
    corpus size. At 100 TB this is the artifact the sampler config
    consumes, recomputed per corpus snapshot."""
    from pyspark.sql import Window

    from gravity_books_datalakehouse_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "source",
            F.coalesce(F.size(tokens_col()), F.lit(0))
            .cast("bigint")
            .alias("nt"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
        )
    )
    s = tok.select(
        "source",
        "n_docs",
        "total_tokens",
        F.sqrt(F.col("total_tokens").cast("double")).alias("sq"),
        F.sqrt(F.sqrt(F.col("total_tokens").cast("double"))).alias("qq"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wrun = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    r = s.select(
        "*",
        F.sum("total_tokens").over(wall).alias("tot"),
        F.sum("sq").over(wrun).alias("rs_sq"),
        F.sum("qq").over(wrun).alias("rs_qq"),
    )
    d = r.select(
        "*",
        F.max("rs_sq").over(wall).alias("den_sq"),
        F.max("rs_qq").over(wall).alias("den_qq"),
    )
    nat = F.col("total_tokens") * F.lit(1.0) / F.col("tot")
    return d.select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(nat, 6).alias("share_natural"),
        F.round(F.col("sq") / F.col("den_sq"), 6).alias("share_alpha_half"),
        F.round(F.col("qq") / F.col("den_qq"), 6).alias("share_alpha_quarter"),
        F.round((F.col("sq") / F.col("den_sq")) / nat, 6).alias(
            "boost_alpha_half"
        ),
    ).orderBy("source")


# --------------------------------------------------------------------------
# Mixture diversity at each sampling temperature — the companion readout
# to pipeline_temperature_mixture: "how concentrated is the training
# mixture, and how much does each temperature flatten it?" measured with
# the Simpson concentration sum p_i^2 and its inverse (the 'effective
# number of sources', Hill number of order 2) instead of Shannon
# entropy: inverse-Simpson answers the same question with NO logarithm,
# so every value is composed of exactly-rounded IEEE ops (the tfidf
# linear-idf lesson — ln's last ulp is libm-dependent, division and
# multiplication are not).


@register(
    "pipeline_mixture_diversity",
    """WITH tok AS (
         SELECT source,
                CAST(SUM(COALESCE(len(string_split_regex(
                    lower(trim(text)), '\\s+')), 0)) AS BIGINT) AS t
         FROM documents GROUP BY source),
       s AS (SELECT source, t,
                    sqrt(CAST(t AS DOUBLE)) AS w_half,
                    sqrt(sqrt(CAST(t AS DOUBLE))) AS w_quarter
             FROM tok),
       r AS (SELECT *,
                    SUM(t) OVER () AS tot,
                    SUM(w_half) OVER (ORDER BY source
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS rs_h,
                    SUM(w_quarter) OVER (ORDER BY source
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS rs_q
             FROM s),
       d AS (SELECT *, MAX(rs_h) OVER () AS den_h, MAX(rs_q) OVER () AS den_q
             FROM r),
       p AS (SELECT source,
                    t * 1.0 / tot AS p1,
                    w_half / den_h AS p2,
                    w_quarter / den_q AS p3
             FROM d),
       c AS (SELECT
               SUM(p1 * p1) OVER (ORDER BY source
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS c1,
               SUM(p2 * p2) OVER (ORDER BY source
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS c2,
               SUM(p3 * p3) OVER (ORDER BY source
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS c3,
               MAX(p1) OVER () AS m1, MAX(p2) OVER () AS m2,
               MAX(p3) OVER () AS m3,
               COUNT(*) OVER () AS ns,
               ROW_NUMBER() OVER (ORDER BY source DESC) AS rn
             FROM p),
       f AS (SELECT * FROM c WHERE rn = 1),
       lv AS (
         SELECT 'alpha_1' AS alpha, c1 AS sc, m1 AS mx, ns FROM f
         UNION ALL
         SELECT 'alpha_1_2', c2, m2, ns FROM f
         UNION ALL
         SELECT 'alpha_1_4', c3, m3, ns FROM f)
       SELECT alpha,
              CAST(ns AS BIGINT) AS n_sources,
              ROUND(sc, 6) AS simpson_concentration,
              ROUND(1.0 / sc, 6) AS effective_sources,
              ROUND(mx, 6) AS max_share
       FROM lv ORDER BY alpha""",
)
def pipeline_mixture_diversity(spark, sf_dir):
    """Mixture concentration per sampling temperature: (alpha,
    n_sources, simpson_concentration, effective_sources, max_share)
    for alpha in {1, 1/2, 1/4}. simpson_concentration = sum p_i^2 over
    the temperature-scaled shares; effective_sources = its inverse
    (the Hill-number diversity — 'this mixture trains like K equal
    sources'); max_share is the single-source dominance cap. Read
    beside pipeline_temperature_mixture: that table gives the
    per-source knobs, this one the corpus-level summary a data card
    publishes.

    Exactness: NO logarithm — Simpson diversity is squares, sums, and
    one division, all exactly-rounded IEEE ops over the same
    sqrt-chain weights as the mixture table; every float sum (weight
    denominators AND the p^2 sums) is an ORDER BY source running sum
    on both engines, so addition order is pinned end to end.

    Scale shape: one scan to source-cardinality, then ~20-row window
    arithmetic — free at any corpus size."""
    from pyspark.sql import Window

    from gravity_books_datalakehouse_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "source",
            F.coalesce(F.size(tokens_col()), F.lit(0))
            .cast("bigint")
            .alias("nt"),
        )
        .groupBy("source")
        .agg(F.sum("nt").cast("bigint").alias("t"))
    )
    s = tok.select(
        "source",
        "t",
        F.sqrt(F.col("t").cast("double")).alias("w_half"),
        F.sqrt(F.sqrt(F.col("t").cast("double"))).alias("w_quarter"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wrun = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    r = s.select(
        "*",
        F.sum("t").over(wall).alias("tot"),
        F.sum("w_half").over(wrun).alias("rs_h"),
        F.sum("w_quarter").over(wrun).alias("rs_q"),
    )
    d = r.select(
        "*",
        F.max("rs_h").over(wall).alias("den_h"),
        F.max("rs_q").over(wall).alias("den_q"),
    )
    p = d.select(
        "source",
        (F.col("t") * F.lit(1.0) / F.col("tot")).alias("p1"),
        (F.col("w_half") / F.col("den_h")).alias("p2"),
        (F.col("w_quarter") / F.col("den_q")).alias("p3"),
    )
    c = p.select(
        F.sum(F.col("p1") * F.col("p1")).over(wrun).alias("c1"),
        F.sum(F.col("p2") * F.col("p2")).over(wrun).alias("c2"),
        F.sum(F.col("p3") * F.col("p3")).over(wrun).alias("c3"),
        F.max("p1").over(wall).alias("m1"),
        F.max("p2").over(wall).alias("m2"),
        F.max("p3").over(wall).alias("m3"),
        F.count(F.lit(1)).over(wall).alias("ns"),
        F.row_number()
        .over(Window.orderBy(F.desc("source")))
        .alias("rn"),
    )
    f = c.where(F.col("rn") == 1)
    lv = (
        f.select(
            F.lit("alpha_1").alias("alpha"),
            F.col("c1").alias("sc"),
            F.col("m1").alias("mx"),
            "ns",
        )
        .unionByName(
            f.select(
                F.lit("alpha_1_2").alias("alpha"),
                F.col("c2").alias("sc"),
                F.col("m2").alias("mx"),
                "ns",
            )
        )
        .unionByName(
            f.select(
                F.lit("alpha_1_4").alias("alpha"),
                F.col("c3").alias("sc"),
                F.col("m3").alias("mx"),
                "ns",
            )
        )
    )
    return lv.select(
        "alpha",
        F.col("ns").cast("bigint").alias("n_sources"),
        F.round("sc", 6).alias("simpson_concentration"),
        F.round(F.lit(1.0) / F.col("sc"), 6).alias("effective_sources"),
        F.round("mx", 6).alias("max_share"),
    ).orderBy("alpha")
