"""Text analysis for training-data pipelines (beyond-reference, SURVEY.md §2.8).

Operators over the ``documents`` table: token stats, quality scoring,
heuristic language ID, content fingerprinting. All pure built-in column
expressions — JVM-side, whole-stage-codegen'd, no Python UDFs — so they
stream through 100 TB of text at scan speed. Every operator has a DuckDB
oracle; hashing is md5-based so both engines agree bit-for-bit
(functions/hashing.py rationale).

Shared kit: ``tokens()`` / ``shingles()`` are reused by operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table

#: Tiny deterministic marker sets for heuristic language ID.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "y", "una", "por"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")

PUNCT_RE = "[.,!?;:]"

#: DuckDB twin of the Spark-side text normalization.
NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
TOKS_SQL = "string_split_regex(lower(trim(text)), '\\s+')"


def tokens_col() -> F.Column:
    """Whitespace tokenization of lowercased text (BPE-ish splits are a
    regex swap away; whitespace matches the oracle exactly)."""
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def token_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, tok) — positional explode for shingling."""
    return docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "tok")
    )


def shingle_array_col(toks: F.Column, k: int = 3) -> F.Column:
    """Array of word k-shingles from a token-array column — a sliding
    window by index via ``transform``, entirely inside whole-stage
    codegen (no posexplode, no per-doc sort, no window exchange).

    The column passed in must be a *materialized* array reference (bind
    it behind a projection boundary first) — inlining the regex split
    here would re-run it per element (O(tokens²)/doc)."""
    n_windows = F.size(toks) - (k - 1)
    idx = F.when(n_windows >= 1, F.sequence(F.lit(1), n_windows)).otherwise(
        F.array().cast("array<int>")
    )
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + off) for off in range(k)]
    )
    return F.transform(idx, shingle_at)


def shingles(docs: DataFrame, k: int = 3, distinct: bool = True) -> DataFrame:
    """Distinct word k-shingles per doc, built array-side (k=3).
    The DuckDB oracle builds the same sets with window lead(); the
    *outputs* are identical (distinct (doc_id, shingle) sets), which is
    what the contract compares.

    ``distinct=False`` returns the raw positional gram stream (one row
    per window, duplicates included) for consumers that dedup inside
    their own gram-keyed aggregate — saving the standalone distinct's
    (doc_id, shingle) exchange (see text_ngram_novelty).
    """
    tokenized = docs.select("doc_id", tokens_col().alias("toks"))
    # Explode the INDEX sequence, not the shingle array: Generate infers
    # a size()>0 filter and pushes it below the projection, inlining the
    # exploded expression — and an inlined shingle transform re-runs the
    # regex split per element (O(tokens²)/doc). The index sequence is
    # cheap to inline; each shingle is then k O(1) element_at lookups on
    # the token array the Generate retains.
    n_windows = F.size("toks") - (k - 1)
    idx = F.when(n_windows >= 1, F.sequence(F.lit(1), n_windows)).otherwise(
        F.array().cast("array<int>")
    )
    shingle = F.concat_ws(
        " ", *[F.element_at("toks", F.col("i") + off) for off in range(k)]
    )
    raw = tokenized.select("doc_id", "toks", F.explode(idx).alias("i")).select(
        "doc_id", shingle.alias("shingle")
    )
    return raw.distinct() if distinct else raw


#: DuckDB twin of shingles() for k=3 — reused by dedup oracles.
SHINGLES_SQL = f"""
  toks AS (
    SELECT doc_id,
           unnest({TOKS_SQL}) AS tok,
           generate_subscripts({TOKS_SQL}, 1) AS pos
    FROM documents
  ),
  sh_raw AS (
    SELECT doc_id,
           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
    FROM toks
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ),
  shd AS (SELECT DISTINCT doc_id, shingle FROM sh_raw WHERE shingle IS NOT NULL)
"""


@register(
    "text_token_stats",
    f"""SELECT doc_id,
              len({TOKS_SQL}) AS n_tokens,
              length(regexp_replace(lower(trim(text)), '\\s+', '', 'g')) AS n_nonspace_chars,
              ROUND(CAST(length(regexp_replace(lower(trim(text)), '\\s+', '', 'g')) AS DOUBLE)
                    / len({TOKS_SQL}), 6) AS avg_token_len
       FROM documents""",
)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens + char totals + mean token length.
    Exact-integer inputs → double division is bit-equal cross-engine."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    nonspace = F.length(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", ""))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        nonspace.alias("n_nonspace_chars"),
        F.round(nonspace.cast("double") / F.size(toks), 6).alias("avg_token_len"),
    )


@register(
    "text_length_profile_by_source",
    f"""SELECT source,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(quantile_disc(len({TOKS_SQL}), 0.5) AS BIGINT)
                AS p50_tokens,
              CAST(quantile_disc(len({TOKS_SQL}), 0.9) AS BIGINT)
                AS p90_tokens
       FROM documents
       GROUP BY source
       ORDER BY source""",
)
def text_length_profile_by_source(spark, sf_dir):
    """Per-source token-length distribution profile (median / p90 doc
    length) — the first report a corpus curator pulls before setting
    length filters or mixture weights. Exact discrete percentiles via
    the bounded (source, n_tokens) histogram
    (operators/percentile_hist.py): the corpus collapses map-side to
    |sources| x |distinct lengths| counts, so the profile costs the
    same at 10^6 or 10^11 documents — a raw percentile_disc would
    buffer every document's length per source."""
    from gravity_books_datalakehouse_spark.operators.percentile_hist import (
        grouped_disc_percentiles,
    )
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.size(tokens_col()).alias("n_tokens")
    )
    stats = grouped_disc_percentiles(
        docs, ["source"], "n_tokens", [0.5, 0.9],
        ["p50_tokens", "p90_tokens"], n_alias="n_docs",
    )
    return stats.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("p50_tokens").cast("bigint").alias("p50_tokens"),
        F.col("p90_tokens").cast("bigint").alias("p90_tokens"),
    ).transform(bounded_sort, "source")


@register(
    "text_quality_scores",
    f"""SELECT doc_id, n_chars,
              ROUND(CAST(length(text) - length(regexp_replace(text, '{PUNCT_RE}', '', 'g')) AS DOUBLE)
                    / length(text), 6) AS punct_ratio,
              ROUND(CAST(len(list_filter({TOKS_SQL}, x -> list_contains({list(STOPWORDS)}, x))) AS DOUBLE)
                    / len({TOKS_SQL}), 6) AS stopword_ratio,
              CASE WHEN length(text) < 100 THEN 'short'
                   WHEN len(list_filter({TOKS_SQL}, x -> list_contains({list(STOPWORDS)}, x))) = 0 THEN 'no_stopwords'
                   ELSE 'ok' END AS quality_bucket
       FROM documents""",
)
def text_quality_scores(spark, sf_dir):
    """Quality scoring: punctuation ratio, stopword ratio, length bucket —
    the classic pre-training filters (C4-style heuristics)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    punct = F.length("text") - F.length(F.regexp_replace("text", PUNCT_RE, ""))
    return docs.select(
        "doc_id",
        "n_chars",
        F.round(punct.cast("double") / F.length("text"), 6).alias("punct_ratio"),
        F.round(n_stop.cast("double") / F.size(toks), 6).alias("stopword_ratio"),
        F.when(F.length("text") < 100, "short")
        .when(n_stop == 0, "no_stopwords")
        .otherwise("ok")
        .alias("quality_bucket"),
    )


def _marker_count_sql(lang: str) -> str:
    return (
        f"len(list_filter({TOKS_SQL}, x -> list_contains({list(LANG_MARKERS[lang])}, x)))"
    )


#: lang-ID oracle SQL, shared with the confusion-matrix audit below.
_LANG_ID_SQL = f"""SELECT doc_id, lang,
              {_marker_count_sql('en')} AS s_en,
              {_marker_count_sql('de')} AS s_de,
              {_marker_count_sql('fr')} AS s_fr,
              {_marker_count_sql('es')} AS s_es,
              CASE WHEN {_marker_count_sql('en')} >= greatest({_marker_count_sql('de')}, {_marker_count_sql('fr')}, {_marker_count_sql('es')}) THEN 'en'
                   WHEN {_marker_count_sql('de')} >= greatest({_marker_count_sql('fr')}, {_marker_count_sql('es')}) THEN 'de'
                   WHEN {_marker_count_sql('fr')} >= {_marker_count_sql('es')} THEN 'fr'
                   ELSE 'es' END AS predicted_lang
       FROM documents"""


@register("text_lang_id", _LANG_ID_SQL)
def text_lang_id(spark, sf_dir):
    """Heuristic language ID: marker-token counts per language, argmax with
    a fixed precedence order (en > de > fr > es on ties) so prediction is
    deterministic. A real n-gram model drops in by swapping marker sets
    for n-gram log-probs — the plan shape (scan + map, no shuffle) holds."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()

    def score(lang: str) -> F.Column:
        arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    s_en, s_de, s_fr, s_es = (score(lang) for lang in ("en", "de", "fr", "es"))
    return docs.select(
        "doc_id",
        "lang",
        s_en.alias("s_en"),
        s_de.alias("s_de"),
        s_fr.alias("s_fr"),
        s_es.alias("s_es"),
        F.when(s_en >= F.greatest(s_de, s_fr, s_es), "en")
        .when(s_de >= F.greatest(s_fr, s_es), "de")
        .when(s_fr >= s_es, "fr")
        .otherwise("es")
        .alias("predicted_lang"),
    )


@register(
    "text_fingerprint",
    f"""WITH {SHINGLES_SQL}
       SELECT d.doc_id,
              md5({NORM_SQL}) AS fp_md5,
              s.fp_shingle
       FROM documents d
       LEFT JOIN (SELECT doc_id, MIN(md5(shingle)) AS fp_shingle
                  FROM shd GROUP BY doc_id) s
         ON d.doc_id = s.doc_id""",
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting: whole-content md5 of normalized text plus a
    winnowing-style shingle fingerprint (min hash over rolling word
    3-grams) that survives small edits. Both portable (md5-based).

    The min-shingle is per-row math — array_min over the md5-mapped
    shingle array — so the whole query is a shuffle-free projection (the
    min over duplicates equals the min over the distinct set; docs
    shorter than 3 tokens yield an empty array → NULL, matching the
    oracle's left join)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tokenized = docs.select(
        "doc_id", F.md5(norm).alias("fp_md5"), tokens_col().alias("toks")
    )
    return tokenized.select(
        "doc_id",
        "fp_md5",
        F.array_min(
            F.transform(shingle_array_col(F.col("toks")), F.md5)
        ).alias("fp_shingle"),
    )


@register(
    "text_top_bigrams",
    f"""SELECT bigram, COUNT(*) AS n_docs
       FROM (
         SELECT DISTINCT doc_id, bigram FROM (
           SELECT doc_id,
                  unnest([toks[i] || ' ' || toks[i+1]
                          for i in generate_series(1, len(toks)-1)]) AS bigram
           FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
         )
       )
       GROUP BY bigram
       ORDER BY n_docs DESC, bigram ASC
       LIMIT 20""",
)
def text_top_bigrams(spark, sf_dir):
    """Top-20 bigrams by document frequency — n-gram extraction as a
    corpus-statistics pass (the vocabulary-building step of a tokenizer
    pipeline). Array-side construction; one distinct + one count shuffle."""
    # token array materialized once per row (projection boundary — see
    # shingles()); per-doc dedup happens ARRAY-side (array_distinct, no
    # shuffle); the only exchange is the final doc-frequency groupBy
    tokenized = load_table(spark, sf_dir, "documents").select(
        tokens_col().alias("toks")
    )
    toks = F.col("toks")
    n = F.size(toks) - 1
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    bigram_at = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(toks, i), F.element_at(toks, i + 1)
    )
    return (
        tokenized.select(
            F.explode(F.array_distinct(F.transform(idx, bigram_at))).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("bigram"))
        .limit(20)
    )


def char_shingles(docs: DataFrame, n: int = 5) -> DataFrame:
    """Distinct character n-grams per doc (default 5) — the shingle basis
    that works for unsegmented scripts (CJK) where whitespace
    tokenization fails. Same array-side sliding-window construction as
    word shingles; drop-in replacement feeding the same minhash pipeline
    (operators/dedup.py accepts any (doc_id, shingle) frame)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    prepared = docs.select("doc_id", norm.alias("norm"))
    length = F.length("norm")
    idx = F.when(length >= n, F.sequence(F.lit(1), length - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    # index explode + one O(1) substring per row — not explode(transform):
    # the Generate-inferred filter would inline the transform and re-run
    # the normalization regex per element (see shingles()).
    return (
        prepared.select("doc_id", "norm", F.explode(idx).alias("i"))
        .select(
            "doc_id", F.substring(F.col("norm"), F.col("i"), F.lit(n)).alias("shingle")
        )
        .distinct()
    )


_TFIDF_TOPK = 3
_TFIDF_MIN_LEN = 3


@register(
    "text_tfidf_top_terms",
    f"""WITH ft AS (
    SELECT doc_id, tok
    FROM (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents)
    WHERE length(tok) >= {_TFIDF_MIN_LEN}
  ),
  tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM ft GROUP BY doc_id, tok),
  dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM ft GROUP BY tok),
  n AS (SELECT COUNT(*) AS n_docs FROM documents)
  SELECT doc_id, term, rank, score FROM (
    SELECT tf.doc_id, tf.tok AS term,
           ROUND(tf.tf * (CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS score,
           row_number() OVER (PARTITION BY tf.doc_id
             ORDER BY tf.tf * (CAST(n.n_docs AS DOUBLE) / dfreq.df) DESC,
                      tf.tok ASC) AS rank
    FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN n
  ) WHERE rank <= {_TFIDF_TOPK}""",
)
def text_tfidf_top_terms(spark, sf_dir):
    """Top-3 characteristic terms per document by tf-idf.

    Uses the LINEAR idf variant (N/df, no log): IEEE division and
    multiplication are exactly rounded, so scores — and therefore ranks —
    are bit-equal across engines, which log() cannot guarantee (libm vs
    JVM may differ in the last ulp). Swap in F.log for production ranking
    where cross-engine parity isn't a requirement; the plan is identical.

    Plan: one token explode feeds both the per-doc tf groupBy and the
    per-term df groupBy; the corpus count joins in as a broadcast scalar;
    per-doc top-k finishes via WindowGroupLimit (map-side rank pruning).
    """
    docs = load_table(spark, sf_dir, "documents")
    ft = docs.select(
        "doc_id", F.explode(tokens_col()).alias("tok")
    ).filter(F.length("tok") >= _TFIDF_MIN_LEN)
    tf = ft.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = ft.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * (F.col("n_docs").cast("double") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_full"), F.asc("term"))
    return (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", F.col("tok").alias("term"), score.alias("score_full")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TFIDF_TOPK)
        .select("doc_id", "term", "rank", F.round("score_full", 6).alias("score"))
    )


@register(
    "text_chunk_documents",
    """SELECT doc_id,
              CAST((start_pos - 1) / 192 AS BIGINT) AS chunk_idx,
              CAST(length(substring(text, start_pos, 256)) AS INT) AS chunk_len,
              md5(substring(text, start_pos, 256)) AS chunk_md5
       FROM (SELECT doc_id, text,
                    unnest(generate_series(1, greatest(length(text), 1), 192))
                      AS start_pos
             FROM documents)""",
)
def text_chunk_documents(spark, sf_dir):
    """Overlapping fixed-width chunking (256-char windows, 192 stride →
    64-char overlap): the pre-tokenization split that turns documents
    into training-context-sized pieces without losing cross-boundary
    text. Entirely JVM-side — ``sequence`` generates the start offsets,
    ``posexplode`` fans out one row per chunk, ``substring`` slices —
    so chunking a 100 TB corpus is a narrow map stage with zero
    shuffle, and downstream dedup/quality filters run per-chunk.
    Chunks are emitted by md5 (content-addressed), matching how a
    dedup-then-pack pipeline consumes them; both engines share 1-based
    substring semantics, so the hashes are bit-identical."""
    docs = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(192)
    )
    chunk = F.expr("substring(text, start_pos, 256)")
    return (
        docs.select("doc_id", "text", F.posexplode(starts).alias("pos", "start_pos"))
        .select(
            "doc_id",
            F.col("pos").cast("bigint").alias("chunk_idx"),
            F.length(chunk).cast("int").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


@register(
    "text_unigram_logprob",
    """WITH tok AS (
          SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
          FROM documents),
        freq AS (
          SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
        tot AS (SELECT SUM(n) AS n_total FROM freq),
        scored AS (
          SELECT t.doc_id,
                 ln(f.n * 1.0 / (SELECT n_total FROM tot)) AS lp
          FROM tok t JOIN freq f USING (tok))
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               ROUND(AVG(lp), 4) AS avg_logprob
        FROM scored
        GROUP BY doc_id
        ORDER BY doc_id""",
)
def text_unigram_logprob(spark, sf_dir):
    """Corpus-self-trained unigram language-model score per document —
    the crude-but-effective KenLM-style quality signal: documents whose
    average token log-probability is far below the corpus norm are
    boilerplate/noise candidates.

    Plan: one token explode, one groupBy(tok) for frequencies, the
    corpus total as a broadcast scalar, then a frequencies⋈tokens join.
    At 100 TB the frequency table is vocabulary-sized (≪ corpus, Zipf),
    so Spark broadcasts it and the scoring pass is shuffle-free; the
    token groupBy map-side-combines to vocabulary cardinality per
    partition. No Python anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n").alias("n_total"))
    scored = (
        tok.join(freq, "tok")
        .join(F.broadcast(total))
        .select("doc_id", F.log(F.col("n") / F.col("n_total")).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_lang_confusion",
    f"""WITH pred AS ({_LANG_ID_SQL})
       SELECT lang AS declared_lang, predicted_lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              ROUND(COUNT(*) * 1.0 /
                    SUM(COUNT(*)) OVER (PARTITION BY lang), 6) AS frac_of_declared
       FROM pred
       GROUP BY lang, predicted_lang
       ORDER BY declared_lang, predicted_lang""",
)
def text_lang_confusion(spark, sf_dir):
    """Language-metadata audit: confusion matrix between the corpus's
    DECLARED lang column and the content-based lang-ID prediction — the
    check that catches mislabeled crawl segments before they poison
    per-language mixing weights (op_sample_rebalance_langs and the CCNet
    terciles both key on lang). Diagonal-heavy = trustworthy metadata;
    off-diagonal mass pinpoints (declared, detected) leak pairs. One
    narrow scan + one small groupBy; the per-declared fraction is a
    window over lang-pair cardinality rows."""
    pred = text_lang_id(spark, sf_dir).select(
        F.col("lang").alias("declared_lang"), "predicted_lang"
    )
    w = Window.partitionBy("declared_lang")
    return (
        pred.groupBy("declared_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn(
            "frac_of_declared",
            F.round(F.col("n_docs") * 1.0 / F.sum("n_docs").over(w), 6),
        )
        .orderBy("declared_lang", "predicted_lang")
    )


# --------------------------------------------------------------------------
# Cross-document n-gram novelty (memorization-risk profiling). The
# within-doc repetition kit (text_repetition_stats) asks "does this doc
# repeat itself"; this asks "does the CORPUS already contain this doc's
# phrasing" — the document-level readout of the Lee et al. 2022
# ("Deduplicating Training Data Makes Language Models Better")
# memorization analysis: a doc whose 5-grams mostly occur elsewhere adds
# little novel signal and raises verbatim-regurgitation risk.

NOVELTY_K = 5  #: n-gram order — 5-grams are the standard memorization unit

_NOVELTY_LEADS = " || ' ' || ".join(
    ["tok"] + [f"lead(tok, {i}) OVER w5" for i in range(1, NOVELTY_K)]
)

_NOVELTY_SQL = f"""WITH tok5 AS (
    SELECT doc_id,
           unnest({TOKS_SQL}) AS tok,
           generate_subscripts({TOKS_SQL}, 1) AS pos
    FROM documents
  ),
  g_raw AS (
    SELECT doc_id, {_NOVELTY_LEADS} AS g
    FROM tok5
    WINDOW w5 AS (PARTITION BY doc_id ORDER BY pos)
  ),
  gd AS (SELECT DISTINCT doc_id, g FROM g_raw WHERE g IS NOT NULL),
  dfreq AS (SELECT g, COUNT(*) AS df FROM gd GROUP BY g),
  per_doc AS (
    SELECT gd.doc_id,
           COUNT(*) AS n_grams,
           SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS n_shared
    FROM gd JOIN dfreq d ON d.g = gd.g
    GROUP BY gd.doc_id
  )
  SELECT doc.source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(AVG(1.0 - CAST(p.n_shared AS DOUBLE) / p.n_grams), 6)
           AS mean_novelty,
         CAST(SUM(CASE WHEN 2 * p.n_shared > p.n_grams THEN 1 ELSE 0 END)
              AS BIGINT) AS n_memorization_risk
  FROM per_doc p
  JOIN documents doc ON doc.doc_id = p.doc_id
  GROUP BY doc.source
  ORDER BY doc.source"""


@register("text_ngram_novelty", _NOVELTY_SQL)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source novelty profile over distinct 5-grams: a doc's novelty
    is the share of its 5-grams occurring in NO other document; a doc
    is memorization-risky when over half its 5-grams appear elsewhere
    (the flag is the exact integer test 2*n_shared > n_grams). Docs
    shorter than 5 tokens carry no 5-gram and drop from the profile.

    Plan shape: one distinct-shingle build (shared sliding-window form
    with the dedup kit, k=5), one vocabulary-sized df aggregate, one
    join back on the gram, then a per-doc and a per-source rollup —
    grams shuffle as strings once, counts after. At 100 TB the gram
    join is the cost center and shards on the gram key; replacing the
    exact df with a Count-Min lower bound (op_sketch_countmin_terms's
    sketch) is the documented approximation if the exact pass ever
    dominates.

    Float caveat (house margin style): per-doc novelty is one
    correctly-rounded IEEE division (exact integers in), identical on
    both engines; AVG sums those doubles in engine-specific order, so
    the mean drifts ~1e-15 against a 6-dp rounding boundary ~9 orders
    coarser. The risk COUNT is pure integers."""
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    docs = load_table(spark, sf_dir, "documents")
    # Round 13 (guide §2.3 — shuffle fewer bytes): the old plan joined
    # the gram relation back to its own df aggregate ON THE GRAM STRING
    # (a second full shuffle of every 5-gram string). Equivalent with
    # zero joins: a gram with df == 1 has exactly ONE owner (min(doc_id)
    # IS that owner), so each doc's novel-gram count is the number of
    # df==1 grams it owns, and n_shared = n_grams - n_novel — the same
    # integers, one gram-keyed aggregate instead of aggregate + join.
    # Round 14 (guide §2.3 again — VERDICT r13 item 8): even after r13
    # the gram STRINGS still crossed two exchanges — the standalone
    # distinct's (doc_id, shingle) shuffle and then the df aggregate's
    # shingle-keyed shuffle. One explicit repartition by the GRAM alone
    # now carries the strings exactly once: HashPartitioning(shingle)
    # satisfies the clustered distribution of BOTH the (shingle, doc_id)
    # dedup aggregate and the per-gram df aggregate, so neither needs
    # its own exchange. The repartition ships the raw (pre-distinct)
    # stream — within-doc 5-gram repetition is rare, so raw ≈ distinct
    # rows — and every later exchange carries integers only. Same
    # integers out: dedup-then-count is order-invariant.
    gd = (
        shingles(docs, k=NOVELTY_K, distinct=False)
        .repartition("shingle")
        .distinct()
    )
    per_gram = gd.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("d0")
    )
    novel = (
        per_gram.where(F.col("df") == 1)
        .groupBy(F.col("d0").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    per_doc = (
        gd.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
        .join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            (
                F.col("n_grams") - F.coalesce("n_novel", F.lit(0))
            ).alias("n_shared"),
        )
    )
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.avg(
                    F.lit(1.0)
                    - F.col("n_shared").cast("double") / F.col("n_grams")
                ),
                6,
            ).alias("mean_novelty"),
            F.sum(
                F.when(F.lit(2) * F.col("n_shared") > F.col("n_grams"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_memorization_risk"),
        )
        .transform(bounded_sort, "source")
    )


# --------------------------------------------------------------------------
# Fixed-vocabulary OOV profiling. text_vocab_growth measures how the
# corpus vocabulary grows (Heaps' law); this answers the tokenizer
# design question downstream of it: freeze the top-V corpus tokens as
# the vocabulary and measure each source's out-of-vocabulary TOKEN rate
# — the coverage/fertility tradeoff every fixed-vocab tokenizer makes,
# and a per-source drift alarm (a source whose OOV rate spikes is
# drifting away from the token distribution the vocab was fit on).

OOV_VOCAB_SIZE = 500


@register(
    "text_vocab_oov_rate",
    f"""WITH toks_all AS (
      SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents),
    vocab AS (
      SELECT tok FROM toks_all
      GROUP BY tok
      QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok)
              <= {OOV_VOCAB_SIZE}),
    tagged AS (
      SELECT d.source, t.tok, v.tok IS NULL AS oov
      FROM toks_all t
      JOIN documents d ON d.doc_id = t.doc_id
      LEFT JOIN vocab v ON v.tok = t.tok)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           ROUND(CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS oov_rate
    FROM tagged
    GROUP BY source
    ORDER BY source""",
)
def text_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source out-of-vocabulary token rate against the frozen top-V
    corpus vocabulary (V=500, ties broken token-ASC so the cut is
    deterministic on both engines). Token OCCURRENCES count, not
    distinct types — OOV rate is a per-token cost model.

    Plan shape: one token explode feeding both legs; the vocabulary is
    TakeOrderedAndProject over the token-count aggregate (distributed
    top-V, no global rank window) and enters the tagging join as a
    BROADCAST (V is a constant — the vocab side is model-state-sized
    at any corpus size, the literal-centroid contract in join form).
    The per-source rollup is strata-sized. Exact integers everywhere;
    the one division is correctly-rounded IEEE on identical inputs."""
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens_col()).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(OOV_VOCAB_SIZE)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    tagged = toks.join(F.broadcast(vocab), "tok", "left")
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
        .transform(bounded_sort, "source")
    )


# --------------------------------------------------------------------------
# Length-bucketed batch packing report. Training batches pad every
# sequence to the longest member; bucketing by length first (the
# "bucketed batching" every LLM data loader implements) bounds the
# padding waste by the bucket width. This report quantifies that
# tradeoff on the actual corpus: per 32-token bucket, how many docs,
# how many real tokens, and the padding fraction if batches form within
# the bucket — against which a pytest pins the global-padding baseline.

PAD_BUCKET_WIDTH = 32


@register(
    "text_length_bucket_padding",
    f"""WITH lens AS (
      SELECT len({TOKS_SQL}) AS n_tok FROM documents),
    bucketed AS (
      SELECT n_tok,
             ((n_tok + {PAD_BUCKET_WIDTH - 1}) // {PAD_BUCKET_WIDTH})
               * {PAD_BUCKET_WIDTH} AS bucket_max
      FROM lens)
    SELECT CAST(bucket_max AS BIGINT) AS bucket_max,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) * bucket_max AS BIGINT) AS padded_tokens,
           ROUND(1.0 - CAST(SUM(n_tok) AS DOUBLE) / (COUNT(*) * bucket_max),
                 6) AS waste_frac
    FROM bucketed
    GROUP BY bucket_max
    ORDER BY bucket_max""",
)
def text_length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste profile under 32-token length bucketing: each doc
    pads to its bucket ceiling ((n+31) div 32)*32 — pure integer
    arithmetic, so buckets, capacities, and token sums are exact on
    both engines; the waste fraction is one correctly-rounded IEEE
    division per bucket row.

    Plan shape: token counting is size(split(...)) — a projection, the
    text never explodes — then a map-side collapse to the LENGTH
    histogram (value-domain-bounded) and a bucket-count rollup. The
    operational reading: total padded_tokens across buckets is the
    compute cost of bucketed batching; the same corpus padded to its
    global max costs n_docs * max_len — the pytest pins that bucketing
    strictly wins whenever lengths vary."""
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    docs = load_table(spark, sf_dir, "documents")
    w = PAD_BUCKET_WIDTH
    lens = docs.select(F.size(tokens_col()).alias("n_tok"))
    bucketed = lens.withColumn(
        "bucket_max",
        F.expr(f"((n_tok + {w - 1}) div {w}) * {w}"),
    )
    return (
        bucketed.groupBy("bucket_max")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .select(
            F.col("bucket_max").cast("bigint").alias("bucket_max"),
            "n_docs",
            "n_tokens",
            (F.col("n_docs") * F.col("bucket_max"))
            .cast("bigint")
            .alias("padded_tokens"),
            F.round(
                F.lit(1.0)
                - F.col("n_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket_max")),
                6,
            ).alias("waste_frac"),
        )
        .transform(bounded_sort, "bucket_max")
    )


# --------------------------------------------------------------------------
# Token-weighted length percentiles. The unweighted median doc length
# answers "what does a typical DOCUMENT look like"; training cost lives
# in TOKENS, so the curation question is "at what doc length does the
# typical TOKEN live" — the token-weighted median, which a few long docs
# can drag far above the doc median. Both are reported per source, from
# one histogram pass each (operators/percentile_hist.py).


@register(
    "text_weighted_median_len",
    f"""WITH lens AS (
      SELECT source, n_chars,
             len({TOKS_SQL}) AS n_tok
      FROM documents),
    hist AS (
      SELECT source, n_chars,
             COUNT(*) AS cnt, SUM(n_tok) AS wc
      FROM lens WHERE n_tok > 0
      GROUP BY source, n_chars),
    cum AS (
      SELECT source, n_chars,
             SUM(cnt) OVER w AS c_cum,
             SUM(SUM(cnt)) OVER (PARTITION BY source) AS c_tot,
             SUM(wc) OVER w AS w_cum,
             SUM(SUM(wc)) OVER (PARTITION BY source) AS w_tot
      FROM hist
      GROUP BY source, n_chars, cnt, wc
      WINDOW w AS (PARTITION BY source ORDER BY n_chars
                   ROWS UNBOUNDED PRECEDING))
    SELECT source,
           CAST(MAX(w_tot) AS BIGINT) AS total_tokens,
           MIN(CASE WHEN 2 * c_cum >= c_tot THEN n_chars END)
             AS median_len_docs,
           MIN(CASE WHEN 2 * w_cum >= w_tot THEN n_chars END)
             AS median_len_tokens
    FROM cum
    GROUP BY source
    ORDER BY source""",
)
def text_weighted_median_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-median vs TOKEN-weighted-median length: both
    selections are pure integer cross-multiplications (2*cum >= total)
    over one per-source length histogram, so no float gates either
    choice. A token-median far above the doc-median flags a source
    whose token mass concentrates in its longest documents — the
    long-tail skew that sequence packing and length bucketing need to
    know about (text_length_bucket_padding is the downstream report).

    Plan shape: one scan, map-side collapse to the (source, length)
    histogram carrying both the doc count and the token weight, one
    per-source cumulative window over histogram rows, strata-sized
    rollup."""
    from pyspark.sql import Window as W

    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "source", "n_chars", F.size(tokens_col()).alias("n_tok")
    ).where(F.col("n_tok") > 0)
    hist = lens.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("n_tok").alias("wc")
    )
    w_cum = (
        W.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_all = W.partitionBy("source")
    cum = hist.select(
        "source",
        "n_chars",
        F.sum("cnt").over(w_cum).alias("c_cum"),
        F.sum("cnt").over(w_all).alias("c_tot"),
        F.sum("wc").over(w_cum).alias("w_cum"),
        F.sum("wc").over(w_all).alias("w_tot"),
    )
    return (
        cum.groupBy("source")
        .agg(
            F.max("w_tot").cast("bigint").alias("total_tokens"),
            F.min(
                F.when(F.lit(2) * F.col("c_cum") >= F.col("c_tot"), F.col("n_chars"))
            ).alias("median_len_docs"),
            F.min(
                F.when(F.lit(2) * F.col("w_cum") >= F.col("w_tot"), F.col("n_chars"))
            ).alias("median_len_tokens"),
        )
        .transform(bounded_sort, "source")
    )


def _qcorr_oracle_sql() -> str:
    stop_list = list(STOPWORDS)
    # signals must VARY on this corpus: the synthetic documents contain
    # no punctuation and no digits (measured — those two would be
    # constant zero, making r undefined), so the battery is char count,
    # token count, stopword count, distinct-token count
    sig = {
        "n_chars": "length(text)",
        "n_toks": f"len({TOKS_SQL})",
        "n_stop": f"len(list_filter({TOKS_SQL}, x -> list_contains({stop_list}, x)))",
        "n_dtoks": f"len(list_distinct({TOKS_SQL}))",
    }
    cols = ",\n           ".join(f"{e} AS {k}" for k, e in sig.items())
    names = list(sig)
    stats = ["CAST(COUNT(*) AS HUGEINT) AS n"]
    for k in names:
        stats.append(f"SUM(CAST({k} AS HUGEINT)) AS s_{k}")
        stats.append(f"SUM(CAST({k} AS HUGEINT) * {k}) AS q_{k}")
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    for a, b in pairs:
        stats.append(f"SUM(CAST({a} AS HUGEINT) * {b}) AS x_{a}_{b}")
    legs = []
    for a, b in pairs:
        r = (
            f"(CAST(n * x_{a}_{b} - s_{a} * s_{b} AS DOUBLE)) / "
            f"sqrt(CAST(n * q_{a} - s_{a} * s_{a} AS DOUBLE) * "
            f"CAST(n * q_{b} - s_{b} * s_{b} AS DOUBLE))"
        )
        legs.append(
            f"SELECT '{a}' AS sig_a, '{b}' AS sig_b,"
            f" CAST(n AS BIGINT) AS n_docs, ROUND({r}, 6) AS pearson_r"
            f" FROM agg"
        )
    union = "\n    UNION ALL\n    ".join(legs)
    return f"""WITH sigs AS (
      SELECT {cols}
      FROM documents),
    agg AS (SELECT {', '.join(stats)} FROM sigs)
    {union}
    ORDER BY sig_a, sig_b"""


@register("text_quality_signal_corr", _qcorr_oracle_sql())
def text_quality_signal_corr(spark, sf_dir):
    """Pearson correlation matrix between the heuristic quality signals
    (char count, token count, stopword count, distinct-token count) — the
    redundancy check behind filter design: two signals correlating at
    r ~ 0.95 gate the same documents, so stacking them adds threshold
    complexity without recall, while a near-zero pair measures
    genuinely independent failure modes. (The C4/Gopher filter stacks
    are exactly such signal batteries; this op is how you prune one.)

    Exactness: all four signals are INTEGER counts; every sufficient
    statistic (n, Σx, Σx², Σxy) accumulates in DECIMAL(38)/HUGEINT —
    exact at any corpus size (products are ≤10¹² per row, 38 digits
    hold ~10²⁶ rows) — and each r folds to DOUBLE once through the
    same expression tree on both engines, so even the 6-dp rounding
    boundary cannot diverge.

    Plan: one scan computes the signals map-side; ONE aggregate
    carries all 15 statistics (partial aggregation collapses each
    partition to a single row); the 6 output rows are constant-space
    projections of that 1-row frame. Scan-bound at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = tokens_col()
    sig = {
        "n_chars": F.length("text"),
        "n_toks": F.size(toks),
        "n_stop": F.size(
            F.filter(toks, lambda x: F.array_contains(stop_arr, x))
        ),
        "n_dtoks": F.size(F.array_distinct(toks)),
    }
    names = list(sig)
    sigs = docs.select(*[c.alias(k) for k, c in sig.items()])
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for k in names:
        aggs.append(F.sum(d38(F.col(k))).alias(f"s_{k}"))
        aggs.append(F.sum(d38(F.col(k)) * F.col(k)).alias(f"q_{k}"))
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(d38(F.col(a)) * F.col(b)).alias(f"x_{a}_{b}"))
    agg = sigs.agg(*aggs)
    legs = []
    for a, b in pairs:
        num = (
            F.col("n") * F.col(f"x_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        ).cast("double")
        va = (
            F.col("n") * F.col(f"q_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        ).cast("double")
        vb = (
            F.col("n") * F.col(f"q_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        ).cast("double")
        legs.append(
            agg.select(
                F.lit(a).alias("sig_a"),
                F.lit(b).alias("sig_b"),
                F.col("n").cast("bigint").alias("n_docs"),
                F.round(num / F.sqrt(va * vb), 6).alias("pearson_r"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    return out.transform(bounded_sort, "sig_a", "sig_b")
