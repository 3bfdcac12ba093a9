"""Statistical language-model scoring of the corpus (beyond-reference).

Perplexity-style scoring against a corpus-fitted n-gram model is the
classic model-based quality filter (CCNet, Wenzek et al. 2019 uses a
KenLM 5-gram; the operator shape is identical at any order). The
engine ships the unigram scorer in operators/text.py; this module adds
the bigram model with add-one smoothing — the smallest order where
*context* enters and the relational shape changes from a single
token-frequency join to a (context, next) count join.

Also here: BPE-style pre-tokenization statistics. Real BPE vocabularies
aren't shippable in SQL, but the *pre-tokenizer* (the regex split GPT-2
style BPE runs before merges) is, and tokens-per-byte against it is the
standard compression-ratio quality signal.

Scale: bigram/context counts shuffle (16-byte-bounded string keys with
map-side partial aggregation); scoring is a join of the bigram stream
against those counts, co-partitioned by construction. The pre-tokenizer
stats are a pure projection — zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.text import (
    TOKS_SQL,
    tokens_col,
)
from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table

_BIGRAMS_SQL = (
    "[toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]"
)


#: Standalone oracle (also reused as a subquery by
#: quality.text_quality_percentile_cut).
BIGRAM_LOGPROB_SQL = f"""WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        bg AS (
          SELECT doc_id, unnest({_BIGRAMS_SQL}) AS bg FROM t),
        cb AS (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg),
        cw AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1
               FROM bg GROUP BY 1),
        vocab AS (
          SELECT COUNT(DISTINCT tok) AS v
          FROM (SELECT unnest({TOKS_SQL}) AS tok FROM documents)),
        scored AS (
          SELECT b.doc_id,
                 ln((cb.c2 + 1.0) / (cw.c1 + vocab.v)) AS lp
          FROM bg b
          JOIN cb USING (bg)
          JOIN cw ON split_part(b.bg, ' ', 1) = cw.w1
          CROSS JOIN vocab)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(lp), 6) AS avg_logprob
        FROM scored
        GROUP BY doc_id"""


@register("text_bigram_logprob", BIGRAM_LOGPROB_SQL)
def text_bigram_logprob(spark, sf_dir):
    """Per-document mean bigram log-probability under an add-one-smoothed
    model fitted on the corpus itself: lp(w1 w2) = ln((c(w1,w2)+1) /
    (c(w1·)+V)). Low scores flag documents whose word transitions are
    atypical for the corpus — the quality-filter signal. Bigram and
    context counts are two groupBys over the same exploded bigram
    stream (map-side combined); V is a scalar broadcast; the scoring
    join is co-partitioned with the count it joins."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_col().alias("toks"))
    # index explode + O(1) element_at, NOT explode(shingle_array): the
    # Generate-inferred size()>0 filter inlines whatever it explodes,
    # and inlining the shingle transform is O(tokens²)/doc (see
    # quality.text_repetition_stats).
    n_bg = F.size("toks") - 1
    idx = F.when(n_bg >= 1, F.sequence(F.lit(1), n_bg)).otherwise(
        F.array().cast("array<int>")
    )
    bg = t.select("doc_id", "toks", F.explode(idx).alias("i")).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("toks", F.col("i")),
            F.element_at("toks", F.col("i") + 1),
        ).alias("bg"),
    )
    cb = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    cw = (
        bg.select(F.substring_index("bg", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = (
        docs.select(F.explode(tokens_col()).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    lp = F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
    return (
        bg.join(cb, "bg")
        .join(cw, F.substring_index(F.col("bg"), " ", 1) == F.col("w1"))
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
        )
    )


#: GPT-2-style pre-tokenizer, reduced to the character classes the
#: synthetic corpus contains (letter runs, digit runs, single other
#: non-space chars) — portable between Spark (Java regex) and DuckDB (RE2).
PRETOK_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


@register(
    "text_bpe_pretokenize_stats",
    f"""SELECT doc_id,
              CAST(len(regexp_extract_all(text, '{PRETOK_RE}')) AS BIGINT)
                AS n_pretokens,
              CAST(length(text) AS BIGINT) AS n_bytes,
              ROUND(length(text) * 1.0 /
                    greatest(len(regexp_extract_all(text, '{PRETOK_RE}')), 1), 6)
                AS bytes_per_token
       FROM documents""",
)
def text_bpe_pretokenize_stats(spark, sf_dir):
    """Pre-tokenizer token counts and bytes-per-token — the compression
    proxy a BPE tokenizer would see. High bytes/token (long words, few
    splits) or very low (symbol soup) are both quality outliers. A pure
    per-row projection: at 100 TB this runs at scan speed with zero
    shuffle and full column pruning (only doc_id + text read)."""
    docs = load_table(spark, sf_dir, "documents")
    pretoks = F.regexp_extract_all("text", F.lit(PRETOK_RE), 0)
    return docs.select(
        "doc_id",
        F.size(pretoks).cast("bigint").alias("n_pretokens"),
        F.length("text").cast("bigint").alias("n_bytes"),
        F.round(
            F.length("text") * 1.0 / F.greatest(F.size(pretoks), F.lit(1)), 6
        ).alias("bytes_per_token"),
    )


_N_DECILES = 10


@register(
    "text_vocab_growth",
    f"""WITH nd AS (SELECT COUNT(*) AS n FROM documents),
        t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        tri AS (
          SELECT doc_id,
                 unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         for i in range(1, len(toks) - 1)]) AS g
          FROM t),
        firsts AS (
          SELECT g,
                 MIN(CAST(FLOOR(doc_id * {_N_DECILES} * 1.0 / n) AS BIGINT))
                   AS first_decile
          FROM tri CROSS JOIN nd
          GROUP BY g),
        per AS (
          SELECT first_decile, COUNT(*) AS new_terms
          FROM firsts GROUP BY first_decile)
        SELECT first_decile AS decile,
               CAST(new_terms AS BIGINT) AS new_terms,
               CAST(SUM(new_terms) OVER (ORDER BY first_decile
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
        FROM per
        ORDER BY decile""",
)
def text_vocab_growth(spark, sf_dir):
    """Vocabulary growth curve (Heaps'-law diagnostic) over trigram
    units: distinct 3-grams first seen in each tenth of the corpus (by
    doc_id order) and the cumulative vocabulary size — flat growth means a saturated /
    repetitive corpus, steep growth means diversity a tokenizer's vocab
    must budget for. One groupBy(token) taking the min first-seen
    decile (map-side combined; shuffles one row per distinct term), a
    decile-cardinality rollup, and a 10-row cumulative window."""
    docs = load_table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("n"))
    # trigram vocabulary via index explode (the pushdown-safe n-gram
    # construction — see quality._ngram_doc_stats); FLOOR explicitly on
    # both engines: DuckDB CAST(double AS BIGINT) ROUNDS while Spark
    # cast truncates, a silent cross-engine divergence otherwise
    t = docs.select("doc_id", tokens_col().alias("toks"))
    n_w = F.size("toks") - 2
    idx = F.when(n_w >= 1, F.sequence(F.lit(1), n_w)).otherwise(
        F.array().cast("array<int>")
    )
    gram = F.concat_ws(
        " ", *[F.element_at("toks", F.col("i") + o) for o in range(3)]
    )
    firsts = (
        t.select("doc_id", "toks", F.explode(idx).alias("i"))
        .select("doc_id", gram.alias("g"))
        .crossJoin(F.broadcast(nd))
        .groupBy("g")
        .agg(
            F.min(
                F.floor(F.col("doc_id") * _N_DECILES * 1.0 / F.col("n"))
                .cast("bigint")
            ).alias("first_decile")
        )
    )
    per = firsts.groupBy("first_decile").agg(
        F.count(F.lit(1)).alias("new_terms")
    )
    from pyspark.sql import Window

    w = Window.orderBy("first_decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.select(
        F.col("first_decile").alias("decile"),
        F.col("new_terms").cast("bigint").alias("new_terms"),
        F.sum("new_terms").over(w).cast("bigint").alias("vocab_size"),
    ).orderBy("decile")


@register(
    "text_ccnet_buckets",
    BIGRAM_LOGPROB_SQL.replace(
        """SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(lp), 6) AS avg_logprob
        FROM scored
        GROUP BY doc_id""",
        """, per_doc AS (
          SELECT doc_id, ROUND(AVG(lp), 6) AS s
          FROM scored GROUP BY doc_id),
        bucketed AS (
          SELECT d.lang, d.n_chars, p.s,
                 ntile(3) OVER (PARTITION BY d.lang
                                ORDER BY p.s DESC, d.doc_id) AS b
          FROM per_doc p JOIN documents d USING (doc_id))
        SELECT lang,
               CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                      ELSE 'tail' END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(AVG(s), 6) AS avg_logprob
        FROM bucketed
        GROUP BY lang, b
        ORDER BY lang, b""",
    ),
)
def text_ccnet_buckets(spark, sf_dir):
    """CCNet-style head/middle/tail corpus split (Wenzek et al. 2019):
    per language, documents are terciled by their LM score (here the
    corpus-fitted bigram log-prob; CCNet uses a KenLM 5-gram) — 'head'
    is the most-fluent third that trains the model, 'tail' the noisy
    third that gets dropped or down-weighted. Exact ntile keeps the
    query oracle-verifiable; at 100 TB swap the per-lang global ntile
    sort for two percentile_approx thresholds per language (the
    text_quality_percentile_cut pattern) — one scan, no sort."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    per_doc = text_bigram_logprob(spark, sf_dir).select(
        "doc_id", F.col("avg_logprob").alias("s")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("s"), F.asc("doc_id"))
    bucketed = (
        per_doc.join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
        .select("lang", "n_chars", "s", F.ntile(3).over(w).alias("b"))
    )
    bucket = (
        F.when(F.col("b") == 1, "head")
        .when(F.col("b") == 2, "middle")
        .otherwise("tail")
    )
    return (
        bucketed.groupBy("lang", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.avg("s"), 6).alias("avg_logprob"),
        )
        .select("lang", bucket.alias("bucket"), "n_docs", "total_chars", "avg_logprob")
        .orderBy("lang", "b")
    )


# --------------------------------------------------------------------------
# Zipf's-law fit: OLS regression of ln(freq) on ln(rank) over each
# language's top tokens. The corpus-health diagnostic (natural text has
# slope ~ -1; synthetic/boilerplate-heavy corpora deviate) — and the
# registry's least-squares representative: the whole regression is
# classic sufficient-statistic aggregation (n, Σx, Σy, Σxy, Σx², Σy²)
# in one pass, the map-side-reducible form any distributed OLS uses.

_ZIPF_TOP = 100


@register(
    "text_zipf_ols",
    f"""WITH tf AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT lang, unnest({TOKS_SQL}) AS tok FROM documents)
      GROUP BY lang, tok),
    ranked AS (
      SELECT lang, f,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY f DESC, tok ASC)
               AS rnk
      FROM tf
      QUALIFY rnk <= {_ZIPF_TOP}),
    xy AS (
      SELECT lang, ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
      FROM ranked),
    s AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy
      FROM xy GROUP BY lang)
    SELECT lang, n AS n_terms,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
             AS intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
    FROM s
    ORDER BY lang""",
)
def text_zipf_ols(spark, sf_dir):
    """Per-language Zipf fit: OLS of ln(freq) on ln(rank) over the top
    {top} tokens, reporting slope (Zipf exponent, ~ -1 for natural
    text), intercept, and r².

    Determinism: the top-{top} SELECTION is pure integers (freq desc,
    token asc tiebreak), so both engines regress the same points; the
    sufficient statistics are five SUMs over <= {top} doubles whose
    summation-order drift (~1e-13) sits ~9 orders below the 4-dp
    rounding. The one structural float risk — a rank flip from libm
    ln() — does not exist because ln never participates in any
    ordering or selection, only in the sums.

    Plan shape: token-frequency groupBy (the corpus-sized stage,
    map-side partial agg on (lang, tok)); the rank window and the
    regression run on <= langs x {top} rows. The sufficient-statistic
    form is the point: ONE aggregation pass yields the regression —
    no iterative solver, no driver-side math, and at 100 TB the same
    six partial sums stream through any number of executors.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    tf = (
        docs.select("lang", F.explode(tokens_col()).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("f"), F.asc("tok"))
    ranked = (
        tf.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _ZIPF_TOP)
        .select(
            "lang",
            F.log(F.col("rnk").cast("double")).alias("x"),
            F.log(F.col("f").cast("double")).alias("y"),
        )
    )
    s = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "lang",
        n.alias("n_terms"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            4,
        ).alias("r2"),
    ).orderBy("lang")


@register(
    "text_fertility_by_lang",
    f"""SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(len(regexp_extract_all(text, '{PRETOK_RE}')))
                   AS BIGINT) AS n_pretokens,
              CAST(SUM(length(text)) AS BIGINT) AS n_chars,
              ROUND(SUM(length(text)) * 1.0 /
                    greatest(SUM(len(regexp_extract_all(text, '{PRETOK_RE}'))),
                             1), 6) AS chars_per_token,
              ROUND(SUM(len(regexp_extract_all(text, '{PRETOK_RE}'))) * 1.0
                    / COUNT(*), 6) AS tokens_per_doc
       FROM documents GROUP BY lang ORDER BY lang""",
)
def text_fertility_by_lang(spark, sf_dir):
    """Tokenizer fertility per language: chars/pre-token and pre-tokens/
    doc under the shared GPT-2-style pre-tokenizer (PRETOK_RE). THE
    per-language budgeting number — a language whose fertility runs 2x
    the corpus mean eats 2x the context window per character of content,
    which decides per-language token budgets and flags scripts the
    tokenizer fragments (the multilingual-tokenizer-fairness metric:
    e.g. Petrov et al. 2023, "Language Model Tokenizers Introduce
    Unfairness Between Languages").

    Exactness: token and char counts are integers summed per language;
    the two ratios are single IEEE divisions of identical integers.
    Plan: per-row regexp count map-side off the scan (only lang + text
    read), |langs|-row aggregate — scan-bound at any corpus size."""
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    docs = load_table(spark, sf_dir, "documents")
    nt = F.size(F.regexp_extract_all("text", F.lit(PRETOK_RE), 0))
    return (
        docs.select("lang", nt.alias("nt"), F.length("text").alias("nc"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_pretokens"),
            F.sum("nc").cast("bigint").alias("n_chars"),
            F.round(
                F.sum("nc") * F.lit(1.0)
                / F.greatest(F.sum("nt"), F.lit(1)),
                6,
            ).alias("chars_per_token"),
            F.round(
                F.sum("nt") * F.lit(1.0) / F.count(F.lit(1)), 6
            ).alias("tokens_per_doc"),
        )
        .transform(bounded_sort, "lang")
    )


# --------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the Chen &
# Goodman 1998 interpolated form) — the canonical n-gram smoothing, next
# to the add-one baseline above. KN's insight: the backoff weight of a
# word should be how many CONTEXTS it follows (continuation count), not
# how often it occurs — "Francisco" is frequent but follows only "San",
# so its unigram backoff should be tiny. Discount D = 3/4 EXACTLY (a
# dyadic rational, so c2 - D is an exact double and the whole
# probability is composed of exactly-rounded IEEE ops before the one
# ln() — the same float surface as the add-one op).

_KN_D = 0.75


@register(
    "text_kn_bigram_logprob",
    f"""WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        bg AS (
          SELECT doc_id, unnest({_BIGRAMS_SQL}) AS bg FROM t),
        cb AS (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg),
        cw AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1,
                      COUNT(DISTINCT bg) AS n1f
               FROM bg GROUP BY 1),
        bwd AS (SELECT split_part(bg, ' ', 2) AS w2,
                       COUNT(DISTINCT split_part(bg, ' ', 1)) AS n1b
                FROM bg GROUP BY 1),
        btypes AS (SELECT COUNT(DISTINCT bg) AS b FROM bg),
        scored AS (
          SELECT g.doc_id,
                 ln((cb.c2 - {_KN_D}) / cw.c1
                    + ({_KN_D} * cw.n1f / cw.c1)
                      * (bwd.n1b * 1.0 / btypes.b)) AS lp
          FROM bg g
          JOIN cb USING (bg)
          JOIN cw ON split_part(g.bg, ' ', 1) = cw.w1
          JOIN bwd ON split_part(g.bg, ' ', 2) = bwd.w2
          CROSS JOIN btypes)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(lp), 6) AS avg_logprob
        FROM scored
        GROUP BY doc_id""",
)
def text_kn_bigram_logprob(spark, sf_dir):
    """Per-document mean bigram log-probability under an interpolated
    Kneser-Ney model fitted on the corpus itself:
    p(w2|w1) = (c(w1,w2) - D)/c(w1·) + D·N1+(w1·)/c(w1·) ·
    N1+(·w2)/|bigram types|, D = 3/4. The add-one op above over-smooths
    toward raw unigram frequency; KN backs off to CONTINUATION
    probability, separating genuinely versatile words from frequent
    words welded to one context — the standard n-gram quality scorer.

    Exactness notes: every scored bigram is corpus-seen (train = score
    corpus), so c2 >= 1 > D and the discounted term never needs a
    max(); D is dyadic, counts are integers, and the probability is
    composed of exactly-rounded IEEE ops with the single ln() at the
    end (the family's accepted float surface — same as the add-one
    twin, hash-green since round 3).

    Plan shape: the add-one op's two groupBys plus two more over the
    SAME exploded bigram stream (backward continuation counts and the
    bigram-type scalar) — all map-side combined; scoring joins stay
    keyed on the bigram/context/word. At 100 TB: identical profile to
    text_bigram_logprob, one more broadcast scalar and one more
    co-keyed join."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_col().alias("toks"))
    n_bg = F.size("toks") - 1
    idx = F.when(n_bg >= 1, F.sequence(F.lit(1), n_bg)).otherwise(
        F.array().cast("array<int>")
    )
    bg = t.select("doc_id", "toks", F.explode(idx).alias("i")).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("toks", F.col("i")),
            F.element_at("toks", F.col("i") + 1),
        ).alias("bg"),
    )
    cb = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    cw = (
        bg.select("bg", F.substring_index("bg", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(
            F.count(F.lit(1)).alias("c1"),
            F.count_distinct("bg").alias("n1f"),
        )
    )
    bwd = (
        bg.select(
            F.substring_index("bg", " ", -1).alias("w2"),
            F.substring_index("bg", " ", 1).alias("w1"),
        )
        .groupBy("w2")
        .agg(F.count_distinct("w1").alias("n1b"))
    )
    btypes = bg.agg(F.count_distinct("bg").alias("b"))
    lp = F.log(
        (F.col("c2") - F.lit(_KN_D)) / F.col("c1")
        + (F.lit(_KN_D) * F.col("n1f") / F.col("c1"))
        * (F.col("n1b") * F.lit(1.0) / F.col("b"))
    )
    return (
        bg.join(cb, "bg")
        .join(cw, F.substring_index(F.col("bg"), " ", 1) == F.col("w1"))
        .join(bwd, F.substring_index(F.col("bg"), " ", -1) == F.col("w2"))
        .crossJoin(F.broadcast(btypes))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(lp), 6).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------------------
# Trigram interpolated Kneser-Ney (the full Chen & Goodman 1998
# recursion, one order up from the bigram op): the highest order uses
# raw trigram counts; the LOWER-order bigram distribution uses
# CONTINUATION counts (how many distinct contexts a bigram completes),
# and the unigram base is the continuation-unigram over trigram types.
# Same exactness posture: D = 3/4 dyadic, every count an integer, the
# probability a fixed composition of exactly-rounded IEEE ops, one ln.

_TRIGRAMS_SQL = (
    "[toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]"
    " for i in range(1, len(toks) - 1)]"
)


@register(
    "text_kn_trigram_logprob",
    f"""WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        tg AS (
          SELECT doc_id, unnest({_TRIGRAMS_SQL}) AS tg FROM t
          WHERE len(toks) >= 3),
        sp AS (
          SELECT doc_id, tg,
                 split_part(tg, ' ', 1) AS u,
                 split_part(tg, ' ', 2) AS v,
                 split_part(tg, ' ', 3) AS w
          FROM tg),
        c3 AS (SELECT tg, COUNT(*) AS c FROM sp GROUP BY tg),
        cuv AS (SELECT u, v, COUNT(*) AS c, COUNT(DISTINCT w) AS n1f
                FROM sp GROUP BY u, v),
        nvw AS (SELECT v, w, COUNT(DISTINCT u) AS n1b FROM sp GROUP BY v, w),
        nv AS (SELECT v, COUNT(DISTINCT (u, w)) AS n_mid,
                      COUNT(DISTINCT w) AS n_types_after
               FROM sp GROUP BY v),
        -- the trigram-type total B rides INSIDE nw as an integer window
        -- sum (B = sum over w of N1+(.,.,w) — distinct triples counted
        -- by final word): a separate btot relation would reach the
        -- scoring expression as a CROSS JOIN or a scalar subquery, and
        -- DuckDB 1.0.0 re-evaluates either per probe row over the
        -- inlined CTE chain (observed hang at 27k rows).
        nw AS (SELECT w, COUNT(DISTINCT (u, v)) AS n_ctx,
                      SUM(COUNT(DISTINCT (u, v))) OVER () AS b
               FROM sp GROUP BY w),
        scored AS (
          SELECT s.doc_id,
                 ln(
                   (c3.c - {_KN_D}) / cuv.c
                   + ({_KN_D} * cuv.n1f / cuv.c) * (
                       (nvw.n1b - {_KN_D}) / nv.n_mid
                       + ({_KN_D} * nv.n_types_after / nv.n_mid)
                         * (nw.n_ctx * 1.0 / nw.b)
                     )
                 ) AS lp
          FROM sp s
          JOIN c3 ON c3.tg = s.tg
          JOIN cuv ON cuv.u = s.u AND cuv.v = s.v
          JOIN nvw ON nvw.v = s.v AND nvw.w = s.w
          JOIN nv ON nv.v = s.v
          JOIN nw ON nw.w = s.w)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_trigrams,
               ROUND(AVG(lp), 6) AS avg_logprob
        FROM scored
        GROUP BY doc_id""",
)
def text_kn_trigram_logprob(spark, sf_dir):
    """Per-document mean trigram log-probability under full interpolated
    Kneser-Ney (Chen & Goodman 1998), D = 3/4 at every order:

      p3(w|u,v) = (c(uvw)-D)/c(uv·) + D·N1+(uv·)/c(uv·) · p2(w|v)
      p2(w|v)   = (N1+(·vw)-D)/N1+(·v·) + D·N1+(v·*)/N1+(·v·) · p1(w)
      p1(w)     = N1+(··w) / |trigram types|

    — the lower orders built from CONTINUATION counts over the trigram
    type inventory, which is the whole point of KN: a bigram's backoff
    mass reflects how many contexts it completes, not how often it
    occurs. The add-one bigram op is the baseline, the KN bigram op the
    single-order form; this is the production-shaped 3-gram scorer.

    Exactness: every scored trigram is corpus-seen so c(uvw) >= 1 > D
    and N1+(·vw) >= 1 > D — no max() needed at either order; counts are
    integers, D dyadic, the composition fixed and identical on both
    engines, ln() the single libm call (the family's accepted surface).
    Per-context normalization (sum over the full vocab = 1 at every
    order by telescoping) is pinned in tests.

    Plan shape: five map-side-combined groupBys over ONE exploded
    trigram stream (trigram, context, continuation-bigram, middle-word,
    final-word) plus a type-count scalar; scoring joins are all keyed
    on the trigram's own substrings; per-doc rollup finishes. At
    100 TB: same profile as the bigram ops — the trigram inventory is
    the only state, and every stage keys on a gram or a word."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens_col().alias("toks"))
    n_tg = F.size("toks") - 2
    idx = F.when(n_tg >= 1, F.sequence(F.lit(1), n_tg)).otherwise(
        F.array().cast("array<int>")
    )
    sp = (
        t.select("doc_id", "toks", F.explode(idx).alias("i"))
        .select(
            "doc_id",
            F.element_at("toks", F.col("i")).alias("u"),
            F.element_at("toks", F.col("i") + 1).alias("v"),
            F.element_at("toks", F.col("i") + 2).alias("w"),
        )
        .withColumn("tg", F.concat_ws(" ", "u", "v", "w"))
    )
    c3 = sp.groupBy("tg").agg(F.count(F.lit(1)).alias("c"))
    cuv = sp.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("cuv"),
        F.count_distinct("w").alias("n1f"),
    )
    nvw = sp.groupBy("v", "w").agg(F.count_distinct("u").alias("n1b"))
    nv = sp.groupBy("v").agg(
        F.count_distinct("u", "w").alias("n_mid"),
        F.count_distinct("w").alias("n_types_after"),
    )
    # B (the trigram-type total) is a single scalar: aggregate it once
    # and broadcast-crossJoin, exactly like the bigram sibling above.
    # An unpartitioned window sum over nw would funnel the entire
    # final-word vocabulary (10^7-10^9 rows at web scale) through ONE
    # task; the broadcast scalar keeps every stage word-partitioned.
    # The DuckDB oracle keeps its window-inside-nw form because DuckDB
    # 1.0.0 re-evaluates a separate scalar relation per probe row over
    # the inlined CTE chain (observed hang) — same B, same arithmetic,
    # so hashes are unchanged.
    nw = sp.groupBy("w").agg(F.count_distinct("u", "v").alias("n_ctx"))
    btot = nw.agg(F.sum("n_ctx").alias("b"))
    nw = nw.crossJoin(F.broadcast(btot))
    p1 = F.col("n_ctx") * F.lit(1.0) / F.col("b")
    p2 = (F.col("n1b") - F.lit(_KN_D)) / F.col("n_mid") + (
        F.lit(_KN_D) * F.col("n_types_after") / F.col("n_mid")
    ) * p1
    p3 = (F.col("c") - F.lit(_KN_D)) / F.col("cuv") + (
        F.lit(_KN_D) * F.col("n1f") / F.col("cuv")
    ) * p2
    return (
        sp.join(c3, "tg")
        .join(cuv, ["u", "v"])
        .join(nvw, ["v", "w"])
        .join(nv, "v")
        .join(nw, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.round(F.avg(F.log(p3)), 6).alias("avg_logprob"),
        )
    )
