"""Deterministic sampling & dataset splitting for training pipelines.

RNG-based sampling (``df.sample``, Bernoulli with a seed) is reproducible
only for a fixed partitioning — repartition the input and the sample
changes, and no external oracle can re-derive it. These operators instead
assign every row by a *content hash*: ``md5(key)`` hex, compared against a
fixed-width hex threshold. Properties that matter in production:

- **stable**: the same doc lands in the same split on every run, every
  engine, every partitioning — immune to shuffles, AQE re-plans, SF.
- **uniform**: md5 output is uniform, so a threshold of the first 4
  nibbles < floor(rate·16⁴) samples within 2⁻¹⁶ of the target rate.
- **oracle-verifiable**: lexicographic order on fixed-width lowercase hex
  IS numeric order, so the whole thing is portable string comparison —
  no hex→int conversion on either engine.
- **shuffle-free**: assignment is a per-row projection; the only shuffle
  in these queries is the final reporting aggregation.

The reference has no sampling at all; this is §2.8 territory (the
train/eval split every 100 TB corpus needs before any dedup/curation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table


def hash_fraction_hex(key: F.Column, nibbles: int = 4) -> F.Column:
    """First ``nibbles`` hex chars of md5(key) — a uniform draw in
    [0, 16^nibbles) encoded as a fixed-width string whose lexicographic
    order is numeric order. DuckDB twin:
    ``substring(md5(CAST(key AS VARCHAR)), 1, nibbles)``."""
    return F.substring(F.md5(key.cast("string")), 1, nibbles)


def rate_threshold_hex(rate: float, nibbles: int = 4) -> str:
    """Hex threshold string for a sampling rate: rows with
    hash_fraction_hex < threshold are kept (compile-time constant)."""
    return format(int(rate * (16**nibbles)), f"0{nibbles}x")


_T10 = rate_threshold_hex(0.10)   # '1999'
_T80 = rate_threshold_hex(0.80)   # 'cccc'
_T90 = rate_threshold_hex(0.90)   # 'e666'
_T50 = rate_threshold_hex(0.50)   # '8000'


@register(
    "op_sample_hash_bernoulli",
    f"""SELECT source, COUNT(*) AS n_sampled,
               CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_T10}'
        GROUP BY source
        ORDER BY source""",
)
def op_sample_hash_bernoulli(spark, sf_dir):
    """Deterministic ~10% Bernoulli sample of the corpus by content-hash
    threshold, reported per source. The WHERE is a pure projection-side
    predicate — at 100 TB the sample never shuffles, and re-running on a
    re-partitioned / re-compacted copy of the data selects the SAME
    documents (unlike ``df.sample(seed=…)``, which is partition-layout-
    dependent)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(hash_fraction_hex(F.col("doc_id")) < _T10)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("sampled_chars"),
        )
        .orderBy("source")
    )


@register(
    "op_split_train_eval",
    f"""SELECT CASE
                 WHEN h < '{_T80}' THEN 'train'
                 WHEN h < '{_T90}' THEN 'val'
                 ELSE 'test'
               END AS split,
               lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM (SELECT lang, n_chars,
                     substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
              FROM documents)
        GROUP BY 1, 2
        ORDER BY split, lang""",
)
def op_split_train_eval(spark, sf_dir):
    """80/10/10 train/val/test assignment by hash band — the split is a
    function of doc_id alone, so adding new data later never moves an
    existing document between splits (the leakage guarantee retraining
    pipelines rely on). Reported as split × lang counts."""
    d = load_table(spark, sf_dir, "documents")
    h = hash_fraction_hex(F.col("doc_id"))
    split = (
        F.when(h < _T80, "train").when(h < _T90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "op_sample_rebalance_langs",
    f"""SELECT lang, COUNT(*) AS n_kept
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
              < CASE WHEN lang = 'en' THEN '{_T10}' ELSE '{_T50}' END
        GROUP BY lang
        ORDER BY lang""",
)
def op_sample_rebalance_langs(spark, sf_dir):
    """Stratified downsampling with per-stratum rates: keep 10% of the
    dominant language (en) and 50% of everything else — the standard
    rebalancing move before pretraining. Per-stratum thresholds are
    compile-time hex constants riding the same row-local hash, so the
    stratification adds zero cost over the uniform sample."""
    d = load_table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", F.lit(_T10)).otherwise(F.lit(_T50))
    return (
        d.filter(hash_fraction_hex(F.col("doc_id")) < thr)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("lang")
    )


@register(
    "op_sample_importance_by_quality",
    """SELECT lang,
              COUNT(*) AS n_kept,
              CAST(SUM(n_chars) AS BIGINT) AS kept_chars
       FROM documents
       WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
             < lpad(lower(to_hex(CAST(FLOOR(
                 LEAST(0.9, GREATEST(0.05, n_chars / 500.0)) * 65536
               ) AS INT))), 4, '0')
       GROUP BY lang
       ORDER BY lang""",
)
def op_sample_importance_by_quality(spark, sf_dir):
    """Importance sampling with a per-ROW keep rate driven by a quality
    signal (here: document length as the stand-in score, clamped to
    [0.05, 0.9]) — the corpus-reweighting move that upsamples high-value
    documents without a shuffle: the rate becomes a per-row hex
    threshold compared against the same content hash as the uniform
    sampler, so selection stays deterministic, layout-invariant, and
    oracle-verifiable. Composes with any scored signal (model-based
    quality, perplexity) by swapping the rate expression."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.least(
        F.lit(0.9), F.greatest(F.lit(0.05), F.col("n_chars") / F.lit(500.0))
    )
    thr = F.lpad(
        F.lower(F.hex(F.floor(rate * 65536).cast("int"))), 4, "0"
    )
    return (
        d.filter(hash_fraction_hex(F.col("doc_id")) < thr)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
        .orderBy("lang")
    )


_ALPHA = 0.5   # mixture temperature: kept_s ∝ n_s^alpha
_CAP = 30      # per-source document cap


@register(
    "op_sample_temperature_mix",
    f"""WITH counts AS (
          SELECT source, COUNT(*) AS n_raw FROM documents GROUP BY source),
        rates AS (
          SELECT source, n_raw,
                 POWER(n_raw * 1.0 / (SELECT MIN(n_raw) FROM counts),
                       {_ALPHA} - 1) AS rate
          FROM counts)
        SELECT d.source,
               MAX(r.n_raw) AS n_raw,
               COUNT(*) FILTER (
                 r.rate >= 1.0 OR
                 substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                 < lpad(lower(to_hex(CAST(FLOOR(r.rate * 65536) AS INT))), 4, '0')
               ) AS n_kept,
               ROUND(MAX(r.rate), 6) AS rate
        FROM documents d JOIN rates r USING (source)
        GROUP BY d.source
        ORDER BY d.source""",
)
def op_sample_temperature_mix(spark, sf_dir):
    """Temperature-based mixture resampling (the multilingual-corpus
    rebalancing rule, e.g. XLM-R: kept_s ∝ n_s^alpha with alpha=0.5):
    each source's keep rate is (n_s / n_min)^(alpha-1), so the smallest
    source keeps everything and large sources are downweighted toward
    the tempered mixture. The per-source rates are a tiny aggregate
    (one row per source, broadcast back); the keep decision stays the
    row-local content-hash threshold — deterministic, layout-invariant,
    and still zero shuffle over the corpus itself."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    min_n = counts.agg(F.min("n_raw").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "source", "n_raw",
        F.pow(F.col("n_raw") * 1.0 / F.col("n_min"), _ALPHA - 1).alias("rate"),
    )
    thr = F.lpad(
        F.lower(F.hex(F.floor(F.col("rate") * 65536).cast("int"))), 4, "0"
    )
    # rate >= 1 would produce a 5-hex-digit threshold that lpad truncates
    # (0x10000 -> '1000'); keep-everything short-circuits it instead.
    kept = (F.col("rate") >= 1.0) | (hash_fraction_hex(F.col("doc_id")) < thr)
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.max("n_raw").alias("n_raw"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.round(F.max("rate"), 6).alias("rate"),
        )
        .orderBy("source")
    )


@register(
    "op_cap_per_source",
    f"""SELECT source,
              CAST(COUNT(*) AS BIGINT) AS n_capped,
              CAST(SUM(n_chars) AS BIGINT) AS capped_chars
       FROM (SELECT source, n_chars,
                    ROW_NUMBER() OVER (
                      PARTITION BY source
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             FROM documents)
       WHERE rn <= {_CAP}
       GROUP BY source
       ORDER BY source""",
)
def op_cap_per_source(spark, sf_dir):
    """Per-domain document cap (keep at most N docs per source) — the
    anti-domination rule web-scale pipelines apply so no single domain
    overwhelms the mixture. Selection order inside a source is the
    content hash (a deterministic pseudo-random order with doc_id as
    tiebreak), so the kept set is stable across runs and layouts. One
    window shuffle keyed by source; at scale a skewed giant source is
    exactly the hot partition AQE skew-split handles, and the hash sort
    keys are 32 bytes/row."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("source", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _CAP)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_capped"),
            F.sum("n_chars").cast("bigint").alias("capped_chars"),
        )
        .orderBy("source")
    )


@register(
    "op_split_stratified_exact",
    """SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
       FROM (SELECT lang,
                    CASE WHEN rn <= CAST(FLOOR(0.8 * n) AS BIGINT) THEN 'train'
                         WHEN rn <= CAST(FLOOR(0.9 * n) AS BIGINT) THEN 'val'
                         ELSE 'test' END AS split
             FROM (SELECT lang,
                          ROW_NUMBER() OVER (
                            PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                          COUNT(*) OVER (PARTITION BY lang) AS n
                   FROM documents))
       GROUP BY split, lang
       ORDER BY split, lang""",
)
def op_split_stratified_exact(spark, sf_dir):
    """Exact-quota stratified split: precisely floor(80%)/floor(10%)/rest
    of every language stratum, with content-hash order inside the stratum
    so the assignment is deterministic and layout-invariant. The
    complement of op_split_train_eval's hash-band split: hash bands are
    add-data-stable but only approximate the ratios; exact quotas hit
    the ratios but adding data can reassign rows. Production pipelines
    need both, and which one is correct depends on whether the split
    ratio or split stability is the contract. One window shuffle keyed
    by lang (AQE skew-split covers a dominant stratum at scale)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("lang")
    ranked = d.select(
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    split = (
        F.when(F.col("rn") <= F.floor(0.8 * F.col("n")).cast("bigint"), "train")
        .when(F.col("rn") <= F.floor(0.9 * F.col("n")).cast("bigint"), "val")
        .otherwise("test")
    )
    return (
        ranked.select("lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("split", "lang")
    )


_EXACT_K = 100


@register(
    "op_sample_exact_k",
    f"""SELECT doc_id, source, n_chars
        FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        LIMIT {_EXACT_K}""",
)
def op_sample_exact_k(spark, sf_dir):
    """EXACTLY-k deterministic sample: order all rows by a content hash
    and take the first k — the fixed-budget companion to the
    rate-based Bernoulli sampler (which only hits the target count in
    expectation). Properties: exact size, stable under repartitioning
    and engine choice (hash order, not RNG state — a distributed
    reservoir sample is NOT reproducible across partitionings), and a
    uniform draw because md5 order is independent of any data order.
    Plan shape: TakeOrderedAndProject — each partition keeps its local
    top-k by hash and the driver merges k-row heaps; no global sort,
    no full shuffle, O(k) driver memory at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", "source", "n_chars",
            F.md5(F.col("doc_id").cast("string")).alias("__h"),
        )
        .orderBy("__h", "doc_id")
        .limit(_EXACT_K)
        .drop("__h")
    )


_N_EPOCHS = 2


@register(
    "pipeline_epoch_shuffle",
    f"""WITH e AS (SELECT unnest(generate_series(0, {_N_EPOCHS - 1})) AS epoch),
        h AS (
          SELECT e.epoch, d.doc_id,
                 md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS hx
          FROM documents d CROSS JOIN e)
        SELECT epoch,
               substring(hx, 1, 1) AS shard,
               CAST(row_number() OVER (PARTITION BY epoch, substring(hx, 1, 1)
                                       ORDER BY hx, doc_id) AS BIGINT) AS pos,
               doc_id
        FROM h
        ORDER BY epoch, shard, pos""",
)
def pipeline_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch training order: every epoch re-shuffles
    the corpus by ranking docs on md5(epoch:doc_id) within 16 hash
    shards (first hex nibble) — the reproducible global shuffle a
    training loader needs (same order on every run/engine/partitioning,
    different order every epoch, resumable mid-epoch from (shard, pos)).
    An RNG shuffle can't give any of those. The rank window is
    per-(epoch, shard) — corpus/16 rows each, never a global sort; at
    larger scale widen to more nibbles for smaller shards."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    epochs = F.explode(
        F.array(*[F.lit(i) for i in range(_N_EPOCHS)])
    ).alias("epoch")
    h = docs.select("doc_id", epochs).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("hx"),
    )
    w = Window.partitionBy("epoch", F.substring("hx", 1, 1)).orderBy("hx", "doc_id")
    return (
        h.select(
            "epoch",
            F.substring("hx", 1, 1).alias("shard"),
            F.row_number().over(w).cast("bigint").alias("pos"),
            "doc_id",
        )
        .orderBy("epoch", "shard", "pos")
    )


# --------------------------------------------------------------------------
# Weighted reservoir sampling without replacement (Efraimidis & Spirakis
# 2006, "A-Res"): each row draws u ~ U(0,1) from its content hash and is
# ranked by key = u^(1/w); the top-k keys ARE a weighted sample without
# replacement. The weighted generalization of op_sample_exact_k — the
# length-proportional draw a token-budgeted corpus sample needs (sampling
# DOCUMENTS uniformly under-represents long documents' tokens).

_ARES_K = 50
_ARES_SEED = "ares"
#: 13 md5 nibbles = 52 uniform bits -> u = (m + 0.5) / 2^52 is EXACT in
#: a double (m + 0.5 needs 53 significand bits; /2^52 is a scale by a
#: power of two), so both engines rank the identical u.
_ARES_NIBBLES = 13
_ARES_DENOM = float(2**52)


def _hex52_sql(expr: str, seed: str = _ARES_SEED) -> str:
    """DuckDB twin of conv(substring(md5(...),1,13),16,10): nibble-
    assembled 52-bit integer (countmin.py's _bucket_sql pattern)."""
    nib = (
        lambda i: "(strpos('0123456789abcdef', "
        f"substr(md5('{seed}:' || {expr}), {i + 1}, 1)) - 1)"
    )
    return " + ".join(
        f"({nib(i)}::BIGINT << {4 * (_ARES_NIBBLES - 1 - i)})"
        for i in range(_ARES_NIBBLES)
    )


@register(
    "op_sample_weighted_ares",
    f"""WITH keyed AS (
          SELECT doc_id, source, lang, n_chars,
                 ln(({_hex52_sql('CAST(doc_id AS VARCHAR)')} + 0.5)
                    / {_ARES_DENOM!r}) / n_chars AS k
          FROM documents)
        SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM keyed
        ORDER BY k DESC, doc_id
        LIMIT {_ARES_K}""",
)
def op_sample_weighted_ares(spark, sf_dir):
    """Exactly-k sample where selection probability scales with document
    LENGTH (weight = n_chars), via the A-Res key ln(u)/w ranked
    descending (monotone twin of u^(1/w), numerically tamer).

    Determinism story: u comes from 52 md5 bits of the doc_id —
    (m + 0.5)/2^52 is bit-exact in both engines (see _ARES_NIBBLES) —
    so the ONE cross-engine float risk is the libm ln() (JVM Math.log
    vs DuckDB's libm may differ in the last ulp). A 1-ulp key
    difference flips the sample only if two keys straddle the rank-k
    boundary within ~1e-16 relative — with corpus-scale key gaps
    (~1e-3 at 500 docs) this is the same data-dependent margin the
    Lloyd-oracle documents (kmeans.py); verified at all three SFs, and
    the doc_id tiebreak removes any equal-key ambiguity.

    Plan shape: per-row projection (hash, ln, divide) then
    TakeOrderedAndProject — each partition keeps a local k-heap, the
    driver merges k-row heaps: no shuffle, no global sort, O(k) driver
    memory at 100 TB, same as op_sample_exact_k. This is why A-Res
    beats the textbook 'single reservoir' form in a distributed
    engine: the key ranking is embarrassingly parallel and the
    reservoir merge is just top-k.
    """
    docs = load_table(spark, sf_dir, "documents")
    m = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{_ARES_SEED}:"), F.col("doc_id").cast("string"))),
            1,
            _ARES_NIBBLES,
        ),
        16,
        10,
    ).cast("bigint")
    key = F.log((m + F.lit(0.5)) / F.lit(_ARES_DENOM)) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            "source",
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            key.alias("__k"),
        )
        .orderBy(F.desc("__k"), "doc_id")
        .limit(_ARES_K)
        .drop("__k")
    )


# --------------------------------------------------------------------------
# Neyman-allocated stratified sampling (Neyman 1934): a fixed budget k
# splits across strata proportionally to N_h * S_h — big AND internally
# varied strata get more of the sample, which minimizes the variance of
# the stratified mean estimator. The statistics-grade upgrade over the
# equal-rate stratified sampler.

_NEYMAN_K = 60


@register(
    "op_sample_neyman",
    f"""WITH stats AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS nh,
             SUM(n_chars) AS sx,
             SUM(n_chars * n_chars) AS sxx
      FROM documents GROUP BY lang),
    w AS (
      SELECT lang, nh,
             nh * SQRT((nh * sxx - sx * sx) / (1.0 * nh * (nh - 1))) AS wh
      FROM stats),
    tot AS (SELECT SUM(wh) AS wt, CAST(SUM(nh) AS BIGINT) AS n FROM w),
    shares AS (
      SELECT lang, nh, {_NEYMAN_K} * wh / (SELECT wt FROM tot) AS share
      FROM w),
    base AS (
      SELECT lang, nh, share,
             CAST(FLOOR(share) AS BIGINT) AS n_base,
             share - FLOOR(share) AS frac
      FROM shares),
    rem AS (SELECT {_NEYMAN_K} - SUM(n_base) AS r FROM base),
    alloc AS (
      SELECT lang, nh,
             n_base + CASE WHEN ROW_NUMBER() OVER (ORDER BY frac DESC, lang)
                                <= (SELECT r FROM rem)
                           THEN 1 ELSE 0 END AS n_h
      FROM base),
    ranked AS (
      SELECT d.doc_id, d.lang, d.n_chars, a.n_h,
             ROW_NUMBER() OVER (PARTITION BY d.lang
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                         d.doc_id) AS rnk
      FROM documents d JOIN alloc a ON a.lang = d.lang)
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked WHERE rnk <= n_h
    ORDER BY lang, doc_id""",
)
def op_sample_neyman(spark, sf_dir):
    """Stratified sample of exactly {k} documents with NEYMAN
    allocation: stratum h (language) receives n_h ∝ N_h·S_h seats
    (floor + largest-remainder for the leftovers, fractional-part ties
    to the smaller lang), then the within-stratum draw is the
    content-hash exact-k rule (md5 order — stable under repartitioning
    and engine choice).

    Determinism: N_h, Σx, Σx² are exact integers; S_h is one IEEE
    sqrt/divide per stratum (engine-identical); the single
    order-sensitive float is the 5-term total Σ N_h·S_h, whose
    summation-order drift (~1e-16 relative) would flip an allocation
    only if a share's fractional part sat within ~1e-15 of a
    largest-remainder boundary — the same measured-margin contract as
    the A-Res sampler and the Lloyd oracle; verified at all three SFs.

    Plan shape: one stats aggregate (map-side partial, strata-sized
    output), the allocation arithmetic on the STRATA-bounded frame
    (its window orders 5 rows — dim-bounded-window contract), one
    broadcast of the allocation into the per-stratum rank window
    (partitioned by lang, distributes), and a filter. At 100 TB:
    identical — the only full-data stages are the stats aggregate and
    the rank window, both key-partitioned."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    w = stats.withColumn(
        "wh",
        F.col("nh")
        * F.sqrt(
            (F.col("nh") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (F.lit(1.0) * F.col("nh") * (F.col("nh") - 1))
        ),
    )
    tot = w.agg(F.sum("wh").alias("wt"))
    base = (
        w.join(F.broadcast(tot))
        .withColumn("share", F.lit(_NEYMAN_K) * F.col("wh") / F.col("wt"))
        .withColumn("n_base", F.floor("share").cast("bigint"))
        .withColumn("frac", F.col("share") - F.floor("share"))
    )
    rem = base.agg(
        (F.lit(_NEYMAN_K) - F.sum("n_base")).alias("r")
    )
    w_rank = Window.orderBy(F.desc("frac"), F.asc("lang"))
    alloc = (
        base.join(F.broadcast(rem))
        .withColumn("pos", F.row_number().over(w_rank))
        .withColumn(
            "n_h",
            F.col("n_base")
            + F.when(F.col("pos") <= F.col("r"), 1).otherwise(0),
        )
        .select("lang", "n_h")
    )
    w_sel = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.join(F.broadcast(alloc), "lang")
        .withColumn("rnk", F.row_number().over(w_sel))
        .where(F.col("rnk") <= F.col("n_h"))
        .select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))
        .orderBy("lang", "doc_id")
    )


# --------------------------------------------------------------------------
# Stratified weighted reservoir (A-Res within strata): every stratum
# (language) gets the SAME seat count, but within a stratum selection
# probability scales with document length — the two samplers above
# composed. op_sample_weighted_ares fixes under-representation of long
# documents' TOKENS; this additionally fixes under-representation of
# small LANGUAGES (a global weighted draw is dominated by the majority
# lang). The equal-seats x length-weighted design is what a multilingual
# token-budgeted eval set actually uses: per-language quotas, token-mass
# draws inside each quota. Same Efraimidis-Spirakis key as the global
# sampler (ln(u)/w ranked descending == u^(1/w)), distinct hash seed so
# the two draws are decorrelated.

_SARES_K_PER_STRATUM = 12
_SARES_SEED = "sares"


@register(
    "op_sample_stratified_weighted",
    f"""WITH keyed AS (
          SELECT doc_id, lang, n_chars,
                 ln(({_hex52_sql('CAST(doc_id AS VARCHAR)', seed=_SARES_SEED)} + 0.5)
                    / {_ARES_DENOM!r}) / n_chars AS k
          FROM documents),
        ranked AS (
          SELECT doc_id, lang, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY k DESC, doc_id) AS rnk
          FROM keyed)
        SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM ranked WHERE rnk <= {_SARES_K_PER_STRATUM}
        ORDER BY lang, doc_id""",
)
def op_sample_stratified_weighted(spark, sf_dir):
    """Per-stratum weighted reservoir: exactly {k} documents PER
    LANGUAGE, drawn within each language with probability proportional
    to n_chars — the A-Res key ln(u)/w ranked descending inside a
    per-lang window. Columns (lang, doc_id, n_chars).

    Composition contract: u reuses op_sample_weighted_ares's exact
    52-bit construction ((m + 0.5)/2^52 is bit-exact in a double on
    both engines) under a DIFFERENT seed ('sares:'), so this draw is
    independent of the global weighted sample; the ln() libm caveat and
    the doc_id tiebreak are the same measured-margin contract
    documented there.

    Plan shape: per-row projection (hash, ln, divide) then ONE rank
    window partitioned by lang and a filter — no global sort, no
    TakeOrderedAndProject funnel, no shuffle beyond the lang
    repartition. At 100 TB each language's partition keeps a local
    top-k via the window's sort; skewed languages are bounded by the
    stratum's own size (and a per-lang top-k is exactly the salting-
    free shape — the key space IS the stratum)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    m = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{_SARES_SEED}:"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            _ARES_NIBBLES,
        ),
        16,
        10,
    ).cast("bigint")
    key = F.log((m + F.lit(0.5)) / F.lit(_ARES_DENOM)) / F.col("n_chars")
    from gravity_books_datalakehouse_spark.operators.sort import bounded_sort

    w_sel = Window.partitionBy("lang").orderBy(F.desc("__k"), F.asc("doc_id"))
    return (
        docs.select(
            "lang",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            key.alias("__k"),
        )
        .withColumn("rnk", F.row_number().over(w_sel))
        .where(F.col("rnk") <= _SARES_K_PER_STRATUM)
        .select("lang", "doc_id", "n_chars")
        .transform(bounded_sort, "lang", "doc_id")  # |langs| x k rows
    )


# --------------------------------------------------------------------------
# Group-holdout split: assign whole SOURCES to train/eval, not documents.
# The leakage-safe evaluation design — near-duplicates cluster within a
# source (mirrors, boilerplate, re-crawls), so a doc-hash split puts one
# copy in train and its twin in eval and the eval score is contaminated
# (the dedup-vs-eval effect of Lee et al. 2021). Holding out at the
# group boundary removes that channel by construction.

_HOLDOUT_RATE = 0.8  # sources hashed below this stay in train


@register(
    "op_split_source_holdout",
    f"""SELECT source,
              CASE WHEN substring(md5(source), 1, 4)
                        < '{rate_threshold_hex(_HOLDOUT_RATE)}'
                   THEN 'train' ELSE 'eval' END AS split,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars
       FROM documents
       GROUP BY source
       ORDER BY source""",
)
def op_split_source_holdout(spark, sf_dir):
    """Per-source train/eval assignment by GROUP hash: every document
    of a source shares its source's split, so intra-source
    near-duplicates can never straddle the boundary — the leakage-safe
    counterpart to op_split_train_eval's per-document split (which is
    the right tool only AFTER cross-source dedup). Same determinism
    contract as every sampler here: the assignment is a pure function
    of the source string, stable under repartitioning, engine choice,
    and scale. One scan, one strata-sized aggregate; the split column
    is a projection, so downstream consumers filter on it with zero
    extra cost."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        hash_fraction_hex(F.col("source")) < rate_threshold_hex(_HOLDOUT_RATE),
        F.lit("train"),
    ).otherwise(F.lit("eval"))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            "source",
            split.alias("split"),
            "n_docs",
            "total_chars",
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Deterministic Poisson bootstrap (the large-scale bootstrap: per-row
# independent Poisson(1) replica weights instead of resampling — the
# form that streams, Chamandy et al. / Google's "Estimating Uncertainty
# for Massive Data Streams", 2012). Twist that makes it hash-gateable:
# the Poisson draw is the inverse CDF applied to 52 exact md5 bits, the
# CDF thresholds are SHARED decimal literals, and each replica's
# Σw·x / Σw runs on INTEGER sums — so every replica mean is bit-identical
# across engines and the CI is a deterministic function of the data.

_BOOT_B = 40           #: bootstrap replicas
_BOOT_WMAX = 6         #: Poisson(1) inverse-CDF truncation (P(w>6) ~ 8e-5)
#: Poisson(1) CDF: u < _BOOT_CDF[k] => w = k (u from 52 md5 bits).
_BOOT_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
)


def _boot_w_sql(u_expr: str) -> str:
    cases = " ".join(
        f"WHEN {u_expr} < {t!r} THEN {k}" for k, t in enumerate(_BOOT_CDF)
    )
    return f"(CASE {cases} ELSE {_BOOT_WMAX} END)"


def _hex52_boot_sql() -> str:
    """52-bit uniform from md5('boot:' || b || ':' || doc_id), nibble-
    assembled (the _hex52_sql pattern with the replica index in the
    seed)."""
    arg = "('boot:' || CAST(b AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))"
    nib = (
        lambda i: "(strpos('0123456789abcdef', "
        f"substr(md5{arg}, {i + 1}, 1)) - 1)"
    )
    bits = " + ".join(
        f"({nib(i)}::BIGINT << {4 * (_ARES_NIBBLES - 1 - i)})"
        for i in range(_ARES_NIBBLES)
    )
    return f"(({bits}) + 0.5) / {_ARES_DENOM!r}"


@register(
    "op_bootstrap_ci_mean_len",
    f"""WITH reps AS (
      SELECT b, doc_id, n_chars, {_boot_w_sql(_hex52_boot_sql())} AS w
      FROM documents
      CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b)),
    means AS (
      SELECT b, SUM(w * n_chars) / (1.0 * SUM(w)) AS m
      FROM reps GROUP BY b),
    ranked AS (
      SELECT m,
             ROW_NUMBER() OVER (ORDER BY m) AS rnk,
             COUNT(*) OVER () AS nb
      FROM means),
    pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(n_chars) / (1.0 * COUNT(*)) AS mean_len
           FROM documents)
    SELECT pt.n AS n_docs,
           ROUND(pt.mean_len, 6) AS mean_len,
           ROUND(MIN(CASE WHEN rnk * 40 >= nb THEN m END), 6) AS ci_lo,
           ROUND(MIN(CASE WHEN rnk * 40 >= 39 * nb THEN m END), 6) AS ci_hi,
           CAST({_BOOT_B} AS BIGINT) AS n_replicas
    FROM ranked CROSS JOIN pt
    GROUP BY pt.n, pt.mean_len""",
)
def op_bootstrap_ci_mean_len(spark, sf_dir):
    """95% Poisson-bootstrap confidence interval for the corpus mean
    document length, fully deterministic: replica weights are the
    Poisson(1) inverse CDF on 52 exact md5 bits of (replica, doc_id)
    with shared literal thresholds (truncated at w={wmax} — part of
    the spec, applied identically on both engines), each replica mean
    is Σw·x/Σw on INTEGER sums (order-independent, one IEEE division),
    and the CI bounds are the 2.5%/97.5% discrete percentiles of the
    {b} replica means via the cume rule rnk·40 ≥ nb / rnk·40 ≥ 39·nb —
    pure integer comparisons.

    Scale shape: the replica explode is a narrow ×{b} projection with
    map-side partial aggregation, so the shuffle carries {b} partial
    rows per task, not {b}× the data; the replica-mean frame is
    {b} rows. This is WHY the Poisson form beats classic resampling in
    a distributed engine: no per-replica shuffles, no resampled
    copies, one pass. The statistic here is the mean; any linear
    statistic rides the same plan."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    reps = docs.select(
        "doc_id", "n_chars", F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("b")
    )
    m = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("boot:"),
                    F.col("b").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            _ARES_NIBBLES,
        ),
        16,
        10,
    ).cast("bigint")
    u = (m + F.lit(0.5)) / F.lit(_ARES_DENOM)
    w = F.lit(_BOOT_WMAX)
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_BOOT_CDF[k]), F.lit(k)).otherwise(w)
    means = (
        reps.withColumn("w", w)
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("n_chars"))
                / (F.lit(1.0) * F.sum("w"))
            ).alias("m")
        )
    )
    w_rank = Window.orderBy("m")
    ranked = means.select(
        "m",
        F.row_number().over(w_rank).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nb"),
    )
    ci = ranked.agg(
        F.round(
            F.min(F.when(F.col("rnk") * 40 >= F.col("nb"), F.col("m"))), 6
        ).alias("ci_lo"),
        F.round(
            F.min(
                F.when(F.col("rnk") * 40 >= 39 * F.col("nb"), F.col("m"))
            ),
            6,
        ).alias("ci_hi"),
    )
    pt = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum("n_chars") / (F.lit(1.0) * F.count(F.lit(1))), 6
        ).alias("mean_len"),
    )
    return pt.join(ci).select(
        "n_docs",
        "mean_len",
        "ci_lo",
        "ci_hi",
        F.lit(_BOOT_B).cast("bigint").alias("n_replicas"),
    )


# --------------------------------------------------------------------------
# Purged temporal split with an embargo gap (the time-series analog of
# the group-holdout split above; de Prado 2018's "purged k-fold" in its
# simplest two-way form). A plain ts < cutoff split leaks: sessions,
# label windows, or near-duplicate events that STRADDLE the boundary put
# near-identical information on both sides. Purging an embargo interval
# around the cutoff guarantees a minimum temporal distance between any
# train row and any eval row.

_EMBARGO_CUTOFF = "2024-01-20 00:00:00"
_EMBARGO_END = "2024-01-22 00:00:00"  # cutoff + 2-day embargo


@register(
    "op_split_time_embargo",
    f"""WITH tagged AS (
      SELECT event_type, user_id, ts,
             CASE WHEN ts < TIMESTAMP '{_EMBARGO_CUTOFF}' THEN 'train'
                  WHEN ts >= TIMESTAMP '{_EMBARGO_END}' THEN 'eval'
                  ELSE 'purged' END AS split
      FROM events)
    SELECT split, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS ts_min,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS ts_max
    FROM tagged
    GROUP BY split, event_type
    ORDER BY split, event_type""",
)
def op_split_time_embargo(spark, sf_dir):
    """Two-way temporal split with a purged embargo zone: train strictly
    before the cutoff, eval at least the embargo width after it, the
    zone between dropped (reported as its own 'purged' split so the
    discarded volume is auditable). The assignment is a pure function
    of the timestamp — deterministic under repartitioning, engine, and
    scale, like every splitter in this module. The report pins the
    guarantee the hash can't articulate by inspection: max(train ts) <
    cutoff <= embargo end <= min(eval ts) per event type.

    One scan, one strata-sized aggregate (3 splits x |event types|);
    timestamps are emitted as explicit second-precision strings on both
    engines (the DATE-stringification gotcha). COUNT(DISTINCT user_id)
    is the built-in two-phase distinct aggregate — exact, shuffle
    bounded by distinct users per cell."""
    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        load_events,
    )

    e = load_events(spark, sf_dir)
    split = (
        F.when(
            F.col("ts") < F.lit(_EMBARGO_CUTOFF).cast("timestamp"), "train"
        )
        .when(F.col("ts") >= F.lit(_EMBARGO_END).cast("timestamp"), "eval")
        .otherwise("purged")
    )
    return (
        e.select("event_type", "user_id", "ts", split.alias("split"))
        .groupBy("split", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("ts_min"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("ts_max"),
        )
        .orderBy("split", "event_type")
    )


_CHI2_CRIT_2DF = 5.991464547107979  #: chi-square 0.95 quantile, df = 2


@register(
    "op_split_balance_audit",
    f"""WITH per AS (
      SELECT source,
             SUM(CASE WHEN h < '{_T80}' THEN 1 ELSE 0 END) AS n_train,
             SUM(CASE WHEN h >= '{_T80}' AND h < '{_T90}' THEN 1 ELSE 0 END)
               AS n_val,
             SUM(CASE WHEN h >= '{_T90}' THEN 1 ELSE 0 END) AS n_test
      FROM (SELECT source,
                   substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
            FROM documents)
      GROUP BY source),
    g AS (
      SELECT source, n_train, n_val, n_test,
             n_train + n_val + n_test AS n_src,
             SUM(n_train) OVER () AS g_train,
             SUM(n_val) OVER () AS g_val,
             SUM(n_test) OVER () AS g_test,
             SUM(n_train + n_val + n_test) OVER () AS g_n
      FROM per),
    x AS (
      SELECT source,
             CAST(n_train AS BIGINT) AS n_train,
             CAST(n_val AS BIGINT) AS n_val,
             CAST(n_test AS BIGINT) AS n_test,
             (n_train - n_src * (g_train * 1.0 / g_n))
               * (n_train - n_src * (g_train * 1.0 / g_n))
               / (n_src * (g_train * 1.0 / g_n))
             + (n_val - n_src * (g_val * 1.0 / g_n))
               * (n_val - n_src * (g_val * 1.0 / g_n))
               / (n_src * (g_val * 1.0 / g_n))
             + (n_test - n_src * (g_test * 1.0 / g_n))
               * (n_test - n_src * (g_test * 1.0 / g_n))
               / (n_src * (g_test * 1.0 / g_n)) AS chi2
      FROM g)
    SELECT source, n_train, n_val, n_test,
           ROUND(chi2, 6) AS chi2,
           chi2 <= {_CHI2_CRIT_2DF} AS balanced
    FROM x ORDER BY source""",
)
def op_split_balance_audit(spark, sf_dir):
    """Split-balance governance audit: is each source's 80/10/10
    hash-split allocation consistent with the corpus-wide split shares?
    Per source: observed train/val/test counts and the 2-df chi-square
    statistic against expected counts n_src x global share, flagged at
    alpha = 0.05. A source failing this audit means its doc_id space
    interacts with the hash bands (e.g. ids assigned in ingest batches
    that correlate with content) — exactly the silent eval-set bias a
    split audit exists to catch. Companion to op_split_train_eval
    (which ASSIGNS the split this op audits).

    Determinism: counts are exact integers; expected counts and chi2
    are the SAME explicit three-term expression tree over identical
    integers on both engines (no aggregation-order-dependent float
    sum), so the doubles are bit-equal and the boundary flag cannot
    diverge. Plan: one scan -> |sources|-row conditional aggregate ->
    window over that tiny frame. The 100 TB shape is unchanged: the
    audit never touches text, only ids."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    h = hash_fraction_hex(F.col("doc_id"), 4)
    per = (
        d.select("source", h.alias("h"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("h") < _T80, 1).otherwise(0)).alias(
                "n_train"
            ),
            F.sum(
                F.when(
                    (F.col("h") >= _T80) & (F.col("h") < _T90), 1
                ).otherwise(0)
            ).alias("n_val"),
            F.sum(F.when(F.col("h") >= _T90, 1).otherwise(0)).alias(
                "n_test"
            ),
        )
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_src = F.col("n_train") + F.col("n_val") + F.col("n_test")
    g = per.select(
        "source",
        "n_train",
        "n_val",
        "n_test",
        n_src.alias("n_src"),
        F.sum("n_train").over(w).alias("g_train"),
        F.sum("n_val").over(w).alias("g_val"),
        F.sum("n_test").over(w).alias("g_test"),
        F.sum(n_src).over(w).alias("g_n"),
    )

    def term(obs: str, gl: str):
        e = F.col("n_src") * (F.col(gl) * F.lit(1.0) / F.col("g_n"))
        return (F.col(obs) - e) * (F.col(obs) - e) / e

    chi2 = (
        term("n_train", "g_train")
        + term("n_val", "g_val")
        + term("n_test", "g_test")
    )
    return (
        g.select(
            "source",
            F.col("n_train").cast("bigint").alias("n_train"),
            F.col("n_val").cast("bigint").alias("n_val"),
            F.col("n_test").cast("bigint").alias("n_test"),
            F.round(chi2, 6).alias("chi2"),
            (chi2 <= F.lit(_CHI2_CRIT_2DF)).alias("balanced"),
        )
        .orderBy("source")
    )
