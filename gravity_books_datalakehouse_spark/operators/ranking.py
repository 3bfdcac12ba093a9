"""Keyword relevance ranking over the corpus — BM25 (beyond-reference).

BM25 (Robertson & Zaragoza 2009, public literature) is the standard
lexical retrieval scorer and the usual first stage of a RAG /
retrieval pipeline over a training corpus. The whole computation is
relational: token explode -> per-(doc, term) counts -> corpus document
frequencies -> scalar corpus stats -> weighted sum per doc -> top-k.

Scale shape: the exploded token stream is filtered to the query's terms
*before* any shuffle (predicate on a scan-side projection), so the
aggregation only ever shuffles (doc_id, term) pairs for matching terms
— at 100 TB that is proportional to the posting lists, not the corpus.
Corpus-level scalars (N, avgdl) and the per-term document frequencies
are tiny and broadcast. Top-k is TakeOrderedAndProject, never a full
sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.text import TOKS_SQL, tokens_col
from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table

#: Fixed query for the registry entry (terms from the corpus vocabulary).
QUERY_TERMS = ("join", "stream", "window")
K1 = 1.2
B = 0.75
TOP_K = 20

_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in QUERY_TERMS) + "]"


#: The scored CTE chain, without ranking — reused by the RRF hybrid.
BM25_SCORED_CTES = f"""dl AS (
          SELECT doc_id, len({TOKS_SQL}) AS doclen FROM documents),
        stats AS (
          SELECT COUNT(*) AS n_docs, AVG(doclen) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest({TOKS_SQL}) AS tok FROM documents)
          WHERE list_contains({_TERMS_SQL}, tok)
          GROUP BY doc_id, tok),
        tfdf AS (
          SELECT doc_id, tok, tf,
                 COUNT(*) OVER (PARTITION BY tok) AS df
          FROM tf),
        scored AS (
          SELECT t.doc_id,
                 SUM(ln(1 + (stats.n_docs - t.df + 0.5) / (t.df + 0.5))
                     * t.tf * ({K1} + 1)
                     / (t.tf + {K1} * (1 - {B} + {B} * dl.doclen / stats.avgdl)))
                   AS score
          FROM tfdf t
          JOIN dl USING (doc_id)
          CROSS JOIN stats
          GROUP BY t.doc_id)"""


@register(
    "text_bm25_topk",
    f"""WITH {BM25_SCORED_CTES}
        SELECT doc_id, ROUND(score, 6) AS bm25
        FROM scored
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT {TOP_K}""",
)
def text_bm25_topk(spark, sf_dir):
    """Top-k documents by BM25 for a fixed keyword query.

    Scan economy (the 100 TB concern — each corpus scan reads every
    byte of text): document length is ``size(tokens)``, a narrow
    zero-shuffle projection, NOT a token explode + count; and document
    frequency is a window over the already-tiny tf relation (rows only
    for documents containing query terms), not a corpus rescan. Net:
    the only row fan-out is the tf explode; dl/stats stay narrow
    per-row projections. ROUND(6) on the score makes the float sum
    portable for the oracle compare."""
    scored = _bm25_scored(spark, sf_dir)
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(TOP_K)
    )


def _bm25_scored(spark, sf_dir):
    """(doc_id, score) for every document containing a query term."""
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select("doc_id", F.size(tokens_col()).alias("doclen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("doclen").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
        .filter(F.col("tok").isin(*QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    from pyspark.sql import Window

    tfdf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("tok"))
    )
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + K1 * (
        1 - B + B * F.col("doclen") / F.col("avgdl")
    )
    return (
        tfdf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (K1 + 1) / denom).alias("score"))
    )


#: RRF fusion constants (Cormack et al. 2009: k=60 is the canonical
#: damping; top-N per leg bounds the rank windows).
RRF_K = 60
RRF_LEG_N = 50
RRF_TOP = 10
#: The semantic query vector is document 0's embedding (vec_id == doc_id
#: in the testdata); doc 0 itself is excluded from the fused results.
RRF_QUERY_VEC_ID = 0

_COS_Q_SQL = (
    f"(list_dot_product(e.embedding::DOUBLE[], q.qv) / "
    f"(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    f"sqrt(list_dot_product(q.qv, q.qv))))"
)


@register(
    "text_hybrid_rrf_topk",
    f"""WITH {{BM25}},
        lex AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
          FROM scored QUALIFY r <= {RRF_LEG_N}),
        q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = {RRF_QUERY_VEC_ID}),
        sem AS (
          SELECT vec_id AS doc_id,
                 row_number() OVER (ORDER BY {_COS_Q_SQL} DESC, vec_id ASC) AS r
          FROM embeddings e CROSS JOIN q
          WHERE e.vec_id != {RRF_QUERY_VEC_ID}
          QUALIFY r <= {RRF_LEG_N})
        SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / ({RRF_K} + l.r), 0)
                     + COALESCE(1.0 / ({RRF_K} + s.r), 0), 6) AS rrf
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
        WHERE COALESCE(l.doc_id, s.doc_id) != {RRF_QUERY_VEC_ID}
        ORDER BY rrf DESC, doc_id ASC
        LIMIT {RRF_TOP}""".replace("{BM25}", BM25_SCORED_CTES),
)
def text_hybrid_rrf_topk(spark, sf_dir):
    """Hybrid retrieval: Reciprocal Rank Fusion of the BM25 keyword leg
    and a semantic cosine leg (query = doc 0's embedding), the standard
    two-tower RAG retrieval pattern. rrf = Σ_legs 1/(60 + rank), ranks
    deterministic via (score, doc_id) tiebreaks, fused FULL OUTER so a
    doc present in one leg still scores.

    Scale shape: each leg is cut to its top-50 BEFORE ranking
    (TakeOrderedAndProject — no global sort, and the rank window then
    runs over a driver-bounded frame, not the corpus); the fusion join
    touches ≤2N tiny rows. The semantic leg here is the exact
    brute-force baseline — at billions of vectors swap in the
    LSH/IVF-bucketed legs (sim_lsh_bucketed_topk / sim_ivf_topk), same
    fusion."""
    from pyspark.sql import Window

    lex_top = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RRF_LEG_N)
    )
    lex = lex_top.withColumn(
        "r",
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ),
    ).select("doc_id", "r")

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == RRF_QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    from gravity_books_datalakehouse_spark.operators.similarity import cosine

    cos = cosine("embedding", "qv")
    sem_top = (
        e.filter(F.col("vec_id") != RRF_QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cos_q"))
        .orderBy(F.desc("cos_q"), F.asc("doc_id"))
        .limit(RRF_LEG_N)
    )
    sem = sem_top.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.desc("cos_q"), F.asc("doc_id"))),
    ).select("doc_id", "r")

    fused = (
        lex.withColumnRenamed("r", "rl")
        .join(sem.withColumnRenamed("r", "rs"), "doc_id", "full_outer")
        .filter(F.col("doc_id") != RRF_QUERY_VEC_ID)
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("rl")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("rs")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOP)
