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


@register(
    "text_bm25_topk",
    f"""WITH dl AS (
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
          GROUP BY t.doc_id)
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
    scored = (
        tfdf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (K1 + 1) / denom).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(TOP_K)
    )
