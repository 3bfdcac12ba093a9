"""Count-Min sketch term frequencies (beyond-reference, §2.8 sketches).

Count-Min (Cormode & Muthukrishnan 2005, public literature) estimates
stream/corpus item counts in O(width × depth) memory with one-sided
error: est >= true, and est - true <= 2N/width with probability
1 - 2^-depth. It completes the engine's sketch trio (HLL distinct,
t-digest quantiles — operators/sketches.py) with the *frequency*
sketch, and unlike those two it is fully deterministic here: the row
hashes are md5-derived, so the ENTIRE sketch — cells, point queries,
everything — is reproducible bit-for-bit by the DuckDB oracle. A
sketch op with a hard hash-verified correctness gate, not just error
bounds (the bounds are additionally asserted in tests/test_countmin.py).

Scale shape: building the sketch IS a groupBy over (row, bucket) —
partial aggregation makes every partition's partial sketch, and the
exchange carries at most width×depth cells per partition regardless of
corpus size; that partial/final split is exactly the sketch-merge
property. Point queries join a literal term list against the cell
table and take the per-term min across rows.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from gravity_books_datalakehouse_spark.operators.text import TOKS_SQL, tokens_col
from gravity_books_datalakehouse_spark.plans.operator_queries import (
    lit_rows_df,
    register,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table

WIDTH = 1024
DEPTH = 4
#: Point-query terms for the registry entry (corpus vocabulary).
CM_TERMS = (
    "table", "join", "stream", "window", "data", "query", "value", "row",
)


def bucket(col: Column, j: int) -> Column:
    """Row-j bucket of a term: 5 md5 nibbles (20 bits) of the seeded
    digest, mod WIDTH. Seeding by row index makes the rows independent."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 5), 16, 10)
        .cast("long") % WIDTH
    )


def _bucket_sql(expr: str, j: int) -> str:
    """DuckDB twin of bucket(): nibble-assembled 20-bit value mod WIDTH."""
    nib = (
        lambda i: "(strpos('0123456789abcdef', "
        f"substr(md5('{j}:' || {expr}), {i + 1}, 1)) - 1)"
    )
    val = " + ".join(f"({nib(i)} << {4 * (4 - i)})" for i in range(5))
    return f"(({val}) % {WIDTH})"


_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in CM_TERMS) + "]"

_CELLS_SQL = " UNION ALL ".join(
    f"SELECT {j} AS j, {_bucket_sql('tok', j)} AS b, COUNT(*) AS n "
    "FROM toks GROUP BY 2"
    for j in range(DEPTH)
)
_QB_SQL = " UNION ALL ".join(
    f"SELECT term, {j} AS j, {_bucket_sql('term', j)} AS b FROM qt"
    for j in range(DEPTH)
)


@register(
    "op_sketch_countmin_terms",
    f"""WITH toks AS (
          SELECT unnest({TOKS_SQL}) AS tok FROM documents),
        cells AS ({_CELLS_SQL}),
        qt AS (SELECT unnest({_TERMS_SQL}) AS term),
        qb AS ({_QB_SQL}),
        est AS (
          SELECT qb.term, MIN(COALESCE(c.n, 0)) AS est_n
          FROM qb LEFT JOIN cells c ON qb.j = c.j AND qb.b = c.b
          GROUP BY qb.term),
        tru AS (
          SELECT tok AS term, COUNT(*) AS true_n FROM toks
          WHERE list_contains({_TERMS_SQL}, tok) GROUP BY tok)
        SELECT e.term,
               CAST(COALESCE(t.true_n, 0) AS BIGINT) AS true_n,
               CAST(e.est_n AS BIGINT) AS est_n
        FROM est e LEFT JOIN tru t ON e.term = t.term
        ORDER BY e.term""",
)
def op_sketch_countmin_terms(spark, sf_dir):
    """Count-Min point queries for a fixed term set, reported against the
    exact counts (est_n >= true_n always; the overcount is the sketch's
    one-sided collision error). See module docstring for why this sketch
    — alone among the three — carries a hard DuckDB hash gate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens_col()).alias("tok"))
    rows = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), bucket(F.col("tok"), j).alias("b")
                    )
                    for j in range(DEPTH)
                ]
            )
        ).alias("e")
    ).select("e.j", "e.b")
    cells = rows.groupBy("j", "b").agg(F.count(F.lit(1)).alias("n"))

    # JVM literal relation — createDataFrame's python-RDD scan cost
    # ~0.6 s/scan under AQE (see lit_rows_df)
    qt = lit_rows_df(spark, [("term", "string")], [(t,) for t in CM_TERMS])
    qb = qt.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), bucket(F.col("term"), j).alias("b")
                    )
                    for j in range(DEPTH)
                ]
            )
        ).alias("e"),
    ).select("term", "e.j", "e.b")
    est = (
        F.broadcast(qb)
        .join(cells, ["j", "b"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_n"))
    )
    tru = (
        toks.filter(F.col("tok").isin(*CM_TERMS))
        .groupBy(F.col("tok").alias("term"))
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return (
        est.join(tru, "term", "left")
        .select(
            "term",
            F.coalesce("true_n", F.lit(0)).cast("bigint").alias("true_n"),
            F.col("est_n").cast("bigint").alias("est_n"),
        )
        .orderBy("term")
    )
