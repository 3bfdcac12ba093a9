"""Lloyd k-means refinement over the embedding corpus (beyond-reference).

operators/similarity.py's IVF quantizer takes its k centroids verbatim
(lowest vec_ids) and notes "swap in k-means centroids at production
scale"; this module delivers that: classic Lloyd iterations (public
textbook algorithm) with the SAME deterministic init, so the refined
centroids drop straight into the IVF plans.

Distributed shape per iteration (the standard Spark k-means layout,
also what MLlib does under the hood):

- **assign**: broadcast the k×d centroid table against the corpus scan;
  ``min_by(cid, struct(dist, cid))`` under one groupBy(vec_id) collapses
  the k candidates map-side, so the shuffle carries one row per vector
  regardless of k (same idiom as similarity._ivf_assign).
- **update**: posexplode each assigned vector's dimensions and
  groupBy(cluster, dim) — partial aggregation reduces n×d rows to k×d
  per partition before the exchange.
- **model state**: the k×d centroid matrix lives on the driver between
  iterations (collect of k×d doubles — model-sized, like pca.py's P
  metadata rows; the corpus itself never leaves the executors).

Iteration count is FIXED (not convergence-tested): deterministic
output for the oracle, bounded cost, and in practice Lloyd's big gains
land in the first handful of sweeps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table

K = 16
N_ITER = 5


def sqdist(a: str, b: str) -> Column:
    """Σ (aᵢ-bᵢ)² as an in-order double fold (portable, JVM codegen)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(e: DataFrame, cdf: DataFrame) -> DataFrame:
    """(vec_id, vec, cluster_id): nearest centroid per vector, one
    shuffled row per vector (see module docstring)."""
    scored = e.crossJoin(F.broadcast(cdf)).select(
        "vec_id", "embedding", "cid", sqdist("embedding", "cvec").alias("d2")
    )
    return scored.groupBy("vec_id").agg(
        F.first("embedding").alias("embedding"),
        F.min_by("cid", F.struct(F.col("d2"), F.col("cid"))).alias("cluster_id"),
        F.min(F.struct(F.col("d2"), F.col("cid"))).getField("d2").alias("d2"),
    )


def kmeans_refine(
    spark: SparkSession, e: DataFrame, k: int = K, n_iter: int = N_ITER
) -> DataFrame:
    """Refine the deterministic-init centroids with ``n_iter`` Lloyd
    sweeps; returns the final per-vector assignment (vec_id, cluster_id,
    d2). Empty clusters keep their previous centroid (the standard
    degenerate-case rule, and what the numpy oracle in tests does)."""
    cents = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .collect()
    }

    def cdf():
        return spark.createDataFrame(
            [(cid, vec) for cid, vec in sorted(cents.items())],
            "cid int, cvec array<double>",
        )

    assign = None
    for _ in range(n_iter):
        assign = _assign(e, cdf())
        sums = (
            assign.select("cluster_id", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("cluster_id", "dim")
            .agg(
                F.sum(F.col("x").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        by_cluster: dict[int, dict[int, tuple[float, int]]] = {}
        for r in sums.collect():  # k×d rows — model state, not data
            by_cluster.setdefault(int(r.cluster_id), {})[int(r.dim)] = (
                float(r.s), int(r.n),
            )
        for cid, dims in by_cluster.items():
            cents[cid] = [
                dims[d][0] / dims[d][1] for d in range(len(dims))
            ]
    # final assignment against the last updated centroids
    return _assign(e, cdf())


@register("sim_kmeans_refine", None)  # rows-only: iterative (driver model state)
def sim_kmeans_refine(spark, sf_dir):
    """Per-cluster size and inertia after 5 Lloyd sweeps from the IVF
    init. No SQL oracle — k-means is an iterative fixpoint (the driver
    records the rows-only check); tests/test_kmeans.py verifies against
    a numpy Lloyd oracle with the identical init and update rules, and
    that refinement never increases total inertia."""
    e = load_table(spark, sf_dir, "embeddings")
    final = kmeans_refine(spark, e)
    return (
        final.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.sum("d2"), 3).alias("inertia"),
        )
        .orderBy("cluster_id")
    )
