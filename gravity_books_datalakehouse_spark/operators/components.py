"""Connected components — dedup cluster formation over candidate pairs.

Pairwise near-dup detection (operators/dedup.py) yields edges; curation
needs *clusters* (keep one representative per component). Components of
an undirected graph is inherently iterative — not expressible in one SQL
query — so this is the engine's iterative-algorithm pattern (SURVEY.md
§2.8 custom-operator rule: composition of DataFrame ops driven by a
convergence loop).

Algorithm: minimum-label propagation (a DataFrame port of the classic
large-star/small-star idea, simplified): every vertex starts labeled by
itself; each round every vertex takes the min label in its closed
neighborhood; stop when no label changes. Rounds = O(component
diameter) — near-dup clusters are small and dense, so convergence is
fast (2–3 rounds typical).

Scale discipline for iterative DataFrame jobs (the part that bites at
100 TB): each round ends in ``localCheckpoint()`` — without it, lineage
grows by one join per round and Catalyst re-analyzes an exponentially
nested plan; with it, each round starts from materialized partitions.
The convergence check is an ``isEmpty`` on the changed-labels anti-join,
not a full count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every vertex in ``edges``; component = min
    vertex id reachable. Raises if not converged within ``max_iter``."""
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    both = both.distinct().localCheckpoint()

    labels = (
        both.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )

    # convergence check: labels are monotonically non-increasing per
    # vertex, so sum(label) is strictly decreasing until the fixpoint —
    # one cheap aggregate per round instead of a join + isEmpty.
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            return labels.select("id", F.col("label").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(pairs: DataFrame, doc_a: str = "doc_a", doc_b: str = "doc_b") -> DataFrame:
    """Near-dup clusters from candidate pairs: (doc_id, cluster_rep) where
    cluster_rep = smallest doc_id in the component — the canonical
    'keep this one, drop the rest' assignment."""
    comps = connected_components(pairs, doc_a, doc_b)
    return comps.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_rep")
    )


from gravity_books_datalakehouse_spark.plans.operator_queries import register


@register("dedup_clusters_connected_components", None)  # rows-only: iterative
def dedup_clusters_connected_components(spark, sf_dir):
    """Near-dup cluster assignment over the MinHash+LSH pair graph. No SQL
    oracle — components is an iterative fixpoint (the driver records the
    rows-only check); tests/test_components.py verifies against a local
    union-find oracle instead."""
    from gravity_books_datalakehouse_spark.operators.dedup import (
        dedup_minhash_lsh_pairs,
    )

    return dedup_clusters(dedup_minhash_lsh_pairs(spark, sf_dir))
