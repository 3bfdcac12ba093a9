"""Exact-dedup-first composition (round 10): the collapsed rep-level
pair graph must reproduce the doc-level consumers bit-for-bit.

The exactness lemma (operators/dedup.py, _cached_exact_groups): banded
minhash signatures are a function of the normalized text alone, so the
doc-level LSH pair relation factors through the exact-content
fingerprint — intra-group cliques plus group-cross products of
rep-level pairs. These tests pin the lemma empirically two ways:

1. on the real sf0.001 corpus (mostly multiplicity-1 groups — the
   degenerate case where collapsed == uncollapsed must hold trivially);
2. on a 3× verbatim-replicated corpus (every group multiplicity 3 —
   every doc-level pair group is a 3-clique or a 3×3 bipartite block),
   the adversarial shape the round-9 20× probe measured at 34–58 s
   per consumer on the uncollapsed path.

Plus the oracle-splice guard: _rep_minhash_sql() retargets the shingle
CTE with a textual replace of `FROM documents`; that string must occur
exactly once in _MINHASH_SQL or the splice silently desyncs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators import dedup
from gravity_books_datalakehouse_spark.operators.components import (
    dedup_clusters,
    dedup_clusters_connected_components,
)
from gravity_books_datalakehouse_spark.operators.dedup import (
    _MINHASH_SQL,
    dedup_minhash_lsh_pairs,
    dedup_pair_graph_compression,
    op_split_leakage_near_dup,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table

from tests.conftest import SF_SMOKE, normalize


def test_minhash_sql_single_documents_occurrence():
    # _rep_minhash_sql() retargets the band CTEs at the reps CTE with a
    # textual replace; more than one `FROM documents` would desync the
    # oracle from the Spark composition.
    assert _MINHASH_SQL.count("FROM documents") == 1


@pytest.fixture(scope="module")
def replicated_dir(spark, tmp_path_factory):
    """3× verbatim-replicated sf0.001 documents: copy i shifts doc_id by
    i * 10**9, text identical — every content group has multiplicity 3."""
    out = str(tmp_path_factory.mktemp("dup3"))
    docs = load_table(spark, SF_SMOKE, "documents")
    tripled = docs
    for i in (1, 2):
        tripled = tripled.unionByName(
            docs.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(i * 10**9)).cast("long")
            )
        )
    tripled.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    return out


def _doc_level_cc(spark, sf_dir):
    """The pre-round-10 uncollapsed path: CC straight over the doc-level
    LSH pair relation."""
    return dedup_clusters(dedup_minhash_lsh_pairs(spark, sf_dir))


def _doc_level_leakage(spark, sf_dir):
    """The pre-round-10 uncollapsed leakage rollup, reproduced inline."""
    from pyspark.sql import Window

    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        hash_fraction_hex,
    )

    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)

    def split_of(col):
        h = hash_fraction_hex(F.col(col), 4)
        return (
            F.when(h < dedup._LEAK_T80, "train")
            .when(h < dedup._LEAK_T90, "val")
            .otherwise("test")
        )

    cells = (
        pairs.select(
            F.least(split_of("doc_a"), split_of("doc_b")).alias("split_lo"),
            F.greatest(split_of("doc_a"), split_of("doc_b")).alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cells.select(
        "split_lo",
        "split_hi",
        "n_pairs",
        (F.col("split_lo") != F.col("split_hi")).alias("is_leakage"),
        F.round(
            F.col("n_pairs") * F.lit(1.0) / F.sum("n_pairs").over(w_all), 6
        ).alias("pair_share"),
    ).orderBy("split_lo", "split_hi")


def _assert_frames_equal(got_df, want_df):
    got, want = normalize(got_df.toPandas()), normalize(want_df.toPandas())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert got.equals(want)


@pytest.mark.parametrize("dir_fixture", ["smoke", "replicated"])
def test_composed_cc_equals_doc_level(spark, replicated_dir, dir_fixture):
    sf_dir = SF_SMOKE if dir_fixture == "smoke" else replicated_dir
    _assert_frames_equal(
        dedup_clusters_connected_components(spark, sf_dir),
        _doc_level_cc(spark, sf_dir),
    )


@pytest.mark.parametrize("dir_fixture", ["smoke", "replicated"])
def test_composed_leakage_equals_doc_level(spark, replicated_dir, dir_fixture):
    sf_dir = SF_SMOKE if dir_fixture == "smoke" else replicated_dir
    _assert_frames_equal(
        op_split_leakage_near_dup(spark, sf_dir),
        _doc_level_leakage(spark, sf_dir),
    )


def test_pair_graph_compression_counts(spark, replicated_dir):
    """n_doc_pairs from the multiplicity expansion == the materialized
    doc-level pair count, on the adversarial 3× corpus; and the collapse
    actually compresses (rep pairs < doc pairs when groups repeat)."""
    row = dedup_pair_graph_compression(spark, replicated_dir).collect()[0]
    n_doc_pairs = dedup_minhash_lsh_pairs(spark, replicated_dir).count()
    n_docs = load_table(spark, replicated_dir, "documents").count()
    assert row["n_docs"] == n_docs
    assert row["n_groups"] * 3 == n_docs
    assert row["n_doc_pairs"] == n_doc_pairs
    # every group is a 3-clique: at minimum C(3,2) * n_groups intra pairs
    assert row["n_doc_pairs"] >= 3 * row["n_groups"]
    assert row["n_rep_pairs"] < row["n_doc_pairs"]


def test_collapsed_cc_includes_edge_free_duplicate_groups(spark, replicated_dir):
    """A mult>=2 group with no rep-level near-dup edge is still a cluster
    (its copies pair with each other in the doc-level relation)."""
    cc = dedup_clusters_connected_components(spark, replicated_dir)
    sizes = cc.groupBy("cluster_rep").count()
    # every cluster on the 3x corpus holds all 3 copies of its groups
    assert sizes.where(F.col("count") % 3 != 0).isEmpty()
    assert not sizes.isEmpty()


def _doc_level_dbscan(spark, sf_dir):
    """Uncollapsed DBSCAN straight over the doc-level LSH pair relation
    (degree / core / core-core CC / min-label border), the semantics the
    rep-level composition in operators/components.py must reproduce."""
    from gravity_books_datalakehouse_spark.operators.components import (
        _DBSCAN_MIN_PTS,
        connected_components,
    )

    rp = dedup_minhash_lsh_pairs(spark, sf_dir)
    sym = rp.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionByName(
        rp.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    core = deg.where(F.col("degree") >= _DBSCAN_MIN_PTS).select("u")
    core_edges = rp.join(
        core.select(F.col("u").alias("doc_a")), "doc_a", "leftsemi"
    ).join(core.select(F.col("u").alias("doc_b")), "doc_b", "leftsemi")
    comp = connected_components(core_edges, "doc_a", "doc_b").select(
        F.col("id").alias("u"), "component"
    )
    core_lbl = core.join(comp, "u", "left").select(
        "u", F.coalesce("component", "u").alias("cluster")
    )
    border_lbl = (
        sym.join(core_lbl.select(F.col("u").alias("v"), "cluster"), "v")
        .join(core_lbl.select("u"), "u", "leftanti")
        .groupBy("u")
        .agg(F.min("cluster").alias("b_cluster"))
    )
    return (
        deg.join(core_lbl.withColumn("is_core", F.lit(True)), "u", "left")
        .join(border_lbl, "u", "left")
        .select(
            F.col("u").alias("doc_id"),
            F.coalesce("cluster", "b_cluster").alias("cluster_rep"),
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("b_cluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
        )
    )


@pytest.mark.parametrize("dir_fixture", ["smoke", "replicated"])
def test_composed_dbscan_equals_doc_level(spark, replicated_dir, dir_fixture):
    from gravity_books_datalakehouse_spark.operators.components import (
        dedup_dbscan_density_clusters,
    )

    sf_dir = SF_SMOKE if dir_fixture == "smoke" else replicated_dir
    _assert_frames_equal(
        dedup_dbscan_density_clusters(spark, sf_dir),
        _doc_level_dbscan(spark, sf_dir),
    )


def test_dbscan_bridge_does_not_fuse_clusters(spark):
    """The defining property over CC: two 4-cliques joined through one
    degree-2 bridge vertex stay two density clusters; the bridge is a
    border point of the min-labelled one."""
    from gravity_books_datalakehouse_spark.operators.components import (
        _DBSCAN_MIN_PTS,
        connected_components,
    )

    assert _DBSCAN_MIN_PTS == 3  # the geometry below assumes it
    cl_a = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    cl_b = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    bridge = [(4, 99), (99, 11)]
    edges = spark.createDataFrame(cl_a + cl_b + bridge, ["doc_a", "doc_b"])
    # CC fuses everything into one component rooted at 1
    cc = connected_components(edges, "doc_a", "doc_b")
    assert cc.select("component").distinct().count() == 1
    # DBSCAN (inline doc-level semantics on the same edge set)
    sym = edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionByName(
        edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    core = {r["u"] for r in deg.where(F.col("degree") >= _DBSCAN_MIN_PTS).collect()}
    assert 99 not in core  # the bridge is degree-2: never core
    assert core == {1, 2, 3, 4, 11, 12, 13, 14}
