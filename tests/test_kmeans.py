"""Lloyd refinement vs a numpy oracle with identical init/update rules."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _numpy_lloyd(vecs: np.ndarray, ids: np.ndarray, k: int, n_iter: int):
    """Reference Lloyd: init = k lowest ids, min-dist (ties -> lowest cid),
    empty cluster keeps previous centroid. Returns (labels, d2)."""
    order = np.argsort(ids)
    cents = vecs[order[:k]].astype(np.float64).copy()
    # init must be by vec_id < k, matching the operator
    cents = np.stack([vecs[ids == cid][0] for cid in range(k)]).astype(np.float64)
    for _ in range(n_iter):
        d2 = ((vecs[:, None, :].astype(np.float64) - cents[None, :, :]) ** 2).sum(2)
        labels = d2.argmin(1)  # argmin takes the lowest index on ties
        for cid in range(k):
            m = labels == cid
            if m.any():
                cents[cid] = vecs[m].astype(np.float64).mean(0)
    d2 = ((vecs[:, None, :].astype(np.float64) - cents[None, :, :]) ** 2).sum(2)
    labels = d2.argmin(1)
    return labels, d2.min(1)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = df.select("vec_id", "embedding").toPandas()
    ids = pdf.vec_id.to_numpy()
    vecs = np.stack(pdf.embedding.to_numpy()).astype(np.float32)
    return df, ids, vecs


def test_kmeans_matches_numpy_oracle(spark, emb):
    from gravity_books_datalakehouse_spark.operators.kmeans import (
        K, N_ITER, kmeans_refine,
    )

    df, ids, vecs = emb
    got = {
        int(r.vec_id): (int(r.cluster_id), float(r.d2))
        for r in kmeans_refine(spark, df).collect()
    }
    labels, d2 = _numpy_lloyd(vecs, ids, K, N_ITER)
    want = {int(i): (int(l), float(d)) for i, l, d in zip(ids, labels, d2)}
    assert set(got) == set(want)
    mismatched = [i for i in got if got[i][0] != want[i][0]]
    assert mismatched == []
    for i in got:
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-9, abs=1e-9)


def test_kmeans_refinement_reduces_inertia(spark, emb):
    """5 Lloyd sweeps must not produce higher inertia than 0 sweeps
    (assignment against the raw IVF init)."""
    from gravity_books_datalakehouse_spark.operators.kmeans import (
        kmeans_refine,
    )

    df, _, _ = emb
    refined = kmeans_refine(spark, df).agg(F.sum("d2")).collect()[0][0]
    init_only = kmeans_refine(spark, df, n_iter=0).agg(F.sum("d2")).collect()[0][0]
    assert refined <= init_only + 1e-9
    assert refined < init_only * 0.95  # and it actually moved


def test_semantic_dedup_oracle(spark, duck):
    from gravity_books_datalakehouse_spark.operators.kmeans import (
        _SEMANTIC_SQL, dedup_semantic_kmeans,
    )
    from tests.conftest import SF_CORRECT, assert_matches_oracle

    assert_matches_oracle(
        dedup_semantic_kmeans(spark, SF_CORRECT), duck, _SEMANTIC_SQL
    )


def test_semantic_dedup_invariants(spark):
    """Per-cluster bookkeeping: kept + dropped == members, dropped never
    exceeds pair count, and the cluster sizes add up to the corpus."""
    from gravity_books_datalakehouse_spark.operators.kmeans import (
        dedup_semantic_kmeans,
    )
    from tests.conftest import SF_CORRECT

    rows = dedup_semantic_kmeans(spark, SF_CORRECT).collect()
    n = spark.read.parquet(SF_CORRECT + "/embeddings.parquet").count()
    assert sum(r["n_members"] for r in rows) == n
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_members"]
        assert r["n_dropped"] <= r["n_dup_pairs"] or r["n_dup_pairs"] == 0
        assert 0 <= r["n_dropped"] < r["n_members"] or r["n_members"] == 0


def test_semantic_dedup_flags_planted_exact_duplicate(spark, tmp_path):
    """An exact duplicate vector MUST be flagged: identical embeddings
    land in the same cluster (identical distances, min-cid tie rule) and
    score cosine exactly 1.0 >= tau, so the larger id is dropped."""
    import os

    from pyspark.sql import functions as F

    from gravity_books_datalakehouse_spark.operators.kmeans import (
        dedup_semantic_kmeans,
    )
    from tests.conftest import SF_SMOKE

    e = spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    src = e.filter(F.col("vec_id") == 100).select(
        F.col("embedding").alias("dup_vec")
    )
    planted = e.crossJoin(F.broadcast(src)).select(
        "vec_id",
        F.when(F.col("vec_id") == 401, F.col("dup_vec"))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    alt = str(tmp_path / "alt")
    os.makedirs(alt)
    planted.write.parquet(os.path.join(alt, "embeddings.parquet"))

    rows = dedup_semantic_kmeans(spark, alt).collect()
    assert sum(r["n_dup_pairs"] for r in rows) >= 1
    assert sum(r["n_dropped"] for r in rows) >= 1
