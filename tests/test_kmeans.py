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
