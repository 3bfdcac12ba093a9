"""sim_silhouette_by_label vs a numpy oracle, on real and constructed data.

The constructed corpus is the semantic check the near-random driver
embeddings cannot give: three well-separated Gaussian blobs must score
near +1, and a deliberately mislabeled point must go negative.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


def _numpy_silhouette(vecs: np.ndarray, labels: np.ndarray):
    """Simplified silhouette per label, float64, matching the operator's
    definition: a = dist to own label centroid (point included),
    b = min dist to any other label centroid, s = (b-a)/max(a,b)."""
    labs = np.unique(labels)
    cents = np.stack(
        [vecs[labels == l].astype(np.float64).mean(0) for l in labs]
    )
    d = np.sqrt(
        ((vecs[:, None, :].astype(np.float64) - cents[None, :, :]) ** 2).sum(2)
    )
    own_idx = np.searchsorted(labs, labels)
    a = d[np.arange(len(vecs)), own_idx]
    dm = d.copy()
    dm[np.arange(len(vecs)), own_idx] = np.inf
    b = dm.min(1)
    mx = np.maximum(a, b)
    s = np.where(mx == 0, 0.0, (b - a) / mx)
    out = {}
    for l in labs:
        m = labels == l
        out[int(l)] = (int(m.sum()), a[m].mean(), b[m].mean(), s[m].mean())
    return out


def _write_embeddings(spark, tmp_path_factory, ids, vecs, labels):
    out = str(tmp_path_factory.mktemp("silh"))
    rows = [
        (int(i), [float(x) for x in v], int(l))
        for i, v, l in zip(ids, vecs, labels)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    return out


def test_silhouette_matches_numpy_on_real_corpus(spark):
    from gravity_books_datalakehouse_spark.operators.similarity import (
        sim_silhouette_by_label,
    )

    sf = "/root/testdata/sf0.001"
    pdf = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "embedding", "label")
        .toPandas()
    )
    vecs = np.stack(pdf.embedding.to_numpy()).astype(np.float32)
    want = _numpy_silhouette(vecs, pdf.label.to_numpy())
    got = {
        int(r.label): (
            int(r.n_vecs),
            float(r.mean_intra),
            float(r.mean_nearest_other),
            float(r.mean_silhouette),
        )
        for r in sim_silhouette_by_label(spark, sf).collect()
    }
    assert set(got) == set(want)
    for l in want:
        assert got[l][0] == want[l][0]
        for gi, wi in zip(got[l][1:], want[l][1:]):
            assert abs(gi - wi) < 1e-9, (l, got[l], want[l])


def test_silhouette_semantics_on_separated_blobs(spark, tmp_path_factory):
    from gravity_books_datalakehouse_spark.operators.similarity import (
        sim_silhouette_by_label,
    )

    rng = np.random.RandomState(7)
    centers = np.array([[0.0] * 8, [50.0] * 8, [-50.0, 50.0] * 4])
    vecs, labels = [], []
    for l, c in enumerate(centers):
        vecs.append(c + rng.randn(30, 8))
        labels.extend([l] * 30)
    vecs = np.concatenate(vecs).astype(np.float32)
    labels = np.array(labels)
    # one deliberate mislabel: a blob-1 point tagged label 0
    labels = labels.copy()
    labels[30] = 0
    sf = _write_embeddings(
        spark, tmp_path_factory, np.arange(len(labels)), vecs, labels
    )
    rows = {
        int(r.label): r for r in sim_silhouette_by_label(spark, sf).collect()
    }
    # tight, far-apart blobs: mean silhouette well above 0.9 for the
    # clean labels; the mislabeled point drags label 0 down but the
    # label mean stays strongly positive (1 of 31 points)
    assert rows[1]["mean_silhouette"] > 0.9
    assert rows[2]["mean_silhouette"] > 0.9
    assert 0.5 < rows[0]["mean_silhouette"] < rows[1]["mean_silhouette"]
    # and the numpy oracle agrees on the constructed corpus too
    want = _numpy_silhouette(vecs, labels)
    for l, r in rows.items():
        assert abs(float(r.mean_silhouette) - want[l][3]) < 1e-9
