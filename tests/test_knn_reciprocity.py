"""sim_knn_reciprocity vs a numpy replay on the real sample."""

from __future__ import annotations

import hashlib

import numpy as np


def test_knn_reciprocity_matches_numpy(spark):
    from gravity_books_datalakehouse_spark.operators.similarity import (
        _HUB_K,
        _HUB_NIBBLES,
        sim_knn_reciprocity,
    )
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        rate_threshold_hex,
    )

    sf = "/root/testdata/sf0.001"
    pdf = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
    )
    thr = rate_threshold_hex(0.10, _HUB_NIBBLES)
    keep = pdf.vec_id.map(
        lambda v: hashlib.md5(str(v).encode()).hexdigest()[:_HUB_NIBBLES] < thr
    )
    s = pdf[keep].reset_index(drop=True)
    vecs = np.stack(s.embedding.to_numpy()).astype(np.float64)
    ids = s.vec_id.to_numpy()
    nrm = np.linalg.norm(vecs, axis=1)
    cs = np.round((vecs @ vecs.T) / np.outer(nrm, nrm), 6)
    np.fill_diagonal(cs, -np.inf)
    edges = set()
    for i in range(len(ids)):
        # rank by (-cs, nid) — the rounded-6/id-tiebreak contract
        order = sorted(range(len(ids)), key=lambda j: (-cs[i, j], ids[j]))
        for j in order[:_HUB_K]:
            edges.add((int(ids[i]), int(ids[j])))
    mutual = sum(1 for a, b in edges if (b, a) in edges)
    row = sim_knn_reciprocity(spark, sf).collect()[0]
    assert row["n_vectors"] == len(ids)
    assert row["n_directed_edges"] == len(edges)
    assert row["n_mutual_edges"] == mutual
    assert abs(row["reciprocity_rate"] - round(mutual / len(edges), 6)) < 1e-9
    # diagnostic direction: mutual edges carry the higher similarity
    assert row["mean_cs_mutual"] > row["mean_cs_oneway"]
