"""Distributed PCA vs a local numpy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from gravity_books_datalakehouse_spark.operators.pca import fit_pca, pca_project
from gravity_books_datalakehouse_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def _local(spark, sf_dir):
    pdf = load_table(spark, sf_dir, "embeddings").toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    return pdf, mat


def _numpy_pca(mat, k):
    mean = mat.mean(axis=0)
    cov = np.cov(mat.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


class TestPCA:
    def test_fit_matches_numpy(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        mean, comps, evar = fit_pca(emb, dim=64, k=8)
        _, mat = _local(spark, SF_SMOKE)
        mean2, comps2, evar2 = _numpy_pca(mat, 8)
        np.testing.assert_allclose(mean, mean2, atol=1e-9)
        np.testing.assert_allclose(evar, evar2, atol=1e-7)
        # eigh of nearly-degenerate eigenvalues can permute components;
        # compare the projector they span instead of raw vectors
        np.testing.assert_allclose(
            comps.T @ comps, comps2.T @ comps2, atol=1e-6
        )

    def test_projection_matches_numpy(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        got = pca_project(emb, dim=64, k=8).toPandas().set_index("vec_id")
        pdf, mat = _local(spark, SF_SMOKE)
        mean, comps, _ = _numpy_pca(mat, 8)
        want = np.round((mat - mean) @ comps.T, 6)
        got_mat = np.vstack(got.loc[pdf["vec_id"]]["proj"].to_numpy())
        np.testing.assert_allclose(got_mat, want, atol=1e-5)

    def test_projection_is_partition_invariant(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        a = pca_project(emb.coalesce(1), dim=64, k=4).toPandas()
        b = pca_project(emb.repartition(13), dim=64, k=4).toPandas()
        a = a.sort_values("vec_id").reset_index(drop=True)
        b = b.sort_values("vec_id").reset_index(drop=True)
        for x, y in zip(a["proj"], b["proj"]):
            np.testing.assert_allclose(x, y, atol=1e-9)

    def test_whiten_unit_variance(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        proj = pca_project(emb, dim=64, k=4, whiten=True).toPandas()
        mat = np.vstack(proj["proj"].to_numpy())
        np.testing.assert_allclose(mat.var(axis=0), 1.0, atol=1e-2)
