"""Distributed PCA over the embedding column (beyond-reference, §2.8).

The scale-correct shape for covariance-based methods on n×d data with
small d: each partition reduces its Arrow batches to (count, sum-vector,
Gram matrix) — d + d² numbers — so the driver collects P metadata-sized
rows, never data. Eigendecomposition happens on the d×d covariance on
the driver (microseconds for d ≤ a few thousand), and the projection
matrix broadcasts back into a vectorized mapInPandas stage. Total cost:
one scan + one scan; zero shuffles; Python boundary is Arrow-batched
numpy both times.

Determinism: eigenvectors are sign-ambiguous, so each component is
flipped to make its largest-magnitude coordinate positive — projections
are then reproducible across runs/partitionings (pytest re-derives them
with a local numpy oracle; no SQL oracle, float eigenstructure is not
SQL-expressible).

Reference has no linear algebra at all; this extends the similarity
stack (operators/similarity.py) with the standard whitening step used
before ANN indexing and near-dup detection.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table


def _partition_stats(dim: int):
    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            n += mat.shape[0]
            s += mat.sum(axis=0)
            g += mat.T @ mat
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    return stats


def fit_pca(embeddings: DataFrame, dim: int, k: int):
    """(mean, components[k×d], explained_variance[k]) from one pass.

    The only driver-side materialization is the P×(d+d²) partial-stats
    table — metadata, not data (P = input partitions)."""
    parts = embeddings.select("embedding").mapInPandas(
        _partition_stats(dim), schema="n long, s array<double>, g array<double>"
    )
    rows = parts.collect()
    n = sum(r.n for r in rows)
    s = np.sum([np.array(r.s) for r in rows], axis=0)
    g = np.sum([np.array(r.g).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k×d
    # sign convention: largest-|coordinate| positive per component
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.maximum(evals[order], 0.0)


def pca_project(
    embeddings: DataFrame, dim: int, k: int, *, whiten: bool = False
) -> DataFrame:
    """Project (and optionally whiten) every embedding onto the top-k
    principal components. Two scans, zero shuffles."""
    mean, comps, evar = fit_pca(embeddings, dim, k)
    scale = 1.0 / np.sqrt(evar + 1e-12) if whiten else np.ones(k)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            proj = (mat - mean) @ comps.T * scale
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "proj": list(np.round(proj, 6).astype(float)),
                }
            )

    return embeddings.select("vec_id", "label", "embedding").mapInPandas(
        project, schema="vec_id long, label int, proj array<double>"
    )


@register("sim_pca_project", None)  # rows-only: eigenstructure, no SQL twin
def sim_pca_project(spark, sf_dir):
    """Top-8 PCA projection of the corpus embeddings through the driver
    contract (rows-only; tests/test_pca.py verifies the raw projections
    against a local numpy PCA oracle under the sign convention).

    The driver's pandas canonicalizer cannot sort list-valued cells
    (CORRECTNESS_r04: TypeError unhashable type 'list'), so this
    registry-facing variant projects the array to canon-safe scalars:
    a deterministic fingerprint of the full rounded vector (fixed %.6f
    formatting; +0.0 folds -0.0 so the digest is sign-stable) plus two
    scalar invariants (L2 norm, first principal component). The
    array-valued ``pca_project`` stays the library API."""
    proj = pca_project(load_table(spark, sf_dir, "embeddings"), dim=64, k=8)
    as_text = F.transform(
        F.col("proj"), lambda x: F.format_string("%.6f", x + F.lit(0.0))
    )
    return proj.select(
        "vec_id",
        "label",
        F.md5(F.concat_ws(",", as_text)).alias("proj_fp"),
        F.round(
            F.sqrt(F.aggregate("proj", F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("proj_norm"),
        F.round(F.element_at("proj", 1), 6).alias("pc1"),
    )
