"""applyInPandas grouped-map: per-label embedding centering."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.grouped_map import (
    center_embeddings_per_label,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_centered_embeddings_have_zero_mean_per_label(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    out = center_embeddings_per_label(e)
    assert out.count() == e.count()
    # per-label mean of centered vectors ~ 0
    rows = out.filter(F.col("label") == 0).select("centered").collect()
    mat = np.vstack([r.centered for r in rows])
    assert np.abs(mat.mean(axis=0)).max() < 1e-4


def test_distance_matches_local_numpy(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    out = {r.vec_id: r.dist_to_centroid
           for r in center_embeddings_per_label(e).collect()}
    local = e.select("vec_id", "label", "embedding").toPandas()
    for label, grp in local.groupby("label"):
        mat = np.vstack(grp["embedding"].to_numpy())
        cent = mat.mean(axis=0)
        d = np.linalg.norm(mat - cent, axis=1)
        for vid, dist in zip(grp["vec_id"], d):
            assert abs(out[vid] - dist) < 1e-6
