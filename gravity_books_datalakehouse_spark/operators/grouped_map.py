"""Grouped-map Pandas operators (applyInPandas) — per-group vectorized
kernels for semantics built-ins can't express (SURVEY.md §2.8 pattern c:
custom operator as Pandas-UDF-backed applyInPandas).

Example operator: per-label embedding centering (subtract the label
centroid) — the normalization step before per-cluster similarity search.
Each label's vectors arrive as one Arrow batch; numpy does the math.

Scale notes: applyInPandas shuffles by the grouping key once, then each
group is a local vectorized problem. Groups must fit in executor memory —
for billion-vector labels, switch to a two-pass form (centroids via
groupBy(avg), then a broadcast-join map stage). Skewed group sizes are the
same skew problem as joins: salt the key or pre-split giant groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

CENTERED_SCHEMA = (
    "vec_id long, label int, centered array<float>, dist_to_centroid double"
)


def _center_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mat = np.vstack(pdf["embedding"].to_numpy())
    centroid = mat.mean(axis=0)
    centered = mat - centroid
    return pd.DataFrame(
        {
            "vec_id": pdf["vec_id"],
            "label": pdf["label"],
            "centered": list(centered.astype(np.float32)),
            "dist_to_centroid": np.linalg.norm(centered, axis=1).astype(float),
        }
    )


def center_embeddings_per_label(embeddings: DataFrame) -> DataFrame:
    """Per-label centroid subtraction via applyInPandas (one shuffle on
    label, then local numpy)."""
    return embeddings.groupBy("label").applyInPandas(
        _center_group, schema=CENTERED_SCHEMA
    )


from gravity_books_datalakehouse_spark.plans.operator_queries import register
from gravity_books_datalakehouse_spark.sources.catalog import load_table


@register("mm_center_embeddings_per_label", None)  # rows-only: Python stage
def mm_center_embeddings_per_label(spark, sf_dir):
    """Grouped-map normalization through the driver contract (no SQL
    oracle — numpy float semantics; tests/test_grouped_map.py verifies
    against a local numpy oracle instead)."""
    return center_embeddings_per_label(load_table(spark, sf_dir, "embeddings"))
