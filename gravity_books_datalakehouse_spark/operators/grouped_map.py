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
    # float64 math throughout: the float32 inputs are exact in double, so
    # the centroid/distance agree with any double-precision re-derivation
    # (DuckDB AVG, numpy) to the last few ulps — which is what lets the
    # registry variant's 5-dp rounded distance hash-match a SQL oracle.
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
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


@register(
    "mm_center_embeddings_per_label",
    """WITH ex AS (
         SELECT vec_id, label,
                CAST(unnest(embedding) AS DOUBLE) AS x,
                generate_subscripts(embedding, 1) AS i
         FROM embeddings),
       cent AS (
         SELECT label, i, AVG(x) AS m FROM ex GROUP BY label, i)
       SELECT e.vec_id, e.label,
              ROUND(SQRT(SUM((e.x - c.m) * (e.x - c.m))), 5)
                AS dist_to_centroid
       FROM ex e
       JOIN cent c ON e.label = c.label AND e.i = c.i
       GROUP BY e.vec_id, e.label
       ORDER BY e.vec_id""",
)
def mm_center_embeddings_per_label(spark, sf_dir):
    """Grouped-map normalization through the driver contract. The
    applyInPandas kernel computes per-label centering in float64
    (tests/test_grouped_map.py checks the full centered vectors against a
    local numpy oracle); the registry projection drops the list-valued
    ``centered`` column — the driver's pandas canonicalizer cannot sort
    list cells (CORRECTNESS_r04 TypeError) — and keeps the scalar
    ``dist_to_centroid``, which IS SQL-expressible: the DuckDB oracle
    re-derives it via positional explode + per-(label, idx) AVG, turning
    this entry from rows-only into a hash-verified row.

    Rounding-boundary risk (round-5 advisor note): the two engines sum
    in different orders (numpy pairwise mean/norm vs DuckDB sequential
    AVG/hash-agg SUM), so the doubles agree only to a few ulps (~1e-13
    relative); a distance landing within that drift of a rounding
    boundary would flip the last digit and break the hash. Rounded to
    5 dp (was 6) to widen the safety margin ~10x against values of
    order 0.1-10; the margin is data-dependent, not provable — if a
    future SF still lands on a boundary, drop to 4 dp."""
    out = center_embeddings_per_label(load_table(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id", "label", F.round("dist_to_centroid", 5).alias("dist_to_centroid")
    )


# --- Grouped-aggregate Pandas UDF (Arrow series -> scalar per group) ----
#
# The third Pandas boundary shape (alongside applyInPandas above and
# mapInPandas/mapInArrow in multimodal.py): a custom *aggregate* the
# built-ins lack, evaluated as one Arrow batch per group. Demonstrated
# with quantity-weighted average price — expressible in SQL too, which
# is exactly what makes it oracle-verifiable end-to-end.
#
# Scale notes: GROUPED_AGG ships each group's columns to Python as one
# in-memory Arrow batch — fine for bounded group counts (here: 3 return
# flags), wrong for billion-row groups. For those, decompose into
# partial aggregates (sum(x*w), sum(w)) natively and divide — Catalyst
# map-side-combines them; keep GROUPED_AGG for genuinely non-decomposable
# statistics (e.g. exact medians of modest groups).

from pyspark.sql import functions as F


def _make_udfs():
    # pandas_udf resolves its return type against the active session, so
    # the decorators must run lazily (module import happens before any
    # SparkSession exists in the driver contract).
    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float(np.average(price.to_numpy(), weights=qty.to_numpy()))

    # Spark disallows mixing GROUPED_AGG UDFs with native aggregates in
    # one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row count rides
    # along as a second tiny grouped-agg UDF.
    @F.pandas_udf("long")
    def group_size(qty: pd.Series) -> int:
        return int(len(qty))

    return weighted_avg, group_size


@register(
    "op_grouped_agg_weighted_avg",
    """SELECT l_returnflag,
              ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
                AS wavg_price,
              COUNT(*) AS n_lines
       FROM lineitem
       GROUP BY l_returnflag
       ORDER BY l_returnflag""",
)
def op_grouped_agg_weighted_avg(spark, sf_dir):
    """Quantity-weighted average extended price per return flag via a
    grouped-aggregate Pandas UDF (one shuffle on the group key; numpy
    computes the weighted mean per Arrow batch). Rounded to 4 dp on both
    engines — double accumulation order differs but the result agrees to
    far below the comparison precision."""
    li = load_table(spark, sf_dir, "lineitem")
    weighted_avg, group_size = _make_udfs()
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                weighted_avg(F.col("l_extendedprice"), F.col("l_quantity")), 4
            ).alias("wavg_price"),
            group_size(F.col("l_quantity")).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )
