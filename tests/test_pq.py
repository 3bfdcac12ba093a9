"""Product-quantization distortion report: structural invariants the
one-row oracle hash can't localize when they break."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.similarity import (
    _PQ_K,
    _PQ_M,
    _PQ_QUERIES,
    _PQ_SUB,
    _PQ_TOPK,
    sim_pq_distortion_report,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def report(spark):
    return sim_pq_distortion_report(spark, SF_SMOKE).collect()[0]


def test_report_shape_and_bounds(report, spark):
    n_vec = load_table(spark, SF_SMOKE, "embeddings").count()
    assert report["pq_m"] == _PQ_M and report["pq_k"] == _PQ_K
    assert report["n_vectors"] == n_vec
    # distortion is a mean of squared distances: strictly >= 0, and > 0
    # unless every vector IS a codebook concatenation
    assert report["mse"] >= 0.0
    assert report["n_queries"] == _PQ_QUERIES
    assert report["n_true"] == min(_PQ_QUERIES, n_vec) * _PQ_TOPK
    assert 0 <= report["n_hits"] <= report["n_true"]
    assert 0.0 <= report[f"recall_at_{_PQ_TOPK}"] <= 1.0
    # 64 float32 lanes -> M one-byte codes
    assert report["compression_x"] == (_PQ_M * _PQ_SUB * 4) // _PQ_M


def test_codebook_vectors_reconstruct_exactly(spark):
    """The first K vectors ARE codebook entries in every subspace: their
    nearest sub-centroid is themselves (d2 = 0 exactly, argmin tiebreak
    or not), so their reconstruction must be bit-exact."""
    from gravity_books_datalakehouse_spark.operators.similarity import _dot

    e = load_table(spark, SF_SMOKE, "embeddings")
    slices = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice("embedding", m * _PQ_SUB + 1, _PQ_SUB).alias("svec"),
            )
            for m in range(_PQ_M)
        ]
    )
    sub = (
        e.select("vec_id", F.explode(slices).alias("x"))
        .select("vec_id", "x.m", "x.svec")
        .withColumn("s2", _dot("svec", "svec"))
    )
    cb = sub.where(F.col("vec_id") < _PQ_K).select(
        "m",
        F.col("vec_id").alias("cid"),
        F.col("svec").alias("cvec"),
        F.col("s2").alias("c2"),
    )
    d2 = F.col("s2") - F.lit(2.0) * _dot("svec", "cvec") + F.col("c2")
    best = (
        sub.where(F.col("vec_id") < _PQ_K)
        .join(F.broadcast(cb), "m")
        .select("vec_id", "m", "cid", d2.alias("d2"))
        .groupBy("vec_id", "m")
        .agg(F.min_by("cid", F.struct(F.col("d2"), F.col("cid"))).alias("code"))
    )
    # min distance is 0 at cid == vec_id; tie at 0 breaks to the LOWEST
    # cid, which can only be an exact duplicate subvector — either way
    # the reconstructed subvector is bit-identical, so d2 of the chosen
    # code must be exactly 0
    chosen = (
        best.join(
            cb.select("m", F.col("cid").alias("code"), "cvec", "c2"), ["m", "code"]
        )
        .join(sub.where(F.col("vec_id") < _PQ_K), ["vec_id", "m"])
        .select(
            (
                F.col("s2") - F.lit(2.0) * _dot("svec", "cvec") + F.col("c2")
            ).alias("d")
        )
    )
    assert chosen.where(F.abs(F.col("d")) > 1e-12).isEmpty()
