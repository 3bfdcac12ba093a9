"""Hash-based sampling invariants: the properties RNG sampling lacks."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.sampling_queries import (
    hash_fraction_hex,
    rate_threshold_hex,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_thresholds_are_fixed_width_hex():
    assert rate_threshold_hex(0.10) == "1999"
    assert rate_threshold_hex(0.80) == "cccc"
    assert rate_threshold_hex(0.005) == "0147"  # keeps leading zero


def test_assignment_survives_repartitioning(spark):
    """The sample must be a pure function of doc_id: any physical layout
    (partition count, ordering) yields the identical kept-set — the
    property seeded df.sample() does NOT have."""
    d = load_table(spark, SF_SMOKE, "documents")
    thr = rate_threshold_hex(0.25)
    kept = lambda df: {  # noqa: E731
        r.doc_id
        for r in df.filter(hash_fraction_hex(F.col("doc_id")) < thr)
        .select("doc_id")
        .collect()
    }
    base = kept(d)
    assert kept(d.repartition(7)) == base
    assert kept(d.coalesce(1)) == base
    assert 0 < len(base) < d.count()


def test_assignment_matches_python_md5(spark):
    """Spark's md5-hex prefix equals hashlib's — the cross-engine anchor."""
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id").limit(50)
    rows = d.withColumn("h", hash_fraction_hex(F.col("doc_id"))).collect()
    for r in rows:
        assert r.h == hashlib.md5(str(r.doc_id).encode()).hexdigest()[:4]


def test_split_is_disjoint_and_exhaustive(spark):
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        op_split_train_eval,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    out = op_split_train_eval(spark, SF_SMOKE)
    total = out.agg(F.sum("n_docs")).first()[0]
    assert total == d.count()  # every doc in exactly one split
    splits = {r.split for r in out.collect()}
    assert splits <= {"train", "val", "test"}
