"""Count-Min sketch guarantees: one-sided error and the epsilon bound."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_countmin_never_undercounts_and_bounds_error(spark):
    from gravity_books_datalakehouse_spark.operators.countmin import (
        WIDTH, op_sketch_countmin_terms,
    )
    from gravity_books_datalakehouse_spark.operators.text import tokens_col
    from gravity_books_datalakehouse_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    rows = op_sketch_countmin_terms(spark, sf).collect()
    assert rows, "point queries returned nothing"
    n_total = (
        load_table(spark, sf, "documents")
        .select(F.explode(tokens_col()).alias("t"))
        .count()
    )
    for r in rows:
        # CM never undercounts...
        assert r.est_n >= r.true_n, r
        # ...and with depth 4 rows the expected overcount is ~N/WIDTH per
        # row; 4x that is a loose-but-meaningful ceiling for the min
        assert r.est_n - r.true_n <= max(4 * n_total // WIDTH, 1), r


def test_countmin_sketch_merges_across_partitions(spark):
    """The cell table must be partitioning-invariant (partial sketches
    merge associatively) — same estimates from a repartitioned corpus."""
    from gravity_books_datalakehouse_spark.operators.countmin import (
        op_sketch_countmin_terms,
    )

    sf = "/root/testdata/sf0.001"
    base = {(r.term, r.est_n) for r in op_sketch_countmin_terms(spark, sf).collect()}
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # force a different scan partitioning for the same data
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        again = {
            (r.term, r.est_n) for r in op_sketch_countmin_terms(spark, sf).collect()
        }
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert base == again
