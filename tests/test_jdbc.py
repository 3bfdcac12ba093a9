"""JDBC source/sink round trip (S1/S4) against embedded Derby.

Derby ships in Spark's jars, so the JDBC path is exercised for real:
append-write a frame (S4), read it back whole (S1), and read it back as
a parallel partitioned scan (the 100 TB extract shape)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.sources.readers import read_jdbc_table
from gravity_books_datalakehouse_spark.sources.writers import append_jdbc
from gravity_books_datalakehouse_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE

URL = "jdbc:derby:memory:graftdb;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_append_and_full_read_roundtrip(spark):
    src = load_table(spark, SF_SMOKE, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    append_jdbc(src, URL, "nation_rt", properties=PROPS)
    back = read_jdbc_table(spark, URL, "nation_rt", properties=PROPS)
    assert back.count() == src.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_jdbc_partitioned_parallel_read(spark):
    src = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    append_jdbc(src, URL, "orders_rt", properties=PROPS)
    lo, hi = src.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    back = read_jdbc_table(
        spark, URL, "orders_rt",
        properties=PROPS,
        partition_column="o_orderkey",
        lower_bound=int(lo), upper_bound=int(hi) + 1,
        num_partitions=4,
    )
    # really split into 4 concurrent range reads
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == src.count()
