"""Range clustering: per-file parquet stats must become narrow slivers."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.sources.catalog import load_table
from gravity_books_datalakehouse_spark.sources.clustering import cluster_write
from tests.conftest import SF_SMOKE


def _file_ranges(path, col):
    out = []
    for f in glob.glob(path + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return sorted(out)


def test_cluster_write_produces_narrow_file_ranges(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    domain = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    span = domain[1] - domain[0]

    clustered = str(tmp_path / "clustered")
    cluster_write(li, clustered, "l_orderkey", num_files=8)
    ranges = _file_ranges(clustered, "l_orderkey")
    assert len(ranges) >= 6
    # every clustered file covers a narrow sliver of the key domain...
    assert all((hi - lo) <= span / 3 for lo, hi in ranges)
    # ...and files are ordered, nearly non-overlapping slices
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo2 >= hi1  # range partitioning: disjoint key ranges

    # contrast: a random (round-robin) layout spans the whole domain per file
    shuffled = str(tmp_path / "shuffled")
    li.repartition(8).write.mode("overwrite").parquet(shuffled)
    wide = _file_ranges(shuffled, "l_orderkey")
    assert all((hi - lo) > span * 0.8 for lo, hi in wide)


def test_clustered_data_roundtrips(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "c2")
    cluster_write(li, path, "l_orderkey")
    assert spark.read.parquet(path).count() == li.count()


def test_zorder_write_skips_on_both_columns(spark, tmp_path):
    """Z-order: per-file footer ranges must be materially narrower than
    the domain on BOTH clustered columns — single-column range clustering
    can't do that for the second key."""
    from gravity_books_datalakehouse_spark.sources.clustering import zorder_write

    li = load_table(spark, SF_SMOKE, "lineitem")
    dom = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    span_o, span_p = dom[1] - dom[0], dom[3] - dom[2]

    zpath = str(tmp_path / "zorder")
    zorder_write(li, zpath, "l_orderkey", "l_partkey", num_files=16)
    ranges_o = _file_ranges(zpath, "l_orderkey")
    ranges_p = _file_ranges(zpath, "l_partkey")
    assert len(ranges_o) >= 8
    avg_o = sum(hi - lo for lo, hi in ranges_o) / len(ranges_o)
    avg_p = sum(hi - lo for lo, hi in ranges_p) / len(ranges_p)
    # each dimension's average per-file span is a fraction of the domain
    assert avg_o <= span_o * 0.6
    assert avg_p <= span_p * 0.6

    # contrast: range clustering on orderkey leaves partkey unclustered
    cpath = str(tmp_path / "single")
    cluster_write(li, cpath, "l_orderkey", num_files=16)
    wide_p = _file_ranges(cpath, "l_partkey")
    avg_wide_p = sum(hi - lo for lo, hi in wide_p) / len(wide_p)
    assert avg_wide_p > span_p * 0.8
    # and z-order beats it on the second column by a wide margin
    assert avg_p < avg_wide_p / 2


def test_zorder_roundtrips_all_rows(spark, tmp_path):
    from gravity_books_datalakehouse_spark.sources.clustering import zorder_write

    li = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "z2")
    zorder_write(li, path, "l_orderkey", "l_partkey")
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    assert set(back.columns) == set(li.columns)
