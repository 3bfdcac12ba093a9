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
