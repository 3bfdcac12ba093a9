"""SCD2 dimension builder + small-file compaction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.scd2 import build_scd2, lookup_at
from gravity_books_datalakehouse_spark.sources.compaction import (
    compact_parquet,
    table_file_stats,
)


def _changes(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        # key 1: two real changes + one no-op snapshot redelivery
        (1, "ann", "paris", t),
        (1, "ann", "paris", t + dt.timedelta(days=1)),   # no-op → collapsed
        (1, "ann", "berlin", t + dt.timedelta(days=10)),
        # key 2: single version
        (2, "bob", "rome", t),
    ]
    return spark.createDataFrame(
        rows, "customer_id int, name string, city string, change_ts timestamp"
    )


def test_scd2_versions_and_ranges(spark):
    dim = build_scd2(_changes(spark), "customer_id", ["name", "city"], "change_ts")
    rows = {(r.customer_id, r.version): r for r in dim.collect()}
    assert len(rows) == 3  # no-op snapshot collapsed
    v1, v2 = rows[(1, 1)], rows[(1, 2)]
    assert v1.city == "paris" and not v1.is_current
    assert v1.valid_to == v2.valid_from
    assert v2.city == "berlin" and v2.is_current and v2.valid_to is None
    assert rows[(2, 1)].is_current


def test_scd2_point_in_time_lookup(spark):
    dim = build_scd2(_changes(spark), "customer_id", ["name", "city"], "change_ts")
    at = lookup_at(dim, "customer_id", dt.datetime(2024, 1, 5))
    got = {r.customer_id: r.city for r in at.collect()}
    assert got == {1: "paris", 2: "rome"}


def test_scd2_equal_timestamp_changes_are_deterministic(spark):
    """Two change rows for the same key with identical timestamps (common
    in snapshot/CDC feeds) must produce the same versions every run — the
    window orderings carry an attribute-fingerprint tiebreaker."""
    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, "ann", "paris", t),
        (1, "ann", "lyon", t),   # same ts, different attrs
        (1, "ann", "berlin", t + dt.timedelta(days=1)),
    ]
    outs = []
    for n_parts in (1, 7):
        changes = spark.createDataFrame(
            rows, "customer_id int, name string, city string, change_ts timestamp"
        ).repartition(n_parts)
        dim = build_scd2(changes, "customer_id", ["name", "city"], "change_ts")
        outs.append(sorted(
            (r.version, r.city, r.valid_from, r.valid_to, r.is_current)
            for r in dim.collect()
        ))
    assert outs[0] == outs[1]
    # exactly one current version, the strictly-latest timestamp's row
    currents = [o for o in outs[0] if o[4]]
    assert len(currents) == 1 and currents[0][1] == "berlin"


def test_compaction_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(10_000).selectExpr("id", "id % 7 AS k").repartition(40).write.parquet(path)
    n_before, _ = table_file_stats(path)
    assert n_before >= 40
    before_rows = spark.read.parquet(path).count()
    b, a = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert a < b and a <= 2
    assert spark.read.parquet(path).count() == before_rows


def test_compaction_leaves_no_staging_dirs(spark, tmp_path):
    """The staging-then-swap protocol must clean up both the staging and
    the old directory on success (and tolerate leftovers from a crash)."""
    import os

    path = str(tmp_path / "frag2")
    spark.range(1000).repartition(10).write.parquet(path)
    # simulate a prior crashed compaction leaving a stale staging dir
    os.makedirs(path + ".compact-staging/junk", exist_ok=True)
    compact_parquet(spark, path, target_file_bytes=50 * 1024 * 1024)
    assert not os.path.exists(path + ".compact-staging")
    assert not os.path.exists(path + ".compact-old")
    assert spark.read.parquet(path).count() == 1000
