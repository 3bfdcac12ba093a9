"""Versioned snapshots: time travel, rollback, schema evolution, vacuum."""

from __future__ import annotations

import pytest

from gravity_books_datalakehouse_spark.sources.snapshots import (
    latest_version,
    list_versions,
    read_snapshot,
    rollback,
    vacuum,
    write_snapshot,
)


@pytest.fixture
def table(tmp_path):
    return str(tmp_path / "tbl")


def test_time_travel_preserves_old_snapshots(spark, table):
    v1 = write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"), table)
    v2 = write_snapshot(spark.createDataFrame([(3, "c")], "id int, s string"), table)
    assert (v1, v2) == (1, 2)
    assert latest_version(table) == 2
    assert {r.id for r in read_snapshot(spark, table).collect()} == {3}
    assert {r.id for r in read_snapshot(spark, table, version=1).collect()} == {1, 2}


def test_orphan_version_dir_does_not_wedge_writes(spark, table):
    """A crash after a version directory materialized but before the
    pointer flip must not block subsequent writes: the next version is
    derived from max(retained, pointer), skipping the orphan."""
    import os

    write_snapshot(spark.createDataFrame([(1,)], "id int"), table)
    # simulate the crash: v=2 exists (fully written), pointer still at 1
    spark.createDataFrame([(99,)], "id int").write.parquet(
        os.path.join(table, "v=2")
    )
    assert latest_version(table) == 1
    v = write_snapshot(spark.createDataFrame([(3,)], "id int"), table)
    assert v == 3  # skipped the orphan, no errorifexists collision
    assert latest_version(table) == 3
    assert {r.id for r in read_snapshot(spark, table).collect()} == {3}
    # a stale staging dir from a crashed write is also tolerated
    os.makedirs(os.path.join(table, ".staging-v4"), exist_ok=True)
    assert write_snapshot(spark.createDataFrame([(4,)], "id int"), table) == 4


def test_merge_snapshot_upserts_and_is_idempotent(spark, table):
    from gravity_books_datalakehouse_spark.sources.snapshots import (
        merge_snapshot,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, s string, v double",
    )
    write_snapshot(base, table)
    updates = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "id int, s string, v double"
    )
    v = merge_snapshot(updates, table, ["id"])
    assert v == 2
    got = {r.id: (r.s, r.v) for r in read_snapshot(spark, table).collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 200.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    # re-merging the same updates commits a new version with identical
    # content (idempotent by value) and keeps history time-travelable
    v2 = merge_snapshot(updates, table, ["id"])
    assert v2 == 3
    got2 = {r.id: (r.s, r.v) for r in read_snapshot(spark, table).collect()}
    assert got2 == got
    assert {r.id for r in read_snapshot(spark, table, version=1).collect()} == {1, 2, 3}


def test_merge_snapshot_on_empty_table_bootstraps(spark, table):
    from gravity_books_datalakehouse_spark.sources.snapshots import (
        merge_snapshot,
    )

    updates = spark.createDataFrame([(1, "a")], "id int, s string")
    assert merge_snapshot(updates, table, ["id"]) == 1
    assert read_snapshot(spark, table).count() == 1


def test_rollback_repoints_without_touching_data(spark, table):
    write_snapshot(spark.createDataFrame([(1,)], "id int"), table)
    write_snapshot(spark.createDataFrame([(99,)], "id int"), table)  # bad load
    rollback(table, 1)
    assert latest_version(table) == 1
    assert [r.id for r in read_snapshot(spark, table).collect()] == [1]
    # the "bad" snapshot is still retained for forensics
    assert list_versions(table) == [1, 2]
    with pytest.raises(ValueError):
        rollback(table, 7)


def test_schema_evolution_with_merge_schema(spark, table):
    write_snapshot(spark.createDataFrame([(1, "a")], "id int, s string"), table)
    write_snapshot(
        spark.createDataFrame([(2, "b", 9.5)], "id int, s string, score double"),
        table,
    )
    evolved = read_snapshot(spark, table, merge_schema=True)
    assert set(evolved.columns) == {"id", "s", "score"}
    # old snapshot is untouched: still two columns
    old = read_snapshot(spark, table, version=1)
    assert set(old.columns) == {"id", "s"}


def test_vacuum_never_drops_pointer_target(spark, table):
    for i in range(4):
        write_snapshot(spark.createDataFrame([(i,)], "id int"), table)
    rollback(table, 2)
    removed = vacuum(table, keep_last=1)
    assert 2 not in removed  # pointer target survives
    assert latest_version(table) == 2
    assert [r.id for r in read_snapshot(spark, table).collect()] == [1]


def test_delete_where_drops_rows_and_keeps_history(spark, table):
    from gravity_books_datalakehouse_spark.sources.snapshots import delete_where

    v1 = write_snapshot(
        spark.createDataFrame(
            [(1, "keep"), (2, "gone"), (3, "keep"), (4, "gone")],
            "id int, s string",
        ),
        table,
    )
    v2, n = delete_where(spark, table, "s = 'gone'")
    assert (v1, v2, n) == (1, 2, 2)
    assert {r.id for r in read_snapshot(spark, table).collect()} == {1, 3}
    # logical delete: prior version still holds the rows until vacuum
    assert {r.id for r in read_snapshot(spark, table, version=v1).collect()} == {
        1, 2, 3, 4
    }
    vacuum(table, keep_last=1)
    assert list_versions(table) == [v2]


def test_delete_where_no_match_is_noop_version(spark, table):
    from gravity_books_datalakehouse_spark.sources.snapshots import delete_where

    write_snapshot(
        spark.createDataFrame([(1, "a")], "id int, s string"), table
    )
    v, n = delete_where(spark, table, "id = 99")
    assert n == 0
    assert {r.id for r in read_snapshot(spark, table).collect()} == {1}
    assert v == 2  # still a new committed version (audit trail)


def test_delete_where_null_predicate_keeps_row(spark, table):
    """SQL DELETE semantics: a NULL predicate must KEEP the row — a bare
    NOT(condition) would silently destroy NULL-bearing rows (round-4
    review repro)."""
    from gravity_books_datalakehouse_spark.sources.snapshots import delete_where

    write_snapshot(
        spark.createDataFrame(
            [(1, "gone"), (2, None), (3, "keep")], "id int, s string"
        ),
        table,
    )
    _, n = delete_where(spark, table, "s = 'gone'")
    assert n == 1
    assert {r.id for r in read_snapshot(spark, table).collect()} == {2, 3}


def test_snapshot_diff_oracle_and_semantics(spark, duck):
    """op_snapshot_diff: oracle parity plus the CDF bookkeeping — every
    base key is accounted for, inserts come only from the increment's
    post-cutoff keys, deletes only from the delete predicate."""
    from pyspark.sql import functions as F

    from gravity_books_datalakehouse_spark.plans.merge_queries import (
        _base, _increment, op_snapshot_diff,
    )
    from gravity_books_datalakehouse_spark.plans.operator_queries import (
        oracle_sql,
    )
    from gravity_books_datalakehouse_spark.sources.catalog import load_table
    from tests.conftest import SF_CORRECT, assert_matches_oracle

    df = op_snapshot_diff(spark, SF_CORRECT)
    assert_matches_oracle(df, duck, oracle_sql()["op_snapshot_diff"])

    counts = {r["change_type"]: r["n_rows"] for r in df.collect()}
    orders = load_table(spark, SF_CORRECT, "orders")
    n_base = _base(orders).count()
    inc_keys = _increment(orders).select("o_orderkey")
    n_inserted_expect = inc_keys.join(
        _base(orders).select("o_orderkey"), "o_orderkey", "left_anti"
    ).count()
    # deletes hit only merged keys with status M and key % 3 == 0; those
    # all come from the increment (it forces status M), minus inserted
    # ones that were deleted again
    assert counts["inserted"] + counts["deleted"] + counts.get(
        "updated", 0
    ) + counts.get("unchanged", 0) == n_base + n_inserted_expect - (
        # inserted-then-deleted keys appear in NEITHER side of the diff
        # except as 'inserted' rows missing: they were never in base and
        # are not in final, so the full outer join drops them entirely.
        inc_keys.filter(F.col("o_orderkey") % 3 == 0)
        .join(_base(orders).select("o_orderkey"), "o_orderkey", "left_anti")
        .count()
    )
    assert counts["deleted"] > 0 and counts["inserted"] > 0
    assert counts["updated"] > 0 and counts["unchanged"] > 0


def test_incremental_agg_maintenance_equals_full_recompute(spark):
    """The MV-maintenance correctness property: combining base + delta
    partial aggregates equals the full recompute, bit-for-bit (COUNT
    and the integer-cents SUM are commutative monoids)."""
    from gravity_books_datalakehouse_spark.plans.merge_queries import (
        op_incremental_agg_maintenance,
    )
    from gravity_books_datalakehouse_spark.plans.operator_queries import (
        _cents,
        _money_sum,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_CORRECT

    got = {
        r.month: (r.n_orders, r.total_price)
        for r in op_incremental_agg_maintenance(spark, SF_CORRECT).collect()
    }
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    full = {
        r.month: (r.n_orders, r.total_price)
        for r in o.select(
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month"),
            _cents("o_totalprice").alias("cents"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            _money_sum(F.col("cents"), 2).cast("double").alias("total_price"),
        )
        .collect()
    }
    assert got == full


def test_occ_concurrent_merges_both_land(spark, tmp_path):
    """Two writers merging DISJOINT key sets concurrently must both
    land (the loser rebases and retries) — the lost-update anomaly the
    single-writer merge_snapshot cannot rule out."""
    import threading

    from gravity_books_datalakehouse_spark.sources.snapshots import (
        merge_snapshot_occ,
        read_snapshot,
        write_snapshot,
    )

    d = str(tmp_path / "occ_tbl")
    base = spark.createDataFrame(
        [(i, "base") for i in range(10)], "k int, v string"
    )
    write_snapshot(base, d)

    errs = []

    def writer(lo, hi, tag):
        try:
            up = spark.createDataFrame(
                [(i, tag) for i in range(lo, hi)], "k int, v string"
            )
            merge_snapshot_occ(up, d, ["k"])
        except Exception as e:  # surfaced below
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(0, 3, "w1"))
    t2 = threading.Thread(target=writer, args=(5, 8, "w2"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs

    final = {r.k: r.v for r in read_snapshot(spark, d).collect()}
    assert len(final) == 10
    assert all(final[i] == "w1" for i in range(0, 3))
    assert all(final[i] == "w2" for i in range(5, 8))
    assert all(final[i] == "base" for i in (3, 4, 8, 9))


def test_occ_conflict_detected_and_retried(spark, tmp_path):
    """A writer whose base version moved underneath it must NOT commit
    a stale merge: with retries disabled it raises SnapshotConflict;
    with retries it rebases and preserves the interleaved write."""
    from gravity_books_datalakehouse_spark.sources import snapshots as sn

    d = str(tmp_path / "occ_conflict")
    sn.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "a")], "k int, v string"), d
    )

    # simulate an interleaved commit: monkeypatch latest_version so the
    # writer reads v1, another commit lands, then the writer validates
    real_latest = sn.latest_version
    state = {"fired": False}

    def racing_latest(table_dir):
        v = real_latest(table_dir)
        if not state["fired"]:
            state["fired"] = True
            # interleave a competing commit AFTER this writer reads v
            sn.write_snapshot(
                spark.createDataFrame([(2, "other")], "k int, v string"),
                table_dir,
            )
        return v

    sn.latest_version = racing_latest
    try:
        up = spark.createDataFrame([(1, "mine")], "k int, v string")
        try:
            sn.merge_snapshot_occ(up, d, ["k"], max_retries=1)
            raised = False
        except sn.SnapshotConflict:
            raised = True
        assert raised, "stale merge must not commit with max_retries=1"
    finally:
        sn.latest_version = real_latest

    # with retries the same merge rebases onto the interloper's commit
    v = sn.merge_snapshot_occ(
        spark.createDataFrame([(1, "mine")], "k int, v string"), d, ["k"]
    )
    final = {r.k: r.v for r in sn.read_snapshot(spark, d).collect()}
    assert final == {1: "mine", 2: "other"}, (v, final)


def test_stale_lock_from_crashed_writer_is_broken(tmp_path):
    """Round-12 ADVICE fix: a crashed writer's _COMMIT_LOCK older than
    the 300 s lease must be broken (the age check compares epoch clocks
    — time.time() vs mtime; the old monotonic-vs-epoch compare made the
    difference hugely negative so the break never fired and every later
    writer timed out)."""
    import os
    import time

    from gravity_books_datalakehouse_spark.sources import snapshots as sn

    d = str(tmp_path / "t")
    os.makedirs(d)
    lock = os.path.join(d, sn._LOCK)
    os.mkdir(lock)
    old = time.time() - sn._LOCK_STALE_SEC - 60
    os.utime(lock, (old, old))
    t0 = time.monotonic()
    got = sn._acquire_commit_lock(d, timeout=5.0)
    assert time.monotonic() - t0 < 2.0, "stale break must not wait out the timeout"
    assert got == lock and os.path.isdir(lock)
    os.rmdir(got)


def test_fresh_lock_is_not_broken(tmp_path):
    """A live writer's lock (fresh mtime) must make waiters time out,
    never be deleted from under the holder."""
    import os

    import pytest as _pytest

    from gravity_books_datalakehouse_spark.sources import snapshots as sn

    d = str(tmp_path / "t")
    os.makedirs(d)
    lock = os.path.join(d, sn._LOCK)
    os.mkdir(lock)
    with _pytest.raises(TimeoutError):
        sn._acquire_commit_lock(d, timeout=0.3)
    assert os.path.isdir(lock)


def test_occ_staging_cleaned_up_when_lock_times_out(spark, tmp_path):
    """Round-12 ADVICE fix: if the commit lock can't be acquired the
    staged .staging-occ-* directory must be removed, not leaked."""
    import os

    import pytest as _pytest

    from gravity_books_datalakehouse_spark.sources import snapshots as sn

    d = str(tmp_path / "t")
    sn.write_snapshot(
        spark.createDataFrame([(1, "a")], "k int, v string"), d
    )
    os.mkdir(os.path.join(d, sn._LOCK))  # a live (fresh) lock holder
    orig = sn._acquire_commit_lock
    sn._acquire_commit_lock = lambda table_dir, timeout=0.3: orig(
        table_dir, timeout=0.3
    )
    try:
        with _pytest.raises(TimeoutError):
            sn.merge_snapshot_occ(
                spark.createDataFrame([(2, "b")], "k int, v string"),
                d,
                ["k"],
                max_retries=1,
            )
    finally:
        sn._acquire_commit_lock = orig
        os.rmdir(os.path.join(d, sn._LOCK))
    leaked = [p for p in os.listdir(d) if p.startswith(".staging-occ-")]
    assert leaked == [], leaked
