"""Source formats: CSV/JSON with declared schemas + malformed-row modes."""

from __future__ import annotations

from gravity_books_datalakehouse_spark.sources.readers import read_csv, read_json


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("id,name,amt\n1,ann,2.5\n2,bob,9.0\n")
    df = read_csv(spark, str(p), "id int, name string, amt double")
    assert df.dtypes == [("id", "int"), ("name", "string"), ("amt", "double")]
    assert df.count() == 2


def test_read_csv_permissive_nulls_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,amt\n1,2.5\n2,notanumber\n")
    df = read_csv(spark, str(p), "id int, amt double")
    rows = {r.id: r.amt for r in df.collect()}
    assert rows[1] == 2.5 and rows[2] is None


def test_read_json_lines(spark, tmp_path):
    p = tmp_path / "e.jsonl"
    p.write_text('{"id": 1, "tags": ["a","b"]}\n{"id": 2, "tags": []}\n')
    df = read_json(spark, str(p), "id int, tags array<string>")
    rows = {r.id: r.tags for r in df.collect()}
    assert rows == {1: ["a", "b"], 2: []}


def test_orc_round_trip_with_partitioning(spark, tmp_path):
    from gravity_books_datalakehouse_spark.sources.readers import read_orc
    from gravity_books_datalakehouse_spark.sources.writers import overwrite_orc

    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)], "id int, grp string, v double"
    )
    path = str(tmp_path / "t.orc")
    overwrite_orc(src, path, partition_by=["grp"], coalesce=1)
    back = read_orc(spark, path)
    assert {(r.id, r.grp, r.v) for r in back.collect()} == {
        (1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)
    }
    # partition pruning: filtering on grp must not scan the other partition
    plan = back.filter(back.grp == "a")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(grp" in plan or "grp#" in plan


def test_read_text_lines_and_whole_file(spark, tmp_path):
    from gravity_books_datalakehouse_spark.sources.readers import read_text

    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("solo\n")
    lines = read_text(spark, str(p))
    assert lines.columns == ["value"]
    assert lines.count() == 3
    whole = read_text(spark, str(p), whole_file=True)
    texts = sorted(r.value for r in whole.collect())
    assert texts == ["line one\nline two\n", "solo\n"]


def test_testdata_schema_contract(spark):
    """Every testdata table loads; ``events.ts`` normalizes to TIMESTAMP.

    Regression guard for testdata drift: round 2's events.parquet changed
    its physical ts encoding (TIMESTAMP(NANOS) -> timestamp[us]) and broke
    12 queries + the whole bench at analysis time. This single test fails
    loudly on the next drift instead of 27 downstream failures.
    """
    import os

    import pytest
    from pyspark.sql.types import TimestampType

    from gravity_books_datalakehouse_spark.streaming.event_queries import load_events

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        path = f"{sf_dir}/{t}.parquet"
        assert os.path.exists(path), f"missing testdata table {t}"
        if t == "events":
            continue  # read via the adaptive loader below
        df = spark.read.parquet(path)
        assert len(df.schema.fields) > 0, t

    ev = load_events(spark, sf_dir)
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        f"events.ts must normalize to TimestampType, got {ev.schema['ts'].dataType}"
    )
    assert ev.limit(1).count() == 1
    # the native-encoding path must never set the legacy nanos flag
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"


def test_load_events_timestamp_nanos_fallback(spark, tmp_path):
    """A genuine TIMESTAMP(NANOS) parquet file must load AND execute.

    Regression for the round-3 advisory: the fallback used to restore
    ``nanosAsLong`` in a ``finally`` before any action ran, but Spark
    reads that conf again at physical-planning time, so the returned
    lazy DataFrame exploded with 'Illegal Parquet type' at first action.
    The flag now stays set for the session while nanos data is live;
    this test snapshots/restores it so the shared session stays clean
    for order-independent native-path tests.
    """
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from gravity_books_datalakehouse_spark.streaming.event_queries import load_events

    flag = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(flag, "false")
    d = tmp_path / "nanos_sf"
    d.mkdir()
    base = datetime.datetime(2024, 5, 1, 12, 0, 0)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "user_id": pa.array([10, 11, 10], type=pa.int64()),
            "event_type": pa.array(["click", "purchase", "click"]),
            "ts": pa.array(
                [base + datetime.timedelta(seconds=i) for i in range(3)],
                type=pa.timestamp("ns"),
            ),
            "value": pa.array([1.5, 2.5, 3.5], type=pa.float64()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"), version="2.6",
                   coerce_timestamps=None)
    # confirm the file really carries TIMESTAMP(NANOS) — otherwise the
    # test silently exercises the native path
    phys = pq.read_schema(str(d / "events.parquet")).field("ts").type
    assert phys == pa.timestamp("ns"), phys
    try:
        ev = load_events(spark, str(d))
        assert isinstance(ev.schema["ts"].dataType, TimestampType)
        rows = ev.orderBy("event_id").collect()  # the action that used to die
        assert len(rows) == 3
        assert rows[1].ts == base + datetime.timedelta(seconds=1)
    finally:
        spark.conf.set(flag, prior)


def test_parquet_schema_evolution_merge_read(spark, tmp_path):
    """Producer adds a column between generations: the merged read must
    expose the union schema, null-backfill old files, and keep pushdown."""
    from gravity_books_datalakehouse_spark.sources.readers import (
        read_parquet_evolving,
    )

    gen1 = str(tmp_path / "gen1")
    gen2 = str(tmp_path / "gen2")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(gen1)
    spark.createDataFrame(
        [(3, "c", 9.5), (4, "d", 7.25)], "id long, name string, score double"
    ).write.parquet(gen2)

    df = read_parquet_evolving(spark, gen1, gen2)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5), 4: ("d", 7.25)}

    # evolution must not break pushdown: id predicate reaches the scans
    plan = (
        df.filter(df.id > 2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,2)" in plan
