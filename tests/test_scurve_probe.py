"""bench._build_scurve_corpus: the truncation corpus must keep the
documents schema (the registry entry runs on it unchanged) and spread
exact Jaccard across the mid deciles — the whole point of the probe."""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq

import bench


def test_scurve_corpus_schema_and_decile_spread(tmp_path):
    # build into pytest's tmp dir so the unit test leaves nothing behind
    # in the repo root (the bench keeps its own .bench-scurve default)
    d = bench._build_scurve_corpus(
        "/root/testdata/sf0.001", dst_dir=str(tmp_path / "scurve")
    )
    src = pq.read_schema("/root/testdata/sf0.001/documents.parquet")
    got = pq.read_schema(f"{d}/documents.parquet")
    assert [f.name for f in got] == [f.name for f in src]
    assert got.field("doc_id").type == src.field("doc_id").type
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT doc_id) FROM "
        f"read_parquet('{d}/documents.parquet')"
    ).fetchone()
    expect = bench._SCURVE_BASE_DOCS * (1 + len(bench._SCURVE_KEEP_TWENTIETHS))
    assert n[0] == n[1] == expect
    # decile spread: exact token-shingle Jaccard between each base doc
    # and its variants must populate at least 6 distinct deciles
    from gravity_books_datalakehouse_spark.operators.text import SHINGLES_SQL

    # (restricted to same-base families — base doc + its 5 variants —
    # which is where the probe's mid-decile mass lives; the full
    # all-pairs check is the probe's own oracle comparison)
    off = con.execute(
        "SELECT MAX(doc_id) + 1 FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    deciles = con.execute(
        f"""WITH {SHINGLES_SQL},
        sets AS (SELECT doc_id, list(shingle) AS s, COUNT(*) AS l
                 FROM (SELECT * FROM shd) GROUP BY doc_id),
        pairs AS (
          SELECT LEAST(10 * len(list_intersect(a.s, b.s))
                       // (a.l + b.l - len(list_intersect(a.s, b.s))), 9)
                 AS dec
          FROM sets a JOIN sets b
            ON a.doc_id < b.doc_id
           AND a.doc_id % {off} = b.doc_id % {off})
        SELECT COUNT(DISTINCT dec) FROM pairs""".replace(
            "FROM documents",
            f"FROM read_parquet('{d}/documents.parquet')",
        )
    ).fetchone()[0]
    assert deciles >= 6
