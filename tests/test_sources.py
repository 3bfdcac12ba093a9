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
