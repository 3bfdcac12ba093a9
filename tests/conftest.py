"""Shared fixtures: one SparkSession per test run, testdata dirs, and a
DuckDB-oracle comparator mirroring the driver's t2 differential check."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gravity_books_datalakehouse_spark.session import get_spark
from gravity_books_datalakehouse_spark.sources.catalog import TESTDATA_TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gravity-books-tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_CORRECT, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style normalization: columns sorted by name, rows sorted by
    all columns, floats rounded to 4 dp, everything stringified."""
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(4)
    out = out.astype(str)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def assert_matches_oracle(spark_df, duck: duckdb.DuckDBPyConnection, sql: str):
    """Order-insensitive value comparison Spark vs DuckDB (driver t2 mirror)."""
    got = normalize(spark_df.toPandas())
    want = normalize(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch:\n spark={list(got.columns)}\n duck ={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} duck={len(want)}"
    if not got.equals(want):
        diff = got.compare(want) if got.shape == want.shape else None
        raise AssertionError(f"value mismatch; first diffs:\n{diff.head(10) if diff is not None else '(shape)'}")
