"""Composed IVF-PQ report: arithmetic invariants the one-row oracle
hash can't localize when they break."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def row(spark):
    from gravity_books_datalakehouse_spark.operators.similarity import (
        sim_ivfpq_recall_report,
    )

    return sim_ivfpq_recall_report(spark, "/root/testdata/sf0.001").collect()[0]


def test_ivfpq_report_invariants(row):
    from gravity_books_datalakehouse_spark.operators.similarity import (
        _IVF_NPROBE,
        _IVF_K,
        _PQ_QUERIES,
        _PQ_TOPK,
    )

    assert row["n_true"] == _PQ_QUERIES * _PQ_TOPK
    assert 0 <= row["n_hits"] <= row["n_true"]
    assert abs(
        row["recall_at_5"] - round(row["n_hits"] / row["n_true"], 6)
    ) < 1e-9
    # candidate restriction really restricts: nprobe/k of the corpus in
    # expectation, never the whole corpus
    assert 0 < row["mean_candidates"] < row["n_vectors"] - 1
    assert abs(
        row["scanned_fraction"]
        - round(row["mean_candidates"] / (row["n_vectors"] - 1), 6)
    ) < 1e-9
    # with balanced lists the scanned share sits near nprobe/k; allow a
    # wide skew margin but catch an all-lists bug (fraction ~ 1)
    assert row["scanned_fraction"] < 4 * _IVF_NPROBE / _IVF_K
