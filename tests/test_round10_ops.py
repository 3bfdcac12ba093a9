"""Structural invariants for the round-10 batch-2 operators (the oracle
hash proves cross-engine equality; these pin the properties a matching
pair of wrong answers could still violate)."""

from __future__ import annotations

import math

import pytest

from gravity_books_datalakehouse_spark.operators.dedup import (
    _CAL_THEO,
    BAND_SIZE,
    NUM_PERM,
    dedup_lsh_s_curve_calibration,
)
from gravity_books_datalakehouse_spark.operators.packing import (
    pipeline_packing_efficiency_curve,
)
from gravity_books_datalakehouse_spark.plans.advanced_queries import (
    op_join_skew_diagnosis,
)

from tests.conftest import SF_SMOKE


def test_s_curve_theoretical_literals():
    # the literal table is the ONLY place the closed form lives (engine
    # pow() is never trusted across libms) — re-derive it here
    for k, t in enumerate(_CAL_THEO):
        m = (2 * k + 1) / 20.0
        assert t == round(1.0 - (1.0 - m**BAND_SIZE) ** NUM_PERM, 6)
    # the S-curve is monotone increasing in j
    assert list(_CAL_THEO) == sorted(_CAL_THEO)


def test_s_curve_rates_are_probabilities(spark):
    rows = dedup_lsh_s_curve_calibration(spark, SF_SMOKE).collect()
    assert rows, "sample produced no pairs"
    for r in rows:
        assert 0 <= r["n_candidates"] <= r["n_pairs"]
        assert 0.0 <= r["empirical_rate"] <= 1.0
        assert 0.0 <= r["mean_sig_agreement"] <= 1.0
        assert math.isclose(
            r["theoretical_rate"], _CAL_THEO[r["bucket_idx"]], abs_tol=1e-12
        )


def test_packing_curve_dominance(spark):
    rows = pipeline_packing_efficiency_curve(spark, SF_SMOKE).collect()
    assert [r["context_len"] for r in rows] == [512, 1024, 2048, 4096]
    for r in rows:
        # the packed stream can never use more sequences than chunk-pad
        assert r["seqs_packed"] <= r["seqs_chunked"]
        assert r["util_packed"] >= r["util_chunked"]
        # accounting identity: waste = capacity minus real tokens
        assert (
            r["pad_waste"]
            == r["seqs_chunked"] * r["context_len"] - r["total_tokens"]
        )
        assert 0.0 < r["util_packed"] <= 1.0


def test_skew_diagnosis_bounds(spark):
    rows = op_join_skew_diagnosis(spark, SF_SMOKE).collect()
    assert {r["key_col"] for r in rows} == {
        "events.user_id",
        "lineitem.l_suppkey",
    }
    for r in rows:
        assert r["p50_key_rows"] <= r["p99_key_rows"] <= r["max_key_rows"]
        assert 0.0 < r["top1_share"] <= r["top10_share"] <= 1.0
        # salt factor is ceil(max/avg) >= 1, and 1 iff perfectly uniform
        assert r["salt_factor"] >= 1
        assert r["skew_max_over_avg"] >= 1.0
        assert r["salt_factor"] == math.ceil(
            r["max_key_rows"] * r["n_keys"] / r["n_rows"]
        )
