"""Threshold-targeted LSH banding: parameter derivation is correct by the
S-curve math, and r>1 banded candidate generation is consistent with (a
subset of) single-row banding over the same signatures."""

from __future__ import annotations

import pytest

from gravity_books_datalakehouse_spark.operators.dedup import (
    banded_pairs,
    derive_lsh_params,
    lsh_collision_probability,
)
from gravity_books_datalakehouse_spark.operators.text import shingles


def test_derive_picks_closest_divisor_pair():
    # 16 perms, 0.5 target: thresholds are b16r1=.0625, b8r2=.354,
    # b4r4=.707, b2r8=.917, b1r16=1 — b8r2 is nearest.
    assert derive_lsh_params(16, 0.5) == (8, 2)
    # 128 perms, 0.8 target: b8r16 ((1/8)^(1/16)=.878) beats b16r8 (.707).
    assert derive_lsh_params(128, 0.8) == (8, 16)


def test_derive_invariants():
    for num_perm in (8, 16, 64, 128):
        for t in (0.2, 0.5, 0.8, 0.95):
            b, r = derive_lsh_params(num_perm, t)
            assert b * r == num_perm
            # no other divisor pair is strictly closer to the target
            chosen_err = abs((1 / b) ** (1 / r) - t)
            for r2 in range(1, num_perm + 1):
                if num_perm % r2 == 0:
                    b2 = num_perm // r2
                    assert chosen_err <= abs((1 / b2) ** (1 / r2) - t) + 1e-12


def test_derive_rejects_bad_target():
    with pytest.raises(ValueError):
        derive_lsh_params(16, 0.0)
    with pytest.raises(ValueError):
        derive_lsh_params(16, 1.5)


def test_collision_probability_scurve():
    b, r = 8, 2
    assert lsh_collision_probability(0.0, b, r) == 0.0
    assert lsh_collision_probability(1.0, b, r) == 1.0
    # monotone increasing in jaccard
    grid = [i / 20 for i in range(21)]
    probs = [lsh_collision_probability(j, b, r) for j in grid]
    assert all(p2 >= p1 for p1, p2 in zip(probs, probs[1:]))
    # steep around the derived threshold: well below → unlikely,
    # well above → near-certain
    thr = (1 / b) ** (1 / r)
    assert lsh_collision_probability(thr / 3, b, r) < 0.25
    assert lsh_collision_probability(min(1.0, thr * 2), b, r) > 0.9


@pytest.fixture(scope="module")
def doc_shingles(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy cat again and again"),
        (4, "completely different content with no shared phrases at all here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    return shingles(docs).persist()


def test_identical_docs_always_pair(spark, doc_shingles):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in banded_pairs(doc_shingles, 16, 2).collect()
    }
    assert (1, 2) in pairs            # identical text survives any banding
    assert not any(4 in p for p in pairs)  # disjoint text never pairs


def test_r2_pairs_subset_of_r1_pairs(spark, doc_shingles):
    # a 2-row band match requires both component rows to match, so every
    # r=2 candidate must also be an r=1 candidate over the same signatures
    r1 = {
        (r.doc_a, r.doc_b)
        for r in banded_pairs(doc_shingles, 16, 1).collect()
    }
    r2 = {
        (r.doc_a, r.doc_b)
        for r in banded_pairs(doc_shingles, 16, 2).collect()
    }
    assert r2 <= r1


def test_lsh_quality_report_invariants(spark):
    """Realized metrics are coherent: hits <= min(true, candidates);
    recall 1.0 on this corpus (planted near-dups >= 0.95 similarity sit
    far above the 8-band S-curve's 50% point); precision in (0, 1]."""
    import __spark_entry__ as m
    from tests.conftest import SF_CORRECT

    r = m.queries()["dedup_lsh_quality_report"](spark, SF_CORRECT).collect()[0]
    assert r.n_true_pairs > 0 and r.n_candidates > 0
    assert 0 <= r.n_hits <= min(r.n_true_pairs, r.n_candidates)
    assert r.recall == 1.0  # planted dups are near-identical
    assert 0.0 < r.precision <= 1.0
