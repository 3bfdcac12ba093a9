"""Bloom-prefilter invariants the oracle hash can't see.

The registry differential proves output equality with the plain
semi-join (trivially at sf0.01, where the corpus has zero exact dups);
these tests pin the bloom MECHANISM: no false negatives by
construction, a real positive path at sf0.1 (the testdata's 8 exact
dup groups, some split across the %5 ingest boundary), and a realized
false-positive rate in the neighbourhood of the (kn/m)^k expectation.
"""

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.operators.dedup import (
    _BLOOM_K,
    _BLOOM_M_BITS,
    _bloom_positions,
    dedup_bloom_prefilter,
)

SF01 = "/root/testdata/sf0.1"


def _fps(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", "source", F.md5(norm).alias("fp"))


def _bitset_and_tester(spark, corpus):
    rows = (
        corpus.select(
            F.explode(F.array(*_bloom_positions(F.col("fp")))).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (_BLOOM_M_BITS // 64)
    for r in rows:
        words[r["p"] >> 6] |= 1 << (r["p"] & 63)

    def member(df):
        probe = df
        for s, pc in enumerate(_bloom_positions(F.col("fp"))):
            probe = probe.withColumn(f"_p{s}", pc)
        lit_bits = "array(" + ",".join(
            f"{w - (1 << 64) if w >= (1 << 63) else w}L" for w in words
        ) + ")"
        cond = " AND ".join(
            f"((shiftright(_bits[CAST(_p{s} DIV 64 AS INT)], "
            f"CAST(_p{s} % 64 AS INT))) & 1) = 1"
            for s in range(_BLOOM_K)
        )
        return probe.withColumn("_bits", F.expr(lit_bits)).where(
            F.expr(cond)
        )

    return member


def test_no_false_negatives_and_positive_path(spark):
    fps = _fps(spark, SF01)
    corpus = fps.where(F.col("doc_id") % 5 != 0).select("fp").distinct()
    newb = fps.where(F.col("doc_id") % 5 == 0).select("source", "fp")
    member = _bitset_and_tester(spark, corpus)

    # (1) structural: every corpus fingerprint passes its own filter
    n_corpus = corpus.count()
    assert member(corpus).count() == n_corpus

    # (2) the registry op's totals equal the plain exact semi-join, and
    # the positive path fires at this scale
    got = {
        r.source: (r.n_new, r.n_dup)
        for r in dedup_bloom_prefilter(spark, SF01).collect()
    }
    plain = {
        r.source: r.n
        for r in newb.join(corpus, "fp", "leftsemi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(v for _, v in got.values()) > 0, "no positive path at sf0.1"
    for src, (_, n_dup) in got.items():
        assert n_dup == plain.get(src, 0)

    # (3) realized FP rate near theory: survivors - true dups over
    # genuinely-new docs, vs (k*n/m)^k with a loose 10x ceiling
    n_surv = member(newb).count()
    n_true = sum(plain.values())
    n_new = newb.count()
    fp_rate = (n_surv - n_true) / max(n_new - n_true, 1)
    expected = (_BLOOM_K * n_corpus / _BLOOM_M_BITS) ** _BLOOM_K
    assert fp_rate <= 10 * expected + 0.01, (fp_rate, expected)


def test_bloom_fpr_calibration_invariants(spark):
    """The calibration row's arithmetic identities and a loose binomial
    sanity band (realized within 5 sigma of predicted — md5 positions
    are effectively uniform, and the oracle hash pins exactness)."""
    import math

    from gravity_books_datalakehouse_spark.operators.dedup import (
        _BLOOM_CAL_K,
        _BLOOM_CAL_M,
        dedup_bloom_fpr_calibration,
    )

    rows = dedup_bloom_fpr_calibration(spark, SF01).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.m_bits == _BLOOM_CAL_M and r.k_hashes == _BLOOM_CAL_K
    assert 0 < r.n_set_bits <= min(_BLOOM_CAL_M, _BLOOM_CAL_K * r.n_corpus_fps)
    fill = r.n_set_bits / _BLOOM_CAL_M
    assert r.fill_rate == round(fill, 6)
    assert r.predicted_fpr == round(fill * fill * fill, 6)
    assert r.realized_fpr == round(r.n_false_positives / r.n_probes, 6)
    # binomial band: sd of the realized rate at the predicted p
    p = fill**3
    sd = math.sqrt(max(p * (1 - p), 1e-12) / r.n_probes)
    assert abs(r.realized_fpr - p) <= 5 * sd + 1e-9, (r.realized_fpr, p, sd)
