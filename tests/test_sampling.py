"""Hash-based sampling invariants: the properties RNG sampling lacks."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.plans.sampling_queries import (
    hash_fraction_hex,
    rate_threshold_hex,
)
from gravity_books_datalakehouse_spark.sources.catalog import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_thresholds_are_fixed_width_hex():
    assert rate_threshold_hex(0.10) == "1999"
    assert rate_threshold_hex(0.80) == "cccc"
    assert rate_threshold_hex(0.005) == "0147"  # keeps leading zero


def test_assignment_survives_repartitioning(spark):
    """The sample must be a pure function of doc_id: any physical layout
    (partition count, ordering) yields the identical kept-set — the
    property seeded df.sample() does NOT have."""
    d = load_table(spark, SF_SMOKE, "documents")
    thr = rate_threshold_hex(0.25)
    kept = lambda df: {  # noqa: E731
        r.doc_id
        for r in df.filter(hash_fraction_hex(F.col("doc_id")) < thr)
        .select("doc_id")
        .collect()
    }
    base = kept(d)
    assert kept(d.repartition(7)) == base
    assert kept(d.coalesce(1)) == base
    assert 0 < len(base) < d.count()


def test_assignment_matches_python_md5(spark):
    """Spark's md5-hex prefix equals hashlib's — the cross-engine anchor."""
    d = load_table(spark, SF_SMOKE, "documents").select("doc_id").limit(50)
    rows = d.withColumn("h", hash_fraction_hex(F.col("doc_id"))).collect()
    for r in rows:
        assert r.h == hashlib.md5(str(r.doc_id).encode()).hexdigest()[:4]


def test_split_is_disjoint_and_exhaustive(spark):
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        op_split_train_eval,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    out = op_split_train_eval(spark, SF_SMOKE)
    total = out.agg(F.sum("n_docs")).first()[0]
    assert total == d.count()  # every doc in exactly one split
    splits = {r.split for r in out.collect()}
    assert splits <= {"train", "val", "test"}


def test_weighted_ares_matches_python(spark):
    """Recompute the A-Res selection in pure python (hashlib md5 +
    math.log) and demand the identical top-50 set; also pin the length
    bias (weighted sample mean n_chars must exceed the corpus mean) and
    the O(k) plan shape (TakeOrderedAndProject, no exchange)."""
    import math

    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        _ARES_DENOM,
        _ARES_K,
        _ARES_NIBBLES,
        _ARES_SEED,
        op_sample_weighted_ares,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    keyed = []
    for r in docs:
        hx = hashlib.md5(f"{_ARES_SEED}:{r.doc_id}".encode()).hexdigest()
        m = int(hx[:_ARES_NIBBLES], 16)
        keyed.append((math.log((m + 0.5) / _ARES_DENOM) / r.n_chars, -r.doc_id, r))
    keyed.sort(reverse=True)
    want = {t[2].doc_id for t in keyed[:_ARES_K]}

    out = op_sample_weighted_ares(spark, SF_SMOKE)
    got_rows = out.collect()
    assert {r.doc_id for r in got_rows} == want
    assert len(got_rows) == _ARES_K

    corpus_mean = sum(r.n_chars for r in docs) / len(docs)
    sample_mean = sum(r.n_chars for r in got_rows) / len(got_rows)
    assert sample_mean > corpus_mean

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_stratified_weighted_ares_matches_python(spark):
    """Recompute the per-stratum A-Res draw in pure python (hashlib md5
    under the 'sares' seed + math.log, top-k per lang) and demand the
    identical kept set; pin exactly k rows per language, the
    within-stratum length bias, decorrelation from the global draw's
    seed, and the single-window plan shape (no TakeOrderedAndProject —
    the top-k lives in a lang-partitioned window, never a global
    funnel)."""
    import math
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        _ARES_DENOM,
        _ARES_NIBBLES,
        _ARES_SEED,
        _SARES_K_PER_STRATUM,
        _SARES_SEED,
        op_sample_stratified_weighted,
    )

    assert _SARES_SEED != _ARES_SEED  # decorrelated draws
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "n_chars"
    ).collect()
    by_lang: dict = defaultdict(list)
    for r in docs:
        hx = hashlib.md5(f"{_SARES_SEED}:{r.doc_id}".encode()).hexdigest()
        m = int(hx[:_ARES_NIBBLES], 16)
        key = math.log((m + 0.5) / _ARES_DENOM) / r.n_chars
        by_lang[r.lang].append((key, -r.doc_id, r))
    want = set()
    for lang, items in by_lang.items():
        items.sort(reverse=True)
        want |= {t[2].doc_id for t in items[:_SARES_K_PER_STRATUM]}

    out = op_sample_stratified_weighted(spark, SF_SMOKE)
    got_rows = out.collect()
    assert {r.doc_id for r in got_rows} == want
    per_lang = defaultdict(int)
    for r in got_rows:
        per_lang[r.lang] += 1
    for lang, items in by_lang.items():
        assert per_lang[lang] == min(_SARES_K_PER_STRATUM, len(items))

    # within-stratum length bias: pooled sample mean beats corpus mean
    corpus_mean = sum(r.n_chars for r in docs) / len(docs)
    sample_mean = sum(r.n_chars for r in got_rows) / len(got_rows)
    assert sample_mean > corpus_mean

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan  # per-stratum window, no funnel


def test_neyman_allocation_python_replay(spark):
    """Recompute the full Neyman pipeline in python — exact integer
    stratum stats, N_h*S_h weights, floor + largest-remainder seats,
    md5-order within-stratum draw — and demand the identical sample;
    pin sum(n_h) == k and that allocation favors bigger/more varied
    strata (n_h ordered like N_h*S_h)."""
    import math
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        _NEYMAN_K,
        op_sample_neyman,
    )

    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "lang", "n_chars")
        .collect()
    )
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append((r.doc_id, r.n_chars))
    weights = {}
    for lang, docs in by_lang.items():
        nh = len(docs)
        sx = sum(v for _, v in docs)
        sxx = sum(v * v for _, v in docs)
        weights[lang] = nh * math.sqrt((nh * sxx - sx * sx) / (nh * (nh - 1)))
    wt = sum(weights.values())
    shares = {l: _NEYMAN_K * w / wt for l, w in weights.items()}
    n_h = {l: int(math.floor(s)) for l, s in shares.items()}
    r = _NEYMAN_K - sum(n_h.values())
    for l in sorted(shares, key=lambda l: (-(shares[l] - math.floor(shares[l])), l))[:r]:
        n_h[l] += 1
    want = set()
    for lang, docs in by_lang.items():
        sel = sorted(
            docs, key=lambda t: (hashlib.md5(str(t[0]).encode()).hexdigest(), t[0])
        )[: n_h[lang]]
        want.update((d, lang) for d, _ in sel)
    got_rows = op_sample_neyman(spark, SF_SMOKE).collect()
    got = {(r.doc_id, r.lang) for r in got_rows}
    assert got == want
    assert len(got_rows) == _NEYMAN_K
    counts = defaultdict(int)
    for _, lang in got:
        counts[lang] += 1
    assert dict(counts) == n_h
    # monotone: seat order tracks weight order (up to the +-1 remainder)
    by_w = sorted(weights, key=weights.get)
    for a, b in zip(by_w, by_w[1:]):
        assert counts[a] <= counts[b] + 1


def test_source_holdout_python_replay(spark):
    """Group-hash replay: each source's split is md5(source) vs the
    0.8 threshold; every document inherits its source's split (leakage
    safety is structural), and the assignment is identical across
    scales because it depends only on the source string."""
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        _HOLDOUT_RATE,
        op_split_source_holdout,
        rate_threshold_hex,
    )

    thr = rate_threshold_hex(_HOLDOUT_RATE)
    got = {r.source: r for r in op_split_source_holdout(spark, SF_SMOKE).collect()}
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .count()
        .collect()
    )
    assert {r.source for r in docs} == set(got)
    for r in docs:
        want = (
            "train"
            if hashlib.md5(r.source.encode()).hexdigest()[:4] < thr
            else "eval"
        )
        assert got[r.source].split == want
        assert got[r.source].n_docs == r["count"]
    # both splits populated at the shipped rate on this source universe
    splits = {v.split for v in got.values()}
    assert splits == {"train", "eval"}


def test_bootstrap_ci_python_replay(spark):
    """Full deterministic replay: hash-derived Poisson(1) weights from
    the shared literal CDF, integer replica sums, and the discrete-
    percentile CI rule — every number must match exactly; also pin the
    statistical sanity (point mean strictly inside a positive-width
    CI)."""
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        _ARES_DENOM,
        _ARES_NIBBLES,
        _BOOT_B,
        _BOOT_CDF,
        _BOOT_WMAX,
        op_bootstrap_ci_mean_len,
    )

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "n_chars")
        .collect()
    )
    means = []
    for b in range(_BOOT_B):
        sw = swx = 0
        for r in docs:
            hx = hashlib.md5(f"boot:{b}:{r.doc_id}".encode()).hexdigest()
            u = (int(hx[:_ARES_NIBBLES], 16) + 0.5) / _ARES_DENOM
            w = _BOOT_WMAX
            for k, t in enumerate(_BOOT_CDF):
                if u < t:
                    w = k
                    break
            sw += w
            swx += w * r.n_chars
        means.append(swx / (1.0 * sw))
    means.sort()
    nb = len(means)
    ci_lo = round(next(m for i, m in enumerate(means, 1) if i * 40 >= nb), 6)
    ci_hi = round(
        next(m for i, m in enumerate(means, 1) if i * 40 >= 39 * nb), 6
    )
    row = op_bootstrap_ci_mean_len(spark, SF_SMOKE).collect()[0]
    assert row.n_replicas == _BOOT_B
    assert row.n_docs == len(docs)
    assert row.mean_len == round(sum(r.n_chars for r in docs) / len(docs), 6)
    assert row.ci_lo == ci_lo
    assert row.ci_hi == ci_hi
    assert row.ci_lo < row.mean_len < row.ci_hi
    assert row.ci_hi - row.ci_lo > 0


def test_time_embargo_guarantee(spark):
    """The property the hash can't articulate: every train row ends
    strictly before the cutoff, every eval row starts at or after the
    embargo end, and train+purged+eval partition the events exactly."""
    import __spark_entry__ as m
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        _EMBARGO_CUTOFF,
        _EMBARGO_END,
    )

    rows = m.queries()["op_split_time_embargo"](spark, SF_CORRECT).collect()
    by_split = {}
    for r in rows:
        by_split.setdefault(r.split, []).append(r)
    assert set(by_split) <= {"train", "purged", "eval"}
    assert max(r.ts_max for r in by_split["train"]) < _EMBARGO_CUTOFF
    assert min(r.ts_min for r in by_split["eval"]) >= _EMBARGO_END
    for r in by_split.get("purged", []):
        assert _EMBARGO_CUTOFF <= r.ts_min and r.ts_max < _EMBARGO_END
    total = sum(r.n_events for r in rows)
    n_all = spark.read.parquet(f"{SF_CORRECT}/events.parquet").count()
    assert total == n_all
