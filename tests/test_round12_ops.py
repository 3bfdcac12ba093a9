"""Round-12 operators: Markov removal-effect attribution and the
per-day HLL register merge, each against an independent local replay."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _journeys(pdf: pd.DataFrame) -> list[list[str]]:
    """Replay the pinned 30-minute session rule + journey construction
    (START -> touches before first purchase -> CONV/NOCONV) in pandas."""
    pdf = pdf.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    out: list[list[str]] = []
    for _, grp in pdf.groupby("user_id"):
        cur: list[str] = []
        prev_ts = None
        sessions: list[list[str]] = []
        for _, r in grp.iterrows():
            if prev_ts is not None and (
                (r.ts - prev_ts).total_seconds() > 1800
            ):
                sessions.append(cur)
                cur = []
            cur.append(r.event_type)
            prev_ts = r.ts
        sessions.append(cur)
        for s in sessions:
            if "purchase" in s:
                cut = s.index("purchase")
                out.append(["START"] + s[:cut] + ["CONV"])
            else:
                out.append(["START"] + s + ["NOCONV"])
    return out


def test_markov_attribution_matches_python_replay(spark):
    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _ATTR_K,
        ev_markov_attribution,
        load_events,
    )

    pdf = load_events(spark, SF_SMOKE).select(
        "user_id", "ts", "event_id", "event_type"
    ).toPandas()
    tm: dict[tuple[str, str], int] = {}
    for j in _journeys(pdf):
        for a, b in zip(j, j[1:]):
            tm[(a, b)] = tm.get((a, b), 0) + 1
    row_tot: dict[str, int] = {}
    for (f, _), n in tm.items():
        row_tot[f] = row_tot.get(f, 0) + n
    pr = {k: n / row_tot[k[0]] for k, n in tm.items()}
    states = sorted(
        {f for f, _ in pr} | {t for _, t in pr} | {"CONV", "NOCONV"}
    )

    def absorb(prm):
        v = {s: (1.0 if s == "CONV" else 0.0) for s in states}
        for _ in range(_ATTR_K):
            acc: dict[str, float] = {}
            for (f, t), p in sorted(prm.items()):
                acc[f] = acc.get(f, 0.0) + p * v.get(t, 0.0)
            v = {
                s: 1.0
                if s == "CONV"
                else 0.0 if s == "NOCONV" else acc.get(s, 0.0)
                for s in states
            }
        return v["START"]

    pb = absorb(pr)
    channels = sorted(
        s for s in states if s not in ("START", "CONV", "NOCONV")
    )
    eff = {}
    for c in channels:
        prm: dict = {}
        for (f, t), p in pr.items():
            if f == c:
                continue
            key = (f, "NOCONV" if t == c else t)
            prm[key] = prm.get(key, 0.0) + p
        eff[c] = 1.0 - absorb(prm) / pb
    tot = sum(eff.values())
    got = {
        r.channel: r for r in ev_markov_attribution(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(channels)
    for c in channels:
        assert got[c].n_transitions_from == row_tot.get(c, 0)
        assert abs(got[c].p_conv_base - round(pb, 6)) < 1e-9
        assert abs(got[c].removal_effect - round(eff[c], 6)) < 1e-9
        assert abs(got[c].attribution_share - round(eff[c] / tot, 6)) < 1e-9
    # removal can only cut paths: effects in [0, 1], shares sum to ~1
    shares = [got[c].attribution_share for c in channels]
    assert all(0.0 <= got[c].removal_effect <= 1.0 for c in channels)
    assert abs(sum(shares) - 1.0) < 1e-5


def test_hll_merge_days_identity_and_estimate(spark):
    """The register-wise day merge must be IDENTICAL to the direct
    whole-corpus build (associativity of max — witnessed by the
    mismatch column) and therefore reproduce op_sketch_hll_distinct's
    scaled harmonic sum and estimate exactly."""
    from gravity_books_datalakehouse_spark.operators.sketches import (
        op_sketch_hll_distinct,
        op_sketch_hll_merge_days,
    )

    merged = {
        r.event_type: r
        for r in op_sketch_hll_merge_days(spark, SF_SMOKE).collect()
    }
    direct = {
        r.event_type: r
        for r in op_sketch_hll_distinct(spark, SF_SMOKE).collect()
    }
    assert set(merged) == set(direct)
    for t, m in merged.items():
        assert m.n_register_mismatches == 0
        assert m.n_days >= 1
        assert m.sum_scaled == direct[t].sum_scaled
        assert m.n_zero_registers == direct[t].n_zero_registers
        assert abs(m.merged_hll_estimate - direct[t].raw_hll_estimate) < 1e-12
        assert m.exact_distinct == direct[t].exact_distinct


def test_attribution_models_conserve_total_credit(spark):
    """Each model distributes exactly one unit of credit per converting
    journey with >= 1 touch, so every model column must sum to the same
    total: the number of such journeys (replayed in pandas)."""
    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        ev_attribution_models,
        load_events,
    )

    pdf = load_events(spark, SF_SMOKE).select(
        "user_id", "ts", "event_id", "event_type"
    ).toPandas()
    n_journeys = sum(
        1
        for j in _journeys(pdf)
        if j[-1] == "CONV" and len(j) > 2  # START + >=1 touch + CONV
    )
    rows = ev_attribution_models(spark, SF_SMOKE).collect()
    assert rows
    for model in (
        "first_touch", "last_touch", "linear", "position_based", "time_decay"
    ):
        tot = sum(getattr(r, model) for r in rows)
        assert abs(tot - n_journeys) < 1e-4, (model, tot, n_journeys)
    assert sum(r.n_touches for r in rows) > n_journeys  # multi-touch exists


def test_matryoshka_identity_row_and_bounds(spark):
    """The d=64 row ranks by the full cosine, so its recall must be
    exactly 1.0 and its mean full cosine must equal the true top-k
    mean (replayed in numpy); every other row's recall lies in [0, 1]
    and its served quality can't exceed the full ranking's."""
    import numpy as np

    from gravity_books_datalakehouse_spark.operators.similarity import (
        _TOPK,
        _TOPK_QUERIES,
        sim_matryoshka_truncation,
    )
    from gravity_books_datalakehouse_spark.sources.catalog import load_table

    rows = {r.dim: r for r in sim_matryoshka_truncation(spark, SF_SMOKE).collect()}
    assert set(rows) == {8, 16, 32, 64}
    full = rows[64]
    assert full.recall_at_k == 1.0
    for d, r in rows.items():
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.mean_full_cos_of_topk <= full.mean_full_cos_of_topk + 1e-9
        assert r.n_queries == full.n_queries
    # numpy replay of the d=64 anchor
    pdf = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    ).toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=float) for _, r in pdf.iterrows()}
    qids = sorted(v for v in vecs if v < _TOPK_QUERIES)
    tot = 0.0
    for q in qids:
        qa = vecs[q]
        sims = sorted(
            (
                (float(qa @ v / (np.linalg.norm(qa) * np.linalg.norm(v))), n)
                for n, v in vecs.items()
                if n != q
            ),
            key=lambda p: (-p[0], p[1]),
        )[: _TOPK]
        tot += sum(s for s, _ in sims)
    want = tot / (len(qids) * _TOPK)
    assert abs(full.mean_full_cos_of_topk - want) < 1e-5


def test_autocorrelation_matches_numpy(spark):
    """ev_autocorrelation_seasonal vs a numpy replay over the gap-filled
    hourly series, residuals exact-scaled r = N*x - T."""
    import numpy as np

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _ACF_LAGS,
        ev_autocorrelation_seasonal,
        load_events,
    )

    pdf = load_events(spark, SF_SMOKE).select("event_type", "ts").toPandas()
    got = {r.event_type: r for r in ev_autocorrelation_seasonal(spark, SF_SMOKE).collect()}
    for t, sub in pdf.groupby("event_type"):
        hours = (sub.ts.astype("int64") // 10**9) // 3600
        h0 = hours.min()
        xs = np.bincount((hours - h0).astype(int)).astype(np.int64)
        n, tot = len(xs), int(xs.sum())
        r = n * xs - tot
        den = float((r.astype(float) ** 2).sum())
        row = got[t]
        assert row.n_hours == n and row.n_events == tot
        for k in _ACF_LAGS:
            want = (
                None
                if n <= k
                else round(float((r[:-k].astype(float) * r[k:].astype(float)).sum()) / den, 6)
            )
            val = getattr(row, f"acf_{k}")
            if want is None:
                assert val is None
            else:
                assert abs(val - want) < 1e-6, (t, k, val, want)
