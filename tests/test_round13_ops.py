"""Round-13 operators: decay-base sweep conservation and the
stratified-weighted sampler's window plan (the per-op python replays
live in test_sampling.py / test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gravity_books_datalakehouse_spark.streaming.event_queries import (
    _session_journey_frame,
    ev_attribution_decay_sweep,
    ev_attribution_models,
)
from tests.conftest import SF_SMOKE


def test_wasserstein_drift_matches_python_and_bounds(spark):
    """Recompute per-source W1 in pure python (integer segment sums over
    the sorted value domain) and demand identical displayed values; pin
    the Jensen lower bound W1 >= |mean_shift| for every source and that
    W1 is 0 for a source identical to the pool (vacuous here, so instead
    pin W1 > 0 for all real sources — each is a strict subset)."""
    from gravity_books_datalakehouse_spark.plans.advanced_queries import (
        op_drift_wasserstein_by_source,
    )
    from gravity_books_datalakehouse_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "source", "n_chars"
    ).collect()
    from collections import Counter, defaultdict

    pool = Counter()
    per_src: dict = defaultdict(Counter)
    sx = 0
    sxs: dict = defaultdict(int)
    for r in docs:
        pool[r.n_chars] += 1
        per_src[r.source][r.n_chars] += 1
        sx += r.n_chars
        sxs[r.source] += r.n_chars
    n = len(docs)
    dom = sorted(pool)
    rp = {}
    run = 0
    for v in dom:
        run += pool[v]
        rp[v] = run
    want = {}
    for s, cnt in per_src.items():
        ns = sum(cnt.values())
        rs = 0
        wnum = 0
        for i, v in enumerate(dom):
            rs += cnt.get(v, 0)
            gap = (dom[i + 1] - v) if i + 1 < len(dom) else 0
            wnum += abs(rs * n - rp[v] * ns) * gap
        want[s] = (
            ns,
            round(wnum / (1.0 * ns * n), 6),
            round(sxs[s] * 1.0 / ns - sx * 1.0 / n, 6),
        )

    out = op_drift_wasserstein_by_source(spark, SF_SMOKE).collect()
    got = {r.source: (r.n_docs, r.w1_distance, r.mean_shift) for r in out}
    assert got == want
    for s, (ns, w1, shift) in got.items():
        assert w1 + 1e-6 >= abs(shift), s  # Jensen: W1 >= |mean shift|
        assert w1 > 0, s


def test_km_survival_matches_python_replay(spark):
    """Recompute the Kaplan-Meier curve in pure python (per-user
    durations, censoring at last event, product over event times) and
    demand identical displayed rows; pin monotone non-increasing
    survival across horizons and that censoring actually binds (KM at
    the last horizon differs from the naive all-observations ECDF —
    the whole reason the estimator exists)."""
    import math
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _KM_BUDGET,
        _KM_HORIZONS_H,
        ev_survival_km_error_budget,
        load_events,
    )

    rows = (
        load_events(spark, SF_SMOKE)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    durs = []  # (duration_s, ev_flag)
    for u, evs in per_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        t0 = int(evs[0].ts.timestamp())
        errs = [r for r in evs if r.event_type == "error"]
        if len(errs) >= _KM_BUDGET:
            te = int(errs[_KM_BUDGET - 1].ts.timestamp())
            durs.append((te - t0, 1))
        else:
            durs.append((int(evs[-1].ts.timestamp()) - t0, 0))
    n = len(durs)
    hist = defaultdict(lambda: [0, 0])
    for d, ev in durs:
        hist[d][0] += 1
        hist[d][1] += ev
    want = {}
    for hh in _KM_HORIZONS_H:
        lim = hh * 3600
        logsum, seen, cum_ev = 0.0, 0, 0
        for v in sorted(hist):
            if v > lim:
                break
            c_all, c_ev = hist[v]
            if c_ev > 0:
                logsum += math.log(1.0 - c_ev * 1.0 / (n - seen))
            seen += c_all
            cum_ev += c_ev
        want[hh] = (
            sum(1 for d, _ in durs if d >= lim),
            cum_ev,
            round(math.exp(logsum) if cum_ev else 1.0, 6),
        )

    out = ev_survival_km_error_budget(spark, SF_SMOKE).collect()
    got = {
        r.horizon_hours: (r.n_at_risk, r.cum_events, r.survival)
        for r in out
    }
    assert got == want

    survs = [got[h][2] for h in sorted(got)]
    assert survs == sorted(survs, reverse=True)  # monotone non-increasing

    # censoring binds: the naive ECDF treats censored durations as
    # failures; where any censored user left before the last horizon,
    # KM must sit ABOVE the per-observation failure ECDF
    last = max(_KM_HORIZONS_H) * 3600
    n_cens_before = sum(1 for d, ev in durs if ev == 0 and d < last)
    if n_cens_before:
        ecdf_surv = sum(1 for d, _ in durs if d > last) / n
        assert got[max(_KM_HORIZONS_H)][2] > ecdf_surv


def test_logrank_matches_python_replay(spark):
    """Recompute the log-rank O/E/V sums in pure python over the same
    per-user durations and cohort split and demand identical displayed
    values; pin the internal consistency O_0 - E_0 = -(O_1 - E_1)
    (the two-sample statistic is antisymmetric) via expected+observed
    totals."""
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _KM_BUDGET,
        ev_survival_logrank_error_first,
        load_events,
    )

    rows = (
        load_events(spark, SF_SMOKE)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    durs = []  # (duration, ev, g)
    for u, evs in per_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        g = 1 if evs[0].event_type == "error" else 0
        t0 = int(evs[0].ts.timestamp())
        errs = [r for r in evs if r.event_type == "error"]
        if len(errs) >= _KM_BUDGET:
            durs.append((int(errs[_KM_BUDGET - 1].ts.timestamp()) - t0, 1, g))
        else:
            durs.append((int(evs[-1].ts.timestamp()) - t0, 0, g))
    n = len(durs)
    n1 = sum(g for _, _, g in durs)
    hist = defaultdict(lambda: [0, 0, 0, 0])  # c_all, c_ev, c1_all, c1_ev
    for d, ev, g in durs:
        h = hist[d]
        h[0] += 1
        h[1] += ev
        h[2] += g
        h[3] += g * ev
    o1, e1, var1 = 0, 0.0, 0.0
    cb = cb1 = 0
    for v in sorted(hist):
        c_all, c_ev, c1_all, c1_ev = hist[v]
        if c_ev > 0:
            nj, n1j = n - cb, n1 - cb1
            share = n1j * 1.0 / nj
            o1 += c1_ev
            e1 += c_ev * share
            if nj > 1:
                var1 += c_ev * share * (1.0 - share) * (
                    (nj - c_ev) * 1.0 / (nj - 1)
                )
        cb += c_all
        cb1 += c1_all
    r = ev_survival_logrank_error_first(spark, SF_SMOKE).first()
    assert (r.n_cohort, r.n_rest) == (n1, n - n1)
    assert r.observed == o1
    assert r.expected == round(e1, 6)
    assert r.variance == round(var1, 6)
    assert r.chi2 == round((o1 - e1) ** 2 / var1, 6)
    assert r.reject_05 == ((o1 - e1) ** 2 > 3.841459 * var1)


def test_decay_sweep_conserves_credit_per_base(spark):
    """Per decay base, total credit across channels must equal the
    number of converting journeys EXACTLY up to the 6-dp display round
    (each journey's geometric weights sum to 1 by construction), and
    the base-2 column must reproduce ev_attribution_models.time_decay
    bit-for-bit (same closed form, same fold)."""
    out = ev_attribution_decay_sweep(spark, SF_SMOKE).collect()
    bases = sorted({r.decay_base for r in out})
    assert bases == [2.0, 4.0, 8.0]

    j = _session_journey_frame(spark, SF_SMOKE)
    n_conv = (
        j.where(F.col("fp_rn").isNotNull() & (F.col("fp_rn") > 1))
        .select("user_id", "sess_id")
        .distinct()
        .count()
    )
    # fp_rn == 1 journeys (purchase first) have no touches and appear in
    # no credit row; every other converting journey contributes exactly 1
    for b in bases:
        tot = sum(r.credit for r in out if r.decay_base == b)
        assert abs(tot - n_conv) < 1e-4, (b, tot, n_conv)

    models = {
        r.channel: r.time_decay
        for r in ev_attribution_models(spark, SF_SMOKE).collect()
    }
    got2 = {r.channel: r.credit for r in out if r.decay_base == 2.0}
    assert got2 == models

    # n_touches is base-invariant (the explode copies every touch)
    per_base = {
        b: sorted(
            (r.channel, r.n_touches) for r in out if r.decay_base == b
        )
        for b in bases
    }
    assert per_base[2.0] == per_base[4.0] == per_base[8.0]

    # steeper base concentrates credit: for every channel the credit at
    # base 8 differs from base 2 unless the channel only appears in
    # k=1/uniform-position journeys — pin at least ONE channel moved
    got8 = {r.channel: r.credit for r in out if r.decay_base == 8.0}
    assert any(abs(got8[c] - got2[c]) > 1e-9 for c in got2)


def test_na_bands_matches_python_replay(spark):
    """Recompute the Nelson-Aalen hazard, Fleming-Harrington survival
    and Greenwood bands in pure python over the same per-user durations
    and demand identical displayed rows; pin the discrete-tie
    inequality exp(-H) >= KM S at every horizon (ln(1-x) <= -x), the
    band containing the KM point estimate, band edges in [0,1], and a
    non-decreasing cumulative hazard."""
    import math
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _KM_BUDGET,
        _KM_HORIZONS_H,
        _Z95,
        ev_survival_na_bands,
        load_events,
    )

    rows = (
        load_events(spark, SF_SMOKE)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    durs = []
    for u, evs in per_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        t0 = int(evs[0].ts.timestamp())
        errs = [r for r in evs if r.event_type == "error"]
        if len(errs) >= _KM_BUDGET:
            durs.append((int(errs[_KM_BUDGET - 1].ts.timestamp()) - t0, 1))
        else:
            durs.append((int(evs[-1].ts.timestamp()) - t0, 0))
    n = len(durs)
    hist = defaultdict(lambda: [0, 0])
    for d, ev in durs:
        hist[d][0] += 1
        hist[d][1] += ev
    want = {}
    for hh in _KM_HORIZONS_H:
        lim = hh * 3600
        hz, logsum, gw, seen = 0.0, 0.0, 0.0, 0
        for v in sorted(hist):
            if v > lim:
                break
            c_all, c_ev = hist[v]
            nj = n - seen
            if c_ev > 0:
                hz += c_ev * 1.0 / nj
                logsum += math.log(1.0 - c_ev * 1.0 / nj)
                if nj > c_ev:
                    gw += c_ev * 1.0 / ((nj * 1.0) * (nj - c_ev))
            seen += c_all
        s = math.exp(logsum)
        se = s * math.sqrt(gw)
        want[hh] = (
            round(hz, 6),
            round(math.exp(-hz), 6),
            round(s, 6),
            round(se, 6),
            round(max(0.0, s - _Z95 * se), 6),
            round(min(1.0, s + _Z95 * se), 6),
        )

    out = ev_survival_na_bands(spark, SF_SMOKE).collect()
    got = {
        r.horizon_hours: (
            r.cum_hazard,
            r.s_nelson_aalen,
            r.survival,
            r.greenwood_se,
            r.ci_lo95,
            r.ci_hi95,
        )
        for r in out
    }
    assert got == want
    hzs = [got[h][0] for h in sorted(got)]
    assert hzs == sorted(hzs)  # cumulative hazard non-decreasing
    for h, (hz, sna, s, se, lo, hi) in got.items():
        assert sna + 1e-9 >= s, h  # exp(-H) >= product-limit S
        assert lo <= s <= hi, h
        assert 0.0 <= lo and hi <= 1.0, h
        assert se > 0, h  # events exist at smoke scale by this horizon


def test_w1_weekly_matches_python_replay_and_jensen(spark):
    """Recompute the weekly W1 drift in pure python (integer segment
    sums over the sorted per-user-week count domain) and demand
    identical displayed values; pin Jensen (W1 >= |mean_shift|) per
    week and that weeks partition the pooled observations."""
    from collections import Counter, defaultdict

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        ev_drift_w1_weekly,
        load_events,
    )

    uw = (
        load_events(spark, SF_SMOKE)
        .groupBy(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    pool = Counter()
    per_wk: dict = defaultdict(Counter)
    sx = 0
    sxs: dict = defaultdict(int)
    for r in uw:
        pool[r.c] += 1
        per_wk[r.wk][r.c] += 1
        sx += r.c
        sxs[r.wk] += r.c
    n = len(uw)
    dom = sorted(pool)
    rp = {}
    run = 0
    for v in dom:
        run += pool[v]
        rp[v] = run
    want = {}
    for wk, cnt in per_wk.items():
        ns = sum(cnt.values())
        rs = 0
        wnum = 0
        for i, v in enumerate(dom):
            rs += cnt.get(v, 0)
            gap = (dom[i + 1] - v) if i + 1 < len(dom) else 0
            wnum += abs(rs * n - rp[v] * ns) * gap
        want[wk] = (
            ns,
            round(wnum / (1.0 * ns * n), 6),
            round(sxs[wk] * 1.0 / ns - sx * 1.0 / n, 6),
        )

    out = ev_drift_w1_weekly(spark, SF_SMOKE).collect()
    got = {
        r.week_start: (r.n_active_users, r.w1_drift, r.mean_shift)
        for r in out
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == n  # weeks partition pool
    for wk, (ns, w1, shift) in got.items():
        assert w1 + 1e-6 >= abs(shift), wk  # Jensen


def test_rmst_matches_python_replay_and_bounds(spark):
    """Recompute RMST in pure python (area under the replayed KM step
    curve, horizon-clipped, with the S=1 head segment) and demand
    identical displayed rows; pin rmst_hours <= horizon and increasing
    in the horizon, and rmst_share in (0, 1] and non-increasing in the
    horizon (it is the running average of a non-increasing S)."""
    import math
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _KM_BUDGET,
        _KM_HORIZONS_H,
        ev_survival_rmst,
        load_events,
    )

    rows = (
        load_events(spark, SF_SMOKE)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    durs = []
    for u, evs in per_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        t0 = int(evs[0].ts.timestamp())
        errs = [r for r in evs if r.event_type == "error"]
        if len(errs) >= _KM_BUDGET:
            durs.append((int(errs[_KM_BUDGET - 1].ts.timestamp()) - t0, 1))
        else:
            durs.append((int(evs[-1].ts.timestamp()) - t0, 0))
    n = len(durs)
    hist = defaultdict(lambda: [0, 0])
    for d, ev in durs:
        hist[d][0] += 1
        hist[d][1] += ev
    dom = sorted(hist)
    # replay the KM ordinates once over the full domain
    s_at = {}
    logsum, seen = 0.0, 0
    for v in dom:
        c_all, c_ev = hist[v]
        if c_ev > 0:
            logsum += math.log(1.0 - c_ev * 1.0 / (n - seen))
        seen += c_all
        s_at[v] = math.exp(logsum)
    want = {}
    for hh in _KM_HORIZONS_H:
        tau = hh * 3600
        area = min(dom[0], tau) * 1.0
        for i, v in enumerate(dom):
            if v >= tau:
                break
            nxt = dom[i + 1] if i + 1 < len(dom) else tau
            area += s_at[v] * (min(nxt, tau) - v)
        want[hh] = (
            round(area / 3600.0, 6),
            round(area / (3600.0 * hh), 6),
        )

    out = ev_survival_rmst(spark, SF_SMOKE).collect()
    got = {r.horizon_hours: (r.rmst_hours, r.rmst_share) for r in out}
    assert got == want
    hs = sorted(got)
    rm = [got[h][0] for h in hs]
    sh = [got[h][1] for h in hs]
    assert rm == sorted(rm)  # RMST increases with the horizon
    assert sh == sorted(sh, reverse=True)  # share non-increasing
    for h in hs:
        assert 0.0 < got[h][1] <= 1.0, h
        assert got[h][0] <= h + 1e-6, h


def test_competing_risks_matches_python_replay_and_identity(spark):
    """Recompute the Aalen-Johansen cumulative incidences in pure
    python (all-cause KM left-limits times per-cause hazard, ascending
    event times) and demand identical displayed rows; pin the AJ
    identity s_event_free + cif_convert + cif_exhaust = 1 at every
    horizon with any absorbed mass, both CIFs non-decreasing in the
    horizon, and that conversion actually competes (cif_convert > 0)."""
    import math
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _KM_BUDGET,
        _KM_HORIZONS_H,
        ev_survival_competing_risks,
        load_events,
    )

    rows = (
        load_events(spark, SF_SMOKE)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    durs = []  # (d, cause) cause: 1 exhaust, 2 convert, 0 censored
    for u, evs in per_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        t0 = evs[0].ts
        errs = [r for r in evs if r.event_type == "error"]
        te = errs[_KM_BUDGET - 1].ts if len(errs) >= _KM_BUDGET else None
        purch = [r for r in evs if r.event_type == "purchase"]
        tc = purch[0].ts if purch else None
        if te is not None and (tc is None or te <= tc):
            durs.append((int(te.timestamp()) - int(t0.timestamp()), 1))
        elif tc is not None:
            durs.append((int(tc.timestamp()) - int(t0.timestamp()), 2))
        else:
            durs.append(
                (int(evs[-1].ts.timestamp()) - int(t0.timestamp()), 0)
            )
    n = len(durs)
    hist = defaultdict(lambda: [0, 0, 0])  # c_all, c_e, c_c
    for d, cause in durs:
        h = hist[d]
        h[0] += 1
        if cause == 1:
            h[1] += 1
        elif cause == 2:
            h[2] += 1
    want = {}
    for hh in _KM_HORIZONS_H:
        lim = hh * 3600
        cif_e = cif_c = 0.0
        logsum, seen, dead = 0.0, 0, False
        for v in sorted(hist):
            if v > lim:
                break
            c_all, c_e, c_c = hist[v]
            njv = n - seen
            s_prev = 0.0 if dead else math.exp(logsum)
            cc = c_e + c_c
            if cc:
                cif_e += s_prev * (c_e * 1.0 / njv)
                cif_c += s_prev * (c_c * 1.0 / njv)
                if cc == njv:
                    dead = True
                else:
                    logsum += math.log(1.0 - cc * 1.0 / njv)
            seen += c_all
        s_any = 0.0 if dead else math.exp(logsum)
        want[hh] = (round(cif_c, 6), round(cif_e, 6), round(s_any, 6))

    out = ev_survival_competing_risks(spark, SF_SMOKE).collect()
    got = {
        r.horizon_hours: (r.cif_convert, r.cif_exhaust, r.s_event_free)
        for r in out
    }
    assert got == want
    hs = sorted(got)
    assert [got[h][0] for h in hs] == sorted(got[h][0] for h in hs)
    assert [got[h][1] for h in hs] == sorted(got[h][1] for h in hs)
    for h in hs:
        c, e, s = got[h]
        assert abs(c + e + s - 1.0) < 1e-6, h  # AJ identity
        assert c > 0, h  # conversion genuinely competes on this corpus


def test_hazard_ratio_matches_python_replay(spark):
    """Recompute the Pike HR and its ln-scale CI in pure python over
    the same per-user durations/cohorts and demand identical displayed
    values; pin hr_lo95 < hazard_ratio < hr_hi95, HR > 1 exactly when
    O1 > E1, and consistency with the log-rank table's O/E row."""
    import math
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _KM_BUDGET,
        _Z95,
        ev_survival_hazard_ratio,
        ev_survival_logrank_error_first,
        load_events,
    )

    rows = (
        load_events(spark, SF_SMOKE)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    durs = []
    for u, evs in per_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        g = 1 if evs[0].event_type == "error" else 0
        t0 = int(evs[0].ts.timestamp())
        errs = [r for r in evs if r.event_type == "error"]
        if len(errs) >= _KM_BUDGET:
            durs.append((int(errs[_KM_BUDGET - 1].ts.timestamp()) - t0, 1, g))
        else:
            durs.append((int(evs[-1].ts.timestamp()) - t0, 0, g))
    n = len(durs)
    n1 = sum(g for _, _, g in durs)
    hist = defaultdict(lambda: [0, 0, 0, 0])
    for d, ev, g in durs:
        h = hist[d]
        h[0] += 1
        h[1] += ev
        h[2] += g
        h[3] += g * ev
    o1, ot, e1 = 0, 0, 0.0
    cb = cb1 = 0
    for v in sorted(hist):
        c_all, c_ev, c1_all, c1_ev = hist[v]
        if c_ev > 0:
            nj, n1j = n - cb, n1 - cb1
            o1 += c1_ev
            ot += c_ev
            e1 += c_ev * (n1j * 1.0 / nj)
        cb += c_all
        cb1 += c1_all
    o0 = ot - o1
    e0 = float(ot) - e1
    hr = (o1 * 1.0 / e1) / (o0 * 1.0 / e0)
    half = _Z95 * math.sqrt(1.0 / e1 + 1.0 / e0)
    want = (
        n1,
        n - n1,
        o1,
        o0,
        round(e1, 6),
        round(e0, 6),
        round(hr, 6),
        round(math.exp(math.log(hr) - half), 6),
        round(math.exp(math.log(hr) + half), 6),
    )
    out = ev_survival_hazard_ratio(spark, SF_SMOKE).collect()
    assert len(out) == 1
    got = tuple(out[0])
    assert got == want
    r = out[0]
    assert r.hr_lo95 < r.hazard_ratio < r.hr_hi95
    assert (r.hazard_ratio > 1.0) == (r.observed_1 > r.expected_1)
    lr = ev_survival_logrank_error_first(spark, SF_SMOKE).collect()[0]
    assert lr.observed == r.observed_1
    assert lr.expected == r.expected_1


def test_stratified_logrank_matches_python_replay(spark):
    """Recompute the per-tercile O/E/V sums and the pooled Mantel
    statistic in pure python (NTILE terciles over the (count, user_id)
    total order, per-stratum risk sets) and demand identical displayed
    rows; pin that strata partition the users, that the pooled chi2 is
    built from the per-stratum sums, and the pooled flag's consistency
    with the critical value."""
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _KM_BUDGET,
        _LOGRANK_CRIT,
        ev_survival_logrank_stratified,
        load_events,
    )

    rows = (
        load_events(spark, SF_SMOKE)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(r)
    # NTILE(3) over (event count, user_id)
    order = sorted(per_user, key=lambda u: (len(per_user[u]), u))
    nusers = len(order)
    tercile = {}
    base, rem = divmod(nusers, 3)
    sizes = [base + (1 if i < rem else 0) for i in range(3)]
    idx = 0
    for st, sz in enumerate(sizes, start=1):
        for u in order[idx : idx + sz]:
            tercile[u] = st
        idx += sz
    durs = defaultdict(list)  # st -> (d, ev, g)
    for u, evs in per_user.items():
        evs.sort(key=lambda r: (r.ts, r.event_id))
        g = 1 if evs[0].event_type == "error" else 0
        t0 = int(evs[0].ts.timestamp())
        errs = [r for r in evs if r.event_type == "error"]
        if len(errs) >= _KM_BUDGET:
            d, ev = int(errs[_KM_BUDGET - 1].ts.timestamp()) - t0, 1
        else:
            d, ev = int(evs[-1].ts.timestamp()) - t0, 0
        durs[tercile[u]].append((d, ev, g))
    want = {}
    po, pe, pv = 0, 0.0, 0.0
    for st, lst in durs.items():
        n = len(lst)
        n1 = sum(g for _, _, g in lst)
        hist = defaultdict(lambda: [0, 0, 0, 0])
        for d, ev, g in lst:
            h = hist[d]
            h[0] += 1
            h[1] += ev
            h[2] += g
            h[3] += g * ev
        o1, e1, var1 = 0, 0.0, 0.0
        cb = cb1 = 0
        for v in sorted(hist):
            c_all, c_ev, c1_all, c1_ev = hist[v]
            if c_ev > 0:
                nj, n1j = n - cb, n1 - cb1
                share = n1j * 1.0 / nj
                o1 += c1_ev
                e1 += c_ev * share
                if nj > 1:
                    var1 += (
                        c_ev
                        * share
                        * (1.0 - share)
                        * ((nj - c_ev) * 1.0 / (nj - 1))
                    )
            cb += c_all
            cb1 += c1_all
        want[st] = (n, n1, o1, round(e1, 6), round(var1, 6))
        po += o1
        pe += e1
        pv += var1
    chi2 = round((po - pe) * (po - pe) / pv, 6)
    rej = (po - pe) * (po - pe) > _LOGRANK_CRIT * pv

    out = ev_survival_logrank_stratified(spark, SF_SMOKE).collect()
    got = {
        r.stratum: (r.n_users, r.n_cohort, r.observed, r.expected, r.variance)
        for r in out
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == nusers  # strata partition
    for r in out:
        assert r.pooled_chi2 == chi2
        assert r.pooled_reject_05 == rej
