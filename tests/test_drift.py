"""PSI drift monitor (op_drift_psi_events): oracle parity plus a pure
python recomputation of the index from first principles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


def _registry():
    import __spark_entry__ as m

    return m.queries(), m.oracle_sql()


def test_psi_matches_oracle(spark, duck):
    qs, osql = _registry()
    assert_matches_oracle(
        qs["op_drift_psi_events"](spark, SF_CORRECT),
        duck,
        osql["op_drift_psi_events"],
    )


def test_psi_first_principles(spark):
    """Recompute PSI per event type in pure python (math.log, explicit
    smoothing, dense 10-bin spine) and compare to the query's 6-dp
    value; also pin non-negativity (each (p-q)ln(p/q) term is >= 0) and
    that the window totals partition the non-null rows."""
    qs, _ = _registry()
    rows = qs["op_drift_psi_events"](spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").where(
        F.col("value").isNotNull()
    )
    raw = ev.select("event_type", "ts", "value").collect()
    import datetime

    split = datetime.datetime(2024, 1, 16)
    per_type: dict[str, list[list[int]]] = {}
    for r in raw:
        b = min(int(r.value // 50), 9)
        w = 0 if r.ts < split else 1
        per_type.setdefault(r.event_type, [[0] * 10, [0] * 10])[w][b] += 1
    assert len(rows) == len(per_type)
    for r in rows:
        ref, cur = per_type[r.event_type]
        tref, tcur = sum(ref), sum(cur)
        assert (r.n_ref, r.n_cur) == (tref, tcur)
        psi = sum(
            ((ref[i] + 1.0) / (tref + 10) - (cur[i] + 1.0) / (tcur + 10))
            * math.log(
                ((ref[i] + 1.0) / (tref + 10))
                / ((cur[i] + 1.0) / (tcur + 10))
            )
            for i in range(10)
        )
        assert psi >= 0.0
        assert abs(r.psi - round(psi, 6)) <= 1e-6
        assert r.drift_flag == (r.psi >= 0.1)


def test_psi_plan_single_fact_scan(spark):
    """ONE events scan, one chain: the shuffle carries only aggregated
    cells (partial agg before every exchange), no join anywhere, and
    the absent-bin smoothing rides the closed-form fold, not a spine
    join."""
    qs, _ = _registry()
    plan = (
        qs["op_drift_psi_events"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("events.parquet") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_ewma_matches_oracle(spark, duck):
    qs, osql = _registry()
    assert_matches_oracle(
        qs["ev_ewma_control"](spark, SF_CORRECT),
        duck,
        osql["ev_ewma_control"],
    )


def test_ewma_first_principles(spark):
    """Recompute the truncated-dyadic EWMA and the alert rule in pure
    python over the gap-filled hourly series and demand bit-equality:
    the weighted sum S is an exact integer, so there is no tolerance —
    the operator's ewma must equal S/(2^24-1) and the flag must equal
    the integer comparison, row for row."""
    import datetime

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _EWMA_LAGS,
        _EWMA_MIN_COUNT,
        _EWMA_NORM,
    )

    qs, _ = _registry()
    rows = qs["ev_ewma_control"](spark, SF_SMOKE).collect()
    raw = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type", "ts")
        .collect()
    )
    series: dict[str, dict[datetime.datetime, int]] = {}
    for r in raw:
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        series.setdefault(r.event_type, {})
        series[r.event_type][h] = series[r.event_type].get(h, 0) + 1
    want = {}
    for et, buckets in series.items():
        h0, h1 = min(buckets), max(buckets)
        spine = []
        h = h0
        while h <= h1:
            spine.append(buckets.get(h, 0))
            h += datetime.timedelta(hours=1)
        for t in range(_EWMA_LAGS, len(spine)):
            s = sum(
                spine[t - j] * (2 ** (_EWMA_LAGS - j))
                for j in range(1, _EWMA_LAGS + 1)
            )
            x = spine[t]
            want[(et, h0 + datetime.timedelta(hours=t))] = (
                x,
                round(s / _EWMA_NORM, 6),
                x >= _EWMA_MIN_COUNT and x * _EWMA_NORM > 2 * s,
            )
    got = {
        (r.event_type, r.window_start): (r.x, r.ewma, r.alert_flag)
        for r in rows
    }
    assert got == want
    assert len(got) > 3000  # ~30 days x 24 h x types, minus warmup


def test_peak_concurrency_matches_oracle(spark, duck):
    qs, osql = _registry()
    assert_matches_oracle(
        qs["ev_peak_concurrency"](spark, SF_CORRECT),
        duck,
        osql["ev_peak_concurrency"],
    )


def test_peak_concurrency_sweep_replay(spark):
    """Pure-python sweep-line over the same 30-min-gap sessions: global
    running sum with the (ts, +1-before--1) tie rule, per-day peaks,
    first-reached timestamps, and session-start counts — all exact."""
    import datetime
    from collections import defaultdict

    qs, _ = _registry()
    raw = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts")
        .collect()
    )
    by_user = defaultdict(list)
    for r in raw:
        by_user[r.user_id].append(r.ts)
    gap = datetime.timedelta(minutes=30)
    bounds = []
    for ts_list in by_user.values():
        ts_list.sort()
        start = prev = ts_list[0]
        for t in ts_list[1:]:
            if t - prev > gap:
                bounds.append((start, prev))
                start = t
            prev = t
        bounds.append((start, prev))
    events = [(s, 1) for s, _ in bounds] + [(e, -1) for _, e in bounds]
    events.sort(key=lambda p: (p[0], -p[1]))  # +1 before -1 at equal ts
    conc = 0
    per_day = {}
    for ts, d in events:
        conc += d
        day = ts.date().isoformat()
        st = per_day.setdefault(day, {"peak": -1, "at": None, "started": 0})
        if d == 1:
            st["started"] += 1
        if conc > st["peak"]:
            st["peak"], st["at"] = conc, ts
    got = {
        r.day: (r.n_sessions_started, r.peak_concurrency, r.peak_at)
        for r in qs["ev_peak_concurrency"](spark, SF_SMOKE).collect()
    }
    want = {
        day: (st["started"], st["peak"], st["at"]) for day, st in per_day.items()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == len(bounds)


def test_interval_overlap_matches_oracle(spark, duck):
    qs, osql = _registry()
    assert_matches_oracle(
        qs["op_j_interval_overlap"](spark, SF_CORRECT),
        duck,
        osql["op_j_interval_overlap"],
    )


def test_interval_overlap_python_replay_and_plan(spark):
    """Quadratic python recount of overlapping session pairs (the
    semantics the bucketed equi-join must reproduce losslessly), plus
    a plan check that no nested-loop/cartesian join sneaked in."""
    import datetime
    from collections import defaultdict

    qs, _ = _registry()
    raw = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts")
        .collect()
    )
    by_user = defaultdict(list)
    for r in raw:
        by_user[r.user_id].append(r.ts)
    gap = datetime.timedelta(minutes=30)
    sess = []
    for u, ts_list in by_user.items():
        ts_list.sort()
        start = prev = ts_list[0]
        for t in ts_list[1:]:
            if t - prev > gap:
                sess.append((u, start, prev))
                start = t
            prev = t
        sess.append((u, start, prev))
    counts = defaultdict(int)
    for i, (ua, sa, ea) in enumerate(sess):
        for ub, sb, eb in sess[i + 1 :]:
            if ua == ub:
                continue
            x, y = (ua, ub) if ua < ub else (ub, ua)
            if sa <= eb and sb <= ea:
                counts[(x, y)] += 1
    want = sorted(
        ((n, a, b) for (a, b), n in counts.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    df = qs["op_j_interval_overlap"](spark, SF_SMOKE)
    got = [(r.n_overlaps, r.user_a, r.user_b) for r in df.collect()]
    assert got == want

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_pattern_match_matches_oracle(spark, duck):
    qs, osql = _registry()
    assert_matches_oracle(
        qs["ev_pattern_match"](spark, SF_CORRECT),
        duck,
        osql["ev_pattern_match"],
    )


def test_pattern_match_python_replay(spark):
    """Rebuild the session event-initial strings in python ((ts,
    event_id) order), count non-overlapping regex matches with re, and
    demand identical aggregates — also re-probing Java/RE2 parity on
    exactly the shipped patterns."""
    import datetime
    import re
    from collections import defaultdict

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        _PATTERNS,
    )

    qs, _ = _registry()
    raw = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in raw:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type[0]))
    gap = datetime.timedelta(minutes=30)
    seqs = []
    for evs in by_user.values():
        evs.sort()
        cur = [evs[0]]
        for t in evs[1:]:
            if t[0] - cur[-1][0] > gap:
                seqs.append("".join(ch for _, _, ch in cur))
                cur = []
            cur.append(t)
        seqs.append("".join(ch for _, _, ch in cur))
    got = {r.pattern: r for r in qs["ev_pattern_match"](spark, SF_SMOKE).collect()}
    assert set(got) == {name for name, _ in _PATTERNS}
    for name, rx in _PATTERNS:
        matches = [len(re.findall(rx, s)) for s in seqs]
        r = got[name]
        assert r.n_sessions == len(seqs)
        assert r.n_sessions_matched == sum(1 for m in matches if m > 0)
        assert r.total_matches == sum(matches)


def test_ks_drift_matches_oracle(spark, duck):
    from gravity_books_datalakehouse_spark.plans.advanced_queries import (
        op_ks_drift_by_source,
    )
    from gravity_books_datalakehouse_spark.plans.operator_queries import (
        oracle_sql,
    )

    assert_matches_oracle(
        op_ks_drift_by_source(spark, SF_CORRECT),
        duck,
        oracle_sql()["op_ks_drift_by_source"],
    )


def test_ks_drift_python_replay(spark):
    """Exact EDF replay: per source, the integer deviation
    |R_s(v)*N - R_p(v)*n_s| over the pooled value domain, its max and
    argmax, the scaled D, and the squared-critical-value flag — all
    must match exactly (integers everywhere)."""
    import math
    from collections import Counter, defaultdict

    from gravity_books_datalakehouse_spark.plans.advanced_queries import (
        _KS_CRIT2_DEN,
        _KS_CRIT2_NUM,
        op_ks_drift_by_source,
    )

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("source", "n_chars")
        .collect()
    )
    pooled = Counter(r.n_chars for r in rows)
    by_src = defaultdict(Counter)
    for r in rows:
        by_src[r.source][r.n_chars] += 1
    n_total = len(rows)
    domain = sorted(pooled)
    got = {r.source: r for r in op_ks_drift_by_source(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_src)
    for src, cnt in by_src.items():
        ns = sum(cnt.values())
        rp = rs = 0
        best = (-1, None)
        for v in domain:
            rp += pooled[v]
            rs += cnt.get(v, 0)
            dnum = abs(rs * n_total - rp * ns)
            if dnum > best[0]:
                best = (dnum, v)
        dnum, at_v = best
        r = got[src]
        assert (r.n_docs, r.at_value) == (ns, at_v)
        assert abs(r.ks_d - round(dnum / (ns * n_total), 6)) <= 1e-6
        want_flag = (
            _KS_CRIT2_DEN * dnum * dnum
            > _KS_CRIT2_NUM * (ns + n_total) * ns * n_total
        )
        assert r.drift_flag == want_flag
        # flag consistency with the float form of the asymptotic rule
        crit = 1.358 * math.sqrt((ns + n_total) / (ns * n_total))
        assert want_flag == (dnum / (ns * n_total) > crit) or abs(
            dnum / (ns * n_total) - crit
        ) < 1e-9


def test_kl_matrix_python_replay(spark):
    """Recompute two cells in pure python (Counter + math.log) and pin
    symmetry-by-construction (Jeffreys >= 0, 0 iff identical hists)."""
    import math
    from collections import Counter

    import duckdb as _duckdb

    import __spark_entry__ as m
    from tests.conftest import SF_CORRECT

    con = _duckdb.connect()
    rows = con.execute(
        f"SELECT source, n_chars FROM read_parquet('{SF_CORRECT}/documents.parquet')"
    ).fetchall()
    con.close()
    hists, ns = {}, Counter()
    dom = set()
    for src, v in rows:
        hists.setdefault(src, Counter())[v] += 1
        ns[src] += 1
        dom.add(v)
    d = len(dom)

    def jeffreys(sa, sb):
        tot = 0.0
        for v in dom:
            p = (hists[sa][v] + 1.0) / (ns[sa] + d)
            q = (hists[sb][v] + 1.0) / (ns[sb] + d)
            tot += (p - q) * math.log(p / q)
        return round(tot, 6)

    out = {
        (r.source_a, r.source_b): r.jeffreys_kl
        for r in m.queries()["op_kl_divergence_matrix"](spark, SF_CORRECT).collect()
    }
    assert len(out) == len(hists) * (len(hists) - 1) // 2
    for (sa, sb) in list(out)[:2] + list(out)[-2:]:
        assert abs(out[(sa, sb)] - jeffreys(sa, sb)) <= 2e-6
        assert out[(sa, sb)] >= 0.0
