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
