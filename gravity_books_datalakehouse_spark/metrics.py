"""Executed-plan metric extraction (shuffle bytes, scan rows) via py4j.

After a DataFrame action, every physical node's SQLMetrics hold actual
runtime values. ``plan_metric_sum`` walks the (adaptive) executed plan —
through AQE wrappers and query stages — and sums a named metric.
Used by bench.py to report per-query shuffle volume next to wall-clock:
wall-clock says how fast it ran HERE; shuffle bytes say how it will
behave at 1000 executors (network is the scale bottleneck, not CPU).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _walk(node, visit) -> None:
    name = node.getClass().getSimpleName()
    visit(node)
    if name == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), visit)
    elif "QueryStageExec" in name:
        _walk(node.plan(), visit)
    else:
        children = node.children()
        for i in range(children.size()):
            _walk(children.apply(i), visit)


def plan_metric_sum(df: DataFrame, metric_name: str) -> int:
    """Sum ``metric_name`` over all nodes of df's executed plan. Returns 0
    if the query was never executed or the metric doesn't occur."""
    return plan_metrics_sum(df, [metric_name])[metric_name]


def plan_metrics_sum(df: DataFrame, metric_names: list[str]) -> dict[str, int]:
    """Sum several named SQLMetrics in ONE plan walk (each py4j round-trip
    costs ~ms; bench extracts 3+ metrics × ~100 queries)."""
    totals = dict.fromkeys(metric_names, 0)

    def visit(node):
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() in totals:
                totals[kv._1()] += kv._2().value()

    try:
        _walk(df._jdf.queryExecution().executedPlan(), visit)
    except Exception:
        pass
    return totals


def job_group_profile(spark, group_id: str) -> dict[str, int]:
    """Execution-graph profile of every job run under ``group_id`` (set via
    ``sc.setJobGroup`` before the action): job, stage, and task counts from
    the public status-tracker API.

    Stage count is the scheduling depth (ideally ≈ #shuffles + 1) and task
    count the total parallelism footprint — together they say how a query
    maps onto a 1000-executor cluster in a way wall-clock on local[32]
    cannot: a query that is fast here but plans 40 stages serializes on
    shuffle latency at scale."""
    st = spark.sparkContext.statusTracker()
    jobs = st.getJobIdsForGroup(group_id)
    stage_ids: set[int] = set()
    tasks = 0
    for j in jobs:
        ji = st.getJobInfo(j)
        if ji is None:
            continue
        for sid in ji.stageIds:
            if sid in stage_ids:
                continue
            stage_ids.add(sid)
            si = st.getStageInfo(sid)
            if si is not None:
                tasks += si.numTasks
    return {"jobs": len(jobs), "stages": len(stage_ids), "tasks": tasks}


def task_time_profile(spark, group_id: str) -> dict[str, float]:
    """Task-runtime distribution of the slowest stage run under
    ``group_id``: p50 and max executor run time (ms) and their ratio —
    the STRAGGLER metric. Wall-clock on local[32] can't show skew (32
    fast threads absorb one slow task); the max/p50 ratio of the
    dominant stage says whether one task would hold a 1000-executor
    stage hostage. Uses the AppStatusStore task summaries (same data as
    the UI's task-quantile table); best-effort — returns {} when the
    store has no summary (e.g. all stages skipped via cache reuse)."""
    out: dict[str, float] = {}
    try:
        sc = spark.sparkContext
        st = sc.statusTracker()
        store = spark._jsc.sc().statusStore()
        gw = sc._gateway
        quants = gw.new_array(gw.jvm.double, 2)
        quants[0] = 0.5
        quants[1] = 1.0
        seen: set[int] = set()
        worst = None  # (max_ms, p50_ms)
        for j in st.getJobIdsForGroup(group_id):
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                if sid in seen:
                    continue
                seen.add(sid)
                opt = store.taskSummary(sid, 0, quants)
                if not opt.isDefined():
                    continue
                rt = opt.get().executorRunTime()
                p50, mx = float(rt.apply(0)), float(rt.apply(1))
                if worst is None or mx > worst[0]:
                    worst = (mx, p50)
        if worst is not None:
            mx, p50 = worst
            out = {"task_ms_p50": p50, "task_ms_max": mx}
            if p50 > 0:  # omit rather than emit null into detail JSON
                out["straggler_ratio"] = round(mx / p50, 2)
    except Exception:
        pass
    return out
