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
    total = 0

    def visit(node):
        nonlocal total
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == metric_name:
                total += kv._2().value()

    try:
        _walk(df._jdf.queryExecution().executedPlan(), visit)
    except Exception:
        return 0
    return total
