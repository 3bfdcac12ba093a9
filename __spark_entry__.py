"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query at sf0.001 (smoke check).
- ``queries()``      — name → (spark, sf_dir) → DataFrame, one per
  implemented operator/query from SURVEY.md §2.
- ``oracle_sql()``   — matching DuckDB SQL per query name (identical
  column aliases; driver hash-compares values order-insensitively).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gravity_books_datalakehouse_spark.plans.star import (
    q1_monthly_sales,
    star_queries,
    star_oracle_sql,
)

_REGISTRY: list[tuple[dict, dict]] = []

# The driver's correctness harness witnesses the FIRST 50 registry entries.
# This explicit head interleaves at least one oracle-backed representative of
# every query family (star, tpch, dedup, similarity/ANN, multimodal, events/
# streaming-shape, sampling, text, asof, udtf, pipeline, core relational ops)
# so no family is invisible to the hard per-round signal. Everything else
# keeps its natural module order after the head.
_PRIORITY_HEAD = [
    # --- round-12 window rotation state ---
    # Priority order (the standard never-witnessed/changed-first
    # discipline, executing the round-11 verdict's item-3 queue):
    #   1. the operators ADDED in round 12 — never witnessed (each
    #      differentially verified at sf0.001/sf0.01/sf0.1 this round,
    #      plus pure-python replays): dedup_cluster_persistence
    #      (HDBSCAN-style condensed-tree stability over the OPTICS tau
    #      grid, one contracted-CC pass per level exploiting edge-set
    #      nesting; tau=0 == CC pin), dedup_cluster_extraction
    #      (HDBSCAN excess-of-mass flat clustering over that tree —
    #      bottom-up S* DP + coverage descent, all integer tenths;
    #      leaf-partition property pinned), ev_markov_attribution
    #      (removal-effect channel attribution: K=8 unrolled absorption
    #      sweeps on the journey chain, driver-side model matrix,
    #      python replay pinned), and op_sketch_hll_merge_days (per-day
    #      HLL partials max-merged, mismatch-vs-direct witnessed
    #      relationally — it also covers the op_sketch family fill, so
    #      op_sketch_countmin_terms (r9 witness, younger than the
    #      round-6 block) yielded its slot), ev_attribution_models
    #      (the five classical credit models as per-row closed forms
    #      over the shared journey chain; conservation test),
    #      sim_matryoshka_truncation (dimension-truncation recall
    #      curve, identity-row anchor + numpy replay), and
    #      ev_autocorrelation_seasonal (exact-scaled-residual ACF at
    #      lags 1/24/168, numpy replay);
    #   2. operators whose PLAN or expression changed in round 12 and
    #      must re-hash: text_kn_trigram_logprob (the vocab-sized
    #      unpartitioned window fold of the type total B replaced by a
    #      broadcast-scalar crossJoin — r11 verdict "What's wrong" #1;
    #      hashes verified unchanged at sf0.01/sf0.1 + a plan test) and
    #      ev_seasonality_strength (SST=0 NULLIF guard on both engines
    #      — ADVICE r11 item 4; no-op on this corpus, re-hash anyway),
    #      and ev_markov_stationary (the 5 power sweeps moved from
    #      distributed tiny-joins to driver-side arithmetic on the
    #      collected |types|^2 model matrix — the centroids-as-literals
    #      idiom; 20x events probe 2.79 -> 2.05 s, the lag window is
    #      now the measured floor — r11 verdict item 4);
    #   3. the round-11 verdict's written queue: the six entries
    #      displaced by late round-11 additions, then the remaining
    #      round-6 block (ages 5-6 — the oldest oracle-backed
    #      witnesses), restoring max witness age <= 6 rounds;
    #   4. family fills so EVERY family keeps >=1 row in the window
    #      (tests/test_entry_contract.py pins this), chosen
    #      oldest-witness-first inside each family:
    #      star_q4_sales_by_nation (r7), mm_payload_metadata (r7),
    #      op_split_stratified_exact (r7), op_a_stats_kit (r7),
    #      op_f_date_kit (r6), op_sketch_countmin_terms (r9),
    #      op_scd2_temporal_join (r10), op_graph_kcore (r8),
    #      op_drift_psi_events (r11, sole drift entry),
    #      op_outliers_mad (r10);
    #   (ev_attribution_touch, dedup_semantic_kmeans,
    #   dedup_fuzzy_prefix, and text_compression_ratio's rows-only
    #   refresh yielded their slots to the four round-12 additions and
    #   the ev_markov_stationary re-witness; they lead the round-13
    #   queue).
    # Round-13 queue, in order: ev_attribution_touch,
    # dedup_semantic_kmeans, dedup_fuzzy_prefix,
    # text_compression_ratio, q_heavy_suppliers_semi,
    # q_idle_rich_customers (the last four yielded slots to the six
    # round-12 additions), then the remaining round-7 block:
    # op_a1_group_concat_sorted, op_a2_global_minmax, op_a3_distinct,
    # op_f_date_dim_kit, op_f_regex_kit, op_f_string_kit, op_j_anti,
    # op_j_semi, op_layout_zorder_prune, op_o_topk_desc_tiebreak,
    # op_p2_rename, op_p3_dropna_after_left_join, op_profile_columns,
    # op_s1_scan_projection, op_s6_sql_over_views,
    # op_sample_hash_bernoulli, op_set_union_intersect_except,
    # op_snapshot_diff, op_w_mom_growth, op_w_ntile_deciles,
    # pipeline_curation_verdict, q_basket_copurchase_lift,
    # q_large_volume_customers, q_market_share_by_year,
    # q_nation_pair_flows, q_pricing_summary, q_profit_by_nation_year,
    # q_returned_item_customers, q_top_urgent_orders,
    # sim_lsh_multiprobe_topk, then the rest of the round-7 block and
    # round-8 witnesses oldest-first, keeping the
    # one-oracle-row-per-family contract test green.
    # --- 1. NEW round-12 operators (never witnessed) ---
    "dedup_cluster_persistence",
    "dedup_cluster_extraction",
    "ev_markov_attribution",
    "ev_attribution_models",
    "op_sketch_hll_merge_days",
    "sim_matryoshka_truncation",
    "ev_autocorrelation_seasonal",
    # --- 2. plan/expression changed in round 12 — re-witness ---
    "text_kn_trigram_logprob",
    "ev_seasonality_strength",
    "ev_markov_stationary",
    # --- 3a. the six entries displaced by late round-11 additions ---
    "q_revenue_range_filter",
    "op_pivot_event_counts",
    "op_w_running_total",
    "op_j10_differing_key_names",
    "op_w_topn_per_group",
    "op_p4_p5_casts",
    "op_where_filter_pushdown",
    "ev_sliding_windows",
    "ev_rolling_7d_active_users",
    # --- 3b. the remaining round-6 block (oldest witnesses) ---
    "text_quality_scores",
    "text_fingerprint",
    "text_top_bigrams",
    "text_lang_confusion",
    "dedup_exact",
    "pipeline_contamination_by_source",
    "op_sample_rebalance_langs",
    "pipeline_epoch_shuffle",
    "sim_ann_recall_report",
    "op_asof_join_tolerance",
    "sim_kmeans_refine",
    "ev_funnel_time_to_convert",
    "ev_user_ltv_topk",
    "ev_type_transition_matrix",
    "q_customer_rfm_segments",
    "q_revenue_pareto",
    "q_order_to_ship_lag",
    "q_important_part_value",
    "q_late_shipment_priority",
    "q_customer_order_distribution",
    "q_part_supplier_counts",
    "op_percentiles_exact",
    # --- 4. family-coverage fills (oldest witness per family) ---
    "star_q4_sales_by_nation",
    "mm_payload_metadata",
    "op_split_stratified_exact",
    "op_a_stats_kit",
    "op_f_date_kit",
    "op_scd2_temporal_join",
    "op_graph_kcore",
    "op_drift_psi_events",
    "op_outliers_mad",
]


def _registry() -> tuple[dict, dict]:
    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    qs.update(star_queries())
    oracles.update(star_oracle_sql())

    from gravity_books_datalakehouse_spark.plans import operator_queries

    qs.update(operator_queries.queries())
    oracles.update(operator_queries.oracle_sql())

    # Fail loudly on head drift: a typo or a rename would otherwise
    # silently drop a query from the 50-entry driver window and break the
    # "every entry witnessed at least once" rotation bookkeeping.
    missing = [n for n in _PRIORITY_HEAD if n not in qs]
    if missing:  # not assert: must survive python -O with the diagnostic
        raise RuntimeError(
            f"_PRIORITY_HEAD names absent from registry: {missing}"
        )
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _PRIORITY_HEAD:
        ordered[name] = qs[name]
    for name, fn in qs.items():
        if name not in ordered:
            ordered[name] = fn
    ordered_oracles = {n: oracles[n] for n in ordered if n in oracles}
    return ordered, ordered_oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_monthly_sales(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
