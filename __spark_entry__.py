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
    # --- round-7 window rotation state ---
    # The full-registry witness sweep completed in round 6 (every entry has
    # a green row in some CORRECTNESS_r*.json); rotation is now freshness
    # maintenance. This head = the 5 star queries (plans REWORKED this
    # round: exchange-free q2 aggregate, local-sort endings, and the
    # integer-cents measure aggregates) + 5 cents-path-converted q_
    # queries + all 12 entries last witnessed in round 1 + all 9 last
    # witnessed in round 2 + 13 of the 45 last witnessed in round 3 + 6
    # older entries required for family coverage
    # (op_split/op_scd2/op_fk/op_unpivot/op_outliers). The other
    # cents-converted queries (q_pricing_summary, q_market_share_by_year,
    # q_profit_by_nation_year, q_promo_revenue) ride in the round-3
    # block below; the rest were hash-verified at sf0.01 AND sf0.1 by
    # this round's in-repo verify runs.
    # Round-8 rotation: the ten entries displaced late in round 7 by the
    # new operators (q_sole_blame_suppliers, dedup_lsh_banded_pairs,
    # sim_topk_cosine_bruteforce, dedup_minhash_lsh_pairs,
    # dedup_jaccard_verify, ev_sessionize, q_promo_revenue,
    # q_small_qty_revenue, op_fk_orphan_audit, op_unpivot_roundtrip —
    # see the inline notes at each swap), the nineteen operators added
    # after the final round-7 rotation (dedup_prefix_cosine_pairs,
    # op_skyline_suppliers, ev_ewma_control, op_sample_weighted_ares,
    # sim_hard_negatives, op_graph_label_prop, pipeline_greedy_coverage,
    # text_zipf_ols, op_profile_entropy, op_winsorize_quantity,
    # ev_peak_concurrency, op_j_interval_overlap, ev_pattern_match,
    # op_quantile_normalize_lengths, q_item_item_similarity,
    # op_sample_neyman, op_split_source_holdout,
    # op_bootstrap_ci_mean_len, op_ks_drift_by_source —
    # all never driver-witnessed, first in line), plus the
    # remaining 31 round-3 entries
    # (op_j_inner_chain, op_a_rollup, text_lang_id, text_tfidf_top_terms,
    # text_unigram_logprob, pipeline_curate_corpus, sim_ivf_topk,
    # sim_quantized_topk, op_grouped_agg_weighted_avg,
    # op_asof_join_prev_purchase, text_pii_redact, op_udtf_token_explode,
    # text_repetition_stats, text_segment_dedup, text_bigram_logprob,
    # text_bm25_topk, text_hybrid_rrf_topk, op_expectations_check,
    # ev_funnel_signup_click_purchase, op_j_range_bucketed,
    # op_w_trailing_range_frame, op_merge_upsert_snapshot, op_cap_per_source,
    # dedup_simhash, mm_frame_sample, ev_tumbling_hourly,
    # op_sample_temperature_mix, sim_lsh_bucketed_topk, text_chunk_documents,
    # q_pricing_summary-siblings) then start on the 43 round-5 entries.
    # --- changed this round: the five reference-parity star queries ---
    "star_q1_monthly_sales",
    "star_q2_top10_parts",
    "star_q3_top5_customers",
    "star_q4_sales_by_nation",
    "star_q5_priority_popularity",
    # --- changed this round: integer-cents revenue aggregates ---
    "q_nation_pair_flows",
    "q_top_urgent_orders",
    "q_returned_item_customers",
    "q_large_volume_customers",
    # NEW round 7 (displaces q_small_qty_revenue, witnessed r06 — its
    # round-7 change is the shared _cents/_money_sum helpers, witnessed
    # by the seven sibling cents-path q_ entries in this head; it joins
    # the round-8 queue).
    "op_graph_pagerank",
    # --- last witnessed round 1 (all 12) ---
    "op_s1_scan_projection",
    "op_p2_rename",
    "op_j_semi",
    "op_j_anti",
    "op_a2_global_minmax",
    "op_a3_distinct",
    "op_a_stats_kit",
    "op_profile_columns",
    "op_w_ntile_deciles",
    "op_w_mom_growth",
    "op_f_string_kit",
    "op_f_regex_kit",
    # --- last witnessed round 2 (all 9) ---
    "op_s6_sql_over_views",
    "op_p3_dropna_after_left_join",
    "op_a1_group_concat_sorted",
    "op_o_topk_desc_tiebreak",
    "op_f_date_dim_kit",
    "op_set_union_intersect_except",
    "text_token_stats",
    "text_length_profile_by_source",  # NEW round 7 — histogram percentiles
    "sim_lsh_multiprobe_topk",
    # --- round-3 freshness block + round-7 operator swaps ---
    # Originally 13 of the 45 round-3-witnessed entries; four slots now
    # hold NEW round-7 operators (each swap annotated inline) and the
    # displaced entries joined the round-8 queue above. 8 round-3
    # entries remain in this block.
    "q_market_share_by_year",
    "q_pricing_summary",
    "q_profit_by_nation_year",
    # NEW round 7 (displaces q_promo_revenue, witnessed r03 — its only
    # round-7 change is the shared _cents/_money_sum helpers, which eight
    # other head entries witness; it joins the round-8 queue at the same
    # age the other round-7 displacements carry).
    "q_basket_copurchase_lift",
    # NEW round 7 (displaces dedup_minhash_lsh_pairs, witnessed r03 —
    # dedup_jaccard_verify exercises the same shingle/pair machinery).
    "op_snapshot_diff",
    # NEW round 7 (displaces dedup_jaccard_verify, judge-re-verified in
    # the round-6 session and queued for round 8).
    "dedup_fuzzy_prefix",
    "dedup_semantic_kmeans",  # NEW round 7 (displaces dedup_lsh_banded_pairs, witnessed r05)
    # NEW round 7 (displaces sim_topk_cosine_bruteforce, witnessed r03 —
    # the MMR candidate leg recomputes that exact brute-force top-k, so
    # the swap loses no coverage).
    "sim_mmr_rerank",
    "mm_payload_metadata",
    # NEW round 7 (displaces ev_sessionize, witnessed r03; it joins the
    # round-8 queue with the other five displaced entries).
    "ev_attribution_touch",
    "op_sample_hash_bernoulli",
    "pipeline_curation_verdict",
    # --- family-coverage fills ---
    # The sketch/outlier family slots moved to their HASH-VERIFIED members
    # (op_sketch_countmin_terms, op_outliers_mad) — the rows-only twins
    # (op_sketch_approx_stats, op_outliers_mad_tdigest) already carry
    # r04/r05 driver rows and pytest oracles, and a 50-entry window slot
    # is better spent on a hard hash check. q_sole_blame_suppliers
    # (witnessed r03) moved to the round-8 queue to make room for the
    # NEW round-7 Z-order layout pruning report.
    "op_sketch_countmin_terms",
    "op_split_stratified_exact",
    "op_scd2_priority_history",
    # NEW round 7 (displaces op_fk_orphan_audit, hash-green in r06 — the
    # freshest possible witness age; it joins the round-8 queue).
    "op_graph_triangles",
    # NEW round 7 (displaces op_unpivot_roundtrip, hash-green in r06;
    # same reasoning — a never-witnessed new operator beats an age-1
    # re-witness for the 50-entry window).
    "op_drift_psi_events",
    "op_outliers_mad",
    "op_layout_zorder_prune",  # NEW round 7
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
