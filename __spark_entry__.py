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
    # --- round-8 window rotation state ---
    # The full-registry witness sweep completed in round 6; every entry
    # has a green row in some CORRECTNESS_r*.json. This round's head, in
    # verdict-priority order:
    #   1. the 19 operators added after the final round-7 rotation —
    #      never driver-witnessed (judge-verified at sf0.01 AND sf0.1 in
    #      the round-7 session, but the hard per-round signal must see
    #      them);
    #   2. the 10 entries those operators displaced late in round 7;
    #   3. op_drift_psi_events — re-witness: its bin expression gained a
    #      lower clamp on BOTH engines this round;
    #   4. the 10 operators ADDED in round 8 (op_graph_kcore,
    #      text_ngram_novelty, op_split_time_embargo,
    #      text_vocab_oov_rate, dedup_sorted_neighborhood,
    #      op_k_anonymity, text_length_bucket_padding,
    #      mm_audio_window_plan, dedup_blocking_quality,
    #      dedup_containment_pairs) — never witnessed by definition;
    #   5. family-coverage fills (star/sketch/scd2/outliers);
    #   6. 6 of the remaining 31 round-3-witnessed entries.
    # Round-9 queue: the other round-3 entries (pipeline_curate_corpus,
    # sim_quantized_topk, op_grouped_agg_weighted_avg,
    # op_asof_join_prev_purchase, text_pii_redact,
    # op_udtf_token_explode, text_repetition_stats, text_segment_dedup,
    # text_bigram_logprob, text_bm25_topk, text_hybrid_rrf_topk,
    # op_expectations_check, ev_funnel_signup_click_purchase,
    # op_j_range_bucketed, op_w_trailing_range_frame,
    # op_merge_upsert_snapshot, op_cap_per_source, dedup_simhash,
    # mm_frame_sample, ev_tumbling_hourly, op_sample_temperature_mix,
    # sim_lsh_bucketed_topk, text_chunk_documents)
    # then the round-5-witnessed entries, oldest witness first.
    # --- 1. never-driver-witnessed round-7 operators (19) ---
    "dedup_prefix_cosine_pairs",
    "op_skyline_suppliers",
    "ev_ewma_control",
    "op_sample_weighted_ares",
    "sim_hard_negatives",
    "op_graph_label_prop",
    "pipeline_greedy_coverage",
    "text_zipf_ols",
    "op_profile_entropy",
    "op_winsorize_quantity",
    "ev_peak_concurrency",
    "op_j_interval_overlap",
    "ev_pattern_match",
    "op_quantile_normalize_lengths",
    "q_item_item_similarity",
    "op_sample_neyman",
    "op_split_source_holdout",
    "op_bootstrap_ci_mean_len",
    "op_ks_drift_by_source",
    # --- 2. the ten entries displaced late in round 7 ---
    "q_sole_blame_suppliers",
    "dedup_lsh_banded_pairs",
    "sim_topk_cosine_bruteforce",
    "dedup_minhash_lsh_pairs",
    "dedup_jaccard_verify",
    "ev_sessionize",
    "q_promo_revenue",
    "q_small_qty_revenue",
    "op_fk_orphan_audit",
    "op_unpivot_roundtrip",
    # --- 3. changed this round (PSI bin clamp, both engines) ---
    "op_drift_psi_events",
    # --- 4. NEW round-8 operators (never witnessed) ---
    "op_graph_kcore",
    "text_ngram_novelty",
    "op_split_time_embargo",
    "text_vocab_oov_rate",
    "dedup_sorted_neighborhood",
    "op_k_anonymity",
    "text_length_bucket_padding",
    "mm_audio_window_plan",
    "dedup_blocking_quality",
    "dedup_containment_pairs",
    # --- 5. family-coverage fills (star/sketch/scd2/outliers have no
    # representative above; all witnessed r7, the window rule is that
    # every family keeps one oracle-backed row in the hard signal) ---
    "star_q1_monthly_sales",
    "op_sketch_countmin_terms",
    "op_scd2_priority_history",
    "op_outliers_mad",
    # --- 6. late round-8 operators (never witnessed; displace four
    # round-3 re-witnesses, which join the round-9 queue) ---
    "op_cdc_apply_log",
    "dedup_source_overlap_matrix",
    "text_weighted_median_len",
    "ev_ab_conversion_ztest",
    # --- 7. round-3 freshness block (2 of the remaining 31) ---
    "op_j_inner_chain",
    "op_a_rollup",
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
