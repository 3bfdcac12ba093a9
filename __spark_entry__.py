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
    # --- round-11 window rotation state ---
    # Priority order (the standard never-witnessed/changed-first
    # discipline, executing the round-10 verdict's item-2 queue):
    #   1. operators ADDED in round 11 — never witnessed (each already
    #      differentially verified at sf0.001/sf0.01/sf0.1 this round):
    #      dedup_optics_eps_profile (varying-eps density sweep),
    #      ev_seasonal_ewma_control (Holt-Winters-flavored seasonal
    #      chart, with a streaming GroupState twin pinned bit-equal in
    #      tests/test_streaming.py), pipeline_temperature_mixture,
    #      op_graph_global_stats, dedup_bloom_fpr_calibration,
    #      ev_change_point_cusum (exact-integer CUSUM argmax),
    #      pipeline_mixture_diversity (log-free inverse-Simpson),
    #      ev_seasonality_strength (hour-of-day ANOVA eta-squared),
    #      text_kn_bigram_logprob (interpolated Kneser-Ney),
    #      ev_cusum_online (sequential CUSUM via the reflection
    #      identity, with streaming_cusum_alerts as the FIFTH
    #      batch/stream twin), and text_kn_trigram_logprob (the full
    #      Chen-Goodman trigram recursion);
    #   2. operators whose PLAN changed in round 11 and must re-hash:
    #      text_substring_dedup_rewrite (difference-array interval
    #      rewrite — also the oldest remaining round-6 witness),
    #      ev_markov_stationary (left-join readout hardening), and the
    #      four IVF consumers now sharing the memoized assignment
    #      (sim_ivf_topk, sim_ivf_cluster_stats, sim_ivf_nprobe_curve,
    #      sim_ivfpq_recall_report);
    #   3. the ENTIRE remaining round-5 block (26 entries — the oldest
    #      witnesses in the registry; sim_ivf_cluster_stats already
    #      sits in group 2): the round-10 verdict's written queue
    #      (ev_anomaly_hourly_zscore, dedup_rate_by_source,
    #      sim_range_search, dedup_embedding_near_dup,
    #      ev_retention_cohorts, pipeline_mixture_manifest), the 6
    #      tail entries displaced in round 10, then the rest — this
    #      also refreshes the stale no_oracle driver rows for the
    #      rows-only quartet (mm_decode_features,
    #      op_sketch_approx_stats, sim_pca_project,
    #      op_outliers_mad_tdigest), so the window is 46/50 hard-hash
    #      by design this round;
    #   4. family fills so EVERY family keeps >=1 row in the window
    #      (tests/test_entry_contract.py pins this), chosen
    #      oldest-witness-first inside each family:
    #      star_q3_top5_customers (r7), op_scd2_priority_history (r9),
    #      op_graph_triangles (r7), op_drift_psi_events (r10, sole
    #      drift entry), op_split_train_eval (r6),
    #      op_j_left_nulls_kept (r6), op_a_cube (r6),
    #      op_f_array_kit (r6), mm_center_embeddings_per_label (r6,
    #      the oldest ORACLE-BACKED mm witness — mm_decode_features
    #      alone would leave the family rows-only);
    #   5. round-6 witnesses oldest-first to fill the remaining
    #      slots (q_revenue_range_filter and op_pivot_event_counts
    #      yielded theirs to the two late-round-11 additions,
    #      pipeline_temperature_mixture and op_graph_global_stats —
    #      both join the round-12 queue head).
    # Round-12 queue, in order: q_revenue_range_filter,
    # op_pivot_event_counts, op_w_running_total,
    # op_j10_differing_key_names, op_w_topn_per_group,
    # op_p4_p5_casts, op_where_filter_pushdown, ev_sliding_windows,
    # and ev_rolling_7d_active_users (displaced by the late-round-11
    # additions — the ev family keeps 8 other window rows), then the
    # remaining
    # round-6 block
    # (text_quality_scores, text_fingerprint, text_top_bigrams,
    # text_lang_confusion, dedup_exact, pipeline_contamination_by_source,
    # op_sample_rebalance_langs, pipeline_epoch_shuffle,
    # sim_ann_recall_report, op_asof_join_tolerance, sim_kmeans_refine,
    # ev_funnel_time_to_convert, ev_user_ltv_topk,
    # ev_type_transition_matrix, q_customer_rfm_segments,
    # q_revenue_pareto, q_order_to_ship_lag, q_important_part_value,
    # q_late_shipment_priority, q_customer_order_distribution,
    # q_part_supplier_counts, q_idle_rich_customers, op_percentiles_exact,
    # op_pivot_event_counts if displaced, q_heavy_suppliers_semi,
    # text_compression_ratio), then round-7 witnesses oldest-first,
    # keeping the one-oracle-row-per-family contract test green.
    # --- 1. NEW round-11 operators (never witnessed) ---
    "dedup_optics_eps_profile",
    "ev_seasonal_ewma_control",
    "pipeline_temperature_mixture",
    "op_graph_global_stats",
    "dedup_bloom_fpr_calibration",
    "ev_change_point_cusum",
    "pipeline_mixture_diversity",
    "ev_seasonality_strength",
    "text_kn_bigram_logprob",
    "ev_cusum_online",
    "text_kn_trigram_logprob",
    # --- 2. plan changed in round 11 — re-witness ---
    "text_substring_dedup_rewrite",
    "ev_markov_stationary",
    "sim_ivf_topk",
    "sim_ivf_cluster_stats",
    "sim_ivf_nprobe_curve",
    "sim_ivfpq_recall_report",
    # --- 3. the remaining round-5 block (oldest witnesses) ---
    "ev_anomaly_hourly_zscore",
    "dedup_rate_by_source",
    "sim_range_search",
    "dedup_embedding_near_dup",
    "ev_retention_cohorts",
    "pipeline_mixture_manifest",
    "ev_anomaly_hourly_zscore_gapfill",
    "ev_json_props_extract",
    "ev_type_value_stats",
    "mm_decode_features",
    "op_sketch_approx_stats",
    "op_w_value_functions",
    "q_local_supplier_volume",
    "q_min_cost_supplier",
    "q_priority_with_returns",
    "q_top_supplier_revenue",
    "sim_label_centroids",
    "sim_lsh_bucket_stats",
    "sim_pca_project",
    "text_bpe_pretokenize_stats",
    "text_quality_percentile_cut",
    "text_vocab_growth",
    "op_outliers_mad_tdigest",
    "op_sample_importance_by_quality",
    # --- 4. family-coverage fills (oldest witness per family) ---
    "star_q3_top5_customers",
    "op_scd2_priority_history",
    "op_graph_triangles",
    "op_drift_psi_events",
    "op_split_train_eval",
    "op_j_left_nulls_kept",
    "op_a_cube",
    "op_f_array_kit",
    "mm_center_embeddings_per_label",
    # --- 5. round-6 witnesses oldest-first ---
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
