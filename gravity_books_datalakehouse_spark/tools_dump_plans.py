"""Regenerate PLANS.md: formatted physical plans of representative queries.

Usage: ``python -m gravity_books_datalakehouse_spark.tools_dump_plans``
(optionally ``SPARK_GRAFT_SF_DIR=... ``). Keep PLANS.md fresh after any
plan-affecting change; tests/test_plan_shape.py enforces the invariants.
"""

from __future__ import annotations

import importlib
import os
import sys

from gravity_books_datalakehouse_spark.session import get_spark

SHOW = {
    "star_q1_monthly_sales": "All dim joins are BroadcastHashJoin; scans prune to the referenced columns; partial+final HashAggregate; the calendar-bounded output ends in Coalesce(1)+local Sort — no RangePartitioning exchange or sampling job (round 7).",
    "star_q2_top10_parts": "EXCHANGE-FREE aggregate (round 7): the fact cache is hash-partitioned on part_sk, so the groupBy plans as one full HashAggregate directly over InMemoryTableScan — no partial/final split, no shuffle, no rank window; the dim-bounded counts broadcast to dim_part and TakeOrderedAndProject(10) finishes it.",
    "q_top_urgent_orders": "Priority/status predicates are pushed into the orders scan (PushedFilters) BEFORE the joins; filtered orders then broadcast.",
    "q_revenue_range_filter": "Every predicate reaches the Parquet scan; no join, no shuffle except the single-partition final agg.",
    "dedup_minhash_lsh_pairs": "Shingle construction is pure codegen (no window); shuffles only on (doc_id,shingle) distinct, (doc_id,p) minhash agg, and the band-key self-join — all digest-keyed, skew-free.",
    "sim_lsh_bucketed_topk": "Self-join keyed on the 8-bit signature (256 buckets), never an N x N cross join; per-query window top-k.",
    "ev_sessionize": "session_window stateful aggregation; single shuffle on user_id.",
    "op_asof_join_prev_purchase": "As-of join as union + one per-key window pass (no pairwise inequality-join blowup); single shuffle on user_id.",
    "q_nation_pair_flows": "Two dimension chains off one fact scan, every join broadcast; single aggregation shuffle on the nation pair.",
    "q_pricing_summary": "Scan-bandwidth-bound: 7-of-11-column ReadSchema, pushed timestamp predicate, integer-cents FLOOR projections (round 7 — no per-row decimal), partial aggregation collapses each partition to <=6 groups before one tiny shuffle.",
    "q_large_volume_customers": "ShuffledHashJoin on both fact joins (round 7 hints): the 30M-row lineitem probe side is never sorted; build sides are the HAVING-filtered heavy-orders set and its key list — no SortMergeJoin in the plan.",
    "q_order_to_ship_lag": "Discrete percentiles from the (priority, lag_days) HISTOGRAM (round 7): map-side partial agg collapses the fact to <=priorities x lags counts before one small shuffle; no ObjectHashAggregate buffering raw values.",
    "op_j_range_bucketed": "Time-range join bucketized to an equi-join on (user, 10-min epoch) — no BroadcastNestedLoopJoin anywhere; residual range predicate filters the 2x candidate fan-out.",
    "op_w_trailing_range_frame": "Daily pre-aggregation BEFORE the window: the range-frame exchange carries one row per nation x day, not one per order.",
    "text_chunk_documents": "Zero-shuffle narrow stage: sequence -> posexplode -> substring, all inside WholeStageCodegen; chunking cost is pure scan bandwidth.",
    "text_repetition_stats": "Duplicate-fraction scalars reduced BEFORE the join (no arrays through the shuffle); top-bigram mass explodes the index sequence, not the bigram array (O(1) element_at per row, not an inlined O(n^2) shingle transform).",
    "text_segment_dedup": "Duplicate set found over 16-byte segment digests; membership join co-partitioned with the count; reassembly is one collect_list per doc.",
    "text_bm25_topk": "Query-term filter sits directly on the scan before any shuffle; df/stats broadcast; TakeOrderedAndProject top-k, no full sort.",
    "pipeline_curate_corpus": "The whole filter -> dedup -> report pipeline is ONE plan: verdict join + left-anti dedup + final agg; shingle/pair frames reused from the session cache.",
    "star_q3_top5_customers": "AGGREGATE-THEN-JOIN (round 4): partial+final HashAggregate on the narrow int customer_sk, TakeOrderedAndProject(limit=5), THEN a broadcast join of the 5-row result to dim_customer — the fact never joins a dim before aggregating.",
    "op_j_skewed_salted": "Salted join: the physical join key is (skew_uid, __salt) — the hot key's rows spread across 8 salt buckets; dim side exploded x8 pre-join; aggregation after the join is salt-invariant.",
    "dedup_substring_spans": "Rolling 8-token window hashes via ONE per-doc ordered window (single doc_id shuffle); dup detection groupBy carries 16-byte digests; islands merge is a second pass over the (tiny) duplicated-position set.",
    "op_sample_exact_k": "TakeOrderedAndProject(limit=k) over the hash projection — per-partition k-row heaps merged on the driver; no global sort, no full shuffle at any corpus size.",
    "text_substring_dedup_rewrite": "Difference-array rewrite (round 11): owned flag via ONE whash window min; each dup window emits 2 edge events (never k coverage rows); per-doc running sums turn events into removed intervals, gaps-and-islands merges them; reassembly is an index-filter over the token ARRAY against the per-doc merged interval list — no token explode, no anti-join, no collect_list.",
    "sim_ann_recall_report": "Both eval legs bounded: |Q| probes broadcast for exact ground truth; candidate leg reuses the signature-keyed bucket join — no N x N anywhere.",
    "pipeline_epoch_shuffle": "Rank windows partitioned by (epoch, hex-nibble shard) — corpus/16 rows per window, no global sort; hash projection is scan-side.",
    "op_layout_zorder_prune": "Morton derivation is pure shift/mask projection inside WholeStageCodegen (round 7); both layouts ride one explode into a map-side-collapsing HashAggregate on <=128 (layout, file) cells; 2-column ReadSchema; no sort, no window, exchanges carry aggregated cells only.",
    "dedup_semantic_kmeans": "The (id, vec, cluster, norm) assignment is checkpointed once, hash-partitioned on cluster_id (the scan below is that materialization; the zero-shuffle argmin fold ran before it); the candidate self-join keys on cluster_id (within-cluster pairs only, never N x N), pair cost is one dot fold (norms precomputed per vector); the report aggregates to k rows.",
    "sim_mmr_rerank": "Candidate leg = the bounded-query broadcast (no corpus shuffle); every later frame is |Q| x 12 or smaller, so the 5 unrolled greedy steps are tiny-stage joins/windows independent of corpus size (round 7).",
    "op_snapshot_diff": "CDF report: one full outer join keyed on the table key (hash-partitioned both sides, broadcast-free at any SF) + a map-side 4-group aggregate over the change classification (round 7).",
    "dedup_fuzzy_prefix": "Entity-resolution blocking: the self-join keys on the 4-char block prefix (equi-join shuffle, never a cross product); banded Levenshtein runs JVM-side inside codegen on the bounded within-block pairs (round 7).",
    "ev_attribution_touch": "ONE user_id window pass computes both touches (first/last share a WindowExec over the same RANGE frame); the explode doubles only purchase rows and the aggregate collapses map-side to <=10 cells (round 7).",
    "q_basket_copurchase_lift": "Basket-explode pair generation (narrow, bounded by basket^2 — no self-join of the item set); the single fact materialization (baskets localCheckpoint) feeds pair counts, marginals, and n_orders, so lineitem never re-scans; min-support filter sits ON the pair aggregate before any join; TakeOrderedAndProject(50) finishes (round 7).",
    "op_graph_pagerank": "Stationary adjacency: edges+degree checkpointed once (the ExistingRDD scans), so each of the 5 sweeps shuffles ONLY the node-sized rank vector into the edge partitioning; N rides a broadcast one-row aggregate; final TakeOrderedAndProject(20) (round 7).",
    "op_graph_triangles": "Compact-forward u<v<w: two vertex-keyed equi-joins over the canonical checkpointed edge list — no direction-doubled wedges, no cross join; per-node rollup is a 3|T|-row explode into a map-side-collapsing count (round 7).",
    "dedup_prefix_cosine_pairs": "PPJoin prefix filter: the candidate self-join keys on the RAREST ~36% of each bigram set (df-ascending prefix) — frequency ordering IS the anti-skew device; no dense global token rank (per-doc windows only), size-feasibility folded into the join, verify counts overlap on candidates only; no cartesian anywhere (round 7).",
    "op_skyline_suppliers": "ONE fact shuffle (groupBy l_suppkey) reduces lineitem to a supplier-dim frame; the Pareto sweep is two window minima over that bounded frame (desc RANGE frame for strictly-higher revenue + equal-revenue partition min) with exact integer dominance keys; broadcast name join; bounded sort (round 7).",
    "ev_ewma_control": "Events collapse map-side to (type, hour) cells — the only event-sized stage; spine join and all 24 lag reads ride ONE per-type sort on the bucket-cardinality frame; the alert rule is exact bigint comparison, no float on the decision path (round 7).",
    "op_sample_weighted_ares": "A-Res weighted top-k as TakeOrderedAndProject over a per-row projection (hash, ln, divide): per-partition k-heaps merged on the driver — no shuffle, no global sort, O(k) driver memory (round 7).",
    "sim_hard_negatives": "Bounded query side broadcasts against ONE corpus scan; positives and negatives are two aggregations of that joined stream re-joined on the |Q|-row key; margins/flags from bit-identical cosine folds (round 7).",
    "op_graph_label_prop": "Stationary checkpointed edges; per sweep only the node-sized (node,lab) vector shuffles, then a two-phase (dst,lab) count and a dst-partitioned argmax window; pure integer updates — zero float surface (round 7).",
    "pipeline_greedy_coverage": "Each greedy step: one pass over the cached shingle table with two broadcast-sized anti-joins (selected docs, covered shingles) and a 1-row TakeOrderedAndProject argmax; selected/covered checkpointed per step so the lineage stays flat (round 7).",
    "text_zipf_ols": "Token-frequency groupBy is the only corpus-sized stage (map-side partial agg); rank window and the six sufficient-statistic SUMs run on <= langs x 100 rows — one-pass distributed OLS, no solver (round 7).",
    "op_winsorize_quantity": "Fact scans ONCE into the checkpointed (flag, qty) histogram; thresholds (cume window) and clamped means both read the metadata-sized ExistingRDD — zero parquet rescan, zero per-row buffering (round 7).",
    "ev_peak_concurrency": "Sweep-line with a distributed prefix sum: day-partitioned running windows over the session-boundary stream + a calendar-bounded carry window; no global sort of the boundary stream anywhere (round 7).",
    "op_j_interval_overlap": "Range x range join as a lossless hour-bucket equi-join (overlap => shared covered hour) + residual overlap predicate + pair DISTINCT — no BroadcastNestedLoopJoin; the oracle states the direct inequality join (round 7).",
    "ev_pattern_match": "One session_window aggregation builds the event-initial strings (per-session array_sort inside the aggregate row); the three regex counts ride one pass over the session-cardinality frame, stacked by an in-row explode (round 7).",
    "op_quantile_normalize_lengths": "Per-source rank windows distribute on source; the value-domain-bounded pooled cumulative histogram rides as a broadcast literal array into an in-row integer lookup — zero joins, zero extra shuffles; all mapping decisions integer-exact (round 7).",
    "q_item_item_similarity": "Basket-explode pair counts + order-frequency off one distinct (order,part) projection; the top-20 query list broadcasts into the scored join so the rank window partitions on <=20 keys; cosine is IEEE divide+sqrt on exact integers — engine-exact ranking (round 7).",
    "op_sample_neyman": "One stats aggregate (map-side partial, strata-sized), allocation arithmetic + largest-remainder window on the STRATA-bounded frame, broadcast allocation into the per-stratum md5-order rank window; only full-data stages are the stats agg and the rank window (round 7).",
    "op_bootstrap_ci_mean_len": "Poisson-bootstrap replica explode is a narrow xB projection collapsing map-side to B partial rows per task (never Bx the data through the exchange); the replica-mean frame is B rows; integer Sw/Swx sums make every replica mean engine-exact (round 7).",
    "op_ks_drift_by_source": "Two value-histogram aggregates (map-side collapsing, domain-sized) + per-source cumulative windows; source EDFs back-fill via last(ignorenulls) onto the strata x domain spine — never corpus-sized; sup/argmax/flag all integer selections (round 7).",
    "op_graph_kcore": "Fixed-4-sweep peeling: edges checkpointed once; each sweep is one degree aggregate (node-sized) + two left-semi endpoint filters, edges shrink monotonically; pure integer math, TakeOrderedAndProject(20) (round 8).",
    "dedup_sorted_neighborhood": "SNM: rank windows partition by the 2-char key prefix (no unpartitioned row_number); the W-window self-join keys on the bucket with a rank-range residual — W-1 candidates per record regardless of key skew; banded Levenshtein inside codegen (round 8).",
    "dedup_containment_pairs": "Asymmetric containment prefix: A's rarest floor(|A|/10)+1 interned-long tokens probe B's FULL relation; size feasibility (10|B|>=9|A|) folds into the candidate join; verify is one in-row long-array intersect per pair with explicit-count stage widths (round 8).",
    "text_ngram_novelty": "One distinct 5-gram build (shared sliding-window form), vocabulary-sized df aggregate, gram-keyed join back, then per-doc and per-source rollups — grams shuffle once as strings, counts after (round 8).",
    "text_vocab_oov_rate": "Vocabulary = TakeOrderedAndProject(500) over the token-count aggregate (distributed top-V, no global rank window), then BROADCAST into the tagging join; per-source rollup strata-sized (round 8).",
    "dedup_blocking_quality": "Ground truth is a documented bounded all-pairs over the 30% md5 SAMPLE only (BroadcastNestedLoop by design); both candidate legs replay the production blocking rules on the sample; metrics join truth on the pair key (round 8).",
    "op_cdc_apply_log": "ONE window pass partitioned by the key: last-writer-wins rank and op count share the partitioning, so the log shuffles once and every key folds independently; delete tombstones filter post-rank (round 8).",
    "dedup_source_overlap_matrix": "Corpus collapses to the DISTINCT (source, shingle) relation before the token-keyed self-join — cost bounded by vocabulary x sources-per-shingle^2, never document count; |S|(|S|-1)/2 output rows (round 8).",
    "text_weighted_median_len": "Map-side collapse to the (source, length) histogram carrying BOTH doc count and token weight; one per-source cumulative window over histogram rows; both medians integer cross-multiplied selections (round 8).",
    "ev_ab_conversion_ztest": "One scan -> per-user two-flag rollup -> 2-row arm aggregate -> single-row pivot; the significance flag is a DECIMAL(38) integer comparison, no float on the decision path (round 8).",
    "pipeline_token_budget_mix": "One map-side per-source aggregate + one STRATA-sized running-sum window (|sources| rows, bounded at any corpus size) + broadcast scalar total; allocation CASE is pure integers (round 8).",
    "dedup_multiplicity_histogram": "Two map-side-collapsing aggregates over 16-byte content fingerprints; text never shuffles; output bounded by the largest multiplicity (round 8).",
    "dedup_bloom_prefilter": "Hand-built broadcast bloom: the corpus bitset rides as ONE constant-folded 2048-long array literal; the batch tests k=3 bits map-side off the scan and only survivors reach the exact verify semi-join — no false negatives, output FP-free (round 9).",
    "dedup_snm_multipass": "Both SNM passes are the rank-block banded join (linear per bucket); candidate union is pair-sized; the matcher verifies on the ORIGINAL key via doc_id joins — keys, never text, through the shuffles (round 9).",
    "ev_watermark_lateness_profile": "Two-pass distributed prefix max: in-bucket running max windows partition on the 256 ordered hash buckets; the carry is a running max over the tiny bucket-max relation, broadcast back — no single-task global window over events; percentiles on the late-subset histogram (round 9).",
    "op_gini_revenue_concentration": "One lineitem shuffle (groupBy suppkey) to exact integer-cents revenues; broadcast supplier/nation lookups; the rank window partitions per nation over SUPPLIER rows; decimal-exact rank-weighted sums, one double fold at the end (round 9).",
    "sim_label_separation_matrix": "Centroid relation is labels x dims (model-state-sized) after one posexplode aggregate; the pairwise self-join keys on the dimension index over that tiny frame — vectors never pair (round 9).",
    "op_split_leakage_near_dup": "Split tags are per-row md5 projections of the cached LSH pair ids — no documents join anywhere; rollup is <=6 cells and the share window runs over those cells (round 9).",
    "ev_cumulative_new_users": "First-seen collapse: ONE groupBy(user_id) is the only corpus-sized stage (map-side partial agg), then a day-histogram running sum — never a COUNT(DISTINCT) OVER (round 9).",
    "op_incremental_agg_maintenance": "Both partial aggregates collapse map-side; the merge exchange carries 2x|months| partial rows regardless of fact size — the partial/final HashAggregate algebra made explicit (round 9).",
    "sim_ivf_nprobe_curve": "All four nprobe levels read the SAME ranked probe frame and the same brute-force truth leg (|Q|-bounded); curve rows are conditional sums — no per-level re-scan of anything (round 9).",
    "text_quality_signal_corr": "One scan computes all four integer signals map-side; ONE aggregate carries the 15 DECIMAL(38) sufficient statistics (each partition collapses to a single partial row); the 6 output rows are constant-space projections (round 9).",
    "ev_time_weighted_avg_value": "ONE user-partitioned lead window (the sessionize shuffle) emits integer holding seconds; units x dt accumulates in decimal inside a |types|-row aggregate — no second pass, no float on the accumulation path (round 9).",
    "ev_top_session_paths": "Session boundaries, ranks, and the first-3 filter ride the SAME user_id partitioning; paths aggregate per session (rank-ordered array_sort inside the row), histogram + TakeOrderedAndProject(15) finish (round 9).",
    "q_customer_segment_migration": "One orders scan -> customer-period groupBy; both ntile windows sort the CUSTOMER-cardinality frames, never order rows; the migration join keys on customer id and the rollup is 25 cells (round 9).",
    "dedup_lsh_quality_report": "Sample-filtered shingle relation feeds BOTH legs; the exhaustive truth stage is the documented bounded sample-only all-pairs; candidates replay the production band join on the sample (round 8).",
    "op_kl_divergence_matrix": "One scan to (source, value) cells; the pair grid is |S|^2/2 x |domain| rows (domain-bounded at any corpus size); broadcast fills for absent cells keep the smoothing exact (round 8).",
    "mm_image_tile_plan": "Metadata projection -> integer tile counts -> two nested sequence explodes; rows proportional to image area over tile area, co-partitioned with the payload scan (round 8).",
    "op_fd_violation_audit": "Per FD one map-side two-phase distinct-count aggregate + a 1-row rollup; four legs union to a 4-row report (round 8).",
    "text_compression_ratio": "ONE ArrowEvalPython stage computes the zlib ratio map-side off the scan (payloads never shuffle); strata-sized rollup - the vectorized-UDF quality-filter shape (round 8).",
    "dedup_clusters_connected_components": "Exact-dedup-FIRST composition: the iterative large-star/small-star fixpoint runs on the COLLAPSED rep-level pair graph (ExistingRDD scans = the checkpointed rounds); the corpus-sized stage is one md5-group map join expanding rep labels back to docs — the k-clique mass of verbatim duplication never reaches the CC join (round 10).",
    "dedup_pair_graph_compression": "Two single-row aggregates (groups, rep pairs x multiplicities) + a single-row crossJoin; the oracle recomputes n_doc_pairs from first principles so a green hash IS the expansion-arithmetic proof (round 10).",
    "sim_pq_distortion_report": "Encode = one map-side pass against the broadcast 64-row codebook, collapsed by partial agg to M rows/vector; per-row self-dots carried so the per-pair expression is one fold + two flops; both ranking legs |Q|-bounded brute force (round 10).",
    "dedup_lsh_s_curve_calibration": "Sample-filtered shingles feed one interned-set groupBy and one wide minhash pass; the checkpoint-pinned relation self-joins via broadcast nested loop (sample-bounded by design); deciles decided in pure integers; 10-row rollup (round 10).",
    "pipeline_packing_efficiency_curve": "ONE documents scan collapses map-side to the token-length histogram; all four context lengths aggregate the histogram in one wide row, melted by a single explode — no per-level union, no re-scan (round 10).",
    "op_join_skew_diagnosis": "Per relation: one key-hashed groupBy (partial agg absorbs the hot key), percentiles over the value-domain-bounded count HISTOGRAM (never a key-cardinality window), top-10 mass via TakeOrderedAndProject; single-row crossJoins finish (round 10).",
    "op_sketch_hll_distinct": "Register build is one (type, bucket) groupBy with max — every partition contributes at most m rows per type to the exchange (HLL mergeability as the partial/final split); zero registers counted arithmetically, no spine join; the float surface is one shared-literal divide (round 10).",
    "dedup_dbscan_density_clusters": "Exact-dedup-FIRST density clustering: degree, core filter, core-core CC fixpoint, and border attachment all run on the REP-level graph (the ExistingRDD scans are the checkpointed CC rounds); the only corpus-sized stage is the md5-group expansion join at the end — verbatim k-cliques never reach any join (round 10).",
    "sim_silhouette_by_label": "Centroids collect once as model state and re-enter as a literal array (the kmeans _assign idiom): the per-vector a/b pass is a zero-shuffle narrow map stage — transform() evaluates each centroid fold exactly once per row; the final aggregate carries |labels| rows (round 10).",
    "sim_ivfpq_recall_report": "IVF candidate restriction (broadcast probes keyed on cluster_id) composed with PQ ADC: the encode and assignment passes are map-side against broadcast model state; the checkpointed candidate set is nprobe/k of the corpus and everything after it is |Q|-bounded; truth is the sample-bounded brute-force leg (round 10).",
    "ev_markov_stationary": "Corpus-sized stages are ONE user-partitioned lag window (a separate collected model job) and the empirical-share aggregate in the returned plan; the |types|^2 transition matrix collects once as model state and the 5 power sweeps run driver-side (the centroids-as-literals idiom) — the readout joins two broadcast literal frames, no iterative sweep stage (round 12; 20x events probe 2.79 -> 2.05 s).",
    "sim_knn_reciprocity": "Sample-bounded self-join (|S|^2 pairs, the measurement's intrinsic cost) -> one |S|-partition top-k window -> reversed-key self-join of the k|S|-row checkpointed top relation -> one-row aggregate; nothing corpus-sized beyond the sampled scan (round 10).",
    "dedup_density_stability_profile": "Fixpoint-FREE threshold sweep: border-ness reduces to max-adjacent-group-degree arithmetic (two rep-sized joins), the 5 thresholds ride one in-row explode, and the aggregate is 5 rows — no iteration, no corpus-sized stage; the per-threshold topology deliberately lives in the single-fixpoint DBSCAN op (round 10).",
    "dedup_optics_eps_profile": "Varying-eps sweep with zero fixpoints: ONE exact-Jaccard pass over the checkpointed rep pairs (post-LSH bounded), 6 tau levels ride an in-row explode, degrees/border-ness are the group-degree lemma per level (two rep-sized joins), doc counts return as multiplicity-weighted sums — no corpus-sized stage beyond the cached collapse (round 11).",
    "ev_seasonal_ewma_control": "Events collapse map-side to (type, hour) cells — the only event-sized stage; the spine fill and ALL 31 lag reads (24 level + 7 seasonal) come from ONE per-type ordered WindowExec over the bucket-cardinality frame; every alert decision is bigint comparison (round 11).",
    "pipeline_temperature_mixture": "One zero-shuffle size(split) projection + one groupBy(source) to a source-cardinality frame; the temperature table is two sqrt projections and ordered running-sum windows over ~20 rows — the mixture sweep costs one scan at any corpus size (round 11).",
    "op_graph_global_stats": "One basket-explode pair build feeds the compact-forward triangle join (u<v<w), the degree rollup, and one edges x degrees join for the Pearson moment sums; three scalar aggregates crossJoin into the single output row — every stage keys on a vertex (round 11).",
    "ev_change_point_cusum": "Control-chart spine (map-side hourly collapse, the only event-sized stage); prefix sums, totals, and the argmax all ride per-type windows over the bucket-cardinality frame; the CUSUM deviation |N*prefix - i*T| stays bigint so the pick is an integer decision (round 11).",
    "pipeline_mixture_diversity": "One scan to source cardinality; squares/sums/divisions over ~20 rows with every float sum an ORDER BY source running window — no logarithm anywhere on the plan (round 11).",
    "ev_seasonality_strength": "Hourly collapse + 24-group sufficient statistics per type; SSB assembles the per-group S^2/n divisions in an hod-ordered running-sum window so the float composition is pinned; one row per type (round 11).",
    "ev_cusum_online": "Control-chart spine again; the sequential-CUSUM recursion rides TWO ordered windows over the bucket-cardinality frame (running drift sum, running min of it — the reflection identity), sharing one per-type sort; warmup baseline is a broadcast-sized join (round 11).",
    "text_kn_bigram_logprob": "Four map-side-combined groupBys over ONE exploded bigram stream (bigram, context+forward-continuation, backward-continuation, type scalar); scoring joins stay keyed on bigram/context/word; per-doc rollup finishes — the add-one twin's profile plus one broadcast scalar and one co-keyed join (round 11).",
    "text_kn_trigram_logprob": "Five map-side-combined groupBys over ONE exploded trigram stream; the trigram-type total B aggregates to a broadcast scalar crossJoin (round 12 — replacing the unpartitioned vocab-sized window fold; the only SinglePartition exchange left is the scalar aggregate's one-row-per-partition final fold, pinned by a plan test); every scoring join keys on a gram or word.",
    "ev_markov_attribution": "Corpus-sized stages: one user-partitioned session window and one session-partitioned lead pass; the journey transition matrix collects once as model state and the base + 4 channel-removed K=8 absorption chains run driver-side — the returned frame is one 4-row literal (round 12).",
    "sim_matryoshka_truncation": "Bounded |Q| queries broadcast against ONE corpus scan with per-vector truncated norms precomputed per row; the 4 dim levels ride an in-row explode of per-pair prefix dots; everything after the per-(dim, qid) window is |Q| x 4-sized (round 12).",
    "ev_autocorrelation_seasonal": "Control-chart spine (map-side hourly collapse); residuals and all three lag leads come from ONE ordered window pass per type over the bucket-cardinality frame; per-type aggregate finishes — every residual an exact scaled integer (round 12).",
    "ev_attribution_models": "The shared journey window chain (session numbering, then rank/lead/first-purchase-min on one session exchange) plus a single map-side-combined groupBy to |channels| rows — every model credit is a per-row closed form, so there is no join and no model state (round 12).",
    "op_sketch_hll_merge_days": "Day-partial registers from one (type, day, bucket) groupBy with max (partial agg caps each partition at days x m rows per type), max-merged to m rows per type; the mismatch audit is a register-keyed full outer join of two model-sized relations; exact-distinct leg kept for the error readout (round 12).",
    "dedup_cluster_extraction": "Excess-of-mass flat clustering over the shared cascade checkpoint: nodes/parents are cluster-count frames; the S* DP runs one label-keyed join per death level descending and the coverage descent one per level ascending (max 11 model-sized joins, each localCheckpointed) — no driver-side tree walk, scores never leave integer tenths (round 12).",
    "dedup_cluster_persistence": "HDBSCAN-style condensed tree over the tau grid: ONE contracted CC pass per level exploiting edge-set nesting — each level's NEW rep edges (stamped once with their max passing level, pure-integer test) map through the current labels so the fixpoint runs on a strictly shrinking remainder and is skipped when a level adds no cross-component edge; masses expand by group multiplicity; output is cluster-count rows (round 12).",
    "op_sample_stratified_weighted": "Per-row A-Res key projection (hash, ln, divide) then ONE lang-partitioned rank window and a filter — no global sort, no TakeOrderedAndProject funnel; the strata x k output ends in Coalesce(1)+local sort (round 13).",
    "op_drift_wasserstein_by_source": "Two histogram aggregates collapse the corpus map-side to domain-sized outputs; per-source cumulative window + the strata x domain spine fill (last ignorenulls); W1 numerator sums exact decimal(38,0) segment products in one map-side-combined groupBy per source — the KS plan with a SUM where KS ranks (round 13).",
    "ev_survival_km_error_budget": "One per-user aggregate + one user-partitioned rank window (budget exhaustion), then the USER-histogram duration spine: cumulative risk-set window, log-sum KM fold, and |horizons| x spine broadcast picks — corpus touched exactly twice, everything after is histogram-sized (round 13).",
    "ev_attribution_decay_sweep": "The shared journey window chain plus a 3-way in-row explode (never a join) and one map-side-combined groupBy to 3 x |channels| rows — dyadic bases keep every power an exact double (round 13).",
    "ev_survival_na_bands": "The KM plan with two extra per-row terms riding the SAME ascending-time frame folds (hazard and Greenwood increments beside the log-survival sum) — no new shuffle, no new scan; horizon picks stay |horizons| x spine broadcast joins (round 13).",
    "ev_survival_rmst": "The KM histogram spine with a LEAD segment width; the horizon clip is a |horizons| x spine broadcast join feeding one map-side-combined SUM — the integral costs one small join more than the point estimate (round 13).",
    "ev_drift_w1_weekly": "One (user, week) aggregate collapses the corpus map-side, then the op_drift_wasserstein_by_source template with weeks as strata: count-histogram domain (single small task), per-week cumulative window, weeks x domain broadcast spine, exact decimal(38,0) segment sums per week (round 13).",
    "ev_survival_competing_risks": "The KM plan plus one more per-user aggregate (first purchase); the Aalen-Johansen left-limit S and both CIF folds ride the SAME ascending-time histogram windows, with a dead-risk-set flag replacing the undefined LN(0) by an exact 0.0 (round 13).",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = importlib.import_module("__spark_entry__").queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    with open(os.path.join(repo, "PLANS.md"), "w") as out:
        out.write(
            "# PLANS — physical plans of representative queries"
            f" ({os.path.basename(sf_dir)})\n\n"
            "Generated by `python -m gravity_books_datalakehouse_spark."
            "tools_dump_plans`\n(re-run after plan-affecting changes). What"
            " to look for, per query, is\nnoted inline; "
            "`tests/test_plan_shape.py` asserts the load-bearing\n"
            "properties so they cannot regress silently.\n\n"
        )
        for name, note in SHOW.items():
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
            out.write(f"## {name}\n\n{note}\n\n```\n{plan}\n```\n\n")


if __name__ == "__main__":
    main()
