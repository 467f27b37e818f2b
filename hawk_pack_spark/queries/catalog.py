"""The query catalog: every driver-checkable operator, Spark + DuckDB oracle.

Each entry pairs a DataFrame program (the engine under test) with an
ANSI-SQL oracle DuckDB runs on the same parquet. The driver hash-compares
values order-insensitively, so parity conventions are strict:

- Money/quantity sums: cast to DECIMAL(18,2) per row, sum exactly, cast
  the total to DOUBLE — bit-identical in both engines at scale ≤ 2.
- Wide-decimal sums (the scale-8 disc_price/charge family): the direct
  DECIMAL→DOUBLE cast is NOT correctly rounded in at least one engine
  once the numerator exceeds 53 bits (one-ULP divergence observed at sf1
  magnitudes), and renormalizing the decimal scale creates half-way TIES
  that the engines round differently. The discipline is a STRING hop:
  `.cast("string").cast("double")` / `CAST(CAST(x AS VARCHAR) AS
  DOUBLE)` — decimal→string is exact in both engines and string→double
  is correctly rounded in both, so the doubles are bit-identical at any
  magnitude, with no tie hazard.
- Ratios/averages: exact-decimal numerator cast to DOUBLE, divided by the
  COUNT — one double division of identical operands.
- Derived doubles (distances, scores): computed with the same
  left-to-right fold in both engines, then ROUND(x, 6).
- String→int hashing: first 15 hex chars of md5 → BIGINT (`hash64`),
  identical in Spark (`conv`) and DuckDB (hex cast).
- Seconds: floor-truncated epoch in both engines.
- Every computed column aliased identically on both sides.

Queries cover SURVEY.md §2's inventory: the LinearDb/exact-kNN surface
(§2.5, §2.12), queue semantics as group-wise top-k (§2.2), plus the
north-star relational/text/dedup/similarity operators (§2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from hawk_pack_spark.queries._shared import (  # noqa: F401
    QuerySpec,
    _avg_exact,
    _charge,
    _dec_sum,
    _disc_price,
)
from hawk_pack_spark.sources import load_table  # noqa: F401

from hawk_pack_spark.queries.catalog_relational import (  # noqa: F401
    Q01_SQL,
    Q03_SQL,
    Q05_SQL,
    Q_MONTHLY_SQL,
    Q_NO_ORDERS_SQL,
    Q_PART_SQL,
    Q_ROLLUP_SQL,
    Q_TOP3_SQL,
    q01_pricing_summary,
    q03_shipping_priority,
    q05_local_supplier_volume,
    q_customers_without_orders,
    q_orders_monthly,
    q_part_brand_stats,
    q_rollup_returnflag,
    q_top3_orders_per_customer,
)
from hawk_pack_spark.queries.catalog_events import (  # noqa: F401
    ABOVE_AVG_SQL,
    ASOF_SQL,
    BIG_CUST_SQL,
    PIVOT_SQL,
    QUANTILE_SQL,
    Q_EVENTS_HOURLY_SQL,
    Q_EVENTS_JSON_SQL,
    Q_SESSION_SQL,
    REGEX_SQL,
    SET_OPS_SQL,
    SLIDING_SQL,
    STRING_AGG_SQL,
    q_asof_last_purchase,
    q_big_customers,
    q_events_hourly,
    q_events_json,
    q_nation_customer_agg,
    q_order_status_pivot,
    q_part_type_regex,
    q_parts_above_brand_avg,
    q_quantiles_by_segment,
    q_sessionization,
    q_set_ops_nations,
    q_sliding_window_counts,
)
from hawk_pack_spark.queries.catalog_text import (  # noqa: F401
    CURATION_SQL,
    HASH_EMB_SQL,
    Q_DEDUP_SQL,
    Q_FP_SQL,
    Q_LANG_SQL,
    Q_QUALITY_SQL,
    Q_TOKEN_SQL,
    ROLLING_FP_SQL,
    RUNNING_SQL,
    _LANG_STRUCTS,
    _Q_EXPR_SQL,
    _SW,
    q_curation_pipeline,
    q_customer_running_totals,
    q_doc_fingerprint,
    q_doc_hash_embedding_knn,
    q_doc_quality,
    q_doc_token_stats,
    q_exact_dedup_docs,
    q_lang_id,
    q_rolling_fingerprint,
)
from hawk_pack_spark.queries.catalog_vector import (  # noqa: F401
    CUSTOM_METRIC_SQL,
    DOC_QUANTILES_SQL,
    FILTERED_KNN_SQL,
    HAMMING_SCAN_SQL,
    HYBRID_RRF_SQL,
    KNN_COS_SQL,
    KNN_DOT_SQL,
    KNN_L2_SQL,
    NEAR_DUP_SQL,
    NORM_SQL,
    PROFILE_SQL,
    RANGE_SEARCH_SQL,
    SIMHASH_KNN_SQL,
    SQL_NATION_SQL,
    TABLE_DIFF_SQL,
    _embeddings_vectors,
    _knn_cos_dot_sql,
    _l1_expr,
    q_custom_metric_knn,
    q_doc_length_quantiles,
    q_embedding_near_dup,
    q_filtered_knn_label,
    q_hamming_scan_topk,
    q_hybrid_rrf_retrieval,
    q_knn_exact_cosine,
    q_knn_exact_cosine_dot,
    q_knn_exact_dot,
    q_knn_exact_l2,
    q_profile_lineitem,
    q_range_search_l2,
    q_simhash_hamming_knn,
    q_sql_nation_revenue,
    q_table_diff_orders,
    q_vector_norm_stats,
)
from hawk_pack_spark.queries.catalog_dedup import (  # noqa: F401
    LSH_HAMMING_SQL,
    NGRAM_JACCARD_SQL,
    _HASH64,
    _TOKS,
    _dedup_clusters_sql,
    _minhash_capped_sql,
    _minhash_sql,
    _simhash_sql,
    q_dedup_clusters,
    q_lsh_hamming_pairs,
    q_minhash_near_dup,
    q_minhash_near_dup_uncapped,
    q_ngram_jaccard,
    q_ngram_jaccard_uncapped,
    q_simhash_groups,
)
from hawk_pack_spark.queries.catalog_ann import (  # noqa: F401
    _ann_summary,
    q_ivf_ann_l2,
)
from hawk_pack_spark.queries.catalog_hnsw import (  # noqa: F401
    DUP_GATE_SQL,
    GRAPH_REKEY_SQL,
    HNSW_DELETE_SQL,
    HNSW_INSERT_SQL,
    HNSW_LINKS_STATS_SQL,
    HNSW_SEARCH_SUMMARY_SQL,
    HNSW_SELF_RECALL_SQL,
    HNSW_SERVING_SUMMARY_SQL,
    IVF_SUMMARY_SQL,
    SERVING_RESTART_SQL,
    _HNSW_CACHE,
    _HNSW_PARAMS,
    _HNSW_SHARDS,
    _hnsw_index,
    _hnsw_num_shards,
    q_dup_gate_batch,
    q_graph_rekey_roundtrip,
    q_hnsw_delete_repair,
    q_hnsw_insert_roundtrip,
    q_hnsw_links_stats,
    q_hnsw_search_l2,
    q_hnsw_self_recall,
    q_hnsw_serving_search_l2,
    q_multimodal_pipeline,
    q_serving_restart_dispatch,
)
from hawk_pack_spark.queries.catalog_tpch2 import (  # noqa: F401
    BM25_SQL,
    CUBE_SQL,
    DECONTAMINATE_SQL,
    FUZZY_SQL,
    MULTIMODAL_SQL,
    NGRAM_JACCARD_CAPPED_SQL,
    PACK_SQL,
    PERPLEXITY_SQL,
    PII_SCRUB_SQL,
    PQ_SUMMARY_SQL,
    Q04_SQL,
    Q06_SQL,
    Q14_SQL,
    Q18_SQL,
    Q19_SQL,
    QUALITY_CLASSIFIER_SQL,
    RANGE_JOIN_SQL,
    RANKS_SQL,
    REPETITION_SQL,
    SALTED_AGG_SQL,
    SEMDEDUP_SQL,
    SESSION_WINDOW_SQL,
    STRATIFIED_SQL,
    TOP_SUPPLIER_SQL,
    TRAINING_PIPELINE_SQL,
    VOCAB_SQL,
    q04_order_priority,
    q06_revenue_forecast,
    q14_promo_revenue_share,
    q18_large_orders,
    q19_disjunctive_revenue,
    q_bm25_topk,
    q_cube_order_stats,
    q_customer_balance_ranks,
    q_decontaminate_ngrams,
    q_doc_repetition,
    q_events_type_stats_salted,
    q_ivfpq_ann_l2,
    q_ivfsq8_ann_l2,
    q_nation_name_fuzzy_pairs,
    q_pack_sequences,
    q_perplexity_filter,
    q_pii_scrub,
    q_pq_ann_l2,
    q_purchase_window_attribution,
    q_quality_classifier,
    q_semdedup_near_dup,
    q_session_window_stats,
    q_sq8_ann_l2,
    q_stratified_sample,
    q_top_supplier_per_nation,
    q_training_data_pipeline,
    q_vocab_top_tokens,
)
from hawk_pack_spark.queries.catalog_r5_invariants import (  # noqa: F401
    ALG4_CLUSTERED_SQL,
    BPE_VOCAB_SQL,
    GRAPH_BULK_IMPORT_SQL,
    HNSW_REBUILD_SQL,
    JDBC_ROUNDTRIP_SQL,
    JDBC_UPSERT_SQL,
    NFC_NORMALIZE_SQL,
    OP_STREAM_SQL,
    SKETCH_SUMMARY_SQL,
    STREAMING_DELTA_SQL,
    STREAMING_DURABLE_SQL,
    STREAMING_INGEST_SQL,
    STREAMING_SERVE_SQL,
    q_alg4_clustered_connectivity,
    q_bpe_vocab,
    q_graph_bulk_import,
    q_hnsw_rebuild_churned,
    q_jdbc_roundtrip,
    q_jdbc_upsert,
    q_nfc_normalize_docs,
    q_op_stream_digest,
    q_sketch_summary,
    q_streaming_delta_jdbc,
    q_streaming_durable_resume,
    q_streaming_ingest_counts,
    q_streaming_query_serving,
)
from hawk_pack_spark.queries.catalog_r6_tpch import (  # noqa: F401
    Q07_SQL,
    Q08_SQL,
    Q10_SQL,
    Q13_SQL,
    Q15_SQL,
    Q17_SQL,
    Q21_SQL,
    Q22_SQL,
    q07_volume_shipping,
    q08_market_share,
    q10_returned_items,
    q13_customer_distribution,
    q15_top_supplier,
    q17_small_qty_revenue,
    q21_waiting_supplier,
    q22_dormant_customers,
)
from hawk_pack_spark.queries.catalog_r6_streaming import (  # noqa: F401
    STREAMING_ATTRIBUTION_SQL,
    STREAMING_DEDUP_SQL,
    STREAMING_SESSIONIZE_SQL,
    STREAMING_WINDOWS_SQL,
    ZORDER_SQL,
    _run_stream_to_memory,
    _zorder_sql,
    q_streaming_attribution,
    q_streaming_dedup_exact,
    q_streaming_event_windows,
    q_streaming_sessionize,
    q_zorder_values,
)
from hawk_pack_spark.queries.catalog_r7_analytics import (  # noqa: F401
    COHORT_SQL,
    COPURCHASE_SQL,
    COPURCHASE_TRI_SQL,
    DQ_EXPECTATIONS_SQL,
    EDIT_DIST_JOIN_SQL,
    EMBEDDING_PCA_SQL,
    EVENT_TRANSITIONS_SQL,
    FUNNEL_SQL,
    GAPFILL_SQL,
    INCREMENTAL_AGG_SQL,
    OUTLIERS_SQL,
    SCD2_SQL,
    WEIGHTED_SAMPLE_SQL,
    _pagerank_sql,
    q_cohort_retention,
    q_copurchase_pagerank,
    q_copurchase_pairs,
    q_copurchase_triangles,
    q_dq_expectations,
    q_edit_distance_join_docs,
    q_embedding_pca,
    q_event_transitions,
    q_events_value_outliers,
    q_funnel_conversion,
    q_incremental_orders_agg,
    q_scd2_user_state,
    q_streaming_incremental_agg,
    q_user_daily_gapfill,
    q_weighted_sample_orders,
)
from hawk_pack_spark.queries.catalog_r8_curation import (  # noqa: F401
    CHUNK_DOCS_SQL,
    HARD_NEGATIVES_SQL,
    IVF_MANIFEST_SQL,
    RANDOM_PROJECTION_SQL,
    TOKEN_BUDGET_SQL,
    _neardup_canonical_sql,
    q_chunk_documents,
    q_hard_negatives_l2,
    q_ivf_manifest_restart,
    q_neardup_canonical_docs,
    q_random_projection_jl,
    q_token_budget_sample,
)
from hawk_pack_spark.queries.catalog_r8_tail import (  # noqa: F401
    BASKET_RULES_SQL,
    BLOOM_SEMI_SQL,
    BOOLEAN_RETRIEVAL_SQL,
    CDC_APPLY_SQL,
    COPURCHASE_BFS_SQL,
    FK_INCLUSION_SQL,
    GROUP_ENTROPY_SQL,
    HISTOGRAM_SQL,
    ITEM_SIM_SQL,
    JACCARD_LOSSLESS_SQL,
    JOIN_CARDINALITY_SQL,
    KNN_JOIN_SQL,
    MAD_OUTLIERS_SQL,
    MMR_SQL,
    OHLC_SQL,
    ROLLING_MEDIAN_SQL,
    TFIDF_KEYWORDS_SQL,
    TOKEN_PMI_SQL,
    TOP_PATHS_SQL,
    TREND_SQL,
    _ewma_sql,
    _label_propagation_sql,
    q_basket_rules,
    q_bloom_semi_join,
    q_boolean_retrieval,
    q_cdc_apply_orders,
    q_copurchase_bfs,
    q_copurchase_communities,
    q_copurchase_item_sim,
    q_events_mad_outliers,
    q_events_ohlc_hourly,
    q_events_rolling_median,
    q_events_value_ewma,
    q_events_value_histogram,
    q_events_value_trend,
    q_fk_inclusion_profile,
    q_jaccard_docs_lossless,
    q_knn_join_graph,
    q_mmr_diversify_topk,
    q_nation_revenue_gini,
    q_orders_lineitem_cardinality,
    q_tfidf_doc_keywords,
    q_token_pmi_pairs,
    q_top_event_paths,
    q_user_event_entropy,
)
from hawk_pack_spark.queries.catalog_r9a import (  # noqa: F401
    ACF_SQL,
    COLUMN_PROFILE_SQL,
    DUP_NGRAM_SQL,
    EVENTS_CUSUM_SQL,
    EVENTS_INTERPOLATE_SQL,
    EVENTS_PSI_SQL,
    EVENTS_TWAP_SQL,
    EVENTS_WINSORIZE_SQL,
    FD_VIOLATIONS_SQL,
    LEAKAGE_SPLIT_SQL,
    LINK_PRED_SQL,
    NATION_GINI_SQL,
    PARTS_SKYLINE_SQL,
    PHRASE_SEARCH_SQL,
    PURCHASE_ATTRIBUTION_SQL,
    READABILITY_SQL,
    RETRIEVAL_EVAL_SQL,
    THEILSEN_SQL,
    _k_core_sql,
    _standardize_sql,
    q_copurchase_kcore,
    q_copurchase_link_pred,
    q_doc_readability,
    q_dup_ngram_docs,
    q_embeddings_standardized,
    q_events_acf_daily,
    q_events_cusum_shift,
    q_events_interpolated,
    q_events_psi_drift,
    q_events_theilsen_trend,
    q_events_twap_daily,
    q_events_winsorized,
    q_leakage_split_docs,
    q_lineitem_fd_violations,
    q_orders_column_profile,
    q_parts_skyline,
    q_phrase_search_docs,
    q_purchase_attribution,
    q_retrieval_eval,
    q_user_conversion_survival,
)
from hawk_pack_spark.queries.catalog_r9b import (  # noqa: F401
    ABC_CLASSES_SQL,
    AB_TEST_SQL,
    BINARY_QUANT_SQL,
    BOUNCE_RATE_SQL,
    CHI_SQUARE_SQL,
    CLUSTERING_COEFF_SQL,
    CONTAINMENT_SQL,
    CROSS_CORR_SQL,
    CTFIDF_SQL,
    DAU_MAU_SQL,
    DECILE_BINS_SQL,
    DOMAIN_TOPP_SQL,
    FUNNEL_LATENCY_SQL,
    GAP_PCTL_SQL,
    KM_SURVIVAL_SQL,
    LATENCY_PCTL_SQL,
    MOM_GROWTH_SQL,
    OOV_RATE_SQL,
    ROLLING_ZSCORE_SQL,
    _component_sizes_sql,
    _langid_report_sql,
    _ppr_sql,
    q_ab_test_conversion,
    q_binary_quant_knn,
    q_containment_docs,
    q_copurchase_clustering,
    q_copurchase_ppr,
    q_daily_bounce_rate,
    q_doc_oov_rate,
    q_domain_token_topp,
    q_event_chi_square,
    q_event_gap_percentiles,
    q_event_type_correlations,
    q_events_dau_mau,
    q_events_decile_bins,
    q_events_rolling_zscore,
    q_funnel_stage_latency,
    q_langid_report,
    q_neardup_component_sizes,
    q_orders_mom_growth,
    q_parts_abc_classes,
    q_purchase_latency_percentiles,
    q_source_ctfidf_terms,
)
from hawk_pack_spark.queries.catalog_r9c import (  # noqa: F401
    ASOF_FWD_SQL,
    CENTROID_SIM_SQL,
    RFM_SQL,
    VOCAB_OVERLAP_SQL,
    q_asof_next_purchase,
    q_customer_rfm,
    q_label_centroid_similarity,
    q_source_vocab_overlap,
)
from hawk_pack_spark.queries.catalog_r10 import (  # noqa: F401
    ASSORTATIVITY_SQL,
    BENFORD_SQL,
    CALIBRATION_SQL,
    COSINE_LOSSLESS_SQL,
    HOLT_SQL,
    JS_DIVERGENCE_SQL,
    KEY_SKEW_SQL,
    KS_TEST_SQL,
    MANN_WHITNEY_SQL,
    RANK_OVERLAP_SQL,
    SEASONAL_DECOMP_SQL,
    STREAMING_HH_SQL,
    WELCH_SQL,
    q_copurchase_assortativity,
    q_cosine_docs_lossless,
    q_doc_quality_calibration,
    q_events_holt_forecast,
    q_events_ks_test,
    q_events_mann_whitney,
    q_events_seasonal_decomp,
    q_events_welch_ttest,
    q_orders_benford_digits,
    q_orders_key_skew,
    q_retrieval_rank_overlap,
    q_source_js_divergence,
    q_streaming_heavy_hitters,
)
from hawk_pack_spark.queries.catalog_r11 import (  # noqa: F401
    STREAMING_PIPELINE_SQL,
    q_streaming_curation_pipeline,
)
from hawk_pack_spark.queries.catalog_r12 import (  # noqa: F401
    OPAQUE_DISTANCE_SQL,
    q_opaque_distance_topk,
)



_STABLE_SPECS: dict[str, QuerySpec] = {
    # -- round-5 driver-gate block first: components that were
    # pytest-only through r4 earn their driver rows this round.
    "hnsw_rebuild_churned": QuerySpec(q_hnsw_rebuild_churned, HNSW_REBUILD_SQL, "churn detect (degree band) + shard rebuild ≡ fresh build, full self-recall"),
    "jdbc_upsert": QuerySpec(q_jdbc_upsert, JDBC_UPSERT_SQL, "row-level JDBC upsert (ON CONFLICT/MERGE): delta updates in place, untouched rows retained"),
    "graph_bulk_import": QuerySpec(q_graph_bulk_import, GRAPH_BULK_IMPORT_SQL, "GraphMem::from_precomputed: bulk links import, snapshot + search identity"),
    "nfc_normalize_docs": QuerySpec(q_nfc_normalize_docs, NFC_NORMALIZE_SQL, "Unicode NFC normalization, data-level parity vs DuckDB nfc_normalize"),
    "alg4_clustered_connectivity": QuerySpec(q_alg4_clustered_connectivity, ALG4_CLUSTERED_SQL, "Algorithm 4 on clustered near-dups: degree bounds + zero unreachable islands"),
    "bpe_vocab": QuerySpec(q_bpe_vocab, BPE_VOCAB_SQL, "BPE training: driver-loop ≡ distributed no-collect trainer + segmentation identity"),
    "op_stream_digest": QuerySpec(q_op_stream_digest, OP_STREAM_SQL, "coroutine op-stream protocol digest (GetEntryPoint → triads → SearchResult)"),
    "streaming_ingest_counts": QuerySpec(q_streaming_ingest_counts, STREAMING_INGEST_SQL, "Structured-Streaming micro-batch ingest through the is_match dedup gate"),
    "jdbc_roundtrip": QuerySpec(q_jdbc_roundtrip, JDBC_ROUNDTRIP_SQL, "GraphPg two-table layout over live JDBC (Derby): exact links+entries roundtrip"),
    "bm25_topk": QuerySpec(q_bm25_topk, BM25_SQL, "BM25 retrieval (postings + broadcast query join)"),
    "sketch_summary": QuerySpec(q_sketch_summary, SKETCH_SUMMARY_SQL, "mergeable sketches (HLL presketch-union, KLL merged median, frequent-items) within published error bounds"),
    # -- round-2 front block: entries that were unchecked (or whose
    # implementation changed) go FIRST so the driver's 50-entry
    # correctness window records them; every entry is oracle-backed.
    "minhash_near_dup": QuerySpec(q_minhash_near_dup, _minhash_capped_sql(), "MinHash-LSH near-dup (bucket-capped scale defaults)"),
    "simhash_groups": QuerySpec(q_simhash_groups, _simhash_sql(), "SimHash dedup groups (60-bit)"),
    "ngram_jaccard_pairs": QuerySpec(q_ngram_jaccard, NGRAM_JACCARD_CAPPED_SQL, "n-gram Jaccard similarity join (df-capped scale defaults)"),
    "dedup_clusters": QuerySpec(q_dedup_clusters, _dedup_clusters_sql(), "near-dup connected components"),
    "lsh_hamming_pairs": QuerySpec(q_lsh_hamming_pairs, LSH_HAMMING_SQL, "Hamming-LSH banded near pairs"),
    "hnsw_self_recall": QuerySpec(q_hnsw_self_recall, HNSW_SELF_RECALL_SQL, "HNSW self-recall invariant (flagship)"),
    "hnsw_links_stats": QuerySpec(q_hnsw_links_stats, HNSW_LINKS_STATS_SQL, "HNSW graph degree/membership invariants"),
    "hnsw_search_l2": QuerySpec(q_hnsw_search_l2, HNSW_SEARCH_SUMMARY_SQL, "sharded HNSW ANN search vs exact recall"),
    "hnsw_serving_search_l2": QuerySpec(q_hnsw_serving_search_l2, HNSW_SERVING_SUMMARY_SQL, "serving-path (broadcast-query, zero-shuffle) search ≡ cogroup path + recall gate"),
    "serving_restart_dispatch": QuerySpec(q_serving_restart_dispatch, SERVING_RESTART_SQL, "manifest save→load→ann_search: restartable serving unit + frozen-CSR rehydration + dispatch front door, path and row equality asserted live"),
    "ivfpq_ann_l2": QuerySpec(q_ivfpq_ann_l2, PQ_SUMMARY_SQL, "IVF-PQ (residual codebooks, routed ADC, exact re-rank): the byte-budgeted partition-prunable index vs exact kNN"),
    "hnsw_insert_roundtrip": QuerySpec(q_hnsw_insert_roundtrip, HNSW_INSERT_SQL, "two-phase batch insert + is_match dedup gate as one invariant row"),
    "hnsw_delete_repair": QuerySpec(q_hnsw_delete_repair, HNSW_DELETE_SQL, "exact delete + bridge repair: no dangling edges, degree bounds, survivor self-recall"),
    "graph_rekey_roundtrip": QuerySpec(q_graph_rekey_roundtrip, GRAPH_REKEY_SQL, "GraphMem::from_another re-key bijection roundtrip + dist-map hook as one invariant row"),
    "ivf_ann_l2": QuerySpec(q_ivf_ann_l2, IVF_SUMMARY_SQL, "IVF bucketed ANN vs exact recall"),
    "pq_ann_l2": QuerySpec(q_pq_ann_l2, PQ_SUMMARY_SQL, "product-quantized ANN + re-rank vs exact recall"),
    "multimodal_pipeline": QuerySpec(q_multimodal_pipeline, MULTIMODAL_SQL, "binary media -> features -> frames -> ANN loop"),
    "knn_exact_cosine_dot": QuerySpec(q_knn_exact_cosine_dot, _knn_cos_dot_sql(), "exact kNN, cosine + MIPS"),
    "doc_fingerprint": QuerySpec(q_doc_fingerprint, Q_FP_SQL, "set + rolling doc fingerprints"),
    # -- round-2 curation block: published training-data pipeline stages
    # (Gopher repetition gate, GPT-3 decontamination, mixing weights,
    # context-window packing) — new this round, so driver-window front.
    "doc_repetition": QuerySpec(q_doc_repetition, REPETITION_SQL, "Gopher word-ngram repetition gate"),
    "decontaminate_ngrams": QuerySpec(q_decontaminate_ngrams, DECONTAMINATE_SQL, "eval-set n-gram decontamination"),
    "stratified_sample": QuerySpec(q_stratified_sample, STRATIFIED_SQL, "deterministic hash-gate domain mixing"),
    "pack_sequences": QuerySpec(q_pack_sequences, PACK_SQL, "greedy context-window packing (applyInPandas vs recursive CTE)"),
    "semdedup_near_dup": QuerySpec(q_semdedup_near_dup, SEMDEDUP_SQL, "SemDeDup cluster-pruned near-dup vs exact (planted twins)"),
    "quality_classifier": QuerySpec(q_quality_classifier, QUALITY_CLASSIFIER_SQL, "model-based quality gate (LR distillation, planted spam)"),
    "pii_scrub": QuerySpec(q_pii_scrub, PII_SCRUB_SQL, "PII redaction audit (planted email/phone/ipv4, zero residual)"),
    "perplexity_filter": QuerySpec(q_perplexity_filter, PERPLEXITY_SQL, "CCNet perplexity filter (add-1 bigram LM, micro-nat accounting)"),
    "training_data_pipeline": QuerySpec(q_training_data_pipeline, TRAINING_PIPELINE_SQL, "end-to-end funnel: gates -> decontaminate -> dedup -> sample -> pack"),
    # -- round-6 tail: remaining expressible TPC-H shapes + the
    # event-time streaming surface as data-level rows.
    "q07_volume_shipping": QuerySpec(q07_volume_shipping, Q07_SQL, "TPC-H Q7 shape: bidirectional region-pair volume by year"),
    "q08_market_share": QuerySpec(q08_market_share, Q08_SQL, "TPC-H Q8 shape: conditional-sum market-share ratio per year"),
    "q10_returned_items": QuerySpec(q10_returned_items, Q10_SQL, "TPC-H Q10 shape: top-20 customers by returned revenue"),
    "q13_customer_distribution": QuerySpec(q13_customer_distribution, Q13_SQL, "TPC-H Q13 shape: predicated left join order-count distribution"),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_SQL, "TPC-H Q15 shape: revenue view + scalar-max tie-exact select"),
    "q17_small_qty_revenue": QuerySpec(q17_small_qty_revenue, Q17_SQL, "TPC-H Q17 shape: correlated per-part average quantity gate"),
    "q21_waiting_supplier": QuerySpec(q21_waiting_supplier, Q21_SQL, "TPC-H Q21 shape: EXISTS + NOT EXISTS double correlation"),
    "q22_dormant_customers": QuerySpec(q22_dormant_customers, Q22_SQL, "TPC-H Q22 shape: scalar-avg subquery + predicated anti-join"),
    "streaming_event_windows": QuerySpec(q_streaming_event_windows, STREAMING_WINDOWS_SQL, "watermarked tumbling windows (append mode, exactly-once emission) ≡ batch GROUP BY, data-level"),
    "streaming_sessionize": QuerySpec(q_streaming_sessionize, STREAMING_SESSIONIZE_SQL, "stateful streaming sessionization (applyInPandasWithState + event-time timeout) ≡ batch lag/cumsum, data-level"),
    "streaming_attribution": QuerySpec(q_streaming_attribution, STREAMING_ATTRIBUTION_SQL, "stream-stream interval join chained into windowed per-purchase agg ≡ batch range join, data-level"),
    "streaming_dedup_exact": QuerySpec(q_streaming_dedup_exact, STREAMING_DEDUP_SQL, "dropDuplicatesWithinWatermark: full replay batch dropped key-for-key ≡ SELECT DISTINCT, data-level"),
    "sq8_ann_l2": QuerySpec(q_sq8_ann_l2, PQ_SUMMARY_SQL, "SQ8 scalar-quantized ANN (4x codes, asymmetric scan, exact re-rank) vs exact recall"),
    "ivfsq8_ann_l2": QuerySpec(q_ivfsq8_ann_l2, PQ_SUMMARY_SQL, "IVF-SQ8 (residual scalar quantization, cell-pruned scan, exact re-rank): shape-independent recall in IVF-PQ's prunable layout"),
    "zorder_values": QuerySpec(q_zorder_values, ZORDER_SQL, "Z-order (Morton) curve values for multi-dim file clustering, bit-for-bit data-level"),
    # -- stable block: unchanged r01-green queries, original order.
    "q01_pricing_summary": QuerySpec(q01_pricing_summary, Q01_SQL, "TPC-H Q1 shape"),
    "q04_order_priority": QuerySpec(q04_order_priority, Q04_SQL, "EXISTS semi-join counts"),
    "q06_revenue_forecast": QuerySpec(q06_revenue_forecast, Q06_SQL, "pushdown filter + global agg"),
    "q14_promo_revenue_share": QuerySpec(q14_promo_revenue_share, Q14_SQL, "conditional-agg ratio"),
    "q18_large_orders": QuerySpec(q18_large_orders, Q18_SQL, "HAVING subquery + 3-way join"),
    "q19_disjunctive_revenue": QuerySpec(q19_disjunctive_revenue, Q19_SQL, "disjunctive predicate join"),
    "cube_order_stats": QuerySpec(q_cube_order_stats, CUBE_SQL, "full CUBE grouping sets"),
    "top_supplier_per_nation": QuerySpec(q_top_supplier_per_nation, TOP_SUPPLIER_SQL, "correlated scalar max"),
    "q03_shipping_priority": QuerySpec(q03_shipping_priority, Q03_SQL, "3-way join + top-10"),
    "q05_local_supplier_volume": QuerySpec(q05_local_supplier_volume, Q05_SQL, "6-way star join"),
    "top3_orders_per_customer": QuerySpec(q_top3_orders_per_customer, Q_TOP3_SQL, "group-wise top-k (queue semantics)"),
    "asof_last_purchase": QuerySpec(q_asof_last_purchase, ASOF_SQL, "backward as-of join"),
    "purchase_window_attribution": QuerySpec(q_purchase_window_attribution, RANGE_JOIN_SQL, "binned range join"),
    "parts_above_brand_avg": QuerySpec(q_parts_above_brand_avg, ABOVE_AVG_SQL, "correlated-avg filter"),
    "events_type_stats_salted": QuerySpec(q_events_type_stats_salted, SALTED_AGG_SQL, "skew-safe salted aggregation"),
    "events_json": QuerySpec(q_events_json, Q_EVENTS_JSON_SQL, "JSON extraction"),
    "session_window_stats": QuerySpec(q_session_window_stats, SESSION_WINDOW_SQL, "built-in session_window"),
    "sliding_window_counts": QuerySpec(q_sliding_window_counts, SLIDING_SQL, "sliding windows"),
    "doc_token_stats": QuerySpec(q_doc_token_stats, Q_TOKEN_SQL, "tokenization"),
    "lang_id": QuerySpec(q_lang_id, Q_LANG_SQL, "language ID heuristic"),
    "customer_running_totals": QuerySpec(q_customer_running_totals, RUNNING_SQL, "running/moving/lag windows"),
    "nation_name_fuzzy_pairs": QuerySpec(q_nation_name_fuzzy_pairs, FUZZY_SQL, "Levenshtein fuzzy pairs"),
    "exact_dedup_docs": QuerySpec(q_exact_dedup_docs, Q_DEDUP_SQL, "exact dedup"),
    "curation_pipeline": QuerySpec(q_curation_pipeline, CURATION_SQL, "quality->dedup->stats composition"),
    "doc_hash_embedding_knn": QuerySpec(q_doc_hash_embedding_knn, HASH_EMB_SQL, "text->vector featurization + kNN"),
    "knn_exact_l2": QuerySpec(q_knn_exact_l2, KNN_L2_SQL, "LinearDb exact kNN, L2"),
    "simhash_hamming_knn": QuerySpec(q_simhash_hamming_knn, SIMHASH_KNN_SQL, "Hamming kNN on sign codes"),
    "hamming_scan_topk": QuerySpec(q_hamming_scan_topk, HAMMING_SCAN_SQL, "the 100M-scale tiled LUT-popcount scan kernel vs the brute-force SQL answer, exact"),
    "custom_metric_knn": QuerySpec(q_custom_metric_knn, CUSTOM_METRIC_SQL, "register_metric (VectorStore-trait UDF surface): user L1 metric through exact kNN, data-level"),
    "dup_gate_batch": QuerySpec(q_dup_gate_batch, DUP_GATE_SQL, "cross-shard + intra-batch exact-dup gate on insert_batch; serving and cogroup gates agree"),
    "streaming_durable_resume": QuerySpec(q_streaming_durable_resume, STREAMING_DURABLE_SQL, "durable near-dup band store: restart equals continuation, re-sent dups rejected by rehydrated store"),
    "streaming_delta_jdbc": QuerySpec(q_streaming_delta_jdbc, STREAMING_DELTA_SQL, "per-micro-batch JDBC delta upsert leaves database == in-memory graph"),
    "streaming_query_serving": QuerySpec(q_streaming_query_serving, STREAMING_SERVE_SQL, "readStream query batches through the ann_search front door against a reloaded manifest bundle; per-epoch rows equal direct calls"),
    "embedding_near_dup": QuerySpec(q_embedding_near_dup, NEAR_DUP_SQL, "cosine near-dup self-join"),
    "range_search_l2": QuerySpec(q_range_search_l2, RANGE_SEARCH_SQL, "radius query (set-valued is_match) through the LOSSLESS IVF cell-pruned path; data-level vs brute force"),
    "profile_lineitem": QuerySpec(q_profile_lineitem, PROFILE_SQL, "one-pass table profiling (count/nulls/distinct/min/max/mean per column in ONE agg job)"),
    "table_diff_orders": QuerySpec(q_table_diff_orders, TABLE_DIFF_SQL, "snapshot diff (CDC added/removed/changed): hash-classified join vs column-wise IS DISTINCT FROM oracle"),
    "doc_length_quantiles": QuerySpec(q_doc_length_quantiles, DOC_QUANTILES_SQL, "EXACT per-lang percentiles (sort-based, shared interpolation definition) — the data-level complement of the KLL sketch row"),
    "hybrid_rrf_retrieval": QuerySpec(q_hybrid_rrf_retrieval, HYBRID_RRF_SQL, "hybrid retrieval: BM25 + hash-embedding cosine arms fused by reciprocal-rank fusion, data-level"),
    "filtered_knn_label": QuerySpec(q_filtered_knn_label, FILTERED_KNN_SQL, "metadata-filtered vector search (predicate + top-k), selective pre-filter exact path, data-level"),
    # -- r7 tail: product-analytics / pipeline-maintenance surface
    "funnel_conversion": QuerySpec(q_funnel_conversion, FUNNEL_SQL, "ordered-stage conversion funnel (signup→view→click→purchase), shrinking user-key join chain, data-level"),
    "cohort_retention_weekly": QuerySpec(q_cohort_retention, COHORT_SQL, "weekly cohort-retention triangle, all-integer epoch bucketing, data-level"),
    "user_daily_gapfill": QuerySpec(q_user_daily_gapfill, GAPFILL_SQL, "calendar-dense daily resample (sequence+explode spine, broadcast grid, zero-fill), data-level"),
    "incremental_orders_agg": QuerySpec(q_incremental_orders_agg, INCREMENTAL_AGG_SQL, "incremental materialized-view maintenance: base⊕delta state merge ≡ full recompute, data-level"),
    "weighted_sample_orders": QuerySpec(q_weighted_sample_orders, WEIGHTED_SAMPLE_SQL, "derandomized A-ES weighted sampling without replacement (hash-uniform, TakeOrdered), data-level"),
    "events_value_outliers": QuerySpec(q_events_value_outliers, OUTLIERS_SQL, "per-group z-score anomaly flag with bit-deterministic μ/σ arithmetic, data-level"),
    "edit_distance_join_docs": QuerySpec(q_edit_distance_join_docs, EDIT_DIST_JOIN_SQL, "PassJoin pigeonhole edit-distance join (lossless segment candidates) ≡ brute-force cross join, data-level"),
    "embedding_pca": QuerySpec(q_embedding_pca, EMBEDDING_PCA_SQL, "distributed one-pass PCA (mergeable moment partials, d×d driver eigh): spectral contract verified against the data"),
    "event_transitions": QuerySpec(q_event_transitions, EVENT_TRANSITIONS_SQL, "first-order Markov transition counts (lag window + groupBy), deterministic sequence order, data-level"),
    "dq_expectations": QuerySpec(q_dq_expectations, DQ_EXPECTATIONS_SQL, "data-quality expectations report: row-local rules in ONE pass + uniqueness groupBy + FK anti-join, exact violation counts, data-level"),
    "copurchase_pairs": QuerySpec(q_copurchase_pairs, COPURCHASE_SQL, "market-basket pair mining (per-basket bounded fan-out), data-level"),
    "copurchase_triangles": QuerySpec(q_copurchase_triangles, COPURCHASE_TRI_SQL, "exact triangle count, degree-oriented wedge join ≡ plain a<b<c triple-join oracle, data-level"),
    "copurchase_pagerank": QuerySpec(q_copurchase_pagerank, _pagerank_sql(), "fixed-iteration PageRank (iterative dataflow, co-partitioned join+groupBy per round) ≡ 10-round unrolled-CTE oracle, data-level"),
    "scd2_user_state": QuerySpec(q_scd2_user_state, SCD2_SQL, "type-2 SCD interval build (null-safe change collapse, one shared sort), data-level"),
    "streaming_incremental_agg": QuerySpec(q_streaming_incremental_agg, INCREMENTAL_AGG_SQL, "streaming materialized-view maintenance: foreachBatch state merge at delta cost ≡ full-recompute oracle, data-level"),
    # -- round-8 additions: post-dedup curation decisions
    "neardup_canonical_docs": QuerySpec(q_neardup_canonical_docs, _neardup_canonical_sql(), "canonical-doc selection per near-dup cluster (keep best-quality member, not min-id), data-level"),
    "hard_negatives_l2": QuerySpec(q_hard_negatives_l2, HARD_NEGATIVES_SQL, "contrastive hard-negative mining: per-anchor top-k nearest with label != anchor, data-level"),
    "token_budget_sample": QuerySpec(q_token_budget_sample, TOKEN_BUDGET_SQL, "per-domain token-budget sampling (derandomized hash order + running token sum), data-level"),
    "chunk_documents": QuerySpec(q_chunk_documents, CHUNK_DOCS_SQL, "token-window chunking (32-token chunks, 4-token overlap, stride sequence explode), data-level"),
    "ivf_manifest_restart": QuerySpec(q_ivf_manifest_restart, IVF_MANIFEST_SQL, "IVF-SQ8 serving-manifest roundtrip: loaded-bundle search == in-memory rows + PartitionFilters pruning + model roundtrip, invariant row"),
    "random_projection_jl": QuerySpec(q_random_projection_jl, RANDOM_PROJECTION_SQL, "seeded JL projection: determinism + dims + in-expectation distance preservation, invariant row"),
    # -- round-8 tail: CDC apply, resample, retrieval, BFS, kNN join, histogram
    "cdc_apply_orders": QuerySpec(q_cdc_apply_orders, CDC_APPLY_SQL, "CDC MERGE apply (deletes/updates/inserts onto the snapshot, one key shuffle), full merged table, data-level"),
    "events_ohlc_hourly": QuerySpec(q_events_ohlc_hourly, OHLC_SQL, "hourly OHLC bar resample in ONE groupBy (struct-extrema open/close, tie-deterministic), data-level"),
    "boolean_retrieval_docs": QuerySpec(q_boolean_retrieval, BOOLEAN_RETRIEVAL_SQL, "boolean AND/OR/NOT retrieval over the inverted index (one broadcast probe + one groupBy), data-level"),
    "copurchase_bfs": QuerySpec(q_copurchase_bfs, COPURCHASE_BFS_SQL, "BFS shortest paths (4 hops) over the co-purchase graph, checkpointed iterative dataflow ≡ bounded recursive-CTE oracle, data-level"),
    "knn_join_graph": QuerySpec(q_knn_join_graph, KNN_JOIN_SQL, "blocked kNN SELF-join (cell-co-partitioned candidates): degrees == k, no self, sampled recall >= 0.75 vs exact (measured 0.85-0.90), invariant row"),
    "events_value_histogram": QuerySpec(q_events_value_histogram, HISTOGRAM_SQL, "dense equi-width histogram (20 bins, zero-filled spine, bit-deterministic bin math), data-level"),
    "events_value_trend": QuerySpec(q_events_value_trend, TREND_SQL, "per-group OLS trend (one agg pass, exact decimal(38,0) accumulators, two final float divisions), data-level"),
    "orders_lineitem_cardinality": QuerySpec(q_orders_lineitem_cardinality, JOIN_CARDINALITY_SQL, "exact join-size prediction without running the join (two (key,count) reductions + key join): pairs, overlap split, max fan-out, data-level"),
    "jaccard_docs_lossless": QuerySpec(q_jaccard_docs_lossless, JACCARD_LOSSLESS_SQL, "LOSSLESS set-similarity join (PPJoin prefix filter, integer-exact threshold) vs TRUE brute-force oracle, data-level"),
    "copurchase_communities": QuerySpec(q_copurchase_communities, _label_propagation_sql(), "synchronous label propagation (4 rounds, min-label ties, bit-deterministic) ≡ unrolled-CTE oracle, data-level"),
    "top_event_paths": QuerySpec(q_top_event_paths, TOP_PATHS_SQL, "most frequent first-4 event paths per user-day (in-aggregate ordered assembly, one corpus shuffle), data-level"),
    "events_value_ewma": QuerySpec(q_events_value_ewma, _ewma_sql(), "bounded-span EWMA smoothing (8 unrolled lags, one window sort, exact power-of-two weights), data-level"),
    "fk_inclusion_profile": QuerySpec(q_fk_inclusion_profile, FK_INCLUSION_SQL, "FK discovery via inclusion coefficients (distinct reductions + semi-join per pair), data-level"),
    "mmr_diversify_topk": QuerySpec(q_mmr_diversify_topk, MMR_SQL, "MMR diversity re-rank (applyInPandas greedy per query): k picks ⊆ candidates, relevance-argmax first pick, distributed ≡ independent local greedy — invariant row"),
    "tfidf_doc_keywords": QuerySpec(q_tfidf_doc_keywords, TFIDF_KEYWORDS_SQL, "TF-IDF keyword extraction (top-3 terms per doc, postings equi-join + window), data-level"),
    "copurchase_item_sim": QuerySpec(q_copurchase_item_sim, ITEM_SIM_SQL, "item-item cosine recommender (co-occurrence / sqrt degree product, top-5 per item), data-level"),
    # -- round-9 additions: rule mining, robust statistics, collocations
    "basket_rules": QuerySpec(q_basket_rules, BASKET_RULES_SQL, "association rules A->B (support/confidence/lift from one pair shuffle, conf >= 0.5), data-level"),
    "events_rolling_median": QuerySpec(q_events_rolling_median, ROLLING_MEDIAN_SQL, "trailing-10-row exact rolling median per type (one window sort, round-free IEEE parity), data-level"),
    "events_mad_outliers": QuerySpec(q_events_mad_outliers, MAD_OUTLIERS_SQL, "median-absolute-deviation outlier flag (masking-immune, two same-key passes), data-level"),
    "token_pmi_pairs": QuerySpec(q_token_pmi_pairs, TOKEN_PMI_SQL, "PMI collocation mining (doc-level co-occurrence, per-doc term cap bounds fan-out), data-level"),
    # -- round-9 tail: runtime filtering, dispersion/concentration
    #    profiling, irregular time series, skyline, change detection
    "bloom_semi_join_lineitem": QuerySpec(q_bloom_semi_join, BLOOM_SEMI_SQL, "Bloom-filter semi-join reduction (broadcast bit array + exact verify) ≡ plain semi-join, data-level"),
    "user_event_entropy": QuerySpec(q_user_event_entropy, GROUP_ENTROPY_SQL, "per-group Shannon/normalized entropy + Gini impurity (sorted-fold float discipline), data-level"),
    "nation_revenue_gini": QuerySpec(q_nation_revenue_gini, NATION_GINI_SQL, "Gini concentration of customer spend per nation (exact decimal accumulators, two final divisions), data-level"),
    "events_twap_daily": QuerySpec(q_events_twap_daily, EVENTS_TWAP_SQL, "time-weighted average over irregular samples (exact integer-microsecond weights), data-level"),
    "events_interpolated": QuerySpec(q_events_interpolated, EVENTS_INTERPOLATE_SQL, "per-group linear interpolation of masked values (two window passes, one shared sort), data-level"),
    "parts_skyline": QuerySpec(q_parts_skyline, PARTS_SKYLINE_SQL, "2-D Pareto frontier, sort-based linear form ≡ O(n²) NOT-EXISTS domination oracle, data-level"),
    "events_cusum_shift": QuerySpec(q_events_cusum_shift, EVENTS_CUSUM_SQL, "one-sided CUSUM change-point flags (closed window form of the max(0,·) recurrence, integer-exact gate), data-level"),
    "copurchase_kcore": QuerySpec(q_copurchase_kcore, _k_core_sql(), "k-core decomposition (synchronous peeling, early-exit ≡ unrolled-CTE fixpoint), data-level"),
    "events_psi_drift": QuerySpec(q_events_psi_drift, EVENTS_PSI_SQL, "PSI drift profile (Laplace-smoothed exact-integer shares per bin, reference-anchored equi-width bins), data-level"),
    "embeddings_standardized": QuerySpec(q_embeddings_standardized, _standardize_sql(), "per-dim z-score standardization (exact integer μ/σ accumulators in one agg, full-precision z), data-level"),
    "purchase_attribution": QuerySpec(q_purchase_attribution, PURCHASE_ATTRIBUTION_SQL, "linear multi-touch attribution (user-key range join, equal split by touch count), data-level"),
    "retrieval_eval_knn": QuerySpec(q_retrieval_eval, RETRIEVAL_EVAL_SQL, "retrieval evaluation (recall/precision@10, MRR, nDCG@10) vs label-derived graded judgments, rank-sorted DCG folds, data-level"),
    "events_winsorized": QuerySpec(q_events_winsorized, EVENTS_WINSORIZE_SQL, "nearest-rank percentile winsorization (clip bounds are actual data values, bit-exact), data-level"),
    # -- round-9 batch 4: link prediction, schema mining, robust/serial
    #    statistics, readability, leakage-safe splits
    "copurchase_link_pred": QuerySpec(q_copurchase_link_pred, LINK_PRED_SQL, "link prediction (common-neighbors / Jaccard / Adamic-Adar, hub-capped wedge join, sorted-fold AA), data-level"),
    "orders_column_profile": QuerySpec(q_orders_column_profile, COLUMN_PROFILE_SQL, "candidate-key profile: per-column null/distinct/uniqueness in ONE multi-distinct aggregate, data-level"),
    "lineitem_fd_violations": QuerySpec(q_lineitem_fd_violations, FD_VIOLATIONS_SQL, "functional-dependency check l_partkey->l_suppkey with sorted violation evidence, data-level"),
    "events_acf_daily": QuerySpec(q_events_acf_daily, ACF_SQL, "lag-1..3 autocorrelation per type (one window sort, exact decimal accumulators, string-hop doubles), data-level"),
    "events_theilsen_trend": QuerySpec(q_events_theilsen_trend, THEILSEN_SQL, "Theil-Sen robust trend (per-group pair join, nearest-rank medians, no interpolation), data-level"),
    "doc_readability": QuerySpec(q_doc_readability, READABILITY_SQL, "Flesch readability features (regexp counts + in-order syllable fold, no UDF), data-level"),
    "leakage_split_docs": QuerySpec(q_leakage_split_docs, LEAKAGE_SPLIT_SQL, "duplicate-aware train/val/test split (content-hash groups, Knuth bucket of the representative), data-level"),
    "dup_ngram_docs": QuerySpec(q_dup_ngram_docs, DUP_NGRAM_SQL, "duplicated-substring coverage per doc (cross-doc 8-gram union-of-spans sweep, Lee et al. 2022 signal), data-level"),
    "phrase_search_docs": QuerySpec(q_phrase_search_docs, PHRASE_SEARCH_SQL, "exact phrase search: shuffle-free positional matching (filtered position scan per doc), data-level"),
    "user_conversion_survival": QuerySpec(q_user_conversion_survival, KM_SURVIVAL_SQL, "Kaplan-Meier time-to-first-purchase with right-censoring at the analysis cutoff (sorted-fold product-limit), data-level"),
    "containment_docs_lossless": QuerySpec(q_containment_docs, CONTAINMENT_SQL, "LOSSLESS directed set-containment join (asymmetric prefix filter, integer-exact verify) vs brute-force oracle, data-level"),
    "doc_oov_rate": QuerySpec(q_doc_oov_rate, OOV_RATE_SQL, "per-doc OOV rate vs the corpus top-k vocabulary (distributed partial top-k cut, broadcast vocab), data-level"),
    "events_decile_bins": QuerySpec(q_events_decile_bins, DECILE_BINS_SQL, "equal-frequency decile binning (two-phase distributed rank, nearest-rank bounds, deterministic ties), data-level"),
    "events_dau_mau": QuerySpec(q_events_dau_mau, DAU_MAU_SQL, "DAU / trailing-7d MAU stickiness series (one distinct reduction + bounded explode, zero-filled spine), data-level"),
    "copurchase_ppr": QuerySpec(q_copurchase_ppr, _ppr_sql(), "personalized PageRank (teleport pinned to a source set, 8 checkpointed rounds) ≡ unrolled-CTE oracle, data-level"),
    "copurchase_clustering": QuerySpec(q_copurchase_clustering, CLUSTERING_COEFF_SQL, "local clustering coefficients (degree-oriented triangle attribution, exact integer t/deg), data-level"),
    "purchase_latency_percentiles": QuerySpec(q_purchase_latency_percentiles, LATENCY_PCTL_SQL, "nearest-rank conversion-latency percentiles (two-phase distributed rank, bit-exact value selections), data-level"),
    "funnel_stage_latency": QuerySpec(q_funnel_stage_latency, FUNNEL_LATENCY_SQL, "funnel transition latency p50/p90 (chained-min semantics, in-array differentiation, per-transition rank), data-level"),
    "daily_bounce_rate": QuerySpec(q_daily_bounce_rate, BOUNCE_RATE_SQL, "daily bounce rate over 30-min-gap sessions (one shared window sort, exact counts), data-level"),
    "event_gap_percentiles": QuerySpec(q_event_gap_percentiles, GAP_PCTL_SQL, "inter-event cadence p50/p90 per type (nearest-rank gap selections, shared window sort), data-level"),
    "source_ctfidf_terms": QuerySpec(q_source_ctfidf_terms, CTFIDF_SQL, "c-TF-IDF domain keywords (class pseudo-docs, tf x ln(N/df), top-3 per source), data-level"),
    "domain_token_topp": QuerySpec(q_domain_token_topp, DOMAIN_TOPP_SQL, "nucleus-style top-p token-mass curation per domain (integer cross-multiplied threshold, first-doc guarantee), data-level"),
    "event_type_correlations": QuerySpec(q_event_type_correlations, CROSS_CORR_SQL, "pairwise Pearson between type series (day-keyed self-join, decimal accumulators, string-hop doubles), data-level"),
    "orders_mom_growth": QuerySpec(q_orders_mom_growth, MOM_GROWTH_SQL, "month-over-month revenue growth per priority (exact cents, NULL first period), data-level"),
    "parts_abc_classes": QuerySpec(q_parts_abc_classes, ABC_CLASSES_SQL, "ABC/Pareto revenue classification (running-share boundaries by integer cross-multiplication), data-level"),
    "binary_quant_knn": QuerySpec(q_binary_quant_knn, BINARY_QUANT_SQL, "1-bit binary-quantized kNN (sign-packed 32-bit words, XOR+popcount prefilter, exact re-rank) — FULL value parity, data-level"),
    "events_rolling_zscore": QuerySpec(q_events_rolling_zscore, ROLLING_ZSCORE_SQL, "trailing-20-row z-score anomaly flags (exact decimal frame sums, one division, level-shift adaptive), data-level"),
    "neardup_component_sizes": QuerySpec(q_neardup_component_sizes, _component_sizes_sql(), "near-dup cluster-size census (hash-min label propagation ≡ recursive-closure oracle), data-level"),
    "langid_classification_report": QuerySpec(q_langid_report, _langid_report_sql(), "per-class precision/recall/F1 of the lang-ID heuristic (one contingency reduction, sklearn zero_division=0), data-level"),
    "events_chi_square": QuerySpec(q_event_chi_square, CHI_SQUARE_SQL, "chi-square independence test (sorted-cell fold, exact marginals), data-level single row"),
    "ab_test_conversion": QuerySpec(q_ab_test_conversion, AB_TEST_SQL, "two-proportion pooled z-test on per-user conversion (exact counts, fixed-order expression), data-level single row"),
    "label_centroid_similarity": QuerySpec(q_label_centroid_similarity, CENTROID_SIM_SQL, "pairwise cosine between per-label centroids (exact decimal dim sums, dim-sorted folds, labels^2 bounded), data-level"),
    "customer_rfm_segments": QuerySpec(q_customer_rfm, RFM_SQL, "RFM quintile segmentation (nearest-rank thresholds broadcast, comparison projection, 100R+10F+M), data-level"),
    "source_vocab_overlap": QuerySpec(q_source_vocab_overlap, VOCAB_OVERLAP_SQL, "pairwise source vocabulary Jaccard (distinct postings self-join, exact counts), data-level"),
    "asof_next_purchase": QuerySpec(q_asof_next_purchase, ASOF_FWD_SQL, "FORWARD as-of join (next purchase at-or-after each error; union + reverse-ordered window carry) vs native ASOF >= oracle, data-level"),
    # -- round-10 block
    "orders_key_skew": QuerySpec(q_orders_key_skew, KEY_SKEW_SQL, "join-key skew profile: top-20 heavy hitters with exact ppm share + skew ratio vs uniform, data-level"),
    "orders_benford_digits": QuerySpec(q_orders_benford_digits, BENFORD_SQL, "Benford first-digit screen on o_totalprice (integer-cents digit extraction, hardcoded expected ppm), data-level"),
    "copurchase_assortativity": QuerySpec(q_copurchase_assortativity, ASSORTATIVITY_SQL, "degree assortativity of the co-purchase graph (exact decimal Pearson accumulators, one final division), data-level"),
    "source_js_divergence": QuerySpec(q_source_js_divergence, JS_DIVERGENCE_SQL, "pairwise Jensen-Shannon divergence between source unigram distributions (top-500 vocab + residual bucket, token-sorted folds), data-level"),
    "events_seasonal_decomp": QuerySpec(q_events_seasonal_decomp, SEASONAL_DECOMP_SQL, "additive seasonal decomposition of daily event series (integer-exact centered MA + phase means, period 7), data-level"),
    "cosine_docs_lossless": QuerySpec(q_cosine_docs_lossless, COSINE_LOSSLESS_SQL, "LOSSLESS all-pairs tf-idf cosine self-join (Bayardo WWW'07 prefix filter) vs true brute-force oracle, data-level"),
    "doc_quality_calibration": QuerySpec(q_doc_quality_calibration, CALIBRATION_SQL, "calibration/reliability report + per-bin Brier of a repetition scorer vs planted spam (micro-unit quantized, exact integer sums), data-level"),
    "events_holt_forecast": QuerySpec(q_events_holt_forecast, HOLT_SQL, "Holt double exponential smoothing per event type (sorted-list fold, fixed operand order), data-level"),
    "retrieval_rank_overlap": QuerySpec(q_retrieval_rank_overlap, RANK_OVERLAP_SQL, "rank-biased overlap between BM25 and embedding arms (Webber 2010, fixed 10-term fold), data-level"),
    "streaming_heavy_hitters": QuerySpec(q_streaming_heavy_hitters, STREAMING_HH_SQL, "streaming Misra-Gries heavy hitters (O(capacity) state per key) == batch GROUP BY in the exact regime, data-level"),
    "events_welch_ttest": QuerySpec(q_events_welch_ttest, WELCH_SQL, "Welch unequal-variance t-test on event value by cohort (exact decimal accumulators, one double expression), data-level"),
    "events_mann_whitney": QuerySpec(q_events_mann_whitney, MANN_WHITNEY_SQL, "Mann-Whitney U rank-sum test by cohort (two-phase rank, exact doubled midranks, tie-corrected z), data-level"),
    "events_ks_test": QuerySpec(q_events_ks_test, KS_TEST_SQL, "two-sample Kolmogorov-Smirnov D by cohort (exact integer ECDF gap maximum, range-partitioned cumulatives), data-level"),
    # -- round-11 additions
    "streaming_curation_pipeline": QuerySpec(q_streaming_curation_pipeline, STREAMING_PIPELINE_SQL, "COMPOSED checkpointed stream: exact record dedup -> durable canonical near-dup gate -> idempotent windowed agg -> serving readout == batch composition, data-level"),
    # -- round-12 additions
    "opaque_distance_topk": QuerySpec(q_opaque_distance_topk, OPAQUE_DISTANCE_SQL, "comparison-only opaque DistanceRef (traits.rs:29-32): top-k ranked solely through a less_than relation over codebook tokens, never token bytes, data-level"),
}

# Queries rotated out of the 50-entry driver window (it records at most
# 50 rows per round — see NOTES.md "catalog right-sizing"). Their
# operators stay in the engine and their parity stays verified: the
# pytest suite sweeps RETIRED against the same DuckDB oracles at
# sf0.001 (tests/test_retired_parity.py).
_ROTATED_OUT_SPECS: dict[str, QuerySpec] = {
    "rollup_returnflag": QuerySpec(q_rollup_returnflag, Q_ROLLUP_SQL, "grouping sets (CUBE kept in-catalog)"),
    "orders_monthly": QuerySpec(q_orders_monthly, Q_MONTHLY_SQL, "time bucketing (sliding windows kept)"),
    "part_brand_stats": QuerySpec(q_part_brand_stats, Q_PART_SQL, "agg + avg parity (brand-avg filter kept)"),
    "big_customers": QuerySpec(q_big_customers, BIG_CUST_SQL, "HAVING + join (q18 kept)"),
    "events_hourly": QuerySpec(q_events_hourly, Q_EVENTS_HOURLY_SQL, "hourly windows (sliding kept)"),
    "sessionization": QuerySpec(q_sessionization, Q_SESSION_SQL, "gap sessionization (session_window kept)"),
    "sql_nation_revenue": QuerySpec(q_sql_nation_revenue, SQL_NATION_SQL, "spark.sql surface"),
    "vector_norm_stats": QuerySpec(q_vector_norm_stats, NORM_SQL, "vector norms"),
    "rolling_fingerprint": QuerySpec(q_rolling_fingerprint, ROLLING_FP_SQL, "rolling hash (merged into doc_fingerprint)"),
    "knn_exact_cosine": QuerySpec(q_knn_exact_cosine, KNN_COS_SQL, "merged into knn_exact_cosine_dot"),
    "knn_exact_dot": QuerySpec(q_knn_exact_dot, KNN_DOT_SQL, "merged into knn_exact_cosine_dot"),
    "minhash_near_dup_uncapped": QuerySpec(q_minhash_near_dup_uncapped, _minhash_sql(), "uncapped MinHash-LSH (capped is the catalog default)"),
    "ngram_jaccard_uncapped": QuerySpec(q_ngram_jaccard_uncapped, NGRAM_JACCARD_SQL, "uncapped n-gram Jaccard"),
    # rotated out in favor of the round-2 curation block (operator shapes
    # covered elsewhere: conditional aggs by order_status_pivot's cousins
    # in q14/cube, regex by lang_id/events_json, window-rank breadth by
    # customer_running_totals, set algebra trivial at any scale).
    "order_status_pivot": QuerySpec(q_order_status_pivot, PIVOT_SQL, "conditional-agg pivot"),
    "part_type_regex": QuerySpec(q_part_type_regex, REGEX_SQL, "regex/string predicates"),
    "set_ops_nations": QuerySpec(q_set_ops_nations, SET_OPS_SQL, "INTERSECT/EXCEPT"),
    "customer_balance_ranks": QuerySpec(q_customer_balance_ranks, RANKS_SQL, "ntile/percent_rank/cume_dist"),
    "customers_without_orders": QuerySpec(q_customers_without_orders, Q_NO_ORDERS_SQL, "anti join (0-row result; shape used inside dedup/decontaminate)"),
    "vocab_top_tokens": QuerySpec(q_vocab_top_tokens, VOCAB_SQL, "vocabulary build (explode+count+rank shapes kept in-catalog elsewhere)"),
    "nation_customer_agg": QuerySpec(q_nation_customer_agg, STRING_AGG_SQL, "ordered string aggregation"),
    "quantiles_by_segment": QuerySpec(q_quantiles_by_segment, QUANTILE_SQL, "exact quantiles"),
    "doc_quality": QuerySpec(q_doc_quality, Q_QUALITY_SQL, "heuristic quality scoring (exercised in-catalog by curation_pipeline)"),
}


# ---------------------------------------------------------------------------
# Driver-window rotation (round-2 VERDICT item 5; widened r6, r7).
#
# The driver records at most 50 correctness rows per round, while the
# engine holds 131 oracle-backed specs. Eight PINNED entries — one per
# headline operator family (flagship TPC-H agg, HNSW search, exact kNN,
# LSH near-dup, exact dedup, multimodal, streaming ingest, and the
# coroutine op-stream protocol) — hold their slot every round; the other
# 42 slots cycle deterministically through the pool, never-recorded
# oracles first in _DEBUT_ORDER, then oldest-driver-row-first. Everything
# not currently windowed is still parity-swept by pytest every session
# (tests/test_retired_parity.py), so rotation trades WHICH rows get
# fresh driver evidence, never whether a spec stays verified.
#
# r7 widening rationale (VERDICT r6 #4 carried to its conclusion): the
# debut backlog reached 42 never-recorded specs against 12 slots — a
# 3.5-round wait for driver evidence on finished, multi-SF-verified
# work. Every formerly-pinned row already holds driver-green rows from
# r1-r6 and keeps earning fresh ones via oldest-first rotation from r8
# on; the 30 unpinned this round have family coverage inside the new
# pinned core or among the debuting specs themselves.
#
# The round number is inferred from the CORRECTNESS_r*.json artifacts the
# driver itself commits at the end of each round — deterministic within a
# round (the file for the current round doesn't exist yet while it runs)
# and needs no out-of-band signal.

_PINNED_NAMES = [
    "q01_pricing_summary",      # flagship TPC-H aggregate
    "hnsw_search_l2",           # ANN/HNSW core search
    "knn_exact_l2",             # exact-kNN baseline (LinearDb analog)
    "minhash_near_dup",         # LSH near-duplicate family
    "exact_dedup_docs",         # exact dedup family
    "multimodal_pipeline",      # multimodal decode/feature path
    "streaming_ingest_counts",  # structured-streaming ingest
    "op_stream_digest",         # reference coroutine op-log protocol
]
assert all(n in _STABLE_SPECS for n in _PINNED_NAMES)

_ROTATION_POOL: list[str] = list(_ROTATED_OUT_SPECS) + [
    n for n in _STABLE_SPECS if n not in set(_PINNED_NAMES)
]

_ALL_SPECS: dict[str, QuerySpec] = {**_STABLE_SPECS, **_ROTATED_OUT_SPECS}

_ROTATING_SLOTS = 50 - len(_PINNED_NAMES)


def _last_driver_rows() -> dict[str, int]:
    """name → latest round whose committed CORRECTNESS_r{N}.json recorded
    it GREEN (the driver commits the artifact at round end, so the set is
    fixed for the whole current round — deterministic, no out-of-band
    signal). Only fully-green rows count: a recorded FAIL must keep the
    spec at the front of the queue so it re-enters the window the very
    next round (r7's two hash failures would otherwise have rotated out
    unfixed, still never-green)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for name, row in rows.items():
            green = (
                isinstance(row, dict)
                and row.get("rows_match", False)
                and row.get("schema_match", False)
                and row.get("hash_match", True)  # rows-only checks lack it
                and row.get("err") in (None, "")
            )
            if green:
                last[name] = max(last.get(name, -1), rnd)
    return last


# Debut order of never-recorded oracles: earlier debuts take rotating
# slots first (the r5-queued block earns its rows before the r6-tail
# block, which queues behind it for the next round). Append-only; a
# never-recorded name absent here sorts after the listed ones, by name.
_DEBUT_ORDER = [
    # queued in r5 (VERDICT r5 #3/#4)
    "minhash_near_dup_uncapped", "ngram_jaccard_uncapped",
    "nfc_normalize_docs", "sketch_summary", "serving_restart_dispatch",
    # r6
    "ivfpq_ann_l2",
    # r6 tail — the last test-only components earning oracle rows
    "hamming_scan_topk", "custom_metric_knn", "dup_gate_batch",
    "streaming_durable_resume", "streaming_delta_jdbc",
    "streaming_query_serving",
    # r6 tail, second wave — event-time streaming rows first (new
    # operator surface), then the TPC-H widening block
    "streaming_event_windows", "streaming_sessionize",
    "streaming_attribution", "streaming_dedup_exact", "sq8_ann_l2",
    "zorder_values",
    "q07_volume_shipping", "q08_market_share", "q10_returned_items",
    "q13_customer_distribution", "q15_top_supplier",
    "q17_small_qty_revenue", "q21_waiting_supplier",
    "q22_dormant_customers",
    # r7 debuts
    "ivfsq8_ann_l2", "range_search_l2", "filtered_knn_label",
    "profile_lineitem", "table_diff_orders", "doc_length_quantiles",
    "hybrid_rrf_retrieval",
    # r7 tail — analytics / pipeline-maintenance block
    "funnel_conversion", "cohort_retention_weekly", "user_daily_gapfill",
    "incremental_orders_agg", "weighted_sample_orders",
    "events_value_outliers", "edit_distance_join_docs",
    "embedding_pca", "event_transitions", "dq_expectations",
    "copurchase_pairs", "copurchase_triangles", "copurchase_pagerank",
    "scd2_user_state", "streaming_incremental_agg",
    # r8 debuts
    "neardup_canonical_docs", "hard_negatives_l2", "token_budget_sample",
    "chunk_documents", "ivf_manifest_restart", "random_projection_jl",
    # r8 tail
    "cdc_apply_orders", "events_ohlc_hourly", "boolean_retrieval_docs",
    "copurchase_bfs", "knn_join_graph", "events_value_histogram",
    "events_value_trend", "orders_lineitem_cardinality",
    "jaccard_docs_lossless", "copurchase_communities",
    "top_event_paths", "events_value_ewma", "fk_inclusion_profile",
    "mmr_diversify_topk", "tfidf_doc_keywords", "copurchase_item_sim",
    # r9 debuts
    "basket_rules", "events_rolling_median", "events_mad_outliers",
    "token_pmi_pairs",
    # r9 rotation-overflow stragglers + the repaired fd row (VERDICT r9
    # #2/#1): these 11 must earn their FIRST driver rows in the r10
    # window before any r10 debut takes a slot
    "lineitem_fd_violations", "user_conversion_survival",
    "source_ctfidf_terms", "phrase_search_docs", "parts_skyline",
    "purchase_attribution", "retrieval_eval_knn", "user_event_entropy",
    "parts_abc_classes", "purchase_latency_percentiles",
    "source_vocab_overlap",
    # r10 debuts
    "orders_key_skew", "orders_benford_digits",
    "copurchase_assortativity", "source_js_divergence",
    "events_seasonal_decomp", "cosine_docs_lossless",
    "doc_quality_calibration", "events_holt_forecast",
    "retrieval_rank_overlap", "streaming_heavy_hitters",
    "events_welch_ttest", "events_mann_whitney", "events_ks_test",
    # r11 debuts
    "streaming_curation_pipeline",
    # r12 debuts
    "opaque_distance_topk",
]


def _rotate() -> tuple[dict[str, QuerySpec], dict[str, QuerySpec]]:
    """Fill the rotating slots with the pool names whose driver row is
    OLDEST (never-recorded first in debut order, then ties by name) —
    self-correcting round-robin: every oracle keeps earning fresh driver
    rows no matter how the pinned set or pool evolves between rounds."""
    last = _last_driver_rows()

    def _key(n: str):
        l = last.get(n, -1)
        debut = (
            _DEBUT_ORDER.index(n)
            if l < 0 and n in _DEBUT_ORDER
            else len(_DEBUT_ORDER)
        )
        return (l, debut, n)

    pool = sorted(_ROTATION_POOL, key=_key)
    rotating = pool[:_ROTATING_SLOTS]
    catalog = {n: _ALL_SPECS[n] for n in rotating}  # new names first: the
    catalog.update({n: _ALL_SPECS[n] for n in _PINNED_NAMES})  # driver caps at 50
    retired = {n: s for n, s in _ALL_SPECS.items() if n not in catalog}
    return catalog, retired


CATALOG, RETIRED = _rotate()

# Rotation-independent view for callers that key on names (bench.py's
# HEADLINE set must measure the same queries every round regardless of
# which slots they occupy).
ALL_SPECS = _ALL_SPECS
