"""The engine's declared query surface.

Every operator from SURVEY.md §2/§2b is exposed here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where expressible) an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
The driver's correctness gate hash-compares the two result sets, so
each pair is written for *bit-identical* values: decimal-exact
aggregation (functions/numeric.py), deterministic fold order for vector
math, and explicit tiebreaks on every top-k/window.

Modules register themselves on import via the ``@query`` decorator in
``registry.py``; importing this package populates the full registry.
"""

from quick_and_easy_vectordb_spark.queries.registry import (  # noqa: F401
    QUERIES,
    QueryDef,
    oracle_sql,
    queries,
    query,
)

# Import for registration side effects.
from quick_and_easy_vectordb_spark.queries import vector  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import dedup  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import text  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import relational  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import relational_advanced  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import relational_tpch_rest  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import curation  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import events  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import ann  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import multimodal  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import udf_surface  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import lakehouse  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import geo  # noqa: F401,E402
from quick_and_easy_vectordb_spark.queries import quality  # noqa: F401,E402

# ---------------------------------------------------------------------------
# Registry ordering. The driver's per-round oracle gate checks a PREFIX of
# the registry (~50 entries, in iteration order), so the order below rotates
# verification coverage across rounds: queries with no CORRECTNESS row yet
# come first; queries already oracle-green in a prior round move to the back
# (they stay covered by pytest + tools/check.py).
#
# Round-7 prefix = the 23 round-6-continuation queries that have never
# appeared in ANY CORRECTNESS_r*.json (rounds 1-6 cumulatively sampled 242
# of the 265), then queries NEW in round 7 (no driver row possible yet —
# including the continuation-4 session's 40 additions, each landed with
# three-scale + 7-partition local oracle evidence), then the
# oldest-external-evidence backlog in FIFO refresh order. Everything
# checked green in round 6 moves to the back of the line.
# ---------------------------------------------------------------------------
_CHECK_PRIORITY = [
    # -- round-7 prefix: the 23 round-6-continuation queries that have never
    #    appeared in ANY CORRECTNESS_r*.json — they sat just past the
    #    round-6 ~50-entry driver cutoff (CORRECTNESS_r06.json sampled the
    #    first 50 and all 50 passed). With them first, every query
    #    registered through round 6 will have at least one green driver
    #    row. --
    "ann_hnsw_substrate",
    "ann_kmeans_iterated",
    "ev_burst_detection",
    "ev_funnel_time_to_convert",
    "ev_gapfill_interpolate",
    "ev_holt_linear_forecast",
    "ev_stratified_sample_alloc",
    "ev_stream_bitmap_actives",
    "mm_image_dedup_keep_best",
    "mm_video_scene_cuts",
    "rel_null_safe_join",
    "rel_observe_metrics",
    "rel_try_arithmetic",
    "src_csv_quoted_roundtrip",
    "src_orc_roundtrip",
    "src_small_file_compaction",
    "src_xml_roundtrip",
    "text_mix_rebalance_weights",
    "text_ngram_novelty",
    "text_tokenizer_fertility",
    "udf_cogroup_apply",
    "udf_udtf_analyze",
    "vdb_postfilter_search",
    # -- new in round 7, no driver row possible yet (names appended by the
    #    round-7 sessions as each lands oracle-checked) --
    "vdb_shard_topk_merge",
    "vdb_retrieval_metrics",
    "ev_ks_two_sample",
    "ev_welch_ab_test",
    "ev_chisq_type_weekday",
    "ev_lag_feature_matrix",
    "rel_gdpr_cascade_erasure",
    "rel_ntile_deciles",
    "udf_sql_scalar_function",
    "ev_variant_shred",
    "src_binaryfile_ingest",
    "src_dynamic_partition_overwrite",
    "text_bpe_train_rounds",
    "text_positional_phrase_search",
    "mm_decode_gif_stats",
    "mm_image_tiles",
    "mm_audio_downsample",
    "mm_color_hist_neardup",
    "ev_stream_checkpoint_recovery",
    "dedup_incremental_minhash",
    "dedup_label_propagation",
    "vdb_hybrid_score_blend",
    "text_stopword_profile",
    "src_webdataset_tar_roundtrip",
    "src_snapshot_time_travel",
    "vdb_ivf_index_persist",
    "rel_zorder_clustering",
    "src_json_corrupt_records",
    "vdb_stream_append_search",
    "rel_column_profile",
    "geo_grid_knn_join",
    "geo_tile_pyramid",
    "rel_data_expectations",
    "rel_k_anonymity",
    "rel_join_strategy_equivalence",
    "dedup_graph_khop_reach",
    "ev_jackknife_variance",
    "mm_audio_wht_bands",
    "ev_ols_closed_form",
    "geo_point_in_polygon",
    "geo_dbscan_classify",
    "geo_bbox_range_join",
    "geo_trajectory_stats",
    "rel_dp_histogram",
    "ev_hll_daily_union",
    "ev_survival_life_table",
    "rel_fk_discovery",
    "rel_fd_check",
    "rel_benford_check",
    "ann_ivf_filtered_search",
    "ann_ivf_balance_stats",
    "ann_nprobe_recall_curve",
    "text_winnowing_overlap",
    "text_gini_concentration",
    "src_cdc_log_compaction",
    "ev_watermark_lag_audit",
    "rel_join_cardinality_estimate",
    "src_merge_on_read_deletes",
    "ev_roc_auc_exact",
    "ev_calibration_bins",
    "ev_cms_heavy_hitters",
    "text_token_budget_cut",
    "vdb_embedding_covariance",
    "vdb_mips_augmented_search",
    # -- new in round 7 continuation (this session), no driver row yet --
    "ev_stream_left_outer_join",
    "ev_stream_chained_agg",
    "ev_pr_auc_exact",
    "ev_brier_decomposition",
    "dedup_graph_source_modularity",
    "dedup_graph_link_prediction",
    "ann_vamana_occlusion_prune",
    "ann_graph_beam_search",
    "text_bpe_encode_apply",
    "dedup_edit_distance_blocked",
    "ev_mann_kendall_trend",
    "ev_theil_sen_slope",
    "src_copy_on_write_update",
    "ev_hampel_filter",
    "rel_temporal_integrity_audit",
    "mm_integral_image_rect",
    "dedup_cross_source_matrix",
    "src_zone_map_skipping",
    "text_kneser_ney_bigrams",
    "ann_residual_pq_search",
    "ev_cuped_adjustment",
    "rel_wilson_ci_by_segment",
    "vdb_batch_knn_ivf",
    "dedup_minhash_1bit",
    "ev_diff_in_diff",
    "geo_douglas_peucker",
    "vdb_knn_classifier_eval",
    "src_parquet_footer_stats",
    "ev_asof_join_tolerance",
    "ev_stream_late_data_accounting",
    "text_tfidf_weighted_doc_embedding",
    "ev_cep_strict_sequence",
    "ev_shapley_attribution",
    "ev_snaive_backtest_mase",
    "text_rake_keyphrases",
    "ev_ltv_triangle",
    "rel_join_skew_report",
    "ev_stream_join_then_agg",
    "text_watermark_greenlist_detect",
    "mm_median_cut_palette",
    "ev_pinball_loss_eval",
    "dedup_minhash_prf_eval",
    "rel_mv_rollup_rewrite",
    "ev_loo_target_encoding",
    "text_span_corruption_mask",
    # -- round-6 window (all 50 green in CORRECTNESS_r06.json) rotates to
    #    the FIFO backlog below --
    "text_curation_pipeline",
    "ev_append_mode_finalized_windows",
    "ann_sq8_recall",
    "src_python_datasource_sink",
    "rel_pit_dimension_join",
    "vdb_corpus_stats",
    "ev_user_feature_profile",
    "rel_fuzzy_entity_match",
    "ann_centroid_drift",
    "ev_winsorize_trimmed_stats",
    "ev_equi_depth_histogram",
    "udf_pandas_iterator",
    "ev_stream_dedup_within_watermark",
    "rel_running_total_by_month",
    "text_idf_drift",
    "ev_peak_hours",
    "ev_weekday_seasonality",
    "ev_threshold_breach_islands",
    "rel_topn_with_ties",
    # -- re-check after the round-6 output-shape fix (r5 driver err:
    #    raw array column; now emitted as array_join CSV) --
    "rel_array_higher_order",
    # -- new in round 6, no driver row possible yet --
    "mm_decode_jpeg_stats",
    "ev_kmv_distinct_estimate",
    "ev_autocorr_lag1",
    "ev_ordered_funnel_windowed",
    "rel_skyline_frontier",
    "text_vocab_growth",
    "vdb_matryoshka_prefix_search",
    "vdb_power_iteration_step",
    "ev_stream_foreachbatch_upsert",
    "src_partitioned_parquet_prune",
    "src_json_lines_roundtrip",
    # -- round-6 continuation: bitmap distinct, interval sweep-line,
    #    changepoint, sketch set-ops, zipf fit, soft dedup, mutual kNN,
    #    int4 SQ, silence trim, schema evolution --
    "ev_bitmap_daily_actives",
    "ev_rolling_wau_bitmap",
    "ev_max_concurrent_sessions",
    "ev_cusum_changepoint",
    "ev_kmv_set_ops",
    "text_zipf_fit",
    "dedup_soft_weight",
    "vdb_reciprocal_knn_pairs",
    "ann_int4_search",
    "mm_audio_silence_trim",
    "src_parquet_schema_merge",
    "mm_phash_hamming_pairs",
    "dedup_band_tuning",
    "vdb_norm_pruned_search",
    "ev_multi_distinct_profile",
    "text_length_percentiles",
    "udf_pandas_window_agg",
    "vdb_random_projection_search",
    "text_source_divergence_tv",
    # -- (a ~50-entry driver prefix cuts about here; the rest of the
    #    round-6 additions queue first for the round-7 window) --
    # -- oldest-external-evidence backlog, FIFO refresh; everything that
    #    went green in rounds 4-5 rotates to the back of the line --
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "vdb_topk_cosine",
    "vdb_topk_cosine_arrow",
    "vdb_topk_l2",
    "vdb_vector_parse_roundtrip",
    "vdb_vector_stats",
    "vdb_append_union",
    "vdb_batch_knn",
    "vdb_knn_per_label",
    "vdb_binary_quantized_search",
    "vdb_binary_rerank",
    "vdb_count",
    "vdb_filtered_search",
    "vdb_quantized_search",
    "vdb_range_search",
    "vdb_search_after",
    "vdb_threshold_filter",
    "text_chunking",
    "text_fingerprint",
    "text_langid_confusion",
    "text_stats_by_lang",
    "text_tfidf_keywords",
    "text_token_count",
    "text_top_bigrams",
    "text_train_val_split",
    "rel_anti_join_customers",
    "rel_semi_join_customers",
    "rel_outer_join_counts",
    "rel_q3_shipping_topn",
    "rel_q4_exists",
    "rel_rollup_orders",
    "rel_cube_orders",
    "rel_scalar_functions",
    "rel_date_functions",
    "rel_setops_customers",
    "rel_window_rank_customers",
    "vdb_batch_knn_lsh",
    "vdb_mmr_rerank",
    "vdb_hybrid_rrf",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "text_bm25_topk",
    "text_quality_filter",
    "vdb_topk_dot",
    "rel_q1_pricing_summary",
    "rel_q5_region_revenue",
    # -- green in CORRECTNESS_r05 (freshest external evidence, last) --
    "rel_merge_upsert",
    "rel_pivot_segment_year",
    "rel_window_lag_running",
    "rel_median_by_priority",
    "rel_argmax_per_group",
    "rel_string_functions",
    "rel_stats_aggregates",
    "rel_grouping_sets",
    "rel_table_diff",
    "vdb_end_to_end_pipeline",
    "rel_exact_percentiles",
    "rel_window_distribution",
    "rel_window_range_frame",
    "rel_map_functions",
    "rel_json_roundtrip",
    "rel_q20_promotion_suppliers",
    "mm_decode_png_stats",
    "dedup_minhash_lsh_capped",
    "rel_bloom_semi_join",
    "rel_rfm_segmentation",
    "ev_hourly_ohlc",
    "dedup_minhash_estimate_quality",
    "dedup_graph_triangles",
    "dedup_rate_by_source",
    "text_bottomk_sample",
    "ev_stream_stateful_totals",
    "ann_ivf_pq_search",
    "mm_audio_frame_energy",
    "vdb_upsert_vectors",
    "text_boilerplate_flag",
    "ev_hourly_ohlc_streamed",
    "rel_lateral_topn",
    "rel_correlated_scalar_subquery",
    "rel_recursive_engagement_ladder",
    "vdb_delete_vectors",
    "vdb_centroid_routing",
    "text_token_diversity",
    "ev_interarrival_stats",
    "ann_sq8_search",
    "vdb_knn_graph",
    "ev_distinct_users_hourly_streamed",
    "dedup_graph_degree",
    "mm_image_phash",
    "udf_arrow_scalar",
    "vdb_sparse_projection_search",
    "ev_stream_stream_join",
    "ev_session_duration_distribution",
    "mm_audio_fingerprint",
    "dedup_lsh_amplified",
]


def _apply_check_priority() -> None:
    ordered = {n: QUERIES[n] for n in _CHECK_PRIORITY if n in QUERIES}
    for n, q in QUERIES.items():
        if n not in ordered:
            ordered[n] = q
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_check_priority()
