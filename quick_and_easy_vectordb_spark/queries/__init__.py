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

# ---------------------------------------------------------------------------
# Registry ordering. The driver's per-round oracle gate checks a PREFIX of
# the registry (~50 entries, in iteration order), so the order below rotates
# verification coverage across rounds: queries with no CORRECTNESS row yet
# (or a fixed failure) come first; queries already oracle-green in a prior
# round move to the back (they stay covered by pytest + tools/check.py).
#
# Round-2 prefix = the 2 round-1 failures (array-column outputs, now
# scalarized), the new round-2 queries, then the 66 entries the round-1
# check never reached: events, ann, multimodal, udf_surface, curation, and
# the TPC-H back half of relational.
# ---------------------------------------------------------------------------
_CHECK_PRIORITY = [
    # round-1 FAIL rows, fixed this round
    "vdb_vector_arith",
    "dedup_clusters",
    # new round-2 queries (registered below if present)
    "vdb_batch_knn_lsh",
    "ev_tumbling_hour_streamed",
    # events — no round-1 row
    "ev_tumbling_hour",
    "ev_sliding_window",
    "ev_sessionize",
    "ev_topk_per_type",
    "ev_daily_type_matrix",
    "ev_json_extract",
    "ev_asof_join",
    "ev_heavy_hitters_salted",
    "ev_range_join",
    "ev_salted_join",
    "ev_funnel",
    "ev_retention_cohorts",
    "ev_resample_gapfill",
    "ev_zscore_outliers",
    # ann — no round-1 row
    "ann_lsh_bucket_histogram",
    "ann_lsh_probe",
    "ann_ivf_search",
    "ann_recall_at_k",
    "ann_ivf_multiprobe",
    # multimodal — no round-1 row
    "mm_binary_features",
    "mm_embed_hash_knn",
    "mm_frame_sample",
    # udf surface — no round-1 row
    "udf_grouped_agg_median",
    "udf_grouped_map_gaps",
    "udf_approx_distinct",
    "udf_approx_quantiles",
    # curation — no round-1 row
    "text_weighted_sample",
    "text_vocab_prune",
    "text_bigram_lm_score",
    "text_decontaminate",
    "text_pii_redact",
    "text_repetition_score",
    # TPC-H back half — no round-1 row
    "rel_q7_nation_volume",
    "rel_q10_returned_items",
    "rel_q14_promo_share",
    "rel_q18_large_orders",
    "rel_q19_disjunctive",
    "rel_q6_sql_surface",
    "rel_q15_top_supplier",
    "rel_q17_small_qty_revenue",
    "rel_q2_min_unit_price",
    "rel_q16_supplier_variety",
    "rel_q21_sole_problem_supplier",
    "rel_q22_idle_customers",
    "rel_q8_market_share",
    "rel_q9_profit_by_nation_year",
    # ---- ~50-entry prefix boundary; below here is round-3 rotation ----
    # new round-2 queries (oracle-green via tools/check.py this round;
    # first in line for driver rows if the prefix runs past 50)
    "dedup_keep_best",
    "ev_mad_outliers",
    "ev_stream_dedup_ingest",
    "ev_transition_matrix",
    "ev_distinct_users_hourly",
    "text_domain_mix_sample",
    "text_source_quality_cap",
    "text_shingle_rarity",
    "vdb_gram_matrix",
    "ann_kmeans_one_iter",
    "mm_resize_images",
    "mm_modality_stats",
    "ev_click_attribution",
    "ev_click_attribution_streamed",
    "rel_partial_agg_merge",
    "rel_bucketed_join_revenue",
    "rel_q11_important_parts",
    "rel_q12_priority_by_latency",
    "rel_q13_order_count_distribution",
    "rel_q20_promotion_suppliers",
    "rel_merge_upsert",
    "rel_pivot_segment_year",
    "rel_window_lag_running",
    "rel_median_by_priority",
    "rel_argmax_per_group",
    "rel_string_functions",
    "rel_stats_aggregates",
    "rel_grouping_sets",
    "rel_table_diff",
    "rel_window_distribution",
    "rel_window_range_frame",
    "rel_array_higher_order",
    "rel_map_functions",
    "rel_json_roundtrip",
    "rel_exact_percentiles",
    "vdb_end_to_end_pipeline",
]


def _apply_check_priority() -> None:
    ordered = {n: QUERIES[n] for n in _CHECK_PRIORITY if n in QUERIES}
    for n, q in QUERIES.items():
        if n not in ordered:
            ordered[n] = q
    QUERIES.clear()
    QUERIES.update(ordered)


_apply_check_priority()
