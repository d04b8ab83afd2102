"""Plan-shape regression tests for the round-7 operators: each pins
the scale-critical property its docstring promises (per-shard heap +
merge for scatter-gather top-k, bucket-partitioned windows instead of
single-partition sorts for distributed NTILE/KS, broadcast-only
cascades for GDPR erasure, equi-join-only candidate generation for
the phrase index and incremental dedup, TakeOrdered for the hybrid
blend, one user-window pass for the lag-feature matrix)."""

from __future__ import annotations

import re

from quick_and_easy_vectordb_spark.plans.inspect import (
    formatted_plan,
    is_top_k,
    shuffle_count,
)
from quick_and_easy_vectordb_spark.queries import QUERIES


def test_shard_topk_merge_uses_per_shard_heaps(spark, sf_dir):
    """Scatter-gather: a WindowGroupLimit (bounded heap) must run
    BEFORE the shard exchange, and the gather is TakeOrdered — the
    corpus never fully sorts."""
    df = QUERIES["vdb_shard_topk_merge"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert is_top_k(df)


def test_ntile_window_is_bucket_partitioned(spark, sf_dir):
    """Distributed NTILE: the fact-table window partitions by the
    range bucket (parallel), and no built-in ntile() — which would
    force a single-partition sort — appears anywhere."""
    df = QUERIES["rel_ntile_deciles"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "windowspecdefinition(bkt" in plan
    assert "ntile(" not in plan


def test_ks_prefix_sum_is_bucket_partitioned(spark, sf_dir):
    """The ECDF cumsum must ride the per-bucket window; only the
    ~62-row bucket-offset table may see a single-partition window."""
    df = QUERIES["ev_ks_two_sample"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "windowspecdefinition(bkt" in plan


def test_gdpr_cascade_is_broadcast_only(spark, sf_dir):
    """Both cascade hops and the survivor anti-join must broadcast the
    keyset — a sort-merge join here would shuffle the fact tables."""
    df = QUERIES["rel_gdpr_cascade_erasure"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_phrase_search_equi_join_only(spark, sf_dir):
    """The positional adjacency must be an equi-join on
    (doc_id, pos+1), never a nested loop over postings."""
    df = QUERIES["text_positional_phrase_search"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_dedup_no_cartesian(spark, sf_dir):
    """Candidate generation stays banded (equi-join) even with the
    new-batch filter applied downstream."""
    spark.catalog.clearCache()
    df = QUERIES["dedup_incremental_minhash"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_hybrid_blend_is_top_k(spark, sf_dir):
    df = QUERIES["vdb_hybrid_score_blend"].fn(spark, sf_dir)
    assert is_top_k(df)


def test_lag_features_single_user_shuffle(spark, sf_dir):
    """All four features must come from ONE user_id-clustered
    exchange: lag1/lag2/rolling/gap share the window's sort."""
    df = QUERIES["ev_lag_feature_matrix"].fn(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_bpe_rounds_no_cartesian_blowup(spark, sf_dir):
    """Each round's best-pair attach is a 1-row broadcast; the word
    table must never expand through a CartesianProduct."""
    df = QUERIES["text_bpe_train_rounds"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_webdataset_roundtrip_single_shuffle(spark, sf_dir):
    """Tar-shard write+parse must be ONE exchange (the shard groupBy
    the writer needs by definition): sample assembly on the read side
    rides the format's contiguity contract, never a shuffle."""
    df = QUERIES["src_webdataset_tar_roundtrip"].fn(spark, sf_dir)
    assert shuffle_count(df) == 1
    plan = formatted_plan(df)
    assert "FlatMapGroupsInPandas" in plan  # distributed shard writer
    assert "MapInPandas" in plan  # distributed shard parser


def test_ivf_index_persist_partition_prunes_cell_scan(spark, sf_dir):
    """The persisted-index search must touch only the probed cell:
    the label-partitioned assignment scan carries a dynamic partition
    pruning filter fed by the centroid-scoring subquery, and the
    final top-k is a bounded heap, not a full sort."""
    df = QUERIES["vdb_ivf_index_persist"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan
    assert is_top_k(df)


def test_zorder_key_is_pure_codegen(spark, sf_dir):
    """The morton key must be integer bit arithmetic in codegen — no
    Python eval, no join; layout quality must come out as claimed:
    z-order buckets bound BOTH dims, the linear layout leaves y at
    ~full range."""
    df = QUERIES["rel_zorder_clustering"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan
    assert "Join" not in plan
    rows = {r["layout"]: r for r in (x.asDict() for x in df.collect())}
    assert rows["zorder"]["avg_y_span"] * 2 < rows["linear"]["avg_y_span"]
    assert rows["zorder"]["avg_x_span"] < 1024 / 4


def test_stream_append_search_is_top_k(spark, sf_dir):
    """The search over the stream-accumulated table must plan as a
    bounded-heap top-k, not a full sort."""
    df = QUERIES["vdb_stream_append_search"].fn(spark, sf_dir)
    assert is_top_k(df)


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """All three physical join algorithms must appear in the ONE
    plan — the hints were honored, not coalesced into a single
    strategy."""
    df = QUERIES["rel_join_strategy_equivalence"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan
    assert "ShuffledHashJoin" in plan


def test_geo_knn_join_is_equi_join_plus_heap(spark, sf_dir):
    """Grid blocking: candidates come from a broadcast EQUI-join on
    the cell key (no cartesian, no Python), and the per-customer
    top-1 is a bounded WindowGroupLimit heap."""
    df = QUERIES["geo_grid_knn_join"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan
    assert "WindowGroupLimit" in plan


def test_geo_tile_pyramid_single_point_pass(spark, sf_dir):
    """The quadkey is pure codegen arithmetic and the zoom-2 level
    reaggregates tile rows — the plan reads the customer scan for
    the z4 branch, never joins point data."""
    df = QUERIES["geo_tile_pyramid"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan
    assert "Join" not in plan


def test_bfs_khop_joins_frontier_not_reached_set(spark, sf_dir):
    """Each hop equi-joins the frontier against the edge table; no
    cartesian shapes beyond the 1-row count broadcast."""
    df = QUERIES["dedup_graph_khop_reach"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    rows = {r["hop"]: r["n_nodes"] for r in df.collect()}
    assert 0 in rows and 3 in rows


def test_jackknife_is_group_closed_form(spark, sf_dir):
    """The jackknife must stay JVM-side (closed-form from group
    aggregates + an array fold) — no Python, no per-row resampling
    join."""
    df = QUERIES["ev_jackknife_variance"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Python" not in plan
    row = df.collect()[0]
    assert row["n_groups"] > 100 and row["jk_se"] > 0.0


def test_point_in_polygon_is_pure_codegen(spark, sf_dir):
    """The ray-casting test must constant-fold into one projection:
    no join, no Python, and exactly one (aggregation) exchange."""
    df = QUERIES["geo_point_in_polygon"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert "Python" not in plan
    row = df.collect()[0]
    assert row["n_inside"] > 0 and row["n_outside"] > 0


def test_ols_is_single_moment_aggregate(spark, sf_dir):
    """The OLS fit must collapse to one aggregate over the scan —
    one shuffle of a 1-row moment set, no self-joins, no Python."""
    df = QUERIES["ev_ols_closed_form"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert "Python" not in plan
    assert shuffle_count(df) <= 1


# -- round-7 continuation 3: geo/profiling/sketch/ANN-tuning batch --


def test_dbscan_candidates_are_equi_join(spark, sf_dir):
    """The eps-neighborhood pair generation must be a cell-keyed
    equi-join (replicated 3x3 blocking) — never a cross product with
    a distance predicate."""
    df = QUERIES["geo_dbscan_classify"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bbox_range_join_is_single_shuffle_broadcast(spark, sf_dir):
    """Rectangle containment: replicated rects broadcast, the point
    side joins on its single cell — one shuffle total (the final
    groupBy), no nested-loop range join."""
    df = QUERIES["geo_bbox_range_join"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) == 1


def test_trajectory_reuses_user_partitioning(spark, sf_dir):
    """The lag window and the per-user aggregate must share ONE
    user_id exchange."""
    df = QUERIES["geo_trajectory_stats"].fn(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_dp_histogram_noise_is_codegen_projection(spark, sf_dir):
    """The noise ladder adds no shuffle beyond the groupBy, and no
    Python UDF appears (the inverse-CDF CASE is constant-folded
    JVM-side)."""
    df = QUERIES["rel_dp_histogram"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert shuffle_count(df) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hll_union_aggregates_sketches_not_ids(spark, sf_dir):
    """The rollup re-aggregation must run over hll sketches (binary
    register arrays), proving the mergeable-sketch shape."""
    df = QUERIES["ev_hll_daily_union"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "hll_sketch_agg" in plan
    assert "hll_union_agg" in plan


def test_fd_check_is_join_free(spark, sf_dir):
    """FD validation is pure aggregation — any join in the plan means
    the reduction regressed to a pairwise comparison."""
    df = QUERIES["rel_fd_check"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan


def test_fk_discovery_broadcasts_dimension_parents(spark, sf_dir):
    """Dimension-side inclusion probes must broadcast the parent key
    set; nothing may degenerate to a cross product."""
    df = QUERIES["rel_fk_discovery"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_benford_expectations_broadcast(spark, sf_dir):
    """The 9-row expectation table must broadcast against the digit
    counts."""
    df = QUERIES["rel_benford_check"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan


def test_filtered_ivf_filters_before_topk(spark, sf_dir):
    """Filtered ANN: the metadata predicate must sit below the top-k
    (pre-filter), the probed-cell join must broadcast the winner
    labels, and the top-k is a bounded heap."""
    df = QUERIES["ann_ivf_filtered_search"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert is_top_k(df)


def test_nprobe_curve_probe_sets_are_broadcast_topk(spark, sf_dir):
    """Each curve point's candidate join broadcasts the ranked label
    set and takes top-k with a heap, sharing one scan DAG."""
    df = QUERIES["ann_nprobe_recall_curve"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert is_top_k(df)


def test_watermark_audit_prefix_max_is_bucket_partitioned(spark, sf_dir):
    """The running max must ride the arrival-bucket window (parallel);
    only the O(buckets) offset table may see a single-partition
    window."""
    df = QUERIES["ev_watermark_lag_audit"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "windowspecdefinition(bkt" in plan


def test_cardinality_estimate_joins_histograms_not_facts(spark, sf_dir):
    """The exact-size product must join aggregated histogram rows —
    both join inputs carry a count column, and no fact-table column
    (o_totalprice etc.) survives into any join."""
    df = QUERIES["rel_join_cardinality_estimate"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "o_totalprice" not in plan


def test_merge_on_read_deletes_broadcast_anti_joins(spark, sf_dir):
    """Both delete files must apply as BROADCAST anti-joins over the
    streaming base scan — no shuffle of the base data."""
    df = QUERIES["src_merge_on_read_deletes"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
