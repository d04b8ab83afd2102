"""Plan pins for the round-12 additions: the physical plan each
operator PROMISES (no nested loops where a hash join is the contract,
bounded shuffle counts, point data touched once)."""

from __future__ import annotations

import pytest

from quick_and_easy_vectordb_spark.plans.inspect import (
    formatted_plan,
    shuffle_count,
)
from quick_and_easy_vectordb_spark.queries import QUERIES


def _df(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir)


def test_triangle_overlap_is_cell_key_hash_join(spark, sf_dir):
    """Bipartite PBSM: candidates must come from an equi-join on the
    grid cell key — never a nested loop over the bbox predicates —
    and reference-point dedup means no Distinct/Dedup node."""
    df = _df(spark, sf_dir, "geo_triangle_overlap_join")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Deduplicate" not in plan and "Distinct" not in plan


def test_triangle_overlap_result_nontrivial(spark, sf_dir):
    row = _df(spark, sf_dir, "geo_triangle_overlap_join").collect()[0]
    assert row["n_candidates"] > 0
    assert 0 < row["n_overlaps"] <= row["n_candidates"]


def test_geohash_prefix_agg_single_point_shuffle(spark, sf_dir):
    """Points shuffle once into the finest cell table; levels 1-3
    re-aggregate cells. Union of 4 aggregates = 1 point shuffle + 3
    cell shuffles; anything above means a level re-scanned points."""
    import re

    df = _df(spark, sf_dir, "geo_geohash_prefix_agg")
    assert shuffle_count(df) == 2  # points -> cells, cells -> pyramid
    plan = formatted_plan(df)
    # The point-level table must be scanned exactly once (details
    # section lists each node once as "(n) Scan parquet").
    assert len(re.findall(r"^\s*\(\d+\) Scan parquet", plan,
                          re.MULTILINE)) == 1


def test_geohash_prefix_levels_are_consistent(spark, sf_dir):
    import collections

    rows = _df(spark, sf_dir, "geo_geohash_prefix_agg").collect()
    by_level = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        by_level[r["level"]][0] += r["n_points"]
        by_level[r["level"]][1] += r["key_checksum"]
    # Every level partitions the same point set.
    totals = set(tuple(v) for v in by_level.values())
    assert len(totals) == 1 and len(by_level) == 4


def test_quadtree_leaves_partition_points(spark, sf_dir):
    """Leaves must cover every point exactly once, and the adaptive
    frontier must actually vary (at least two distinct leaf depths at
    sf0.01 — the uniform-synthesis failure mode collapsed everything
    to the cap)."""
    from pyspark.sql import functions as F

    from quick_and_easy_vectordb_spark.sources.catalog import load_table

    rows = _df(spark, sf_dir, "geo_quadtree_leaf_cells").collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_points"] for r in rows) == n_orders
    depths = {r["depth"] for r in rows}
    if n_orders >= 10000:  # sf0.01+: the skewed tail is sparse
        assert len(depths) >= 2
    # No leaf both exceeds the threshold and sits above the cap.
    for r in rows:
        assert r["depth"] == 3 or r["n_points"] <= 400


def test_quadtree_single_point_shuffle(spark, sf_dir):
    """One shuffle of points into the finest cells; everything above
    is rollups of <= 64-row cell tables plus broadcast parent joins."""
    df = _df(spark, sf_dir, "geo_quadtree_leaf_cells")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # parent joins stay broadcast
    # Points (orders) scanned once; cell-table ops don't re-read them.
    assert plan.count("orders.parquet]") <= plan.count("Scan parquet")


def test_hard_negative_lsh_is_bucket_equijoin(spark, sf_dir):
    """The LSH swap's whole point: NO broadcast of the anchor set, NO
    nested loop — candidates come from a shuffle equi-join on the
    bucket string, with the label exclusion riding that join."""
    df = _df(spark, sf_dir, "vdb_hard_negative_mining_lsh")
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # HASH join keyed on the bucket string. At sf0.01 the planner
    # broadcasts the tiny side (BroadcastHashJoin) — still the
    # equi-join contract; at scale the same plan degrades gracefully
    # to SortMergeJoin because the join KEY exists (a nested loop has
    # no such fallback).
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)
    assert "__bucket" in plan


def test_hard_negative_lsh_excludes_anchor_label(spark, sf_dir):
    from quick_and_easy_vectordb_spark.sources.catalog import load_table

    rows = _df(spark, sf_dir, "vdb_hard_negative_mining_lsh").collect()
    assert rows
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label").collect()
    }
    for r in rows:
        assert r["neg_label"] != labels[r["query_id"]]


def test_rect_cover_sweep_has_no_join(spark, sf_dir):
    """The sweep's point: coverage without rect x cell joins — the
    plan must contain NO join node at all, just explode + aggregate +
    window."""
    df = _df(spark, sf_dir, "geo_rect_cover_segments")
    plan = formatted_plan(df)
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 3  # union-agg + window (+AQE variance)


def test_rect_cover_segments_conserve_area(spark, sf_dir):
    """Integral of coverage over segments == total rectangle area —
    the conservation law the difference-array construction implies."""
    from quick_and_easy_vectordb_spark.sources.catalog import load_table

    rows = _df(spark, sf_dir, "geo_rect_cover_segments").collect()
    covered = sum(
        r["coverage"] * (r["cx_to"] - r["cx_from"]) for r in rows
    )
    k = [r["c_custkey"] for r in
         load_table(spark, sf_dir, "customer").select("c_custkey").collect()]
    area = sum((1 + kk * 13 % 8) * (1 + kk * 17 % 6) for kk in k)
    assert covered == area


@pytest.mark.parametrize(
    "name",
    ["geo_triangle_overlap_join", "geo_geohash_prefix_agg",
     "geo_quadtree_leaf_cells", "mm_decode_tiff_stats",
     "vdb_hard_negative_mining_lsh", "src_protobuf_packed_nested",
     "geo_rect_cover_segments", "src_avro_binary_roundtrip",
     "geo_rect_union_length", "geo_direction_rose",
     "geo_grid_boxblur_density"],
)
def test_round12_schema_stable(spark, sf_dir, name):
    df = _df(spark, sf_dir, name)
    assert df.schema == _df(spark, sf_dir, name).schema
