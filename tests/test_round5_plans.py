"""Plan-shape regression tests for the round-5-continuation operators:
the scale-critical properties each docstring promises, pinned against
the actual optimized physical plan (plans/inspect.py helpers)."""

from __future__ import annotations

from quick_and_easy_vectordb_spark.plans.inspect import (
    broadcast_join_count,
    formatted_plan,
    is_top_k,
    shuffle_count,
)
from quick_and_easy_vectordb_spark.queries import QUERIES


def _plan(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir)


def test_sparse_projection_is_zero_shuffle_topk(spark, sf_dir):
    """The SPLADE-style projection is pure array expressions inside the
    scan: no exchange anywhere, top-k as a distributed heap take."""
    df = _plan(spark, sf_dir, "vdb_sparse_projection_search")
    assert shuffle_count(df) == 0
    assert is_top_k(df)


def test_sq8_broadcasts_stats_never_shuffles_corpus(spark, sf_dir):
    """SQ8 training shuffles only O(dim) partials; the corpus scan is
    unshuffled with the 1-row [mns, spans] stats broadcast onto it."""
    df = _plan(spark, sf_dir, "ann_sq8_search")
    assert broadcast_join_count(df) >= 1
    # train agg (pos partials) + AQE detail may add one tiny exchange;
    # anything >2 would mean the corpus itself started shuffling.
    assert shuffle_count(df) <= 2
    assert is_top_k(df)


def test_knn_graph_is_equijoin_not_cartesian(spark, sf_dir):
    """The blocked k-NN graph must join on the block key — a cartesian
    product here is the quadratic failure the blocking exists to
    prevent."""
    df = _plan(spark, sf_dir, "vdb_knn_graph")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_fuzzy_entity_match_is_blocked_equijoin(spark, sf_dir):
    """Entity resolution joins within blocks (equi-join on the blocking
    key), never all-pairs."""
    df = _plan(spark, sf_dir, "rel_fuzzy_entity_match")
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_delete_vectors_broadcasts_tombstones(spark, sf_dir):
    """The DELETE path anti-joins a broadcast tombstone set — the
    corpus must not shuffle for a delete."""
    df = _plan(spark, sf_dir, "vdb_delete_vectors")
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert is_top_k(df)


def test_winsorize_broadcasts_bounds(spark, sf_dir):
    """Per-type p1/p99 bounds are a tiny aggregate broadcast back onto
    the fact scan; the fact table itself never shuffles for the clip."""
    df = _plan(spark, sf_dir, "ev_winsorize_trimmed_stats")
    assert broadcast_join_count(df) >= 1


def test_centroid_routing_shuffles_only_partials(spark, sf_dir):
    """The centroid build's shuffle carries (label, pos) partials —
    two aggregations' worth of exchanges at most (plus AQE reads),
    never a per-vector shuffle stage count."""
    df = _plan(spark, sf_dir, "vdb_centroid_routing")
    assert shuffle_count(df) <= 3
