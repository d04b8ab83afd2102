"""Plan-shape regression tests for the round-6 continuation operators:
each pins the scale-critical property its docstring promises (bounded
shuffles for the bitmap rollup, no global sort in the interval sweep,
equi-join-only candidate generation for pHash multi-index, top-k
pushdown for int4, WindowGroupLimit for the stratified sampler)."""

from __future__ import annotations

from quick_and_easy_vectordb_spark.plans.inspect import (
    formatted_plan,
    is_top_k,
    shuffle_count,
)
from quick_and_easy_vectordb_spark.queries import QUERIES


def test_bitmap_daily_actives_two_shuffles(spark, sf_dir):
    """The bitmap rollup is exactly two exchanges: events →
    (day, word) bitmaps, bitmaps → per-day popcount sums. Anything
    more means the per-event rows leaked past the first aggregate.
    (Cache cleared first: ev_rolling_wau_bitmap persists an identical
    daily-bitmap fragment that the CacheManager would otherwise
    substitute here, hiding the first exchange.)"""
    spark.catalog.clearCache()
    df = QUERIES["ev_bitmap_daily_actives"].fn(spark, sf_dir)
    assert shuffle_count(df) == 2


def test_rolling_wau_shuffles_bitmaps_not_events(spark, sf_dir):
    """The ×7 fanout must happen AFTER the daily bitmap aggregation
    (explode of (day, word, bm) rows), so no plan node expands raw
    events sevenfold: the Generate sits above the first aggregate."""
    df = QUERIES["ev_rolling_wau_bitmap"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # explode input must be the aggregated bitmap row, not ts/user
    gen = [ln for ln in plan.splitlines() if "explode(sequence(day" in ln]
    assert gen and "bm#" in gen[0]


def test_concurrency_sweep_no_global_sort(spark, sf_dir):
    """Every sort in the sweep is hour-partitioned (window sort or
    in-partition); a range-partitioned exchange would mean a global
    order-by-time pass crept back in."""
    df = QUERIES["ev_max_concurrent_sessions"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "rangepartitioning" not in plan.lower()
    assert "CartesianProduct" not in plan


def test_phash_pairs_equi_join_only(spark, sf_dir):
    """Multi-index candidate generation must be an equi-join on
    (band, key) — a nested-loop/cartesian here means the banding
    degenerated to all-pairs."""
    df = QUERIES["mm_phash_hamming_pairs"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_int4_search_is_top_k(spark, sf_dir):
    """The int4 rerank must end in TakeOrderedAndProject (never a
    global sort of all scores)."""
    df = QUERIES["ann_int4_search"].fn(spark, sf_dir)
    assert is_top_k(df)


def test_stratified_sample_window_group_limit(spark, sf_dir):
    """The per-stratum md5 rank must carry a WindowGroupLimit (heap
    bound below the sort) — the property that keeps per-task state
    O(K) instead of O(events). The query achieves this with a LITERAL
    rn <= K pre-filter (n_alloc <= K by construction); the
    join-derived n_alloc bound alone could not push."""
    df = QUERIES["ev_stratified_sample_alloc"].fn(spark, sf_dir)
    assert "WindowGroupLimit" in formatted_plan(df)


def test_reciprocal_pairs_no_cartesian(spark, sf_dir):
    """Both the label-blocked kNN join and the reversed-key mutuality
    join must stay equi-joins."""
    df = QUERIES["vdb_reciprocal_knn_pairs"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
