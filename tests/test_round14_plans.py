"""Round-14 plan pins — each new query's scale-critical physical
property asserted against `.explain("formatted")`, so a regression in
Catalyst usage (a lost broadcast, a data-sized nested loop, a stray
shuffle) fails in CI rather than at 100 TB.
"""

from __future__ import annotations

import re

from quick_and_easy_vectordb_spark.plans.inspect import formatted_plan
from quick_and_easy_vectordb_spark.queries import QUERIES


def _plan(spark, sf_dir, name):
    return formatted_plan(QUERIES[name].fn(spark, sf_dir))


def _nodes(plan: str, kind: str) -> int:
    """Count physical NODES (formatted mode prints each node twice:
    once in the tree, once as a numbered detail header)."""
    return len(re.findall(rf"\(\d+\) {kind}", plan))


def test_rtree_nn_snap_broadcast_probe_no_allpairs(spark, sf_dir):
    """The leaf-directory probe is the ONLY nested-loop join and its
    build side is the broadcast index (O(N/leaf_cap) rows); the page
    fetch and the argmin attach are hash joins; no CartesianProduct
    anywhere; the argmin is an aggregate, never a data-sized window
    (the only Window nodes belong to the O(index) STR build)."""
    plan = _plan(spark, sf_dir, "geo_rtree_nearest_rect_snap")
    assert "CartesianProduct" not in plan
    assert _nodes(plan, "BroadcastNestedLoopJoin") == 1
    assert _nodes(plan, "BroadcastHashJoin") >= 2  # page fetch +
    assert "HashAggregate" in plan  # min(struct) argmin, combinable


def test_trajectory_rtree_matching_plan(spark, sf_dir):
    """Same probe skeleton as the snap plus exactly the trajectory
    additions: a user_id window for the lag and a combinable edge
    groupBy — still no all-pairs, probe still the lone BNLJ."""
    plan = _plan(spark, sf_dir, "geo_trajectory_rtree_matching")
    assert "CartesianProduct" not in plan
    assert _nodes(plan, "BroadcastNestedLoopJoin") == 1
    assert _nodes(plan, "BroadcastHashJoin") >= 1
    assert "Window" in plan  # the per-user lag


def test_conflict_detect_reads_by_direct_path(spark, sf_dir):
    """Snapshot reads resolve manifests driver-side and scan parquet
    by direct path — no shuffle beyond the two tiny aggregates."""
    plan = _plan(spark, sf_dir, "src_conflict_detect")
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") >= 2  # two snapshots read back
