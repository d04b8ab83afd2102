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


# -- round-14 second wave: sketch UDAFs, SPANN replication, blocked GEMM --


def test_hll_register_merge_plan_and_values(spark, sf_dir):
    """Register build must be a combinable hash aggregate (max per
    (type, idx) — partial merge IS the HLL merge); the pandas estimate
    stage sees O(G*64) rows (FlatMapGroupsInPandas present); no
    cartesian. Values: estimate positive and within 3x of exact (m=64
    raw HLL at n/m~2 is coarse but not wild), zero registers < 64."""
    plan = _plan(spark, sf_dir, "udf_hll_register_merge")
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "HashAggregate" in plan
    rows = QUERIES["udf_hll_register_merge"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.hll_estimate < 3.0 * r.exact_distinct + 10
        assert r.hll_estimate > r.exact_distinct / 3.0
        assert 0 <= r.n_zero_registers < 64


def test_bloom_bitwise_udaf_plan_and_audit(spark, sf_dir):
    """Bloom table must broadcast onto the probe (sketch is O(sources x
    words)); the OR-merge is the pandas UDAF (AggregateInPandas); no
    cartesian. Audit invariant: every true duplicate is flagged (Bloom
    has no false negatives), fill bounded by the bitmap size."""
    plan = _plan(spark, sf_dir, "udf_bloom_bitwise_udaf")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "ArrowAggregatePython" in plan  # the grouped pandas UDAF
    rows = QUERIES["udf_bloom_bitwise_udaf"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_true_dup <= r.n_flagged <= r.n_docs_a
        assert 0 <= r.bits_set_b <= 128


def test_spann_multi_assign_zero_shuffle_assignment(spark, sf_dir):
    """The assignment phase must be per-row array expressions over a
    1-row broadcast centroid list: the only joins are broadcasts (the
    1-row collect_list cross and the probe-cell attach); no
    CartesianProduct node, no data-sized Window. Semantics: the probe
    cell's postings include every vector whose home IS the probe cell
    (replication only adds)."""
    plan = _plan(spark, sf_dir, "ann_spann_multi_assign")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    rows = QUERIES["ann_spann_multi_assign"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    # top-1 is always the true nearest vector's own cell or a boundary
    # copy — either way l2 is sorted ascending with vec_id tiebreak
    ds = [(r.l2_dist, r.vec_id) for r in rows]
    assert ds == sorted(ds)


def test_gemm_blocked_matches_exact_int_ranking(spark, sf_dir):
    """The batch-local top-k + global merge must equal the exact
    quantized ranking computed driver-side over the full (tiny) smoke
    table; plan has ArrowEvalPython/MapInPandas and a TakeOrdered merge,
    no global Sort of the full table followed by Limit-less collect."""
    import numpy as np

    from quick_and_easy_vectordb_spark.queries.vector import (
        _GEMM_SCALE,
        _gemm_quantized_query,
    )
    from quick_and_easy_vectordb_spark.sources.catalog import load_table

    plan = _plan(spark, sf_dir, "vdb_topk_gemm_blocked")
    assert "MapInPandas" in plan
    assert "TakeOrderedAndProject" in plan
    got = [
        (r.vec_id, r.qscore)
        for r in QUERIES["vdb_topk_gemm_blocked"].fn(spark, sf_dir).collect()
    ]
    emb = load_table(spark, sf_dir, "embeddings").collect()
    q = np.asarray(_gemm_quantized_query(), dtype=np.int64)

    def quant(x: float) -> int:
        s = float(x) * _GEMM_SCALE
        return int(s + 0.5) if s >= 0 else -int(-s + 0.5)

    exact = sorted(
        (
            (int(np.dot(np.asarray([quant(v) for v in r.embedding], np.int64), q)), -r.vec_id)
            for r in emb
        ),
        reverse=True,
    )[: len(got)]
    assert got == [(-nid, s) for s, nid in exact]


def test_stream_hll_equals_batch_sketch(spark, sf_dir):
    """Stream-batch equivalence for sketch maintenance: the streaming
    stateful max-per-register must produce the SAME registers as the
    batch build, so the estimates (exact dyadic sums) are equal — and
    the fixed-size-state claim holds (sink rows <= G*64)."""
    batch = {
        r.event_type: (r.exact_distinct, r.hll_estimate, r.n_zero_registers)
        for r in QUERIES["udf_hll_register_merge"].fn(spark, sf_dir).collect()
    }
    streamed = {
        r.event_type: (r.exact_distinct, r.hll_estimate, r.n_zero_registers)
        for r in QUERIES["ev_stream_hll_distinct"].fn(spark, sf_dir).collect()
    }
    assert streamed == batch
    assert len(spark.table("ev_stream_hll_distinct_sink").collect()) <= len(batch) * 64


def test_sql_pipe_syntax_equivalence(spark, sf_dir):
    """Spark 4 SQL pipe syntax (|>) is sugar over the same logical
    plan: the piped Q1-shape aggregation must produce exactly the
    classic SQL's rows. Surface-pin only — no registry row, because
    the physical plan is identical to rel_q1's shape (the round-13
    consolidation criterion)."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "__pipe_li"
    )
    piped = spark.sql(
        """
FROM __pipe_li
|> WHERE l_shipdate <= DATE '1998-09-02'
|> AGGREGATE COUNT(*) AS n, SUM(l_quantity) AS sum_qty
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""
    ).collect()
    classic = spark.sql(
        """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
FROM __pipe_li WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
    ).collect()
    assert piped == classic


def test_cogroup_apply_in_arrow_plan_and_values(spark, sf_dir):
    """The Arrow cogroup must plan as FlatMapCoGroupsInArrow (one
    co-partitioning shuffle per side, no join node); values: matched
    count bounded by order count, gaps nonnegative, and a user with
    orders but no events yields (0, -1)."""
    plan = _plan(spark, sf_dir, "udf_cogroup_apply_in_arrow")
    assert "FlatMapCoGroupsInArrow" in plan
    assert "CartesianProduct" not in plan
    rows = QUERIES["udf_cogroup_apply_in_arrow"].fn(spark, sf_dir).collect()
    assert rows
    assert any(r.n_matched == 0 and r.max_gap_us == -1 for r in rows)
    for r in rows:
        assert 0 <= r.n_matched <= r.n_orders
        assert r.max_gap_us >= -1
