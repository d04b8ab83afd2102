"""Round-9 plan pins.

Headline fix this round (ADVICE r08, medium): ann_recall_curve ranked
the FULL scored embeddings table with an unpartitioned
Window.orderBy(row_number) — a single-partition sort of the whole
corpus at 100 TB, the exact hazard round 8 fixed in
text_pack_sequences. Both rankings are now pre-pruned with
orderBy+limit(max_k), which physically plans as TakeOrderedAndProject
(per-partition heaps, no global sort); row_number then ranks only the
<= 20 survivors. The pins assert that plan is the one that executes.
"""

from __future__ import annotations

import re

from quick_and_easy_vectordb_spark.plans.inspect import formatted_plan
from quick_and_easy_vectordb_spark.queries import QUERIES


def test_recall_curve_windows_rank_only_topk_rows(spark, sf_dir):
    df = QUERIES["ann_recall_curve"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # both the exact and the approx ranking pre-prune via the top-k
    # physical operator (one per ranking; the formatted plan repeats
    # each node in the tree and the detail section)
    assert plan.count("TakeOrderedAndProject") >= 2
    # every Window node's DIRECT child is a TakeOrderedAndProject —
    # i.e. no window ever consumes the raw scan
    tree = [ln for ln in plan.splitlines() if re.search(r"\+- \w|:- \w", ln)]
    for i, ln in enumerate(tree):
        if "Window" in ln:
            assert "TakeOrderedAndProject" in tree[i + 1], tree[i : i + 2]
    # and no plain global Sort feeds a Window (the old shape)
    assert not re.search(r"Window \(\d+\)\n\s*\+- Sort", plan)


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """src_dynamic_partition_pruning: the fact scan must carry a
    dynamicpruningexpression in its PartitionFilters (runtime
    enumeration of surviving date directories from the broadcast dim)
    — without it the plan silently degrades to a full fact read."""
    df = QUERIES["src_dynamic_partition_pruning"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "dynamicpruningexpression" in plan
    assert "PartitionFilters" in plan
    assert "BroadcastHashJoin" in plan


def test_lsh_planes_sweep_rank_uses_window_group_limit(spark, sf_dir):
    """ann_lsh_planes_sweep: the per-config top-10 must plan through
    WindowGroupLimit (partial per-input-partition heaps before the
    exchange). The fused two-window form (rank + count over the same
    4-value key) blocked the rewrite and sorted every candidate inside
    <= 4 partitions — the shape this pin guards against."""
    df = QUERIES["ann_lsh_planes_sweep"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_paragraph_ccnet_single_hash_window_shuffle(spark, sf_dir):
    """dedup_paragraph_ccnet: the first-occurrence ranking partitions
    on the paragraph hash (data-distributed); no single-partition
    window may touch paragraph rows."""
    df = QUERIES["dedup_paragraph_ccnet"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "windowspecdefinition(_w" in plan or "windowspecdefinition(md5" in plan
    assert "SinglePartition" not in plan


def test_ordered_positions_is_distributed_and_correct(spark, sf_dir):
    """src_merge_on_read_deletes' write-time position assignment
    (round-8 verdict's one perf-weak item): the bucketed prefix-sum
    must (a) reproduce row_number() OVER (ORDER BY key) - 1 exactly
    and (b) never single-partition-sort the data — the only
    unpartitioned window allowed is the one over the O(n_buckets)
    count table."""
    from pyspark.sql import functions as F

    from quick_and_easy_vectordb_spark.queries.lakehouse import (
        ordered_positions,
    )
    from quick_and_easy_vectordb_spark.sources.catalog import load_table

    base = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_totalprice")
    out = ordered_positions(base, "o_orderkey")
    plan = formatted_plan(out)
    # the per-row ranking window partitions on the derived bucket
    assert "windowspecdefinition(__bkt" in plan
    # bucket bases reach the rows as a broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan
    rows = out.orderBy("pos").collect()
    keys = [r.o_orderkey for r in rows]
    assert keys == sorted(keys)
    assert [r.pos for r in rows] == list(range(len(rows)))
