"""Round-8 plan pins.

The headline fix this round: text_pack_sequences' running-sum window
previously ran as ONE global unpartitioned window (a single-partition
sort at 100 TB — flagged perf-weak in round 7's verdict). The pack is
now sharded on a doc_id-derived key, so the pins assert the plan that
actually executes is the parallel one: a shard-partitioned window, no
SinglePartition exchange anywhere, and — because the groupBy keys are
prefixed by the window's partition key — NO second shuffle for the
final aggregate.
"""

from __future__ import annotations

from quick_and_easy_vectordb_spark.plans.inspect import (
    formatted_plan,
    shuffle_count,
)
from quick_and_easy_vectordb_spark.queries import QUERIES


def test_pack_sequences_window_is_shard_partitioned(spark, sf_dir):
    df = QUERIES["text_pack_sequences"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # the running sum partitions on the shard key …
    assert "windowspecdefinition(shard" in plan
    # … and nothing in the plan collapses to one partition
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan


def test_pack_sequences_single_shuffle_total(spark, sf_dir):
    """groupBy(shard, bin) is satisfied by the window's shard
    distribution — EnsureRequirements must not insert a second
    exchange after the window."""
    df = QUERIES["text_pack_sequences"].fn(spark, sf_dir)
    assert shuffle_count(df) == 1


def test_pack_sequences_scan_prunes_to_two_columns(spark, sf_dir):
    df = QUERIES["text_pack_sequences"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
