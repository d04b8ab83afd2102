"""Round-13 plan pins — each new query's scale-critical physical
property asserted against `.explain("formatted")`, so a regression in
Catalyst usage (a lost broadcast, a single-partition data window, a
stray shuffle) fails in CI rather than at 100 TB.
"""

from __future__ import annotations

import re

from quick_and_easy_vectordb_spark.plans.inspect import formatted_plan
from quick_and_easy_vectordb_spark.queries import QUERIES


def _df(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir)


def _plan(spark, sf_dir, name):
    return formatted_plan(_df(spark, sf_dir, name))


def _hash_shuffles(plan: str) -> int:
    """Exchange nodes whose Arguments line says hash/range partitioning
    (formatted mode separates the node from its arguments)."""
    return len(re.findall(
        r"Arguments: (?:hash|range)partitioning", plan
    ))


def _single_part_shuffles(plan: str) -> int:
    return len(re.findall(r"Arguments: SinglePartition", plan))


def _payload_free_fanout_only(plan: str) -> bool:
    """True iff every Exchange in the plan is a round-robin fan-out
    (the scale-adaptive ``ensure_parallelism`` of the pruned id scan —
    round-14 optimization). Round-robin moves only the tiny pre-synth
    id/text rows; a hash/range/single-partition exchange would mean
    payload bytes (or a data-sized key) started crossing the wire."""
    kinds = re.findall(r"Arguments: (\w+)Partitioning", plan)
    return all(k == "RoundRobin" for k in kinds) and (
        "SinglePartition" not in plan
    )


def test_mjpeg_decode_is_one_arrow_pass_no_shuffle(spark, sf_dir):
    """The whole synth+container-walk+JPEG-decode pipeline is ONE
    MapInPandas stage over a pruned single-column scan; the only
    allowed Exchange is the round-robin id fan-out (ensure_parallelism
    — a no-op at scale, full-CPU decode on a single-split table): a
    hash/range exchange would mean payload bytes started crossing the
    wire."""
    plan = _plan(spark, sf_dir, "mm_decode_mjpeg_frames")
    assert plan.count("MapInPandas") >= 1
    assert _payload_free_fanout_only(plan)
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_video_temporal_diff_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "mm_video_temporal_diff")
    assert _payload_free_fanout_only(plan)
    assert plan.count("MapInPandas") >= 1


def test_rect_overlay_single_cell_shuffle(spark, sf_dir):
    """PBSM = ONE equi-join shuffle on the cell key; the exact area
    refinement must not degrade the join to a nested loop."""
    plan = _plan(spark, sf_dir, "geo_rect_overlap_area_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # equi-join on the cell key: SMJ/SHJ at scale; at sf0.01 AQE may
    # legally broadcast the smaller replicated side — all three are
    # the hash-join family, never a nested loop
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_shoelace_zero_shuffles(spark, sf_dir):
    """The HOF fold is a pure projection: no Exchange, no Python eval,
    no Generate (an explode-based rewrite would inflate the row count
    n_vertices-fold before aggregating it back)."""
    plan = _plan(spark, sf_dir, "geo_polygon_shoelace_stats")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Generate" not in plan


def test_str_pack_no_single_partition_data_window(spark, sf_dir):
    """The global x-rank must come from band-partitioned windows +
    broadcast offsets. A SinglePartition exchange is allowed only for
    the 8-row band-offset table — the DATA path must shuffle by hash
    partitioning, never collapse to one partition. We pin this by
    counting: exactly one SinglePartition exchange (the band table)
    and at least two hash exchanges (band window, slice window)."""
    plan = _plan(spark, sf_dir, "geo_str_rtree_pack")
    assert _single_part_shuffles(plan) <= 1
    assert _hash_shuffles(plan) >= 2
    assert "CartesianProduct" not in plan


def test_str_query_broadcasts_index_nodes(spark, sf_dir):
    """Query boxes probe the leaf MBRs via broadcast (index nodes are
    tiny); the candidate fetch is an equi-join on the page key."""
    plan = _plan(spark, sf_dir, "geo_str_rtree_query")
    assert "BroadcastNestedLoopJoin" in plan  # bbox probe, no equi key
    assert "CartesianProduct" not in plan


def test_epoch_shuffle_bounded_partitions(spark, sf_dir):
    """One hash shuffle on (epoch, shard); the epoch fan-out must be a
    broadcast (tiny range table), not an exchange of the corpus."""
    plan = _plan(spark, sf_dir, "text_epoch_shuffle")
    assert "CartesianProduct" not in plan
    assert _hash_shuffles(plan) == 1


def test_drift_tvd_single_corpus_pass(spark, sf_dir):
    """The corpus is scanned once into the (source, lang) count; the
    grid join runs on schema-sized tables via broadcast."""
    plan = _plan(spark, sf_dir, "text_source_drift_tvd")
    # one corpus pass per aggregate branch: every scan must read ONLY
    # the two grouping columns (never text), and the grid join is
    # broadcast
    import re as _re
    schemas = _re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(
        set(s0.split(",")) <= {"source:string", "lang:string"}
        for s0 in schemas
    ), schemas
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_matryoshka_prefix_is_heap_topk(spark, sf_dir):
    """Both funnel tiers keep bounded heaps (TakeOrderedAndProject);
    the rerank joins a broadcast shortlist — the corpus never
    shuffles."""
    plan = _plan(spark, sf_dir, "vdb_matryoshka_prefix_search")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_sink_roundtrip_readback_prunes_columns(spark, sf_dir):
    """The read-back aggregate reads exactly the 3 needed columns
    (lang arrives from partition directories, not file bytes)."""
    plan = _plan(spark, sf_dir, "src_corpus_sink_roundtrip")
    assert "CartesianProduct" not in plan
    assert "ReadSchema: struct<doc_id:bigint,n_chars:bigint>" in plan


def test_jsonl_gzip_readback_no_inference_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "src_jsonl_gzip_roundtrip")
    assert "Scan json" in plan
    assert "CartesianProduct" not in plan


def test_lsh_incremental_readback_groups_once(spark, sf_dir):
    """The maintained index read-back is a parquet scan + one grouped
    aggregate on the bucket key."""
    plan = _plan(spark, sf_dir, "ann_lsh_index_incremental")
    assert _hash_shuffles(plan) == 1
    assert "CartesianProduct" not in plan


def test_closest_pair_single_shuffle_heap_reduce(spark, sf_dir):
    """3x3 neighbor explode -> ONE cell-key equi-join -> 1-row heap;
    never a nested loop over points."""
    plan = _plan(spark, sf_dir, "geo_closest_pair_blocked")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_avi_audio_demux_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "mm_demux_avi_audio")
    assert _payload_free_fanout_only(plan)
    assert plan.count("MapInPandas") >= 1


def test_str_levels_no_window(spark, sf_dir):
    """The level-1 rollup is pure grouped aggregation over the leaf
    table — no Window exec (consecution comes from arithmetic on
    leaf_idx, not a rank)."""
    plan = _plan(spark, sf_dir, "geo_str_rtree_levels")
    assert "CartesianProduct" not in plan
    # the only Window execs are the ones the leaf build already has:
    # the rollup itself must add NONE
    leaf_plan = _plan(spark, sf_dir, "geo_str_rtree_pack")
    assert plan.count("Window") == leaf_plan.count("Window")


def test_tiff_palette_tiled_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "mm_decode_tiff_palette_tiled")
    assert _payload_free_fanout_only(plan)
    assert plan.count("MapInPandas") >= 1


def test_jpeg_progressive_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "mm_decode_jpeg_progressive_stats")
    assert _payload_free_fanout_only(plan)
    assert plan.count("MapInPandas") >= 1


def test_augment_pipeline_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "mm_image_augment_pipeline")
    assert _payload_free_fanout_only(plan)
    assert plan.count("MapInPandas") >= 1
