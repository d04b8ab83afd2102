"""Round-11 plan pins — each new query's scale-critical physical
property asserted against `.explain("formatted")`, so a regression in
Catalyst usage (a lost broadcast, a heap-less window sort, a stray
Python eval) fails in CI rather than at 100 TB.
"""

from __future__ import annotations

from quick_and_easy_vectordb_spark.plans.inspect import formatted_plan
from quick_and_easy_vectordb_spark.queries import QUERIES


def _plan(spark, sf_dir, name):
    return formatted_plan(QUERIES[name].fn(spark, sf_dir))


def test_incremental_topk_uses_window_group_limit(spark, sf_dir):
    """The monoid-merge story only beats a full recompute if every
    window pass keeps a bounded per-group heap (WindowGroupLimit,
    pushed from the rnk <= 3 filter) instead of fully sorting each
    partition."""
    plan = _plan(spark, sf_dir, "rel_incremental_topk_merge")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_gi_star_joins_are_broadcast(spark, sf_dir):
    """The 9-offset replication and the 1-row moment table must reach
    the cell table as broadcasts — a shuffled join of O(cells) rows
    would add exchanges that dominate at high grid resolutions."""
    plan = _plan(spark, sf_dir, "geo_gi_star_hotspots")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_query_dedup_search_never_shuffles_corpus(spark, sf_dir):
    """The deduped query batch must be broadcast into a nested-loop
    score (the corpus — the 100 TB side — is scanned, never
    exchanged) and the per-rep top-k must keep a bounded heap."""
    plan = _plan(spark, sf_dir, "vdb_query_dedup_search")
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_url_canonicalization_is_pure_catalyst(spark, sf_dir):
    """The whole canonicalization chain (split_part/regexp/filter/
    array_sort) must stay JVM-side: any BatchEvalPython/ArrowEvalPython
    node means a string op silently fell back to a Python UDF."""
    plan = _plan(spark, sf_dir, "text_url_canonical_dedup")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_pdf_extract_is_one_arrow_pass(spark, sf_dir):
    """Extraction is exactly ONE MapInPandas branch (n_pages rides the
    extraction row through the inlined chunk explode) — a second
    branch would re-run the Python parse for a join side. The
    formatted plan prints each node twice (tree + details)."""
    plan = _plan(spark, sf_dir, "mm_pdf_extract_chunks")
    assert plan.count("MapInPandas") == 2, plan.count("MapInPandas")
    assert "Join" not in plan
    # the only allowed Exchange is the round-robin id/text fan-out
    # (ensure_parallelism — no-op at scale, full-CPU parse on a
    # single-split table); hash/range would mean a data-sized key
    import re as _re
    kinds = _re.findall(r"Arguments: (\w+)Partitioning", plan)
    assert all(k == "RoundRobin" for k in kinds), kinds
    assert "SinglePartition" not in plan
