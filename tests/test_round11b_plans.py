"""Round-11 second-session plan pins + semantic unit tests for the
five new queries (geo_segment_intersections, geo_distance_anti_join,
udf_grouped_ewma, vdb_hard_negative_mining, text_html_strip_stats).

Plan pins assert each query's scale-critical physical property; the
semantic tests pin the two correctness tricks the oracle hash alone
wouldn't localize on failure: reference-point exactly-once pair
generation, and the EWMA recursion == closed-form dyadic identity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.plans.inspect import (
    formatted_plan,
    shuffle_count,
)
from quick_and_easy_vectordb_spark.queries import QUERIES
from quick_and_easy_vectordb_spark.sources.catalog import load_table


def _plan(spark, sf_dir, name):
    return formatted_plan(QUERIES[name].fn(spark, sf_dir))


def test_segment_intersections_is_equi_join_no_dedup(spark, sf_dir):
    """Candidate generation must be a hash join on the cell key — not
    a nested loop over the range predicates — and the reference-point
    trick must remove the need for any distinct/dedup node."""
    plan = _plan(spark, sf_dir, "geo_segment_intersections")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Deduplicate" not in plan


def test_segment_intersections_exactly_once(spark, sf_dir):
    """The reference-point dedup must yield each bbox-overlapping pair
    EXACTLY once: n_candidates equals the blocking-free count computed
    by an independent python recount over the same synthesis."""
    row = QUERIES["geo_segment_intersections"].fn(spark, sf_dir).collect()[0]
    keys = [
        r[0]
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey").collect()
    ]
    segs = []
    for k in keys:
        x = (k * k * 7 + k * 104729) % 36000
        y = 700 + (k * k * 13 + k * 7919) % 16000
        bx = x + 100 + (k * 13) % 1200
        by = y + (k * 31) % 1300 - 650
        segs.append((x, min(y, by), bx, max(y, by)))
    segs.sort()
    n = 0
    for i in range(len(segs)):
        ax0, ay0, ax1, ay1 = segs[i]
        for j in range(i + 1, len(segs)):
            bx0, by0, bx1, by1 = segs[j]
            if bx0 > ax1:
                break  # sorted by x0: no later bbox overlaps in x
            if ay0 <= by1 and by0 <= ay1:
                n += 1
    assert row["n_candidates"] == n
    assert 0 < row["n_intersections"] <= row["n_candidates"]


def test_distance_anti_join_is_broadcast_left_anti(spark, sf_dir):
    """The coverage-gap query must plan as ONE broadcast LeftAnti hash
    join — the point side never shuffled, no distinct anywhere."""
    plan = _plan(spark, sf_dir, "geo_distance_anti_join")
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_grouped_ewma_recursion_matches_closed_form():
    """a=0.5 + integer inputs ⇒ the recursion is exact in double and
    equals 0.5^j * sum(v_m): checked bitwise on a hand series that
    crosses the 24-row block reset twice."""
    xs = [96, 3, 50, 7] * 13  # 52 rows
    s = 0.0
    for i, x in enumerate(xs):
        j = i % 24
        s = float(x) if j == 0 else 0.5 * x + 0.5 * s
        block_xs = xs[i - j : i + 1]
        acc = block_xs[0]
        for m in range(1, j + 1):
            acc += block_xs[m] * (1 << (m - 1))
        assert s == 0.5**j * acc  # bitwise equality, not approx


def test_grouped_ewma_plan_is_one_group_pass(spark, sf_dir):
    df = QUERIES["udf_grouped_ewma"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "FlatMapGroupsInPandas" in plan
    assert shuffle_count(df) == 1  # one group-key shuffle, nothing else


def test_hard_negative_mining_broadcasts_anchors(spark, sf_dir):
    """The corpus (the 100 TB side) must be scanned once with the
    anchor set broadcast — and the per-anchor top-k must keep a
    bounded heap, not sort whole partitions."""
    plan = _plan(spark, sf_dir, "vdb_hard_negative_mining")
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_exclude_anchor_label(spark, sf_dir):
    df = QUERIES["vdb_hard_negative_mining"].fn(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    joined = df.join(emb, "query_id")
    assert joined.filter(F.col("neg_label") == F.col("q_label")).count() == 0
    per = joined.groupBy("query_id").count().collect()
    assert per and all(r["count"] == 3 for r in per)


def test_html_strip_is_pure_catalyst_single_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_html_strip_stats")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 2  # one shuffle (tree + details)


def test_html_strip_recovers_content_length(spark, sf_dir):
    """The strip must be lossless on the wrapped fixture: the template
    reduces to 'source text…' with single spaces, so content_chars ==
    Σ (len(source) + 1 + len(squeeze(text))) per source."""
    df = QUERIES["text_html_strip_stats"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    expect = (
        docs.select(
            "source",
            (
                F.length("source")
                + 1
                + F.length(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
            ).alias("clen"),
        )
        .groupBy("source")
        .agg(F.sum("clen").alias("expect"))
    )
    bad = df.join(expect, "source").filter(
        F.col("content_chars") != F.col("expect")
    )
    assert bad.count() == 0


def test_rabitq_estimate_is_topk_no_shuffle(spark, sf_dir):
    """The estimator must be a single codegen projection over the scan
    with a bounded top-k — no shuffle, no join anywhere."""
    plan = _plan(spark, sf_dir, "ann_rabitq_estimate")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_rabitq_estimator_shortlist_recall(spark, sf_dir):
    """The estimator's job is CANDIDATE SHORTLISTING (estimate top-C,
    exact-rerank top-k): the exact top-10 must land inside the
    estimated top-50 with recall >= 0.6 (measured 0.8-0.9 on the
    fixtures) — a regression to noise (e.g. a dropped correction
    factor) collapses this containment."""
    from quick_and_easy_vectordb_spark.functions.vector import (
        dot_product, vector_literal,
    )
    from quick_and_easy_vectordb_spark.queries.common import QUERY_VEC

    emb = load_table(spark, sf_dir, "embeddings")
    q = vector_literal(QUERY_VEC)
    sg = F.transform(
        "embedding",
        lambda v: F.when(v >= 0, F.lit(1.0)).otherwise(F.lit(-1.0)),
    )
    est = (
        dot_product("embedding", "embedding")
        * dot_product(sg, q)
        / dot_product(sg, "embedding")
    )
    est_top = {
        r["vec_id"]
        for r in emb.select("vec_id", est.alias("e"))
        .orderBy(F.desc("e"), F.asc("vec_id"))
        .limit(50)
        .collect()
    }
    exact_top = {
        r["vec_id"]
        for r in emb.select(
            "vec_id", dot_product("embedding", q).alias("d")
        )
        .orderBy(F.desc("d"), F.asc("vec_id"))
        .limit(10)
        .collect()
    }
    assert len(est_top & exact_top) >= 6


def test_kcenter_coreset_matches_pure_python_greedy(spark, sf_dir):
    """Independent recount of the greedy trajectory: pure-python
    sequential-fold distances (the exact IEEE op sequence the Catalyst
    aggregate performs) must pick the same three centers, and the
    reported coverage radius must equal the recomputed k-center
    objective."""
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

    def sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    def norm2(a):
        acc = 0.0
        for x in a:
            acc += x * x
        return acc

    c1 = min(vecs, key=lambda i: (-norm2(vecs[i]), i))
    d = {i: sq(v, vecs[c1]) for i, v in vecs.items()}
    c2 = min(vecs, key=lambda i: (-d[i], i))
    d = {i: min(d[i], sq(v, vecs[c2])) for i, v in vecs.items()}
    c3 = min(vecs, key=lambda i: (-d[i], i))
    d = {i: min(d[i], sq(v, vecs[c3])) for i, v in vecs.items()}

    got = {
        r["center_rank"]: r
        for r in QUERIES["vdb_kcenter_coreset"].fn(spark, sf_dir).collect()
    }
    assert [got[k]["center_id"] for k in (1, 2, 3)] == [c1, c2, c3]
    assert max(r["coverage_radius_sq"] for r in got.values()) == max(
        d.values()
    )
    assert sum(r["n_assigned"] for r in got.values()) == len(vecs)


def test_kcenter_coreset_broadcasts_centers_not_data(spark, sf_dir):
    """Each greedy round must ride a broadcast of the 1-row center
    frame — never a shuffled or nested-loop join of the corpus."""
    plan = _plan(spark, sf_dir, "vdb_kcenter_coreset")
    assert plan.count("BroadcastNestedLoopJoin") >= 3  # 1-row crossJoins
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kcenter_emits_all_ranks_on_degenerate_corpus(spark, sf_dir, tmp_path):
    """On an all-duplicate corpus every greedy argmax collapses onto
    the same vector and every point ties to rank 1 — the output must
    still emit ALL THREE ranks (zero-assigned ranks included), exactly
    like the oracle's ctr LEFT JOIN."""
    import os

    rows = [(i, [1.0] * 8, 0) for i in range(6)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "degenerate")
    df.write.parquet(os.path.join(d, "embeddings.parquet"))
    out = {
        r["center_rank"]: r
        for r in QUERIES["vdb_kcenter_coreset"].fn(spark, d).collect()
    }
    assert sorted(out) == [1, 2, 3]
    assert out[1]["n_assigned"] == 6
    assert out[2]["n_assigned"] == 0 and out[3]["n_assigned"] == 0
    assert out[2]["coverage_radius_sq"] is None
