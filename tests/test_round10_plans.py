"""Round-10 pins.

Headline fix this round (VERDICT r09 advisory 1): dedup_band_tuning's
pair expansion was uncapped — the one place the enforced hot-bucket cap
of the production LSH path (operators/dedup.py:141) did not reach, and
exactly the query most likely to meet a boilerplate mega-bucket (the
most permissive config collides the hardest). The tuner now applies the
same COUNT-window cap before any member list materializes; diverted
buckets contribute k·(k−1)/2 candidates ANALYTICALLY (O(buckets) rows,
no O(k²) expansion). These tests prove the divert fires on a synthetic
mega-bucket and that the no-mega-bucket result is unchanged (the oracle
row in CORRECTNESS/tools/check.py covers bit-identity on real data).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.plans.inspect import formatted_plan
from quick_and_easy_vectordb_spark.queries import QUERIES
from quick_and_easy_vectordb_spark.queries.dedup import (
    _TUNE_BUCKET_CAP,
    _TUNE_CONFIGS,
)

BOILERPLATE = (
    "terms of service apply to every page on this website copyright "
    "twenty twenty five all rights reserved contact the webmaster"
)
UNIQUE_PAIR = (
    "an entirely different document about penguin colonies in the "
    "southern hemisphere and their krill foraging patterns"
)


def _write_mega_corpus(spark, tmp_path, n_mega: int) -> str:
    """documents.parquet with one n_mega-way boilerplate mega-cluster
    (identical text → one LSH bucket of size n_mega in EVERY band of
    EVERY config) plus one exact near-dup pair that lands in small
    buckets, so both the diverted and the exact path are exercised."""
    rows = [(i, BOILERPLATE) for i in range(n_mega)]
    rows += [(n_mega, UNIQUE_PAIR), (n_mega + 1, UNIQUE_PAIR)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(out, "documents.parquet"))
    return out


def test_band_tuning_mega_bucket_diverts_analytically(spark, tmp_path):
    """A bucket of 200 > cap(64) must NEVER pair-expand: each config's
    candidate count becomes b · k(k−1)/2 (one diverted bucket per band,
    counted analytically, cross-band dedup impossible by design) plus
    the one exact pair from the small buckets. An uncapped expansion
    would instead dedupe the mega pairs across bands and report
    k(k−1)/2 + 1 for every config — so the arithmetic itself proves
    which path ran."""
    n_mega = 200
    assert n_mega > _TUNE_BUCKET_CAP
    sf = _write_mega_corpus(spark, tmp_path, n_mega)
    rows = {
        (r.n_bands, r.rows_per_band): r
        for r in QUERIES["dedup_band_tuning"].fn(spark, sf).collect()
    }
    mega_pairs = n_mega * (n_mega - 1) // 2
    assert set(rows) == set(_TUNE_CONFIGS)
    for (b, rpb), r in rows.items():
        assert r.n_candidates == b * mega_pairs + 1, (b, rpb, r)
        assert r.n_verified == 1, r  # only the exact pair is verified
        assert abs(r.precision - 1.0 / (b * mega_pairs + 1)) < 1e-12


def test_band_tuning_all_diverted_corpus_still_reports(spark, tmp_path):
    """Config-driven final table: when EVERY candidate is diverted
    (pure-boilerplate corpus, no small bucket anywhere) each config
    must still report its analytic count with n_verified = 0 — the
    old exact-rows-driven groupBy would have returned 0 rows."""
    n_mega = 100
    rows_list = [(i, BOILERPLATE) for i in range(n_mega)]
    df = spark.createDataFrame(rows_list, "doc_id long, text string")
    df.coalesce(1).write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    rows = {
        r.n_bands: r
        for r in QUERIES["dedup_band_tuning"].fn(spark, str(tmp_path)).collect()
    }
    mega_pairs = n_mega * (n_mega - 1) // 2
    assert set(rows) == {b for b, _ in _TUNE_CONFIGS}
    for b, r in rows.items():
        assert r.n_candidates == b * mega_pairs
        assert r.n_verified == 0
        assert r.precision == 0.0


def test_aqe_skew_join_splits_hot_partition(spark):
    """The one Catalyst scale feature not previously plan-pinned
    (VERDICT r09 item 8): with AQE skew-join on (session.py sets
    spark.sql.adaptive.skewJoin.enabled=true), a sort-merge join whose
    shuffle has a pathologically hot key must get its hot partition
    SPLIT by OptimizeSkewedJoin — the runtime complement to the
    explicit salting of operators/skew.py:salted_join (which callers
    use when they must bound the skew BEFORE the shuffle, e.g. when
    the join is followed by a same-key aggregation AQE can't see).
    The pin asserts the executed adaptive plan actually marked the
    join skew=true and produced a skew-split shuffle read."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        # force SMJ and shrink the skew thresholds to test scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
        # hot key 0 carries 300k of 330k fact rows. The payload must be
        # (a) per-row derived — a constant would fold out of the
        # pre-shuffle projection — and (b) consumed by the aggregate —
        # or column pruning strips it; and it must be incompressible
        # (md5), because skew detection reads COMPRESSED map-output
        # sizes and 300k identical longs lz4 below any threshold.
        fact = spark.range(330_000).select(
            F.when(F.col("id") < 300_000, F.lit(0))
            .otherwise(F.pmod(F.col("id"), F.lit(100)))
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(100).select(F.col("id").alias("k"))
        agg = fact.join(dim, "k").groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.length("payload")).alias("maxlen"),
        )
        [row] = agg.collect()
        assert (row["n"], row["maxlen"]) == (330_000, 32)
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan, plan[:4000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_band_tuning_plan_shape(spark, sf_dir):
    """The cap must not add shuffles: bucket sizing is a COUNT window
    over the same (cfg, band, key) partitioning the bucket aggregation
    needs anyway, and the 4-row config dim joins by broadcast."""
    plan = formatted_plan(QUERIES["dedup_band_tuning"].fn(spark, sf_dir))
    assert "windowspecdefinition(cfg" in plan
    assert "CartesianProduct" not in plan
    # the config dim and the diverted counts reach the exact table as
    # broadcasts, never a shuffled join of the small sides
    assert "BroadcastHashJoin" in plan
