"""Measured scaling probe: run key operator shapes at 1x, 10x and 30x
synthetic data and report the wall-clock ratios.

Run: python tools/scale_probe.py   (writes SCALING.md)

A linear operator on a machine with idle cores should scale at <= Nx
wall-clock for Nx data (less when the small run underutilizes cores).
Superlinear growth exposes a shape problem (quadratic join, driver
bottleneck, spill); the 30x point exists to catch spill thresholds and
quadratic tails that a 10x probe is too small to show. Data is
generated deterministically with spark.range + hash math — no external
inputs, so the probe runs anywhere. This complements bench.py (fixed
driver datasets): bench measures absolute speed, this measures the
GROWTH EXPONENT of each operator family, which is what survives
extrapolation to 100 TB.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from quick_and_easy_vectordb_spark.functions.numeric import dsum  # noqa: E402
from quick_and_easy_vectordb_spark.operators.asof import asof_join  # noqa: E402
from quick_and_easy_vectordb_spark.operators.dedup import (  # noqa: E402
    minhash_signatures,
    shingle_table,
)
from quick_and_easy_vectordb_spark.operators.search import lsh_batch_knn  # noqa: E402
from quick_and_easy_vectordb_spark.operators.util import (  # noqa: E402
    scaled_shuffle_partitions,
)
from quick_and_easy_vectordb_spark.session import get_spark  # noqa: E402

BASE_ROWS = 2_000_000
BASE_DOCS = 20_000
SCALES = (10, 30)


def synth_fact(spark: SparkSession, n: int) -> DataFrame:
    """lineitem-ish fact: deterministic hash-derived columns."""
    return spark.range(n).select(
        F.col("id"),
        F.pmod(F.hash("id"), F.lit(100_000)).alias("key"),
        (F.pmod(F.hash("id", F.lit(1)), F.lit(10_000)) / 100.0).alias("price"),
        (F.pmod(F.hash("id", F.lit(2)), F.lit(100)) / 100.0).alias("disc"),
        F.pmod(F.hash("id", F.lit(3)), F.lit(4)).alias("flag"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.pmod(F.hash("id", F.lit(4)), F.lit(10**12))
        ).alias("ts"),
    )


def synth_docs(spark: SparkSession, n: int) -> DataFrame:
    """documents-ish corpus: ~40 hash-derived words per doc."""
    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.hash("id", F.lit(i)), F.lit(5000)).cast("string")
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(i) for i in range(40)]).alias("text"),
    )


def timed(fn, repeats: int = 2) -> float:
    """Min over ``repeats`` runs. The FIRST run at a new data size pays
    one-time JVM costs unrelated to the operator shape (heap-region
    commit, shuffle-file allocation, GC resize): measured 35.4s vs
    12.7s for the identical as-of plan and config, back to back. The
    min is the steady-state number — the one whose growth exponent
    extrapolates."""
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def noop(df: DataFrame) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark("qev-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    probes = {
        "scan_filter_decimal_agg (Q1 shape)": lambda n: noop(
            synth_fact(spark, n)
            .filter(F.col("disc") < 0.9)
            .groupBy("flag")
            .agg(dsum(F.col("price") * (1 - F.col("disc"))).alias("rev"),
                 F.count(F.lit(1)).alias("cnt"))
        ),
        "window_asof_join": lambda n: noop(
            asof_join(
                synth_fact(spark, n).select("key", "ts", "id"),
                synth_fact(spark, n // 4).select("key", "ts"),
                on="key",
            )
        ),
        "salted_heavy_hitters": lambda n: noop(
            synth_fact(spark, n)
            .withColumn("salt", F.pmod(F.hash("id"), F.lit(16)))
            .groupBy("key", "salt")
            .agg(F.count(F.lit(1)).alias("pn"))
            .groupBy("key")
            .agg(F.sum("pn").alias("n"))
            .orderBy(F.desc("n"), F.asc("key"))
            .limit(20)
        ),
        "minhash_signatures": lambda n: noop(
            minhash_signatures(
                shingle_table(synth_docs(spark, n // 100), "text", "doc_id"), 12
            )
        ),
        "topk_scan (search shape)": lambda n: noop(
            synth_fact(spark, n)
            .orderBy(F.desc("price"), F.asc("id"))
            .limit(5)
        ),
        # rel_q21's decorrelated shape: one per-order aggregate over the
        # fact + a join-back of the filtered fact — two fact shuffles,
        # the plan the EXISTS/NOT-EXISTS pair compiles to. Mirrors the
        # round-6 fix in rel_q21_sole_problem_supplier: the per-key
        # distinct-agg partitioning is sized from plan stats, so the
        # probe measures the guarded plan (r5 measured the unguarded
        # one and hit the spill cliff: 3x data → 7.1x wall at 30x).
        "q21_decorrelated (per-key agg + join-back)": lambda n: noop(
            (lambda li: (
                li.groupBy("key")
                .agg(
                    F.countDistinct("supp").alias("n_supp"),
                    F.countDistinct(
                        F.when(F.col("flag") == 1, F.col("supp"))
                    ).alias("n_late_supp"),
                )
                .join(li.filter(F.col("flag") == 1), "key")
            ))(
                (lambda base: (
                    (lambda np_: base.repartition(np_, "key") if np_ else base)(
                        scaled_shuffle_partitions(base, target_bytes=8 << 20)
                    )
                ))(
                    synth_fact(spark, n).withColumn(
                        "supp", F.pmod(F.hash("id", F.lit(9)), F.lit(1000))
                    )
                )
            )
        ),
        # lsh_batch_knn's shape: bucket both sides, explode query
        # probes, shuffle equi-join on the bucket string, score. Plane
        # count is sized to the corpus (bucket occupancy ~1k rows, as
        # the operator docstring requires) and the query set is
        # FIXED-size, as in production — with too few buckets the
        # equi-join degenerates toward a cross product: probing that
        # misconfiguration at 30x is how this probe caught the
        # candidate-shuffle width bug fixed in lsh_batch_knn.
        "lsh_bucket_equijoin (batch kNN shape)": lambda n: noop(
            (lambda corpus, qs: lsh_batch_knn(
                qs, corpus, k=3,
                num_planes=max(12, (n // 1000).bit_length()), dim=16,
                query_id="qid", query_vec="qv",
                corpus_id="id", corpus_vec="vec",
            ))(
                synth_fact(spark, n).select(
                    "id",
                    F.array(*[
                        (F.pmod(F.hash("id", F.lit(i)), F.lit(2001)) - 1000) / 1000.0
                        for i in range(16)
                    ]).alias("vec"),
                ),
                synth_fact(spark, 2000).select(
                    F.col("id").alias("qid"),
                    F.array(*[
                        (F.pmod(F.hash("id", F.lit(i + 50)), F.lit(2001)) - 1000) / 1000.0
                        for i in range(16)
                    ]).alias("qv"),
                ),
            )
        ),
    }

    # Round-4 additions: the new operator families' shapes.
    from quick_and_easy_vectordb_spark.functions.text import word_shingles
    from quick_and_easy_vectordb_spark.operators.ann import pq_codebook, pq_encode

    def synth_vecs(n: int, dim: int = 16) -> DataFrame:
        return synth_fact(spark, n).select(
            F.col("id").alias("vec_id"),
            F.array(*[
                (F.pmod(F.hash("id", F.lit(i)), F.lit(2001)) - 1000) / 1000.0
                for i in range(dim)
            ]).alias("embedding"),
        )

    probes["span_dedup (8-gram groupBy)"] = lambda n: noop(
        synth_docs(spark, n // 100)
        .select("doc_id", F.explode(word_shingles("text", 8)).alias("span"))
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") >= 2)
    )
    probes["count_min_build (4x64 cells)"] = lambda n: noop(
        synth_fact(spark, n)
        .select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(j).alias("j"),
                        (F.pmod(F.hash("key", F.lit(j)), F.lit(64))).alias("b"),
                    )
                    for j in range(4)
                ])
            ).alias("c")
        )
        .groupBy("c.j", "c.b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes["pq_encode (codebook bcast + argmin)"] = lambda n: (
        lambda vecs: noop(
            pq_encode(vecs, pq_codebook(vecs, "embedding", 4, 4), "embedding", "vec_id", 4, 4)
        )
    )(synth_vecs(n // 4))

    # Round-5: pathological LSH hot bucket. 10% of docs are VERBATIM
    # copies of one boilerplate text, so one bucket per band holds
    # n//1000 members (60,000 at 30x — uncapped pair expansion would
    # emit 1.8e9 rows from that bucket alone and stall the stage).
    # With the enforced cap the hot buckets divert to the O(members)
    # mega-cluster aggregate and wall-clock must stay ~linear.
    from quick_and_easy_vectordb_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_mega_clusters,
    )

    def synth_docs_hot(n_docs: int) -> DataFrame:
        word = lambda i: F.concat(  # noqa: E731
            F.lit("w"), F.pmod(F.hash("id", F.lit(i)), F.lit(5000)).cast("string")
        )
        return spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % 10 == 0,
                F.lit("shared boilerplate header every crawl page repeats verbatim"),
            )
            .otherwise(F.concat_ws(" ", *[word(i) for i in range(40)]))
            .alias("text"),
        )

    def lsh_capped_probe(n: int) -> None:
        sh = shingle_table(synth_docs_hot(n // 100), "text", "doc_id")
        sigs = minhash_signatures(sh, 12).persist()
        noop(lsh_candidate_pairs(sigs, 12, 4, 64))
        noop(lsh_mega_clusters(sigs, 12, 4, 64))
        sigs.unpersist()

    probes["lsh_pairs (10% hot bucket, capped)"] = lsh_capped_probe

    # Round-5: streaming sessionize state growth (VERDICT r4 item 8).
    # 100 users x one NEW session per event (31-min spacing > the
    # 30-min gap), so the state store carries n//10 session entries —
    # the many-sessions-per-user shape that stresses per-key session
    # state. Linear growth here means the session_window state store
    # scales with session count, matching the batch story.
    import shutil
    import tempfile

    from quick_and_easy_vectordb_spark.streaming.windows import (
        read_events_stream,
        stream_user_sessions,
    )

    def stream_sessionize_probe(n: int) -> None:
        n_events = n // 10
        base = tempfile.mkdtemp(prefix="qev_sess_probe_")
        src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
        try:
            ev = spark.range(n_events).select(
                F.col("id").alias("event_id"),
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000)
                    + (F.col("id") / 100).cast("long") * F.lit(31 * 60 * 1_000_000)
                    + F.pmod(F.hash("id"), F.lit(60_000_000))
                ).alias("ts"),
                F.pmod(F.col("id"), F.lit(100)).alias("user_id"),
                F.lit("click").alias("event_type"),
                F.lit(1.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            ev.repartitionByRange(8, "ts").write.mode("overwrite").parquet(src)
            q = (
                stream_user_sessions(read_events_stream(spark, src, 8))
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            shutil.rmtree(base, ignore_errors=True)

    probes["stream_sessionize (1 session/event state)"] = stream_sessionize_probe

    # Round-6 continuation shapes: bitmap distinct rollup and the
    # hour-decomposed interval sweep (ev_bitmap_daily_actives /
    # ev_max_concurrent_sessions). Both must stay ~linear: the bitmap
    # shuffle is bounded by users/32 words per day regardless of event
    # volume; the sweep's sorts are per-hour partitions, never global.

    def bitmap_distinct_probe(n: int) -> None:
        ev = synth_fact(spark, n)
        words = ev.select(
            F.floor(F.unix_micros("ts") / 86_400_000_000).cast("long").alias("day"),
            F.floor(F.col("key") / 32).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(key % 32 AS INT))").alias(
                "mask"
            ),
        )
        bm = words.groupBy("day", "word").agg(F.bit_or("mask").alias("bm"))
        noop(
            bm.groupBy("day").agg(F.sum(F.bit_count("bm")).cast("long").alias("n"))
        )

    probes["bitmap_distinct (word bit_or + popcount)"] = bitmap_distinct_probe

    def concurrency_sweep_probe(n: int) -> None:
        from quick_and_easy_vectordb_spark.operators.intervals import (
            peak_concurrency_daily,
            sessionize_intervals,
        )

        ev = synth_fact(spark, n).select(
            F.col("key").alias("user_id"),
            F.col("id").alias("event_id"),
            F.unix_micros("ts").alias("us"),
        )
        noop(peak_concurrency_daily(sessionize_intervals(ev)))

    probes["concurrency_sweep (hour-partitioned prefix)"] = concurrency_sweep_probe

    # Round-5 continuation shapes: the session's new operator families.

    # SQ8: train per-dim [min,max] (posexplode + groupBy(pos)), broadcast
    # the 1-row stats, score the bin-midpoint reconstruction, top-5.
    # Train is the linear part (n·dim exploded rows into a 16-group agg);
    # scoring is an unshuffled scan. Superlinear here would mean the
    # stats broadcast or the codegen'd transform stopped scaling.
    _q16 = F.array(*[F.lit(((i * 7) % 13 - 6) / 10.0) for i in range(16)])

    def sq8_probe(n: int) -> None:
        vecs = synth_vecs(n // 4)
        el = vecs.select(F.posexplode("embedding").alias("pos", "v"))
        per_dim = el.groupBy("pos").agg(
            F.min("v").alias("mn"), F.max("v").alias("mx")
        )
        stats = per_dim.agg(
            F.sort_array(F.collect_list(F.struct("pos", "mn", "mx"))).alias("arr")
        ).select(
            F.transform("arr", lambda s: s.mn).alias("mns"),
            F.transform("arr", lambda s: s.mx - s.mn).alias("spans"),
        )
        dq = vecs.crossJoin(F.broadcast(stats)).select(
            "vec_id",
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    F.element_at("spans", i + 1) > 0,
                    F.element_at("mns", i + 1)
                    + (
                        F.least(
                            F.lit(255.0),
                            F.floor(
                                (x - F.element_at("mns", i + 1))
                                * F.lit(256.0)
                                / F.element_at("spans", i + 1)
                            ),
                        )
                        + F.lit(0.5)
                    )
                    * F.element_at("spans", i + 1)
                    / F.lit(256.0),
                ).otherwise(F.element_at("mns", i + 1)),
            ).alias("e8"),
        )
        score = F.aggregate(
            F.zip_with(F.col("e8"), _q16, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        noop(
            dq.select("vec_id", score.alias("s"))
            .orderBy(F.desc("s"), F.asc("vec_id"))
            .limit(5)
        )

    probes["sq8_train_score (stats bcast + scan)"] = sq8_probe

    # Blocked kNN-graph: fixed ~200-member blocks (block count grows
    # with data, block size does NOT), 1-in-20 source nodes, top-3 per
    # source via window. Work is n_vecs/20 · 200 cosine rows — linear
    # by construction; superlinear would mean the block equi-join or
    # the WindowGroupLimit heap regressed to something quadratic.
    def knn_graph_probe(n: int) -> None:
        n_vecs = n // 20
        n_blocks = max(10, n_vecs // 200)
        vecs = synth_vecs(n_vecs).withColumn(
            "label", F.pmod(F.hash("vec_id"), F.lit(n_blocks))
        )
        src = vecs.filter(F.col("vec_id") % 20 == 0).select(
            F.col("vec_id").alias("src_id"), "label",
            F.col("embedding").alias("e"),
        )
        pairs = src.join(
            vecs.select(F.col("vec_id").alias("nbr_id"), "label", "embedding"),
            on=["label"],
        ).filter(F.col("nbr_id") != F.col("src_id"))
        dot = F.aggregate(
            F.zip_with(F.col("e"), F.col("embedding"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("src_id").orderBy(F.desc("sim"), F.asc("nbr_id"))
        noop(
            pairs.select("src_id", "nbr_id", dot.alias("sim"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
        )

    probes["knn_graph (blocked self-join, top-3)"] = knn_graph_probe

    # Stream-stream interval join: purchases ⋈ same-user clicks within
    # 30 min, watermarked both sides. State per side is bounded by
    # users × window occupancy; linear wall growth means the state
    # store's probe/evict cycle scales with event volume.
    def stream_stream_probe(n: int) -> None:
        n_events = n // 10
        base = tempfile.mkdtemp(prefix="qev_ssj_probe_")
        src_dir, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
        try:
            ev = spark.range(n_events).select(
                F.col("id").alias("event_id"),
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000)
                    + (F.col("id") / 100).cast("long") * F.lit(60_000_000)
                    + F.pmod(F.hash("id"), F.lit(55_000_000))
                ).alias("ts"),
                F.pmod(F.col("id"), F.lit(100)).alias("user_id"),
                F.when(F.col("id") % 10 == 0, "purchase")
                .otherwise("click")
                .alias("event_type"),
            )
            ev.repartitionByRange(8, "ts").write.mode("overwrite").parquet(src_dir)
            stream = spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string"
            ).parquet(src_dir)
            purchases = (
                stream.filter(F.col("event_type") == "purchase")
                .select(
                    F.col("event_id").alias("purchase_id"),
                    F.col("user_id").alias("p_user_id"),
                    F.col("ts").alias("p_ts"),
                )
                .withWatermark("p_ts", "2 hours")
            )
            clicks = (
                stream.filter(F.col("event_type") == "click")
                .select(
                    F.col("user_id").alias("c_user_id"),
                    F.col("ts").alias("c_ts"),
                )
                .withWatermark("c_ts", "2 hours")
            )
            joined = purchases.join(
                clicks,
                F.expr(
                    "c_user_id = p_user_id "
                    "AND c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts < p_ts"
                ),
            )
            q = (
                joined.writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            shutil.rmtree(base, ignore_errors=True)

    probes["stream_stream_interval_join (2-side state)"] = stream_stream_probe

    # ---- round-7 shapes -------------------------------------------------
    from pyspark.sql import Window as _W

    def bpe_round_probe(n: int) -> None:
        """One BPE merge round (text_bpe_train_rounds shape): the
        corpus-scan word count is the data-dependent cost; the pair
        count + 1-row argmax + broadcast merge run over the distinct
        vocab (bounded at 5000 synth words — exactly the at-scale
        property the query's docstring claims)."""
        docs = synth_docs(spark, n // 100)
        words = (
            docs.select(F.explode(F.split("text", " ")).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
        vocab = words.select(
            "word", "freq", F.concat_ws(" ", F.split("word", "")).alias("seq")
        )
        syms = F.split("seq", " ")
        pairs = F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
        counts = (
            vocab.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            counts.orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .withColumn(
                "merged", F.replace(F.col("pair"), F.lit(" "), F.lit(""))
            )
        )
        padded = F.concat(F.lit(" "), F.col("seq"), F.lit(" "))
        pat = F.concat(F.lit(" "), F.col("pair"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
        merged = vocab.crossJoin(F.broadcast(best)).select(
            "freq",
            F.trim(F.replace(F.replace(padded, pat, rep), pat, rep)).alias("seq"),
        )
        noop(
            merged.agg(
                F.sum(F.col("freq") * F.size(F.split("seq", " "))).alias("toks")
            )
        )

    probes["bpe_merge_round (vocab-bounded)"] = bpe_round_probe

    def ntile_prefix_sum_probe(n: int) -> None:
        """Distributed NTILE (rel_ntile_deciles shape): bucket window
        + broadcast offset table instead of a single-partition sort."""
        b = synth_fact(spark, n).select(
            "id", "price", F.floor(F.col("price") / 5).alias("bkt")
        )
        wloc = _W.partitionBy("bkt").orderBy("price", "id")
        woff = _W.orderBy("bkt").rowsBetween(_W.unboundedPreceding, -1)
        wall = _W.orderBy("bkt").rowsBetween(
            _W.unboundedPreceding, _W.unboundedFollowing
        )
        offsets = (
            b.groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                "bkt",
                F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("off"),
                F.sum("cnt").over(wall).alias("n_total"),
            )
        )
        ranked = b.join(F.broadcast(offsets), "bkt").select(
            "price",
            (F.col("off") + F.row_number().over(wloc)).alias("r"),
            "n_total",
        )
        dec = ((F.col("r") - 1) * 10 / F.col("n_total")).cast("long")
        noop(
            ranked.select(dec.alias("d"), "price")
            .groupBy("d")
            .agg(F.count(F.lit(1)).alias("n"), F.max("price").alias("hi"))
        )

    probes["distributed_ntile (bucket prefix-sum)"] = ntile_prefix_sum_probe

    def label_prop_round_probe(n: int) -> None:
        """One synchronous LPA vote round (dedup_label_propagation
        shape) over a hash-derived edge list: groupBy (node, label) +
        per-node argmax window, both node-partitioned."""
        k = max(n // 10, 1000)
        edges = spark.range(n).select(
            F.pmod(F.hash("id"), F.lit(k)).alias("src"),
            F.pmod(F.hash("id", F.lit(7)), F.lit(k)).alias("dst"),
        )
        labels = edges.select(F.col("dst").alias("src"), F.col("dst").alias("lbl")).distinct()
        votes = (
            edges.join(labels, "src")
            .groupBy("dst", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        warg = _W.partitionBy("dst").orderBy(F.desc("c"), F.asc("lbl"))
        noop(
            votes.withColumn("rn", F.row_number().over(warg))
            .filter(F.col("rn") == 1)
            .groupBy("lbl")
            .agg(F.count(F.lit(1)).alias("sz"))
        )

    probes["label_propagation_round"] = label_prop_round_probe

    def incremental_band_probe(n: int) -> None:
        """Incremental dedup candidate generation
        (dedup_incremental_minhash shape): full band table, capped
        pair expansion, new-batch filter pushed onto the pair
        stream."""
        from quick_and_easy_vectordb_spark.operators.dedup import (
            lsh_candidate_pairs,
        )

        d = n // 100
        sig = minhash_signatures(
            shingle_table(synth_docs(spark, d), "text", "doc_id"), 12
        )
        cand = lsh_candidate_pairs(sig, 12, 4, 64)
        noop(
            cand.filter(F.col("id_b") >= int(d * 0.8))
            .groupBy("id_b")
            .agg(F.count(F.lit(1)).alias("k"))
        )

    probes["incremental_band_probe (new-vs-index)"] = incremental_band_probe

    def lzw_decode_probe(n: int) -> None:
        """GIF LZW decode (mm_decode_gif_stats shape): pure-Python
        dictionary codec inside Arrow batches — embarrassingly
        parallel, the probe pins that no hidden shuffle or driver
        funnel creeps in as image count grows."""
        import numpy as _np
        import pandas as _pd

        from quick_and_easy_vectordb_spark.operators.multimodal import (
            decode_image,
        )
        from quick_and_easy_vectordb_spark.queries.multimodal import gif_encode

        palette = [
            ((j * 17) % 256, (j * 29) % 256, (j * 47) % 256) for j in range(16)
        ]

        def run(batches):
            for pdf in batches:
                sums = []
                ids = []
                for i in pdf["id"]:
                    i = int(i)
                    w = h = 32
                    idx = ((i * 37 + _np.arange(w * h) * 17) % 16).astype(
                        _np.uint8
                    )
                    img = decode_image(gif_encode(idx.tobytes(), w, h, palette))
                    ids.append(i)
                    sums.append(int(img.sum()))
                yield _pd.DataFrame({"id": ids, "s": sums})

        noop(
            spark.range(n // 2000)
            .mapInPandas(run, "id long, s long")
            .agg(F.sum("s").alias("total"))
        )

    probes["gif_lzw_decode (arrow batches)"] = lzw_decode_probe

    # -- round-7 continuation: grid-blocked spatial pair join (the
    # DBSCAN / bbox-join candidate shape) at CONSTANT density (domain
    # area grows with the point count, as geography does), winnowing
    # fingerprint pairing (window-min + capped value equi-join), and
    # CDC last-writer-wins compaction (key-window argmax). --

    def grid_pair_join_probe(n: int) -> None:
        pts = n // 20
        side = max(4, int(pts**0.5 / 4))  # ~16 points per cell
        p = spark.range(pts).select(
            F.col("id"),
            F.pmod(F.hash("id"), F.lit(side * 900)).alias("x"),
            F.pmod(F.hash("id", F.lit(1)), F.lit(side * 900)).alias("y"),
        ).select(
            "id", "x", "y",
            (F.col("x") / 900).cast("long").alias("cx"),
            (F.col("y") / 900).cast("long").alias("cy"),
        )
        off = F.expr(
            "explode(transform(sequence(0, 8), "
            "i -> struct(i div 3 - 1 as dx, i % 3 - 1 as dy)))"
        )
        q9 = p.select(
            F.col("id").alias("qid"), F.col("x").alias("qx"),
            F.col("y").alias("qy"), "cx", "cy", off.alias("o"),
        ).select(
            "qid", "qx", "qy",
            (F.col("cx") + F.col("o.dx")).alias("cx"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
        )
        d2 = (F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx")) + (
            F.col("y") - F.col("qy")
        ) * (F.col("y") - F.col("qy"))
        noop(
            p.join(q9, ["cx", "cy"])
            .filter(d2 <= 810000)
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_nbr"))
        )

    probes["grid_pair_join (dbscan eps-neighborhood)"] = grid_pair_join_probe

    def winnowing_pairs_probe(n: int) -> None:
        from pyspark.sql import Window as _W

        docs = synth_docs(spark, n // 100)
        toks = F.split(F.col("text"), " ")
        grams = F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.array_join(F.slice(toks, i, 3), " "),
        )
        g = docs.select(
            "doc_id", F.posexplode(grams).alias("p0", "gram")
        ).select(
            "doc_id",
            (F.col("p0") + 1).alias("pos"),
            F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10)
            .cast("long")
            .alias("h"),
        )
        n_parts = scaled_shuffle_partitions(g, target_bytes=8 << 20)
        if n_parts:
            g = g.repartition(n_parts, "doc_id")
        wmin = _W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
        wcnt = _W.partitionBy("doc_id")
        fp = (
            g.select(
                "doc_id", "pos",
                F.min("h").over(wmin).alias("fh"),
                F.count(F.lit(1)).over(wcnt).alias("ng"),
            )
            .filter(F.col("pos") <= F.col("ng") - 4)
            .select("doc_id", "fh")
            .distinct()
            .persist()
        )
        keep = (
            fp.groupBy("fh")
            .agg(F.count(F.lit(1)).alias("nd"))
            .filter(F.col("nd") <= 50)
            .select("fh")
        )
        fk = fp.join(keep, "fh")
        a = fk.select(F.col("doc_id").alias("da"), "fh")
        b = fk.select(F.col("doc_id").alias("db"), "fh")
        try:
            noop(
                a.join(b, "fh")
                .filter(F.col("da") < F.col("db"))
                .groupBy("da", "db")
                .agg(F.count(F.lit(1)).alias("ns"))
                .filter(F.col("ns") >= 2)
            )
        finally:
            fp.unpersist()

    probes["winnowing_pairs (window-min + capped join)"] = winnowing_pairs_probe

    def cdc_compaction_probe(n: int) -> None:
        from pyspark.sql import Window as _W

        log = synth_fact(spark, n).select(
            F.pmod(F.col("id"), F.lit(n // 3)).alias("key"),
            F.col("id").alias("version"),
            F.when(F.pmod(F.col("id"), F.lit(7)) == 0, "D")
            .otherwise("U")
            .alias("op"),
            "price",
        )
        w = _W.partitionBy("key").orderBy(F.desc("version"))
        noop(
            log.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .groupBy("op")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    probes["cdc_compaction (key-window last-writer)"] = cdc_compaction_probe

    # Round-7 continuation-4 shapes.
    def pr_auc_rank_probe(n: int) -> None:
        """ev_pr_auc_exact's shape: per-row global rank via the
        two-level bucket prefix sum + within-score window, then the
        fixed-point precision sum. Corpus-sized window work — the
        scale-critical part of average precision."""
        from pyspark.sql import Window as _W

        r0 = synth_fact(spark, n).select(
            F.pmod(F.hash("id"), F.lit(50000)).alias("si"),
            F.col("id").alias("event_id"),
            F.when(F.pmod(F.col("id"), F.lit(7)) == 0, 1).otherwise(0).alias("p"),
        )
        g = (
            r0.groupBy("si")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("p").alias("pos"))
            .withColumn("nbkt", F.expr("(-si) div 2000"))
        )
        wloc = _W.partitionBy("nbkt").orderBy(F.expr("-si")).rowsBetween(
            _W.unboundedPreceding, -1
        )
        woff = _W.orderBy("nbkt").rowsBetween(_W.unboundedPreceding, -1)
        offsets = (
            g.groupBy("nbkt")
            .agg(F.sum("cnt").alias("bcnt"), F.sum("pos").alias("bpos"))
            .select(
                "nbkt",
                F.coalesce(F.sum("bcnt").over(woff), F.lit(0)).alias("bo_cnt"),
                F.coalesce(F.sum("bpos").over(woff), F.lit(0)).alias("bo_pos"),
            )
        )
        goff = g.join(F.broadcast(offsets), "nbkt").select(
            "si",
            (F.col("bo_cnt") + F.coalesce(F.sum("cnt").over(wloc), F.lit(0))).alias("off_cnt"),
            (F.col("bo_pos") + F.coalesce(F.sum("pos").over(wloc), F.lit(0))).alias("off_pos"),
        )
        wrow = _W.partitionBy("si").orderBy("event_id")
        wrun = wrow.rowsBetween(_W.unboundedPreceding, 0)
        ranked = r0.join(F.broadcast(goff), "si").select(
            "p",
            (F.col("off_cnt") + F.row_number().over(wrow)).alias("k"),
            (F.col("off_pos") + F.sum("p").over(wrun)).alias("cp"),
        )
        noop(
            ranked.agg(
                F.sum(
                    F.when(F.col("p") == 1, F.expr("(cp * 1000000000000L) div k"))
                    .otherwise(F.lit(0))
                ).alias("ap_fp")
            )
        )

    probes["pr_auc_row_rank (two-level per-row rank)"] = pr_auc_rank_probe

    def occlusion_prune_probe(n: int) -> None:
        """ann_vamana_occlusion_prune's shape: blocked top-8 candidate
        heap, then the per-node 8x8 occlusion self-join + anti join."""
        from pyspark.sql import Window as _W

        n_vec = n // 50
        vecs = synth_fact(spark, n_vec).select(
            F.col("id").alias("vec_id"),
            F.pmod(F.hash("id", F.lit(3)), F.lit(max(8, n_vec // 128))).alias("label"),
            F.array(*[
                (F.pmod(F.hash("id", F.lit(i)), F.lit(2001)) - 1000) / 1000.0
                for i in range(16)
            ]).alias("emb"),
        )
        src = vecs.filter(F.col("vec_id") % 7 == 0).select(
            F.col("vec_id").alias("src_id"), "label", F.col("emb").alias("es")
        )
        dot = F.expr(
            "aggregate(zip_with(es, emb, (x, y) -> x * y), cast(0.0 as double), (a, x) -> a + x)"
        )
        cand0 = (
            src.join(vecs.select(F.col("vec_id").alias("nbr_id"), "label", "emb"), "label")
            .filter(F.col("nbr_id") != F.col("src_id"))
            .select("src_id", "nbr_id", "emb", (F.lit(1.0) - dot).alias("d"))
        )
        w = _W.partitionBy("src_id").orderBy(F.asc("d"), F.asc("nbr_id"))
        c8 = cand0.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 8)
        closer = c8.select(
            "src_id", F.col("rnk").alias("p_rnk"), F.col("emb").alias("p_emb")
        )
        dcc = F.expr(
            "aggregate(zip_with(p_emb, emb, (x, y) -> x * y), cast(0.0 as double), (a, x) -> a + x)"
        )
        pruned = (
            c8.join(closer, "src_id")
            .filter(F.col("p_rnk") < F.col("rnk"))
            .filter(F.lit(1.2) * (F.lit(1.0) - dcc) <= F.col("d"))
            .select("src_id", "nbr_id")
            .distinct()
        )
        noop(
            c8.join(pruned, ["src_id", "nbr_id"], "left_anti")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("kept"))
        )

    probes["occlusion_prune (blocked 8x8 self-join)"] = occlusion_prune_probe

    def edit_distance_probe(n: int) -> None:
        """dedup_edit_distance_blocked's shape: block-key shuffle,
        <=64-member cap, constant-cost prefix levenshtein."""
        docs = synth_docs(spark, n // 100).select(
            "doc_id", F.lower("text").alias("norm")
        )
        k = docs.select(
            "doc_id",
            "norm",
            F.concat(
                F.substring("norm", 1, 12),
                F.lit("|"),
                F.expr("length(norm) div 32").cast("string"),
            ).alias("blk"),
        )
        bsz = k.groupBy("blk").agg(F.count(F.lit(1)).alias("nb"))
        kk = k.join(bsz, "blk").filter(F.col("nb") <= 64)
        a = kk.select("blk", F.col("doc_id").alias("id_a"), F.substring("norm", 1, 64).alias("pa"))
        b = kk.select("blk", F.col("doc_id").alias("id_b"), F.substring("norm", 1, 64).alias("pb"))
        noop(
            a.join(b, "blk")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(F.levenshtein("pa", "pb") <= 8)
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )

    probes["edit_distance_blocked (capped prefix lev)"] = edit_distance_probe

    def hour_grid_pairs_probe(n: int) -> None:
        """Mann-Kendall / Theil-Sen shape: corpus-sized map-side
        aggregate to the bounded hour grid, then the constant-size
        pair join — wall clock should track the aggregate only."""
        h = (
            synth_fact(spark, n)
            .select(F.pmod(F.col("id"), F.lit(744)).alias("hr"))
            .groupBy("hr")
            .agg(F.count(F.lit(1)).alias("y"))
        )
        a = h.select(F.col("hr").alias("ha"), F.col("y").alias("ya"))
        b = h.select(F.col("hr").alias("hb"), F.col("y").alias("yb"))
        noop(
            a.join(b, F.col("hb") > F.col("ha"))
            .select(
                F.when(F.col("yb") > F.col("ya"), 1)
                .when(F.col("yb") < F.col("ya"), -1)
                .otherwise(0)
                .alias("sg")
            )
            .agg(F.sum("sg").alias("s"))
        )

    probes["hour_grid_pairs (trend-stat shape)"] = hour_grid_pairs_probe

    # Round-8 additions: probes for the sixth-wave / continuation
    # queries that had no SCALING.md row (verdict item 4): pinball
    # loss, MV rollup rewrite, LOO target encoding, median-cut
    # palette, watermark greenlist.

    def pinball_loss_probe(n: int) -> None:
        """ev_pinball_loss_eval shape: corpus-sized hourly aggregate
        to a bounded grid, two percentile scalars over the grid, one
        conditional-sum evaluation pass — wall clock must track the
        single aggregate."""
        hourly = (
            synth_fact(spark, n)
            .select(F.pmod(F.col("id"), F.lit(744)).alias("hr"),
                    F.col("price"))
            .groupBy("hr")
            .agg(F.sum("price").alias("y"))
        )
        qs = hourly.agg(
            F.expr("percentile(y, 0.5)").alias("p50"),
            F.expr("percentile(y, 0.9)").alias("p90"),
        )
        noop(
            hourly.crossJoin(F.broadcast(qs)).agg(
                F.sum(
                    F.when(F.col("y") >= F.col("p50"),
                           (F.col("y") - F.col("p50")) * 0.5)
                    .otherwise((F.col("p50") - F.col("y")) * 0.5)
                ).alias("l50"),
                F.sum(
                    F.when(F.col("y") >= F.col("p90"),
                           (F.col("y") - F.col("p90")) * 0.9)
                    .otherwise((F.col("p90") - F.col("y")) * 0.1)
                ).alias("l90"),
            )
        )

    probes["pinball_loss (hourly agg + 2 quantile scalars)"] = pinball_loss_probe

    def mv_rollup_probe(n: int) -> None:
        """rel_mv_rollup_rewrite shape: the MV maintenance side is one
        month-keyed decimal aggregate over the fact; the rewritten
        quarterly question then touches only O(months) MV rows."""
        mv = (
            synth_fact(spark, n)
            .select(F.pmod(F.col("id"), F.lit(24)).alias("month"),
                    F.col("price"))
            .groupBy("month")
            .agg(dsum(F.col("price")).alias("rev"))
        )
        noop(
            mv.groupBy((F.col("month") / 3).cast("int").alias("quarter"))
            .agg(F.sum("rev").alias("rev"))
        )

    probes["mv_rollup (month MV agg -> quarter reagg)"] = mv_rollup_probe

    def loo_encoding_probe(n: int) -> None:
        """ev_loo_target_encoding shape: one category aggregate, then
        the closed-form two-value emission — O(categories) output, no
        per-row join-back."""
        g = (
            synth_fact(spark, n)
            .select(F.pmod(F.col("key"), F.lit(1000)).alias("cat"),
                    (F.pmod(F.hash("id", F.lit(3)), F.lit(2))).alias("y"))
            .groupBy("cat")
            .agg(F.sum("y").alias("k"), F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 1)
        )
        noop(
            g.select(
                "cat",
                ((F.col("k") - 1) / (F.col("cnt") - 1)).alias("loo_pos"),
                (F.col("k") / (F.col("cnt") - 1)).alias("loo_neg"),
            )
        )

    probes["loo_target_encoding (closed form from group sums)"] = loo_encoding_probe

    def median_cut_probe(n: int) -> None:
        """mm_median_cut_palette shape on synthetic pixel rows (the
        decode pass is probed separately by gif_lzw_decode): per-doc
        widest-channel argmax, pinned-percentile median, then per
        (doc, side) bucket statistics — three doc-keyed aggregates,
        all linear."""
        px = synth_fact(spark, n).select(
            (F.col("id") / 4096).cast("long").alias("doc"),
            F.pmod(F.hash("id", F.lit(1)), F.lit(256)).alias("r"),
            F.pmod(F.hash("id", F.lit(2)), F.lit(256)).alias("g"),
            F.pmod(F.hash("id", F.lit(3)), F.lit(256)).alias("b"),
        )
        rng = px.groupBy("doc").agg(
            (F.max("r") - F.min("r")).alias("rr"),
            (F.max("g") - F.min("g")).alias("rg"),
            (F.max("b") - F.min("b")).alias("rb"),
            F.expr("percentile(r, 0.5)").alias("mr"),
            F.expr("percentile(g, 0.5)").alias("mg"),
            F.expr("percentile(b, 0.5)").alias("mb"),
        ).select(
            "doc",
            F.when((F.col("rr") >= F.col("rg")) & (F.col("rr") >= F.col("rb")),
                   F.struct(F.lit("r").alias("ch"), F.col("mr").alias("med")))
            .when(F.col("rg") >= F.col("rb"),
                  F.struct(F.lit("g").alias("ch"), F.col("mg").alias("med")))
            .otherwise(F.struct(F.lit("b").alias("ch"), F.col("mb").alias("med")))
            .alias("cut"),
        )
        split = px.join(rng, "doc").select(
            "doc",
            F.when(
                F.when(F.col("cut.ch") == "r", F.col("r"))
                .when(F.col("cut.ch") == "g", F.col("g"))
                .otherwise(F.col("b")) <= F.col("cut.med"), 0
            ).otherwise(1).alias("side"),
            "r", "g", "b",
        )
        noop(
            split.groupBy("doc", "side").agg(
                F.count(F.lit(1)).alias("n_px"),
                F.avg("r").alias("mr"), F.avg("g").alias("mg"),
                F.avg("b").alias("mb"),
                (F.sum(F.col("r") * F.col("r"))
                 + F.sum(F.col("g") * F.col("g"))
                 + F.sum(F.col("b") * F.col("b"))).alias("ss"),
            )
        )

    probes["median_cut (per-doc argmax + median + bucket stats)"] = median_cut_probe

    def watermark_greenlist_probe(n: int) -> None:
        """text_watermark_greenlist_detect shape: doc-local pair
        explode (prev:cur md5 parity) + map-side per-doc counts +
        one tiny per-source aggregate — embarrassingly parallel."""
        docs = synth_docs(spark, max(n // 100, 1000))
        pairs = docs.select(
            "doc_id",
            F.pmod(F.col("doc_id"), F.lit(8)).alias("source"),
            F.expr(
                "filter(transform(split(text, ' '), "
                "(w, i) -> IF(i = 0, NULL, "
                "concat(element_at(split(text, ' '), i), ':', w))), "
                "x -> x IS NOT NULL)"
            ).alias("pp"),
        ).select(
            "doc_id", "source",
            F.size("pp").alias("n_pairs"),
            F.expr(
                "size(filter(pp, x -> "
                "conv(substr(md5(x), 32, 1), 16, 10) % 2 = 0))"
            ).alias("greens"),
        )
        noop(
            pairs.filter(F.col("n_pairs") > 0)
            .select(
                "source",
                ((2 * F.col("greens") - F.col("n_pairs"))
                 / F.sqrt(F.col("n_pairs").cast("double"))).alias("z"),
            )
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.avg("z").alias("mean_z"),
                 F.max(F.abs(F.col("z"))).alias("max_abs_z"))
        )

    probes["watermark_greenlist (pair explode + map-side z)"] = watermark_greenlist_probe

    # Round-8 new-operator shapes.

    def poisson_bootstrap_probe(n: int) -> None:
        """ev_poisson_bootstrap_ci shape: x32 map-side replicate
        fan-out into a 32-key weighted aggregate — one pass, no
        resampling shuffle; wall should track the fan-out linearly."""
        p = synth_fact(spark, n).select("id", "price")
        w = (
            p.select(
                "id", "price",
                F.explode(F.sequence(F.lit(0), F.lit(31))).alias("r"),
            )
            .withColumn(
                "wt",
                F.pmod(F.hash("id", "r"), F.lit(4)).cast("long"),
            )
            .groupBy("r")
            .agg((F.sum(F.col("wt") * F.col("price"))
                  / F.sum("wt")).alias("m"))
        )
        noop(w.agg(F.expr("percentile(m, 0.025)").alias("lo"),
                   F.expr("percentile(m, 0.975)").alias("hi")))

    probes["poisson_bootstrap (x32 fanout, 32-key agg)"] = poisson_bootstrap_probe

    def multitouch_probe(n: int) -> None:
        """ev_multitouch_attribution shape: purchases x touchpoints
        user-keyed join with a time residual, conv-keyed ranking
        windows, channel rollup."""
        # user cardinality must scale WITH n (constant ~40 events/user)
        # or the per-user pair fan-out grows quadratically and measures
        # the data, not the operator: the first cut derived user from
        # `key` (only 100k distinct) and read 16x/51x at 10x/30x purely
        # from events-per-user growth.
        ev = synth_fact(spark, n).select(
            "id",
            F.pmod(F.hash("id", F.lit(7)), F.lit(max(n // 40, 1000)))
            .alias("user"),
            F.unix_micros("ts").alias("ts"),
            F.pmod(F.hash("id", F.lit(5)), F.lit(5)).alias("chan"),
        )
        p = ev.filter(F.col("chan") == 0).select(
            F.col("id").alias("conv"), "user", F.col("ts").alias("cts"))
        t = ev.filter(F.col("chan") != 0).select(
            "user", "chan", "ts", "id")
        tp = p.join(t, "user").filter(
            (F.col("ts") < F.col("cts"))
            & (F.col("ts") >= F.col("cts") - 86400 * 1_000_000)
        )
        wf = Window.partitionBy("conv").orderBy("ts", "id")
        wn = Window.partitionBy("conv")
        noop(
            tp.select(
                "chan",
                F.row_number().over(wf).alias("rf"),
                F.count(F.lit(1)).over(wn).alias("nt"),
            )
            .groupBy("chan")
            .agg(F.sum(F.when(F.col("rf") == 1, 1).otherwise(0)).alias("f"),
                 F.sum(F.expr("1000000 div nt")).alias("lin"))
        )

    probes["multitouch_attribution (user join + conv windows)"] = multitouch_probe

    def bloom_prefilter_probe(n: int) -> None:
        """dedup_bloom_prefilter shape: constant-size bloom build from
        the index side, broadcast probe of the new side — probe cost
        must track the NEW batch only."""
        idx = synth_fact(spark, n).select(
            F.md5(F.col("id").cast("string")).alias("key"))
        newb = synth_fact(spark, max(n // 10, 1000)).select(
            F.col("id").alias("doc"),
            F.md5((F.col("id") * 7).cast("string")).alias("key"))
        bloom = (
            idx.selectExpr(
                "cast(conv(substr(key, 1, 8), 16, 10) as bigint)"
                " % 16128 AS h")
            .selectExpr(
                "h div 63 AS word",
                "shiftleft(cast(1 as bigint), cast(h % 63 as int)) AS m")
            .groupBy("word").agg(F.bit_or("m").alias("bits"))
        )
        probe = newb.selectExpr(
            "doc",
            "cast(conv(substr(key, 1, 8), 16, 10) as bigint) % 16128 AS h")
        noop(
            probe.join(
                F.broadcast(bloom),
                F.col("word") == F.expr("h div 63"), "left")
            .selectExpr(
                "doc",
                "CASE WHEN bits IS NOT NULL AND"
                " (bits & shiftleft(cast(1 as bigint),"
                "  cast(h % 63 as int))) <> 0 THEN 1 ELSE 0 END AS hit")
            .groupBy("hit").count()
        )

    probes["bloom_prefilter (const bloom build + bcast probe)"] = bloom_prefilter_probe

    def repetition_filter_probe(n: int) -> None:
        """text_repetition_filter shape: doc-local n-gram explode, two
        (doc, gram) aggregates + top-1 window — all linear in corpus
        size, zero cross-doc work."""
        docs = synth_docs(spark, max(n // 100, 1000)).select(
            "doc_id", F.split("text", " ").alias("w"))
        k = F.size("w")
        g2 = F.transform(
            F.sequence(F.lit(0), k - 2),
            lambda i: F.array_join(F.slice("w", i + 1, 2), " "))
        bg = docs.select(
            "doc_id",
            F.explode(F.when(k >= 2, g2).otherwise(
                F.array().cast("array<string>"))).alias("gram"))
        bgc = bg.groupBy("doc_id", "gram").agg(
            F.count(F.lit(1)).alias("cnt"))
        wt = Window.partitionBy("doc_id").orderBy(
            F.desc("cnt"), F.asc("gram"))
        noop(
            bgc.withColumn("rn", F.row_number().over(wt))
            .filter(F.col("rn") == 1)
            .groupBy().agg(F.sum(F.col("cnt") * F.length("gram")).alias("s"))
        )

    probes["repetition_filter (doc-local ngram aggs)"] = repetition_filter_probe

    def path_trigram_probe(n: int) -> None:
        """ev_path_trigrams shape: ONE user-keyed sort window with two
        LEADs, then a map-side-combinable aggregate over <= |types|^3
        path keys and a rank over that tiny table."""
        ev = synth_fact(spark, n).select(
            F.pmod("key", F.lit(50_000)).alias("user_id"),
            F.concat(F.lit("t"), F.col("flag").cast("string"))
            .alias("event_type"),
            "ts", F.col("id").alias("event_id"),
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = ev.select(
            "user_id", "event_type",
            F.lead("event_type", 1).over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("t2"),
            F.unix_micros("ts").alias("us"),
            F.lead(F.unix_micros("ts"), 2).over(w).alias("us2"),
        ).filter(F.col("t2").isNotNull()
                 & (F.col("us2") - F.col("us") <= 3_600_000_000))
        tri = seq.select(
            F.concat_ws(">", "event_type", "t1", "t2").alias("path"),
            "user_id",
        ).groupBy("path").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("user_id").alias("nu"))
        noop(tri.withColumn(
            "rk", F.rank().over(Window.orderBy(F.desc("cnt"), F.asc("path")))
        ).filter(F.col("rk") <= 15))

    probes["path_trigrams (user window + tiny path agg)"] = path_trigram_probe

    def growth_accounting_probe(n: int) -> None:
        """ev_growth_accounting shape: (user, day) distinct is the one
        stream-sized shuffle; lag/min windows run over each user's
        active-day list; churn is a day-shifted anti-join on the same
        deduplicated table."""
        ev = synth_fact(spark, n).select(
            F.pmod("key", F.lit(50_000)).alias("user_id"),
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        )
        du = ev.distinct()
        w = Window.partitionBy("user_id").orderBy("day")
        wall = Window.partitionBy("user_id")
        seq = du.select(
            "user_id", "day",
            F.lag("day").over(w).alias("prev_day"),
            F.min("day").over(wall).alias("first_day"))
        yday = F.date_format(
            F.date_sub(F.col("day").cast("date"), 1), "yyyy-MM-dd")
        cls = seq.groupBy("day").agg(
            F.sum((F.col("day") == F.col("first_day")).cast("int"))
            .alias("new_users"),
            F.sum((F.col("prev_day") == yday).cast("int")).alias("retained"))
        nxt = du.select(
            "user_id",
            F.date_format(F.date_add(F.col("day").cast("date"), 1),
                          "yyyy-MM-dd").alias("day"))
        churn = nxt.join(du, ["user_id", "day"], "left_anti").groupBy(
            "day").agg(F.count(F.lit(1)).alias("churned"))
        noop(cls.join(churn, "day", "left"))

    probes["growth_accounting (distinct + user windows + shifted anti-join)"] = (
        growth_accounting_probe)

    def merkle_probe(n: int) -> None:
        """src_merkle_tree_integrity shape: map-side row md5, TWO-level
        leaf build — (day, hash-prefix) sub-leaves bound every
        collect_list at ~day/256 (the single-level day-sized collect
        measured 64.6x wall at 30x data), then a 256-row/day rollup
        and a driver-scale pairwise fold over the O(days) leaf
        array."""
        ev = synth_fact(spark, n).select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.md5(F.concat_ws("|", F.col("id").cast("string"),
                              F.col("key").cast("string"))).alias("h"))
        sub = ev.withColumn("sub", F.substring("h", 1, 2)).groupBy(
            "day", "sub").agg(
            F.md5(F.array_join(F.array_sort(F.collect_list("h")), ""))
            .alias("sl"))
        leaves = sub.groupBy("day").agg(
            F.md5(F.array_join(F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "sl"))),
                lambda x: x["sl"]), "")).alias("leaf"))
        l0 = leaves.agg(F.transform(
            F.array_sort(F.collect_list(F.struct("day", "leaf"))),
            lambda x: x["leaf"]).alias("a"))
        cur = l0
        for _ in range(6):
            cur = cur.selectExpr(
                "transform(sequence(1, cast(ceil(size(a)/2.0) as int)),"
                " i -> md5(concat(element_at(a, 2*i-1),"
                " coalesce(try_element_at(a, 2*i), element_at(a, 2*i-1)))))"
                " AS a")
        noop(cur.selectExpr("element_at(a, 1) AS root"))

    probes["merkle_tree (per-day leaf agg + driver-scale fold)"] = merkle_probe

    def ordered_positions_probe(n: int) -> None:
        """src_merge_on_read_deletes write path (round-9 fix): global
        write-position assignment via the bucketed prefix-sum instead
        of a single-partition sort window."""
        from quick_and_easy_vectordb_spark.queries.lakehouse import (
            ordered_positions,
        )

        base = synth_fact(spark, n).select(
            (F.col("id") * 2 + 7).alias("k"), "price")
        noop(ordered_positions(base, "k"))

    probes["ordered_positions (bucketed prefix-sum ranking)"] = (
        ordered_positions_probe)

    def paragraph_ccnet_probe(n: int) -> None:
        """dedup_paragraph_ccnet shape: map-side paragraph split +
        posexplode, ONE md5-partitioned window ranking first
        occurrences, O(sources) rollup."""
        docs = synth_docs(spark, max(n // 100, 1000)).select(
            "doc_id", (F.col("doc_id") % 20).alias("source"),
            F.split("text", " ").alias("w"))
        np_ = F.ceil(F.size("w") / F.lit(20.0)).cast("long")
        paras = docs.select(
            "doc_id", "source",
            F.posexplode(F.transform(
                F.sequence(F.lit(0), np_ - 1),
                lambda i: F.array_join(
                    F.slice("w", (i * 20 + 1).cast("int"), 20), " "))
            ).alias("pidx", "para"))
        w = Window.partitionBy(F.md5("para")).orderBy("doc_id", "pidx")
        ranked = paras.withColumn("rn", F.row_number().over(w))
        noop(ranked.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum((F.col("rn") > 1).cast("int")).alias("n_dropped")))

    probes["paragraph_ccnet (hash-partitioned first-occurrence window)"] = (
        paragraph_ccnet_probe)

    def ttr_window_probe(n: int) -> None:
        """text_ttr_sliding shape: token posexplode, one (doc, window)
        distinct-count shuffle, O(sources) rollup."""
        docs = synth_docs(spark, max(n // 100, 1000)).select(
            "doc_id", (F.col("doc_id") % 20).alias("source"),
            F.posexplode(F.split("text", " ")).alias("p", "tok"))
        agg = docs.select(
            "doc_id", "source", "tok",
            (F.col("p") / 20).cast("long").alias("w")
        ).groupBy("doc_id", "source", "w").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("tok").alias("u"))
        noop(agg.filter(F.col("cnt") == 20).groupBy("source").agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.col("u").cast("double") / 20).alias("s")))

    probes["ttr_windows ((doc,win) distinct-count agg)"] = ttr_window_probe

    def burstiness_probe(n: int) -> None:
        """text_word_burstiness shape: (word, doc) counts then vocab
        stats — two map-side-combinable shuffles, broadcast scalar,
        TakeOrdered top-20."""
        docs = synth_docs(spark, max(n // 100, 1000)).select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok"))
        per_doc = docs.groupBy("tok", "doc_id").agg(
            F.count(F.lit(1)).alias("c"))
        nd = docs.select("doc_id").distinct().count()
        stats = per_doc.groupBy("tok").agg(
            F.sum("c").alias("total"),
            F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
        ).filter(F.col("total") >= 50)
        noop(stats.select(
            "tok", "total",
            ((F.lit(nd) * F.col("sum_sq") - F.col("total") * F.col("total"))
             .cast("double") / (F.lit(nd) * F.col("total"))).alias("b"))
            .orderBy(F.desc("b"), F.asc("tok")).limit(20))

    probes["burstiness (word-doc counts + vocab stats)"] = burstiness_probe

    def cc_chain_probe(n: int) -> None:
        """Alternating-star connected components (round-9 rewrite) on
        the adversarial shape that broke the old operator: ONE long
        chain whose ids are a multiplicative permutation (labels point
        away from the min). Rounds are O(log^2) in component size, so
        wall-clock should grow ~linearly with a slowly growing round
        count."""
        from quick_and_easy_vectordb_spark.operators.graph import (
            connected_components,
        )

        m = max(n // 20, 10_000) | 1  # odd → 2654435761 is coprime
        ids = spark.range(m - 1).select(
            ((F.col("id") * 2654435761) % m).alias("id_a"),
            (((F.col("id") + 1) * 2654435761) % m).alias("id_b"),
        )
        noop(connected_components(ids))

    probes["cc_chain (alternating-star CC, shuffled-id chain)"] = (
        cc_chain_probe)

    # Round-10 additions: the two heaviest bench shapes (VERDICT r09
    # item 3), probed by STAGING synthetic parquet and running the
    # REGISTERED query itself — the probe measures the exact plan the
    # bench and the driver run, not a reconstruction. Staging happens
    # once per (shape, size) outside the timed region.
    import tempfile

    _stage_root = tempfile.mkdtemp(prefix="qev-probe-stage-")

    def _stage_band_tuning_corpus(docs_n: int) -> str:
        """documents.parquet with ~10%% exact near-dups (candidate
        pairs exist at every band config) AND a 2%% boilerplate
        MEGA-CLUSTER (docs_n/50 identical docs — far above the 64
        bucket cap, so the probe exercises the round-10 analytic
        divert; uncapped, this corpus is exactly the O(k²) blowup:
        (docs_n/50)² pairs per band × 15 bands)."""
        d = os.path.join(_stage_root, f"bt{docs_n}")
        path = os.path.join(d, "documents.parquet")
        if not os.path.isdir(path):
            src = F.when(F.col("id") % 50 == 0, F.lit(-1)).otherwise(
                F.col("id") % int(docs_n * 0.9)
            )
            word = lambda i: F.concat(  # noqa: E731
                F.lit("w"),
                F.pmod(F.hash(src, F.lit(i)), F.lit(5000)).cast("string"),
            )
            text = F.when(
                src == -1,
                F.lit(
                    "footer terms apply all rights reserved contact the"
                    " webmaster for takedown requests and details"
                ),
            ).otherwise(F.concat_ws(" ", *[word(i) for i in range(40)]))
            spark.range(docs_n).select(
                F.col("id").alias("doc_id"), text.alias("text")
            ).write.mode("overwrite").parquet(path)
        return d

    def band_tuning_probe(n: int) -> None:
        from quick_and_easy_vectordb_spark.queries import QUERIES

        d = _stage_band_tuning_corpus(max(n // 100, 2000))
        noop(QUERIES["dedup_band_tuning"].fn(spark, d))

    probes["band_tuning (capped 15-band sweep + union verify)"] = (
        band_tuning_probe)

    def _stage_embeddings(vec_n: int) -> str:
        """embeddings.parquet matching the fixture schema (vec_id
        BIGINT, embedding FLOAT[64], label INT 0-9)."""
        d = os.path.join(_stage_root, f"emb{vec_n}")
        path = os.path.join(d, "embeddings.parquet")
        if not os.path.isdir(path):
            emb = F.array(*[
                ((F.pmod(F.hash("id", F.lit(i)), F.lit(2001)) - 1000)
                 / 1000.0).cast("float")
                for i in range(64)
            ])
            spark.range(vec_n).select(
                F.col("id").alias("vec_id"),
                emb.alias("embedding"),
                F.pmod(F.hash("id", F.lit(99)), F.lit(10))
                .cast("int").alias("label"),
            ).write.mode("overwrite").parquet(path)
        return d

    def ivf_pq_probe(n: int) -> None:
        from quick_and_easy_vectordb_spark.queries import QUERIES

        d = _stage_embeddings(max(n // 100, 2000))
        noop(QUERIES["ann_ivf_pq_search"].fn(spark, d))

    probes["ivf_pq_search (coarse prune + ADC + exact rerank)"] = (
        ivf_pq_probe)

    def _stage_cc_base(n_nodes: int) -> str:
        """Precomputed base labeling for the incremental-CC probe:
        chain-segment components of size 4 over n_nodes ids, labeled
        once by the full alternating-star CC and parqueted. Staging is
        OUTSIDE the timed region — in production the base labels ARE a
        stored table (yesterday's output)."""
        from quick_and_easy_vectordb_spark.operators.graph import (
            connected_components,
        )

        d = os.path.join(_stage_root, f"ccbase{n_nodes}", "labels.parquet")
        if not os.path.isdir(d):
            edges = spark.range(n_nodes - 1).filter(
                F.col("id") % 4 != 3
            ).select(
                F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
            )
            connected_components(edges).write.mode("overwrite").parquet(d)
        return d

    def cc_incremental_probe(n: int) -> None:
        """dedup_cc_incremental's merge step at a FIXED delta (2000 new
        edges) against a GROWING base labeling: wall-clock should be
        ~flat in base size — the whole point of the contraction. The
        base scan itself (one map-side semi-filter pass) is the only
        base-sized work."""
        from quick_and_easy_vectordb_spark.operators.graph import (
            connected_components,
        )

        nodes = max(n // 4, 100_000)
        base = spark.read.parquet(_stage_cc_base(nodes))
        # leaf-ify delta: la/lb below re-derive from it through base,
        # and the delta⋈delta-derived self-join otherwise trips a
        # Spark 4 attribute-dedup bug ("key not found" at analysis)
        delta = spark.range(2000).select(
            ((F.col("id") * 7919) % nodes).alias("id_a"),
            (F.lit(nodes) + F.col("id")).alias("id_b"),
        ).localCheckpoint()
        touched = (
            delta.select(F.col("id_a").alias("id"))
            .unionByName(delta.select(F.col("id_b").alias("id")))
            .distinct()
        )
        bt = base.join(F.broadcast(touched), "id", "left_semi")
        la = bt.select(F.col("id").alias("id_a"),
                       F.col("component").alias("ca"))
        lb = bt.select(F.col("id").alias("id_b"),
                       F.col("component").alias("cb"))
        contracted = (
            delta.join(F.broadcast(la), "id_a", "left")
            .join(F.broadcast(lb), "id_b", "left")
            .select(
                F.coalesce("ca", F.col("id_a")).alias("u"),
                F.coalesce("cb", F.col("id_b")).alias("v"),
            )
            .distinct()
        )
        merged = connected_components(contracted, "u", "v")
        remap = merged.select(
            F.col("id").alias("component"),
            F.col("component").alias("final"),
        )
        final = base.join(F.broadcast(remap), "component", "left").select(
            "id", F.coalesce("final", F.col("component")).alias("component")
        )
        noop(final)

    probes["cc_incremental (O(delta) merge vs growing base)"] = (
        cc_incremental_probe)

    def retention_matrix_probe(n: int) -> None:
        """ev_cohort_retention_matrix shape: distinct (user, day) is
        the only corpus-sized shuffle; cohorts via min-agg; the matrix
        itself is a count-distinct over the O(days²) grid. User
        cardinality scales with n (constant events/user) — the
        multitouch-probe lesson."""
        ev = synth_fact(spark, n).select(
            F.pmod(F.hash("id", F.lit(5)), F.lit(max(n // 40, 1000)))
            .alias("user_id"),
            F.to_date(
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000)
                    + F.pmod(F.hash("id", F.lit(6)), F.lit(30))
                    * 86_400_000_000
                )
            ).alias("day"),
        )
        act = ev.distinct()
        first_seen = act.groupBy("user_id").agg(
            F.min("day").alias("cohort_day"))
        sizes = first_seen.groupBy("cohort_day").agg(
            F.count(F.lit(1)).alias("cohort_size"))
        cells = (
            act.join(first_seen, "user_id")
            .select("cohort_day",
                    F.datediff("day", "cohort_day").alias("off"),
                    "user_id")
            .groupBy("cohort_day", "off")
            .agg(F.count_distinct("user_id").alias("n_active"))
        )
        noop(cells.join(F.broadcast(sizes), "cohort_day"))

    probes["retention_matrix (distinct + cohort join + grid agg)"] = (
        retention_matrix_probe)

    # Round-11 (VERDICT r10 item 8): the pure-python codec decoders are
    # the only mapInPandas-heavy family without a probe row. Work is
    # per-row Python (encode + full decode per payload, zero shuffle),
    # so wall-clock must grow linearly in payload COUNT with the 32
    # worker threads absorbing it until n_docs/32 rows per task; the
    # probe scales docs 1x→30x (n // 1000 → 2k/20k/60k payloads).
    # Superlinear here would mean Arrow batch overhead or pickling is
    # growing faster than row count.
    def codec_decode_probe(n: int) -> None:
        from quick_and_easy_vectordb_spark.operators.multimodal import (
            decode_image,
            qoi_encode,
        )
        from quick_and_easy_vectordb_spark.queries.multimodal import (
            jpeg_encode_gray_dc,
        )

        n_docs = max(n // 1000, 100)

        def run(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                ids, sums = [], []
                for doc_id in pdf["doc_id"]:
                    doc_id = int(doc_id)
                    w, h = 6 + doc_id % 5, 5 + doc_id % 4
                    i = np.arange(w * h, dtype=np.int64)
                    s3 = (i // 6) * 3
                    raster = np.stack(
                        [(doc_id * k + s3) % 256 for k in (37, 11, 53)],
                        axis=1,
                    ).astype(np.uint8).reshape(h, w, 3)
                    img = decode_image(qoi_encode(raster))
                    # JPEG: one 8x8 gray DC block per doc (the entropy
                    # pipeline end-to-end at fixed per-row cost)
                    jb = jpeg_encode_gray_dc([[doc_id % 256]], 8, 8)
                    jimg = decode_image(jb)
                    ids.append(doc_id)
                    sums.append(int(img.sum()) + int(jimg.sum()))
                yield pd.DataFrame({"doc_id": ids, "pix_sum": sums})

        docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        noop(docs.mapInPandas(run, "doc_id long, pix_sum long"))

    probes["codec_decode (QOI+JPEG python per-row, mapInPandas)"] = (
        codec_decode_probe)

    # PDF extraction (round 11): same per-row-python mapInPandas family
    # but with zlib inflate + content-stream tokenization per payload —
    # a heavier per-row constant than the image codecs, so it gets its
    # own row. Each row writes and fully parses a ~4-page PDF.
    def pdf_extract_probe(n: int) -> None:
        from quick_and_easy_vectordb_spark.operators.pdf import (
            pdf_encode,
            pdf_extract_text,
        )

        n_docs = max(n // 1000, 100)

        def run(batches):
            import pandas as pd

            for pdf in batches:
                ids, chars = [], []
                for doc_id in pdf["doc_id"]:
                    doc_id = int(doc_id)
                    text = (f"tok{doc_id} ") * (60 + doc_id % 37)
                    pages = [
                        text[i : i + 180] for i in range(0, len(text), 180)
                    ]
                    got = pdf_extract_text(pdf_encode(pages))
                    ids.append(doc_id)
                    chars.append(sum(len(p) for p in got))
                yield pd.DataFrame({"doc_id": ids, "n_chars": chars})

        docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        noop(docs.mapInPandas(run, "doc_id long, n_chars long"))

    probes["pdf_extract (encode+parse python per-row, mapInPandas)"] = (
        pdf_extract_probe)

    # Segment-intersection spatial self-join (round 11, continued):
    # the PBSM reference-point shape of geo_segment_intersections. The
    # coordinate SPACE scales with sqrt(n) so segment DENSITY — and
    # therefore candidate pairs per cell — stays constant: that is the
    # regime a constant-density spatial corpus (road networks, parcel
    # maps) actually grows in. A fixed-space probe would grow pair
    # count quadratically by construction of the WORKLOAD (density
    # doubling), not the algorithm, and tell us nothing.
    def segment_intersections_probe(n: int) -> None:
        n_segs = max(n // 4, 10_000)
        side = (n_segs / 1500.0) ** 0.5
        xm, ym = int(36000 * side), int(16000 * side)
        cell = 4000
        k = F.col("id") + 1
        hx = F.pmod(k * k * 7 + k * 104729, F.lit(xm))
        hy = F.pmod(k * k * 13 + k * 7919, F.lit(ym))
        seg = spark.range(n_segs).select(
            k.alias("sid"),
            hx.alias("ax"),
            (F.lit(700) + hy).alias("ay"),
            (hx + 100 + F.pmod(k * 13, F.lit(1200))).alias("bx"),
            (F.lit(700) + hy + F.pmod(k * 31, F.lit(1300)) - 650).alias("by"),
        ).select(
            "sid", "ax", "ay", "bx", "by",
            F.col("ax").alias("x0"), F.col("bx").alias("x1"),
            F.least("ay", "by").alias("y0"),
            F.greatest("ay", "by").alias("y1"),
        )
        cells = F.expr(
            f"explode(flatten(transform("
            f"  sequence(x0 div {cell}, x1 div {cell}),"
            f"  gx -> transform("
            f"    sequence(y0 div {cell}, y1 div {cell}),"
            f"    gy -> struct(gx as cx, gy as cy)))))"
        )
        rep = seg.select("*", cells.alias("c")).select(
            "sid", "ax", "ay", "bx", "by", "x0", "x1", "y0", "y1",
            F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"),
        )
        cols = ("sid", "ax", "ay", "bx", "by", "x0", "x1", "y0", "y1")
        a = rep.select(
            *[F.col(c).alias(f"a_{c}") for c in cols], "cx", "cy")
        b = rep.select(
            *[F.col(c).alias(f"b_{c}") for c in cols], "cx", "cy")
        cand = a.join(b, ["cx", "cy"]).filter(
            (F.col("a_sid") < F.col("b_sid"))
            & (F.col("a_x0") <= F.col("b_x1"))
            & (F.col("b_x0") <= F.col("a_x1"))
            & (F.col("a_y0") <= F.col("b_y1"))
            & (F.col("b_y0") <= F.col("a_y1"))
            & (F.col("cx")
               == F.floor(F.greatest("a_x0", "b_x0") / cell).cast("long"))
            & (F.col("cy")
               == F.floor(F.greatest("a_y0", "b_y0") / cell).cast("long"))
        )

        def cr(px, py, qx, qy, rx, ry):
            return (F.col(qx) - F.col(px)) * (F.col(ry) - F.col(py)) - (
                F.col(qy) - F.col(py)
            ) * (F.col(rx) - F.col(px))

        d1 = cr("b_ax", "b_ay", "b_bx", "b_by", "a_ax", "a_ay")
        d2 = cr("b_ax", "b_ay", "b_bx", "b_by", "a_bx", "a_by")
        d3 = cr("a_ax", "a_ay", "a_bx", "a_by", "b_ax", "b_ay")
        d4 = cr("a_ax", "a_ay", "a_bx", "a_by", "b_bx", "b_by")
        hit = F.when((d1 * d2 < 0) & (d3 * d4 < 0), 1).otherwise(0)
        noop(
            cand.agg(
                F.count(F.lit(1)).alias("n_candidates"),
                F.sum(hit).alias("n_intersections"),
            )
        )

    probes["segment_intersections (PBSM ref-point, const density)"] = (
        segment_intersections_probe)

    # Round-12 (VERDICT r11 item 4): the two round-11 heavy additions
    # that lacked probe rows.
    #
    # rerank_cascade: THE claim to verify is that tiers 2-3 stay
    # CONSTANT as the corpus grows — only tier-1 (cheap surrogate top
    # 200 via TakeOrderedAndProject) is corpus-sized; the two
    # broadcast join-backs touch 200/50 rows regardless of n. Linear
    # (or better) wall growth confirms it; superlinear would mean a
    # candidate set scaling with the corpus.
    _QPROBE = [((i * 37) % 2001 - 1000) / 1000.0 for i in range(16)]

    def _probe_dot(col, qv):
        return F.aggregate(
            F.zip_with(
                col, F.array(*[F.lit(float(x)) for x in qv]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    def rerank_cascade_probe(n):
        vecs = synth_vecs(n // 4)
        # tier-1 surrogate: sign-agreement count (integer, the
        # popcount stand-in — same cost class, same plan shape).
        t1 = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(float(x)) for x in _QPROBE]),
                lambda a, b: F.when(a * b >= 0, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, t: acc + t,
        )
        c1 = (
            vecs.select("vec_id", t1.alias("agree"))
            .orderBy(F.desc("agree"), F.asc("vec_id"))
            .limit(200)
        )
        s2 = (
            vecs.join(F.broadcast(c1), "vec_id")
            .select("vec_id",
                    F.round(_probe_dot(F.col("embedding"), _QPROBE), 1)
                    .alias("mid"))
            .orderBy(F.desc("mid"), F.asc("vec_id"))
            .limit(50)
        )
        s3 = (
            vecs.join(F.broadcast(s2), "vec_id")
            .select("vec_id",
                    _probe_dot(F.col("embedding"), _QPROBE).alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(10)
        )
        noop(s3)

    probes["rerank_cascade (3 tiers, bcast candidate join-backs)"] = (
        rerank_cascade_probe)

    # hard_negative_mining, corpus growth: fixed 50-anchor batch
    # broadcast into a growing corpus — the BNLJ pair count is
    # 50 x corpus, so wall must grow linearly with n.
    def _hn(anchors_df, corpus_df):
        a = anchors_df.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.pmod(F.col("vec_id"), F.lit(8)).alias("q_label"),
        )
        c = corpus_df.select(
            F.col("vec_id").alias("neg_id"),
            F.col("embedding").alias("cv"),
            F.pmod(F.col("vec_id"), F.lit(8)).alias("neg_label"),
        )
        scored = c.join(
            F.broadcast(a), F.col("neg_label") != F.col("q_label")
        ).select(
            "query_id", "neg_id",
            F.aggregate(
                F.zip_with(F.col("cv"), F.col("qv"), lambda x, y: x * y),
                F.lit(0.0), lambda acc, t: acc + t,
            ).alias("score"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("neg_id"))
        noop(
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
        )

    def hard_negative_corpus_probe(n):
        # corpus = n//16: calibrated so the 30x point (3.75M vectors x
        # 50 anchors = 187M scored pairs) stays under ~60 s/run.
        corpus = synth_vecs(n // 16)
        anchors = synth_vecs(50)
        _hn(anchors, corpus)

    probes["hard_negatives (50 bcast anchors, corpus-growth)"] = (
        hard_negative_corpus_probe)

    # hard_negative_mining, ANCHOR growth at fixed corpus: pair count
    # is anchors x 50k, so wall should grow linearly with the anchor
    # batch; superlinear here would trigger the documented LSH-bucket
    # swap (vdb_batch_knn_lsh's candidate generation with the label
    # exclusion riding the equi-join).
    def hard_negative_anchor_probe(n):
        corpus = synth_vecs(50_000)
        anchors = synth_vecs(max(1, n // 40_000))  # 50 -> 500 -> 1500
        _hn(anchors, corpus)

    probes["hard_negatives (anchor-growth, 50k corpus)"] = (
        hard_negative_anchor_probe)

    # Round-13 additions: the new operator shapes of this round.
    # str_rtree_pack — the distributed STR bulk-load rank: 8-row band
    # offsets (broadcast) + band window + slice window + MBR agg; the
    # claim under test is that NO single-partition data window hides
    # in the rank path (wall should track the two bounded shuffles).
    def str_pack_probe(n):
        # Production sizing (the first probe run measured the scale
        # bug this prevents: FIXED 8 slices/8 bands turned the
        # per-slice rank windows into 8 multi-million-row partitions
        # — 71x wall at 30x data. STR's own rule S = ceil(sqrt(N/B))
        # keeps every window partition ~4*sqrt(N) rows, and the band
        # width shrinks with S so the x-rank stays partitioned too.)
        n_slices = max(8, int((n / 16) ** 0.5))
        band_w = max(1, 100_000 // (4 * n_slices))
        r = synth_fact(spark, n).select(
            F.col("id"),
            F.pmod(F.hash("id", F.lit(21)), F.lit(100_000)).alias("cx"),
            F.pmod(F.hash("id", F.lit(22)), F.lit(100_000)).alias("cy"),
            (F.lit(50) + F.pmod(F.hash("id", F.lit(23)), F.lit(450))).alias("wx"),
            (F.lit(50) + F.pmod(F.hash("id", F.lit(24)), F.lit(450))).alias("wy"),
        ).withColumn("band", (F.col("cx") / band_w).cast("long"))
        offs = (
            r.groupBy("band").agg(F.count(F.lit(1)).alias("bc"))
            .select(
                "band",
                F.sum("bc").over(
                    Window.orderBy("band")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ).alias("off"),
                F.sum("bc").over(
                    Window.orderBy("band").rowsBetween(
                        Window.unboundedPreceding,
                        Window.unboundedFollowing,
                    )
                ).alias("ntot"),
            )
            .fillna({"off": 0})
        )
        xr = (
            F.row_number().over(Window.partitionBy("band").orderBy("cx", "id"))
            - 1 + F.col("off")
        )
        slice_sz = (
            (F.col("ntot") + n_slices - 1) / F.lit(n_slices)
        ).cast("long")
        ranked = r.join(F.broadcast(offs), "band").select(
            "id", "cx", "cy", "wx", "wy",
            F.floor(xr / slice_sz).alias("slice"),
        )
        yr = F.row_number().over(
            Window.partitionBy("slice").orderBy("cy", "id")
        ) - 1
        noop(
            ranked.select("*", F.floor(yr / 16).alias("leaf"))
            .groupBy("slice", "leaf")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(F.col("cx") - F.col("wx")).alias("x0"),
                 F.max(F.col("cx") + F.col("wx")).alias("x1"),
                 F.min(F.col("cy") - F.col("wy")).alias("y0"),
                 F.max(F.col("cy") + F.col("wy")).alias("y1"))
        )

    probes["str_rtree_pack (band-rank + slice-rank)"] = str_pack_probe

    # pbsm_rect_overlay — bipartite cell equi-join with exact area
    # refinement; replication bounded by rect-size/cell ratio.
    def rect_overlay_probe(n):
        def rects(m, salt):
            return synth_fact(spark, m).select(
                F.col("id"),
                F.pmod(F.hash("id", F.lit(salt)), F.lit(100_000)).alias("x0"),
                F.pmod(F.hash("id", F.lit(salt + 1)), F.lit(100_000)).alias("y0"),
            ).select(
                "id", "x0", "y0",
                (F.col("x0") + 200 + F.pmod(F.hash("id", F.lit(salt + 2)),
                                            F.lit(1800))).alias("x1"),
                (F.col("y0") + 200 + F.pmod(F.hash("id", F.lit(salt + 3)),
                                            F.lit(1300))).alias("y1"),
            )
        cell = 4000
        cells = F.expr(
            f"explode(flatten(transform("
            f"  sequence(x0 div {cell}, x1 div {cell}),"
            f"  gx -> transform(sequence(y0 div {cell}, y1 div {cell}),"
            f"  gy -> struct(gx as gcx, gy as gcy)))))"
        )
        def rep(t, p):
            return t.select("*", cells.alias("c")).select(
                *[F.col(c).alias(f"{p}_{c}")
                  for c in ("id", "x0", "y0", "x1", "y1")],
                F.col("c.gcx").alias("gcx"), F.col("c.gcy").alias("gcy"),
            )
        a, b = rep(rects(n // 10, 31), "a"), rep(rects(n // 10, 41), "b")
        cand = a.join(b, ["gcx", "gcy"]).filter(
            (F.col("a_x0") <= F.col("b_x1")) & (F.col("b_x0") <= F.col("a_x1"))
            & (F.col("a_y0") <= F.col("b_y1")) & (F.col("b_y0") <= F.col("a_y1"))
            & (F.col("gcx") == F.floor(F.greatest("a_x0", "b_x0") / cell).cast("long"))
            & (F.col("gcy") == F.floor(F.greatest("a_y0", "b_y0") / cell).cast("long"))
        )
        ox = F.least("a_x1", "b_x1") - F.greatest("a_x0", "b_x0")
        oy = F.least("a_y1", "b_y1") - F.greatest("a_y0", "b_y0")
        noop(cand.agg(
            F.count(F.lit(1)).alias("n_cand"),
            F.sum(F.when((ox > 0) & (oy > 0), ox * oy).otherwise(0)).alias("area"),
        ))

    probes["pbsm_rect_overlay (cell equi-join + area)"] = rect_overlay_probe

    # epoch_shuffle — keyed affine permutation + (epoch, shard) rank;
    # 2 epochs double the rows in-map before ONE bounded shuffle.
    def epoch_shuffle_probe(n):
        docs = spark.range(n).select(F.col("id").alias("doc_id"))
        epochs = spark.range(2).select(F.col("id").alias("epoch"))
        keyed = docs.crossJoin(F.broadcast(epochs)).select(
            "epoch", "doc_id",
            ((F.col("doc_id") * 2654435761 + F.col("epoch") * 671807229)
             % ((1 << 61) - 1)).alias("sk"),
        ).withColumn("shard", F.col("sk") % 8)
        w = Window.partitionBy("epoch", "shard").orderBy("sk", "doc_id")
        noop(keyed.select("epoch", "shard", F.row_number().over(w).alias("pos"),
                          "doc_id"))

    probes["epoch_shuffle (affine perm + shard rank)"] = epoch_shuffle_probe

    # closest_pair — 3x3 neighbor explode + cell equi-join; the cell
    # side SHRINKS as sqrt(n) to hold per-cell occupancy constant (the
    # production dial), so candidates stay ~O(n).
    def closest_pair_probe(n):
        m = n // 10
        cell = max(200, int(100_000 / max(1.0, (m / 4.0) ** 0.5)))
        pts = synth_fact(spark, m).select(
            F.col("id"),
            F.pmod(F.hash("id", F.lit(51)), F.lit(100_000)).alias("x"),
            F.pmod(F.hash("id", F.lit(52)), F.lit(100_000)).alias("y"),
        ).select(
            "*",
            (F.col("x") / cell).cast("long").alias("cx"),
            (F.col("y") / cell).cast("long").alias("cy"),
        )
        probe_side = pts.select(
            F.col("id").alias("id_a"), F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            F.explode(F.expr(
                "flatten(transform(sequence(cx - 1, cx + 1), gx ->"
                " transform(sequence(cy - 1, cy + 1), gy ->"
                " struct(gx as gcx, gy as gcy))))"
            )).alias("c"),
        ).select("id_a", "xa", "ya",
                 F.col("c.gcx").alias("cx"), F.col("c.gcy").alias("cy"))
        build = pts.select(F.col("id").alias("id_b"), F.col("x").alias("xb"),
                           F.col("y").alias("yb"), "cx", "cy")
        d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
              + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
        noop(
            probe_side.join(build, ["cx", "cy"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", d2.alias("d2"))
            .orderBy("d2", "id_a", "id_b").limit(1)
        )

    probes["closest_pair (3x3 explode equi-join, density-held)"] = (
        closest_pair_probe)

    # Round-14 (VERDICT r13 item 3): the two most expensive headline
    # queries probed as WHOLES, not just their component shapes.
    def band_tuning_probe(n: int) -> None:
        """dedup_band_tuning end-to-end on synthetic docs: does the
        all-configs-in-one-(cfg,band,key)-shuffle claim hold at 30x?
        Doc count scales with n (same n//100 rule as the
        minhash_signatures shape). DENSITY-HELD: the vocabulary scales
        with the doc count (fixed-vocab synth_docs makes shingle
        collisions explode quadratically, saturating the bucket cap —
        the first probe cut measured 0.9x wall at 30x because nearly
        every bucket diverted to the analytic path and the verify join
        vanished; that demonstrates the CAP, not the claimed shuffle
        growth)."""
        from quick_and_easy_vectordb_spark.queries.dedup import (
            band_tuning_table,
        )

        n_docs = n // 100
        vocab = max(5000, n_docs)
        word = lambda i: F.concat(  # noqa: E731
            F.lit("w"),
            F.pmod(F.hash("id", F.lit(i)), F.lit(vocab)).cast("string"),
        )
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[word(i) for i in range(40)]).alias("text"),
        )
        noop(band_tuning_table(docs))

    probes["band_tuning (4 configs, one banded shuffle, whole query)"] = (
        band_tuning_probe)

    def ivf_pq_probe(n: int) -> None:
        """ann_ivf_pq_search end-to-end on a synthetic corpus whose
        CELL COUNT grows as sqrt(vectors) (the Faiss sizing rule), so
        the probe answers the r13 verdict's question directly: with
        nprobe fixed, does the probed fraction shrink as cells grow —
        i.e. does the composite stay at-worst-linear end-to-end while
        the ADC stage itself scales as nprobe * N / cells ~ sqrt(N)?
        Vector count scales as n // 20 (64-dim arrays are ~50x a fact
        row)."""
        import math

        from quick_and_easy_vectordb_spark.queries.ann import (
            ivf_pq_search_df,
        )
        from quick_and_easy_vectordb_spark.queries.common import DIM

        n_vec = n // 20
        cells = max(4, int(math.isqrt(n_vec)))
        emb = spark.range(n_vec).select(
            F.col("id").alias("vec_id"),
            F.pmod(F.hash("id"), F.lit(cells)).alias("label"),
            F.array(
                *[
                    (F.pmod(F.hash("id", F.lit(i)), F.lit(2001)) - 1000)
                    / 1000.0
                    for i in range(DIM)
                ]
            ).alias("embedding"),
        )
        noop(ivf_pq_search_df(emb))

    probes["ivf_pq_search (cells ~ sqrt(N), nprobe fixed, whole query)"] = (
        ivf_pq_probe)

    # Round-14 second wave: the three new data-sized shapes, probed
    # through the extracted df-level plans the registered queries run.

    def _synth_emb(n_vec: int, cells: int = 10) -> DataFrame:
        from quick_and_easy_vectordb_spark.queries.common import DIM

        return spark.range(n_vec).select(
            F.col("id").alias("vec_id"),
            F.pmod(F.hash("id"), F.lit(cells)).alias("label"),
            F.array(
                *[
                    (F.pmod(F.hash("id", F.lit(i)), F.lit(2001)) - 1000)
                    / 1000.0
                    for i in range(DIM)
                ]
            ).alias("embedding"),
        )

    def spann_probe(n: int) -> None:
        """spann_assignments (the data-sized phase of
        ann_spann_multi_assign): per-row distances to the broadcast
        10-centroid list, closure filter, posting explode. Expect
        linear — zero shuffles beyond the O(C*D) centroid build."""
        from quick_and_easy_vectordb_spark.queries.ann import (
            spann_assignments,
        )
        from quick_and_easy_vectordb_spark.queries.common import QUERY_VEC

        noop(spann_assignments(_synth_emb(n // 20), QUERY_VEC))

    probes["spann_multi_assign (broadcast closure, posting explode)"] = (
        spann_probe)

    def gemm_probe(n: int) -> None:
        """vdb_topk_gemm_blocked whole plan: JVM int64 quantization →
        Arrow batch GEMM → batch-local top-k → TakeOrdered merge.
        Expect linear with a small constant — the scan dominates."""
        from quick_and_easy_vectordb_spark.queries.vector import (
            gemm_topk_df,
        )

        noop(gemm_topk_df(_synth_emb(n // 20).select("vec_id", "embedding")))

    probes["gemm_blocked_topk (quantize + Arrow GEMM + merge)"] = gemm_probe

    def bloom_probe(n: int) -> None:
        """udf_bloom_bitwise_udaf whole plan over n//100 docs across 20
        sources: UDAF bloom build (O(sources*4) output), broadcast
        probe (3 positions x 19 foreign blooms per doc), fingerprint
        equi-join for the true-dup audit. Expect linear — probe rows
        grow as docs x const."""
        from quick_and_easy_vectordb_spark.queries.udf_surface import (
            bloom_pair_audit_df,
        )

        docs = spark.range(max(n // 100, 2000)).select(
            F.concat(
                F.lit("src"), F.pmod(F.hash("id"), F.lit(20)).cast("string")
            ).alias("source"),
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("fp"),
        )
        noop(bloom_pair_audit_df(docs, spark))

    probes["bloom_bitwise_udaf (build + cross-source probe + audit)"] = (
        bloom_probe)

    # Optional shape filter: `python tools/scale_probe.py SUBSTR ...`
    # runs only shapes whose name contains any given substring and
    # prints results WITHOUT rewriting SCALING.md (partial tables
    # would clobber the full record).
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    if filters:
        probes = {
            k: v for k, v in probes.items()
            if any(f.lower() in k.lower() for f in filters)
        }
        for name, fn in probes.items():
            fn(BASE_ROWS // 10)
            t1 = timed(lambda: fn(BASE_ROWS))
            ts = [timed(lambda: fn(BASE_ROWS * s)) for s in SCALES]
            ratios = [round(t / t1, 1) if t1 > 0 else float("inf") for t in ts]
            print(f"{name}: {t1}s -> {ts[0]}s ({ratios[0]}x) -> {ts[1]}s ({ratios[1]}x)")
        return

    lines = [
        "# SCALING — measured 1x→10x→30x growth of the core operator shapes",
        "",
        "`python tools/scale_probe.py`: deterministic synthetic data via",
        f"`spark.range` ({BASE_ROWS:,} fact rows / {BASE_DOCS:,} docs at 1x,",
        "scaled 10x and 30x), local[32]. Each point is min-of-2 runs: the",
        "first run at a new size pays one-time JVM costs (heap commit,",
        "shuffle-file allocation) that measured up to 2.8x on identical",
        "plans and would masquerade as superlinear growth — round 4's",
        "single-shot 30x as-of point (28.06s) was mostly this effect",
        "(steady-state is ~11-13s). Ratio <= the scale factor means",
        "at-worst-linear wall-clock growth; well under it means the smaller",
        "run underutilized cores. Superlinear would expose a shape problem",
        "(quadratic join, driver bottleneck, spill) — the 30x point exists",
        "to catch spill thresholds a 10x probe is too small to show.",
        "",
        "Run on an otherwise-idle machine: concurrent Spark jobs inflate",
        "every point and masquerade as superlinear growth (round-5's",
        "contaminated first run measured the Q1 shape at 14.5x vs 6.1x",
        "clean). The capped-LSH shape includes the count-window cap of",
        "operators/dedup.py:lsh_candidate_pairs; the round-5 continuation",
        "adds SQ8 train+score, the blocked kNN-graph, and the",
        "stream-stream interval join; round 6 adds the bitmap distinct",
        "rollup and the hour-partitioned concurrency sweep, and applies",
        "the scaled_shuffle_partitions spill guard to the q21 per-order",
        "aggregation (its 10x->30x segment was 7.1x wall for 3x data",
        "before the guard, sublinear after).",
        "",
        "| operator shape | 1x sec | 10x sec | 30x sec | 10x ratio | 30x ratio |",
        "|---|---|---|---|---|---|",
    ]
    for name, fn in probes.items():
        fn(BASE_ROWS // 10)  # warm codegen per shape
        t1 = timed(lambda: fn(BASE_ROWS))
        ts = [timed(lambda: fn(BASE_ROWS * s)) for s in SCALES]
        ratios = [round(t / t1, 1) if t1 > 0 else float("inf") for t in ts]
        lines.append(
            f"| {name} | {t1} | {ts[0]} | {ts[1]} | {ratios[0]}x | {ratios[1]}x |"
        )
        print(f"{name}: {t1}s -> {ts[0]}s ({ratios[0]}x) -> {ts[1]}s ({ratios[1]}x)")

    lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.md"), "w") as f:
        f.write("\n".join(lines))
    print("SCALING.md written")


if __name__ == "__main__":
    main()
