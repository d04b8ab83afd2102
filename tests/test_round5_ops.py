"""Unit semantics for the round-5 batch-2 operators: sparse-projection
selection, SQ8 quantization edges, aHash bit math, capped-LSH window
path, and inter-arrival gap attribution.

The DuckDB oracle gate (tools/check.py) proves cross-engine equality on
the driver tables; these tests pin the SEMANTIC contracts on hand-sized
inputs where the expected output is computable by eye — the same
two-tier strategy as the reference-parity tests (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_sparse_projection_tiebreak_prefers_lower_pos(spark):
    """Equal |v| at different positions: the comparator keeps ascending
    position order, so the kept set (and hence the score) is stable."""
    df = spark.createDataFrame(
        [(1, [0.5, -0.5, 0.5, -0.5, 0.1, 0.1, 0.1, 0.1, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    pairs = F.transform(
        F.col("embedding"),
        lambda x, i: F.struct(F.abs(x).alias("a"), i.alias("pos"), x.alias("v")),
    )
    cmp = lambda l, r: (  # noqa: E731
        F.when(l.a > r.a, F.lit(-1))
        .when(l.a < r.a, F.lit(1))
        .when(l.pos < r.pos, F.lit(-1))
        .when(l.pos > r.pos, F.lit(1))
        .otherwise(F.lit(0))
    )
    kept = df.select(
        F.transform(F.slice(F.array_sort(pairs, cmp), 1, 6), lambda s: s.pos).alias(
            "pos"
        )
    ).head()["pos"]
    # four 0.5-magnitude dims first (pos order), then 0.1s in pos order.
    assert kept == [0, 1, 2, 3, 4, 5]


def test_sq8_constant_dimension_dequantizes_to_min(spark):
    """span == 0 (constant dimension) must not divide by zero; the
    dequantized value is the dimension's min (== the constant)."""
    df = spark.createDataFrame(
        [(1, [3.0, 1.0]), (2, [3.0, 2.0])], "vec_id long, embedding array<double>"
    )
    mns, spans = [3.0, 1.0], [0.0, 1.0]
    dq = df.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(
                F.element_at(F.lit(spans).cast("array<double>"), i + 1) > 0,
                F.element_at(F.lit(mns).cast("array<double>"), i + 1)
                + (
                    F.least(
                        F.lit(255.0),
                        F.floor(
                            (x - F.element_at(F.lit(mns).cast("array<double>"), i + 1))
                            * F.lit(256.0)
                            / F.element_at(F.lit(spans).cast("array<double>"), i + 1)
                        ),
                    )
                    + F.lit(0.5)
                )
                * F.element_at(F.lit(spans).cast("array<double>"), i + 1)
                / F.lit(256.0),
            ).otherwise(F.element_at(F.lit(mns).cast("array<double>"), i + 1)),
        ).alias("e8"),
    ).orderBy("vec_id")
    rows = dq.collect()
    assert rows[0]["e8"][0] == 3.0 and rows[1]["e8"][0] == 3.0
    # max input of a live dimension clamps to the top bin's midpoint,
    # strictly inside [mn, mx].
    assert 1.0 < rows[1]["e8"][1] < 2.0


def test_phash_bits_half_dark_half_bright():
    """A left-dark / right-bright 16x8 image must hash to 32 zeros then
    32 ones per row-major 8x8 grid: blocks 0-3 below the mean, 4-7
    above, identically in every row."""
    from quick_and_easy_vectordb_spark.operators.multimodal import decode_image

    w, h = 16, 8
    raster = np.zeros((h, w, 3), dtype=np.uint8)
    raster[:, w // 2 :, :] = 200
    payload = b"P6\n%d %d\n255\n" % (w, h) + raster.tobytes()
    img = decode_image(payload).astype(np.int64)
    g3 = img.sum(axis=2)
    ts, tn = int(g3.sum()), 3 * w * h
    bits = []
    for by in range(8):
        y0, y1 = by * h // 8, (by + 1) * h // 8
        for bx in range(8):
            x0, x1 = bx * w // 8, (bx + 1) * w // 8
            s = int(g3[y0:y1, x0:x1].sum())
            npx = 3 * (y1 - y0) * (x1 - x0)
            bits.append("1" if s * tn > ts * npx else "0")
    assert "".join(bits) == ("0000" + "1111") * 8


def test_lsh_cap_drops_hot_bucket_members_before_pairing(spark):
    """A 5-member bucket with cap 3 must contribute zero pairs, while a
    2-member bucket under the same cap still pairs — and the diverted
    bucket appears in lsh_mega_clusters with its min id."""
    from quick_and_easy_vectordb_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_mega_clusters,
        minhash_signatures,
        shingle_table,
    )

    hot = [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)]
    cold = [(10, "one two three four five six"), (11, "one two three four five six")]
    docs = spark.createDataFrame(hot + cold, "doc_id long, text string")
    sh = shingle_table(docs, "text", "doc_id", 3)
    sigs = minhash_signatures(sh, 12)
    pairs = lsh_candidate_pairs(sigs, 12, 4, max_bucket_size=3).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ids == {(10, 11)}
    mega = lsh_mega_clusters(sigs, 12, 4, max_bucket_size=3).collect()
    assert mega and all(r["n_members"] == 5 and r["keep_id"] == 0 for r in mega)


def test_interarrival_gap_attributed_to_later_event(spark):
    """u1: A@0s -> B@10s -> A@40s. Gaps: 10s (to B), 30s (to A).
    The first event has no gap and is excluded."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "A"),
        (2, "2024-01-01 00:00:10", 1, "B"),
        (3, "2024-01-01 00:00:40", 1, "A"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = (
        e.select("event_type", (us - F.lag(us).over(w)).alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .collect()
    )
    got = {(r["event_type"], r["gap_us"]) for r in g}
    assert got == {("B", 10_000_000), ("A", 30_000_000)}


def test_peak_detection_excludes_endpoints_and_plateaus(spark):
    """Series 1,3,2,5,5,1 per type: hour1 (3>1,3>2) is a peak; the
    5,5 plateau is NOT (strict >); endpoints never qualify."""
    rows = []
    counts = [1, 3, 2, 5, 5, 1]
    eid = 0
    for hr, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, f"2024-01-01 {hr:02d}:30:00", 1, "A"))
            eid += 1
    e = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from pyspark.sql import Window

    h = e.groupBy(
        "event_type",
        (F.floor(F.unix_micros("ts") / 3600000000) * 3600)
        .cast("long")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("hr")
    l = h.select(
        "n",
        F.lag("n").over(w).alias("p"),
        F.lead("n").over(w).alias("x"),
    )
    peaks = l.filter(
        F.col("p").isNotNull()
        & F.col("x").isNotNull()
        & (F.col("n") > F.col("p"))
        & (F.col("n") > F.col("x"))
    ).collect()
    assert [r["n"] for r in peaks] == [3]


def test_dayofweek_convention_spark_minus_one_equals_duckdb(spark):
    """2024-01-01 is a Monday: Spark dayofweek=2 (1=Sunday), DuckDB
    dayofweek=1 (0=Sunday) — the -1 shift in ev_weekday_seasonality
    aligns them."""
    import duckdb

    row = (
        spark.createDataFrame([("2024-01-01 12:00:00",)], "ts string")
        .select((F.dayofweek(F.col("ts").cast("timestamp")) - 1).alias("dow"))
        .head()
    )
    dk = duckdb.sql(
        "SELECT dayofweek(TIMESTAMP '2024-01-01 12:00:00')"
    ).fetchone()[0]
    assert row["dow"] == dk == 1
