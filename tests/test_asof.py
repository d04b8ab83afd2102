"""as-of join edge cases: no-match nulls, equal-ts inclusion, latest-
wins, payload carriage, multi-key grouping."""

from __future__ import annotations

import datetime as dt

from quick_and_easy_vectordb_spark.operators.asof import asof_join


def ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_basic_and_edges(spark):
    left = spark.createDataFrame(
        [
            (1, ts(10), "p1"),   # clicks at 5, 8 → matches 8
            (1, ts(5), "p2"),    # click AT 5 (equal ts) → matches 5
            (1, ts(1), "p3"),    # before any click → null
            (2, ts(10), "p4"),   # user 2 has its own stream → 7
            (3, ts(10), "p5"),   # user 3 has no clicks → null
        ],
        "user_id long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, ts(5), "c5"),
            (1, ts(8), "c8"),
            (2, ts(7), "c7"),
            (2, ts(11), "c11"),  # after every left row → never matched
        ],
        "user_id long, ts timestamp, cid string",
    )
    out = {
        r.pid: (r.ts_click, r.cid_click)
        for r in asof_join(
            left, right, on="user_id", right_payload=["cid"], suffix="_click"
        ).collect()
    }
    assert out["p1"] == (ts(8), "c8")
    assert out["p2"] == (ts(5), "c5")
    assert out["p3"] == (None, None)
    assert out["p4"] == (ts(7), "c7")
    assert out["p5"] == (None, None)


def test_asof_equal_ts_tie_is_deterministic(spark):
    # two right rows at the same ts: max(struct) breaks the tie by the
    # payload ordering — stable under any partitioning.
    left = spark.createDataFrame(
        [(1, ts(5), "p")], "k long, ts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [(1, ts(5), "a"), (1, ts(5), "b")], "k long, ts timestamp, v string"
    )
    rows = asof_join(left, right, on="k", right_payload=["v"]).collect()
    assert len(rows) == 1 and rows[0].v_right == "b"


def test_asof_fractional_tolerance(spark):
    # tolerance_s=0.5 must keep a 400ms-stale match and null a 700ms
    # one — sub-second tolerances are honored to microsecond precision
    # (int(tolerance_s * 1e6), not int(tolerance_s) * 1e6 which would
    # floor 0.5 s to 0 and null every non-exact match).
    base = dt.datetime(2024, 1, 1)
    ms = lambda n: base + dt.timedelta(milliseconds=n)
    left = spark.createDataFrame(
        [(1, ms(1000), "near"), (2, ms(1000), "far")],
        "k long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, ms(600), "c_near"), (2, ms(300), "c_far")],
        "k long, ts timestamp, cid string",
    )
    out = {
        r.pid: r.cid_right
        for r in asof_join(
            left, right, on="k", right_payload=["cid"], tolerance_s=0.5
        ).collect()
    }
    assert out == {"near": "c_near", "far": None}


def test_asof_row_count_preserved(spark):
    # left as-of join never drops or multiplies left rows
    left = spark.createDataFrame(
        [(i % 3, ts(i), f"p{i}") for i in range(30)],
        "k long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(i % 3, ts(i * 2), f"c{i}") for i in range(10)],
        "k long, ts timestamp, cid string",
    )
    assert asof_join(left, right, on="k").count() == 30
