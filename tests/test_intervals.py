"""Unit contracts for operators/intervals.py — in particular the
hour-boundary corner that motivated the clipping formulation: a
session ending at exactly hour_start - 1us must not suppress the next
hour's concurrency (the retired carry-in design put that session's -1
inside the next hour while excluding its +1 from the carry,
undercounting every instant of the hour by one)."""

from __future__ import annotations

from quick_and_easy_vectordb_spark.operators.intervals import (
    HOUR_US,
    peak_concurrency_daily,
    sessionize_intervals,
)

H = HOUR_US


def _peaks(spark, sessions):
    df = spark.createDataFrame(sessions, "s_us long, e_us long")
    return {
        r["day"]: r["peak_concurrent"]
        for r in peak_concurrency_daily(df).collect()
    }


def test_boundary_ending_session_does_not_undercount(spark):
    """Session A ends at the last microsecond of hour 0; B and C
    overlap in hour 1. True hour-1 peak is 2 — the carry-in
    formulation reported 1 (A's dangling -1 at t=H cancelled B's +1)."""
    peaks = _peaks(
        spark,
        [(0, H - 1), (H, H + 10), (H + 5, H + 20)],
    )
    assert peaks == {0: 2}


def test_full_hour_coverage_carries_as_boundary_delta(spark):
    """A session spanning whole hours must count in every spanned
    hour (clipped +1 at each hour start, no -1 until its final
    hour)."""
    peaks = _peaks(spark, [(0, 3 * H + 5), (H + 1, H + 2)])
    # hour 1 holds both sessions simultaneously
    assert peaks == {0: 2}


def test_instantaneous_session_counts(spark):
    """A zero-length session (single event) is active at its single
    instant."""
    peaks = _peaks(spark, [(5, 5)])
    assert peaks == {0: 1}


def test_disjoint_days(spark):
    day = 24 * H
    peaks = _peaks(spark, [(0, 10), (day + 1, day + 2), (day + 1, day + 5)])
    assert peaks == {0: 1, 1: 2}


def test_sessionize_gap_semantics(spark):
    """Events 30min+1us apart split sessions; exactly 30min apart do
    not (strict > gap)."""
    gap = 1_800_000_000
    ev = spark.createDataFrame(
        [
            (1, 1, 0),
            (1, 2, gap),          # exactly gap later -> same session
            (1, 3, 2 * gap + 1),  # gap+1 later -> new session
        ],
        "user_id long, event_id long, us long",
    )
    sess = sorted(
        (r["s_us"], r["e_us"]) for r in sessionize_intervals(ev).collect()
    )
    assert sess == [(0, gap), (2 * gap + 1, 2 * gap + 1)]
