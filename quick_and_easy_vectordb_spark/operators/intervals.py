"""Interval analytics: gap-based sessionization into [start, end]
intervals and a partitioned sweep-line for peak concurrency.

The sweep avoids Spark's worst sequential trap — a single global
order-by-time running sum — by decomposing time into fixed buckets
(hours): each bucket runs an independent prefix-sum sweep over its own
delta points, and sessions alive across a bucket boundary contribute a
carry-in count computed with a bounded explode over the buckets they
span. Peaks aggregate exactly to any coarser granularity because every
instant belongs to exactly one bucket. The same two-level decomposition
(in-partition scan + carried offset) is the textbook parallel prefix
sum; if one bucket is still too hot, recurse to minutes.

Reference parity note: the reference app (app.py:1-193) has no
event-time operators at all; this module is part of the mandated
100 TB-pipeline extension surface (SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000


def sessionize_intervals(
    ev: DataFrame,
    user_col: str = "user_id",
    us_col: str = "us",
    order_col: str = "event_id",
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """(user, session) → [s_us, e_us] intervals via the standard
    lag → new-session flag → running-sum pattern. One shuffle keyed
    on the user column.

    The window's per-task sort is the spill cliff at scale (the same
    cliff q21's per-order aggregate and the as-of join hit): a static
    shuffle-partition count means N/partitions rows sorted per task.
    scaled_shuffle_partitions derives a data-proportional count from
    plan stats; the explicit repartition on the window's own key is
    then REUSED by the window (no extra exchange)."""
    from quick_and_easy_vectordb_spark.operators.util import (
        scaled_shuffle_partitions,
    )

    n_parts = scaled_shuffle_partitions(ev, target_bytes=8 << 20)
    if n_parts:
        ev = ev.repartition(n_parts, user_col)
    order = Window.partitionBy(user_col).orderBy(us_col, order_col)
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag(us_col).over(order).isNull()
            | ((F.col(us_col) - F.lag(us_col).over(order)) > gap_us),
            1,
        ).otherwise(0),
    )
    run_w = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        flagged.withColumn("sid", F.sum("new_s").over(run_w))
        .groupBy(user_col, "sid")
        .agg(F.min(us_col).alias("s_us"), F.max(us_col).alias("e_us"))
    )


def peak_concurrency_daily(sess: DataFrame) -> DataFrame:
    """(day, peak_concurrent): maximum number of simultaneously-open
    [s_us, e_us] intervals per calendar day, exact.

    CLIPPING formulation: an interval is active at instant t iff
    s_us <= t <= e_us. Each session is clipped to every hour it spans
    (a bounded explode): per (session, hour), a +1 delta at
    max(s_us, hour_start) and a -1 at e_us + 1 kept only when it
    falls INSIDE the hour. A session covering an entire hour is then
    a bare +1 at the hour start, so per-hour
    peak = max(prefix sums) with NO separate carry-in table — the
    carry is encoded as ordinary deltas at the boundary instant.

    Why clipping instead of carry + in-hour sweep (the first-cut
    design): (a) the carry set "active at hour start" is subtly NOT
    the prefix of deltas before the hour — a session ending at
    exactly hour_start - 1us puts its -1 at hour_start (in-hour)
    while the carry excludes its +1, undercounting every instant of
    that hour by one (tests/test_intervals.py pins the corner);
    (b) carry needed a second and third traversal of the sessions
    relation, which the optimizer recomputes (no reusable exchange),
    tripling the sessionize work — clipping consumes sessions exactly
    ONCE, so the plan is a single linear chain."""
    h0 = F.floor(F.col("s_us") / HOUR_US).cast("long")
    h1 = F.floor(F.col("e_us") / HOUR_US).cast("long")
    per_hour = sess.select(
        F.col("s_us"),
        F.col("e_us"),
        F.explode(F.sequence(h0, h1)).alias("hr"),
    )
    end_in_hour = (F.col("e_us") + 1) < (F.col("hr") + 1) * HOUR_US
    start_pt = F.struct(
        F.greatest(F.col("s_us"), F.col("hr") * HOUR_US).alias("t"),
        F.lit(1).cast("long").alias("d"),
    )
    end_pt = F.struct(
        (F.col("e_us") + 1).alias("t"), F.lit(-1).cast("long").alias("d")
    )
    pts = per_hour.select(
        "hr",
        F.explode(
            F.when(end_in_hour, F.array(start_pt, end_pt)).otherwise(
                F.array(start_pt)
            )
        ).alias("p"),
    ).select("hr", F.col("p.t").alias("t"), F.col("p.d").alias("d"))
    merged = pts.groupBy("hr", "t").agg(F.sum("d").alias("d"))
    sweep = Window.partitionBy("hr").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hp = (
        merged.withColumn("pfx", F.sum("d").over(sweep))
        .groupBy("hr")
        .agg(F.max("pfx").alias("peak_hr"))
    )
    return hp.groupBy(
        F.floor(F.col("hr") / 24).cast("long").alias("day")
    ).agg(F.max("peak_hr").cast("long").alias("peak_concurrent"))
