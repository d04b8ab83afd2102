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

    Convention: an interval is active at instant t iff
    s_us <= t <= e_us, expressed as +1 at s_us and -1 at e_us + 1.
    A synthetic zero-delta point at each hour start makes the
    hour-start instant an explicit sweep row, so
    peak_hour = carry + max(prefix) holds with no boundary special
    cases (including a -1 landing exactly on the boundary, where the
    bare carry value is never attained and must not win the max)."""
    deltas = sess.select(
        F.col("s_us").alias("t"), F.lit(1).alias("d")
    ).unionAll(sess.select((F.col("e_us") + 1).alias("t"), F.lit(-1).alias("d")))
    merged = (
        deltas.withColumn("hr", F.floor(F.col("t") / HOUR_US).cast("long"))
        .groupBy("hr", "t")
        .agg(F.sum("d").alias("d"))
    )
    spans = sess.select(
        F.floor(F.col("s_us") / HOUR_US).cast("long").alias("sh"),
        F.floor(F.col("e_us") / HOUR_US).cast("long").alias("eh"),
    )
    # carry-in: sessions strictly spanning an hour start (bounded
    # explode; Spark's sequence() REVERSES when start > stop, so the
    # empty case must be guarded to null, which explode drops).
    carry = (
        spans.select(
            F.explode(
                F.when(
                    F.col("eh") >= F.col("sh") + 1,
                    F.sequence(F.col("sh") + 1, F.col("eh")),
                )
            ).alias("hr")
        )
        .groupBy("hr")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hours = merged.select("hr").union(carry.select("hr")).distinct()
    synth = hours.select(
        "hr", (F.col("hr") * HOUR_US).alias("t"), F.lit(0).cast("long").alias("d")
    )
    allpts = (
        merged.select("hr", "t", F.col("d").cast("long").alias("d"))
        .unionAll(synth)
        .groupBy("hr", "t")
        .agg(F.sum("d").alias("d"))
    )
    sweep = Window.partitionBy("hr").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hp = (
        allpts.withColumn("pfx", F.sum("d").over(sweep))
        .groupBy("hr")
        .agg(F.max("pfx").alias("mp"))
    )
    peak = hp.join(carry, "hr", "left").select(
        "hr", (F.coalesce(F.col("c"), F.lit(0)) + F.col("mp")).alias("peak_hr")
    )
    return peak.groupBy(
        F.floor(F.col("hr") / 24).cast("long").alias("day")
    ).agg(F.max("peak_hr").cast("long").alias("peak_concurrent"))
