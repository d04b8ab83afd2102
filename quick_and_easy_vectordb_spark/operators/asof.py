"""As-of join: for each left row, the most recent right row with
``right.ts <= left.ts`` within the same key group.

Spark has no ASOF JOIN operator (DuckDB and kdb+ do), and the naive
formulations melt at scale: a range join ``l.ts >= r.ts`` explodes to
O(|L|·|R|) per key before the "latest" filter, and a per-key
``collect_list`` + UDF serializes whole key groups through Python.

This implementation is the union-and-window technique:

1. union both sides into one relation tagged with origin, aligning
   schemas (left payload nulled on right rows and vice versa);
2. one window partitioned by key, ordered by ts with the default
   ``RANGE UNBOUNDED PRECEDING AND CURRENT ROW`` frame, computing
   ``max(struct(right_ts, right_payload))`` over right-origin rows —
   the running "latest right row so far";
3. keep left-origin rows and unpack the struct.

Cost: ONE shuffle (the window partition-by), sort within partitions,
zero row multiplication. At 100 TB this is the same plan shape as any
keyed window aggregation; skewed keys behave exactly like any skewed
window (mitigate by pre-bucketing hot keys if needed).

Determinism: the RANGE frame includes all ts-peers, and ``max`` over a
struct is order-insensitive (lexicographic by field position, ts
first), so ties resolve identically on any partitioning and any
engine — no dependence on sort stability.

Reference context: the reference app (app.py:1-193) has no join of any
kind; this operator is part of the pipeline extension surface
(SURVEY.md §2b).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quick_and_easy_vectordb_spark.operators.util import scaled_shuffle_partitions

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_s: float | int | None = None,
) -> DataFrame:
    """Left as-of join. Returns every ``left`` row plus:

    - ``<right_ts><suffix>``: with ``direction="backward"`` (default,
      pandas merge_asof semantics) the GREATEST right timestamp <= the
      left row's timestamp within the key group; with
      ``direction="forward"`` the SMALLEST right timestamp >= it
      (null if none either way), and
    - each ``right_payload`` column as ``<name><suffix>``, taken from
      that matched right row (ties on right ts resolved by the
      payload's own ordering, deterministically).

    Forward is the mirrored frame: RANGE CURRENT ROW .. UNBOUNDED
    FOLLOWING with ``min`` instead of the default trailing frame with
    ``max`` — still one shuffle, zero row multiplication.

    Rows with no match keep nulls — filter them out for inner-as-of.

    ``tolerance_s`` (pandas merge_asof's ``tolerance``): a match
    farther than this many seconds (fractional values honored to
    microsecond precision) from the left timestamp is nulled
    out — the staleness bound every feature-serving as-of needs (a
    quote from last week must not price today's trade). Applied as a
    post-window filter on the matched struct, so it adds zero
    shuffles.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = list(right_payload)

    l_cols = [c for c in left.columns if c not in keys]
    matched_struct = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in payload]
    )

    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c).alias(c) for c in l_cols]).alias("__l"),
        F.lit(None).cast(
            right.select(matched_struct.alias("__m")).schema["__m"].dataType
        ).alias("__m"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c).alias(c) for c in l_cols]).alias("__l")
            ).schema["__l"].dataType
        ).alias("__l"),
        matched_struct.alias("__m"),
    )

    # Backward: default frame (RANGE UNBOUNDED PRECEDING .. CURRENT
    # ROW) makes equal-ts right rows visible to the left row — ASOF's
    # `>=`. Forward: the mirrored frame + min picks the earliest
    # following right row, equal-ts rows still visible.
    if direction == "backward":
        w = Window.partitionBy(*keys).orderBy("__t")
        match = F.max("__m").over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__t")
            .rangeBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.min("__m").over(w)
    merged = l_tagged.unionByName(r_tagged)
    # Spill guard (round-5, SCALING.md 30x cliff): the window's sort
    # volume per task is |L∪R| / shuffle.partitions, and the static
    # partition setting is a hard cap (AQE only coalesces below it).
    # When plan stats say the union outgrows that cap, pre-partition by
    # the same keys at a data-proportional width — the window's
    # ClusteredDistribution is satisfied by this exact distribution, so
    # EnsureRequirements inserts NO second exchange: same single
    # shuffle, right width. Measured: 60M+15M rows 35.6s -> ~20s.
    n_parts = scaled_shuffle_partitions(merged)
    if n_parts:
        merged = merged.repartition(n_parts, *keys)
    merged = merged.withColumn("__match", match)
    if tolerance_s is not None:
        # Microsecond-exact gap: unix_timestamp would truncate each
        # side to whole seconds BEFORE subtracting, letting a match up
        # to ~1 s past the stated tolerance survive on sub-second
        # timestamps. unix_micros keeps the full timestamp precision;
        # the bound compares integer micros to integer micros.
        gap = F.abs(
            F.unix_micros(F.col("__t"))
            - F.unix_micros(F.col("__match.__ts"))
        )
        merged = merged.withColumn(
            "__match",
            F.when(gap <= F.lit(int(tolerance_s * 1_000_000)), F.col("__match")),
        )

    out_cols = (
        [F.col(k) for k in keys]
        + [F.col(f"__l.{c}").alias(c) for c in l_cols]
        + [F.col("__match.__ts").alias(f"{right_ts}{suffix}")]
        + [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in payload]
    )
    return merged.filter(F.col("__is_left") == 1).select(*out_cols)
