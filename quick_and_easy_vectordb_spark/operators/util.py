"""Operator-level utilities."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

# Treat absurd plan-stat estimates (missing stats degrade to multi-PB
# placeholders) as unknown rather than requesting millions of partitions.
_STATS_UNKNOWN_BYTES = 1 << 50

# ensure_parallelism fallback memo: semanticHash -> scan partition
# count (perf-only; see the comment inside ensure_parallelism).
_PARTN_MEMO: dict[int, int] = {}


def scaled_shuffle_partitions(
    df: DataFrame,
    target_bytes: int = 16 << 20,
    max_partitions: int = 4096,
) -> int | None:
    """Partition count proportional to ``df``'s optimizer-estimated
    size: ceil(sizeInBytes / target_bytes), floored at the session's
    ``spark.sql.shuffle.partitions`` and capped at ``max_partitions``.

    Why: a fixed shuffle-partition count is a spill cliff. A window or
    aggregation over N rows sorts N/partitions rows per task; once that
    outgrows per-task execution memory, wall-clock jumps ~3x from sort
    spill (measured warm on the as-of shape at 75M union rows: 12.7s at
    32 partitions vs 10.5s at 64+, flat through 256 — part of the
    round-4 SCALING.md 30x cliff; the rest was first-big-run JVM
    warmup, see tools/scale_probe.py). AQE only ever COALESCES below
    the static setting, so the static number is a hard cap; this
    derives a data-proportional count from plan statistics instead
    (free at plan time — no job). ``target_bytes`` is deliberately
    small relative to task memory because optimizer row-width estimates
    undercount the in-memory sort footprint ~2-4x. Returns ``None``
    when the estimate is unavailable or degenerate, or when the default
    already suffices — callers then skip the explicit repartition.
    """
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — stats are best-effort
        return None
    if size <= 0 or size >= _STATS_UNKNOWN_BYTES:
        return None
    default = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    n = min(max_partitions, math.ceil(size / target_bytes))
    return n if n > default else None


def carry_splits(src: DataFrame, derived: DataFrame) -> DataFrame:
    """Propagate the catalog's scan-split estimate from ``src`` onto a
    NARROW derivation of it (select/filter/withColumn — transforms that
    cannot change the scan's partition count), so a following
    ``ensure_parallelism`` keeps the RDD-free fast path. Returns
    ``derived``."""
    n = getattr(src, "_qev_scan_splits", None)
    if n is not None:
        derived._qev_scan_splits = n
    return derived


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a DataFrame up to the cluster's default
    parallelism if it currently has fewer partitions.

    Why: a small parquet table arrives as a single input split, so a
    CPU-heavy projection chain (md5 shingling, signature computation)
    would run on ONE core no matter how many the cluster has. At 100 TB
    the scan naturally has thousands of splits and this is a no-op
    (never repartitions downward); on small inputs it buys full CPU
    fan-out for one tiny shuffle of the input rows.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # Fast path (round-15): load_table stamps its analytic split-count
    # estimate on the DataFrame (catalog._scan_splits — Spark's own
    # file-split formula, pure Python; carry_splits propagates it over
    # narrow derivations). Falling back to df.rdd costs a plan-time RDD
    # conversion (~30 ms/call measured on this sandbox's py4j) — real
    # serial driver time at ~60 call sites (guide §1.2). For fallback
    # sites the count is memoized per semanticHash: repeat plan builds
    # (bench repeats, sweep re-runs) skip the conversion. Stale or
    # hash-colliding memo entries can only flip the repartition
    # DECISION — never rows — and the memo is bounded.
    current = getattr(df, "_qev_scan_splits", None)
    if current is None:
        key = None
        try:
            key = df.semanticHash()
        except Exception:  # noqa: BLE001 — memo is best-effort
            pass
        current = _PARTN_MEMO.get(key) if key is not None else None
        if current is None:
            current = df.rdd.getNumPartitions()
            if key is not None:
                if len(_PARTN_MEMO) >= 512:
                    _PARTN_MEMO.clear()
                _PARTN_MEMO[key] = current
    if current < target:
        return df.repartition(target)
    return df
