"""Physical-plan inspection: make the OPTIMIZED PLAN a tested artifact.

At 100 TB the difference between "the filter reached the parquet
scan" and "the filter ran after a full read" is the difference between
seconds and hours — and nothing in a green correctness suite catches
the regression. These helpers parse `df.explain("formatted")` output
so tests can pin the plan properties that matter at scale:

- predicate pushdown reached the file source (`PushedFilters`),
- column pruning happened (`ReadSchema` excludes the ~6 KB/row
  embedding payload when it isn't scored),
- a small dim side actually broadcast (`BroadcastHashJoin` /
  `BroadcastNestedLoopJoin`),
- top-k planned as `TakeOrderedAndProject` (distributed heap take),
  never a global `Sort` + `Limit`,
- the shuffle (`Exchange`) count is what the operator promises.

The plan string format is Spark-version-sensitive; these checks use
coarse substring/regex matching on stable physical-operator names, not
exact plan text (which would make every Spark upgrade a test failure).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "has_pushed_filters",
    "pruned_columns",
    "shuffle_count",
    "broadcast_join_count",
    "is_top_k",
    "assert_plan",
]


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (what
    ``df.explain('formatted')`` prints)."""
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)  # type: ignore[attr-defined]


def has_pushed_filters(df: DataFrame, *columns: str) -> bool:
    """True iff the plan's file scans report a non-empty
    ``PushedFilters`` mentioning every given column (any column if
    none given)."""
    plan = formatted_plan(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
    blob = " ".join(p for p in pushed if p.strip())
    if not blob:
        return False
    return all(c in blob for c in columns)


def pruned_columns(df: DataFrame) -> set[str]:
    """Union of column names appearing in any scan's ``ReadSchema`` —
    i.e. what is actually read off disk."""
    plan = formatted_plan(df)
    cols: set[str] = set()
    for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        for field in schema.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def shuffle_count(df: DataFrame) -> int:
    """Number of distinct Exchange operators in the physical plan
    (AQE may later coalesce partitions but not remove the exchange)."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\s*\(\d+\)\s+Exchange", plan, re.MULTILINE))


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins (hash or nested-loop) in the plan."""
    plan = formatted_plan(df)
    return len(
        re.findall(
            r"^\s*\(\d+\)\s+Broadcast(Hash|NestedLoop)Join", plan, re.MULTILINE
        )
    )


def is_top_k(df: DataFrame) -> bool:
    """True iff the ORDER BY .. LIMIT planned as TakeOrderedAndProject
    (per-partition heap + single reduce) rather than a global sort."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def assert_plan(
    df: DataFrame,
    *,
    pushed_filters: tuple[str, ...] | None = None,
    reads_only: set[str] | None = None,
    not_read: set[str] | None = None,
    max_shuffles: int | None = None,
    min_broadcast_joins: int | None = None,
    top_k: bool | None = None,
) -> None:
    """Assert several plan properties at once with readable errors."""
    if pushed_filters is not None and not has_pushed_filters(df, *pushed_filters):
        raise AssertionError(
            f"expected PushedFilters on {pushed_filters}, plan:\n{formatted_plan(df)}"
        )
    if reads_only is not None:
        extra = pruned_columns(df) - reads_only
        if extra:
            raise AssertionError(f"scan reads unexpected columns {extra}")
    if not_read is not None:
        bad = pruned_columns(df) & not_read
        if bad:
            raise AssertionError(f"scan reads columns that must be pruned: {bad}")
    if max_shuffles is not None and shuffle_count(df) > max_shuffles:
        raise AssertionError(
            f"{shuffle_count(df)} shuffles > allowed {max_shuffles}:\n"
            f"{formatted_plan(df)}"
        )
    if min_broadcast_joins is not None and broadcast_join_count(df) < min_broadcast_joins:
        raise AssertionError(
            f"expected >= {min_broadcast_joins} broadcast joins, got "
            f"{broadcast_join_count(df)}"
        )
    if top_k is not None and is_top_k(df) != top_k:
        raise AssertionError(
            f"expected top_k={top_k}; plan:\n{formatted_plan(df)}"
        )
