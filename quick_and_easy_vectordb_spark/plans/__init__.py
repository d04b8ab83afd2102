"""Physical-plan inspection and regression checks."""

from quick_and_easy_vectordb_spark.plans.inspect import (
    assert_plan,
    broadcast_join_count,
    formatted_plan,
    has_pushed_filters,
    is_top_k,
    pruned_columns,
    shuffle_count,
)

__all__ = [
    "assert_plan",
    "broadcast_join_count",
    "formatted_plan",
    "has_pushed_filters",
    "is_top_k",
    "pruned_columns",
    "shuffle_count",
]
