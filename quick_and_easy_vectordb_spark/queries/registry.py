"""Query registry: name → (spark callable, oracle SQL, tags)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QueryDef] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    """Register a named query. ``oracle=None`` marks a genuinely
    non-SQL-expressible op (the driver then records a rows-only check)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {n: q.fn for n, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in QUERIES.items() if q.oracle is not None}
