"""MERGE / upsert: apply a changeset to a keyed table.

The reference's only mutation is an in-memory append with no key
semantics (reference app.py:105-118 — duplicate chunk_ids accumulate
silently). This operator is the engine's keyed-DML surface:

    upsert(target, updates, key) =
        matched rows  -> replaced by the update row (whole row — an
                         update NULL in a non-key column nulls out the
                         target value, SQL MERGE "UPDATE SET *")
        unmatched     -> kept from target
        new keys      -> appended

Implemented as ONE full-outer shuffle join on the key with a
join-hit marker deciding each column (the matched side wins wholesale,
not per-column COALESCE) — the plan a MERGE INTO compiles to. With
Delta/Iceberg the same logical op additionally rewrites only touched
files; on plain parquet, pair it with writers.write_corpus to
materialize the merged snapshot (at scale: partition-align target and
changeset so the join co-locates, and AQE handles changeset skew).

Update columns are internally renamed before the join so a changeset
*derived from the target itself* (the common "fix these rows" case)
never trips Spark's ambiguous-self-join detection.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["upsert"]


def upsert(
    target: DataFrame,
    updates: DataFrame,
    on: str | Sequence[str],
    dedup_order: Sequence | None = None,
) -> DataFrame:
    """Full-outer keyed merge; on a key match the update row wins
    wholesale (including NULLs in non-key columns — SQL MERGE
    "UPDATE SET *" semantics, decided by a join-hit marker rather than
    per-column COALESCE). ``updates`` must carry the same columns as
    ``target``.

    Duplicate keys in ``updates`` fan out to one output row each (a
    full-outer join cannot collapse them); pass ``dedup_order`` (column
    names / Column sort expressions, e.g. ``[F.desc("ts")]``) to keep
    only the first-ranked update row per key before merging."""
    keys = [on] if isinstance(on, str) else list(on)
    missing = set(target.columns) - set(updates.columns)
    if missing:
        raise ValueError(f"updates missing target columns: {sorted(missing)}")

    if dedup_order is not None:
        w = Window.partitionBy(*keys).orderBy(*dedup_order)
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    # Marker lives outside the "__u_{c}" namespace: a target column
    # literally named "hit" would otherwise alias to the same "__u_hit"
    # name and be clobbered by the marker.
    u = updates.select(
        [F.col(c).alias(f"__u_{c}") for c in target.columns]
    ).withColumn("__merge_hit__", F.lit(True))
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__u_{k}").eqNullSafe(F.col(k)) for k in keys],
    )
    return target.join(u, cond, "full_outer").select(
        [
            F.when(F.col("__merge_hit__"), F.col(f"__u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in target.columns
        ]
    )
