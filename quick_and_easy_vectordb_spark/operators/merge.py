"""MERGE / upsert: apply a changeset to a keyed table.

The reference's only mutation is an in-memory append with no key
semantics (reference app.py:105-118 — duplicate chunk_ids accumulate
silently). This operator is the engine's keyed-DML surface:

    upsert(target, updates, key) =
        matched rows  -> replaced by the update row
        unmatched     -> kept from target
        new keys      -> appended

Implemented as ONE full-outer shuffle join on the key with per-column
COALESCE — the plan a MERGE INTO compiles to on any SQL engine. With
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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["upsert"]


def upsert(
    target: DataFrame,
    updates: DataFrame,
    on: str | Sequence[str],
) -> DataFrame:
    """Full-outer keyed merge; update wins per column via COALESCE.
    ``updates`` must carry the same columns as ``target``."""
    keys = [on] if isinstance(on, str) else list(on)
    missing = set(target.columns) - set(updates.columns)
    if missing:
        raise ValueError(f"updates missing target columns: {sorted(missing)}")

    u = updates.select(
        [F.col(c).alias(f"__u_{c}") for c in target.columns]
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__u_{k}").eqNullSafe(F.col(k)) for k in keys],
    )
    return target.join(u, cond, "full_outer").select(
        [
            F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c)
            for c in target.columns
        ]
    )
