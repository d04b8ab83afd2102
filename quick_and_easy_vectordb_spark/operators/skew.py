"""Skew-resistant join: salting for hot keys.

A shuffle join keyed on a skewed column sends every row of a hot key
to ONE reducer — a single straggler task the size of the hot key, no
matter how many executors exist. AQE's skew-join splitting handles
sort-merge cases after the fact; salting handles it by construction,
and also covers aggregations and the broadcast-too-big middle ground:

    fact side : key -> (key, salt = hash(row) % R)
    dim side  : each row replicated R times, one per salt value
    join on (key, salt): the hot key's rows spread over R reducers.

Cost: the dim side grows R-fold (keep R modest and the dim small —
exactly when skew hurts most: big skewed fact × small dim). Results
are identical to the plain join; the salt never escapes.

The same two-phase trick for aggregations is
queries/events.py:ev_heavy_hitters_salted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 8,
    salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with ``num_salts``-way salt
    spreading. ``salt_src`` names a fact column whose hash picks the
    salt (defaults to the join key's own row spread via all columns —
    pass an id column for determinism in tests). Join type is inner or
    left (fact-preserving)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left fact-side joins")
    salt = (
        F.pmod(F.hash(F.col(salt_src)), F.lit(num_salts))
        if salt_src
        else F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(num_salts))
    )
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = f.join(d, [on, "__salt"], how)
    return out.drop("__salt")
