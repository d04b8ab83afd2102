"""Numeric aggregation helpers with deterministic, order-independent results.

Double addition is not associative, so a plain ``SUM(double)`` differs
in the last ulp between engines (and between runs, as partitioning
changes). For results that must be *bit-stable* across any partitioning
— and hash-comparable against an external oracle — we sum in fixed-point
decimal (exact, associative) and cast the final total back to double
(a single correctly-rounded conversion, identical everywhere).

At scale this costs one int128 add per row instead of one double add —
negligible against scan cost — and buys run-to-run reproducibility at
any cluster size, which is also why the benchmark queries use it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits is Spark's decimal max; scale 10 keeps ~1e-10 absolute
# precision while leaving 28 integer digits of headroom for 100T-row sums.
_DEC = "decimal(30,10)"

__all__ = ["dsum", "davg"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    return F.sum(_c(col).cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, both
    sides converted to double before the (deterministic) division."""
    c = _c(col)
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)
