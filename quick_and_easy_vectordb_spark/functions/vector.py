"""Vector algebra as Catalyst higher-order functions.

Re-expresses the reference's numpy kernels as JVM-side expressions:

- raw dot product  — parity with ``np.dot(stored, query)``
  (/root/reference/app.py:45; NOT cosine — the reference never
  normalizes, see SURVEY.md §1.4.2)
- CSV vector parse — parity with ``np.fromstring(x, sep=',')``
  (/root/reference/app.py:56), but strict: malformed elements become
  NULL instead of being silently truncated
- cosine / L2      — the standard variants the reference lacks

All functions operate on ``array<double>`` (or ``array<float>``, which
Spark happily feeds into double arithmetic via the lambda casts) and
compile into whole-stage-codegen'd ``transform``/``zip_with``/
``aggregate`` expressions — no Python in the hot path, no UDF
serialization, fully columnar under Parquet + Tungsten.

Scale note: per-row O(d) arithmetic inside codegen is embarrassingly
parallel and shuffle-free; at 100 TB the only cost that matters is the
scan itself, which is why callers must select only the vector + key
columns they need (column pruning keeps the ~0.5 KB/row vector payload
out of queries that don't score).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "vector_literal",
    "dot_product",
    "l2_norm",
    "l2_distance",
    "cosine_similarity",
    "parse_vector",
    "vector_to_csv",
]


def vector_literal(values: Sequence[float]) -> Column:
    """A constant ``array<double>`` column. Catalyst constant-folds this
    into the projection, which is the distributed analog of broadcasting
    the query vector to every executor (cf. reference app.py:42-45 where
    the query embedding is a Python closure variable)."""
    return F.array(*[F.lit(float(v)) for v in values])


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Raw inner product ⟨a,b⟩ — the reference's similarity
    (/root/reference/app.py:45). ``zip_with`` multiplies element-wise,
    ``aggregate`` folds left-to-right with a double accumulator, which
    fixes a deterministic summation order (important for oracle-exact
    comparisons)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm ‖a‖₂."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance ‖a−b‖₂."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = ⟨a,b⟩ / (‖a‖·‖b‖). NULL when either norm is 0."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)


def parse_vector(col: Column | str) -> Column:
    """Parse ``"0.1,0.2,0.3"`` → ``array<double>``.

    Parity with the reference CSV loader (/root/reference/app.py:56,
    ``np.fromstring(sep=',')``) with one deliberate fix: where
    ``np.fromstring`` silently truncates on a malformed tail
    (SURVEY.md §1.4.5), a malformed element here becomes NULL so bad
    input is *visible* (callers may filter or assert). ``try_cast``
    (not ``cast``) so ANSI mode yields NULL instead of failing the
    whole job on one bad element."""
    col = F.col(col) if isinstance(col, str) else col
    return F.transform(F.split(col, ","), lambda x: F.trim(x).try_cast("double"))


def vector_to_csv(col: Column | str, precision: int | None = None) -> Column:
    """Serialize ``array<numeric>`` → ``"0.1,0.2,..."`` (inverse of
    :func:`parse_vector`; matches the reference's working quoted-CSV wire
    format, SURVEY.md §1.4.4). ``precision`` rounds each element first
    — via ``F.round``, NOT ``format_number``, whose grouping separators
    ("1,234.57") would corrupt the comma-delimited wire format."""
    col = F.col(col) if isinstance(col, str) else col
    elems = (
        F.transform(
            col, lambda x: F.round(x.cast("double"), precision).cast("string")
        )
        if precision is not None
        else F.transform(col, lambda x: x.cast("double").cast("string"))
    )
    return F.array_join(elems, ",")
