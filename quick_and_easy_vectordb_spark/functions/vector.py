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


def vector_literal_sql(values: Sequence[float]) -> str:
    """The SQL text of a constant ``array<double>``. Literals go
    through CAST('<repr>' AS DOUBLE): repr() is shortest-roundtrip, so
    the parse reproduces the exact binary64 values (the same rule
    operators/ann.py lsh_signature documents — a bare SQL decimal
    literal would parse as DECIMAL and re-round)."""
    return (
        "array("
        + ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in values)
        + ")"
    )


def vector_literal(values: Sequence[float]) -> Column:
    """A constant ``array<double>`` column. Catalyst constant-folds this
    into the projection, which is the distributed analog of broadcasting
    the query vector to every executor (cf. reference app.py:42-45 where
    the query embedding is a Python closure variable). Built by parsing
    ONE SQL string: ``F.array(*[F.lit(v) ...])`` costs dim+1 py4j round
    trips (~2.7 ms each on this class of sandbox, measured round 14)
    for the identical literal array."""
    return F.expr(vector_literal_sql(values))


def _sql_operand(x) -> str | None:
    """SQL text for an operand the single-parse fast path can accept:
    a plain column name, a float sequence (inlined literal array), or
    an explicit SQL fragment wrapped in ``SqlFrag``. Anything else
    (an arbitrary Column object) returns None and takes the
    Column-composition path."""
    if isinstance(x, SqlFrag):
        return x.sql
    if isinstance(x, str) and x.isidentifier():
        # Backtick-quoted (ADVICE r14): a bare name that collides with
        # a SQL keyword or niladic function (current_date, ...) would
        # resolve differently from F.col(name); quoting pins column
        # semantics while keeping the single-parse path.
        return f"`{x}`"
    if isinstance(x, Sequence) and not isinstance(x, str):
        return vector_literal_sql(x)
    return None


class SqlFrag:
    """Marker for a trusted SQL expression fragment passed to the
    vector functions' fast path (e.g. ``SqlFrag("bk.vec")``)."""

    __slots__ = ("sql",)

    def __init__(self, sql: str) -> None:
        self.sql = sql


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


_AS_DOUBLE_SQL = "transform({0}, x -> CAST(x AS DOUBLE))"
# the fold seeds are written 0.0D (double literal): a bare SQL 0.0
# parses as DECIMAL(1,1) and would change the accumulator type
_DOT_SQL = (
    "aggregate(zip_with(" + _AS_DOUBLE_SQL.format("{0}") + ", "
    + _AS_DOUBLE_SQL.format("{1}")
    + ", (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
)
_NORM_SQL = (
    "sqrt(aggregate(" + _AS_DOUBLE_SQL.format("{0}")
    + ", 0.0D, (acc, v) -> acc + v * v))"
)


def dot_product(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """Raw inner product ⟨a,b⟩ — the reference's similarity
    (/root/reference/app.py:45). ``zip_with`` multiplies element-wise,
    ``aggregate`` folds left-to-right with a double accumulator, which
    fixes a deterministic summation order (important for oracle-exact
    comparisons). Name/literal operands take a single-parse SQL path
    (one py4j call instead of ~10 + lambdas — round-14 plan-build
    optimization); Column operands compose the identical expression."""
    sa, sb = _sql_operand(a), _sql_operand(b)
    if sa is not None and sb is not None:
        return F.expr(_DOT_SQL.format(sa, sb))
    a = F.col(a) if isinstance(a, str) else a
    b = vector_literal(b) if not isinstance(b, (Column, str)) else (
        F.col(b) if isinstance(b, str) else b
    )
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm ‖a‖₂."""
    sa = _sql_operand(a)
    if sa is not None:
        return F.expr(_NORM_SQL.format(sa))
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def l2_distance(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """Euclidean distance ‖a−b‖₂."""
    sa, sb = _sql_operand(a), _sql_operand(b)
    if sa is not None and sb is not None:
        return F.expr(
            "sqrt(aggregate(zip_with("
            + _AS_DOUBLE_SQL.format(sa) + ", " + _AS_DOUBLE_SQL.format(sb)
            + ", (x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v))"
        )
    a = F.col(a) if isinstance(a, str) else a
    b = vector_literal(b) if not isinstance(b, (Column, str)) else (
        F.col(b) if isinstance(b, str) else b
    )
    return F.sqrt(
        F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str | Sequence[float]) -> Column:
    """cos(a,b) = ⟨a,b⟩ / (‖a‖·‖b‖). NULL when either norm is 0."""
    sa, sb = _sql_operand(a), _sql_operand(b)
    if sa is not None and sb is not None:
        dot = _DOT_SQL.format(sa, sb)
        na, nb = _NORM_SQL.format(sa), _NORM_SQL.format(sb)
        return F.expr(
            f"CASE WHEN ({na} * {nb}) != 0.0D "
            f"THEN {dot} / ({na} * {nb}) END"
        )
    a = F.col(a) if isinstance(a, str) else a
    b = vector_literal(b) if not isinstance(b, (Column, str)) else (
        F.col(b) if isinstance(b, str) else b
    )
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
