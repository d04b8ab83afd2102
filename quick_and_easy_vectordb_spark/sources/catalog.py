"""Table catalog over the driver's parquet star schema.

``load_table(spark, sf_dir, name)`` is the single entry point every
query uses; it returns a lazy DataFrame straight off the parquet scan so
Catalyst can push filters and prune columns into the file source (the
dominant win at 100 TB — e.g. a query that never touches ``embedding``
must not read the ~0.3 KB/row vector payload).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table. No caching, no collect — the
    optimizer sees the raw file source.

    ``events.ts`` has shipped in two physical encodings across fixture
    generations, and both are normalized here to a session-tz
    TimestampType (session tz is pinned to UTC in session.py, so the
    cast is a pure type change, never a wall-clock shift):

    * parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects it,
      so it is read as raw nanos (legacy ``nanosAsLong`` conf, set here
      at runtime so any caller session works) and floored to micros,
      the same truncation DuckDB applies to TIMESTAMP_NS;
    * parquet timestamp[us] with isAdjustedToUTC=false — Spark reads it
      as TIMESTAMP_NTZ, which functions like ``unix_micros`` reject;
      cast to TimestampType.

    Downstream code can therefore always assume ``ts`` is a plain
    TIMESTAMP in UTC."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    # Uniform invariant for EVERY table: temporal columns are session-tz
    # TIMESTAMP (session tz pinned UTC). The fixtures currently ship
    # orders.o_orderdate / lineitem.l_shipdate / events.ts as NTZ —
    # date-function queries tolerate NTZ, but epoch accessors
    # (unix_micros/unix_timestamp) throw on it, which is exactly how the
    # round-3 fixture drift broke 8 queries. Normalizing here makes the
    # whole engine independent of the writer's isAdjustedToUTC choice.
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view so ``spark.sql`` queries can
    reference them by name (mirrors the driver's DuckDB view setup)."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
