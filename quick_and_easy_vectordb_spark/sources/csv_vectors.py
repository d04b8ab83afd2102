"""Reference-format CSV vector ingest (the `chunks` table).

Parity with the reference's loader (/root/reference/app.py:51-58) and
its startup bootstrap (app.py:64-73):

- wire format: header + quoted comma-separated vector field —
  ``1,doc1,"some text","0.1,0.2,0.3"``. This is the format that
  *actually parses* in the reference; its in-app documented unquoted
  format does not (SURVEY.md §1.4.4), so we accept the quoted form.
- vector elements are parsed to ``double`` (the reference's
  ``np.fromstring`` default, app.py:56); malformed elements surface as
  NULLs rather than being silently dropped (deliberate fix of
  SURVEY.md §1.4.5).
- duplicate ``chunk_id`` is permitted (the reference never enforces
  uniqueness, app.py:102-118); dedup is an explicit operator.

Scale note: ``spark.read.csv`` with an explicit schema is splittable and
distributed; the vector parse is a codegen'd ``transform(split(...))``
projection, so ingest parallelizes across the cluster with zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quick_and_easy_vectordb_spark.functions.vector import parse_vector, vector_to_csv

# The reference's 4-column contract (/root/reference/app.py:73).
CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.LongType()),
        T.StructField("document_id", T.StringType()),
        T.StructField("chunk_text", T.StringType()),
        T.StructField("vector_embedding", T.ArrayType(T.DoubleType())),
    ]
)

_RAW_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.LongType()),
        T.StructField("document_id", T.StringType()),
        T.StructField("chunk_text", T.StringType()),
        T.StructField("vector_embedding", T.StringType()),
    ]
)


def empty_chunks(spark: SparkSession) -> DataFrame:
    """Empty 4-column chunks table — the reference's cold-start state
    (app.py:70-73)."""
    return spark.createDataFrame([], CHUNKS_SCHEMA)


def read_chunks_csv(spark: SparkSession, path: str) -> DataFrame:
    """Load a chunks CSV (quoted-vector wire format) → typed DataFrame."""
    raw = (
        spark.read.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .schema(_RAW_SCHEMA)
        .csv(path)
    )
    return raw.withColumn("vector_embedding", parse_vector("vector_embedding"))


def write_chunks_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist a chunks DataFrame back to the CSV wire format — the sink
    the reference lacks entirely (its appends die with the session,
    app.py:118)."""
    (
        df.withColumn("vector_embedding", vector_to_csv("vector_embedding"))
        .write.option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .mode(mode)
        .csv(path)
    )
