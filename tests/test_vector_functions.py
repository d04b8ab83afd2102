"""Unit tests for functions/vector.py against the hand-computed
FIXTURES.md §A values (reference semantics: raw dot product, not
cosine — /root/reference/app.py:45)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
    parse_vector,
    vector_literal,
    vector_to_csv,
)
from tests.conftest import QUERY4


def scores(chunks, col):
    rows = chunks.select("chunk_id", col.alias("s")).collect()
    return {r.chunk_id: r.s for r in rows}


def test_dot_product_reference_values(chunks):
    s = scores(chunks, dot_product("vector_embedding", vector_literal(QUERY4)))
    assert s[1] == 1.0 and s[2] == 0.5 and s[3] == 0.75 and s[4] == 1.75
    assert s[5] == 1.0  # tie with chunk 1


def test_dot_is_symmetric(chunks):
    q = vector_literal(QUERY4)
    a = scores(chunks, dot_product("vector_embedding", q))
    b = scores(chunks, dot_product(q, F.col("vector_embedding")))
    assert a == b


def test_l2_norm_and_distance(chunks):
    n = scores(chunks, l2_norm("vector_embedding"))
    assert n[4] == 2.0 and n[1] == 1.0
    d = scores(chunks, l2_distance("vector_embedding", vector_literal([0.0, 0.0, 0.0, 0.0])))
    assert d[4] == 2.0 and d[6] == 4.0


def test_cosine_range_and_nulls(chunks, spark):
    c = scores(chunks, cosine_similarity("vector_embedding", vector_literal(QUERY4)))
    assert all(-1.0 - 1e-12 <= v <= 1.0 + 1e-12 for v in c.values())
    # zero vector → NULL, not div-by-zero
    z = spark.createDataFrame([([0.0, 0.0],)], "v array<double>")
    row = z.select(cosine_similarity("v", vector_literal([1.0, 0.0])).alias("c")).first()
    assert row.c is None


def test_parse_roundtrip_and_malformed(spark):
    df = spark.createDataFrame([("0.1, 0.25 ,3",), ("1,x,3",)], "s string")
    out = [r.v for r in df.select(parse_vector("s").alias("v")).collect()]
    assert out[0] == [0.1, 0.25, 3.0]
    assert out[1] == [1.0, None, 3.0]  # malformed element surfaces as NULL


def test_vector_to_csv_roundtrip(chunks):
    rt = chunks.select(
        "chunk_id",
        parse_vector(vector_to_csv("vector_embedding")).alias("v"),
        "vector_embedding",
    ).collect()
    for r in rt:
        assert r.v == r.vector_embedding


def test_cosine_matches_math(chunks):
    c = scores(chunks, cosine_similarity("vector_embedding", vector_literal(QUERY4)))
    qn = math.sqrt(sum(x * x for x in QUERY4))
    assert abs(c[3] - (0.75 / (math.sqrt(0.5) * qn))) < 1e-12
