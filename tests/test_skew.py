"""Salted-join equivalence tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed fact: key 1 holds 80% of rows
    fact = spark.createDataFrame(
        [(i, 1 if i % 5 != 0 else i % 3) for i in range(200)],
        "row_id long, k long",
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, v string")
    got = sorted(
        (r.row_id, r.v)
        for r in salted_join(fact, dim, "k", num_salts=4, salt_src="row_id").collect()
    )
    want = sorted((r.row_id, r.v) for r in fact.join(dim, "k").collect())
    assert got == want and len(want) == 200


def test_salted_left_join_preserves_fact_rows(spark):
    fact = spark.createDataFrame([(1, 10), (2, 99)], "row_id long, k long")
    dim = spark.createDataFrame([(10, "x")], "k long, v string")
    rows = {r.row_id: r.v
            for r in salted_join(fact, dim, "k", 4, "row_id", how="left").collect()}
    assert rows == {1: "x", 2: None}


def test_salted_join_rejects_right_join(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="right")
