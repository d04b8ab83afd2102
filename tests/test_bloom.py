"""Bloom runtime-filter operator (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)


def test_no_false_negatives(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k")
    hits = (
        keys.join(F.broadcast(words))
        .filter(bloom_might_contain(F.col("words"), F.col("k")))
        .count()
    )
    assert hits == 500  # every inserted key must test positive


def test_false_positive_rate_small(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    words = bloom_build(keys, "k")
    # Probe 10k keys known to be absent.
    absent = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    fp = (
        absent.join(F.broadcast(words))
        .filter(bloom_might_contain(F.col("words"), F.col("k")))
        .count()
    )
    # fp ≈ (1 - e^(-3*1000/65536))^3 ≈ 8e-5 → expect ~1 of 10k; allow 50x.
    assert fp <= 50


def test_word_array_shape(spark):
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    row = bloom_build(keys, "k", m_bits=1 << 10).collect()[0]
    assert len(row["words"]) == (1 << 10) // 64
    assert all(isinstance(w, int) for w in row["words"])


def test_semi_join_matches_plain_semi_join(spark):
    fact = spark.range(0, 5000).select(
        F.col("id").alias("fk"), (F.col("id") % 7).alias("payload")
    )
    dim = spark.range(0, 5000).filter(F.col("id") % 13 == 0).select(
        F.col("id").alias("dk")
    )
    got = (
        bloom_semi_join(fact, dim, "fk", "dk")
        .orderBy("fk")
        .collect()
    )
    want = (
        fact.join(dim.withColumnRenamed("dk", "fk"), "fk", "left_semi")
        .orderBy("fk")
        .collect()
    )
    assert got == want


def test_build_rejects_non_word_multiple(spark):
    keys = spark.range(0, 4).select(F.col("id").alias("k"))
    try:
        bloom_build(keys, "k", m_bits=100)
    except ValueError as e:
        assert "multiple of 64" in str(e)
    else:
        raise AssertionError("expected ValueError")
