"""Deterministic sampling/split tests."""

from __future__ import annotations

from quick_and_easy_vectordb_spark.operators.sampling import (
    deterministic_split,
    stratified_hash_sample,
)


def corpus(spark):
    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_split_reproducible_and_partition_independent(spark):
    df = corpus(spark)
    a = {r.doc_id: r.split for r in deterministic_split(df).collect()}
    b = {r.doc_id: r.split
         for r in deterministic_split(df.repartition(7)).collect()}
    assert a == b
    frac = sum(1 for s in a.values() if s == "val") / len(a)
    assert 0.03 < frac < 0.25  # ~10% with small-sample slack


def test_split_salt_changes_membership(spark):
    df = corpus(spark)
    a = {r.doc_id: r.split for r in deterministic_split(df, salt="s1").collect()}
    b = {r.doc_id: r.split for r in deterministic_split(df, salt="s2").collect()}
    assert a != b  # independent draw


def test_stratified_sample_respects_fractions(spark):
    df = corpus(spark)
    out = stratified_hash_sample(df, {"en": 1.0, "fr": 0.0}, "lang").collect()
    langs = {r.lang for r in out}
    assert langs == {"en"}          # fr sampled at 0, de absent from dict
    assert len(out) == 100          # all of en kept at fraction 1.0
