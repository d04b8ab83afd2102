"""Text-function unit tests: tokenization, shingles, quality — the
edge cases (empty, short, unicode) that the oracle queries don't pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.text import (
    bpe_ish_token_count,
    char_shingles,
    normalized_text,
    punct_ratio,
    quality_score,
    token_count,
    word_shingles,
)


def one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).first().v


def test_normalize(spark):
    assert one(spark, "  Hello \t WORLD \n", normalized_text("text")) == "hello world"
    assert one(spark, "", normalized_text("text")) == ""


def test_token_counts(spark):
    assert one(spark, "a b  c", token_count("text")) == 3
    assert one(spark, "", token_count("text")) == 0
    assert one(spark, "   ", token_count("text")) == 0
    assert one(spark, "don't stop 123x", bpe_ish_token_count("text")) == 6
    # don | ' | t | stop | 123 | x → 6 BPE-ish pre-tokens


def test_word_shingles(spark):
    assert one(spark, "a b c d", word_shingles("text", 3)) == ["a b c", "b c d"]
    assert one(spark, "a b", word_shingles("text", 3)) == ["a b"]  # short fallback
    assert one(spark, "", word_shingles("text", 3)) == []
    # repeated shingles deduped
    assert one(spark, "x y x y x y", word_shingles("text", 2)) == ["x y", "y x"]


def test_char_shingles(spark):
    assert one(spark, "abcdefghij", char_shingles("text", 8)) == ["abcdefgh", "bcdefghi", "cdefghij"]
    assert one(spark, "abc", char_shingles("text", 8)) == ["abc"]


def test_punct_and_quality_bounds(spark):
    assert one(spark, "!!!", punct_ratio("text")) == 1.0
    assert one(spark, "abc", punct_ratio("text")) == 0.0
    for t in ["", "x", "the and of " * 100, "!@#$%" * 50]:
        q = one(spark, t, quality_score("text"))
        assert 0.0 <= q <= 1.0, (t[:20], q)
    # clean english long text scores higher than symbol soup
    good = one(spark, "the cat and the dog of the house " * 30, quality_score("text"))
    bad = one(spark, "@#$% ^&* ()!! " * 30, quality_score("text"))
    assert good > bad
