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


def test_chunk_documents_overlap_and_ids(spark):
    from quick_and_easy_vectordb_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a" * 450), (2, "short"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_size=200, overlap=50).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.document_id, []).append(r)
    # 450 chars, step 150 -> starts 1,151,301 (+ tail window at 451? no: 451 > 450)
    assert len(by_doc[1]) == 3
    assert by_doc[1][0].chunk_text == "a" * 200
    assert len(by_doc[1][2].chunk_text) == 150  # tail kept, short
    assert [r.chunk_id for r in by_doc[1]] == [10000, 10001, 10002]
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "short"
    assert 3 not in by_doc  # empty doc yields nothing
