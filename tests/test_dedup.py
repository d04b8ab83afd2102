"""Dedup-operator properties on small constructed corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.operators.dedup import (
    embedding_near_dups,
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_table,
    simhash_signatures,
)


def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The quick  brown fox jumps over the lazy dog"),  # ws/case variant
        (3, "the quick brown fox jumps over the lazy cat"),  # near-dup
        (4, "completely different content about spark engines"),
        (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalization_and_survivor(spark):
    res = {r.keep_id: r.n_copies for r in exact_dedup(corpus(spark)).collect()}
    # 1, 2, 5 normalize to the same text → survivor is min id 1 with 3 copies
    assert res[1] == 3 and res[3] == 1 and res[4] == 1
    assert len(res) == 3


def test_exact_dedup_idempotent(spark):
    df = corpus(spark)
    once = exact_dedup(df)
    survivors = df.join(once.select(F.col("keep_id").alias("doc_id")), "doc_id")
    twice = exact_dedup(survivors)
    assert twice.filter(F.col("n_copies") > 1).count() == 0


def test_minhash_lsh_finds_near_dups(spark):
    df = corpus(spark)
    sh = shingle_table(df)
    sigs = minhash_signatures(sh, num_hashes=12)
    cands = lsh_candidate_pairs(sigs, 12, 4)
    verified = jaccard_pairs(sh, cands, threshold=0.5)
    pairs = {(r.id_a, r.id_b) for r in verified.collect()}
    # the exact/whitespace dups must be found; near-dup 1-3 likely too
    assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs
    for r in verified.collect():
        assert 0.0 <= r.jaccard <= 1.0


def test_minhash_identical_docs_identical_signatures(spark):
    df = corpus(spark)
    sigs = {r.id: tuple(r[f"mh{i}"] for i in range(12)) for r in
            minhash_signatures(shingle_table(df), num_hashes=12).collect()}
    assert sigs[1] == sigs[2] == sigs[5]
    assert sigs[1] != sigs[4]


def test_simhash_properties(spark):
    df = corpus(spark)
    s = {r.id: r.simhash for r in simhash_signatures(df).collect()}
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in s.values())
    assert s[1] == s[2] == s[5]  # normalization-equal docs
    ham13 = sum(a != b for a, b in zip(s[1], s[3]))
    ham14 = sum(a != b for a, b in zip(s[1], s[4]))
    assert ham13 < ham14  # near-dup closer than unrelated doc


def test_embedding_near_dups_blocked(spark):
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.999, 0.01], 0),
        (3, [0.0, 1.0], 0),
        (4, [1.0, 0.0], 1),  # same vector, different block → not compared
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    pairs = {(r.id_a, r.id_b) for r in
             embedding_near_dups(df, threshold=0.95).collect()}
    assert (1, 2) in pairs
    assert all(p[0] != 4 and p[1] != 4 for p in pairs)


def test_lsh_hot_bucket_cap_diverts_to_mega_clusters(spark):
    from quick_and_easy_vectordb_spark.operators.dedup import lsh_mega_clusters

    # 100 verbatim copies (ids 0-99) + 3 distinct docs: the copies share
    # one bucket per band, far above the cap of 8.
    base = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated verbatim everywhere").alias("text"),
    )
    # 200/201 normalize to the same text → identical signatures →
    # candidate pair in every band, deterministically.
    extra = spark.createDataFrame(
        [(200, "a unique document about gardening and soil quality"),
         (201, "A  Unique Document about  gardening and soil QUALITY"),
         (202, "completely unrelated text regarding astrophysics")],
        "doc_id long, text string",
    )
    df = base.unionByName(extra)
    sigs = minhash_signatures(shingle_table(df), num_hashes=12)

    capped = {(r.id_a, r.id_b)
              for r in lsh_candidate_pairs(sigs, 12, 4, max_bucket_size=8).collect()}
    # hot bucket's O(k²) pairs are gone; the small near-dup pair remains
    assert (200, 201) in capped
    assert not any(a < 100 and b < 100 for a, b in capped)

    mega = lsh_mega_clusters(sigs, 12, 4, max_bucket_size=8).collect()
    assert len(mega) == 4  # one hot bucket per band
    assert all(r.n_members == 100 and r.keep_id == 0 for r in mega)

    # uncapped enumerates the full bucket: 100*99/2 pairs per band, deduped
    uncapped = lsh_candidate_pairs(sigs, 12, 4, max_bucket_size=None)
    assert uncapped.filter((F.col("id_a") < 100) & (F.col("id_b") < 100)).count() == 4950
