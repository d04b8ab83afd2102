"""Deduplication operators — the core LLM-pretraining-data family.

All four flavors are pure DataFrame compositions (no Python UDFs), so
they scale with the cluster and stay inside whole-stage codegen:

- exact         : hash-groupBy on normalized text (one shuffle on a
                  32-byte key — the minimum possible for global dedup)
- MinHash + LSH : shingle → per-seed min-hash signature → band buckets
                  → candidate equi-join → exact-Jaccard verify. The
                  classic Broder scheme; the only joins are equi-joins
                  on band keys, so there is NO pairwise blowup: cost is
                  O(N·S) for signatures + O(candidate pairs) verify.
- SimHash       : per-word md5 bit votes → 64-bit signature per doc;
                  near-dup candidates share signature prefixes.
- embedding     : cosine ≥ τ within a blocking key (label/bucket) —
                  blocked self-join, never a full cross product.

Determinism: every hash is md5 over an explicit string encoding, so
signatures are stable across engines, runs, and partitionings — which
is also what makes these oracle-checkable in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.text import normalized_text, word_shingles
from quick_and_easy_vectordb_spark.functions.vector import cosine_similarity

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "simhash_signatures",
    "embedding_near_dups",
]


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Group identical (optionally normalized) texts.

    Returns one row per distinct text: ``content_hash``, canonical
    ``keep_id`` (min id — deterministic survivor pick), ``n_copies``.
    Only the 32-byte hash and the id are shuffled; the text itself
    never leaves the map side. (Reference analog: none — the reference
    permits duplicates silently, /root/reference/app.py:102-118.)
    """
    key = normalized_text(text_col) if normalize else F.col(text_col)
    return (
        df.select(F.md5(key).alias("content_hash"), F.col(id_col).alias("id"))
        .groupBy("content_hash")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _minhash_one(seed: int, shingle: Column) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:"), shingle))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    shingle_words: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: for each seed s, the lexicographic
    min of md5("s:" + shingle) over the document's distinct word
    shingles.

    One explode + one groupBy (single shuffle keyed on doc id); all
    ``num_hashes`` mins are computed in the same aggregation pass
    (map-side partial aggregation collapses each partition to ≤1 row
    per doc before the shuffle).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, shingle_words)).alias("shingle"),
    )
    aggs = [
        F.min(_minhash_one(s, F.col("shingle"))).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Band the signature into ``bands`` groups of ``num_hashes/bands``
    rows; two docs are candidates iff they agree on ALL hashes of at
    least one band (the standard LSH AND-OR construction).

    The join is an equi-join on (band index, band key): at scale this
    shuffles on band-key hash — skew only if one band key is shared by
    a huge near-dup cluster, which AQE skew-join handles.
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        members = [F.col(f"mh{s}") for s in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *members)).alias("key"))
        )
    banded = signatures.select(
        "id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs.

    |A∩B| via an equi-join of exploded shingles restricted to candidate
    pairs; |A∪B| = |A|+|B|−|A∩B| from per-doc shingle counts. Output:
    (id_a, id_b, jaccard) for pairs clearing the threshold. Work is
    proportional to candidate-pair shingles, not corpus².
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, shingle_words)).alias("shingle"),
    )
    counts = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))

    a = sh.select(F.col("id").alias("id_a"), F.col("shingle").alias("sh_a"))
    b = sh.select(F.col("id").alias("rid_b"), F.col("shingle").alias("sh_b"))
    inter = (
        candidates.join(a, "id_a")
        .join(b, (F.col("id_b") == F.col("rid_b")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    res = (
        inter.join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
    )
    return res.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document as a bit string.

    Each distinct word votes ±1 on every bit position, where bit b of a
    word is bit (3 − b mod 4) of hex nibble (b div 4) of md5(word); the
    signature bit is 1 iff the vote sum is positive. Everything is
    integer arithmetic on md5 nibbles → exact, engine-independent.

    Plan: explode distinct words, explode 64 bit positions, one groupBy
    (id, bit) with map-side combine, then one groupBy (id) to assemble
    the string. All counts are ints; no float nondeterminism.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.split(normalized_text(text_col), " ")
            )
        ).alias("w"),
    ).filter(F.col("w") != "")
    words = words.withColumn("h", F.md5(F.col("w")))
    votes = (
        words.select("id", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"), "h")
        .withColumn(
            "nibble",
            F.expr("CAST(conv(substring(h, CAST(b / 4 AS INT) + 1, 1), 16, 10) AS INT)"),
        )
        .withColumn("bit", F.expr("shiftright(nibble, CAST(3 - b % 4 AS INT)) & 1"))
        .withColumn("vote", F.col("bit") * 2 - 1)
        .groupBy("id", "b")
        .agg(F.sum("vote").alias("s"))
    )
    return votes.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("b", F.when(F.col("s") > 0, "1").otherwise("0").alias("c"))
                    )
                ),
                lambda x: x["c"],
            ),
            "",
        ).alias("simhash")
    )


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key.

    The self-join is an equi-join on ``block_col`` (an LSH bucket, a
    coarse-quantizer cell, or any partition key), so comparisons are
    O(Σ block²) not O(N²) — the blocking key is what makes this viable
    at 100 TB. Pairs with cosine ≥ threshold survive.
    """
    a = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("blk", "id_a", "id_b", "cosine")
    )
