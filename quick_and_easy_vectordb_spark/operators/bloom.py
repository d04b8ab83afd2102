"""Bloom-filter runtime pruning for selective joins.

The 100 TB problem this solves: a semi-join of a huge fact table
against a *selective* dimension predicate still shuffles every fact row
that survives its own local filters — the fact side cannot know which
join keys the dimension kept until the join executes. Spark's own
runtime bloom filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
injects exactly this pattern, but only when its creation-side heuristics
(size thresholds, shuffle presence) agree; this operator is the explicit,
always-available form, built from plain aggregates so it works on any
plan shape and any Spark version.

Mechanics: the dimension's join keys hash k ways into an m-bit array,
materialized as ONE row holding `array<bigint>` (m/64 words, ~8 KB for
the default 2^16 bits) — built with one map-side-combined aggregation
over the (small) key set. That row broadcasts to the fact scan, where
`bloom_might_contain` evaluates k bit-tests per row entirely in
whole-stage codegen. Rows failing the test are dropped BEFORE the join
shuffle; the exact join afterwards removes the false positives, so the
composition is semantically identical to the plain semi-join while the
shuffle carries only ~(true matches + fp_rate · rest).

Sizing: fp ≈ (1 - e^(-k·n/m))^k; the defaults (m=2^16, k=3) hold fp
under ~1% to n ≈ 8k keys. For bigger dimensions pass a larger power-of-
two `m_bits` — the broadcast is m/8 bytes, so even 2^26 bits is 8 MB.

Reference context: the reference app (app.py:1-193) has no joins; this
is part of the engine's scale surface (SURVEY.md §2b, runtime filters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_might_contain", "bloom_semi_join"]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # k independent positions from xxhash64 with distinct literal seeds;
    # pmod keeps them in [0, m_bits) despite the signed hash.
    return [F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits)) for s in range(k)]


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """ONE-row DataFrame with column ``words: array<bigint>`` — the
    m-bit bloom filter over ``keys[key_col]``, as m/64 little-endian
    words. Cost: one aggregation over the key set (map-side partial
    bit_or per word), never more than m/64 rows shuffled."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    key = F.col(key_col)
    word_masks = (
        keys.select(
            F.explode(F.array(*_positions(key, m_bits, k))).alias("p")
        )
        .select(
            F.shiftright("p", 6).cast("long").alias("w"),
            # The Python shiftleft wrapper only takes a literal shift
            # amount; the SQL function accepts a per-row column.
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
    )
    return word_masks.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda i: F.coalesce(F.element_at(F.col("wm"), i), F.lit(0).cast("long")),
        ).alias("words")
    )


def bloom_might_contain(
    words: Column, key: Column, m_bits: int = 1 << 16, k: int = 3
) -> Column:
    """Boolean test against a ``bloom_build`` word array: true iff all
    k bits for ``key`` are set (no false negatives). Pure Catalyst bit
    arithmetic — evaluates inside whole-stage codegen at scan speed."""
    test = None
    for p in _positions(key, m_bits, k):
        w = F.shiftright(p, 6).cast("int")
        t = (
            F.bit_get(
                F.element_at(words, w + F.lit(1)), p.bitwiseAND(F.lit(63))
            )
            == 1
        )
        test = t if test is None else (test & t)
    return test


def bloom_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Exact left-semi join of ``fact`` against ``dim_keys``, executed
    as bloom-prefilter → exact semi-join. Result rows are IDENTICAL to
    the plain semi-join (the bloom admits false positives, the exact
    join removes them; it admits no false negatives) — only the shuffle
    volume changes."""
    words = bloom_build(dim_keys.select(dim_key), dim_key, m_bits, k)
    pruned = (
        fact.join(F.broadcast(words))
        .filter(bloom_might_contain(F.col("words"), F.col(fact_key), m_bits, k))
        .drop("words")
    )
    # left_semi is already duplicate-insensitive on the build side —
    # no dedup shuffle needed.
    return pruned.join(
        dim_keys.select(F.col(dim_key).alias(fact_key)),
        on=fact_key,
        how="left_semi",
    )
