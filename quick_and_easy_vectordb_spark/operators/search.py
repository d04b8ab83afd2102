"""Similarity search operators.

The reference's flagship query is: embed the query, score every stored
vector with a raw dot product, sort descending, take the first k
(default k=5) — /root/reference/app.py:40-48. Here that becomes a pure
DataFrame plan:

    Project(score) → TakeOrderedAndProject(k)

which Spark executes as a distributed top-k: each partition keeps a
k-element heap, the driver merges P·k candidates — no global sort, no
shuffle of the corpus. That plan shape is asserted in tests
(tests/test_plans.py) because it is exactly what survives a 100×
scale-up: cost is one scan + O(P·k) merge regardless of corpus size.

Deviation from the reference (documented, deliberate): ties are broken
by ascending id. The reference's pandas quicksort is unstable so its
tie order is nondeterministic (SURVEY.md §1.4.3 / app.py:48); a
deterministic rule is required for reproducible results and
oracle-hash comparison.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    vector_literal,
)

__all__ = [
    "score",
    "top_k",
    "top_k_by_dot",
    "threshold_search",
    "batch_knn",
]

_METRICS = {
    "dot": (dot_product, True),  # (scorer, descending?)
    "cosine": (cosine_similarity, True),
    "l2": (l2_distance, False),
}


def score(
    df: DataFrame,
    query_vector: Sequence[float],
    vector_col: str = "vector_embedding",
    metric: str = "dot",
    score_col: str = "score",
) -> tuple[DataFrame, bool]:
    """Project a similarity/distance score of every row against a
    literal query vector. Returns (scored_df, descending?)."""
    scorer, desc = _METRICS[metric]
    q = vector_literal(query_vector)
    return df.withColumn(score_col, scorer(F.col(vector_col), q)), desc


def top_k(
    scored: DataFrame,
    k: int,
    score_col: str = "score",
    descending: bool = True,
    tiebreak: str | Column | None = None,
) -> DataFrame:
    """Top-k by score with a deterministic tiebreak.

    ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject — the
    shuffle-free distributed top-k (BASELINE.md "Engine targets").
    """
    order = [F.desc(score_col) if descending else F.asc(score_col)]
    if tiebreak is not None:
        order.append(F.asc(tiebreak) if isinstance(tiebreak, str) else tiebreak)
    return scored.orderBy(*order).limit(k)


def top_k_by_dot(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    vector_col: str = "vector_embedding",
    id_col: str = "chunk_id",
    metric: str = "dot",
    score_col: str = "similarity",
) -> DataFrame:
    """The reference's search_similar (app.py:40-48), end to end:
    score by ``metric`` (default raw dot product), top-k (default 5),
    deterministic id tiebreak."""
    scored, desc = score(df, query_vector, vector_col, metric, score_col)
    return top_k(scored, k, score_col, desc, tiebreak=id_col)


def threshold_search(
    df: DataFrame,
    query_vector: Sequence[float],
    threshold: float,
    vector_col: str = "vector_embedding",
    metric: str = "cosine",
    score_col: str = "score",
) -> DataFrame:
    """All rows whose score clears a threshold (≥ for similarities,
    ≤ for distances) — the filter-shaped sibling of top-k."""
    scored, desc = score(df, query_vector, vector_col, metric, score_col)
    cond = F.col(score_col) >= threshold if desc else F.col(score_col) <= threshold
    return scored.filter(cond)


def batch_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "id",
    corpus_vec: str = "vec",
    metric: str = "cosine",
    score_col: str = "score",
) -> DataFrame:
    """k nearest corpus rows for *each* query row.

    Plan: broadcast the (small) query side into a nested-loop join, then
    a per-query window row_number ≤ k. Broadcasting the query side means
    the corpus — the 100 TB side — is never shuffled: each corpus
    partition scores all queries locally and the window only shuffles
    Q·(partition-local top-k) candidate rows, which AQE coalesces.

    For query sets too large to broadcast, chunk the query side and
    union the results, or LSH-prefilter (operators/ann.py) so the join
    is an equi-join on bucket id instead of a cross product.
    """
    scorer, desc = _METRICS[metric]
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.withColumn(score_col, scorer(F.col(corpus_vec), F.col(query_vec)))
    order = [
        F.desc(score_col) if desc else F.asc(score_col),
        F.asc(corpus_id),
    ]
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
