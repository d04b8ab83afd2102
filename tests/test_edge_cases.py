"""Empty-relation and degenerate-input behavior of the core operators —
the reference crashes or warns on these (app.py:79-80); the engine
must return well-typed empty/identity results."""

from __future__ import annotations

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.operators.asof import asof_join
from quick_and_easy_vectordb_spark.operators.dedup import exact_dedup
from quick_and_easy_vectordb_spark.operators.graph import connected_components
from quick_and_easy_vectordb_spark.operators.merge import upsert
from quick_and_easy_vectordb_spark.operators.search import top_k_by_dot
from quick_and_easy_vectordb_spark.sources.csv_vectors import empty_chunks


def test_topk_on_empty_corpus(spark):
    df = empty_chunks(spark)
    out = top_k_by_dot(df, [1.0, 2.0], k=5)
    assert out.count() == 0
    assert "similarity" in out.columns  # schema stable even when empty


def test_asof_with_empty_right_keeps_left(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "p")],
        "k long, ts_s string, pid string",
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "pid")
    right = left.filter("k < 0")  # empty, same schema
    rows = asof_join(left, right.select("k", "ts"), on="k").collect()
    assert len(rows) == 1 and rows[0].ts_right is None


def test_upsert_with_empty_changeset_is_identity(spark):
    t = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out = upsert(t, t.filter("id < 0"), on="id")
    assert sorted((r.id, r.v) for r in out.collect()) == [(1, "a"), (2, "b")]


def test_dedup_on_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(df).count() == 0


def test_connected_components_on_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0
