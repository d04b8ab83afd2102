"""ANN operator tests: signature determinism, probe ⊆ brute-force,
centroid math, partitioned index write."""

from __future__ import annotations

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.vector import vector_literal, dot_product
from quick_and_easy_vectordb_spark.operators.ann import (
    centroids_by_key,
    hamming_neighbors,
    hyperplane,
    lsh_signature,
    python_lsh_signature,
    write_lsh_index,
)


def test_spark_and_python_signatures_agree(spark):
    vecs = [[float((i * 13 + j * 7) % 11 - 5) for i in range(16)] for j in range(20)]
    df = spark.createDataFrame([(j, v) for j, v in enumerate(vecs)], "id long, v array<double>")
    got = {r.id: r.sig for r in
           df.select("id", lsh_signature("v", 8, 16).alias("sig")).collect()}
    for j, v in enumerate(vecs):
        assert got[j] == python_lsh_signature(v, 8)


def test_hamming_neighbors():
    probes = hamming_neighbors("1010", 1)
    assert probes[0] == "1010" and len(probes) == 5 and len(set(probes)) == 5
    assert all(sum(a != b for a, b in zip(p, "1010")) <= 1 for p in probes)


def test_probe_results_subset_of_bruteforce(spark, sf_dir):
    from quick_and_easy_vectordb_spark.queries.common import QUERY_VEC
    from quick_and_easy_vectordb_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = vector_literal(QUERY_VEC)
    brute = {
        r.vec_id
        for r in emb.select("vec_id", dot_product("embedding", q).alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(50)
        .collect()
    }
    sig = python_lsh_signature(QUERY_VEC, 4)
    probed = (
        emb.select("vec_id", lsh_signature("embedding", 4, 64).alias("b"),
                   dot_product("embedding", q).alias("s"))
        .filter(F.col("b").isin(hamming_neighbors(sig, 1)))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(5)
        .collect()
    )
    assert len(probed) > 0
    # multi-probe top-5 should be drawn from the true top-50
    assert {r.vec_id for r in probed} <= brute


def test_centroids_exact(spark):
    rows = [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [10.0, 0.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    c = {r.key: r.centroid for r in centroids_by_key(df).collect()}
    assert c[0] == [2.0, 4.0] and c[1] == [10.0, 0.0]


def test_write_lsh_index_partitioned(spark, tmp_path):
    rows = [(j, [float((i * 3 + j) % 7 - 3) for i in range(8)]) for j in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "lsh_index")
    write_lsh_index(df, path, num_planes=3, dim=8)
    back = spark.read.parquet(path)
    assert back.count() == 50
    # partition column survives and matches recomputed signatures
    recomputed = df.select("vec_id", lsh_signature("embedding", 3, 8).alias("sig"))
    joined = back.join(recomputed, "vec_id")
    assert joined.filter(F.col("lsh_bucket") != F.col("sig")).count() == 0
    # probing one bucket prunes the scan to that partition
    some_bucket = back.select("lsh_bucket").first().lsh_bucket
    pruned = spark.read.parquet(path).filter(F.col("lsh_bucket") == some_bucket)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or pruned.count() > 0


def test_lsh_index_write_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """End-to-end index lifecycle: materialize the bucket-partitioned
    index, probe via partition pruning (only probed directories read),
    get the SAME top-5 as the scan-everything probe query."""
    import os

    from quick_and_easy_vectordb_spark.functions.vector import (
        dot_product,
        vector_literal,
    )
    from quick_and_easy_vectordb_spark.operators.ann import (
        hamming_neighbors,
        python_lsh_signature,
        write_lsh_index,
    )
    from quick_and_easy_vectordb_spark.plans import formatted_plan
    from quick_and_easy_vectordb_spark.queries import QUERIES
    from quick_and_easy_vectordb_spark.queries.common import DIM, QUERY_VEC
    from quick_and_easy_vectordb_spark.sources.catalog import load_table

    idx = str(tmp_path / "lsh_index")
    emb = load_table(spark, sf_dir, "embeddings")
    write_lsh_index(emb, idx, "embedding", num_planes=4, dim=DIM)
    # one directory per occupied bucket
    assert any(d.startswith("lsh_bucket=") for d in os.listdir(idx))

    probes = hamming_neighbors(python_lsh_signature(QUERY_VEC, 4), 1)
    indexed = spark.read.parquet(idx).filter(F.col("lsh_bucket").isin(probes))
    plan = formatted_plan(indexed)
    assert "PartitionFilters" in plan  # pruning, not a full scan + filter

    got = (
        indexed.select(
            "vec_id",
            dot_product(F.col("embedding"), vector_literal(QUERY_VEC)).alias("s"),
        )
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(5)
        .collect()
    )
    want = QUERIES["ann_lsh_probe"].fn(spark, sf_dir).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
