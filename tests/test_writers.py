"""Sink tests: partitioned layout, pruning behavior, O(new) append,
bucketed shuffle-free join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.plans import (
    formatted_plan,
    shuffle_count,
)
from quick_and_easy_vectordb_spark.sources.catalog import load_table
from quick_and_easy_vectordb_spark.sources.writers import (
    append_rows,
    read_corpus,
    write_bucketed,
    write_corpus,
)


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = str(tmp_path / "corpus")
    write_corpus(docs, out, partition_by="lang", sort_within_by="doc_id")

    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    assert all(os.path.isdir(os.path.join(out, f"lang={l}")) for l in langs)

    back = read_corpus(spark, out)
    assert back.count() == docs.count()

    # a lang predicate must prune to one partition directory
    one = back.filter(F.col("lang") == langs[0])
    plan = formatted_plan(one)
    assert "PartitionFilters" in plan and f"lang = {langs[0]}" in plan.replace(
        "'", ""
    ) or "isnotnull(lang" in plan  # coarse: partition filter present
    assert one.count() == docs.filter(F.col("lang") == langs[0]).count()


def test_append_is_incremental(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "appendable")
    write_corpus(docs, out)
    n0 = read_corpus(spark, out).count()

    new = spark.createDataFrame([(10**9, "xx")], "doc_id long, lang string")
    append_rows(new, out)
    assert read_corpus(spark, out).count() == n0 + 1
    # original files untouched: the appended row lives in new file(s)
    assert read_corpus(spark, out).filter(F.col("doc_id") == 10**9).count() == 1


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    write_bucketed(c, "t_cust_b", "c_custkey", 8, sort_by="c_custkey")
    write_bucketed(o, "t_ord_b", "o_custkey", 8, sort_by="o_custkey")
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bc = spark.table("t_cust_b")
        bo = spark.table("t_ord_b")
        j = bc.join(bo, bc.c_custkey == bo.o_custkey)
        assert shuffle_count(j) == 0, formatted_plan(j)

        unbucketed = c.join(o, c.c_custkey == o.o_custkey)
        assert shuffle_count(unbucketed) >= 2
        assert j.count() == unbucketed.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")
