"""Semantic and plan-shape tests for the remaining TPC-H queries
(queries/relational_tpch_rest.py): Q8, Q11, Q12, Q13, Q20.

Value-level correctness is owned by the DuckDB oracle gate
(tools/check.py); these tests pin the properties the oracle can't
see — outer-join zero-group retention, plan shapes that survive
scale-up, and internal consistency invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.plans.inspect import (
    broadcast_join_count,
    formatted_plan,
)
from quick_and_easy_vectordb_spark.queries.relational_tpch_rest import (
    rel_q8_market_share,
    rel_q11_important_parts,
    rel_q12_priority_by_latency,
    rel_q13_order_count_distribution,
    rel_q20_promotion_suppliers,
)
from quick_and_easy_vectordb_spark.sources.catalog import load_table


def test_q8_share_bounded_and_star_join_all_broadcast(spark, sf_dir):
    df = rel_q8_market_share(spark, sf_dir)
    # 7-table star join: every dim side must broadcast — a sort-merge
    # join here would shuffle the fact table once per dimension.
    assert "SortMergeJoin" not in formatted_plan(df)
    rows = df.collect()
    assert rows, "1996-1997 PROMO/ASIA slice must be non-empty"
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0


def test_q11_single_fact_aggregation(spark, sf_dir):
    df = rel_q11_important_parts(spark, sf_dir)
    assert broadcast_join_count(df) >= 1
    vals = df.collect()
    # The static plan shows the per-part aggregate twice (once under
    # the global-total branch), but AQE exchange reuse must dedupe it
    # at runtime: the fact table is scanned and shuffled ONCE. This is
    # the property that makes the decorrelated Q11 viable at 100 TB.
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final
    assert vals
    total = sum(r.part_value for r in vals)
    assert all(r.part_value > 0 for r in vals)
    assert total > 0


def test_q12_priority_counts_partition_total(spark, sf_dir):
    rows = rel_q12_priority_by_latency(spark, sf_dir).collect()
    assert rows
    # high/low are a partition of the late line items per group.
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late_total = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == late_total


def test_q13_retains_zero_order_customers(spark, sf_dir):
    rows = rel_q13_order_count_distribution(spark, sf_dir).collect()
    dist = {r.c_count: r.custdist for r in rows}
    # the histogram must cover every customer exactly once — inner
    # join would drop the zero-order bucket's population entirely.
    n_customers = load_table(spark, sf_dir, "customer").count()
    assert sum(dist.values()) == n_customers


def test_q20_suppliers_are_europe_only(spark, sf_dir):
    result = rel_q20_promotion_suppliers(spark, sf_dir)
    got = {r.s_suppkey for r in result.collect()}
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe = {
        r.s_suppkey
        for r in sup.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
        .collect()
    }
    assert got <= europe
    # semi-join result must be duplicate-free
    assert result.count() == result.select("s_suppkey").distinct().count()
