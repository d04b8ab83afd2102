"""Advanced TPC-H shapes: correlated scalar subqueries and
min/max-per-group "argmin" joins (SURVEY.md §2b M5 extension).

The reference has no joins at all (SURVEY.md §2.2), so these exist
purely for the engine's relational completeness: the classic TPC-H
query patterns Spark users decorrelate by hand (or let Catalyst
decorrelate) into agg-then-join plans.

Scale stance shared by all three:
- the correlated scalar subquery (MAX over a derived view, AVG per
  part, MIN per part) is always computed as a SEPARATE aggregate
  DataFrame and joined back — never a per-row subquery. The aggregate
  side is orders of magnitude smaller than the fact table, so the
  join-back is a broadcast: zero extra shuffle of the fact table.
- double-typed aggregates that feed equality comparisons use either
  order-independent ops (MIN/MAX — exact under any partitioning) or
  the decimal-exact dsum/davg (functions/numeric.py), so the
  Spark-vs-DuckDB comparison and the join-back equality are bitwise
  deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.numeric import davg, dsum
from quick_and_easy_vectordb_spark.operators.util import ensure_parallelism
from quick_and_easy_vectordb_spark.queries.registry import query
from quick_and_easy_vectordb_spark.sources.catalog import load_table

from quick_and_easy_vectordb_spark.queries.relational import _davg, _dsum


@query(
    "rel_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    tags=("relational", "subquery", "agg", "join"),
)
def rel_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum 3-month revenue.

    The `revenue = (SELECT MAX(..) FROM revenue)` correlated scalar
    subquery decorrelates to: aggregate once (one shuffle of the
    filtered lineitem), reduce that small per-supplier frame to a
    1-row MAX, and broadcast the 1-row frame back as an equality
    join — the per-supplier aggregate is scanned twice but it's tiny
    (|suppliers| rows), and the fact table is only shuffled once.
    Revenue is decimal-exact (dsum) so the max-equality match is
    bitwise deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        ensure_parallelism(
            li.filter(
                (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
            )
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    top = rev.join(F.broadcast(mx), rev["total_revenue"] == mx["_mx"]).drop("_mx")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(sup, top["supplier_no"] == sup["s_suppkey"]).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@query(
    "rel_q17_small_qty_revenue",
    oracle=f"""
WITH branded AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#4'
),
part_avg AS (
  SELECT l_partkey, {_davg('l_quantity')} AS avg_qty
  FROM branded GROUP BY l_partkey
)
SELECT {_dsum('b.l_extendedprice')} / 7.0 AS avg_yearly
FROM branded b
JOIN part_avg a ON a.l_partkey = b.l_partkey
WHERE b.l_quantity < 0.2 * a.avg_qty
""",
    tags=("relational", "subquery", "agg", "join"),
)
def rel_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: yearly revenue that would be lost by refusing
    small-quantity orders of one brand's parts.

    The correlated `l_quantity < 0.2 * (SELECT AVG(l_quantity) ...
    WHERE p_partkey = l_partkey)` decorrelates to a per-part AVG
    aggregate joined back by partkey. Plan: broadcast the brand's
    part keys into the lineitem scan (semi-reduction before any
    shuffle), aggregate per part (small), broadcast that back onto
    the same reduced frame. The fact table is never shuffled — both
    joins are broadcasts; only the per-part agg shuffles, and its
    input is already brand-filtered. davg is decimal-exact so the
    0.2*avg threshold is the identical double on both engines."""
    part_keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = ensure_parallelism(
        li.join(F.broadcast(part_keys), li["l_partkey"] == part_keys["p_partkey"])
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    part_avg = branded.groupBy("l_partkey").agg(davg("l_quantity").alias("avg_qty"))
    return (
        branded.withColumnRenamed("l_partkey", "b_partkey")
        .join(F.broadcast(part_avg), F.col("b_partkey") == part_avg["l_partkey"])
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "rel_q2_min_unit_price",
    oracle="""
WITH pl AS (
  SELECT l.l_partkey, l.l_suppkey,
         l.l_extendedprice / l.l_quantity AS unit_price
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
),
m AS (
  SELECT l_partkey, MIN(unit_price) AS min_price
  FROM pl GROUP BY l_partkey
)
SELECT DISTINCT pl.l_partkey AS p_partkey, s.s_name, n.n_name,
       s.s_acctbal, m.min_price
FROM pl
JOIN m ON pl.l_partkey = m.l_partkey AND pl.unit_price = m.min_price
JOIN supplier s ON s.s_suppkey = pl.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
""",
    tags=("relational", "subquery", "argmin", "join"),
)
def rel_q2_min_unit_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table, so "supply cost"
    is the unit price ever charged on a lineitem): for each
    small/STANDARD part, the supplier(s) that charged the minimum
    unit price, with their nation and account balance.

    This is the argmin-join pattern: MIN per part (one shuffle of the
    part-filtered rows), broadcast back as (partkey, price) equality
    to recover the achieving rows — Spark has no native argmin over
    a join, and a window-rank over l_partkey would shuffle the same
    rows but sort them too; the agg+join-back does it sort-free.
    unit_price is a per-row double division (bitwise identical on
    both engines; l_quantity >= 1 by construction), and MIN is
    order-independent, so the equality join-back is deterministic.
    DISTINCT collapses multiple tying lineitems from the same
    supplier. Dimension joins (supplier, nation) are broadcasts."""
    part_keys = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    pl = (
        ensure_parallelism(
            li.join(F.broadcast(part_keys), li["l_partkey"] == part_keys["p_partkey"])
        )
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    m = pl.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        pl.join(
            F.broadcast(m),
            (pl["l_partkey"] == m["m_partkey"]) & (pl["unit_price"] == m["min_price"]),
        )
        .join(F.broadcast(sup), pl["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            "s_acctbal",
            "min_price",
        )
        .distinct()
    )
