"""Relational query surface over the TPC-H-ish star schema
(SURVEY.md §2b M5): filters, equi-joins (broadcast + shuffle),
group-aggregation, window rank, rollup, set ops, anti/semi joins,
scalar functions.

Numeric discipline: every SUM/AVG over doubles goes through
functions/numeric.py (decimal-exact, order-independent) so results are
bit-stable under any partitioning — and hash-identical to the DuckDB
oracle, which mirrors the same decimal arithmetic.

Scale notes are per-query docstrings; the common themes:
- dimension tables (region, nation, supplier) are broadcast —
  no shuffle of the fact table for dimension joins;
- aggregations rely on map-side partial aggregation (exact decimal
  sums are associative, so partials compose correctly);
- top-n uses TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.numeric import davg, dsum
from quick_and_easy_vectordb_spark.operators.diff import table_diff
from quick_and_easy_vectordb_spark.operators.merge import upsert
from quick_and_easy_vectordb_spark.operators.util import ensure_parallelism
from quick_and_easy_vectordb_spark.queries.registry import query
from quick_and_easy_vectordb_spark.sources.catalog import load_table, register_views

# DuckDB mirrors of dsum/davg (functions/numeric.py). The decimal sum
# is cast to double THROUGH VARCHAR: DuckDB's direct decimal→double
# cast is not correctly rounded (1 ulp off on some values), while its
# string→double parse is — matching Java's BigDecimal.doubleValue()
# (what Spark uses), so both engines land on the identical double.
def _dsum(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)"


def _davg(expr: str) -> str:
    return f"{_dsum(expr)} / COUNT({expr})"


@query(
    "rel_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_quantity')} AS sum_qty,
       {_dsum('l_extendedprice')} AS sum_base_price,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_davg('l_quantity')} AS avg_qty,
       {_davg('l_extendedprice')} AS avg_price,
       {_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("relational", "agg", "filter"),
    bench=True,
)
def rel_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-filter-aggregate with
    map-side combine. The shipdate predicate pushes into the parquet
    scan; only 4 narrow columns are read beyond the group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        ensure_parallelism(
            li.filter(
                F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "rel_q3_shipping_topn",
    oracle=f"""
SELECT l.l_orderkey AS o_orderkey, o.o_orderdate, o.o_orderpriority,
       {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    tags=("relational", "join", "agg", "topk"),
    bench=True,
)
def rel_q3_shipping_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join, grouped revenue, top-10. The
    customer side is filtered before the join (segment predicate pushed
    to its scan); top-10 is TakeOrderedAndProject over the aggregate."""
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"), "o_orderdate", "o_orderpriority"
        )
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "rel_q5_region_revenue",
    oracle=f"""
SELECT n.n_name,
       {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
    tags=("relational", "join", "agg"),
    bench=True,
)
def rel_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join. region/nation/supplier are broadcast
    (dimension tables — the fact tables never shuffle for them); only
    the orders⋈lineitem join shuffles, on the orderkey."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        F.broadcast(r)
        .join(F.broadcast(n), n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
    )


@query(
    "rel_window_rank_customers",
    oracle="""
WITH r AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 3
""",
    tags=("relational", "window"),
)
def rel_window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance within each nation — the grouped
    top-n window pattern (shuffle keyed on nation only)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "rel_rollup_orders",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
""",
    tags=("relational", "rollup", "agg"),
)
def rel_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, status): grand total + per-year + per-(year,status)
    in one pass — Spark expands grouping sets map-side, so it's still a
    single shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup(F.year("o_orderdate").cast("long").alias("yr"), "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@query(
    "rel_setops_customers",
    oracle="""
SELECT custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
    tags=("relational", "setops"),
)
def rel_setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra: (1995 buyers ∩ BUILDING segment) ∖ customers with a
    pending order. INTERSECT/EXCEPT hash on the single key column."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    buyers_1995 = (
        o.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    )
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    pending = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return buyers_1995.intersect(building).exceptAll(pending).distinct()


@query(
    "rel_scalar_functions",
    oracle="""
SELECT p_partkey,
       upper(substr(p_name, 1, 12)) AS name_prefix,
       p_brand || '/' || p_type AS brand_type,
       CAST(length(p_name) AS BIGINT) AS name_len,
       abs(p_retailprice - 1000.0) AS price_dev,
       floor(p_retailprice / 100.0) AS price_bucket,
       CAST(p_size % 7 AS INTEGER) AS size_mod,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END AS size_class
FROM part
WHERE p_retailprice BETWEEN 500.0 AND 1500.0
""",
    tags=("relational", "scalar", "filter"),
)
def rel_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/conditional scalar-function surface in one
    projection — everything stays in whole-stage codegen; the BETWEEN
    pushes to the scan."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        (F.col("p_retailprice") >= 500.0) & (F.col("p_retailprice") <= 1500.0)
    ).select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 12)).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.floor(F.col("p_retailprice") / 100.0).cast("double").alias("price_bucket"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
    )


@query(
    "rel_anti_join_customers",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND year(o.o_orderdate) = 1995)
""",
    tags=("relational", "join", "anti"),
)
def rel_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent 1995 order — LEFT ANTI join (Spark
    hashes the distinct filtered order keys; nothing wide shuffles;
    the priority/year predicates push into the orders scan)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.year("o_orderdate") == 1995)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "rel_semi_join_customers",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
""",
    tags=("relational", "join", "semi"),
)
def rel_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 urgent order — LEFT SEMI join; the priority
    filter pushes into the orders scan before the join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "rel_outer_join_counts",
    oracle="""
WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
            FROM customer GROUP BY c_nationkey),
sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
       FROM supplier GROUP BY s_nationkey)
SELECT n.n_name,
       COALESCE(cn.n_customers, 0) AS n_customers,
       COALESCE(sn.n_suppliers, 0) AS n_suppliers
FROM nation n
LEFT JOIN cn ON cn.nk = n.n_nationkey
FULL OUTER JOIN sn ON sn.nk = n.n_nationkey
""",
    tags=("relational", "join", "outer"),
)
def rel_outer_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join surface: LEFT + FULL OUTER with COALESCE'd nulls —
    nations keep their row even with zero customers/suppliers."""
    n = load_table(spark, sf_dir, "nation")
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        n.join(cn, n.n_nationkey == cn.cnk, "left")
        .join(sn, n.n_nationkey == F.col("snk"), "full_outer")
        .select(
            "n_name",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "rel_cube_orders",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY CUBE (year(o_orderdate), o_orderpriority)
""",
    tags=("relational", "cube", "agg"),
)
def rel_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (year × priority): all four grouping sets in one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube(
        F.year("o_orderdate").cast("long").alias("yr"), "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@query(
    "rel_date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mon,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER)
         AS days_to_2002
FROM orders
WHERE o_orderkey % 97 = 0
""",
    tags=("relational", "date", "scalar"),
)
def rel_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface: component extraction, truncation,
    day arithmetic. (Spark's dayofweek is 1=Sunday; DuckDB's dow is
    0=Sunday — aligned via −1.)"""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(
            F.lit("2002-01-01 00:00:00").cast("timestamp").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("days_to_2002"),
    )


@query(
    "rel_q4_exists",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01'
  AND o_orderdate < TIMESTAMP '2001-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("relational", "join", "semi", "exists"),
)
def rel_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a LEFT SEMI join with a residual
    non-equi predicate (l_shipdate > o_orderdate). The date filter on
    orders is pushed to the parquet scan before the join."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    sel = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "rel_q18_large_orders",
    oracle=f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(CAST(big.qdec AS VARCHAR) AS DOUBLE) AS total_qty
FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(30,10))) AS qdec
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(30,10))) > 200) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
    tags=("relational", "join", "having", "agg"),
)
def rel_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): aggregate lineitem FIRST
    (map-side combine shrinks it ~4×), HAVING-filter, then join the
    small survivor set to orders and customer — never join raw
    lineitem to customer."""
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,10)")).alias("qdec"))
        .filter(F.col("qdec") > 200)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qdec").cast("double").alias("total_qty"),
        )
    )


@query(
    "rel_q19_disjunctive",
    oracle=f"""
SELECT {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)
""",
    tags=("relational", "join", "broadcast", "disjunctive"),
)
def rel_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-column predicates across a
    BROADCAST equi-join (part is the dim side — no shuffle of
    lineitem). Catalyst extracts p_brand IN (...) as a pushable
    conjunct from the OR; the rest evaluates as a post-join residual."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    def arm(brand: str, smax: int, qlo: int, qhi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )

    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).filter(
        arm("Brand#12", 15, 1, 21)
        | arm("Brand#23", 25, 10, 30)
        | arm("Brand#3", 35, 20, 40)
    )
    return joined.agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@query(
    "rel_pivot_segment_year",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       {", ".join(
           f'''CAST(CAST(SUM(CASE WHEN c_mktsegment = '{s}' THEN CAST(o_totalprice AS DECIMAL(30,10)) END) AS VARCHAR) AS DOUBLE) AS "{s}"'''
           for s in _SEGMENTS
       )}
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY 1
""",
    tags=("relational", "pivot", "agg"),
)
def rel_pivot_segment_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: yearly order revenue cross-tabbed by market segment.
    The segment list is given explicitly so Spark skips the
    distinct-values pre-pass (one job instead of two) and the output
    schema is static — required for streaming reuse and for the
    oracle's conditional-aggregation mirror."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(dsum("o_totalprice"))
    )


@query(
    "rel_window_lag_running",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       LAG(o_totalprice) OVER w AS prev_price,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_idx,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) OVER w AS VARCHAR)
            AS DOUBLE) AS run_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("relational", "window", "lag", "running"),
)
def rel_window_lag_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order history: LAG (previous order price), order
    index, and a running decimal-exact spend total — one window, one
    shuffle on o_custkey shared by all three functions. The (date,
    orderkey) ordering is a total order, so the default RANGE frame
    equals ROWS and results are partition-count-independent."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.row_number().over(w).cast("long").alias("order_idx"),
        F.sum(F.col("o_totalprice").cast("decimal(30,10)"))
        .over(w)
        .cast("double")
        .alias("run_spend"),
    )


@query(
    "rel_median_by_priority",
    oracle="""
WITH r AS (
  SELECT o_orderpriority, o_totalprice AS v,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       AVG(v) AS median_price
FROM r
WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
GROUP BY o_orderpriority
""",
    tags=("relational", "window", "percentile"),
)
def rel_median_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median order price per priority, built from row_number +
    count windows and an average of the one-or-two middle values —
    deterministic across engines (interpolating percentile_cont
    implementations differ in float op order; approx_percentile is
    the right call at 100 TB but is not oracle-comparable).
    Note: partitioning by a 5-value key makes 5 giant window
    partitions at scale — exactness here trades away parallelism."""
    o = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        F.col("o_totalprice").alias("v"),
        F.row_number()
        .over(wp.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    mid = r.filter(
        (F.col("rn") == F.expr("(n + 1) div 2")) | (F.col("rn") == F.expr("n div 2 + 1"))
    )
    return mid.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.avg("v").alias("median_price"),
    )


@query(
    "rel_argmax_per_group",
    oracle="""
WITH r AS (
  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT n_name, c_custkey, c_name, c_acctbal
FROM r JOIN nation ON n_nationkey = c_nationkey
WHERE rn = 1
""",
    tags=("relational", "window", "argmax", "join"),
)
def rel_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-per-group (richest customer per nation): row_number with
    an explicit custkey tiebreak (max_by/arg_max have unspecified tie
    order — not oracle-safe), then a broadcast join to the nation dim
    for the k surviving rows only."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    top = c.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return top.join(F.broadcast(n), top.c_nationkey == n.n_nationkey).select(
        "n_name", "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "rel_merge_upsert",
    oracle="""
WITH upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice * 1.1 AS o_totalprice, o_orderdate,
         'UPDATED' AS o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice, o_orderdate,
         'INSERTED'
  FROM orders WHERE o_orderkey % 101 = 0
)
SELECT CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderkey ELSE t.o_orderkey END AS o_orderkey,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_custkey ELSE t.o_custkey END AS o_custkey,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderdate ELSE t.o_orderdate END AS o_orderdate,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
FROM orders t FULL OUTER JOIN upd u ON u.o_orderkey = t.o_orderkey
""",
    tags=("relational", "merge", "dml"),
    bench=True,
)
def rel_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (operators/merge.py): a changeset derived
    from the table itself — price corrections on every 97th order plus
    brand-new rows cloned from every 101st — applied in one full-outer
    keyed join. Matched rows take the update row wholesale (NULLs
    included), unmatched stay, new keys append; the oracle is the
    equivalent FULL OUTER with a join-hit CASE per column."""
    o = load_table(spark, sf_dir, "orders")
    corrections = o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        "o_orderdate",
        F.lit("UPDATED").alias("o_orderpriority"),
    )
    inserts = o.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        F.lit("INSERTED").alias("o_orderpriority"),
    )
    return upsert(o, corrections.unionByName(inserts), on="o_orderkey")


@query(
    "rel_q7_nation_volume",
    oracle=f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(l_shipdate) AS BIGINT) AS yr,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
""",
    tags=("relational", "join", "multiway", "agg"),
)
def rel_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-way join measuring trade volume between two
    nations by year. Join order matters at scale: dims (customer,
    supplier, nation) reduce via broadcast; the two big tables
    (lineitem ⋈ orders) meet in the only real shuffle. The nation
    IN-filters prune through the joins down to the scans."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(*pair))
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(*pair))
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return j.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("yr")
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@query(
    "rel_q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("relational", "join", "topn", "agg"),
)
def rel_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.
    The returnflag filter prunes lineitem AT THE SCAN (~1/3 survives)
    before any join; the final top-20 is TakeOrderedAndProject over
    the aggregated (small) result, with revenue-then-key tiebreak for
    determinism."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "rel_q14_promo_share",
    oracle=f"""
SELECT 100.0 * {_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       / {_dsum('l_extendedprice * (1 - l_discount)')} AS promo_share
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-04-01'
""",
    tags=("relational", "join", "conditional-agg"),
)
def rel_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregation
    across a broadcast join, one scalar out. Both decimal sums ride the
    same shuffle-free partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return j.agg(
        (F.lit(100.0) * dsum(promo) / dsum(disc)).alias("promo_share")
    )


@query(
    "rel_q6_sql_surface",
    oracle=f"""
SELECT {_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01'
  AND l_shipdate < TIMESTAMP '2001-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("relational", "sql", "agg"),
)
def rel_q6_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 expressed as PURE Spark SQL over registered views —
    the engine's second query language (same Catalyst plan as the
    DataFrame API; sources/catalog.py:register_views mirrors the
    oracle's view setup). The Spark SQL text and the DuckDB oracle
    differ only in the decimal-to-double cast spelling."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,10)))
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2000-01-01'
          AND l_shipdate < TIMESTAMP '2001-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """)


@query(
    "rel_string_functions",
    oracle="""
SELECT c_custkey,
       CAST(levenshtein(c_name, 'Customer#000000000') AS BIGINT) AS edit_dist,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
       reverse(c_name) AS name_rev,
       CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
       split_part(c_name, '#', 2) AS name_num,
       repeat(c_mktsegment[1:1], 3) AS seg_tripled
FROM customer
WHERE c_custkey % 53 = 0
""",
    tags=("relational", "string", "scalar"),
)
def rel_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep string-function surface: edit distance (levenshtein — the
    fuzzy-match primitive), padding, character translation, reversal,
    substring position, field splitting, repetition. All JVM
    codegen'd; the modulo filter keeps oracle output compact."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 53 == 0)
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000000"))
        .cast("long")
        .alias("edit_dist"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.reverse("c_name").alias("name_rev"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.substring_index("c_name", "#", -1).alias("name_num"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("seg_tripled"),
    )


@query(
    "rel_stats_aggregates",
    oracle=f"""
WITH s AS (
  SELECT o_orderpriority,
         COUNT(*) AS n,
         {_dsum('o_totalprice')} AS sx,
         {_dsum('o_totalprice * o_totalprice')} AS sxx
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
       (sxx - sx * sx / n) / (n - 1) AS variance,
       sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev
FROM s
""",
    tags=("relational", "stats", "agg"),
)
def rel_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates with ENGINE-EXACT math: built-in
    stddev/variance use streaming (Welford) accumulation whose float
    rounding differs per engine and per partitioning, so this computes
    the two-pass textbook formula from decimal-exact power sums —
    identical on any engine, any partition count. (At 100 TB the same
    one-shuffle shape; the decimal sums are the same cost as Q1's.)"""
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    s = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(tp).alias("sx"),
        dsum(tp * tp).alias("sxx"),
    )
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    return s.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        var.alias("variance"),
        F.sqrt(var).alias("stddev"),
    )


@query(
    "rel_grouping_sets",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
       COUNT(*) AS n,
       {_dsum('o_totalprice')} AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
""",
    tags=("relational", "grouping-sets", "agg"),
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than cube/rollup: exactly
    the three listed sets, not the power set) with GROUPING() markers
    disambiguating real NULLs from set-placeholder NULLs. All sets
    compute in one shuffle via Catalyst's Expand. Expressed through
    the SQL front end."""
    register_views(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """)


@query(
    "rel_table_diff",
    oracle="""
WITH newsnap AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 37 = 0 THEN o_totalprice * 2.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 11 <> 0
  UNION ALL
  SELECT o_orderkey + 20000000, 'N', o_totalprice FROM orders
  WHERE o_orderkey % 41 = 0
),
oldsnap AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            WHEN o.o_totalprice <> n.o_totalprice
                 OR o.o_orderstatus <> n.o_orderstatus THEN 'changed'
       END AS change,
       CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus
            ELSE n.o_orderstatus END AS o_orderstatus,
       CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice
            ELSE n.o_totalprice END AS o_totalprice
FROM oldsnap o FULL OUTER JOIN newsnap n ON n.o_orderkey = o.o_orderkey
WHERE (o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
       OR o.o_orderstatus <> n.o_orderstatus)
""",
    tags=("relational", "diff", "cdc"),
)
def rel_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE DIFF / CDC (operators/diff.py): compare the orders
    snapshot against a synthetic successor (every 11th row deleted,
    every 37th repriced, a cloned batch added) and emit only the
    added/removed/changed rows - the changeset a downstream
    incremental consumer (merge.upsert) would apply. One full-outer
    shuffle; change detection via md5 row hashes, O(1) per row
    regardless of width."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 37 == 0, F.col("o_totalprice") * 2.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    ).unionByName(
        o.filter(F.col("o_orderkey") % 41 == 0).select(
            (F.col("o_orderkey") + 20_000_000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    return table_diff(o, new, on="o_orderkey")


@query(
    "rel_window_distribution",
    oracle="""
SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WHERE c_custkey % 29 = 0
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
    tags=("relational", "window", "distribution"),
)
def rel_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile buckets (ntile),
    percent_rank, cume_dist per market segment. All three are ratios
    of integer rank/count — exact identical doubles on any engine —
    and share one window (one shuffle). Total ordering via the
    (acctbal, custkey) tiebreak keeps bucket boundaries
    deterministic."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 29 == 0)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "rel_partial_agg_merge",
    oracle=f"""
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
       COUNT(*) AS n_orders,
       {_dsum('o_totalprice')} AS revenue,
       {_dsum('o_totalprice')} / COUNT(*) AS avg_price
FROM orders
GROUP BY 1
""",
    tags=("relational", "agg", "incremental", "reaggregation"),
)
def rel_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable partial state, merged: build per-DAY partial
    aggregates (decimal sum + count — the state an incremental
    pipeline materializes daily), then MERGE them into monthly
    rollups; the oracle aggregates the raw table directly. Hash
    equality proves the partial-merge is exact — the property that
    lets a 100 TB pipeline maintain day-level state and re-aggregate
    to any coarser grain without touching raw data. Decimal sums are
    associative (unlike double sums), which is the entire trick: the
    daily shuffle is O(days), the monthly merge O(days)→O(months).

    The decimal partial stays DECIMAL until the final month grain —
    casting to double per day and re-summing would reintroduce
    order-dependence."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("o_totalprice").cast("decimal(30,10)")).alias("psum"),
    )
    monthly = (
        daily.groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("long")
            .alias("ym")
        )
        .agg(
            F.sum("pn").alias("n_orders"),
            F.sum("psum").cast("double").alias("revenue"),
        )
    )
    return monthly.select(
        "ym",
        "n_orders",
        "revenue",
        (F.col("revenue") / F.col("n_orders")).alias("avg_price"),
    )


@query(
    "rel_bucketed_join_revenue",
    oracle=f"""
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       {_dsum('o.o_totalprice')} AS revenue
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    tags=("relational", "bucketing", "join", "engine"),
)
def rel_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed-table zero-shuffle join under oracle check: both
    sides are persisted as managed tables bucketed on the join key
    (sources/writers.py:write_bucketed), then joined and aggregated —
    the bucket metadata lets Catalyst plan the equi-join WITHOUT
    exchanging either side (asserted in tests/test_writers.py; here
    the RESULT is what's verified). This is the storage-layout
    contract a 100 TB warehouse uses for its repeatedly-joined fact
    pairs: pay the shuffle once at write time, never again at read."""
    from quick_and_easy_vectordb_spark.sources.writers import write_bucketed

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    write_bucketed(c, "q_cust_bucketed", "c_custkey", 16, sort_by="c_custkey")
    write_bucketed(o, "q_ord_bucketed", "o_custkey", 16, sort_by="o_custkey")
    cb = spark.table("q_cust_bucketed")
    ob = spark.table("q_ord_bucketed")
    return (
        cb.join(ob, cb.c_custkey == ob.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "rel_observe_metrics",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS BIGINT)
         AS n_big_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS VARCHAR)
            AS DOUBLE) AS total_price,
       CAST(MIN(epoch_us(o_orderdate)) AS BIGINT) AS first_order_us,
       CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS last_order_us
FROM orders
""",
    tags=("relational", "observe", "telemetry", "accumulator"),
)
def rel_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OBSERVATION API (df.observe + pyspark.sql.Observation):
    named aggregate metrics computed as an accumulator SIDE-CHANNEL of
    another action — the mechanism for pipeline telemetry (row counts,
    null rates, freshness watermarks) without a second scan of the
    data. Here the observed scan's own result is discarded (a noop
    sink drives it) and the METRICS become the query result, so the
    oracle directly verifies what the accumulator path computed: a
    count, a conditional count (DISTINCT is disallowed inside
    CollectMetrics — the API's documented mergeability constraint), a
    decimal-exact revenue total, and min/max freshness stamps.

    The Observation.get call is a driver-side read of one O(1) metric
    row (the documented constant-cost exception) — never a data
    collect.

    Plan shape at 100 TB: CollectMetrics wraps the scan; metrics
    merge per-task like any partial aggregate and add no shuffle, no
    extra pass, and no skew surface — the defining property vs
    running a separate aggregation job (which doubles the I/O). In
    production the same observe() rides the REAL write action, so
    telemetry is free."""
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.unix_micros("o_orderdate").alias("od_us"),
    )
    obs = Observation("orders_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("n_big_orders"),
        dsum("o_totalprice").alias("total_price"),
        F.min("od_us").alias("first_order_us"),
        F.max("od_us").alias("last_order_us"),
    )
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_orders"],
                m["n_big_orders"],
                m["total_price"],
                m["first_order_us"],
                m["last_order_us"],
            )
        ],
        "n_orders long, n_big_orders long, total_price double, "
        "first_order_us long, last_order_us long",
    )


_TRY_C = 9007199254740992  # 2^53; orderkeys above ~1023 overflow long


@query(
    "rel_try_arithmetic",
    oracle=f"""
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey > 9223372036854775807 // {_TRY_C}
              THEN NULL ELSE o_orderkey * {_TRY_C} END AS p,
         CASE WHEN o_orderkey % 3 = 1 THEN NULL
              ELSE CAST(o_totalprice AS DOUBLE) / (o_orderkey % 3 - 1) END AS q
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(p) AS BIGINT) AS n_mul_overflow,
       CAST(MIN(p) AS BIGINT) AS min_product,
       CAST(MAX(p) AS BIGINT) AS max_product,
       CAST(COUNT(*) - COUNT(q) AS BIGINT) AS n_div_by_zero,
       CAST(CAST(SUM(CAST(q AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)
         AS total_ratio
FROM t
""",
    tags=("relational", "ansi", "try-arithmetic", "overflow"),
)
def rel_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI try_* arithmetic surface — the load-bearing difference
    between Spark 4's ANSI mode and legacy: a plain `*` THROWS on
    long overflow mid-job (killing a 100 TB pipeline hours in), while
    try_multiply/try_divide return NULL and let the query account for
    the poisoned rows explicitly. Here every orderkey above 2^63/2^53
    overflows the multiply and every key ≡ 1 (mod 3) divides by zero;
    the aggregate reports both null populations plus bounds/sums over
    the survivors. The oracle reproduces the NULL rule with range
    CASEs (DuckDB, like ANSI Spark, would THROW on the raw
    expressions — which is exactly the behavior try_* exists to
    absorb).

    Plan shape at 100 TB: pure scan-side expressions inside
    whole-stage codegen; try_* compiles to the same arithmetic with
    an overflow branch — no UDF, no row-level exception handling."""
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        F.try_multiply(F.col("o_orderkey"), F.lit(_TRY_C)).alias("p"),
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 3 - 1)
        ).alias("q"),
    )
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("p")).cast("long").alias("n_mul_overflow"),
        F.min("p").cast("long").alias("min_product"),
        F.max("p").cast("long").alias("max_product"),
        (F.count(F.lit(1)) - F.count("q")).cast("long").alias("n_div_by_zero"),
        F.sum(F.col("q").cast("decimal(38,10)")).cast("double").alias("total_ratio"),
    )


@query(
    "rel_null_safe_join",
    oracle="""
WITH e AS (
  SELECT event_id, event_type,
         CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
              THEN NULL
              ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
  FROM events
),
dim AS (
  SELECT DISTINCT CASE WHEN n_chars % 7 = 0 THEN NULL
                       ELSE n_chars % 100 END AS k
  FROM documents
),
plain AS (
  SELECT COUNT(*) AS n FROM e JOIN dim ON dim.k = e.k
),
nullsafe AS (
  SELECT COUNT(*) AS n FROM e JOIN dim ON dim.k IS NOT DISTINCT FROM e.k
)
SELECT CAST((SELECT COUNT(*) FROM e WHERE k IS NULL) AS BIGINT)
         AS n_null_events,
       CAST((SELECT n FROM plain) AS BIGINT) AS n_plain_matches,
       CAST((SELECT n FROM nullsafe) AS BIGINT) AS n_nullsafe_matches,
       CAST((SELECT n FROM nullsafe) - (SELECT n FROM plain) AS BIGINT)
         AS n_null_bridge
""",
    tags=("relational", "join", "null-safe", "three-valued-logic"),
)
def rel_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM) vs plain
    `=` — the three-valued-logic trap every entity-resolution join
    hits: under standard SQL equality NULL keys match NOTHING
    (silently dropping every record whose key failed extraction),
    while the null-safe operator treats NULL as a joinable value.
    Both semantics are computed on the same relations (a nullable key
    parsed from the JSON props, nulled for k % 7 = 0) and the delta —
    the rows the null bridge adds — is an explicit output column, so
    the engine's <=> implementation is pinned exactly, not just
    exercised.

    Plan shape at 100 TB: `<=>` remains a HASH-JOINABLE equi-key in
    Spark (null hashes like a value) — no fallback to
    nested-loop — which is precisely why it, and not `OR (a IS NULL
    AND b IS NULL)` (non-equi, breaks the hash join), is the
    production form."""
    ev = load_table(spark, sf_dir, "events")
    k_raw = F.get_json_object("props", "$.k").cast("long")
    e = ev.select(
        "event_id",
        F.when(k_raw % 7 == 0, F.lit(None).cast("long"))
        .otherwise(k_raw)
        .alias("k"),
    ).persist()  # null count + two join probes read it
    docs = load_table(spark, sf_dir, "documents")
    dim = (
        docs.select(
            F.when(F.col("n_chars") % 7 == 0, F.lit(None).cast("long"))
            .otherwise(F.col("n_chars") % 100)
            .alias("k")
        )
        .distinct()
        .persist()
    )
    n_null = e.filter(F.col("k").isNull()).agg(
        F.count(F.lit(1)).alias("n_null_events")
    )
    plain = e.join(dim, e["k"] == dim["k"]).agg(
        F.count(F.lit(1)).alias("n_plain_matches")
    )
    nullsafe = e.join(dim, e["k"].eqNullSafe(dim["k"])).agg(
        F.count(F.lit(1)).alias("n_nullsafe_matches")
    )
    return (
        n_null.crossJoin(plain)
        .crossJoin(nullsafe)
        .select(
            F.col("n_null_events").cast("long").alias("n_null_events"),
            F.col("n_plain_matches").cast("long").alias("n_plain_matches"),
            F.col("n_nullsafe_matches").cast("long").alias("n_nullsafe_matches"),
            (F.col("n_nullsafe_matches") - F.col("n_plain_matches"))
            .cast("long")
            .alias("n_null_bridge"),
        )
    )
