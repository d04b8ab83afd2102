"""Remaining TPC-H query shapes: Q8, Q9, Q11, Q12, Q13, Q20.

Completes the TPC-H coverage (Q1-Q7, Q10, Q14-Q19, Q21, Q22 live in
relational.py / relational_advanced.py). The reference app has no
relational layer at all (SURVEY.md §0: app.py:1-193 is a single-table
vector search), so these exist for the engine's relational
completeness over the driver's star schema.

The fixture schema is TPC-H-*ish* (TESTDATA.md): there is no
``partsupp`` table and several columns are absent (l_shipmode,
l_commitdate, l_receiptdate, p_mfgr, p_container, s_comment). Each
query below keeps the *plan shape* of its TPC-H namesake — that is
what matters for the engine — and substitutes available columns,
documented per query.

Scale stance shared by all six:
- every dimension-side aggregate that a correlated subquery would
  compute per-row is decorrelated into a separate small aggregate
  DataFrame and broadcast-joined back (zero extra fact-table shuffle);
- all double sums go through dsum/davg (functions/numeric.py) so
  results are bit-stable under any partitioning and hash-comparable
  with the DuckDB oracle;
- counts are cast to long on the Spark side and the DuckDB side wraps
  SUM(BIGINT)→HUGEINT in CAST(.. AS BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.numeric import davg, dsum
from quick_and_easy_vectordb_spark.operators.util import ensure_parallelism
from quick_and_easy_vectordb_spark.queries.registry import query
from quick_and_easy_vectordb_spark.queries.relational import _davg, _dsum
from quick_and_easy_vectordb_spark.sources.catalog import load_table


@query(
    "rel_q8_market_share",
    oracle=f"""
WITH volumes AS (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA'
    AND p.p_type = 'PROMO'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       {_dsum("CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0.0 END")}
         / {_dsum('volume')} AS mkt_share
FROM volumes
GROUP BY o_year
""",
    tags=("relational", "tpch", "join", "agg"),
)
def rel_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share. Share of 'NATION_7'-supplied
    revenue within PROMO-part orders shipped to ASIA customers, by
    order year. (Stand-ins: p_type='PROMO' for 'ECONOMY ANODIZED
    STEEL', 1996-1997 window inside the fixture's date range.)

    Plan shape: a 7-table star join where every dimension (part,
    customer->nation->region, supplier->nation) is small enough to
    broadcast, so the only shuffle is the final tiny group-by-year.
    The conditional share numerator is a CASE inside the same
    aggregate — one pass, no self-join. Both sums are decimal-exact;
    their double quotient is deterministic."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("supp_nation")
    )

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    volumes = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
    )
    share_num = dsum(
        F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(F.lit(0.0))
    )
    return volumes.groupBy("o_year").agg(
        (share_num / dsum(F.col("volume"))).alias("mkt_share")
    )


@query(
    "rel_q9_profit_by_nation_year",
    oracle=f"""
SELECT nation, o_year, {_dsum('amount')} AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
    tags=("relational", "tpch", "join", "agg"),
    bench=True,
)
def rel_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-type profit by supplier nation and year.
    The fixture has no partsupp.ps_supplycost, so cost is modeled as
    0.5 * p_retailprice per unit (same per-row expression shape);
    '%red%' stands in for '%green%'.

    Plan shape: fact-table scan joined to three broadcast dims
    (filtered part, supplier->nation, orders projected to two
    columns), then one shuffle for the (nation, year) aggregate.
    orders at SF100k is too big to broadcast in production — there
    the join degrades gracefully to shuffle-hash on l_orderkey; at
    fixture scale Catalyst broadcasts it. The per-row amount uses
    only * and - (bitwise identical across engines); the sum is
    decimal-exact."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    # year() is evaluated on the orders rows BEFORE the broadcast
    # (round-14, guide §2.3 "narrower types"): the broadcast relation
    # carries a 4-byte int instead of a timestamp, and the extraction
    # runs once per order instead of once per joined lineitem row.
    # Same integer either way — bitwise identical.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("nation"),
            "o_year",
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
    )


_Q11_VALUE = (
    "CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,2))) AS VARCHAR) AS DOUBLE)"
)


@query(
    "rel_q11_important_parts",
    oracle=f"""
SELECT l_partkey, {_Q11_VALUE} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {_Q11_VALUE} >
       0.0005 * (SELECT {_Q11_VALUE} FROM lineitem)
""",
    tags=("relational", "tpch", "agg", "subquery"),
)
def rel_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: important stock identification. Parts whose total
    traded value exceeds 0.0005 of the global traded value. (The
    fixture lacks partsupp, so value = sum(l_extendedprice *
    l_quantity) over lineitem instead of ps_supplycost * ps_availqty;
    the shape — group-agg HAVING against a global-scalar subquery —
    is identical.)

    Plan shape: ONE shuffle. The per-part aggregate keeps exact
    decimal sums; the global total is then re-aggregated FROM the
    per-part partials (decimal addition is associative, so this
    equals the oracle's whole-table sum bit-for-bit) — the fact
    table is scanned and shuffled once, not twice — and the 1-row
    total is broadcast back as a cross-join threshold.

    Precision note: the per-row product is ~5e6, so a scale-10
    decimal cast would scale it past 2^53 and the double->decimal
    conversion stops being exact (observed: DuckDB off by 1e-10 on
    some rows). The product is an exact 2-decimal quantity (2-decimal
    price x integer quantity), so DECIMAL(30,2) is lossless AND stays
    inside the exact range on both engines."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    # Exact decimal partials per part; cast to double only at the edges.
    per_part = li.groupBy("l_partkey").agg(
        F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(30,2)")).alias(
            "_dec_value"
        )
    )
    total = per_part.agg(F.sum("_dec_value").cast("double").alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_dec_value").cast("double") > 0.0005 * F.col("_total"))
        .select("l_partkey", F.col("_dec_value").cast("double").alias("part_value"))
    )


@query(
    "rel_q12_priority_by_latency",
    oracle="""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_returnflag
""",
    tags=("relational", "tpch", "join", "agg"),
)
def rel_q12_priority_by_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: shipping priority vs latency. For 1997 line items
    shipped >= 60 days after their order date, count urgent/high vs
    other priorities per group. (Stand-ins for missing columns:
    l_returnflag for l_shipmode, ship-vs-order latency for the
    receipt/commit-date race.)

    Plan shape: the lineitem side is filtered by the pushed-down
    shipdate range BEFORE the join; the latency predicate (which
    needs both tables) becomes a join condition evaluated
    JVM-side. orders is projected to 3 columns and broadcast; the
    single shuffle is the 3-group aggregate. Conditional counts are
    integer sums — exact everywhere."""
    li = ensure_parallelism(
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            F.broadcast(orders),
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") >= F.expr("o_orderdate + INTERVAL 60 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "rel_q13_order_count_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
    tags=("relational", "tpch", "outer-join", "agg"),
)
def rel_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution, including
    zero-order customers (the LEFT JOIN is the point: inner would
    silently drop them). The priority exclusion stands in for the
    original's o_comment NOT LIKE '%special%requests%' and lives in
    the JOIN condition, not a WHERE — moving it to WHERE would turn
    the outer join back into an inner one.

    Plan shape: two-level aggregate. Level 1 shuffles on c_custkey
    (COUNT of the nullable join output counts only matched rows —
    exactly the semantics the SQL COUNT(col) has); level 2 is a tiny
    histogram over at most a few hundred distinct counts."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = ensure_parallelism(
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "rel_q20_promotion_suppliers",
    oracle=f"""
WITH ps AS (
  SELECT l.l_suppkey, l.l_partkey,
         {_dsum('l.l_quantity')} AS shipped_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '%ring%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey, l.l_partkey
),
part_avg AS (
  SELECT l_partkey, {_davg('shipped_qty')} AS avg_qty
  FROM ps GROUP BY l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM supplier s
JOIN ps ON ps.l_suppkey = s.s_suppkey
JOIN part_avg pa ON pa.l_partkey = ps.l_partkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE ps.shipped_qty > 1.2 * pa.avg_qty
  AND r.r_name = 'EUROPE'
""",
    tags=("relational", "tpch", "subquery", "semi-join"),
)
def rel_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: potential part promotion. EUROPE suppliers who, for
    some '%ring%' part, shipped more than 1.2x the average
    supplier-level quantity of that part in 1997. (The fixture lacks
    partsupp.ps_availqty, so "excess availability" becomes "shipped
    above the per-part cross-supplier average" — the same correlated
    IN (... HAVING agg > correlated scalar) shape.)

    Decorrelation: level-1 agg per (suppkey, partkey); level-2 agg of
    those partials per partkey (the correlated AVG); broadcast the
    small per-part frame back; then a DISTINCT projection stands in
    for the IN-subquery semi-join. The supplier->nation->region chain
    is all broadcast. davg over the level-1 doubles re-enters decimal
    before summing, so both engines compare bit-identical doubles."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%ring%"))
    li = ensure_parallelism(
        load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
    )
    ps = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("shipped_qty"))
    )
    part_avg = ps.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        davg("shipped_qty").alias("avg_qty")
    )
    excess = ps.join(
        F.broadcast(part_avg),
        (F.col("l_partkey") == F.col("pa_partkey"))
        & (F.col("shipped_qty") > 1.2 * F.col("avg_qty")),
    ).select("l_suppkey")

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    return sup.join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi").select(
        "s_suppkey", "s_name"
    )
