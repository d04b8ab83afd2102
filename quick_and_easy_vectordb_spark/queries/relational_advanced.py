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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.numeric import davg, dsum
from quick_and_easy_vectordb_spark.operators.util import (
    ensure_parallelism,
    scaled_shuffle_partitions,
)
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


@query(
    "rel_q16_supplier_variety",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#4'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    tags=("relational", "subquery", "distinct-agg", "anti-join"),
)
def rel_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for partsupp): how many
    distinct suppliers ship each surviving (brand, type, size) combo,
    excluding blacklisted suppliers via NOT IN.

    NOT IN over a non-nullable key decorrelates to a LEFT ANTI join;
    the blacklist (suppliers with negative balance) is tiny and
    broadcast, so the exclusion costs no shuffle. The part-attribute
    filter is also a broadcast join. The only shuffle is the final
    COUNT(DISTINCT) aggregation, which Spark plans as a two-phase
    partial-distinct expand — no row leaves its partition carrying
    duplicate (group, suppkey) pairs."""
    bad_sup = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#4")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        ensure_parallelism(li)
        .join(F.broadcast(bad_sup), li["l_suppkey"] == bad_sup["s_suppkey"], "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == parts["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "rel_q21_sole_problem_supplier",
    oracle="""
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
""",
    tags=("relational", "subquery", "exists", "agg"),
    bench=True,
)
def rel_q21_sole_problem_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (l_returnflag='R' stands in for the missing
    receipt/commit dates): per supplier, how many finished
    multi-supplier orders where THIS supplier was the only one whose
    lines were returned.

    The EXISTS + NOT EXISTS pair would naively be two extra self-joins
    of lineitem. Decorrelated Spark plan: one per-order aggregate
    computing (distinct suppliers, distinct suppliers-with-R); then
    `EXISTS other-supplier` == n_supp >= 2 and `NOT EXISTS
    other-R-supplier` == n_r_supp == 1 (l1 itself has R). lineitem is
    shuffled twice on l_orderkey (agg + join-back) instead of three
    times, the two correlated predicates become integer comparisons,
    and AQE can co-locate the agg with the join since both hash on
    l_orderkey.

    The per-order COUNT(DISTINCT) pair Expands every row 2x and
    hash-aggregates per task; at a fixed shuffle-partition count that
    is a spill cliff (SCALING.md r5: 3x data → 7.1x wall on this
    shape's 10x→30x segment — the same signature the as-of shape had
    in r4). The plan-stat-scaled repartition below sizes the
    l_orderkey hash partitioning to the data so per-task aggregation
    state stays inside execution memory at any scale; the groupBy
    reuses that partitioning, so it replaces — not adds to — the
    aggregate's own exchange."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    li = ensure_parallelism(li)
    # 8 MB target (half the util default): the COUNT(DISTINCT) Expand
    # doubles every row before the per-task hash aggregate, so this
    # shape's in-memory state is ~2x the optimizer's row-width
    # estimate. Measured on the synthetic probe at 30x: 16 MB target
    # spills (11.2 s), 8 MB doesn't (6.5 s, 10x→30x segment 1.5x).
    n_parts = scaled_shuffle_partitions(li, target_bytes=8 << 20)
    if n_parts:
        li = li.repartition(n_parts, "l_orderkey")
    # Round-14: SEMI-FILTER lineitem to finished orders BEFORE the
    # per-order aggregate — the old shape aggregated every order and
    # discarded the non-finished ones only at the join. Equivalence is
    # exact: the stats are per-order over all that order's lines, and
    # the semi-filter drops whole orders the inner join dropped anyway.
    # The semi join keys on l_orderkey, the same partitioning the
    # aggregate and the join-back already use, so at scale it rides
    # the existing exchange; and because o_orderkey is unique, the
    # later l1 ⋈ fin_orders membership join became redundant and is
    # GONE (one fewer join). Measured isolated min 1.77 -> 1.50 s at
    # sf0.1; results identical row-for-row.
    fin_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    li = li.join(fin_orders, "l_orderkey", "left_semi")
    ord_stats = (
        li
        .groupBy(F.col("l_orderkey").alias("st_orderkey"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("n_r_supp"),
        )
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(ord_stats, F.col("l_orderkey") == ord_stats["st_orderkey"])
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "rel_q22_idle_customers",
    oracle=f"""
WITH eligible AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    AND c_acctbal > 0.0
),
avg_bal AS (SELECT {_davg('c_acctbal')} AS ab FROM eligible)
SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       {_dsum('c.c_acctbal')} AS totacctbal
FROM eligible c, avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c.c_nationkey
""",
    tags=("relational", "subquery", "anti-join", "agg"),
)
def rel_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey stands in for the phone country
    code; "idle" = no order since 2000, since every customer in the
    fixture has SOME order): per nation, count and total balance of
    customers in three segments whose balance beats the segment-wide
    positive average but who placed no recent order.

    The scalar AVG subquery is a 1-row decimal-exact aggregate
    broadcast-crossed into the filter (davg ⇒ the threshold double is
    identical on both engines). NOT EXISTS(recent orders) is a LEFT
    ANTI join on o_custkey — at 100 TB that anti join shuffles both
    sides on custkey; there is no smaller correct plan since the
    order set per customer is unbounded, but the date predicate
    pushes into the orders scan and the side projects to the single
    join column (pruning keeps the shuffle narrow)."""
    eligible = (
        load_table(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
            & (F.col("c_acctbal") > 0.0)
        )
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    avg_bal = eligible.agg(davg("c_acctbal").alias("ab"))
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        eligible.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, eligible["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@query(
    "rel_window_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
       ) AS VARCHAR) AS DOUBLE) AS trailing_30d_total,
       CAST(COUNT(*) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trailing_30d_orders
FROM orders
WHERE o_custkey % 97 = 0
""",
    tags=("relational", "window", "range-frame"),
)
def rel_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frames: per customer, each order's
    trailing-30-day spend and order count — the frame is defined by
    the ORDER BY *value* (order date within 30 days), not row offsets,
    so irregular order spacing is handled exactly.

    Spark's rangeBetween needs a numeric sort key, so the date is
    ordered as epoch seconds with a 2 592 000-second frame — identical
    semantics to DuckDB's INTERVAL RANGE frame and immune to timezone
    rendering. RANGE frames treat equal sort keys as peers (all
    included), so ties are deterministic without a tiebreak. The sum
    is decimal-exact inside the frame. One shuffle on o_custkey; the
    per-partition frame scan is O(rows + frame width)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 97 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2_592_000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,10)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d_total"),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_30d_orders"),
    )


@query(
    "rel_array_higher_order",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey,
         list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
  FROM lineitem
  WHERE l_orderkey % 13 = 0
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       array_to_string(qtys, ',') AS qtys_csv,
       CAST(list_sum(qtys) AS BIGINT) AS qty_sum,
       CAST(len(list_filter(qtys, x -> x > 25)) AS BIGINT) AS n_large,
       CAST(CASE WHEN len(list_filter(qtys, x -> x > 49)) > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS has_huge,
       CAST(list_sum(list_transform(qtys, x -> x * 2)) AS BIGINT) AS doubled_sum,
       CAST(list_sum(list_sort(qtys, 'DESC')[1:3]) AS BIGINT) AS top3_sum
FROM per_order
""",
    tags=("relational", "array", "higher-order"),
)
def rel_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function surface: per order, the sorted
    quantity array and five derived scalars — fold (aggregate),
    filter+size, exists, transform, and slice-of-sorted — all
    Catalyst lambda expressions, fully codegen'd, zero UDFs.

    collect_list order is partition-dependent, so the array is
    canonicalized with sort_array before anything consumes it —
    the rule that makes array aggregation deterministic at any
    parallelism. Quantities are integral doubles cast to long, so
    every fold is integer-exact. One shuffle (the groupBy); all the
    lambda math is per-row projection after it.

    The array is emitted as a CSV string (array_join) rather than a
    raw array column: the driver's pandas canonicalizer sorts every
    output column and cannot hash list cells, so a raw array can
    never earn a green CORRECTNESS row (r5 `err`: unhashable type
    'list'). Semantics are identical — the string is the sorted
    array, delimiter-joined, bit-stable across engines."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 13 == 0)
        .select("l_orderkey", F.col("l_quantity").cast("long").alias("qty"))
    )
    per_order = (
        ensure_parallelism(li)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("qty")).alias("qtys"))
    )
    qtys = F.col("qtys")
    zero = F.lit(0).cast("long")
    return per_order.select(
        "l_orderkey",
        F.array_join(qtys.cast("array<string>"), ",").alias("qtys_csv"),
        F.aggregate(qtys, zero, lambda acc, x: acc + x).alias("qty_sum"),
        F.size(F.filter(qtys, lambda x: x > 25)).cast("long").alias("n_large"),
        F.when(F.exists(qtys, lambda x: x > 49), 1).otherwise(0).cast("long").alias("has_huge"),
        F.aggregate(F.transform(qtys, lambda x: x * 2), zero, lambda acc, x: acc + x).alias("doubled_sum"),
        F.aggregate(
            F.slice(F.sort_array(qtys, asc=False), 1, 3), zero, lambda acc, x: acc + x
        ).alias("top3_sum"),
    )


@query(
    "rel_map_functions",
    oracle="""
WITH lines AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_orderkey % 17 = 0
  GROUP BY l_orderkey, l_linenumber
)
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(MAX(CASE WHEN ln = 1 THEN qty END) AS BIGINT) AS line1_qty,
       CAST(MAX(ln) AS BIGINT) AS max_line,
       CAST(SUM(qty) AS BIGINT) AS qty_total
FROM lines
GROUP BY l_orderkey
""",
    tags=("relational", "map", "higher-order"),
)
def rel_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per order, build a linenumber→qty map
    (map_from_entries over a sorted entry array) and read every output
    through map operations — map size (cardinality), point lookup
    (element_at), key-array max, and a fold over map_values.

    The oracle computes the same scalars relationally: MAP is a Spark
    column type with no hash-stable cross-engine encoding, so the
    contract is "map ops produce the right values", checked through
    scalar projections. Map keys must be unique, so quantities are
    pre-aggregated per (order, linenumber) — the fixture reuses line
    numbers within an order — and entry arrays are sorted before
    map_from_entries for partition-order determinism (same rule as
    collect_list)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 17 == 0)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("ln"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
    )
    lines = (
        ensure_parallelism(li)
        .groupBy("l_orderkey", "ln")
        .agg(F.sum("qty").alias("qty"))
    )
    m = F.map_from_entries(F.sort_array(F.collect_list(F.struct("ln", "qty"))))
    per_order = lines.groupBy("l_orderkey").agg(m.alias("line_qty"))
    zero = F.lit(0).cast("long")
    return per_order.select(
        "l_orderkey",
        F.size("line_qty").cast("long").alias("n_lines"),
        F.element_at("line_qty", F.lit(1)).alias("line1_qty"),
        F.array_max(F.map_keys("line_qty")).alias("max_line"),
        F.aggregate(F.map_values("line_qty"), zero, lambda acc, x: acc + x).alias("qty_total"),
    )


@query(
    "rel_json_roundtrip",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
       CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10)
            AS BIGINT) AS n_decades
FROM events
GROUP BY event_type
""",
    tags=("events", "json", "agg"),
)
def rel_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured JSON surface beyond path extraction: parse ``props``
    with an explicit schema (from_json → struct field access), re-emit
    it (to_json) and re-extract to prove the round trip, plus
    json_tuple-style multi-extraction — all JVM-side JSON machinery,
    no UDFs. Aggregates are integer-exact; k//10 uses integer division
    (DuckDB `//`), which truncates identically on both engines."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.withColumn("p", F.from_json("props", schema))
    # to_json → get_json_object round trip must reproduce k exactly;
    # fold that assertion into the value used downstream.
    k_rt = F.get_json_object(F.to_json(F.col("p")), "$.k").cast("long")
    return (
        parsed.withColumn("k", k_rt)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0)).alias("n_even"),
            F.countDistinct(F.expr("k div 10")).alias("n_decades"),
        )
    )


@query(
    "rel_exact_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5)  AS p50,
       quantile_cont(l_extendedprice, 0.75) AS p75,
       quantile_cont(l_quantity, 0.5)       AS median_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("relational", "percentile", "agg"),
)
def rel_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    ``percentile`` == DuckDB ``quantile_cont``: same sort + same
    ``lo + (hi-lo)*frac`` interpolation — verified bitwise identical
    on this fixture). Exact percentile shuffles all group values to
    the aggregator; at 100 TB swap in approx_percentile (t-digest,
    rows-only check — see udf_approx_quantiles) and keep this as the
    small-group/high-accuracy path."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.25).alias("p25"),
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.75).alias("p75"),
        F.percentile("l_quantity", 0.5).alias("median_qty"),
    )


@query(
    "rel_ivm_delta_agg",
    oracle=f"""
WITH base AS (SELECT * FROM orders WHERE o_orderdate < DATE '1997-01-01'),
final AS (
  SELECT * FROM base WHERE o_orderkey % 10 <> 0
  UNION ALL
  SELECT * FROM orders WHERE o_orderdate >= DATE '1997-01-01'
)
SELECT o_custkey, COUNT(*) AS n_orders,
       {_dsum('o_totalprice')} AS revenue
FROM final GROUP BY o_custkey
""",
    tags=("relational", "ivm", "incremental", "agg"),
)
def rel_ivm_delta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a materialized per-customer
    aggregate is updated from a signed CHANGESET (inserts +1, deletes
    −1) WITHOUT recomputing over the base data — the maintained state
    must equal a full recomputation, and the oracle IS that full
    recomputation, so the equivalence is hash-checked.

    Scenario: the base view aggregates orders before 1997-01-01; the
    delta inserts all later orders and deletes every base order whose
    key ≡ 0 (mod 10). Maintenance = aggregate ONLY the delta (sign-
    weighted count and decimal sign-weighted revenue), full-outer-merge
    with the base aggregate, drop keys whose maintained count reaches
    zero.

    Why this is exact: both the base aggregate and the delta aggregate
    keep revenue in DECIMAL(30,10) until after the merge — decimal
    addition is associative, so base+delta equals the recomputed sum
    bit-for-bit under any partitioning (a double-typed running sum
    could NOT guarantee this). At 100 TB this is the nightly-pipeline
    pattern: the base agg is a stored table, only the day's changeset
    (orders of magnitude smaller) is scanned and shuffled, and the
    merge is a join keyed on the agg key."""
    _DEC = "decimal(30,10)"
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("date")
    base = o.filter(F.col("o_orderdate") < cutoff)
    inserts = o.filter(F.col("o_orderdate") >= cutoff).withColumn(
        "sign", F.lit(1).cast("long")
    )
    deletes = base.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "sign", F.lit(-1).cast("long")
    )
    delta = inserts.unionByName(deletes)

    base_agg = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("r0"),
    )
    delta_agg = delta.groupBy("o_custkey").agg(
        F.sum("sign").alias("dn"),
        F.sum((F.col("sign") * F.col("o_totalprice")).cast(_DEC)).alias("dr"),
    )
    zero_d = F.lit(0).cast("decimal(38,10)")
    merged = (
        base_agg.join(delta_agg, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            (
                F.coalesce(F.col("n0"), F.lit(0))
                + F.coalesce(F.col("dn"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("r0").cast("decimal(38,10)"), zero_d)
                + F.coalesce(F.col("dr").cast("decimal(38,10)"), zero_d)
            ).cast("double").alias("revenue"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return merged


@query(
    "rel_scd2_intervals",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       o_orderdate AS valid_from,
       COALESCE(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                DATE '2200-01-01') AS valid_to,
       (lead(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) IS NULL)
         AS is_current
FROM orders
""",
    tags=("relational", "scd2", "window", "warehouse"),
)
def rel_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 interval construction: each
    customer's order stream becomes versioned rows with
    [valid_from, valid_to) ranges — valid_to is the NEXT version's
    start (lead over the change stream), open versions get a
    far-future sentinel (2200-01-01: representable in Arrow's ns
    timestamps, unlike the classic 9999-12-31) and is_current = true. This is the standard
    warehouse history-table build (and the dual of ev_asof_join, which
    QUERIES such intervals); the full tiebreak (date, orderkey) makes
    same-day changes deterministic, producing zero-length intervals
    exactly like production SCD2 pipelines do.

    Plan shape at 100 TB: one shuffle on the dimension key, one
    in-partition sort — the minimal possible for interval construction;
    no self-join (the naive formulation joins each row to its
    successor)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(nxt, F.lit("2200-01-01").cast("date")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "rel_dq_audit",
    oracle="""
SELECT 'customer_key_unique' AS check_name,
       CAST((SELECT COUNT(*) FROM
              (SELECT c_custkey FROM customer GROUP BY c_custkey
               HAVING COUNT(*) > 1)) AS BIGINT) AS n_violations,
       (SELECT COUNT(*) FROM customer) AS n_checked
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'orders_custkey_resolves',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'orders_totalprice_positive',
       CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0
             OR o_totalprice IS NULL) AS BIGINT),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'lineitem_discount_in_range',
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_discount < 0
             OR l_discount > 1 OR l_discount IS NULL) AS BIGINT),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'lineitem_ships_after_order',
       CAST((SELECT COUNT(*) FROM lineitem l JOIN orders o
             ON o.o_orderkey = l.l_orderkey
             WHERE CAST(l.l_shipdate AS DATE) < o.o_orderdate) AS BIGINT),
       (SELECT COUNT(*) FROM lineitem)
""",
    tags=("relational", "data-quality", "audit", "anti-join"),
)
def rel_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the Deequ/Great-Expectations
    operator class): six constraint checks — key uniqueness,
    referential integrity in both directions (anti-join orphan
    detection), domain ranges, null presence, and a cross-TABLE
    ordering invariant (no lineitem ships before its order date —
    checked through the join, the audit class single-table tools miss) — each reduced to (check_name, n_violations,
    n_checked). A pipeline gates its publish step on
    ``n_violations == 0``.

    Plan shape at 100 TB: every check is either a single
    map-side-combined aggregation over one scan or a broadcast/shuffle
    ANTI-join whose probe side streams (never materializing
    violations); the six checks are independent one-row aggregates
    unioned at the end, so a scheduler can run them as parallel jobs
    sharing scans. Uniqueness on the full key set is the only
    mandatory wide shuffle — exactly the theoretical minimum."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def row(name, viol_df, checked_df):
        return (
            viol_df.agg(F.count(F.lit(1)).alias("n_violations"))
            .crossJoin(checked_df.agg(F.count(F.lit(1)).alias("n_checked")))
            .select(
                F.lit(name).alias("check_name"), "n_violations", "n_checked"
            )
        )

    dup_keys = (
        c.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    )
    orphan_li = li.join(
        o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti"
    )
    orphan_o = o.join(
        c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_anti"
    )
    bad_price = o.filter(
        (F.col("o_totalprice") <= 0) | F.col("o_totalprice").isNull()
    )
    bad_disc = li.filter(
        (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1)
        | F.col("l_discount").isNull()
    )
    bad_dates = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate").cast("date") < F.col("o_orderdate"))

    return (
        row("customer_key_unique", dup_keys, c)
        .unionByName(row("lineitem_orphan_orderkey", orphan_li, li))
        .unionByName(row("orders_custkey_resolves", orphan_o, o))
        .unionByName(row("orders_totalprice_positive", bad_price, o))
        .unionByName(row("lineitem_discount_in_range", bad_disc, li))
        .unionByName(row("lineitem_ships_after_order", bad_dates, li))
    )


_SEGS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@query(
    "rel_unpivot_segment_year",
    oracle=f"""
WITH wide AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         {", ".join(
             f'''CAST(CAST(SUM(CASE WHEN c_mktsegment = '{s}' THEN CAST(o_totalprice AS DECIMAL(30,10)) END) AS VARCHAR) AS DOUBLE) AS "{s}"'''
             for s in _SEGS
         )}
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1
)
{" UNION ALL ".join(
    f'''SELECT yr, '{s}' AS segment, "{s}" AS revenue FROM wide WHERE "{s}" IS NOT NULL'''
    for s in _SEGS
)}
""",
    tags=("relational", "unpivot", "melt"),
)
def rel_unpivot_segment_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/MELT — the inverse of rel_pivot_segment_year: the wide
    per-segment revenue cross-tab folds back to tidy
    (yr, segment, revenue) rows via the native ``DataFrame.unpivot``
    (Spark 3.4+ melt), dropping NULL cells like SQL UNPIVOT does. The
    round trip pivot→unpivot is the schema-normalization every
    ingestion pipeline needs when sources deliver spreadsheet-shaped
    data.

    Plan shape: unpivot is an Expand node — a pure map-side row
    multiplication (one input row → ≤ |segments| rows), no shuffle
    beyond the upstream cross-tab's own aggregation. The oracle mirrors
    with a per-column UNION ALL over the same wide CTE."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .pivot("c_mktsegment", list(_SEGS))
        .agg(dsum("o_totalprice"))
    )
    return (
        wide.unpivot("yr", list(_SEGS), "segment", "revenue")
        .filter(F.col("revenue").isNotNull())
    )


@query(
    "rel_bloom_semi_join",
    oracle=f"""
SELECT l_returnflag,
       {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
""",
    tags=("relational", "join", "runtime-filter", "bloom"),
)
def rel_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join of the fact table against a selective dimension
    predicate, executed as an explicit BLOOM RUNTIME FILTER
    (operators/bloom.py): urgent-order keys hash into a 2^16-bit filter
    built by one tiny aggregation, the ~8 KB word array broadcasts to
    the lineitem scan where three bit-tests run inside whole-stage
    codegen, and only surviving rows enter the exact semi-join that
    removes the bloom's false positives. The result is row-identical to
    the plain semi-join (the oracle) — what changes is WHERE rows die:
    before the join shuffle instead of inside it.

    At 100 TB this is the difference between shuffling the full fact
    table (~600 B/row x 10^11 rows) and shuffling ~selectivity of it
    plus a <=1% false-positive tail; it is also exactly what Spark's
    own ``runtime.bloomFilter`` optimization injects when its
    heuristics fire — expressed here as a first-class operator so the
    pruning is guaranteed, tunable (m_bits, k), and usable on plan
    shapes the optimizer declines."""
    from quick_and_easy_vectordb_spark.operators.bloom import bloom_semi_join

    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return (
        bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@query(
    "rel_rfm_segmentation",
    oracle=f"""
WITH cust AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         {_dsum('o_totalprice')} AS spend
  FROM orders GROUP BY o_custkey
),
g AS (
  SELECT MAX(o_orderdate) AS max_date,
         CAST(COUNT(*) AS BIGINT) AS total_orders,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
         {_davg('o_totalprice')} AS avg_price
  FROM orders
)
SELECT (last_order >= max_date - INTERVAL 180 DAY) AS recent,
       (n_orders * n_cust >= total_orders) AS frequent,
       (spend > n_orders * avg_price) AS high_value,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders
FROM cust CROSS JOIN g
GROUP BY 1, 2, 3
""",
    tags=("relational", "segmentation", "agg"),
)
def rel_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the standard marketing-analytics cube. Each customer gets three
    boolean scores against DATA-DERIVED thresholds: ordered within 180
    days of the corpus's last order (R), order count at or above the
    global mean (F, compared as the integer cross-multiply
    ``n_orders * n_cust >= total_orders`` so no division is involved),
    and spend above ``n_orders x global avg order value`` (M — i.e.
    their average order is above the global average). Output: the 8
    segment cells with customer and order counts.

    Determinism: R compares exact timestamps (MAX is order-independent,
    interval arithmetic is exact micros); F is pure integers; M
    multiplies the customer's decimal-exact spend (dsum) against
    ``n_orders * avg_price`` where avg_price is the decimal-exact
    global davg — every operand is bit-identical across engines, so
    the strict inequality cannot flip.

    Plan shape at 100 TB: one groupBy(custkey) aggregation of orders
    (map-side partials), one 1-row global aggregate broadcast back
    (BroadcastNestedLoopJoin of a single row — free), one 8-cell final
    aggregation. No fact-table join anywhere."""
    o = ensure_parallelism(load_table(spark, sf_dir, "orders"))
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("cust_orders"),
        dsum("o_totalprice").alias("spend"),
    )
    g = o.agg(
        F.max("o_orderdate").alias("max_date"),
        F.count(F.lit(1)).alias("total_orders"),
        F.countDistinct("o_custkey").alias("n_cust"),
        davg("o_totalprice").alias("avg_price"),
    )
    return (
        cust.join(F.broadcast(g))
        .select(
            (
                F.col("last_order")
                >= F.col("max_date") - F.expr("INTERVAL 180 DAY")
            ).alias("recent"),
            (F.col("cust_orders") * F.col("n_cust") >= F.col("total_orders")).alias(
                "frequent"
            ),
            (F.col("spend") > F.col("cust_orders") * F.col("avg_price")).alias(
                "high_value"
            ),
            "cust_orders",
        )
        .groupBy("recent", "frequent", "high_value")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cust_orders").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated / lateral / recursive subquery surface (round 5 batch 2).
# The reference has no query language at all (app.py is imperative
# pandas); these pin down the decorrelation machinery a real engine
# needs: Catalyst rewrites each into joins, and the oracle checks the
# rewrite is semantics-preserving.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c.c_custkey, c.c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c.c_acctbal DESC, c.c_custkey
  LIMIT 2
) t
"""


@query(
    "rel_lateral_topn",
    oracle=_LATERAL_SQL,
    tags=("relational", "lateral", "topn", "sql"),
)
def rel_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via a correlated LATERAL subquery — the 'for
    each outer row, run this parameterized inner query' surface. The
    SQL text is byte-identical in Spark and DuckDB; what differs is
    the physical strategy, and that is the point of the test: Catalyst
    decorrelates the LATERAL LIMIT into a ranked window join rather
    than re-executing the inner query per nation.

    Plan shape at 100 TB: with nation as the tiny side, the
    decorrelated plan is one shuffle of customer by nationkey with a
    per-key top-2 heap (WindowGroupLimit pushes the LIMIT below the
    sort) — never a nested re-scan of customer per outer row, which is
    what a naive lateral executor would do and what kills correlated
    queries at scale."""
    from quick_and_easy_vectordb_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_SQL)


_CORR_AVG = (
    "CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*)"
)


@query(
    "rel_correlated_scalar_subquery",
    oracle=f"""
SELECT n.n_name,
       COUNT(*) AS n_above,
       {_dsum('c.c_acctbal')} AS above_balance
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_acctbal > (
  SELECT CAST(CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
         / COUNT(*)
  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
)
GROUP BY n.n_name
""",
    tags=("relational", "subquery", "correlated", "sql"),
)
def rel_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subquery in a predicate: customers whose
    balance beats their own nation's average, rolled up per nation.
    Catalyst decorrelates the per-row aggregate subquery into one
    groupBy(nationkey) + join — executed once over the whole table,
    not once per row.

    Determinism across engines: the inner average is the decimal-exact
    sum (associative int128 adds, any partitioning) divided once by
    the count, so both engines compare against the bit-identical
    double and the strict `>` can never flip on fold order.

    Plan shape at 100 TB: two scans of customer (one aggregated
    map-side to ~|nations| rows, broadcast back) + one broadcast join
    to nation. No per-row re-execution, no shuffle of the wide side
    beyond the final 25-group rollup."""
    from quick_and_easy_vectordb_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(f"""
        SELECT n.n_name,
               COUNT(*) AS n_above,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,10))) AS DOUBLE)
                 AS above_balance
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (
          SELECT {_CORR_AVG}
          FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
        )
        GROUP BY n.n_name
    """)


_LADDER_SQL = """
WITH RECURSIVE ladder (k) AS (
  SELECT 1
  UNION ALL
  SELECT k + 1 FROM ladder WHERE k < 8
),
uc AS (
  SELECT user_id, COUNT(*) AS n_events
  FROM events
  GROUP BY user_id
)
SELECT CAST(k AS BIGINT) AS k,
       COUNT(*) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS total_events
FROM ladder JOIN uc ON uc.n_events >= ladder.k
GROUP BY k
"""


@query(
    "rel_recursive_engagement_ladder",
    oracle=_LADDER_SQL,
    tags=("relational", "recursive-cte", "sql"),
)
def rel_recursive_engagement_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE surface (iteration expressed in SQL): an
    engagement ladder — for each k = 1..8, how many users produced at
    least k events and how many events they account for. The recursive
    member generates the k-ladder; the probe is a θ-join against the
    per-user counts. All-integer arithmetic, so the two engines agree
    bit-for-bit with no decimal scaffolding.

    Plan shape at 100 TB: the recursion produces 8 driver-side rows
    (depth is a constant, not data-dependent), which broadcast onto
    the per-user aggregate — one map-side-combined groupBy(user_id)
    shuffle, then an 8-way multiply of the ~|users| aggregate, never
    of the raw events."""
    from quick_and_easy_vectordb_spark.sources.catalog import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(_LADDER_SQL)


@query(
    "rel_pit_dimension_join",
    oracle=f"""
WITH dim AS (
  SELECT o_custkey,
         o_orderkey,
         o_orderdate AS valid_from,
         COALESCE(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                  TIMESTAMP '2200-01-01') AS valid_to,
         (lead(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) IS NULL)
           AS is_current
  FROM orders
),
fact AS (
  SELECT o.o_custkey AS custkey, l.l_shipdate AS ship,
         l.l_extendedprice AS price
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT d.is_current,
       COUNT(*) AS n_lines,
       {_dsum('f.price')} AS revenue
FROM fact f
JOIN dim d ON d.o_custkey = f.custkey
          AND f.ship >= d.valid_from AND f.ship < d.valid_to
GROUP BY d.is_current
""",
    tags=("relational", "scd2", "point-in-time", "warehouse"),
)
def rel_pit_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME dimension join — the consumption side of the SCD2
    history table (rel_scd2_intervals builds it): each shipment joins
    the customer's dimension version that was CURRENT at ship time
    (interval containment valid_from <= ship < valid_to), the lookup
    every compliant warehouse fact load performs. Zero-width intervals
    (same-day successive versions) can never match — containment
    semantics resolve the same-day tiebreak that a naive as-of join
    would get wrong. Rolled up by version currency.

    Plan shape at 100 TB: the fact→orders hookup is a key equi-join;
    the PIT join is an equi-join on the dimension key with the range
    containment as residual — co-partitioned by custkey, never a
    cross product (per-key version lists are small by construction).
    At extreme version counts the same result comes from the as-of
    operator (operators/asof.py) on valid_from with a one-shuffle
    union-and-window plan."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dim = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(w),
            F.lit("2200-01-01").cast("timestamp"),
        ).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    fact = li.join(
        o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey")
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("l_shipdate").alias("ship"),
        F.col("l_extendedprice").alias("price"),
    )
    joined = fact.join(
        dim,
        (dim.o_custkey == fact.custkey)
        & (fact.ship >= dim.valid_from)
        & (fact.ship < dim.valid_to),
    )
    return joined.groupBy("is_current").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum("price").alias("revenue"),
    )


@query(
    "rel_fuzzy_entity_match",
    oracle="""
WITH dirty AS (
  SELECT c_custkey AS orig_key,
         substr(c_name, 1, 9 + c_custkey % 6)
           || substr(c_name, 11 + c_custkey % 6) AS dirty_name,
         substr(c_name, 17, 2) AS blk
  FROM customer
),
clean AS (
  SELECT c_custkey, c_name, substr(c_name, 17, 2) AS blk FROM customer
),
cand AS (
  SELECT d.orig_key, c.c_custkey AS match_key,
         levenshtein(d.dirty_name, c.c_name) AS lev
  FROM dirty d JOIN clean c ON c.blk = d.blk
  WHERE levenshtein(d.dirty_name, c.c_name) <= 1
),
ranked AS (
  SELECT orig_key, match_key, lev,
         ROW_NUMBER() OVER (PARTITION BY orig_key ORDER BY lev, match_key)
           AS rn,
         COUNT(*) OVER (PARTITION BY orig_key) AS n_cands
  FROM cand
)
SELECT COUNT(*) AS n_matched,
       CAST(SUM(CASE WHEN match_key = orig_key THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(SUM(CASE WHEN n_cands > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ambiguous
FROM ranked WHERE rn = 1
""",
    tags=("relational", "entity-resolution", "fuzzy-join", "blocking"),
)
def rel_fuzzy_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTITY RESOLUTION / record linkage — the data-integration
    operator every ingest pipeline with human-entered keys needs: a
    deterministically corrupted registry (one character deleted from
    each name at a key-dependent position — a typo model) is matched
    back against the clean registry with a BLOCKED fuzzy join: block
    on the last-2-character suffix (surviving the corruption by
    construction), join only within blocks, filter edit distance <= 1,
    and resolve each record to its best candidate (min distance, min
    key) with an ambiguity flag. The summary row reports match count,
    accuracy against ground truth, and ambiguous-match count.

    Plan shape at 100 TB: blocking turns the quadratic all-pairs
    levenshtein into |block|²-bounded work per block — the same
    candidate-then-verify layout as MinHash-LSH (blocks ≡ bands), and
    the same skew story, with the same guard WIRED (round-6): a COUNT
    window over the blk partitioning the join needs anyway diverts
    blocks larger than ``max_block_size`` out of the quadratic
    verify — a block that hot is boilerplate-keyed, and its members
    belong on the MinHash-LSH mega-cluster path
    (operators/dedup.py:lsh_mega_clusters), not in an edit-distance
    join. The cap shares the join's shuffle, so it costs no extra
    exchange; at test scale no block approaches it, so the oracle
    comparison is exact. Levenshtein runs JVM-codegen'd inside the
    join; the survivor pick is one window over candidates, never the
    corpus."""
    max_block_size = 4096
    c = ensure_parallelism(  # round-14: single-split scan fed heavy per-row work
        load_table(spark, sf_dir, "customer")
    )
    dirty = c.select(
        F.col("c_custkey").alias("orig_key"),
        F.concat(
            F.expr("substr(c_name, 1, 9 + c_custkey % 6)"),
            F.expr("substr(c_name, 11 + c_custkey % 6)"),
        ).alias("dirty_name"),
        F.substring("c_name", 17, 2).alias("blk"),
    )
    clean = c.select(
        F.col("c_custkey").alias("match_key"),
        "c_name",
        F.substring("c_name", 17, 2).alias("blk"),
    )
    wb = Window.partitionBy("blk")
    clean = (
        clean.withColumn("n_block", F.count(F.lit(1)).over(wb))
        .filter(F.col("n_block") <= max_block_size)
        .drop("n_block")
    )
    cand = (
        dirty.join(clean, "blk")
        .withColumn("lev", F.levenshtein("dirty_name", "c_name"))
        .filter(F.col("lev") <= 1)
    )
    w = Window.partitionBy("orig_key").orderBy("lev", "match_key")
    wc = Window.partitionBy("orig_key")
    ranked = cand.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_cands", F.count(F.lit(1)).over(wc)
    )
    best = ranked.filter(F.col("rn") == 1)
    return best.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum(F.when(F.col("match_key") == F.col("orig_key"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.sum(F.when(F.col("n_cands") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_ambiguous"),
    )


@query(
    "rel_running_total_by_month",
    oracle="""
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS rev_dec
  FROM orders GROUP BY 1
)
SELECT month, n_orders,
       CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(SUM(rev_dec) OVER (
              ORDER BY month ROWS UNBOUNDED PRECEDING)
            AS VARCHAR) AS DOUBLE) AS cumulative_revenue
FROM m
""",
    tags=("relational", "window", "running-total", "bi"),
)
def rel_running_total_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue over the MONTHLY aggregate series — the
    two-level BI staple (pre-aggregate, then window over the tiny
    series) that differs structurally from row-level running sums
    (rel_window_lag_running): the window runs over ~|months| rows, so
    its sort is free regardless of fact volume. The running total
    itself is a decimal window sum (associative, order-pinned by the
    frame), converted once — bit-stable at any partitioning.

    Plan shape at 100 TB: one map-side-combined groupBy(month) is the
    only fact-sized stage; the unpartitioned window is safe BECAUSE
    the series is bounded by the calendar, not the data — the
    single-partition window anti-pattern applies to row-level frames,
    not to post-aggregate series.

    Exactness: revenue stays DECIMAL through BOTH levels (per-row
    casts happen on small raw values where the 1e-10 quantum washes
    out binary noise; re-casting an already-large pre-aggregated
    double diverges between engines — Spark's double→decimal goes
    through the shortest string repr, DuckDB's through the exact
    binary expansion), converted to double only at the output — the
    rel_partial_agg_merge rule applied to a window."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(30,10)")).alias("rev_dec"),
    )
    w = (
        Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return m.select(
        "month",
        "n_orders",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("cumulative_revenue"),
    )


@query(
    "rel_topn_with_ties",
    oracle="""
WITH r AS (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         RANK() OVER (PARTITION BY c_mktsegment
                      ORDER BY ROUND(c_acctbal, -2) DESC) AS rnk,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY ROUND(c_acctbal, -2) DESC, c_custkey)
           AS rn
  FROM customer
)
SELECT c_mktsegment, c_custkey, c_acctbal,
       CAST(rnk AS BIGINT) AS rnk, CAST(rn AS BIGINT) AS rn
FROM r WHERE rnk <= 3
""",
    tags=("relational", "window", "rank", "ties"),
)
def rel_topn_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N WITH TIES (SQL:2008 FETCH FIRST ... WITH TIES semantics):
    RANK instead of ROW_NUMBER keeps every row tied at the cutoff —
    the correct leaderboard semantics when dropping a tied competitor
    is wrong. Balances are bucketed to the nearest 100 so ties
    actually occur; both ranking functions are emitted side by side,
    and the row count exceeding 3·|segments| is itself the proof that
    ties crossed the cutoff (row_number would return exactly 3 per
    segment). Ordering inside a tie is pinned by custkey for the
    deterministic rn column.

    Plan shape at 100 TB (round-6 rewrite): RANK cannot use the
    WindowGroupLimit heap that row_number top-k gets (the cutoff
    depends on peer counts), so a naive window ranks — i.e. fully
    sorts — EVERY row per segment. Instead the cutoff VALUE is
    derived from a per-(segment, bucket) count aggregate (map-side
    partial; output is |segments|·|distinct buckets| rows, tiny by
    construction): a bucket survives iff 1 + rows in strictly higher
    buckets ≤ 3, exactly RANK's peer-count rule. The min surviving
    bucket per segment is broadcast back and filters the fact BEFORE
    the window shuffle, so the full sort runs over only the handful
    of tied-at-the-top rows per segment. Because the filter keeps a
    prefix of the window order (every row ranked ahead of a survivor
    also survives), rank/row_number over the filtered set are
    IDENTICAL to the unfiltered values — same hash, ~|answer|-sized
    sort instead of ~|table|."""
    c = load_table(spark, sf_dir, "customer")
    bucket = F.round(F.col("c_acctbal"), -2)
    with_bucket = c.select(
        "c_mktsegment", "c_custkey", "c_acctbal", bucket.alias("bal_bucket")
    )
    # Per-(segment, bucket) row counts: partial-agg shuffle of a
    # two-int payload, output cardinality = segments x buckets.
    counts = with_bucket.groupBy("c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    ahead = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.desc("bal_bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cutoffs = (
        counts.withColumn(
            "bucket_rank", F.lit(1) + F.coalesce(F.sum("n_rows").over(ahead), F.lit(0))
        )
        .filter(F.col("bucket_rank") <= 3)
        .groupBy("c_mktsegment")
        .agg(F.min("bal_bucket").alias("cutoff_bucket"))
    )
    survivors = with_bucket.join(
        F.broadcast(cutoffs), "c_mktsegment"
    ).filter(F.col("bal_bucket") >= F.col("cutoff_bucket"))
    wr = Window.partitionBy("c_mktsegment").orderBy(F.desc("bal_bucket"))
    wn = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("bal_bucket"), F.asc("c_custkey")
    )
    return survivors.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.rank().over(wr).cast("long").alias("rnk"),
        F.row_number().over(wn).cast("long").alias("rn"),
    ).filter(F.col("rnk") <= 3)


@query(
    "rel_skyline_frontier",
    oracle="""
WITH oc AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
),
cu AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal,
         COALESCE(oc.n_orders, 0) AS n_orders
  FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
),
per_n AS (
  SELECT n_orders, MAX(c_acctbal) AS max_bal
  FROM cu GROUP BY n_orders
),
cut AS (
  SELECT n_orders, max_bal,
         MAX(max_bal) OVER (ORDER BY n_orders DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_bal_more_orders
  FROM per_n
)
SELECT cu.c_custkey, cu.c_name, cu.n_orders, cu.c_acctbal
FROM cu JOIN cut ON cut.n_orders = cu.n_orders
WHERE cu.c_acctbal = cut.max_bal
  AND (cut.best_bal_more_orders IS NULL
       OR cu.c_acctbal > cut.best_bal_more_orders)
""",
    tags=("relational", "skyline", "window", "olap"),
)
def rel_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE / PARETO-FRONTIER query (Börzsönyi et al. 2001, the
    classic `SKYLINE OF` operator no SQL engine ships natively):
    customers not DOMINATED on (order count ↑, account balance ↑) —
    kept iff no other customer is at least as good on both axes and
    strictly better on one. The multi-objective "best customers"
    view a single ORDER BY cannot express.

    2-D dominance decomposes into two window tests over the
    PRE-AGGREGATED per-count maxima: keep a customer iff (a) its
    balance equals the max at its order count (no same-count
    dominator) and (b) strictly exceeds the best balance at any
    HIGHER count (no more-active dominator; running max over the
    count-descending series). Ties on both axes are all kept —
    standard skyline semantics. Comparisons only, no arithmetic, so
    doubles are engine-exact.

    Plan shape at 100 TB: the per-customer order count is the only
    data-sized shuffle (map-side combined); per_n has O(distinct
    counts) rows — its unpartitioned running-max window is over a
    few hundred rows and the cutoff table broadcasts back onto the
    customer scan. A naive NOT EXISTS dominance self-join is O(N²);
    this is one agg + one tiny window + one broadcast join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    oc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    cu = (
        cust.join(oc, cust.c_custkey == oc.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
        )
    )
    per_n = cu.groupBy("n_orders").agg(F.max("c_acctbal").alias("max_bal"))
    w = (
        Window.orderBy(F.desc("n_orders"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cut = per_n.select(
        "n_orders",
        "max_bal",
        F.max("max_bal").over(w).alias("best_bal_more_orders"),
    )
    return (
        cu.join(F.broadcast(cut), "n_orders")
        .filter(
            (F.col("c_acctbal") == F.col("max_bal"))
            & (
                F.col("best_bal_more_orders").isNull()
                | (F.col("c_acctbal") > F.col("best_bal_more_orders"))
            )
        )
        .select("c_custkey", "c_name", "n_orders", "c_acctbal")
    )


# --------------------------------------------------------------------------
# Round 7: compliance erasure cascade + distributed NTILE
# --------------------------------------------------------------------------


@query(
    "rel_gdpr_cascade_erasure",
    oracle=f"""
WITH erased AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
),
dead_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM erased)
),
dead_li AS (
  SELECT l_orderkey FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM dead_orders)
),
kept_li AS (
  SELECT l_extendedprice, l_discount FROM lineitem
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM dead_orders)
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM erased) AS n_customers_erased,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM dead_orders) AS n_orders_erased,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM dead_li) AS n_lineitems_erased,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM kept_li) AS n_lineitems_kept,
  (SELECT {_dsum('l_extendedprice * (1 - l_discount)')} FROM kept_li)
    AS kept_revenue
""",
    tags=("relational", "compliance", "erasure", "anti-join"),
)
def rel_gdpr_cascade_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-BE-FORGOTTEN cascade — the compliance deletion every
    production dataset must support: a deletion set of customers
    (here: custkey % 97 = 0, standing in for the request queue)
    propagates through the FK graph (customer → orders → lineitem),
    and the job reports the blast radius per table plus an integrity
    proof over the SURVIVING data (kept-lineitem count + decimal-exact
    kept revenue — the number that must not change when the erasure
    re-runs, i.e. idempotence evidence).

    Plan shape at 100 TB: the deletion set and the dead-order keyset
    are each orders-of-magnitude smaller than their fact tables, so
    both cascade hops are BROADCAST joins (semi for the blast counts,
    anti for the survivors) — the fact tables stream through
    unshuffled, and the five summary numbers are map-side-combined
    1-row aggregates. In a lakehouse this materializes as a
    partition-preserving anti-join rewrite of each table."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    erased = c.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    dead_o = o.join(
        F.broadcast(erased), o.o_custkey == erased.c_custkey, "leftsemi"
    ).select("o_orderkey")
    dead_li = li.join(
        F.broadcast(dead_o), li.l_orderkey == dead_o.o_orderkey, "leftsemi"
    )
    kept_li = li.join(
        F.broadcast(dead_o), li.l_orderkey == dead_o.o_orderkey, "leftanti"
    )
    n_cust = erased.agg(F.count(F.lit(1)).cast("long").alias("n_customers_erased"))
    n_ord = dead_o.agg(F.count(F.lit(1)).cast("long").alias("n_orders_erased"))
    n_dead = dead_li.agg(F.count(F.lit(1)).cast("long").alias("n_lineitems_erased"))
    kept = kept_li.agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems_kept"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "kept_revenue"
        ),
    )
    return (
        n_cust.crossJoin(F.broadcast(n_ord))
        .crossJoin(F.broadcast(n_dead))
        .crossJoin(F.broadcast(kept))
    )


@query(
    "rel_ntile_deciles",
    oracle=f"""
WITH r AS (
  SELECT c_acctbal, NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
  FROM customer
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal,
       {_dsum('c_acctbal')} AS sum_bal
FROM r GROUP BY decile
""",
    tags=("relational", "window", "ntile", "distributed-rank"),
)
def rel_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECILE report over account balance — NTILE(10) with exact
    equal-size bucket semantics, computed WITHOUT the single-partition
    window a bare ``NTILE() OVER (ORDER BY …)`` forces in any engine.
    The global rank is assembled from the two-level distributed
    prefix sum (ev_ks_two_sample's scan shape): rows are
    range-bucketed on floor(c_acctbal/500), each bucket computes
    row_number in parallel, and a broadcast ~40-row offset table
    lifts local ranks to global ones. NTILE's uneven-bucket rule is
    then pure arithmetic on the rank: with N rows and k tiles, the
    first N % k tiles take ⌈N/k⌉ rows — exactly what the oracle's
    built-in NTILE produces, which is the point of the test.

    Plan shape at 100 TB: one shuffle on the range bucket (vs ALL
    rows to ONE partition for the naive window), tiny offset
    broadcast, then a map-side-combined decile rollup. This is how
    quantile bucketing should actually run on a 1000-executor
    cluster."""
    c = load_table(spark, sf_dir, "customer")
    b = c.select(
        "c_custkey",
        "c_acctbal",
        F.floor(F.col("c_acctbal") / F.lit(500.0)).alias("bkt"),
    )
    wloc = Window.partitionBy("bkt").orderBy("c_acctbal", "c_custkey")
    woff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        b.groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bkt",
            F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("off"),
            F.sum("cnt").over(wall).alias("n_total"),
        )
    )
    ranked = b.join(F.broadcast(offsets), "bkt").select(
        "c_acctbal",
        (F.col("off") + F.row_number().over(wloc)).alias("r"),
        "n_total",
    )
    # NTILE(k): size = N div k, rem = N mod k; ranks 1..rem*(size+1)
    # fall in the first rem (larger) tiles, the rest in size-row tiles.
    k = F.lit(10)
    size = (F.col("n_total") / k).cast("long")
    rem = F.col("n_total") % k
    r0 = F.col("r") - 1
    decile = F.when(
        r0 < rem * (size + 1), (r0 / (size + 1)).cast("long") + 1
    ).otherwise(rem + ((r0 - rem * (size + 1)) / size).cast("long") + 1)
    return (
        ranked.select("c_acctbal", decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            dsum("c_acctbal").alias("sum_bal"),
        )
        .select(F.col("decile").cast("long").alias("decile"), "n", "min_bal", "max_bal", "sum_bal")
    )


@query(
    "rel_temporal_integrity_audit",
    oracle="""
WITH scd AS (
  SELECT o_custkey AS k, o_orderkey AS ver,
         CAST(o_orderdate AS DATE) AS vf,
         COALESCE(lead(CAST(o_orderdate AS DATE))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey),
                  DATE '2200-01-01') AS vt
  FROM orders
),
corrupt AS (
  SELECT k, ver, vf,
         CASE WHEN ver % 37 = 0 THEN vt + 5 ELSE vt END AS vt
  FROM scd WHERE ver % 41 <> 0
),
seq AS (
  SELECT k, ver, vf, vt,
         lag(vt) OVER (PARTITION BY k ORDER BY vf, ver) AS prev_vt
  FROM corrupt
),
flags AS (
  SELECT k,
         CASE WHEN prev_vt IS NOT NULL AND vf < prev_vt THEN 1 ELSE 0 END
           AS ov,
         CASE WHEN prev_vt IS NOT NULL AND vf > prev_vt THEN 1 ELSE 0 END
           AS gp
  FROM seq
),
pit AS (
  SELECT k, COUNT(*) AS n_match
  FROM corrupt
  WHERE vf <= DATE '1995-06-15' AND DATE '1995-06-15' < vt
  GROUP BY k
)
SELECT CAST((SELECT COUNT(*) FROM corrupt) AS BIGINT) AS n_versions,
       CAST((SELECT COUNT(DISTINCT k) FROM corrupt) AS BIGINT) AS n_keys,
       CAST((SELECT SUM(ov) FROM flags) AS BIGINT) AS n_overlaps,
       CAST((SELECT SUM(gp) FROM flags) AS BIGINT) AS n_gaps,
       CAST((SELECT COUNT(*) FROM pit WHERE n_match > 1) AS BIGINT)
         AS n_pit_ambiguous_keys
""",
    tags=("relational", "scd2", "temporal-integrity", "data-quality"),
)
def rel_temporal_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL INTEGRITY audit of an SCD2 history table — the check
    every as-of join silently depends on: versions of a key must
    TILE time (no overlaps, no gaps) or point-in-time lookups return
    wrong or ambiguous rows. The audited table is the
    rel_scd2_intervals build deterministically CORRUPTED (versions
    with key % 37 = 0 get valid_to stretched by 5 days -> overlaps;
    versions with key % 41 = 0 are deleted -> gaps), so the audit
    provably detects both defect classes rather than vacuously
    passing on clean data. Violations are counted with one
    lag(valid_to) window per key (overlap: next starts before the
    previous ends; gap: after), plus a point-in-time probe
    (1995-06-15) counting keys whose lookup would match > 1 version
    — the downstream symptom an on-call engineer actually sees.

    Plan shape at 100 TB: two key-partitioned windows (interval
    build + audit) that reuse the same (k, vf, ver) sort order, one
    filtered aggregate for the PIT probe, five scalars. No
    self-join: the naive audit joins each version against every
    other version of its key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    scd = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("ver"),
        F.col("o_orderdate").cast("date").alias("vf"),
        F.coalesce(
            F.lead(F.col("o_orderdate").cast("date")).over(w),
            F.lit("2200-01-01").cast("date"),
        ).alias("vt"),
    )
    corrupt = scd.filter(F.col("ver") % 41 != 0).select(
        "k",
        "ver",
        "vf",
        F.when(F.col("ver") % 37 == 0, F.date_add("vt", 5))
        .otherwise(F.col("vt"))
        .alias("vt"),
    )
    w2 = Window.partitionBy("k").orderBy("vf", "ver")
    seq = corrupt.withColumn("prev_vt", F.lag("vt").over(w2))
    flags = seq.select(
        F.when(
            F.col("prev_vt").isNotNull() & (F.col("vf") < F.col("prev_vt")),
            1,
        )
        .otherwise(0)
        .alias("ov"),
        F.when(
            F.col("prev_vt").isNotNull() & (F.col("vf") > F.col("prev_vt")),
            1,
        )
        .otherwise(0)
        .alias("gp"),
    )
    probe = F.lit("1995-06-15").cast("date")
    pit = (
        corrupt.filter((F.col("vf") <= probe) & (probe < F.col("vt")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    return (
        corrupt.agg(
            F.count(F.lit(1)).cast("long").alias("n_versions"),
            F.countDistinct("k").cast("long").alias("n_keys"),
        )
        .crossJoin(
            flags.agg(
                F.sum("ov").cast("long").alias("n_overlaps"),
                F.sum("gp").cast("long").alias("n_gaps"),
            )
        )
        .crossJoin(
            pit.filter(F.col("n_match") > 1).agg(
                F.count(F.lit(1)).cast("long").alias("n_pit_ambiguous_keys")
            )
        )
    )


@query(
    "rel_wilson_ci_by_segment",
    oracle="""
WITH conv AS (
  SELECT c.c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderstatus = 'F')) AS BIGINT) AS k
  FROM customer c GROUP BY 1
)
SELECT segment, n, k,
       CAST(k AS DOUBLE) / n AS p_hat,
       (CAST(k AS DOUBLE) / n + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (2.0 * n)
        - CAST(1.96 AS DOUBLE) * sqrt((CAST(k AS DOUBLE) / n)
                      * (1.0 - CAST(k AS DOUBLE) / n) / n
                      + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (4.0 * n * n)))
         / (1.0 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / n) AS wilson_lo,
       (CAST(k AS DOUBLE) / n + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (2.0 * n)
        + CAST(1.96 AS DOUBLE) * sqrt((CAST(k AS DOUBLE) / n)
                      * (1.0 - CAST(k AS DOUBLE) / n) / n
                      + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (4.0 * n * n)))
         / (1.0 + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / n) AS wilson_hi
FROM conv
""",
    tags=("relational", "statistics", "wilson-interval", "proportions"),
)
def rel_wilson_ci_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON SCORE confidence intervals for per-segment conversion
    rates (customer has >= 1 finalized order) — the interval that,
    unlike the naive Wald +-1.96*sqrt(p(1-p)/n), stays inside [0,1]
    and behaves at small n or extreme p, which is why ranking UIs
    (Reddit's comment sort) and experiment dashboards use it. k and
    n are exact integers (conversion via one left-semi-join
    aggregate); the interval is the closed-form Wilson expression —
    the identical IEEE tree (two divisions, one sqrt, z = 1.96
    injected as the same literal) in both engines, so even the
    bounds hash-match bitwise.

    Plan shape at 100 TB: one semi-join of customers against the
    filtered orders keys (broadcastable after the status filter at
    higher selectivity; AQE picks), one map-side-combined segment
    aggregate, O(segments) closed-form rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    converted = (
        c.join(
            o.filter(F.col("o_orderstatus") == "F").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_semi",
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    totals = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    z2 = F.lit(1.96) * F.lit(1.96)
    p = F.col("k").cast("double") / F.col("n")
    n = F.col("n")
    halfw = F.lit(1.96) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    center = p + z2 / (F.lit(2.0) * n)
    denom = F.lit(1.0) + z2 / n
    # LEFT join + coalesce(k, 0): a segment where no customer converts
    # must still appear with k = 0 (the oracle's COUNT(*) FILTER keeps
    # it); an inner join would silently drop it on skewed corpora.
    joined = totals.join(converted, "segment", "left").withColumn(
        "k", F.coalesce(F.col("k"), F.lit(0).cast("long"))
    )
    return joined.select(
        "segment",
        "n",
        "k",
        p.alias("p_hat"),
        ((center - halfw) / denom).alias("wilson_lo"),
        ((center + halfw) / denom).alias("wilson_hi"),
    )


@query(
    "rel_join_skew_report",
    oracle="""
WITH k AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt,
         quantile_cont(cnt, 0.5) AS p50_cnt,
         quantile_cont(cnt, 0.99) AS p99_cnt
  FROM k
),
topk AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS top10_rows
  FROM (SELECT cnt FROM k ORDER BY cnt DESC, key LIMIT 10)
)
SELECT n_keys, n_rows, max_cnt, p50_cnt, p99_cnt,
       CAST(max_cnt AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_keys)
         AS skew_factor,
       CAST((SELECT top10_rows FROM topk) AS DOUBLE) / n_rows
         AS top10_share
FROM t
""",
    tags=("relational", "skew", "join-planning", "diagnostics"),
)
def rel_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW report — the diagnostic that decides BEFORE a
    big join whether to salt (ev_salted_join), broadcast, or let AQE
    split: per join key (o_custkey) the distinct-key count, max and
    p50/p99 per-key multiplicities, the SKEW FACTOR (max over mean —
    AQE's skewedPartitionFactor reasons on exactly this ratio), and
    the row share of the 10 hottest keys (the salting candidates).
    Counts exact; percentiles via the pinned percentile ==
    quantile_cont equivalence; top-10 cutoff a deterministic total
    order.

    Plan shape at 100 TB: one map-side-combined key count (the table
    this report reads is a byproduct of any shuffle planning), one
    scalar aggregate over it, one TakeOrdered(10). Never touches row
    payloads."""
    o = load_table(spark, sf_dir, "orders")
    k = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).persist()
    t = k.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.percentile("cnt", 0.5).alias("p50_cnt"),
        F.percentile("cnt", 0.99).alias("p99_cnt"),
    )
    topk = (
        k.orderBy(F.desc("cnt"), "key")
        .limit(10)
        .agg(F.sum("cnt").cast("long").alias("top10_rows"))
    )
    return t.crossJoin(F.broadcast(topk)).select(
        "n_keys",
        "n_rows",
        "max_cnt",
        "p50_cnt",
        "p99_cnt",
        (
            F.col("max_cnt").cast("double")
            / (F.col("n_rows").cast("double") / F.col("n_keys"))
        ).alias("skew_factor"),
        (F.col("top10_rows").cast("double") / F.col("n_rows")).alias(
            "top10_share"
        ),
    )


@query(
    "rel_mv_rollup_rewrite",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST((month(o_orderdate) - 1) // 3 + 1 AS BIGINT) AS qtr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS VARCHAR)
            AS DOUBLE) AS revenue
FROM orders
GROUP BY 1, 2
""",
    tags=("relational", "materialized-view", "rollup-rewrite",
          "optimizer"),
)
def rel_mv_rollup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZED-VIEW ROLLUP REWRITE, proven: a quarterly-revenue
    question is answered FROM the monthly-revenue MV (month -> quarter
    re-aggregation of the MV's partial sums), and the oracle computes
    the same quarters from BASE DATA — the hash equality is exactly
    the soundness condition an optimizer's MV-rewrite rule must
    discharge (aggregate associativity + grouping-set containment:
    quarter is a coarsening of month). Works bitwise because the MV
    stores DECIMAL partial sums (associative by construction), not
    doubles — the same reason rel_partial_agg_merge and
    ev_heavy_hitters_salted re-aggregate exactly; an MV storing float
    sums could NOT be rewritten against without drift, which is the
    production argument for decimal money columns.

    Plan shape at 100 TB: the question's cost drops from a fact-table
    scan to an O(months) scan of the MV — the entire economics of
    aggregate MVs; maintenance is rel_ivm_delta_agg's signed-delta
    pattern."""
    o = load_table(spark, sf_dir, "orders")
    mv = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(30,10)")).alias("rev_dec"),
    )
    return (
        mv.groupBy(
            F.col("yr").cast("long").alias("yr"),
            F.expr("CAST((mo - 1) div 3 + 1 AS BIGINT)").alias("qtr"),
        )
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("rev_dec").cast("string").cast("double").alias("revenue"),
        )
    )


@query(
    "rel_ivm_join_delta",
    oracle=f"""
WITH o_final AS (
  SELECT * FROM orders WHERE o_orderkey % 17 <> 0 OR o_orderkey % 13 = 0
),
c_final AS (SELECT c_custkey, c_mktsegment FROM customer)
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {_dsum('o.o_totalprice')} AS revenue
FROM o_final o JOIN c_final c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
""",
    tags=("relational", "ivm", "incremental", "join"),
)
def rel_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MAINTENANCE OF A JOIN VIEW — the bilinear delta
    rule Δ(A ⋈ B) = ΔA ⋈ B + A ⋈ ΔB + ΔA ⋈ ΔB, applied to a
    per-segment revenue rollup of orders ⋈ customer, with
    SIMULTANEOUS deltas on both sides:

      * fact side: base orders exclude keys ≡ 0 (mod 13); the delta
        INSERTS those and DELETES keys ≡ 0 (mod 17) from the base.
      * dimension side: in the base state every customer with
        c_custkey ≡ 0 (mod 19) was filed under segment 'MACHINERY';
        the delta re-files them under their true segment (an UPDATE =
        signed delete + insert — the SCD-style segment move).

    The Spark side NEVER recomputes the view from the final state:
    it aggregates the three sign-weighted delta joins (sign = s_A·s_B
    for the ΔA ⋈ ΔB term) plus the base view, merges, and drops
    zero-count groups. The oracle IS the full recomputation over the
    final state — the hash match is the soundness proof of the
    bilinear rule, exactly like rel_mv_rollup_rewrite proves the
    rollup rewrite. Revenue stays DECIMAL(30,10) through every term
    so the merge is associative (bit-stable under any partitioning).

    100 TB shape: the nightly pattern — base view is a stored
    O(segments) table; only the changesets (orders of magnitude
    smaller than the fact) are scanned; ΔO joins the dimension
    broadcast, O_base ⋈ ΔC is the one fact-sided scan but against a
    BROADCAST changed-key list and prunable to affected partitions;
    ΔO ⋈ ΔC is tiny×tiny."""
    _DEC = "decimal(30,10)"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment")

    o_base = o.filter(F.col("o_orderkey") % 13 != 0)
    do_ins = o.filter(F.col("o_orderkey") % 13 == 0).withColumn(
        "s_o", F.lit(1).cast("long"))
    do_del = o_base.filter(F.col("o_orderkey") % 17 == 0).withColumn(
        "s_o", F.lit(-1).cast("long"))
    delta_o = do_ins.unionByName(do_del)

    moved = F.col("c_custkey") % 19 == 0
    c_base = c.select(
        "c_custkey",
        F.when(moved, F.lit("MACHINERY")).otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    c_moved = c.filter(moved & (F.col("c_mktsegment") != "MACHINERY"))
    delta_c = (
        c_moved.select(
            "c_custkey",
            F.lit("MACHINERY").alias("c_mktsegment"),
            F.lit(-1).cast("long").alias("s_c"),
        )
    ).unionByName(
        c_moved.select(
            "c_custkey", "c_mktsegment", F.lit(1).cast("long").alias("s_c")
        )
    )

    def agg(df: DataFrame, sign: F.Column) -> DataFrame:
        return df.groupBy(F.col("c_mktsegment").alias("segment")).agg(
            F.sum(sign).alias("dn"),
            F.sum(sign.cast(_DEC) * F.col("o_totalprice").cast(_DEC))
            .cast(_DEC).alias("dr"),
        )

    base_view = agg(
        o_base.join(c_base, o_base.o_custkey == c_base.c_custkey),
        F.lit(1).cast("long"),
    )
    t1 = agg(  # ΔA ⋈ B
        delta_o.join(c_base, delta_o.o_custkey == c_base.c_custkey),
        F.col("s_o"),
    )
    t2 = agg(  # A ⋈ ΔB
        o_base.join(
            F.broadcast(delta_c), o_base.o_custkey == delta_c.c_custkey),
        F.col("s_c"),
    )
    t3 = agg(  # ΔA ⋈ ΔB
        delta_o.join(
            F.broadcast(delta_c), delta_o.o_custkey == delta_c.c_custkey),
        F.col("s_o") * F.col("s_c"),
    )
    merged = (
        base_view.unionByName(t1).unionByName(t2).unionByName(t3)
        .groupBy("segment")
        .agg(F.sum("dn").alias("n"), F.sum("dr").cast(_DEC).alias("rev"))
        .filter(F.col("n") > 0)
    )
    return merged.select(
        "segment",
        F.col("n").cast("long").alias("n_orders"),
        F.col("rev").cast("double").alias("revenue"),
    )


@query(
    "rel_pseudonymize_fk",
    oracle=f"""
WITH t AS (
  SELECT c_mktsegment AS segment, c_custkey,
         substr(md5('cust:' || c_custkey), 1, 16) AS token
  FROM customer
),
seg AS (
  SELECT segment,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(COUNT(DISTINCT token) AS BIGINT) AS n_tokens
  FROM t GROUP BY segment
),
j AS (
  SELECT t.segment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         {_dsum('o.o_totalprice')} AS revenue
  FROM t JOIN orders o ON o.o_custkey = t.c_custkey
  GROUP BY t.segment
)
SELECT seg.segment, seg.n_customers, seg.n_tokens, j.n_orders, j.revenue
FROM seg JOIN j ON j.segment = seg.segment
""",
    tags=("relational", "privacy", "pseudonymization", "referential-integrity"),
)
def rel_pseudonymize_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC PSEUDONYMIZATION WITH REFERENTIAL INTEGRITY — the
    GDPR-grade key replacement every shared analytics extract needs
    (beside rel_k_anonymity's generalization and rel_dp_histogram's
    noise): customer keys become salted-hash tokens, the SAME
    transform is applied to the orders foreign key, and the raw key
    is DROPPED from both sides before anything joins. The Spark side
    then answers a per-segment revenue question joining ONLY on
    tokens; the oracle answers it from the raw keys — a hash match
    proves the tokenization is (a) consistent across tables
    (referential integrity survives), (b) collision-free on this
    keyspace (n_tokens = n_customers per segment; a collision would
    merge customers and shift n_orders/revenue), while the extract
    itself contains no direct identifier.

    100 TB shape: tokenization is a map-side md5 projection on both
    tables (no extra shuffle — the join shuffles on the token exactly
    as it would on the key, same cardinality); the collision audit is
    a by-product of the aggregate already being computed."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.md5(F.concat(F.lit("cust:"), F.col("c_custkey").cast("string")))
        .substr(1, 16).alias("token"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.md5(F.concat(F.lit("cust:"), F.col("o_custkey").cast("string")))
        .substr(1, 16).alias("token"),
        "o_totalprice",
    )
    seg = c.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.countDistinct("token").cast("long").alias("n_tokens"),
    )
    j = (
        c.join(o, "token")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )
    return seg.join(j, "segment").select(
        "segment", "n_customers", "n_tokens", "n_orders", "revenue"
    )


@query(
    "rel_share_of_parent_rollup",
    oracle=f"""
WITH leaf AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(o.o_totalprice AS DECIMAL(30,10))) AS rev_dec,
         {_dsum('o.o_totalprice')} AS revenue
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region, nation, n_orders, revenue,
       revenue / CAST(CAST(SUM(rev_dec) OVER (PARTITION BY region)
                           AS VARCHAR) AS DOUBLE) AS share_of_region,
       revenue / CAST(CAST(SUM(rev_dec) OVER () AS VARCHAR) AS DOUBLE)
         AS share_of_total,
       CAST(SUM(n_orders) OVER (PARTITION BY region) AS BIGINT)
         AS region_orders
FROM leaf
""",
    tags=("relational", "olap", "share-of-parent", "rollup"),
)
def rel_share_of_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARE-OF-PARENT along the region → nation dimension tree — the
    OLAP ratio every drill-down dashboard shows next to the raw
    measure ('France is 31% of EUROPE, 6% of world'). The exactness
    subtlety: window aggregation order over doubles is NOT pinned in
    either engine (the first cut hash-diverged exactly there), so the
    parent totals window over the DECIMAL leaf sums — decimal
    addition is associative, the total is bit-stable under any
    evaluation order — and convert to double once, after the window,
    with the engines' matched decimal→double path. Each share is then
    one IEEE division of two already-pinned doubles.

    100 TB shape: one fact aggregate (dims broadcast — the rel_q5
    join tree), then windows over the O(nations) leaf table only.
    The windows never see fact rows; share-of-parent costs nothing
    beyond the rollup that was being computed anyway."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    leaf = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,10)"))
            .alias("rev_dec"),
            dsum("o_totalprice").alias("revenue"),
        )
    )
    w_reg = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return leaf.select(
        "region",
        "nation",
        "n_orders",
        "revenue",
        (F.col("revenue")
         / F.sum("rev_dec").over(w_reg).cast("double"))
        .alias("share_of_region"),
        (F.col("revenue")
         / F.sum("rev_dec").over(w_all).cast("double"))
        .alias("share_of_total"),
        F.sum("n_orders").over(w_reg).cast("long").alias("region_orders"),
    )


@query(
    "rel_bitmap_index_intersection",
    oracle="""
WITH base AS (
  SELECT o_orderkey // 63 AS word, CAST(o_orderkey % 63 AS INT) AS bit,
         o_orderstatus, o_orderpriority
  FROM orders
),
bs AS (
  SELECT word, bit_or(1::BIGINT << bit) AS bits
  FROM base WHERE o_orderstatus = 'F' GROUP BY word
),
bp AS (
  SELECT word, bit_or(1::BIGINT << bit) AS bits
  FROM base WHERE o_orderpriority = '1-URGENT' GROUP BY word
),
inter AS (
  SELECT CAST(SUM(bit_count(bs.bits & bp.bits)) AS BIGINT) AS n
  FROM bs JOIN bp ON bp.word = bs.word
),
direct AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders
  WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
),
card AS (
  SELECT CAST((SELECT SUM(bit_count(bits)) FROM bs) AS BIGINT) AS n_s,
         CAST((SELECT SUM(bit_count(bits)) FROM bp) AS BIGINT) AS n_p,
         CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_total
)
SELECT card.n_s AS n_status_f,
       card.n_p AS n_urgent,
       inter.n AS n_bitmap_and,
       direct.n AS n_direct,
       CASE WHEN inter.n = direct.n THEN 1 ELSE 0 END AS algebra_sound,
       CAST(card.n_s * card.n_p AS DOUBLE)
         / (CAST(card.n_total AS DOUBLE) * card.n_total)
         * card.n_total AS independence_estimate
FROM inter, direct, card
""",
    tags=("relational", "bitmap-index", "selectivity", "intersection"),
)
def rel_bitmap_index_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITMAP INDEX INTERSECTION — the classic warehouse technique for
    multi-predicate selection on low-cardinality columns (Oracle
    bitmap indexes, Roaring-backed secondary indexes): one bitmap per
    predicate over the row-id space (orderkey packed into 63-bit
    BIGINT words — the bit-per-row twin of ev_bitmap_daily_actives'
    bit-per-day), conjunction = per-word AND + popcount, NO data
    scan. The query certifies the algebra against ground truth —
    n_bitmap_and must equal the direct conjunctive COUNT
    (algebra_sound pinned to 1) — and emits the independence-
    assumption estimate (n_s·n_p/N) beside the true intersection,
    the comparison the optimizer's selectivity model lives and dies
    by (cf. rel_join_cardinality_estimate for the join version).

    100 TB shape: bitmap build is one map-side bit_or per predicate
    keyed on the word index (|rows|/63 words of state); intersection
    joins two O(words) bitmap tables — the data is never rescanned
    for new predicate combinations, which is the point of the
    index."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.expr("o_orderkey div 63").alias("word"),
        F.expr("shiftleft(cast(1 as bigint),"
               " cast(o_orderkey % 63 as int))").alias("m"),
        "o_orderstatus",
        "o_orderpriority",
    )
    bs = (
        base.filter(F.col("o_orderstatus") == "F")
        .groupBy("word").agg(F.bit_or("m").alias("bits_s"))
    )
    bp = (
        base.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("word").agg(F.bit_or("m").alias("bits_p"))
    )
    inter = (
        bs.join(bp, "word")
        .agg(F.sum(F.bit_count(F.col("bits_s").bitwiseAND(F.col("bits_p"))))
             .cast("long").alias("n_bitmap_and"))
    )
    n_s = bs.agg(F.sum(F.bit_count("bits_s")).cast("long")
                 .alias("n_status_f"))
    n_p = bp.agg(F.sum(F.bit_count("bits_p")).cast("long")
                 .alias("n_urgent"))
    direct = o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderpriority") == "1-URGENT")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_direct"))
    n_tot = o.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        n_s.crossJoin(F.broadcast(n_p))
        .crossJoin(F.broadcast(inter))
        .crossJoin(F.broadcast(direct))
        .crossJoin(F.broadcast(n_tot))
        .select(
            "n_status_f",
            "n_urgent",
            "n_bitmap_and",
            "n_direct",
            F.when(F.col("n_bitmap_and") == F.col("n_direct"), 1)
            .otherwise(0).alias("algebra_sound"),
            (
                (F.col("n_status_f") * F.col("n_urgent")).cast("double")
                / (F.col("n_total").cast("double") * F.col("n_total"))
                * F.col("n_total")
            ).alias("independence_estimate"),
        )
    )


@query(
    "rel_data_vault_keys",
    oracle="""
WITH hub_c AS (
  SELECT DISTINCT md5('cust|' || CAST(c_custkey AS VARCHAR)) AS hk_cust
  FROM customer
),
hub_o AS (
  SELECT DISTINCT md5('ord|' || CAST(o_orderkey AS VARCHAR)) AS hk_order
  FROM orders
),
lnk AS (
  SELECT md5(md5('cust|' || CAST(o_custkey AS VARCHAR)) || '||' ||
             md5('ord|' || CAST(o_orderkey AS VARCHAR))) AS lk,
         md5('cust|' || CAST(o_custkey AS VARCHAR)) AS hk_cust,
         md5('ord|' || CAST(o_orderkey AS VARCHAR)) AS hk_order
  FROM orders
)
SELECT CAST((SELECT COUNT(*) FROM hub_c) AS BIGINT) AS n_hub_cust,
       CAST((SELECT COUNT(*) FROM hub_o) AS BIGINT) AS n_hub_order,
       CAST((SELECT COUNT(*) FROM lnk) AS BIGINT) AS n_links,
       CAST((SELECT COUNT(DISTINCT lk) FROM lnk) AS BIGINT)
         AS n_distinct_links,
       CAST((SELECT COUNT(*) FROM lnk l
             WHERE NOT EXISTS (SELECT 1 FROM hub_c h
                               WHERE h.hk_cust = l.hk_cust)) AS BIGINT)
         AS orphan_cust_links,
       CAST((SELECT COUNT(*) FROM lnk l
             WHERE NOT EXISTS (SELECT 1 FROM hub_o h
                               WHERE h.hk_order = l.hk_order)) AS BIGINT)
         AS orphan_order_links
""",
    tags=("relational", "data-vault", "hash-keys", "modeling"),
)
def rel_data_vault_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA VAULT 2.0 HASH-KEY GENERATION + closure audit — the
    warehouse-modeling discipline built for parallel loading at
    scale: hubs carry md5 business-key hashes, links carry the hash
    of their member hub keys, and because every key is a PURE
    FUNCTION of the business key, hubs, links, and satellites load
    in ANY order on ANY cluster with no sequence generator or lookup
    join (the reason DV2 replaced surrogate sequences at scale —
    exactly the determinism discipline this engine's oracles run
    on). The audit pins the two invariants that make the model
    sound: link cardinality equals the distinct business
    relationship count (no hash collisions merged two
    relationships), and ZERO orphan links (every link's hub keys
    exist — referential closure without constraints).

    100 TB shape: key generation is map-side md5 (no sequence
    bottleneck, no lookup shuffle — the DV2 pitch verbatim); the
    audits are two anti-join counts on hash keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    hk_cust = lambda col: F.md5(  # noqa: E731
        F.concat(F.lit("cust|"), F.col(col).cast("string")))
    hk_ord = lambda col: F.md5(  # noqa: E731
        F.concat(F.lit("ord|"), F.col(col).cast("string")))
    hub_c = c.select(hk_cust("c_custkey").alias("hk_cust")).distinct()
    hub_o = o.select(hk_ord("o_orderkey").alias("hk_order")).distinct()
    lnk = o.select(
        F.md5(F.concat(hk_cust("o_custkey"), F.lit("||"),
                       hk_ord("o_orderkey"))).alias("lk"),
        hk_cust("o_custkey").alias("hk_cust"),
        hk_ord("o_orderkey").alias("hk_order"),
    )
    n_hub_c = hub_c.agg(F.count(F.lit(1)).cast("long").alias("n_hub_cust"))
    n_hub_o = hub_o.agg(F.count(F.lit(1)).cast("long").alias("n_hub_order"))
    n_l = lnk.agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("lk").cast("long").alias("n_distinct_links"),
    )
    orph_c = (
        lnk.join(hub_c, "hk_cust", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphan_cust_links"))
    )
    orph_o = (
        lnk.join(hub_o, "hk_order", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphan_order_links"))
    )
    return (
        n_hub_c.crossJoin(F.broadcast(n_hub_o))
        .crossJoin(F.broadcast(n_l))
        .crossJoin(F.broadcast(orph_c))
        .crossJoin(F.broadcast(orph_o))
    )


_IVM_DELTA_DAY = "2024-01-25"  # the incremental batch: one day of events


@query(
    "rel_ivm_distinct_refcount",
    oracle=f"""
WITH base AS (
  SELECT event_type, user_id FROM events
  WHERE strftime(ts, '%Y-%m-%d') < '{_IVM_DELTA_DAY}'
),
delta AS (
  SELECT event_type, user_id FROM events
  WHERE strftime(ts, '%Y-%m-%d') = '{_IVM_DELTA_DAY}'
),
ref AS (SELECT DISTINCT event_type, user_id FROM base),
old AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS old_distinct
        FROM ref GROUP BY event_type),
dd AS (SELECT DISTINCT event_type, user_id FROM delta),
newp AS (
  SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS new_pairs
  FROM dd d LEFT JOIN ref r
    ON r.event_type = d.event_type AND r.user_id = d.user_id
  WHERE r.user_id IS NULL
  GROUP BY d.event_type
),
full_rec AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
           AS full_distinct
  FROM events WHERE strftime(ts, '%Y-%m-%d') <= '{_IVM_DELTA_DAY}'
  GROUP BY event_type
)
SELECT o.event_type, o.old_distinct,
       COALESCE(n.new_pairs, 0) AS new_pairs,
       o.old_distinct + COALESCE(n.new_pairs, 0) AS new_distinct,
       f.full_distinct,
       CAST(CASE WHEN o.old_distinct + COALESCE(n.new_pairs, 0)
                      = f.full_distinct THEN 1 ELSE 0 END AS BIGINT)
         AS identity_holds
FROM old o
JOIN full_rec f ON f.event_type = o.event_type
LEFT JOIN newp n ON n.event_type = o.event_type
""",
    tags=("relational", "ivm", "count-distinct", "refcount"),
)
def rel_ivm_distinct_refcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE for COUNT(DISTINCT) — the
    non-trivial IVM case the delta-agg family skips (SUM/COUNT deltas
    compose by addition; DISTINCT needs a REFCOUNT support table, the
    standard multiset-semantics construction): the materialized state
    is the distinct (event_type, user_id) support set of all events
    before {_IVM_DELTA_DAY}; the day's delta contributes only pairs
    ABSENT from the support (an anti-join), so
    new_distinct = old_distinct + |new pairs|. The query emits the
    maintenance arithmetic AND a from-scratch recompute with an
    identity_holds flag on every row — the same self-certifying
    pattern as rel_mv_rollup_rewrite (a reviewer sees the proof, not
    just the claim). Deletions would decrement refcounts and retire
    rows reaching zero — same table, mirror arithmetic.

    Plan shape at 100 TB: support-set build and delta distinct are
    map-side-combinable; the anti-join shuffles ONLY the day's delta
    against the support (broadcast when the delta is small); the
    recompute exists to certify correctness and would be absent in
    production — that absence is the entire point of IVM."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.date_format("ts", "yyyy-MM-dd").alias("d")
    )
    base = ev.filter(F.col("d") < _IVM_DELTA_DAY)
    delta = ev.filter(F.col("d") == _IVM_DELTA_DAY)
    ref = base.select("event_type", "user_id").distinct()
    old = ref.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("old_distinct")
    )
    dd = delta.select("event_type", "user_id").distinct()
    newp = (
        dd.join(ref, ["event_type", "user_id"], "left_anti")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("new_pairs"))
    )
    full_rec = (
        ev.filter(F.col("d") <= _IVM_DELTA_DAY)
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("long").alias("full_distinct"))
    )
    return (
        old.join(full_rec, "event_type")
        .join(newp, "event_type", "left")
        .select(
            "event_type",
            "old_distinct",
            F.coalesce("new_pairs", F.lit(0).cast("long")).alias("new_pairs"),
            (F.col("old_distinct")
             + F.coalesce("new_pairs", F.lit(0).cast("long")))
            .alias("new_distinct"),
            "full_distinct",
            F.when(
                F.col("old_distinct")
                + F.coalesce("new_pairs", F.lit(0).cast("long"))
                == F.col("full_distinct"),
                1,
            ).otherwise(0).cast("long").alias("identity_holds"),
        )
    )


# Bitemporal probe grid: transaction-time x valid-time as-of points.
_BT_PROBES = (("1996-06-01", "1996-01-01"), ("1998-06-01", "1996-01-01"),
              ("1998-06-01", "1994-06-01"), ("1995-06-01", "1996-01-01"))


def _bt_versions_sql() -> str:
    """The synthesized bitemporal part-price version table, shared by
    oracle and docstring: v1 for every part (valid 1994-01-01,
    recorded 1995-01-01); a RETROACTIVE correction for parts with
    p_partkey % 3 = 0 (+10%, valid from 1996-01-01, recorded
    1997-01-01). Knowledge before 1997 must NOT see the correction
    even for later valid times — the defining bitemporal property."""
    return """
v AS (
  SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS price,
         DATE '1994-01-01' AS valid_from, DATE '1995-01-01' AS tx_from
  FROM part
  UNION ALL
  SELECT p_partkey, CAST(p_retailprice AS DOUBLE) * 1.1,
         DATE '1996-01-01', DATE '1997-01-01'
  FROM part WHERE p_partkey % 3 = 0
)"""


@query(
    "rel_bitemporal_asof",
    oracle=f"""
WITH {_bt_versions_sql()},
probes AS (
  SELECT unnest([{", ".join("DATE '" + t + "'" for t, _ in _BT_PROBES)}])
    AS tx_at,
  unnest([{", ".join("DATE '" + v + "'" for _, v in _BT_PROBES)}])
    AS valid_at
),
vis AS (
  SELECT pr.tx_at, pr.valid_at, v.p_partkey, v.price,
         row_number() OVER (
           PARTITION BY pr.tx_at, pr.valid_at, v.p_partkey
           ORDER BY v.valid_from DESC, v.tx_from DESC) AS rn
  FROM probes pr JOIN v
    ON v.tx_from <= pr.tx_at AND v.valid_from <= pr.valid_at
)
SELECT strftime(tx_at, '%Y-%m-%d') AS tx_at,
       strftime(valid_at, '%Y-%m-%d') AS valid_at,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(CAST(SUM(CAST(price AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
         AS total_price
FROM vis WHERE rn = 1
GROUP BY 1, 2
""",
    tags=("relational", "bitemporal", "asof", "scd"),
)
def rel_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL AS-OF — the two-clock query SCD2
    (rel_scd2_intervals: one validity axis) cannot answer: 'as the
    system KNEW it at transaction time T_tx, what was the price VALID
    at business time T_valid'. Version rows carry (valid_from,
    tx_from); a probe sees a version iff BOTH clocks admit it, and
    the winner is the latest (valid_from, tx_from) among visible ones
    — so the retroactive 1997 correction (valid from 1996) is
    invisible to any pre-1997 knowledge date even for 1996+ valid
    times, and probes with valid_at before a part's first validity
    see nothing. The 4-probe grid exercises exactly those cells:
    normal read, post-correction read, pre-validity read (0 rows from
    that part... the before-1994 probe sees NO parts and vanishes
    from the output — explicitly the correct bitemporal answer), and
    stale-knowledge read. Restatement-as-new-version is the
    accounting/regulatory pattern (never UPDATE history; append a
    correction with its own knowledge date).

    Plan shape at 100 TB: the probe grid broadcasts; visibility is a
    residual on the broadcast join; the per-(probe, key) winner is a
    rank window partitioned by (probe, key) — data-distributed; the
    rollup is map-side-combinable over O(probes) keys."""
    part = load_table(spark, sf_dir, "part")
    v1 = part.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("price"),
        F.lit("1994-01-01").cast("date").alias("valid_from"),
        F.lit("1995-01-01").cast("date").alias("tx_from"),
    )
    v2 = part.filter(F.col("p_partkey") % 3 == 0).select(
        "p_partkey",
        (F.col("p_retailprice").cast("double") * 1.1).alias("price"),
        F.lit("1996-01-01").cast("date").alias("valid_from"),
        F.lit("1997-01-01").cast("date").alias("tx_from"),
    )
    v = v1.unionByName(v2)
    probes = spark.createDataFrame(
        [(t, vd) for t, vd in _BT_PROBES], "tx_at string, valid_at string"
    ).select(
        F.col("tx_at").cast("date").alias("tx_at"),
        F.col("valid_at").cast("date").alias("valid_at"),
    )
    vis = v.join(
        F.broadcast(probes),
        (F.col("tx_from") <= F.col("tx_at"))
        & (F.col("valid_from") <= F.col("valid_at")),
    )
    w = Window.partitionBy("tx_at", "valid_at", "p_partkey").orderBy(
        F.desc("valid_from"), F.desc("tx_from")
    )
    winners = vis.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return winners.groupBy(
        F.date_format("tx_at", "yyyy-MM-dd").alias("tx_at"),
        F.date_format("valid_at", "yyyy-MM-dd").alias("valid_at"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.col("price").cast("decimal(30,10)"))
        .cast("double")
        .alias("total_price"),
    )


# --------------------------------------------------------------------------
# Round 10: auto-ranged equi-width histogram
# --------------------------------------------------------------------------

_HIST_BINS = 16


@query(
    "rel_autorange_histogram",
    oracle=f"""
WITH stats AS (
  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
),
b AS (
  SELECT LEAST(CAST(FLOOR((o_totalprice - mn)
                 / ((mx - mn) / {_HIST_BINS}.0)) AS BIGINT),
               {_HIST_BINS - 1}) AS bin,
         mn, mx, o_totalprice
  FROM orders CROSS JOIN stats
)
SELECT bin,
       mn + CAST(bin AS DOUBLE) * ((mx - mn) / {_HIST_BINS}.0) AS lo,
       mn + CAST(bin + 1 AS DOUBLE) * ((mx - mn) / {_HIST_BINS}.0) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS VARCHAR)
            AS DOUBLE) AS sum_price
FROM b GROUP BY bin, mn, mx
""",
    tags=("relational", "histogram", "profiling", "two-phase"),
)
def rel_autorange_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTO-RANGED equi-width histogram — the profiling primitive every
    stats collector (ANALYZE, BI range filters, drift monitors) runs:
    bin boundaries derived from the DATA (min/max) in a first pass,
    counts in a second. Complements ev_equi_depth_histogram (quantile
    bins) with the fixed-width variant whose two-phase shape is the
    interesting part at scale: phase 1 is a 2-value aggregate, phase 2
    folds (mn, mx) into every row as a BROADCAST and bins map-side —
    one combinable groupBy over {_HIST_BINS} keys, never a sort. The
    max value lands exactly on the upper fence, so the last bin is
    closed via LEAST(bin, {_HIST_BINS - 1}) — both engines evaluate
    the identical double expression tree, keeping bin assignment
    bit-deterministic."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    stats = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(_HIST_BINS))
    b = o.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("mn")) / width)
            .cast("long"),
            F.lit(_HIST_BINS - 1),
        ).alias("bin"),
        "mn",
        "mx",
        "o_totalprice",
    )
    return b.groupBy("bin", "mn", "mx").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(30,10)"))
        .cast("double")
        .alias("sum_price"),
    ).select(
        "bin",
        (F.col("mn") + F.col("bin").cast("double") * width).alias("lo"),
        (F.col("mn") + (F.col("bin") + 1).cast("double") * width).alias("hi"),
        "n",
        "sum_price",
    )


# ---------------------------------------------------------------------------
# Round 11: incremental top-k view maintenance (bounded-state IVM)
# ---------------------------------------------------------------------------


@query(
    "rel_incremental_topk_merge",
    oracle="""
WITH full_rank AS (
  SELECT year(o_orderdate) AS yr, o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY year(o_orderdate), o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
)
SELECT CAST(yr AS BIGINT) AS yr, o_orderpriority,
       CAST(rnk AS BIGINT) AS rnk,
       CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
FROM full_rank WHERE rnk <= 3
""",
    tags=("relational", "ivm", "topk", "window", "incremental"),
)
def rel_incremental_topk_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL TOP-K maintenance — the leaderboard IVM pattern:
    per-group top-k is a MONOID (topk(A ∪ B) = topk(topk(A) ∪
    topk(B)) exactly, for any deterministic total order), so an
    append-only table's top-k view is maintained by ranking ONLY the
    delta and merging it with the O(groups·k) retained state — the
    base is never rescanned. Simulated split: base = 90% of orders
    (o_orderkey % 10 != 0), delta = the remaining 10%; state and
    delta are each ranked to k=3 per (year, priority), merged, and
    re-ranked. The oracle recomputes top-3 over the FULL table — the
    merge is correct iff it matches bit-for-bit, which is the monoid
    identity made testable. Tiebreak (price DESC, orderkey ASC) makes
    the order total, so equality is exact, not probabilistic.

    Plan shape at 100 TB: the expensive window runs once over the
    base (historical, amortized) and per-batch over the delta; the
    merge window sees 2·groups·k rows — constant. Spark pushes the
    rnk <= 3 filter into the window via WindowGroupLimit, so even the
    base pass keeps a bounded per-group heap instead of a full sort."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
    )
    w = Window.partitionBy("yr", "o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )

    def topk(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .drop("rnk")
        )

    state = topk(o.filter(F.col("o_orderkey") % 10 != 0))  # base pass
    delta = topk(o.filter(F.col("o_orderkey") % 10 == 0))  # per-batch
    merged = topk(state.unionByName(delta))  # O(groups·k) rows
    return merged.withColumn("rnk", F.row_number().over(w)).select(
        F.col("yr").cast("long").alias("yr"),
        "o_orderpriority",
        F.col("rnk").cast("long").alias("rnk"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_totalprice",
    )
