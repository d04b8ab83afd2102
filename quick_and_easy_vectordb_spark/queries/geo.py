"""Geospatial operators: grid-blocked nearest-neighbor join,
hierarchical map-tile aggregation, and ray-casting polygon
containment.

Neither Spark nor the reference (app.py:1-193 has no spatial path)
ships a native spatial join; at 100 TB the standard shape is
GRID BLOCKING — discretize coordinates into cells, replicate one side
into its neighbor cells, and equi-join on the cell key so the planner
gets a plain (broadcastable / shufflable) hash join instead of a
cross-product with a distance predicate. That is the same
candidate-generation discipline as the MinHash band join
(operators/dedup.py) applied to coordinates.

Coordinates are synthesized deterministically from the TPC-H-ish keys
(the fixture tables carry no lat/lon), with two-decimal values so both
engines parse identical doubles. All distance math is PLANAR
(equirectangular) squared distance — pure arithmetic with the same
expression shape in both engines; no transcendentals cross the
cross-engine exactness boundary (the same rule the NDCG rank
discounts follow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.queries.registry import query
from quick_and_easy_vectordb_spark.sources.catalog import load_table

# Synthetic coordinate derivation (two decimals; identical literal
# arithmetic in both engines):
#   lat = ((key * 7919)  % 18000) / 100.0 - 90.0   ∈ [-90, 90)
#   lon = ((key * 104729) % 36000) / 100.0 - 180.0 ∈ [-180, 180)
_SQL_LAT = "(({k} * 7919) % 18000) / 100.0 - 90.0"
_SQL_LON = "(({k} * 104729) % 36000) / 100.0 - 180.0"

_CELL_DEG = 15.0  # grid cell side in degrees (24 x 12 grid)


def _lat(key: str) -> F.Column:
    return (F.col(key) * 7919) % 18000 / F.lit(100.0) - F.lit(90.0)


def _lon(key: str) -> F.Column:
    return (F.col(key) * 104729) % 36000 / F.lit(100.0) - F.lit(180.0)


def _cell_x(lon: F.Column) -> F.Column:
    return F.floor((lon + F.lit(180.0)) / F.lit(_CELL_DEG)).cast("long")


def _cell_y(lat: F.Column) -> F.Column:
    return F.floor((lat + F.lit(90.0)) / F.lit(_CELL_DEG)).cast("long")


@query(
    "geo_grid_knn_join",
    oracle=f"""
WITH p AS (
  SELECT c_custkey,
         {_SQL_LAT.format(k='c_custkey')} AS plat,
         {_SQL_LON.format(k='c_custkey')} AS plon
  FROM customer
),
pc AS (
  SELECT c_custkey, plat, plon,
         CAST(floor((plon + 180.0) / {_CELL_DEG}) AS BIGINT) AS cx,
         CAST(floor((plat + 90.0) / {_CELL_DEG}) AS BIGINT) AS cy
  FROM p
),
s AS (
  SELECT s_suppkey,
         {_SQL_LAT.format(k='s_suppkey')} AS slat,
         {_SQL_LON.format(k='s_suppkey')} AS slon
  FROM supplier
),
sc AS (
  SELECT s_suppkey, slat, slon,
         CAST(floor((slon + 180.0) / {_CELL_DEG}) AS BIGINT) AS cx,
         CAST(floor((slat + 90.0) / {_CELL_DEG}) AS BIGINT) AS cy
  FROM s
),
cand AS (
  SELECT pc.c_custkey, sc.s_suppkey,
         (pc.plat - sc.slat) * (pc.plat - sc.slat)
           + (pc.plon - sc.slon) * (pc.plon - sc.slon) AS dist2
  FROM pc JOIN sc
    ON abs(pc.cx - sc.cx) <= 1 AND abs(pc.cy - sc.cy) <= 1
),
r AS (
  SELECT c_custkey, s_suppkey, dist2,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY dist2, s_suppkey) AS rn
  FROM cand
)
SELECT c_custkey, s_suppkey AS nearest_site, dist2
FROM r WHERE rn = 1
""",
    tags=("geo", "spatial-join", "grid-blocking", "knn", "join"),
)
def geo_grid_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRID-BLOCKED spatial nearest-neighbor join — "assign every
    customer to its nearest supplier site": the canonical spatial
    workload (store assignment, cell-tower mapping, POI snapping)
    that naive SQL writes as an O(N·M) cross join with an ORDER BY
    per row. Blocking: both sides are discretized into a 15-degree
    grid; each SITE is replicated into its 3x3 neighbor cells (a
    9-row generator explode on the SMALL side), and candidates come
    from a plain equi-join on the cell id — the nearest site within
    the 3x3 neighborhood is then a per-customer bounded-heap top-1.
    Semantics (mirrored exactly by the oracle): nearest site with
    |Δcell| ≤ 1 on both axes; customers with an empty neighborhood
    drop out. Distance is planar squared distance with the identical
    expression shape in both engines — comparisons only, no sqrt, no
    transcendentals.

    Plan shape at 100 TB: the replicated site table is 9x|sites| —
    broadcast when small (here), else the equi-join shuffles on the
    CELL KEY, never all-pairs; the top-1 is WindowGroupLimit (rank
    heap), not a global sort. Cell size trades replication factor
    against candidate count exactly like LSH band width."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")

    pc = cust.select(
        "c_custkey",
        _lat("c_custkey").alias("plat"),
        _lon("c_custkey").alias("plon"),
    ).select(
        "c_custkey", "plat", "plon",
        _cell_x(F.col("plon")).alias("cx"),
        _cell_y(F.col("plat")).alias("cy"),
    )

    sc = supp.select(
        "s_suppkey",
        _lat("s_suppkey").alias("slat"),
        _lon("s_suppkey").alias("slon"),
    ).select(
        "s_suppkey", "slat", "slon",
        _cell_x(F.col("slon")).alias("scx"),
        _cell_y(F.col("slat")).alias("scy"),
    )
    # Replicate each site into its 3x3 neighbor cells: candidate
    # generation becomes a pure EQUI-join on (cx, cy).
    offsets = F.expr(
        "explode(transform(sequence(0, 8), "
        "i -> struct(i div 3 - 1 as dx, i % 3 - 1 as dy)))"
    )
    sc9 = sc.select("*", offsets.alias("o")).select(
        "s_suppkey", "slat", "slon",
        (F.col("scx") + F.col("o.dx")).alias("cx"),
        (F.col("scy") + F.col("o.dy")).alias("cy"),
    )

    dist2 = (F.col("plat") - F.col("slat")) * (F.col("plat") - F.col("slat")) + (
        F.col("plon") - F.col("slon")
    ) * (F.col("plon") - F.col("slon"))
    cand = pc.join(F.broadcast(sc9), ["cx", "cy"]).select(
        "c_custkey", "s_suppkey", dist2.alias("dist2")
    )
    w = Window.partitionBy("c_custkey").orderBy("dist2", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", F.col("s_suppkey").alias("nearest_site"), "dist2")
    )


_TILE_Z4 = 16  # 2^4 tiles per axis at zoom 4


def _sql_tile_interleave(tx: str, ty: str) -> str:
    """Unrolled 4-bit Morton interleave (quadkey) — identical integer
    expression in both engines."""
    terms = []
    for i in range(4):
        terms.append(f"((({tx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ty} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "geo_tile_pyramid",
    oracle=f"""
WITH p AS (
  SELECT c_custkey, c_acctbal,
         {_SQL_LAT.format(k='c_custkey')} AS lat,
         {_SQL_LON.format(k='c_custkey')} AS lon
  FROM customer
),
t AS (
  SELECT c_acctbal,
         CAST(floor((lon + 180.0) / 360.0 * {_TILE_Z4}) AS BIGINT) AS tx,
         LEAST(CAST(floor((90.0 - lat) / 180.0 * {_TILE_Z4}) AS BIGINT),
               {_TILE_Z4 - 1}) AS ty
  FROM p
),
z4 AS (
  SELECT ({_sql_tile_interleave('tx', 'ty')}) AS quadkey,
         CAST(COUNT(*) AS BIGINT) AS n_points,
         CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS VARCHAR)
              AS DOUBLE) AS total_bal
  FROM t GROUP BY 1
)
SELECT CAST(4 AS BIGINT) AS zoom, quadkey, n_points, total_bal FROM z4
UNION ALL
SELECT CAST(2 AS BIGINT) AS zoom, quadkey >> 4 AS quadkey,
       CAST(SUM(n_points) AS BIGINT) AS n_points,
       CAST(CAST(SUM(CAST(total_bal AS DECIMAL(30,10))) AS VARCHAR)
            AS DOUBLE) AS total_bal
FROM z4 GROUP BY quadkey >> 4
""",
    tags=("geo", "tiles", "quadkey", "rollup", "morton"),
)
def geo_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-TILE PYRAMID aggregation — the heatmap / choropleth
    backend: points bucketed into zoom-4 web-mercator-style tiles
    (quadkey = 4-bit Morton interleave of the tile x/y, the same
    bit-interleaving primitive as rel_zorder_clustering applied to
    geography), then ROLLED UP to zoom 2 FROM THE ZOOM-4 AGGREGATES —
    parent quadkey is a 4-bit right shift of the child's, so coarser
    zoom levels cost a reaggregation of tile rows, never a second
    pass over the points. Balance totals are decimal-exact
    (functions/numeric.py discipline) so the zoom-2 sums match the
    oracle bit-for-bit even though they sum already-summed doubles.

    Plan shape at 100 TB: one map-side-combined aggregate over the
    point scan (256 groups), then an O(tiles) reaggregation — the
    full 20-level pyramid is 19 tiny shuffles over tile rows, the
    point data is read once. The quadkey is one codegen projection."""
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_acctbal",
        _lat("c_custkey").alias("lat"),
        _lon("c_custkey").alias("lon"),
    )
    tx = F.floor((F.col("lon") + F.lit(180.0)) / F.lit(360.0) * _TILE_Z4).cast(
        "long"
    )
    ty = F.least(
        F.floor((F.lit(90.0) - F.col("lat")) / F.lit(180.0) * _TILE_Z4).cast(
            "long"
        ),
        F.lit(_TILE_Z4 - 1),
    )
    t = pts.select("c_acctbal", tx.alias("tx"), ty.alias("ty"))
    qk = None
    for i in range(4):
        bx = F.shiftleft(F.shiftright(F.col("tx"), i).bitwiseAND(F.lit(1)), 2 * i)
        by = F.shiftleft(
            F.shiftright(F.col("ty"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        qk = bx + by if qk is None else qk + bx + by
    z4 = (
        t.select(qk.alias("quadkey"), "c_acctbal")
        .groupBy("quadkey")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("c_acctbal").cast("decimal(30,10)"))
            .cast("double")
            .alias("total_bal"),
        )
    )
    z2 = (
        z4.groupBy(F.shiftright("quadkey", 4).alias("quadkey"))
        .agg(
            F.sum("n_points").cast("long").alias("n_points"),
            F.sum(F.col("total_bal").cast("decimal(30,10)"))
            .cast("double")
            .alias("total_bal"),
        )
    )
    return z4.select(F.lit(4).cast("long").alias("zoom"), "*").unionAll(
        z2.select(F.lit(2).cast("long").alias("zoom"), "*")
    )


# Irregular (non-convex) pentagon in the integer coordinate grid
# (x = (key*104729) % 36000, y = (key*7919) % 18000).
_POLY = [(2000, 2000), (30000, 5000), (27000, 15000), (15000, 9000),
         (4000, 16000)]


def _sql_pip_crossings(px: str, py: str) -> str:
    """Unrolled ray-casting crossing count (horizontal ray to +x):
    exact integer cross-multiplication, no division — identical
    expression in both engines."""
    terms = []
    n = len(_POLY)
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        # Edge straddles the ray iff (y1 > py) != (y2 > py); the
        # intersection lies right of px iff
        # (px - x1)*(y2 - y1) < (x2 - x1)*(py - y1), sign-flipped
        # for downward edges — both written division-free.
        if y2 > y1:
            cond = (
                f"({y1} <= {py} AND {py} < {y2} AND "
                f"({px} - {x1}) * {y2 - y1} < {x2 - x1} * ({py} - {y1}))"
            )
        else:
            cond = (
                f"({y2} <= {py} AND {py} < {y1} AND "
                f"({px} - {x1}) * {y2 - y1} > {x2 - x1} * ({py} - {y1}))"
            )
        terms.append(f"CASE WHEN {cond} THEN 1 ELSE 0 END")
    return " + ".join(terms)


@query(
    "geo_point_in_polygon",
    oracle=f"""
WITH p AS (
  SELECT c_custkey,
         (c_custkey * 104729) % 36000 AS px,
         (c_custkey * 7919) % 18000 AS py
  FROM customer
),
t AS (
  SELECT c_custkey, (({_sql_pip_crossings('px', 'py')}) % 2) AS inside
  FROM p
)
SELECT CAST(SUM(inside) AS BIGINT) AS n_inside,
       CAST(COUNT(*) - SUM(inside) AS BIGINT) AS n_outside,
       CAST(COALESCE(SUM(c_custkey * inside), 0) AS BIGINT)
         AS inside_key_checksum
FROM t
""",
    tags=("geo", "point-in-polygon", "ray-casting", "spatial-filter"),
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-POLYGON containment — the geofencing filter
    (jurisdiction tagging, service-area assignment, geo-compliance
    partitioning) evaluated by RAY CASTING against a non-convex
    pentagon: a point is inside iff a horizontal ray crosses the
    boundary an odd number of times. Every edge test is DIVISION-FREE
    integer cross-multiplication over the integer coordinate grid
    (the half-open y-range convention handles vertex-hit double
    counting), unrolled identically in both engines — exact
    arithmetic, no epsilon, no floating point anywhere.

    Plan shape at 100 TB: the polygon is a compile-time constant
    folded into ONE codegen projection over the point scan — zero
    shuffle, zero join, cost linear in points and edges. For
    many-polygon workloads the same test nests inside the grid-cell
    blocking of geo_grid_knn_join (cell equi-join to candidate
    polygons, then this exact test) — filter-by-geometry never needs
    more than a broadcast and a scan."""
    cust = load_table(spark, sf_dir, "customer")
    p = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * 104729) % 36000).alias("px"),
        ((F.col("c_custkey") * 7919) % 18000).alias("py"),
    )
    crossings = None
    n = len(_POLY)
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        px, py = F.col("px"), F.col("py")
        if y2 > y1:
            cond = (
                (F.lit(y1) <= py)
                & (py < F.lit(y2))
                & ((px - x1) * (y2 - y1) < F.lit(x2 - x1) * (py - y1))
            )
        else:
            cond = (
                (F.lit(y2) <= py)
                & (py < F.lit(y1))
                & ((px - x1) * (y2 - y1) > F.lit(x2 - x1) * (py - y1))
            )
        term = F.when(cond, 1).otherwise(0)
        crossings = term if crossings is None else crossings + term
    t = p.select("c_custkey", (crossings % 2).alias("inside"))
    return t.agg(
        F.sum("inside").cast("long").alias("n_inside"),
        (F.count(F.lit(1)) - F.sum("inside")).cast("long").alias("n_outside"),
        F.coalesce(F.sum(F.col("c_custkey") * F.col("inside")), F.lit(0))
        .cast("long")
        .alias("inside_key_checksum"),
    )
