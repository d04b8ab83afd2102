"""Data-quality and governance operators: expectation suites,
k-anonymity audits, and physical-join-strategy equivalence.

The reference (app.py:1-193) has no validation surface at all — a
malformed CSV upload dies in a catch-all `except` (app.py:151-152).
At 100 TB ingestion without declared expectations is how silent
corruption propagates into training corpora, so the Deequ-style
constraint report and the privacy audit are first-class operators
here, built the same way as every other query: single-pass native
aggregates with a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quick_and_easy_vectordb_spark.functions.numeric import dsum
from quick_and_easy_vectordb_spark.queries.registry import query
from quick_and_easy_vectordb_spark.sources.catalog import load_table


@query(
    "rel_data_expectations",
    oracle="""
WITH scan AS (
  SELECT CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
           AS v_complete,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_unique,
         CAST(COUNT(*) FILTER (WHERE o_totalprice < 1000.0
                                  OR o_totalprice > 400000.0) AS BIGINT)
           AS v_range,
         CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
              AS BIGINT) AS v_domain,
         CAST(COUNT(*) FILTER (WHERE NOT regexp_matches(
                o_orderpriority, '^[1-5]-[A-Z ]+$')) AS BIGINT) AS v_pattern,
         CAST(CASE WHEN MAX(o_orderdate) < TIMESTAMP '1997-01-01 00:00:00'
                   THEN 1 ELSE 0 END AS BIGINT) AS v_fresh
  FROM orders
),
ref AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_ref
  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_custkey IS NULL
),
long_form AS (
  SELECT 'completeness_custkey' AS "check", v_complete AS violations
  FROM scan
  UNION ALL SELECT 'uniqueness_orderkey', v_unique FROM scan
  UNION ALL SELECT 'range_totalprice', v_range FROM scan
  UNION ALL SELECT 'domain_orderstatus', v_domain FROM scan
  UNION ALL SELECT 'pattern_orderpriority', v_pattern FROM scan
  UNION ALL SELECT 'freshness_orderdate', v_fresh FROM scan
  UNION ALL SELECT 'referential_custkey', v_ref FROM ref
)
SELECT "check", violations,
       CASE WHEN violations = 0 THEN 'PASS' ELSE 'FAIL' END AS status
FROM long_form
""",
    tags=("quality", "expectations", "validation", "deequ", "governance"),
)
def rel_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-EXPECTATION suite (Deequ / Great-Expectations semantics,
    made oracle-exact): seven declared constraints over the orders
    feed — completeness (custkey non-null), uniqueness (orderkey),
    value range (totalprice within business bounds), domain
    membership (orderstatus in its enum), regex pattern
    (orderpriority shape), freshness (max orderdate past a cutoff),
    and REFERENTIAL integrity (every custkey resolves in customer) —
    emitted as a long-form report (check, violations, PASS/FAIL), the
    shape a pipeline gate consumes. The in-scan checks share ONE
    aggregate over one scan (conditional counts side by side, the
    distinct via Expand); referential integrity is the only second
    input, an anti-join counted with the dimension broadcast.

    Plan shape at 100 TB: adding a check adds a conditional-count
    expression, never a pass; the anti-join shuffles nothing when the
    dimension broadcasts, else it is one key-partitioned shuffle.
    The report itself is 7 rows — gate evaluation is driver-free."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    scan = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1))
        .cast("long")
        .alias("v_complete"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("v_unique"),
        F.count(
            F.when(
                (F.col("o_totalprice") < 1000.0)
                | (F.col("o_totalprice") > 400000.0),
                1,
            )
        )
        .cast("long")
        .alias("v_range"),
        F.count(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1))
        .cast("long")
        .alias("v_domain"),
        F.count(
            F.when(~F.col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$"), 1)
        )
        .cast("long")
        .alias("v_pattern"),
        F.when(
            F.max("o_orderdate")
            < F.lit("1997-01-01 00:00:00").cast("timestamp"),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("v_fresh"),
    )
    ref = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o.o_custkey == c.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("v_ref"))
    )
    report = scan.crossJoin(F.broadcast(ref)).selectExpr(
        "stack(7, "
        "'completeness_custkey', v_complete, "
        "'uniqueness_orderkey', v_unique, "
        "'range_totalprice', v_range, "
        "'domain_orderstatus', v_domain, "
        "'pattern_orderpriority', v_pattern, "
        "'freshness_orderdate', v_fresh, "
        "'referential_custkey', v_ref) AS (`check`, violations)"
    )
    return report.select(
        "check",
        "violations",
        F.when(F.col("violations") == 0, "PASS")
        .otherwise("FAIL")
        .alias("status"),
    )


_K_ANON = 5


@query(
    "rel_k_anonymity",
    oracle=f"""
WITH l1 AS (
  SELECT c_nationkey AS qi1, c_mktsegment AS qi2, COUNT(*) AS n
  FROM customer GROUP BY 1, 2
),
l2 AS (
  SELECT n.n_regionkey AS qi1, c.c_mktsegment AS qi2, COUNT(*) AS n
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
)
SELECT 'nation_segment' AS qi_level,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(n) AS BIGINT) AS min_group_size,
       CAST(COUNT(*) FILTER (WHERE n < {_K_ANON}) AS BIGINT)
         AS groups_below_k,
       CAST(COALESCE(SUM(n) FILTER (WHERE n < {_K_ANON}), 0) AS BIGINT)
         AS rows_at_risk
FROM l1
UNION ALL
SELECT 'region_segment',
       CAST(COUNT(*) AS BIGINT),
       CAST(MIN(n) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE n < {_K_ANON}) AS BIGINT),
       CAST(COALESCE(SUM(n) FILTER (WHERE n < {_K_ANON}), 0) AS BIGINT)
FROM l2
""",
    tags=("quality", "privacy", "k-anonymity", "governance"),
)
def rel_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY audit (Sweeney 2002) — the re-identification check
    a governed corpus runs before release: under quasi-identifier set
    (nation, market segment), how many equivalence classes exist, how
    small is the smallest, and how many ROWS sit in classes below
    k=5 (each such row is linkable to fewer than k peers).
    The second report row re-audits after one step up the
    GENERALIZATION ladder — nation coarsened to region via the
    dimension join — showing the standard remediation: fewer, larger
    classes, fewer rows at risk. This is the quantitative companion
    to rel_gdpr_cascade_erasure (deletion); together they are the
    privacy surface of the engine.

    Plan shape at 100 TB: each audit level is one map-side-combined
    groupBy over the QI columns (class table is O(distinct QI
    combos), tiny) plus an O(classes) summary aggregate; the
    generalization join broadcasts the 25-row nation dimension. N
    ladder steps cost N cheap aggregates over the same scan, and at
    production scale all levels can share one Expand pass
    (GROUPING SETS) — spelled separately here for clarity."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")

    def audit(classes: DataFrame, level: str) -> DataFrame:
        below = F.col("n") < _K_ANON
        return classes.agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("n").cast("long").alias("min_group_size"),
            F.count(F.when(below, 1)).cast("long").alias("groups_below_k"),
            F.coalesce(F.sum(F.when(below, F.col("n"))), F.lit(0))
            .cast("long")
            .alias("rows_at_risk"),
        ).select(F.lit(level).alias("qi_level"), "*")

    l1 = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    l2 = (
        cust.join(
            F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
        )
        .groupBy("n_regionkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return audit(l1, "nation_segment").unionAll(audit(l2, "region_segment"))


_STRAT_AGG = """
  SELECT c.c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,10))) AS VARCHAR)
              AS DOUBLE) AS revenue
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
"""


@query(
    "rel_join_strategy_equivalence",
    oracle=f"""
SELECT 'broadcast' AS strategy, * FROM ({_STRAT_AGG})
UNION ALL SELECT 'merge', * FROM ({_STRAT_AGG})
UNION ALL SELECT 'shuffle_hash', * FROM ({_STRAT_AGG})
""",
    tags=("relational", "join-strategy", "hints", "engine-surface"),
)
def rel_join_strategy_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHYSICAL JOIN-STRATEGY equivalence — the engine-surface
    contract that the three distributed join algorithms are
    interchangeable on RESULTS and differ only in cost: the same
    orders⋈customer revenue rollup executed under a BROADCAST hint
    (replicate the dimension, zero shuffle of the fact), a MERGE hint
    (sort-merge: both sides shuffle+sort on the key — the robust
    choice when both sides are huge), and a SHUFFLE_HASH hint
    (partition both sides, hash the smaller per partition — sort-free
    but must fit the build side per task). All three branches carry
    the decimal-exact revenue sum, so the three tagged result blocks
    are bit-identical — which IS the assertion: strategy choice is a
    Catalyst cost decision, not a semantics decision. The plan test
    (tests/test_round7_plans.py) pins that the single physical plan
    really contains BroadcastHashJoin, SortMergeJoin AND
    ShuffledHashJoin nodes — the hints were honored, not silently
    coalesced.

    Plan shape at 100 TB: this query is the documentation of WHEN to
    pick each: dimension < broadcast threshold → broadcast (the
    engine's default everywhere, e.g. rel_q9's star joins);
    both sides large + skew-prone → sort-merge with AQE; large but
    uniformly partitioned with a small build side → shuffle-hash."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    def rollup(hint: str, tag: str) -> DataFrame:
        joined = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        return (
            joined.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                dsum("o_totalprice").alias("revenue"),
            )
            .select(F.lit(tag).alias("strategy"), "*")
        )

    return (
        rollup("broadcast", "broadcast")
        .unionAll(rollup("merge", "merge"))
        .unionAll(rollup("shuffle_hash", "shuffle_hash"))
    )


# Discrete-Laplace (two-sided geometric) inverse-CDF thresholds for
# epsilon = 0.25, truncated at |z| <= 20, scaled to the 16-bit hash
# range: noise(u) = z for the smallest z with u < _DP_CUM[z + 20].
# Precomputed once in exact Python so both engines evaluate the SAME
# integer CASE ladder — no transcendental crosses the engine boundary.
_DP_EPS_LABEL = "0.25"
_DP_B = 20
_DP_CUM = [55, 126, 217, 334, 484, 677, 925, 1243, 1651, 2175, 2848,
           3712, 4821, 6246, 8075, 10424, 13440, 17312, 22284, 28669,
           36867, 43252, 48224, 52096, 55112, 57461, 59290, 60715,
           61824, 62688, 63361, 63885, 64293, 64611, 64859, 65052,
           65202, 65319, 65410, 65481, 65536]
_DP_SALT = "dp-v1"


def _dp_noise_sql(u: str) -> str:
    branches = [
        f"WHEN {u} < {c} THEN {z - _DP_B}"
        for z, c in enumerate(_DP_CUM[:-1])
    ]
    return "CASE " + " ".join(branches) + f" ELSE {_DP_B} END"


@query(
    "rel_dp_histogram",
    oracle=f"""
WITH g AS (
  SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n_true
  FROM orders GROUP BY o_orderpriority
),
u AS (
  SELECT priority, n_true,
         ('0x' || substr(md5(priority || '{_DP_SALT}'), 1, 4))::BIGINT AS uh
  FROM g
)
SELECT priority, n_true,
       CAST({_dp_noise_sql('uh')} AS BIGINT) AS noise,
       CAST(n_true + {_dp_noise_sql('uh')} AS BIGINT) AS n_released
FROM u
""",
    tags=("quality", "privacy", "differential-privacy", "histogram",
          "governance"),
)
def rel_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE histogram release — the privacy
    mechanism a governed corpus applies before publishing group
    counts: each count gets additive noise from a DISCRETE LAPLACE
    (two-sided geometric) distribution with sensitivity 1 and
    epsilon = 0.25, truncated at ±20. The draw is derandomized the
    same way the engine's sampling operators are
    (operators/sampling.py hash-bucket discipline): u =
    md5(group || salt) mod 2^16 indexes a precomputed inverse-CDF
    ladder of INTEGER thresholds, so the released value is a pure
    function of (data, salt) — reproducible across engines and
    reruns, auditable, yet distributed exactly as the mechanism
    specifies over salt choices. Companion to rel_k_anonymity
    (linkability audit) and rel_gdpr_cascade_erasure (deletion) on
    the governance shelf.

    Plan shape at 100 TB: one map-side-combined count per group plus
    a codegen CASE projection — the noise ladder is constant-folded;
    zero extra shuffle beyond the groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("priority"), F.lit(_DP_SALT))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    noise = F.lit(_DP_B)
    for z, c in reversed(list(enumerate(_DP_CUM[:-1]))):
        noise = F.when(u < c, z - _DP_B).otherwise(noise)
    return g.select(
        "priority",
        "n_true",
        noise.cast("long").alias("noise"),
        (F.col("n_true") + noise).cast("long").alias("n_released"),
    )


# Candidate foreign-key pairs probed by rel_fk_discovery: four true
# FKs from the star schema plus one deliberate non-FK control.
_FK_CANDIDATES = [
    ("lineitem.l_orderkey->orders.o_orderkey",
     "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_suppkey->supplier.s_suppkey",
     "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer.c_custkey",
     "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey",
     "customer", "c_nationkey", "nation", "n_nationkey"),
    ("orders.o_orderkey->customer.c_custkey",
     "orders", "o_orderkey", "customer", "c_custkey"),
]


@query(
    "rel_fk_discovery",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{label}' AS candidate,
       CAST(COUNT(*) AS BIGINT) AS n_child_distinct,
       CAST(COUNT(*) FILTER (WHERE p.{pcol} IS NULL) AS BIGINT)
         AS n_unmatched,
       COUNT(*) FILTER (WHERE p.{pcol} IS NULL) = 0 AS is_inclusion
FROM (SELECT DISTINCT {ccol} FROM {child}) c
LEFT JOIN {parent} p ON p.{pcol} = c.{ccol}
"""
        for label, child, ccol, parent, pcol in _FK_CANDIDATES
    ),
    tags=("quality", "profiling", "inclusion-dependency", "foreign-key",
          "discovery"),
)
def rel_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOREIGN-KEY (inclusion-dependency) DISCOVERY — the schema
    profiling step that recovers undeclared join paths in a data
    lake (parquet carries no constraints): for each candidate pair,
    is every distinct child value present in the parent column?
    Four true star-schema edges and one deliberate non-FK control
    are probed; the report gives distinct-child cardinality,
    unmatched count, and the inclusion verdict. This is the
    Spark-first reduction of the classic SPIDER/de Marchi IND
    algorithms: distinct-project each side, then a left join keyed
    on the value itself.

    Plan shape at 100 TB: each probe is DISTINCT (map-side partial)
    → left join against the parent KEY column only (dimension
    parents broadcast; the one fact-fact probe shuffles two
    distinct-key sets, never the fact rows). Candidates run as one
    unioned DAG so the planner shares the repeated scans."""
    frames = []
    for label, child, ccol, parent, pcol in _FK_CANDIDATES:
        c = (
            load_table(spark, sf_dir, child)
            .select(F.col(ccol).cast("long").alias("v"))
            .distinct()
        )
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pcol).cast("long").alias("pv"))
            .distinct()
        )
        probe = c.join(p, c.v == p.pv, "left").agg(
            F.lit(label).alias("candidate"),
            F.count(F.lit(1)).cast("long").alias("n_child_distinct"),
            F.count(F.when(F.col("pv").isNull(), 1))
            .cast("long")
            .alias("n_unmatched"),
            (F.count(F.when(F.col("pv").isNull(), 1)) == 0).alias(
                "is_inclusion"
            ),
        )
        frames.append(probe)
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionAll(fr)
    return out


# Candidate functional dependencies probed by rel_fd_check:
# (determinant column, dependent column, table).
_FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_custkey"),       # key → holds
    ("lineitem", "l_orderkey", "l_returnflag"),  # violated
    ("lineitem", "l_partkey", "l_suppkey"),      # violated
    ("customer", "c_nationkey", "c_mktsegment"),  # violated
]


@query(
    "rel_fd_check",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{table}.{lhs}->{rhs}' AS candidate,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) FILTER (WHERE n_rhs > 1) AS BIGINT)
         AS n_violating_groups,
       COUNT(*) FILTER (WHERE n_rhs > 1) = 0 AS holds
FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS n_rhs
      FROM {table} GROUP BY {lhs}) g
"""
        for table, lhs, rhs in _FD_CANDIDATES
    ),
    tags=("quality", "profiling", "functional-dependency", "discovery"),
)
def rel_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNCTIONAL-DEPENDENCY check — the other half of schema
    profiling (Metanome/TANE-style, restricted to a declared
    candidate set, which is how FD validation actually runs at
    scale): does determinant column X fix dependent column Y? For
    each candidate the report counts determinant groups and groups
    carrying more than one distinct dependent value; zero violating
    groups ⇒ the FD holds. One true key-FD and three expected
    violations keep both verdict polarities exercised.

    Plan shape at 100 TB: per candidate, one groupBy on the
    determinant with a distinct-count — partial aggregation
    map-side, one shuffle keyed on X; the verdict aggregate is a
    scan over group rows. No joins, no row explosion."""
    frames = []
    for table, lhs, rhs in _FD_CANDIDATES:
        g = (
            load_table(spark, sf_dir, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("n_rhs"))
        )
        frames.append(
            g.agg(
                F.lit(f"{table}.{lhs}->{rhs}").alias("candidate"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.count(F.when(F.col("n_rhs") > 1, 1))
                .cast("long")
                .alias("n_violating_groups"),
                (F.count(F.when(F.col("n_rhs") > 1, 1)) == 0).alias("holds"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionAll(fr)
    return out


# Benford first-digit expectations log10(1 + 1/d), printed by Python
# repr so both engines parse the identical double literal.
_BENFORD = {
    1: "0.3010299956639812", 2: "0.17609125905568124",
    3: "0.12493873660829992", 4: "0.09691001300805642",
    5: "0.07918124604762482", 6: "0.06694678963061322",
    7: "0.05799194697768673", 8: "0.05115252244738129",
    9: "0.04575749056067514",
}


@query(
    "rel_benford_check",
    oracle=f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1.0
),
c AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
  FROM d GROUP BY digit
),
e AS (
  {" UNION ALL ".join(f"SELECT {k} AS digit, {v} AS expected_freq" for k, v in _BENFORD.items())}
)
SELECT c.digit, c.n,
       CAST(c.n AS DOUBLE) / c.total AS observed_freq,
       e.expected_freq,
       abs(CAST(c.n AS DOUBLE) / c.total - e.expected_freq) AS abs_dev
FROM c JOIN e ON e.digit = c.digit
""",
    tags=("quality", "profiling", "benford", "fraud", "audit"),
)
def rel_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit audit — the forensic screen for
    fabricated or synthetically-padded numeric columns (audit teams
    run exactly this over ledger amounts): the distribution of the
    first significant digit of o_totalprice against the Benford
    expectation log10(1 + 1/d). Expected frequencies are
    compile-time double literals (Python repr), the observed
    frequency is one per-row division, and the deviation column is
    per-row arithmetic — no cross-row float aggregation, so the
    report hash-matches bitwise. (The fixture prices are near-
    uniform, so the audit correctly FLAGS them — large deviations on
    low digits — demonstrating the detection, not vacuously
    passing.)

    Plan shape at 100 TB: one map-side-combined count over a single
    projected column (first digit via floor → string head), a 9-row
    broadcast join against the expectation literals. One shuffle of
    9 groups."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1.0).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("total", F.sum("n").over(w_all).cast("long"))
    )
    e = spark.createDataFrame(
        [(k, float(v)) for k, v in _BENFORD.items()],
        "digit long, expected_freq double",
    )
    obs = F.col("n").cast("double") / F.col("total")
    return c.join(F.broadcast(e), "digit").select(
        "digit", "n",
        obs.alias("observed_freq"),
        "expected_freq",
        F.abs(obs - F.col("expected_freq")).alias("abs_dev"),
    )


@query(
    "rel_join_cardinality_estimate",
    oracle="""
WITH ca AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c FROM orders
  GROUP BY o_custkey
),
cb AS (
  SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c FROM customer
  GROUP BY c_custkey
),
actual AS (
  SELECT CAST(SUM(ca.c * cb.c) AS BIGINT) AS n_actual
  FROM ca JOIN cb USING (k)
),
ba AS (SELECT k % 64 AS b, SUM(c) AS c FROM ca GROUP BY 1),
bb AS (SELECT k % 64 AS b, SUM(c) AS c FROM cb GROUP BY 1),
bkt AS (
  SELECT CAST(SUM(ba.c * bb.c) AS BIGINT) AS n_bucket_bound
  FROM ba JOIN bb USING (b)
),
cat AS (
  SELECT CAST((SELECT SUM(c) FROM ca) AS BIGINT) AS n_a,
         CAST((SELECT SUM(c) FROM cb) AS BIGINT) AS n_b,
         CAST(GREATEST((SELECT COUNT(*) FROM ca),
                       (SELECT COUNT(*) FROM cb)) AS BIGINT) AS max_ndv
)
SELECT actual.n_actual, bkt.n_bucket_bound,
       CAST(cat.n_a * cat.n_b AS DOUBLE) / cat.max_ndv AS n_catalog_est,
       CAST(bkt.n_bucket_bound AS DOUBLE) / actual.n_actual
         AS bucket_overestimate,
       (CAST(cat.n_a * cat.n_b AS DOUBLE) / cat.max_ndv)
         / actual.n_actual AS catalog_ratio
FROM actual, bkt, cat
""",
    tags=("quality", "profiling", "cardinality-estimation", "optimizer",
          "histogram"),
)
def rel_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-CARDINALITY estimation audit — the optimizer-statistics
    question behind every shuffle-planning decision ("how big will
    this join be?"), answered three ways and compared: (1) EXACT join
    size from full per-key histograms Σ c_A(k)·c_B(k); (2) the
    64-BUCKET histogram bound Σ c_A(b)·c_B(b) — what a bounded-memory
    statistics catalog can store; collisions make it an upper bound,
    and the overestimate ratio quantifies the resolution cost; (3)
    the classic catalog formula |A|·|B| / max(ndv) Spark's CBO uses
    with only table-level stats. Running the audit tells you whether
    ANALYZE-level histograms are worth their storage for a given key.

    Plan shape at 100 TB: both histograms are map-side-combined
    groupBys; the exact product joins HISTOGRAM rows (O(distinct
    keys)), never fact rows; the bucket bound joins 64 rows. The
    fact tables are scanned once each."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ca = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cb = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    actual = (
        ca.join(cb.withColumnRenamed("c", "c2"), "k")
        .agg(F.sum(F.col("c") * F.col("c2")).cast("long").alias("n_actual"))
    )
    ba = ca.groupBy((F.col("k") % 64).alias("b")).agg(F.sum("c").alias("c"))
    bb = cb.groupBy((F.col("k") % 64).alias("b")).agg(F.sum("c").alias("c"))
    bkt = (
        ba.join(bb.withColumnRenamed("c", "c2"), "b")
        .agg(
            F.sum(F.col("c") * F.col("c2"))
            .cast("long")
            .alias("n_bucket_bound")
        )
    )
    cat = ca.agg(
        F.sum("c").alias("n_a"), F.count(F.lit(1)).alias("ndv_a")
    ).crossJoin(
        F.broadcast(
            cb.agg(F.sum("c").alias("n_b"), F.count(F.lit(1)).alias("ndv_b"))
        )
    ).select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.greatest("ndv_a", "ndv_b").cast("long").alias("max_ndv"),
    )
    return (
        actual.crossJoin(F.broadcast(bkt))
        .crossJoin(F.broadcast(cat))
        .select(
            "n_actual",
            "n_bucket_bound",
            (
                (F.col("n_a") * F.col("n_b")).cast("double")
                / F.col("max_ndv")
            ).alias("n_catalog_est"),
            (
                F.col("n_bucket_bound").cast("double") / F.col("n_actual")
            ).alias("bucket_overestimate"),
            (
                (F.col("n_a") * F.col("n_b")).cast("double")
                / F.col("max_ndv")
                / F.col("n_actual")
            ).alias("catalog_ratio"),
        )
    )
