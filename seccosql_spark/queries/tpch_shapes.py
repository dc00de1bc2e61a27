"""Additional multi-join analytical shapes (TPC-H Q7/Q10/Q18 style), CTEs,
grouping sets, window navigation, the Update operator analog, and the
PK-FK-planned star join — widening SURVEY.md §2.2/§2.6 coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from seccosql_spark.plans.pkfk import JoinInput, plan_star_join
from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession

REV = "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)"


Q7 = f"""
SELECT supp_nation, cust_nation, yr, {REV} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(o_orderdate) AS INT) AS yr,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, yr
"""


@register("q7_nation_volume", Q7, headline=True)
def q7_nation_volume(sess: SeccoSession):
    """Q7 shape: 6-way join with a self-joined dimension (nation twice) and a
    disjunctive cross-nation predicate."""
    return sess.sql(Q7)


Q10 = f"""
SELECT c_custkey, c_name, n_name, {REV} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", Q10)
def q10_returned_items(sess: SeccoSession):
    """Q10 shape: returned-item revenue per customer, top-20 (unique
    tiebreaker keeps the LIMIT set deterministic)."""
    return sess.sql(Q10)


Q18 = """
SELECT c_custkey, o_orderkey,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, o_orderkey
HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
"""


@register("q18_large_orders", Q18)
def q18_large_orders(sess: SeccoSession):
    """Q18 shape: group-having over a join (large-volume orders)."""
    return sess.sql(Q18)


CTE_MULTI = """
WITH big_orders AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000
),
cust_nation AS (
  SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, count(*) AS n_big,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM big_orders JOIN cust_nation ON o_custkey = c_custkey
GROUP BY n_name
"""


@register("cte_multi", CTE_MULTI)
def cte_multi(sess: SeccoSession):
    """Non-recursive multi-CTE (With, multiwayOperators.scala:294-326) —
    straight to Catalyst, which inlines or reuses the subplans."""
    return sess.sql(CTE_MULTI)


CUBE = """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_agg", CUBE)
def cube_agg(sess: SeccoSession):
    return sess.sql(CUBE)


@register(
    "window_lag_delta",
    """SELECT user_id, event_id,
              value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY event_id),
                               0.0) AS delta
       FROM events""",
)
def window_lag_delta(sess: SeccoSession):
    """Window navigation (lag): per-row double subtraction — deterministic."""
    return sess.sql(
        """SELECT user_id, event_id,
                  value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY event_id),
                                   CAST(0.0 AS DOUBLE)) AS delta
           FROM events"""
    )


@register(
    "update_rows",
    """SELECT o_orderkey,
              CASE WHEN o_totalprice > 400000 THEN 'FLAGGED' ELSE o_orderstatus END
                AS o_orderstatus
       FROM orders""",
)
def update_rows(sess: SeccoSession):
    """The reference's Update operator (unaryOperators.scala:265-275):
    key-matched row replacement, expressed as UnionByUpdate of the computed
    delta against the state — the MERGE-style plan from SURVEY.md §2.2."""
    state = sess.table("orders").project("o_orderkey", "o_orderstatus")
    delta = (
        sess.table("orders")
        .filter("o_totalprice > 400000")
        .project("o_orderkey", "'FLAGGED' AS o_orderstatus")
    )
    return state.union_by_update(delta, ["o_orderkey"])


PKFK_ORACLE = f"""
SELECT n_name, {REV} AS revenue, count(*) AS n
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE p_size > 25
GROUP BY n_name
"""


@register("pkfk_star_planned", PKFK_ORACLE)
def pkfk_star_planned(sess: SeccoSession):
    """Star join planned by the PK-FK layer (plans/pkfk.py — the reference's
    OptimizePKFKJoin): lineitem anchors as the fact (never PK-side);
    supplier/nation/part chain off it with broadcast hints backed by
    ANALYZE'd row counts (hints are only emitted for proven-small dims —
    the StatisticComputer -> optimizer flow of the reference)."""
    spark = sess.spark
    for dim in ("supplier", "nation", "part"):
        if sess.catalog.get(dim) is None or sess.catalog.get(dim).stats.row_count is None:
            sess.analyze_table(dim)
    inputs = [
        JoinInput("lineitem", spark.table("lineitem"), [("l_suppkey", "supplier", "s_suppkey"),
                                                        ("l_partkey", "part", "p_partkey")]),
        JoinInput("supplier", spark.table("supplier"), [("s_nationkey", "nation", "n_nationkey")]),
        JoinInput("nation", spark.table("nation"), []),
        JoinInput("part", spark.table("part").filter("p_size > 25"), []),
    ]
    joined = plan_star_join(sess.catalog, inputs)
    return sess.from_spark(
        joined.groupBy("n_name").agg(
            F.expr(
                "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)"
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


Q12 = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag = 'N'
GROUP BY o_orderpriority
"""


@register("q12_priority_buckets", Q12)
def q12_priority_buckets(sess: SeccoSession):
    """Q12 shape: join + conditional-CASE aggregation buckets."""
    return sess.sql(Q12)


Q14 = """
SELECT CAST(100.0 * sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))
                 ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
       AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


@register("q14_promo_share", Q14)
def q14_promo_share(sess: SeccoSession):
    """Q14 shape: conditional revenue share — decimal sums, one double
    division at the end (deterministic)."""
    return sess.sql(Q14)


Q19 = """
SELECT count(*) AS n,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30)
"""


@register("q19_disjunctive_join", Q19)
def q19_disjunctive_join(sess: SeccoSession):
    """Q19 shape: disjunctive multi-predicate join filter (Catalyst pushes
    the common l_partkey equi-key; the OR-of-ANDs stays a residual)."""
    return sess.sql(Q19)


STATS_ORDERED_ORACLE = """
SELECT r_name, count(*) AS n
FROM region JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
GROUP BY r_name
"""


@register("multiway_stats_ordered", STATS_ORDERED_ORACLE)
def multiway_stats_ordered(sess: SeccoSession):
    """Cost-based multiway join ordering from ANALYZE'd statistics
    (reference statsEstimation/StatsPlanVisitor + naive estimator): the
    4-relation natural-join chain is reordered greedily by estimated
    intermediate size (region -> nation -> customer -> orders, smallest
    first), which Catalyst without CBO would never do on its own. Result is
    order-independent; the oracle checks exact semantics."""
    from pyspark.sql import functions as F

    from seccosql_spark.plans.ghd import multiway_natural_join
    from seccosql_spark.plans.stats import RelStats

    spark = sess.spark
    for t in ("region", "nation", "customer", "orders"):
        meta = sess.catalog.get(t)
        if meta is None or meta.stats.row_count is None:
            sess.analyze_table(t)
    rows = {t: float(sess.catalog.get(t).stats.row_count)
            for t in ("region", "nation", "customer", "orders")}
    dfs = [
        spark.table("orders").select(
            F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("ck")
        ),
        spark.table("customer").select(
            F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
        ),
        spark.table("nation").select(
            F.col("n_nationkey").alias("nk"), F.col("n_regionkey").alias("rk")
        ),
        spark.table("region").select(F.col("r_regionkey").alias("rk"), "r_name"),
    ]
    stats = [
        RelStats(rows["orders"], {"ok": rows["orders"], "ck": rows["customer"]}),
        RelStats(rows["customer"], {"ck": rows["customer"], "nk": rows["nation"]}),
        RelStats(rows["nation"], {"nk": rows["nation"], "rk": rows["region"]}),
        RelStats(rows["region"], {"rk": rows["region"]}),
    ]
    joined = multiway_natural_join(dfs, use_ghd=False, stats=stats)
    return sess.from_spark(joined.groupBy("r_name").agg(F.count(F.lit(1)).alias("n")))


STATS_FILTERED_ORACLE = """
SELECT r_name, count(*) AS n
FROM region JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
WHERE o_totalprice <= 30000
GROUP BY r_name
"""


@register("multiway_stats_filtered", STATS_FILTERED_ORACLE)
def multiway_stats_filtered(sess: SeccoSession):
    """Histogram-aware join ordering (reference HistogramFilterEstimation
    feeding HistogramJoinEstimation): orders carries a selective range
    predicate (o_totalprice <= 30000, ~4% of rows), so its HISTOGRAM-scaled
    estimate — not its base row count — drives the greedy ordering, and the
    filtered fact correctly orders before the larger-than-filtered customer
    table. Result is order-independent; the oracle checks exact semantics,
    test_stats.py pins the ordering decision."""
    from pyspark.sql import functions as F

    from seccosql_spark.plans.ghd import multiway_natural_join
    from seccosql_spark.plans.stats import stats_from_catalog

    spark = sess.spark
    analyze_cols = {
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey", "c_nationkey"],
        "nation": ["n_nationkey", "n_regionkey"],
        "region": ["r_regionkey"],
    }
    for t, cols in analyze_cols.items():
        meta = sess.catalog.get(t)
        if (
            meta is None
            or meta.stats.row_count is None
            or any(c not in meta.stats.ndv for c in cols)
        ):
            sess.analyze_table(t, cols)
    if "o_totalprice" not in sess.catalog.get("orders").stats.histograms:
        sess.analyze_histogram("orders", "o_totalprice")
    dfs = [
        spark.table("orders")
        .filter(F.col("o_totalprice") <= 30000)
        .select(F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("ck")),
        spark.table("customer").select(
            F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
        ),
        spark.table("nation").select(
            F.col("n_nationkey").alias("nk"), F.col("n_regionkey").alias("rk")
        ),
        spark.table("region").select(F.col("r_regionkey").alias("rk"), "r_name"),
    ]
    # the catalog plumbing end-to-end: measured rows/NDVs, the histogram
    # scaling for the range predicate, and the alias mapping used by the
    # natural-join projections above — no hand-assembled RelStats
    stats = stats_from_catalog(
        sess.catalog,
        ["orders", "customer", "nation", "region"],
        predicates={"orders": [("o_totalprice", None, 30000.0)]},
        renames={
            "orders": {"o_orderkey": "ok", "o_custkey": "ck"},
            "customer": {"c_custkey": "ck", "c_nationkey": "nk"},
            "nation": {"n_nationkey": "nk", "n_regionkey": "rk"},
            "region": {"r_regionkey": "rk"},
        },
    )
    joined = multiway_natural_join(dfs, use_ghd=False, stats=stats)
    return sess.from_spark(joined.groupBy("r_name").agg(F.count(F.lit(1)).alias("n")))


STATS_EQUALITY_ORACLE = """
SELECT r_name, count(*) AS n
FROM region JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
WHERE c_nationkey = 3
GROUP BY r_name
"""


@register("multiway_stats_equality", STATS_EQUALITY_ORACLE)
def multiway_stats_equality(sess: SeccoSession):
    """Equality-predicate selectivity feeding join ordering (round-5
    extension of the histogram tier): customer carries `c_nationkey = 3`,
    and the equi-height histogram's per-bin distinct estimate (or the
    1/NDV fallback) scales customer's estimate BEFORE the greedy ordering
    — so the ~1/25-selective filtered customer anchors the plan ahead of
    the bigger orders table. Runs entirely through
    ``stats_from_catalog(predicates=..., renames=...)`` — the same plumbing
    a user would write. Result is order-independent; the oracle checks
    exact semantics, `test_stats.py` pins the ordering decision."""
    from pyspark.sql import functions as F

    from seccosql_spark.plans.ghd import multiway_natural_join
    from seccosql_spark.plans.stats import stats_from_catalog

    spark = sess.spark
    analyze_cols = {
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey", "c_nationkey"],
        "nation": ["n_nationkey", "n_regionkey"],
        "region": ["r_regionkey"],
    }
    for t, cols in analyze_cols.items():
        meta = sess.catalog.get(t)
        if (
            meta is None
            or meta.stats.row_count is None
            or any(c not in meta.stats.ndv for c in cols)
        ):
            sess.analyze_table(t, cols)
    if "c_nationkey" not in sess.catalog.get("customer").stats.histograms:
        sess.analyze_histogram("customer", "c_nationkey")
    dfs = [
        spark.table("orders").select(
            F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("ck")
        ),
        spark.table("customer")
        .filter(F.col("c_nationkey") == 3)
        .select(F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")),
        spark.table("nation").select(
            F.col("n_nationkey").alias("nk"), F.col("n_regionkey").alias("rk")
        ),
        spark.table("region").select(F.col("r_regionkey").alias("rk"), "r_name"),
    ]
    stats = stats_from_catalog(
        sess.catalog,
        ["orders", "customer", "nation", "region"],
        predicates={"customer": [("c_nationkey", 3.0, 3.0)]},
        renames={
            "orders": {"o_orderkey": "ok", "o_custkey": "ck"},
            "customer": {"c_custkey": "ck", "c_nationkey": "nk"},
            "nation": {"n_nationkey": "nk", "n_regionkey": "rk"},
            "region": {"r_regionkey": "rk"},
        },
    )
    joined = multiway_natural_join(dfs, use_ghd=False, stats=stats)
    return sess.from_spark(joined.groupBy("r_name").agg(F.count(F.lit(1)).alias("n")))
