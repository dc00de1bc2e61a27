"""Relational operator queries (SURVEY.md §2.2 + §2.4-§2.6 surface).

Each entry exercises one operator/verb of the engine against the TPC-H-ish
testdata and carries an equivalent DuckDB oracle. Decimal-cast discipline for
float aggregates is explained in registry.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession

# --------------------------------------------------------------- flagship

Q1_SPARK = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))
                * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

Q1_ORACLE = Q1_SPARK.replace("TIMESTAMP_NTZ", "TIMESTAMP")


@register("q1_pricing_summary", Q1_ORACLE, headline=True)
def q1_pricing_summary(sess: SeccoSession):
    """TPC-H Q1 shape — the reference's own disabled integration query
    (SeccoSimpleIntegrationTest.scala:11-29): scan→filter→agg. One shuffle
    (groupBy on 6 groups), partial aggregation map-side."""
    return sess.sql(Q1_SPARK)


# ------------------------------------------------- basic unary operators

@register(
    "filter_predicate",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
       FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05""",
)
def filter_predicate(sess: SeccoSession):
    """σ (Filter, unaryOperators.scala:91-104) via the verb API — note the
    reference's `.select(pred)` IS filter. Predicate pushes to parquet scan."""
    return (
        sess.table("lineitem")
        .select("l_quantity > 45 AND l_discount < 0.05")
        .project("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )


@register(
    "project_compute",
    """SELECT p_partkey, upper(p_name) AS name_upper,
              p_retailprice * p_size AS value FROM part""",
)
def project_compute(sess: SeccoSession):
    """π with computed expressions + aliases (Project, unaryOperators.scala:112-127)."""
    return sess.table("part").project(
        "p_partkey", "upper(p_name) AS name_upper", "p_retailprice * p_size AS value"
    )


@register(
    "distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(sess: SeccoSession):
    """Distinct (unaryOperators.scala:134-145)."""
    return sess.table("lineitem").project("l_returnflag", "l_linestatus").distinct()


@register(
    "sort_limit_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def sort_limit_topk(sess: SeccoSession):
    """Sort + Limit (unaryOperators.scala:153-185) — the reference never
    physically planned Limit; here it is Spark's TakeOrderedAndProject (no
    full sort at scale). Unique tiebreaker keeps the SET deterministic."""
    return (
        sess.table("orders")
        .project("o_orderkey", "o_totalprice")
        .sort(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "aggregate_global",
    """SELECT count(*) AS n_rows, min(l_quantity) AS min_qty,
              max(l_extendedprice) AS max_price,
              count(DISTINCT l_suppkey) AS n_supp FROM lineitem""",
)
def aggregate_global(sess: SeccoSession):
    """Global aggregate, no grouping (Aggregate, unaryOperators.scala:193-218)."""
    return sess.table("lineitem").aggregate(
        [
            "count(*) AS n_rows",
            "min(l_quantity) AS min_qty",
            "max(l_extendedprice) AS max_price",
            "count(DISTINCT l_suppkey) AS n_supp",
        ]
    )


@register(
    "aggregate_group_having",
    """SELECT l_suppkey, count(*) AS n,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM lineitem GROUP BY l_suppkey HAVING count(*) > 20""",
)
def aggregate_group_having(sess: SeccoSession):
    """GroupBy + HAVING (the reference resolves having via
    ResolveAggregateFunctionsInHaving; here it's a post-agg filter)."""
    return (
        sess.table("lineitem")
        .aggregate(
            ["count(*) AS n", "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty"],
            ["l_suppkey"],
        )
        .filter("n > 20")
    )


# ------------------------------------------------------------------ joins

@register(
    "join_inner_groupby",
    """SELECT c_mktsegment, count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def join_inner_groupby(sess: SeccoSession):
    """Inner equi join (BinaryJoin, binaryOperators.scala:94-147). Customer is
    the small side — Catalyst broadcasts it (verified in bench explain)."""
    orders, cust = sess.table("orders"), sess.table("customer")
    return orders.join(cust, "o_custkey = c_custkey").aggregate(
        [
            "count(*) AS n_orders",
            "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total",
        ],
        ["c_mktsegment"],
    )


@register(
    "join_left_outer",
    """SELECT c_custkey, count(o_orderkey) AS n_orders
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey""",
)
def join_left_outer(sess: SeccoSession):
    """LeftOuter join (joinTypes.scala) — count(col) skips the nulls of
    order-less customers, matching SQL semantics."""
    cust, orders = sess.table("customer"), sess.table("orders")
    return cust.join(orders, "c_custkey = o_custkey", "left").aggregate(
        ["count(o_orderkey) AS n_orders"], ["c_custkey"]
    )


@register(
    "join_right_outer",
    """SELECT c_custkey, count(o_orderkey) AS n_orders
       FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
       GROUP BY c_custkey""",
)
def join_right_outer(sess: SeccoSession):
    """RightOuter join."""
    cust, orders = sess.table("customer"), sess.table("orders")
    return orders.join(cust, "c_custkey = o_custkey", "right").aggregate(
        ["count(o_orderkey) AS n_orders"], ["c_custkey"]
    )


@register(
    "join_full_outer",
    """WITH a AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
            b AS (SELECT s_nationkey AS nk, count(*) AS n_supp
                  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
       SELECT coalesce(a.nk, b.nk) AS nk,
              coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
       FROM a FULL JOIN b ON a.nk = b.nk""",
)
def join_full_outer(sess: SeccoSession):
    """FullOuter join with unmatched rows on both sides."""
    a = (
        sess.table("customer")
        .filter("c_acctbal > 9000")
        .aggregate(["count(*) AS n_cust"], ["c_nationkey"])
        .project("c_nationkey AS nk", "n_cust")
    )
    b = (
        sess.table("supplier")
        .filter("s_acctbal > 9000")
        .aggregate(["count(*) AS n_supp"], ["s_nationkey"])
        .project("s_nationkey AS nk", "n_supp")
    )
    return a.join(b, ["nk"], "full").project(
        "nk", "coalesce(n_cust, 0) AS n_cust", "coalesce(n_supp, 0) AS n_supp"
    )


@register(
    "join_semi",
    """SELECT c_custkey FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
                     AND o_totalprice > 400000)""",
)
def join_semi(sess: SeccoSession):
    """LeftSemi join = EXISTS (joinTypes.scala LeftSemi)."""
    cust, orders = sess.table("customer"), sess.table("orders")
    big = orders.filter("o_totalprice > 400000")
    return cust.join(big, "c_custkey = o_custkey", "left_semi").project("c_custkey")


@register(
    "join_anti",
    """SELECT c_custkey FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
                         AND o_totalprice > 400000)""",
)
def join_anti(sess: SeccoSession):
    """LeftAnti join = NOT EXISTS (filtered right side so the result is
    non-empty at every sf — every customer has *some* order in this data)."""
    cust, orders = sess.table("customer"), sess.table("orders")
    big = orders.filter("o_totalprice > 400000")
    return cust.join(big, "c_custkey = o_custkey", "left_anti").project("c_custkey")


@register(
    "cross_join_pairs",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def cross_join_pairs(sess: SeccoSession):
    """CartesianProduct (binaryOperators.scala:75-86) on two tiny dims."""
    return sess.table("region").cartesian_product(sess.table("nation")).project(
        "r_name", "n_name"
    )


@register(
    "theta_join",
    """SELECT s_suppkey, count(*) AS n_poorer
       FROM supplier JOIN customer
         ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
       GROUP BY s_suppkey""",
)
def theta_join(sess: SeccoSession):
    """θ join: equi key + non-equi residual, extracted the way the reference's
    planner pulls equi-conjuncts (SeccoStrategies.scala:150-179) — here
    Catalyst does the extraction."""
    sup, cust = sess.table("supplier"), sess.table("customer")
    return sup.join(
        cust, "s_nationkey = c_nationkey AND s_acctbal > c_acctbal"
    ).aggregate(["count(*) AS n_poorer"], ["s_suppkey"])


@register(
    "natural_join_count",
    """SELECT n_name, count(*) AS n_cust
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name""",
)
def natural_join_count(sess: SeccoSession):
    """NaturalJoin (joinTypes.scala NaturalJoin) — common-column join after
    projection renames."""
    cust = sess.table("customer").project("c_custkey", "c_nationkey AS nationkey")
    nat = sess.table("nation").project("n_nationkey AS nationkey", "n_name")
    return cust.natural_join(nat).aggregate(["count(*) AS n_cust"], ["n_name"])


# ------------------------------------------------------------------ set ops

@register(
    "union_all_counts",
    """SELECT k, count(*) AS n FROM (
         SELECT c_nationkey AS k FROM customer
         UNION ALL SELECT s_nationkey AS k FROM supplier
       ) GROUP BY k""",
)
def union_all_counts(sess: SeccoSession):
    """n-ary bag Union (multiwayOperators.scala:38-48)."""
    c = sess.table("customer").project("c_nationkey AS k")
    s = sess.table("supplier").project("s_nationkey AS k")
    return c.union_all(s).aggregate(["count(*) AS n"], ["k"])


@register(
    "union_distinct",
    """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9500
       UNION SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 9500""",
)
def union_distinct(sess: SeccoSession):
    """union = Distinct(Union) (SeccoDataFrame.scala:246-262)."""
    c = sess.table("customer").filter("c_acctbal > 9500").project("c_nationkey AS k")
    s = sess.table("supplier").filter("s_acctbal > 9500").project("s_nationkey AS k")
    return c.union(s)


@register(
    "intersect_keys",
    """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9500
       INTERSECT SELECT s_nationkey AS k FROM supplier""",
)
def intersect_keys(sess: SeccoSession):
    """Intersection (binaryOperators.scala:39-50) — set semantics."""
    c = sess.table("customer").filter("c_acctbal > 9500").project("c_nationkey AS k")
    s = sess.table("supplier").project("s_nationkey AS k")
    return c.intersection(s)


@register(
    "intersect_all_bag",
    """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
       INTERSECT ALL SELECT s_nationkey AS k FROM supplier""",
)
def intersect_all_bag(sess: SeccoSession):
    """Bag intersection (INTERSECT ALL: min multiplicities) — completes the
    set-op family's bag/set matrix alongside `except_all_bag`."""
    c = sess.table("customer").filter("c_acctbal > 9000").project("c_nationkey AS k")
    s = sess.table("supplier").project("s_nationkey AS k")
    return c.intersection_all(s)


@register(
    "except_distinct",
    """SELECT c_nationkey AS k FROM customer
       EXCEPT SELECT s_nationkey AS k FROM supplier""",
)
def except_distinct(sess: SeccoSession):
    """EXCEPT with CORRECT set-difference semantics — the reference parses SQL
    EXCEPT into Intersection (LogicalPlanBuilder.scala:219-221, a bug we do
    not replicate)."""
    c = sess.table("customer").project("c_nationkey AS k")
    s = sess.table("supplier").project("s_nationkey AS k")
    return sess.from_spark(c.df.distinct().subtract(s.df))


@register(
    "except_all_bag",
    """SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 48
       EXCEPT ALL SELECT s_suppkey AS k FROM supplier""",
)
def except_all_bag(sess: SeccoSession):
    """Bag difference (the DataFrame `difference()` semantics,
    SeccoDataFrame.scala:268-273)."""
    li = sess.table("lineitem").filter("l_quantity > 48").project("l_suppkey AS k")
    s = sess.table("supplier").project("s_suppkey AS k")
    return li.difference(s)


# ------------------------------------------- dialect: upsert + recursion

UBU_ORACLE = """
WITH q1 AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0),
     q2 AS (SELECT o_orderkey, CAST(-1.0 AS DOUBLE) AS o_totalprice
            FROM orders WHERE o_orderkey % 5 = 0)
SELECT l.o_orderkey, l.o_totalprice FROM q1 l
LEFT JOIN q2 r ON l.o_orderkey = r.o_orderkey WHERE r.o_orderkey IS NULL
UNION ALL SELECT o_orderkey, o_totalprice FROM q2
"""


@register("union_by_update", UBU_ORACLE)
def union_by_update_sql(sess: SeccoSession):
    """UnionByUpdate upsert via the SQL dialect (parsing/SQLParser.scala:
    328-336) — rewritten to anti-join + union (one shuffle / broadcast)."""
    return sess.sql(
        """(SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0)
           UNION BYUPDATE o_orderkey
           (SELECT o_orderkey, CAST(-1.0 AS DOUBLE) AS o_totalprice
            FROM orders WHERE o_orderkey % 5 = 0)"""
    )


REC_ORACLE = """
WITH RECURSIVE reach(src, dst, d) AS (
  SELECT n_nationkey AS src, CAST((n_nationkey + 1) % 25 AS INT) AS dst, 1 AS d FROM nation
  UNION ALL
  SELECT r.src, CAST((r.dst + 1) % 25 AS INT) AS dst, d + 1 FROM reach r WHERE d < 5
)
SELECT DISTINCT src, dst FROM reach
"""


@register("with_recursive_reach", REC_ORACLE)
def with_recursive_reach(sess: SeccoSession):
    """WITH RECURSIVE(n) bounded transitive closure (SQLParser.scala:360-374)
    over a 25-node ring derived from nation: 4 semi-naive rounds after the
    base = paths of length ≤ 5."""
    return sess.sql(
        """WITH RECURSIVE(4) reach(src, dst) AS (
             SELECT n_nationkey AS src, CAST((n_nationkey + 1) % 25 AS INT) AS dst FROM nation
             UNION
             SELECT r.src, CAST((e.dst2 + 0) AS INT) AS dst
             FROM reach r JOIN (SELECT n_nationkey AS src2,
                                       CAST((n_nationkey + 1) % 25 AS INT) AS dst2
                                FROM nation) e ON r.dst = e.src2
           ) SELECT src, dst FROM reach"""
    )


# ------------------------------------------------------------- subqueries

@register(
    "exists_subquery",
    """SELECT p_partkey FROM part p
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_partkey = p.p_partkey AND l_quantity > 49)""",
)
def exists_subquery(sess: SeccoSession):
    """Correlated EXISTS — unresolved no-op in the reference
    (resolve.scala:435-437); native in Spark."""
    return sess.sql(
        """SELECT p_partkey FROM part p
           WHERE EXISTS (SELECT 1 FROM lineitem
                         WHERE l_partkey = p.p_partkey AND l_quantity > 49)"""
    )


@register(
    "in_subquery",
    """SELECT o_orderkey FROM orders
       WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)""",
)
def in_subquery(sess: SeccoSession):
    return sess.sql(
        """SELECT o_orderkey FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)"""
    )


@register(
    "scalar_subquery",
    """SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_totalprice > (SELECT avg(o_totalprice) * 2 FROM orders)""",
)
def scalar_subquery(sess: SeccoSession):
    """Scalar subquery in a predicate. avg used only as a threshold — engine
    fp differences cannot flip rows unless a price sits within ~1e-9 of 2*avg."""
    return sess.sql(
        """SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_totalprice > (SELECT avg(o_totalprice) * 2 FROM orders)"""
    )


# ------------------------------------------------------- scalar functions

@register(
    "scalar_case_null",
    """SELECT o_orderkey,
              CASE WHEN o_totalprice > 300000 THEN 'big'
                   WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
              greatest(o_totalprice, 150000.0) AS floor_price,
              least(o_totalprice, 150000.0) AS cap_price,
              coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2,
              CAST(floor(o_totalprice) AS BIGINT) AS price_int
       FROM orders""",
)
def scalar_case_null(sess: SeccoSession):
    """CASE WHEN (lexed but unparsed in the reference, SQLParser.scala:34 TODO),
    If/Coalesce/NullIf (nullExpressions.scala), Greatest/Least
    (arithmetic.scala:241-375), Cast (Cast.scala:147-162)."""
    return sess.table("orders").project(
        "o_orderkey",
        "CASE WHEN o_totalprice > 300000 THEN 'big' "
        "WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket",
        "greatest(o_totalprice, 150000.0) AS floor_price",
        "least(o_totalprice, 150000.0) AS cap_price",
        "coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2",
        "CAST(floor(o_totalprice) AS BIGINT) AS price_int",
    )


@register(
    "scalar_string_funcs",
    """SELECT p_partkey, upper(p_name) AS up, length(p_name) AS len,
              substr(p_name, 1, 5) AS prefix,
              concat(p_brand, '#', p_type) AS brand_type
       FROM part""",
)
def scalar_string_funcs(sess: SeccoSession):
    """String functions — absent entirely in the reference (§2.4 'Absent');
    free through Spark."""
    return sess.table("part").project(
        "p_partkey",
        "upper(p_name) AS up",
        "CAST(length(p_name) AS INT) AS len",
        "substr(p_name, 1, 5) AS prefix",
        "concat(p_brand, '#', p_type) AS brand_type",
    )


@register(
    "scalar_datetime",
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS month,
              CAST(year(o_orderdate) AS INT) AS yr
       FROM orders""",
)
def scalar_datetime(sess: SeccoSession):
    """Date/time functions (absent in the reference)."""
    return sess.table("orders").project(
        "o_orderkey",
        "date_format(o_orderdate, 'yyyy-MM') AS month",
        "CAST(year(o_orderdate) AS INT) AS yr",
    )


# ----------------------------------------------------------------- windows

@register(
    "window_topk_per_user",
    """SELECT user_id, event_id, rn FROM (
         SELECT user_id, event_id,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id) AS rn
         FROM events
       ) WHERE rn <= 3""",
)
def window_topk_per_user(sess: SeccoSession):
    """Window functions (absent in the reference, §2.4): top-3 events per user.
    Unique event_id tiebreak keeps ranks deterministic."""
    return sess.sql(
        """SELECT user_id, event_id, rn FROM (
             SELECT user_id, event_id,
                    row_number() OVER (PARTITION BY user_id
                                       ORDER BY value DESC, event_id) AS rn
             FROM events
           ) WHERE rn <= 3"""
    )


@register(
    "window_running_sum",
    """SELECT event_id, user_id,
              CAST(sum(CAST(value AS DECIMAL(18,6)))
                   OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS running
       FROM events""",
)
def window_running_sum(sess: SeccoSession):
    return sess.sql(
        """SELECT event_id, user_id,
                  CAST(sum(CAST(value AS DECIMAL(18,6)))
                       OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS running
           FROM events"""
    )


# --------------------------------------------------------- grouping sets

@register(
    "rollup_agg",
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def rollup_agg(sess: SeccoSession):
    """ROLLUP grouping sets (beyond the reference's surface; Spark-native)."""
    return sess.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
           FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""
    )


@register(
    "pivot_status",
    """SELECT l_returnflag,
              count(*) FILTER (WHERE l_linestatus = 'O') AS "O",
              count(*) FILTER (WHERE l_linestatus = 'F') AS "F"
       FROM lineitem GROUP BY l_returnflag""",
)
def pivot_status(sess: SeccoSession):
    """Pivot (DataFrame API)."""
    li = sess.table("lineitem")
    return sess.from_spark(
        li.df.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).count()
    )


@register(
    "unpivot_metrics_long",
    """WITH wide AS (
         SELECT source,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         FROM documents GROUP BY source)
       SELECT source, metric, value
       FROM wide UNPIVOT (value FOR metric IN (n_docs, total_chars, n_langs))""",
)
def unpivot_metrics_long(sess: SeccoSession):
    """Unpivot (wide → long) — the inverse of `pivot_status`, via the
    DataFrame `unpivot` API (SQL-standard UNPIVOT clause in the oracle).
    A per-source metrics row (n_docs, total_chars, n_langs) melts into
    (source, metric, value) triples — the shape every metrics store and
    sparse-feature pipeline wants. Unpivot is a map-only Expand (one
    output row per id×metric, no shuffle beyond the feeding aggregate),
    so it costs nothing extra at any scale. All values BIGINT so the
    long column is exactly typed in both engines."""
    docs = sess.spark.table("documents")
    wide = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
    )
    out = wide.unpivot(
        ids=["source"],
        values=["n_docs", "total_chars", "n_langs"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return sess.from_spark(out)


# ------------------------------------------------------- multi-join shapes

Q3_SPARK = """
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", Q3_SPARK, headline=True)
def q3_shipping_priority(sess: SeccoSession):
    """TPC-H Q3 shape: 3-way PK-FK join chain + agg + top-k."""
    return sess.sql(Q3_SPARK)


Q5_ORACLE = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY n_name
"""


@register("q5_join_chain", Q5_ORACLE, headline=True)
def q5_join_chain(sess: SeccoSession):
    """TPC-H Q5 shape via the verb API: a 5-way PK-FK chain. Small dims are
    explicitly broadcast (at 100 TB only lineitem⋈orders shuffles)."""
    li = sess.table("lineitem")
    orders = sess.table("orders")
    cust = sess.from_spark(F.broadcast(sess.table("customer").df))
    nation = sess.from_spark(F.broadcast(sess.table("nation").df))
    region = sess.from_spark(F.broadcast(sess.table("region").df))
    return (
        li.join(orders, "l_orderkey = o_orderkey")
        .join(cust, "o_custkey = c_custkey")
        .join(nation, "c_nationkey = n_nationkey")
        .join(region, "n_regionkey = r_regionkey")
        .filter("r_name IN ('ASIA', 'EUROPE')")
        .aggregate(
            [
                "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue",
                "count(*) AS n",
            ],
            ["n_name"],
        )
    )


GHD_ORACLE = """
SELECT nationkey, count(*) AS n FROM (
  SELECT c.c_nationkey AS nationkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
) GROUP BY nationkey
"""


@register("multiway_natural_ghd", GHD_ORACLE)
def multiway_natural_ghd(sess: SeccoSession):
    """MultiwayJoin (plan/multiwayOperators.scala:57-154) through the GHD
    planner: acyclic chain → GYO join-tree order, no cross products."""
    li = sess.table("lineitem").project("l_orderkey AS orderkey")
    orders = sess.table("orders").project("o_orderkey AS orderkey", "o_custkey AS custkey")
    cust = sess.table("customer").project("c_custkey AS custkey", "c_nationkey AS nationkey")
    return li.multiway_join([orders, cust]).aggregate(["count(*) AS n"], ["nationkey"])


SALTED_ORACLE = """
SELECT o_orderkey, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@register("skew_salted_join", SALTED_ORACLE)
def skew_salted_join(sess: SeccoSession):
    """Salted skew join (operators/skew.py): the physical rewrite — left side
    salted by a deterministic hash, right side replicated across salts, join
    on (key, salt) — must be exactly semantics-preserving vs the plain
    equi-join the oracle runs. Salting spreads one hot FK key over
    `salt_factor` reducers; the oracle twin proves zero row drift."""
    from seccosql_spark.operators.skew import salted_join

    orders = sess.spark.table("orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey")
    )
    customer = sess.spark.table("customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    out = salted_join(orders, customer, ["custkey"], left_uniquifier="o_orderkey")
    return sess.from_spark(out.select("o_orderkey", "c_name"))


LATERAL_ORACLE = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 3
) t
"""


@register("lateral_top_customers", LATERAL_ORACLE)
def lateral_top_customers(sess: SeccoSession):
    """Correlated LATERAL subquery — top-3 customers by account balance per
    nation, written as the ANSI LATERAL join both engines parse natively
    (Spark >= 3.4 DecorrelateInnerQuery rewrites it to the same
    partitioned-rank plan a window formulation produces, so there is no
    per-outer-row re-execution at scale — the correlated LIMIT becomes a
    rank filter after one hash join). Ties broken by name; balances are
    read-through doubles (no arithmetic, bit-identical across engines)."""
    return sess.from_spark(sess.spark.sql(LATERAL_ORACLE))


QUALIFY_SQL = """
SELECT o_orderpriority, o_orderkey,
       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                           ORDER BY floor(o_totalprice * 100 + 0.5) DESC,
                                    o_orderkey) <= 2
"""


@register("qualify_top_orders_sql", QUALIFY_SQL)
def qualify_top_orders_sql(sess: SeccoSession):
    """QUALIFY dialect clause — top-2 orders per priority, written with the
    window filter INLINE instead of a wrapper subquery. Spark has no
    QUALIFY; the preprocessor rewrites it into the window-materializing
    subquery + WHERE (sql/preprocessor.rewrite_qualify; trailing
    ORDER BY/LIMIT apply after the filter — pinned in
    test_preprocessor.py, kept out of this row so the plan stays
    sort-free). DuckDB runs QUALIFY
    natively, so the oracle is the IDENTICAL SQL text — the rewrite is
    proven equivalent to the clause's native semantics, not to a
    hand-translated twin. Ranking on exact cents with key tie-breaks
    (the cross-engine float discipline)."""
    return sess.sql(QUALIFY_SQL)
