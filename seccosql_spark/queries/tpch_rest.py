"""The remaining TPC-H query shapes (Q2/4/6/8/9/11/13/15/16/17/20/21/22),
completing the 22-query suite alongside queries/relational.py (Q1/3/5) and
queries/tpch_shapes.py (Q7/10/12/14/18/19).

The testdata star schema is a reduced TPC-H (no partsupp, no comment/phone
columns, only shipdate/orderdate), so each query is a *shape-preserving
adaptation*: the structural feature that defines the query — correlated
scalar subquery (Q2/Q17), EXISTS semi-join (Q4), scan-filter-agg (Q6),
market-share CASE over an 8-way join (Q8), computed-profit agg (Q9),
HAVING-vs-scalar-subquery (Q11), outer-join histogram (Q13), view + max
scalar subquery (Q15), NOT IN anti-join + count distinct (Q16), nested IN
with HAVING (Q20), double EXISTS/NOT EXISTS self-joins (Q21), substring
buckets + avg-threshold + anti-join (Q22) — is kept; predicates are
re-targeted at the columns that exist.

Cross-engine determinism discipline (registry.py): money sums go through
DECIMAL, `avg`-style thresholds are rewritten multiplicatively so the
comparison is exact integer/decimal arithmetic (x < avg(y) over a group G
becomes x * count(G) < sum(y over G)), and every aggregate output is cast
to a stable type on both sides.
"""

from __future__ import annotations

from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession

REV = "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)"
VOL = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"


def _sql(name: str, spark_sql: str, doc: str, headline: bool = False):
    """Register a pass-through SQL query whose oracle is the same statement
    with Spark's TIMESTAMP_NTZ literals rewritten for DuckDB."""
    oracle = spark_sql.replace("TIMESTAMP_NTZ", "TIMESTAMP")

    @register(name, oracle, headline=headline)
    def _q(sess: SeccoSession, _sql_text=spark_sql):
        return sess.sql(_sql_text)

    _q.__name__ = name
    _q.__doc__ = doc
    return _q


# --------------------------------------------------------------------- Q2

_sql(
    "q2_min_acctbal_supplier",
    """
SELECT DISTINCT p_partkey, p_name, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal, n_name
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND s_acctbal = (SELECT min(s2.s_acctbal)
                   FROM supplier s2
                   JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                   JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                   JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                   WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
""",
    """TPC-H Q2 shape: per-part correlated MIN scalar subquery over the same
    join graph as the outer query (min-cost supplier; acctbal stands in for
    the absent ps_supplycost). Catalyst decorrelates into an aggregate +
    rejoin — the plan a hand decorrelation would produce.""",
)


# --------------------------------------------------------------------- Q4

_sql(
    "q4_order_priority",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE year(o_orderdate) = 1997
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
    """TPC-H Q4 shape: EXISTS correlated semi-join (returnflag stands in for
    the absent commit/receipt-date lateness test) then a tiny aggregate.
    Executes as LeftSemi hash join — no row multiplication.""",
)


# --------------------------------------------------------------------- Q6

_sql(
    "q6_forecast_revenue",
    """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
       AS revenue
FROM lineitem
WHERE year(l_shipdate) = 1996 AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
    """TPC-H Q6: pure scan-filter-aggregate — the canonical pushdown probe.
    All three predicates reach the parquet scan; zero shuffles beyond the
    final 1-row aggregate.""",
    headline=False,
)


# --------------------------------------------------------------------- Q8

_sql(
    "q8_market_share",
    f"""
SELECT yr,
       CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       / CAST(sum(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         {VOL} AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
GROUP BY yr
""",
    """TPC-H Q8 shape: national market share — the widest join in the suite
    (8 relations, nation joined twice on different keys). Decimal volume
    sums; the share division is the single double op at the end.""",
)


# --------------------------------------------------------------------- Q9

_sql(
    "q9_product_profit",
    f"""
SELECT nation, yr, CAST(sum(amount) AS DOUBLE) AS profit
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS INT) AS yr,
         {VOL} - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%r%'
)
GROUP BY nation, yr
""",
    """TPC-H Q9 shape: profit per nation-year with a LIKE part filter
    (retailprice*quantity stands in for the absent ps_supplycost term).
    Mixed-scale decimal subtraction stays exact in both engines.""",
)


# --------------------------------------------------------------------- Q11

_sql(
    "q11_important_parts",
    """
SELECT l_partkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
GROUP BY l_partkey
HAVING sum(CAST(l_extendedprice AS DECIMAL(12,2)))
       > (SELECT sum(CAST(l_extendedprice AS DECIMAL(12,2))) * 0.001
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_1')
""",
    """TPC-H Q11 shape: HAVING against an uncorrelated scalar subquery that
    re-aggregates the same join (value share threshold). The 0.001 literal
    is decimal in both engines, so the comparison is exact.""",
)


# --------------------------------------------------------------------- Q13

_sql(
    "q13_customer_distribution",
    """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    """TPC-H Q13: order-count distribution via LEFT OUTER join with an extra
    join-condition predicate (priority stands in for the comment filter) —
    the predicate must NOT be pushed below the outer join's null-extension.""",
)


# --------------------------------------------------------------------- Q15

_sql(
    "q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)))
           AS total_revenue
  FROM lineitem
  WHERE year(l_shipdate) = 1998
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    """TPC-H Q15: revenue view referenced twice — once as the join input,
    once inside the MAX scalar subquery. Equality on the exact decimal sum
    (never the double cast) keeps the argmax deterministic.""",
)


# --------------------------------------------------------------------- Q16

_sql(
    "q16_supplier_count",
    """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    """TPC-H Q16 shape: supplier variety per part class with a NOT IN
    anti-join (negative acctbal stands in for the complaints filter) and
    COUNT DISTINCT. NOT IN over a non-nullable key plans as NullAwareAnti
    -> plain anti hash join.""",
)


# --------------------------------------------------------------------- Q17

_sql(
    "q17_small_quantity_revenue",
    """
SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE)
       AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#2' AND p_type = 'ECONOMY'
  AND CAST(l_quantity AS BIGINT) * 5
      * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
      < (SELECT CAST(sum(CAST(l3.l_quantity AS BIGINT)) AS BIGINT)
         FROM lineitem l3 WHERE l3.l_partkey = lineitem.l_partkey)
""",
    """TPC-H Q17: small-quantity revenue below a per-part average. The
    fractional threshold `qty < 0.2 * avg(qty)` is rewritten multiplicatively
    (qty * 5 * count < sum — quantities are integral) so both engines compare
    exact BIGINTs; two correlated aggregate subqueries decorrelate into one
    per-part aggregate join.""",
)


# --------------------------------------------------------------------- Q20

_sql(
    "q20_potential_promotion",
    """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%i%')
    AND year(l_shipdate) = 1997
  GROUP BY l_suppkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > 500
)
""",
    """TPC-H Q20 shape: two-level nested IN — suppliers who moved >500 units
    of i-parts in 1997. The inner IN is a semi-join under a grouped HAVING;
    HUGEINT-vs-BIGINT sum drift is avoided by casting the sum's input.""",
)


# --------------------------------------------------------------------- Q21

_sql(
    "q21_sole_blame_supplier",
    """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
    """TPC-H Q21 shape: the sole-blame pattern — EXISTS another supplier on
    the order, NOT EXISTS another *failing* supplier (returnflag stands in
    for late receipt). Both subqueries are correlated self-joins on
    lineitem; Spark plans semi + anti hash joins on l_orderkey.""",
)


# --------------------------------------------------------------------- Q22

_sql(
    "q22_sales_opportunity",
    """
SELECT cntrycode, count(*) AS numcust, CAST(sum(acctbal) AS DOUBLE) AS totacctbal
FROM (
  SELECT substr(c_name, length(c_name) - 1, 2) AS cntrycode,
         CAST(c_acctbal AS DECIMAL(12,2)) AS acctbal
  FROM customer
  WHERE CAST(c_acctbal AS DECIMAL(12,2))
        * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
        > (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer WHERE c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
)
GROUP BY cntrycode
""",
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, bucketed by a name-suffix code (phone country code is absent).
    The avg threshold is multiplicative (bal * count > sum — exact decimal),
    and the NOT EXISTS is an anti join on o_custkey.""",
)
