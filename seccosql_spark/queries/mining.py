"""Behavioral mining and data-profiling analytics (engine extensions beyond
SURVEY §2's reference surface — the event-sequence / customer-analytics
queries a production pipeline runs next to dedup and curation).

Queries here follow the registry's cross-engine discipline: decimal-sum for
any double aggregation, unique-key tiebreaks inside every window ORDER BY,
and integer outputs wherever a ratio would invite float drift. Each is one
or two hash shuffles — nothing all-pairs, nothing driver-side.

Scale notes per query are in the individual docstrings; the common shape is
"window over PARTITION BY user/customer" (one hash exchange, streams within
partitions) followed by a map-side-combined aggregation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession


def _sql(name: str, sql: str, doc: str):
    """Register a query whose Spark side and DuckDB oracle run the SAME
    ANSI-SQL text (engine-portable subset only)."""

    @register(name, sql)
    def _q(sess: SeccoSession, _s=sql):
        return sess.sql(_s)

    _q.__name__ = name
    _q.__doc__ = doc
    return _q


# ---------------------------------------------------------------------------
# Event-sequence mining
# ---------------------------------------------------------------------------

_sql(
    "markov_transitions",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS prev_type, next_type, CAST(count(*) AS BIGINT) AS n
FROM seq
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
    """First-order Markov transition counts over per-user event sequences
    (prev event_type -> next event_type). Counts only — downstream
    probability normalization is a trivial per-prev_type ratio the caller
    applies; emitting integers keeps the cross-engine hash exact. Scale: one
    hash exchange on user_id for the lead() window, then a map-side-combined
    count on the (prev, next) pair — 25 output rows regardless of corpus
    size.""",
)


ATTRIBUTION_ORACLE = """
WITH tagged AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type IN ('view', 'click')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type
  FROM events
)
SELECT coalesce(touch_type, 'none') AS attributed_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(value AS DECIMAL(28,9))) AS DOUBLE) AS attributed_value
FROM tagged
WHERE event_type = 'purchase'
GROUP BY coalesce(touch_type, 'none')
"""


@register("attribution_last_touch", ATTRIBUTION_ORACLE)
def attribution_last_touch(sess: SeccoSession):
    """Last-touch marketing attribution: each purchase is credited to the
    latest preceding view/click by the same user (strictly before it in the
    (ts, event_id) order); purchases with no prior touch fall into 'none'.

    Implementation: ``last(touch, ignorenulls=True)`` over a
    ROWS UNBOUNDED PRECEDING..1 PRECEDING frame — the frame excludes the
    purchase row itself, and ignore-nulls skips non-touch events without a
    self-join. Scale: ONE hash exchange on user_id; the frame is computed
    streaming within each partition (no buffering beyond the running last
    value), then a 3-row aggregation. The decimal-sum keeps the attributed
    revenue hash-exact across engines."""
    ev = sess.spark.table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type").isin("view", "click"), F.col("event_type"))
    out = (
        ev.withColumn("touch_type", F.last(touch, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch_type", F.lit("none")).alias("attributed_type"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(28,9)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )
    return sess.from_spark(out)


# ---------------------------------------------------------------------------
# Customer analytics
# ---------------------------------------------------------------------------

_sql(
    "rfm_segments",
    """
WITH cm AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS freq,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders
  GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey,
         CAST(ntile(5) OVER (ORDER BY last_order, o_custkey) AS INT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY freq, o_custkey) AS INT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY monetary, o_custkey) AS INT) AS m_score
  FROM cm
)
SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_customers
FROM scored
GROUP BY r_score, f_score, m_score
""",
    """RFM (recency / frequency / monetary) customer segmentation: per-dim
    quintiles with the o_custkey tiebreak making every ntile assignment
    deterministic, then segment occupancy counts. The monetary dim is an
    exact decimal sum. Scale note: the three global ntile windows are each a
    single-partition sort over ONE ROW PER CUSTOMER (already aggregated) —
    acceptable to ~10^8 customers; beyond that the scale path is
    approx-quantile cutoffs broadcast as a 4-value literal per dim, which
    changes no downstream semantics.""",
)


# ---------------------------------------------------------------------------
# Data profiling
# ---------------------------------------------------------------------------

PROFILE_ORACLE = """
WITH t AS (SELECT * FROM orders)
SELECT 'o_orderkey' AS col_name,
       CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_repr,
       CAST(max(o_orderkey) AS VARCHAR) AS max_repr
FROM t
UNION ALL
SELECT 'o_custkey', CAST(count(*) - count(o_custkey) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM t
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       min(o_orderstatus), max(o_orderstatus)
FROM t
UNION ALL
SELECT 'o_totalprice', CAST(count(*) - count(o_totalprice) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
       CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
FROM t
UNION ALL
SELECT 'o_orderdate', CAST(count(*) - count(o_orderdate) AS BIGINT),
       CAST(count(DISTINCT o_orderdate) AS BIGINT),
       strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
FROM t
UNION ALL
SELECT 'o_orderpriority', CAST(count(*) - count(o_orderpriority) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       min(o_orderpriority), max(o_orderpriority)
FROM t
"""


@register("profile_columns", PROFILE_ORACLE)
def profile_columns(sess: SeccoSession):
    """Column profiler over `orders`: per column, null count, exact distinct
    count, and min/max rendered to a canonical string (integers verbatim,
    doubles via DECIMAL(18,2) so both engines print identically, timestamps
    via a fixed format string).

    Implementation: ONE wide aggregation computes all 6x4 metrics in a
    single pass (count-distinct columns each add a partial-agg expand, but
    the scan happens once), then `stack` unpivots the single result row to
    long format driver-side-free. Scale: one aggregation over the table; the
    unpivot operates on ONE row. The profiler is the standard pre-flight
    step before schema-evolution or quality gates on a new data drop."""
    t = sess.spark.table("orders")

    def metrics(col: str, repr_expr):
        return [
            (F.count("*") - F.count(col)).alias(f"{col}__nn"),
            F.countDistinct(col).alias(f"{col}__nd"),
            repr_expr(F.min(col)).alias(f"{col}__mn"),
            repr_expr(F.max(col)).alias(f"{col}__mx"),
        ]

    as_str = lambda c: c.cast("string")  # noqa: E731
    as_dec = lambda c: c.cast("decimal(18,2)").cast("string")  # noqa: E731
    as_ts = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    plan = {
        "o_orderkey": as_str,
        "o_custkey": as_str,
        "o_orderstatus": as_str,
        "o_totalprice": as_dec,
        "o_orderdate": as_ts,
        "o_orderpriority": as_str,
    }
    aggs = [m for col, fmt in plan.items() for m in metrics(col, fmt)]
    one = t.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__nn, {col}__nd, {col}__mn, {col}__mx" for col in plan
    )
    out = one.selectExpr(
        f"stack({len(plan)}, {stack_args}) AS (col_name, n_null, n_distinct, min_repr, max_repr)"
    )
    return sess.from_spark(out)


# ---------------------------------------------------------------------------
# Entity resolution
# ---------------------------------------------------------------------------

_sql(
    "entity_resolution_blocked",
    """
WITH base AS (
  SELECT c_custkey AS rec_id, c_name AS name, c_nationkey AS nk FROM customer
),
dirty AS (
  SELECT rec_id + 1000000 AS rec_id,
         replace(name, 'Customer', 'Custmer') AS name, nk
  FROM base WHERE rec_id % 20 = 0
),
recs AS (SELECT * FROM base UNION ALL SELECT * FROM dirty),
keyed AS (SELECT rec_id, name, nk, right(name, 6) AS blk FROM recs),
pairs AS (
  SELECT a.rec_id AS a_id, b.rec_id AS b_id
  FROM keyed a JOIN keyed b
    ON a.blk = b.blk AND a.nk = b.nk AND a.rec_id < b.rec_id
  WHERE levenshtein(a.name, b.name) <= 2
),
canon AS (
  SELECT r.rec_id, coalesce(min(p.a_id), r.rec_id) AS entity_id
  FROM keyed r LEFT JOIN pairs p ON p.b_id = r.rec_id
  GROUP BY r.rec_id
)
SELECT CAST(n_members AS BIGINT) AS n_members,
       CAST(count(*) AS BIGINT) AS n_entities
FROM (SELECT entity_id, count(*) AS n_members FROM canon GROUP BY entity_id) m
GROUP BY n_members
""",
    """Blocked entity resolution over a deterministically dirtied customer
    corpus: every 20th customer gains a typo'd duplicate record
    ('Customer' -> 'Custmer', edit distance 1, shifted id); blocking on
    (name digit suffix, nationkey) confines candidate pairs to same-entity
    records, an edit-distance <= 2 verify confirms them, and min-id
    propagation assigns entity ids (exact here: the digit-suffix block key
    is unique per entity, so clusters are single pairs). Output: entity
    size histogram — duplicated customers resolve to 2-member entities, the
    rest stay singletons. Scale: candidates are BLOCKED equi-join pairs
    (never all-pairs; the block key carries ~1 record pair per entity), the
    verify predicate is JVM levenshtein, and the min-propagation is one
    aggregation — the same candidate-generation discipline as the LSH dedup
    family. For transitively-chained dirt the one-round min-id step
    generalizes to the large-star/small-star iteration already proven in
    dedup_cluster_canonical.""",
)
