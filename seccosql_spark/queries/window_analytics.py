"""Window-function analytics breadth (SURVEY §2.4 "window fns absent in
reference" — engine extension): ranking families (ntile, percent_rank,
cume_dist), value navigation over explicit frames (first/last_value), and
GROUPING SETS with grouping_id — the remaining analytic-SQL surface beyond
the lag/running-sum/top-k queries already covered.

Registered AFTER the round-3 priority window (the driver verifies the first
50 registry entries per round; these carry the same pytest differential
gate at sf0.001/sf0.01 and rotate into the driver window next round).

Determinism: every OVER clause orders by a unique key chain, ntile/rank
outputs are integers, and value navigation picks from ordered BIGINT/exact
columns — no float aggregation inside any frame.
"""

from __future__ import annotations

from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession


def _sql(name: str, sql: str, doc: str):
    @register(name, sql)
    def _q(sess: SeccoSession, _s=sql):
        return sess.sql(_s)

    _q.__name__ = name
    _q.__doc__ = doc
    return _q


_sql(
    "window_ntile_quartiles",
    """
SELECT o_orderpriority, o_orderkey,
       ntile(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
FROM orders
WHERE o_orderstatus = 'F'
""",
    """ntile ranking per priority class; the o_orderkey tiebreak makes the
    quartile assignment of equal prices deterministic.""",
)


_sql(
    "window_rank_family",
    """
SELECT s_suppkey,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       round(percent_rank() OVER w, 9) AS prnk,
       round(cume_dist() OVER w, 9) AS cdist
FROM supplier
WINDOW w AS (ORDER BY s_nationkey, s_suppkey)
""",
    """The full ranking family over one named WINDOW clause. percent_rank /
    cume_dist are ratios of integers — rounded identically on both engines.
    A global ORDER BY window is single-partition by construction; this query
    exists for surface coverage (100 suppliers), not as a scale pattern —
    partition-keyed windows are the scale path (every other window query
    here).""",
)


_sql(
    "window_first_last_frames",
    """
SELECT user_id, event_id,
       first_value(event_id) OVER (PARTITION BY user_id ORDER BY event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS first_ev,
       last_value(event_id) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         AS last_ev,
       CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
FROM events
""",
    """Value navigation with explicit ROWS frames (the default RANGE frame
    makes last_value useless — a classic analytic-SQL trap both engines
    share the fix for). Partitioned by user: scales as one hash shuffle.""",
)


_sql(
    "grouping_sets_id",
    """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    """Explicit GROUPING SETS (beyond the rollup/cube queries) with a
    grouping-id disambiguator — the gid column distinguishes NULL-as-group
    from NULL-as-rollup, which a bare rollup result cannot.""",
)


_sql(
    "funnel_view_click_purchase",
    """
WITH v AS (SELECT user_id, min(event_id) AS v_eid
           FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.event_id) AS c_eid
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.event_id > v.v_eid
      GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.event_id) AS p_eid
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.event_id > c.c_eid
      GROUP BY e.user_id)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase
""",
    """Ordered-funnel conversion (view -> click -> purchase, strictly after
    one another in the event sequence): per stage, the earliest qualifying
    event feeds the next stage's inequality join. Each stage is one
    filtered aggregation plus an equi-join on user_id — the sequential
    behavioral-analytics pattern at corpus scale (event_id is the unique
    per-load sequence axis, same convention as the as-of join).""",
)


_SCD2_ORACLE = """
WITH ordered AS (
  SELECT o_custkey, o_orderstatus, epoch_us(o_orderdate) AS ts, o_orderkey,
         CASE WHEN lag(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, o_orderkey)
),
runs AS (
  SELECT o_custkey, o_orderstatus, ts,
         sum(chg) OVER (PARTITION BY o_custkey ORDER BY ts, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM ordered
),
agg AS (
  SELECT o_custkey, o_orderstatus, run_id,
         min(ts) AS valid_from_us,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM runs GROUP BY o_custkey, o_orderstatus, run_id
)
SELECT o_custkey, o_orderstatus, valid_from_us,
       lead(valid_from_us) OVER (PARTITION BY o_custkey ORDER BY run_id)
         AS valid_to_us,
       n_orders
FROM agg
"""


@register("scd2_status_history", _SCD2_ORACLE)
def scd2_status_history(sess: SeccoSession):
    """SCD type-2 dimension build: compress each customer's order-status
    stream into validity intervals [valid_from, valid_to) — consecutive
    orders with the same status collapse into one run (gaps-and-islands via
    lag + running sum), `valid_to` is the next run's start (NULL = current).
    The standard warehouse-dimension maintenance op, expressed as two
    windows + one agg over a SINGLE hash(o_custkey) exchange — every window
    and the groupBy share the customer partitioning, so Catalyst plans one
    shuffle for the whole history build (scales per-customer, not
    per-corpus). Epochs compared as integer microseconds (epoch_us
    discipline — never raw timestamps cross-engine)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from seccosql_spark.operators.timeutil import epoch_us

    o = sess.spark.table("orders")
    o = o.select(
        "o_custkey", "o_orderstatus", "o_orderkey",
        epoch_us(o, "o_orderdate").alias("ts"),
    )
    w = Window.partitionBy("o_custkey").orderBy("ts", "o_orderkey")
    chg = F.when(
        F.lag("o_orderstatus").over(w).eqNullSafe(F.col("o_orderstatus")), F.lit(0)
    ).otherwise(F.lit(1))
    runs = o.withColumn("chg", chg).withColumn(
        "run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    agg = runs.groupBy("o_custkey", "o_orderstatus", "run_id").agg(
        F.min("ts").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w2 = Window.partitionBy("o_custkey").orderBy("run_id")
    return sess.from_spark(
        agg.select(
            "o_custkey",
            "o_orderstatus",
            "valid_from_us",
            F.lead("valid_from_us").over(w2).alias("valid_to_us"),
            "n_orders",
        )
    )


_CONCURRENCY_ORACLE = """
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
  FROM events
),
pts AS (
  SELECT event_type, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS d FROM iv
),
swept AS (
  SELECT event_type,
         CAST(sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS live
  FROM pts
)
SELECT event_type, max(live) AS max_concurrent
FROM swept GROUP BY event_type
"""


@register("events_max_concurrency", _CONCURRENCY_ORACLE)
def events_max_concurrency(sess: SeccoSession):
    """Sweep-line interval concurrency: treat every event as a 5-minute
    activity interval and compute, per event_type, the maximum number of
    simultaneously live intervals — the classic +1/-1 boundary sweep
    (each interval contributes a start(+1) and end(-1) point; a running
    sum over the time-ordered points IS the live count; ends sort before
    starts at the same instant via the `d` tie-break, so touching
    intervals don't double-count). Scales because the sweep is PARTITIONED
    (per event_type) — never a global sort; one hash exchange carries both
    the window and the final max. Integer microseconds throughout."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from seccosql_spark.operators.timeutil import epoch_us

    ev = sess.spark.table("events")
    iv = ev.select(
        "event_type",
        epoch_us(ev, "ts").alias("s"),
        (epoch_us(ev, "ts") + F.lit(300_000_000)).alias("e"),
    )
    pts = iv.select("event_type", F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = pts.withColumn("live", F.sum("d").over(w))
    return sess.from_spark(
        swept.groupBy("event_type").agg(F.max("live").alias("max_concurrent"))
    )
