"""W-series workload twins: the reference's disabled star-join suite under
controlled skew profiles.

Reference lineage: ``benchmark/testcases/workloadQuery.scala:37-139`` — W1
is a star join R1(A,B,C,D) ⋈ R2(A,W1) ⋈ R3(B,W2) ⋈ R4(C,W3) ⋈ R5(D,W4)
run under profiles that control the per-join intermediate cardinalities
("High"/"Low" in the reference's ExactLogicalPlanEstimation setup), so the
cost-based join ORDER is what the benchmark exercises. The suite is fully
commented out in the reference; this twin runs the same shape end-to-end
with MEASURED statistics instead of injected ones:

- the five relations are derived deterministically from the testdata
  (fact = modulo projections of orders; dims from lineitem, with the
  per-key fanout controlled by ``l_linenumber % f``);
- the LOW profile gives dims fanouts (1, 2, 3, 6) in R2..R5 order, the
  HIGH profile reverses them to (6, 3, 2, 1) — so the greedy
  smallest-intermediate ordering must attach the dims in OPPOSITE orders
  between the profiles (pinned by ``test_stats.py``);
- statistics flow through the production path: ``create_table`` →
  ``analyze_table`` → ``stats_from_catalog`` → ``greedy_join_order`` inside
  ``multiway_natural_join`` — no hand-assembled RelStats.

The join result itself is order-independent, so the DuckDB oracle checks
exact semantics while the plan test checks the ordering decision.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession

# dim -> (join attr, attr modulo domain, weight column)
_W1_DIMS = [
    ("r2", "a", 59, "w1"),
    ("r3", "b", 60, "w2"),
    ("r4", "c", 61, "w3"),
    ("r5", "d", 62, "w4"),
]
_W1_FANOUTS = {"low": (1, 2, 3, 6), "high": (6, 3, 2, 1)}

_W1_FACT_SQL = (
    "SELECT CAST(o_orderkey % 59 AS BIGINT) AS a, CAST(o_orderkey % 60 AS BIGINT) AS b, "
    "CAST(o_orderkey % 61 AS BIGINT) AS c, CAST(o_orderkey % 62 AS BIGINT) AS d FROM orders"
)


def _w1_dim_sql(attr: str, dom: int, weight: str, fanout: int) -> str:
    return (
        f"SELECT DISTINCT CAST(l_orderkey % {dom} AS BIGINT) AS {attr}, "
        f"CAST(l_linenumber % {fanout} AS BIGINT) AS {weight} FROM lineitem"
    )


def _w1_setup(sess: SeccoSession, profile: str):
    """Create + analyze the five W1 relations for `profile`; returns
    (dfs, stats, names) aligned for multiway_natural_join."""
    from seccosql_spark.plans.stats import stats_from_catalog

    fanouts = _W1_FANOUTS[profile]
    names = [f"w1_{profile}_r1"]
    specs = [(_W1_FACT_SQL, ["a", "b", "c", "d"])]
    for (dim, attr, dom, weight), f in zip(_W1_DIMS, fanouts):
        names.append(f"w1_{profile}_{dim}")
        specs.append((_w1_dim_sql(attr, dom, weight, f), [attr]))
    dfs = []
    for name, (sql, cols) in zip(names, specs):
        df = sess.spark.sql(sql)
        sess.create_table(name, df)
        sess.analyze_table(name, cols)
        dfs.append(sess.spark.table(name))
    stats = stats_from_catalog(sess.catalog, names)
    return dfs, stats, names


def w1_join_order(sess: SeccoSession, profile: str) -> list[str]:
    """The greedy join order chosen for `profile`, as table names — the
    decision the W1 benchmark exercises; pinned by test_stats.py."""
    from seccosql_spark.plans.stats import greedy_join_order

    dfs, stats, names = _w1_setup(sess, profile)
    perm = greedy_join_order([set(d.columns) for d in dfs], stats)
    return [names[p] for p in perm]


def _w1_oracle(profile: str) -> str:
    fanouts = _W1_FANOUTS[profile]
    dims = ",\n".join(
        f"{dim} AS ({_w1_dim_sql(attr, dom, weight, f)})"
        for (dim, attr, dom, weight), f in zip(_W1_DIMS, fanouts)
    )
    return f"""WITH r1 AS ({_W1_FACT_SQL}),
{dims}
SELECT d, count(*) AS n,
       CAST(sum(w1 * 1000 + w2 * 100 + w3 * 10 + w4) AS BIGINT) AS wsum
FROM r1 JOIN r2 USING (a) JOIN r3 USING (b) JOIN r4 USING (c) JOIN r5 USING (d)
GROUP BY d"""


def _w1_query(sess: SeccoSession, profile: str):
    from seccosql_spark.plans.ghd import multiway_natural_join

    dfs, stats, _ = _w1_setup(sess, profile)
    joined = multiway_natural_join(dfs, use_ghd=False, stats=stats)
    return sess.from_spark(
        joined.groupBy("d").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col("w1") * 1000 + F.col("w2") * 100 + F.col("w3") * 10 + F.col("w4")
            ).cast("long").alias("wsum"),
        )
    )


@register("w1_star_low_skew", _w1_oracle("low"))
def w1_star_low_skew(sess: SeccoSession):
    """W1 star join, LOW profile: dim fanouts grow R2→R5, so the greedy
    statistics-driven order attaches R2, R3, R4, R5 after the fact —
    smallest estimated intermediate first (workloadQuery.scala:37-139)."""
    return _w1_query(sess, "low")


@register("w1_star_high_skew", _w1_oracle("high"))
def w1_star_high_skew(sess: SeccoSession):
    """W1 star join, HIGH profile: the same shape with the dim fanouts
    REVERSED (R2 now explodes 6×), so the chosen join order must invert
    relative to the low profile — the cardinality-estimation stress the
    W-series was built for."""
    return _w1_query(sess, "high")
