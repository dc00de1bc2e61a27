"""W-series workload twins: the reference's disabled controlled-skew join
benchmark suite (``benchmark/testcases/workloadQuery.scala``), one named
twin per distinct SHAPE:

- W1 star (``:37-139``) — fact ⋈ four dims, low/high profiles
- W2 snowflake (``:140-233``) — a dim hangs off another dim, low/high
- W3 line join (``:237-330``) — 5-relation chain, low/high
- W5 cycle (``:431-524``) — cyclic hypergraph, runs through the GHD path
- W6 theta chain (``:528-627``) — composed inequality joins
- W4 tree / W7-W10 are the same shapes plus projections/aggregations
  (subsumption mapped in COVERAGE.md)

The reference's profiles INJECT intermediate cardinalities
(ExactLogicalPlanEstimation) so the cost-based join ORDER is what the
benchmark exercises; these twins run the same shapes end-to-end with
MEASURED statistics instead:

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


# ------------------------------------------------------------- W2 snowflake

# W2 (workloadQuery.scala:140-233): fact R1(A,B,C) with dims R2(A,W1),
# R3(B,W2) and a SNOWFLAKE branch R4(C,K3) -> R5(K3,W3). The branch forces
# the planner to earn the two-level attach: R5 only connects through R4.
_W2_FANOUTS = {"low": (1, 3, 6), "high": (6, 3, 1)}  # (r2, r3, r5)

_W2_FACT_SQL = (
    "SELECT CAST(o_orderkey % 59 AS BIGINT) AS a, CAST(o_orderkey % 60 AS BIGINT) AS b, "
    "CAST(o_orderkey % 61 AS BIGINT) AS c FROM orders"
)
_W2_R4_SQL = (
    "SELECT DISTINCT CAST(l_orderkey % 61 AS BIGINT) AS c, "
    "CAST((l_orderkey % 61) % 13 AS BIGINT) AS k3 FROM lineitem"
)


def _w2_specs(profile: str):
    f2, f3, f5 = _W2_FANOUTS[profile]
    return [
        ("r1", _W2_FACT_SQL, ["a", "b", "c"]),
        ("r2", _w1_dim_sql("a", 59, "w1", f2), ["a"]),
        ("r3", _w1_dim_sql("b", 60, "w2", f3), ["b"]),
        ("r4", _W2_R4_SQL, ["c", "k3"]),
        ("r5", _w1_dim_sql("k3", 13, "w3", f5), ["k3"]),
    ]


def _build_relations(sess: SeccoSession, prefix: str, specs):
    """create_table + analyze_table each spec; returns (dfs, stats, names)."""
    from seccosql_spark.plans.stats import stats_from_catalog

    names, dfs = [], []
    for rel, sql, cols in specs:
        name = f"{prefix}_{rel}"
        df = sess.spark.sql(sql)
        sess.create_table(name, df)
        sess.analyze_table(name, cols)
        names.append(name)
        dfs.append(sess.spark.table(name))
    return dfs, stats_from_catalog(sess.catalog, names), names


def _join_order(sess: SeccoSession, prefix: str, specs) -> list[str]:
    from seccosql_spark.plans.stats import greedy_join_order

    dfs, stats, names = _build_relations(sess, prefix, specs)
    perm = greedy_join_order([set(d.columns) for d in dfs], stats)
    return [names[p] for p in perm]


def w2_join_order(sess: SeccoSession, profile: str) -> list[str]:
    return _join_order(sess, f"w2_{profile}", _w2_specs(profile))


def _w2_oracle(profile: str) -> str:
    f2, f3, f5 = _W2_FANOUTS[profile]
    return f"""WITH r1 AS ({_W2_FACT_SQL}),
r2 AS ({_w1_dim_sql("a", 59, "w1", f2)}),
r3 AS ({_w1_dim_sql("b", 60, "w2", f3)}),
r4 AS ({_W2_R4_SQL}),
r5 AS ({_w1_dim_sql("k3", 13, "w3", f5)})
SELECT c, count(*) AS n,
       CAST(sum(w1 * 100 + w2 * 10 + w3) AS BIGINT) AS wsum
FROM r1 JOIN r2 USING (a) JOIN r3 USING (b) JOIN r4 USING (c) JOIN r5 USING (k3)
GROUP BY c"""


def _w2_query(sess: SeccoSession, profile: str):
    from seccosql_spark.plans.ghd import multiway_natural_join

    dfs, stats, _ = _build_relations(sess, f"w2_{profile}", _w2_specs(profile))
    joined = multiway_natural_join(dfs, use_ghd=False, stats=stats)
    return sess.from_spark(
        joined.groupBy("c").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("w1") * 100 + F.col("w2") * 10 + F.col("w3"))
            .cast("long")
            .alias("wsum"),
        )
    )


@register("w2_snowflake_low_skew", _w2_oracle("low"))
def w2_snowflake_low_skew(sess: SeccoSession):
    """W2 snowflake join, LOW profile (workloadQuery.scala:140-233): the
    fanout-1 dim anchors the plan, the snowflake leaf R5 attaches last
    through its R4 bridge."""
    return _w2_query(sess, "low")


@register("w2_snowflake_high_skew", _w2_oracle("high"))
def w2_snowflake_high_skew(sess: SeccoSession):
    """W2 snowflake join, HIGH profile: fanouts reversed — the plan starts
    at the now-selective snowflake LEAF (R5 -> R4 -> fact), the opposite
    attach direction from the low profile (pinned in test_stats.py)."""
    return _w2_query(sess, "high")


# ------------------------------------------------------------- W3 line join

# W3 (workloadQuery.scala:237-330): chain R1(A,B)-R2(B,C)-R3(C,D)-R4(D,E)-
# R5(E,F). Per-attribute modulo domains control relation sizes; the LOW
# profile grows them left-to-right (R1 smallest — plan walks the chain
# forward), HIGH reverses (plan walks backward from R5).
_W3_DOMS = {"low": (4, 6, 8, 10, 12, 14), "high": (14, 12, 10, 8, 6, 4)}
_W3_ATTRS = ["a", "b", "c", "d", "e", "f"]
_W3_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_orderkey", "l_partkey", "l_suppkey"]


def _w3_rel_sql(i: int, doms) -> str:
    x, y = _W3_ATTRS[i], _W3_ATTRS[i + 1]
    cx, cy = _W3_COLS[i], _W3_COLS[i + 1]
    return (
        f"SELECT DISTINCT CAST({cx} % {doms[i]} AS BIGINT) AS {x}, "
        f"CAST({cy} % {doms[i + 1]} AS BIGINT) AS {y} FROM lineitem"
    )


def _w3_specs(profile: str):
    doms = _W3_DOMS[profile]
    return [
        (f"r{i + 1}", _w3_rel_sql(i, doms), [_W3_ATTRS[i], _W3_ATTRS[i + 1]])
        for i in range(5)
    ]


def w3_join_order(sess: SeccoSession, profile: str) -> list[str]:
    return _join_order(sess, f"w3_{profile}", _w3_specs(profile))


def _w3_oracle(profile: str) -> str:
    rels = ",\n".join(
        f"r{i + 1} AS ({_w3_rel_sql(i, _W3_DOMS[profile])})" for i in range(5)
    )
    return f"""WITH {rels}
SELECT f, count(*) AS n, CAST(sum(a + b + c + d + e) AS BIGINT) AS wsum
FROM r1 JOIN r2 USING (b) JOIN r3 USING (c) JOIN r4 USING (d) JOIN r5 USING (e)
GROUP BY f"""


def _w3_query(sess: SeccoSession, profile: str):
    from seccosql_spark.plans.ghd import multiway_natural_join

    dfs, stats, _ = _build_relations(sess, f"w3_{profile}", _w3_specs(profile))
    joined = multiway_natural_join(dfs, use_ghd=False, stats=stats)
    return sess.from_spark(
        joined.groupBy("f").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("a") + F.col("b") + F.col("c") + F.col("d") + F.col("e"))
            .cast("long")
            .alias("wsum"),
        )
    )


@register("w3_chain_low_skew", _w3_oracle("low"))
def w3_chain_low_skew(sess: SeccoSession):
    """W3 line join, LOW profile (workloadQuery.scala:237-330): relation
    sizes grow along the chain, so the greedy order walks it FORWARD from
    R1."""
    return _w3_query(sess, "low")


@register("w3_chain_high_skew", _w3_oracle("high"))
def w3_chain_high_skew(sess: SeccoSession):
    """W3 line join, HIGH profile: sizes reversed — the greedy order walks
    the chain BACKWARD from R5 (pinned in test_stats.py)."""
    return _w3_query(sess, "high")


# ------------------------------------------------------------- W5 cycle

# W5 (workloadQuery.scala:431-524): a 5-CYCLE R1(A,B)-R2(B,C)-R3(C,D)-
# R4(D,E)-R5(E,A) — the one W-shape whose hypergraph is cyclic, so it runs
# through the GHD decomposition (bags over the cycle, tree-width 2) with
# the measured stats ordering relations INSIDE each bag; the acyclic twins
# above use the plain chain path. One profile: the reference varies
# injected cardinalities, which the W1-W3 twins already exercise — W5's
# point is the cyclic decomposition itself.
_W5_DOMS = (4, 6, 8, 10, 12)
_W5_ATTRS = ["a", "b", "c", "d", "e"]
_W5_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_orderkey", "l_partkey"]


def _w5_rel_sql(i: int) -> str:
    j = (i + 1) % 5
    x, y = _W5_ATTRS[i], _W5_ATTRS[j]
    return (
        f"SELECT DISTINCT CAST({_W5_COLS[i]} % {_W5_DOMS[i]} AS BIGINT) AS {x}, "
        f"CAST({_W5_COLS[j]} % {_W5_DOMS[j]} AS BIGINT) AS {y} FROM lineitem"
    )


def _w5_specs():
    return [
        (f"r{i + 1}", _w5_rel_sql(i), [_W5_ATTRS[i], _W5_ATTRS[(i + 1) % 5]])
        for i in range(5)
    ]


W5_ORACLE = (
    "WITH "
    + ",\n".join(f"r{i + 1} AS ({_w5_rel_sql(i)})" for i in range(5))
    + """
SELECT r1.a AS a, count(*) AS n,
       CAST(sum(b + c + d + r4.e) AS BIGINT) AS wsum
FROM r1 JOIN r2 USING (b) JOIN r3 USING (c) JOIN r4 USING (d)
        JOIN r5 ON r4.e = r5.e AND r5.a = r1.a
GROUP BY r1.a"""
)


@register("w5_cycle_join", W5_ORACLE)
def w5_cycle_join(sess: SeccoSession):
    """W5 cycle join through the GHD path: the 5-cycle hypergraph is
    decomposed into bags (tree-width 2) and combined along the
    decomposition tree; measured stats order relations within bags. The
    closing edge makes every tuple a genuine 5-cycle — the workload the
    reference's GHDFKFK join type targets."""
    from seccosql_spark.plans.ghd import multiway_natural_join

    dfs, stats, _ = _build_relations(sess, "w5", _w5_specs())
    joined = multiway_natural_join(dfs, use_ghd=True, stats=stats)
    return sess.from_spark(
        joined.groupBy("a").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("b") + F.col("c") + F.col("d") + F.col("e"))
            .cast("long")
            .alias("wsum"),
        )
    )


# ------------------------------------------------------------- W6 theta chain

# W6 (workloadQuery.scala:528-627): R1(A,B) theta-join(B < C) R2(C,D)
# theta-join(D < E) R3(E,F) — inequality joins with NO shared attributes.
# Spark-first: plain `<` join conditions; Catalyst broadcasts the small
# sides into nested-loop joins (the only physical shape an unbounded
# inequality join admits without banding — the banded variants live in
# operators/asof.py). W7/W8 are this plus a projection/aggregation.
_W6_SQL = {
    "r1": "SELECT DISTINCT CAST(o_orderkey % 5 AS BIGINT) AS a, "
          "CAST(o_orderkey % 7 AS BIGINT) AS b FROM orders",
    "r2": "SELECT DISTINCT CAST(o_orderkey % 8 AS BIGINT) AS c, "
          "CAST(o_orderkey % 9 AS BIGINT) AS d FROM orders",
    "r3": "SELECT DISTINCT CAST(o_orderkey % 10 AS BIGINT) AS e, "
          "CAST(o_orderkey % 11 AS BIGINT) AS f FROM orders",
}

W6_ORACLE = f"""WITH r1 AS ({_W6_SQL["r1"]}),
r2 AS ({_W6_SQL["r2"]}),
r3 AS ({_W6_SQL["r3"]})
SELECT a, count(*) AS n, CAST(sum(b * 100 + d * 10 + f) AS BIGINT) AS wsum
FROM r1 JOIN r2 ON b < c JOIN r3 ON d < e
GROUP BY a"""


@register("w6_theta_chain", W6_ORACLE)
def w6_theta_chain(sess: SeccoSession):
    """W6 theta-join chain: two inequality joins composed (B < C, D < E)
    and aggregated — the reference's thetaJoin benchmark shape."""
    spark = sess.spark
    r1 = spark.sql(_W6_SQL["r1"])
    r2 = spark.sql(_W6_SQL["r2"])
    r3 = spark.sql(_W6_SQL["r3"])
    joined = r1.join(r2, F.col("b") < F.col("c")).join(r3, F.col("d") < F.col("e"))
    return sess.from_spark(
        joined.groupBy("a").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("b") * 100 + F.col("d") * 10 + F.col("f"))
            .cast("long")
            .alias("wsum"),
        )
    )
