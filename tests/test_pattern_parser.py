"""Cypher-ish pattern grammar tests (grammar: SQLParser.scala:144-219)."""

from __future__ import annotations

import pytest

from seccosql_spark.graph.pattern import node_constraints, parse_pattern


def test_shorthand_edge_list():
    edges = parse_pattern("a-b;b-c;c-a")
    assert len(edges) == 3
    assert [(e.src.var, e.dst.var) for e in edges] == [("a", "b"), ("b", "c"), ("c", "a")]
    assert all(not e.directed for e in edges)


def test_directed_path():
    edges = parse_pattern("(a)-[]->(b); (b)-[]->(c)")
    assert [(e.src.var, e.dst.var, e.directed) for e in edges] == [
        ("a", "b", True),
        ("b", "c", True),
    ]


def test_reversed_edge():
    edges = parse_pattern("(a)<-[]-(b)")
    assert [(edges[0].src.var, edges[0].dst.var)] == [("b", "a")]


def test_labels_and_props():
    edges = parse_pattern("(a:Person {age: 30})-[e:KNOWS {w: 1.5}]->(b:Person)")
    e = edges[0]
    assert e.label == "KNOWS" and e.var == "e" and e.props == {"w": 1.5}
    cons = node_constraints(edges)
    assert cons["a"].label == "Person" and cons["a"].props == {"age": 30}
    assert cons["b"].label == "Person"


def test_string_prop():
    edges = parse_pattern("(a {name: 'bob'})-(b)")
    assert node_constraints(edges)["a"].props == {"name": "bob"}


def test_anonymous_nodes():
    edges = parse_pattern("(a)-[]->()")
    assert edges[0].dst.var.startswith("__anon")


def test_long_path_chain():
    edges = parse_pattern("(a)-[]->(b)-[]->(c)-[]->(d)")
    assert [(e.src.var, e.dst.var) for e in edges] == [("a", "b"), ("b", "c"), ("c", "d")]


def test_bad_pattern_raises():
    with pytest.raises(ValueError):
        parse_pattern("(a)-[->")


def test_pattern_auto_routing_semantics(spark, sess):
    """pattern(algorithm='auto') must return the same triangle count as the
    default chain on a simple (distinct-edge) graph — whichever side of the
    skew boundary the router lands on — and must stay on 'ghd' when edge
    properties are present (WCOJ treats every column as a join attribute)."""
    from seccosql_spark.graph.graphframe import SeccoGraphFrame
    from seccosql_spark.plans import stats as stats_mod

    edges = [(0, i) for i in range(1, 25)] + [(i, 0) for i in range(1, 25)]
    edges += [(50, 51), (51, 52), (52, 50)]
    e = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    g = SeccoGraphFrame(sess, None, e)
    want = g.pattern("(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)").df.count()
    got = g.pattern("(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)", algorithm="auto").df.count()
    assert got == want
    # force the wcoj side to exercise that routing end-to-end
    orig_c, orig_f = stats_mod.WCOJ_INTERMEDIATE_CUTOFF, stats_mod.WCOJ_BLOWUP_FACTOR
    try:
        stats_mod.WCOJ_INTERMEDIATE_CUTOFF, stats_mod.WCOJ_BLOWUP_FACTOR = 10.0, 0.0
        forced = g.pattern(
            "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)", algorithm="auto"
        ).df.count()
        assert forced == want
    finally:
        stats_mod.WCOJ_INTERMEDIATE_CUTOFF, stats_mod.WCOJ_BLOWUP_FACTOR = orig_c, orig_f


def test_pattern_auto_multigraph_falls_back_to_ghd(spark, sess):
    """ADVICE r04: a multigraph (duplicate (src,dst) rows) must NOT route to
    WCOJ even when skew thresholds are met — WCOJ emits set-semantics
    bindings, so the bag result would silently differ. The probe's
    simple-set check (count == distinct pairs) forces the ghd fallback."""
    from seccosql_spark.graph import graphframe as gf_mod
    from seccosql_spark.graph.graphframe import SeccoGraphFrame
    from seccosql_spark.plans import stats as stats_mod
    from seccosql_spark.plans import wcoj as wcoj_mod

    edges = [(0, i) for i in range(1, 25)] + [(i, 0) for i in range(1, 25)]
    edges += [(50, 51), (51, 52), (52, 50)] * 2  # duplicated triangle
    e = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    g = SeccoGraphFrame(sess, None, e)
    want = g.pattern("(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)").df.count()
    assert want > 0

    calls = []
    orig_wcoj = wcoj_mod.wcoj_natural_join
    orig_c, orig_f = stats_mod.WCOJ_INTERMEDIATE_CUTOFF, stats_mod.WCOJ_BLOWUP_FACTOR
    try:
        wcoj_mod.wcoj_natural_join = lambda *a, **k: calls.append(1) or orig_wcoj(*a, **k)
        stats_mod.WCOJ_INTERMEDIATE_CUTOFF = 10.0
        stats_mod.WCOJ_BLOWUP_FACTOR = 0.0
        got = g.pattern(
            "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)", algorithm="auto"
        ).df.count()
    finally:
        wcoj_mod.wcoj_natural_join = orig_wcoj
        stats_mod.WCOJ_INTERMEDIATE_CUTOFF, stats_mod.WCOJ_BLOWUP_FACTOR = orig_c, orig_f
    assert got == want  # bag semantics preserved (4 copies of the dup triangle)
    assert calls == []  # wcoj never invoked


def test_match_sql_auto_routes_wcoj_and_memoizes(spark, sess):
    """r04 VERDICT task 3: SQL MATCH threads algorithm='auto' — over a
    skewed simple-set graph (thresholds lowered) it plans WCOJ, matches the
    GHD result, and the degree/count probe is memoized per edge plan so the
    second MATCH statement pays ZERO additional measurement jobs."""
    from seccosql_spark.graph import graphframe as gf_mod
    from seccosql_spark.plans import stats as stats_mod
    from seccosql_spark.plans import wcoj as wcoj_mod

    edges = [(0, i) for i in range(1, 25)] + [(i, 0) for i in range(1, 25)]
    edges += [(50, 51), (51, 52), (52, 50)]
    spark.createDataFrame(edges, "src BIGINT, dst BIGINT").createOrReplaceTempView(
        "skew_match_g"
    )
    q = (
        "SELECT count(*) AS n FROM "
        "MATCH(skew_match_g, '(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)')"
    )
    want = sess.sql(q).df.collect()[0][0]  # first run warms under default thresholds

    calls = []
    orig_wcoj = wcoj_mod.wcoj_natural_join
    orig_c, orig_f = stats_mod.WCOJ_INTERMEDIATE_CUTOFF, stats_mod.WCOJ_BLOWUP_FACTOR
    try:
        wcoj_mod.wcoj_natural_join = lambda *a, **k: calls.append(1) or orig_wcoj(*a, **k)
        stats_mod.WCOJ_INTERMEDIATE_CUTOFF, stats_mod.WCOJ_BLOWUP_FACTOR = 10.0, 0.0
        misses_before = gf_mod._PROBE_MISSES
        got1 = sess.sql(q).df.collect()[0][0]
        got2 = sess.sql(q).df.collect()[0][0]
        misses_after = gf_mod._PROBE_MISSES
    finally:
        wcoj_mod.wcoj_natural_join = orig_wcoj
        stats_mod.WCOJ_INTERMEDIATE_CUTOFF, stats_mod.WCOJ_BLOWUP_FACTOR = orig_c, orig_f
    assert got1 == want and got2 == want
    assert len(calls) == 2  # both MATCH runs planned WCOJ
    assert misses_after == misses_before  # probe cached from the warm-up run


def test_disconnected_pattern_is_cross_product(sess):
    """A pattern with two unconnected components means 'all combinations of
    the components' matches' — the GHD planner's disconnected-join guard
    must not fire on the pattern path (it receives allow_cross=True)."""
    from seccosql_spark.graph.graphframe import SeccoGraphFrame

    edges = sess.spark.createDataFrame([(1, 2), (3, 4)], "src BIGINT, dst BIGINT")
    g = SeccoGraphFrame(sess, None, edges)
    out = g.pattern("(a)-[]->(b); (c)-[]->(d)")
    rows = {tuple(r) for r in out.df.select("a", "b", "c", "d").collect()}
    assert rows == {(1, 2, 1, 2), (1, 2, 3, 4), (3, 4, 1, 2), (3, 4, 3, 4)}


def test_to_graph_verb_runs_pattern(spark, sess):
    """`SeccoDataFrame.to_graph()` (reference SeccoDataFrame.scala:311-313
    `toGraph`, VERDICT r12 task 7): a dataset becomes an edge-only graph in
    one call; pattern() and the derived node() accessor work through it."""
    e = sess.from_spark(
        spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0), (2, 3)], "src BIGINT, dst BIGINT"
        )
    )
    g = e.to_graph()
    tri = g.pattern("(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)").df.count()
    assert tri == 3  # the 0->1->2->0 triangle under 3 rotations
    assert {r[0] for r in g.node().select(g.id_col).collect()} == {0, 1, 2, 3}
    # custom column names route through; missing columns raise
    e2 = sess.from_spark(
        spark.createDataFrame([(10, 11)], "u BIGINT, v BIGINT")
    )
    g2 = e2.to_graph(src_col="u", dst_col="v")
    assert g2.pattern("(a)-[]->(b)").df.count() == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="to_graph"):
        e2.to_graph(src_col="nope")
