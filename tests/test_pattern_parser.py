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
