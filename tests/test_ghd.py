"""GHD decomposition structural tests on the reference suite's canonical
shapes (GHDDecomposerSuite.scala:119 checks triangle/square/dumbbell)."""

from __future__ import annotations

from seccosql_spark.plans.ghd import decompose, multiway_natural_join
from seccosql_spark.plans.hypergraph import JoinHyperGraph


def g(*attr_sets):
    return JoinHyperGraph.from_attr_sets([set(a) for a in attr_sets])


def test_acyclic_path_is_detected():
    path = g("ab", "bc", "cd")
    assert not path.is_cyclic()


def test_triangle_is_cyclic_single_bag():
    tri = g("ab", "bc", "ca")
    assert tri.is_cyclic()
    ghd = decompose(tri)
    assert len(ghd.bags) == 1
    assert ghd.bags[0].attrs == frozenset("abc")


def test_square_decomposes_into_two_bags():
    sq = g("ab", "bc", "cd", "da")
    assert sq.is_cyclic()
    ghd = decompose(sq)
    assert len(ghd.bags) == 2
    assert all(len(b.attrs) == 3 for b in ghd.bags)
    # running intersection: the two bags share the diagonal
    inter = ghd.bags[0].attrs & ghd.bags[1].attrs
    assert len(inter) == 2


def test_dumbbell_three_bags():
    # two triangles joined by a path: abc + def + cd connector
    db = g("ab", "bc", "ca", "de", "ef", "fd", "cd")
    ghd = decompose(db)
    bag_attrs = [b.attrs for b in ghd.bags]
    assert frozenset("abc") in bag_attrs
    assert frozenset("def") in bag_attrs
    # every relation assigned exactly once
    assigned = sorted(r for b in ghd.bags for r in b.rel_ids)
    assert assigned == list(range(7))


def test_clique4_single_bag():
    k4 = g("ab", "ac", "ad", "bc", "bd", "cd")
    ghd = decompose(k4)
    assert len(ghd.bags) == 1
    assert ghd.bags[0].attrs == frozenset("abcd")


def test_every_edge_lands_in_a_containing_bag():
    shapes = [
        g("ab", "bc", "cd", "da", "ac"),
        g("ab", "bc", "ca", "ad"),
        g("xy"),
    ]
    for graph in shapes:
        ghd = decompose(graph)
        for e in graph.edges:
            bag = next(b for b in ghd.bags if e.rel_id in b.rel_ids)
            assert e.attrs <= bag.attrs


# ---------------------------------------------- fractional edge cover (LP)


def test_fractional_cover_triangle_is_three_halves():
    from fractions import Fraction

    from seccosql_spark.plans.ghd import fractional_edge_cover

    tri = g("ab", "bc", "ca")
    assert fractional_edge_cover(frozenset("abc"), tri.edges) == Fraction(3, 2)


def test_fractional_cover_exact_cases():
    from fractions import Fraction

    from seccosql_spark.plans.ghd import fractional_edge_cover

    # single edge covers itself
    e1 = g("ab")
    assert fractional_edge_cover(frozenset("ab"), e1.edges) == 1
    # odd 5-cycle: fhtw = 5/2
    c5 = g("ab", "bc", "cd", "de", "ea")
    assert fractional_edge_cover(frozenset("abcde"), c5.edges) == Fraction(5, 2)
    # uncovered attribute counts at weight 1
    assert fractional_edge_cover(frozenset("abz"), e1.edges) == 2


def test_fwidth_strictly_tighter_than_integer_on_triangle():
    """The triangle is the canonical separator: integer edge cover 2,
    fractional 3/2 (one half per edge). fwidth is ranked FIRST (reference
    FractionalEdgeCoverNumberCalculator ranking), so the AGM-style bound
    drives plan choice where the integer metric cannot distinguish."""
    from fractions import Fraction

    ghd = decompose(g("ab", "bc", "ca"))
    assert ghd.width == 2
    assert ghd.fwidth == Fraction(3, 2)
    assert ghd.fwidth < ghd.width


def test_ring5_chords_decomposition_runs():
    """S7 benchmark shape (subgraphQuery.scala): 5-ring + 3 chords."""
    s7 = g("ab", "bc", "cd", "de", "ae", "ac", "bd", "ce")
    ghd = decompose(s7)
    assigned = sorted(r for b in ghd.bags for r in b.rel_ids)
    assert assigned == list(range(8))
    assert ghd.fwidth <= ghd.width


def test_multiway_join_rejects_disconnected_inputs(spark):
    """r04 VERDICT nit 1: a relation sharing no attributes with the rest
    must raise (implicit cartesian product = cluster-killer), mirroring
    plan_star_join; allow_cross=True is the explicit escape hatch."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    r = spark.createDataFrame([(1, 2)], "a BIGINT, b BIGINT")
    s = spark.createDataFrame([(2, 3)], "b BIGINT, c BIGINT")
    t = spark.createDataFrame([(7, 8)], "x BIGINT, y BIGINT")  # disconnected
    with _pytest.raises(ValueError, match="share no attributes"):
        multiway_natural_join([r, s, t])
    # explicit opt-in still works and produces the cartesian combination
    out = multiway_natural_join([r, s, t], allow_cross=True)
    assert out.count() == 1
    # two disconnected inputs (chain path) raise too
    with _pytest.raises(ValueError, match="share no attributes"):
        multiway_natural_join([r, t])
