"""GHD decomposition structural tests on the reference suite's canonical
shapes (GHDDecomposerSuite.scala:119 checks triangle/square/dumbbell)."""

from __future__ import annotations

from seccosql_spark.plans.ghd import decompose
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
