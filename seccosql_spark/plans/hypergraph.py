"""Join hypergraph: attributes = vertices, relations = hyperedges.

Reference parity: ``optimization/util/ghd/JoinHyperGraph.scala`` (hypergraph
built from a MultiwayJoin's children + natural/equi conditions; cyclicity
test drives whether the GHD/WCOJ machinery engages,
``plan/multiwayOperators.scala:57-154`` ``isCyclic()``).

Pure-Python structural code — no Spark objects in here, so it is unit-testable
on shapes (triangle/square/dumbbell, as the reference's
``JoinHyperGraphSuite`` does).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class HyperEdge:
    """One relation in the join: an id + its join attributes."""

    rel_id: int
    attrs: frozenset[str]


@dataclass
class JoinHyperGraph:
    edges: list[HyperEdge] = field(default_factory=list)

    @classmethod
    def from_attr_sets(cls, attr_sets: list[set[str] | frozenset[str]]) -> "JoinHyperGraph":
        return cls([HyperEdge(i, frozenset(a)) for i, a in enumerate(attr_sets)])

    @property
    def attributes(self) -> frozenset[str]:
        out: set[str] = set()
        for e in self.edges:
            out |= e.attrs
        return frozenset(out)

    def is_connected(self) -> bool:
        if not self.edges:
            return True
        seen = {0}
        frontier = [0]
        while frontier:
            cur = frontier.pop()
            for j, e in enumerate(self.edges):
                if j not in seen and self.edges[cur].attrs & e.attrs:
                    seen.add(j)
                    frontier.append(j)
        return len(seen) == len(self.edges)

    def is_cyclic(self) -> bool:
        """GYO reduction: repeatedly remove ears (edges contained in another
        edge after dropping attrs unique to them). Acyclic (alpha-acyclic)
        iff the reduction empties the hypergraph."""
        edges = [set(e.attrs) for e in self.edges if e.attrs]
        changed = True
        while changed and len(edges) > 1:
            changed = False
            # drop attributes appearing in only one edge
            from collections import Counter

            counts = Counter(a for e in edges for a in e)
            for e in edges:
                lone = {a for a in e if counts[a] == 1}
                if lone:
                    e -= lone
                    changed = True
            edges = [e for e in edges if e]
            # drop edges contained in another edge
            for i, e in enumerate(edges):
                if any(j != i and e <= o for j, o in enumerate(edges)):
                    edges.pop(i)
                    changed = True
                    break
        return len(edges) > 1

    def adjacency(self) -> dict[str, set[str]]:
        """Attribute co-occurrence graph (the primal graph)."""
        adj: dict[str, set[str]] = {a: set() for a in self.attributes}
        for e in self.edges:
            for a in e.attrs:
                adj[a] |= e.attrs - {a}
        return adj
