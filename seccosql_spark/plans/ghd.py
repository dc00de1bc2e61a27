"""GHD-style decomposition of cyclic natural joins, emitted as df.join trees.

Reference parity: ``OptimizeMultiwayJoin`` (``optimization/rules/join.scala:
233-269``) — decompose the join hypergraph, pick the decomposition minimizing
(width, #bags), then emit per-bag joins combined along the tree
(``JoinHyperGraph.ghdPlan``, ``optimization/util/ghd/JoinHyperGraph.scala:
372-398``; decomposer ``ghd/GHDDecomposer.scala:104-240``).

Deviations from the reference, deliberate:

- Decompositions are generated from attribute **elimination orderings**
  (min-degree heuristic + one seeded ordering per attribute) rather than the
  reference's exhaustive bag enumeration — same canonical results on the
  suite shapes (triangle/square/dumbbell/clique) at a fraction of the cost.
- Width is ranked by **fractional edge-cover number** (fhtw), computed
  EXACTLY by a tiny rational-arithmetic simplex on the LP dual (the
  reference solves the same LP with joptimizer,
  ``FractionalEdgeCoverNumberCalculator``; scipy is unavailable here, and
  bags are ≤ a dozen edges so exact Fractions are fast). Integer edge-cover
  size remains the tie-break.
- Physical execution of every bag is a chain of ordinary binary
  ``df.join``s — Catalyst/AQE picks broadcast/SMJ/shuffle-hash per step — so
  the 100 TB story is Spark's own. A true WCOJ (LeapFrog) path is the
  documented optional phase 2b (SURVEY.md §7).

Scale behavior: for acyclic joins this degenerates to the GYO join-tree
order, which never introduces a cross product and keeps consecutive joins
sharing keys (Spark reuses the shuffle partitioning). For cyclic joins the
per-bag grouping evaluates the dense subqueries (e.g. each triangle of a
dumbbell) before the connecting joins, which is exactly the cardinality win
the reference's GHD pass buys.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from fractions import Fraction

from pyspark.sql import DataFrame

from seccosql_spark.plans.hypergraph import HyperEdge, JoinHyperGraph


# ------------------------------------------------------------ decomposition

@dataclass
class Bag:
    attrs: frozenset[str]
    rel_ids: list[int]  # relations assigned to this bag


@dataclass
class GHD:
    bags: list[Bag]
    tree_edges: list[tuple[int, int]]  # indices into bags
    width: int  # max integer edge-cover over bags (tie-break metric)
    fwidth: Fraction = field(default=Fraction(0))  # max fractional edge cover


def fractional_edge_cover(attrs: frozenset[str], edges: list[HyperEdge]) -> Fraction:
    """Exact fractional edge-cover number of `attrs`: min Σx_e s.t. every
    attribute is covered with total weight ≥ 1 (x ≥ 0).

    Solved via the LP DUAL — max Σy_a s.t. Σ_{a∈e} y_a ≤ 1 per edge, y ≥ 0
    (fractional independent set; equal optima by strong duality) — because
    the dual is in standard simplex form with the all-slack basis feasible.
    Rational arithmetic (Fraction) + Bland's rule: exact and cycle-free.
    Reference parity: ``FractionalEdgeCoverNumberCalculator`` under
    ``optimization/util/ghd/`` (joptimizer LP there).

    Attributes not touched by any edge are uncoverable: counted at weight 1
    each, matching the greedy fallback of `_edge_cover_size`."""
    avars = sorted(attrs & {a for e in edges for a in e.attrs})
    uncovered = len(attrs) - len(avars)
    if not avars:
        return Fraction(uncovered)
    rows = []
    for e in edges:
        cov = [Fraction(1) if a in e.attrs else Fraction(0) for a in avars]
        if any(cov):
            rows.append(cov)
    n, m = len(avars), len(rows)
    # tableau: m constraint rows × (n vars + m slacks + rhs), objective row last
    tab = [rows[i] + [Fraction(int(i == j)) for j in range(m)] + [Fraction(1)] for i in range(m)]
    obj = [Fraction(-1)] * n + [Fraction(0)] * m + [Fraction(0)]
    basis = list(range(n, n + m))
    while True:
        # Bland: entering = first negative reduced cost
        enter = next((j for j in range(n + m) if obj[j] < 0), None)
        if enter is None:
            break
        # ratio test; Bland tie-break on basis variable index
        leave, best = None, None
        for i in range(m):
            if tab[i][enter] > 0:
                ratio = tab[i][-1] / tab[i][enter]
                if best is None or ratio < best or (ratio == best and basis[i] < basis[leave]):
                    best, leave = ratio, i
        if leave is None:  # unbounded dual cannot happen: y ≤ 1 per own edge
            raise RuntimeError("unbounded fractional-cover dual")
        piv = tab[leave][enter]
        tab[leave] = [v / piv for v in tab[leave]]
        for i in range(m):
            if i != leave and tab[i][enter] != 0:
                f = tab[i][enter]
                tab[i] = [v - f * w for v, w in zip(tab[i], tab[leave])]
        f = obj[enter]
        obj = [v - f * w for v, w in zip(obj, tab[leave])]
        basis[leave] = enter
    return obj[-1] + uncovered  # objective row rhs holds max Σy = min Σx


def _edge_cover_size(attrs: frozenset[str], edges: list[HyperEdge]) -> int:
    """Smallest number of hyperedges covering `attrs` (exact for the tiny bag
    sizes GHDs produce; greedy fallback beyond 12 candidate edges)."""
    useful = [e for e in edges if e.attrs & attrs]
    if not attrs:
        return 0
    for k in range(1, len(useful) + 1):
        if k > 4 or len(useful) > 12:
            break
        for combo in itertools.combinations(useful, k):
            covered: set[str] = set()
            for e in combo:
                covered |= e.attrs
            if attrs <= covered:
                return k
    # greedy fallback
    remaining = set(attrs)
    count = 0
    while remaining and useful:
        best = max(useful, key=lambda e: len(e.attrs & remaining))
        if not best.attrs & remaining:
            break
        remaining -= best.attrs
        count += 1
    return count + len(remaining)


def _decompose_with_order(graph: JoinHyperGraph, order: list[str]) -> GHD:
    """Tree decomposition by attribute elimination: eliminating attribute `a`
    creates a bag of `a` + its current neighbors, then connects the
    neighbors into a clique (standard elimination-game construction)."""
    adj = {a: set(ns) for a, ns in graph.adjacency().items()}
    bags: list[frozenset[str]] = []
    for a in order:
        ns = adj.pop(a, set())
        bags.append(frozenset({a} | ns))
        for u in ns:
            adj[u] = (adj[u] | ns) - {u, a}
    # prune bags contained in other bags
    pruned: list[frozenset[str]] = []
    for b in sorted(bags, key=len, reverse=True):
        if not any(b <= p for p in pruned):
            pruned.append(b)
    # connect bags into a tree (max-spanning-tree on intersection size gives
    # the running-intersection property for elimination-order bags)
    tree: list[tuple[int, int]] = []
    if len(pruned) > 1:
        in_tree = {0}
        while len(in_tree) < len(pruned):
            best = None
            for i in in_tree:
                for j in range(len(pruned)):
                    if j in in_tree:
                        continue
                    score = len(pruned[i] & pruned[j])
                    if best is None or score > best[0]:
                        best = (score, i, j)
            tree.append((best[1], best[2]))
            in_tree.add(best[2])
    # assign every relation to the first bag containing it
    bag_objs = [Bag(b, []) for b in pruned]
    for e in graph.edges:
        for bag in bag_objs:
            if e.attrs <= bag.attrs:
                bag.rel_ids.append(e.rel_id)
                break
        else:  # no single bag contains it (shouldn't happen for elim orders)
            bag_objs.sort(key=lambda b: -len(b.attrs & e.attrs))
            bag_objs[0].rel_ids.append(e.rel_id)
    width = max(_edge_cover_size(b.attrs, graph.edges) for b in bag_objs)
    fwidth = max(fractional_edge_cover(b.attrs, graph.edges) for b in bag_objs)
    return GHD(bag_objs, tree, width, fwidth)


def decompose(graph: JoinHyperGraph) -> GHD:
    """Best GHD over candidate elimination orders, ranked by
    (width, #bags) — the reference's ranking (``GHDDecomposer.scala:190-240``)."""
    attrs = sorted(graph.attributes)
    if not attrs:
        return GHD([Bag(frozenset(), [e.rel_id for e in graph.edges])], [], 1)

    def min_degree_order(first: str | None) -> list[str]:
        adj = {a: set(ns) for a, ns in graph.adjacency().items()}
        order: list[str] = []
        while adj:
            if first is not None and first in adj:
                a = first
                first = None
            else:
                a = min(adj, key=lambda x: (len(adj[x]), x))
            ns = adj.pop(a)
            for u in ns:
                adj[u] = (adj[u] | ns) - {u, a}
            order.append(a)
        return order

    def rank(ghd: GHD) -> tuple[Fraction, int, int, int]:
        # (fractional width, integer width, largest bag, #bags): fhtw first,
        # exactly as the reference ranks (GHDDecomposer.scala:190-240 with
        # FractionalEdgeCoverNumberCalculator); integer cover + largest-bag
        # tie-breaks steer toward the canonical splits where fhtw ties.
        return (
            ghd.fwidth,
            ghd.width,
            max(len(b.attrs) for b in ghd.bags),
            len(ghd.bags),
        )

    candidates = [min_degree_order(None)] + [min_degree_order(a) for a in attrs]
    best: GHD | None = None
    for order in candidates:
        ghd = _decompose_with_order(graph, order)
        if best is None or rank(ghd) < rank(best):
            best = ghd
    return best


# ----------------------------------------------------------------- emission

def _join_order_within(dfs: list[DataFrame]) -> list[DataFrame]:
    """Order a bag's relations so every step shares an attribute with the
    accumulated result (no accidental cross products)."""
    if not dfs:
        return dfs
    remaining = list(dfs)
    out = [remaining.pop(0)]
    seen = set(out[0].columns)
    while remaining:
        nxt_i = next(
            (i for i, d in enumerate(remaining) if seen & set(d.columns)),
            0,
        )
        nxt = remaining.pop(nxt_i)
        seen |= set(nxt.columns)
        out.append(nxt)
    return out


def multiway_natural_join(
    dfs: list[DataFrame], use_ghd: bool = True, stats=None, allow_cross: bool = False
) -> DataFrame:
    """n-way natural inner join. With `use_ghd`, joins are grouped per GHD bag
    and bags are combined along the decomposition tree; otherwise a left-fold
    chain. Either way: plain ``df.join`` calls — Catalyst picks the physical
    join per step.

    A DISCONNECTED input hypergraph (some relation shares no attribute with
    the rest — e.g. two patterns joined by accident) raises unless
    `allow_cross=True`: the silent alternative is a cartesian product,
    which at cluster scale is a cluster-killer (mirrors
    ``plan_star_join``'s check, plans/pkfk.py). The check is plan-time
    Python over attribute sets — no Spark job.

    `stats`: optional ``list[plans.stats.RelStats]`` aligned with `dfs`.
    When present, relations inside each bag are ordered by the greedy
    smallest-estimated-intermediate heuristic (System-R estimates over row
    counts + NDV — reference ``StatsPlanVisitor``/naive estimator parity)
    instead of connectivity order alone. Catalyst without CBO keeps
    whatever join order we emit, so this is where the statistics earn
    their keep at scale."""
    from seccosql_spark.operators.joins import natural_join_chain
    from seccosql_spark.plans.stats import greedy_join_order

    def ordered(indices: list[int]) -> list[DataFrame]:
        members = [dfs[r] for r in indices]
        if stats is None or len(members) <= 2:
            return _join_order_within(members)
        perm = greedy_join_order(
            [set(dfs[r].columns) for r in indices], [stats[r] for r in indices]
        )
        return [members[p] for p in perm]

    if len(dfs) >= 2 and not allow_cross:
        comp = {0}
        attr_sets_all = [set(d.columns) for d in dfs]
        grew = True
        while grew:
            grew = False
            for i, attrs in enumerate(attr_sets_all):
                if i not in comp and any(attrs & attr_sets_all[j] for j in comp):
                    comp.add(i)
                    grew = True
        if len(comp) != len(dfs):
            stranded = sorted(set(range(len(dfs))) - comp)
            raise ValueError(
                f"multiway join inputs {stranded} share no attributes with the "
                f"rest — refusing to emit an implicit cross join (pass "
                f"allow_cross=True for an explicit cartesian product)"
            )
    if len(dfs) <= 2 or (not use_ghd and stats is None):
        return natural_join_chain(dfs)
    if not use_ghd:
        return natural_join_chain(ordered(list(range(len(dfs)))))

    graph = JoinHyperGraph.from_attr_sets([set(d.columns) for d in dfs])
    ghd = decompose(graph)
    if len(ghd.bags) == 1:
        return natural_join_chain(ordered(list(range(len(dfs)))))

    bag_results: dict[int, DataFrame] = {}
    for i, bag in enumerate(ghd.bags):
        members = ordered(bag.rel_ids)
        if members:
            bag_results[i] = natural_join_chain(members)
    # combine along tree edges, rooted at bag 0, skipping relation-less bags
    order = [i for i in range(len(ghd.bags)) if i in bag_results]
    out = bag_results[order[0]]
    for i in order[1:]:
        nxt = bag_results[i]
        common = [c for c in out.columns if c in set(nxt.columns)]
        out = out.join(nxt, on=common, how="inner") if common else out.crossJoin(nxt)
    return out
