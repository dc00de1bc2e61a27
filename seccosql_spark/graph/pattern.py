"""Cypher-ish subgraph pattern parser + compiler.

Reference parity: pattern grammar ``parsing/SQLParser.scala:144-219`` —
paths of ``(a:Label {k: v})-[e:Type]->(b)`` node/edge elements, multiple
paths separated by ``;``, shorthand edge lists like ``a-b;b-c;c-a``
(the benchmark subgraph suite's triangle S1, ``benchmark/testcases/
subgraphQuery.scala:19-100``). Compilation mirrors ``resolveSubgraphQuery``
(``analysis/rules/resolve.scala:400-421``): one filtered copy of the edge
relation per pattern edge, columns renamed to the node variables, natural-
joined together; bidirectional (undirected) pattern edges become a Union of
both directions (``resolve.scala:386-397``).

The output of compilation is a *list of attribute-renamed DataFrames*; the
caller joins them with the GHD planner (plans/ghd.py) — subgraph queries are
exactly the cyclic joins that machinery exists for.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class NodePat:
    var: str
    label: str | None = None
    props: dict[str, object] = field(default_factory=dict)


@dataclass
class EdgePat:
    src: NodePat
    dst: NodePat
    var: str | None = None
    label: str | None = None
    props: dict[str, object] = field(default_factory=dict)
    directed: bool = True


_NODE_RE = re.compile(
    r"\(\s*(?P<var>[A-Za-z_][A-Za-z0-9_]*)?\s*(?::\s*(?P<label>[A-Za-z_][A-Za-z0-9_]*))?"
    r"\s*(?:\{(?P<props>[^}]*)\})?\s*\)"
    r"|(?P<bare>[A-Za-z_][A-Za-z0-9_]*)"
)
_EDGE_RE = re.compile(
    r"(?P<l><)?-\s*(?:\[\s*(?P<var>[A-Za-z_][A-Za-z0-9_]*)?\s*"
    r"(?::\s*(?P<label>[A-Za-z_][A-Za-z0-9_]*))?\s*(?:\{(?P<props>[^}]*)\})?\s*\]\s*)?-?(?P<r>>)?"
)


def _parse_props(text: str | None) -> dict[str, object]:
    props: dict[str, object] = {}
    if not text:
        return props
    for part in text.split(","):
        if not part.strip():
            continue
        k, v = part.split(":", 1)
        v = v.strip()
        if v.startswith(("'", '"')):
            props[k.strip()] = v.strip("'\"")
        elif re.fullmatch(r"-?\d+", v):
            props[k.strip()] = int(v)
        else:
            props[k.strip()] = float(v)
    return props


def parse_pattern(text: str) -> list[EdgePat]:
    """Parse a `;`-separated list of paths into edge patterns."""
    edges: list[EdgePat] = []
    anon = 0
    for path in text.split(";"):
        path = path.strip()
        if not path:
            continue
        pos = 0
        prev: NodePat | None = None
        while pos < len(path):
            m = _NODE_RE.match(path, pos)
            if not m:
                raise ValueError(f"bad pattern near: {path[pos:]!r}")
            if m.group("bare"):
                node = NodePat(m.group("bare"))
            else:
                var = m.group("var")
                if var is None:
                    var = f"__anon{anon}"
                    anon += 1
                node = NodePat(var, m.group("label"), _parse_props(m.group("props")))
            pos = m.end()
            if prev is not None:
                e = edges[-1]
                e.dst = node
            prev = node
            if pos >= len(path):
                break
            em = _EDGE_RE.match(path, pos)
            if not em or em.end() == pos:
                raise ValueError(f"bad edge syntax near: {path[pos:]!r}")
            left, right = bool(em.group("l")), bool(em.group("r"))
            edge = EdgePat(
                src=prev,
                dst=prev,  # patched when next node parses
                var=em.group("var"),
                label=em.group("label"),
                props=_parse_props(em.group("props")),
                directed=left or right,
            )
            edges.append(edge)
            pos = em.end()
            edge._reverse = left and not right  # type: ignore[attr-defined]
        # patch reversed edges (<-)
    for e in edges:
        if getattr(e, "_reverse", False):
            e.src, e.dst = e.dst, e.src
    return edges


def node_constraints(edges: list[EdgePat]) -> dict[str, NodePat]:
    """Variable -> most-constrained NodePat across all its appearances."""
    out: dict[str, NodePat] = {}
    for e in edges:
        for n in (e.src, e.dst):
            cur = out.get(n.var)
            if cur is None:
                out[n.var] = NodePat(n.var, n.label, dict(n.props))
            else:
                cur.label = cur.label or n.label
                cur.props.update(n.props)
    return out
