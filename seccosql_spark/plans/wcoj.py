"""Worst-case-optimal multiway join: hypercube shuffle + per-task LeapFrog.

Reference parity — the two pieces SURVEY.md §7 marks as the hard core:

- **HyperCube shuffle** (``execution/plan/communication/HyperCubePartitioner.
  scala:23-167``, shares ``ShareComputer.scala:30-412``): every relation of an
  n-way natural join is sent to a grid of tasks in ONE shuffle round. Each
  join attribute gets a "share" (its axis length in the task grid); a row is
  replicated to every grid cell that matches its attribute hashes on the
  attributes it has. Expressed Spark-first as: explode each row to its
  coordinate set → repartition by coordinate (one shuffle, exactly the
  row-replication + repartition plan SURVEY.md §4.3 prescribes).
- **LeapFrog join** (``localExec/LeapFrogJoinExec.scala:35-365``): inside one
  task, bind attributes one at a time in a global order, intersecting the
  candidate sets of every relation containing the attribute.

Status: correct and tested, opt-in (``multiway_join(..., algorithm=
"wcoj")``). The per-task intersection runs in Python over Arrow batches
(``applyInPandas``), so constant factors lose to Catalyst's codegen'd binary
joins except on adversarial cyclic inputs where intermediate results explode
— which is exactly when worst-case optimality matters. The GHD binary chain
(plans/ghd.py) remains the default; this is the documented phase-2b path.

Scale notes: the share vector balances the grid across min(num_tasks, ∏
attr-cardinalities) cells; replication factor of a relation is the product of
the shares of the attributes it LACKS (the standard hypercube cost), so
shares are assigned largest-first to the most frequent attributes.
"""

from __future__ import annotations

import itertools

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attribute_order(attr_sets: list[set[str]]) -> list[str]:
    """Global binding order: by frequency across relations (desc), then name —
    the reference's heuristic edge-walk (multiwayOperators.scala:82-127)
    approximated by frequency."""
    freq: dict[str, int] = {}
    for s in attr_sets:
        for a in s:
            freq[a] = freq.get(a, 0) + 1
    return sorted(freq, key=lambda a: (-freq[a], a))


def compute_shares(attrs: list[str], num_tasks: int) -> dict[str, int]:
    """Factor `num_tasks` into per-attribute shares, doubling the share of
    each attribute round-robin (most frequent first) while the product stays
    within budget — a greedy stand-in for EnumShareComputer's enumeration."""
    shares = {a: 1 for a in attrs}
    product = 1
    changed = True
    while changed:
        changed = False
        for a in attrs:
            if product * 2 <= num_tasks:
                shares[a] *= 2
                product *= 2
                changed = True
    return shares


def _leapfrog(
    rels: list[tuple[list[str], pd.DataFrame]], order: list[str]
) -> list[tuple]:
    """Attribute-at-a-time multiway intersection (LeapFrogJoinIterator
    semantics, newIter/LeapFrogJoinIterator.scala:36). Pure-Python recursion
    over pandas frames — per-task data is one hypercube cell."""
    out: list[tuple] = []
    binding: dict[str, object] = {}

    def rec(level: int, frames: list[tuple[list[str], pd.DataFrame]]) -> None:
        if level == len(order):
            out.append(tuple(binding[a] for a in order))
            return
        a = order[level]
        involved = [(cols, df) for cols, df in frames if a in cols]
        if not involved:
            return  # disconnected attribute: not produced by natural join
        candidates: set | None = None
        for cols, df in involved:
            vals = set(df[a].unique())
            candidates = vals if candidates is None else candidates & vals
            if not candidates:
                return
        for v in sorted(candidates):
            binding[a] = v
            nxt = [
                (cols, df[df[a] == v] if a in cols else df) for cols, df in frames
            ]
            rec(level + 1, nxt)
        del binding[a]

    rec(0, rels)
    return out


def wcoj_natural_join(dfs: list[DataFrame], num_tasks: int = 32) -> DataFrame:
    """n-way natural inner join via hypercube shuffle + per-cell LeapFrog.

    **Set semantics**: the output is the DISTINCT attribute bindings — the
    semantics WCOJ (and the reference's trie-based LeapFrog,
    ``TrieInternalBlock``) is defined over. Inputs with duplicate rows are
    deduplicated by construction; a bag-semantics join of duplicated inputs
    needs the GHD binary chain instead (``multiway_natural_join``).

    Requirements: every output attribute is a join attribute (full natural
    join over the union of columns), and attribute types are hashable
    primitives. Returns columns in global attribute order."""
    if not dfs:
        raise ValueError("wcoj_natural_join needs at least one input")
    spark = dfs[0].sparkSession
    attr_sets = [set(d.columns) for d in dfs]
    order = attribute_order(attr_sets)
    shares = compute_shares(order, num_tasks)
    strides: dict[str, int] = {}
    stride = 1
    for a in order:
        strides[a] = stride
        stride *= shares[a]

    # field types from the first relation carrying each attribute
    field_type: dict[str, T.DataType] = {}
    for df in dfs:
        for f in df.schema.fields:
            field_type.setdefault(f.name, f.dataType)

    # one shuffle: each row → its coordinate cells (replicated over the
    # shares of missing attributes), tagged with its relation index
    pieces = []
    for i, df in enumerate(dfs):
        cols = list(df.columns)
        own = F.lit(0)
        for a in cols:
            own = own + F.pmod(F.xxhash64(F.col(a)), F.lit(shares[a])) * F.lit(strides[a])
        missing = [a for a in order if a not in cols]
        combos = list(
            itertools.product(*[range(shares[a]) for a in missing])
        ) or [()]
        offsets = [
            sum(c * strides[a] for c, a in zip(combo, missing)) for combo in combos
        ]
        piece = (
            df.select(
                own.alias("__own"),
                F.explode(F.array(*[F.lit(o) for o in offsets])).alias("__off"),
                F.lit(i).alias("__rel"),
                F.to_json(F.struct(*cols)).alias("__row"),
            )
            .select(
                (F.col("__own") + F.col("__off")).alias("__cell"), "__rel", "__row"
            )
        )
        pieces.append(piece)
    union = pieces[0]
    for p in pieces[1:]:
        union = union.unionByName(p)

    rel_cols = [list(d.columns) for d in dfs]
    out_schema = T.StructType([T.StructField(a, field_type[a]) for a in order])

    def join_cell(key: tuple, cell: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas delivers the WHOLE cell (mapInPandas batches could
        # split one, silently dropping matches)
        import json

        rels = []
        for i, cols in enumerate(rel_cols):
            rows = cell[cell["__rel"] == i]["__row"]
            if len(rows) == 0:
                return pd.DataFrame(columns=order)
            rels.append((cols, pd.DataFrame([json.loads(r) for r in rows])))
        tuples = _leapfrog(rels, order)
        return pd.DataFrame(tuples, columns=order)

    return union.groupBy("__cell").applyInPandas(join_cell, out_schema)
