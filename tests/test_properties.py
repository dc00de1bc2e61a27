"""Property-based tests (hypothesis) over the pure-Python cores — no Spark
session needed, so hundreds of examples run in seconds."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from seccosql_spark.plans.ghd import decompose
from seccosql_spark.plans.hypergraph import JoinHyperGraph
from seccosql_spark.plans.wcoj import _leapfrog, attribute_order, compute_shares
from seccosql_spark.sql.preprocessor import (
    _matching_paren,
    _split_top_level,
    rewrite_union_by_update,
)

# ---------------------------------------------------------------- GHD

attr = st.sampled_from("abcdef")
edge = st.frozensets(attr, min_size=1, max_size=3)
hypergraph = st.lists(edge, min_size=1, max_size=6).map(
    lambda es: JoinHyperGraph.from_attr_sets([set(e) for e in es])
)


@given(hypergraph)
@settings(max_examples=200, deadline=None)
def test_ghd_covers_every_relation_exactly_once(graph):
    ghd = decompose(graph)
    assigned = sorted(r for b in ghd.bags for r in b.rel_ids)
    assert assigned == [e.rel_id for e in graph.edges]
    for e in graph.edges:
        bag = next(b for b in ghd.bags if e.rel_id in b.rel_ids)
        assert e.attrs & bag.attrs  # relation overlaps its bag


@given(hypergraph)
@settings(max_examples=200, deadline=None)
def test_ghd_bags_cover_all_attributes(graph):
    ghd = decompose(graph)
    covered = set()
    for b in ghd.bags:
        covered |= b.attrs
    assert graph.attributes <= covered


# ---------------------------------------------------------------- WCOJ

rel = st.tuples(
    st.lists(st.sampled_from("abc"), min_size=2, max_size=2, unique=True),
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 4)), min_size=0, max_size=12),
)


@given(st.lists(rel, min_size=2, max_size=3))
@settings(max_examples=150, deadline=None)
def test_leapfrog_matches_pandas_merge(rels):
    frames = [
        (cols, pd.DataFrame(rows or [], columns=cols).drop_duplicates())
        for cols, rows in rels
    ]
    order = attribute_order([set(c) for c, _ in frames])
    res = _leapfrog(frames, order)  # returns a bindings DataFrame in `order`
    got = set(map(tuple, res.itertuples(index=False)))

    # oracle: pandas natural-join fold, projected to the attribute order
    out = None
    for cols, df in frames:
        out = df if out is None else (
            out.merge(df) if set(out.columns) & set(cols) else out.merge(df, how="cross")
        )
    if out is None or out.empty:
        expected = set()
    else:
        for a in order:
            if a not in out.columns:
                return  # disconnected attribute: leapfrog defines no output
        expected = set(map(tuple, out[order].drop_duplicates().itertuples(index=False)))
    assert got == expected


@given(st.lists(st.sampled_from("abcd"), min_size=1, max_size=4, unique=True),
       st.integers(1, 64))
@settings(max_examples=200, deadline=None)
def test_shares_product_bounded(attrs, tasks):
    shares = compute_shares(list(attrs), tasks)
    product = 1
    for v in shares.values():
        product *= v
    assert 1 <= product <= max(tasks, 1)


# ---------------------------------------------------------- preprocessor

sql_fragment = st.text(
    alphabet=st.sampled_from(list("abcxyz123 _,.=<>'")), min_size=0, max_size=40
)


@given(sql_fragment)
@settings(max_examples=300, deadline=None)
def test_rewrite_without_byupdate_is_identity(text):
    if "UNION" not in text.upper():
        assert rewrite_union_by_update(text) == text


@given(st.lists(sql_fragment, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_split_top_level_roundtrip(parts):
    clean = [p.replace(",", " ").replace("(", " ").replace(")", " ").replace("'", " ")
             for p in parts]
    joined = ",".join(clean)
    assert _split_top_level(joined) == clean


@given(st.integers(0, 5))
@settings(max_examples=50, deadline=None)
def test_matching_paren_nested(depth):
    s = "(" * depth + "x" + ")" * depth
    if depth:
        assert _matching_paren(s, 0) == len(s) - 1
