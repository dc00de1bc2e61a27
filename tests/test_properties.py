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


# -------------------------- table-ref + QUALIFY rewriters (VERDICT r13 #8)

from seccosql_spark.sql.preprocessor import (  # noqa: E402
    _LAKE_RE,
    _MATCH_RE,
    _rewrite_table_ref,
    rewrite_qualify,
)


@given(sql_fragment)
@settings(max_examples=300, deadline=None)
def test_rewrite_qualify_identity_without_keyword(text):
    if "QUALIFY" not in text.upper():
        assert rewrite_qualify(text) == text


@given(st.sampled_from([
    "SELECT 'a QUALIFY b' AS s FROM t",
    "SELECT x FROM t -- QUALIFY in a comment",
    "SELECT x, (SELECT 1 FROM u QUALIFY r = 1) AS sub FROM t",
    "SELECT qualify_score FROM t",          # word boundary: not the keyword
    "SELECT x FROM t WHERE y = 'QUALIFY'",
]))
@settings(max_examples=20, deadline=None)
def test_rewrite_qualify_ignores_hidden_occurrences(text):
    """QUALIFY inside string literals, comments, parenthesized subqueries,
    or as an identifier prefix must never trigger the rewrite."""
    assert rewrite_qualify(text) == text


_seen_parts: list[list[str]] = []


def _fake_ref_rewrite(text: str, regex) -> tuple[str, list[str]]:
    _seen_parts.clear()

    def make_view(parts, ref):
        _seen_parts.append([p.strip() for p in parts])
        return f"__vv_{ref}"

    created: list[str] = []
    return _rewrite_table_ref(text, regex, make_view, created), created


_real_ref = st.sampled_from([
    "LAKE('/tmp/t')",
    "lake('/tmp/t', 3)",
    "Lake( '/tmp/a,b' , 2 )",          # quoted comma must not split args
    "LAKE(f(x, y), '2026-01-01T00:00:00')",  # nested parens inside an arg
])
_decoy = st.sampled_from([
    "'see LAKE(1) here'",
    "\"LAKE(nope)\"",
    "'O\\'Brien LAKE(2)'",             # backslash-escaped quote in literal
    "-- LAKE(comment)\n",
    "'it''s LAKE(3)'",                 # doubled-quote escape
])
_plain = st.text(alphabet=st.sampled_from(list("abc xyz_=,.")), max_size=12)


@given(st.lists(st.one_of(_real_ref, _decoy, _plain), min_size=0, max_size=6))
@settings(max_examples=300, deadline=None)
def test_table_ref_rewrite_hits_exactly_the_visible_refs(pieces):
    """Fuzzed mixes of real LAKE() refs (any case, quoted commas, nested
    parens), string-literal/comment decoys, and plain text: the rewriter
    must replace exactly the real refs (in order, preserving surrounding
    text), register one view per ref, and leave every decoy byte-intact."""
    text = " ".join(pieces)
    n_real = sum(1 for p in pieces if p.upper().startswith(("LAKE", "Lake".upper())))
    out, created = _fake_ref_rewrite(text, _LAKE_RE)
    assert len(created) == n_real
    # the shared scanner names views {token}_{counter}: counters in order,
    # one shared random token per invocation (concurrent-statement safety)
    assert [v.rsplit("_", 1)[1] for v in created] == [
        str(i) for i in range(n_real)
    ]
    assert len({v.rsplit("_", 2)[1] for v in created}) <= 1
    for v in created:
        assert v in out
    # decoys survive byte-identical
    for p in pieces:
        if not p.upper().startswith("LAKE"):
            assert p in out
    # every argument list was split at top level only
    for parts in _seen_parts:
        assert 1 <= len(parts) <= 2
        assert parts[0].strip("'\"").startswith(("/tmp/", "f(x"))


@given(st.integers(1, 4))
@settings(max_examples=20, deadline=None)
def test_match_ref_shares_the_same_mechanics(n):
    """MATCH uses the same scanner: n real refs among literal decoys
    rewrite to n views; the decoy stays."""
    text = " UNION ".join(
        f"SELECT * FROM MATCH(g{i}, '(a)-[]->(b)') WHERE note = 'MATCH(x,y)'"
        for i in range(n)
    )
    out, created = _fake_ref_rewrite(text, _MATCH_RE)
    assert len(created) == n
    assert out.count("'MATCH(x,y)'") == n


# ------------------------------------------------ maintenance-DDL dispatch

from seccosql_spark.sql.preprocessor import (  # noqa: E402
    _ADD_CONSTRAINT_RE,
    _CREATE_TAG_RE,
    _DELETE_RE,
    _DETAIL_RE,
    _DROP_CONSTRAINT_RE,
    _DROP_TAG_RE,
    _INSERT_RE,
    _HISTORY_RE,
    _MERGE_RE,
    _OPTIMIZE_RE,
    _RESTORE_RE,
    _SHOW_CONSTRAINTS_RE,
    _SHOW_PARTS_RE,
    _SHOW_TAGS_RE,
    _VACUUM_RE,
)

_MAINT_RES = [
    _VACUUM_RE, _OPTIMIZE_RE, _RESTORE_RE, _CREATE_TAG_RE, _DROP_TAG_RE,
    _SHOW_TAGS_RE, _HISTORY_RE, _DETAIL_RE, _SHOW_PARTS_RE,
    _ADD_CONSTRAINT_RE, _DROP_CONSTRAINT_RE, _SHOW_CONSTRAINTS_RE,
    _MERGE_RE, _DELETE_RE, _INSERT_RE,
]


@given(sql_fragment)
@settings(max_examples=60, deadline=None)
def test_ordinary_sql_never_matches_maintenance(text):
    """Dispatch safety: ordinary statements (the same fragment corpus the
    other rewriter properties use) must never be captured by a
    maintenance regex — a false positive would hijack a user query into a
    lifecycle mutation."""
    s = text.strip().rstrip(";").strip()
    for rx in _MAINT_RES:
        assert rx.match(s) is None, (rx.pattern[:40], s)


@given(
    st.sampled_from(["vacuum", "VACUUM", "Vacuum"]),
    st.integers(1, 9),
    st.sampled_from(["", " ", "  ", "\n "]),
    st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_vacuum_grammar_whitespace_and_case(verb, keep, pad, with_keep):
    """Case and internal whitespace never change what parses (the lexing
    contract every dialect construct follows)."""
    stmt = f"{verb}{pad} LAKE({pad}'/x/t'{pad}){pad}"
    if with_keep:
        stmt += f" KEEP{pad} {keep}"
    m = _VACUUM_RE.match(stmt.strip())
    assert m and m["dir"] == "/x/t"
    assert (m["keep"] == str(keep)) is with_keep


@given(st.sampled_from([
    "OPTIMIZE LAKE('/x') SORT BY k ZORDER BY (a)",   # both cluster modes
    "VACUUM LAKE('/x') KEEP",                          # dangling KEEP
    "RESTORE LAKE('/x') TO VERSION",                   # missing number
    "CREATE TAG ON LAKE('/x')",                        # missing name
    "SHOW TAGS LAKE('/x')",                            # missing ON
    "DESCRIBE HISTORY '/x'",                           # missing LAKE()
    "MERGE INTO LAKE('/x') USING SELECT 1",            # missing KEYS
    "DELETE FROM LAKE('/x') WHERE k = 1",              # missing KEYS
]))
@settings(max_examples=8, deadline=None)
def test_malformed_maintenance_never_dispatches(stmt):
    """Near-miss statements fall through to spark.sql (which rejects them
    loudly) instead of half-parsing into a mutation. (Since r15's targeted
    near-miss guard, maintenance-keyword prefixes now raise a dialect
    error at runtime instead — this property pins only that no REGEX
    half-matches them into the wrong verb.)"""
    for rx in _MAINT_RES:
        assert rx.match(stmt) is None, (rx.pattern[:40], stmt)


# ------------------------------------------------ MERGE clause-form grammar

from seccosql_spark.sql.preprocessor import _parse_merge_clauses  # noqa: E402

_acts_matched = st.sampled_from(["UPDATE SET *", "DELETE"])
_conds = st.sampled_from([None, "s.v > 0", "flag = 'D'", "a = 1 AND b = 2"])
_conds_nonnull = st.sampled_from(["s.v > 0", "flag = 'D'", "a = 1 AND b = 2"])
_keys_st = st.lists(
    st.sampled_from(["k", "id", "doc_id"]), min_size=1, max_size=3, unique=True
)


@st.composite
def _merge_clause_stmt(draw):
    """Generate a structurally valid clause-form MERGE and its expected
    parse: random key conjunction (qualified or bare, either side), random
    clause mix (matched clauses in any order, optional NOT MATCHED INSERT),
    random whitespace/case, parenthesized or bare-table source."""
    keys = draw(_keys_st)
    on = " AND ".join(
        draw(st.sampled_from([f"t.{k} = s.{k}", f"{k} = {k}", f"s.{k} = t.{k}"]))
        for k in keys
    )
    clauses = []
    n_matched = draw(st.integers(1, 2))
    for i in range(n_matched):
        # all but the LAST clause of a kind must carry a condition — an
        # unconditional clause makes every later same-kind clause
        # unreachable and the parser rejects it
        cond = draw(_conds if i == n_matched - 1 else _conds_nonnull)
        act = draw(_acts_matched)
        clauses.append(("matched", cond, act))
    if draw(st.booleans()):
        clauses.append(("not_matched", draw(_conds), "INSERT *"))
    if draw(st.booleans()):
        clauses.append(("not_matched_by_source", draw(_conds), "DELETE"))
    paren = draw(st.booleans())
    body = "(SELECT 1 AS k)" if paren else "updates_view"
    alias = draw(st.sampled_from(["", " AS s"]))
    kw = draw(st.sampled_from(["MERGE INTO", "merge into", "Merge Into"]))
    parts = [f"{kw} LAKE('/tmp/t') USING {body}{alias} ON {on}"]
    heads = {
        "matched": "WHEN MATCHED",
        "not_matched": "WHEN NOT MATCHED",
        "not_matched_by_source": "WHEN NOT MATCHED BY SOURCE",
    }
    for kind, cond, act in clauses:
        w = heads[kind]
        if cond is not None:
            w += f" AND {cond}"
        parts.append(f"{w} THEN {act}")
    sep = draw(st.sampled_from([" ", "\n", "\n  "]))
    expected = (
        "/tmp/t",
        "SELECT 1 AS k" if paren else "updates_view",
        "s" if alias else None,
        keys,
        clauses,
    )
    return sep.join(parts), expected


@given(_merge_clause_stmt())
@settings(max_examples=60, deadline=None)
def test_merge_clause_grammar_roundtrip(case):
    """VERDICT r15 task 5: the clause grammar parses every structurally
    valid statement back to exactly the structure that generated it —
    keys from the ON conjunction with qualifiers stripped, clause order
    preserved, conditions captured verbatim, actions normalized."""
    stmt, expected = case
    got = _parse_merge_clauses(stmt)
    assert got == expected, (stmt, got, expected)


@given(st.sampled_from([
    ("MERGE INTO LAKE('/t') USING (SELECT 1) ON k = k", "WHEN"),
    ("MERGE INTO LAKE('/t') USING (SELECT 1) WHEN MATCHED THEN DELETE", "ON"),
    ("MERGE INTO LAKE('/t') USING (SELECT 1) ON k = j "
     "WHEN MATCHED THEN DELETE", "differently-named"),
    ("MERGE INTO LAKE('/t') USING (SELECT 1) ON k < k "
     "WHEN MATCHED THEN DELETE", "key equality"),
    ("MERGE INTO LAKE('/t') USING (SELECT 1) ON k = k "
     "WHEN MATCHED THEN INSERT *", "NOT MATCHED"),
    ("MERGE INTO LAKE('/t') USING (SELECT 1) ON k = k "
     "WHEN NOT MATCHED THEN DELETE", "only valid WHEN MATCHED"),
    ("MERGE INTO LAKE('/t') USING (SELECT 1) ON k = k "
     "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *",
     "only DELETE"),
    ("MERGE INTO LAKE('/t') USING (SELECT 1) ON k = k "
     "WHEN MATCHED BY SOURCE THEN DELETE", "BY SOURCE is only valid"),
    ("MERGE INTO LAKE('/t') USING (SELECT 1) ON k = k garbage "
     "WHEN MATCHED THEN DELETE", "key equality"),
    ("MERGE INTO LAKE('/t') USING (SELECT 1) ON k = k "
     "WHEN MATCHED THEN DELETE trailing junk", "trailing"),
    ("MERGE INTO LAKE('/t') USING (SELECT 1) ON k = k "
     "WHEN MATCHED THEN UPDATE SET * "
     "WHEN MATCHED AND v > 0 THEN DELETE", "unreachable"),
]))
@settings(max_examples=12, deadline=None)
def test_merge_clause_grammar_rejects_malformed(case):
    """Every malformed clause statement raises a TARGETED dialect error
    (never None, which would fall through toward a Spark temp-view write
    attempt; never a half-parse into a mutation)."""
    import pytest

    stmt, needle = case
    with pytest.raises(ValueError, match=needle):
        _parse_merge_clauses(stmt)


@given(sql_fragment)
@settings(max_examples=60, deadline=None)
def test_ordinary_sql_never_parses_as_merge_clauses(text):
    """Dispatch safety for the procedural clause parser, mirroring the
    regex property above: ordinary statements must return None (not a
    parse, not an error)."""
    assert _parse_merge_clauses(text.strip().rstrip(";").strip()) is None
