"""Dialect preprocessor: ``WITH RECURSIVE(n)``, ``UNION BYUPDATE``, ``MATCH``,
``QUALIFY``.

Reference grammar being re-expressed (``parsing/SQLParser.scala``):

- ``WITH [RECURSIVE[(n)]] name[(cols)] AS (q), ... q`` — :360-374. Bounded
  recursion, default 20 rounds (``reference.conf:37``). Spark <4 has no
  recursive CTE, so the recursive member runs as a semi-naive driver loop
  (operators/recursion.py) and the result is bound as a temp view.
- ``(q1) UNION BYUPDATE k1, k2 (q2)`` — :328-336. Upsert; rewritten to a
  pure-SQL anti-join + union (the reference only ever parsed it; we give it
  correct, executable semantics).
- ``MATCH (graph, 'pattern')`` as a table reference — :240-246. Compiled by
  the graph layer into a join chain and bound as a temp view.

The rewriter is token-scanner based (top-level occurrences only — never
inside parens, quotes, or comments), NOT a full SQL grammar: everything it
does not recognize flows to ``spark.sql`` verbatim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seccosql_spark.operators.recursion import DEFAULT_MAX_ROUNDS, bounded_fixpoint

if TYPE_CHECKING:
    from seccosql_spark.session import SeccoSession


# ---------------------------------------------------------------- scanning

def _scan_top_level(text: str):
    """Yield (index, char, depth) for chars outside quotes/comments, tracking
    paren depth."""
    depth = 0
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in "'\"`":
            quote = ch
            i += 1
            while i < n:
                if quote != "`" and text[i] == "\\":
                    # Spark's default (non-ANSI) string literals support
                    # backslash escapes: 'O\'Brien'. Treating the escaped
                    # quote as the terminator opened a phantom string at
                    # the literal's REAL closing quote and swallowed
                    # everything after it as "inside quotes".
                    i += 2
                    continue
                if text[i] == quote:
                    if i + 1 < n and text[i + 1] == quote:  # escaped ''
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "-" and text[i : i + 2] == "--":
            while i < n and text[i] != "\n":
                i += 1
        elif ch == "(":
            depth += 1
            yield i, ch, depth
        elif ch == ")":
            yield i, ch, depth
            depth -= 1
        else:
            yield i, ch, depth
        i += 1


def _find_top_level_keyword(text: str, keyword: str) -> int:
    """Index of the first top-level (depth 0), word-bounded, case-insensitive
    occurrence of `keyword` (single word or space-joined words); -1 if none."""
    pat = re.compile(r"\b" + r"\s+".join(map(re.escape, keyword.split())) + r"\b", re.I)
    positions = {i: d for i, _, d in _scan_top_level(text)}
    for m in pat.finditer(text):
        if positions.get(m.start()) == 0 and all(
            positions.get(j, -1) == 0 for j in range(m.start(), m.end())
        ):
            return m.start()
    return -1


def _matching_paren(text: str, open_idx: int) -> int:
    """Index of the ')' closing the '(' at open_idx."""
    target = None
    for i, ch, depth in _scan_top_level(text):
        if i == open_idx:
            target = depth
        elif target is not None and ch == ")" and depth == target:
            return i
    raise ValueError(f"unbalanced parentheses in SQL near offset {open_idx}")


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    parts, last = [], 0
    for i, ch, depth in _scan_top_level(text):
        if ch == sep and depth == 0:
            parts.append(text[last:i])
            last = i + 1
    parts.append(text[last:])
    return parts


# ---------------------------------------------------------- UNION BYUPDATE

_BYUPDATE_RE = re.compile(r"\bUNION\s+BYUPDATE\b", re.I)


def rewrite_union_by_update(text: str) -> str:
    """Rewrite every top-level ``(q1) UNION BYUPDATE k1, k2 (q2)`` into
    standard SQL: ``SELECT l.* FROM (q1) l LEFT ANTI JOIN (SELECT DISTINCT
    keys FROM (q2)) USING (keys) UNION ALL SELECT * FROM (q2)``.

    One shuffle on the keys (or a broadcast when the delta is small — AQE
    decides); applied innermost-first so operands may themselves contain
    BYUPDATE."""
    idx = _find_top_level_keyword(text, "UNION BYUPDATE")
    if idx < 0:
        return text
    # left operand: the parenthesized query ending just before the keyword
    left_close = text.rfind(")", 0, idx)
    if left_close < 0:
        raise ValueError("UNION BYUPDATE: left operand must be parenthesized")
    left_open = None
    for i, ch, depth in _scan_top_level(text):
        if ch == "(" and depth == 1 and _matching_paren(text, i) == left_close:
            left_open = i
            break
    if left_open is None:
        raise ValueError("UNION BYUPDATE: cannot find left operand")
    kw_end = _BYUPDATE_RE.search(text, idx).end()
    right_open = text.find("(", kw_end)
    if right_open < 0:
        raise ValueError("UNION BYUPDATE: right operand must be parenthesized")
    right_close = _matching_paren(text, right_open)

    q1 = rewrite_union_by_update(text[left_open + 1 : left_close].strip())
    q2 = rewrite_union_by_update(text[right_open + 1 : right_close].strip())
    keys = [k.strip() for k in text[kw_end:right_open].split(",") if k.strip()]
    if not keys:
        raise ValueError("UNION BYUPDATE: no key columns given")
    key_list = ", ".join(keys)
    rewritten = (
        f"SELECT * FROM ({q1}) AS __ubu_left "
        f"LEFT ANTI JOIN (SELECT DISTINCT {key_list} FROM ({q2}) AS __ubu_rk) AS __ubu_keys "
        f"USING ({key_list}) "
        f"UNION ALL SELECT * FROM ({q2}) AS __ubu_right"
    )
    out = text[:left_open] + "(" + rewritten + ")" + text[right_close + 1 :]
    return rewrite_union_by_update(out)


# --------------------------------------------------------- WITH RECURSIVE(n)

_WITH_REC_RE = re.compile(r"^\s*WITH\s+RECURSIVE\s*(?:\(\s*(\d+)\s*\))?\s+", re.I)
_UNION_RE = re.compile(r"\bUNION(\s+ALL)?\b", re.I)


_SELECT_DISTINCT_RE = re.compile(r"^\s*SELECT\s+DISTINCT\b", re.I)


def rewrite_qualify(text: str) -> str:
    """Rewrite a top-level ``... QUALIFY <pred> [ORDER BY ...] [LIMIT ...]``
    into the window-materializing subquery Spark can run (Spark has no
    QUALIFY clause; DuckDB/Snowflake/BigQuery do — this is the engine's
    dialect extension beyond both the reference and Spark):

        SELECT * EXCEPT (__qualify)
        FROM (<head select list>, (<pred>) AS __qualify <head from...>) q
        WHERE __qualify [ORDER BY ...] [LIMIT ...]

    The predicate is injected into the head's SELECT list (so its window
    functions see the same scope QUALIFY defines: after grouping/HAVING,
    before ORDER BY/LIMIT), and the trailing ORDER BY / LIMIT stay outside
    the wrapper so they order/cap the FILTERED rows. Top-level occurrences
    only, like every rewrite here; QUALIFY inside a parenthesized subquery
    is out of scope. SELECT DISTINCT heads are rejected (injecting the
    predicate column would change the distinct key)."""
    idx = _find_top_level_keyword(text, "QUALIFY")
    if idx < 0:
        return text
    head = text[:idx].rstrip()
    if _SELECT_DISTINCT_RE.match(head):
        raise ValueError("QUALIFY: SELECT DISTINCT head is not supported")
    rest = text[idx + len("QUALIFY"):]
    tail_idx = len(rest)
    for kw in ("ORDER BY", "LIMIT"):
        k = _find_top_level_keyword(rest, kw)
        if 0 <= k < tail_idx:
            tail_idx = k
    pred, tail = rest[:tail_idx].strip(), rest[tail_idx:].strip()
    if not pred:
        raise ValueError("QUALIFY: missing predicate")
    from_idx = _find_top_level_keyword(head, "FROM")
    if from_idx < 0:
        raise ValueError("QUALIFY: no top-level FROM in the query head")
    injected = (
        f"{head[:from_idx].rstrip()}, ({pred}) AS __qualify {head[from_idx:]}"
    )
    out = (
        f"SELECT * EXCEPT (__qualify) FROM ({injected}) __qualify_q"
        " WHERE __qualify"
    )
    if tail:
        out += " " + tail
    return out


@dataclass
class _Cte:
    name: str
    cols: list[str]
    body: str


def _parse_ctes(text: str) -> tuple[list[_Cte], str]:
    """Parse `name[(cols)] AS (body), ...` followed by the main query."""
    ctes: list[_Cte] = []
    rest = text
    while True:
        m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\(([^)]*)\))?\s+AS\s*\(", rest, re.I)
        if not m:
            break
        open_idx = m.end() - 1
        close_idx = _matching_paren(rest, open_idx)
        cols = [c.strip() for c in (m.group(3) or "").split(",") if c.strip()]
        ctes.append(_Cte(m.group(1), cols, rest[open_idx + 1 : close_idx].strip()))
        after = rest[close_idx + 1 :].lstrip()
        if after.startswith(","):
            rest = after[1:]
        else:
            rest = after
            break
    return ctes, rest


def _split_recursive_body(body: str, name: str) -> tuple[str, str, bool] | None:
    """Split a CTE body at the LAST top-level UNION [ALL] whose right side
    references `name`. Returns (base, step, is_union_all) or None if the body
    never references itself."""
    positions = {i: d for i, _, d in _scan_top_level(body)}
    candidates = [
        m
        for m in _UNION_RE.finditer(body)
        if positions.get(m.start()) == 0
        and "BYUPDATE" not in body[m.end() : m.end() + 12].upper()
    ]
    name_re = re.compile(r"\b" + re.escape(name) + r"\b", re.I)
    for m in reversed(candidates):
        step = body[m.end() :].strip()
        if name_re.search(step):
            return body[: m.start()].strip(), step, bool(m.group(1))
    return None


def _replace_refs(sql: str, mapping: dict[str, str]) -> str:
    """Replace word-bounded references to each key of `mapping` (a lowercase
    name -> replacement dict) with its value, skipping occurrences inside
    quotes/comments. Token-level (not grammar-aware): a bare column or alias
    spelled exactly like a CTE name would also be rewritten — acceptable for
    this dialect layer, where CTE names are statement-local identifiers."""
    if not mapping:
        return sql
    unquoted = {i for i, _, _ in _scan_top_level(sql)}
    pat = re.compile(
        r"\b(" + "|".join(re.escape(k) for k in mapping) + r")\b", re.I
    )
    out: list[str] = []
    last = 0
    for m in pat.finditer(sql):
        if all(j in unquoted for j in range(m.start(), m.end())):
            out.append(sql[last : m.start()])
            out.append(mapping[m.group(1).lower()])
            last = m.end()
    out.append(sql[last:])
    return "".join(out)


def run_with_recursive(session: "SeccoSession", text: str) -> DataFrame:
    """Execute a ``WITH RECURSIVE[(n)] ...`` statement via the driver loop.
    Non-self-referencing CTEs become plain (statement-scoped) bindings.

    Scoping: every CTE is bound under a unique internal view name and all
    references (later CTE bodies, recursive steps, the main query) are
    rewritten to it, so a CTE named like a real table never shadows the
    session catalog; the internal views are dropped before returning (the
    result DataFrame is already analyzed, so dropping is safe).

    Recursion semantics are the SQL-standard *working table* ones (Postgres/
    DuckDB): the self-reference denotes the PREVIOUS round's new rows — not
    the accumulated result — however many times it occurs. That makes the
    delta binding below correct even for non-linear steps (two self-
    references) and aggregation over the CTE; differential tests in
    tests/test_preprocessor.py pin this against DuckDB."""
    m = _WITH_REC_RE.match(text)
    if m is None:
        raise ValueError("not a WITH RECURSIVE statement")
    max_rounds = int(m.group(1)) if m.group(1) else DEFAULT_MAX_ROUNDS
    ctes, main = _parse_ctes(text[m.end() :])
    spark = session.spark

    bound: dict[str, str] = {}  # lowercase cte name -> internal view name
    created: list[str] = []
    try:
        for i, cte in enumerate(ctes):
            internal = f"__secco_cte{i}_{cte.name}"
            body = _replace_refs(cte.body, bound)  # earlier CTEs in scope
            split = _split_recursive_body(body, cte.name)
            if split is None:
                df = spark.sql(body)
            else:
                base_sql, step_sql, is_all = split
                step_sql = _replace_refs(step_sql, {cte.name.lower(): internal})
                base = spark.sql(base_sql)
                if cte.cols:
                    base = base.toDF(*cte.cols)

                def step(delta: DataFrame, _sql=step_sql, _view=internal, _cols=tuple(cte.cols)):
                    delta.createOrReplaceTempView(_view)
                    out = spark.sql(_sql)
                    return out.toDF(*_cols) if _cols else out

                df = bounded_fixpoint(base, step, max_rounds=max_rounds, distinct=not is_all)
            if cte.cols and len(cte.cols) == len(df.columns):
                df = df.toDF(*cte.cols)
            df.createOrReplaceTempView(internal)
            created.append(internal)
            bound[cte.name.lower()] = internal

        return spark.sql(_replace_refs(main, bound))
    finally:
        for view in created:
            spark.catalog.dropTempView(view)


# ------------------------------------- table-valued refs (MATCH, LAKE)

_MATCH_RE = re.compile(r"\bMATCH\s*\(", re.I)


def _rewrite_table_ref(
    text: str, regex: "re.Pattern", make_view, created: list[str] | None
) -> str:
    """Shared mechanics for ``NAME(args...)`` table references: find the
    first occurrence OUTSIDE quotes/comments (``'see LAKE(1)'`` in a string
    literal must not be rewritten — any depth is fine, table refs appear in
    subqueries), split its top-level args, let ``make_view(parts, ref)``
    register a temp view named with the unique ``ref``, splice the view
    name in, repeat. View names go to ``created`` so the caller drops them
    statement-scoped. ``ref`` = ``{random token}_{counter}``: uniqueness
    lives HERE so every table-ref rewriter (LAKE, MATCH, future ones) is
    concurrent-statement-safe — with a bare counter, two statements on one
    session would bind the same view name and each drop the other's
    binding on completion (ADVICE r13; generalized after review)."""
    import uuid

    token = uuid.uuid4().hex[:8]
    out = text
    counter = 0
    while True:
        visible = {i for i, _, _ in _scan_top_level(out)}
        m = None
        for cand in regex.finditer(out):
            if all(j in visible for j in range(cand.start(), cand.end())):
                m = cand
                break
        if m is None:
            return out
        open_idx = m.end() - 1
        close_idx = _matching_paren(out, open_idx)
        parts = _split_top_level(out[open_idx + 1 : close_idx])
        view = make_view(parts, f"{token}_{counter}")
        counter += 1
        if created is not None:
            created.append(view)
        out = out[: m.start()] + view + out[close_idx + 1 :]


def rewrite_match(session: "SeccoSession", text: str, created: list[str] | None = None) -> str:
    """Rewrite each ``MATCH(graph, 'pattern')`` table reference into a temp
    view produced by the graph layer's pattern compiler (SURVEY.md §2.3).
    View names created are appended to `created` so the caller can drop them
    once the statement is analyzed (statement-scoped, like CTE bindings)."""

    def make_view(parts: list[str], ref: str) -> str:
        if len(parts) != 2:
            raise ValueError("MATCH(graph, 'pattern') takes exactly two arguments")
        graph_name = parts[0].strip()
        pattern = parts[1].strip().strip("'\"")
        from seccosql_spark.graph.graphframe import SeccoGraphFrame

        graph = SeccoGraphFrame.from_catalog(session, graph_name)
        view = f"__match_{graph_name}_{ref}"
        # algorithm="auto": SQL MATCH gets the same calibrated GHD-vs-WCOJ
        # routing as the Python pattern() API (WCOJ_BOUNDARY.md). The probe
        # it needs (degree/count/distinctness) is memoized per edge plan,
        # so repeated MATCH statements over one graph pay zero extra jobs;
        # every precondition (simple set, directed, no edge props) is
        # checked and falls back to the GHD chain.
        graph.pattern(pattern, algorithm="auto").df.createOrReplaceTempView(view)
        return view

    return _rewrite_table_ref(text, _MATCH_RE, make_view, created)


# -------------------------------------------------------------- LAKE

_LAKE_RE = re.compile(r"\bLAKE\s*\(", re.I)


def rewrite_lake(
    session: "SeccoSession", text: str, created: list[str] | None = None
) -> str:
    """Rewrite each ``LAKE('<table_dir>'[, <version> | '<timestamp>'])``
    table reference into a temp view over the lakehouse snapshot read — the
    SQL surface for manifest-pinned time travel. A bare integer second
    argument pins a version (Delta's ``VERSION AS OF`` twin); a quoted
    string that parses as an ISO-8601 instant pins the snapshot live at
    that instant (``TIMESTAMP AS OF`` — resolved via each manifest's
    monotonic ``committed_at``, naive timestamps read as UTC), and any
    other string pins by NAMED TAG (``create_tag`` — Iceberg tag twin).
    Timestamp-parse wins the tie so a date-named tag can never shadow
    time travel (ADVICE r14); such a tag stays reachable via the Python
    ``read_table(tag=...)`` verb. The tie covers BOTH ISO forms
    ``fromisoformat`` accepts — dashed ('2026-01-01') and, on Python
    3.11+, basic ('20260101') — so an all-digit 8-char tag name is also
    treated as a timestamp here.
    Omitting it reads the latest commit; snapshots
    honor merge-on-read equality deletes and schema evolution exactly like
    the Python ``read_table`` verb (it IS that verb). Views are
    statement-scoped and
    dropped by the caller; ``_rewrite_table_ref`` makes the names unique
    per invocation (ADVICE r13), so concurrent statements never clobber
    each other's bindings."""

    def make_view(parts: list[str], ref: str) -> str:
        if len(parts) not in (1, 2):
            raise ValueError(
                "LAKE('<table_dir>'[, <version>]) takes one or two arguments"
            )
        table_dir = parts[0].strip().strip("'\"")
        version = timestamp = tag = None
        if len(parts) == 2:
            arg = parts[1].strip()
            if re.fullmatch(r"\d+", arg):
                version = int(arg)
            else:
                from seccosql_spark.operators.lakehouse import (
                    _parse_commit_ts,
                    list_tags,
                )

                s = arg.strip("'\"")
                # timestamps take precedence over named refs: date-only
                # strings like '2026-01-01' are BOTH legal tag names and
                # valid ISO instants, and shadowing TIMESTAMP AS OF with a
                # tag would silently change which snapshot a travel query
                # reads (ADVICE r14). A tag that happens to parse as an
                # instant stays reachable via read_table(tag=...).
                try:
                    _parse_commit_ts(s)
                    timestamp = s
                except ValueError:
                    if s in list_tags(table_dir):
                        tag = s
                    else:
                        raise ValueError(
                            f"LAKE: {s!r} is neither a valid ISO-8601 "
                            f"instant nor a tag of {table_dir} (tags: "
                            f"{sorted(list_tags(table_dir)) or 'none'})"
                        ) from None
        from seccosql_spark.operators.lakehouse import read_table

        view = f"__lake_{ref}"
        read_table(
            session.spark, table_dir, version, timestamp=timestamp, tag=tag
        ).createOrReplaceTempView(view)
        return view

    return _rewrite_table_ref(text, _LAKE_RE, make_view, created)


# ------------------------------------------------------------ LAKE_CHANGES

_LAKE_CHANGES_RE = re.compile(r"\bLAKE_CHANGES\s*\(", re.I)


def rewrite_lake_changes(
    session: "SeccoSession", text: str, created: list[str] | None = None
) -> str:
    """Rewrite each ``LAKE_CHANGES('<table_dir>', v_from, v_to[, PAIRED])``
    table reference into a temp view over the change data feed between the
    two committed versions (Delta's ``table_changes`` TVF twin): net
    row-level changes with a ``_change_type`` column ('insert' | 'delete';
    updates surface as delete+insert pairs — or, with the PAIRED flag, as
    'update_preimage'/'update_postimage' re-labeled by the merge commits'
    recorded keys). The diff is manifest-driven — only
    files added/removed between the versions are read — exactly the Python
    ``table_changes`` verb (it IS that verb). Statement-scoped views,
    unique per invocation, same as LAKE/MATCH."""

    def make_view(parts: list[str], ref: str) -> str:
        if len(parts) not in (3, 4):
            raise ValueError(
                "LAKE_CHANGES('<table_dir>', v_from, v_to[, PAIRED]) takes "
                "three or four arguments"
            )
        table_dir = parts[0].strip().strip("'\"")
        try:
            v0, v1 = int(parts[1].strip()), int(parts[2].strip())
        except ValueError:
            raise ValueError(
                f"LAKE_CHANGES: v_from/v_to must be integer versions, got "
                f"{parts[1].strip()!r}, {parts[2].strip()!r}"
            ) from None
        paired = False
        if len(parts) == 4:
            flag = parts[3].strip().strip("'\"").upper()
            if flag != "PAIRED":
                raise ValueError(
                    f"LAKE_CHANGES: fourth argument must be PAIRED, got "
                    f"{parts[3].strip()!r}"
                )
            paired = True
        from seccosql_spark.operators.lakehouse import table_changes

        view = f"__lakechanges_{ref}"
        table_changes(
            session.spark, table_dir, v0, v1, pair_updates=paired
        ).createOrReplaceTempView(view)
        return view

    return _rewrite_table_ref(text, _LAKE_CHANGES_RE, make_view, created)


# ------------------------------------------------ lakehouse maintenance DDL

# Statement-level verbs over a manifest-versioned table — the SQL surface
# for the lifecycle operators Delta/Iceberg expose as SQL (VACUUM /
# OPTIMIZE [ZORDER BY] / RESTORE ... TO VERSION / tag DDL / DESCRIBE
# HISTORY). These are whole statements, not table references: Spark cannot
# parse them, so they are dispatched BEFORE every other rewrite and return
# the operation-metrics DataFrame directly (Delta's convention: each
# maintenance command yields a small result relation).
# Both quote styles, mirroring what rewrite_lake's argument strip accepts
# (ADVICE r15: a double-quoted dir used to fall through to Spark's parser
# with an opaque error); the backreference keeps open/close quotes paired.
# Paths containing a quote character remain unsupported in BOTH surfaces.
_L_DIR = r"LAKE\s*\(\s*(?P<q>['\"])(?P<dir>[^'\"]+)(?P=q)\s*\)"
_L_TAG = r"(?P<name>'[^']+'|[A-Za-z0-9._-]+)"
_VACUUM_RE = re.compile(
    rf"^VACUUM\s+{_L_DIR}(?:\s+KEEP\s+(?P<keep>\d+))?"
    r"(?:\s+(?P<dry>DRY\s+RUN))?$", re.I)
_OPTIMIZE_RE = re.compile(
    rf"^OPTIMIZE\s+{_L_DIR}"
    r"(?:\s+SORT\s+BY\s+(?P<sort>[A-Za-z_][A-Za-z0-9_]*)"
    r"|\s+ZORDER\s+BY\s+\((?P<zorder>[^)]+)\))?"
    r"(?:\s+TARGET\s+(?P<files>\d+)\s+FILES)?"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*$", re.I | re.S)
_RESTORE_RE = re.compile(
    rf"^RESTORE\s+{_L_DIR}\s+TO\s+(?:VERSION\s+(?P<v>\d+)"
    rf"|TAG\s+{_L_TAG}"
    r"|TIMESTAMP\s+'(?P<ts>[^']+)')$", re.I)
_CREATE_TAG_RE = re.compile(
    rf"^CREATE\s+(?:(?P<replace>OR\s+REPLACE)\s+)?TAG\s+{_L_TAG}\s+ON\s+"
    rf"{_L_DIR}(?:\s+AS\s+OF\s+VERSION\s+(?P<v>\d+))?$", re.I)
_DROP_TAG_RE = re.compile(rf"^DROP\s+TAG\s+{_L_TAG}\s+ON\s+{_L_DIR}$", re.I)
_SHOW_TAGS_RE = re.compile(rf"^SHOW\s+TAGS\s+ON\s+{_L_DIR}$", re.I)
_HISTORY_RE = re.compile(rf"^DESCRIBE\s+HISTORY\s+{_L_DIR}$", re.I)
_DETAIL_RE = re.compile(rf"^DESCRIBE\s+DETAIL\s+{_L_DIR}$", re.I)
_SHOW_PARTS_RE = re.compile(rf"^SHOW\s+PARTITIONS\s+{_L_DIR}$", re.I)
_ADD_CONSTRAINT_RE = re.compile(
    rf"^ALTER\s+{_L_DIR}\s+ADD\s+CONSTRAINT\s+"
    r"(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s+CHECK\s*\((?P<expr>.+)\)\s*$",
    re.I | re.S)
_DROP_CONSTRAINT_RE = re.compile(
    rf"^ALTER\s+{_L_DIR}\s+DROP\s+CONSTRAINT\s+"
    r"(?P<name>[A-Za-z_][A-Za-z0-9_]*)$", re.I)
_ADD_COLUMN_RE = re.compile(
    rf"^ALTER\s+{_L_DIR}\s+ADD\s+COLUMN\s+"
    r"`?(?P<name>[A-Za-z_][A-Za-z0-9_]*)`?\s+(?P<type>.+?)\s*$",
    re.I | re.S)
_SHOW_CONSTRAINTS_RE = re.compile(
    rf"^SHOW\s+CONSTRAINTS\s+ON\s+{_L_DIR}$", re.I)
_MERGE_RE = re.compile(
    rf"^MERGE\s+INTO\s+{_L_DIR}\s+KEYS\s*\((?P<keys>[^)]+)\)\s+USING\s+"
    r"(?P<body>.+)$", re.I | re.S)
_DELETE_RE = re.compile(
    rf"^DELETE\s+FROM\s+{_L_DIR}\s+KEYS\s*\((?P<keys>[^)]+)\)\s+WHERE\s+"
    r"(?P<pred>.+)$", re.I | re.S)
_INSERT_RE = re.compile(
    rf"^INSERT\s+INTO\s+{_L_DIR}\s+(?P<body>.+)$", re.I | re.S)

# Delta/Iceberg user-facing MERGE clause form (VERDICT r15 task 5). The
# CDC-shaped KEYS form above stays the machine surface (__deleted column
# contract); this is its human twin, lowered onto the SAME merge_cow verb:
#   MERGE INTO LAKE('<dir>') USING (<query>) [AS s] ON t.k = s.k [AND ..]
#   WHEN MATCHED [AND <cond>] THEN UPDATE SET * | DELETE
#   WHEN NOT MATCHED [AND <cond>] THEN INSERT *
#   WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE   (full-sync)
_MERGE_HEAD_RE = re.compile(rf"^MERGE\s+INTO\s+{_L_DIR}\s+USING\s+", re.I | re.S)
_MERGE_WHEN_RE = re.compile(
    r"WHEN\s+(?P<neg>NOT\s+)?MATCHED(?P<bysrc>\s+BY\s+SOURCE)?"
    r"(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?P<act>UPDATE\s+SET\s+\*|DELETE|INSERT\s+\*)",
    re.I | re.S)
_MERGE_ALIAS_ON_RE = re.compile(
    r"\s*(?:AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*)\s+)?ON\s+", re.I)


def _keys_from_on(on: str) -> list[str]:
    """The ON condition must be a conjunction of same-named key equalities
    (``t.k = s.k AND ...``) — that is what makes the clause form lowerable
    onto merge_cow's key contract with zero new semantics. Qualifiers are
    stripped; a non-equality or differently-named pair is a loud error, not
    a silent theta-merge."""
    keys: list[str] = []
    for part in re.split(r"\s+AND\s+", on.strip(), flags=re.I):
        mm = re.fullmatch(
            r"\s*`?([A-Za-z_][\w]*)`?(?:\s*\.\s*`?([A-Za-z_][\w]*)`?)?"
            r"\s*=\s*"
            r"`?([A-Za-z_][\w]*)`?(?:\s*\.\s*`?([A-Za-z_][\w]*)`?)?\s*",
            part,
        )
        if not mm:
            raise ValueError(
                f"MERGE ON: {part.strip()!r} is not a key equality — the "
                "clause form supports only `t.k = s.k [AND ...]` "
                "conjunctions (use the KEYS (...) USING form for anything "
                "else)"
            )
        lcol = mm.group(2) or mm.group(1)
        rcol = mm.group(4) or mm.group(3)
        if lcol.lower() != rcol.lower():
            raise ValueError(
                f"MERGE ON: {part.strip()!r} equates differently-named "
                "columns — the key must carry the same name on both sides"
            )
        keys.append(lcol)
    return keys


def _parse_merge_clauses(
    s: str,
) -> tuple[str, str, str | None, list[str],
           list[tuple[str, str | None, str]]] | None:
    """Pure parse of the WHEN-clause MERGE (no session, no IO — the
    property-fuzz surface). Returns ``(table_dir, using_body, source_alias,
    keys, clauses)`` where each clause is ``(kind, condition | None,
    action)`` with kind 'matched' / 'not_matched' / 'not_matched_by_source'
    and action one of 'UPDATE SET *' / 'DELETE' / 'INSERT *'; None when
    ``s`` is not a clause-form MERGE at all; loud ValueError on a
    malformed one."""
    m = _MERGE_HEAD_RE.match(s)
    if m is None:
        return None
    table_dir = m["dir"]
    rest = s[m.end():].lstrip()
    if rest.startswith("("):
        close = _matching_paren(rest, 0)
        body, rest = rest[1:close], rest[close + 1:]
    else:
        mt = re.match(r"[A-Za-z_][A-Za-z0-9_.]*", rest)
        if not mt:
            raise ValueError(
                "MERGE USING: expected a parenthesized query or a table name"
            )
        body, rest = mt.group(0), rest[mt.end():]
    ma = _MERGE_ALIAS_ON_RE.match(rest)
    if ma is None:
        raise ValueError(
            "MERGE: expected [AS alias] ON <key equalities> after the "
            "USING source"
        )
    salias = ma["alias"]
    rest = rest[ma.end():]
    first = _MERGE_WHEN_RE.search(rest)
    if first is None:
        raise ValueError(
            "MERGE: at least one WHEN [NOT] MATCHED ... THEN clause required"
        )
    keys = _keys_from_on(rest[: first.start()])
    clauses: list[tuple[str, str | None, str]] = []
    pos = first.start()
    for mw in _MERGE_WHEN_RE.finditer(rest):
        if rest[pos: mw.start()].strip():
            raise ValueError(
                f"MERGE: unparsed text between clauses: "
                f"{rest[pos: mw.start()].strip()[:80]!r}"
            )
        pos = mw.end()
        act = re.sub(r"\s+", " ", mw["act"].upper())
        if mw["bysrc"] is not None:
            if mw["neg"] is None:
                raise ValueError(
                    "MERGE: BY SOURCE is only valid as WHEN NOT MATCHED "
                    "BY SOURCE"
                )
            kind = "not_matched_by_source"
            if act != "DELETE":
                raise ValueError(
                    f"MERGE: {act} is not valid WHEN NOT MATCHED BY SOURCE "
                    "(only DELETE — there is no source row to update from)"
                )
        elif mw["neg"] is None:
            kind = "matched"
            if act == "INSERT *":
                raise ValueError(
                    "MERGE: INSERT is only valid WHEN NOT MATCHED"
                )
        else:
            kind = "not_matched"
            if act != "INSERT *":
                raise ValueError(
                    f"MERGE: {act} is only valid WHEN MATCHED (NOT MATCHED "
                    "supports INSERT *)"
                )
        prior_unconditional = any(
            k == kind and c is None for k, c, _a in clauses
        )
        if prior_unconditional:
            # an unconditional clause routes its branch's ENTIRE remainder;
            # anything after it of the same kind can never fire — reject
            # at parse (Delta likewise forces conditions on all but the
            # last clause) instead of silently shipping dead DML
            raise ValueError(
                f"MERGE: unreachable clause — a prior unconditional "
                f"{kind.replace('_', ' ').upper()} clause already routes "
                "every such row"
            )
        clauses.append((kind, mw["cond"], act))
    if rest[pos:].strip():
        raise ValueError(
            f"MERGE: unparsed trailing text after the last clause: "
            f"{rest[pos:].strip()[:80]!r}"
        )
    return table_dir, body, salias, keys, clauses


def _try_merge_clauses(session: "SeccoSession", s: str) -> DataFrame | None:
    """Lower the WHEN-clause MERGE (Delta's user-facing form). Routing:
    the source rows are split matched/not-matched against the target's
    key set once (semi/anti join — AQE broadcasts the O(distinct keys)
    build side for realistic batches), then each row takes the FIRST
    clause of its branch whose condition passes (Delta's clause-order
    semantics; NULL conditions are false); rows passing no clause drop
    out of the batch, which under merge_cow's anti-join contract leaves
    their target rows untouched. Conditions on the matched/not-matched
    clauses may reference SOURCE columns only (the batch is the only
    relation in scope — target-side conditions there would force a full
    data read that the KEYS form deliberately avoids); conditions on the
    full-sync NOT MATCHED BY SOURCE clause see TARGET columns, since that
    branch IS a snapshot read by construction. The lowered batch feeds
    the SAME merge_cow verb as the KEYS form — never a second
    implementation of the copy-on-write."""
    parsed = _parse_merge_clauses(s)
    if parsed is None:
        return None
    table_dir, body, salias, keys, clauses = parsed
    from seccosql_spark.operators import lakehouse as lh

    spark = session.spark
    src = execute_query_sql(session, body)
    if salias:
        src = src.alias(salias)
    src = src.persist()
    tag = "__mrg_action"
    try:
        tgt = lh.read_table(spark, table_dir)
        tgt_keys = tgt.select(*keys).distinct()
        branches = {
            "matched": src.join(tgt_keys, keys, "semi"),
            "not_matched": src.join(tgt_keys, keys, "anti"),
        }
        if any(k == "not_matched_by_source" for k, _c, _a in clauses):
            # full-sync branch: TARGET rows whose keys the source lacks.
            # Folding them into the batch as __deleted rows keeps the whole
            # statement ONE atomic copy-on-write commit (Delta semantics) —
            # at the price Delta also pays: every partition holding a
            # victim is rewritten. Conditions on this branch see TARGET
            # columns (the rows come from the snapshot read).
            branches["not_matched_by_source"] = tgt.join(
                src.select(*keys).distinct(), keys, "anti"
            )
        parts: list[DataFrame] = []
        for kind, cond, act in clauses:
            pool = branches[kind]
            if cond is not None:
                hit = pool.where(F.expr(cond))
                # NULL = false on BOTH sides: a row whose condition is NULL
                # neither takes this clause nor vanishes from later ones
                branches[kind] = pool.where(
                    ~F.coalesce(F.expr(cond), F.lit(False))
                )
            else:
                hit = pool
                branches[kind] = pool.limit(0)
            is_delete = act == "DELETE"
            parts.append(
                hit.withColumn(lh.DELETE_COL, F.lit(is_delete)).withColumn(
                    tag,
                    F.lit(
                        "inserted" if kind == "not_matched" else (
                            "deleted_by_source"
                            if kind == "not_matched_by_source"
                            else ("deleted" if is_delete else "updated")
                        )
                    ),
                )
            )
        updates = parts[0]
        for p in parts[1:]:
            # allowMissingColumns: the by-source branch carries the TABLE
            # schema, source parts carry the source schema — an additive
            # evolution between them NULL-fills; merge_cow's commit-time
            # schema enforcement still rejects true incompatibilities
            updates = updates.unionByName(p, allowMissingColumns=True)
        updates = updates.persist()
        counts = {
            r[0]: r[1]
            for r in updates.groupBy(tag).agg(F.count(F.lit(1))).collect()
        }
        rep = lh.merge_cow(spark, table_dir, updates.drop(tag), keys)
    finally:
        src.unpersist()
        try:
            updates.unpersist()
        except NameError:
            pass
    return spark.createDataFrame(
        [(rep["version"], rep["partitions_rewritten"],
          rep["partitions_carried"], counts.get("updated", 0),
          counts.get("deleted", 0), counts.get("inserted", 0),
          counts.get("deleted_by_source", 0))],
        "version INT, partitions_rewritten INT, partitions_carried INT, "
        "rows_updated BIGINT, rows_deleted BIGINT, rows_inserted BIGINT, "
        "rows_deleted_by_source BIGINT",
    )


def try_maintenance_sql(
    session: "SeccoSession", text: str
) -> DataFrame | None:
    """Dispatch a lakehouse maintenance statement; None if ``text`` is not
    one (the caller then proceeds with the ordinary rewrite chain). Every
    verb delegates to the Python operator — this is a parser, never a
    second implementation of the lifecycle semantics."""
    from seccosql_spark.operators import lakehouse as lh

    spark = session.spark
    s = text.strip().rstrip(";").strip()

    def _unwrap(body: str) -> str:
        """Strip ONE pair of enclosing parens only when they actually
        match each other — '(SELECT..) UNION ALL (SELECT..)' starts with
        '(' and ends with ')' without being parenthesized, and a naive
        strip would shear both subqueries."""
        body = body.strip().rstrip(";").strip()
        if body.startswith("(") and _matching_paren(body, 0) == len(body) - 1:
            return body[1:-1]
        return body

    m = _VACUUM_RE.match(s)
    if m:
        rep = lh.expire_versions(
            m["dir"], keep_last=int(m["keep"]) if m["keep"] else 1,
            dry_run=m["dry"] is not None,
        )
        # versions_* are COUNTS here; the Python expire_versions verb
        # returns LISTS under kept_versions/expired_versions — distinct
        # names so a caller porting between the surfaces cannot misread
        # the metric (ADVICE r15)
        return spark.createDataFrame(
            [(len(rep["kept_versions"]), len(rep["expired_versions"]),
              rep["files_deleted"], rep["files_live"], rep["tmps_swept"],
              bool(rep.get("dry_run", False)))],
            "versions_kept INT, versions_expired INT, files_deleted INT, "
            "files_live INT, tmps_swept INT, dry_run BOOLEAN",
        )
    m = _OPTIMIZE_RE.match(s)
    if m:
        sort_by = m["sort"]
        zorder = (
            [c.strip().strip("'\"`") for c in m["zorder"].split(",")]
            if m["zorder"] else None
        )
        clustered = sort_by is not None or zorder is not None
        if m["files"] and not clustered:
            # compact()'s unclustered branch always bin-packs one file per
            # partition; accepting TARGET here would silently drop the
            # user's explicit file-count directive (review r15)
            raise ValueError(
                "OPTIMIZE: TARGET n FILES requires SORT BY or ZORDER BY "
                "(unclustered compaction always bin-packs one file per "
                "partition)"
            )
        target = int(m["files"]) if m["files"] else (2 if clustered else 1)
        rep = lh.compact(
            spark, m["dir"], sort_by=sort_by, zorder_by=zorder,
            target_files=target, where=m["where"],
        )
        # partitions_pruned: multi-file partitions the WHERE predicate
        # deliberately left uncompacted (0 without a WHERE clause)
        return spark.createDataFrame(
            [(rep["version"], rep["partitions_compacted"],
              rep["partitions_carried"], rep.get("partitions_pruned", 0),
              len(rep["files"]))],
            "version INT, partitions_compacted INT, partitions_carried INT, "
            "partitions_pruned INT, files_live INT",
        )
    m = _RESTORE_RE.match(s)
    if m:
        # VERSION n | TAG name | TIMESTAMP '<iso>' — tag and timestamp
        # resolve to a version through the same read_tag/version_at verbs
        # LAKE('<dir>', <arg>) time travel uses, then one metadata-only
        # restore commit
        if m["v"] is not None:
            v = int(m["v"])
        elif m["name"] is not None:
            v = lh.read_tag(m["dir"], m["name"].strip("'"))
        else:
            v = lh.version_at(m["dir"], m["ts"])
        rep = lh.restore_table(spark, m["dir"], v)
        return spark.createDataFrame(
            [(rep["version"], rep["restored_from"], len(rep["files"]))],
            "version INT, restored_from INT, files_live INT",
        )
    m = _MERGE_RE.match(s)
    if m:
        # the USING body is a full dialect query (it may itself use LAKE
        # refs, QUALIFY, ...): recurse through the ordinary entry point;
        # rows flagged true in the __deleted column are CDC deletes,
        # exactly the Python verb's contract
        keys = [k.strip().strip("`") for k in m["keys"].split(",")]
        body = _unwrap(m["body"])
        rep = lh.merge_cow(
            spark, m["dir"], execute_query_sql(session, body), keys
        )
        return spark.createDataFrame(
            [(rep["version"], rep["partitions_rewritten"],
              rep["partitions_carried"])],
            "version INT, partitions_rewritten INT, partitions_carried INT",
        )
    out = _try_merge_clauses(session, s)
    if out is not None:
        return out
    m = _INSERT_RE.match(s)
    if m:
        # blind append (the cheap pure-insert path: no read, no anti-join,
        # one new file per touched partition); the body is a full dialect
        # query, same recursion as MERGE's USING
        body = _unwrap(m["body"])
        rep = lh.append_commit(
            spark, m["dir"], execute_query_sql(session, body)
        )
        return spark.createDataFrame(
            [(rep["version"], rep["appended_files"])],
            "version INT, files_appended INT",
        )
    m = _DELETE_RE.match(s)
    if m:
        # merge-on-read equality delete: the matching keys are computed
        # from the HEAD snapshot and land as one small key file — no data
        # file is read back or rewritten by the commit itself. The WHERE
        # predicate is evaluated through a rewritten dialect SELECT, not
        # DataFrame.where, so all three DML verbs accept the same body
        # language — subqueries, LAKE refs, QUALIFY all work here exactly
        # as they do in MERGE USING / INSERT bodies (ADVICE r15).
        keys = [k.strip().strip("`") for k in m["keys"].split(",")]
        pred = m["pred"].strip().rstrip(";")
        dels = (
            execute_query_sql(
                session,
                f"SELECT * FROM LAKE('{m['dir']}') WHERE {pred}",
            )
            .select(*keys).distinct()
            .persist()
        )
        try:
            n_keys = dels.count()
            if n_keys == 0:
                # Delta's DELETE with zero matches lands no artifact: an
                # empty delete file would be carried into every later
                # manifest and cost a pointless anti-join per read forever
                # (review r15)
                return spark.createDataFrame(
                    [(lh.latest_version(m["dir"]), 0, 0)],
                    "version INT, delete_files_added INT, delete_keys BIGINT",
                )
            rep = lh.delete_commit(
                spark, m["dir"], dels, keys, assume_distinct=True
            )
        finally:
            dels.unpersist()
        # operation metrics describe THIS operation (one key file), never
        # the table's cumulative delete-file count (review r15)
        return spark.createDataFrame(
            [(rep["version"], 1, n_keys)],
            "version INT, delete_files_added INT, delete_keys BIGINT",
        )
    m = _CREATE_TAG_RE.match(s)
    if m:
        doc = lh.create_tag(
            m["dir"], m["name"].strip("'"),
            version=int(m["v"]) if m["v"] else None,
            replace=bool(m["replace"]),
        )
        return spark.createDataFrame(
            [(doc["name"], doc["version"])], "name STRING, version INT"
        )
    m = _DROP_TAG_RE.match(s)
    if m:
        name = m["name"].strip("'")
        lh.drop_tag(m["dir"], name)
        return spark.createDataFrame([(name, True)],
                                     "name STRING, dropped BOOLEAN")
    m = _SHOW_TAGS_RE.match(s)
    if m:
        tags = sorted(lh.list_tags(m["dir"]).items())
        return spark.createDataFrame(tags or [], "name STRING, version INT")
    m = _HISTORY_RE.match(s)
    if m:
        return lh.table_history(spark, m["dir"])
    m = _DETAIL_RE.match(s)
    if m:
        return lh.table_detail(spark, m["dir"])
    m = _SHOW_PARTS_RE.match(s)
    if m:
        return lh.table_partitions(spark, m["dir"])
    m = _ADD_CONSTRAINT_RE.match(s)
    if m:
        rep = lh.add_constraint(spark, m["dir"], m["name"], m["expr"].strip())
        return spark.createDataFrame(
            [(m["name"], rep["constraints"][m["name"]], rep["version"])],
            "name STRING, check_expr STRING, version INT",
        )
    m = _DROP_CONSTRAINT_RE.match(s)
    if m:
        rep = lh.drop_constraint(m["dir"], m["name"])
        return spark.createDataFrame(
            [(m["name"], True, rep["version"])],
            "name STRING, dropped BOOLEAN, version INT",
        )
    m = _ADD_COLUMN_RE.match(s)
    if m:
        rep = lh.add_column(m["dir"], m["name"], m["type"])
        return spark.createDataFrame(
            [(m["name"], m["type"], rep["version"])],
            "name STRING, col_type STRING, version INT",
        )
    m = _SHOW_CONSTRAINTS_RE.match(s)
    if m:
        cons = sorted(lh.list_constraints(m["dir"]).items())
        return spark.createDataFrame(cons or [], "name STRING, check_expr STRING")
    # Near-miss guard (ADVICE r15): a statement that unambiguously *starts*
    # like a maintenance verb but fails the grammar (wrong quote style,
    # dangling clause) used to fall through to Spark's parser, which has no
    # such statement and raises an opaque ParseException. The listed
    # prefixes have no Spark-SQL meaning — VACUUM/OPTIMIZE/RESTORE/tag DDL/
    # DESCRIBE HISTORY don't exist there, and MERGE/DELETE/INSERT over a
    # LAKE(...) target could only ever reach a read-only temp view — so a
    # targeted dialect error is strictly better than the fall-through.
    if re.match(
        r"^(?:VACUUM|OPTIMIZE|RESTORE|DESCRIBE\s+(?:HISTORY|DETAIL)|"
        r"CREATE\s+(?:OR\s+REPLACE\s+)?TAG|DROP\s+TAG|SHOW\s+TAGS|"
        # SHOW PARTITIONS <catalog-table> is valid Spark SQL — only the
        # LAKE() form is ours to reject
        r"SHOW\s+PARTITIONS\s+LAKE\s*\(|SHOW\s+CONSTRAINTS|"
        # ALTER TABLE <catalog-table> is valid Spark SQL — only LAKE() ours
        r"ALTER\s+LAKE\s*\(|"
        r"(?:MERGE\s+INTO|DELETE\s+FROM|INSERT\s+INTO)\s+LAKE\s*\()",
        s, re.I,
    ):
        raise ValueError(
            f"malformed lakehouse maintenance statement: {s[:120]!r} — "
            "expected one of: VACUUM LAKE('<dir>') [KEEP n] [DRY RUN] | "
            "OPTIMIZE LAKE('<dir>') [SORT BY col | ZORDER BY (cols)] "
            "[TARGET n FILES] [WHERE <partition-pred>] | "
            "RESTORE LAKE('<dir>') TO VERSION n | TO TAG t | "
            "TO TIMESTAMP '<iso>' | "
            "CREATE [OR REPLACE] TAG name ON LAKE('<dir>') [AS OF VERSION n] | "
            "DROP TAG name ON LAKE('<dir>') | SHOW TAGS ON LAKE('<dir>') | "
            "SHOW PARTITIONS LAKE('<dir>') | "
            "SHOW CONSTRAINTS ON LAKE('<dir>') | "
            "ALTER LAKE('<dir>') ADD CONSTRAINT n CHECK (<expr>) | "
            "ALTER LAKE('<dir>') DROP CONSTRAINT n | "
            "ALTER LAKE('<dir>') ADD COLUMN name <ddl-type> | "
            "DESCRIBE HISTORY|DETAIL LAKE('<dir>') | "
            "MERGE INTO LAKE('<dir>') KEYS (k,..) USING <query> | "
            "MERGE INTO LAKE('<dir>') USING <query> ON <eq-cond> "
            "WHEN [NOT] MATCHED [BY SOURCE] [AND c] THEN ... | "
            "DELETE FROM LAKE('<dir>') KEYS (k,..) WHERE <pred> | "
            "INSERT INTO LAKE('<dir>') <query>"
        )
    return None


# -------------------------------------------------------------- entry point

def execute_dialect_sql(session: "SeccoSession", text: str) -> DataFrame:
    maint = try_maintenance_sql(session, text)
    if maint is not None:
        return maint
    return execute_query_sql(session, text)


def execute_query_sql(session: "SeccoSession", text: str) -> DataFrame:
    """The QUERY half of the dialect — every rewrite except the
    maintenance-statement dispatch. MERGE USING / INSERT INTO bodies
    recurse through THIS entry point, never ``execute_dialect_sql``: a
    statement-shaped body (e.g. ``INSERT INTO LAKE('/a') VACUUM
    LAKE('/b') KEEP 1``) must fail Spark's parser loudly, not execute an
    irreversible lifecycle mutation on /b before the outer verb's own
    validation rejects the metrics relation (review r15)."""
    text = rewrite_union_by_update(text)
    match_views: list[str] = []
    try:
        if _MATCH_RE.search(text):
            text = rewrite_match(session, text, match_views)
        if _LAKE_CHANGES_RE.search(text):
            text = rewrite_lake_changes(session, text, match_views)
        if _LAKE_RE.search(text):
            text = rewrite_lake(session, text, match_views)
        if _WITH_REC_RE.match(text):
            return run_with_recursive(session, text)
        return session.spark.sql(rewrite_qualify(text))
    finally:
        for view in match_views:
            session.spark.catalog.dropTempView(view)
