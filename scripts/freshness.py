"""Mechanical driver-row freshness ledger (VERDICT r05 task 8; per-query
dependency granularity per VERDICT r10 task 4).

Joins the per-round CORRECTNESS_r*.json driver results against `git log`
PER DEPENDENCY BLOCK and emits, for every registered query:

    name, latest green driver round, implementing file,
    last-commit time of its dependency cone, STALE flag

A query's dependency cone is computed by AST closure: its function block,
every transitively-referenced top-level name (oracle constants, operator
helpers — across modules through the import map), class headers plus only
the attribute-referenced methods of referenced classes, each timed by
``git log -L`` on its own line range. So an edit to one query in a
2000-line registration file, or to an unreferenced helper in a shared
module, taints only the rows whose cone the edit intersects — previously
one text_stats.py edit tainted dozens of rows at file granularity.

A query is STALE when its latest green driver row predates the last commit
touching its dependency cone (the row proved an older implementation),
or when it has no driver row at all. The suggested 50-slot priority window
is: never-verified first, then stale-behind-change, then oldest-round
first — exactly the rotation discipline VERDICT rounds 4-6 hand-curated.

Usage:  python scripts/freshness.py [--window]
    --window prints only the suggested 50 names (paste into
    registry._PRIORITY_WINDOW).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# Files the DRIVER writes after the builder's final commit each round.
# The freshness gates must be computed "as of" the builder's last real
# commit: the driver dropping CORRECTNESS_r{N}.json at round end shifts
# max_round / latest_run and redded the (green-at-commit-time) suite at
# judge time two rounds running (VERDICT r12 "What's wrong" 1). Ledger
# state therefore ignores any CORRECTNESS file newer than the newest
# commit touching a NON-artifact file.
DRIVER_ARTIFACT_EXCLUDES = [
    ":(exclude)CORRECTNESS_r*.json",
    ":(exclude)BENCH_r*.json",
    ":(exclude)BENCH_RAW.json",
    ":(exclude)VERDICT.md",
    ":(exclude)ADVICE.md",
    ":(exclude)COPYCHECK.json",
    ":(exclude)LEAKCHECK.json",
]


def builder_anchor_time() -> int:
    """Commit time of the newest commit touching any non-driver-artifact
    file — the builder's last real commit. CORRECTNESS files committed or
    dropped after this moment did not exist when the window/histogram were
    last synced and are excluded from the ledger, so a post-commit driver
    drop cannot redden the gates. The builder's first commit of the next
    round moves the anchor forward, which re-admits the new round file —
    exactly when the resync discipline applies again."""
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", ".", *DRIVER_ARTIFACT_EXCLUDES],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    return int(out) if out else 0


def correctness_rounds(allowed: set[int] | None = None) -> dict[str, int]:
    """query name -> latest round with a fully-green driver row.

    ``allowed`` restricts to a set of round numbers (the as-of filter)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        if allowed is not None and rnd not in allowed:
            continue
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and not row.get("err")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def round_commit_times() -> dict[int, int]:
    """round -> commit time of its CORRECTNESS file (when the driver ran)."""
    out: dict[int, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        ts = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", os.path.relpath(path, REPO)],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.strip()
        # A just-written, not-yet-committed round file must not date its
        # round as 0 — that marks the entire freshly-verified window stale
        # and the --window generator would re-burn 50 slots on rows proven
        # minutes ago (VERDICT r07 "What's wrong" 3). Fall back to mtime.
        out[rnd] = int(ts) if ts else int(os.path.getmtime(path))
    return out


def file_commit_time(relpath: str, cache: dict[str, int]) -> int:
    if relpath not in cache:
        ts = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", relpath],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.strip()
        cache[relpath] = int(ts) if ts else 0
    return cache[relpath]


def _module_imports(
    relpath: str, cache: dict[str, dict[str, tuple[str, str | None]]]
) -> dict[str, tuple[str, str | None]]:
    """imported-name -> (seccosql module file, name inside that module or
    None for a whole-module import), from every ``from seccosql_spark.x
    import a, b`` in the module (function-body imports included — a name
    only matters if a tracked block also references it)."""
    import ast

    if relpath in cache:
        return cache[relpath]
    tree = ast.parse(open(os.path.join(REPO, relpath)).read())
    out: dict[str, tuple[str, str | None]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and (node.module or "").startswith(
            "seccosql_spark"
        ):
            base = os.path.join(*node.module.split("."))
            for alias in node.names:
                bound = alias.asname or alias.name
                if os.path.exists(os.path.join(REPO, base + ".py")):
                    out[bound] = (base + ".py", alias.name)
                else:
                    # `from seccosql_spark.pkg import module` — the bound
                    # name IS a module; dep at whole-file granularity
                    cand = os.path.join(base, alias.name) + ".py"
                    if os.path.exists(os.path.join(REPO, cand)):
                        out[bound] = (cand, None)
    cache[relpath] = out
    return out


def _refs_attrs(node) -> tuple[frozenset, frozenset]:
    import ast

    names = frozenset(n.id for n in ast.walk(node) if isinstance(n, ast.Name))
    attrs = frozenset(
        n.attr for n in ast.walk(node) if isinstance(n, ast.Attribute)
    )
    return names, attrs


def _module_index(
    relpath: str, cache: dict
) -> tuple[dict[str, tuple[int, int, frozenset, frozenset]], dict[str, set[str]]]:
    """AST index of a module: (blocks, classes).

    blocks: name -> (start_line, end_line, referenced identifiers,
    referenced attribute names). Top-level functions and assignments are
    one block each (decorators included — a ``@register(..., ORACLE)``
    edit must taint the query; f-string interpolations surface as Name
    nodes, so SQL built from CTE constants tracks its pieces). A CLASS
    contributes a header block (decorators, bases, class-level assigns —
    NOT method bodies) plus one ``Class.method`` block per method:
    treating a class as a single block would put every method edit in
    every referencing query's taint cone (the SeccoSession/SeccoDataFrame
    cone covers the whole engine), reverting to the file-granularity this
    rewrite removes. Methods join the closure only when a visited block
    references their name as an attribute.

    classes: class name -> its method names."""
    import ast

    if relpath in cache:
        return cache[relpath]
    tree = ast.parse(open(os.path.join(REPO, relpath)).read())
    blocks: dict[str, tuple[tuple, frozenset, frozenset]] = {}
    classes: dict[str, set[str]] = {}
    for node in tree.body:
        if isinstance(node, ast.ClassDef):
            start = min([node.lineno] + [d.lineno for d in node.decorator_list])
            header_names: set[str] = set()
            header_attrs: set[str] = set()
            # the header is a LIST of small ranges (class line + each
            # non-method statement separately): class-level alias assigns
            # often sit BETWEEN methods, and a single spanning range would
            # cover those methods, re-coarsening the class to near-file
            # granularity
            header_ranges: list[tuple[int, int]] = [(start, node.lineno)]
            methods: set[str] = set()
            for b in node.body:
                if isinstance(b, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    m_start = min(
                        [b.lineno] + [d.lineno for d in b.decorator_list]
                    )
                    nr, na = _refs_attrs(b)
                    blocks[f"{node.name}.{b.name}"] = (
                        ((m_start, b.end_lineno or m_start),), nr, na,
                    )
                    methods.add(b.name)
                else:
                    nr, na = _refs_attrs(b)
                    header_names |= nr
                    header_attrs |= na
                    header_ranges.append((b.lineno, b.end_lineno or b.lineno))
            for d in node.decorator_list + list(node.bases):
                nr, na = _refs_attrs(d)
                header_names |= nr
                header_attrs |= na
            blocks[node.name] = (
                tuple(header_ranges),
                frozenset(header_names),
                frozenset(header_attrs),
            )
            classes[node.name] = methods
            continue
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            names = [node.name]
            start = min([node.lineno] + [d.lineno for d in node.decorator_list])
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            names = [t.id for t in targets if isinstance(t, ast.Name)]
            start = node.lineno
        elif isinstance(node, ast.Expr):
            # registration-by-call pattern (`_sql("query_name", SQL, doc)`):
            # the produced function's __name__ is patched to the literal
            # first argument, so index the call statement under that name —
            # otherwise every such query falls back to whole-file taint
            call = node.value
            if not (
                isinstance(call, ast.Call)
                and call.args
                and isinstance(call.args[0], ast.Constant)
                and isinstance(call.args[0].value, str)
            ):
                continue
            names = [call.args[0].value]
            start = node.lineno
        else:
            continue
        nr, na = _refs_attrs(node)
        for nm in names:
            blocks[nm] = (((start, node.end_lineno or start),), nr, na)
    # every module contributes an __imports__ pseudo-block covering its
    # top-level import statements: an import-only edit (rebinding a name to
    # a different implementation) changes every dependent query's behavior
    # without touching any indexed block — without this, such a commit
    # taints ZERO rows and the ledger reports them falsely fresh (r11
    # review finding). _query_blocks adds this block for every module its
    # cone touches.
    import_ranges = tuple(
        (node.lineno, node.end_lineno or node.lineno)
        for node in tree.body
        if isinstance(node, (ast.Import, ast.ImportFrom))
    )
    if import_ranges:
        blocks["__imports__"] = (import_ranges, frozenset(), frozenset())
    cache[relpath] = (blocks, classes)
    return cache[relpath]


class _DepCaches:
    """Shared parse/time caches for one ledger pass."""

    def __init__(self):
        self.imports: dict = {}
        self.index: dict = {}
        self.block_time: dict = {}
        self.file_time: dict = {}


def _query_blocks(
    fn, relpath: str, caches: _DepCaches
) -> tuple[set[tuple[str, str]], set[str]]:
    """The (module file, top-level name) blocks this query transitively
    depends on, plus modules depended on wholesale (``import module``
    bindings). Per-QUERY dependency granularity (VERDICT r10 task 4): an
    edit to an unrelated query in the same 2000-line registration file, or
    to an unreferenced helper in a shared operator module, no longer
    taints this row — only edits intersecting one of these blocks do.
    Closure is over top-level names: a referenced function's own
    references (helpers, oracle constants) are tracked recursively, across
    module boundaries through the import map."""
    # unwrap before reading __name__: register() wraps build fns
    # (lint-on-build), and the `_sql(...)` factories patch the ORIGINAL
    # function's __name__ to the query name AFTER registration — the
    # wrapper's copied name would be the factory-internal "_q"
    import inspect as _inspect

    fn_name = getattr(_inspect.unwrap(fn), "__name__", None)
    blocks: set[tuple[str, str]] = set()
    whole_files: set[str] = set()
    seen_attrs: set[str] = set()
    seen_classes: set[tuple[str, str]] = set()
    work = [(relpath, fn_name)]

    def _close_attrs() -> None:
        # a method joins the cone when (a) its class is referenced
        # somewhere in the cone and (b) some cone block calls its name as
        # an attribute — conservative on attr-name collisions (an edit to
        # SeccoDataFrame.distinct taints every query mentioning
        # `.distinct`), but an UNREFERENCED method edit taints nothing
        for mod, cls in list(seen_classes):
            _bl, classes = _module_index(mod, caches.index)
            for meth in classes.get(cls, ()) & seen_attrs:
                key = (mod, f"{cls}.{meth}")
                if key not in blocks:
                    work.append(key)

    while True:
        while work:
            mod, nm = work.pop()
            if nm is None:
                whole_files.add(mod)
                continue
            if (mod, nm) in blocks:
                continue
            idx, classes = _module_index(mod, caches.index)
            if nm not in idx:
                # un-indexable (built dynamically) — whole-file fallback
                whole_files.add(mod)
                continue
            blocks.add((mod, nm))
            if nm in classes:
                seen_classes.add((mod, nm))
            _ranges, refs, attrs = idx[nm]
            seen_attrs |= attrs
            imports = _module_imports(mod, caches.imports)
            for r in refs:
                if r == nm:
                    continue
                # (class names are also block-index keys, so `r in idx`
                # covers them — no separate class branch)
                if r in idx:
                    work.append((mod, r))
                elif r in imports:
                    work.append(imports[r])
        _close_attrs()
        if not work:
            break
    # import-statement edits must taint: add every touched module's
    # __imports__ pseudo-block (see _module_index)
    for mod in {m for m, _nm in blocks} | set(whole_files):
        idx, _cl = _module_index(mod, caches.index)
        if "__imports__" in idx:
            blocks.add((mod, "__imports__"))
    return blocks, whole_files


def _block_commit_time(relpath: str, start: int, end: int, caches: _DepCaches) -> int:
    """Last commit touching lines [start, end] of relpath, via ``git log
    -L`` range tracking. 0 when git can't track the range (callers fall
    back to whole-file time — a lone block must never read as fresh
    forever, ADVICE r06)."""
    key = (relpath, start, end)
    if key not in caches.block_time:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "-s",
             "-L", f"{start},{end}:{relpath}"],
            cwd=REPO, capture_output=True, text=True,
        )
        ts = out.stdout.strip().splitlines()
        caches.block_time[key] = int(ts[0]) if out.returncode == 0 and ts else 0
    return caches.block_time[key]


def _query_taint(fn, relpath: str, caches: _DepCaches) -> tuple[int, set[str]]:
    """(taint commit time, dep files) for one query: max last-commit time
    over its dependency blocks (block-granular) and wholesale modules
    (file-granular)."""
    blocks, whole_files = _query_blocks(fn, relpath, caches)
    ts = 0
    files = set(whole_files)
    for mod, nm in blocks:
        files.add(mod)
        ranges, _refs, _attrs = _module_index(mod, caches.index)[0][nm]
        for start, end in ranges:
            t = _block_commit_time(mod, start, end, caches) or file_commit_time(
                mod, caches.file_time
            )
            ts = max(ts, t)
    for mod in whole_files:
        ts = max(ts, file_commit_time(mod, caches.file_time))
    return ts, files


def queries_tainted_by(relpath: str, lines: set[int]) -> set[str]:
    """Registry queries whose dependency blocks intersect the given line
    numbers of ``relpath`` — the post-edit taint set. Exposed so the test
    can pin the r10-task-4 contract: an edit inside ONE query's block
    taints that query (and genuine sharers of the block), not every row
    registered in the file."""
    import inspect

    from seccosql_spark.registry import REGISTRY

    caches = _DepCaches()
    out = set()
    for name, spec in REGISTRY.items():
        fn = spec.build
        reg = os.path.relpath(inspect.getfile(inspect.unwrap(fn)), REPO)
        blocks, whole_files = _query_blocks(fn, reg, caches)
        if relpath in whole_files:
            out.add(name)
            continue
        for mod, nm in blocks:
            if mod != relpath:
                continue
            ranges, _refs, _attrs = _module_index(mod, caches.index)[0][nm]
            if any(s <= ln <= e for s, e in ranges for ln in lines):
                out.add(name)
                break
    return out


def ledger() -> list[dict]:
    import inspect

    from seccosql_spark.registry import REGISTRY

    # as-of filter: ignore CORRECTNESS files newer than the builder's last
    # non-artifact commit (see builder_anchor_time) so the driver's
    # post-commit artifact drop cannot shift the state the gates pin
    anchor = builder_anchor_time()
    round_ts = round_commit_times()
    if anchor:
        round_ts = {r: t for r, t in round_ts.items() if t <= anchor}
    rounds = correctness_rounds(allowed=set(round_ts))
    latest_run = max(round_ts.values(), default=0)
    max_round = max(round_ts, default=0)
    caches = _DepCaches()
    rows = []
    for name, spec in REGISTRY.items():
        fn = spec.build
        relpath = os.path.relpath(inspect.getfile(inspect.unwrap(fn)), REPO)
        # per-query dependency blocks (VERDICT r10 task 4): the query
        # function, every top-level name it transitively references
        # (oracle constants, operator helpers — across modules through the
        # import map), each timed by git log -L on its own line range.
        # Whole-file fallbacks only for module-object imports and blocks
        # -L can't track (a lone block must never read fresh forever).
        file_ts, _dep_set = _query_taint(fn, relpath, caches)
        rnd = rounds.get(name, 0)
        stale = rnd == 0 or file_ts > round_ts.get(rnd, 0)
        rows.append(
            {
                "name": name,
                "round": rnd,
                "file": relpath,
                "file_commit": file_ts,
                "round_commit": round_ts.get(rnd, 0),
                "stale": stale,
                # changed after the most recent driver run: this round's work,
                # whose green rows all prove superseded code — highest risk
                "hot": file_ts > latest_run,
                # driver row >= 4 rounds old: must not lose another window
                # slot to merely-hot rows (rounds 5-6 both let this slip;
                # VERDICT r06 task 1 made the full rotation a hard bar)
                "overdue": rnd != 0 and max_round - rnd >= 4,
            }
        )
    # tiers: never-verified, OVERDUE (driver row >= 4 rounds behind — these
    # outrank hot so the rotation ledger can always close), changed since
    # the last driver run, stale, then fresh; oldest round first within a
    # tier, name tie-break for determinism
    rows.sort(
        key=lambda r: (
            r["round"] != 0,
            not r["overdue"],
            not r["hot"],
            not r["stale"],
            r["round"],
            r["name"],
        )
    )
    return rows


def changed_query_names(include_stale: bool = True) -> set[str]:
    """Queries worth re-running locally (the `--changed-only` pytest mode,
    VERDICT r06 task 6): stale or hot per ledger(), PLUS any query whose dep
    files carry uncommitted working-tree edits — ledger() reads git history,
    which cannot see unstaged work-in-progress.

    ``include_stale=False`` narrows to hot-or-dirty only (changed since the
    latest driver run / uncommitted) — the basis of verify_queries.py
    ``--window`` (VERDICT r15 task 8): at ~300 registry rows a full sweep
    is the builder's wall-time bottleneck, and window + changed preserves
    the all-rows-eventually invariant because the full-registry pytest
    differential still covers every row each session."""
    import inspect

    from seccosql_spark.registry import REGISTRY

    names = {
        r["name"] for r in ledger()
        if r["hot"] or (include_stale and r["stale"])
    }
    dirty = set(
        subprocess.run(
            ["git", "diff", "--name-only", "HEAD"],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.split()
    )
    if dirty:
        caches = _DepCaches()
        for name, spec in REGISTRY.items():
            fn = spec.build
            relpath = os.path.relpath(inspect.getfile(inspect.unwrap(fn)), REPO)
            _blocks, files = _query_blocks(fn, relpath, caches)
            files = files | {mod for mod, _nm in _blocks}
            # uncommitted edits carry no per-line history to range-track;
            # dirty detection stays file-granular (conservative)
            if files & dirty:
                names.add(name)
    return names


def spillover_violations(window: list[str], rows: list[dict] | None = None) -> list[str]:
    """VERDICT r08 task 8: the window discipline as a mechanical check.

    A query is a MUST-row when it has never had a green driver row, or its
    latest green row is >= 4 rounds old (the ledger's never/overdue tiers).
    The priority window must contain the highest-priority MUST-rows: every
    MUST-row is either in the window, or outranked by enough other
    MUST-rows to fill every window slot. Returns the violating names
    (empty = compliant). Both tiers depend only on committed CORRECTNESS
    files and round numbers, so the check is stable across mid-round
    commits (the hot/stale tiers below them are not, and are deliberately
    not checked). ``rows`` lets a caller reuse an already-computed
    ledger."""
    rows = ledger() if rows is None else rows
    must = [r["name"] for r in rows if r["round"] == 0 or r["overdue"]]
    required = must[: len(window)]
    win = set(window)
    return [n for n in required if n not in win]


def edited_window_violations(
    window: list[str], rows: list[dict] | None = None
) -> list[str]:
    """VERDICT r11 task 3: every EDITED row must enter the next driver
    window. A row whose dependency blocks changed after the latest driver
    run ("hot") carries a green row that proves superseded code; it must be
    re-verified next round unless outranked by never-verified/overdue rows
    filling every slot. The check: the window must contain the generator-
    order top-`len(window)` of the never+overdue+hot tiers. Unlike
    spillover_violations this depends on COMMIT timestamps, so it can go
    red mid-round after an edit — by design: the fix is regenerating the
    window (scripts/freshness.py --window) in the same commit as the
    edit."""
    rows = ledger() if rows is None else rows
    must = [
        r["name"] for r in rows if r["round"] == 0 or r["overdue"] or r["hot"]
    ]
    required = must[: len(window)]
    win = set(window)
    return [n for n in required if n not in win]


def staleness_histogram(rows: list[dict] | None = None) -> list[tuple[str, int]]:
    """Rows bucketed by rounds-since-green (VERDICT r11 task 3): how long
    each registry row has gone without a driver re-verification. "never" =
    no green driver row yet. Depends only on committed CORRECTNESS files,
    so the table is stable within a round."""
    rows = ledger() if rows is None else rows
    max_round = max((r["round"] for r in rows), default=0)
    buckets: dict[str, int] = {}
    for r in rows:
        key = "never" if r["round"] == 0 else str(max_round - r["round"])
        buckets[key] = buckets.get(key, 0) + 1
    def _order(k: str):
        return (1, 0) if k == "never" else (0, int(k))
    return [(k, buckets[k]) for k in sorted(buckets, key=_order)]


HISTOGRAM_START = "<!-- freshness-histogram:start -->"
HISTOGRAM_END = "<!-- freshness-histogram:end -->"


def histogram_markdown(rows: list[dict] | None = None) -> str:
    """The COVERAGE.md freshness section, regenerated each round so the
    50-slot window rotation is auditable from the judged documents."""
    rows = ledger() if rows is None else rows
    hist = staleness_histogram(rows)
    max_round = max((r["round"] for r in rows), default=0)
    lines = [
        HISTOGRAM_START,
        f"Rows by rounds-since-green (driver round r{max_round:02d} = age 0; "
        f"{len(rows)} rows; regenerate: `python scripts/freshness.py "
        "--write-histogram`):",
        "",
        "| rounds since green | rows |",
        "|---|---|",
    ]
    for k, v in hist:
        lines.append(f"| {k} | {v} |")
    lines.append(HISTOGRAM_END)
    return "\n".join(lines)


def write_histogram(rows: list[dict] | None = None) -> None:
    cov = os.path.join(REPO, "COVERAGE.md")
    text = open(cov).read()
    section = histogram_markdown(rows)
    if HISTOGRAM_START in text:
        import re as _re

        pat = _re.escape(HISTOGRAM_START) + r".*?" + _re.escape(HISTOGRAM_END)
        text = _re.sub(pat, section, text, count=1, flags=_re.S)
    else:
        text = text.rstrip() + "\n\n## Freshness\n\n" + section + "\n"
    open(cov, "w").write(text)


def main() -> None:
    rows = ledger()
    if "--check" in sys.argv:
        from seccosql_spark.registry import _PRIORITY_WINDOW

        bad = spillover_violations(list(_PRIORITY_WINDOW), rows=rows)
        if bad:
            print("WINDOW SPILLOVER: must-rows missing from _PRIORITY_WINDOW:")
            for n in bad:
                print(f"  {n}")
            raise SystemExit(1)
        print("window covers all never-verified/overdue rows it can hold")
        return
    if "--window" in sys.argv:
        for r in rows[:50]:
            print(r["name"])
        return
    if "--write-histogram" in sys.argv:
        write_histogram(rows)
        print("COVERAGE.md freshness histogram refreshed")
        return
    n_stale = sum(r["stale"] for r in rows)
    print(f"# {len(rows)} queries, {n_stale} stale "
          f"(never-verified or driver row predates file change)\n")
    print(f"{'query':38} {'round':>5} {'stale':>5}  file")
    for r in rows:
        print(f"{r['name']:38} {r['round']:>5} {str(r['stale']):>5}  {r['file']}")


if __name__ == "__main__":
    main()
