"""Mechanical driver-row freshness ledger (VERDICT r05 task 8).

Joins the per-round CORRECTNESS_r*.json driver results against `git log`
per implementing file and emits, for every registered query:

    name, latest green driver round, implementing file,
    last-commit time of that file, STALE flag

A query is STALE when its latest green driver row predates the last commit
touching its implementing file (the row proved an older implementation),
or when it has no driver row at all. The suggested 50-slot priority window
is: never-verified first, then stale-behind-file-change, then oldest-round
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


def correctness_rounds() -> dict[str, int]:
    """query name -> latest round with a fully-green driver row."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
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


def _module_imports(relpath: str, cache: dict[str, dict[str, str]]) -> dict[str, str]:
    """imported-name -> seccosql module file, from the module's top-level
    ``from seccosql_spark.x import a, b`` statements."""
    import ast

    if relpath in cache:
        return cache[relpath]
    tree = ast.parse(open(os.path.join(REPO, relpath)).read())
    out: dict[str, str] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and (node.module or "").startswith(
            "seccosql_spark"
        ):
            cand = os.path.join(*node.module.split(".")) + ".py"
            if os.path.exists(os.path.join(REPO, cand)):
                for alias in node.names:
                    out[alias.asname or alias.name] = cand
    cache[relpath] = out
    return out


def _dep_files(fn, relpath: str, icache: dict[str, dict[str, str]]) -> list[str]:
    """The registration file plus the seccosql modules the query FUNCTION
    actually touches: names it references that the module imported from a
    seccosql module, plus any seccosql import inside the function body. A
    query's driver row is only fresh if none of these changed after it ran."""
    import inspect

    deps = {relpath}
    src = inspect.getsource(fn)
    for name, dep in _module_imports(relpath, icache).items():
        if re.search(rf"\b{re.escape(name)}\b", src):
            deps.add(dep)
    for mod in re.findall(r"(?:from|import)\s+(seccosql_spark(?:\.\w+)*)", src):
        cand = os.path.join(*mod.split(".")) + ".py"
        if os.path.exists(os.path.join(REPO, cand)):
            deps.add(cand)
    return sorted(deps)


def _fn_commit_time(fn, relpath: str) -> int:
    """Last commit touching the FUNCTION's own source block (decorator
    included), via ``git log -L`` range tracking — so an additive edit
    elsewhere in a large registration file does not taint every query it
    registers. Falls back to the whole-file time if git can't track."""
    import inspect

    try:
        lines, start = inspect.getsourcelines(inspect.unwrap(fn))
    except OSError:
        return 0
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "-s",
         "-L", f"{start},{start + len(lines) - 1}:{relpath}"],
        cwd=REPO, capture_output=True, text=True,
    )
    ts = out.stdout.strip().splitlines()
    if out.returncode == 0 and ts:
        return int(ts[0])
    return 0


def ledger() -> list[dict]:
    import inspect

    from seccosql_spark.registry import REGISTRY

    rounds = correctness_rounds()
    round_ts = round_commit_times()
    latest_run = max(round_ts.values(), default=0)
    max_round = max(round_ts, default=0)
    fcache: dict[str, int] = {}
    icache: dict[str, dict[str, str]] = {}
    rows = []
    for name, spec in REGISTRY.items():
        fn = spec.build
        relpath = os.path.relpath(inspect.getfile(inspect.unwrap(fn)), REPO)
        # registration file counts at FUNCTION granularity (git log -L);
        # operator-module deps at file granularity (conservative). Caveat:
        # an edit to a module-level oracle constant alone is below -L's
        # resolution — oracle edits in practice ship with function edits.
        # `or` falls back to whole-file time when -L can't track the function
        # (returns 0) — otherwise a lone-registration-file query would be
        # reported fresh forever (ADVICE r06).
        file_ts = max(
            file_commit_time(dep, fcache)
            if dep != relpath
            else (_fn_commit_time(fn, dep) or file_commit_time(dep, fcache))
            for dep in _dep_files(fn, relpath, icache)
        )
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


def changed_query_names() -> set[str]:
    """Queries worth re-running locally (the `--changed-only` pytest mode,
    VERDICT r06 task 6): stale or hot per ledger(), PLUS any query whose dep
    files carry uncommitted working-tree edits — ledger() reads git history,
    which cannot see unstaged work-in-progress."""
    import inspect

    from seccosql_spark.registry import REGISTRY

    names = {r["name"] for r in ledger() if r["stale"] or r["hot"]}
    dirty = set(
        subprocess.run(
            ["git", "diff", "--name-only", "HEAD"],
            cwd=REPO, capture_output=True, text=True,
        ).stdout.split()
    )
    if dirty:
        icache: dict[str, dict[str, str]] = {}
        for name, spec in REGISTRY.items():
            fn = spec.build
            relpath = os.path.relpath(inspect.getfile(inspect.unwrap(fn)), REPO)
            if set(_dep_files(fn, relpath, icache)) & dirty:
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
    n_stale = sum(r["stale"] for r in rows)
    print(f"# {len(rows)} queries, {n_stale} stale "
          f"(never-verified or driver row predates file change)\n")
    print(f"{'query':38} {'round':>5} {'stale':>5}  file")
    for r in rows:
        print(f"{r['name']:38} {r['round']:>5} {str(r['stale']):>5}  {r['file']}")


if __name__ == "__main__":
    main()
