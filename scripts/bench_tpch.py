"""Full TPC-H-22 timing artifact (VERDICT r13 task 5): the per-round bench
regression surface was the pinned-8 + headliners; the other ~280 rows —
including all 22 TPC-H adaptations, the query class users actually run —
were correctness-checked every round but never TIMED, so a plan regression
in a q9/q18/q21-class query would have been invisible.

Writes TPCH_BENCH.json at the repo root: per-query medians at sf0.1 and
(when scripts/gen_sf1.py has produced it) the 10x sf1, with the same
measurement discipline as bench.py (shared session config, quiet-host
guard, warmups, median of 3 variance-extended to 7).

Round-over-round drift gate: when a previous TPCH_BENCH.json exists, each
query's new sf0.1 median is compared against it; ratios outside
[1/DRIFT_FACTOR, DRIFT_FACTOR] are recorded in `drift_flags` alongside the
previous value. `tests/test_plan_quality_all.py::test_tpch_bench_drift_flags
_are_triaged` fails the suite while a committed flag lacks a human triage
note in the file's `triage` map — a silent 2x TPC-H regression can no
longer ride along unexplained.

Usage:
    python scripts/bench_tpch.py            # measure, write TPCH_BENCH.json
    python scripts/bench_tpch.py --sf01-only   # skip the sf1 half
"""

from __future__ import annotations

import datetime
import json
import os
import re
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo-root bench.py: shared session + guards)
from seccosql_spark.registry import REGISTRY  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SECCO_SF1_DIR", "/tmp/secco_testdata_sf1")
WARMUPS = 2
DRIFT_FACTOR = 2.0
# Totals-level gate (VERDICT r15 task 2): the per-query 2x gate is blind to
# UNIFORM creep — r15 committed a ~1.3x ambient inflation on all 22 rows
# without a single flag. A >1.25x move of the sf0.1 TOTAL (either way)
# flags as '__total__' and needs a triage note like any other flag.
TOTAL_DRIFT_FACTOR = 1.25


def tpch_names() -> list[str]:
    return sorted(
        (n for n in REGISTRY if re.match(r"q\d+_", n)),
        key=lambda n: int(n[1:].split("_")[0]),
    )


def _median_time(name: str, spark, sf_dir: str) -> float:
    # the shared bench.py loop (review r14: one discipline, one
    # implementation — slope and TPC-H artifacts cannot drift from it)
    median, _n, _ext = bench.timed_median(name, spark, sf_dir, warmups=WARMUPS)
    return median


def compute_drift_flags(
    prev: dict | None, sf01_medians: dict[str, float]
) -> tuple[dict[str, dict], dict[str, str]]:
    """Round-over-round drift detection, extracted pure so the gate's
    compare logic is unit-testable without a Spark run: returns
    (drift_flags, carried_triage). A row flags when its new sf0.1 median
    falls outside [prev/DRIFT_FACTOR, prev*DRIFT_FACTOR]; the common-set
    TOTAL flags as '__total__' outside the tighter TOTAL_DRIFT_FACTOR
    (uniform ambient creep the per-query gate cannot see — VERDICT r15
    task 2); triage entries survive only while their row is still flagged
    (stale notes drop)."""
    drift_flags: dict[str, dict] = {}
    prev_medians = (prev or {}).get("medians", {}).get("sf0.1", {})
    for name, t in sf01_medians.items():
        p = prev_medians.get(name)
        if p and p > 0 and (t / p > DRIFT_FACTOR or t / p < 1 / DRIFT_FACTOR):
            drift_flags[name] = {"prev": p, "now": t, "ratio": round(t / p, 2)}
    # totals gate: compare over the COMMON query set so a newly added or
    # retired row can never fake (or mask) a totals move
    common = sorted(set(prev_medians) & set(sf01_medians))
    if common:
        pt = sum(prev_medians[n] for n in common)
        nt = sum(sf01_medians[n] for n in common)
        if pt > 0 and (
            nt / pt > TOTAL_DRIFT_FACTOR or nt / pt < 1 / TOTAL_DRIFT_FACTOR
        ):
            drift_flags["__total__"] = {
                "prev": round(pt, 3), "now": round(nt, 3),
                "ratio": round(nt / pt, 2), "common_queries": len(common),
            }
    triage = {
        k: v for k, v in (prev or {}).get("triage", {}).items()
        if k in drift_flags
    }
    return drift_flags, triage


def main() -> None:
    prev = None
    out_path = os.path.join(REPO, "TPCH_BENCH.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)

    spark = bench.build_session("seccosql_spark_tpch")
    sfs = [("sf0.1", SF01)]
    if "--sf01-only" not in sys.argv and os.path.exists(
        os.path.join(SF1, "_DONE")
    ):
        sfs.append(("sf1", SF1))

    medians: dict[str, dict[str, float]] = {}
    hosts: dict[str, dict] = {}
    for sf_name, sf_dir in sfs:
        medians[sf_name] = {}
        bench._wait_for_quiet_host()
        hosts[sf_name] = bench._host_snapshot()
        for name in tpch_names():
            t = _median_time(name, spark, sf_dir)
            medians[sf_name][name] = round(t, 3)
            print(f"# {sf_name} {name}: {t:.3f}s", file=sys.stderr)
        hosts[sf_name + "_after"] = bench._host_snapshot()

    drift_flags, carried_triage = compute_drift_flags(prev, medians["sf0.1"])

    doc = {
        "note": "TPC-H 22 per-query medians (same discipline as bench.py: "
                "quiet-host guard, 2 warmups, median of 3 variance-extended "
                "to 7); regenerate with `python scripts/bench_tpch.py`; "
                "drift_flags = sf0.1 rows outside 2x of the previously "
                "committed run and must each carry a `triage` entry",
        # self-reported measurement instant: bench.py folds totals into
        # the headline artifact and needs a staleness marker (ADVICE r14)
        "measured_at": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds"),
        "medians": medians,
        "totals": {
            sf: round(sum(v.values()), 3) for sf, v in medians.items()
        },
        "host": hosts,
        "drift_flags": drift_flags,
        # carry forward acknowledged-drift explanations for flagged rows;
        # stale entries (no longer flagged) are dropped
        "triage": carried_triage,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"totals": doc["totals"], "drift_flags": drift_flags}))
    spark.stop()


if __name__ == "__main__":
    main()
