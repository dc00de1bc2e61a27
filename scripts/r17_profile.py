#!/usr/bin/env python3
"""Round-16 optimization measurement harness.

For each named query (default: all headliners), run it under a labeled job
group with the SAME session config as bench.py, capture:

  - `.explain("formatted")` into plans/r17/<query>_<tag>.txt
  - measured jobs/stages (status tracker) appended to the plan file
  - wall time of one post-warmup run (3-run median with bench.py's action)

Usage:
  python scripts/r17_profile.py --tag before [names...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, build_session  # noqa: E402
from seccosql_spark.registry import REGISTRY, run  # noqa: E402


def profile(spark, name: str, tag: str, out_dir: str, warmups: int = 2,
            timed: int = 3) -> dict:
    sc = spark.sparkContext
    for _ in range(warmups):
        run(name, spark, SF_DIR).count()
    group = f"r17_{name}"
    sc.setJobGroup(group, name, interruptOnCancel=False)
    times = []
    try:
        for _ in range(timed):
            t0 = time.perf_counter()
            df = run(name, spark, SF_DIR)
            n = df.count()
            times.append(time.perf_counter() - t0)
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    stages = set()
    for j in job_ids:
        info = tracker.getJobInfo(j)
        if info is not None:
            stages.update(info.stageIds)
    jobs = len(job_ids) // timed  # per run
    n_stages = len(stages) // timed
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    med = sorted(times)[len(times) // 2]
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(
            f"# {name} [{tag}] sf_dir={SF_DIR}\n"
            f"# median_sec={med:.3f} runs={['%.3f' % t for t in times]}"
            f" rows={n}\n"
            f"# measured per-run: jobs={jobs} stages~={n_stages}\n"
            f"# joins: broadcast={plan.count('BroadcastHashJoin')}"
            f" sort-merge={plan.count('SortMergeJoin')}"
            f" shuffled-hash={plan.count('ShuffledHashJoin')};"
            f" exchanges={plan.count('Exchange')} (text);"
            f" BatchEvalPython={plan.count('BatchEvalPython')}"
            f" ArrowEvalPython={plan.count('ArrowEvalPython')}\n\n"
        )
        f.write(plan)
    spark.catalog.clearCache()
    print(f"{name:32s} {med:7.3f}s  jobs={jobs:3d} stages~={n_stages:3d} -> {path}",
          flush=True)
    return {"name": name, "median": med, "jobs": jobs, "stages": n_stages}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument(
        "--conf", action="append", default=[],
        help="extra session conf key=value (e.g. the r17 materialization "
             "gate, to capture the pre-gate shape from gated code)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    names = args.names or [n for n, s in REGISTRY.items() if s.headline]
    spark = build_session("r17_profile")
    for kv in args.conf:
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
    results = []
    for name in names:
        results.append(profile(spark, name, args.tag, out_dir))
    total = sum(r["median"] for r in results)
    print(f"TOTAL {total:.3f}s over {len(results)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
