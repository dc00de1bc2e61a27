#!/usr/bin/env python3
"""Generic interleaved A/B of one registry query under two values of one
session conf — the only before/after methodology this host's invisible
contention bursts permit (variants alternate per rep inside ONE session;
result equality asserted up front).

Usage:
  python scripts/r17_ab_conf.py <query> <conf_key> <valueA> <valueB> [reps=6]
(valueB may be the literal UNSET to run arm B with the conf unset/default)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, build_session  # noqa: E402
from seccosql_spark.registry import run  # noqa: E402


def set_conf(spark, key: str, val: str) -> None:
    if val == "UNSET":
        try:
            spark.conf.unset(key)
        except Exception:
            pass
    else:
        spark.conf.set(key, val)


def main() -> None:
    name, key, va, vb = sys.argv[1:5]
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 6
    spark = build_session("r17_ab_conf")
    arms = (("A", va), ("B", vb))

    rows = {}
    for tag, val in arms:
        set_conf(spark, key, val)
        rows[tag] = sorted(map(tuple, run(name, spark, SF_DIR).collect()))
        spark.catalog.clearCache()
    assert rows["A"] == rows["B"], (len(rows["A"]), len(rows["B"]))
    print(f"# {name}: result equality OK ({len(rows['A'])} rows) "
          f"[A: {key}={va} | B: {key}={vb}]", flush=True)

    times = {t: [] for t, _ in arms}
    for tag, val in arms:  # one extra warmup per arm
        set_conf(spark, key, val)
        run(name, spark, SF_DIR).count()
        spark.catalog.clearCache()
    for rep in range(reps):
        for tag, val in arms:
            set_conf(spark, key, val)
            la = os.getloadavg()[0]
            t0 = time.perf_counter()
            run(name, spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            times[tag].append(dt)
            print(f"{name} rep {rep} {tag}: {dt:.3f}s load={la:.1f}", flush=True)
    for tag, val in arms:
        ts = sorted(times[tag])
        print(f"{name} {tag} ({key}={val}): median={ts[len(ts)//2]:.3f} "
              f"all={['%.3f' % t for t in times[tag]]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
