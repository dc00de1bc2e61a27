#!/usr/bin/env python3
"""Interleaved A/B for VERDICT r16 task 1: the size-gated materialization in
resample_gapfill / pattern(). Because the r17 gate is conf-driven
(spark.seccosql.materialize.minInputBytes), both arms run in ONE session:

  mat  : threshold 0   -> eager localCheckpoint (the r16 shape)
  lazy : threshold 1e18 -> lazy k-scan plan (the pre-r16 shape)

alternated per rep so this host's contention bursts land on both arms.
Result equality is asserted once per query up front.

Usage: python scripts/r17_ab_sizegate.py [reps=6] [names...]
(default names: timeseries_gapfill_hourly g_triangle_count)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, build_session  # noqa: E402
from seccosql_spark.plans.sizing import MAT_KEY  # noqa: E402
from seccosql_spark.registry import run  # noqa: E402

ARMS = (("mat", "0"), ("lazy", str(10**18)))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = int(args.pop(0)) if args and args[0].isdigit() else 6
    names = args or ["timeseries_gapfill_hourly", "g_triangle_count"]
    spark = build_session("r17_ab_sizegate")

    for name in names:
        rows: dict[str, list] = {}
        for tag, thr in ARMS:
            spark.conf.set(MAT_KEY, thr)
            rows[tag] = sorted(map(tuple, run(name, spark, SF_DIR).collect()))
            spark.catalog.clearCache()
        assert rows["mat"] == rows["lazy"], (name, len(rows["mat"]), len(rows["lazy"]))
        print(f"# {name}: result equality OK ({len(rows['mat'])} rows)", flush=True)

        times: dict[str, list[float]] = {t: [] for t, _ in ARMS}
        # one extra warmup pass per arm (JIT) before the alternated reps
        for tag, thr in ARMS:
            spark.conf.set(MAT_KEY, thr)
            run(name, spark, SF_DIR).count()
            spark.catalog.clearCache()
        for rep in range(reps):
            for tag, thr in ARMS:
                spark.conf.set(MAT_KEY, thr)
                la = os.getloadavg()[0]
                t0 = time.perf_counter()
                run(name, spark, SF_DIR).count()
                dt = time.perf_counter() - t0
                spark.catalog.clearCache()
                times[tag].append(dt)
                print(f"{name} rep {rep} {tag}: {dt:.3f}s load={la:.1f}", flush=True)
        for tag, _ in ARMS:
            ts = sorted(times[tag])
            print(
                f"{name} {tag}: median={ts[len(ts)//2]:.3f}"
                f" all={['%.3f' % t for t in times[tag]]}",
                flush=True,
            )
    spark.conf.unset(MAT_KEY)
    spark.stop()


if __name__ == "__main__":
    main()
