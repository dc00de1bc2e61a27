#!/usr/bin/env python3
"""8c-vs-32c scaling probe for individual queries (VERDICT r16 task 4 gate:
curation 8c/32c ratio >= 0.9 after the pack fan-out fix).

Alternates WHOLE SESSIONS (32c, 8c, 32c, 8c, ...) so an ambient burst
cannot land on only one arm's single block; per-arm medians are taken
across session rounds. Session startup is excluded (per-query timing only,
after warmup inside each session).

Usage: python scripts/r17_scaling.py <query> [rounds=2] [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"r17_scaling_{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    name = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    times: dict[int, list[float]] = {32: [], 8: []}
    for rnd in range(rounds):
        for cpus in (32, 8):
            spark = session(cpus)
            spark.sparkContext.setLogLevel("ERROR")
            from seccosql_spark import registry as reg

            reg._SESSION_CACHE.clear()  # fresh session object per JVM restart
            run = reg.run
            run(name, spark, SF_DIR).count()  # warmup
            run(name, spark, SF_DIR).count()
            for _ in range(reps):
                t0 = time.perf_counter()
                n = run(name, spark, SF_DIR).count()
                dt = time.perf_counter() - t0
                times[cpus].append(dt)
                print(f"round {rnd} cpus={cpus}: {dt:.3f}s rows={n}", flush=True)
            spark.catalog.clearCache()
            spark.stop()
    med = {}
    for cpus, ts in times.items():
        ts = sorted(ts)
        med[cpus] = ts[len(ts) // 2]
        print(f"cpus={cpus}: median={med[cpus]:.3f} all={['%.3f' % t for t in ts]}")
    print(f"scaling ratio (8c/32c, >1 = 32c faster): {med[8] / med[32]:.2f}")


if __name__ == "__main__":
    main()
