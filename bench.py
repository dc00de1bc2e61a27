#!/usr/bin/env python3
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan construction + execution to a count/
collect action). A warmup run of the flagship query absorbs JVM/codegen
startup so the numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from seccosql_spark.registry import REGISTRY, run  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("seccosql_spark_bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    headliners = [name for name, spec in REGISTRY.items() if spec.headline]

    # warmup: one untimed pass over every headliner — pays the per-query
    # whole-stage-codegen compilation (10s+ for the heavy array pipelines)
    # once, so the timed runs measure steady-state engine throughput
    for name in headliners:
        try:
            run(name, spark, SF_DIR).count()
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in headliners:
        # best-of-2: the VM's host contention adds multi-second noise;
        # min-of-repeats measures the engine, not the neighbors
        best, n = None, 0
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                df = run(name, spark, SF_DIR)
                n = df.count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as exc:  # one broken query must not zero the bench
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"# {name}: FAILED {failures[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if failures:
        result["failures"] = failures
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
