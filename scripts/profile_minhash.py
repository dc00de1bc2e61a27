#!/usr/bin/env python3
"""Ad-hoc profiler for dedup_minhash_lsh: steady-state time + exchange count
at sf0.1. Not part of the bench; a scratch tool for plan iteration."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from seccosql_spark.registry import run

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master("local[32]")
    .appName("minhash_profile")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

name = sys.argv[1] if len(sys.argv) > 1 else "dedup_minhash_lsh"
df = run(name, spark, SF_DIR)
plan = df._jdf.queryExecution().executedPlan().toString()
print(f"# exchanges in executed plan: {plan.count('Exchange')}")
print(f"# broadcast exchanges: {plan.count('BroadcastExchange')}")
if os.environ.get("SHOW_PLAN"):
    df.explain("formatted")

times = []
for i in range(6):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = run(name, spark, SF_DIR).count()
    dt = time.perf_counter() - t0
    times.append(dt)
    print(f"# run {i}: {dt:.3f}s ({n} rows)")
print(f"# best-after-first: {min(times[1:]):.3f}s")
spark.stop()
