"""Multi-executor-JVM smoke (VERDICT r11 task 7): every other test runs on
``local[N]`` — one JVM, where a plan that accidentally depends on
single-process state (a driver-local temp file read by executors, a Python
global captured at closure time and mutated later, an artifact path visible
to the driver only) would still pass. ``local-cluster[2, 4, ...]`` launches
REAL separate executor JVMs with their own heaps, exercising serialization,
broadcast transport, and shuffle over the block manager — the minimal
approximation of a 1000-executor cluster this container can host.

Runs in a SUBPROCESS because a Python process owns at most one
SparkContext and the session-scoped ``local[*]`` fixture holds it.
Representative plan shapes (one per family): a shuffle aggregation, a
broadcast join, an Arrow mapInPandas kernel, and the lakehouse COW table
whose artifact directory must be executor-readable.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local-cluster[2, 4, 2048]")
        .appName("secco_multi_jvm_smoke")
        .config("spark.executor.memory", "2g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # prove we really have 2 executor JVMs (not the driver's local backend):
    # getExecutorMemoryStatus lists driver + each registered executor JVM
    import time
    n_jvms = 0
    for _ in range(60):
        n_jvms = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        if n_jvms >= 3:  # driver + 2 executors
            break
        time.sleep(1)
    assert n_jvms >= 3, f"only {{n_jvms}} JVMs registered"

    from seccosql_spark.registry import session_for
    sess = session_for(spark, {sf!r})

    # 1) shuffle aggregation across executor JVMs
    agg = (
        spark.table("lineitem").groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert sum(r.n for r in agg) == spark.table("lineitem").count()

    # 2) broadcast join: dim broadcast must serialize to remote executors
    j = (
        spark.table("orders").join(
            F.broadcast(spark.table("customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        ).count()
    )
    assert j > 0

    # 3) Arrow-batched Python on executors (the multimodal hot path)
    import pandas as pd

    def double_batch(it):
        for pdf in it:
            yield pd.DataFrame({{"v": pdf["o_orderkey"] * 2}})

    m = (
        spark.table("orders").select("o_orderkey")
        .mapInPandas(double_batch, "v long").agg(F.sum("v")).collect()[0][0]
    )
    expect = spark.table("orders").agg(
        F.sum(F.col("o_orderkey") * 2)).collect()[0][0]
    assert m == expect, (m, expect)

    # 4) lakehouse COW artifact: written by the driver, read back through
    # executor-side parquet scans pinned to manifest-listed files
    from seccosql_spark.registry import run
    rows = run("lakehouse_merge_cow", spark, {sf!r}).collect()
    assert len(rows) == 2 and all(r.n_rows > 0 for r in rows), rows

    # 5) merge-on-read deletes + stats skipping + change feed across real
    # executor JVMs: the delete-key broadcast and the pruned file set must
    # serialize to remote executors, not just the driver's local backend
    import tempfile
    from seccosql_spark.operators import lakehouse as lh

    d = tempfile.mkdtemp(prefix="secco_mjvm_lake_") + "/t"
    base = spark.createDataFrame(
        [(k, "ab"[k % 2], float(k)) for k in range(1, 9)],
        "k BIGINT, p STRING, v DOUBLE",
    )
    lh.create_table(base, d, "p")
    lh.delete_commit(spark, d, spark.createDataFrame([(3,), (4,)], "k BIGINT"), ["k"])
    got = sorted(r.k for r in lh.read_table(spark, d).collect())
    assert got == [1, 2, 5, 6, 7, 8], got
    sdf, audit = lh.scan_table(spark, d, "k", 5, 8)
    assert sorted(r.k for r in sdf.collect()) == [5, 6, 7, 8]
    ch = lh.table_changes(spark, d, 0, 1).collect()
    assert sorted((r._change_type, r.k) for r in ch) == [
        ("delete", 3), ("delete", 4),
    ], ch

    print("MULTI_JVM_SMOKE_OK")
    spark.stop()
    """
)


def test_multi_executor_jvm_smoke():
    sf = "/root/testdata/sf0.001"
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO, sf=sf)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert "MULTI_JVM_SMOKE_OK" in proc.stdout, (
        f"rc={proc.returncode}\nstdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-3000:]}"
    )
