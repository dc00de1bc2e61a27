#!/usr/bin/env python3
"""Per-phase breakdown of g_triangle_wcoj at the bench session config
(VERDICT r16 task 3 scoping): where do the ~0.9s go — the edge
materialization (scan+distinct+checkpoint), the hypercube shuffle, or the
per-cell Python LeapFrog?

Phases timed separately, interleaved across reps:
  A  edges: sql(EDGES_SPARSE) -> localCheckpoint(eager) + count
  B  full: wcoj_natural_join(...).agg(count) .count()
  B1 shuffle-only: the same hypercube union through groupBy(count) — no
     Python at all (the exchange + AQE floor)
  B2 arrow-noop: the same union through the OLD exchange+applyInPandas
     shape with a no-op cell (isolates Arrow/worker cost from LeapFrog)

Finding (r17): the off-Spark LeapFrog on the whole sf0.1 triangle cell is
~0.05s (cProfile: pandas merge constants); B ≈ B1 ≈ B2 after the
single-cell fast path landed — job/exchange overhead was the cost, not
Python compute.

Usage: python scripts/r17_wcoj_breakdown.py [reps=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import SF_DIR, build_session  # noqa: E402
from seccosql_spark.queries.graph import EDGES_SPARSE  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = build_session("r17_wcoj_breakdown")
    for t in ("lineitem",):
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).createOrReplaceTempView(t)

    from seccosql_spark.plans import wcoj as W

    def phase_a():
        t0 = time.perf_counter()
        e = spark.sql(EDGES_SPARSE).localCheckpoint(eager=True)
        m = e.count()
        return time.perf_counter() - t0, e, m

    def triangle(e, m, cell_override=None):
        r = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        s = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        t = e.select(F.col("src").alias("c"), F.col("dst").alias("a"))
        j = W.wcoj_natural_join([r, s, t], rel_sizes=[m, m, m])
        return j.agg(F.count(F.lit(1)).alias("n"))

    def shuffle_only(e, m):
        """Same hypercube union + exchange, no Python: groupBy(count)."""
        r = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        s = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        t = e.select(F.col("src").alias("c"), F.col("dst").alias("a"))
        union, _, _, _, _ = W.hypercube_union([r, s, t], rel_sizes=[m, m, m])
        return union.groupBy("__cell").agg(F.count(F.lit(1)))

    def arrow_noop(e, m):
        """Same union through applyInPandas with a no-op cell (pickled by
        value, so it really runs on the executors): isolates Arrow
        transport + Python worker cost from the LeapFrog compute."""
        r = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        s = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        t = e.select(F.col("src").alias("c"), F.col("dst").alias("a"))
        union, rel_cols, order, field_type, _shares = W.hypercube_union(
            [r, s, t], rel_sizes=[m, m, m]
        )
        from pyspark.sql import types as T

        schema = T.StructType([T.StructField(a, field_type[a]) for a in order])

        def cell(key, pdf):
            return pd.DataFrame({a: pd.Series(dtype="int64") for a in order})

        return union.groupBy("__cell").applyInPandas(cell, schema).agg(
            F.count(F.lit(1))
        )

    # warmup
    dt, e, m = phase_a()
    triangle(e, m).count()
    shuffle_only(e, m).count()
    arrow_noop(e, m).count()
    print(f"# edges m={m}", flush=True)

    times: dict[str, list[float]] = {
        "A_edges": [], "B_full": [], "B1_shuffle_only": [], "B2_arrow_noop": []
    }
    for rep in range(reps):
        dt, e, m = phase_a()
        times["A_edges"].append(dt)
        t0 = time.perf_counter()
        n = triangle(e, m).count()
        times["B_full"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        shuffle_only(e, m).count()
        times["B1_shuffle_only"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        arrow_noop(e, m).count()
        times["B2_arrow_noop"].append(time.perf_counter() - t0)
        print(f"rep {rep}: A={times['A_edges'][-1]:.3f} B={times['B_full'][-1]:.3f} "
              f"B1={times['B1_shuffle_only'][-1]:.3f} "
              f"B2={times['B2_arrow_noop'][-1]:.3f} (rows={n})", flush=True)
    for k, ts in times.items():
        ts = sorted(ts)
        print(f"{k}: median={ts[len(ts)//2]:.3f} all={['%.3f' % t for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
