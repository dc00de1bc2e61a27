#!/usr/bin/env python3
"""WCOJ decision-boundary benchmark: where does the hypercube+LeapFrog path
(`wcoj_natural_join`) beat the GHD binary-join chain?

The adversarial input is the reference's raison d'être for LeapFrog
(LeapFrogJoinExec.scala:88): a cyclic (triangle) query on a hub graph.
A hub node of degree H makes every binary-join plan materialize the H^2
2-paths through the hub before the closing edge prunes them; the
worst-case-optimal join enumerates bindings attribute-at-a-time and never
materializes that intermediate (AGM bound: output is O(E^{3/2})).

Run: python scripts/bench_wcoj_boundary.py [hub_degree ...]
Writes one JSON line per hub degree with both wall times; the companion
pytest (test_wcoj.py::test_wcoj_hub_graph_parity) pins result parity on
the same input. Results recorded in WCOJ_BOUNDARY.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def hub_edges(hub_degree: int, n_triangles: int = 50) -> list[tuple[int, int]]:
    """Hub node 0 with `hub_degree` out/in-neighbors (no triangles through
    the hub except via the closing set), plus a sprinkle of genuine disjoint
    triangles away from the hub so the output is non-empty."""
    edges = []
    for i in range(1, hub_degree + 1):
        edges.append((0, i))       # hub -> spoke
        edges.append((i, 0))       # spoke -> hub (so 2-paths through 0 explode)
    base = hub_degree + 10
    for t in range(n_triangles):
        a, b, c = base + 3 * t, base + 3 * t + 1, base + 3 * t + 2
        edges += [(a, b), (b, c), (c, a)]
    return edges


def main() -> None:
    degrees = [int(x) for x in sys.argv[1:]] or [500, 1000, 2000]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("wcoj_boundary")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from seccosql_spark.plans.ghd import multiway_natural_join
    from seccosql_spark.plans.wcoj import wcoj_natural_join

    for deg in degrees:
        edges = hub_edges(deg)
        e = spark.createDataFrame(edges, "src BIGINT, dst BIGINT").cache()
        e.count()
        r = e.select(e.src.alias("a"), e.dst.alias("b"))
        s = e.select(e.src.alias("b"), e.dst.alias("c"))
        t_ = e.select(e.src.alias("c"), e.dst.alias("a"))

        def timed(fn):
            # warm once, then best of 2 (JIT + steal-noise control)
            fn()
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn()
                times.append(time.perf_counter() - t0)
            return min(times), n

        ghd_t, ghd_n = timed(lambda: multiway_natural_join([r, s, t_], use_ghd=True).count())
        wcoj_t, wcoj_n = timed(lambda: wcoj_natural_join([r, s, t_]).count())
        assert ghd_n == wcoj_n, (ghd_n, wcoj_n)
        print(
            json.dumps(
                {
                    "hub_degree": deg,
                    "n_edges": len(edges),
                    "triangles": ghd_n,
                    "ghd_sec": round(ghd_t, 3),
                    "wcoj_sec": round(wcoj_t, 3),
                    "wcoj_wins": wcoj_t < ghd_t,
                }
            )
        )
        e.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
