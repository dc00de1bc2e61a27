#!/usr/bin/env python3
"""Interleaved A/B + candidate-count instrumentation for the r17 ppjoin
positional-filter tightening (VERDICT r16 task 6).

Arms (identical prefix join, different pair-level pruning):
  old: r16 per-row positional filter (1 + min-suffix bound on EVERY shared
       token row, pair survives if any row passes) + distinct
  new: r17 aggregated bound via the LAST common prefix token:
       cnt + min(n1 - max rn1, n2 - max rn2) >= alpha  (HEAD)

Reports, per arm: candidate-pair count entering verification and the
end-to-end wall time of the full ppjoin_pairs pipeline (old arm re-created
inline). Run at sf0.1 and (with SPARK_GRAFT_SF_DIR) at sf1 for the slope
evidence. Result equality asserted on the first pair of runs.

Usage: python scripts/r17_ab_ppjoin.py [reps=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import SF_DIR, build_session  # noqa: E402
from seccosql_spark.operators.dedup import (  # noqa: E402
    ppjoin_pairs,
    shingles,
)


def old_candidates_and_pairs(df, threshold_num=1, threshold_den=2, shingle_n=3,
                             id_col="doc_id", text_col="text"):
    """The r16 shape, reproduced verbatim: per-row positional filter +
    distinct. Returns (candidate DataFrame, full verified pairs DataFrame)."""
    words = shingles(df, shingle_n, id_col, text_col).withColumnRenamed("s", "w")
    words = words.localCheckpoint(eager=True)
    dfreq = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    sized = words.join(F.broadcast(dfreq), "w").withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("id"))
    )
    ranked = sized.withColumn(
        "rn", F.row_number().over(Window.partitionBy("id").orderBy("c", "w"))
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("n")
        - F.expr(f"({threshold_num} * n + {threshold_den} - 1) DIV {threshold_den}")
        + 1
    )
    num, den = threshold_num, threshold_den
    cand = (
        prefix.select(F.col("id").alias("id1"), F.col("n").alias("n1"),
                      F.col("rn").alias("rn1"), "w")
        .join(prefix.select(F.col("id").alias("id2"), F.col("n").alias("n2"),
                            F.col("rn").alias("rn2"), "w"), "w")
        .filter(F.col("id1") < F.col("id2"))
        .filter(threshold_num * F.greatest("n1", "n2")
                <= threshold_den * F.least("n1", "n2"))
        .filter(
            F.lit(1) + F.least(F.col("n1") - F.col("rn1"), F.col("n2") - F.col("rn2"))
            >= F.expr(f"({num} * (n1 + n2) + {num + den - 1}) DIV {num + den}")
        )
        .select("id1", "id2")
        .distinct()
    )
    cand_ids = (cand.select(F.col("id1").alias("id"))
                .union(cand.select(F.col("id2").alias("id"))).distinct())
    sets = (words.join(cand_ids, "id", "left_semi")
            .groupBy("id").agg(F.collect_set("w").alias("ws")))
    pairs = (
        cand.join(sets.select(F.col("id").alias("id1"), F.col("ws").alias("ws1")), "id1")
        .join(sets.select(F.col("id").alias("id2"), F.col("ws").alias("ws2")), "id2")
        .withColumn("i", F.size(F.array_intersect("ws1", "ws2")))
        .withColumn("n1", F.size("ws1"))
        .withColumn("n2", F.size("ws2"))
        .filter(threshold_den * F.col("i")
                >= threshold_num * (F.col("n1") + F.col("n2") - F.col("i")))
        .select("id1", "id2",
                F.round(F.col("i") / (F.col("n1") + F.col("n2") - F.col("i")), 6)
                .alias("jaccard"))
    )
    return cand, pairs


def new_candidates(df, threshold_num=1, threshold_den=2, shingle_n=3,
                   id_col="doc_id", text_col="text"):
    """HEAD's candidate subplan only (for the count instrumentation) —
    everything up to the verification joins, matching ppjoin_pairs."""
    words = shingles(df, shingle_n, id_col, text_col).withColumnRenamed("s", "w")
    words = words.localCheckpoint(eager=True)
    dfreq = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    sized = words.join(F.broadcast(dfreq), "w").withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("id"))
    )
    ranked = sized.withColumn(
        "rn", F.row_number().over(Window.partitionBy("id").orderBy("c", "w"))
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("n")
        - F.expr(f"({threshold_num} * n + {threshold_den} - 1) DIV {threshold_den}")
        + 1
    )
    num, den = threshold_num, threshold_den
    return (
        prefix.select(F.col("id").alias("id1"), F.col("n").alias("n1"),
                      F.col("rn").alias("rn1"), "w")
        .join(prefix.select(F.col("id").alias("id2"), F.col("n").alias("n2"),
                            F.col("rn").alias("rn2"), "w"), "w")
        .filter(F.col("id1") < F.col("id2"))
        .filter(threshold_num * F.greatest("n1", "n2")
                <= threshold_den * F.least("n1", "n2"))
        .groupBy("id1", "id2", "n1", "n2")
        .agg(F.count(F.lit(1)).alias("__cnt"),
             F.max("rn1").alias("__mr1"), F.max("rn2").alias("__mr2"))
        .filter(
            F.col("__cnt")
            + F.least(F.col("n1") - F.col("__mr1"), F.col("n2") - F.col("__mr2"))
            >= F.expr(f"({num} * (n1 + n2) + {num + den - 1}) DIV {num + den}")
        )
        .select("id1", "id2")
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = build_session("r17_ab_ppjoin")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    spark.sparkContext.setJobDescription("r17 ppjoin A/B")

    # result equality (also warms both arms)
    _, old_pairs_df = old_candidates_and_pairs(docs)
    old_rows = sorted((r.id1, r.id2, r.jaccard) for r in old_pairs_df.collect())
    new_rows = sorted((r.id1, r.id2, r.jaccard) for r in ppjoin_pairs(docs).collect())
    assert old_rows == new_rows, (len(old_rows), len(new_rows))
    print(f"# result equality OK: {len(old_rows)} pairs identical", flush=True)

    # candidate counts (the VERDICT-requested stat)
    n_old = old_candidates_and_pairs(docs)[0].count()
    n_new = new_candidates(docs).count()
    print(f"# candidates entering verification: old={n_old} new={n_new} "
          f"({100.0 * (n_old - n_new) / max(1, n_old):.1f}% cut)", flush=True)

    times: dict[str, list[float]] = {"old": [], "new": []}
    for rep in range(reps):
        for tag in ("old", "new"):
            la = os.getloadavg()[0]
            t0 = time.perf_counter()
            if tag == "old":
                n = old_candidates_and_pairs(docs)[1].count()
            else:
                n = ppjoin_pairs(docs).count()
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f"rep {rep} {tag}: {dt:.3f}s rows={n} load={la:.1f}", flush=True)
    for tag in ("old", "new"):
        ts = sorted(times[tag])
        print(f"{tag}: median={ts[len(ts)//2]:.3f} all={['%.3f' % t for t in times[tag]]}")
    spark.stop()


if __name__ == "__main__":
    main()
