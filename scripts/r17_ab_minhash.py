#!/usr/bin/env python3
"""Interleaved A/B for VERDICT r16 task 2: did ae66451's `__t` token-array
projection make dedup_minhash_lsh slower at sf0.1 (driver: 0.847 -> 1.368 s),
or was the driver's number ambient contention?

Two variants of the minhash pipeline, identical except for the feature
construction the commit changed:

  old: feats built from the INLINE filter(split(text)) expression
       (pre-ae66451 — O(tokens^2) re-tokenization inside the shingle lambda)
  new: feats built over the materialized `__t` token projection (HEAD)

Run ALTERNATED per rep in ONE session (old,new,old,new,...) so host
contention bursts land on both arms equally — the only before/after
methodology this container's 2-4 min invisible bursts permit (see
OPTIMIZATION_r16.md "Methodology"). Result equality is asserted on the
first rep pair.

Usage: python scripts/r17_ab_minhash.py [reps=6]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import SF_DIR, build_session  # noqa: E402
from seccosql_spark.operators.dedup import (  # noqa: E402
    MINHASH_COEFFS,
    _hex_to_long,
    _perm,
    _spread,
    _stream_pairs,
    _tracked_persist,
    lsh_bands,
    lsh_buckets,
    release_caches,
)


def minhash_variant(df, *, projected_tokens: bool, threshold=0.5, num_hashes=8,
                    band_size=4, id_col="doc_id", text_col="text", shingle_n=3):
    """minhash_near_dups with the feats construction switched between the
    pre-ae66451 inline expression and the HEAD `__t` projection. Everything
    else is byte-for-byte the HEAD pipeline."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    src = df.filter(F.size(toks) >= shingle_n)

    def feat_of(tok_col):
        n = shingle_n
        gram = F.transform(
            F.sequence(F.lit(1), F.size(tok_col) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(tok_col, i + k) for k in range(n)]),
        )
        return F.array_distinct(
            F.when(F.size(tok_col) >= n, gram).otherwise(F.array().cast("array<string>"))
        )

    if projected_tokens:  # HEAD shape
        base = _spread(src).select(F.col(id_col).alias("id"), toks.alias("__t")).select(
            "id", feat_of(F.col("__t")).alias("feats")
        )
    else:  # pre-ae66451 shape
        base = _spread(src).select(F.col(id_col).alias("id"), feat_of(toks).alias("feats"))

    hs = base.select(
        "id", F.transform(F.col("feats"), lambda s: _hex_to_long(F.md5(s))).alias("hs")
    )
    sig = hs.select(
        "id",
        *[
            F.array_min(F.transform(F.col("hs"), _perm(a, b))).alias(f"h{j}")
            for j, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
        ],
    )
    from seccosql_spark.operators.dedup import DEFAULT_MAX_BUCKET_SIZE

    buckets = _tracked_persist(
        lsh_buckets(lsh_bands(sig, band_size), DEFAULT_MAX_BUCKET_SIZE)
    )
    pairs = _stream_pairs(buckets)
    cand_ids = buckets.select(F.explode("ids").alias(id_col))
    if projected_tokens:
        feats_cand = _tracked_persist(
            src.join(F.broadcast(cand_ids), id_col, "left_semi")
            .select(F.col(id_col).alias("id"), toks.alias("__t"))
            .select("id", feat_of(F.col("__t")).alias("feats"))
        )
    else:
        feats_cand = _tracked_persist(
            src.join(F.broadcast(cand_ids), id_col, "left_semi").select(
                F.col(id_col).alias("id"), feat_of(toks).alias("feats")
            )
        )
    f1 = F.broadcast(feats_cand.select(F.col("id").alias("id1"), F.col("feats").alias("__f1")))
    f2 = F.broadcast(feats_cand.select(F.col("id").alias("id2"), F.col("feats").alias("__f2")))
    inter = F.size(F.array_intersect(F.col("__f1"), F.col("__f2")))
    return (
        pairs.join(f1, "id1")
        .join(f2, "id2")
        .select(
            "id1", "id2",
            (inter / (F.size("__f1") + F.size("__f2") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_session("r17_ab_minhash")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    spark.sparkContext.setJobDescription("r17 minhash A/B")

    # result equality first (and JIT warmup for both arms)
    old_rows = sorted(
        (r.id1, r.id2, round(r.jaccard, 9))
        for r in minhash_variant(docs, projected_tokens=False).collect()
    )
    release_caches(); spark.catalog.clearCache()
    new_rows = sorted(
        (r.id1, r.id2, round(r.jaccard, 9))
        for r in minhash_variant(docs, projected_tokens=True).collect()
    )
    release_caches(); spark.catalog.clearCache()
    assert old_rows == new_rows, (len(old_rows), len(new_rows))
    print(f"# result equality OK: {len(old_rows)} pairs identical", flush=True)

    times: dict[str, list[float]] = {"old": [], "new": []}
    for rep in range(reps):
        for tag, proj in (("old", False), ("new", True)):
            la = os.getloadavg()[0]
            t0 = time.perf_counter()
            n = minhash_variant(docs, projected_tokens=proj).count()
            dt = time.perf_counter() - t0
            release_caches(); spark.catalog.clearCache()
            times[tag].append(dt)
            print(f"rep {rep} {tag}: {dt:.3f}s rows={n} load={la:.1f}", flush=True)
    for tag in ("old", "new"):
        ts = sorted(times[tag])
        print(f"{tag}: median={ts[len(ts)//2]:.3f} all={['%.3f' % t for t in times[tag]]}")
    spark.stop()


if __name__ == "__main__":
    main()
