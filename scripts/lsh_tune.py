"""Dev sweep: hyperplane-LSH recall@3 + candidate fraction vs config at a
given SF (VERDICT r05 task 6 — target recall@3 >= 0.9 at <= 20% candidate
fraction at sf0.01). Constants land in COVERAGE.md like WCOJ_BOUNDARY.md."""
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from seccosql_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    lsh_hyperplane_bands,
    lsh_topk,
)

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
n_corpus = emb.count()
queries = emb.filter("vec_id < 20").cache()
n_q = queries.count()
truth = {
    (r["query_id"], r["neighbor_id"])
    for r in cosine_topk(emb, queries, k=3).collect()
}
print(f"corpus={n_corpus} queries={n_q} truth={len(truth)}", file=sys.stderr)

configs = []
for planes, band in [(32, 4), (32, 8), (48, 8), (64, 8), (48, 6)]:
    for flips in [0, 1, 2, 3]:
        if flips <= band:
            configs.append((planes, band, flips))

for planes, band, flips in configs:
    cb = lsh_hyperplane_bands(emb, planes, band)
    qb = lsh_hyperplane_bands(queries, planes, band, probe_flips=flips)
    n_cand = (
        qb.withColumnRenamed("id", "query_id")
        .join(cb.withColumnRenamed("id", "neighbor_id"), ["band", "val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
        .count()
    )
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, k=3, planes=planes, band_size=band,
                          probe_flips=flips).collect()
    }
    recall = len(got & truth) / len(truth)
    frac = n_cand / (n_q * (n_corpus - 1))
    print(
        f"planes={planes:3d} band={band} flips={flips}  "
        f"recall@3={recall:.3f}  cand_frac={frac:.3f}"
    )
spark.stop()
