"""Training-data pipeline queries (BASELINE.json north-star extension):
dedup, similarity search, text analysis, multimodal — over the `documents`
and `embeddings` tables.

Oracle discipline: every hash is md5 (identical hex in both engines), every
aggregate is integer/decimal, every division is int/int (deterministic IEEE),
similarities are rounded before ranking. The oracle SQL mirrors the Spark
plan shape step-for-step (words → signatures → bands → pairs → verify), so a
mismatch means a real bug, not engine drift.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from seccosql_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from seccosql_spark.operators.multimodal import (
    attach_payload,
)
from seccosql_spark.operators.similarity import cosine_topk, embedding_near_dups, ivf_topk, quantize_int8
from seccosql_spark.operators.text import (
    LANG_MARKERS,
    fingerprint,
    lang_guess,
    quality_score,
    token_stats,
)
from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession

WORDS_SQL = """
SELECT doc_id AS id,
       unnest(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS w
FROM documents
"""

# ------------------------------------------------------------------ dedup

@register(
    "dedup_exact",
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
       FROM documents GROUP BY md5(text)""",
    headline=True,
)
def dedup_exact(sess: SeccoSession):
    """Exact dedup: hash-groupBy, keep smallest id. One shuffle on md5."""
    return sess.from_spark(exact_dedup(sess.spark.table("documents")))


SHINGLES_SQL = """
SELECT id, unnest(list_distinct(list_transform(
         range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS w
FROM (SELECT doc_id AS id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents)
"""

def _h32_sql() -> str:
    from seccosql_spark.operators.hexint import hex_prefix_int_sql

    return hex_prefix_int_sql("md5(w)", 8)


def _minhash_oracle(words_sql: str, threshold: float, num_hashes: int = 8, band_size: int = 4) -> str:
    """Oracle twin of minhash_near_dups, generated from the SAME constants
    (operators.dedup.MINHASH_COEFFS/MINHASH_PRIME): one md5 per feature →
    32-bit int via digit arithmetic → per-seed affine min → bands → bucket
    pairs → exact jaccard."""
    from seccosql_spark.operators.dedup import MINHASH_COEFFS, MINHASH_PRIME

    seeds = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    )
    band_parts = " || '|' || ".join(
        f"max(CASE WHEN j % {band_size} = {i} THEN m END)" for i in range(band_size)
    )
    return f"""
WITH words AS ({words_sql}),
hs AS (SELECT id, CAST({_h32_sql()} AS BIGINT) AS h32 FROM words),
seeds AS (SELECT * FROM (VALUES {seeds}) t(j, a, b)),
mh AS (SELECT id, j, min((a * h32 + b) % {MINHASH_PRIME}) AS m
       FROM hs CROSS JOIN seeds GROUP BY id, j),
bands AS (
  SELECT id, CAST(j // {band_size} AS INT) AS band, {band_parts} AS sig
  FROM mh GROUP BY id, j // {band_size}
),
pairs AS (
  SELECT DISTINCT a.id AS id1, b.id AS id2
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id
),
sizes AS (SELECT id, count(*) AS n FROM words GROUP BY id),
inter AS (
  SELECT p.id1, p.id2, count(*) AS i
  FROM pairs p JOIN words w1 ON w1.id = p.id1
               JOIN words w2 ON w2.id = p.id2 AND w2.w = w1.w
  GROUP BY p.id1, p.id2
)
SELECT id1, id2, i / (s1.n + s2.n - i) AS jaccard
FROM inter JOIN sizes s1 ON id1 = s1.id JOIN sizes s2 ON id2 = s2.id
WHERE i / (s1.n + s2.n - i) >= {threshold}
"""


MINHASH_SHINGLE_ORACLE = _minhash_oracle(SHINGLES_SQL, threshold=0.5)


@register("dedup_minhash_lsh", MINHASH_SHINGLE_ORACLE, headline=True)
def dedup_minhash_lsh(sess: SeccoSession):
    """MinHash+LSH near-dup over 3-word shingles (the scale-correct feature:
    shingle entropy keeps LSH buckets small; word-level features on this
    corpus collapse every doc into a handful of buckets). 8 seeds, 2 bands
    of 4, exact-Jaccard verify at 0.5."""
    return sess.from_spark(
        minhash_near_dups(sess.spark.table("documents"), threshold=0.5, shingle_n=3)
    )


def _containment_oracle(shingles_sql: str, threshold: float) -> str:
    """Oracle twin of containment_pairs: shared-shingle candidate pairs
    (exhaustive — containment > 0 implies a shared shingle), then
    per-direction containment i/|S_A|, i/|S_B| with the keep rule on the
    larger direction."""
    return f"""
WITH words AS ({shingles_sql}),
pairs AS (
  SELECT DISTINCT w1.id AS id1, w2.id AS id2
  FROM words w1 JOIN words w2 ON w1.w = w2.w AND w1.id < w2.id
),
sizes AS (SELECT id, count(*) AS n FROM words GROUP BY id),
inter AS (
  SELECT p.id1, p.id2, count(*) AS i
  FROM pairs p JOIN words w1 ON w1.id = p.id1
               JOIN words w2 ON w2.id = p.id2 AND w2.w = w1.w
  GROUP BY p.id1, p.id2
)
SELECT id1, id2,
       round(i / s1.n, 6) AS containment12,
       round(i / s2.n, 6) AS containment21
FROM inter JOIN sizes s1 ON id1 = s1.id JOIN sizes s2 ON id2 = s2.id
WHERE greatest(i / s1.n, i / s2.n) >= {threshold}
"""


@register("dedup_containment", _containment_oracle(SHINGLES_SQL, threshold=0.5))
def dedup_containment(sess: SeccoSession):
    """Asymmetric (containment) near-dup pairs over 3-word shingles
    (operators.dedup.containment_pairs): |S_A ∩ S_B| / |S_A| per direction,
    kept when either direction >= 0.5 — the subset-duplicate detector
    symmetric Jaccard under-scores."""
    from seccosql_spark.operators.dedup import containment_pairs

    return sess.from_spark(
        containment_pairs(sess.spark.table("documents"), threshold=0.5)
    )


def _incremental_oracle(
    shingles_sql: str,
    threshold: float,
    split_id: int,
    num_hashes: int = 8,
    band_size: int = 4,
) -> str:
    """Oracle twin of minhash_incremental_pairs: the _minhash_oracle
    pipeline with the candidate join restricted to new (id >= split) x old
    (id < split) — per-doc signatures are independent, so signaturing the
    whole corpus then splitting at the pair stage is exactly equivalent to
    signaturing the two sides separately."""
    from seccosql_spark.operators.dedup import MINHASH_COEFFS, MINHASH_PRIME

    seeds = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    )
    band_parts = " || '|' || ".join(
        f"max(CASE WHEN j % {band_size} = {i} THEN m END)" for i in range(band_size)
    )
    return f"""
WITH words AS ({shingles_sql}),
hs AS (SELECT id, CAST({_h32_sql()} AS BIGINT) AS h32 FROM words),
seeds AS (SELECT * FROM (VALUES {seeds}) t(j, a, b)),
mh AS (SELECT id, j, min((a * h32 + b) % {MINHASH_PRIME}) AS m
       FROM hs CROSS JOIN seeds GROUP BY id, j),
bands AS (
  SELECT id, CAST(j // {band_size} AS INT) AS band, {band_parts} AS sig
  FROM mh GROUP BY id, j // {band_size}
),
pairs AS (
  SELECT DISTINCT a.id AS id1, b.id AS id2
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
  WHERE a.id >= {split_id} AND b.id < {split_id}
),
sizes AS (SELECT id, count(*) AS n FROM words GROUP BY id),
inter AS (
  SELECT p.id1, p.id2, count(*) AS i
  FROM pairs p JOIN words w1 ON w1.id = p.id1
               JOIN words w2 ON w2.id = p.id2 AND w2.w = w1.w
  GROUP BY p.id1, p.id2
)
SELECT id1 AS new_id, id2 AS old_id,
       round(i / (s1.n + s2.n - i), 6) AS jaccard
FROM inter JOIN sizes s1 ON id1 = s1.id JOIN sizes s2 ON id2 = s2.id
WHERE i / (s1.n + s2.n - i) >= {threshold}
"""


INCREMENTAL_SPLIT_ID = 400


@register(
    "dedup_incremental_batch",
    _incremental_oracle(SHINGLES_SQL, threshold=0.5, split_id=INCREMENTAL_SPLIT_ID),
)
def dedup_incremental_batch(sess: SeccoSession):
    """Incremental dedup of a NEW ingestion batch (doc_id >= 400) against
    the EXISTING corpus (doc_id < 400) only — new-new and old-old pairs
    excluded (operators.dedup.minhash_incremental_pairs). The old side's
    banded signatures are the persistable index; each nightly batch only
    signatures itself and probes the index buckets."""
    from seccosql_spark.operators.dedup import minhash_incremental_pairs

    docs = sess.spark.table("documents")
    return sess.from_spark(
        minhash_incremental_pairs(
            docs.filter(F.col("doc_id") >= INCREMENTAL_SPLIT_ID),
            docs.filter(F.col("doc_id") < INCREMENTAL_SPLIT_ID),
            threshold=0.5,
        )
    )


MINHASH_WORDS_ORACLE = _minhash_oracle(WORDS_SQL, threshold=0.9)


@register("dedup_minhash_words", MINHASH_WORDS_ORACLE)
def dedup_minhash_words(sess: SeccoSession):
    """Word-level MinHash+LSH variant (threshold 0.9). On this corpus word
    sets overlap heavily, so LSH buckets are large — correct but kept off the
    headline bench; the shingle variant above is the scale path."""
    return sess.from_spark(
        minhash_near_dups(sess.spark.table("documents"), threshold=0.9)
    )


NGRAM_ORACLE = """
WITH t AS (SELECT doc_id AS id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
sh AS (SELECT id, unnest(list_distinct(list_transform(
             range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
       FROM t),
sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (SELECT a.id AS id1, b.id AS id2, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
          GROUP BY a.id, b.id)
SELECT id1, id2, i / (s1.n + s2.n - i) AS jaccard
FROM inter JOIN sizes s1 ON id1 = s1.id JOIN sizes s2 ON id2 = s2.id
WHERE i / (s1.n + s2.n - i) >= 0.02
"""


@register("dedup_ngram_jaccard", NGRAM_ORACLE)
def dedup_ngram_jaccard(sess: SeccoSession):
    """Word-trigram Jaccard near-dup; candidates = pairs sharing a shingle."""
    return sess.from_spark(
        ngram_jaccard_pairs(sess.spark.table("documents"), n=3, threshold=0.02)
    )


SIMHASH_ORACLE = f"""
WITH words AS ({WORDS_SQL}),
h AS (SELECT id, CAST({_h32_sql()} AS BIGINT) AS h32 FROM words),
bits AS (SELECT id, b, CASE WHEN (h32 >> b) & 1 = 1 THEN 1 ELSE -1 END AS v
         FROM h CROSS JOIN (SELECT unnest(range(32)) AS b)),
votes AS (SELECT id, b, sum(v) AS s FROM bits GROUP BY id, b),
sh AS (SELECT id, CAST(sum(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                  AS BIGINT) AS simhash
       FROM votes GROUP BY id),
keyed AS (SELECT id, simhash, k, (simhash >> (k * 8)) & 255 AS byte
          FROM sh CROSS JOIN (SELECT unnest(range(4)) AS k)),
cand AS (SELECT DISTINCT a.id AS id1, b.id AS id2,
                bit_count(xor(a.simhash, b.simhash)) AS hamming
         FROM keyed a JOIN keyed b ON a.k = b.k AND a.byte = b.byte AND a.id < b.id)
SELECT id1, id2, CAST(hamming AS INT) AS hamming FROM cand WHERE hamming <= 3
"""


@register("dedup_simhash", SIMHASH_ORACLE)
def dedup_simhash(sess: SeccoSession):
    """SimHash near-dup: 32-bit md5-derived token hashes, majority vote,
    byte-bucket candidates (pigeonhole for hamming<=3), exact Hamming."""
    out = simhash_near_dups(sess.spark.table("documents"), max_hamming=3)
    return sess.from_spark(out.select("id1", "id2", F.col("hamming").cast("int").alias("hamming")))


# ------------------------------------------------------------- similarity

KNN_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
sims AS (SELECT query_id, neighbor_id,
                round(list_dot_product(qv, cv) /
                      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                      6) AS sim
         FROM q CROSS JOIN c WHERE query_id <> neighbor_id)
SELECT query_id, neighbor_id, rank, sim FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM sims
) WHERE rank <= 3
"""


@register("knn_cosine_bruteforce", KNN_ORACLE, headline=True)
def knn_cosine_bruteforce(sess: SeccoSession):
    """Brute-force cosine top-3 — the exact ANN baseline. Query set broadcast,
    corpus streamed; JVM-side fold, no Python in the hot path."""
    emb = sess.spark.table("embeddings")
    out = cosine_topk(emb, emb.filter("vec_id < 5"), k=3)
    return sess.from_spark(out.withColumn("rank", F.col("rank").cast("int")))


MATRYOSHKA_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
full_s AS (SELECT query_id, neighbor_id,
                  round(list_dot_product(qv, cv) /
                        (sqrt(list_dot_product(qv, qv)) *
                         sqrt(list_dot_product(cv, cv))), 6) AS sim
           FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
full_k AS (SELECT query_id, neighbor_id FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, neighbor_id) AS rn
             FROM full_s) WHERE rn <= 5),
pre_s AS (SELECT query_id, neighbor_id,
                 round(list_dot_product(qv[1:16], cv[1:16]) /
                       (sqrt(list_dot_product(qv[1:16], qv[1:16])) *
                        sqrt(list_dot_product(cv[1:16], cv[1:16]))), 6) AS sim
          FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
pre_r AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS rn
          FROM pre_s)
SELECT f.query_id,
       CAST(sum(CASE WHEN p.rn <= 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS hits_prefix_top5,
       CAST(sum(CASE WHEN p.rn <= 20 THEN 1 ELSE 0 END) AS BIGINT)
           AS hits_shortlist20
FROM full_k f LEFT JOIN pre_r p USING (query_id, neighbor_id)
GROUP BY f.query_id
"""


@register("ann_matryoshka_prefix", MATRYOSHKA_ORACLE)
def ann_matryoshka_prefix(sess: SeccoSession):
    """Matryoshka / adaptive retrieval (Kusupati et al. 2022): scan with a
    cheap 16-dim PREFIX of the 64-dim embedding, shortlist S=20, rerank
    the shortlist with the full vector — at 100 TB the prefix scan reads
    a quarter of the bytes (columnar layouts can store the prefix as its
    own column) and the full vectors are fetched for S rows per query,
    not the corpus. The row MEASURES what the truncation costs: per
    query, how many of the exact full-dim top-5 the prefix ranking keeps
    at cutoff 5 (pure prefix recall) and at cutoff 20 (what a rerank can
    recover — an exact-top-5 member in the shortlist always survives a
    full-dim rerank, because among any subset the true top-5 outrank
    everyone else). On the synthetic testdata the measured recall is LOW
    (0.12 prefix / 0.16 shortlist at sf0.1): these vectors are i.i.d.
    random, so every dim carries equal information and a 16-dim prefix
    keeps only 1/4 of it — the same distance-concentration honesty note
    as ann_ivf_pq's raw-ADC tier. Matryoshka-TRAINED embeddings
    front-load information, which is exactly what this row would measure
    on real data. Similarities rounded to 6dp with id tie-breaks (the
    cross-engine ranking discipline); one broadcast of the 10-query set,
    corpus streamed once per tier."""
    emb = sess.spark.table("embeddings")
    full_k = cosine_topk(emb, emb.filter("vec_id < 10"), k=5).select(
        "query_id", "neighbor_id"
    )
    pdim = 16
    q = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("query_id"),
        F.transform(F.slice("embedding", 1, pdim), lambda x: x.cast("double")).alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform(F.slice("embedding", 1, pdim), lambda x: x.cast("double")).alias("cv"),
    )
    from seccosql_spark.operators.similarity import dot, norm

    pre = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (norm(F.col("qv")) * norm(F.col("cv"))),
                6,
            ).alias("sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("neighbor_id")
                )
            ),
        )
        .select("query_id", "neighbor_id", "rn")
    )
    out = (
        full_k.join(pre, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("rn") <= 5, 1).otherwise(0))
            .cast("long")
            .alias("hits_prefix_top5"),
            F.sum(F.when(F.col("rn") <= 20, 1).otherwise(0))
            .cast("long")
            .alias("hits_shortlist20"),
        )
    )
    return sess.from_spark(out)


IVF_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qb
           FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label AS cb FROM embeddings),
sims AS (SELECT query_id, neighbor_id,
                round(list_dot_product(qv, cv) /
                      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                      6) AS sim
         FROM q JOIN c ON qb = cb WHERE query_id <> neighbor_id)
SELECT query_id, neighbor_id, rank, sim FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM sims
) WHERE rank <= 3
"""


def _lsh_oracle(
    planes: int = 32,
    band_size: int = 4,
    dim: int = 64,
    k: int = 3,
    probe_flips: int = 1,
) -> str:
    """Oracle twin of lsh_topk, generated from the SAME md5-derived
    hyperplane constants (operators.similarity.hyperplane_signs): int8
    quantization → exact integer hyperplane dots → banded signatures →
    query-side MULTI-PROBE expansion (per band, flip the probe_flips
    lowest-|margin| bits — tie order abs(dp), p mirrors Spark's
    array_sort struct order) → band-bucket candidates → exact-cosine
    top-k."""
    from seccosql_spark.operators.similarity import hyperplane_signs

    signs = hyperplane_signs(planes, dim)
    values = ", ".join(
        f"({p}, {d + 1}, {signs[p][d]})" for p in range(planes) for d in range(dim)
    )
    return f"""
WITH m AS (SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(x))) AS mx
           FROM embeddings),
q8 AS (SELECT vec_id,
       CASE WHEN mx > 0
            THEN list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / CAST(mx AS DOUBLE) + 0.5) AS BIGINT))
            ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
       FROM m),
qe AS (SELECT vec_id, unnest(q) AS v, generate_subscripts(q, 1) AS d FROM q8),
signs(p, d, s) AS (SELECT * FROM (VALUES {values}) t(p, d, s)),
dots AS (SELECT vec_id, p, sum(v * s) AS dp
         FROM qe JOIN signs USING (d) GROUP BY vec_id, p),
bands AS (SELECT vec_id, CAST(p // {band_size} AS INT) AS band,
                 CAST(sum((CASE WHEN dp >= 0 THEN 1 ELSE 0 END)
                          * (CAST(1 AS BIGINT) << (p % {band_size}))) AS INT) AS val
          FROM dots GROUP BY vec_id, p // {band_size}),
margins AS (SELECT vec_id, p, CAST(p // {band_size} AS INT) AS band,
                   row_number() OVER (PARTITION BY vec_id, p // {band_size}
                                      ORDER BY abs(dp), p) AS mr
            FROM dots),
qprobes AS (SELECT vec_id, band, val FROM bands WHERE vec_id < 20
            UNION ALL
            SELECT mg.vec_id, mg.band,
                   CAST(xor(b.val, 1 << CAST(mg.p % {band_size} AS INT)) AS INT) AS val
            FROM margins mg JOIN bands b
              ON b.vec_id = mg.vec_id AND b.band = mg.band
            WHERE mg.vec_id < 20 AND mg.mr <= {probe_flips}),
cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
         FROM qprobes a JOIN bands b ON a.band = b.band AND a.val = b.val
         WHERE a.vec_id <> b.vec_id),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (SELECT query_id, neighbor_id,
                round(list_dot_product(qv.v, cv.v) /
                      (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))),
                      6) AS sim
         FROM cand JOIN e qv ON qv.vec_id = cand.query_id
                   JOIN e cv ON cv.vec_id = cand.neighbor_id)
SELECT query_id, neighbor_id, rank, sim FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, neighbor_id) AS INT) AS rank
  FROM sims
) WHERE rank <= {k}
"""


@register("ann_lsh_hyperplane", _lsh_oracle())
def ann_lsh_hyperplane(sess: SeccoSession):
    """Random-hyperplane LSH ANN (the LSH-bucketed scale path next to IVF):
    32 md5-derived ±1 hyperplanes over the int8-quantized vectors (integer
    dots — engine-exact signatures), 8 bands of 4 bits, MULTI-PROBE
    queries (per band also probe the lowest-|margin| bit flipped — Lv et
    al. VLDB'07), candidates share a band with any probe, exact cosine
    ranks top-3. Approximate by design; deterministic by construction.

    Measured at sf0.01 vs brute force (COVERAGE.md has the full sweep):
    recall@3 = 0.93 at 0.65 candidate fraction (single-probe: 0.73 at
    0.40). This corpus's true top-3 neighbors sit at cosine ~0.33 (per-bit
    agreement ~0.61), which information-theoretically caps any
    hyperplane-LSH recall/fraction tradeoff here; on clusterable data
    (neighbors at cosine >= 0.8) the SAME config delivers >= 0.9 recall
    under 20% candidates — pinned by test_lsh_multiprobe_clustered."""
    from seccosql_spark.operators.similarity import lsh_topk

    emb = sess.spark.table("embeddings")
    out = lsh_topk(emb, emb.filter("vec_id < 20"), k=3, probe_flips=1)
    return sess.from_spark(out.withColumn("rank", F.col("rank").cast("int")))


@register("ann_ivf_label", IVF_ORACLE)
def ann_ivf_label(sess: SeccoSession):
    """IVF-bucketed ANN: candidates restricted to the query's coarse bucket
    (label = centroid assignment stand-in; at scale the bucket is the
    partition/layout key, pruned at the scan)."""
    emb = sess.spark.table("embeddings")
    out = ivf_topk(emb, emb.filter("vec_id < 20"), k=3)
    return sess.from_spark(out.withColumn("rank", F.col("rank").cast("int")))


def _lsh_clustered_oracle(
    planes: int = 32,
    band_size: int = 8,
    dim: int = 64,
    k: int = 3,
    probe_flips: int = 2,
    eps: float = 0.45,
) -> str:
    """Oracle twin of ann_lsh_clustered: replays the planted-neighbor corpus
    construction (elementwise double ops only — engine-exact), then the full
    quantize → integer hyperplane dots → 8-bit bands → 2-flip multi-probe →
    candidates → exact-cosine top-k machinery of _lsh_oracle, then the
    recall/candidate-fraction aggregation down to ONE verdict row."""
    from seccosql_spark.operators.similarity import hyperplane_signs

    signs = hyperplane_signs(planes, dim)
    values = ", ".join(
        f"({p}, {d + 1}, {signs[p][d]})" for p in range(planes) for d in range(dim)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
corpus AS (
    SELECT vec_id AS cid, v FROM e WHERE vec_id < 20
    UNION ALL
    SELECT n.vec_id + 80 AS cid,
           list_transform(generate_series(1, {dim}), d -> b.v[d] + {eps} * n.v[d]) AS v
    FROM e n JOIN e b ON b.vec_id = (n.vec_id - 20) // 3
    WHERE n.vec_id >= 20 AND n.vec_id < 80
    UNION ALL
    SELECT vec_id + 920 AS cid, v FROM e WHERE vec_id >= 80),
m AS (SELECT cid, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM corpus),
q8 AS (SELECT cid,
       CASE WHEN mx > 0
            THEN list_transform(v, x -> CAST(floor(x * 127.0 / mx + 0.5) AS BIGINT))
            ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
       FROM m),
qe AS (SELECT cid, unnest(q) AS qv, generate_subscripts(q, 1) AS d FROM q8),
signs(p, d, s) AS (SELECT * FROM (VALUES {values}) t(p, d, s)),
dots AS (SELECT cid, p, sum(qv * s) AS dp FROM qe JOIN signs USING (d) GROUP BY cid, p),
bands AS (SELECT cid, CAST(p // {band_size} AS INT) AS band,
                 CAST(sum((CASE WHEN dp >= 0 THEN 1 ELSE 0 END)
                          * (CAST(1 AS BIGINT) << (p % {band_size}))) AS INT) AS val
          FROM dots GROUP BY cid, p // {band_size}),
margins AS (SELECT cid, p, CAST(p // {band_size} AS INT) AS band,
                   row_number() OVER (PARTITION BY cid, p // {band_size}
                                      ORDER BY abs(dp), p) AS mr
            FROM dots),
qprobes AS (SELECT cid, band, val FROM bands WHERE cid < 20
            UNION ALL
            SELECT mg.cid, mg.band,
                   CAST(xor(b.val, 1 << CAST(mg.p % {band_size} AS INT)) AS INT) AS val
            FROM margins mg JOIN bands b ON b.cid = mg.cid AND b.band = mg.band
            WHERE mg.cid < 20 AND mg.mr <= {probe_flips}),
cand AS (SELECT DISTINCT a.cid AS query_id, b.cid AS neighbor_id
         FROM qprobes a JOIN bands b ON a.band = b.band AND a.val = b.val
         WHERE a.cid <> b.cid),
sims AS (SELECT q.cid AS query_id, c.cid AS neighbor_id,
                round(list_dot_product(q.v, c.v) /
                      (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
                      6) AS sim
         FROM corpus q JOIN corpus c ON q.cid <> c.cid
         WHERE q.cid < 20),
bf AS (SELECT query_id, neighbor_id FROM (
         SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         FROM sims) WHERE rank <= {k}),
lsh AS (SELECT query_id, neighbor_id FROM (
         SELECT s.query_id, s.neighbor_id,
                row_number() OVER (PARTITION BY s.query_id ORDER BY s.sim DESC, s.neighbor_id) AS rank
         FROM sims s JOIN cand USING (query_id, neighbor_id)) WHERE rank <= {k}),
agg AS (SELECT
        (SELECT count(*) FROM bf) AS n_true,
        (SELECT count(*) FROM bf JOIN lsh USING (query_id, neighbor_id)) AS n_hit,
        (SELECT count(*) FROM cand) AS n_cand,
        (SELECT count(*) FROM corpus) AS n_corpus),
verdict AS (SELECT CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
                   CAST(n_cand AS BIGINT) AS n_cand,
                   round(n_hit / n_true, 4) AS recall_at_3,
                   round(n_cand / (20.0 * (n_corpus - 1)), 4) AS cand_fraction
            FROM agg)
SELECT n_true, n_hit, n_cand, recall_at_3, cand_fraction,
       (recall_at_3 >= 0.9 AND cand_fraction <= 0.2) AS meets_production_bar
FROM verdict
"""


@register("ann_lsh_clustered", _lsh_clustered_oracle())
def ann_lsh_clustered(sess: SeccoSession):
    """The PRODUCTION hyperplane-LSH regime, driver-verified (VERDICT r06
    task 2): on a corpus with genuine neighbor structure — planted neighbors
    at cosine ≈ 0.9, the regime a dedup/retrieval corpus lives in (COVERAGE
    .md's measured boundary) — 32 planes / 8-bit bands / 2 multi-probe flips
    reach recall@3 ≥ 0.9 while scanning ≤ 20% of the corpus.

    The clustered corpus derives deterministically from the `embeddings`
    table with elementwise double ops ONLY (no cross-engine float
    reductions): base b_i = vec_id i (i<20, also the queries), planted
    p = b_i + 0.45·w with w = vec_id 20..79 (3 per base, cosine 0.90–0.94
    measured), distractors = vec_id 80..499. The query computes its OWN
    verdict — brute-force top-3 vs LSH top-3 recall and the distinct
    candidate fraction — and `assert_true`s the production bar, so a
    regression turns the driver row red loudly instead of shipping a
    degraded index. Reference lineage: similarity-search north star
    (BASELINE.json); Lv et al. VLDB'07 multi-probe."""
    from seccosql_spark.operators.similarity import lsh_hyperplane_bands, lsh_topk

    spark = sess.spark
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    base = emb.filter("vec_id < 20").select(F.col("vec_id").alias("cid"), "v")
    planted = (
        emb.filter("vec_id >= 20 AND vec_id < 80")
        .select(F.col("vec_id").alias("nid"), F.col("v").alias("w"))
        .withColumn("bid", ((F.col("nid") - 20) / 3).cast("long"))
        .join(base.select(F.col("cid").alias("bid"), F.col("v").alias("bv")), "bid")
        .select(
            (F.col("nid") + 80).alias("cid"),
            F.zip_with("bv", "w", lambda x, y: x + F.lit(0.45) * y).alias("v"),
        )
    )
    distractors = emb.filter("vec_id >= 80").select(
        (F.col("vec_id") + 920).alias("cid"), "v"
    )
    corpus = base.unionByName(planted).unionByName(distractors)
    queries = corpus.filter(F.col("cid") < 20)
    bfp = cosine_topk(corpus, queries, k=3, id_col="cid", vec_col="v").select(
        "query_id", "neighbor_id"
    )
    lshp = lsh_topk(
        corpus, queries, k=3, band_size=8, probe_flips=2, id_col="cid", vec_col="v"
    ).select("query_id", "neighbor_id")
    cb = lsh_hyperplane_bands(corpus, band_size=8, id_col="cid", vec_col="v")
    qb = lsh_hyperplane_bands(
        queries, band_size=8, probe_flips=2, id_col="cid", vec_col="v"
    )
    cand = (
        qb.select(F.col("id").alias("query_id"), "band", "val")
        .join(cb.select(F.col("id").alias("neighbor_id"), "band", "val"), ["band", "val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    row = (
        bfp.agg(F.count("*").alias("n_true"))
        .crossJoin(
            bfp.join(lshp, ["query_id", "neighbor_id"], "left_semi").agg(
                F.count("*").alias("n_hit")
            )
        )
        .crossJoin(cand.agg(F.count("*").alias("n_cand")))
        .crossJoin(corpus.agg(F.count("*").alias("n_corpus")))
        .select(
            "n_true",
            "n_hit",
            "n_cand",
            F.round(F.col("n_hit") / F.col("n_true"), 4).alias("recall_at_3"),
            F.round(F.col("n_cand") / (F.lit(20.0) * (F.col("n_corpus") - 1)), 4).alias(
                "cand_fraction"
            ),
        )
    )
    bar = (F.col("recall_at_3") >= 0.9) & (F.col("cand_fraction") <= 0.2)
    out = row.select(
        "n_true",
        "n_hit",
        "n_cand",
        "recall_at_3",
        "cand_fraction",
        # assert_true raises (red driver row, loudly) if the bar regresses;
        # when it passes the column IS the bar verdict, matching the oracle
        F.coalesce(F.assert_true(bar, F.lit("ann_lsh_clustered: production bar "
                                            "regressed (recall<0.9 or cand>0.2)")
                                 ).cast("boolean"), bar).alias("meets_production_bar"),
    )
    return sess.from_spark(out)


SUBSTRING_DUP_ORACLE = """
WITH toks AS (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents),
w AS (SELECT doc_id, md5(array_to_string(t[i.range:i.range + 9], ' ')) AS gh
      FROM toks, range(1, 512) i
      WHERE i.range <= len(t) - 9),
pg AS (SELECT gh, doc_id, count(*) AS c FROM w GROUP BY gh, doc_id),
pd AS (SELECT gh, doc_id, c, count(*) OVER (PARTITION BY gh) AS n_docs FROM pg)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup_windows,
       round(sum(CASE WHEN n_docs >= 2 THEN c ELSE 0 END) / sum(c), 6) AS dup_fraction
FROM pd GROUP BY doc_id
"""


@register("dedup_substring_windows", SUBSTRING_DUP_ORACLE)
def dedup_substring_windows(sess: SeccoSession):
    """Cross-document exact-substring duplication signal (Lee et al. 2022
    windowed approximation — operators.dedup.substring_dup_stats): every
    10-word window hashed, windows whose hash occurs in >= 2 distinct docs
    counted per doc, emitting the dup_fraction a curation pipeline
    thresholds on. Two bounded shuffles, no joins; the oracle replays
    window hashing positionally (1-based list slices) and the cross-doc
    occurrence count as a window function."""
    from seccosql_spark.operators.dedup import substring_dup_stats

    return sess.from_spark(substring_dup_stats(sess.spark.table("documents"), n=10))


EMB_DUP_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
             6) AS sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
"""


@register("dedup_embedding_cosine", EMB_DUP_ORACLE)
def dedup_embedding_cosine(sess: SeccoSession):
    """Embedding-cosine near-dup pairs within label buckets. Threshold 0.4 is
    calibrated to this synthetic corpus (max within-label cosine ≈ 0.475) so
    the operator produces verifiable output."""
    return sess.from_spark(
        embedding_near_dups(sess.spark.table("embeddings"), threshold=0.4)
    )


SEMDEDUP_ORACLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS c
         FROM v QUALIFY row_number() OVER (ORDER BY vec_id) <= 4),
a1 AS (SELECT vec_id, cid,
              list_sum(list_transform(range(1, len(v) + 1),
                                      i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist
       FROM v CROSS JOIN init),
s1 AS (SELECT vec_id, cid FROM a1
       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
m1 AS (SELECT cid, pos,
              CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS c
       FROM (SELECT s1.cid AS cid, unnest(v.v) AS x, generate_subscripts(v.v, 1) AS pos
             FROM v JOIN s1 USING (vec_id))
       GROUP BY cid, pos),
c1 AS (SELECT cid, list(c ORDER BY pos) AS c FROM m1 GROUP BY cid),
a2 AS (SELECT vec_id, cid,
              list_sum(list_transform(range(1, len(v) + 1),
                                      i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist
       FROM v CROSS JOIN c1),
s2 AS (SELECT vec_id, cid FROM a2
       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
e AS (SELECT s2.vec_id, s2.cid, v.v FROM v JOIN s2 USING (vec_id)),
dup AS (SELECT DISTINCT b.vec_id
        FROM e a JOIN e b ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.v, b.v) /
                    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                    6) >= 0.4)
SELECT s2.vec_id, s2.cid, (d.vec_id IS NULL) AS keep
FROM s2 LEFT JOIN dup d ON s2.vec_id = d.vec_id
"""


@register("dedup_semantic_semdedup", SEMDEDUP_ORACLE)
def dedup_semantic_semdedup(sess: SeccoSession):
    """SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    the embedding space with LEARNED k-means (the deterministic Lloyd\'s
    trainer the IVF path uses), then dropping, within each cluster, every
    vector that has cosine >= threshold with a lower-id cluster-mate
    (keep-first — the same greedy representative rule as the minhash
    pipeline). Output (vec_id, cid, keep). At corpus scale k grows with the
    data (SemDeDup used 50k clusters on LAION) so the per-cluster pair step
    stays subquadratic: pairs are generated ONLY inside a cluster, assignment
    is a broadcast map-only argmin, and the threshold compares a
    round(...,6) cosine exactly like every other cross-engine float gate.
    Threshold 0.4 is calibrated to this corpus (max within-bucket cosine
    ≈ 0.475). The oracle replays k-means training AND the keep-first
    decision in SQL, so the full ternary output must hash-match."""
    from seccosql_spark.operators.similarity import kmeans_assign, kmeans_fit

    emb = sess.spark.table("embeddings")
    cent = kmeans_fit(emb, k=4, iters=2)
    asg = kmeans_assign(emb, cent).withColumnRenamed("id", "vec_id")
    with_cid = emb.join(asg, "vec_id")
    pairs = embedding_near_dups(with_cid, threshold=0.4, bucket_col="cid")
    dup = pairs.select(F.col("id2").alias("vec_id")).distinct()
    out = asg.join(dup.withColumn("__d", F.lit(1)), "vec_id", "left").select(
        "vec_id", "cid", F.col("__d").isNull().alias("keep")
    )
    return sess.from_spark(out)


# ------------------------------------------------------------------- text

@register(
    "text_token_stats",
    """SELECT doc_id,
              CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS INT) AS n_tokens,
              CAST(len(list_distinct(list_filter(string_split(text,' '), x -> x <> ''))) AS INT) AS n_uniq,
              CAST(length(text) AS INT) AS n_chars_seen,
              CAST(list_sum(list_transform(list_filter(string_split(text,' '), x -> x <> ''),
                                           x -> length(x))) AS DOUBLE)
                / len(list_filter(string_split(text,' '), x -> x <> '')) AS avg_token_len
       FROM documents""",
)
def text_token_stats(sess: SeccoSession):
    """Token counting (whitespace baseline) + doc-level stats."""
    return sess.from_spark(token_stats(sess.spark.table("documents")))


@register(
    "text_quality_score",
    """SELECT doc_id,
              round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS uniq_ratio,
              round(least(1.0, CAST(len(toks) AS DOUBLE) / 50.0), 6) AS len_score,
              round((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                     + least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)) / 2.0, 6) AS quality
       FROM (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
             FROM documents)""",
)
def text_quality_score(sess: SeccoSession):
    """Quality scoring: uniqueness ratio + length score."""
    return sess.from_spark(quality_score(sess.spark.table("documents")))


def _lang_oracle() -> str:
    def hits(words: tuple[str, ...]) -> str:
        terms = [
            f"CAST((length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
            for w in words
        ]
        return " + ".join(terms)

    langs = list(LANG_MARKERS)
    cols = ", ".join(f"({hits(LANG_MARKERS[lang])}) AS h_{lang}" for lang in langs)
    # first language in order achieving the maximum wins; 'und' if all zero
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"h_{lang} >= h_{later}" for later in langs[i + 1 :]] + [f"h_{lang} > 0"]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    return f"""
      SELECT doc_id, {case} AS lang_guess
      FROM (SELECT doc_id, {cols}
            FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents))
    """


@register("text_lang_guess", _lang_oracle())
def text_lang_guess(sess: SeccoSession):
    """Heuristic language ID via marker-word counts (string ops only — no
    regex-engine divergence between Spark and DuckDB)."""
    return sess.from_spark(lang_guess(sess.spark.table("documents")))


@register(
    "text_fingerprint",
    """SELECT doc_id,
              md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp_norm,
              md5(array_to_string(list_sort(list_distinct(
                    list_filter(string_split(text,' '), x -> x <> ''))), ' ')) AS fp_shingle
       FROM documents""",
)
def text_fingerprint(sess: SeccoSession):
    """Document fingerprinting: normalized-content md5 + sorted-token-set md5."""
    return sess.from_spark(fingerprint(sess.spark.table("documents")))


# ------------------------------------------------------------- multimodal

@register(
    "multimodal_decode_real",
    """WITH dims AS (
         SELECT doc_id,
                CAST(4 + doc_id % 5 AS INT) AS width,
                CAST(3 + doc_id % 4 AS INT) AS height,
                CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 3 END AS channels
         FROM documents
       ),
       px AS (
         SELECT d.doc_id, d.width, d.height, d.channels,
                sum((d.doc_id * 31 + y.range * 7 + x.range * 3 + c.range) % 256) AS ps
         FROM dims d, range(0, 6) y, range(0, 8) x, range(0, 3) c
         WHERE y.range < d.height AND x.range < d.width AND c.range < d.channels
         GROUP BY 1, 2, 3, 4
       )
       SELECT doc_id, width, height,
              CAST(CASE WHEN doc_id % 3 = 1
                   THEN 54 + height * ((3 * width + 3) // 4 * 4)
                   ELSE 9 + length(CAST(width AS VARCHAR)) + length(CAST(height AS VARCHAR))
                        + width * height * channels
              END AS INT) AS n_bytes,
              CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp' ELSE 'pgm' END AS format,
              CAST(ps AS BIGINT) AS pixel_sum
       FROM px""",
)
def multimodal_decode_real(sess: SeccoSession):
    """REAL image decode end-to-end (VERDICT r05 task 4): deterministic
    synthetic rasters are ENCODED to actual PPM / 24-bit BMP / grayscale
    PGM bytes (doc_id mod 3), then parsed back — header, dimensions,
    raster — by the pure-Python+numpy codec in
    operators/multimodal.decode_image, all inside Arrow-batched
    mapInPandas. The oracle predicts width/height/n_bytes (format-specific
    header + row-padding + channel arithmetic) and pixel_sum from the
    closed-form pixel rule — so a codec bug in EITHER direction (writer or
    parser) of ANY of the three formats breaks the hash match."""
    from seccosql_spark.operators.multimodal import decode_image, synthesize_images

    docs = sess.spark.table("documents")
    return sess.from_spark(decode_image(synthesize_images(docs)))


AUDIO_FP_ORACLE = """
WITH keys AS (SELECT doc_id, doc_id % 40 AS k FROM documents),
dk AS (SELECT DISTINCT k FROM keys),
dims AS (SELECT k, CAST(1 + k % 2 AS BIGINT) AS ch,
                CAST(10 + k % 13 AS BIGINT) AS n FROM dk),
mono AS (SELECT k, n, f.range AS f,
                CAST(sum((k*37 + (f.range*ch + c.range)*11) % 4096 - 2048)
                     AS BIGINT) AS m
         FROM dims, range(0, 23) f, range(0, 2) c
         WHERE f.range < n AND c.range < ch
         GROUP BY k, n, f.range),
seg AS (SELECT k, (f * 8) // n AS s, CAST(sum(m * m) AS BIGINT) AS e
        FROM mono GROUP BY k, (f * 8) // n),
bits AS (SELECT a.k,
                (CASE WHEN b.e > a.e THEN CAST(1 AS BIGINT) ELSE 0 END)
                  << CAST(a.s AS INT) AS bv
         FROM seg a JOIN seg b ON a.k = b.k AND b.s = a.s + 1
         WHERE a.s < 7),
fp AS (SELECT k, CAST(sum(bv) AS BIGINT) AS afp FROM bits GROUP BY k)
SELECT afp, CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc
FROM keys JOIN fp USING (k)
GROUP BY afp
"""


@register("multimodal_audio_fingerprint", AUDIO_FP_ORACLE)
def multimodal_audio_fingerprint(sess: SeccoSession):
    """Audio near-dup fingerprinting on the REAL WAV codec path — the
    time-axis twin of `multimodal_phash_dedup`: each clip's PCM is mixed
    to mono per frame by channel SUM (never a division — Spark DIV
    truncates where numpy floors on negatives), the frame sequence is
    split into 8 contiguous segments, and the energy CONTOUR (does the
    next segment carry more energy?) becomes a 7-bit fingerprint —
    loudness- and codec-metadata-insensitive in the way real audio
    fingerprints (Shazam-style energy-band deltas) are. Decode runs once
    per DISTINCT clip key (40 keys serve the corpus, broadcast back);
    the oracle replays the fingerprint closed-form from the PCM rule, so
    a chunk-walk, channel-mix, or segmentation bug anywhere breaks the
    hash match. The 40 keys collapse to 5 contour groups."""
    from seccosql_spark.operators.multimodal import audio_fingerprint, synthesize_audio

    docs = sess.spark.table("documents")
    keys = docs.select((F.col("doc_id") % 40).alias("doc_id")).distinct()
    fp = audio_fingerprint(synthesize_audio(keys))
    out = (
        docs.select("doc_id", (F.col("doc_id") % 40).alias("clip_key"))
        .join(F.broadcast(fp), "clip_key")
        .groupBy("afp")
        .agg(
            F.count_distinct("clip_key").cast("long").alias("n_keys"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("canonical_doc"),
        )
    )
    return sess.from_spark(out)


PHASH_DEDUP_ORACLE = """
WITH keys AS (SELECT doc_id, doc_id % 60 AS k FROM documents),
dk AS (SELECT DISTINCT k FROM keys),
dims AS (SELECT k, CAST(4 + k % 5 AS BIGINT) AS w, CAST(3 + k % 4 AS BIGINT) AS h,
                CASE WHEN k % 3 = 2 THEN 1 ELSE 3 END AS ch FROM dk),
cells AS (SELECT k, ch, ty.range AS ty, tx.range AS tx,
                 (ty.range * h) // 8 AS sy, (tx.range * w) // 8 AS sx
          FROM dims, range(0, 8) ty, range(0, 8) tx),
gray AS (SELECT k, ty, tx,
                CASE WHEN ch = 1 THEN (k*31 + sy*7 + sx*3) % 256
                     ELSE ((k*31 + sy*7 + sx*3) % 256
                         + (k*31 + sy*7 + sx*3 + 1) % 256
                         + (k*31 + sy*7 + sx*3 + 2) % 256) // 3 END AS g
         FROM cells),
bits AS (SELECT a.k,
                (CASE WHEN b.g > a.g THEN CAST(1 AS BIGINT) ELSE 0 END)
                  << CAST(a.ty * 7 + a.tx AS INT) AS bv
         FROM gray a JOIN gray b ON a.k = b.k AND a.ty = b.ty AND b.tx = a.tx + 1
         WHERE a.tx < 7),
ph AS (SELECT k, CAST(sum(bv) AS BIGINT) AS dhash FROM bits GROUP BY k)
SELECT dhash,
       CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc
FROM keys JOIN ph USING (k)
GROUP BY dhash
"""


@register("multimodal_phash_dedup", PHASH_DEDUP_ORACLE)
def multimodal_phash_dedup(sess: SeccoSession):
    """Perceptual-hash image dedup (dHash, Krawetz) end-to-end on the REAL
    codec path: synthetic PPM/BMP/PGM images are decoded, orientation-
    normalized to a top-down grayscale grid (the BMP parser's raw raster
    is bottom-up — fine for pixel_sum, wrong for any spatial feature),
    nearest-neighbor resampled to 8×8, and difference-hashed to a 56-bit
    SIGNED BIGINT; documents sharing a dhash form a duplicate group with
    a min-id canonical keeper. Two scale decisions a 100 TB image corpus
    needs: (1) decode once per DISTINCT content key and broadcast the
    (key → hash) map back — here 60 keys serve every document, exactly
    how content-addressed stores dedupe before the expensive decode;
    (2) the hash is integer-only (gray = channel sum // ch, integer
    resample, strict > bits), so the oracle replays it CLOSED-FORM from
    the pixel rule — a codec, orientation, or resample bug anywhere
    breaks the hash match. The 60 keys collapse to 13 dhash groups
    (heavy quantization of tiny rasters): real grouping, not identity."""
    from seccosql_spark.operators.multimodal import perceptual_dhash, synthesize_images

    docs = sess.spark.table("documents")
    keys = docs.select((F.col("doc_id") % 60).alias("doc_id")).distinct()
    ph = perceptual_dhash(synthesize_images(keys))
    out = (
        docs.select("doc_id", (F.col("doc_id") % 60).alias("img_key"))
        .join(F.broadcast(ph), "img_key")
        .groupBy("dhash")
        .agg(
            F.count_distinct("img_key").cast("long").alias("n_keys"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("canonical_doc"),
        )
    )
    return sess.from_spark(out)


@register(
    "multimodal_decode_png",
    """WITH dims AS (
         SELECT doc_id,
                CAST(4 + doc_id % 5 AS INT) AS width,
                CAST(3 + doc_id % 4 AS INT) AS height,
                CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 3 END AS channels
         FROM documents
       ),
       px AS (
         SELECT d.doc_id, d.width, d.height, d.channels,
                sum((d.doc_id * 31 + y.range * 7 + x.range * 3 + c.range) % 256) AS ps
         FROM dims d, range(0, 6) y, range(0, 8) x, range(0, 3) c
         WHERE y.range < d.height AND x.range < d.width AND c.range < d.channels
         GROUP BY 1, 2, 3, 4
       )
       SELECT doc_id, width, height, 'png' AS format, CAST(ps AS BIGINT) AS pixel_sum
       FROM px""",
)
def multimodal_decode_png(sess: SeccoSession):
    """REAL PNG decode end-to-end: deterministic rasters encoded to actual
    PNG bytes (IHDR/IDAT/IEND with CRCs, zlib DEFLATE from the stdlib —
    grayscale for odd ids, RGB for even) and parsed back by the full
    chunk-walking, inflating, row-un-filtering reader in
    operators/multimodal._parse_png, inside Arrow-batched mapInPandas.
    The oracle predicts geometry and pixel_sum from the closed-form rule;
    n_bytes is dropped from the output because IDAT length depends on the
    zlib encoder, which SQL cannot replay."""
    from seccosql_spark.operators.multimodal import decode_image, synthesize_pngs

    docs = sess.spark.table("documents")
    return sess.from_spark(
        decode_image(synthesize_pngs(docs)).drop("n_bytes")
    )


@register(
    "multimodal_resize_thumbnail",
    """WITH dims AS (
         SELECT doc_id,
                CAST(4 + doc_id % 5 AS INT) AS w,
                CAST(3 + doc_id % 4 AS INT) AS h,
                CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 3 END AS ch
         FROM documents
       ),
       px AS (
         SELECT d.doc_id, d.w, d.h,
                sum((d.doc_id * 31 + ((oy.range * d.h) // 2) * 7
                     + ((ox.range * d.w) // 2) * 3 + c.range) % 256) AS rs
         FROM dims d, range(0, 2) oy, range(0, 2) ox, range(0, 3) c
         WHERE c.range < d.ch
         GROUP BY 1, 2, 3
       )
       SELECT doc_id, w AS src_w, h AS src_h,
              CAST(2 AS INT) AS out_w, CAST(2 AS INT) AS out_h,
              CAST(rs AS BIGINT) AS resized_sum
       FROM px""",
)
def multimodal_resize_thumbnail(sess: SeccoSession):
    """REAL resize end-to-end: deterministic rasters encoded to actual PNG
    bytes, decoded back by the chunk-walking reader, then nearest-neighbor
    resampled to a 2x2 thumbnail (source pixel = (oy*h//2, ox*w//2) — floor
    NN) inside the same Arrow batch (operators/multimodal.resize_image_nn).
    The oracle predicts the resized-raster sample sum from the closed-form
    pixel rule with the same integer division, so a bug anywhere along
    encode -> decode -> gather breaks the hash."""
    from seccosql_spark.operators.multimodal import resize_image_nn, synthesize_pngs

    docs = sess.spark.table("documents")
    return sess.from_spark(resize_image_nn(synthesize_pngs(docs), out_w=2, out_h=2))


@register(
    "multimodal_audio_features",
    """WITH dims AS (
         SELECT doc_id, CAST(8000 * (1 + doc_id % 3) AS INT) AS rate,
                CAST(1 + doc_id % 2 AS INT) AS ch,
                CAST(10 + doc_id % 13 AS INT) AS n
         FROM documents
       ),
       s AS (
         SELECT d.doc_id, d.rate, d.ch, d.n, i.range AS i,
                ((d.doc_id * 37 + i.range * 11) % 4096) - 2048 AS v
         FROM dims d, range(0, 46) i WHERE i.range < d.n * d.ch
       ),
       base AS (
         SELECT doc_id, rate, ch, n, sum(abs(v)) AS abs_sum, max(abs(v)) AS peak
         FROM s GROUP BY 1, 2, 3, 4
       ),
       x AS (
         SELECT a.doc_id, count(*) FILTER ((a.v >= 0) <> (b.v >= 0)) AS zc
         FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.i = a.i + a.ch
         GROUP BY a.doc_id
       )
       SELECT base.doc_id, rate AS sample_rate, ch AS channels, n AS n_frames,
              CAST(abs_sum AS BIGINT) AS abs_sum, CAST(peak AS BIGINT) AS peak,
              CAST(coalesce(x.zc, 0) AS BIGINT) AS zero_crossings
       FROM base LEFT JOIN x USING (doc_id)""",
)
def multimodal_audio_features(sess: SeccoSession):
    """REAL audio feature extraction end-to-end: closed-form PCM16 clips
    encoded to actual RIFF/WAVE bytes, decoded back by the chunk-walking
    reader, then total |amplitude|, peak, and per-channel zero-crossing
    counts computed from the raw samples inside the Arrow batch
    (operators/multimodal.audio_features) — the silence/clipping/noisiness
    features an audio-curation filter thresholds on. The oracle predicts
    all three from the sample rule, pairing same-channel consecutive
    frames for the crossings."""
    from seccosql_spark.operators.multimodal import audio_features, synthesize_audio

    docs = sess.spark.table("documents")
    return sess.from_spark(audio_features(synthesize_audio(docs)))


@register(
    "multimodal_probe_mp4",
    """SELECT doc_id,
              CAST(1000 + (doc_id * 7) % 60000 AS BIGINT) AS duration_ms,
              CAST(1000 AS INT) AS timescale,
              CAST(1 + doc_id % 2 AS INT) AS n_tracks,
              CAST(16 * (4 + doc_id % 5) AS INT) AS video_width,
              CAST(16 * (3 + doc_id % 4) AS INT) AS video_height
       FROM documents""",
)
def multimodal_probe_mp4(sess: SeccoSession):
    """REAL ISO-BMFF (MP4) metadata probe end-to-end: structurally-valid
    container skeletons (ftyp + moov/mvhd/trak/tkhd with spec box nesting,
    16.16 fixed-point dimensions; mdat empty — metadata only, clearly not
    a playable encode) are written and then probed back by the recursive
    box walk in operators/multimodal.probe_mp4_bytes (v0/v1 mvhd, 64-bit
    largesize, audio-vs-video track discrimination) inside Arrow-batched
    mapInPandas — the duration/resolution/track-shape read a video-corpus
    filter runs without touching codec samples."""
    from seccosql_spark.operators.multimodal import probe_mp4, synthesize_mp4s

    docs = sess.spark.table("documents")
    return sess.from_spark(probe_mp4(synthesize_mp4s(docs)))


@register(
    "multimodal_decode_audio",
    """WITH dims AS (
         SELECT doc_id,
                CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
                CAST(1 + doc_id % 2 AS INT) AS channels,
                CAST(10 + doc_id % 13 AS INT) AS n_frames
         FROM documents
       ),
       amp AS (
         SELECT d.doc_id, d.sample_rate, d.channels, d.n_frames,
                sum((d.doc_id * 37 + i.range * 11) % 4096 - 2048) AS s
         FROM dims d, range(0, 44) i
         WHERE i.range < d.n_frames * d.channels
         GROUP BY 1, 2, 3, 4
       )
       SELECT doc_id, sample_rate, channels, n_frames,
              CAST(44 + n_frames * channels * 2 AS INT) AS n_bytes,
              CAST(s AS BIGINT) AS amp_sum
       FROM amp""",
)
def multimodal_decode_audio(sess: SeccoSession):
    """REAL audio decode end-to-end: deterministic PCM16 clips are encoded
    to actual RIFF/WAVE bytes (44-byte canonical header) and parsed back by
    a chunk-walking WAV reader (operators/multimodal.decode_audio) inside
    Arrow-batched mapInPandas. The oracle predicts rate/channels/frames/
    byte-size and the exact signed sample sum from the closed-form sample
    rule — covering writer and parser in both directions, like the image
    row."""
    from seccosql_spark.operators.multimodal import decode_audio, synthesize_audio

    docs = sess.spark.table("documents")
    return sess.from_spark(decode_audio(synthesize_audio(docs)))


@register(
    "multimodal_frames_real",
    """WITH fr AS (
         SELECT doc_id, f.range AS frame_idx
         FROM documents, range(0, 4) f
         WHERE f.range < 2 + doc_id % 3
       ),
       dims AS (
         SELECT doc_id, frame_idx,
                CAST((doc_id + frame_idx) % 3 AS INT) AS x_off,
                CAST(frame_idx % 2 AS INT) AS y_off,
                CAST(3 + (doc_id + frame_idx) % 4 AS INT) AS width,
                CAST(2 + (doc_id + 2 * frame_idx) % 3 AS INT) AS height,
                CAST(4 + frame_idx AS INT) AS delay_cs
         FROM fr
       ),
       px AS (
         SELECT d.doc_id, d.frame_idx, d.x_off, d.y_off, d.width, d.height, d.delay_cs,
                sum((d.doc_id * 29 + d.frame_idx * 17 + y.range * 7 + x.range * 3) % 256) AS ps
         FROM dims d, range(0, 4) y, range(0, 6) x
         WHERE y.range < d.height AND x.range < d.width
         GROUP BY 1, 2, 3, 4, 5, 6, 7
       )
       SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, x_off, y_off,
              width, height, delay_cs,
              CAST(width * height AS INT) AS n_pixels,
              CAST(ps AS BIGINT) AS pixel_sum
       FROM px""",
)
def multimodal_frames_real(sess: SeccoSession):
    """REAL multi-frame video-container decode end-to-end (VERDICT r06 task
    3 — the last multimodal stub replaced): deterministic synthetic
    animations are ENCODED to actual GIF89a bytes (logical screen, 256-entry
    grayscale color table, NETSCAPE loop extension, per-frame graphic
    control + image descriptor + LZW-compressed raster) and decoded back by
    a full container walk with general LZW decompression
    (operators/multimodal.decode_gif_frames) inside Arrow-batched
    1-to-N mapInPandas. The oracle predicts every frame's geometry, delay
    and palette-mapped pixel_sum from the closed-form pixel rule — a bug in
    the writer or parser (bit packing, sub-block chop, table reset, palette
    lookup) breaks the hash match."""
    from seccosql_spark.operators.multimodal import decode_gif_frames, synthesize_gifs

    docs = sess.spark.table("documents")
    return sess.from_spark(decode_gif_frames(synthesize_gifs(docs)))


BINARYFILE_N_DOCS = 60


def _stage_gif_media_dir() -> str:
    """Write the first BINARYFILE_N_DOCS synthetic GIFs as individual files
    (the file-per-asset layout a real media corpus has) to a deterministic
    staging dir, once per machine. Content is closed-form per doc id, so
    re-staging is idempotent and the oracle needs no filesystem access."""
    import os

    d = "/tmp/secco_spark_media_gifs_v1"
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        from seccosql_spark.operators.multimodal import synthetic_gif_payload

        os.makedirs(d, exist_ok=True)
        for doc in range(BINARYFILE_N_DOCS):
            with open(os.path.join(d, f"doc_{doc:04d}.gif"), "wb") as fh:
                fh.write(synthetic_gif_payload(doc))
        with open(marker, "w"):
            pass
    return d


@register(
    "multimodal_binaryfile_scan",
    f"""WITH fr AS (
         SELECT doc_id, f.range AS frame_idx
         FROM documents, range(0, 4) f
         WHERE doc_id < {BINARYFILE_N_DOCS} AND f.range < 2 + doc_id % 3
       ),
       dims AS (
         SELECT doc_id, frame_idx,
                CAST((doc_id + frame_idx) % 3 AS INT) AS x_off,
                CAST(frame_idx % 2 AS INT) AS y_off,
                CAST(3 + (doc_id + frame_idx) % 4 AS INT) AS width,
                CAST(2 + (doc_id + 2 * frame_idx) % 3 AS INT) AS height,
                CAST(4 + frame_idx AS INT) AS delay_cs
         FROM fr
       ),
       px AS (
         SELECT d.doc_id, d.frame_idx, d.x_off, d.y_off, d.width, d.height, d.delay_cs,
                sum((d.doc_id * 29 + d.frame_idx * 17 + y.range * 7 + x.range * 3) % 256) AS ps
         FROM dims d, range(0, 4) y, range(0, 6) x
         WHERE y.range < d.height AND x.range < d.width
         GROUP BY 1, 2, 3, 4, 5, 6, 7
       )
       SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, x_off, y_off,
              width, height, delay_cs,
              CAST(width * height AS INT) AS n_pixels,
              CAST(ps AS BIGINT) AS pixel_sum
       FROM px""",
)
def multimodal_binaryfile_scan(sess: SeccoSession):
    """Media ingestion from FILES, end-to-end: synthetic GIFs staged as one
    file per asset, scanned with Spark's built-in binaryFile source
    (pathGlobFilter pruning, per-file splits — the layout/scale shape of a
    real 100 TB media corpus on object storage), doc ids recovered from the
    file names, then the same real GIF89a container decode as
    multimodal_frames_real. Proves the connector + decode composition, not
    just the payload-column path; the oracle predicts every frame from the
    closed-form rule and never touches the filesystem."""
    from seccosql_spark.operators.multimodal import decode_gif_frames
    from seccosql_spark.sources.connectors import read_binary_files

    d = _stage_gif_media_dir()
    files = read_binary_files(sess, d, glob="*.gif").df
    payloads = files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.gif$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return sess.from_spark(decode_gif_frames(payloads))


MIXED_N_DOCS = 24


def _stage_mixed_media_dir() -> str:
    """Write MIXED_N_DOCS synthetic media files — format by doc_id % 3
    (png / wav / mp4), one file per asset — to a deterministic staging dir,
    once per machine. Same idempotent closed-form contract as the GIF
    staging: the oracle predicts every file's content, no fs access."""
    import os

    d = "/tmp/secco_spark_media_mixed_v1"
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        from seccosql_spark.operators.multimodal import (
            synthetic_mp4_payload,
            synthetic_png_payload,
            synthetic_wav_payload,
        )

        os.makedirs(d, exist_ok=True)
        gen = {0: ("png", synthetic_png_payload), 1: ("wav", synthetic_wav_payload),
               2: ("mp4", synthetic_mp4_payload)}
        for doc in range(MIXED_N_DOCS):
            ext, fn = gen[doc % 3]
            with open(os.path.join(d, f"doc_{doc:04d}.{ext}"), "wb") as fh:
                fh.write(fn(doc))
        with open(marker, "w"):
            pass
    return d


@register(
    "multimodal_binaryfile_mixed",
    f"""WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {MIXED_N_DOCS}),
       png AS (
         SELECT d.doc_id,
                sum((d.doc_id * 31 + y.range * 7 + x.range * 3 + c.range) % 256) AS v
         FROM ids d, range(0, 6) y, range(0, 8) x, range(0, 3) c
         WHERE d.doc_id % 3 = 0
           AND y.range < 3 + d.doc_id % 4 AND x.range < 4 + d.doc_id % 5
           AND c.range < CASE WHEN d.doc_id % 2 = 1 THEN 1 ELSE 3 END
         GROUP BY 1
       ),
       wav AS (
         SELECT d.doc_id, sum((d.doc_id * 37 + i.range * 11) % 4096 - 2048) AS v
         FROM ids d, range(0, 44) i
         WHERE d.doc_id % 3 = 1
           AND i.range < (10 + d.doc_id % 13) * (1 + d.doc_id % 2)
         GROUP BY 1
       ),
       mp4 AS (
         SELECT doc_id, 1000 + (doc_id * 7) % 60000 AS v
         FROM ids WHERE doc_id % 3 = 2
       )
       SELECT 'png' AS format, count(*) AS n_files, CAST(sum(v) AS BIGINT) AS total FROM png
       UNION ALL
       SELECT 'wav', count(*), CAST(sum(v) AS BIGINT) FROM wav
       UNION ALL
       SELECT 'mp4', count(*), CAST(sum(v) AS BIGINT) FROM mp4""",
)
def multimodal_binaryfile_mixed(sess: SeccoSession):
    """Every real codec family proven from FILES (VERDICT r07 task 7): a
    mixed media directory (format = doc_id % 3) is scanned three times with
    the binaryFile source — one pathGlobFilter per extension, so each scan
    lists/reads only its family, the per-format routing a real mixed
    100 TB media lake needs — then each family runs its own real decoder
    (PNG chunk-walk/inflate/un-filter, RIFF/WAVE chunk walk, ISO-BMFF box
    walk) and folds to one summary row: (format, n_files, total) with
    total = sum(pixel_sum) / sum(amp_sum) / sum(duration_ms). The oracle
    predicts all three rows from the closed-form synthesis rules without
    touching the filesystem."""
    from seccosql_spark.operators.multimodal import decode_audio, decode_image, probe_mp4
    from seccosql_spark.sources.connectors import read_binary_files

    d = _stage_mixed_media_dir()

    def payloads(ext: str):
        return read_binary_files(sess, d, glob=f"*.{ext}").df.select(
            F.regexp_extract(F.col("path"), rf"doc_(\d+)\.{ext}$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("content").alias("payload"),
        )

    png = decode_image(payloads("png")).agg(
        F.lit("png").alias("format"),
        F.count(F.lit(1)).alias("n_files"),
        F.sum("pixel_sum").cast("long").alias("total"),
    )
    wav = decode_audio(payloads("wav")).agg(
        F.lit("wav").alias("format"),
        F.count(F.lit(1)).alias("n_files"),
        F.sum("amp_sum").cast("long").alias("total"),
    )
    mp4 = probe_mp4(payloads("mp4")).agg(
        F.lit("mp4").alias("format"),
        F.count(F.lit(1)).alias("n_files"),
        F.sum("duration_ms").cast("long").alias("total"),
    )
    return sess.from_spark(png.unionByName(wav).unionByName(mp4))


# ------------------------------------------------------------ events/json

@register(
    "events_json_extract",
    """SELECT event_type,
              CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
              count(*) AS n
       FROM events GROUP BY event_type""",
)
def events_json_extract(sess: SeccoSession):
    """Semi-structured props column: JSON path extraction + aggregation."""
    return sess.from_spark(
        sess.spark.table("events")
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("total_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


KMEANS_ORACLE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS c
         FROM v QUALIFY row_number() OVER (ORDER BY vec_id) <= 4),
a1 AS (SELECT vec_id, cid,
              list_sum(list_transform(range(1, len(v) + 1),
                                      i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist
       FROM v CROSS JOIN init),
s1 AS (SELECT vec_id, cid FROM a1
       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
m1 AS (SELECT cid, pos,
              CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS c
       FROM (SELECT s1.cid AS cid, unnest(v.v) AS x, generate_subscripts(v.v, 1) AS pos
             FROM v JOIN s1 USING (vec_id))
       GROUP BY cid, pos),
c1 AS (SELECT cid, list(c ORDER BY pos) AS c FROM m1 GROUP BY cid),
a2 AS (SELECT vec_id, cid,
              list_sum(list_transform(range(1, len(v) + 1),
                                      i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist
       FROM v CROSS JOIN c1)
SELECT vec_id, cid FROM a2
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
"""


@register("ann_ivf_kmeans", KMEANS_ORACLE)
def ann_ivf_kmeans(sess: SeccoSession):
    """LEARNED IVF coarse quantizer: deterministic Lloyd's k-means (k=4,
    2 assignment passes) trained on the embedding corpus, then the final
    cluster assignment — `ann_ivf_label` with the label column replaced by
    a trained partition. The oracle REPLAYS training in SQL: same k-smallest
    -id init, same left-folded squared-L2 argmin with ties to the smallest
    cid, same DECIMAL(28,9)-exact centroid means, so the full (vec_id, cid)
    assignment must hash-match, not just cluster sizes
    (operators/similarity.py kmeans_fit/kmeans_assign; reference analogue:
    the coarse partitioner the IVF path assumes given)."""
    from seccosql_spark.operators.similarity import kmeans_assign, kmeans_fit

    emb = sess.spark.table("embeddings")
    cent = kmeans_fit(emb, k=4, iters=2)
    out = kmeans_assign(emb, cent).withColumnRenamed("id", "vec_id")
    return sess.from_spark(out)


CENTROID_ORACLE = """
SELECT bucket, CAST(pos - 1 AS INT) AS pos,
       CAST(sum(CAST(round(v, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS centroid
FROM (SELECT label AS bucket,
             unnest(embedding::DOUBLE[]) AS v,
             generate_subscripts(embedding::DOUBLE[], 1) AS pos
      FROM embeddings)
GROUP BY bucket, pos
"""


@register("embedding_centroids", CENTROID_ORACLE)
def embedding_centroids(sess: SeccoSession):
    """IVF training step: per-label centroids via exact per-dimension decimal
    sums (order-independent, so the oracle matches bit-for-bit)."""
    from seccosql_spark.operators.similarity import label_centroids

    out = label_centroids(sess.spark.table("embeddings"))
    return sess.from_spark(out.withColumn("pos", F.col("pos").cast("int")))


QUANTIZE_ORACLE = """
WITH m AS (SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(x))) AS mx
           FROM embeddings)
SELECT vec_id,
       CASE WHEN mx > 0
            THEN array_to_string(list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / CAST(mx AS DOUBLE) + 0.5) AS INT)), ',')
            ELSE array_to_string(list_transform(embedding, x -> 0), ',')
       END AS q_str
FROM m
"""


@register("embedding_quantize_int8", QUANTIZE_ORACLE)
def embedding_quantize_int8(sess: SeccoSession):
    """Symmetric int8 quantization of the embedding column — the vector
    compression step of a quantized ANN index (4x bandwidth cut before
    similarity search). floor(x*127/max|x| + 0.5) keeps rounding
    bit-identical across engines (round() half-even rules differ); emitted
    as a comma-joined string so full-vector equality is hash-checkable."""
    q = quantize_int8(sess.spark.table("embeddings"))
    return sess.from_spark(
        q.select(
            "vec_id", F.array_join(F.col("q").cast("array<string>"), ",").alias("q_str")
        )
    )


def _pq_parts(m: int = 4, s: int = 16, k: int = 4) -> tuple[list, str, str]:
    """Shared CTE parts for the PQ oracles: per-subspace deterministic
    k-means replay (the KMEANS_ORACLE recipe applied to each 1-based
    slice). Returns (with_parts, code_joins, code_cols) — `c{j}x` CTEs hold
    the trained codebooks, `f{j}x` the per-vector code assignments."""
    parts = []
    for j in range(m):
        lo, hi = j * s + 1, (j + 1) * s
        parts.append(f"""
v{j} AS (SELECT vec_id, (embedding::DOUBLE[])[{lo}:{hi}] AS v FROM embeddings),
init{j} AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS c
            FROM v{j} QUALIFY row_number() OVER (ORDER BY vec_id) <= {k}),
a{j}x AS (SELECT vec_id, cid,
               list_sum(list_transform(range(1, {s} + 1),
                                       i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist
          FROM v{j} CROSS JOIN init{j}),
s{j}x AS (SELECT vec_id, cid FROM a{j}x
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
m{j}x AS (SELECT cid, pos,
               CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS c
          FROM (SELECT sx.cid AS cid, unnest(vv.v) AS x,
                       generate_subscripts(vv.v, 1) AS pos
                FROM v{j} vv JOIN s{j}x sx USING (vec_id))
          GROUP BY cid, pos),
c{j}x AS (SELECT cid, list(c ORDER BY pos) AS c FROM m{j}x GROUP BY cid),
b{j}x AS (SELECT vec_id, cid,
               list_sum(list_transform(range(1, {s} + 1),
                                       i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist
          FROM v{j} CROSS JOIN c{j}x),
f{j}x AS (SELECT vec_id, CAST(cid AS INT) AS c{j} FROM b{j}x
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)""")
    joins = " ".join(f"JOIN f{j}x USING (vec_id)" for j in range(1, m))
    cols = ", ".join(f"c{j}" for j in range(m))
    return parts, joins, cols


def _pq_oracle(m: int = 4, s: int = 16, k: int = 4) -> str:
    parts, joins, cols = _pq_parts(m, s, k)
    return "WITH " + ",".join(parts) + f"\nSELECT vec_id, {cols} FROM f0x {joins}"


def _pq_adc_oracle(m: int = 4, s: int = 16, k: int = 4, topn: int = 20) -> str:
    """ADC replay on top of the shared PQ parts: the min-id probe vector,
    one k-row distance table per subspace (rounded 9, list_sum left-fold =
    sq_dist), joined to the codes by cid; the total is the same
    fixed-order 4-term addition the Spark side emits."""
    parts, joins, cols = _pq_parts(m, s, k)
    adc = [
        """
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
       WHERE vec_id = (SELECT min(vec_id) FROM embeddings))"""
    ]
    for j in range(m):
        adc.append(f"""
d{j}t AS (SELECT cid, round(list_sum(list_transform(range(1, {s} + 1),
                 i -> (qv.v[{j * s} + i] - c.c[i]) * (qv.v[{j * s} + i] - c.c[i]))), 9) AS d
          FROM c{j}x c CROSS JOIN qv)""")
    code_joins = " ".join(f"JOIN d{j}t ON codes.c{j} = d{j}t.cid" for j in range(m))
    total = " + ".join(f"d{j}t.d" for j in range(m))
    sel_codes = ", ".join(f"codes.c{j}" for j in range(m))
    return (
        "WITH " + ",".join(parts) + "," + ",".join(adc)
        + f""",
codes AS (SELECT vec_id, {cols} FROM f0x {joins})
SELECT codes.vec_id, {sel_codes}, {total} AS adc_dist
FROM codes {code_joins}
ORDER BY adc_dist, codes.vec_id LIMIT {topn}"""
    )


@register("ann_pq_codes", _pq_oracle())
def ann_pq_codes(sess: SeccoSession):
    """Product-quantization coding (Jégou et al. 2011): 4 subspaces of 16
    dims, an independent deterministic k-means codebook each, every vector
    compressed to 4 code ints — the memory-resident representation
    billion-vector ANN serves from (operators/similarity.pq_codes).
    Training is 4 small k-means runs; coding is ONE map-only projection
    with all codebooks as literals. The oracle replays all four subspace
    trainings and assignments, so every code of every vector must
    hash-match."""
    from seccosql_spark.operators.similarity import pq_codes

    return sess.from_spark(pq_codes(sess.spark.table("embeddings"), m=4, k=4, iters=2))


@register("ann_pq_adc_topk", _pq_adc_oracle())
def ann_pq_adc_topk(sess: SeccoSession):
    """IVFADC-style scoring pass (Jégou et al. 2011 §IV): the min-id vector
    probes the PQ-coded corpus via per-subspace distance-table lookups —
    the approximate distances a billion-vector index prices candidates
    with before exact reranking. Tables are driver-computed literals
    (k entries each); scoring is ONE map-only projection and the top-20 a
    TakeOrdered. The oracle replays training, coding, the probe's four
    distance tables, and the fixed-order total."""
    from seccosql_spark.operators.similarity import pq_adc_topk

    return sess.from_spark(
        pq_adc_topk(sess.spark.table("embeddings"), m=4, k=4, iters=2, topn=20)
    )


PPJOIN_ORACLE = f"""
WITH sh AS ({SHINGLES_SQL}),
w AS (SELECT id AS doc_id, list(DISTINCT w) AS ws FROM sh GROUP BY id),
p AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2,
         len(list_intersect(a.ws, b.ws)) AS i,
         len(a.ws) + len(b.ws) AS s
  FROM w a JOIN w b ON a.doc_id < b.doc_id
)
SELECT id1, id2, round(CAST(i AS DOUBLE) / (s - i), 6) AS jaccard
FROM p WHERE 2 * i >= 1 * (s - i)
"""


@register("dedup_ppjoin_exact", PPJOIN_ORACLE)
def dedup_ppjoin_exact(sess: SeccoSession):
    """EXACT set-similarity self-join (PPJoin prefix-filtering family, Xiao
    et al. 2008): every pair with 3-shingle Jaccard >= 0.5, no
    approximation — the exact twin of dedup_minhash_lsh (same features,
    same threshold; the LSH row's output is necessarily a subset of this
    one). The prefix theorem prunes candidates to pairs sharing one of
    each document's RAREST shingles; verification is integer
    cross-multiplied. The oracle is the brutally exhaustive all-pairs
    Jaccard, so this row also PROVES the prefix filter loses nothing
    (`operators/dedup.ppjoin_pairs`). Features are shingles, not raw
    words, deliberately: on this 31-word vocabulary raw word sets are
    near-identical and the TRUE result is quadratic (~1M pairs at sf0.1,
    measured) — shingles keep the answer, and therefore the join,
    output-bounded."""
    from seccosql_spark.operators.dedup import ppjoin_pairs

    return sess.from_spark(
        ppjoin_pairs(sess.spark.table("documents"), threshold_num=1, threshold_den=2)
    )


EDIT_VERIFY_ORACLE = f"""
WITH pairs AS ({MINHASH_SHINGLE_ORACLE})
SELECT p.id1, p.id2,
       CAST(levenshtein(a.text, b.text) AS INT) AS edit_distance
FROM pairs p
JOIN documents a ON p.id1 = a.doc_id
JOIN documents b ON p.id2 = b.doc_id
WHERE levenshtein(a.text, b.text) <= 40
"""


@register("dedup_edit_distance_verify", EDIT_VERIFY_ORACLE)
def dedup_edit_distance_verify(sess: SeccoSession):
    """Character-level verification tier: MinHash-LSH candidates (threshold
    0.5, 3-shingles — the already-verified generator) re-verified by EDIT
    DISTANCE <= 40, the metric that catches word-order-preserving character
    edits Jaccard ignores. levenshtein() is the classic DP in both engines
    (integer-exact parity, spot-pinned); running it ONLY on the bucketed
    candidate set is the entire scale story — O(|candidates| * len^2), not
    O(n^2 * len^2). Output (id1, id2, edit_distance)."""
    docs = sess.spark.table("documents")
    pairs = minhash_near_dups(docs, threshold=0.5, shingle_n=3).select("id1", "id2")
    a = docs.select(F.col("doc_id").alias("id1"), F.col("text").alias("__t1"))
    b = docs.select(F.col("doc_id").alias("id2"), F.col("text").alias("__t2"))
    return sess.from_spark(
        pairs.join(a, "id1")
        .join(b, "id2")
        .select(
            "id1", "id2", F.levenshtein("__t1", "__t2").cast("int").alias("edit_distance")
        )
        .filter(F.col("edit_distance") <= 40)
    )


# ---------------------------------------------------------------------------
# Sketch-accuracy audit: MinHash-estimated Jaccard vs the exact value on
# every LSH candidate pair — the measurement that justifies trusting the
# sketch at scales where exact verification is unaffordable.
# ---------------------------------------------------------------------------

def _minhash_est_oracle(words_sql: str, num_hashes: int = 8, band_size: int = 4) -> str:
    """_minhash_oracle's pipeline (same constants), extended with the
    per-pair count of matching signature components: est = nmatch/8 vs the
    exact shared-shingle Jaccard, plus the absolute error."""
    from seccosql_spark.operators.dedup import MINHASH_COEFFS, MINHASH_PRIME

    seeds = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    )
    band_parts = " || '|' || ".join(
        f"max(CASE WHEN j % {band_size} = {i} THEN m END)" for i in range(band_size)
    )
    return f"""
WITH words AS ({words_sql}),
hs AS (SELECT id, CAST({_h32_sql()} AS BIGINT) AS h32 FROM words),
seeds AS (SELECT * FROM (VALUES {seeds}) t(j, a, b)),
mh AS (SELECT id, j, min((a * h32 + b) % {MINHASH_PRIME}) AS m
       FROM hs CROSS JOIN seeds GROUP BY id, j),
bands AS (
  SELECT id, CAST(j // {band_size} AS INT) AS band, {band_parts} AS sig
  FROM mh GROUP BY id, j // {band_size}
),
pairs AS (
  SELECT DISTINCT a.id AS id1, b.id AS id2
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.id < b.id
),
est AS (
  SELECT p.id1, p.id2, count(*) FILTER (m1.m = m2.m) AS nmatch
  FROM pairs p JOIN mh m1 ON m1.id = p.id1
               JOIN mh m2 ON m2.id = p.id2 AND m2.j = m1.j
  GROUP BY p.id1, p.id2
),
sizes AS (SELECT id, count(*) AS n FROM words GROUP BY id),
inter AS (
  SELECT p.id1, p.id2, count(*) AS i
  FROM pairs p JOIN words w1 ON w1.id = p.id1
               JOIN words w2 ON w2.id = p.id2 AND w2.w = w1.w
  GROUP BY p.id1, p.id2
)
SELECT est.id1, est.id2,
       round(est.nmatch / {num_hashes}.0, 6) AS est_jaccard,
       round(i / (s1.n + s2.n - i), 6) AS exact_jaccard,
       round(abs(est.nmatch / {num_hashes}.0 - i / (s1.n + s2.n - i)), 6) AS abs_err
FROM est JOIN inter ON est.id1 = inter.id1 AND est.id2 = inter.id2
JOIN sizes s1 ON est.id1 = s1.id JOIN sizes s2 ON est.id2 = s2.id
"""


@register("dedup_minhash_estimate_error", _minhash_est_oracle(SHINGLES_SQL))
def dedup_minhash_estimate_error(sess: SeccoSession):
    """Per-candidate-pair audit of the MinHash sketch: estimated Jaccard
    (matching components / 8) next to the exact shared-shingle Jaccard and
    the absolute error — the calibration table that tells a 100 TB corpus
    operator whether the sketch's resolution (1/8 steps here) is fit for
    their dedup threshold before they skip exact verification. The
    signature relation is computed ONCE and joined twice (broadcast — it
    is k integers per doc); the exact side reuses the bounded
    pairs-first join of exact_jaccard."""
    from seccosql_spark.operators.dedup import (
        candidate_pairs,
        exact_jaccard,
        lsh_bands,
        minhash_signatures,
        shingles,
    )

    docs = sess.spark.table("documents")
    words = shingles(docs, n=3).withColumnRenamed("s", "w")
    sig = minhash_signatures(words, num_hashes=8)
    pairs = candidate_pairs(lsh_bands(sig, band_size=4))
    nmatch = sum(
        (F.col(f"a{j}") == F.col(f"b{j}")).cast("int") for j in range(8)
    )
    s1 = sig.select(F.col("id").alias("id1"), *[F.col(f"h{j}").alias(f"a{j}") for j in range(8)])
    s2 = sig.select(F.col("id").alias("id2"), *[F.col(f"h{j}").alias(f"b{j}") for j in range(8)])
    est = (
        pairs.join(F.broadcast(s1), "id1")
        .join(F.broadcast(s2), "id2")
        .select("id1", "id2", (nmatch / F.lit(8.0)).alias("est_raw"))
    )
    exact = exact_jaccard(words, pairs).withColumnRenamed("jaccard", "exact_raw")
    return sess.from_spark(
        est.join(exact, ["id1", "id2"])
        .select(
            "id1", "id2",
            F.round("est_raw", 6).alias("est_jaccard"),
            F.round("exact_raw", 6).alias("exact_jaccard"),
            F.round(F.abs(F.col("est_raw") - F.col("exact_raw")), 6).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# C4-style cross-document span removal: the corpus REWRITE (keep one global
# copy of every repeated segment), not just the per-doc signal.
# ---------------------------------------------------------------------------

_C4_SEGMENT_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
segs AS (
  SELECT doc_id,
         unnest(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS pos,
         t
  FROM toks WHERE len(t) > 0
),
flat AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(t, pos * 8 + 1, pos * 8 + 8), ' ') AS seg
  FROM segs
),
tagged AS (
  SELECT doc_id, pos, seg,
         row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, pos) = 1 AS keep
  FROM flat
)
SELECT d.doc_id,
       count(f.pos) AS n_segments,
       CAST(coalesce(sum(CASE WHEN f.keep THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN f.keep THEN f.seg END, ' ' ORDER BY f.pos), '')
         AS clean_text
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN tagged f USING (doc_id)
GROUP BY d.doc_id
"""


@register("dedup_c4_segments", _C4_SEGMENT_ORACLE)
def dedup_c4_segments(sess: SeccoSession):
    """C4-style corpus rewrite (Raffel et al. 2020 §2.2): cut every doc
    into 8-word segments, keep exactly one global copy of each distinct
    segment (smallest (doc_id, pos) wins), and emit the surviving text per
    document. Complements `dedup_substring_windows`, which only SCORES
    duplication — this one produces the deduplicated corpus itself.
    Two bounded shuffles (segment-hash window, per-doc rebuild); segments
    explode map-side; no joins grow with pair count."""
    from seccosql_spark.operators.dedup import c4_segment_dedup

    return sess.from_spark(c4_segment_dedup(sess.spark.table("documents"), seg_words=8))


# ---------------------------------------------------------------------------
# Count-Min sketch heavy-hitter audit — the third sketch family (HLL and
# GK quantiles are covered elsewhere), fully integer-deterministic so the
# oracle replays it bit-for-bit.
# ---------------------------------------------------------------------------

_CMS_COEFFS = [(1103515245, 12345), (214013, 2531011), (69069, 1234567), (1664525, 1013904223)]
_CMS_P = 2147483647
_CMS_W = 32

_CMS_SEEDS_SQL = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(_CMS_COEFFS))

_CMS_ORACLE = f"""
WITH e AS (SELECT user_id FROM events),
seeds AS (SELECT * FROM (VALUES {_CMS_SEEDS_SQL}) t(j, a, b)),
cells AS (SELECT j, (a * user_id + b) % {_CMS_P} % {_CMS_W} AS bkt
          FROM e CROSS JOIN seeds),
counters AS (SELECT j, bkt, CAST(count(*) AS BIGINT) AS c
             FROM cells GROUP BY j, bkt),
exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM e GROUP BY user_id),
top AS (SELECT * FROM exact ORDER BY exact_cnt DESC, user_id LIMIT 10),
probes AS (SELECT user_id, exact_cnt, j,
                  (a * user_id + b) % {_CMS_P} % {_CMS_W} AS bkt
           FROM top CROSS JOIN seeds),
est AS (SELECT user_id, exact_cnt, min(c) AS cms_est
        FROM probes JOIN counters USING (j, bkt)
        GROUP BY user_id, exact_cnt)
SELECT user_id, exact_cnt, cms_est, cms_est - exact_cnt AS overestimate
FROM est
"""


@register("sketch_cms_heavy_hitters", _CMS_ORACLE)
def sketch_cms_heavy_hitters(sess: SeccoSession):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) heavy-hitter audit:
    build a d=4 x w=32 CMS over events.user_id with literal affine hashes,
    then report, for the top-10 exact heavy hitters, the exact count next
    to the CMS point estimate and its (always >= 0) overestimate — the
    calibration row that tells an operator whether a 128-cell sketch is
    tight enough before replacing an exact per-key count at 100 TB. Scale
    shape: the sketch state is FIXED (d*w cells) regardless of corpus
    size — cells explode map-side and collapse through partial aggregation;
    the probe side is 10 rows joined against the broadcast 128-row counter
    table. Everything is BIGINT arithmetic (no floats anywhere)."""
    from pyspark.sql import functions as F

    e = sess.spark.table("events").select("user_id")
    buckets = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            ((F.lit(a) * F.col("user_id") + F.lit(b)) % _CMS_P % _CMS_W).alias("bkt"),
        )
        for j, (a, b) in enumerate(_CMS_COEFFS)
    ])
    cells = e.select(F.explode(buckets).alias("s")).select("s.j", "s.bkt")
    counters = cells.groupBy("j", "bkt").agg(F.count(F.lit(1)).alias("c"))
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "user_id").limit(10)
    probes = top.select("user_id", "exact_cnt", F.explode(buckets).alias("s")).select(
        "user_id", "exact_cnt", "s.j", "s.bkt"
    )
    est = (
        probes.join(F.broadcast(counters), ["j", "bkt"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    return sess.from_spark(
        est.select(
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable quantile summary (bounded-state distributed percentiles)
# ---------------------------------------------------------------------------

_QS_B = 32  # buckets (the "nodes" whose local summaries merge)
_QS_T = 256  # kept ranks per bucket -> sketch state <= B*T rows, ~1/T rank error

_QS_ORACLE = f"""
WITH o AS (SELECT o_orderkey AS id, o_totalprice AS x FROM orders),
b AS (SELECT id, x, id % {_QS_B} AS bkt FROM o),
r AS (SELECT bkt, id, x,
             row_number() OVER (PARTITION BY bkt ORDER BY x, id) AS rn,
             count(*) OVER (PARTITION BY bkt) AS nb
      FROM b),
summ AS (
  SELECT bkt, id, x, nb,
         CASE WHEN nb - rn + 1 < (nb + {_QS_T} - 1) // {_QS_T}
              THEN nb - rn + 1 ELSE (nb + {_QS_T} - 1) // {_QS_T} END AS w
  FROM r WHERE (rn - 1) % ((nb + {_QS_T} - 1) // {_QS_T}) = 0),
tot2 AS (SELECT CAST(sum(w) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS sketch_rows
         FROM summ),
budget AS (SELECT CAST(sum((nb + {_QS_T} - 1) // {_QS_T}) AS BIGINT) AS err_budget
           FROM (SELECT DISTINCT bkt, nb FROM summ)),
cw AS (SELECT x, sum(w) OVER (ORDER BY x, id ROWS UNBOUNDED PRECEDING) AS cum
       FROM summ),
targets AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
            t(pct, num, den)),
sel AS (SELECT pct, (num * n + den - 1) // den AS r, n, sketch_rows
        FROM targets CROSS JOIN tot2),
est AS (SELECT pct, r, sketch_rows, min(x) AS est
        FROM sel JOIN cw ON cw.cum >= sel.r GROUP BY pct, r, sketch_rows),
audit AS (SELECT e.pct, e.r, e.sketch_rows, e.est,
                 CAST(sum(CASE WHEN o.x < e.est THEN 1 ELSE 0 END) AS BIGINT) AS lt,
                 CAST(sum(CASE WHEN o.x <= e.est THEN 1 ELSE 0 END) AS BIGINT) AS le
          FROM est e CROSS JOIN o GROUP BY 1, 2, 3, 4)
SELECT pct, CAST(est AS DOUBLE) AS est, sketch_rows,
       CAST(CASE WHEN r > le THEN r - le
                 WHEN r <= lt THEN lt + 1 - r
                 ELSE 0 END AS BIGINT) AS rank_err,
       (CASE WHEN r > le THEN r - le
             WHEN r <= lt THEN lt + 1 - r
             ELSE 0 END) <= (SELECT err_budget FROM budget) AS within_bound
FROM audit
"""



def _kmv_oracle(k: int = 256) -> str:
    """KMV replay: 60-bit md5 hash of each distinct (type, user), the K
    smallest per type, the (K-1)*2^60/h_K estimator in HUGEINT (Spark twin
    computes it in DECIMAL(38,0) then DIV — IntegralDivide floors on
    positives in both engines)."""
    from seccosql_spark.operators.hexint import hex_prefix_int_sql

    return f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST({hex_prefix_int_sql("md5(CAST(user_id AS STRING))", 15)}
              AS BIGINT) AS hv
  FROM events),
r AS (SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h),
ks AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_sketch,
              max(hv) AS kth
       FROM r WHERE rn <= {k} GROUP BY event_type),
ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
       FROM events GROUP BY event_type)
SELECT ks.event_type, n_sketch,
       CAST(CASE WHEN n_sketch < {k} THEN n_sketch
            ELSE CAST(CAST({k - 1} AS HUGEINT) * 1152921504606846976 // kth
                      AS BIGINT) END AS BIGINT) AS est_distinct,
       exact_distinct,
       (abs(CAST(CASE WHEN n_sketch < {k} THEN n_sketch
            ELSE CAST(CAST({k - 1} AS HUGEINT) * 1152921504606846976 // kth
                      AS BIGINT) END AS BIGINT) - exact_distinct) * 5
        <= exact_distinct) AS within_20pct
FROM ks JOIN ex USING (event_type)
"""


def _kmv_setops_oracle(k: int = 256) -> str:
    """KMV set-operation replay: per-side membership flags on each distinct
    user hash, K-smallest union sketch, (K-1)*2^60/h_K union estimate and
    the theta-sketch intersection estimator n_both * union_est // rows."""
    from seccosql_spark.operators.hexint import hex_prefix_int_sql

    return f"""
WITH u AS (
  SELECT CAST({hex_prefix_int_sql("md5(CAST(user_id AS STRING))", 15)}
              AS BIGINT) AS hv,
         bool_or(event_type = 'view') AS in_a,
         bool_or(event_type = 'click') AS in_b
  FROM events WHERE event_type IN ('view', 'click') GROUP BY user_id),
r AS (SELECT hv, in_a, in_b, row_number() OVER (ORDER BY hv) AS rn FROM u),
s AS (SELECT CAST(count(*) AS BIGINT) AS union_rows, max(hv) AS kth,
             CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_both
      FROM r WHERE rn <= {k}),
ex AS (SELECT CAST(count(*) AS BIGINT) AS union_exact,
              CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
                  AS inter_exact
       FROM u),
est AS (SELECT union_rows, n_both,
               CAST(CASE WHEN union_rows < {k} THEN union_rows
                    ELSE CAST(CAST({k - 1} AS HUGEINT) * 1152921504606846976
                              // kth AS BIGINT) END AS BIGINT) AS union_est
        FROM s)
SELECT union_rows, union_est, union_exact,
       (abs(union_est - union_exact) * 5 <= union_exact) AS union_within_20pct,
       CAST(CAST(n_both AS HUGEINT) * union_est // union_rows AS BIGINT)
           AS inter_est,
       inter_exact,
       (abs(CAST(CAST(n_both AS HUGEINT) * union_est // union_rows AS BIGINT)
            - inter_exact) * 5 <= inter_exact) AS inter_within_20pct
FROM est CROSS JOIN ex
"""


@register("sketch_kmv_setops", _kmv_setops_oracle())
def sketch_kmv_setops(sess: SeccoSession):
    """KMV sketches under SET OPERATIONS — the reason mergeable sketches
    matter at 100 TB: estimate |A ∪ B| and |A ∩ B| for A = viewing users,
    B = clicking users from two K=256 KMV sketches ALONE (theta-sketch
    style, Dasgupta et al. 2016). The union sketch is the K smallest
    hashes of sketch_A ∪ sketch_B (the KMV merge); since kth_union <=
    kth_side, a union-sketch hash lies in a side's sketch iff it lies in
    the side's SET, so per-hash membership flags are exact and the
    intersection estimator is |∩|_est = n_both · |∪|_est / K. Everything
    is deterministic 60-bit md5 integer arithmetic (DECIMAL(38,0) /
    HUGEINT for the estimator products), so the oracle replays the sketch
    bit-for-bit; the within-20% audits compare against the exact distinct
    counts integer-cross-multiplied. Below K the sketches are exact by
    construction. Scale: sketch state is K rows per side regardless of
    corpus size; the merge is a top-K over 2K rows."""
    K = 256
    spark = sess.spark
    ev = spark.table("events")
    u = (
        ev.where(F.col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "view").alias("in_a"),
            F.max(F.col("event_type") == "click").alias("in_b"),
        )
        .select(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            .alias("hv"),
            "in_a",
            "in_b",
        )
    )
    r = u.withColumn("rn", F.row_number().over(Window.orderBy("hv")))
    s = r.where(F.col("rn") <= K).agg(
        F.count(F.lit(1)).cast("long").alias("union_rows"),
        F.max("hv").alias("kth"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long"))
        .cast("long")
        .alias("n_both"),
    )
    ex = u.agg(
        F.count(F.lit(1)).cast("long").alias("union_exact"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long"))
        .cast("long")
        .alias("inter_exact"),
    )
    est = s.withColumn(
        "union_est",
        F.when(F.col("union_rows") < K, F.col("union_rows"))
        .otherwise(
            F.expr(
                f"CAST(CAST({K - 1} AS DECIMAL(38,0)) * 1152921504606846976 "
                "DIV kth AS BIGINT)"
            )
        )
        .cast("long"),
    )
    out = (
        est.crossJoin(ex)
        .withColumn(
            "inter_est",
            F.expr(
                "CAST(CAST(n_both AS DECIMAL(38,0)) * union_est "
                "DIV union_rows AS BIGINT)"
            ),
        )
        .select(
            "union_rows",
            "union_est",
            "union_exact",
            (F.abs(F.col("union_est") - F.col("union_exact")) * 5
             <= F.col("union_exact")).alias("union_within_20pct"),
            "inter_est",
            "inter_exact",
            (F.abs(F.col("inter_est") - F.col("inter_exact")) * 5
             <= F.col("inter_exact")).alias("inter_within_20pct"),
        )
    )
    return sess.from_spark(out)


@register("sketch_distinct_kmv", _kmv_oracle())
def sketch_distinct_kmv(sess: SeccoSession):
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002) —
    the deterministic, MERGEABLE alternative to HyperLogLog for
    cross-engine work: hash every (type, user) to a 60-bit md5 integer,
    keep the K=256 smallest distinct hashes per type, estimate
    distinct ≈ (K-1)·2^60 / h_K. Engine HLLs are not replayable across
    implementations; KMV is pure SQL, so the oracle replays it exactly,
    and the sketch MERGES by construction (the K smallest of a union =
    the K smallest of the per-partition K-smallest — Spark's partial
    row_number/top-K aggregation IS the merge, the same property
    `sketch_quantile_mergeable` demonstrates for quantiles). Below K the
    sketch is exact; above, the standard error is 1/sqrt(K) ≈ 6.3%
    (measured 6.4 % at sf0.1). The estimator runs in DECIMAL(38,0) —
    255·2^60 overflows int64 — and the within-20% audit is integer
    cross-multiplied. Scale: one distinct + one top-K aggregation per
    group; sketch state is K rows per group regardless of corpus size."""
    K = 256
    spark = sess.spark
    ev = spark.table("events")
    h = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("hv"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    ks = (
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= K)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("hv").alias("kth"),
        )
    )
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    est = F.when(F.col("n_sketch") < K, F.col("n_sketch")).otherwise(
        F.expr(
            f"CAST(CAST({K - 1} AS DECIMAL(38,0)) * 1152921504606846976 "
            "DIV kth AS BIGINT)"
        )
    ).cast("long")
    out = (
        ks.join(ex, "event_type")
        .withColumn("est_distinct", est)
        .select(
            "event_type",
            "n_sketch",
            "est_distinct",
            "exact_distinct",
            (
                F.abs(F.col("est_distinct") - F.col("exact_distinct")) * 5
                <= F.col("exact_distinct")
            ).alias("within_20pct"),
        )
    )
    return sess.from_spark(out)


@register("sketch_quantile_mergeable", _QS_ORACLE)
def sketch_quantile_mergeable(sess: SeccoSession):
    """Mergeable quantile summary (the MRL/GK family's simplest sound
    member): each of {_QS_B} hash buckets — stand-ins for the cluster
    nodes whose partial states a 100 TB aggregation would merge — keeps
    every ceil(nb/{_QS_T})-th element of its locally sorted values with
    the rank-span it represents as an integer weight. The merged summary
    is <= B*T rows REGARDLESS of input size; a weighted cumulative-rank
    selection over it answers P50/P90/P99, and the query audits itself:
    the estimate's TRUE rank error (exact counts, one conditional
    aggregation pass — no global sort of the data anywhere) must stay
    within the provable budget sum_b ceil(nb/T). All-integer ranks and
    DECIMAL value ordering; the only per-value state is the bounded
    summary, so the plan survives any scale-up by construction."""
    orders = sess.spark.table("orders").select(
        F.col("o_orderkey").alias("id"), F.col("o_totalprice").alias("x")
    )
    b = orders.withColumn("bkt", F.col("id") % _QS_B)
    wloc = Window.partitionBy("bkt").orderBy("x", "id")
    r = b.select(
        "bkt", "id", "x",
        F.row_number().over(wloc).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("bkt")).alias("nb"),
    )
    k = F.expr(f"(nb + {_QS_T} - 1) DIV {_QS_T}")
    summ = (
        r.filter(((F.col("rn") - 1) % k) == 0)
        .select(
            "bkt", "id", "x", "nb",
            F.least(k, F.col("nb") - F.col("rn") + 1).alias("w"),
        )
        .localCheckpoint(eager=True)  # the bounded sketch state (<= B*T rows)
    )
    tot = summ.agg(
        F.sum("w").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("sketch_rows"),
    )
    budget = (
        summ.select("bkt", "nb").distinct()
        .agg(F.sum(F.expr(f"(nb + {_QS_T} - 1) DIV {_QS_T}")).cast("long").alias("err_budget"))
    )
    cw = summ.select(
        "x",
        F.sum("w").over(
            Window.orderBy("x", "id").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
    )
    targets = sess.spark.createDataFrame(
        [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)], "pct STRING, num INT, den INT"
    )
    sel = targets.crossJoin(F.broadcast(tot)).select(
        "pct",
        F.expr("(num * n + den - 1) DIV den").alias("r"),
        "sketch_rows",
    )
    est = (
        sel.join(F.broadcast(cw), F.col("cum") >= F.col("r"))
        .groupBy("pct", "r", "sketch_rows")
        .agg(F.min("x").alias("est"))
    )
    audit = (
        orders.crossJoin(F.broadcast(est))
        .groupBy("pct", "r", "sketch_rows", "est")
        .agg(
            F.sum(F.when(F.col("x") < F.col("est"), 1).otherwise(0)).cast("long").alias("lt"),
            F.sum(F.when(F.col("x") <= F.col("est"), 1).otherwise(0)).cast("long").alias("le"),
        )
    )
    err = (
        F.when(F.col("r") > F.col("le"), F.col("r") - F.col("le"))
        .when(F.col("r") <= F.col("lt"), F.col("lt") + 1 - F.col("r"))
        .otherwise(0)
    )
    return sess.from_spark(
        audit.crossJoin(F.broadcast(budget)).select(
            "pct",
            F.col("est").cast("double").alias("est"),
            "sketch_rows",
            err.cast("long").alias("rank_err"),
            (err <= F.col("err_budget")).alias("within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# Near-dup CLUSTERS: pairs -> connected components -> canonical keeper.
# The step after pair detection that an actual dedup pass ships: transitive
# closure of the near-dup relation, one canonical doc kept per cluster.
# ---------------------------------------------------------------------------

_CLUSTERS_ORACLE = f"""
WITH RECURSIVE lshp AS MATERIALIZED ({MINHASH_SHINGLE_ORACLE}),
e AS MATERIALIZED (
  SELECT id1 AS a, id2 AS b FROM lshp
  UNION SELECT id2, id1 FROM lshp),
nodes AS MATERIALIZED (SELECT DISTINCT a AS id FROM e),
walk(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT w.id, e.b FROM walk w JOIN e ON e.a = w.r),
comp AS (SELECT id, min(r) AS component FROM walk GROUP BY id)
SELECT CAST(component AS BIGINT) AS canonical_id,
       CAST(count(*) AS BIGINT) AS cluster_size,
       CAST(sum(id) AS BIGINT) AS id_sum
FROM comp GROUP BY component
"""


@register("dedup_minhash_clusters", _CLUSTERS_ORACLE)
def dedup_minhash_clusters(sess: SeccoSession):
    """The dedup decision a pipeline actually ships: MinHash-LSH near-dup
    PAIRS (same parameters as `dedup_minhash_lsh`) closed into CLUSTERS by
    min-id label propagation (`graph.algorithms.connected_components` —
    O(diameter) rounds, integer-only), one row per cluster: the canonical
    keeper (min doc_id), the cluster size, and the member id-sum. Every
    non-canonical member is a deletion candidate; the keep-set is
    `documents` minus those. Scale shape: the pair graph is sparse by
    construction (bucketed LSH candidates, skew-capped), the closure
    state is O(nodes-in-pairs), and the oracle replays the closure as a
    recursive CTE over the SAME LSH-replayed pair set (not the exact
    all-pairs set: at sf0.1 LSH finds 252 of the 256 exact pairs, so an
    exact-pair oracle diverges — found by the r10 sf0.1 sweep; this row
    verifies the closure + canonicalization, while LSH recall itself is
    measured by dedup_minhash_estimate_error)."""
    from seccosql_spark.graph.algorithms import connected_components

    pairs = minhash_near_dups(
        sess.spark.table("documents"), threshold=0.5, shingle_n=3
    ).select("id1", "id2")
    # strict: a dup chain with diameter > the round budget must raise, not
    # silently split clusters the oracle's fixpoint closure would merge
    comp = connected_components(pairs, src="id1", dst="id2", strict=True)
    return sess.from_spark(
        comp.groupBy(F.col("component").cast("long").alias("canonical_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.sum("id").cast("long").alias("id_sum"),
        )
    )


def _ivf_pq_oracle(
    kc: int = 4, nprobe: int = 2, m: int = 4, s: int = 16, k: int = 4,
    topn: int = 10, rerank_r: int = 150,
) -> str:
    """IVF+PQ+refine replay: the KMEANS_ORACLE recipe on the full vector
    for the coarse cells, the probe's nprobe nearest cells by the same
    left-fold distance (ties by cid), the _pq_parts codebooks + ADC tables
    with the candidate filter applied, the R-deep ADC shortlist, and the
    exact-distance rerank of that shortlist."""
    parts, joins, cols = _pq_parts(m, s, k)
    dim = m * s
    coarse = f"""
cv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cinit AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS c
          FROM cv QUALIFY row_number() OVER (ORDER BY vec_id) <= {kc}),
ca1 AS (SELECT vec_id, cid,
              list_sum(list_transform(range(1, {dim} + 1),
                                      i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist
        FROM cv CROSS JOIN cinit),
cs1 AS (SELECT vec_id, cid FROM ca1
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
cm1 AS (SELECT cid, pos,
              CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS c
        FROM (SELECT cs1.cid AS cid, unnest(cv.v) AS x,
                     generate_subscripts(cv.v, 1) AS pos
              FROM cv JOIN cs1 USING (vec_id))
        GROUP BY cid, pos),
cc1 AS (SELECT cid, list(c ORDER BY pos) AS c FROM cm1 GROUP BY cid),
ca2 AS (SELECT vec_id, cid,
              list_sum(list_transform(range(1, {dim} + 1),
                                      i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist
        FROM cv CROSS JOIN cc1),
cells AS (SELECT vec_id, CAST(cid AS INT) AS cell FROM ca2
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
       WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
qcell AS (SELECT cc1.cid FROM cc1 CROSS JOIN qv
          ORDER BY list_sum(list_transform(range(1, {dim} + 1),
                   i -> (qv.v[i] - cc1.c[i]) * (qv.v[i] - cc1.c[i]))), cc1.cid
          LIMIT {nprobe}),
cand AS (SELECT cells.vec_id, cells.cell
         FROM cells JOIN qcell ON cells.cell = qcell.cid)"""
    adc = []
    for j in range(m):
        adc.append(f"""
d{j}t AS (SELECT cid, round(list_sum(list_transform(range(1, {s} + 1),
                 i -> (qv.v[{j * s} + i] - c.c[i]) * (qv.v[{j * s} + i] - c.c[i]))), 9) AS d
          FROM c{j}x c CROSS JOIN qv)""")
    code_joins = " ".join(f"JOIN d{j}t ON codes.c{j} = d{j}t.cid" for j in range(m))
    total = " + ".join(f"d{j}t.d" for j in range(m))
    return (
        "WITH " + coarse + "," + ",".join(parts) + "," + ",".join(adc)
        + f""",
codes AS (SELECT vec_id, {cols} FROM f0x {joins}),
short AS (SELECT cand.vec_id, cand.cell, {total} AS adc_dist
          FROM cand JOIN codes USING (vec_id) {code_joins}
          ORDER BY adc_dist, cand.vec_id LIMIT {rerank_r})
SELECT s.vec_id, s.cell,
       round(list_sum(list_transform(range(1, {m * s} + 1),
             i -> (cv.v[i] - qv.v[i]) * (cv.v[i] - qv.v[i]))), 9) AS dist
FROM short s JOIN cv ON cv.vec_id = s.vec_id CROSS JOIN qv
ORDER BY dist, s.vec_id LIMIT {topn}"""
    )


@register("ann_ivf_pq", _ivf_pq_oracle())
def ann_ivf_pq(sess: SeccoSession):
    """The composed IVF+PQ+refine search — learned coarse quantizer routes
    the probe to 2 of 4 inverted lists, PQ asymmetric distances shortlist
    150 candidates from ONLY those lists, and an exact-distance rerank
    ranks the final 10 (operators/similarity.ivf_pq_topk — exactly FAISS's
    IVFADC + IndexRefineFlat stack). The missing middle between
    `ann_ivf_kmeans` (routing alone) and `ann_pq_adc_topk` (full-corpus
    ADC): at 100 TB the coarse cell predicate is partition pruning, the
    ADC scan touches nprobe/k_coarse of the corpus, and only R=150 rows
    ever pay full-dimension arithmetic. Measured: routing recall 1.0,
    rerank restores recall@10 to 1.0 where raw 4-bit ADC gives 0.2 on the
    unstructured synthetic vectors (test_ivf_pq_rerank_recall). The oracle
    replays coarse training, routing, all codebooks, the ADC shortlist,
    and the exact rerank."""
    from seccosql_spark.operators.similarity import ivf_pq_topk

    return sess.from_spark(ivf_pq_topk(sess.spark.table("embeddings")))


def _ivf_pq_persisted_oracle(
    kc: int = 4, nprobe: int = 2, m: int = 4, s: int = 16, k: int = 4,
    topn: int = 10, rerank_r: int = 150, nq: int = 3,
) -> str:
    """Build-AND-probe replay for the persisted-index row: identical coarse
    and PQ training to _ivf_pq_oracle (the artifact the build phase wrote
    is a pure function of the corpus, so replaying training IS replaying
    the index), then the multi-probe batch — per-probe cell routing, ADC
    tables, shortlist, and exact rerank, all QUALIFY-partitioned by the
    probe id."""
    parts, joins, cols = _pq_parts(m, s, k)
    dim = m * s
    coarse = f"""
cv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cinit AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS c
          FROM cv QUALIFY row_number() OVER (ORDER BY vec_id) <= {kc}),
ca1 AS (SELECT vec_id, cid,
              list_sum(list_transform(range(1, {dim} + 1),
                                      i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist
        FROM cv CROSS JOIN cinit),
cs1 AS (SELECT vec_id, cid FROM ca1
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
cm1 AS (SELECT cid, pos,
              CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS c
        FROM (SELECT cs1.cid AS cid, unnest(cv.v) AS x,
                     generate_subscripts(cv.v, 1) AS pos
              FROM cv JOIN cs1 USING (vec_id))
        GROUP BY cid, pos),
cc1 AS (SELECT cid, list(c ORDER BY pos) AS c FROM cm1 GROUP BY cid),
ca2 AS (SELECT vec_id, cid,
              list_sum(list_transform(range(1, {dim} + 1),
                                      i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist
        FROM cv CROSS JOIN cc1),
cells AS (SELECT vec_id, CAST(cid AS INT) AS cell FROM ca2
          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1),
qv AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS v FROM embeddings
       WHERE vec_id < {nq}),
qcells AS (SELECT qid, cid AS cell FROM (
  SELECT qv.qid, cc1.cid,
         row_number() OVER (PARTITION BY qv.qid
           ORDER BY list_sum(list_transform(range(1, {dim} + 1),
                    i -> (qv.v[i] - cc1.c[i]) * (qv.v[i] - cc1.c[i]))), cc1.cid) AS rn
  FROM qv CROSS JOIN cc1) WHERE rn <= {nprobe}),
cand AS (SELECT q.qid, cells.vec_id, cells.cell
         FROM cells JOIN qcells q ON cells.cell = q.cell)"""
    adc = []
    for j in range(m):
        adc.append(f"""
d{j}t AS (SELECT qv.qid, c.cid, round(list_sum(list_transform(range(1, {s} + 1),
                 i -> (qv.v[{j * s} + i] - c.c[i]) * (qv.v[{j * s} + i] - c.c[i]))), 9) AS d
          FROM c{j}x c CROSS JOIN qv)""")
    code_joins = " ".join(
        f"JOIN d{j}t ON d{j}t.qid = cand.qid AND codes.c{j} = d{j}t.cid"
        for j in range(m)
    )
    total = " + ".join(f"d{j}t.d" for j in range(m))
    return (
        "WITH " + coarse + "," + ",".join(parts) + "," + ",".join(adc)
        + f""",
codes AS (SELECT vec_id, {cols} FROM f0x {joins}),
short AS (SELECT qid, vec_id, cell FROM (
  SELECT cand.qid, cand.vec_id, cand.cell,
         row_number() OVER (PARTITION BY cand.qid
                            ORDER BY {total}, cand.vec_id) AS rn
  FROM cand JOIN codes USING (vec_id) {code_joins}) WHERE rn <= {rerank_r})
SELECT CAST(qid AS BIGINT) AS query_id, vec_id, CAST(cell AS INT) AS cell,
       dist, CAST(rn AS INT) AS rank
FROM (
  SELECT s.qid, s.vec_id, s.cell,
         round(list_sum(list_transform(range(1, {dim} + 1),
               i -> (cv.v[i] - qv.v[i]) * (cv.v[i] - qv.v[i]))), 9) AS dist,
         row_number() OVER (PARTITION BY s.qid
           ORDER BY round(list_sum(list_transform(range(1, {dim} + 1),
                    i -> (cv.v[i] - qv.v[i]) * (cv.v[i] - qv.v[i]))), 9),
                    s.vec_id) AS rn
  FROM short s JOIN cv ON cv.vec_id = s.vec_id
       JOIN qv ON qv.qid = s.qid
) WHERE rn <= {topn}"""
    )


@register("ann_index_persisted", _ivf_pq_persisted_oracle())
def ann_index_persisted(sess: SeccoSession):
    """Build-once / probe-many ANN (VERDICT r10 task 5): the IVF+PQ
    artifacts — coarse centroids, per-subspace codebooks, and the
    cell-PARTITIONED codes+vectors table — are trained once and persisted
    as parquet (`operators.similarity.build_ivf_pq_index`), then a batch
    of 3 probes is answered by `ivf_pq_index_probe` with a PURE JOIN plan:
    broadcast centroid routing, broadcast ADC tables, a cell-key join into
    the partitioned codes table (partition pruning = the inverted-list
    seek), per-probe ADC shortlist, exact rerank against the stored
    full-precision vectors. No k-means, no corpus scan in the probe plan —
    the production retrieval shape at 100 TB, where the index is a
    scheduled artifact and probes are the hot path
    (`test_ann_index_persisted_probe_plan` pins the no-retraining plan).
    The index is cached on disk keyed by (corpus file, parameters): the
    first run in a session builds, every later run probes only. The
    oracle replays training + the multi-probe batch from the raw corpus —
    the artifact is a pure function of the corpus, so replaying the build
    IS replaying the index."""
    from seccosql_spark.operators import similarity as _sim
    from seccosql_spark.operators.artifact import build_once
    from seccosql_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_index_probe,
    )

    spark = sess.spark
    emb = spark.table("embeddings")
    src_file = sorted(emb.inputFiles())[0]
    # key = corpus file + params + the builder MODULE's source text: an
    # edit to the training code lands in a fresh directory instead of
    # serving a stale index against a freshly-replayed oracle
    index_dir = build_once(
        "secco_ann_index",
        (src_file, "kc4,np2,m4,k4,it2"),
        lambda d: build_ivf_pq_index(emb, d, k_coarse=4, m=4, k=4, iters=2),
        code=(_sim,),
    )
    probes = emb.where(F.col("vec_id") < 3)
    return sess.from_spark(
        ivf_pq_index_probe(spark, index_dir, probes, nprobe=2, m=4, topn=10,
                           rerank_r=150)
    )


from seccosql_spark.queries.text_stats import SPLIT_CASE_SQL, split_expr  # noqa: E402

LEAKAGE_ORACLE = f"""
WITH pairs AS ({MINHASH_SHINGLE_ORACLE}),
sp AS (
  SELECT doc_id, {SPLIT_CASE_SQL} AS split
  FROM documents)
SELECT least(s1.split, s2.split) AS split_a,
       greatest(s1.split, s2.split) AS split_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       min(CAST(p.id1 AS VARCHAR) || ':' || CAST(p.id2 AS VARCHAR)) AS example_pair
FROM pairs p
JOIN sp s1 ON p.id1 = s1.doc_id
JOIN sp s2 ON p.id2 = s2.doc_id
WHERE s1.split <> s2.split
GROUP BY least(s1.split, s2.split), greatest(s1.split, s2.split)
"""


@register("split_leakage_report", LEAKAGE_ORACLE)
def split_leakage_report(sess: SeccoSession):
    """Cross-split contamination audit — THE eval-integrity check an LLM
    pipeline runs before trusting any held-out number: near-duplicate
    pairs (the `dedup_minhash_lsh` LSH pipeline, Jaccard >= 0.5) that
    straddle the deterministic train/val/test assignment
    (`split_train_val_test`'s md5 thresholds). A val/test document with a
    train-side near-dup IS leakage; the report counts them per split pair
    with a deterministic example (min encoded id pair). Composition of
    two already-verified pieces, so the row certifies the COMPOSITION:
    pairs joined twice against the split map, cross-split only.
    Scale shape: the LSH candidate generation dominates (bucketed, same
    as the dedup row); the split map is a map-only projection and the
    two joins are id-keyed. The example is the lexicographic-min
    'id1:id2' string — collision-free at any id scale (a numeric
    id1*K+id2 encoding would alias once ids exceed K)."""
    docs = sess.spark.table("documents")
    pairs = minhash_near_dups(docs, threshold=0.5, shingle_n=3).select("id1", "id2")
    sp = docs.select("doc_id", split_expr().alias("split"))
    j = (
        pairs.join(sp.select(F.col("doc_id").alias("id1"), F.col("split").alias("s1")), "id1")
        .join(sp.select(F.col("doc_id").alias("id2"), F.col("split").alias("s2")), "id2")
        .where(F.col("s1") != F.col("s2"))
    )
    out = (
        j.select(
            F.least("s1", "s2").alias("split_a"),
            F.greatest("s1", "s2").alias("split_b"),
            F.concat_ws(":", F.col("id1"), F.col("id2")).alias("enc"),
        )
        .groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("enc").alias("example_pair"),
        )
    )
    return sess.from_spark(out)


CROSS_SOURCE_ORACLE = f"""
WITH pairs AS ({MINHASH_SHINGLE_ORACLE}),
src AS (SELECT doc_id, source FROM documents)
SELECT least(a.source, b.source) AS source_a,
       greatest(a.source, b.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_dup_pairs
FROM pairs p
JOIN src a ON p.id1 = a.doc_id
JOIN src b ON p.id2 = b.doc_id
WHERE a.source <> b.source
GROUP BY least(a.source, b.source), greatest(a.source, b.source)
"""


@register("dedup_cross_source_overlap", CROSS_SOURCE_ORACLE)
def dedup_cross_source_overlap(sess: SeccoSession):
    """Cross-source duplication audit — which corpus sources copy each
    other: near-duplicate pairs (the LSH pipeline) whose endpoints live in
    DIFFERENT sources, counted per unordered source pair. The provenance
    signal behind dedup-priority and licensing decisions (a source that is
    mostly near-dups of another adds tokens, not information). Same
    composition discipline as `split_leakage_report`: two id-keyed joins
    against a map-only source lookup over the bucketed LSH candidates —
    nothing new shuffles at scale."""
    docs = sess.spark.table("documents")
    pairs = minhash_near_dups(docs, threshold=0.5, shingle_n=3).select("id1", "id2")
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(src.select(F.col("doc_id").alias("id1"), F.col("source").alias("sa")), "id1")
        .join(src.select(F.col("doc_id").alias("id2"), F.col("source").alias("sb")), "id2")
        .where(F.col("sa") != F.col("sb"))
    )
    out = (
        j.groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_pairs"))
    )
    return sess.from_spark(out)


CENTROID_MARGIN_ORACLE = """
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
m AS (SELECT label AS lbl, pos,
             CAST(sum(CAST(round(x, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS c
      FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos
            FROM v)
      GROUP BY lbl, pos),
cl AS (SELECT lbl, list(c ORDER BY pos) AS c FROM m GROUP BY lbl),
s AS (SELECT vec_id, label, lbl,
             round(list_dot_product(v, c) /
                   (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c))),
                   6) AS sim
      FROM v CROSS JOIN cl),
ab AS (SELECT vec_id, label,
              max(CASE WHEN lbl = label THEN sim END) AS a,
              max(CASE WHEN lbl <> label THEN sim END) AS b
       FROM s GROUP BY vec_id, label)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(CAST(sum(CAST(round(a - b, 9) AS DECIMAL(28,9))) AS DOUBLE)
             / count(*), 6) AS mean_margin,
       CAST(sum(CASE WHEN a > b THEN 1 ELSE 0 END) AS BIGINT) AS n_separated
FROM ab GROUP BY label
"""


@register("embed_centroid_margin", CENTROID_MARGIN_ORACLE)
def embed_centroid_margin(sess: SeccoSession):
    """Embedding-space cluster quality: the centroid-margin (silhouette-
    lite) report a pipeline runs before trusting a labeling/clustering for
    semantic dedup or stratified sampling. Per vector: a = cosine to its
    OWN label centroid, b = the best cosine to any OTHER label centroid;
    margin = a - b (positive = the vector sits closer to its own cluster
    than to the nearest rival — the silhouette sign test without the
    full O(n^2) pairwise matrix, which is the standard scale
    substitution). Reported per label: n, mean margin, count separated.

    Scale shape: the k x dim centroid table is the ONLY thing that leaves
    the executors (label_centroids' decimal-exact per-dimension means),
    then margins are a MAP-ONLY projection — centroids ride the task
    closure as literals (the kmeans_assign pattern), each vector computes
    k dots in whole-stage codegen, and the final agg is k groups. No
    joins, no per-pair shuffle, corpus streamed once per pass. Float
    discipline: sims rounded to 6dp (cross-engine rank/compare safety),
    margins summed via round(.,9)::DECIMAL(28,9) — never raw doubles.
    On i.i.d.-random testdata vectors the margins hover near zero by
    construction (labels carry no geometry); the report's value is that
    both engines agree on them EXACTLY."""
    from seccosql_spark.operators.similarity import (
        _as_double,
        dot,
        label_centroids,
        norm,
    )

    spark = sess.spark
    emb = spark.table("embeddings")
    cent_rows = label_centroids(emb).collect()
    by_lbl: dict[int, dict[int, float]] = {}
    for r in cent_rows:
        by_lbl.setdefault(r["bucket"], {})[r["pos"]] = r["centroid"]
    probes = [
        (int(lbl), [poss[p] for p in sorted(poss)])
        for lbl, poss in sorted(by_lbl.items())
    ]
    base = emb.select(
        "label", _as_double(F.col("embedding")).alias("v")
    ).withColumn("vn", norm(F.col("v")))
    sims = F.array(
        *[
            F.struct(
                F.lit(lbl).alias("lbl"),
                F.round(
                    dot(F.col("v"), F.lit(c)) / (F.col("vn") * norm(F.lit(c))), 6
                ).alias("sim"),
            )
            for lbl, c in probes
        ]
    )
    ab = base.select(
        "label",
        F.element_at(F.filter(sims, lambda s: s["lbl"] == F.col("label")), 1)[
            "sim"
        ].alias("a"),
        F.array_max(
            F.transform(
                F.filter(sims, lambda s: s["lbl"] != F.col("label")),
                lambda s: s["sim"],
            )
        ).alias("b"),
    )
    out = ab.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(
            F.sum(F.round(F.col("a") - F.col("b"), 9).cast("decimal(28,9)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mean_margin"),
        F.sum(F.when(F.col("a") > F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("n_separated"),
    )
    return sess.from_spark(out)
