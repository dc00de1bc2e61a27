"""Similarity search over embedding columns (array<float>).

Two paths, per the scale plan:

- ``cosine_topk``: brute-force cosine top-k — the exact baseline. The
  candidate side is streamed against a (small) broadcast query set, so the
  plan is one scan + one shuffle for the per-query top-k; cost is linear in
  the corpus, embarrassingly partition-parallel.
- ``ivf_topk``: IVF-style bucketed search — candidates are restricted to the
  query's coarse partition (here the `label` column stands in for a learned
  centroid assignment; at 100 TB the partition column IS the layout key, so
  bucket pruning happens at the parquet scan).

Dot products run JVM-side via ``F.zip_with`` + ``F.aggregate`` (left fold in
array order, double precision) — no Python UDF in the hot path. Similarities
are rounded before ranking so the DuckDB oracle (which sums the same values
in the same order) stays bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i, left-fold in array order, all double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors for each query row. Output (query_id, neighbor_id,
    rank, sim). Ranking uses the ROUNDED similarity (ties broken by neighbor
    id) so cross-engine last-bit float drift cannot flip ranks."""
    # Norms are hoisted into the per-side projections: computed ONCE per
    # vector instead of once per (query, candidate) pair — 3× fewer array
    # folds on the hot path, bit-identical result (dot/(qn*cn) evaluates
    # the same doubles regardless of where the norms were computed).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
        norm(_as_double(F.col(vec_col))).alias("__qn"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
        norm(_as_double(F.col(vec_col))).alias("__cn"),
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
                round_digits,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-bucketed top-k: candidates share the query's coarse bucket. Same
    output shape as cosine_topk. At scale the bucket equi-join prunes the
    scan instead of the cross join doing all-pairs work."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
        norm(_as_double(F.col(vec_col))).alias("__qn"),
        F.col(bucket_col).alias("__qb"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cv"),
        norm(_as_double(F.col(vec_col))).alias("__cn"),
        F.col(bucket_col).alias("__cb"),
    )
    sims = (
        F.broadcast(q)
        .join(c, F.col("__qb") == F.col("__cb"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
                round_digits,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    round_digits: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within coarse buckets:
    (id1, id2, sim) with sim >= threshold, id1 < id2. The bucket join keeps
    the pair generation subquadratic (per-bucket quadratic only).

    `max_bucket_size`: skew guard — buckets larger than the cap are dropped
    from pair generation (a degenerate bucket of near-identical vectors is
    better served by exact dedup). Off by default to match the exhaustive
    oracle."""
    if max_bucket_size is not None:
        sizes = emb.groupBy(F.col(bucket_col).alias("__gb")).agg(
            F.count(F.lit(1)).alias("__bn")
        )
        emb = (
            emb.join(sizes, emb[bucket_col] == F.col("__gb"))
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__gb", "__bn")
        )
    a = emb.select(
        F.col(id_col).alias("id1"),
        _as_double(F.col(vec_col)).alias("__v1"),
        norm(_as_double(F.col(vec_col))).alias("__n1"),
        F.col(bucket_col).alias("__b"),
    )
    b = emb.select(
        F.col(id_col).alias("id2"),
        _as_double(F.col(vec_col)).alias("__v2"),
        norm(_as_double(F.col(vec_col))).alias("__n2"),
        F.col(bucket_col).alias("__b2"),
    )
    return (
        a.join(b, F.col("__b") == F.col("__b2"))
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(
                dot(F.col("__v1"), F.col("__v2")) / (F.col("__n1") * F.col("__n2")),
                round_digits,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def label_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """Per-bucket centroids as (bucket, pos, centroid) rows — the training
    step for IVF coarse quantization. posexplode + per-dimension exact
    decimal sums keep the result engine- and order-independent; one shuffle
    on (bucket, pos)."""
    exploded = emb.select(
        F.col(bucket_col).alias("bucket"),
        F.posexplode(_as_double(F.col(vec_col))).alias("pos", "v"),
    )
    return (
        exploded.groupBy("bucket", "pos")
        .agg(
            (
                # round BEFORE the decimal cast: float32 inputs are dyadic
                # and land EXACTLY on 9th-decimal ties (e.g. 0.1494140625),
                # where Spark's cast rounds HALF_UP but DuckDB's half-even —
                # round(x, 9) is ties-away in BOTH engines (sf0.1 sweep find)
                F.sum(F.round(F.col("v"), 9).cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid")
        )
    )


def sq_dist(a: Column, b: Column) -> Column:
    """Σ (a_i - b_i)², left-fold in array order, all double — deterministic
    and engine-portable for identical inputs (DuckDB's list_sum folds the
    same way; verified on noise-sensitive sums)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding column — the real
    IVF coarse-quantizer training step (`label_centroids` assumes the
    partition is given; this LEARNS it). Returns (cid, c: array<double>).

    Engine-portable determinism, so a SQL oracle can replay training:
    - init = the vectors of the k smallest ids (no RNG);
    - assignment = argmin squared-L2, ties broken by smallest cid, distances
      left-folded in array order (`sq_dist`);
    - update = per-dimension DECIMAL(28,9)-exact mean (same recipe as
      `label_centroids`, so summation order cannot perturb the result);
      clusters that lose all members simply drop out (both engines alike).

    Scale shape: per iteration ONE distributed job — broadcast k×dim
    centroids, map-side argmin against the streamed corpus, one (cid, pos)
    aggregation; only k×dim centroid values ever reach the driver (the same
    driver footprint as Spark MLlib's KMeans). The corpus is scanned `iters`
    times and never cached — at 100 TB you'd persist the (id, cid)
    assignment of the final pass, which is what `kmeans_assign` emits."""
    if k < 1 or iters < 1:
        raise ValueError(f"k and iters must be >= 1, got k={k} iters={iters}")
    spark = emb.sparkSession
    v = emb.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    init = v.orderBy("id").limit(k).collect()
    cent = [(cid, list(r["v"])) for cid, r in enumerate(init)]
    if not cent:
        raise ValueError("kmeans_fit: empty input")
    for _ in range(iters - 1):
        means = (
            v.select(_nearest_cid(F.col("v"), cent).alias("cid"), "v")
            .select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                (
                    F.sum(F.round(F.col("x"), 9).cast("decimal(28,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("c")
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["c"]
        cent = [
            (cid, [poss[p] for p in sorted(poss)]) for cid, poss in sorted(by_cid.items())
        ]
    return spark.createDataFrame(cent, "cid INT, c ARRAY<DOUBLE>")


def kmeans_assign(
    emb: DataFrame,
    centroids: DataFrame | list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid): each vector's nearest centroid (squared L2, ties to the
    smallest cid). The k×dim centroid table rides the task closure as a
    LITERAL array of (dist, cid) probe structs, so assignment is a map-only
    projection inside whole-stage codegen — ZERO shuffle and zero join; the
    corpus streams once. (A crossJoin+groupBy formulation would re-shuffle
    the whole corpus on id just to argmin k numbers per row.)"""
    if isinstance(centroids, DataFrame):
        centroids = [(r["cid"], list(r["c"])) for r in centroids.collect()]
    return emb.select(
        F.col(id_col).alias("id"),
        _nearest_cid(_as_double(F.col(vec_col)), centroids).alias("cid"),
    )


def _nearest_cid(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Argmin-by-(dist, cid) over literal centroids. A vector whose length
    differs from the centroids' dim would null-pad through zip_with and
    silently misassign — fail the row loudly instead (same hard-guard
    pattern as lsh_hyperplane_bands)."""
    dim = len(centroids[0][1])
    vec = F.when(F.size(vec) == dim, vec).otherwise(
        F.raise_error(
            F.concat(
                F.lit("kmeans: vector length "),
                F.size(vec).cast("string"),
                F.lit(f" != centroid dim {dim}"),
            )
        )
    )
    probes = F.array(
        *[
            F.struct(sq_dist(vec, F.lit(c)).alias("dist"), F.lit(int(cid)).alias("cid"))
            for cid, c in sorted(centroids)
        ]
    )
    return F.array_min(probes)["cid"]


def hyperplane_signs(planes: int, dim: int) -> list[list[int]]:
    """±1 random-hyperplane components, derived deterministically from md5
    so the Spark plan and the DuckDB oracle share the exact same planes
    (the same trick as MINHASH_COEFFS: constants, not runtime randomness)."""
    import hashlib

    return [
        [1 if hashlib.md5(f"{p}:{d}".encode()).digest()[0] & 1 else -1 for d in range(dim)]
        for p in range(planes)
    ]


def lsh_hyperplane_bands(
    emb: DataFrame,
    planes: int = 32,
    band_size: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_flips: int = 0,
) -> DataFrame:
    """(id, band, val): random-hyperplane LSH signature of each vector,
    banded. The classic SimHash-for-cosine: bit_p = sign(<v, h_p>) with
    h_p ∈ {±1}^dim; vectors with high cosine agree on most bits, so agreeing
    on one whole band (band_size bits) is the candidate filter.

    Bits are computed over the INT8-QUANTIZED vector (quantize_int8):
    integer dot products are exact in any engine (and any summation order),
    which makes the signature — unlike a float-dot signature — bit-identical
    to the DuckDB oracle by construction. Quantization preserves direction
    up to 1/127 per component, far below the hyperplane margin for
    non-degenerate vectors; at scale the quantized vectors are also the
    cheaper ones to scan. Whole computation is one codegen'd projection —
    no shuffle, no Python.

    ``probe_flips`` > 0 enables MULTI-PROBE (Lv et al., VLDB'07 shape) for
    the QUERY side: per band, also emit the ``probe_flips`` variants with
    the lowest-|margin| bit(s) flipped — a near neighbor that disagrees on
    one bit almost always disagrees on the bit whose hyperplane dot is
    closest to zero, so probing those variants recovers most Hamming-1
    misses at a fraction of the candidate cost of shorter bands. Margin
    ties break by in-band position (array_sort struct order), mirrored
    exactly by the oracle's ORDER BY abs(dp), p. The corpus side stays
    single-probe: the index stores one signature per band per vector."""
    if planes % band_size != 0:
        raise ValueError("planes must be a multiple of band_size")
    if not (0 <= probe_flips <= band_size):
        raise ValueError(f"probe_flips must be in [0, band_size], got {probe_flips}")
    signs = hyperplane_signs(planes, dim)
    q = quantize_int8(emb, vec_col=vec_col, id_col=id_col)
    # Hard length check: zip_with null-pads a short/long vector, which would
    # silently NULL the dot product and make its candidates vanish (or
    # diverge from an oracle built at a different dim). raise_error makes a
    # mismatched row fail the job loudly instead.
    qarr = F.when(F.size(F.col("q")) == dim, F.col("q")).otherwise(
        F.raise_error(
            F.concat(
                F.lit("lsh_hyperplane_bands: vector length "),
                F.size(F.col("q")).cast("string"),
                F.lit(f" != dim={dim}"),
            )
        )
    )
    dots = [
        F.aggregate(
            F.zip_with(
                qarr,
                F.array(*[F.lit(s) for s in signs[p]]),
                lambda x, y: x * y,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for p in range(planes)
    ]
    bits = [(dp >= 0).cast("int") for dp in dots]
    bands = []
    for b in range(planes // band_size):
        val = F.lit(0)
        for i in range(band_size):
            val = val + (bits[b * band_size + i] * F.lit(2**i))
        val = val.cast("int")
        bands.append(F.struct(F.lit(b).alias("band"), val.alias("val")))
        if probe_flips > 0:
            # in-band bit positions ordered by |margin| asc, position asc
            ranked = F.array_sort(
                F.array(
                    *[
                        F.struct(
                            F.abs(dots[b * band_size + i]).alias("m"),
                            F.lit(i).alias("i"),
                        )
                        for i in range(band_size)
                    ]
                )
            )
            for f in range(probe_flips):
                flipped = val.bitwiseXOR(
                    F.call_function(
                        "shiftleft", F.lit(1), F.element_at(ranked, f + 1)["i"].cast("int")
                    )
                ).cast("int")
                bands.append(F.struct(F.lit(b).alias("band"), flipped.alias("val")))
    return q.select(
        F.col(id_col).alias("id"), F.explode(F.array(*bands)).alias("bv")
    ).select("id", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    planes: int = 32,
    band_size: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    probe_flips: int = 0,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share at least one
    hyperplane band with the query (optionally also one of the query's
    multi-probe flipped variants), then exact cosine ranks the candidates.
    Same output shape as cosine_topk; approximate by design (recall grows
    with bands and probes), deterministic by construction.

    Scale shape: signatures are a map-only projection over the corpus; the
    candidate join is an equi-join on (band, val) — the corpus never does
    all-pairs work, and the query side (including its probe expansion) is
    broadcast."""
    cb = lsh_hyperplane_bands(emb, planes, band_size, dim, id_col, vec_col)
    qb = lsh_hyperplane_bands(
        queries, planes, band_size, dim, id_col, vec_col, probe_flips=probe_flips
    )
    cand = (
        F.broadcast(qb.withColumnRenamed("id", "query_id"))
        .join(cb.withColumnRenamed("id", "neighbor_id"), ["band", "val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    cv = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    sims = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), round_digits).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, q) — symmetric int8 scalar quantization of a float vector:
    q_i = floor(x_i * 127 / max|x| + 0.5), the storage/bandwidth step of a
    quantized ANN index (4x smaller vectors, SIMD-friendly dot products).

    floor(x + 0.5) is used instead of round() because round() half-even vs
    half-away rules differ across engines while floor is exact everywhere;
    all arithmetic is float->double widening (exact) then one IEEE double
    multiply/divide — bit-identical in any engine. Map-only scan at scale;
    zero-vector rows quantize to all zeros."""
    vec = F.col(vec_col)
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x)))
    q = F.when(
        mx > 0,
        F.transform(
            vec,
            lambda x: F.floor(
                x.cast("double") * F.lit(127.0) / mx.cast("double") + F.lit(0.5)
            ).cast("int"),
        ),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))
    return df.select(F.col(id_col), q.alias("q"))


def pq_codes(
    emb: DataFrame,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codes (Jégou et al. 2011): split each vector
    into `m` equal subvectors, train an independent deterministic k-means
    codebook per subspace (`kmeans_fit` on the slice — same no-RNG init,
    exact decimal means), and emit each vector's code word (id, c0..c{m-1})
    — the 8-bit-per-subspace compression that makes billion-vector ANN
    memory-resident (m * log2(k) bits per vector instead of dim * 32).

    Scale shape: training is m small k-means runs (each ONE aggregate per
    iteration, k*dim/m floats to the driver); assignment packs ALL m
    codebooks into one literal probe array, so coding the corpus is a
    SINGLE map-only projection inside whole-stage codegen — zero shuffles,
    zero joins, the corpus streamed once."""
    if dim is None:
        first = emb.select(F.size(_as_double(F.col(vec_col))).alias("n")).head()
        if first is None:
            raise ValueError("pq_codes: empty input")
        dim = first["n"]
    if m < 1 or dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into m={m} subspaces")
    s = dim // m
    books = []
    for j in range(m):
        sub = emb.select(
            F.col(id_col).alias("id"),
            F.slice(_as_double(F.col(vec_col)), j * s + 1, s).alias("v"),
        )
        cent = kmeans_fit(sub, k=k, iters=iters, id_col="id", vec_col="v")
        books.append([(r["cid"], list(r["c"])) for r in cent.collect()])
    vec = _as_double(F.col(vec_col))
    return emb.select(
        F.col(id_col),
        *[
            _nearest_cid(F.slice(vec, j * s + 1, s), books[j]).cast("int").alias(f"c{j}")
            for j in range(m)
        ],
    )


def _adc_parts(
    emb: DataFrame,
    q: list[float],
    m: int,
    s: int,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    src_vec: Column,
) -> tuple[list[Column], list[Column]]:
    """The determinism-critical ADC recipe, in exactly ONE place (shared by
    pq_adc_topk and ivf_pq_topk): per-subspace PQ codebooks trained on
    `emb`, the probe's distance table per subspace (left-fold squared
    distance, cid-KEYED map so a dropped-out cluster cannot desync a
    positional array), and the per-row code/distance columns evaluated
    against `src_vec` slices, rounded to 9 decimals IN-ENGINE. Returns
    (code_cols, dist_cols)."""
    code_cols, dist_cols = [], []
    for j in range(m):
        sub = emb.select(
            F.col(id_col).alias("id"),
            F.slice(_as_double(F.col(vec_col)), j * s + 1, s).alias("v"),
        )
        cent = kmeans_fit(sub, k=k, iters=iters, id_col="id", vec_col="v")
        book = sorted((r["cid"], list(r["c"])) for r in cent.collect())
        qj = q[j * s : (j + 1) * s]
        table = {}
        for cid, c in book:
            acc = 0.0
            for a, b in zip(qj, c):
                acc += (a - b) * (a - b)
            table[cid] = acc
        code = _nearest_cid(F.slice(src_vec, j * s + 1, s), book).cast("int")
        lookup = F.create_map(
            *[F.lit(x) for cid, d in sorted(table.items()) for x in (cid, d)]
        )
        code_cols.append(code.alias(f"c{j}"))
        dist_cols.append(F.round(F.element_at(lookup, code), 9).alias(f"d{j}"))
    return code_cols, dist_cols


def pq_adc_topk(
    emb: DataFrame,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    topn: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric distance computation (ADC) search over PQ codes (Jégou
    et al. 2011 §IV): the query vector stays UNquantized; each corpus
    vector's approximate distance is the sum over subspaces of
    ||q_j - codeword(code_j)||², a table lookup per subspace. The probe is
    the corpus vector with the smallest id (deterministic, oracle-expressible).

    Scale shape: training is m small k-means runs; the m distance tables
    (k entries each) are computed DRIVER-side from k×dim floats and ride
    the plan as literal arrays, so scoring the corpus is ONE map-only
    projection (code lookup + 4 additions per row, inside codegen) and the
    top-n is TakeOrdered — no shuffle, no join, corpus streamed once. This
    is exactly how a billion-vector IVFADC scan prices candidates.

    Determinism: the per-subspace table entries are left-folded in array
    order like sq_dist (DuckDB list_sum twin), rounded to 9 decimals
    IN-ENGINE (Spark HALF_UP == DuckDB half-away for positive distances;
    Python's bankers-round never touches the values), and the 4-term total
    is an explicit fixed-order addition."""
    first = emb.select(F.size(_as_double(F.col(vec_col))).alias("n")).head()
    if first is None:
        raise ValueError("pq_adc_topk: empty input")
    dim = first["n"]
    if m < 1 or dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into m={m} subspaces")
    s = dim // m
    probe = (
        emb.orderBy(F.col(id_col))
        .select(_as_double(F.col(vec_col)).alias("v"))
        .head()
    )
    q = list(probe["v"])
    code_cols, dist_cols = _adc_parts(
        emb, q, m, s, k, iters, id_col, vec_col,
        src_vec=_as_double(F.col(vec_col)),
    )
    scored = emb.select(F.col(id_col), *code_cols, *dist_cols)
    total = F.col("d0")
    for j in range(1, m):
        total = total + F.col(f"d{j}")
    return (
        scored.select(id_col, *[f"c{j}" for j in range(m)], total.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(topn)
    )


def ivf_pq_topk(
    emb: DataFrame,
    k_coarse: int = 4,
    nprobe: int = 2,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    topn: int = 10,
    rerank_r: int | None = 150,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ composed — the full FAISS-style IVFADC pipeline (Jégou et al.
    2011): a learned coarse quantizer routes the query to ``nprobe`` of
    ``k_coarse`` inverted lists, and ONLY those lists' vectors are priced
    with PQ asymmetric distances. This is the search shape that makes
    billion-vector ANN tractable: the coarse filter is a map-only cell
    predicate (at scale: partition pruning on a cell-partitioned layout),
    so the ADC scan touches ~nprobe/k_coarse of the corpus instead of all
    of it — the piece `ann_pq_adc_topk` (full-corpus scan) deliberately
    leaves out.

    Determinism/parity: coarse training is the same `kmeans_fit` replayed
    by the oracle; the probe's cell choice compares Python-left-fold
    squared distances against driver-collected centroids (same IEEE fold
    order as DuckDB's list_sum and Spark's sq_dist), ties by cid; PQ
    codebooks are trained on the FULL corpus (index build time), candidates
    filtered BEFORE scoring. All table lookups ride the plan as literals —
    one filter + one map-only projection + TakeOrdered, zero joins.

    ``rerank_r`` adds the REFINE tier (FAISS IndexRefineFlat): the ADC
    shortlist of R candidates is re-priced with EXACT squared distances
    (another map-only fold — only R rows pay full-dim arithmetic) and the
    final top-n ranked on those. Measured on the unstructured synthetic
    embeddings (sf0.01, 500 vectors): routing recall 1.0 at a 0.49
    candidate fraction, ADC-only recall@10 = 0.2 (distance concentration —
    4-bit codes can't separate near-uniform vectors), the ADC@150 shortlist
    contains 10/10 true neighbors at both test SFs, so rerank restores
    recall@10 = 1.0
    (pinned in ``test_ivf_pq_rerank_recall``). ``rerank_r=None`` returns
    the raw ADC ranking."""
    first = emb.select(F.size(_as_double(F.col(vec_col))).alias("n")).head()
    if first is None:
        raise ValueError("ivf_pq_topk: empty input")
    dim = first["n"]
    if m < 1 or dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into m={m} subspaces")
    if not (1 <= nprobe <= k_coarse):
        raise ValueError(f"nprobe {nprobe} out of range for k_coarse {k_coarse}")
    s = dim // m
    vec = _as_double(F.col(vec_col))
    full = emb.select(F.col(id_col), vec.alias("v"))

    # coarse quantizer: full-vector k-means, corpus assigned to cells
    coarse = kmeans_fit(full, k=k_coarse, iters=iters, id_col=id_col, vec_col="v")
    books_c = sorted((r["cid"], list(r["c"])) for r in coarse.collect())
    assigned = full.select(
        id_col, "v", _nearest_cid(F.col("v"), books_c).cast("int").alias("cell")
    )

    probe = full.orderBy(F.col(id_col)).head()
    q = list(probe["v"])

    def _d2(c: list[float]) -> float:
        acc = 0.0
        for a, b in zip(q, c):
            acc += (a - b) * (a - b)
        return acc

    probed = [cid for _, cid in sorted((_d2(c), cid) for cid, c in books_c)[:nprobe]]
    cand = assigned.where(F.col("cell").isin(*probed))

    # PQ codebooks trained on the FULL corpus (index build), ADC tables
    # from the probe — the ONE shared recipe (_adc_parts), evaluated against
    # the candidate rows' already-double "v" column
    _codes, dist_cols = _adc_parts(
        emb, q, m, s, k, iters, id_col, vec_col, src_vec=F.col("v")
    )
    scored = cand.select(F.col(id_col), "cell", "v", *dist_cols)
    total = F.col("d0")
    for j in range(1, m):
        total = total + F.col(f"d{j}")
    adc = scored.select(id_col, "cell", "v", total.alias("adc_dist"))
    if rerank_r is None:
        return adc.select(id_col, "cell", "adc_dist").orderBy(
            "adc_dist", id_col
        ).limit(topn)
    shortlist = adc.orderBy("adc_dist", id_col).limit(rerank_r)
    return (
        shortlist.select(
            id_col,
            "cell",
            F.round(sq_dist(F.col("v"), F.lit(q)), 9).alias("dist"),
        )
        .orderBy("dist", id_col)
        .limit(topn)
    )


def build_ivf_pq_index(
    emb: DataFrame,
    index_dir: str,
    k_coarse: int = 4,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train the IVF+PQ index ONCE and persist it as parquet tables — the
    production retrieval shape at 100 TB, where the index is an artifact
    built by a scheduled job and probed by thousands of later queries
    (``ivf_pq_topk`` rebuilds everything per call; this is its
    build-once/probe-many split):

    - ``centroids/``  (cid, c array<double>) — the coarse quantizer,
      k_coarse rows;
    - ``codebooks/``  (sub, cid, c array<double>) — m per-subspace PQ
      codebooks, m*k rows;
    - ``codes/``      (vec_id, c0..c{m-1}, v array<double>), PARTITIONED
      BY cell — each vector's inverted-list assignment, PQ code word, and
      the full-precision vector for the refine tier (FAISS
      IndexRefineFlat keeps the flat store alongside the codes the same
      way). Partitioning by cell is the point: a probe reading nprobe of
      k_coarse cells prunes the scan to those directories — at scale,
      partition pruning IS the inverted-list seek.

    Training is the same deterministic `kmeans_fit` the per-call path
    uses, so a SQL oracle can replay the build from the raw corpus."""
    first = emb.select(F.size(_as_double(F.col(vec_col))).alias("n")).head()
    if first is None:
        raise ValueError("build_ivf_pq_index: empty input")
    dim = first["n"]
    if m < 1 or dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into m={m} subspaces")
    s = dim // m
    spark = emb.sparkSession
    full = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))

    coarse = kmeans_fit(full, k=k_coarse, iters=iters, id_col=id_col, vec_col="v")
    books_c = sorted((r["cid"], list(r["c"])) for r in coarse.collect())

    books: list[list[tuple[int, list[float]]]] = []
    book_rows: list[tuple[int, int, list[float]]] = []
    for j in range(m):
        sub = full.select(
            F.col(id_col).alias("id"), F.slice(F.col("v"), j * s + 1, s).alias("v")
        )
        cent = kmeans_fit(sub, k=k, iters=iters, id_col="id", vec_col="v")
        bj = sorted((r["cid"], list(r["c"])) for r in cent.collect())
        books.append(bj)
        book_rows.extend((j, cid, c) for cid, c in bj)

    spark.createDataFrame(books_c, "cid INT, c ARRAY<DOUBLE>").coalesce(1) \
        .write.mode("overwrite").parquet(f"{index_dir}/centroids")
    spark.createDataFrame(book_rows, "sub INT, cid INT, c ARRAY<DOUBLE>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/codebooks")
    # one pass over the corpus: coarse cell + all m code words, map-only
    # (centroids and codebooks ride the closure as literals)
    codes = full.select(
        F.col(id_col),
        F.col("v"),
        _nearest_cid(F.col("v"), books_c).cast("int").alias("cell"),
        *[
            _nearest_cid(F.slice(F.col("v"), j * s + 1, s), books[j])
            .cast("int")
            .alias(f"c{j}")
            for j in range(m)
        ],
    )
    codes.write.mode("overwrite").partitionBy("cell").parquet(f"{index_dir}/codes")


def ivf_pq_index_probe(
    spark,
    index_dir: str,
    probes: DataFrame,
    nprobe: int = 2,
    m: int = 4,
    topn: int = 10,
    rerank_r: int = 150,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Answer a BATCH of probes against a persisted ``build_ivf_pq_index``
    artifact with a pure join plan — no training, no full-corpus scan:

    1. route: probes × broadcast centroids (k_coarse rows) → top-nprobe
       cells per probe (ties by cid, same rule as assignment);
    2. ADC tables: probes × broadcast codebooks (m*k rows) → per
       (probe, subspace, code) distance, rounded to 9 decimals in-engine;
    3. candidates: the codes table joined on cell — with the codes
       partitioned by cell this is partition pruning / dynamic partition
       pruning, i.e. the inverted-list seek;
    4. shortlist: per-probe top-``rerank_r`` by the fixed-order ADC sum;
    5. refine: exact squared distance against the stored full-precision
       vectors, per-probe top-``topn``.

    Every non-codes input is broadcast (probes, centroids, codebooks, ADC
    tables are all tiny); the only large relation — codes — is touched
    once, pruned to the probed cells. Determinism matches ``ivf_pq_topk``:
    left-fold distances, 9-decimal rounds before ranking, ties by id."""
    cent = spark.read.parquet(f"{index_dir}/centroids")
    cbooks = spark.read.parquet(f"{index_dir}/codebooks")
    codes = spark.read.parquet(f"{index_dir}/codes")
    s_row = cbooks.select(F.size("c").alias("s")).head()
    if s_row is None:
        raise ValueError(f"empty codebooks at {index_dir}")
    s = s_row["s"]

    # materialize the (tiny, by definition) probe batch ONCE: the q subtree
    # feeds 6 join branches (routing, m ADC tables, rerank) and would
    # otherwise re-scan its source per branch — at 100 TB that is 6 reads
    # of the corpus file just to extract the same 3 probe rows
    q = probes.select(
        F.col(id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    ).localCheckpoint(eager=True)
    w_cell = Window.partitionBy("qid").orderBy("cdist", "cid")
    qcells = (
        q.crossJoin(F.broadcast(cent))
        .select("qid", "cid", sq_dist(F.col("qv"), F.col("c")).alias("cdist"))
        .withColumn("rn", F.row_number().over(w_cell))
        .where(F.col("rn") <= nprobe)
        .select("qid", F.col("cid").alias("cell"))
    )
    adc = (
        q.crossJoin(F.broadcast(cbooks))
        .select(
            "qid",
            "sub",
            "cid",
            F.round(
                sq_dist(F.slice(F.col("qv"), F.col("sub") * s + 1, s), F.col("c")), 9
            ).alias("d"),
        )
    )
    cand = codes.join(F.broadcast(qcells), "cell")
    for j in range(m):
        adc_j = adc.where(F.col("sub") == j).select(
            "qid", F.col("cid").alias(f"c{j}"), F.col("d").alias(f"d{j}")
        )
        cand = cand.join(F.broadcast(adc_j), ["qid", f"c{j}"])
    total = F.col("d0")
    for j in range(1, m):
        total = total + F.col(f"d{j}")
    w_adc = Window.partitionBy("qid").orderBy("adc_dist", id_col)
    shortlist = (
        cand.select("qid", id_col, "cell", "v", total.alias("adc_dist"))
        .withColumn("rn", F.row_number().over(w_adc))
        .where(F.col("rn") <= rerank_r)
    )
    w_final = Window.partitionBy("qid").orderBy("dist", id_col)
    return (
        shortlist.join(F.broadcast(q), "qid")
        .select(
            "qid",
            id_col,
            "cell",
            F.round(sq_dist(F.col("v"), F.col("qv")), 9).alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w_final))
        .where(F.col("rank") <= topn)
        .select(
            F.col("qid").alias("query_id"),
            F.col(id_col),
            F.col("cell").cast("int").alias("cell"),
            "dist",
            F.col("rank").cast("int").alias("rank"),
        )
    )
