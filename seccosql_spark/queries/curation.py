"""End-to-end corpus-curation compositions — the shapes a training-data
pipeline actually runs, built from the dedup/text/graph operators:

- near-dup CLUSTERING: minhash pairs -> connected components -> one
  canonical doc per duplicate cluster (pairs alone don't dedup a corpus;
  transitive clustering does);
- token-budget SHARD PACKING: distributed prefix sum assigning consecutive
  docs to ~budget-token shards (operators/packing.py — the two-phase
  prefix sum, never a single-partition global window);
- a full CLEANING pass: exact-dedup keep-first + token/char-length floors.

Oracles: the clustering twin wraps the minhash pair oracle in a recursive
transitive closure; packing is a plain window running sum (the oracle CAN
use the single-partition formulation — DuckDB is single-node); cleaning is
md5-group + filters. All integer-exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from seccosql_spark.graph.algorithms import connected_components_star
from seccosql_spark.operators.dedup import (
    bloom_decontaminate,
    decontaminate,
    exact_dedup,
    minhash_near_dups,
)
from seccosql_spark.operators.packing import pack_by_budget
from seccosql_spark.queries.pipeline import MINHASH_SHINGLE_ORACLE
from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession

TOKENS_DUCK = "len(list_filter(string_split(text, ' '), x -> x <> ''))"


CLUSTER_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT id1, id2 FROM ({MINHASH_SHINGLE_ORACLE}) t
),
sym AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
canon AS (SELECT a AS id, least(a, min(b)) AS canonical FROM reach GROUP BY a)
SELECT d.doc_id, CAST(coalesce(c.canonical, d.doc_id) AS BIGINT) AS canonical_id
FROM documents d LEFT JOIN canon c ON d.doc_id = c.id
"""


@register("dedup_cluster_canonical", CLUSTER_ORACLE)
def dedup_cluster_canonical(sess: SeccoSession):
    """Near-dup clustering: LSH candidate pairs (threshold 0.5, 3-shingles)
    are edges of a duplicate graph; connected components give each cluster
    one canonical id; unpaired docs map to themselves. This is the
    composition that actually deduplicates a corpus — keep rows where
    doc_id = canonical_id. Components run the large-star/small-star
    algorithm (O(log n) rounds — duplicate chains make the label-propagation
    alternative O(chain length) shuffle rounds), and only over the (tiny)
    duplicate subgraph, not the corpus."""
    docs = sess.spark.table("documents")
    pairs = minhash_near_dups(docs, threshold=0.5, shingle_n=3).select("id1", "id2")
    comp = connected_components_star(pairs, src="id1", dst="id2")
    return sess.from_spark(
        docs.select("doc_id")
        .join(comp, docs["doc_id"] == comp["id"], "left")
        .select(
            docs["doc_id"],
            F.coalesce(comp["component"], docs["doc_id"]).cast("long").alias("canonical_id"),
        )
    )


PACK_BUDGET = 1000

PACK_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, CAST({TOKENS_DUCK} AS INT) AS n_tokens FROM documents
)
SELECT doc_id, n_tokens, CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS shard
FROM (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM tok
)
"""


@register("pack_token_shards", PACK_ORACLE)
def pack_token_shards(sess: SeccoSession):
    """Token-budget shard packing via the distributed two-phase prefix sum
    (operators/packing.py): range partition + per-partition subtotals +
    broadcast offsets. The oracle uses the single-partition window
    formulation — correct for a single-node engine, exactly the plan this
    operator exists to avoid on a cluster."""
    docs = sess.spark.table("documents")
    with_tokens = docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))).alias(
            "n_tokens"
        ),
    )
    return sess.from_spark(pack_by_budget(with_tokens, budget=PACK_BUDGET))


CLEAN_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, n_chars, CAST({TOKENS_DUCK} AS INT) AS n_tokens FROM documents
),
keep AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text))
SELECT t.doc_id, t.lang, t.n_tokens
FROM tok t JOIN keep k ON t.doc_id = k.keep_id
WHERE t.n_tokens >= 5 AND t.n_chars >= 20
"""


@register("corpus_clean_pass", CLEAN_ORACLE)
def corpus_clean_pass(sess: SeccoSession):
    """A full cleaning pass: exact-dedup (keep smallest id per content
    digest) then token/char floors — the standard first stage of a training
    corpus build. One shuffle for the digest group, one semi-join back, and
    scan-side filters."""
    docs = sess.spark.table("documents")
    keep = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    toks = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))).alias(
            "n_tokens"
        ),
    )
    return sess.from_spark(
        toks.join(keep, "doc_id")
        .filter((F.col("n_tokens") >= 5) & (F.col("n_chars") >= 20))
        .select("doc_id", "lang", "n_tokens")
    )


DECONTAM_ORACLE = """
WITH tr AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
ev AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
wt AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM tr),
we AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM ev),
it AS (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 7, 0) + 1)) AS i FROM wt),
ie AS (SELECT ws, unnest(range(1, greatest(len(ws) - 7, 0) + 1)) AS i FROM we),
gt AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS g FROM it),
ge AS (SELECT DISTINCT array_to_string(ws[i:i+7], ' ') AS g FROM ie),
bad AS (SELECT DISTINCT doc_id FROM gt JOIN ge USING (g))
SELECT t.doc_id FROM tr t ANTI JOIN bad b ON t.doc_id = b.doc_id
"""


@register("decontaminate_ngram8", DECONTAM_ORACLE)
def decontaminate_ngram8(sess: SeccoSession):
    """Benchmark decontamination: docs from source src0 play the role of the
    eval/benchmark set; every other doc sharing a word 8-gram with it is
    dropped from the train side. The eval fingerprint set is broadcast, so
    the train corpus is filtered map-side — the shape that holds when train
    is 100 TB and eval is megabytes. (Contamination here is real: the corpus
    contains exact and near duplicates across sources.)"""
    docs = sess.spark.table("documents")
    train = docs.filter(F.col("source") != "src0")
    eval_df = docs.filter(F.col("source") == "src0")
    out = decontaminate(train, eval_df, n=8)
    return sess.from_spark(out.select("doc_id"))


@register("decontaminate_bloom", DECONTAM_ORACLE)
def decontaminate_bloom(sess: SeccoSession):
    """Same contract as `decontaminate_ngram8` (identical oracle), but the
    train-side n-gram stream is pruned map-side by a 16 KiB Bloom bitmap
    shipped in the task closure before the exact broadcast verify — the
    shape that survives an eval corpus too large to broadcast as a string
    set. Bloom false positives are removed by the verify arm, so the result
    is exactly the n-gram-overlap semantics (`operators/dedup.py
    bloom_decontaminate`)."""
    docs = sess.spark.table("documents")
    train = docs.filter(F.col("source") != "src0")
    eval_df = docs.filter(F.col("source") == "src0")
    out = bloom_decontaminate(train, eval_df, n=8)
    return sess.from_spark(out.select("doc_id"))


END_TO_END_ORACLE = """
WITH norm AS (SELECT doc_id, lower(regexp_replace(trim(text), ' +', ' ', 'g')) AS text
              FROM documents),
keep AS (SELECT min(doc_id) AS doc_id FROM norm GROUP BY md5(text)),
toks AS (SELECT n.doc_id, list_filter(string_split(n.text, ' '), x -> x <> '') AS t
         FROM norm n JOIN keep USING (doc_id)),
good AS (SELECT doc_id, t FROM toks
         WHERE round((CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
                      + least(1.0, CAST(len(t) AS DOUBLE) / 50.0)) / 2.0, 6) >= 0.6),
s AS (SELECT doc_id, t, unnest(range(1, greatest(len(t), 1) + 1, 24)) AS st
      FROM good WHERE len(t) > 0),
k AS (SELECT doc_id, t, st,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY st) - 1 AS INT) AS chunk_id
      FROM s WHERE st = 1 OR st - 24 + 31 < len(t)),
ch AS (SELECT doc_id, chunk_id, CAST(len(t[st:st+31]) AS INT) AS n_tokens
       FROM k)
SELECT doc_id, chunk_id, n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id, chunk_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
            AS BIGINT) AS shard
FROM ch
"""


def normalized_keep_first(docs):
    """normalize (lowercase, whitespace collapse) -> exact-dedup keeping the
    smallest doc_id per content digest, as ONE pass: min-over-window on
    md5(text) (r16, guide §2.4). The old groupBy(md5).agg(min) ->
    semi-join-back shape derived the normalized relation twice — two
    documents scans and two regexp-normalize passes over the corpus just to
    carry the keep ids. The window rides ONE md5 exchange and normalizes
    once; at scale the semi-join's broadcast breaks anyway and its fallback
    shuffles the normalized text by doc_id ON TOP of the digest-agg
    exchange, so the window shape is never worse there either. Shape pinned
    by test_curation_keep_first_is_one_scan_one_exchange."""
    from pyspark.sql import Window as _W

    norm = docs.select(
        "doc_id",
        F.lower(F.regexp_replace(F.trim(F.col("text")), " +", " ")).alias("text"),
    )
    return (
        norm.withColumn(
            "__keep", F.min("doc_id").over(_W.partitionBy(F.md5("text")))
        )
        .where(F.col("__keep") == F.col("doc_id"))
        .drop("__keep")
    )


@register("curation_end_to_end", END_TO_END_ORACLE, headline=True)
def curation_end_to_end(sess: SeccoSession):
    """The WHOLE curation pipeline as one composed plan — what a user
    actually ships: normalize (lowercase, whitespace collapse) -> exact
    dedup on the normalized text (keep-first) -> quality floor (>= 0.6 on
    the normalized tokens) -> fixed-window chunking (32 tokens, 8 overlap)
    -> token-budget shard packing (512 tokens/shard, distributed prefix
    sum over the global (doc, chunk) order). Output one row per surviving
    chunk: (doc_id, chunk_id, n_tokens, shard).

    Every stage is the already-verified operator; this row proves they
    COMPOSE — the joins between stages are semi-joins on doc_id (broadcast
    at any realistic dedup rate), chunking is map-only, and packing adds
    the one range shuffle + O(#partitions) driver collect. Packing orders
    on the COMPOSITE key (doc_id, chunk_id) directly — no arithmetic
    cid = doc_id*1000+chunk_id encoding, which would silently collide for
    documents with >= 1000 chunks (book-length docs at 24-token stride;
    VERDICT r07 finding 1). The oracle replays the full chain, packing via
    the single-node window formulation (exclusive prefix sum // budget)."""
    from seccosql_spark.operators.packing import pack_by_budget
    from seccosql_spark.operators.text import chunk_documents, quality_expr

    docs = sess.spark.table("documents")
    # normalize + keep-first dedup in ONE pass (min-over-window on the
    # content digest — see normalized_keep_first for the r16 rationale)
    kept = normalized_keep_first(docs)
    # Quality floor applied INLINE on the surviving rows (r16, guide §2.3-2.4:
    # the old quality_score(kept) -> semi-join-back shape re-derived the whole
    # normalize+dedup subtree a second time just to carry ids; same rows,
    # identical `quality` expression, one full text pass and one join fewer).
    good = kept.where(quality_expr(F.col("text")) >= 0.6)
    chunks = chunk_documents(good, chunk_tokens=32, overlap=8)
    packed = pack_by_budget(
        chunks.select(F.col("id").alias("doc_id"), "chunk_id", "n_tokens"),
        budget=512,
        id_col=("doc_id", "chunk_id"),
        weight_col="n_tokens",
    )
    out = packed.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("shard").cast("long").alias("shard"),
    )
    return sess.from_spark(out)


SHUFFLE_PACK_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, CAST({TOKENS_DUCK} AS INT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
)
SELECT doc_id, n_tokens, CAST((cum - n_tokens) // 512 AS BIGINT) AS shard
FROM (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM tok
)
"""


@register("shuffle_pack_shards", SHUFFLE_PACK_ORACLE)
def shuffle_pack_shards(sess: SeccoSession):
    """Deterministic global training-order shuffle + shard packing: order
    documents by md5(doc_id) — a reproducible pseudo-random permutation, so
    adjacent corpus documents (same crawl, same book) land in different
    shards, the decorrelation training epochs need — then pack that order
    into ~512-token shards with the distributed two-phase prefix sum.
    The permutation is free at any scale: the hash is a map-side
    expression, and the range partition the packer needs anyway simply
    keys on (h, doc_id) instead of doc_id. No extra shuffle versus
    unshuffled packing, no driver-side ordering."""
    docs = sess.spark.table("documents")
    with_h = docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))).alias(
            "n_tokens"
        ),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    packed = pack_by_budget(
        with_h, budget=512, id_col=("h", "doc_id"), weight_col="n_tokens"
    )
    return sess.from_spark(
        packed.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("shard").cast("long").alias("shard"),
        )
    )


def _multisignal_oracle() -> str:
    from seccosql_spark.queries.pipeline import SEMDEDUP_ORACLE
    from seccosql_spark.queries.text_stats import GOPHER_ORACLE

    return f"""
WITH ex AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
gq AS (SELECT doc_id, keep FROM ({GOPHER_ORACLE}) t),
sem AS (SELECT vec_id, keep FROM ({SEMDEDUP_ORACLE}) t)
SELECT d.doc_id,
       (ex.doc_id IS NOT NULL) AS exact_keep,
       gq.keep AS gopher_keep,
       coalesce(sem.keep, TRUE) AS semantic_keep,
       ((ex.doc_id IS NOT NULL) AND gq.keep AND coalesce(sem.keep, TRUE)) AS keep
FROM documents d
LEFT JOIN ex USING (doc_id)
JOIN gq USING (doc_id)
LEFT JOIN sem ON d.doc_id = sem.vec_id
"""


@register("curation_multisignal", _multisignal_oracle())
def curation_multisignal(sess: SeccoSession):
    """Signal-fusion curation verdict, one row per document with the
    per-signal audit trail a data team actually debugs with: exact-dedup
    keep-first (content md5), the Gopher quality rule set, and SemDeDup
    semantic dedup over the learned embedding clusters — joined on
    doc_id = vec_id, with documents that have NO embedding passing the
    semantic gate by definition (at sf0.1 only 2000 of 5000 docs carry
    embeddings, so that path is exercised, not theoretical). All three
    signals are the already-verified operators; this row proves the FUSION
    composes: two broadcast-friendly joins on doc_id, no new shuffles
    beyond what each signal already needs."""
    from seccosql_spark.operators.dedup import exact_dedup
    from seccosql_spark.operators.similarity import (
        embedding_near_dups,
        kmeans_assign,
        kmeans_fit,
    )
    from seccosql_spark.operators.text import gopher_quality

    docs = sess.spark.table("documents")
    emb = sess.spark.table("embeddings")
    ex = exact_dedup(docs).select(
        F.col("keep_id").alias("doc_id"), F.lit(True).alias("__ex")
    )
    gq = gopher_quality(docs).select("doc_id", F.col("keep").alias("gopher_keep"))
    cent = kmeans_fit(emb, k=4, iters=2)
    asg = kmeans_assign(emb, cent).withColumnRenamed("id", "vec_id")
    pairs = embedding_near_dups(emb.join(asg, "vec_id"), threshold=0.4, bucket_col="cid")
    dup = pairs.select(F.col("id2").alias("vec_id")).distinct()
    sem = asg.join(dup.withColumn("__d", F.lit(1)), "vec_id", "left").select(
        F.col("vec_id").alias("doc_id"), F.col("__d").isNull().alias("__sem")
    )
    out = (
        docs.select("doc_id")
        .join(ex, "doc_id", "left")
        .join(gq, "doc_id")
        .join(sem, "doc_id", "left")
        .select(
            "doc_id",
            F.col("__ex").isNotNull().alias("exact_keep"),
            "gopher_keep",
            F.coalesce("__sem", F.lit(True)).alias("semantic_keep"),
            (
                F.col("__ex").isNotNull()
                & F.col("gopher_keep")
                & F.coalesce("__sem", F.lit(True))
            ).alias("keep"),
        )
    )
    return sess.from_spark(out)


SEQPACK_ORACLE = f"""
WITH RECURSIVE tok AS MATERIALIZED (
  SELECT doc_id, doc_id // 64 AS part, CAST({TOKENS_DUCK} AS INT) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id) AS r
  FROM documents
),
st(part, r, doc_id, n_tokens, seq, cum) AS (
  SELECT part, r, doc_id, n_tokens, 0, n_tokens FROM tok WHERE r = 1
  UNION ALL
  SELECT t.part, t.r, t.doc_id, t.n_tokens,
         CASE WHEN s.cum + t.n_tokens > 256 THEN s.seq + 1 ELSE s.seq END,
         CASE WHEN s.cum + t.n_tokens > 256 THEN t.n_tokens
              ELSE s.cum + t.n_tokens END
  FROM st s JOIN tok t ON t.part = s.part AND t.r = s.r + 1
)
SELECT doc_id, CAST(part AS BIGINT) AS part, CAST(seq AS INT) AS seq, n_tokens
FROM st
"""


@register("pack_sequences_greedy", SEQPACK_ORACLE)
def pack_sequences_greedy_q(sess: SeccoSession):
    """Greedy sequence packing with boundary reset (capacity 256 tokens):
    consecutive documents fill a training sequence until the next one would
    overflow, which opens a fresh sequence — no document ever straddles
    two. Inherently sequential per group, so the operator fixes a
    deterministic partition key (doc_id DIV 64) and runs the linear scan in
    one Arrow-batched applyInPandas per group
    (`operators/packing.pack_sequences_greedy`); the oracle replays the
    same recurrence as a linear recursive CTE stepping all groups in
    lockstep."""
    from seccosql_spark.operators.packing import pack_sequences_greedy

    docs = sess.spark.table("documents")
    with_tokens = docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))).alias(
            "n_tokens"
        ),
    )
    return sess.from_spark(pack_sequences_greedy(with_tokens, capacity=256, part_size=64))


URL_CANON_ORACLE = """
WITH raw AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) || '://' ||
         (CASE WHEN doc_id % 3 = 0 THEN 'www.'
               WHEN doc_id % 3 = 1 THEN 'WWW.' ELSE '' END) ||
         (CASE WHEN doc_id % 2 = 0
               THEN 'src' || CAST((doc_id // 3) % 20 AS VARCHAR) || '.example.com'
               ELSE 'Src' || CAST((doc_id // 3) % 20 AS VARCHAR) || '.Example.COM'
          END) ||
         (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
         '/docs/' || CAST(doc_id // 3 AS VARCHAR) ||
         (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
         '?id=' || CAST(doc_id // 3 AS VARCHAR) ||
         (CASE WHEN doc_id % 2 = 1
               THEN '&utm_source=feed&utm_campaign=c' || CAST(doc_id % 7 AS VARCHAR)
               ELSE '' END) ||
         (CASE WHEN doc_id % 6 = 0
               THEN '#sec' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END) AS url
  FROM documents),
c AS (
  SELECT doc_id, url,
         lower(split_part(u, '://', 1)) || '://' ||
         regexp_replace(lower(split_part(split_part(split_part(u, '://', 2),
                                                    '/', 1), ':', 1)),
                        '^www\\.', '') ||
         (CASE WHEN split_part(split_part(u, '://', 2), '/', 1) NOT LIKE '%:%'
                 OR split_part(split_part(split_part(u, '://', 2), '/', 1),
                               ':', 2)
                    = (CASE WHEN lower(split_part(u, '://', 1)) = 'https'
                            THEN '443'
                            WHEN lower(split_part(u, '://', 1)) = 'http'
                            THEN '80' ELSE '' END)
               THEN ''
               ELSE ':' || split_part(split_part(split_part(u, '://', 2),
                                                 '/', 1), ':', 2) END) ||
         regexp_replace(split_part(pathq, '?', 1), '/+$', '') ||
         (CASE WHEN array_to_string(
                      list_filter(string_split(split_part(pathq, '?', 2), '&'),
                                  p -> substr(p, 1, 4) <> 'utm_'), '&') = ''
               THEN ''
               ELSE '?' || array_to_string(
                      list_filter(string_split(split_part(pathq, '?', 2), '&'),
                                  p -> substr(p, 1, 4) <> 'utm_'), '&') END)
           AS canon
  FROM (SELECT doc_id, url, u,
               substr(split_part(u, '://', 2),
                      length(split_part(split_part(u, '://', 2), '/', 1)) + 1)
                 AS pathq
        FROM (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u
              FROM raw)))
SELECT split_part(split_part(canon, '://', 2), '/', 1) AS host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
       CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical
FROM c GROUP BY host
"""


@register("url_canonical_dedup", URL_CANON_ORACLE)
def url_canonical_dedup(sess: SeccoSession):
    """URL canonicalization + host-level dedup report — the normalize pass
    a web-corpus pipeline runs before URL dedup: case-folded scheme/host,
    'www.' stripped, default :443 dropped, utm_* tracking params removed,
    fragments discarded, trailing slashes trimmed. The corpus derives a
    deterministic messy URL per document (every third doc shares a logical
    target; doc_id-driven case/port/slash/utm/fragment noise makes each raw
    string unique — the planted-corpus pattern of ann_lsh_clustered), so
    the per-host report proves the canonicalizer collapses ~3 raw variants
    into 1: host, n_urls, n_raw_distinct, n_canonical.

    Scale shape: generation + canonicalization are ONE map-only projection
    (operators/text.canonical_url — split_part/regexp/higher-order filter,
    no UDF), then a single groupBy(host) with partial aggregation; the
    count(DISTINCT ...) pair rides the same shuffle. At 100 TB the host
    grouping is the natural partition key for crawl data, and the
    canonical column — not the raw one — is what the downstream exact-dedup
    hash-groupBy consumes."""
    from seccosql_spark.operators.text import canonical_url

    docs = sess.spark.table("documents")
    t = F.expr("doc_id DIV 3").cast("string")
    n = F.expr("(doc_id DIV 3) % 20").cast("string")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https")).otherwise(F.lit("HTTPS")),
        F.lit("://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www."))
        .when(F.col("doc_id") % 3 == 1, F.lit("WWW."))
        .otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("src"), n, F.lit(".example.com")),
        ).otherwise(F.concat(F.lit("Src"), n, F.lit(".Example.COM"))),
        F.when(F.col("doc_id") % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"),
        t,
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?id="),
        t,
        F.when(
            F.col("doc_id") % 2 == 1,
            F.concat(
                F.lit("&utm_source=feed&utm_campaign=c"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(F.lit("#sec"), (F.col("doc_id") % 4).cast("string")),
        ).otherwise(F.lit("")),
    )
    base = docs.select(url.alias("url")).withColumn(
        "canon", canonical_url(F.col("url"))
    )
    out = (
        base.withColumn(
            "host",
            F.split_part(
                F.split_part(F.col("canon"), F.lit("://"), F.lit(2)),
                F.lit("/"),
                F.lit(1),
            ),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("url").cast("long").alias("n_raw_distinct"),
            F.countDistinct("canon").cast("long").alias("n_canonical"),
        )
    )
    return sess.from_spark(out)
