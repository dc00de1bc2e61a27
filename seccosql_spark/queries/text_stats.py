"""Corpus-statistics queries: TF-IDF, vocabulary building, length
histograms, per-source quantiles — the analysis layer a training-data
pipeline runs before filtering/mixing decisions. All integer-exact except
TF-IDF/quantiles (rounded; interpolation formulas match across engines)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from seccosql_spark.operators.text import (
    bpe_encode_expr,
    bpe_split_expr,
    redact_pii,
    repetition_stats,
)
from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession

WORDS_ALL_SQL = """
SELECT doc_id AS id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
FROM documents
"""


@register(
    "text_vocab_top20",
    f"""WITH words AS ({WORDS_ALL_SQL})
        SELECT w, count(*) AS n FROM words GROUP BY w
        ORDER BY n DESC, w LIMIT 20""",
)
def text_vocab_top20(sess: SeccoSession):
    """Vocabulary building: global token frequencies, top-20 (bag counts —
    one partial-aggregated shuffle on the token)."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    words = sess.spark.table("documents").select(F.explode(toks).alias("w"))
    return sess.from_spark(
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(20)
    )


TFIDF_ORACLE = f"""
WITH words AS ({WORDS_ALL_SQL}),
tf AS (SELECT id, w, count(*) AS tf FROM words GROUP BY id, w),
dl AS (SELECT id, count(*) AS dl FROM words GROUP BY id),
df AS (SELECT w, count(DISTINCT id) AS df FROM words GROUP BY w),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.id, tf.w,
         round((tf.tf / dl.dl) * ln(n.n_docs / df.df), 6) AS tfidf
  FROM tf JOIN dl ON tf.id = dl.id JOIN df ON tf.w = df.w CROSS JOIN n
)
SELECT id, w, tfidf FROM (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, w) AS rn
  FROM scored
) WHERE rn <= 3
"""


@register("text_tfidf_top3", TFIDF_ORACLE)
def text_tfidf_top3(sess: SeccoSession):
    """TF-IDF: top-3 scoring terms per document. tf/dl and N/df are exact
    int ratios; ln + round(6) keeps libm last-ulp drift out of the ranking
    (ties broken by term)."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    words = sess.spark.table("documents").select(
        F.col("doc_id").alias("id"), F.explode(toks).alias("w")
    )
    tf = words.groupBy("id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dl = words.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    df = words.groupBy("w").agg(F.countDistinct("id").alias("df"))
    n_docs = sess.spark.table("documents").count()
    scored = (
        tf.join(dl, "id")
        .join(df, "w")
        .select(
            "id",
            "w",
            F.round(
                (F.col("tf") / F.col("dl")) * F.log(F.lit(n_docs) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w_rank = Window.partitionBy("id").orderBy(F.col("tfidf").desc(), "w")
    return sess.from_spark(
        scored.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 3)
        .select("id", "w", "tfidf")
    )


@register(
    "text_length_histogram",
    """SELECT CAST(n_chars // 100 AS INT) AS bucket, count(*) AS n
       FROM documents GROUP BY n_chars // 100""",
)
def text_length_histogram(sess: SeccoSession):
    """Doc-length histogram (100-char buckets) — the length-filter
    calibration step."""
    return sess.from_spark(
        sess.spark.table("documents")
        .groupBy((F.col("n_chars") / 100).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "source_quantiles",
    """SELECT source,
              count(*) AS n,
              round(quantile_cont(n_chars, 0.25), 4) AS p25,
              round(quantile_cont(n_chars, 0.50), 4) AS p50,
              round(quantile_cont(n_chars, 0.75), 4) AS p75
       FROM documents GROUP BY source""",
)
def source_quantiles(sess: SeccoSession):
    """Per-source length quantiles (exact interpolated percentiles — Spark's
    percentile and DuckDB's quantile_cont share the linear-interpolation
    formula)."""
    return sess.from_spark(
        sess.spark.table("documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(n_chars, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(n_chars, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(n_chars, 0.75)"), 4).alias("p75"),
        )
    )


REPETITION_ORACLE = """
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
tok AS (SELECT doc_id, len(ws) AS n, unnest(ws) AS word FROM w),
wc AS (SELECT doc_id, any_value(n) AS n, word, count(*) AS c
       FROM tok GROUP BY doc_id, word),
top AS (SELECT doc_id,
               CASE WHEN any_value(n) > 0
                    THEN round(CAST(max(c) AS DOUBLE) / any_value(n), 6)
                    ELSE 0.0 END AS top_word_ratio
        FROM wc GROUP BY doc_id),
g2 AS (SELECT doc_id,
              CASE WHEN len(ws) >= 2
                   THEN list_transform(range(1, len(ws)),
                                       i -> array_to_string(ws[i:i+1], ' '))
                   ELSE [] END AS g
       FROM w),
dup AS (SELECT doc_id,
               CASE WHEN len(g) > 0
                    THEN round(CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
                               / len(g), 6)
                    ELSE 0.0 END AS dup_2gram_ratio
        FROM g2)
SELECT w.doc_id, coalesce(top.top_word_ratio, 0.0) AS top_word_ratio,
       dup.dup_2gram_ratio
FROM w LEFT JOIN top ON w.doc_id = top.doc_id
       JOIN dup ON w.doc_id = dup.doc_id
"""


@register("text_repetition_stats", REPETITION_ORACLE)
def text_repetition_stats(sess: SeccoSession):
    """Gopher-style repetition quality signals: most-frequent-word share and
    duplicated-2-gram fraction per document. The 2-gram ratio is computed by
    per-row array expressions (map-only); the word histogram is one explode
    + one doc-keyed shuffle — both shapes hold at corpus scale."""
    return sess.from_spark(repetition_stats(sess.spark.table("documents")))


REDACT_ORACLE = """
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents
),
e AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}')) AS INT) AS n_emails,
             regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}', '<EMAIL>', 'g') AS t1
      FROM aug)
SELECT doc_id, n_emails,
       CAST(len(regexp_extract_all(t1, '[+][0-9]{1,2} [0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
       md5(regexp_replace(t1, '[+][0-9]{1,2} [0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
FROM e
"""


@register("text_redact_pii", REDACT_ORACLE)
def text_redact_pii(sess: SeccoSession):
    """PII scrubbing pass: emails then phone numbers replaced by fixed tags,
    with match counts and an md5 of the scrubbed text proving full-string
    equality against the oracle. The synthetic corpus contains no PII, so a
    deterministic contact line (derived from doc_id) is appended first —
    the regex plumbing under test is exactly what runs on real data.
    Map-only scan: no shuffle at any corpus size."""
    docs = sess.spark.table("documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return sess.from_spark(redact_pii(aug))


CHUNK_ORACLE = """
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
s AS (SELECT doc_id, ws, unnest(range(1, greatest(len(ws), 1) + 1, 24)) AS st
      FROM w WHERE len(ws) > 0),
k AS (SELECT doc_id, ws, st,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY st) - 1 AS INT) AS chunk_id
      FROM s WHERE st = 1 OR st - 24 + 31 < len(ws))
SELECT doc_id AS id, chunk_id,
       CAST(len(ws[st:st+31]) AS INT) AS n_tokens,
       array_to_string(ws[st:st+31], ' ') AS chunk_text
FROM k
"""


@register("text_chunk_windows", CHUNK_ORACLE)
def text_chunk_windows(sess: SeccoSession):
    """Fixed-window document chunking (32 tokens, overlap 8 → stride 24) —
    the long-document split every training pipeline runs before
    tokenization (`operators/text.chunk_documents`: map-only slice+join,
    zero shuffles). Full chunk text is hash-checked, so boundary arithmetic
    (1-based slices, no redundant tail chunks) must match exactly."""
    from seccosql_spark.operators.text import chunk_documents

    return sess.from_spark(
        chunk_documents(sess.spark.table("documents"), chunk_tokens=32, overlap=8)
    )


GOPHER_ORACLE = """
WITH w AS (SELECT doc_id, text,
                  list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
st AS (SELECT doc_id, len(ws) AS n,
              CAST(coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS BIGINT) AS sl
       FROM w),
sh AS (SELECT doc_id,
              CAST((len(p) - len(replace(p, ' the ', ''))) // 5
                 + (len(p) - len(replace(p, ' a ', ''))) // 3 AS BIGINT) AS hits
       FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)),
mc AS (SELECT doc_id, max(c) AS mx
       FROM (SELECT doc_id, word, count(*) AS c
             FROM (SELECT doc_id, unnest(ws) AS word FROM w)
             GROUP BY 1, 2)
       GROUP BY 1)
SELECT s.doc_id,
       CAST(s.n AS INT) AS n_tokens,
       (s.n BETWEEN 20 AND 10000) AS r_len,
       (3 * s.n <= s.sl AND s.sl <= 10 * s.n) AS r_word_len,
       (h.hits >= 2) AS r_stop,
       (10 * coalesce(m.mx, 0) <= s.n) AS r_rep,
       ((s.n BETWEEN 20 AND 10000) AND (3 * s.n <= s.sl AND s.sl <= 10 * s.n)
        AND (h.hits >= 2) AND (10 * coalesce(m.mx, 0) <= s.n)) AS keep
FROM st s JOIN sh h USING (doc_id) LEFT JOIN mc m USING (doc_id)
"""


@register("text_gopher_filter", GOPHER_ORACLE)
def text_gopher_filter(sess: SeccoSession):
    """The Gopher document-quality rule set (Rae et al. 2021 §A1.1) with
    per-rule audit booleans: token-count bounds, mean-word-length bounds,
    stopword floor, top-word repetition cap, and the combined keep flag.
    Integer cross-multiplied comparisons end to end (no float ratios), so
    the oracle matches bit-for-bit; one explode+shuffle for the word
    histogram, everything else map-only (`operators/text.gopher_quality`)."""
    from seccosql_spark.operators.text import gopher_quality

    return sess.from_spark(gopher_quality(sess.spark.table("documents")))


POSTINGS_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
)
SELECT w AS term,
       CAST(count(*) AS BIGINT) AS df,
       array_to_string((list(doc_id ORDER BY doc_id))[1:8], ',') AS posting_head
FROM tok GROUP BY w
"""


@register("inverted_index_postings", POSTINGS_ORACLE)
def inverted_index_postings(sess: SeccoSession):
    """Inverted-index build: term -> document frequency + the first 8 doc
    ids of its sorted posting list — the corpus artifact behind search,
    decontamination lookups, and rare-token auditing. The head is CAPPED
    BEFORE collection: a term-keyed window ranks postings (sort-based,
    streaming — never materializes a term's full list), the collect gathers
    only rank <= 8, and df falls out of the same pass as max(rank). The
    window and the groupBy share the term hash partitioning, so the whole
    build is one explode + ONE shuffle; a hot term appearing in every
    document costs 8 collected ids, not a corpus-sized row (the trap a
    naive slice(collect_list) hits at 100 TB). The head is emitted as a
    comma-joined STRING (not array<bigint>) so downstream tabular tools —
    including the driver's pandas canonicalizer, which cannot sort list
    columns — can treat it as a scalar key."""
    docs = sess.spark.table("documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
            )
        ).alias("term"),
    )
    ranked = tok.withColumn(
        "rn", F.row_number().over(Window.partitionBy("term").orderBy("doc_id"))
    )
    return sess.from_spark(
        ranked.groupBy("term").agg(
            F.max("rn").cast("long").alias("df"),
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(F.when(F.col("rn") <= 8, F.col("doc_id")))
                ),
            ).alias("posting_head"),
        )
    )


CORR_ORACLE = """
WITH t AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS y
  FROM documents
),
s AS (SELECT source, CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM t GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                       / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6)
            ELSE NULL END AS corr_chars_tokens
FROM s
"""


@register("stats_corr_by_source", CORR_ORACLE)
def stats_corr_by_source(sess: SeccoSession):
    """Per-source Pearson correlation between document length in chars and
    in tokens — the corpus-audit statistic behind 'is token count just a
    proxy for bytes here'. Computed from raw integer power sums (n, Σx, Σy,
    Σxy, Σx², Σy² exact in DECIMAL(38,0)/HUGEINT — BIGINT wraps at corpus
    scale; the final expression is two sqrts and
    a division on identical integers), so both engines produce the same
    double and round(6) is safe — unlike calling each engine's corr(),
    whose internal summation orders differ. One aggregation, map-side
    partial, any scale."""
    docs = sess.spark.table("documents")
    t = docs.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.size(F.filter(F.split(F.col("text"), " "), lambda c: c != F.lit("")))
        .cast("long")
        .alias("y"),
    )
    # DECIMAL(38,0) power sums (oracle: HUGEINT): n*sxx over a 100 TB
    # corpus wraps int64 silently with ANSI off — same lift as
    # g_degree_assortativity and orders_monthly_trend
    d = "decimal(38,0)"
    s = t.groupBy("source").agg(
        F.count(F.lit(1)).cast(d).alias("n"),
        F.sum(F.col("x").cast(d)).cast(d).alias("sx"),
        F.sum(F.col("y").cast(d)).cast(d).alias("sy"),
        F.sum((F.col("x").cast(d) * F.col("y")).cast(d)).cast(d).alias("sxy"),
        F.sum((F.col("x").cast(d) * F.col("x")).cast(d)).cast(d).alias("sxx"),
        F.sum((F.col("y").cast(d) * F.col("y")).cast(d)).cast(d).alias("syy"),
    )
    return sess.from_spark(
        s.select(
            "source",
            F.col("n").cast("long").alias("n"),
            # zero variance (constant-length source) => Pearson undefined:
            # NULL in both engines, never a divide (same guard as
            # g_degree_assortativity, r10 sf0.1 sweep discipline)
            F.when(
                ((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) > 0)
                & ((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")) > 0),
                F.round(
                    (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                    / F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
                    / F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
                    6,
                ),
            ).alias("corr_chars_tokens"),
        )
    )


UNIGRAM_LP_ORACLE = """
WITH words AS (
  SELECT doc_id AS id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
vocab AS (SELECT w, count(*) AS c FROM words GROUP BY w),
total AS (SELECT sum(c) AS t FROM vocab),
terms AS (
  SELECT words.id,
         CAST(round(ln(CAST(vocab.c AS DOUBLE) / total.t), 9) AS DECIMAL(18,9)) AS lp
  FROM words JOIN vocab USING (w) CROSS JOIN total
)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(lp) AS DOUBLE) AS logprob
FROM terms GROUP BY id
"""


@register("text_unigram_logprob", UNIGRAM_LP_ORACLE)
def text_unigram_logprob(sess: SeccoSession):
    """Unigram language-model scoring — the cheap stand-in for perplexity
    filtering: each document's sum of ln(corpus unigram probability) over
    its tokens (more negative = more surprising under the corpus
    distribution). The per-token ln is rounded to DECIMAL(18,9) BEFORE
    summing, so the aggregation is exact and associative — double
    summation order across partitions can never flip the result. One
    vocab aggregation (broadcast back), one doc-keyed aggregation."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    words = sess.spark.table("documents").select(
        F.col("doc_id").alias("id"), F.explode(toks).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    terms = (
        words.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            F.round(F.log(F.col("c").cast("double") / F.col("t")), 9)
            .cast("decimal(18,9)")
            .alias("lp"),
        )
    )
    return sess.from_spark(
        terms.groupBy(F.col("id").alias("doc_id")).agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lp").cast("double").alias("logprob"),
        )
    )


BIGRAM_LP_ORACLE = """
WITH toks AS (
  SELECT doc_id AS id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
bi AS (SELECT id, t[i] AS u, t[i + 1] AS v
       FROM toks, unnest(range(1, len(t))) AS r(i)),
c1 AS (SELECT u, count(*) AS cu FROM bi GROUP BY u),
c2 AS (SELECT u, v, count(*) AS cuv FROM bi GROUP BY u, v),
vv AS (SELECT count(DISTINCT w) AS nv
       FROM (SELECT unnest(t) AS w FROM toks)),
terms AS (
  SELECT bi.id,
         CAST(round(ln(CAST(cuv + 1 AS DOUBLE) / (cu + nv)), 9)
              AS DECIMAL(18,9)) AS lp
  FROM bi JOIN c2 USING (u, v) JOIN c1 USING (u) CROSS JOIN vv
)
SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(lp) AS DOUBLE) AS logprob
FROM terms GROUP BY id
"""


@register("text_bigram_logprob", BIGRAM_LP_ORACLE)
def text_bigram_logprob(sess: SeccoSession):
    """Bigram language-model scoring with add-one (Laplace) smoothing —
    one order up from `text_unigram_logprob`, the shape of real
    perplexity-based quality filters (context-conditioned surprise
    catches repetitive/boilerplate text a unigram model scores as
    normal): per document, Σ ln (c(u,v)+1)/(c(u)+|V|) over its adjacent
    token pairs. The bigram and context-count tables are corpus-level
    aggregations broadcast back (vocab here is 31 words, and even a
    realistic bigram table is millions of rows — broadcast- or
    bucket-joinable, never quadratic); per-pair ln is rounded to
    DECIMAL(18,9) BEFORE summing so cross-partition order can't flip the
    result. Pair extraction guards the Spark sequence(1,0)-descends trap
    for sub-2-token docs (empty pair list, doc drops out in both
    engines)."""
    t = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    docs = sess.spark.table("documents").select(
        F.col("doc_id").alias("id"), t.alias("t")
    )
    pairs = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at("t", i).alias("u"),
                F.element_at("t", i + 1).alias("v"),
            ),
        ),
    ).otherwise(F.array())
    bi = docs.select("id", F.explode(pairs).alias("b")).select(
        "id", F.col("b.u").alias("u"), F.col("b.v").alias("v")
    )
    c1 = bi.groupBy("u").agg(F.count(F.lit(1)).alias("cu"))
    c2 = bi.groupBy("u", "v").agg(F.count(F.lit(1)).alias("cuv"))
    vv = docs.select(F.explode("t").alias("w")).agg(
        F.count_distinct("w").alias("nv")
    )
    terms = (
        bi.join(F.broadcast(c2), ["u", "v"])
        .join(F.broadcast(c1), "u")
        .crossJoin(F.broadcast(vv))
        .select(
            "id",
            F.round(
                F.log((F.col("cuv") + 1).cast("double") / (F.col("cu") + F.col("nv"))),
                9,
            )
            .cast("decimal(18,9)")
            .alias("lp"),
        )
    )
    return sess.from_spark(
        terms.groupBy(F.col("id").alias("doc_id")).agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("lp").cast("double").alias("logprob"),
        )
    )


# Canonical split thresholds — shared with split_leakage_report (the
# contamination audit must straddle THIS assignment, never a stale copy).
SPLIT_TEST_HEX = "0c"  # md5 prefix below => test (~4.7%)
SPLIT_VAL_HEX = "1a"   # below => val (~10.2%); else train

SPLIT_CASE_SQL = f"""CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{SPLIT_TEST_HEX}' THEN 'test'
              WHEN md5(CAST(doc_id AS VARCHAR)) < '{SPLIT_VAL_HEX}' THEN 'val'
              ELSE 'train' END"""


def split_expr():
    """Spark Column for the canonical split assignment."""
    md5 = F.md5(F.col("doc_id").cast("string"))
    return (
        F.when(md5 < SPLIT_TEST_HEX, "test")
        .when(md5 < SPLIT_VAL_HEX, "val")
        .otherwise("train")
    )


SPLIT_ORACLE = f"""
SELECT doc_id, {SPLIT_CASE_SQL} AS split
FROM documents
"""


@register("split_train_val_test", SPLIT_ORACLE)
def split_train_val_test(sess: SeccoSession):
    """Deterministic train/val/test assignment by content-free id hash:
    md5(doc_id) below '0c' (≈ 4.7%) → test, below '1a' (≈ 10.2%) → val,
    else train — reproducible across runs/engines, stable under corpus
    growth (a document's split never changes when others are added), and
    map-only. The hex-prefix thresholds are the same integer-free
    comparison trick as `sampling.hash_sample`."""
    return sess.from_spark(
        sess.spark.table("documents").select("doc_id", split_expr().alias("split"))
    )


PMI_ORACLE = """
WITH w AS (
  SELECT DISTINCT doc_id AS id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
n AS (SELECT count(DISTINCT id) AS n_docs FROM w),
cw AS (SELECT w, count(*) AS c FROM w GROUP BY w),
pairs AS (
  SELECT a.w AS x, b.w AS y, count(*) AS cxy
  FROM w a JOIN w b ON a.id = b.id AND a.w < b.w
  GROUP BY a.w, b.w
)
SELECT p.x, p.y, CAST(p.cxy AS BIGINT) AS cxy,
       round(ln(CAST(p.cxy AS DOUBLE) * n.n_docs / cx.c / cy.c), 6) AS pmi
FROM pairs p
JOIN cw cx ON p.x = cx.w JOIN cw cy ON p.y = cy.w CROSS JOIN n
WHERE p.cxy >= 50
"""


@register("text_cooccurrence_pmi", PMI_ORACLE)
def text_cooccurrence_pmi(sess: SeccoSession):
    """Token co-occurrence PMI — the corpus-association statistic behind
    collocation mining and tokenizer-merge auditing: for every token pair
    appearing together in >= 50 documents, pmi = ln(P(x,y)/(P(x)P(y)))
    over document-level occurrence. The doc-local self-join is bounded by
    per-document distinct-token count squared (never corpus-quadratic);
    counts are integers and ln takes an exact integer ratio, so round(6)
    is engine-stable (same discipline as TF-IDF)."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    w = (
        sess.spark.table("documents")
        .select(F.col("doc_id").alias("id"), F.explode(F.array_distinct(toks)).alias("w"))
    )
    n_docs = w.select("id").distinct().count()
    cw = w.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    a = w.select("id", F.col("w").alias("x"))
    b = w.select("id", F.col("w").alias("y"))
    pairs = (
        a.join(b, "id")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= 50)
    )
    return sess.from_spark(
        pairs.join(F.broadcast(cw.withColumnsRenamed({"w": "x", "c": "cx"})), "x")
        .join(F.broadcast(cw.withColumnsRenamed({"w": "y", "c": "cy"})), "y")
        .select(
            "x",
            "y",
            F.col("cxy").cast("long").alias("cxy"),
            F.round(
                F.log(
                    F.col("cxy").cast("double") * F.lit(n_docs) / F.col("cx") / F.col("cy")
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003
# — the MOSS algorithm). k-gram hashes, then the minimum hash of every
# w-gram guarantee window; any shared substring of length >= k + w - 1
# tokens is guaranteed to share a fingerprint, which is the property MOSS
# uses for plagiarism/near-dup detection at corpus scale.
# ---------------------------------------------------------------------------

WINNOW_K = 4  # tokens per gram
WINNOW_W = 5  # grams per guarantee window


def _h32_of(expr: str) -> str:
    """DuckDB SQL: first 8 hex chars of an md5-hex expression as a 32-bit
    integer (digit arithmetic — DuckDB has no conv())."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )


WINNOW_ORACLE = f"""
WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents),
gi AS (SELECT doc_id, t, len(t) - {WINNOW_K - 1} AS n,
              unnest(range(1, len(t) - {WINNOW_K - 2})) AS i
       FROM toks),
g AS (SELECT doc_id, i - 1 AS p, n,
             md5(array_to_string(t[i:i + {WINNOW_K - 1}], ' ')) AS gh
      FROM gi),
h AS (SELECT doc_id, p, n, CAST({_h32_of('gh')} AS BIGINT) AS h32 FROM g),
wm AS (SELECT doc_id, p, n,
              min(h32) OVER (PARTITION BY doc_id ORDER BY p
                             ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp
       FROM h)
SELECT DISTINCT doc_id, fp
FROM wm WHERE p + {WINNOW_W} <= n OR (p = 0 AND n < {WINNOW_W})
"""


@register("text_winnowing_fingerprint", WINNOW_ORACLE)
def text_winnowing_fingerprint(sess: SeccoSession):
    """Robust winnowing fingerprints (Schleimer et al. 2003): hash every
    4-token gram, keep the minimum hash of each 5-gram window — the
    distinct (doc_id, fp) set is the document's MOSS-style signature with
    the guarantee that any 8-token shared substring produces a shared
    fingerprint. Map-side gram hashing (one md5 per gram), ONE shuffle on
    doc_id for the window min, distinct piggybacks on the same
    partitioning. Window starts that would run past the gram list are
    excluded (frame truncation differs from true winnowing there); a doc
    shorter than one full window keeps its single truncated window."""
    k, w = WINNOW_K, WINNOW_W
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    grams = (
        sess.spark.table("documents")
        .select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= k)
        .select(
            "doc_id",
            (F.size("t") - F.lit(k - 1)).alias("n"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - F.lit(k - 1)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("t", i, k))),
                )
            ).alias("p", "gh"),
        )
        .select(
            "doc_id", "n", "p",
            F.conv(F.substring("gh", 1, 8), 16, 10).cast("long").alias("h32"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, w - 1)
    return sess.from_spark(
        grams.select("doc_id", "n", "p", F.min("h32").over(win).alias("fp"))
        .filter((F.col("p") + w <= F.col("n")) | ((F.col("p") == 0) & (F.col("n") < w)))
        .select("doc_id", "fp")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Corpus-level overlap: exact shingle-set Jaccard between sources — the
# dataset-vs-dataset contamination / redundancy audit run before mixing
# corpora into a training blend.
# ---------------------------------------------------------------------------

SOURCE_OVERLAP_ORACLE = """
WITH toks AS (SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents),
si AS (SELECT source, t, unnest(range(1, len(t) - 3)) AS i FROM toks),
s AS (SELECT DISTINCT source, md5(array_to_string(t[i:i + 4], ' ')) AS sh
      FROM si),
sz AS (SELECT source, count(*) AS n FROM s GROUP BY source),
inter AS (SELECT a.source AS s1, b.source AS s2, count(*) AS i
          FROM s a JOIN s b ON a.sh = b.sh AND a.source < b.source
          GROUP BY 1, 2)
SELECT s1, s2, CAST(i AS BIGINT) AS n_shared,
       round(i / (x.n + y.n - i), 6) AS jaccard
FROM inter JOIN sz x ON s1 = x.source JOIN sz y ON s2 = y.source
"""


@register("corpus_source_overlap", SOURCE_OVERLAP_ORACLE)
def corpus_source_overlap(sess: SeccoSession):
    """Pairwise exact 5-gram-shingle Jaccard between sources: the
    corpus-mixing audit that finds which feeds duplicate each other before
    they are blended into training data. The shingle sets are deduplicated
    per source FIRST (one aggregation), so the pair join fans out per
    shared shingle over #sources, never over documents; source count is
    small by construction, so the pair space is bounded. Integer
    intersection/union, one rounded division at the end."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    s = (
        sess.spark.table("documents")
        .select("source", toks.alias("t"))
        .filter(F.size("t") >= 5)
        .select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - F.lit(4)),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("t", i, 5))),
                )
            ).alias("sh"),
        )
        .distinct()
    )
    sz = s.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        s.select(F.col("source").alias("s1"), "sh")
        .join(s.select(F.col("source").alias("s2"), "sh"), "sh")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return sess.from_spark(
        inter.join(F.broadcast(sz.withColumnsRenamed({"source": "s1", "n": "n1"})), "s1")
        .join(F.broadcast(sz.withColumnsRenamed({"source": "s2", "n": "n2"})), "s2")
        .select(
            "s1", "s2",
            F.col("i").cast("long").alias("n_shared"),
            F.round(F.col("i") / (F.col("n1") + F.col("n2") - F.col("i")), 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 ranking (Robertson & Zaragoza 2009, the Lucene-default scoring
# function) for a fixed query — the retrieval primitive behind RAG corpus
# construction and search-quality audits.
# ---------------------------------------------------------------------------

BM25_TERMS = ("join", "hash", "scan")
BM25_TOPK = 20

_BM25_TERMS_SQL = ", ".join(f"('{t}')" for t in BM25_TERMS)

# k1 = 1.2, b = 0.75 -> k1+1 = 2.2, k1*(1-b) = 0.3, k1*b = 0.9. The idf ln
# is rounded to 9 decimals (engine libm ulp discipline, same as
# text_unigram_logprob), each per-term score is rounded to DECIMAL(18,9)
# BEFORE the per-doc sum so partial-aggregation order can never flip bits.
BM25_ORACLE = f"""
WITH words AS (
  SELECT doc_id AS id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
q AS (SELECT * FROM (VALUES {_BM25_TERMS_SQL}) t(term)),
dl AS (SELECT id, count(*) AS dl FROM words GROUP BY id),
stats AS (SELECT count(*) AS n, sum(dl) AS tot FROM dl),
df AS (SELECT w AS term, count(DISTINCT id) AS df FROM words JOIN q ON w = term GROUP BY w),
tf AS (SELECT id, w AS term, count(*) AS tf FROM words JOIN q ON w = term GROUP BY id, w),
scored AS (
  SELECT tf.id,
         CAST(round(round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)), 9)
                    * tf.tf * 2.2
                    / (tf.tf + 0.3 + 0.9 * dl.dl * stats.n / stats.tot), 9)
              AS DECIMAL(18,9)) AS s
  FROM tf JOIN df USING (term) JOIN dl ON tf.id = dl.id CROSS JOIN stats
)
SELECT id AS doc_id, CAST(sum(s) AS DOUBLE) AS bm25
FROM scored GROUP BY id
ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}
"""


@register("text_bm25_topk", BM25_ORACLE)
def text_bm25_topk(sess: SeccoSession):
    """BM25 top-{k} for the fixed query {terms}: idf(t) * tf*(k1+1) /
    (tf + k1*(1-b+b*dl/avgdl)) with k1=1.2, b=0.75 and the +1 idf variant
    Lucene uses. Corpus stats (N, total length) are one tiny aggregate
    broadcast everywhere; tf is computed only for query terms (the term
    filter is pushed into the scan side of the explode), so the scored
    relation is |q| rows per matching doc, never a full posting table.
    Exact-decimal per-doc sum; ties broken by doc_id for a deterministic
    top-k set."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    words = sess.spark.table("documents").select(
        F.col("doc_id").alias("id"), F.explode(toks).alias("w")
    )
    dl = words.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tot"))
    qterms = F.col("w").isin(*BM25_TERMS)
    df_ = words.filter(qterms).groupBy(F.col("w").alias("term")).agg(
        F.count_distinct("id").alias("df")
    )
    tf = words.filter(qterms).groupBy("id", F.col("w").alias("term")).agg(
        F.count(F.lit(1)).alias("tf")
    )
    idf = F.round(F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)), 9)
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            F.round(
                idf * F.col("tf") * 2.2
                / (F.col("tf") + 0.3 + 0.9 * F.col("dl") * F.col("n") / F.col("tot")),
                9,
            ).cast("decimal(18,9)").alias("s"),
        )
    )
    return sess.from_spark(
        scored.groupBy(F.col("id").alias("doc_id"))
        .agg(F.sum("s").cast("double").alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# Percentile-band length filter: drop each source's shortest 5% and longest
# 5% of documents — the rank-based outlier trim curation pipelines apply
# before quality scoring (extreme-length docs are boilerplate or
# concatenation artifacts).
# ---------------------------------------------------------------------------

LENGTH_BAND_ORACLE = """
WITH r AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS cnt
  FROM documents
)
SELECT doc_id, source, n_chars
FROM r WHERE 20 * rn > cnt AND 20 * rn <= 19 * cnt
"""


@register("text_length_percentile_band", LENGTH_BAND_ORACLE)
def text_length_percentile_band(sess: SeccoSession):
    """Keep documents strictly inside their source's (P5, P95] length band
    by rank: a doc survives iff 20*rank > count and 20*rank <= 19*count —
    pure integer cross-multiplication, no percentile interpolation
    formula to keep in sync across engines. One shuffle on source (both
    window functions share it); rank ties broken by doc_id so the kept
    SET is deterministic."""
    win = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    cw = Window.partitionBy("source")
    r = sess.spark.table("documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"),
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    return sess.from_spark(
        r.filter((20 * F.col("rn") > F.col("cnt")) & (20 * F.col("rn") <= 19 * F.col("cnt")))
        .select("doc_id", "source", "n_chars")
    )


# ---------------------------------------------------------------------------
# BPE merge-rule training (iterative pair counting) — the tokenizer-training
# kernel of an LLM data pipeline.
# ---------------------------------------------------------------------------

BPE_ROUNDS = 3


def _bpe_round_sql(i: int) -> str:
    """One unrolled BPE round for the DuckDB oracle: pair counts from the
    current symbol table s{i-1}, deterministic argmax pair, then GREEDY
    left-to-right merge application WITHOUT recursion — overlapping matches
    (only possible when left == right, e.g. a run 'aaaa') are resolved by
    the gaps-and-islands parity rule: within each maximal run of
    consecutive match positions, greedy consumes the 1st, 3rd, ... match,
    which is provably what a single left-to-right pass does."""
    a, b = f"s{i - 1}", f"s{i}"
    return f"""
pairs{i} AS MATERIALIZED (
  SELECT a.sym AS l, b.sym AS r, CAST(sum(a.wt) AS BIGINT) AS freq
  FROM {a} a JOIN {a} b ON b.w = a.w AND b.p = a.p + 1
  GROUP BY 1, 2),
best{i} AS MATERIALIZED (
  SELECT l, r, freq FROM pairs{i} ORDER BY freq DESC, l, r LIMIT 1),
m{i} AS MATERIALIZED (
  SELECT a.w, a.p FROM {a} a JOIN {a} b ON b.w = a.w AND b.p = a.p + 1
  JOIN best{i} ON a.sym = best{i}.l AND b.sym = best{i}.r),
c{i} AS MATERIALIZED (
  SELECT w, p FROM (
    SELECT w, p, row_number() OVER (PARTITION BY w, p - rn ORDER BY p) AS rn2
    FROM (SELECT w, p, row_number() OVER (PARTITION BY w ORDER BY p) AS rn
          FROM m{i}))
  WHERE rn2 % 2 = 1),
{b} AS MATERIALIZED (
  SELECT w, wt, row_number() OVER (PARTITION BY w ORDER BY p) AS p, sym FROM (
    SELECT a.w, a.wt, a.p,
           CASE WHEN ca.p IS NOT NULL THEN a.sym || b.sym ELSE a.sym END AS sym
    FROM {a} a
    LEFT JOIN {a} b ON b.w = a.w AND b.p = a.p + 1
    LEFT JOIN c{i} ca ON ca.w = a.w AND ca.p = a.p
    LEFT JOIN c{i} cp ON cp.w = a.w AND cp.p = a.p - 1
    WHERE cp.p IS NULL))"""


# Shared oracle prelude for all three BPE rows: the distinct-word vocab,
# the char-split symbol table, and the unrolled merge rounds. ONE copy —
# a tokenization-rule change must not be able to desync the rows' oracles
# from each other or from the Spark side's shared _bpe_train.
_BPE_PRELUDE = (
    """
WITH w0 AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS wt FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents)
  GROUP BY w),
s0 AS MATERIALIZED (
  SELECT w, wt, p, substr(w, CAST(p AS INTEGER), 1) AS sym FROM (
    SELECT w, wt, unnest(range(1, len(w) + 1)) AS p FROM w0)),"""
    + ",".join(_bpe_round_sql(i) for i in range(1, BPE_ROUNDS + 1))
)


BPE_ORACLE = (
    _BPE_PRELUDE
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {i} AS round, l AS merge_left, r AS merge_right, freq FROM best{i}"
        for i in range(1, BPE_ROUNDS + 1)
    )
)


def _bpe_train(spark, rounds: int = BPE_ROUNDS):
    """Shared BPE training loop: returns (merges, syms) where merges is
    [(round, left, right, freq), ...] and syms is the distinct-word
    vocabulary DataFrame (w, wt, s) with the learned merges APPLIED — i.e.
    the encoded vocab. State is the vocabulary, never the corpus; each
    round is one explode+shuffle pair count, a 1-row argmax collect, and a
    map-only fold re-encode (``operators.text.bpe_encode_expr``, which owns
    the backslash-before-quote escaping discipline)."""
    docs = spark.table("documents")
    words = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wt"))
    )
    syms = words.select("w", "wt", bpe_split_expr("w").alias("s")).localCheckpoint(
        eager=True
    )

    merges = []
    for rnd in range(1, rounds + 1):
        pairs = (
            syms.select(
                "wt",
                F.explode(
                    # sequence(1, 0) DESCENDS in Spark, so a 1-symbol word
                    # must short-circuit to an empty pair list
                    F.expr(
                        "CASE WHEN size(s) < 2 THEN array() ELSE "
                        "transform(sequence(1, size(s) - 1), "
                        "i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"
                        " END"
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("wt").cast("long").alias("freq"))
        )
        best = pairs.orderBy(F.col("freq").desc(), "l", "r").limit(1).collect()
        if not best:
            break
        l, r, freq = best[0]["l"], best[0]["r"], best[0]["freq"]
        merges.append((rnd, l, r, freq))
        syms = syms.withColumn("s", bpe_encode_expr("s", [(l, r)])).localCheckpoint(
            eager=True
        )
    return merges, syms


@register("text_bpe_merges", BPE_ORACLE)
def text_bpe_merges(sess: SeccoSession):
    """BPE tokenizer training, the first {BPE_ROUNDS} merge rules (Sennrich
    et al. 2016): start from characters per DISTINCT word (weighted by the
    word's corpus frequency), then per round count adjacent symbol pairs,
    pick the most frequent (ties broken lexicographically — deterministic
    cross-engine), and apply the merge greedily left-to-right everywhere.

    Scale shape: the state is the distinct-word vocabulary (millions of
    rows at 100 TB, never the corpus), re-derived per round by a MAP-ONLY
    fold (`aggregate` over the symbol array — JVM higher-order function,
    no Python); pair counting is one explode + partially-aggregated
    shuffle per round; the argmax collects ONE row per round. Greedy
    overlap semantics (a run 'aaaa' under rule (a,a) becomes 'aa','aa')
    are pinned against the oracle's non-recursive gaps-and-islands parity
    formulation. Driver state: O(rounds) merge rules."""
    merges, _syms = _bpe_train(sess.spark)
    out = sess.spark.createDataFrame(
        merges, "round INT, merge_left STRING, merge_right STRING, freq LONG"
    )
    return sess.from_spark(out)


# ---------------------------------------------------------------------------
# BPE ENCODE: apply the trained merge table corpus-wide — the tokenizer
# application pass an LLM pipeline runs over all 100 TB after training.
# ---------------------------------------------------------------------------

BPE_ENCODE_ORACLE = (
    _BPE_PRELUDE
    + f""",
tokcnt AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS n_tok FROM s{BPE_ROUNDS} GROUP BY w),
sw AS MATERIALIZED (
  SELECT source, w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT source,
           unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents)
  GROUP BY source, w)
SELECT sw.source,
       CAST(sum(sw.cnt) AS BIGINT) AS n_words,
       CAST(sum(sw.cnt * len(sw.w)) AS BIGINT) AS n_chars,
       CAST(sum(sw.cnt * tokcnt.n_tok) AS BIGINT) AS n_tokens_bpe
FROM sw JOIN tokcnt USING (w)
GROUP BY sw.source
"""
)


@register("text_bpe_encode", BPE_ENCODE_ORACLE)
def text_bpe_encode(sess: SeccoSession):
    """Corpus-wide application of the trained BPE merge table (VERDICT r09
    task 5): per source, total words, total characters, and total tokens
    AFTER encoding with the {BPE_ROUNDS} learned merges — the compression
    report of a tokenizer-application pass.

    Scale shape: the merges are re-derived by the shared training loop
    (O(rounds) driver state), and — the part that matters at 100 TB — the
    corpus is NEVER re-encoded per occurrence: the encode fold
    (``operators.text.bpe_encode_expr``, one map-only JVM projection) runs
    over the DISTINCT word vocabulary only, and the corpus pass is a plain
    (source, word) count joined back to the per-word token count. Token
    arithmetic is all BIGINT (counts × word lengths — no wrap risk until
    ~1e14 tokens per source·word, far past any corpus)."""
    merges, syms = _bpe_train(sess.spark)
    # syms already carries the merges applied during training; size(s) is
    # the per-word token count under the learned table. (For encoding a
    # NEW corpus with a saved table, bpe_encode_expr(bpe_split_expr(...))
    # is the one-projection path — exercised in unit tests.)
    tokcnt = syms.select("w", F.size("s").cast("long").alias("n_tok"))
    docs = sess.spark.table("documents")
    sw = (
        docs.select(
            "source",
            F.explode(
                F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
            ).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    out = (
        sw.join(tokcnt, "w")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.length("w")).cast("long").alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_tok")).cast("long").alias("n_tokens_bpe"),
        )
    )
    return sess.from_spark(out)


BPE_VOCAB_ORACLE = (
    _BPE_PRELUDE
    + f"""
SELECT sym AS token, CAST(sum(wt) AS BIGINT) AS n_occ
FROM s{BPE_ROUNDS}
GROUP BY sym
ORDER BY n_occ DESC, token
LIMIT 20
"""
)


@register("text_bpe_vocab_coverage", BPE_VOCAB_ORACLE)
def text_bpe_vocab_coverage(sess: SeccoSession):
    """Post-training vocabulary report: the top-20 tokens of the learned BPE
    vocabulary by corpus occurrence count — the sanity check a tokenizer
    drop ships with (which merges actually dominate the corpus?). Corpus
    frequency of a token = sum over distinct words of (word count × token
    occurrences in the word's encoding), so this too never touches the
    corpus a second time: one explode of the encoded vocabulary's symbol
    arrays weighted by word frequency, one token-keyed aggregation, top-20
    with a lexicographic tie-break."""
    _merges, syms = _bpe_train(sess.spark)
    out = (
        syms.select("wt", F.explode("s").alias("token"))
        .groupBy("token")
        .agg(F.sum("wt").cast("long").alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), "token")
        .limit(20)
    )
    return sess.from_spark(out)
