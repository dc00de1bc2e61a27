"""Corpus-statistics queries: TF-IDF, vocabulary building, length
histograms, per-source quantiles — the analysis layer a training-data
pipeline runs before filtering/mixing decisions. All integer-exact except
TF-IDF/quantiles (rounded; interpolation formulas match across engines)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

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
