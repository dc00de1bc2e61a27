"""Sampling / sessionization / regex-tokenization queries — the remaining
training-data pipeline surface, all with exact oracles."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from seccosql_spark.operators.sampling import (
    hash_sample,
    rate_to_hex_threshold,
    stratified_sample_topk,
)
from seccosql_spark.operators.timeutil import US_PER_HOUR, epoch_us
from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession

_THRESH_10PCT = rate_to_hex_threshold(0.10)


@register(
    "sample_hash_10pct",
    f"""SELECT doc_id, source FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_THRESH_10PCT}'""",
)
def sample_hash_10pct(sess: SeccoSession):
    """Deterministic content-hash sampling (reproducible across engines,
    cluster layouts and runs — unlike df.sample)."""
    return sess.from_spark(
        hash_sample(sess.spark.table("documents"), "doc_id", 0.10).select(
            "doc_id", "source"
        )
    )


@register(
    "sample_stratified_3per_lang",
    """SELECT doc_id, lang FROM (
         SELECT doc_id, lang,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         FROM documents
       ) WHERE rn <= 3""",
)
def sample_stratified_3per_lang(sess: SeccoSession):
    """Stratified downsampling: exactly 3 docs per language, hash-ordered."""
    return sess.from_spark(
        stratified_sample_topk(sess.spark.table("documents"), "lang", "doc_id", 3).select(
            "doc_id", "lang"
        )
    )


SESSION_ORACLE = """
SELECT event_id, user_id,
       CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (
  SELECT event_id, user_id,
         CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id)
                   IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                          ORDER BY event_id)
                   > 3600000000 THEN 1
              ELSE 0 END AS new_s
  FROM events
)
"""


@register("sessionize_events", SESSION_ORACLE)
def sessionize_events(sess: SeccoSession):
    """Gap-based sessionization (1 h gap) per user — one shuffle, two window
    functions. Ordered by the unique event sequence (event_id), with the gap
    measured on wall-clock ts, because raw ts collides at second granularity
    (the `sessionize` operator's documented uniqueness requirement)."""
    from pyspark.sql import Window

    events = sess.spark.table("events")
    events = events.withColumn("__ts_us", epoch_us(events, "ts"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    new_s = F.when(
        F.lag("__ts_us").over(w).isNull(), F.lit(1)
    ).otherwise((F.col("__ts_us") - F.lag("__ts_us").over(w) > US_PER_HOUR).cast("int"))
    out = events.select(
        "event_id",
        "user_id",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    return sess.from_spark(out)


@register(
    "text_bpe_tokens",
    """SELECT doc_id,
              CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS INT) AS n_alpha,
              CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numeric
       FROM documents""",
)
def text_bpe_tokens(sess: SeccoSession):
    """BPE-ish regex token counting (character-class splits — identical
    across Java and RE2 regex engines)."""
    return sess.from_spark(
        sess.spark.table("documents").select(
            "doc_id",
            F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)).alias("n_alpha"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0)).alias("n_numeric"),
        )
    )


APPROX_DISTINCT_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS n_users,
       TRUE AS hll_ok
FROM events GROUP BY strftime(ts, '%Y-%m-%d')
"""


@register("approx_distinct_users", APPROX_DISTINCT_ORACLE)
def approx_distinct_users(sess: SeccoSession):
    """HyperLogLog++ approximate count-distinct per event day — the
    constant-memory cardinality path for 100 TB streams where exact
    count(DISTINCT) would shuffle every key. The raw sketch estimate is
    engine-specific, so the driver-checkable surface is (exact count,
    in-query error-bound verdict): `hll_ok` asserts the HLL estimate landed
    within 5% of the exact count (rsd=0.02 → ~2σ margin), and the oracle
    expects TRUE for every day plus the matching exact counts. The
    pytest gate (test_approx_distinct_error_bound) additionally bounds the
    estimate at sf0.001. Production use is `approx_count_distinct` alone;
    the exact aggregate here exists to make the sketch verifiable."""
    ev = sess.spark.table("events")
    agg = (
        ev.select(
            F.date_format(F.timestamp_micros(epoch_us(ev, "ts")), "yyyy-MM-dd").alias("day"),
            "user_id",
        )
        .groupBy("day")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
        )
    )
    return sess.from_spark(
        agg.select(
            "day",
            "n_users",
            (
                F.abs(F.col("__approx") - F.col("n_users"))
                <= F.lit(0.05) * F.col("n_users")
            ).alias("hll_ok"),
        )
    )


APPROX_QUANTILE_ORACLE = """
SELECT event_type,
       CAST(quantile_cont(value, 0.5) AS DOUBLE) AS p50,
       CAST(quantile_cont(value, 0.95) AS DOUBLE) AS p95,
       TRUE AS sketch_ok
FROM events GROUP BY event_type
"""


@register("approx_quantiles_sketch", APPROX_QUANTILE_ORACLE)
def approx_quantiles_sketch(sess: SeccoSession):
    """Approximate-quantile sketch per event_type — the constant-memory
    percentile path for 100 TB (Spark's Greenwald-Khanna variant via
    ``approx_percentile``; a full sort per group would shuffle everything).
    Same verification pattern as the HLL row: the sketch estimate is
    engine-specific, so the query emits the EXACT continuous percentiles
    (deterministic, matching DuckDB's quantile_cont) plus `sketch_ok`, an
    in-query verdict that the sketch landed inside the exact p25..p99.5
    band around each target — accuracy 10000 → rank error ≤ 0.01 %, far
    inside the band. Production use is ``approx_percentile`` alone; the
    exact aggregate exists to make the sketch verifiable."""
    ev = sess.spark.table("events")
    agg = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("__a50"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("__a95"),
        F.expr("percentile(value, 0.25)").alias("__lo50"),
        F.expr("percentile(value, 0.75)").alias("__hi50"),
        F.expr("percentile(value, 0.90)").alias("__lo95"),
        F.expr("percentile(value, 0.995)").alias("__hi95"),
    )
    return sess.from_spark(
        agg.select(
            "event_type",
            "p50",
            "p95",
            (
                F.col("__a50").between(F.col("__lo50"), F.col("__hi50"))
                & F.col("__a95").between(F.col("__lo95"), F.col("__hi95"))
            ).alias("sketch_ok"),
        )
    )


# data-mixture rates: one stratum kept whole, one dropped, the rest split
# between a majority and a minority rate — the corners a mixture pass hits
_MIXTURE_RATES = {"src0": 1.0, "src1": 0.0}
_MIXTURE_RATES.update(
    {f"src{i}": (0.8 if i % 2 == 0 else 0.25) for i in range(2, 20)}
)
_MIXTURE_DEFAULT = 0.5


def _mixture_oracle() -> str:
    from seccosql_spark.operators.sampling import rate_to_hex_threshold

    def thr(r: float) -> str:
        return "g" if r >= 1.0 else rate_to_hex_threshold(r)

    cases = " ".join(
        f"WHEN source = '{s}' THEN '{thr(r)}'" for s, r in sorted(_MIXTURE_RATES.items())
    )
    return f"""SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      < (CASE {cases} ELSE '{thr(_MIXTURE_DEFAULT)}' END)
GROUP BY source"""


@register("sample_mixture_sources", _mixture_oracle())
def sample_mixture_sources(sess: SeccoSession):
    """Data-mixture sampling (`operators/sampling.mixture_sample`): each
    source kept at its own deterministic hash rate — the domain-reweighting
    pass of a training-data pipeline, as one codegen'd map-only CASE filter
    (no join, no shuffle before the check aggregation). Rates cover the
    corners: keep-all, drop-all, majority 0.8, minority 0.25. The md5
    discipline makes the selected set engine-exact AND monotone in the
    rate (raising a stratum's rate only adds rows), which is what keeps
    incremental re-mixes cheap at scale."""
    from seccosql_spark.operators.sampling import mixture_sample

    kept = mixture_sample(
        sess.spark.table("documents"),
        stratum_col="source",
        rates=_MIXTURE_RATES,
        key_col="doc_id",
        default_rate=_MIXTURE_DEFAULT,
    )
    return sess.from_spark(
        kept.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
    )


def _weighted_oracle() -> str:
    h32 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""
WITH q AS (SELECT doc_id,
                  round((CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                         + least(1.0, CAST(len(toks) AS DOUBLE) / 50.0)) / 2.0, 6) AS quality
           FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
                 FROM documents)),
h AS (SELECT doc_id, quality, CAST({h32} AS BIGINT) AS h32 FROM q)
SELECT doc_id, quality FROM h WHERE CAST(h32 AS DOUBLE) < quality * 4294967296.0
"""


@register("sample_weighted_quality", _weighted_oracle())
def sample_weighted_quality(sess: SeccoSession):
    """Quality-proportional sampling: each document kept with probability
    equal to its quality score (operators.text.quality_score, rounded to 6
    digits so the weight is engine-identical), decided by the deterministic
    md5 uniform of operators.sampling.weighted_sample. The curation move a
    training-data pipeline uses to up-weight clean text without hard
    thresholds; map-only, no shuffle."""
    from seccosql_spark.operators.sampling import weighted_sample
    from seccosql_spark.operators.text import quality_score

    q = quality_score(sess.spark.table("documents")).select("doc_id", "quality")
    return sess.from_spark(weighted_sample(q, "doc_id", "quality"))


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006, A-Res):
# rank every row by key = ln(u) / weight with u ~ Uniform(0,1] derived from
# a content-free md5, take the top-n keys. Equivalent to ranking by
# u^(1/w); inclusion probability is proportional to weight, the sample is
# exactly-n, and the whole thing is one map-side projection + a top-n —
# the distributed-safe form of weighted reservoir sampling.
# ---------------------------------------------------------------------------

ARES_N = 50
_H48_DENOM = 281474976710657.0  # 16^12 + 1 -> u in (0, 1], ln never sees 0


def _h48_sql(expr: str) -> str:
    """DuckDB: first 12 hex chars of an md5-hex expression as a 48-bit int."""
    from seccosql_spark.operators.hexint import hex_prefix_int_sql

    return hex_prefix_int_sql(expr, 12)


ARES_ORACLE = f"""
WITH k AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         round(round(ln((CAST({_h48_sql('md5(CAST(doc_id AS VARCHAR))')} AS BIGINT) + 1)
                        / {_H48_DENOM}), 9) / n_chars, 12) AS key
  FROM documents
)
SELECT doc_id, weight, key FROM k ORDER BY key DESC, doc_id LIMIT {ARES_N}
"""


@register("sample_weighted_ares", ARES_ORACLE)
def sample_weighted_ares(sess: SeccoSession):
    """Exactly-{n} weighted sample without replacement, weight = n_chars
    (longer docs proportionally likelier), via A-Res keys ln(u)/w with u a
    48-bit md5-uniform. Deterministic and engine-identical: the ln is
    rounded to 9 decimals (libm ulp discipline), the key to 12, ties break
    on doc_id. Map-only scoring; the top-n is Spark's TakeOrdered (no
    global sort materialization). Unlike threshold sampling
    (sample_weighted_quality), this yields an exact sample size."""
    h48 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    k = sess.spark.table("documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        F.round(
            F.round(F.log((h48 + 1) / F.lit(_H48_DENOM)), 9) / F.col("n_chars"), 12
        ).alias("key"),
    )
    return sess.from_spark(k.orderBy(F.col("key").desc(), "doc_id").limit(ARES_N))


# ---------------------------------------------------------------------------
# Temperature-weighted mixture: alpha = 0.5 source re-balancing where the
# per-source rates are DERIVED from the data (p_s ~ n_s^alpha), the
# standard multilingual/multi-domain blend rule (e.g. mT5's alpha-scaled
# sampling) — unlike sample_mixture_sources, whose rates are given.
# ---------------------------------------------------------------------------

_TEMP_SCALE = 1_000_000  # sqrt(n) fixed-point scale: ONE correctly-rounded
#                          double op per source, then all-integer arithmetic

_TEMPERATURE_ORACLE = f"""
WITH cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
w AS (SELECT source, n_docs,
             CAST(floor(sqrt(n_docs) * {_TEMP_SCALE}) AS BIGINT) AS s6
      FROM cnt),
tot AS (SELECT CAST(sum(s6) AS BIGINT) AS t6, CAST(sum(n_docs) AS BIGINT) AS n_total FROM w),
quota AS (SELECT w.source,
                 CAST((CAST(tot.n_total AS HUGEINT) * 2 // 5) * w.s6 // tot.t6
                      AS BIGINT) AS q
          FROM w CROSS JOIN tot),
ranked AS (SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents),
kept AS (SELECT r.source, r.doc_id
         FROM ranked r JOIN quota USING (source)
         WHERE r.rn <= quota.q)
SELECT w.source, w.n_docs, w.s6,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(k.id_sum, 0) AS BIGINT) AS id_sum
FROM w LEFT JOIN (SELECT source, count(*) AS n_kept, sum(doc_id) AS id_sum
                  FROM kept GROUP BY source) k USING (source)
"""


@register("sample_temperature_mix", _TEMPERATURE_ORACLE)
def sample_temperature_mix(sess: SeccoSession):
    """Temperature-scaled mixture sampling: target a 40% corpus budget
    distributed across sources proportionally to n_s^0.5 (alpha = 0.5 —
    the standard low-resource up-weighting rule), with the whole decision
    INTEGER-exact: the only float op is one correctly-rounded
    floor(sqrt(n_s) * 1e6) per source (identical in any IEEE engine);
    the per-source quota q_s = floor(M * s6 / sum(s6)) is computed ONCE
    per source in 38-digit integer arithmetic (DECIMAL(38,0) in Spark,
    HUGEINT in the oracle — a 64-bit cross-multiplication rn * sum(s6)
    would silently wrap around ~4e8 docs per source, exactly the hazard
    class hits() guards against), and the per-row check is the plain
    rank comparison rn <= q_s. Selection within a source is the md5-rank
    discipline (reproducible, monotone in the budget). Scale shape: one
    count aggregation, a per-source rank window, and two broadcast
    scalars — no pairwise anything."""
    docs = sess.spark.table("documents")
    cnt = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    w = cnt.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs")) * _TEMP_SCALE).cast("long").alias("s6"),
    )
    tot = w.agg(
        F.sum("s6").cast("long").alias("t6"),
        F.sum("n_docs").cast("long").alias("n_total"),
    )
    win = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    ranked = docs.select("source", "doc_id", win.alias("rn"))
    quota = w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(
            # M = n_total*2 DIV 5 lands in BIGINT (Spark's IntegralDivide
            # returns LONG even on decimals) — that part is safe (M <= 2/5
            # n_total). The hazard is the NEXT multiply: M * s6 in 64-bit
            # wraps ~4e8 docs/source, so re-lift M to DECIMAL(38,0) before
            # it; the final DIV t6 quotient <= M fits BIGINT again. Oracle
            # stays HUGEINT throughout — identical integer math.
            "CAST(CAST(CAST(n_total AS DECIMAL(38,0)) * 2 DIV 5 AS DECIMAL(38,0))"
            " * s6 DIV t6 AS BIGINT)"
        ).alias("q"),
    )
    kept = (
        ranked.join(F.broadcast(quota), "source")
        .where(F.col("rn") <= F.col("q"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
    )
    out = (
        w.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "s6",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("id_sum", F.lit(0)).cast("long").alias("id_sum"),
        )
    )
    return sess.from_spark(out)
