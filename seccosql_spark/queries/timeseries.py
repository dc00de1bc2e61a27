"""Time-series operator queries over `events`: as-of join and range join —
custom operators Spark lacks primitives for (build-rule case (a): pure
DataFrame composition), with exact oracles.

The event sequence axis is `event_id` (unique, monotone per load) for the
as-of join — wall-clock `ts` collides at second granularity, which would
make "the latest prior row" ambiguous. The range join normalizes `ts` to
microsecond epoch BIGINTs via ``operators.timeutil.epoch_us`` (tolerant of
either parquet timestamp encoding; `epoch_us(ts)` in DuckDB)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from seccosql_spark.operators.asof import asof_join, range_join_buckets, resample_gapfill
from seccosql_spark.operators.timeutil import US_PER_HOUR, epoch_us
from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession

ASOF_ORACLE = """
SELECT e.event_id, e.user_id,
       (SELECT p.value FROM events p
        WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
          AND p.event_id <= e.event_id
        ORDER BY p.event_id DESC LIMIT 1) AS asof_value
FROM events e
"""


@register("asof_latest_purchase", ASOF_ORACLE)
def asof_latest_purchase(sess: SeccoSession):
    """As-of join: every event annotated with the user's latest purchase
    value as of that event (inclusive). One shuffle on user_id via the
    union+window carry-forward plan — no quadratic pairing."""
    events = sess.spark.table("events")
    purchases = events.filter("event_type = 'purchase'")
    out = asof_join(
        events,
        purchases,
        on=["user_id"],
        left_time="event_id",
        right_time="event_id",
        value_cols=["value"],
    )
    return sess.from_spark(out.select("event_id", "user_id", F.col("asof_value")))


RANGE_ORACLE = """
SELECT a.event_id AS a_id, count(*) AS n
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) >= epoch_us(a.ts) + 1
 AND epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000
GROUP BY a.event_id
"""


@register("range_join_next_hour", RANGE_ORACLE)
def range_join_next_hour(sess: SeccoSession):
    """Range join: per event, how many same-user events fall in the next
    hour. Bucketed to hour-wide time buckets → hash join + residual filter
    (a raw inequality join would plan as a nested loop)."""
    events = sess.spark.table("events")
    events = events.withColumn("__ts_us", epoch_us(events, "ts"))
    a = events.select(
        F.col("event_id").alias("a_id"), F.col("__ts_us").alias("a_ts"), "user_id"
    )
    b = events.select(
        F.col("event_id").alias("b_id"), F.col("__ts_us").alias("b_ts"), "user_id"
    )
    joined = range_join_buckets(
        a, b, on=["user_id"], left_time="a_ts", right_time="b_ts", lo=1, hi=US_PER_HOUR
    )
    return sess.from_spark(joined.groupBy("a_id").agg(F.count(F.lit(1)).alias("n")))


GAPFILL_ORACLE = """
WITH ev AS (SELECT event_type AS key, epoch_us(ts) // 3600000000 AS hidx, value
            FROM events),
agg AS (SELECT key, hidx, count(*) AS n_rows,
               CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sv
        FROM ev GROUP BY key, hidx),
b AS (SELECT min(hidx) AS lo, max(hidx) AS hi FROM ev),
spine AS (SELECT unnest(range(lo, hi + 1)) AS hidx FROM b),
grid AS (SELECT key, hidx FROM (SELECT DISTINCT key FROM ev) CROSS JOIN spine)
SELECT g.key AS event_type, g.hidx * 3600000000 AS bucket_us,
       CAST(COALESCE(a.n_rows, 0) AS BIGINT) AS n_rows,
       last_value(a.sv IGNORE NULLS) OVER (PARTITION BY g.key ORDER BY g.hidx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_sum
FROM grid g LEFT JOIN agg a ON g.key = a.key AND g.hidx = a.hidx
"""


@register("timeseries_gapfill_hourly", GAPFILL_ORACLE, headline=True)
def timeseries_gapfill_hourly(sess: SeccoSession):
    """Dense hourly resample of the event stream per event_type with
    zero-filled counts and carry-forward sums over empty hours — the
    standard gap-fill/interpolation shape (`operators/asof.resample_gapfill`:
    one fact shuffle + a sequence-generated spine; no per-row Python, no
    quadratic fill)."""
    events = sess.spark.table("events")
    out = resample_gapfill(
        events.withColumn("__us", epoch_us(events, "ts")),
        key_col="event_type",
        time_us_col="__us",
        value_col="value",
        bucket_us=US_PER_HOUR,
    )
    return sess.from_spark(out.withColumnRenamed("key", "event_type"))


ZORDER_ORACLE = """
WITH e AS (SELECT event_id,
                  user_id % 65536 AS u,
                  (epoch_us(ts) // 3600000000) % 65536 AS h
           FROM events),
z AS (SELECT event_id, u, h,
             CAST((SELECT sum((((e.u >> CAST(b.range AS INT)) & 1) << (2 * b.range))
                            + (((e.h >> CAST(b.range AS INT)) & 1) << (2 * b.range + 1)))
                   FROM range(0, 16) b) AS BIGINT) AS zval
      FROM e)
SELECT event_id, CAST(u AS BIGINT) AS u, CAST(h AS BIGINT) AS h, zval
FROM z ORDER BY zval, event_id LIMIT 50
"""


@register("events_zorder_topk", ZORDER_ORACLE)
def events_zorder_topk(sess: SeccoSession):
    """Morton z-value layout key over (user_id, epoch-hour) — the
    multi-dimensional clustering key `operators.layout.zorder_layout`
    range-partitions and sorts on so parquet min/max stats prune filters on
    EITHER dimension (the OPTIMIZE ZORDER idea as plain Spark). The query
    emits the 50 smallest z-values (total order: zval, event_id) so the
    oracle cross-checks the bit-interleave arithmetic exactly; the
    clustering property itself (narrow per-partition spans in every
    dimension) is pinned by tests/test_operators_unit.py."""
    from seccosql_spark.operators.layout import zvalue

    ev = sess.spark.table("events")
    # integer `div`, not double division: a float quotient could round up
    # across an hour boundary and disagree with DuckDB's `//`
    e = ev.select(
        "event_id",
        (F.col("user_id") % 65536).alias("u"),
        epoch_us(ev, "ts").alias("eus"),
    ).withColumn("h", F.expr(f"(eus div {US_PER_HOUR}) % 65536"))
    out = (
        e.select(
            "event_id", "u", "h",
            zvalue([F.col("u"), F.col("h")], bits=16).alias("zval"),
        )
        .orderBy("zval", "event_id")
        .limit(50)
    )
    return sess.from_spark(out)


SPIKE_ORACLE = """
WITH v AS (
  SELECT event_id, user_id, CAST(value AS DECIMAL(18,6)) AS dv, ts
  FROM events
),
w AS (
  SELECT event_id, user_id, dv,
         sum(dv) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS s,
         count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS c
  FROM v
)
SELECT event_id, user_id,
       (c > 0 AND dv * c > 2 * s) AS is_spike
FROM w
"""


@register("events_rolling_spikes", SPIKE_ORACLE)
def events_rolling_spikes(sess: SeccoSession):
    """Rolling anomaly flag: an event is a spike when its value exceeds
    twice the mean of the user's previous 10 values. The comparison is
    cross-multiplied over DECIMAL(18,6) sums (value * count > 2 * sum) —
    decimal addition is exact and associative, so DuckDB's segment-tree
    window and Spark's running frame agree bit-for-bit where double
    accumulation order would not. One user-keyed window partition —
    partition-parallel at any scale; events with no history are not
    spikes."""
    ev = sess.spark.table("events").select(
        "event_id", "user_id", F.col("value").cast("decimal(18,6)").alias("dv"), "ts"
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    w = ev.select(
        "event_id",
        "user_id",
        "dv",
        F.sum("dv").over(frame).alias("s"),
        F.count(F.lit(1)).over(frame).alias("c"),
    )
    return sess.from_spark(
        w.select(
            "event_id",
            "user_id",
            ((F.col("c") > 0) & (F.col("dv") * F.col("c") > 2 * F.col("s"))).alias(
                "is_spike"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention: users grouped by their first-activity week, then
# counted in each later week they return — the standard growth-analytics
# triangle. Weeks are epoch-week indices (epoch_us div 604800e6), pure
# integer arithmetic identical across engines (no calendar-week-start
# convention to keep in sync).
# ---------------------------------------------------------------------------

US_PER_WEEK = 7 * 24 * US_PER_HOUR

RETENTION_ORACLE = f"""
WITH uw AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // {US_PER_WEEK} AS wk
  FROM events
),
cohort AS (SELECT u, min(wk) AS c FROM uw GROUP BY u)
SELECT CAST(cohort.c AS BIGINT) AS cohort_week,
       CAST(uw.wk - cohort.c AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN cohort ON uw.u = cohort.u
GROUP BY cohort.c, uw.wk - cohort.c
"""


@register("events_weekly_retention", RETENTION_ORACLE)
def events_weekly_retention(sess: SeccoSession):
    """Cohort retention triangle: (cohort_week, week_offset) -> distinct
    returning users, cohort = the user's first active epoch-week. One
    shuffle on user_id serves both the distinct user-weeks and the min
    (first-week) aggregation; the cohort join is user-keyed on the same
    partitioning. Counts and week indices are BIGINT end to end."""
    ev = sess.spark.table("events")
    uw = (
        ev.select(F.col("user_id").alias("u"), epoch_us(ev, "ts").alias("eus"))
        # integer `div`, not a double `/`+cast: a float quotient that rounds
        # up to the next integer would silently shift the week bucket
        .select("u", F.expr(f"eus div {US_PER_WEEK}").alias("wk"))
        .distinct()
    )
    cohort = uw.groupBy("u").agg(F.min("wk").alias("c"))
    return sess.from_spark(
        uw.join(cohort, "u")
        .groupBy(
            F.col("c").cast("long").alias("cohort_week"),
            (F.col("wk") - F.col("c")).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


HILBERT_ORACLE = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT event_id,
         user_id % 65536 AS u,
         (epoch_us(ts) // 3600000000) % 65536 AS h
  FROM events),
walk(event_id, x, y, d, b) AS (
  SELECT event_id, CAST(u AS BIGINT), CAST(h AS BIGINT), CAST(0 AS BIGINT), 15
  FROM e
  UNION ALL
  SELECT event_id,
         CASE WHEN ((y // (CAST(1 AS BIGINT) << b)) & 1) = 0
              THEN CASE WHEN ((x // (CAST(1 AS BIGINT) << b)) & 1) = 1
                        THEN (CAST(1 AS BIGINT) << b) - 1 - (y & ((CAST(1 AS BIGINT) << b) - 1))
                        ELSE y & ((CAST(1 AS BIGINT) << b) - 1) END
              ELSE x & ((CAST(1 AS BIGINT) << b) - 1) END,
         CASE WHEN ((y // (CAST(1 AS BIGINT) << b)) & 1) = 0
              THEN CASE WHEN ((x // (CAST(1 AS BIGINT) << b)) & 1) = 1
                        THEN (CAST(1 AS BIGINT) << b) - 1 - (x & ((CAST(1 AS BIGINT) << b) - 1))
                        ELSE x & ((CAST(1 AS BIGINT) << b) - 1) END
              ELSE y & ((CAST(1 AS BIGINT) << b) - 1) END,
         d + (CAST(1 AS BIGINT) << (2 * b))
           * xor(3 * ((x // (CAST(1 AS BIGINT) << b)) & 1),
                 ((y // (CAST(1 AS BIGINT) << b)) & 1)),
         b - 1
  FROM walk WHERE b >= 0)
SELECT w.event_id, CAST(e.u AS BIGINT) AS u, CAST(e.h AS BIGINT) AS h,
       w.d AS hval
FROM walk w JOIN e USING (event_id)
WHERE w.b = -1
ORDER BY hval, event_id LIMIT 50
"""


@register("events_hilbert_topk", HILBERT_ORACLE)
def events_hilbert_topk(sess: SeccoSession):
    """Hilbert-curve layout key over (user_id, epoch-hour) — the
    locality-tighter sibling of `events_zorder_topk` (consecutive index
    values are ALWAYS adjacent cells; `operators.layout.hilbert_layout`
    clusters files on it). The query emits the 50 smallest Hilbert
    indexes (total order: hval, event_id), so the oracle replays the
    whole xy2d walk — rotation, masking, quadrant offsets — as a
    16-level recursive CTE in exact BIGINT arithmetic and cross-checks
    the engine's `aggregate`-fold implementation bit for bit. The
    pruning payoff itself is measured in tests/test_zorder_pruning.py."""
    from seccosql_spark.operators.layout import hvalue

    ev = sess.spark.table("events")
    e = ev.select(
        "event_id",
        (F.col("user_id") % 65536).alias("u"),
        epoch_us(ev, "ts").alias("eus"),
    ).withColumn("h", F.expr(f"(eus div {US_PER_HOUR}) % 65536"))
    out = (
        e.select(
            "event_id", "u", "h",
            hvalue(F.col("u"), F.col("h"), bits=16).alias("hval"),
        )
        .orderBy("hval", "event_id")
        .limit(50)
    )
    return sess.from_spark(out)


INTERVAL_OVERLAP_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS s,
         epoch_us(ts) + (30 + event_id % 90) * 60000000 AS f
  FROM events WHERE event_type = 'error')
SELECT a.user_id,
       CAST(least(a.event_id, b.event_id) AS BIGINT) AS id_lo,
       CAST(greatest(a.event_id, b.event_id) AS BIGINT) AS id_hi,
       CAST(least(a.f, b.f) - greatest(a.s, b.s) AS BIGINT) AS overlap_us
FROM e a JOIN e b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND a.s < b.f AND b.s < a.f
"""


@register("events_interval_overlaps", INTERVAL_OVERLAP_ORACLE)
def events_interval_overlaps(sess: SeccoSession):
    """Variable-length interval overlap self-join: each error event opens a
    half-open outage window [ts, ts + 30..119 min) (duration derived
    deterministically from event_id), and the query finds every same-user
    pair of overlapping windows with the exact overlap length — the
    incident-correlation shape. `operators/asof.interval_overlap_pairs`
    plans it as ONE hash join via start-bucket ownership (expand one side
    to the ≤3 hour-buckets its window touches, key the other by start
    bucket; the later-starting member's start bucket is the unique meeting
    point, so no post-join distinct and no quadratic candidate set — a raw
    overlap θ-join would nest-loop). The oracle replays the plain overlap
    predicate: the bucketing is lossless, so the answer is
    algorithm-independent. All-BIGINT microsecond arithmetic via
    `timeutil.epoch_us` (both engines)."""
    from seccosql_spark.operators.asof import interval_overlap_pairs

    ev = sess.spark.table("events")
    e = ev.where(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        epoch_us(ev, "ts").alias("s"),
        (
            epoch_us(ev, "ts")
            + (F.lit(30) + F.col("event_id") % 90) * F.lit(60_000_000)
        ).alias("f"),
    )
    out = interval_overlap_pairs(
        e,
        on=["user_id"],
        id_col="event_id",
        start_col="s",
        finish_col="f",
        bucket_width=US_PER_HOUR,
    ).withColumnRenamed("overlap", "overlap_us")
    return sess.from_spark(out)


ACF_ORACLE = """
WITH d AS (SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT)
                    AS t
           FROM orders),
cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS x FROM d GROUP BY t),
lim AS (SELECT min(t) AS t0, max(t) AS t1 FROM d),
spine AS (SELECT unnest(generate_series(t0, t1)) AS t FROM lim),
ser AS (SELECT s.t AS t, coalesce(x, 0) AS x
        FROM spine s LEFT JOIN cnt USING (t)),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
        FROM ser),
a AS (SELECT t, n * x - sx AS av FROM ser CROSS JOIN tot),
den AS (SELECT sum(CAST(av AS HUGEINT) * av) AS d2 FROM a),
lg AS (SELECT unnest([1, 7, 30, 365]) AS lag_days),
num AS (SELECT lag_days, sum(CAST(p.av AS HUGEINT) * q.av) AS nk,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM lg l JOIN a p ON true JOIN a q ON q.t = p.t + l.lag_days
        GROUP BY lag_days)
SELECT CAST(lag_days AS BIGINT) AS lag_days, n_pairs,
       round(CAST(nk AS DOUBLE) / CAST(d2 AS DOUBLE), 6) AS acf
FROM num CROSS JOIN den
"""


@register("orders_acf_lags", ACF_ORACLE)
def orders_acf_lags(sess: SeccoSession):
    """Exact lag-k autocorrelation of the daily order-count series at lags
    1/7/30/365 — the periodicity probe a pipeline runs BEFORE committing
    to a seasonal model (the seasonal-naive backtest row assumes lag-168
    hourly structure; this row is how you discover the period). The
    series is densified onto a day spine (zero-filled gaps — ACF over an
    observed-only series is biased), then centered IN INTEGERS: with
    n = days and S = total orders, a_t = n*x_t - S is the residual
    scaled by n, so acf_k = sum(a_t*a_{t+k}) / sum(a_t^2) needs no float
    mean — both sums run in DECIMAL(38,0)/HUGEINT and only the final
    division is a double (identical rounding of exact integers in both
    engines).

    Scale shape: the spine is calendar-bounded (~2.4k rows regardless of
    SF), built from a 2-value agg; the lag products are hash equi-joins
    on t+k (no global-order window — a single global sort would
    single-partition the series), and the scalar totals ride broadcast
    1-row joins. Day counts aggregate map-side before anything joins."""
    spark = sess.spark
    d = spark.table("orders").select(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("t")
    )
    cnt = d.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("x"))
    spine = d.agg(F.min("t").alias("t0"), F.max("t").alias("t1")).select(
        F.explode(F.sequence("t0", "t1")).alias("t")
    )
    ser = spine.join(cnt, "t", "left").select(
        "t", F.coalesce("x", F.lit(0)).cast("long").alias("x")
    )
    tot = ser.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    a = ser.crossJoin(F.broadcast(tot)).select(
        "t", (F.col("n") * F.col("x") - F.col("sx")).alias("av")
    )
    den = a.agg(
        F.sum(F.col("av").cast("decimal(38,0)") * F.col("av")).alias("d2")
    )
    lags = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(7), F.lit(30), F.lit(365))).alias(
            "lag_days"
        )
    )
    p = a.select(F.col("t").alias("pt"), F.col("av").alias("pav"))
    q = a.select(F.col("t").alias("qt"), F.col("av").alias("qav"))
    num = (
        p.crossJoin(F.broadcast(lags))
        .join(q, F.col("qt") == F.col("pt") + F.col("lag_days"))
        .groupBy("lag_days")
        .agg(
            F.sum(F.col("pav").cast("decimal(38,0)") * F.col("qav")).alias("nk"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
    )
    out = num.crossJoin(F.broadcast(den)).select(
        F.col("lag_days").cast("long").alias("lag_days"),
        "n_pairs",
        F.round(
            F.col("nk").cast("double") / F.col("d2").cast("double"), 6
        ).alias("acf"),
    )
    return sess.from_spark(out)
