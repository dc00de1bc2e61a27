"""Driver-verifiable streaming queries.

The streaming extension (SURVEY §2.7 — absent in the reference) was
previously pytest-only because DuckDB has no streaming engine. But a
bounded file stream drained with ``availableNow`` is a deterministic batch
computation wearing a streaming plan: Structured Streaming's watermarked
windowed aggregation over the events table, fully drained, must equal the
equivalent batch GROUP BY. Registering that drain as a query gives the
streaming path a real driver row: the Spark side runs the actual
StreamingQuery machinery (file source → event-time window → watermark →
memory sink), the oracle is plain SQL.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession
from seccosql_spark.streaming.ops import (
    finalized_sessions,
    foreach_batch_upsert,
    run_available_now,
    scaled_stream_partitions,
    session_window_agg,
    stream_dedup,
    stream_events_dir,
    stream_stream_join,
    stream_stream_left_join,
    windowed_agg,
)

_SINK_SEQ = itertools.count()


def _events_sf_dir(sess: SeccoSession) -> str:
    """Recover the sf_dir from the registered batch view (the driver hands
    query callables a session, not a path)."""
    events_file = sess.spark.table("events").inputFiles()[0]
    return events_file.rsplit("/", 1)[0].removeprefix("file:")

STREAM_WINDOW_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'), event_type
"""


@register("stream_window_counts", STREAM_WINDOW_ORACLE, headline=True)
def stream_window_counts(sess: SeccoSession):
    """Hourly event-time tumbling windows per event_type, executed as an
    actual Structured Streaming query (watermark + window + availableNow
    drain into a memory sink) and compared against the batch GROUP BY
    oracle. Complete output mode: a fully-drained bounded stream drops
    nothing, so streaming must equal batch row-for-row. 1-hour windows are
    epoch-aligned in both engines (F.window == date_trunc('hour'))."""
    spark = sess.spark
    sf_dir = _events_sf_dir(sess)
    agg = windowed_agg(stream_events_dir(spark, sf_dir), window="1 hour")
    sink = f"__stream_window_counts_{next(_SINK_SEQ)}"
    run_available_now(agg, sink, output_mode="complete",
                  input_paths=(f"{sf_dir}/events.parquet",))
    out = spark.table(sink).select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n",
        "total_value",
    )
    return sess.from_spark(out)


# Gap-closed sessions in append mode: Spark emits a session only once the
# final watermark (max event time - 2h) passes its end (last event + 30min
# gap). The oracle rebuilds the SAME sessions with gaps-and-islands SQL and
# applies the SAME watermark cutoff — so the driver row verifies not just
# the session boundaries but the watermark emission discipline itself.
# Boundary semantics (verified empirically): Spark MERGES an event exactly
# `gap` after the previous one (session windows are [start, last+gap] and
# merge on touch), so a new session starts strictly when diff > gap — the
# oracle's `> 1800000000` test mirrors that exactly.
STREAM_SESSION_ORACLE = """
WITH o AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                          ORDER BY ts, event_id)
                   > 1800000000 THEN 1
              ELSE 0 END AS new_s
  FROM events
),
i AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
sess AS (
  SELECT user_id,
         min(ts) AS s_start,
         max(ts) AS s_last,
         count(*) AS n_events,
         CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS total_value
  FROM i GROUP BY user_id, sid
),
mx AS (SELECT max(ts) AS m FROM events)
SELECT user_id,
       strftime(s_start, '%Y-%m-%d %H:%M:%S') AS sess_start,
       n_events, total_value
FROM sess, mx
WHERE s_last + INTERVAL 30 MINUTE <= m - INTERVAL 2 HOUR
"""


@register("stream_session_windows", STREAM_SESSION_ORACLE)
def stream_session_windows(sess: SeccoSession):
    """Dynamic-length SESSION windows (30-minute gap) per user, run as a
    real append-mode streaming query: sessions are emitted only when the
    watermark passes their end, and the fully-drained bounded stream must
    equal the gaps-and-islands oracle under the identical cutoff. This is
    the strongest driver-checkable streaming claim: boundaries, aggregates,
    AND watermark emission semantics."""
    spark = sess.spark
    sf_dir = _events_sf_dir(sess)
    agg = session_window_agg(
        stream_events_dir(spark, sf_dir), gap="30 minutes", watermark="2 hours"
    )
    sink = f"__stream_session_windows_{next(_SINK_SEQ)}"
    run_available_now(agg, sink, output_mode="append",
                  input_paths=(f"{sf_dir}/events.parquet",))
    out = spark.table(sink).select(
        "user_id",
        F.date_format("sess_start", "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
        "n_events",
        "total_value",
    )
    return sess.from_spark(out)


@register("stream_session_finalized_batch", STREAM_SESSION_ORACLE)
def stream_session_finalized_batch(sess: SeccoSession):
    """The BATCH twin of ``stream_session_windows``, routed through the
    ``finalized_sessions`` barrier (VERDICT r09 task 7): session windows
    rebuilt in one batch aggregation, then the watermark-style cutoff
    (sessions ending <= max(ts) - 2h) applied ABOVE the aggregation. The
    naive ``.where(sess_end <= cutoff)`` is unsound — Catalyst pushes it
    below the session aggregation where it becomes a per-event
    ``ts + gap <= cutoff`` filter that fabricates phantom shorter sessions
    (root-caused r09, `streaming/ops.py:222`). Registering this path gives
    the barrier a driver hash-check against the gaps-and-islands oracle on
    every rotation, not just a pytest pin. Scale shape: one session
    aggregation + a 1-row max(ts) collect."""
    spark = sess.spark
    events = spark.table("events")
    agg = session_window_agg(events, gap="30 minutes", watermark="2 hours")
    from datetime import timedelta

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    fin = finalized_sessions(agg, max_ts - timedelta(hours=2))
    out = fin.select(
        "user_id",
        F.date_format("sess_start", "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
        "n_events",
        "total_value",
    )
    return sess.from_spark(out)


STREAM_JOIN_ORACLE = """
SELECT l.event_id AS l_id, r.event_id AS r_id, l.user_id AS l_user
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND r.ts > l.ts
 AND r.ts <= l.ts + INTERVAL 1 HOUR
WHERE l.event_type = 'click' AND r.event_type = 'purchase'
"""


@register("stream_stream_join", STREAM_JOIN_ORACLE)
def stream_stream_join_q(sess: SeccoSession):
    """Watermark-bounded stream-stream interval join (`streaming/ops.py`
    ``stream_stream_join``): purchases within 1 hour AFTER a click by the
    same user, both sides real file-source streams. A fully-drained bounded
    stream emits every in-interval match (inner-join results stream out as
    found; state eviction only removes rows past the watermark that can no
    longer match), so the result must equal the batch interval join the
    oracle computes."""
    spark = sess.spark
    sf_dir = _events_sf_dir(sess)
    left = stream_events_dir(spark, sf_dir).filter(F.col("event_type") == "click")
    right = stream_events_dir(spark, sf_dir).filter(F.col("event_type") == "purchase")
    joined = stream_stream_join(left, right, interval_seconds=3600, watermark="2 hours")
    sink = f"__stream_stream_join_{next(_SINK_SEQ)}"
    run_available_now(joined, sink, output_mode="append",
                  input_paths=(f"{sf_dir}/events.parquet",))
    return sess.from_spark(spark.table(sink))


STREAM_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
"""


@register("stream_dedup", STREAM_DEDUP_ORACLE)
def stream_dedup_q(sess: SeccoSession):
    """Streaming exact dedup (`streaming/ops.py` ``stream_dedup``):
    ``dropDuplicates`` on (user_id, event_type) within the watermark
    horizon, drained with availableNow. The kept ROW per key is whichever
    arrived first in partition order (nondeterministic across runs), so the
    driver-comparable surface is the emitted KEY SET: each distinct
    (user_id, event_type) appears exactly once in a fully-drained bounded
    stream. The projection happens after the streaming dedup, so the whole
    stateful pipeline (file source → watermark → dedup state → append sink)
    is what produces the rows."""
    spark = sess.spark
    sf_dir = _events_sf_dir(sess)
    deduped = stream_dedup(
        stream_events_dir(spark, sf_dir), ["user_id", "event_type"], watermark="2 hours"
    )
    sink = f"__stream_dedup_{next(_SINK_SEQ)}"
    run_available_now(deduped.select("user_id", "event_type"), sink,
                  output_mode="append",
                  input_paths=(f"{sf_dir}/events.parquet",))
    return sess.from_spark(spark.table(sink))


STREAM_UPSERT_ORACLE = """
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts,
       value
FROM (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("foreach_batch_upsert", STREAM_UPSERT_ORACLE)
def foreach_batch_upsert_q(sess: SeccoSession):
    """Incremental MERGE materialization (`streaming/ops.py`
    ``foreach_batch_upsert``): per micro-batch, upsert the batch's per-user
    latest (ts, value) into a global-temp state table — the reference's
    UnionByUpdate verb (`UnionByUpdate`, SURVEY §2.2) applied per
    micro-batch via foreachBatch. Fully drained, the state table must hold
    exactly the per-user latest row (ties broken by event_id), which the
    oracle recomputes as a batch window query."""
    import tempfile

    spark = sess.spark
    sf_dir = _events_sf_dir(sess)
    sink = f"__febu_state_{next(_SINK_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix="seccosql_febu_ckpt_")
    restore = scaled_stream_partitions(spark, f"{sf_dir}/events.parquet")
    try:
        q = foreach_batch_upsert(stream_events_dir(spark, sf_dir), spark, sink, ckpt)
        q.awaitTermination()
    finally:
        restore()
    out = spark.table(f"global_temp.{sink}").select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        "value",
    )
    return sess.from_spark(out)


STREAM_ENRICH_ORACLE = """
SELECT e.event_id, e.user_id, c.c_name
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


@register("stream_static_enrich", STREAM_ENRICH_ORACLE)
def stream_static_enrich_q(sess: SeccoSession):
    """Stream-static enrichment (`streaming/ops.py` ``stream_static_enrich``):
    each micro-batch broadcast-joins the static customer dimension — the
    canonical dimension-lookup, zero streaming state. Fully drained, the
    result must equal the batch left join. The static side is re-read per
    batch by Spark; at cluster scale it's a broadcast, so the stream never
    shuffles."""
    from seccosql_spark.streaming.ops import stream_static_enrich

    spark = sess.spark
    sf_dir = _events_sf_dir(sess)
    dim = spark.table("customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    enriched = stream_static_enrich(
        stream_events_dir(spark, sf_dir), dim, key="user_id"
    ).select("event_id", "user_id", "c_name")
    sink = f"__stream_enrich_{next(_SINK_SEQ)}"
    run_available_now(enriched, sink, output_mode="append",
                  input_paths=(f"{sf_dir}/events.parquet",))
    return sess.from_spark(spark.table(sink))


STREAM_UPSERT_STATE_ORACLE = """
SELECT user_id, value, event_id
FROM (
  SELECT user_id, value, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("stream_upsert_state", STREAM_UPSERT_STATE_ORACLE)
def stream_upsert_state_q(sess: SeccoSession):
    """Custom stateful operator (`streaming/ops.py` ``stream_upsert_state``,
    applyInPandasWithState): per-user latest value by event_id, emitted per
    micro-batch in update mode — the reference's UnionByUpdate as streaming
    state. A fully-drained bounded stream's final emission per key is the
    global per-user argmax(event_id), which the oracle recomputes as a
    batch window query (event_id is unique, so the argmax is
    deterministic)."""
    from seccosql_spark.streaming.ops import stream_upsert_state

    spark = sess.spark
    sf_dir = _events_sf_dir(sess)
    up = stream_upsert_state(stream_events_dir(spark, sf_dir), watermark="2 hours")
    sink = f"__stream_upsert_{next(_SINK_SEQ)}"
    run_available_now(up, sink, output_mode="update",
                  input_paths=(f"{sf_dir}/events.parquet",))
    return sess.from_spark(spark.table(sink))


# Left-outer emission discipline (verified empirically, boundary pinned by
# tests/test_streaming.py::test_stream_left_join_watermark_boundary_strict):
# - every in-interval match streams out (as inner);
# - an unmatched left row is null-extended only once the FINAL query
#   watermark passes its match horizon STRICTLY: l.ts + 1h < wm, where
#   wm = least(max left ts, max right ts) - 2h — the query watermark is the
#   MIN over both sides' watermark nodes (each computed after its filter),
#   so the laggard side gates eviction;
# - unmatched rows at or inside the horizon stay in state, never emitted by
#   the bounded drain.
STREAM_LEFT_JOIN_ORACLE = """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
r AS (SELECT * FROM events WHERE event_type = 'purchase'),
mx AS (SELECT least((SELECT max(ts) FROM l), (SELECT max(ts) FROM r)) AS m),
matched AS (SELECT l.event_id AS l_id, r.event_id AS r_id, l.user_id AS l_user
            FROM l JOIN r ON l.user_id = r.user_id
                         AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR),
unmatched AS (
  SELECT l.event_id AS l_id, CAST(NULL AS BIGINT) AS r_id, l.user_id AS l_user
  FROM l, mx
  WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.user_id = l.user_id
                                      AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR)
    AND l.ts + INTERVAL 1 HOUR < m - INTERVAL 2 HOUR
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched
"""


@register("stream_left_outer_join", STREAM_LEFT_JOIN_ORACLE)
def stream_left_outer_join_q(sess: SeccoSession):
    """Watermark-bounded stream-stream LEFT OUTER interval join
    (`streaming/ops.py stream_stream_left_join`): clicks null-extended when
    no purchase follows within the hour. The driver row verifies the OUTER
    emission discipline — which unmatched rows the watermark has released
    vs which stay in state — not just the pairing; the oracle replays
    Spark's strict eviction cutoff under the min-of-sides final watermark."""
    spark = sess.spark
    sf_dir = _events_sf_dir(sess)
    left = stream_events_dir(spark, sf_dir).filter(F.col("event_type") == "click")
    right = stream_events_dir(spark, sf_dir).filter(F.col("event_type") == "purchase")
    joined = stream_stream_left_join(left, right, interval_seconds=3600, watermark="2 hours")
    sink = f"__stream_left_outer_join_{next(_SINK_SEQ)}"
    run_available_now(joined, sink, output_mode="append",
                  input_paths=(f"{sf_dir}/events.parquet",))
    return sess.from_spark(spark.table(sink))


def _stream_documents_dir(spark, sf_dir: str):
    """File-stream the documents table SPLIT INTO THREE FILES with
    maxFilesPerTrigger=1, so availableNow drains in three real micro-batches
    — the batch-invariance claims downstream are tested, not assumed. The
    split is staged once per (machine, sf_dir) keyed by a digest of the
    source path."""
    import hashlib
    import os

    schema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = f"/tmp/secco_spark_docs_stream_{tag}"
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        hi = docs.agg(F.max("doc_id")).collect()[0][0] or 0
        cut1, cut2 = hi // 3, 2 * hi // 3
        for i, cond in enumerate(
            [
                F.col("doc_id") <= cut1,
                (F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2),
                F.col("doc_id") > cut2,
            ]
        ):
            docs.filter(cond).coalesce(1).write.mode("overwrite").parquet(f"{d}/f{i}")
        with open(marker, "w"):
            pass
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(d)
    )


def _incremental_dedup_oracle() -> str:
    from seccosql_spark.queries.pipeline import (
        INCREMENTAL_SPLIT_ID,
        SHINGLES_SQL,
        _incremental_oracle,
    )

    return _incremental_oracle(SHINGLES_SQL, threshold=0.5, split_id=INCREMENTAL_SPLIT_ID)


@register("stream_incremental_dedup", _incremental_dedup_oracle())
def stream_incremental_dedup_q(sess: SeccoSession):
    """Online ingestion screening (`streaming/ops.py`
    ``foreach_batch_incremental_dedup``): the documents table arrives as a
    bounded file stream; per micro-batch, the new docs (doc_id >= 400) are
    MinHash-signatured and probed against the static existing-corpus
    banded index, accumulating verified near-dup pairs in the sink. The
    old side is static and each new doc arrives exactly once, so the
    drained result is batch-invariant — the oracle is the SAME incremental
    oracle as the batch `dedup_incremental_batch` row, proving the
    streaming and nightly paths agree exactly."""
    import tempfile

    from seccosql_spark.queries.pipeline import INCREMENTAL_SPLIT_ID

    spark = sess.spark
    sf_dir = _events_sf_dir(sess)
    from seccosql_spark.streaming.ops import foreach_batch_incremental_dedup

    sink = f"__sid_pairs_{next(_SINK_SEQ)}"
    ckpt = tempfile.mkdtemp(prefix="seccosql_sid_ckpt_")
    restore = scaled_stream_partitions(spark, f"{sf_dir}/documents.parquet")
    try:
        q = foreach_batch_incremental_dedup(
            _stream_documents_dir(spark, sf_dir),
            f"{sf_dir}/documents.parquet",
            sink,
            ckpt,
            split_id=INCREMENTAL_SPLIT_ID,
            threshold=0.5,
        )
        q.awaitTermination()
    finally:
        restore()
    return sess.from_spark(spark.table(f"global_temp.{sink}"))
