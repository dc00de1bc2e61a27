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
from seccosql_spark.streaming.ops import run_available_now, stream_events_dir, windowed_agg

_SINK_SEQ = itertools.count()

STREAM_WINDOW_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'), event_type
"""


@register("stream_window_counts", STREAM_WINDOW_ORACLE)
def stream_window_counts(sess: SeccoSession):
    """Hourly event-time tumbling windows per event_type, executed as an
    actual Structured Streaming query (watermark + window + availableNow
    drain into a memory sink) and compared against the batch GROUP BY
    oracle. Complete output mode: a fully-drained bounded stream drops
    nothing, so streaming must equal batch row-for-row. 1-hour windows are
    epoch-aligned in both engines (F.window == date_trunc('hour'))."""
    spark = sess.spark
    # recover the sf_dir from the registered batch view (the driver hands
    # query callables a session, not a path)
    events_file = sess.spark.table("events").inputFiles()[0]
    sf_dir = events_file.rsplit("/", 1)[0].removeprefix("file:")
    agg = windowed_agg(stream_events_dir(spark, sf_dir), window="1 hour")
    sink = f"__stream_window_counts_{next(_SINK_SEQ)}"
    run_available_now(agg, sink, output_mode="complete")
    out = spark.table(sink).select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n",
        "total_value",
    )
    return sess.from_spark(out)
