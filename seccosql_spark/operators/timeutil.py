"""Engine-robust event-time handling.

The driver's `events.ts` column has shipped under two parquet encodings
across data generations: TIMESTAMP(NANOS) (surfacing in Spark as a raw
INT64 under ``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS)
(surfacing as TIMESTAMP_NTZ). Queries must not care: ``epoch_us`` maps any
of the encodings to the same microsecond epoch BIGINT, computed entirely
JVM-side with timezone-free arithmetic, so results — and the DuckDB oracle
twin ``epoch_us(ts)`` — are identical regardless of session timezone or
data generation.

At 100 TB this normalization is a zero-cost projection inside the scan
stage (no shuffle, no Python), and downstream range/gap logic runs on plain
BIGINT comparisons that stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

US_PER_HOUR = 3_600_000_000


def epoch_us(df: DataFrame, col: str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 for `col`, whatever its dtype.

    - TIMESTAMP_NTZ: ``timestampdiff(MICROSECOND, epoch, ts)`` — no timezone
      interpretation, matches DuckDB ``epoch_us`` on a naive TIMESTAMP;
    - TIMESTAMP (tz-aware): ``unix_micros`` (exact);
    - BIGINT (legacy nanosAsLong): integer ``div 1000`` (no double rounding).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise ValueError(f"no column {col!r} in {df.columns}")
    if dtype == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', {col})"
        )
    if dtype == "timestamp":
        return F.unix_micros(F.col(col))
    if dtype == "bigint":
        return F.expr(f"{col} div 1000")
    raise TypeError(f"column {col!r} has unsupported time dtype {dtype}")
