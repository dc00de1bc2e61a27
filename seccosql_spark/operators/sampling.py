"""Deterministic sampling + sessionization for training-data pipelines.

- ``hash_sample``: content-hash Bernoulli sampling — the reproducible
  alternative to ``df.sample()`` (which is seed- and partitioning-
  dependent). A row is kept iff its md5 8-hex-digit prefix is below the
  rate threshold; fixed-width lowercase hex compares identically as a
  string in every engine, so the DuckDB oracle is the same expression.
  Same rows on any cluster layout, any engine, any day.
- ``stratified_sample_topk``: exactly-k-per-group via md5-ordered
  row_number — deterministic stratified downsampling.
- ``sessionize``: classic gap-based session ids: a session starts when the
  gap to the previous event (per key) exceeds the threshold; session id =
  running count of session starts. Two window functions over ONE shuffle
  on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rate_to_hex_threshold(rate: float) -> str:
    """rate in [0,1) -> 8-hex-digit threshold string (lowercase). rate=1 has
    no 8-digit threshold (16^8 is 9 digits, which would corrupt the
    fixed-width string compare) — hash_sample short-circuits it."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 16 ** 8), 16 ** 8 - 1), "08x")


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep rows with md5(key)[:8] < hex threshold. Deterministic, content-keyed."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return df
    threshold = rate_to_hex_threshold(rate)
    return df.filter(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8) < F.lit(threshold)
    )


def stratified_sample_topk(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """At most k rows per group, chosen by md5 order (deterministic; the key
    column itself breaks the — astronomically unlikely — hash ties)."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    time_col: str,
    gap: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key (numeric times). session_id is
    1-based per key, ordered by time; ties on time_col must not exist within
    a key (use a sequence column when wall-clock collides)."""
    w = Window.partitionBy(key_col).orderBy(time_col)
    new_session = (
        F.col(time_col) - F.lag(time_col).over(w) > F.lit(gap)
    ).cast("int")
    return df.withColumn(
        session_col,
        F.sum(F.coalesce(new_session, F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
