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


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic DATA-MIXTURE sampling — the domain-reweighting step of
    a training-data pipeline: each stratum (source/domain/language) keeps
    its rows at its own rate, so a corpus dominated by one crawl can be
    downsampled to a target mixture in a single map-only pass.

    Same content-keyed md5 discipline as `hash_sample` (md5(key)[:8] < an
    8-hex threshold), so the selected SET is deterministic, reproducible
    across engines/runs, and CONSISTENT across rate changes: raising a
    stratum's rate only ADDS documents to its sample, never swaps them —
    the property that keeps incremental re-mixes cheap at 100 TB. The
    per-stratum threshold is one literal CASE expression (codegen'd map-only
    scan; no join, no shuffle) — right up to thousands of strata; a mixture
    map too big for an expression (e.g. per-domain rates over millions of
    hosts) should instead broadcast-join a (stratum, threshold) table, which
    keeps the same semantics at one broadcast's cost. Rate 1.0 uses a
    sentinel above the hex alphabet so the comparison keeps every row."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")

    def thr(rate: float) -> str:
        # "g" > every hex digit, so rate=1 keeps all rows in a string compare
        return "g" if rate >= 1.0 else rate_to_hex_threshold(rate)

    expr = None
    for s, r in sorted(rates.items()):
        cond = F.col(stratum_col) == s
        expr = F.when(cond, thr(r)) if expr is None else expr.when(cond, thr(r))
    expr = F.lit(thr(default_rate)) if expr is None else expr.otherwise(thr(default_rate))
    return df.filter(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8) < expr
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


def weighted_sample(df: DataFrame, key_col: str, weight_col: str) -> DataFrame:
    """Keep each row independently with probability equal to its per-row
    weight in [0, 1] — quality-proportional corpus sampling. Content-keyed
    like `hash_sample`: u = first 8 md5 hex digits of the key as a uniform
    32-bit integer, row kept iff u < weight * 2^32, so the decision is
    deterministic, reproducible across runs/engines, and MONOTONE in the
    weight (raising a doc's weight can only add it, never flip others —
    incremental re-samples stay cheap). Map-only filter: no shuffle, no
    Python, survives any scale."""
    u = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return df.filter(u.cast("double") < F.col(weight_col) * F.lit(4294967296.0))
