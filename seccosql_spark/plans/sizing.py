"""Size-gated materialization: make eager ``localCheckpoint`` shape-changes
conditional on estimated input size (guide §2 "make partitioning/plan
choices scale-adaptive — derive from input size, never a constant").

Round-16 materialized several multi-consumer relations eagerly (pattern()'s
edge relation, resample_gapfill's (key,bucket) aggregate) so k redundant
fact scans become one — the right 100 TB shape, but a real sf0.1 bench loss
(VERDICT r16 "What's wrong" 1): at 600k rows the blocking checkpoint job +
``Scan ExistingRDD`` (no columnar reader, no WSCG scan fusion) costs more
than the k cheap column-pruned parquet scans it removes. The gate keeps the
lazy plan below a byte threshold and checkpoints above it — the same
derive-from-observed-size discipline the fixpoint kernels and streaming
state sizing already use (``graph/algorithms._enter_parallelism_first_off``,
``streaming/ops.scaled_stream_partitions``).

The estimate is Catalyst's own plan statistic (file sizes for parquet
relations, propagated bottom-up) — plan-time only, zero Spark jobs. Unknown
size (the Long.MaxValue default sentinel) gates to MATERIALIZE: at real
scale "unknown" is the common case and the checkpoint is the safe shape.

Results never change either way: the gate picks between two physical plans
of the same logical relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Below this estimated input size the redundant-scan plan is kept lazy.
# Default 256 MB: a few column-pruned re-scans of <256 MB cost less than a
# blocking materialization job on every measurement this repo has (sf0.1
# facts are 2-11 MB, sf1 20-110 MB — both stay lazy; any real deployment's
# fact stream gates to materialize). Overridable per deployment.
MATERIALIZE_MIN_INPUT_BYTES = 256 * 1024 * 1024
MAT_KEY = "spark.seccosql.materialize.minInputBytes"

# Catalyst's "unknown size" defaults are Long.MaxValue-ish; anything this
# large is a sentinel, not an estimate.
_UNKNOWN_SENTINEL = 1 << 62


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's estimated byte size of ``df``'s optimized logical plan
    (sum of file sizes for file-source relations, propagated through
    operators). Plan-time arithmetic — runs no Spark job. ``None`` when the
    estimate is unavailable or the unknown-size sentinel."""
    try:
        # py4j converts the scala BigInt to a Python int; str() round-trip
        # also covers a raw JavaObject on older bridges
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return None
    if size < 0 or size >= _UNKNOWN_SENTINEL:
        return None
    return size


def size_gated_checkpoint(df: DataFrame, gate_on: DataFrame | None = None) -> DataFrame:
    """``df.localCheckpoint(eager=True)`` iff the estimated size of
    ``gate_on`` (default: ``df`` itself) reaches the configured threshold —
    otherwise ``df`` unchanged (lazy). Unknown estimates materialize (the
    safe at-scale choice). Threshold 0 forces materialization (how the
    plan-gate tests pin the scale shape); a huge threshold forces lazy.

    localCheckpoint (not persist) so the materialization is per-invocation:
    nothing is registered in the cache manager that a later identical plan
    could silently reuse across runs."""
    spark = df.sparkSession
    try:
        min_bytes = int(spark.conf.get(MAT_KEY, ""))
    except (TypeError, ValueError):
        min_bytes = MATERIALIZE_MIN_INPUT_BYTES
    est = plan_size_bytes(gate_on if gate_on is not None else df)
    if est is not None and est < min_bytes:
        return df
    return df.localCheckpoint(eager=True)
