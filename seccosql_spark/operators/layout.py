"""Multi-dimensional data layout: Z-order (Morton) clustering.

A single-column sort gives parquet min/max file skipping on one dimension
only; interleaving the bits of k dimensions into one Morton z-value and
range-partitioning + sorting on it gives every output file a narrow
hyper-rectangle in the k-dim space, so min/max stats prune predicates on
ANY of the dimensions (the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, here as a plain-Spark composition: one `repartitionByRange`
shuffle + a partition-local sort, nothing else).

At 100 TB this is a write-once layout decision: the z-value is a map-side
expression (pure bit arithmetic, codegen'd), the one range shuffle replaces
the full sort a lexicographic layout would need for equal pruning on the
leading dimension alone, and downstream scans prune via footer stats with
zero runtime cost.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton z-value: interleave the low `bits` bits of the given
    non-negative integer columns — dimension j contributes its bit b at
    output position b*k + j. Values must fit in `bits` bits (mask the
    inputs first, e.g. `col % (1 << bits)`); with k*bits ≤ 63 the result
    fits a signed BIGINT. Pure shift/and/add — whole-stage codegen, no
    shuffle, identical arithmetic in any engine."""
    k = len(cols)
    if k == 0:
        raise ValueError("zvalue needs at least one column")
    if k * bits > 63:
        raise ValueError(f"{k} dims x {bits} bits exceeds a signed 64-bit z-value")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * k + j)
    return z


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    num_partitions: int | None = None,
    bits: int = 16,
    normalize: bool = True,
) -> DataFrame:
    """Cluster `df` for multi-dimensional file skipping: compute the Morton
    z-value of `cols`, range-partition on it (one shuffle; range boundaries
    from Spark's reservoir sampling keep the output files balanced even
    under skew), and sort within partitions so parquet row-group stats are
    tight. Write the result with `sources.connectors.write_parquet` to
    materialize the layout.

    With `normalize` (the default) each column is first linearly rescaled
    to the full [0, 2^bits) range from its measured min/max (one O(1)
    aggregate). This is NOT optional hygiene: interleaving raw values whose
    magnitudes differ means the wide dimension owns ALL the high z-bits —
    e.g. a 14-bit event_id against an 8-bit user_id degenerates into an
    event_id-only sort with ZERO skipping on user_id (measured in
    tests/test_zorder_pruning.py; Delta/Iceberg OPTIMIZE ZORDER normalize
    via range-partition ids for the same reason). Linear min/max scaling
    assumes roughly uniform dimensions; for heavily skewed columns,
    pre-rank them (e.g. `ntile`) before calling this."""
    if normalize:
        stats = df.agg(
            *[F.min(F.col(c).cast("long")).alias(f"mn_{c}") for c in cols],
            *[F.max(F.col(c).cast("long")).alias(f"mx_{c}") for c in cols],
        ).collect()[0]  # O(1) rows — a stats aggregate, fine at any scale
        dims = []
        for c in cols:
            mn = stats[f"mn_{c}"] or 0
            mx = stats[f"mx_{c}"] or 0
            span = max(1, mx - mn)
            # integer DIV, not `/` + cast: a double quotient can round
            # across a bucket boundary (cross-engine discipline)
            dims.append(
                F.expr(f"((CAST(`{c}` AS BIGINT) - {mn}) * {(1 << bits) - 1}) DIV {span}")
            )
        zc = zvalue(dims, bits=bits)
    else:
        zc = zvalue([F.col(c) % F.lit(1 << bits) for c in cols], bits=bits)
    out = df.withColumn("__z", zc)
    out = (
        out.repartitionByRange(num_partitions, "__z")
        if num_partitions
        else out.repartitionByRange("__z")
    )
    return out.sortWithinPartitions("__z").drop("__z")
