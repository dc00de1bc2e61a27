"""Skew-aware join: salting for hot keys.

Spark's AQE skew-join handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``); explicit salting remains the tool
when one FK-FK join key is so hot that even split shuffle partitions overload
a task, or when AQE is unavailable (streaming joins). The classic transform:

    left:  add salt = hash(row) % factor        (one extra tiny column)
    right: replicate each row across all salts  (|right| × factor rows)
    join on (keys…, salt)                       (hot key now spreads over
                                                 `factor` reducers)

Replicate the SMALL side; cost is factor× its size, benefit is factor×
parallelism on the hot key. Deterministic: the salt is a hash of the left
row's key columns plus a uniquifier column if provided, not a random number,
so results are reproducible and the operator stays a pure plan transform.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__secco_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt_factor: int = 8,
    left_uniquifier: str | None = None,
) -> DataFrame:
    """Equi-join on `keys` with the left side salted across `salt_factor`
    buckets and the right side replicated. Semantically identical to
    ``left.join(right, keys, how)`` for inner/left joins.

    `left_uniquifier`: a left column that varies within a key group (e.g. a
    row id); hashing it spreads a single hot key across buckets. Falls back
    to all left columns, which works unless rows are full duplicates."""
    keys = list(keys)
    salt_src = [left_uniquifier] if left_uniquifier else [c for c in left.columns]
    salted_left = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*salt_src), F.lit(salt_factor)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias(SALT_COL)
    replicated_right = right.select("*", salts)
    out = salted_left.join(replicated_right, on=keys + [SALT_COL], how=how)
    return out.drop(SALT_COL)
