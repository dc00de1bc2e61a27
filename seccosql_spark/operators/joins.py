"""Join-flavored operators the reference defines beyond vanilla binary join.

- ``union_by_update`` — the reference's upsert operator ``UnionByUpdate``
  (``plan/binaryOperators.scala:155-171``; SQL ``(q1) UNION BYUPDATE k (q2)``,
  ``parsing/SQLParser.scala:328-336``).
- ``natural_join_chain`` — left-fold of natural joins, the lowering target for
  ``MultiwayJoin`` (``plan/multiwayOperators.scala:57-154``) when no GHD
  reordering is requested.

Scale notes: ``union_by_update`` is one shuffle on `keys` for the anti join
(broadcast if the delta side is small — Catalyst/AQE decides) plus a zero-
shuffle union. The natural-join chain lets Catalyst pick broadcast/SMJ per
step and reuses the shuffle partitioning of consecutive joins on the same key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def union_by_update(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of `left` whose `keys` match some row of `right` are replaced by the
    `right` row; unmatched `right` rows are appended.

    Equivalent SQL (the DuckDB oracle uses exactly this shape)::

        SELECT l.* FROM left l ANTI JOIN right r USING (keys)
        UNION ALL SELECT * FROM right
    """
    keys = list(keys)
    missing = [k for k in keys if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(f"union_by_update keys missing from inputs: {missing}")
    kept = left.join(right.select(*keys).distinct(), on=keys, how="left_anti")
    return kept.unionByName(right.select(*left.columns))


def natural_join_chain(dfs: Sequence[DataFrame], how: str = "inner") -> DataFrame:
    """Left-fold natural join over `dfs`; cross-join when no common columns."""
    if not dfs:
        raise ValueError("natural_join_chain needs at least one input")
    out = dfs[0]
    for nxt in dfs[1:]:
        common = [c for c in out.columns if c in set(nxt.columns)]
        out = out.join(nxt, on=common, how=how) if common else out.crossJoin(nxt)
    return out
