"""Plan contracts for the persisted storage-layout rows (queries/storage.py):
the layouts only earn their registry slots if the probe PLANS show the
payoff — a partition-pruned scan, a shuffle-free co-located join."""

from __future__ import annotations

import re

from seccosql_spark.registry import REGISTRY, session_for
from tests.conftest import SF_DIR


def _executed_plan(df) -> str:
    # collect() first: with AQE the executedPlan is final only after a
    # materializing action (count() builds a different QueryExecution).
    # AQE's toString prints BOTH "== Final Plan ==" and "== Initial
    # Plan ==" — keep only the final section or every node counts twice.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_partition_pruned_scan(spark):
    """The month probe must reach the scan as a PartitionFilter (directory
    pruning — no data files outside 1995-03 are read), and the answer must
    equal the raw-table filter."""
    sess = session_for(spark, SF_DIR)
    out = REGISTRY["orders_partition_pruned"].build(sess).df
    plan = _executed_plan(out)
    m = re.search(r"PartitionFilters: \[[^\]]*o_month[^\]]*1995-03[^\]]*\]", plan)
    assert m, f"month equality not in PartitionFilters:\n{plan}"
    # pruning is real: the scan's partition count is 1 (of ~80 months)
    pc = re.search(r"partition count: (\d+)", plan)
    if pc:  # metric present in this Spark's scan node text
        assert pc.group(1) == "1", plan

    got = {r["o_orderpriority"]: (r["n_orders"], r["cents"]) for r in out.collect()}
    raw = (
        spark.table("orders")
        .where("date_format(o_orderdate, 'yyyy-MM') = '1995-03'")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert {r["o_orderpriority"]: r["count"] for r in raw} == {
        k: v[0] for k, v in got.items()
    }


def test_bucketed_join_no_exchange(spark):
    """Both sides bucketed on the join key with matching counts: the
    SortMergeJoin must run with ZERO Exchange below it — the only shuffle
    in the whole plan is the final per-priority aggregation. This is the
    co-location contract that amortizes one write-time shuffle over every
    subsequent join on the key."""
    sess = session_for(spark, SF_DIR)
    out = REGISTRY["orders_bucketed_join"].build(sess).df
    plan = _executed_plan(out)
    assert "SortMergeJoin" in plan, plan
    # exactly one Exchange: the groupBy(o_orderpriority) aggregation
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, f"expected 1 exchange (final agg), got {n_exchange}:\n{plan}"
    assert "o_orderpriority" in plan.split("Exchange hashpartitioning", 1)[1][:200]
    # the scans really are bucketed reads
    assert re.search(r"SelectedBucketsCount|Bucketed: true", plan), plan

    got = {r["o_orderpriority"]: r["n_items"] for r in out.collect()}
    raw = (
        spark.table("orders")
        .join(
            spark.table("lineitem"),
            spark.table("orders")["o_orderkey"] == spark.table("lineitem")["l_orderkey"],
        )
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert {r["o_orderpriority"]: r["count"] for r in raw} == got
