"""Plan-quality gates for the round-3 additions: the TPC-H suite completion
(queries/tpch_rest.py) and the graph-analytics family. Each test asserts the
physical property that makes the query survive a 100x scale-up — join
strategy (semi/anti, not row-multiplying inner), scan-level pushdown, and
decorrelation of scalar subqueries into aggregate joins (never per-row
re-execution)."""

from __future__ import annotations

from tests.test_plan_quality import formatted_plan


def test_q6_all_filters_pushed_to_scan(sess):
    """Q6 is the canonical pushdown probe: quantity + discount range + the
    shipdate year must all reach the parquet scan as data filters."""
    plan = formatted_plan(sess, "q6_forecast_revenue")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("LessThan(l_quantity,24" in l for l in pushed), pushed
    assert any("GreaterThanOrEqual(l_discount" in l for l in pushed), pushed


def test_q6_scan_is_column_pruned(sess):
    plan = formatted_plan(sess, "q6_forecast_revenue")
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_returnflag" not in read, read


def test_q4_exists_plans_semi_join(sess):
    """EXISTS must become a LeftSemi hash join — no row multiplication from
    multi-lineitem orders."""
    plan = formatted_plan(sess, "q4_order_priority")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan


def test_q16_not_in_plans_anti_join(sess):
    plan = formatted_plan(sess, "q16_supplier_count")
    assert "LeftAnti" in plan or "NullAwareAnti" in plan, plan


def test_q21_semi_and_anti(sess):
    """EXISTS -> semi, NOT EXISTS -> anti, both hash joins on l_orderkey."""
    plan = formatted_plan(sess, "q21_sole_blame_supplier")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan


def test_q17_correlated_subqueries_decorrelate(sess):
    """The two per-part aggregates must decorrelate into aggregate+join
    (one grouped aggregation over lineitem per subquery), not re-execute
    per outer row: no nested-loop/cartesian anywhere."""
    plan = formatted_plan(sess, "q17_small_quantity_revenue")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2, plan


def test_q2_correlated_min_decorrelates(sess):
    plan = formatted_plan(sess, "q2_min_acctbal_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q13_outer_join_condition_not_pushed(sess):
    """The priority predicate lives in the LEFT OUTER join condition; pushing
    it below the join as a lineitem... orders filter would drop the
    null-extended customers. The join must stay an outer join."""
    plan = formatted_plan(sess, "q13_customer_distribution")
    assert "LeftOuter" in plan, plan


def test_q22_anti_join_for_not_exists(sess):
    plan = formatted_plan(sess, "q22_sales_opportunity")
    assert "LeftAnti" in plan, plan


def test_q8_no_cartesian_in_eight_way_join(sess):
    """The widest join in the suite: every edge is an equi-join; nation's
    double role (customer-side, supplier-side) must not degrade to a
    cartesian or nested loop."""
    plan = formatted_plan(sess, "q8_market_share")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_common_neighbors_hash_join_on_via(sess):
    """The link-prediction self-join must hash-join on the shared neighbor,
    never cartesian."""
    plan = formatted_plan(sess, "g_common_neighbors")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
