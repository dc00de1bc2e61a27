"""PK-FK join classification + star planning tests (the reference's
MarkJoinIntegrityConstraintProperty / OptimizePKFKJoin surface)."""

from __future__ import annotations

from seccosql_spark.catalog import SideCatalog
from seccosql_spark.plans.pkfk import JoinInput, classify_join, plan_star_join


def _catalog() -> SideCatalog:
    c = SideCatalog()
    c.register("orders", primary_keys=("o_orderkey",))
    c.register("customer", primary_keys=("c_custkey",))
    c.register("lineitem", primary_keys=("l_orderkey", "l_linenumber"))
    return c


def test_classify_pk_fk():
    c = _catalog()
    assert classify_join(c, "orders", ["o_orderkey"], "lineitem", ["l_orderkey"]) == "pk-fk"
    # joining lineitem to lineitem on partial key = fk-fk
    assert classify_join(c, "lineitem", ["l_orderkey"], "lineitem", ["l_orderkey"]) == "fk-fk"
    # unknown tables have no PK metadata
    assert classify_join(c, "a", ["x"], "b", ["y"]) == "fk-fk"


def test_star_plan_anchors_fact_and_broadcasts_dims(spark, sess):
    """lineitem (fact) anchors; orders/customer are PK-side dims → broadcast
    hints appear in the plan and no cartesian product sneaks in."""
    import contextlib
    import io

    catalog = _catalog()
    inputs = [
        JoinInput(
            "lineitem",
            spark.table("lineitem"),
            [("l_orderkey", "orders", "o_orderkey")],
        ),
        JoinInput("orders", spark.table("orders"), [("o_custkey", "customer", "c_custkey")]),
        JoinInput("customer", spark.table("customer"), []),
    ]
    out = plan_star_join(catalog, inputs)
    assert out.count() == spark.table("lineitem").count()  # PK-FK joins preserve fact rows
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_star_plan_rejects_ambiguous_columns(spark):
    import pytest

    c = _catalog()
    inputs = [
        JoinInput("a", spark.createDataFrame([(1,)], "x INT"), []),
        JoinInput("b", spark.createDataFrame([(2,)], "x INT"), []),
    ]
    with pytest.raises(ValueError, match="ambiguous column"):
        plan_star_join(c, inputs)
