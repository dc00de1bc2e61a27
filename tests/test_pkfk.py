"""PK-FK join classification + star planning tests (the reference's
MarkJoinIntegrityConstraintProperty / OptimizePKFKJoin surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def _plan_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_star_plan_anchors_fact_and_broadcasts_dims(spark, sess):
    """lineitem (fact) anchors; orders/customer are PK-side dims with
    proven-small stats → broadcast hints appear in the plan and no cartesian
    product sneaks in."""
    catalog = _catalog()
    from seccosql_spark.catalog import TableStats

    catalog.register("orders", primary_keys=("o_orderkey",), stats=TableStats(row_count=1500))
    catalog.register("customer", primary_keys=("c_custkey",), stats=TableStats(row_count=150))
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
    plan = _plan_str(out)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_no_broadcast_hint_on_unknown_stats(spark):
    """Unknown row count -> NO explicit hint (explicit hints are not demoted
    by AQE; a surprise-huge 'dimension' would OOM executors). Verified on
    the logical plan: no ResolvedHint/UnresolvedHint node."""
    catalog = _catalog()  # registers PKs but no stats
    inputs = [
        JoinInput(
            "lineitem",
            spark.table("lineitem"),
            [("l_orderkey", "orders", "o_orderkey")],
        ),
        JoinInput("orders", spark.table("orders"), []),
    ]
    out = plan_star_join(catalog, inputs)
    logical = out._jdf.queryExecution().logical().toString()
    assert "hint" not in logical.lower()


def test_partial_composite_pk_is_not_dimension(spark):
    """Joining lineitem on l_orderkey alone covers only part of its
    composite PK (l_orderkey, l_linenumber) -> lineitem is NOT a dimension
    and must never get a broadcast hint, even with small stats."""
    from seccosql_spark.catalog import TableStats

    catalog = _catalog()
    catalog.register(
        "lineitem",
        primary_keys=("l_orderkey", "l_linenumber"),
        stats=TableStats(row_count=100),
    )
    catalog.register("orders", primary_keys=("o_orderkey",), stats=TableStats(row_count=100))
    inputs = [
        JoinInput(
            "orders",
            spark.table("orders"),
            [("o_orderkey", "lineitem", "l_orderkey")],
        ),
        JoinInput("lineitem", spark.table("lineitem"), []),
    ]
    out = plan_star_join(catalog, inputs)
    logical = out._jdf.queryExecution().logical().toString()
    assert "hint" not in logical.lower()
    # sanity: full-PK coverage DOES make it a dimension
    inputs2 = [
        JoinInput(
            "orders",
            spark.table("orders").withColumn("o_line", F.lit(1)),
            [("o_orderkey", "lineitem", "l_orderkey"), ("o_line", "lineitem", "l_linenumber")],
        ),
        JoinInput("lineitem", spark.table("lineitem"), []),
    ]
    out2 = plan_star_join(catalog, inputs2)
    logical2 = out2._jdf.queryExecution().logical().toString()
    assert "hint" in logical2.lower()


def test_star_plan_rejects_ambiguous_columns(spark):
    import pytest

    c = _catalog()
    inputs = [
        JoinInput("a", spark.createDataFrame([(1,)], "x INT"), []),
        JoinInput("b", spark.createDataFrame([(2,)], "x INT"), []),
    ]
    with pytest.raises(ValueError, match="ambiguous column"):
        plan_star_join(c, inputs)


def test_star_plan_rejects_disconnected_input(spark):
    """An input with no equi-join edge into the joined set must raise, not
    silently emit a cartesian product (a cluster-killer at scale)."""
    import pytest

    c = _catalog()
    inputs = [
        JoinInput(
            "lineitem",
            spark.table("lineitem"),
            [("l_orderkey", "orders", "o_orderkey")],
        ),
        JoinInput("orders", spark.table("orders"), []),
        JoinInput("customer", spark.table("customer"), []),  # no join edge
    ]
    with pytest.raises(ValueError, match="refusing to emit an implicit cross join"):
        plan_star_join(c, inputs)
