#!/usr/bin/env python3
"""Interleaved A/B for the r17 q5/q7 join-order candidates (VERDICT r16
task 5 + the q7 sibling): the shipped SQL-text join order (OLD — what the
registry holds) vs the early-dim-reduction candidates (NEW — REJECTED after
this A/B, preserved verbatim below so the experiment stays reproducible).
Outcome: NEW loses at sf0.1 (q5 0.639→0.743, q7 0.616→0.864 medians) and
ties within noise at sf1, because the old plans are already all-broadcast
single-pass at every measurable scale; see OPTIMIZATION_r17.md.

Both arms run ALTERNATED per rep in ONE session (old,new,old,new,...) so
host contention bursts land on both equally — the only before/after
methodology this container's invisible 2-4 min bursts permit. Result
equality is asserted on the first rep pair (sorted rows, revenue rounded to
1e-6 — the driver's own hash tolerance is stricter but exact-decimal sums
make the doubles bit-identical in practice).

Usage: python scripts/r17_ab_relational.py [q5|q7|both] [reps=6]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, build_session  # noqa: E402
from seccosql_spark.registry import session_for  # noqa: E402
from seccosql_spark.session import SeccoSession  # noqa: E402


def q5_old(sess: SeccoSession):
    """Pre-r17 q5: SQL-text join order, full customer broadcast, l⋈o
    exchange carries 100% of both facts."""
    from pyspark.sql import functions as F

    li = sess.table("lineitem")
    orders = sess.table("orders")
    cust = sess.from_spark(F.broadcast(sess.table("customer").df))
    nation = sess.from_spark(F.broadcast(sess.table("nation").df))
    region = sess.from_spark(F.broadcast(sess.table("region").df))
    return (
        li.join(orders, "l_orderkey = o_orderkey")
        .join(cust, "o_custkey = c_custkey")
        .join(nation, "c_nationkey = n_nationkey")
        .join(region, "n_regionkey = r_regionkey")
        .filter("r_name IN ('ASIA', 'EUROPE')")
        .aggregate(
            [
                "CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue",
                "count(*) AS n",
            ],
            ["n_name"],
        )
    )


def q7_old(sess: SeccoSession):
    """Pre-r17 q7: the raw SQL text through Catalyst (joins full facts
    before any nation filter lands)."""
    from seccosql_spark.queries.tpch_shapes import Q7

    return sess.sql(Q7)


def q5_new(sess: SeccoSession):
    """The REJECTED r17 candidate (kept verbatim so the A/B stays
    reproducible after the revert): region filter reaches orders before the
    fact-fact join through a nation⋈region⋈customer broadcast chain, and
    lineitem is pre-aggregated by l_orderkey (partial map-side agg) so the
    exchange carries per-order partials. Interleaved A/B: sf0.1 old 0.639 /
    new 0.743 median (the old plan is already all-broadcast — the extra
    joins materialize AQE exchanges), sf1 old≈new within noise (gen_sf1
    keeps dims fixed, so the old plan is all-broadcast there too). Reverted:
    pays at every measurable scale, wins only at broadcast-breaking scales
    this harness cannot measure."""
    from pyspark.sql import functions as F

    spark = sess.spark
    reg = F.broadcast(
        spark.table("region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    )
    nat = F.broadcast(
        spark.table("nation")
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    cust = F.broadcast(
        spark.table("customer")
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    ords = spark.table("orders").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "n_name")
    li_pre = (
        spark.table("lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.expr(
                "sum(CAST(l_extendedprice AS DECIMAL(12,2))"
                " * CAST(1 - l_discount AS DECIMAL(4,2)))"
            ).alias("__rev"),
            F.count(F.lit(1)).alias("__cnt"),
        )
    )
    return (
        li_pre.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            F.expr("CAST(sum(__rev) AS DOUBLE)").alias("revenue"),
            F.expr("CAST(sum(__cnt) AS BIGINT)").alias("n"),
        )
    )


def q7_new(sess: SeccoSession):
    """The REJECTED r17 candidate for q7 (same verdict as q5_new): each
    fact pre-reduced through its 2-of-25-nation dimension chain before the
    l⋈o join. Interleaved A/B: sf0.1 old 0.616 / new 0.864 (the reduced-dim
    joins are post-join relations, so Catalyst's product-based size
    estimates force SMJ initially and AQE materializes both exchanges
    before converting to broadcast), sf1 within noise. Reverted."""
    from pyspark.sql import functions as F

    spark = sess.spark
    nat2 = F.broadcast(
        spark.table("nation").where(F.col("n_name").isin("NATION_1", "NATION_2"))
    )
    supp = spark.table("supplier").join(
        nat2, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = spark.table("customer").join(
        nat2, F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    ords = spark.table("orders").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_orderdate", "cust_nation")
    li = spark.table("lineitem").join(
        supp, F.col("l_suppkey") == F.col("s_suppkey")
    ).select("l_orderkey", "l_extendedprice", "l_discount", "supp_nation")
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    from seccosql_spark.queries.tpch_shapes import REV

    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(pair_ok)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("int").alias("yr"),
            "l_extendedprice",
            "l_discount",
        )
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(F.expr(REV).alias("revenue"))
    )


OLD = {"q5_join_chain": q5_old, "q7_nation_volume": q7_old}
NEW = {"q5_join_chain": q5_new, "q7_nation_volume": q7_new}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    names = (
        ["q5_join_chain", "q7_nation_volume"]
        if which == "both"
        else [n for n in OLD if n.startswith(which)]
    )
    spark = build_session("r17_ab_relational")
    sess = session_for(spark, SF_DIR)

    def as_spark(df):
        return df.df if hasattr(df, "df") else df

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(repo, "plans", "r17")
    os.makedirs(plan_dir, exist_ok=True)

    def dump_plan(df, name: str, tag: str, med: float | None = None) -> None:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        sf_suffix = "" if SF_DIR.rstrip("/").endswith("sf0.1") else "_sf1"
        with open(os.path.join(plan_dir, f"{name}_{tag}{sf_suffix}.txt"), "w") as f:
            f.write(
                f"# {name} [{tag}] sf_dir={SF_DIR} (captured by "
                f"r17_ab_relational.py — the '{tag}' arm of the interleaved "
                "A/B; 'before'=shipped registry shape, 'after'=the REJECTED "
                "r17 candidate, both preserved verbatim in the script)\n"
                + (f"# interleaved median_sec={med:.3f}\n" if med is not None else "")
                + f"# joins: broadcast={plan.count('BroadcastHashJoin')}"
                f" sort-merge={plan.count('SortMergeJoin')}"
                f" shuffled-hash={plan.count('ShuffledHashJoin')};"
                f" exchanges={plan.count('Exchange')} (text)\n\n"
            )
            f.write(plan)

    for name in names:
        spark.sparkContext.setJobDescription(f"r17 A/B {name}")
        old_df = as_spark(OLD[name](sess))
        new_df = as_spark(NEW[name](sess))
        old_rows = sorted(tuple(r) for r in old_df.collect())
        new_rows = sorted(tuple(r) for r in new_df.collect())
        assert old_rows == new_rows, (
            name, len(old_rows), len(new_rows),
            [p for p in zip(old_rows, new_rows) if p[0] != p[1]][:3],
        )
        print(f"# {name}: result equality OK ({len(old_rows)} rows identical)",
              flush=True)
        times: dict[str, list[float]] = {"old": [], "new": []}
        for rep in range(reps):
            for tag, make in (("old", OLD[name]), ("new", NEW[name])):
                la = os.getloadavg()[0]
                t0 = time.perf_counter()
                n = as_spark(make(sess)).count()
                dt = time.perf_counter() - t0
                times[tag].append(dt)
                print(f"{name} rep {rep} {tag}: {dt:.3f}s rows={n} load={la:.1f}",
                      flush=True)
        meds = {}
        for tag in ("old", "new"):
            ts = sorted(times[tag])
            meds[tag] = ts[len(ts) // 2]
            print(f"{name} {tag}: median={ts[len(ts)//2]:.3f} "
                  f"all={['%.3f' % t for t in times[tag]]}")
        dump_plan(old_df, name, "before", meds["old"])
        dump_plan(new_df, name, "after", meds["new"])
    spark.stop()


if __name__ == "__main__":
    main()
