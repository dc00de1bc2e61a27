"""Graph analytics built on the message-passing / iteration substrate.

The reference ships the substrate (``messagePassing`` + ``Recursion``,
SeccoGraphFrame.scala:104-146) and its benchmark suite runs PageRank-shaped
iteration matrices (``benchmark/testcases/graphAnalytic.scala``, disabled).
These are the standard algorithms expressed on our substrate; every round is
a distributed DataFrame plan (join on src + groupBy dst = two shuffles),
checkpointed per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seccosql_spark.operators.recursion import iterate


def _nodes(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    return (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(id, in_degree, out_degree) — one pass, two partial aggregations."""
    out_d = edges.groupBy(F.col(src).alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col(dst).alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        _nodes(edges, src, dst)
        .join(out_d, "id", "left")
        .join(in_d, "id", "left")
        .select(
            "id",
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
        )
    )


PAGERANK_SCALE = 10**12
PAGERANK_DAMPING_NUM = 85
PAGERANK_DAMPING_DEN = 100


def pagerank(
    edges: DataFrame,
    rounds: int = 5,
    damping_num: int = PAGERANK_DAMPING_NUM,
    damping_den: int = PAGERANK_DAMPING_DEN,
    scale: int = PAGERANK_SCALE,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank, `rounds` synchronous supersteps. Returns (id, rank).

    Arithmetic is exact fixed-point: rank mass is a BIGINT scaled by
    `scale`, and every division is integer division (Spark ``DIV`` ==
    DuckDB ``//`` on non-negative BIGINTs), so the result is fully
    deterministic — independent of partitioning, aggregation order, and
    engine — and hash-matches a closed-form SQL oracle. Float PageRank
    (the usual formulation) is order-dependent across group sums, which
    is exactly what a distributed differential test cannot tolerate.

    Dangling mass is redistributed uniformly via a 1-row aggregate
    crossJoined into the update (no driver collect in the loop; the
    1-row side becomes a broadcast nested-loop join).

    Note: because every division floors, total rank mass strictly
    decreases each round — ranks are a deterministic approximation whose
    sum is slightly below 1.0. Acceptable for differential testing; not
    for consumers expecting an exact probability distribution.
    """
    nodes = _nodes(edges, src, dst).localCheckpoint(eager=True)
    n_nodes = nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    # (1-d)/n at fixed point; Python bigints keep it exact at plan time.
    base_fp = (damping_den - damping_num) * scale // (damping_den * n_nodes)
    init = nodes.select("id", F.lit(scale // n_nodes).cast("long").alias("v"))

    def step(state: DataFrame) -> DataFrame:
        # per-source share: v DIV deg (dangling nodes drop out of the inner join)
        shares = state.join(out_deg, "id").select(
            F.col("id").alias("__sid"), F.expr("v DIV deg").alias("t")
        )
        contrib = (
            edges.join(shares, F.col(src) == F.col("__sid"))
            .groupBy(F.col(dst).alias("id"))
            .agg(F.sum("t").cast("long").alias("c"))
        )
        dangling = (
            state.join(out_deg, "id", "left")
            .filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("v"), F.lit(0)).cast("long").alias("__dang"))
        )
        return (
            nodes.crossJoin(dangling)
            .join(contrib, "id", "left")
            .select(
                "id",
                F.expr(
                    f"CAST({base_fp} + ({damping_num} * (coalesce(c, CAST(0 AS BIGINT))"
                    f" + (__dang DIV {n_nodes}))) DIV {damping_den} AS BIGINT)"
                ).alias("v"),
            )
        )

    out = iterate(init, step, rounds)
    return out.select("id", (F.col("v").cast("double") / F.lit(float(scale))).alias("rank"))


def connected_components(
    edges: DataFrame, max_rounds: int = 50, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, component): min-id label propagation to fixpoint over the
    undirected graph. Integer-only — deterministic. Converges in O(diameter)
    rounds; the change-count action doubles as the per-round checkpoint."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    state = _nodes(edges, src, dst).select("id", F.col("id").alias("component"))
    state = state.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        candidates = (
            sym.join(state.select(F.col("id").alias("a"), "component"), "a")
            .select(F.col("b").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("new_component"))
        )
        improved = (
            state.join(candidates, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("new_component", F.col("component"))).alias(
                    "next"
                ),
                "component",
            )
        )
        n_changed = improved.filter(F.col("next") < F.col("component")).count()
        state = improved.select("id", F.col("next").alias("component")).localCheckpoint(
            eager=True
        )
        if n_changed == 0:
            break
    return state
