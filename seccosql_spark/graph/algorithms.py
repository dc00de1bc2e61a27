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


def pagerank(
    edges: DataFrame,
    rounds: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank, `rounds` synchronous supersteps. Returns (id, value).
    Weights flow src→dst; dangling mass is redistributed uniformly so the
    total stays 1.0."""
    nodes = _nodes(edges, src, dst).localCheckpoint(eager=True)
    n_nodes = nodes.count()
    out_deg = edges.groupBy(F.col(src).alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    init = nodes.select("id", F.lit(1.0 / n_nodes).alias("value"))

    def step(state: DataFrame) -> DataFrame:
        with_deg = state.join(out_deg, "id", "left")
        contrib = (
            edges.join(
                with_deg.select(F.col("id").alias("__sid"), "value", "deg"),
                F.col(src) == F.col("__sid"),
            )
            .select(F.col(dst).alias("id"), (F.col("value") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("msg"))
        )
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("value"), F.lit(0.0)).alias("d"))
            .collect()[0]["d"]
        )
        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
        return nodes.join(contrib, "id", "left").select(
            "id",
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("msg"), F.lit(0.0))).alias("value"),
        )

    return iterate(init, step, rounds)


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
