"""Graph analytics built on the message-passing / iteration substrate.

The reference ships the substrate (``messagePassing`` + ``Recursion``,
SeccoGraphFrame.scala:104-146) and its benchmark suite runs PageRank-shaped
iteration matrices (``benchmark/testcases/graphAnalytic.scala``, disabled).
These are the standard algorithms expressed on our substrate; every round is
a distributed DataFrame plan (join on src + groupBy dst = two shuffles),
checkpointed per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def connected_components_star(
    edges: DataFrame, max_rounds: int = 32, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds vs O(diameter) for min-label propagation,
    which is the difference between ~5 and ~50 shuffle rounds on a long
    duplicate-chain graph at corpus scale. Each round is two
    groupBy-min + join passes over a shrinking edge set; all BIGINT, so
    results are deterministic and identical to connected_components()."""
    e = (
        edges.select(F.col(src).cast("long").alias("x"), F.col(dst).cast("long").alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        e.select(F.col("lo").alias("id")).unionByName(e.select(F.col("hi").alias("id"))).distinct()
    ).localCheckpoint(eager=True)

    def _sym(pairs: DataFrame) -> DataFrame:
        return pairs.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionByName(
            pairs.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )

    for _ in range(max_rounds):
        sym = _sym(e)
        # large-star: every neighbor v > u links to min(N(u) ∪ {u})
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.least("v", "m").alias("lo"), F.greatest("v", "m").alias("hi"))
            .filter(F.col("lo") != F.col("hi"))
        )
        sym2 = _sym(large.distinct())
        # small-star: every neighbor v <= u (plus u) links to
        # min({v ∈ N(u): v <= u} ∪ {u})
        small_nb = sym2.filter(F.col("v") < F.col("u"))
        smins = small_nb.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            small_nb.join(smins, "u")
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .unionByName(smins.select(F.col("u").alias("x"), F.col("m").alias("y")))
            .filter(F.col("x") != F.col("y"))
            .select(F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fixpoint: the edge relation stopped changing (both are distinct sets,
        # so equal counts + empty difference is an exact check)
        if small.count() == e.count() and small.exceptAll(e).isEmpty():
            e = small
            break
        e = small
    # at fixpoint every edge is (component-min, member)
    comp = e.select(F.col("hi").alias("id"), F.col("lo").alias("component"))
    return all_nodes.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def _sym_neighbors(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct undirected neighbor pairs (a, b): both orientations of every
    edge, deduplicated — the simple-graph view used by the neighborhood
    analytics below."""
    return (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )


def kcore(
    edges: DataFrame, k: int, max_rounds: int = 32, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, degree) of the k-core: iteratively peel nodes of degree < k from
    the undirected simple graph until fixpoint. Degree recomputation each
    round touches only surviving edges (semi-join on the alive set), so a
    round is two hash joins + one aggregation; rounds needed = peel depth
    (typically << max_rounds). Integer-only — deterministic."""
    if max_rounds < 1:
        raise ValueError(f"kcore needs max_rounds >= 1, got {max_rounds}")
    nb = _sym_neighbors(edges, src, dst).localCheckpoint(eager=True)
    alive = nb.select(F.col("a").alias("id")).distinct().localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = (
            nb.join(alive.select(F.col("id").alias("a")), "a")
            .join(alive.select(F.col("id").alias("b")), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        survivors = deg.filter(F.col("degree") >= k).localCheckpoint(eager=True)
        n_prev, n_now = alive.count(), survivors.count()
        alive = survivors.select("id").localCheckpoint(eager=True)
        if n_now == n_prev or n_now == 0:
            return survivors
    return survivors


def sssp(
    weighted_edges: DataFrame,
    source: int,
    max_rounds: int = 64,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """(id, dist) single-source shortest paths over positive integer edge
    weights: synchronous Bellman-Ford, stopping as soon as a relaxation round
    improves nothing. Distances are BIGINTs — exact, engine-independent. Each
    round is one join on src + one min-aggregation on dst (two shuffles)."""
    edges = weighted_edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).cast("long").alias("w")
    ).localCheckpoint(eager=True)
    state = edges.sparkSession.sql(
        f"SELECT CAST({source} AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist"
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        relaxed = (
            state.join(edges, state["id"] == edges["src"])
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            state.select("id", "dist")
            .unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        improved = (
            merged.join(state.withColumnRenamed("dist", "old"), "id", "left")
            .filter(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .count()
        )
        state = merged
        if improved == 0:
            break
    return state


def label_propagation(
    edges: DataFrame, rounds: int, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, label) after `rounds` SYNCHRONOUS label-propagation supersteps on
    the undirected simple graph. Every node adopts the most frequent label
    among its neighbors, ties broken by the smallest label — a total order,
    so unlike textbook async LPA the result is deterministic and
    differentially testable. Fixed round count (community detection has no
    natural fixpoint: labels can oscillate)."""
    nb = _sym_neighbors(edges, src, dst).localCheckpoint(eager=True)
    state = nb.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        counted = (
            nb.join(state.select(F.col("id").alias("b"), "label"), "b")
            .groupBy(F.col("a").alias("id"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        win = Window.partitionBy("id").orderBy(F.col("c").desc(), F.col("label").asc())
        state = (
            counted.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select("id", "label")
            .localCheckpoint(eager=True)
        )
    return state


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, triangles, wedges) per vertex on the undirected simple graph:
    `triangles` = adjacent neighbor pairs, `wedges` = deg*(deg-1)/2. Both are
    exact BIGINTs — the coefficient is their ratio, left to the caller so the
    differential gate never compares floats. Plan: the neighbor-pair join is
    bounded by triangle count (each neighbor pair probes one hash lookup)."""
    nb = _sym_neighbors(edges, src, dst).localCheckpoint(eager=True)
    deg = nb.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    pair = (
        nb.select(F.col("a").alias("v"), F.col("b").alias("n1"))
        .join(nb.select(F.col("a").alias("v"), F.col("b").alias("n2")), "v")
        .filter(F.col("n1") < F.col("n2"))
    )
    tri = (
        pair.join(
            nb.select(F.col("a").alias("n1"), F.col("b").alias("n2")), ["n1", "n2"]
        )
        .groupBy(F.col("v").alias("id"))
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.expr("CAST(deg * (deg - 1) DIV 2 AS BIGINT)").alias("wedges"),
        )
    )


def common_neighbors(
    edges: DataFrame, top: int = 20, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(u, v, common) — the `top` non-ordered vertex pairs ranked by shared
    undirected neighbors (the classic link-prediction score), ties broken by
    (u, v) so the LIMIT set is deterministic. One self-join on the neighbor
    relation keyed by the shared neighbor; at scale the hub-neighbor skew is
    the risk, mitigated the same way as wedge counting (cap/salt hot b's
    upstream if degree distribution demands it)."""
    nb = _sym_neighbors(edges, src, dst)
    return (
        nb.select(F.col("b").alias("via"), F.col("a").alias("u"))
        .join(nb.select(F.col("b").alias("via"), F.col("a").alias("v")), "via")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
        .orderBy(F.col("common").desc(), "u", "v")
        .limit(top)
    )


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


def strongly_connected_components(
    edges: DataFrame, max_rounds: int = 50, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(id, scc): DIRECTED strongly-connected components, exactly — the
    directed sibling of `connected_components` (which symmetrizes and
    therefore merges one-way-linked nodes). scc = min id of the component.

    Method: semi-naive transitive closure (`operators/recursion.
    bounded_fixpoint`, O(diameter) rounds), then scc(v) = least(v,
    min{u : v→*u ∧ u→*v}) — v and u are mutually reachable iff they share
    an SCC, so the minimum mutual neighbor IS the component id. (A cheaper
    double-min-label scheme is NOT correct: a node can reach a smaller id
    one-way outside its SCC, splitting real components.)

    Scale: the closure materializes reach-pairs, O(n·reach) — right for
    analytics-sized / condensed graphs (the reference's I-series scale);
    for web-scale SCC use FW-BW/coloring partitioning on top of this as
    the per-partition kernel."""
    from seccosql_spark.operators.recursion import bounded_fixpoint

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))

    def step(delta: DataFrame) -> DataFrame:
        return (
            delta.alias("d")
            .join(e.alias("e"), F.col("d.b") == F.col("e.a"))
            .select(F.col("d.a").alias("a"), F.col("e.b").alias("b"))
        )

    reach = bounded_fixpoint(e, step, max_rounds=max_rounds)
    back = reach.select(F.col("b").alias("a"), F.col("a").alias("b"))
    mutual = reach.intersect(back)  # v→*u and u→*v, v != u (unless self-loop path)
    best = mutual.groupBy("a").agg(F.min("b").alias("m"))
    return (
        _nodes(edges, src, dst)
        .join(best.withColumnRenamed("a", "id"), "id", "left")
        .select("id", F.least(F.col("id"), F.coalesce("m", F.col("id"))).alias("scc"))
    )
