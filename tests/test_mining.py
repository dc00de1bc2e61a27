"""Corner-case pins for the behavioral-mining batch (queries/mining.py) —
semantics the sf-testdata differential cannot distinguish on its own:
the lower-median convention, full diff-class coverage, the profiler's
single-scan plan, and power-iteration convergence on a corpus with a real
dominant direction (the registry row runs on near-isotropic data where two
rounds deliberately do not converge)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from seccosql_spark.queries.mining import power_iterate_top_direction
from seccosql_spark.registration import REGISTRY
from seccosql_spark.registry import session_for
from tests.conftest import SF_DIR


def test_lower_median_selection_even_group(spark):
    """The MAD query's median = row at rank floor((n+1)/2) — for an even
    group that is the LOWER median (rank 2 of 4), never an interpolated
    midpoint. Pinned inline so a future 'simplify to percentile()' edit
    fails loudly (interpolation is where engines drift)."""
    row = spark.sql(
        """
        SELECT value FROM (
          SELECT value,
                 row_number() OVER (ORDER BY value) AS rn,
                 count(*) OVER () AS n
          FROM VALUES (4.0), (1.0), (3.0), (2.0) AS t(value)) r
        WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
        """
    ).collect()
    assert [r["value"] for r in row] == [2.0]


def test_snapshot_diff_populates_all_four_classes(spark):
    """added / removed / changed / unchanged must ALL occur (v1 drops %97
    keys, v2 drops %89 keys and bumps %13 prices) — a diff demo where one
    class is structurally empty proves nothing about that branch."""
    sess = session_for(spark, SF_DIR)
    out = REGISTRY["snapshot_diff_orders"].build(sess)
    df = out.df if hasattr(out, "df") else out
    classes = {r["change_kind"]: r["n_rows"] for r in df.collect()}
    assert set(classes) == {"added", "removed", "changed", "unchanged"}
    assert all(n > 0 for n in classes.values())


def test_profile_columns_single_scan(spark):
    """The profiler's contract is ONE pass over the table: all 24 metrics
    from a single scan (count-distinct adds Expand, not extra scans), then
    a 1-row stack unpivot."""
    sess = session_for(spark, SF_DIR)
    out = REGISTRY["profile_columns"].build(sess)
    df = out.df if hasattr(out, "df") else out
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString() prints BOTH the final and the initial
    # plan; count scans only in the final section.
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final


def test_power_iteration_recovers_planted_direction(spark):
    """On a corpus with a dominant direction (rows = a_i * u + small
    orthogonal noise), TWO rounds already align with u (|cos| > 0.99) —
    the convergence claim the registry row cannot make on near-isotropic
    testdata embeddings (spectral gap ~1.07 there)."""
    dim = 8
    u = [1.0, -0.5, 0.25, 0.75, -1.0, 0.5, -0.25, 0.1]
    rows = []
    for i in range(40):
        a = 1.0 + (i % 5)  # strong signal along u
        noise = [((i * 7 + j * 13) % 11 - 5) * 0.01 for j in range(dim)]
        rows.append((i, [a * u[j] + noise[j] for j in range(dim)]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    comp = {
        r["pos"]: r["component"]
        for r in power_iterate_top_direction(df, dim=dim, rounds=2).collect()
    }
    v = [comp[p] for p in range(1, dim + 1)]
    dot = sum(v[j] * u[j] for j in range(dim))
    cos = abs(dot) / (
        math.sqrt(sum(x * x for x in v)) * math.sqrt(sum(x * x for x in u))
    )
    assert cos > 0.99, cos


def test_mining_batch_plans_lint_clean(spark):
    """Every mining-batch plan stays free of scale-killers (no cartesian
    product, no row-at-a-time Python UDF, no stray global sort) — the same
    gate the bench headliners carry."""
    from seccosql_spark.plans.linter import lint_plan

    sess = session_for(spark, SF_DIR)
    names = [
        "markov_transitions",
        "attribution_last_touch",
        "rfm_segments",
        "profile_columns",
        "entity_resolution_blocked",
        "basket_part_pairs",
        "events_anomaly_mad",
        "snapshot_diff_orders",
        "quality_gate_audit",
        "embedding_pca_power2",
        "ivm_q1_merge",
        "pareto_abc_parts",
        "orders_interarrival",
        "events_seasonal_backtest",
        "text_novelty_curve",
        "orders_cohort_ltv",
        "pit_status_lookup",
        "source_data_card",
        "g_closeness_centrality",
        "sample_balanced_classes",
    ]
    # sample_balanced_classes broadcasts a ONE-ROW scalar (the min class
    # size) with no join key — a bounded-by-construction BNLJ the linter
    # correctly surfaces as warn-for-review, same as the kNN probe.
    allowed_warns = {("sample_balanced_classes", "broadcast-nested-loop")}
    for n in names:
        out = REGISTRY[n].build(sess)
        df = out.df if hasattr(out, "df") else out
        bad = [
            f
            for f in lint_plan(df)
            if f.severity == "error"
            or (f.severity == "warn" and (n, f.rule) not in allowed_warns)
        ]
        assert not bad, (n, bad)


def test_quality_gate_audit_clean_on_testdata(spark):
    """The generated testdata satisfies every declared constraint — all six
    gates report zero violations (a nonzero here means either the data drop
    or a gate regressed)."""
    sess = session_for(spark, SF_DIR)
    out = REGISTRY["quality_gate_audit"].build(sess)
    df = out.df if hasattr(out, "df") else out
    rows = {r["check_name"]: r["n_violations"] for r in df.collect()}
    assert len(rows) == 6
    assert all(n == 0 for n in rows.values()), rows


def test_ivm_merge_handles_empty_delta(spark):
    """Algebraic merge must be a no-op when the delta is empty: merging
    base partials with zero delta rows equals the base aggregate (the
    union-then-reaggregate path must not drop or null groups)."""
    sess = session_for(spark, SF_DIR)
    l = sess.spark.table("lineitem")

    def partial(df):
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("p_qty"),
            F.count("*").alias("p_n"),
        )

    base = partial(l)
    empty_delta = partial(l.where(F.lit(False)))
    merged = (
        base.unionAll(empty_delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("p_qty").alias("q"), F.sum("p_n").alias("n"))
    )
    direct = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        F.count("*").alias("n"),
    )
    m = {(r[0], r[1]): (r[2], r[3]) for r in merged.collect()}
    d = {(r[0], r[1]): (r[2], r[3]) for r in direct.collect()}
    assert m == d


def test_closeness_sampled_sources_match_exact(spark):
    """source_fraction filters ONLY the seed frontier: per-source BFS is
    still exact, so the sampled run's rows must EQUAL the exact run's rows
    for exactly the hash-picked source subset — the callable form of the
    docstring's 100x-scale estimator (VERDICT r08 task 5)."""
    from seccosql_spark.queries.mining import g_closeness_centrality

    sess = session_for(spark, SF_DIR)

    def rows(frac):
        out = g_closeness_centrality(sess, source_fraction=frac)
        df = out.df if hasattr(out, "df") else out
        return {r["id"]: (r["n_reached"], r["sum_dist"], r["closeness"])
                for r in df.collect()}

    exact, sampled = rows(1.0), rows(0.3)
    assert 0 < len(sampled) < len(exact)
    # the sampled ids are exactly the deterministic hash pick
    picked = {
        r["id"]
        for r in spark.createDataFrame(
            [(i,) for i in exact], "id: long"
        ).where(F.pmod(F.xxhash64("id"), F.lit(10000)) < 3000).collect()
    }
    assert set(sampled) == picked
    assert all(sampled[i] == exact[i] for i in sampled)


def test_closeness_raises_on_round_budget_exhaustion(spark):
    """A path graph longer than max_rounds must RAISE, not silently drop
    beyond-horizon distances (ADVICE r08: the other iterative kernels all
    fail loudly on budget exhaustion)."""
    import pytest

    from seccosql_spark.queries.mining import g_closeness_centrality

    sess = session_for(spark, SF_DIR)
    with pytest.raises(RuntimeError, match="still expanding"):
        g_closeness_centrality(sess, max_rounds=2)


def test_betweenness_sampled_matches_pure_python_brandes(spark):
    """Third-implementation pin: the distributed two-phase Brandes (Spark)
    and the unrolled walk-count oracle (DuckDB) could in principle share a
    wrong assumption — check the query against a textbook single-source
    Brandes in pure Python (exact floats, no rounding discipline) on the
    same sampled sources. Tolerance 1e-5 absorbs the 9-decimal per-level
    rounding the engines apply for cross-engine exactness."""
    import hashlib
    from collections import defaultdict, deque

    from seccosql_spark.queries.graph import EDGES_SPARSE
    from seccosql_spark.queries.mining import g_betweenness_sampled

    sess = session_for(spark, SF_DIR)
    got = {
        r["id"]: r["bc"]
        for r in g_betweenness_sampled(sess).df.collect()
    }

    adj = defaultdict(set)
    for s, d in spark.sql(EDGES_SPARSE).collect():
        adj[s].add(d)
        adj[d].add(s)
    seeds = [
        v for v in adj
        if hashlib.md5(str(v).encode()).hexdigest()[0] in "0123"
    ]
    bc = defaultdict(float)
    for s in seeds:  # Brandes 2001, single-source exact
        dist, sig, order = {s: 0}, defaultdict(int), []
        sig[s] = 1
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sig[w] += sig[v]
        delta = defaultdict(float)
        for v in reversed(order):
            for w in adj[v]:
                if dist.get(w) == dist[v] + 1:
                    delta[v] += sig[v] / sig[w] * (1 + delta[w])
            if v != s:
                bc[v] += delta[v]
    assert set(got) == set(adj)
    for v in adj:
        assert abs(got[v] - bc.get(v, 0.0)) < 1e-5, (v, got[v], bc.get(v))
    assert len(seeds) > 0 and any(b > 0 for b in got.values())
