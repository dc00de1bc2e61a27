"""Declared plan-shape deviations + the enforcement hook (VERDICT r11
task 4): the allowlist used to live only in tests/test_plan_quality_all.py,
which meant a registry row landing in a commit that skipped pytest (the r11
`orders_acf_lags` slip) shipped an ungated plan. It now lives in the package
so BOTH the test suite and the dev-mode lint-on-build hook
(`registration.register` under ``SECCO_LINT_ON_BUILD=1``, which
scripts/verify_queries.py sets by default) read the same single source.

Every entry must name the bound that makes the hazard safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import types as T

from seccosql_spark.plans.linter import lint_plan

# (query, rule) -> why the finding is intentional (warn OR error).
ALLOWED = {
    # 1-row scalar (min class size) broadcast with no key: bounded by
    # construction, same shape as the kNN probe
    ("sample_balanced_classes", "broadcast-nested-loop"): "1-row scalar join",
    # deliberately-exact tier: the probe set is broadcast against the
    # corpus; documented as the brute-force baseline vs the ANN paths
    ("knn_cosine_bruteforce", "broadcast-nested-loop"): "exact-tier probe",
    # same exact-tier shape twice (full-dim truth + prefix-dim ranking):
    # the 10-query probe set is broadcast against the corpus by
    # construction; the row MEASURES the prefix tier's recall
    ("ann_matryoshka_prefix", "broadcast-nested-loop"): "exact-tier probe x2",
    # reference CartesianProduct parity demo on two tiny dims (region x
    # nation, 5 x 25 rows) — the operator exists BECAUSE the reference has
    # it; linter still blocks it everywhere else
    ("cross_join_pairs", "broadcast-nested-loop"): "5x25 dim parity demo",
    # reference FunctionRegistry row-UDF parity, pinned to the 5-row
    # region dim; the linter's python-row-udf error is the rule that keeps
    # this OFF every hot path
    ("udf_rowwise_registered", "python-row-udf"): "5-row dim parity demo",
    # two inequality joins: BNLJ is the correct physical shape for a theta
    # chain; the existing w-series test pins exactly 2 BroadcastNLJs and
    # zero CartesianProducts
    ("w6_theta_chain", "broadcast-nested-loop"): "theta joins, pinned =2 BNLJ",
    # 1-row total-users scalar folded into the support threshold
    ("g_bipartite_covisit", "broadcast-nested-loop"): "1-row scalar join",
    # 1-row corpus stats (N, avgdl) scalar
    ("text_bm25_topk", "broadcast-nested-loop"): "1-row scalar join",
    # 1-row vocabulary-total scalar
    ("text_unigram_logprob", "broadcast-nested-loop"): "1-row scalar join",
    # 1-row vocabulary-size scalar (|V| in the Laplace denominator)
    ("text_bigram_logprob", "broadcast-nested-loop"): "1-row scalar join",
    # per-FK-edge 1-row total x 1-row orphan-count scalars (7 edges)
    ("fk_orphan_audit", "broadcast-nested-loop"): "1-row scalar joins",
    # 1-row point estimate x 1-row CI-bound scalars
    ("sample_bootstrap_ci", "broadcast-nested-loop"): "1-row scalar joins",
    # dense spine = sequence over a 2-value global agg; both fill-join
    # sides are keys x buckets bounded (operators/asof.resample_gapfill)
    ("timeseries_gapfill_hourly", "broadcast-nested-loop"): "2-value spine agg",
    # in-query production-bar verdict: 1-row aggregates + the 20-query
    # probe set, all bounded by construction
    ("ann_lsh_clustered", "broadcast-nested-loop"): "verdict scalars + 20-row probe",
    # weighted-rank selection + exact audit both join against the sketch
    # summary / 3-row estimates — state bounded at B*T rows by design
    ("sketch_quantile_mergeable", "broadcast-nested-loop"): "<=8k-row sketch state",
    # the merge window orders the BOUNDED summary, never the data
    ("sketch_quantile_mergeable", "global-sort"): "<=8k-row sketch state",
    # 1-row (t6, n_total) scalar folded into the quota comparison
    ("sample_temperature_mix", "broadcast-nested-loop"): "1-row scalar join",
    # routing-verdict row: crossJoin of two 1-row aggregates (binding
    # count x edge count) — bounded by construction
    ("g_skew_hub_auto_wcoj", "broadcast-nested-loop"): "1-row verdict scalars",
    # probe batch x centroids / x codebooks: 3 x 4 and 3 x 16 broadcast
    # cross joins — the routing/ADC-table construction, bounded by the
    # (tiny by definition) probe batch and index metadata
    ("ann_index_persisted", "broadcast-nested-loop"): "probe x index metadata",
    # 1-row merged-sketch estimate x 1-row exact-audit scalars
    ("sketch_kmv_setops", "broadcast-nested-loop"): "1-row scalar join",
    # 8-row per-shard report x 1-row (n, mh, mm) totals scalar
    ("shard_rendezvous_stability", "broadcast-nested-loop"): "1-row scalar join",
    # 1-row mean/denominator scalars + the 4-row lag table crossJoin —
    # every broadcast side bounded by construction (lags k in 1..4)
    ("orders_acf_lags", "broadcast-nested-loop"): "1-row scalars + 4-row lag table",
}


class PlanQualityError(RuntimeError):
    """An unallowlisted scale hazard (or driver-uncanonicalizable schema)
    in a registry query's physical plan."""


def enforce_clean(name: str, df) -> None:
    """Raise PlanQualityError unless `df`'s physical plan is free of
    unallowlisted error/warn lint findings AND its output schema is
    driver-canonicalizable (atomic types only — the driver sorts result
    cells with pandas, which raises on list/dict cells)."""
    sdf = df if isinstance(df, SparkDataFrame) else df.df
    bad = [
        f
        for f in lint_plan(sdf)
        if f.severity in ("error", "warn") and (name, f.rule) not in ALLOWED
    ]
    if bad:
        raise PlanQualityError(
            f"{name}: unallowlisted plan hazard(s) {[(f.rule, f.evidence) for f in bad]} "
            "— fix the plan, or declare the bound in "
            "seccosql_spark/plans/allowlist.py"
        )
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if complex_cols:
        raise PlanQualityError(
            f"{name} emits complex-typed columns {complex_cols}; the driver "
            "canonicalizer cannot sort them — join to a string (concat_ws) "
            "or explode to rows (see inverted_index_postings, r08->r09)"
        )
