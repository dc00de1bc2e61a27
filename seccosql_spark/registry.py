"""Query registry: every operator claimed in SURVEY.md §2 as a named query
with a DuckDB-oracle SQL twin.

This is the engine's correctness surface: the driver runs each Spark query
and its oracle side-by-side at sf=0.01 and hash-matches row values
(order-insensitive, columns sorted by name). Conventions that keep the two
engines bit-identical:

- **Never sum raw doubles.** Per-row products/values are cast to DECIMAL
  first (identical in both engines since the per-row doubles are identical),
  summed exactly, and cast back to DOUBLE. Averages are decimal-sum / count.
- **Alias every computed column identically** in Spark and oracle SQL.
- **Timestamps**: the driver's parquet stores TIMESTAMP(MICROS); Spark reads
  them as TIMESTAMP_NTZ, DuckDB as (naive) TIMESTAMP. Outputs use
  ``date_format``/``strftime`` strings, filters use literals on each side's
  native type, and epoch arithmetic goes through
  ``operators.timeutil.epoch_us`` (tz-free, tolerant of a nanos-encoded
  generation too) mirrored by DuckDB ``epoch_us(ts)``.
- **LIMIT queries** always carry a total order (unique tiebreaker column) so
  the selected SET is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from seccosql_spark.registration import REGISTRY, QuerySpec, register  # noqa: F401
from seccosql_spark.session import TESTDATA_TABLES, SeccoSession


# SparkSession id -> (SeccoSession, sf_dir its views currently point at).
# Temp views are global per table NAME on a SparkSession, so the cache must
# re-register whenever the requested sf_dir differs from the registered one —
# caching per (spark, sf_dir) independently would serve stale views.
_SESSION_CACHE: dict[int, tuple[SeccoSession, str]] = {}


def session_for(spark: SparkSession, sf_dir: str) -> SeccoSession:
    """SeccoSession over the driver's SparkSession with all testdata views
    registered. View registration reads every parquet footer, so it is
    cached and repeated only when the sf_dir changes."""
    cached = _SESSION_CACHE.get(id(spark))
    if cached is not None and cached[0].spark is spark and cached[1] == sf_dir:
        return cached[0]
    sess = SeccoSession(spark)
    sess.load_dir(sf_dir, TESTDATA_TABLES)
    _SESSION_CACHE[id(spark)] = (sess, sf_dir)
    return sess


def run(name: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = REGISTRY[name]
    out = spec.build(session_for(spark, sf_dir))
    return out.df if hasattr(out, "df") else out


# Import side-effect modules that populate REGISTRY.
from seccosql_spark.queries import relational  # noqa: E402,F401
from seccosql_spark.queries import graph  # noqa: E402,F401
from seccosql_spark.queries import pipeline  # noqa: E402,F401
from seccosql_spark.queries import tpch_shapes  # noqa: E402,F401
from seccosql_spark.queries import tpch_rest  # noqa: E402,F401
from seccosql_spark.queries import timeseries  # noqa: E402,F401
from seccosql_spark.queries import sampling_q  # noqa: E402,F401
from seccosql_spark.queries import text_stats  # noqa: E402,F401
from seccosql_spark.queries import udf  # noqa: E402,F401
from seccosql_spark.queries import graph_analytics  # noqa: E402,F401
from seccosql_spark.queries import curation  # noqa: E402,F401
from seccosql_spark.queries import window_analytics  # noqa: E402,F401
from seccosql_spark.queries import streaming_q  # noqa: E402,F401
from seccosql_spark.queries import workload  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Registry iteration order IS the driver's verification order; the driver
# checks the first 50 entries. Round-5 window: (a) ALL 18 queries that have
# never had a driver row — the 6 streaming ops graduating from pytest-only
# (`streaming/ops.py`), `multiway_stats_equality`, `approx_quantiles_sketch`,
# and this round's new operators (`decontaminate_bloom`, `ann_ivf_kmeans`,
# `timeseries_gapfill_hourly`, `g_c1_pentagon_agg`, `g_c2_pentagon_agg`, `g_c3_pentagon_wsum`,
# `g_c4_pentagon_wsum`, `g_scc`, `text_chunk_windows`, `intersect_all_bag`);
# (b) 32 of the 47 queries whose latest sf0.01 driver row predates r03
# (VERDICT r04 task 1) — the TPC-H heads (q1/q3/q5/q7/q10/q12/q14/q18/q19),
# the relational-operator family, the window family, source_quantiles,
# events_json_extract, and the UDF/UDAF pair. Never-verified
# queries outrank stale-but-green ones, so the 15 stale entries bumped to
# r06 are lowest-risk r01/r02-green rows on files verified unchanged since
# (filter_predicate, project_compute, distinct_pairs, sort_limit_topk,
# cross_join_pairs,
# union_all_counts,
# union_distinct, intersect_keys,
# except_distinct, except_all_bag, scalar_datetime, scalar_string_funcs,
# rollup_agg, cube_agg, g_path2_pairs) — all re-proven by the FULL registry sf0.01 pytest
# gate this session.
# ---------------------------------------------------------------------------
_PRIORITY_WINDOW = [
    # -- never driver-verified: streaming ops graduating from pytest-only,
    #    plus every query added after the r04 verdict
    "stream_stream_join",
    "stream_dedup",
    "foreach_batch_upsert",
    "stream_static_enrich",
    "stream_upsert_state",
    "stream_left_outer_join",
    "multiway_stats_equality",
    "approx_quantiles_sketch",
    "decontaminate_bloom",
    "ann_ivf_kmeans",
    "timeseries_gapfill_hourly",
    "g_c1_pentagon_agg",
    "g_c2_pentagon_agg",
    "text_chunk_windows",
    "g_c3_pentagon_wsum",
    "g_c4_pentagon_wsum",
    "g_scc",
    "intersect_all_bag",
    # -- TPC-H heads (latest rows r01/r02; relational.py/tpch_shapes.py
    #    diffs since were verified additive-only in VERDICT r04)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_join_chain",
    "q7_nation_volume",
    "q10_returned_items",
    "q12_priority_buckets",
    "q14_promo_share",
    "q18_large_orders",
    "q19_disjunctive_join",
    # -- relational operator family (r01 rows)
    "aggregate_global",
    "aggregate_group_having",
    "join_inner_groupby",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "natural_join_count",
    "theta_join",
    "union_by_update",
    # -- subquery + scalar family (r01 rows)
    "exists_subquery",
    "in_subquery",
    "scalar_subquery",
    "scalar_case_null",
    # -- grouping-extension + pivot family (r01/r02 rows)
    "pivot_status",
    # -- window-function family (r01/r02 rows)
    "window_running_sum",
    "window_lag_delta",
    "window_topk_per_user",
    # -- remaining r02-stale singles
    "source_quantiles",
    "events_json_extract",
    "udaf_median_price",
    "udf_rowwise_registered",
]


def _apply_priority_window() -> None:
    window = set(_PRIORITY_WINDOW)
    missing = [n for n in _PRIORITY_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"priority window references unknown queries: {missing}")
    if not (len(_PRIORITY_WINDOW) == len(window) == 50):
        raise RuntimeError(
            f"priority window must be exactly 50 unique names, got "
            f"{len(_PRIORITY_WINDOW)} ({len(window)} unique)"
        )
    tail = [n for n in REGISTRY if n not in window]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY_WINDOW, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_priority_window()
