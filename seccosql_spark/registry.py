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

# ---------------------------------------------------------------------------
# Registry iteration order IS the driver's verification order; the driver
# checks the first 50 entries. Round-3 window: all 33 queries with NO green
# driver row yet (round-3 additions), the 2 queries rewritten for the
# TIMESTAMP(MICROS) data generation, and the 15 riskiest changed code paths
# (minhash hash family, shared dedup helpers, WCOJ typed+vectorized cells,
# statement-scoped CTE bindings, pattern compiler, GHD fractional ranking,
# PageRank constants, PK-FK broadcast policy). Queries after position 50
# carry green r01/r02 rows on code unchanged since those runs.
# ---------------------------------------------------------------------------
_PRIORITY_WINDOW = [
    # -- never driver-verified: round-3 TPC-H suite completion
    "q2_min_acctbal_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q20_potential_promotion",
    "q21_sole_blame_supplier",
    "q22_sales_opportunity",
    # -- never driver-verified: corpus-curation + pipeline additions
    "dedup_cluster_canonical",
    "pack_token_shards",
    "corpus_clean_pass",
    "decontaminate_ngram8",
    "text_repetition_stats",
    "text_redact_pii",
    "embedding_quantize_int8",
    "approx_distinct_users",
    # -- never driver-verified: graph analytics + planner additions
    "g_kcore",
    "g_sssp_weighted",
    "g_label_propagation",
    "g_clustering_coeff",
    "g_common_neighbors",
    "g_self_loop_pattern",
    "g_ring5_chords",
    "multiway_stats_ordered",
    # -- never driver-verified: window-analytics breadth
    "window_ntile_quartiles",
    "window_rank_family",
    "window_first_last_frames",
    "grouping_sets_id",
    # -- changed this round: events.ts switched to TIMESTAMP(MICROS);
    #    epoch arithmetic rewritten (timeutil.epoch_us)
    "sessionize_events",
    "range_join_next_hour",
    # -- changed this round: re-verify the riskiest rewritten paths
    "dedup_minhash_lsh",
    "dedup_minhash_words",
    "dedup_ngram_jaccard",
    "dedup_exact",
    "knn_cosine_bruteforce",
    "g_triangle_wcoj",
    "with_recursive_reach",
    "with_recursive_path_counts",
    "cte_multi",
    "g_triangle_count",
    "g_house_count",
    "g_pagerank_3rounds",
    "g_connected_components",
    "pkfk_star_planned",
    "multiway_natural_ghd",
    # untouched families (green r01/r02 rows stand): q1/q3/q5/q7/q10/q12/
    # q14/q18/q19, text_*, asof, sample_*, udf/udaf, multimodal, g_degrees,
    # g_message_*, g_subgraph_filter, g_path2_pairs, g_bfs_distances,
    # pattern variants (diamond/clique4/tailed/undirected/labeled/weighted),
    # dedup_simhash, dedup_embedding_cosine, ann_ivf_label, update_rows,
    # match_sql_tableref, embedding_centroids — rotated out for the 33
    # never-verified entries above.
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
