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

# ---------------------------------------------------------------------------
# Registry iteration order IS the driver's verification order; the driver
# checks the first 50 entries. Round-4 window: (a) the 2 brand-new queries
# plus approx_distinct_users whose oracle is new this round; (b) every query
# whose implementing code was rewritten in round 4 (dedup.py candidate
# generation + verify arm, adaptive WCOJ LeapFrog, algorithms.py guards,
# pkfk/stats planners); (c) the r01/r02-stale rotated-out queries whose
# implementing files changed in round 3 (pipeline.py/similarity.py/
# graphframe.py/pattern compiler/preprocessor families) — the VERDICT r03
# "driver-window staleness" list. Headline bench queries with green r03
# rows on untouched code (dedup_exact, knn_cosine_bruteforce, q1/q3/q5/q7,
# g_triangle_count) stay out of the budget; TPC-H/window/recursion families
# keep their green r03 rows on code unchanged since.
# ---------------------------------------------------------------------------
_PRIORITY_WINDOW = [
    # -- new this round (no driver row yet / new oracle)
    "g_ring5_chords_b",
    "multiway_stats_filtered",
    "ann_lsh_hyperplane",
    "skew_salted_join",
    "stream_window_counts",
    "stream_session_windows",
    "approx_distinct_users",
    # -- rewritten this round: dedup candidate generation + verify arm
    "dedup_minhash_lsh",
    "dedup_minhash_words",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_cluster_canonical",
    "corpus_clean_pass",
    "decontaminate_ngram8",
    # -- rewritten this round: adaptive LeapFrog, planner guards, stats tier
    "g_triangle_wcoj",
    "g_kcore",
    "g_label_propagation",
    "g_connected_components",
    "pkfk_star_planned",
    "multiway_stats_ordered",
    # -- r02-stale, implementing files changed in r03 (pipeline/similarity)
    "dedup_embedding_cosine",
    "ann_ivf_label",
    "embedding_centroids",
    "asof_latest_purchase",
    "match_sql_tableref",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    # (events_json_extract yielded its slot: Spark-native JSON path on an
    # untouched file, green r02 row)
    # -- r02-stale text/sampling families (files changed in r03)
    "text_token_stats",
    "text_quality_score",
    "text_lang_guess",
    "text_fingerprint",
    "text_bpe_tokens",
    "text_vocab_top20",
    "text_tfidf_top3",
    "text_length_histogram",
    # (source_quantiles yielded its slot to stream_session_windows; its
    # three text_stats.py siblings above keep that file covered)
    "sample_hash_10pct",
    "sample_stratified_3per_lang",
    "update_rows",
    # -- r01/r02-stale graph/pattern families (graphframe/pattern compiler
    #    changed in r03: self-loop fix, typed pattern cells)
    "g_diamond_count",
    "g_clique4_count",
    "g_tailed_triangle_count",
    "g_triangle_undirected",
    "g_labeled_pattern",
    "g_pattern_weighted_agg",
    "g_degrees",
    "g_message_passing_wsum",
    "g_message_passing_2rounds",
    "g_subgraph_filter",
    # (g_path2_pairs yielded its slot to stream_window_counts; its compiler
    # path is exercised by the six pattern entries above)
    "g_bfs_distances",
    # -- r02-stale UDF surface (udaf_median_price / udf_rowwise_registered
    #    yielded their slots to the two new queries above; udf.py unchanged
    #    since their green r02 rows)
    "udf_pandas_vector_norm",
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
