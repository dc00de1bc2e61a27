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
- **Timestamps**: the driver's parquet stores TIMESTAMP(NANOS); Spark reads
  them as TIMESTAMP_NTZ (with ``spark.sql.legacy.parquet.nanosAsLong``),
  DuckDB as TIMESTAMP. Outputs use ``date_format``/``strftime`` strings, and
  filters use literals on each side's native type.
- **LIMIT queries** always carry a total order (unique tiebreaker column) so
  the selected SET is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from seccosql_spark.session import TESTDATA_TABLES, SeccoSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SeccoSession], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    headline: bool = False  # included in bench.py


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, headline: bool = False):
    def deco(fn: Callable[[SeccoSession], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, headline)
        return fn

    return deco


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
from seccosql_spark.queries import timeseries  # noqa: E402,F401
from seccosql_spark.queries import sampling_q  # noqa: E402,F401
from seccosql_spark.queries import text_stats  # noqa: E402,F401
from seccosql_spark.queries import udf  # noqa: E402,F401
