"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship TPC-H-Q1-shape query at sf0.001.
queries()    — one entry per implemented operator from SURVEY.md §2
               (populated from seccosql_spark.registry).
oracle_sql() — DuckDB twin for each query. Every registered query has one
               (len(REGISTRY) of them): iterative ops like PageRank use exact fixed-point
               arithmetic, approximate ops (HLL, LSH ANN) emit exact counts
               or engine-exact integer signatures, and the streaming drain
               is oracled by its batch equivalent — so all of them
               hash-match.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import partial

from pyspark.sql import DataFrame, SparkSession

from seccosql_spark.registry import REGISTRY, run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return run("q1_pricing_summary", spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: partial(run, name) for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
