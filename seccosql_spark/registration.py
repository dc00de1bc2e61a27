"""Registry core: the QuerySpec dataclass, the shared REGISTRY dict, and the
``register`` decorator. Query modules import from HERE (not from
``seccosql_spark.registry``) so that importing a query module directly never
triggers the registry's populate-and-order step mid-import (a circular
import would otherwise run the priority-window validation before all query
modules finished registering)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from seccosql_spark.session import SeccoSession


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
