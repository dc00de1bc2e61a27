"""Registry core: the QuerySpec dataclass, the shared REGISTRY dict, and the
``register`` decorator. Query modules import from HERE (not from
``seccosql_spark.registry``) so that importing a query module directly never
triggers the registry's populate-and-order step mid-import (a circular
import would otherwise run the priority-window validation before all query
modules finished registering)."""

from __future__ import annotations

import functools
import os
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
        # Lint-on-build (VERDICT r11 task 4): gate-at-pytest-time proved
        # too late when a round's final commit skips the suite — under
        # SECCO_LINT_ON_BUILD=1 (set by scripts/verify_queries.py, the
        # tool every new row runs through first) the physical plan is
        # linted against the package allowlist on first build in the
        # process, raising PlanQualityError on unallowlisted hazards.
        @functools.wraps(fn)
        def build(sess: SeccoSession) -> DataFrame:
            out = fn(sess)
            if os.environ.get("SECCO_LINT_ON_BUILD") and name not in _LINTED:
                from seccosql_spark.plans.allowlist import enforce_clean

                # mark linted only AFTER a clean pass: if the first build
                # raises PlanQualityError and the caller catches and
                # rebuilds in-process, the retry must be gated too
                # (ADVICE r12)
                enforce_clean(name, out)
                _LINTED.add(name)
            return out

        REGISTRY[name] = QuerySpec(name, build, oracle, headline)
        return fn

    return deco


_LINTED: set[str] = set()  # lint once per (process, query) — plans are static
