"""Plan linter: the 100 TB review checklist as code.

`lint_plan(df)` inspects a DataFrame's PHYSICAL plan (formatted explain
text — the same evidence a human reviewer reads) and reports scale
hazards before a query ever runs on real data:

- **cartesian-product** (error): a `CartesianProduct` node — a non-broadcast
  all-pairs join whose cost is |L|x|R| rows of shuffle+compute. At 100 TB
  this never finishes; rewrite with a join key, a bucketed range join, or
  broadcast the provably-small side.
- **python-row-udf** (error): `BatchEvalPython` — a row-at-a-time Python
  UDF in the plan. Every row round-trips through pickle; Arrow-batched
  evaluation (`ArrowEvalPython` / `mapInPandas`, reported separately as
  info) is 10-100x faster and built-ins beat both.
- **global-sort** (warn): a global `Sort` that is not the partial sort
  under `TakeOrderedAndProject` and not partition-local. A total order of
  the full dataset is a range-exchange of every row; usually a window with
  PARTITION BY, a top-k, or sortWithinPartitions is meant.
- **broadcast-nested-loop** (warn): `BroadcastNestedLoopJoin` — fine when
  one side is deliberately tiny (the broadcast kNN probe, a spine), fatal
  if the "small" side grows with the data. Flagged for review, not as an
  error, because the engine's own operators use it intentionally.
- **arrow-python** (info): `ArrowEvalPython` / `FlatMapGroupsInPandas` /
  `MapInPandas` — Python on the hot path, batched. Expected for custom
  kernels (multimodal decode, WCOJ cells); listed so a reviewer sees every
  Python boundary at a glance.
- **exchange-count** (info): number of distinct Exchange nodes — the
  shuffle budget of the plan.

This is a lint, not a proof: it reads operator names from the plan text,
so it can only see hazards Catalyst has already decided on (after AQE
re-planning the runtime plan may differ). Rules err toward few false
positives — every `error` finding is something that should essentially
never ship to a large cluster.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Finding:
    rule: str
    severity: str  # "error" | "warn" | "info"
    evidence: str


def _formatted(df) -> str:
    # NOT getattr(df, "df", df): Spark DataFrame attribute access resolves
    # column names, so a frame with a column literally called "df" (e.g. an
    # inverted index's document-frequency) would hand us a Column here
    from pyspark.sql import DataFrame as _SparkDF

    sdf = df if isinstance(df, _SparkDF) else df.df
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sdf.explain("formatted")
    return buf.getvalue()


def lint_plan(df) -> list[Finding]:
    """Lint a (Secco)DataFrame's physical plan. Returns findings ordered
    errors first. An empty list means no rule fired (the plan still
    deserves a human read before a 100 TB run)."""
    text = _formatted(df)
    tree = text.split("\n\n")[0]  # numbered tree section; details repeat names
    findings: list[Finding] = []

    def node_ids(op: str) -> list[str]:
        return re.findall(rf"\((\d+)\)\s+{op}\b", text)

    for nid in node_ids("CartesianProduct"):
        findings.append(
            Finding(
                "cartesian-product",
                "error",
                f"CartesianProduct at node ({nid}): |L|x|R| rows — add a join "
                "key, bucket the range, or broadcast a provably-small side",
            )
        )
    for nid in node_ids("BatchEvalPython"):
        findings.append(
            Finding(
                "python-row-udf",
                "error",
                f"BatchEvalPython at node ({nid}): row-at-a-time Python UDF — "
                "use built-in functions or an Arrow-batched pandas UDF",
            )
        )
    # global sorts: Sort detail lines carry a `true` global flag; the partial
    # sorts TakeOrderedAndProject plans don't appear as Sort nodes at all
    for m in re.finditer(r"\((\d+)\) Sort\b", text):
        nid = m.group(1)
        detail = re.search(
            rf"^\({nid}\) Sort\b.*?\nArguments: \[(.*?)\], (\w+),",
            text, re.M | re.S,
        )
        if detail and detail.group(2) == "true":
            findings.append(
                Finding(
                    "global-sort",
                    "warn",
                    f"global Sort at node ({nid}) on [{detail.group(1)[:80]}]: "
                    "full-data range exchange — top-k, window, or "
                    "sortWithinPartitions is usually what's meant",
                )
            )
    for nid in node_ids("BroadcastNestedLoopJoin"):
        findings.append(
            Finding(
                "broadcast-nested-loop",
                "warn",
                f"BroadcastNestedLoopJoin at node ({nid}): fine iff the "
                "broadcast side is bounded by construction; fatal if it "
                "grows with the data",
            )
        )
    arrow_ops = (
        node_ids("ArrowEvalPython")
        + node_ids("FlatMapGroupsInPandas")
        + node_ids("MapInPandas")
    )
    if arrow_ops:
        findings.append(
            Finding(
                "arrow-python",
                "info",
                f"{len(arrow_ops)} Arrow-batched Python stage(s) at node(s) "
                f"{', '.join('(' + n + ')' for n in arrow_ops)}",
            )
        )
    n_exchange = len(re.findall(r"\(\d+\)\s+Exchange\b", text))
    findings.append(
        Finding("exchange-count", "info", f"{n_exchange} Exchange node(s) in the plan")
    )
    order = {"error": 0, "warn": 1, "info": 2}
    findings.sort(key=lambda f: (order[f.severity], f.rule))
    return findings


def assert_scale_clean(df, allow: set[str] = frozenset()) -> None:
    """Raise if the plan carries any `error` finding not in `allow` —
    the CI form of the lint (see tests/test_plan_quality.py)."""
    bad = [f for f in lint_plan(df) if f.severity == "error" and f.rule not in allow]
    if bad:
        raise AssertionError(
            "plan has scale hazards:\n" + "\n".join(f"- {f.rule}: {f.evidence}" for f in bad)
        )
