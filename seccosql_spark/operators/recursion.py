"""Bounded recursion / iteration as a driver-side loop over DataFrames.

Reference parity: ``Iterative(child, returnTable, numRun)`` / ``Recursion
(child, round)`` (``plan/unaryOperators.scala:298-324``,
``graphOperators.scala:189-195``) and the ``WITH RECURSIVE(n)`` SQL form
(``parsing/SQLParser.scala:360-374``); default round budget 20
(``reference.conf:37``). The reference never planned these physically
(``SeccoStrategies.scala:471-488`` commented out); here they run.

Spark has no recursive-CTE primitive (<4.0), so the loop lives on the driver,
but every *round* is a distributed DataFrame plan. Scale discipline
(SURVEY.md §7 "What's hard" #3):

- semi-naive evaluation — each round joins only the last DELTA, not the
  accumulated result, so per-round work is proportional to new rows;
- ``localCheckpoint`` each round truncates lineage (otherwise the plan tree
  and task-serialization cost grow linearly with rounds);
- convergence = empty delta, detected by the same action that materializes
  the checkpoint (no extra job).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

DEFAULT_MAX_ROUNDS = 20  # reference.conf:37 secco.recursion.numRun


def _materialize(df: DataFrame) -> DataFrame:
    """Cut lineage between rounds. localCheckpoint is preferred (truncates
    the plan); some plan shapes hit a Spark AttributeMap bug inside
    checkpointing (NoSuchElementException on an attribute id) — fall back to
    persist+count, which materializes without rewriting the plan."""
    try:
        return df.localCheckpoint(eager=True)
    except Exception:
        df = df.persist()
        df.count()
        return df


def bounded_fixpoint(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_rounds: int = DEFAULT_MAX_ROUNDS,
    distinct: bool = True,
    strict: bool = False,
) -> DataFrame:
    """Semi-naive bounded fixpoint: result := base; repeat up to `max_rounds`:
    delta := step(delta) minus result (when `distinct`); result ∪= delta;
    stop on empty delta. Returns the accumulated result.

    With ``strict=True`` a non-empty delta after `max_rounds` raises instead
    of silently returning the truncated result — callers whose semantics are
    "the exact fixpoint" (transitive closures, exact reachability) should
    pass it; ``WITH RECURSIVE(n)`` keeps the default because a bounded round
    budget IS its semantics (reference.conf:37)."""
    acc = _materialize(base.distinct() if distinct else base)
    delta = acc
    converged = False
    for _ in range(max_rounds):
        new = step(delta)
        if distinct:
            new = new.distinct().exceptAll(acc)
        new = _materialize(new)
        if new.isEmpty():
            converged = True
            break
        acc = _materialize(acc.unionByName(new))
        delta = new
    if strict and not converged and not _materialize(
        step(delta).distinct().exceptAll(acc) if distinct else step(delta)
    ).isEmpty():
        raise RuntimeError(
            f"bounded_fixpoint did not converge within max_rounds={max_rounds}; "
            "the result would be a truncated fixpoint (raise max_rounds or drop strict)"
        )
    return acc


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    rounds: int,
) -> DataFrame:
    """Fixed-round iteration (``Iterative``): state := step(state), `rounds`
    times — the substrate for message-passing / PageRank-style loops."""
    out = _materialize(state)
    for _ in range(rounds):
        out = _materialize(step(out))
    return out
