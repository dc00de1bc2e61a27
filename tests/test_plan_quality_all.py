"""Registry-wide plan-quality gate (VERDICT r08 task 6): EVERY registered
query's physical plan is linted, not just the per-batch gated sets — a new
query cannot regress plan shape silently. Also enforces the driver-contract
schema rule the r08 red row exposed: output columns must be canonicalizable
scalars (the driver's pandas sort_values cannot order array/map/struct
cells), so complex-typed outputs fail HERE, not two rounds later in a
CORRECTNESS file.

Intentional deviations are declared in ALLOWED with a reason —
everything else must be free of errors and warns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import types as T

from seccosql_spark.plans.allowlist import ALLOWED
from seccosql_spark.plans.linter import lint_plan
from seccosql_spark.registration import REGISTRY
from seccosql_spark.registry import session_for
from tests.conftest import SF_DIR



def _build_all():
    names = sorted(REGISTRY)
    return names


@pytest.fixture(scope="module")
def sess(spark):
    return session_for(spark, SF_DIR)


@pytest.mark.parametrize("name", _build_all())
def test_registry_plan_is_scale_clean(sess, name):
    out = REGISTRY[name].build(sess)
    df = out if isinstance(out, SparkDataFrame) else out.df
    bad = [
        f
        for f in lint_plan(df)
        if f.severity in ("error", "warn") and (name, f.rule) not in ALLOWED
    ]
    assert not bad, (name, bad)
    # driver-canonicalizable output schema: atomic types only (the driver
    # sorts result cells with pandas; list/dict cells raise there)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name} emits complex-typed columns {complex_cols}; the driver "
        "canonicalizer cannot sort them — join to a string (concat_ws) or "
        "explode to rows (see inverted_index_postings, r08->r09)"
    )


def test_priority_window_covers_spillover():
    """The 50-slot driver window must lead with every never-verified and
    overdue registry row it can hold — r08 shipped 9 rows that had NEVER
    had a driver CORRECTNESS row because a late registry batch silently
    pushed them out. This turns the rotation policy into a failing test:
    add a query (or let one go 4 rounds stale) and the window must be
    regenerated (`python scripts/freshness.py --window`) before the suite
    goes green again."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "freshness",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts", "freshness.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from seccosql_spark.registry import _PRIORITY_WINDOW

    bad = mod.spillover_violations(list(_PRIORITY_WINDOW))
    assert not bad, (
        "must-rows (never-verified or >=4 rounds overdue) missing from "
        f"_PRIORITY_WINDOW: {bad} — run scripts/freshness.py --window and "
        "paste the result into registry._PRIORITY_WINDOW"
    )


def test_judge_facing_registry_counts_match_reality():
    """README and COVERAGE.md both state the registry size; r08 shipped a
    stale README count and r09 a stale COVERAGE trailer (233 vs 238). Derive
    the claim from the documents so the number can never drift again: every
    literal 'NNN queries' / '(NNN at round' registry-count claim must equal
    len(REGISTRY)."""
    import os
    import re

    from seccosql_spark.registry import REGISTRY

    root = os.path.dirname(os.path.dirname(__file__))
    n = len(REGISTRY)

    cov = open(os.path.join(root, "COVERAGE.md")).read()
    m = re.search(r"Registry: (\d+) queries, (\d+) with DuckDB oracles", cov)
    assert m, "COVERAGE.md registry trailer not found"
    assert m.group(1) == m.group(2) == str(n), (
        f"COVERAGE.md trailer says {m.group(1)}/{m.group(2)} but the registry "
        f"holds {n} — update the trailer"
    )

    readme = open(os.path.join(root, "README.md")).read()
    # both README claims: "(NNN at round R — ..." and "... values. All NNN\nhave oracles"
    counts = re.findall(r"\((\d+) at round|All (\d+)\s+have oracles", readme)
    flat = [c for pair in counts for c in pair if c]
    assert len(flat) >= 2 and all(c == str(n) for c in flat), (
        f"README.md registry counts {flat} != {n} (expected both the "
        "'(N at round' and 'All N have oracles' claims)"
    )


def test_bench_quiet_host_guard_terminates(monkeypatch):
    """The driver's per-round bench now waits for a quiet host before each
    query — that guard must (a) return immediately on a quiet host, (b)
    stop waiting when loadavg plateaus above threshold (sustained external
    load: waiting longer buys nothing), (c) keep waiting while self-load
    decays, bounded by the max-wait cap. Monkeypatched clock and pinned
    thresholds: no real sleeping, no host or env dependence."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # hermetic: the module reads SPARK_GRAFT_LOAD_* env at import — pin the
    # constants so an exported override can't change what this test asserts
    monkeypatch.setattr(bench, "LOAD_QUIET_THRESHOLD", 2.0)
    monkeypatch.setattr(bench, "LOAD_WAIT_STEP_SEC", 10.0)
    monkeypatch.setattr(bench, "LOAD_WAIT_MAX_SEC", 120.0)

    # (a) quiet host: zero wait
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.5, 0.5, 0.5))
    assert bench._wait_for_quiet_host() == 0.0

    # (b) sustained external load: plateau detected after TWO consecutive
    # non-decaying steps (one noisy slow-decay reading must not bail early
    # — ADVICE r10)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (5.0, 5.0, 5.0))
    waited = bench._wait_for_quiet_host()
    assert waited == 2 * bench.LOAD_WAIT_STEP_SEC

    # (b') one flat step then resumed decay: must NOT bail at the flat step;
    # keeps waiting until quiet
    seq_flat = iter([6.0, 5.9, 4.0, 2.5, 1.5, 1.5])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (next(seq_flat), 0, 0))
    waited = bench._wait_for_quiet_host()
    assert waited == 4 * bench.LOAD_WAIT_STEP_SEC

    # (c) decaying self-load: waits until below threshold, never past cap
    seq = iter([6.0, 4.0, 2.5, 1.5, 1.5, 1.5])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (next(seq), 0, 0))
    waited = bench._wait_for_quiet_host()
    assert 0 < waited <= bench.LOAD_WAIT_MAX_SEC


def test_freshness_taint_is_per_query(tmp_path):
    """VERDICT r10 task 4: the freshness ledger tracks dependencies at
    per-query BLOCK granularity (function + transitively-referenced
    top-level names + attribute-referenced class methods), so an edit
    inside one query's function taints that query — not the dozens of
    rows registered in the same 2000-line file. A shared oracle constant
    still taints exactly its composers."""
    import importlib.util
    import inspect
    import os

    spec = importlib.util.spec_from_file_location(
        "freshness",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts", "freshness.py"),
    )
    fr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fr)
    from seccosql_spark.registry import REGISTRY

    mining = "seccosql_spark/queries/mining.py"
    n_mining_rows = sum(
        1 for s in REGISTRY.values()
        if inspect.getfile(inspect.unwrap(s.build)).endswith("queries/mining.py")
    )
    assert n_mining_rows > 10  # the file this granularity exists for

    # an edit INSIDE one query's function body taints (essentially) it alone
    fn = REGISTRY["events_cusum_changepoint"].build
    lines, start = inspect.getsourcelines(inspect.unwrap(fn))
    tainted = fr.queries_tainted_by(mining, {start + len(lines) // 2})
    assert "events_cusum_changepoint" in tainted
    assert len(tainted) <= 2, (
        f"one-function edit tainted {sorted(tainted)} — per-query "
        "granularity regressed toward file granularity"
    )

    # an edit to a shared oracle constant taints its composers, not the file
    pipeline = "seccosql_spark/queries/pipeline.py"
    blocks, _classes = fr._module_index(pipeline, {})
    (rng, *_), _names, _attrs = blocks["MINHASH_SHINGLE_ORACLE"]
    t2 = fr.queries_tainted_by(pipeline, {rng[0]})
    assert {"dedup_minhash_lsh", "split_leakage_report",
            "dedup_cross_source_overlap"} <= t2
    assert "knn_cosine_bruteforce" not in t2
    assert "ann_index_persisted" not in t2

    # an IMPORT-line edit must taint every row whose cone touches the
    # module (rebinding a name changes behavior without touching any
    # indexed block — r11 review finding)
    (imp_rng, *_rest), _n, _a = blocks["__imports__"]
    t3 = fr.queries_tainted_by(pipeline, {imp_rng[0]})
    assert {"dedup_minhash_lsh", "knn_cosine_bruteforce",
            "ann_index_persisted"} <= t3


def _load_freshness():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "freshness",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts", "freshness.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_coverage_histogram_is_current():
    """VERDICT r11 task 3: the COVERAGE.md staleness histogram (rows by
    rounds-since-green) must match the ledger — regenerated each round so
    the 50-slot window rotation stays auditable from the judged documents.
    Red here = run `python scripts/freshness.py --write-histogram`."""
    import os

    fr = _load_freshness()
    cov = open(os.path.join(os.path.dirname(os.path.dirname(__file__)), "COVERAGE.md")).read()
    assert fr.HISTOGRAM_START in cov, "COVERAGE.md lacks the freshness histogram section"
    start = cov.index(fr.HISTOGRAM_START)
    end = cov.index(fr.HISTOGRAM_END) + len(fr.HISTOGRAM_END)
    assert cov[start:end] == fr.histogram_markdown(), (
        "COVERAGE.md freshness histogram is stale — run "
        "`python scripts/freshness.py --write-histogram`"
    )


def test_coverage_slope_section_is_current():
    """VERDICT r12 task 4: the COVERAGE.md sf1-slope table is GENERATED from
    SLOPE.json (the r11 hand-pasted table claimed 'no super-linearity' while
    SLOPE.json recorded 76x). Red here = run
    `python scripts/bench_slope.py --write-coverage`."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(__file__))
    spec = importlib.util.spec_from_file_location(
        "bench_slope", os.path.join(root, "scripts", "bench_slope.py")
    )
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)
    cov = open(os.path.join(root, "COVERAGE.md")).read()
    assert bs.SLOPE_START in cov, "COVERAGE.md lacks the sf1-slope section"
    start = cov.index(bs.SLOPE_START)
    end = cov.index(bs.SLOPE_END) + len(bs.SLOPE_END)
    assert cov[start:end] == bs.slope_markdown(), (
        "COVERAGE.md sf1-slope section diverges from SLOPE.json — run "
        "`python scripts/bench_slope.py --write-coverage`"
    )
    # every elevated ratio must carry its triage IN SLOPE.json (VERDICT
    # r15 task 3: the bar is TRIAGE_REQUIRED_BAR, not just the
    # super-linear TRIAGE_BAR — a 4.9x row shipping naked was the gap)
    import json

    data = json.load(open(os.path.join(root, "SLOPE.json")))
    untriaged = [
        n for n, v in data["queries"].items()
        if v["ratio"] is not None and v["ratio"] > bs.TRIAGE_REQUIRED_BAR
        and "triage" not in v
    ]
    assert not untriaged, (
        f"elevated sf1 slopes (> {bs.TRIAGE_REQUIRED_BAR}x) without a "
        f"triage note: {untriaged} — add TRIAGE entries in "
        "scripts/bench_slope.py and re-run it"
    )


def test_gates_survive_driver_artifact_drop():
    """VERDICT r12 task 1: the driver drops CORRECTNESS_r{N}.json AFTER the
    builder's final commit, which used to shift max_round/latest_run and
    redden the three freshness gates at judge time every round. The ledger
    is now computed as-of the builder's last non-artifact commit, so a
    newer-than-anchor artifact must change NOTHING: simulate the drop by
    copying the newest CORRECTNESS file to a fake future round (mtime ==
    now > anchor, no git history) and assert all three gate computations
    are byte-identical to the no-drop state."""
    import glob
    import os
    import shutil

    fr = _load_freshness()
    from seccosql_spark.registry import _PRIORITY_WINDOW

    root = os.path.dirname(os.path.dirname(__file__))
    newest = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))[-1]
    fake = os.path.join(root, "CORRECTNESS_r99.json")
    before_rows = fr.ledger()
    before_spill = fr.spillover_violations(list(_PRIORITY_WINDOW), rows=before_rows)
    before_edited = fr.edited_window_violations(list(_PRIORITY_WINDOW), rows=before_rows)
    before_hist = fr.histogram_markdown(before_rows)
    try:
        shutil.copy(newest, fake)
        after_rows = fr.ledger()
        assert after_rows == before_rows, (
            "a driver artifact newer than the builder anchor changed the "
            "ledger — the as-of filter regressed (VERDICT r12 task 1)"
        )
        assert fr.spillover_violations(list(_PRIORITY_WINDOW), rows=after_rows) == before_spill
        assert fr.edited_window_violations(list(_PRIORITY_WINDOW), rows=after_rows) == before_edited
        assert fr.histogram_markdown(after_rows) == before_hist
    finally:
        os.remove(fake)


def test_edited_rows_enter_next_window():
    """VERDICT r11 task 3: every row edited since the latest driver run
    ("hot" in the ledger) must be in _PRIORITY_WINDOW unless outranked by
    never-verified/overdue/hotter rows filling all 50 slots. Red here =
    regenerate the window (`python scripts/freshness.py --window`) in the
    same commit as the edit."""
    fr = _load_freshness()

    from seccosql_spark.registry import _PRIORITY_WINDOW

    bad = fr.edited_window_violations(list(_PRIORITY_WINDOW))
    assert not bad, (
        "edited-this-round rows missing from _PRIORITY_WINDOW (their green "
        f"driver rows prove superseded code): {bad} — run "
        "scripts/freshness.py --window and paste into registry._PRIORITY_WINDOW"
    )


def test_tpch_bench_drift_flags_are_triaged():
    """VERDICT r13 task 5: TPCH_BENCH.json (scripts/bench_tpch.py) times
    all 22 TPC-H rows and flags any whose sf0.1 median moved >2x against
    the previously committed run. A committed flag WITHOUT a triage entry
    is a silent plan regression riding along — fail the suite until it is
    either fixed (re-measure clears the flag) or explained (triage note)."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(__file__))
    path = os.path.join(root, "TPCH_BENCH.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("no TPCH_BENCH.json committed yet")
    with open(path) as f:
        doc = json.load(f)
    assert len(doc["medians"]["sf0.1"]) == 22, "artifact must cover all 22"
    untriaged = [
        k for k in doc.get("drift_flags", {}) if k not in doc.get("triage", {})
    ]
    assert not untriaged, (
        f"TPC-H rows drifted >2x round-over-round without a triage note: "
        f"{untriaged} — re-measure on a quiet host or add a triage entry "
        "to TPCH_BENCH.json"
    )


def test_bench_total_drift_computation():
    """Pure-python check of bench.py's headline totals gate (VERDICT r15
    task 7): common-set compare, symmetric 1.25x flag, None when no
    comparable previous round, triage riding only on flagged results."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(__file__))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(root, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # no previous round / disjoint baskets: no verdict at all
    assert mod.compute_total_drift(None, {"q1": 1.0}) is None
    assert mod.compute_total_drift({"qX": 1.0}, {"q1": 1.0}) is None

    prev = {"q1": 1.0, "q2": 2.0, "q3": 3.0}
    # within the band: recorded but not flagged, no triage key
    out = mod.compute_total_drift(prev, {"q1": 1.1, "q2": 2.2, "q3": 3.0},
                                  prev_source="BENCH_r09.json")
    assert out["flagged"] is False and "triage" not in out
    assert out["prev_total"] == 6.0 and out["now_total"] == 6.3
    assert out["prev_source"] == "BENCH_r09.json"
    # uniform 1.3x creep: flagged, triage=None until one is committed
    out = mod.compute_total_drift(prev, {n: t * 1.3 for n, t in prev.items()})
    assert out["flagged"] is True and out["triage"] is None
    assert out["ratio"] == 1.3 and out["common_queries"] == 3
    # a query added this round is EXCLUDED from the compare
    out = mod.compute_total_drift(prev, {"q1": 1.0, "q2": 2.0, "q3": 3.0,
                                         "q_new": 99.0})
    assert out["flagged"] is False and out["common_queries"] == 3
    # symmetric: a uniform collapse also flags (new baseline needs a note)
    out = mod.compute_total_drift(prev, {n: t / 1.4 for n, t in prev.items()},
                                  triage="quiet-host re-measure")
    assert out["flagged"] is True and out["triage"] == "quiet-host re-measure"


def test_bench_total_drift_is_triaged():
    """The committed BENCH_RAW.json snapshot must never carry a FLAGGED
    headline-totals drift without a triage note (BENCH_TRIAGE.json key
    'total_vs_prev') — same discipline as the TPC-H gate below."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(__file__))
    path = os.path.join(root, "BENCH_RAW.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("no BENCH_RAW.json committed yet")
    with open(path) as f:
        doc = json.load(f)
    tvp = (doc.get("result") or {}).get("total_vs_prev")
    if not tvp:
        import pytest

        pytest.skip("BENCH_RAW.json predates the totals gate")
    assert not (tvp.get("flagged") and not tvp.get("triage")), (
        f"headline total moved {tvp['ratio']}x vs {tvp.get('prev_source')} "
        "without a triage note — re-measure on a quiet host or commit "
        "BENCH_TRIAGE.json with a 'total_vs_prev' explanation"
    )


def test_bench_cpu_canary_shape():
    """The r17 contention canary (VERDICT r16 task 7): _cpu_canary must
    return the documented fields with sane values, and the forked all-cores
    arm must not lose children (wall >= the single-thread floor / an
    unforked pool would return near-instantly). Kept tiny (nproc=2) so the
    test costs well under a second."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(__file__))
    spec = importlib.util.spec_from_file_location(
        "bench_mod_canary", os.path.join(root, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod._cpu_canary(2)
    assert set(out) == {"single_sec", "nproc", "nproc_wall_sec"}
    assert out["nproc"] == 2
    assert 0 < out["single_sec"] < 30
    # the forked arm runs the same loop per child, so its wall time cannot
    # be materially below one single-thread pass (children really ran)
    assert out["nproc_wall_sec"] >= out["single_sec"] * 0.5


def test_tpch_drift_computation():
    """Pure-python check of scripts/bench_tpch.py's round-over-round
    compare: flags exactly the rows outside 2x (both directions), first
    run flags nothing, and triage notes survive only while flagged."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(__file__))
    spec = importlib.util.spec_from_file_location(
        "bench_tpch", os.path.join(root, "scripts", "bench_tpch.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # first run: no previous file, nothing flags
    flags, triage = mod.compute_drift_flags(None, {"q1": 0.5})
    assert flags == {} and triage == {}

    prev = {
        "medians": {"sf0.1": {"q1": 0.5, "q2": 0.4, "q3": 0.3, "q4": 0.2}},
        "triage": {"q2": "known host burst", "q3": "stale note"},
    }
    now = {"q1": 0.6, "q2": 0.9, "q3": 0.12, "q4": 0.2, "q5": 9.9}
    flags, triage = mod.compute_drift_flags(prev, now)
    # q1 within 2x: clean; q2 2.25x up: flagged; q3 2.5x DOWN: flagged
    # (a sudden speedup is also a plan change worth explaining); q4 flat;
    # q5 new row with no previous: never flags. The common-set total
    # (1.4 -> 1.82 = 1.3x) exceeds TOTAL_DRIFT_FACTOR and flags too —
    # q5 is excluded from the total so a new row can't fake creep.
    assert sorted(flags) == ["__total__", "q2", "q3"]
    assert flags["q2"]["ratio"] == 2.25 and flags["q2"]["prev"] == 0.4
    assert flags["__total__"] == {
        "prev": 1.4, "now": 1.82, "ratio": 1.3, "common_queries": 4,
    }
    # triage carried only for still-flagged rows
    assert triage == {"q2": "known host burst", "q3": "stale note"}
    flags2, triage2 = mod.compute_drift_flags(prev, {"q2": 0.41})
    assert flags2 == {} and triage2 == {}
    # VERDICT r15 task 2: UNIFORM creep — every row inflated 1.35x, no
    # per-query flag possible, but the totals gate catches it; and a
    # uniform collapse (quiet-host re-measure after an inflated round)
    # flags symmetrically so the new baseline is also explained
    uniform = {n: round(t * 1.35, 3) for n, t in prev["medians"]["sf0.1"].items()}
    flags3, _ = mod.compute_drift_flags(prev, uniform)
    assert list(flags3) == ["__total__"] and flags3["__total__"]["ratio"] == 1.35
    shrunk = {n: round(t / 1.4, 4) for n, t in prev["medians"]["sf0.1"].items()}
    flags4, _ = mod.compute_drift_flags(prev, shrunk)
    assert list(flags4) == ["__total__"]
    # totals triage carried while flagged
    prev_t = dict(prev, triage={"__total__": "ambient load note"})
    _, triage5 = mod.compute_drift_flags(prev_t, uniform)
    assert triage5 == {"__total__": "ambient load note"}
