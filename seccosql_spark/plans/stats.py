"""Cardinality estimation + cost-based join ordering from catalog statistics.

Reference parity: ``optimization/statsEstimation/`` — ``Statistics.scala``
(row count + per-attribute stats), ``StatsPlanVisitor.scala`` (bottom-up
estimate propagation), and the ``exact``/``histogram``/``naive`` estimator
tiers. This module is the Spark-first translation: Spark's own CBO owns
filter/scan estimation (it reads parquet footers), so the side-catalog
stats feed exactly the decisions Spark cannot make without key/NDV
knowledge — multiway natural-join ORDERING (Catalyst does not reorder
inner joins without CBO stats, and never for the pattern-compiler's
self-joined edge copies) and broadcast/hypercube sizing.

Estimator tiers, matching the reference:
- exact: row counts measured by ``SeccoSession.analyze_table`` (one agg);
- naive: System-R equi-join formula |L ⋈ R| = |L|·|R| / ∏_a max(ndv_L(a),
  ndv_R(a)) over shared attributes, NDV from approx_count_distinct;
- histogram: equi-height (percentile-bounded) bins with per-bin distinct
  counts, for range- (``estimate_range_selectivity``) and equality-
  (``estimate_equality_selectivity``) predicate selectivity, from
  ``analyze_histogram``.

All estimates are plan-time Python arithmetic — zero runtime overhead.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class RelStats:
    """Statistics for one relation participating in a multiway join."""

    rows: float
    ndv: dict[str, float] = field(default_factory=dict)  # attr -> distinct count
    # attr -> frequency of its hottest value (heavy-hitter statistic; the
    # skew signal System-R's uniform-NDV model is blind to)
    max_freq: dict[str, float] = field(default_factory=dict)

    def ndv_of(self, attr: str) -> float:
        # an attribute with unknown NDV is conservatively treated as a key
        # of the relation (ndv = rows): join estimates then stay <= the
        # cross-product row count instead of exploding optimistically
        v = self.ndv.get(attr)
        return min(v, self.rows) if v is not None else max(self.rows, 1.0)

    def max_freq_of(self, attr: str) -> float:
        """Hottest-value frequency; falls back to the uniform average
        rows/ndv when unmeasured (no skew assumed without evidence)."""
        v = self.max_freq.get(attr)
        if v is not None:
            return min(v, self.rows)
        return max(self.rows / self.ndv_of(attr), 1.0)


def estimate_join(left: RelStats, right: RelStats, shared: set[str]) -> RelStats:
    """System-R estimate of the natural join of two relations
    (naive/Estimation parity). Output NDV per attribute: min of the inputs'
    (join can only lose distinct values)."""
    if not shared:
        rows = left.rows * right.rows  # cross product
    else:
        denom = 1.0
        for a in shared:
            denom *= max(left.ndv_of(a), right.ndv_of(a), 1.0)
        rows = left.rows * right.rows / denom
    ndv: dict[str, float] = {}
    for a in set(left.ndv) | set(right.ndv):
        cands = [s.ndv[a] for s in (left, right) if a in s.ndv]
        ndv[a] = min(min(cands), rows) if cands else rows
    return RelStats(max(rows, 1.0), ndv)


def greedy_join_order(
    attr_sets: list[set[str]], stats: list[RelStats]
) -> list[int]:
    """Greedy smallest-intermediate-first ordering of a natural-join chain:
    start from the smallest relation, repeatedly attach the CONNECTED
    relation minimizing the estimated intermediate size (disconnected
    relations only when nothing connected remains — no accidental cross
    products). Returns indices into the input list.

    This is the decision Catalyst will not make for us: without CBO stats
    it keeps the user's join order, and the GHD planner's bags are built
    from attribute structure alone. O(n^2) in #relations — plan-time only.
    """
    if len(attr_sets) != len(stats):
        raise ValueError("attr_sets and stats must align")
    n = len(attr_sets)
    if n == 0:
        return []
    remaining = set(range(n))
    start = min(remaining, key=lambda i: stats[i].rows)
    order = [start]
    remaining.discard(start)
    acc_attrs = set(attr_sets[start])
    acc = stats[start]
    while remaining:
        connected = [i for i in remaining if acc_attrs & attr_sets[i]]
        pool = connected or sorted(remaining)
        best = min(
            pool,
            key=lambda i: estimate_join(acc, stats[i], acc_attrs & attr_sets[i]).rows,
        )
        acc = estimate_join(acc, stats[best], acc_attrs & attr_sets[best])
        acc_attrs |= attr_sets[best]
        order.append(best)
        remaining.discard(best)
    return order


def join_skew_ceiling(left: RelStats, right: RelStats, shared: set[str]) -> float:
    """Rows the single HOTTEST shared-key value would produce in the binary
    join — maxfreq_L(a) · maxfreq_R(a), minimized over the shared attrs
    (every shared attr must match, so the tightest one bounds the blowup).
    This is the skew signal the System-R average estimate cannot see: a hub
    key of degree d in both inputs costs d² rows regardless of NDV."""
    if not shared:
        return left.rows * right.rows
    return min(left.max_freq_of(a) * right.max_freq_of(a) for a in shared)


# Measured on this host (WCOJ_BOUNDARY.md): the GHD binary chain crosses
# over between 16M and 64M intermediate rows on a skewed triangle, while
# the WCOJ path stays flat. The auto rule opts into WCOJ only when the
# worst pairwise skew ceiling is both large in absolute terms AND a real
# blowup relative to the AGM output bound (max|R|^fhtw) — otherwise the
# intermediate is just "the query is big", which codegen'd hash joins
# handle better.
WCOJ_INTERMEDIATE_CUTOFF = 25_000_000.0
WCOJ_BLOWUP_FACTOR = 20.0


def choose_multiway_algorithm(
    attr_sets: list[set[str]], stats: list[RelStats] | None
) -> str:
    """Plan-time GHD-vs-WCOJ decision (the automated form of
    WCOJ_BOUNDARY.md's decision rule):

    - acyclic queries (fhtw <= 1) always take the binary chain;
    - cyclic queries take WCOJ only when some pairwise join's skew ceiling
      (``join_skew_ceiling``) exceeds both ``WCOJ_INTERMEDIATE_CUTOFF``
      rows and ``WCOJ_BLOWUP_FACTOR`` × the AGM bound max|R|^fhtw;
    - no stats → no evidence of skew → binary chain.

    NOTE: WCOJ is set-semantics — callers routing through "auto" assert
    duplicate-free inputs (edge sets), as ``multiway_join`` documents."""
    if stats is None or len(attr_sets) < 3:
        return "ghd"
    from seccosql_spark.plans.ghd import JoinHyperGraph, decompose

    ghd = decompose(JoinHyperGraph.from_attr_sets(attr_sets))
    if ghd.fwidth <= 1:
        return "ghd"
    worst = 0.0
    for i in range(len(attr_sets)):
        for j in range(i + 1, len(attr_sets)):
            shared = attr_sets[i] & attr_sets[j]
            if shared:
                worst = max(worst, join_skew_ceiling(stats[i], stats[j], shared))
    agm_bound = max(s.rows for s in stats) ** float(ghd.fwidth)
    if worst >= WCOJ_INTERMEDIATE_CUTOFF and worst >= WCOJ_BLOWUP_FACTOR * agm_bound:
        return "wcoj"
    return "ghd"


def stats_from_catalog(
    catalog,
    names: list[str],
    predicates: dict[str, list[tuple[str, float | None, float | None]]] | None = None,
    renames: dict[str, dict[str, str]] | None = None,
) -> list[RelStats] | None:
    """RelStats per named table from the side catalog; None when any table
    lacks a measured row count (callers then skip cost-based ordering
    rather than plan on fabricated numbers).

    `predicates`: optional ``{table: [(column, lo, hi), ...]}`` predicates
    the query applies to each relation, scaled BEFORE join ordering —
    reference ``HistogramFilterEstimation`` feeding
    ``HistogramJoinEstimation``:

    - ``lo < hi`` (either side may be None) is a RANGE predicate: scaled by
      the histogram when the catalog holds one (``analyze_histogram``),
      otherwise no scaling (conservative: never underestimate).
    - ``lo == hi`` (both non-None) is an EQUALITY predicate: scaled by the
      equi-height histogram's per-bin distinct estimate when available,
      else by the uniform 1/NDV when ``analyze_table`` measured the
      column's NDV, else no scaling.

    `renames`: optional ``{table: {catalog_column: plan_attribute}}`` — the
    mapping a caller applies when aliasing columns for a natural join; the
    returned RelStats carry the PLAN attribute names so they line up with
    the DataFrames handed to the join planner."""
    out: list[RelStats] = []
    for name in names:
        meta = catalog.get(name)
        if meta is None or meta.stats.row_count is None:
            return None
        rel = RelStats(
            float(meta.stats.row_count),
            {k: float(v) for k, v in meta.stats.ndv.items()},
            {k: float(v) for k, v in meta.stats.max_freq.items()},
        )
        for column, lo, hi in (predicates or {}).get(name, []):
            hist = meta.stats.histograms.get(column)
            if lo is not None and hi is not None and lo == hi:
                if isinstance(hist, Histogram):
                    sel = estimate_equality_selectivity(hist, float(lo))
                elif meta.stats.ndv.get(column):
                    sel = 1.0 / float(meta.stats.ndv[column])
                else:
                    continue
                rel = apply_equality_predicate(rel, column, sel)
            elif isinstance(hist, Histogram):
                rel = apply_range_predicate(rel, hist, lo, hi)
        ren = (renames or {}).get(name)
        if ren:
            rel = RelStats(
                rel.rows,
                {ren.get(k, k): v for k, v in rel.ndv.items()},
                {ren.get(k, k): v for k, v in rel.max_freq.items()},
            )
        out.append(rel)
    return out


# ------------------------------------------- observed (runtime) statistics


def observe_rel_stats(df: DataFrame, attrs: set[str] | None = None) -> RelStats:
    """EXACT observed statistics for one live relation at plan time — the
    runtime counterpart of the side catalog's precomputed
    ``analyze_table``/``analyze_max_frequency`` (VERDICT r08 task 9 /
    WCOJ_BOUNDARY.md "next depth frontier"): per join attribute, the row
    count, distinct-value count, and the HOTTEST value's frequency, from
    ONE aggregation job.

    Plan shape: GROUPING SETS ((a), (b), ...) over the join attributes —
    Spark plans this as a single Expand + one hash aggregation (map-side
    partials), so the cost is one pass over the relation regardless of how
    many attributes are probed; a second k-row aggregation (k = #attrs)
    folds each grouping set to (ndv, max_freq, rows). That makes the probe
    strictly stronger evidence than AQE's shuffle-bytes skew signal (which
    sees hot PARTITIONS, a hash-collision-blurred proxy for hot KEYS) at
    comparable cost, and the result feeds the same ``RelStats`` consumers:
    ``choose_multiway_algorithm`` routing and ``greedy_join_order``.

    Use when the relation is an intermediate (pattern-compiler edge
    copies, filtered subqueries) that the offline catalog has never seen —
    precomputed stats describe the BASE table, and a filter can flip the
    skew verdict in either direction."""
    cols = sorted(attrs or df.columns)
    if not cols:
        raise ValueError("observe_rel_stats needs at least one attribute")
    k = len(cols)
    # grouping_id bit i (MSB-first over `cols`) is SET when the column is
    # aggregated away; the set {cols[i]} therefore has gid = all-ones with
    # bit i cleared
    all_ones = (1 << k) - 1
    gid_of = {c: all_ones ^ (1 << (k - 1 - i)) for i, c in enumerate(cols)}
    # NULL keys never survive an equi-join, so a NULL group must count
    # toward neither ndv nor max_freq (a left join's 60%-null key would
    # otherwise fabricate a giant skew ceiling and misroute to WCOJ; the
    # offline twin, approx_count_distinct in analyze_table, excludes NULLs
    # too). The row count keeps every row.
    active_is_null = None
    for c in cols:
        cond = (F.col("gid") == gid_of[c]) & F.col(c).isNull()
        active_is_null = cond if active_is_null is None else (active_is_null | cond)
    per_set = (
        df.groupingSets([[c] for c in cols], *[F.col(c) for c in cols])
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("cnt"))
        .groupBy("gid")
        .agg(
            F.count(F.when(~active_is_null, F.lit(1))).alias("ndv"),
            F.max(F.when(~active_is_null, F.col("cnt"))).alias("mx"),
            F.sum("cnt").alias("rows"),
        )
        .collect()
    )
    by_gid = {r["gid"]: r for r in per_set}
    rows = float(max((r["rows"] for r in per_set), default=0))
    ndv: dict[str, float] = {}
    max_freq: dict[str, float] = {}
    for c in cols:
        r = by_gid.get(gid_of[c])
        if r is not None and r["ndv"]:
            ndv[c] = float(r["ndv"])
            max_freq[c] = float(r["mx"])
    return RelStats(rows, ndv, max_freq)


def observe_join_stats(dfs: list[DataFrame]) -> list[RelStats]:
    """Observed RelStats for every relation of a multiway natural join,
    probing exactly the SHARED attributes (the ones join routing reads) —
    attributes private to one relation never influence skew ceilings or
    the AGM bound, so they are not worth a grouping set each."""
    attr_sets = [set(d.columns) for d in dfs]
    out = []
    for i, df in enumerate(dfs):
        shared = set()
        for j, other in enumerate(attr_sets):
            if j != i:
                shared |= attr_sets[i] & other
        out.append(observe_rel_stats(df, shared or attr_sets[i]))
    return out


# ------------------------------------------------------------- histograms


@dataclass
class Histogram:
    """Equi-height histogram (reference ``statsEstimation/histogram`` /
    the ``HistogramStatisticComputer`` lineage, which is percentile-based):
    `edges` are the n+1 bin boundaries placed at exact percentiles, `counts`
    the measured bin row counts, and `distincts` the measured per-bin
    distinct-value counts (the denominator for equality-predicate
    selectivity).

    A value spanning more than one quantile step (a heavy hitter) appears
    as a SINGLETON bin — consecutive equal edges ``[v, v]`` — holding
    exactly the rows equal to ``v``; singleton bins take assignment
    priority over range bins (``_bucket_of`` is the shared rule). This is
    what lets the histogram stay accurate on skewed columns where
    equi-width collapses: the hot value is isolated instead of flattening
    its whole neighborhood."""

    edges: list[float]
    counts: list[int]
    distincts: list[int] | None = None

    @property
    def total(self) -> int:
        return sum(self.counts)


def _bucket_of(hist: Histogram, value: float) -> int | None:
    """Bin index containing `value` under the shared assignment rule
    (singleton bins first, then first range bin — closed both ends —
    containing the value), or None outside the histogram's range. The
    build-side Spark expression implements the identical rule, so estimates
    read the same bins the measurement populated."""
    edges = hist.edges
    nbins = len(hist.counts)
    for b in range(nbins):
        if edges[b] == edges[b + 1] == value:
            return b
    for b in range(nbins):
        if edges[b] != edges[b + 1] and edges[b] <= value <= edges[b + 1]:
            return b
    return None


def build_histogram(df: DataFrame, column: str, bins: int = 32) -> Histogram:
    """Equi-height histogram in two Spark jobs: exact percentiles place the
    bin boundaries (a boundary value repeated across quantile steps is a
    heavy hitter and becomes a singleton bin), then one conditional
    aggregation measures per-bin row and distinct counts. ANALYZE-time
    only — never on a query path."""
    from pyspark.sql import functions as F

    col = F.col(column).cast("double")
    probs = ", ".join(str(i / bins) for i in range(bins + 1))
    qrow = (
        df.filter(F.col(column).isNotNull())
        .select(
            F.expr(
                f"percentile(CAST({column} AS DOUBLE), array({probs}))"
            ).alias("qs")
        )
        .collect()[0]
    )
    qs = qrow["qs"]
    if qs is None:
        return Histogram([0.0, 0.0], [0], [0])
    # run-length the quantile boundaries: each unique value contributes one
    # edge, plus a second copy (= singleton bin) when it repeats
    edges: list[float] = []
    i = 0
    vals = [float(q) for q in qs]
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        edges.append(vals[i])
        if j - i > 1:
            edges.append(vals[i])
        i = j
    if len(edges) == 1:  # constant column
        cnt = df.filter(F.col(column).isNotNull()).count()
        return Histogram([edges[0], edges[0]], [cnt], [1])
    n = len(edges) - 1
    # shared assignment rule (see _bucket_of): singleton bins first, then
    # the first closed range bin containing the value
    chain = None
    for b in range(n):
        if edges[b] == edges[b + 1]:
            cond = col == F.lit(edges[b])
            chain = F.when(cond, b) if chain is None else chain.when(cond, b)
    for b in range(n):
        if edges[b] != edges[b + 1]:
            cond = (col >= F.lit(edges[b])) & (col <= F.lit(edges[b + 1]))
            chain = F.when(cond, b) if chain is None else chain.when(cond, b)
    bucket = chain
    aggs = []
    for b in range(n):
        aggs.append(F.sum(F.when(bucket == b, 1).otherwise(0)).alias(f"c{b}"))
        aggs.append(F.count_distinct(F.when(bucket == b, col)).alias(f"d{b}"))
    row = df.filter(F.col(column).isNotNull()).agg(*aggs).collect()[0]
    counts = [int(row[f"c{b}"] or 0) for b in range(n)]
    distincts = [int(row[f"d{b}"] or 0) for b in range(n)]
    return Histogram(edges, counts, distincts)


def estimate_range_selectivity(
    hist: Histogram, lo: float | None, hi: float | None
) -> float:
    """Fraction of rows with lo <= value <= hi under the histogram, with
    linear interpolation inside partially-covered bins (the standard
    equi-width estimate; reference histogram estimator parity)."""
    if hist.total == 0:
        return 0.0
    lo = hist.edges[0] if lo is None else lo
    hi = hist.edges[-1] if hi is None else hi
    if hi < lo:
        return 0.0
    covered = 0.0
    for b, cnt in enumerate(hist.counts):
        b_lo, b_hi = hist.edges[b], hist.edges[b + 1]
        if b_hi < lo or b_lo > hi:
            continue
        if b_hi == b_lo:
            covered += cnt
            continue
        overlap = min(hi, b_hi) - max(lo, b_lo)
        covered += cnt * max(0.0, min(1.0, overlap / (b_hi - b_lo)))
    return min(1.0, covered / hist.total)


def estimate_equality_selectivity(hist: Histogram, value: float) -> float:
    """Fraction of rows with column == value under an equi-height histogram:
    the containing bin's row share spread uniformly over the bin's MEASURED
    distinct values (reference equi-height equality estimate). A histogram
    without per-bin distincts degrades to the whole-bin share (conservative
    overestimate — never underestimates a filter's output)."""
    if hist.total == 0:
        return 0.0
    b = _bucket_of(hist, value)
    if b is None:
        return 0.0
    share = hist.counts[b] / hist.total
    if hist.distincts is not None and b < len(hist.distincts):
        return share / max(hist.distincts[b], 1)
    return share


def apply_equality_predicate(
    stats: RelStats, column: str, selectivity: float
) -> RelStats:
    """Scale a relation's estimate by an equality predicate's selectivity:
    the filtered column collapses to a single value (ndv=1, max_freq =
    filtered rows); every other attribute's NDV/max_freq is capped at the
    filtered row count (same conservative discipline as
    ``apply_range_predicate`` — skew evidence never silently shrinks)."""
    rows = max(stats.rows * selectivity, 1.0)
    ndv = {a: min(v, rows) for a, v in stats.ndv.items()}
    ndv[column] = 1.0
    max_freq = {a: min(v, rows) for a, v in stats.max_freq.items()}
    max_freq[column] = rows
    return RelStats(rows, ndv, max_freq)


def apply_range_predicate(
    stats: RelStats, hist: Histogram, lo: float | None, hi: float | None
) -> RelStats:
    """Scale a relation's estimated rows by the histogram selectivity of a
    range predicate on one of its columns (reference
    ``HistogramFilterEstimation.scala`` parity); per-attribute NDVs are
    capped at the filtered row count so downstream System-R join estimates
    (``estimate_join``) see the filtered relation, not the base table.
    Heavy-hitter stats carry through capped at the filtered rows but NOT
    scaled down: a hot key may lie entirely inside the range, so keeping
    the measured frequency (conservative: skew never silently disappears)
    preserves the evidence ``choose_multiway_algorithm`` needs."""
    sel = estimate_range_selectivity(hist, lo, hi)
    rows = max(stats.rows * sel, 1.0)
    return RelStats(
        rows,
        {a: min(v, rows) for a, v in stats.ndv.items()},
        {a: min(v, rows) for a, v in stats.max_freq.items()},
    )
