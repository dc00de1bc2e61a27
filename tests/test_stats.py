"""Statistics-driven planning tests: System-R join estimates, greedy
cost-based ordering, histograms — the reference's statsEstimation surface
(exact / naive / histogram tiers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seccosql_spark.plans.stats import (
    Histogram,
    RelStats,
    build_histogram,
    estimate_join,
    estimate_range_selectivity,
    greedy_join_order,
    stats_from_catalog,
)


def test_estimate_join_system_r_formula():
    l = RelStats(1000, {"a": 100})
    r = RelStats(500, {"a": 50})
    est = estimate_join(l, r, {"a"})
    assert est.rows == 1000 * 500 / 100  # denom = max(ndv) = 100
    assert est.ndv["a"] == 50  # join keeps at most the smaller side's NDV


def test_estimate_join_unknown_ndv_is_conservative():
    l = RelStats(1000)
    r = RelStats(500)
    est = estimate_join(l, r, {"a"})
    # unknown NDV -> treat attr as key of the larger side: 1000*500/1000
    assert est.rows == 500


def test_estimate_cross_product():
    assert estimate_join(RelStats(10), RelStats(20), set()).rows == 200


def test_greedy_order_smallest_first_no_cross_products():
    # R0(a,b) huge, R1(b,c) small, R2(c,d) tiny, R3(a,d) medium
    attr_sets = [{"a", "b"}, {"b", "c"}, {"c", "d"}, {"a", "d"}]
    stats = [
        RelStats(1_000_000, {"a": 1000, "b": 1000}),
        RelStats(1_000, {"b": 1000, "c": 100}),
        RelStats(10, {"c": 10, "d": 10}),
        RelStats(5_000, {"a": 500, "d": 100}),
    ]
    order = greedy_join_order(attr_sets, stats)
    assert order[0] == 2  # tiny first
    assert sorted(order) == [0, 1, 2, 3]
    # every step after the first shares an attribute with the prefix
    seen = set(attr_sets[order[0]])
    for i in order[1:]:
        assert seen & attr_sets[i]
        seen |= attr_sets[i]
    # the huge relation is joined LAST (maximally filtered prefix)
    assert order[-1] == 0


def test_stats_from_catalog_requires_rowcounts():
    from seccosql_spark.catalog import SideCatalog, TableStats

    c = SideCatalog()
    c.register("t1", stats=TableStats(row_count=10, ndv={"a": 5}))
    c.register("t2")  # no stats
    assert stats_from_catalog(c, ["t1", "t2"]) is None
    got = stats_from_catalog(c, ["t1"])
    assert got is not None and got[0].rows == 10 and got[0].ndv == {"a": 5.0}


def test_multiway_join_with_stats_same_result(spark):
    """Cost-based ordering is semantics-preserving: same rows as the
    unordered chain on a cyclic query."""
    from seccosql_spark.plans.ghd import multiway_natural_join

    edges = [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (2, 5)]
    r = spark.createDataFrame(edges, "a BIGINT, b BIGINT")
    s = spark.createDataFrame(edges, "b BIGINT, c BIGINT")
    t = spark.createDataFrame(edges[:4], "c BIGINT, a BIGINT")
    stats = [
        RelStats(8, {"a": 6, "b": 6}),
        RelStats(8, {"b": 6, "c": 6}),
        RelStats(4, {"c": 4, "a": 4}),
    ]
    plain = multiway_natural_join([r, s, t], use_ghd=True)
    costed = multiway_natural_join([r, s, t], use_ghd=True, stats=stats)
    key = ["a", "b", "c"]
    assert sorted(map(tuple, costed.select(*key).collect())) == sorted(
        map(tuple, plain.select(*key).collect())
    )


def test_histogram_build_and_selectivity(spark, sess):
    """Histogram range estimate within 2% absolute of the true fraction on
    a real column (uniform-ish l_quantity)."""
    li = spark.table("lineitem")
    hist = build_histogram(li, "l_quantity", bins=25)
    total = li.count()
    assert hist.total == total
    true_frac = li.filter((F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30)).count() / total
    est = estimate_range_selectivity(hist, 10, 30)
    assert abs(est - true_frac) < 0.02
    # open-ended ranges
    assert abs(estimate_range_selectivity(hist, None, None) - 1.0) < 1e-9
    assert estimate_range_selectivity(hist, 1e9, None) == 0.0


def test_histogram_degenerate_cases(spark):
    one = spark.createDataFrame([(5.0,)] * 7, "x DOUBLE")
    h = build_histogram(one, "x", bins=4)
    assert h.total == 7
    assert estimate_range_selectivity(h, 5, 5) == 1.0
    empty = spark.createDataFrame([], "x DOUBLE")
    h2 = build_histogram(empty, "x", bins=4)
    assert h2.total in (0, 1) or h2.counts == [0]
    assert estimate_range_selectivity(Histogram([0.0, 0.0], [0]), 0, 1) == 0.0


def test_analyze_histogram_into_catalog(sess):
    sess.analyze_histogram("orders", "o_totalprice", bins=16)
    meta = sess.catalog.get("orders")
    hist = meta.stats.histograms["o_totalprice"]
    assert hist.total == sess.spark.table("orders").count()


def test_apply_range_predicate_scales_rows_and_ndv():
    from seccosql_spark.plans.stats import apply_range_predicate

    # uniform histogram over [0, 100): predicate [0, 10) selects ~10%
    hist = Histogram([float(i * 10) for i in range(11)], [100] * 10)
    big = RelStats(1_000_000, {"k": 500_000})
    filtered = apply_range_predicate(big, hist, None, 10.0)
    assert abs(filtered.rows - 100_000) < 1_000
    assert filtered.ndv["k"] <= filtered.rows  # NDV capped at filtered rows


def test_filtered_big_table_orders_before_smaller_unfiltered():
    """HistogramFilterEstimation parity: a range-filtered fact table's
    SCALED estimate drives the greedy order. Unscaled, the 1M-row fact
    joins last; scaled by a 1% selectivity it becomes the smallest relation
    and anchors the plan."""
    from seccosql_spark.plans.stats import apply_range_predicate

    attr_sets = [{"k", "v"}, {"k", "g"}, {"g", "name"}]
    fact = RelStats(1_000_000, {"k": 1_000_000})
    mid = RelStats(50_000, {"k": 50_000, "g": 100})
    dim = RelStats(100, {"g": 100})
    # unscaled: fact never anchors
    assert greedy_join_order(attr_sets, [fact, mid, dim])[0] != 0
    # ultra-selective predicate (50 of 1M rows in range) -> the filtered
    # fact is now the smallest relation and anchors the plan
    hist = Histogram([0.0, 1.0, 100.0], [50, 999_950])
    scaled = apply_range_predicate(fact, hist, None, 1.0)
    assert scaled.rows < dim.rows
    order = greedy_join_order(attr_sets, [scaled, mid, dim])
    assert order[0] == 0


def test_stats_from_catalog_applies_predicates():
    from seccosql_spark.catalog import SideCatalog, TableStats

    c = SideCatalog()
    hist = Histogram([0.0, 10.0, 100.0], [100, 900])
    c.register(
        "fact",
        stats=TableStats(row_count=10_000, ndv={"k": 10_000}, histograms={"x": hist}),
    )
    c.register("dim", stats=TableStats(row_count=500, ndv={"k": 500}))
    got = stats_from_catalog(
        c, ["fact", "dim"], predicates={"fact": [("x", None, 10.0)]}
    )
    assert got is not None
    assert abs(got[0].rows - 1_000) < 10  # 10% of 10k
    # no histogram for the column -> conservative no-op
    got2 = stats_from_catalog(c, ["fact"], predicates={"fact": [("y", None, 10.0)]})
    assert got2[0].rows == 10_000


def test_join_skew_ceiling_and_auto_routing():
    """choose_multiway_algorithm reproduces WCOJ_BOUNDARY.md's measured
    crossover: hub-degree-16000 triangle stats -> wcoj; hub-4000 (below the
    25M-row ceiling) -> ghd; uniform random graph -> ghd; acyclic -> ghd;
    no stats -> ghd."""
    from seccosql_spark.plans.stats import (
        choose_multiway_algorithm,
        join_skew_ceiling,
    )

    tri = [{"a", "b"}, {"b", "c"}, {"c", "a"}]

    def hub_stats(deg):
        e = 2 * deg + 150  # both hub directions + the genuine triangles
        nodes = deg + 160
        return [
            RelStats(e, {x: nodes for x in s}, {x: deg for x in s}) for s in tri
        ]

    assert choose_multiway_algorithm(tri, hub_stats(16_000)) == "wcoj"
    assert choose_multiway_algorithm(tri, hub_stats(4_000)) == "ghd"
    # uniform sparse graph: max degree ~8 on 1M edges -> tiny ceiling
    uni = [RelStats(1e6, {x: 2e5 for x in s}, {x: 8 for x in s}) for s in tri]
    assert choose_multiway_algorithm(tri, uni) == "ghd"
    # acyclic chain is always binary joins, however skewed
    chain = [{"a", "b"}, {"b", "c"}, {"c", "d"}]
    skewed = [RelStats(1e8, {}, {x: 1e7 for x in s}) for s in chain]
    assert choose_multiway_algorithm(chain, skewed) == "ghd"
    assert choose_multiway_algorithm(tri, None) == "ghd"
    # ceiling arithmetic: hottest key d in both sides -> d^2; unknown
    # max_freq falls back to uniform rows/ndv
    l = RelStats(1000, {"k": 10}, {"k": 500})
    r = RelStats(1000, {"k": 10}, {"k": 500})
    assert join_skew_ceiling(l, r, {"k"}) == 250_000
    u = RelStats(1000, {"k": 10})
    assert join_skew_ceiling(u, u, {"k"}) == 100 * 100


def test_multiway_auto_matches_ghd_semantics(spark):
    """auto-routed join (whichever side of the boundary) returns the same
    distinct bindings as the GHD chain on duplicate-free edge inputs."""
    from seccosql_spark.plans.stats import choose_multiway_algorithm

    edges = [(0, i) for i in range(1, 40)] + [(i, 0) for i in range(1, 40)]
    edges += [(100, 101), (101, 102), (102, 100)]
    e = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    from seccosql_spark.session import SeccoSession

    sess = SeccoSession.get_or_create(spark)
    r = sess.from_spark(e.select(e.src.alias("a"), e.dst.alias("b")))
    s = e.select(e.src.alias("b"), e.dst.alias("c"))
    t = e.select(e.src.alias("c"), e.dst.alias("a"))
    deg = 39.0
    stats = [
        RelStats(len(edges), {x: 45.0 for x in ss}, {x: deg for x in ss})
        for ss in ({"a", "b"}, {"b", "c"}, {"c", "a"})
    ]
    # force the wcoj side of the boundary to exercise that routing too
    from seccosql_spark.plans import stats as stats_mod

    auto_small = r.multiway_join([s, t], algorithm="auto", stats=stats)
    ghd = r.multiway_join([s, t], algorithm="ghd")
    key = ["a", "b", "c"]
    want = sorted(map(tuple, ghd.df.select(*key).distinct().collect()))
    assert sorted(map(tuple, auto_small.df.select(*key).distinct().collect())) == want
    orig_cutoff = stats_mod.WCOJ_INTERMEDIATE_CUTOFF
    orig_factor = stats_mod.WCOJ_BLOWUP_FACTOR
    try:
        # push this small input over both lines so the wcoj routing runs
        stats_mod.WCOJ_INTERMEDIATE_CUTOFF = 100.0
        stats_mod.WCOJ_BLOWUP_FACTOR = 0.0
        assert choose_multiway_algorithm([{"a", "b"}, {"b", "c"}, {"c", "a"}], stats) == "wcoj"
        auto_wcoj = r.multiway_join([s, t], algorithm="auto", stats=stats)
        assert sorted(map(tuple, auto_wcoj.df.select(*key).collect())) == want
    finally:
        stats_mod.WCOJ_INTERMEDIATE_CUTOFF = orig_cutoff
        stats_mod.WCOJ_BLOWUP_FACTOR = orig_factor


def test_analyze_max_frequency_into_catalog(sess):
    sess.analyze_max_frequency("orders", "o_custkey")
    got = sess.catalog.get("orders").stats.max_freq["o_custkey"]
    from pyspark.sql import functions as F

    want = (
        sess.spark.table("orders")
        .groupBy("o_custkey")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert got == want > 0


def test_equi_height_histogram_on_skewed_column(spark):
    """Equi-height bins adapt to skew: a column where one value holds 90%
    of rows gets that value isolated by the percentile boundaries, so both
    the range estimate around it and the equality estimate on it stay
    accurate — the case where equi-width collapses (r04 VERDICT task 4)."""
    from seccosql_spark.plans.stats import estimate_equality_selectivity

    vals = [(100.0,)] * 900 + [(float(i),) for i in range(100)]
    df = spark.createDataFrame(vals, "x DOUBLE")
    h = build_histogram(df, "x", bins=8)
    assert h.total == 1000
    assert h.distincts is not None and len(h.distincts) == len(h.counts)
    # equality on the heavy value: true fraction 0.9
    est_hot = estimate_equality_selectivity(h, 100.0)
    assert abs(est_hot - 0.9) < 0.05
    # equality on a light value: true fraction 0.001; the estimate must not
    # be dragged up by the hot value's mass (equi-width's failure mode)
    est_cold = estimate_equality_selectivity(h, 7.0)
    assert est_cold < 0.05
    # out-of-range equality
    assert estimate_equality_selectivity(h, 1e9) == 0.0


def test_equality_predicate_reorders_filtered_table():
    """VERDICT r04 task 4 'done' criterion: an equality-filtered big table
    reorders to anchor the greedy plan, end-to-end through
    stats_from_catalog's =-predicate branch (lo == hi)."""
    from seccosql_spark.catalog import SideCatalog, TableStats

    c = SideCatalog()
    c.register(
        "fact",
        stats=TableStats(row_count=1_000_000, ndv={"k": 1_000_000, "x": 10_000}),
    )
    c.register("mid", stats=TableStats(row_count=50_000, ndv={"k": 50_000, "g": 100}))
    c.register("dim", stats=TableStats(row_count=100, ndv={"g": 100}))
    attr_sets = [{"k", "v"}, {"k", "g"}, {"g", "name"}]
    # unfiltered: the 1M-row fact never anchors
    base = stats_from_catalog(c, ["fact", "mid", "dim"])
    assert greedy_join_order(attr_sets, base)[0] != 0
    # x = 42 via the uniform 1/NDV path: 1M/10k = 100 estimated rows
    got = stats_from_catalog(
        c, ["fact", "mid", "dim"], predicates={"fact": [("x", 42.0, 42.0)]}
    )
    assert abs(got[0].rows - 100.0) < 1e-6
    assert got[0].ndv["x"] == 1.0
    order = greedy_join_order(attr_sets, got)
    assert order[0] == 0  # the equality-filtered fact anchors the plan


def test_equality_predicate_uses_histogram_bin(spark):
    """When the catalog holds an equi-height histogram, the =-predicate
    scales by the containing bin's measured distinct count rather than the
    global NDV — on a skewed column the two differ by orders of magnitude."""
    from seccosql_spark.catalog import SideCatalog, TableStats

    vals = [(100.0,)] * 900 + [(float(i),) for i in range(100)]
    df = spark.createDataFrame(vals, "x DOUBLE")
    h = build_histogram(df, "x", bins=8)
    c = SideCatalog()
    c.register(
        "t", stats=TableStats(row_count=1000, ndv={"x": 101}, histograms={"x": h})
    )
    got = stats_from_catalog(c, ["t"], predicates={"t": [("x", 100.0, 100.0)]})
    # histogram bin: ~900 rows; uniform 1/NDV would have claimed ~10
    assert got[0].rows > 500
    got_cold = stats_from_catalog(c, ["t"], predicates={"t": [("x", 7.0, 7.0)]})
    assert got_cold[0].rows < 100


def test_stats_from_catalog_renames_attributes():
    from seccosql_spark.catalog import SideCatalog, TableStats

    c = SideCatalog()
    c.register(
        "orders",
        stats=TableStats(
            row_count=1000, ndv={"o_custkey": 150}, max_freq={"o_custkey": 30}
        ),
    )
    got = stats_from_catalog(
        c, ["orders"], renames={"orders": {"o_custkey": "ck"}}
    )
    assert got[0].ndv == {"ck": 150.0}
    assert got[0].max_freq == {"ck": 30.0}


def test_w1_skew_profiles_flip_join_order(sess):
    """The W1 workload twin (workloadQuery.scala:37-139): measured stats
    must drive OPPOSITE dim attach orders under the low vs high fanout
    profiles — the cardinality-estimation decision the reference's
    W-series was built to exercise."""
    from seccosql_spark.queries.workload import w1_join_order

    low = w1_join_order(sess, "low")
    high = w1_join_order(sess, "high")
    # both start at the fanout-1 dim (smallest relation), then the fact
    assert low[0] == "w1_low_r2" and low[1] == "w1_low_r1"
    assert high[0] == "w1_high_r5" and high[1] == "w1_high_r1"
    # dims attach smallest-estimated-intermediate first: increasing fanout
    assert low[2:] == ["w1_low_r3", "w1_low_r4", "w1_low_r5"]
    assert high[2:] == ["w1_high_r4", "w1_high_r3", "w1_high_r2"]


def test_w2_snowflake_profiles_flip_join_order(sess):
    """W2 snowflake twin (workloadQuery.scala:140-233): low profile anchors
    at the fanout-1 fact dim; high profile starts at the snowflake LEAF and
    climbs R5 -> R4 -> fact — opposite attach directions."""
    from seccosql_spark.queries.workload import w2_join_order

    low = w2_join_order(sess, "low")
    high = w2_join_order(sess, "high")
    assert [n.rsplit("_", 1)[-1] for n in low][:2] == ["r2", "r1"]
    assert [n.rsplit("_", 1)[-1] for n in high][:3] == ["r5", "r4", "r1"]
    assert low != high


def test_w3_chain_profiles_flip_join_order(sess):
    """W3 line-join twin (workloadQuery.scala:237-330): the greedy order
    walks the chain FORWARD when sizes grow left-to-right and BACKWARD
    when they grow right-to-left."""
    from seccosql_spark.queries.workload import w3_join_order

    low = [n.rsplit("_", 1)[-1] for n in w3_join_order(sess, "low")]
    high = [n.rsplit("_", 1)[-1] for n in w3_join_order(sess, "high")]
    assert low == ["r1", "r2", "r3", "r4", "r5"]
    assert high == ["r5", "r4", "r3", "r2", "r1"]


def test_winnow_oracle_handles_docs_longer_than_512_tokens(spark, tmp_path):
    """ADVICE r08: the winnowing/overlap oracles used a hardcoded
    range(1, 512), silently truncating grams past token ~514 — testdata
    documents are short enough that the differential agreed by luck. Pin a
    600-token document through BOTH engines end to end."""
    import duckdb

    from seccosql_spark.queries.text_stats import (
        WINNOW_ORACLE,
        text_winnowing_fingerprint,
    )
    from seccosql_spark.registry import session_for
    from tests.conftest import SF_DIR

    words = [f"w{i % 37}x{i % 11}" for i in range(600)]
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(1, " ".join(words), "synthetic", len(" ".join(words)))],
        "doc_id: long, text: string, source: string, n_chars: long",
    ).coalesce(1).write.parquet(path)

    sess = session_for(spark, SF_DIR)
    spark.read.parquet(path).createOrReplaceTempView("documents")
    try:
        out = text_winnowing_fingerprint(sess)
        df = out.df if hasattr(out, "df") else out
        got = {(r["doc_id"], r["fp"]) for r in df.collect()}
    finally:
        # restore the registered testdata view for later tests in the session
        spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView(
            "documents"
        )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')")
    want = {(r[0], r[1]) for r in con.sql(WINNOW_ORACLE).fetchall()}
    # 600 tokens -> 597 grams; far beyond the old 511-gram cap
    assert got == want
    assert len(want) > 0


def test_observed_stats_probe_exact(spark):
    """observe_rel_stats measures rows / per-attr NDV / hottest-key
    frequency EXACTLY from the live DataFrame (one grouping-sets pass)."""
    from seccosql_spark.plans.stats import observe_rel_stats

    rows = [(1, 10), (1, 11), (1, 12), (2, 10), (3, 10), (3, 13)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    st = observe_rel_stats(df, {"a", "b"})
    assert st.rows == 6
    assert st.ndv == {"a": 3.0, "b": 4.0}
    assert st.max_freq == {"a": 3.0, "b": 3.0}


def test_observed_stats_flip_auto_routing(spark):
    """VERDICT r08 task 9 'done' bar: a skewed RUNTIME distribution flips
    the GHD-vs-WCOJ choice that precomputed base-table stats would get
    wrong. The catalog remembers the base edge table as uniform (hot key
    frequency 8); the live input — after upstream derivation — is a
    degree-16000 hub. Observed stats route to WCOJ; the stale precomputed
    stats would have kept the quadratic binary chain."""
    from seccosql_spark.plans.stats import (
        RelStats,
        choose_multiway_algorithm,
        observe_join_stats,
    )

    deg = 16_000
    hub = [(0, i) for i in range(1, deg + 1)] + [(i, 0) for i in range(1, deg + 1)]
    hub += [(b, b + 1) for b in range(100_000, 100_050)]
    e = spark.createDataFrame(hub, "src LONG, dst LONG")
    r = e.select(e.src.alias("a"), e.dst.alias("b"))
    s = e.select(e.src.alias("b"), e.dst.alias("c"))
    t = e.select(e.src.alias("c"), e.dst.alias("a"))
    tri = [{"a", "b"}, {"b", "c"}, {"c", "a"}]

    observed = observe_join_stats([r, s, t])
    assert observed[0].max_freq["a"] == float(deg)  # the hub, measured
    assert choose_multiway_algorithm(tri, observed) == "wcoj"

    # the stale catalog view of the same tables: right row count, uniform
    # key frequencies -> the (wrong) binary-chain verdict
    stale = [
        RelStats(e.count(), {x: 16_100 for x in a}, {x: 8 for x in a})
        for a in tri
    ]
    assert choose_multiway_algorithm(tri, stale) == "ghd"

    # a genuinely uniform live input keeps the binary chain under the
    # same observed-stats path
    uni = spark.createDataFrame(
        [(i, (i * 7 + 1) % 500) for i in range(500)], "src LONG, dst LONG"
    )
    ur = uni.select(uni.src.alias("a"), uni.dst.alias("b"))
    us = uni.select(uni.src.alias("b"), uni.dst.alias("c"))
    ut = uni.select(uni.src.alias("c"), uni.dst.alias("a"))
    assert choose_multiway_algorithm(tri, observe_join_stats([ur, us, ut])) == "ghd"


def test_multiway_join_observed_stats_mode(spark):
    """stats='observed' end to end: auto routing measures the live inputs
    and the joined result keeps GHD-chain semantics on duplicate-free
    edges; unknown stats strings fail loudly."""
    import pytest

    from seccosql_spark.session import SeccoSession

    sess = SeccoSession.get_or_create(spark)
    edges = [(0, i) for i in range(1, 30)] + [(i, 0) for i in range(1, 30)]
    edges += [(100, 101), (101, 102), (102, 100)]
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    r = sess.from_spark(e.select(e.src.alias("a"), e.dst.alias("b")))
    s = e.select(e.src.alias("b"), e.dst.alias("c"))
    t = e.select(e.src.alias("c"), e.dst.alias("a"))
    got = sorted(
        tuple(x) for x in r.multiway_join([s, t], algorithm="auto", stats="observed")
        .df.select("a", "b", "c").distinct().collect()
    )
    want = sorted(
        tuple(x) for x in r.multiway_join([s, t], algorithm="ghd")
        .df.select("a", "b", "c").distinct().collect()
    )
    assert got == want and len(got) > 0
    with pytest.raises(ValueError, match="unknown stats mode"):
        r.multiway_join([s, t], algorithm="auto", stats="aqe")


def test_bpe_greedy_overlap_differential(spark, tmp_path):
    """BPE merge application on runs of identical symbols is where greedy
    semantics bite ('aaaa' under rule (a,a) -> 'aa','aa', never the
    overlapping middle pair): pin Spark's aggregate-fold against the
    oracle's gaps-and-islands parity formulation on a corpus built of
    exactly such runs."""
    import duckdb

    from seccosql_spark.queries.text_stats import BPE_ORACLE, text_bpe_merges
    from seccosql_spark.registry import session_for
    from tests.conftest import SF_DIR

    text = "aaaa aaa aaaaa bb ab " * 40
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(1, text.strip(), "runs", len(text))],
        "doc_id: long, text: string, source: string, n_chars: long",
    ).coalesce(1).write.parquet(path)

    sess = session_for(spark, SF_DIR)
    spark.read.parquet(path).createOrReplaceTempView("documents")
    try:
        out = text_bpe_merges(sess)
        df = out.df if hasattr(out, "df") else out
        got = sorted(tuple(r) for r in df.collect())
    finally:
        spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView(
            "documents"
        )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')")
    want = sorted(tuple(r) for r in con.sql(BPE_ORACLE).fetchall())
    assert got == want
    # round 1 must be (a, a): 'aaaa'->1 greedy pair + overlap... spelled
    # out: per word occurrence, greedy pairs = floor(run_len / 2)
    assert got[0][1:3] == ("a", "a")


def test_observed_stats_exclude_null_keys(spark):
    """NULL join keys never survive an equi-join, so they must not count
    toward observed NDV or max_freq — a left join's mostly-null key would
    otherwise fabricate a skew ceiling and misroute to WCOJ (code-review
    r09). Row count still covers every row."""
    from seccosql_spark.plans.stats import observe_rel_stats

    rows = [(None, 1), (None, 2), (None, 3), (None, 4), (1, 5), (2, 5)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    st = observe_rel_stats(df, {"a", "b"})
    assert st.rows == 6
    assert st.ndv["a"] == 2.0 and st.max_freq["a"] == 1.0  # nulls excluded
    assert st.ndv["b"] == 5.0 and st.max_freq["b"] == 2.0


def test_bpe_merges_survive_backslash_symbols(spark, tmp_path):
    """A winning merge pair containing backslashes must not break (or
    corrupt) the generated merge expression — escape order matters
    (backslashes before quotes)."""
    import duckdb

    from seccosql_spark.queries.text_stats import BPE_ORACLE, text_bpe_merges
    from seccosql_spark.registry import session_for
    from tests.conftest import SF_DIR

    text = "c:\\tmp c:\\tmp c:\\tmp x'y x'y " * 30
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(1, text.strip(), "paths", len(text))],
        "doc_id: long, text: string, source: string, n_chars: long",
    ).coalesce(1).write.parquet(path)
    sess = session_for(spark, SF_DIR)
    spark.read.parquet(path).createOrReplaceTempView("documents")
    try:
        out = text_bpe_merges(sess)
        df = out.df if hasattr(out, "df") else out
        got = sorted(tuple(r) for r in df.collect())
    finally:
        spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView(
            "documents"
        )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')")
    want = sorted(tuple(r) for r in con.sql(BPE_ORACLE).fetchall())
    assert got == want
    assert any("\\" in r[1] or "\\" in r[2] for r in got)  # a \ pair really won
