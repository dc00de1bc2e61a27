"""As-of and range join golden tests on literal tables."""

from __future__ import annotations

import pytest

from seccosql_spark.operators.asof import asof_join, range_join_buckets


def rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_asof_basic(spark):
    trades = spark.createDataFrame(
        [("A", 3, "t1"), ("A", 7, "t2"), ("B", 5, "t3")], "sym STRING, t BIGINT, id STRING"
    )
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0), ("B", 9, 99.0)],
        "sym STRING, t BIGINT, px DOUBLE",
    )
    out = asof_join(trades, quotes, ["sym"], "t", "t", ["px"])
    assert rows(out, ["id", "asof_px"]) == [("t1", 10.0), ("t2", 11.0), ("t3", None)]


def test_asof_inclusive_ties(spark):
    left = spark.createDataFrame([("A", 5, "l")], "k STRING, t BIGINT, id STRING")
    right = spark.createDataFrame([("A", 5, 1.5)], "k STRING, t BIGINT, v DOUBLE")
    incl = asof_join(left, right, ["k"], "t", "t", ["v"], inclusive=True)
    excl = asof_join(left, right, ["k"], "t", "t", ["v"], inclusive=False)
    assert rows(incl, ["id", "asof_v"]) == [("l", 1.5)]
    assert rows(excl, ["id", "asof_v"]) == [("l", None)]


def test_range_join_matches_naive(spark):
    a = spark.createDataFrame(
        [("u", i * 10, i) for i in range(10)], "k STRING, at BIGINT, aid INT"
    )
    b = spark.createDataFrame(
        [("u", i * 7, 100 + i) for i in range(12)], "k STRING, bt BIGINT, bid INT"
    )
    bucketed = range_join_buckets(a, b, ["k"], "at", "bt", lo=1, hi=25)
    naive = a.join(b, "k").filter("bt >= at + 1 AND bt <= at + 25")
    assert rows(bucketed, ["aid", "bid"]) == rows(naive, ["aid", "bid"])
    assert len(rows(bucketed, ["aid", "bid"])) > 0


def test_range_join_rejects_bad_bounds(spark):
    df = spark.createDataFrame([("u", 1)], "k STRING, t BIGINT")
    with pytest.raises(ValueError):
        range_join_buckets(df, df.withColumnRenamed("t", "t2"), ["k"], "t", "t2", 5, 5)


def test_range_join_rejects_ambiguous_columns(spark):
    df = spark.createDataFrame([("u", 1, 2)], "k STRING, t BIGINT, x INT")
    with pytest.raises(ValueError):
        range_join_buckets(df, df, ["k"], "t", "t", 0, 10)


def test_sessionize_operator(spark):
    from seccosql_spark.operators.sampling import sessionize

    df = spark.createDataFrame(
        [("u", 100, "a"), ("u", 150, "b"), ("u", 500, "c"), ("v", 10, "d")],
        "k STRING, t BIGINT, id STRING",
    )
    out = sessionize(df, "k", "t", gap=100)
    got = {r["id"]: r["session_id"] for r in out.collect()}
    assert got == {"a": 1, "b": 1, "c": 2, "d": 1}


def test_hash_sample_deterministic(spark):
    from seccosql_spark.operators.sampling import hash_sample

    df = spark.createDataFrame([(i,) for i in range(1000)], "id BIGINT")
    a = sorted(r["id"] for r in hash_sample(df, "id", 0.2).collect())
    b = sorted(r["id"] for r in hash_sample(df.repartition(7), "id", 0.2).collect())
    assert a == b                     # layout-independent
    assert 120 < len(a) < 280         # ~20% of 1000


def test_stratified_topk_exact_k(spark):
    from seccosql_spark.operators.sampling import stratified_sample_topk

    df = spark.createDataFrame(
        [(i, "g" + str(i % 3)) for i in range(100)], "id BIGINT, g STRING"
    )
    out = stratified_sample_topk(df, "g", "id", 5)
    counts = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5}


def test_hash_sample_rate_edges(spark):
    from seccosql_spark.operators.sampling import hash_sample

    df = spark.createDataFrame([(i,) for i in range(200)], "id BIGINT")
    assert hash_sample(df, "id", 0.0).count() == 0
    assert hash_sample(df, "id", 1.0).count() == 200
    with pytest.raises(ValueError):
        hash_sample(df, "id", 1.5)


def test_resample_gapfill_dense_grid_and_carry(spark):
    """Empty buckets appear with n_rows=0; sums carry forward per key; rows
    before a key's first observation stay null; the grid is global."""
    from pyspark.sql import functions as F
    from seccosql_spark.operators.asof import resample_gapfill

    df = spark.createDataFrame(
        [  # key, us, value   (bucket = us div 10)
            ("a", 5, 1.0), ("a", 12, 2.0), ("a", 41, 4.0),   # a: buckets 0,1,4
            ("b", 25, 10.0),                                  # b: bucket 2 only
        ],
        "k STRING, us LONG, v DOUBLE",
    )
    out = resample_gapfill(df, "k", "us", "v", bucket_us=10)
    rows = {(r["key"], r["bucket_us"]): (r["n_rows"], r["carried_sum"]) for r in out.collect()}
    # global grid: buckets 0..4 for both keys
    assert len(rows) == 10
    assert rows[("a", 0)] == (1, 1.0)
    assert rows[("a", 10)] == (1, 2.0)
    assert rows[("a", 20)] == (0, 2.0)   # gap: count 0, sum carried
    assert rows[("a", 30)] == (0, 2.0)
    assert rows[("a", 40)] == (1, 4.0)
    assert rows[("b", 0)] == (0, None)   # before b's first observation
    assert rows[("b", 10)] == (0, None)
    assert rows[("b", 20)] == (1, 10.0)
    assert rows[("b", 40)] == (0, 10.0)


def test_resample_gapfill_guards(spark):
    """bucket_us must be positive; an over-wide spine fails loudly instead
    of materializing a giant sequence array."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401
    from seccosql_spark.operators.asof import resample_gapfill

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 10_000_000, 2.0)], "k STRING, us LONG, v DOUBLE"
    )
    with pytest.raises(ValueError, match="bucket_us"):
        resample_gapfill(df, "k", "us", "v", bucket_us=0)
    with pytest.raises(Exception, match="max_buckets"):
        resample_gapfill(df, "k", "us", "v", bucket_us=1, max_buckets=1000).collect()
    # exactly at the cap: fine
    out = resample_gapfill(df, "k", "us", "v", bucket_us=10_000, max_buckets=1001)
    assert out.count() == 1001


def test_resample_gapfill_empty_input_and_negative_epoch(spark):
    """Empty input yields an empty frame (not a null-message raise); a
    negative epoch-us timestamp floors into the bucket BELOW zero, matching
    DuckDB's `//` in the oracle."""
    from seccosql_spark.operators.asof import resample_gapfill

    empty = spark.createDataFrame([], "k STRING, us LONG, v DOUBLE")
    assert resample_gapfill(empty, "k", "us", "v", bucket_us=10).collect() == []
    neg = spark.createDataFrame([("a", -1, 1.0), ("a", 5, 2.0)], "k STRING, us LONG, v DOUBLE")
    out = {r["bucket_us"]: r["n_rows"] for r in resample_gapfill(neg, "k", "us", "v", 10).collect()}
    assert out == {-10: 1, 0: 1}


def test_interval_overlap_pairs_matches_naive(spark):
    """Exactly-once pair emission vs brute force, across bucket widths that
    divide, exceed, and undershoot the durations (incl. same-start ties and
    intervals spanning many buckets)."""
    from seccosql_spark.operators.asof import interval_overlap_pairs

    iv = [
        ("u", 1, 0, 10),  # overlaps 2, 3 (same start as 3)
        ("u", 2, 5, 25),
        ("u", 3, 0, 3),
        ("u", 4, 25, 30),  # touches 2 at boundary only -> NO overlap (half-open)
        ("u", 5, 7, 8),  # nested inside 1 and 2
        ("v", 6, 0, 100),  # other key: long interval, many buckets
        ("v", 7, 99, 101),
        ("v", 8, 101, 102),  # no overlap with 7 (half-open)
    ]
    df = spark.createDataFrame(iv, "k STRING, id BIGINT, s BIGINT, f BIGINT")
    naive = sorted(
        (a[0], min(a[1], b[1]), max(a[1], b[1]), min(a[3], b[3]) - max(a[2], b[2]))
        for a in iv
        for b in iv
        if a[0] == b[0] and a[1] < b[1] and a[2] < b[3] and b[2] < a[3]
    )
    assert naive  # fixture really exercises overlaps
    for width in (1, 3, 7, 64):
        got = interval_overlap_pairs(
            df, on=["k"], id_col="id", start_col="s", finish_col="f", bucket_width=width
        )
        assert rows(got, ["k", "id_lo", "id_hi", "overlap"]) == naive, width
