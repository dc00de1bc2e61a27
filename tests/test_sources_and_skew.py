"""Source/sink surface (SURVEY.md §2.1) + salted-join equivalence."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from seccosql_spark.operators.skew import salted_join


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_from_seq_local_rows(sess):
    """LocalRows (leafOperators.scala:155-168)."""
    df = sess.from_seq([(1, "a"), (2, "b")], "id INT, name STRING")
    assert rows(df.to_spark()) == [(1, "a"), (2, "b")]


def test_from_rdd(sess):
    """RDDRows (leafOperators.scala:134-147) with PK metadata."""
    rdd = sess.spark.sparkContext.parallelize([(1, 2.0), (2, 4.0)])
    df = sess.from_rdd(rdd, "id INT, val DOUBLE", primary_keys=("id",))
    assert df.primary_keys == ("id",)
    assert rows(df.to_spark()) == [(1, 2.0), (2, 4.0)]


def test_create_table_registers_catalog_and_view(sess):
    df = sess.from_seq([(7, 70.0)], "k INT, v DOUBLE")
    df.create_or_replace_table("t_sources_test", primary_keys=("k",))
    assert sess.catalog.primary_keys("t_sources_test") == ("k",)
    assert rows(sess.table("t_sources_test").to_spark()) == [(7, 70.0)]


def test_subquery_alias(sess):
    """SubqueryAlias (unaryOperators.scala:278-289) — delegated alias()."""
    df = sess.from_seq([(1,)], "x INT").alias("sub")
    assert rows(df.to_spark().select(F.col("sub.x"))) == [(1,)]


def test_csv_json_round_trip(sess):
    """File-format connectors the reference lacks entirely (§2.1: 'no file
    format layer') — free through Spark, worth locking in."""
    with tempfile.TemporaryDirectory() as d:
        src = sess.from_seq([(1, "x"), (2, "y")], "id INT, s STRING").to_spark()
        src.write.mode("overwrite").csv(os.path.join(d, "csv"), header=True)
        src.write.mode("overwrite").json(os.path.join(d, "json"))
        csv_back = sess.spark.read.csv(
            os.path.join(d, "csv"),
            header=True,
            schema=T.StructType(
                [T.StructField("id", T.IntegerType()), T.StructField("s", T.StringType())]
            ),
        )
        json_back = sess.spark.read.schema("id INT, s STRING").json(os.path.join(d, "json"))
        assert rows(csv_back) == rows(src)
        assert rows(json_back) == rows(src)


def test_repartition_preserves_results(sess):
    """Partition op (unaryOperators.scala:235-253) maps to df.repartition —
    a pure communication op: results identical, distribution changed."""
    li = sess.table("lineitem")
    direct = li.aggregate(["count(*) AS n"], ["l_suppkey"])
    via_partition = sess.from_spark(li.df.repartition("l_suppkey")).aggregate(
        ["count(*) AS n"], ["l_suppkey"]
    )
    assert rows(direct.to_spark()) == rows(via_partition.to_spark())
    assert via_partition.to_spark().rdd.getNumPartitions() >= 1


def test_salted_join_matches_plain_join(spark):
    """Salting is a pure plan transform: same rows out."""
    left = spark.createDataFrame(
        [(k, i) for k in ("hot", "cold") for i in range(50 if k == "hot" else 2)],
        "k STRING, payload INT",
    )
    right = spark.createDataFrame([("hot", 1.0), ("cold", 2.0), ("never", 3.0)], "k STRING, w DOUBLE")
    plain = left.join(right, "k")
    salted = salted_join(left, right, ["k"], salt_factor=4, left_uniquifier="payload")
    assert rows(salted.select("k", "payload", "w")) == rows(plain.select("k", "payload", "w"))


def test_salted_left_join(spark):
    left = spark.createDataFrame([("a", 1), ("b", 2)], "k STRING, p INT")
    right = spark.createDataFrame([("a", 9.0)], "k STRING, w DOUBLE")
    out = salted_join(left, right, ["k"], how="left", salt_factor=4, left_uniquifier="p")
    got = {(r["k"], r["w"]) for r in out.collect()}
    assert got == {("a", 9.0), ("b", None)}


def test_connectors_module_round_trip(sess):
    """sources/ connectors: csv+json readers with schema + partitioned
    parquet sink (directory layout = partition pruning at read)."""
    import tempfile

    from seccosql_spark import sources

    with tempfile.TemporaryDirectory() as d:
        src = sess.from_seq(
            [(1, "x", "g1"), (2, "y", "g2"), (3, "z", "g1")], "id INT, s STRING, g STRING"
        )
        sources.write_parquet(src, f"{d}/p", partition_by=["g"])
        back = sources.read_parquet(sess, f"{d}/p", name="t_conn", primary_keys=("id",))
        assert back.primary_keys == ("id",)
        assert sess.catalog.primary_keys("t_conn") == ("id",)
        assert sorted(r["id"] for r in back.collect()) == [1, 2, 3]
        # partition pruning: filter on g reads one directory
        import contextlib, io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            back.filter("g = 'g1'").to_spark().explain("formatted")
        assert "PartitionFilters: [isnotnull(g" in buf.getvalue()

        src.to_spark().write.mode("overwrite").csv(f"{d}/c", header=True)
        got = sources.read_csv(sess, f"{d}/c", schema="id INT, s STRING, g STRING")
        assert got.count() == 3
        src.to_spark().write.mode("overwrite").json(f"{d}/j")
        got = sources.read_json(sess, f"{d}/j", schema="id INT, s STRING, g STRING")
        assert got.count() == 3


def test_bucketed_join_has_no_shuffle(sess):
    """bucket_by co-locates both join sides at write time: with broadcast
    disabled, the sort-merge join over two tables bucketed on the join key
    must plan ZERO Exchanges — the cluster-scale answer to the reference's
    pre-partitioned PartitionedRDDRows (dataset.scala pairing)."""
    import contextlib
    import io
    import tempfile

    from seccosql_spark import sources

    spark = sess.spark
    with tempfile.TemporaryDirectory() as d:
        left = sess.from_seq([(i, f"l{i}") for i in range(100)], "k INT, lv STRING")
        right = sess.from_seq([(i, f"r{i}") for i in range(100)], "k INT, rv STRING")
        sources.write_parquet(left, f"{d}/l", bucket_by=(4, ["k"]), table_name="bkt_l")
        sources.write_parquet(right, f"{d}/r", bucket_by=(4, ["k"]), table_name="bkt_r")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = spark.table("bkt_l").join(spark.table("bkt_r"), "k")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, plan
            assert joined.count() == 100
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS bkt_l")
            spark.sql("DROP TABLE IF EXISTS bkt_r")


def test_orc_round_trip(sess):
    """ORC connector: write partitioned, read back, values identical and
    partition pruning available via the directory layout."""
    import tempfile

    from seccosql_spark import sources

    df = sess.spark.table("nation").select("n_nationkey", "n_name", "n_regionkey")
    with tempfile.TemporaryDirectory() as d:
        sources.write_orc(df, f"{d}/o", partition_by=["n_regionkey"])
        got = sources.read_orc(sess, f"{d}/o")
        want = sorted(map(tuple, df.select("n_nationkey", "n_name").collect()))
        have = sorted(map(tuple, got.df.select("n_nationkey", "n_name").collect()))
        assert have == want


def test_write_csv_json_connectors_round_trip(sess):
    """The write_csv/write_json connector verbs (sources/connectors.py)
    round-trip through their matching readers, including a partitioned
    JSON write whose partition column is recovered from the directory."""
    from seccosql_spark.sources import connectors

    with tempfile.TemporaryDirectory() as d:
        src = sess.from_seq(
            [(1, "x", "a"), (2, "y", "a"), (3, "z", "b")], "id INT, s STRING, p STRING"
        ).to_spark()
        connectors.write_csv(src, os.path.join(d, "csv"))
        connectors.write_json(src, os.path.join(d, "json"), partition_by=["p"])
        csv_back = connectors.read_csv(
            sess, os.path.join(d, "csv"), schema="id INT, s STRING, p STRING"
        )
        csv_back = getattr(csv_back, "df", csv_back)
        json_back = sess.spark.read.schema("id INT, s STRING").json(
            os.path.join(d, "json")
        )
        assert rows(csv_back.select("id", "s", "p")) == rows(src)
        assert json_back.count() == 3
        # partition pruning: reading one partition dir sees only its rows
        one = sess.spark.read.schema("id INT, s STRING").json(os.path.join(d, "json", "p=a"))
        assert one.count() == 2


def test_aqe_skew_join_splits_hot_partition(sess):
    """The runtime half of the skew story: `operators/skew.py` salts when
    the hot keys are KNOWN; for unknown skew the engine leans on AQE's
    skew-join, so prove it actually fires here — with thresholds scaled to
    test data, a join whose left side is 90% one key must execute as
    SortMergeJoin(skew=true) reading the hot partition through
    'AQEShuffleRead skewed' (the split that turns one straggler task into
    many advisory-sized ones at any scale)."""
    from pyspark.sql import functions as F

    spark = sess.spark
    tuned = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        left = spark.range(300_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(2_000).select(F.col("id").alias("k"), F.lit("x").alias("v"))
        joined = left.join(right, "k")
        assert len(joined.collect()) == 270_200  # 270k hot-key rows + 200 tail
        # the FINAL adaptive plan of the executed frame, not the static one
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_parquet_schema_evolution_merge(sess):
    """Lake reality: a corpus written over months gains columns. Two parquet
    drops with evolved schemas (v2 adds `quality`) must read back as one
    frame under mergeSchema with NULLs for the missing column, and the scan
    must still push filters/prune columns on the shared prefix."""
    import tempfile

    from pyspark.sql import functions as F

    spark = sess.spark
    with tempfile.TemporaryDirectory() as d:
        spark.range(5).select(F.col("id").alias("doc_id"), F.lit("a").alias("text")) \
            .write.parquet(f"{d}/b1")
        spark.range(5, 8).select(
            F.col("id").alias("doc_id"), F.lit("b").alias("text"),
            F.lit(0.5).alias("quality"),
        ).write.parquet(f"{d}/b2")
        got = (
            spark.read.option("mergeSchema", "true")
            .parquet(f"{d}/b1", f"{d}/b2")
            .filter(F.col("doc_id") >= 3)
        )
        assert set(got.columns) == {"doc_id", "text", "quality"}
        rows = {r["doc_id"]: (r["text"], r["quality"]) for r in got.collect()}
        assert rows == {3: ("a", None), 4: ("a", None),
                        5: ("b", 0.5), 6: ("b", 0.5), 7: ("b", 0.5)}


def test_runtime_bloom_filter_prunes_fact_scan(sess):
    """Runtime row-level filtering: with a selective filter on the dim side
    of a shuffle join, Catalyst injects a Bloom-filter aggregate on the dim
    keys and a might_contain probe into the FACT side's scan stage — rows
    that cannot join are dropped before the shuffle, the 100 TB fact-table
    saver when broadcast is off the table. Pinned here because the engine
    relies on it being ON at scale."""
    import contextlib
    import io
    import tempfile

    from pyspark.sql import functions as F

    spark = sess.spark
    tuned = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        with tempfile.TemporaryDirectory() as d:
            spark.range(200_000).select(
                F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("pad")
            ).write.parquet(f"{d}/fact")
            spark.range(100_000).select(
                F.col("id").alias("k"), (F.col("id") % 100).alias("g")
            ).write.parquet(f"{d}/dim")
            fact = spark.read.parquet(f"{d}/fact")
            dim = spark.read.parquet(f"{d}/dim").filter("g = 7")
            joined = fact.join(dim, "k")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "bloom_filter_agg" in plan, plan
            assert "might_contain" in plan, plan
            assert joined.count() == 1_000  # ids with id % 100 == 7
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_connectors_accept_df_named_column(sess):
    """Regression: a SeccoDataFrame whose schema contains a column literally
    named "df" (e.g. an inverted index's document-frequency) must still
    round-trip through the connectors and create_table — Spark DataFrame
    attribute access resolves column names, so `getattr(df, "df", df)` would
    hand the writer a Column instead of the frame."""
    import tempfile

    from seccosql_spark import sources

    with tempfile.TemporaryDirectory() as d:
        src = sess.from_seq([(1, 5), (2, 7)], "term INT, df INT")
        sources.write_parquet(src, f"{d}/p")
        back = sources.read_parquet(sess, f"{d}/p")
        assert sorted((r["term"], r["df"]) for r in back.collect()) == [(1, 5), (2, 7)]
        sources.write_json(src, f"{d}/j")
        sources.write_csv(src, f"{d}/c")
        sources.write_orc(src, f"{d}/o")
        assert sources.read_orc(sess, f"{d}/o").count() == 2
        sess.create_table("t_df_col", src)
        assert sess.spark.table("t_df_col").count() == 2


def test_create_empty_dataset(sess):
    """Reference SeccoSession.scala:64 createEmptyDataset: zero rows, the
    declared schema, and usable downstream (union with data, joins)."""
    e = sess.create_empty_dataset("id INT, name STRING")
    assert e.count() == 0
    assert [f.name for f in e.df.schema.fields] == ["id", "name"]
    got = e.union_all(sess.from_seq([(1, "a")], "id INT, name STRING")).collect()
    assert [tuple(r) for r in got] == [(1, "a")]
    assert sess.createEmptyDataset("x INT").count() == 0  # camelCase twin
