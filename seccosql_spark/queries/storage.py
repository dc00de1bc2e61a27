"""Persisted storage-layout rows: the write-side decisions that make 100 TB
reads cheap — directory partition pruning and bucketed co-located joins.
Both follow the ann_index_persisted build-once/probe-many pattern: the
artifact is written once per corpus (cached on disk / in the session
catalog), and the registered query is the PROBE whose plan must show the
payoff (partition filters at the scan; a shuffle-free join). The plan
contracts are pinned in tests/test_storage_layout.py; the oracles replay
the semantics from the raw tables (the layout is a pure reorganization, so
the answer is layout-independent by definition).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from seccosql_spark.registration import register
from seccosql_spark.session import SeccoSession

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"

PARTITION_PRUNED_ORACLE = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum({_CENTS}) AS BIGINT) AS cents
FROM orders
WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
GROUP BY o_orderpriority
"""


def _orders_month_dir(sess: SeccoSession) -> str:
    """orders re-written PARTITIONED BY month (build-once, keyed by source
    file + this module's code): the ingest-time layout decision that turns
    every month-ranged query into a directory prune instead of a full
    scan."""
    import seccosql_spark.queries.storage as _self
    from seccosql_spark.operators.artifact import build_once
    from seccosql_spark.sources.connectors import write_parquet

    spark = sess.spark
    orders = spark.table("orders")
    src = sorted(orders.inputFiles())[0]
    return build_once(
        "secco_orders_month",
        (src, "month"),
        lambda d: write_parquet(
            orders.withColumn(
                "o_month", F.date_format("o_orderdate", "yyyy-MM")
            ),
            d,
            partition_by=("o_month",),
        ),
        code=(_self,),
    )


@register("orders_partition_pruned", PARTITION_PRUNED_ORACLE)
def orders_partition_pruned(sess: SeccoSession):
    """Directory-partition pruning — the first storage-layout lever at
    100 TB: orders persisted partitioned by order month (build-once,
    `_orders_month_dir`), probed for ONE month. The probe's scan carries
    the month equality as a PartitionFilter, so Spark lists and reads
    exactly one partition directory out of ~80 months — the scan cost is
    the month's share of the table, not the table
    (test_storage_layout.py pins PartitionFilters + the pruned partition
    count). The oracle replays the month filter on the raw table: a
    layout is a pure reorganization, so the answer is layout-independent.
    Revenue in exact cents (floor(x*100+0.5), the shared discipline)."""
    spark = sess.spark
    path = _orders_month_dir(sess)
    probe = (
        spark.read.parquet(path)
        .where(F.col("o_month") == "1995-03")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.expr(_CENTS)).cast("long").alias("cents"),
        )
    )
    return sess.from_spark(probe)


BUCKETED_JOIN_ORACLE = f"""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""

_BUCKETS = 8


def _bucketed_tables(sess: SeccoSession) -> tuple[str, str]:
    """orders and lineitem persisted as BUCKETED tables (bucketBy + sortBy
    o_orderkey/l_orderkey, same bucket count) — the co-location contract
    that lets every future orderkey join run with ZERO exchange on either
    side. Built once per (SparkSession, corpus): bucketing metadata lives
    in the session catalog, so a fresh driver session rebuilds (cheap —
    one shuffle-free write per table); within a session every probe reuses
    the tables."""
    import seccosql_spark.queries.storage as _self
    from seccosql_spark.operators.artifact import artifact_key
    from seccosql_spark.sources.connectors import write_parquet

    spark = sess.spark
    orders = spark.table("orders")
    src = sorted(orders.inputFiles())[0]
    # table names carry the code-aware key too: a builder edit creates new
    # catalog entries instead of reusing a stale bucketing layout
    key = artifact_key((src, f"b{_BUCKETS}"), code=(_self,))[:12]
    names = (f"secco_bkt_orders_{key}", f"secco_bkt_lineitem_{key}")
    base = os.path.join(tempfile.gettempdir(), f"secco_bkt_{key}")
    for name, df, col in (
        (names[0], orders, "o_orderkey"),
        (names[1], spark.table("lineitem"), "l_orderkey"),
    ):
        if not spark.catalog.tableExists(name):
            write_parquet(
                df.repartition(_BUCKETS, col).sortWithinPartitions(col),
                os.path.join(base, name),
                bucket_by=(_BUCKETS, (col,)),
                table_name=name,
            )
    return names


@register("orders_bucketed_join", BUCKETED_JOIN_ORACLE)
def orders_bucketed_join(sess: SeccoSession):
    """Bucketed co-located join — the second storage-layout lever: orders
    and lineitem persisted bucketed+sorted on the join key with matching
    bucket counts (`_bucketed_tables`), then joined. Because both scans
    already satisfy the join's required hash distribution, the
    SortMergeJoin runs with NO Exchange on either input — the only shuffle
    in the plan is the final per-priority aggregation
    (test_storage_layout.py pins exactly that). At 100 TB this is the
    difference between a join that moves both tables over the network
    every query and one that moves nothing: the shuffle was paid once at
    write time and amortized over every subsequent join on the key.
    Oracle replays the join on the raw tables (layout-independent
    answer); revenue in exact cents."""
    spark = sess.spark
    t_orders, t_lineitem = _bucketed_tables(sess)
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    # merge hint: at test SFs the planner would otherwise broadcast the
    # (tiny) orders side, which ignores bucketing entirely — the row
    # demonstrates the co-located SMJ shape that holds when BOTH sides are
    # beyond broadcast range, i.e. the 100 TB case
    out = (
        o.join(li.hint("merge"), o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
            .cast("long")
            .alias("cents"),
        )
    )
    return sess.from_spark(out)


def _hrw_hash_sql(nchars: int = 15) -> str:
    from seccosql_spark.operators.hexint import hex_prefix_int_sql

    return hex_prefix_int_sql("hx", nchars)


RENDEZVOUS_ORACLE = f"""
WITH keys AS (SELECT o_orderkey AS key FROM orders),
sp AS (SELECT key, s,
              md5(CAST(key AS VARCHAR) || '|' || CAST(s AS VARCHAR)) AS hx
       FROM keys, range(9) t(s)),
hv AS (SELECT key, s, {_hrw_hash_sql()} AS h FROM sp),
a9 AS (SELECT key, s AS shard9 FROM hv
       QUALIFY row_number() OVER (PARTITION BY key
                                  ORDER BY h DESC, s DESC) = 1),
a8 AS (SELECT key, s AS shard8 FROM hv WHERE s < 8
       QUALIFY row_number() OVER (PARTITION BY key
                                  ORDER BY h DESC, s DESC) = 1),
j AS (SELECT a8.key AS key, shard8, shard9 FROM a8 JOIN a9 USING (key)),
per AS (SELECT CAST(shard8 AS INT) AS shard,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved_hrw,
               CAST(sum(CASE WHEN key % 9 <> key % 8 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved_mod
        FROM j GROUP BY shard8),
tot AS (SELECT CAST(sum(n_keys) AS BIGINT) AS n,
               CAST(sum(n_moved_hrw) AS BIGINT) AS mh,
               CAST(sum(n_moved_mod) AS BIGINT) AS mm
        FROM per)
SELECT shard, n_keys, n_moved_hrw, n_moved_mod,
       (20 * mh > n AND 5 * mh < n) AS moved_frac_ok,
       (4 * mh < mm) AS hrw_beats_mod
FROM per CROSS JOIN tot
"""


@register("shard_rendezvous_stability", RENDEZVOUS_ORACLE)
def shard_rendezvous_stability(sess: SeccoSession):
    """Rendezvous (highest-random-weight) sharding with a scale-out
    stability audit — the shard-assignment discipline for a 100 TB corpus
    whose shard count must grow without a full reshuffle. Each key's shard
    is argmax over shards of md5(key|shard) (Thaler-Ravishankar HRW); the
    row computes the assignment at K=8 AND K=9 and reports, per K=8
    shard: key count, how many keys HRW relocates when shard 8 joins
    (provably only TO the new shard, expected fraction 1/9), and how many
    keys naive key%K sharding would relocate (expected 8/9 — the
    disaster HRW exists to avoid). Two global verdict columns pin the
    property in-query: the HRW moved fraction sits in (1/20, 1/5) and
    beats mod-sharding by >4x, both as integer cross-multiplications.

    Scale shape: the 9 per-key hashes ride the task closure as an array
    of (hash, shard) structs — argmax at K=9 and at K=8 (a slice of the
    same array) in ONE map-only codegen projection, no join between the
    two assignments; then one 8-group aggregate plus a broadcast of the
    3-number total. The mod comparison is free arithmetic on the same
    pass."""
    spark = sess.spark
    keys = spark.table("orders").select(F.col("o_orderkey").alias("key"))

    def h(s: int):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("key").cast("string"), F.lit(str(s))
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")

    arr = F.array(
        *[F.struct(h(s).alias("h"), F.lit(s).alias("s")) for s in range(9)]
    )
    asg = keys.select(
        "key",
        F.array_max(F.slice(arr, 1, 8))["s"].alias("shard8"),
        F.array_max(arr)["s"].alias("shard9"),
    )
    per = asg.groupBy(F.col("shard8").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.when(F.col("shard9") != F.col("shard8"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved_hrw"),
        F.sum(F.when(F.col("key") % 9 != F.col("key") % 8, 1).otherwise(0))
        .cast("long")
        .alias("n_moved_mod"),
    )
    tot = per.agg(
        F.sum("n_keys").cast("long").alias("n"),
        F.sum("n_moved_hrw").cast("long").alias("mh"),
        F.sum("n_moved_mod").cast("long").alias("mm"),
    )
    out = per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_keys",
        "n_moved_hrw",
        "n_moved_mod",
        ((20 * F.col("mh") > F.col("n")) & (5 * F.col("mh") < F.col("n"))).alias(
            "moved_frac_ok"
        ),
        (4 * F.col("mh") < F.col("mm")).alias("hrw_beats_mod"),
    )
    return sess.from_spark(out)
