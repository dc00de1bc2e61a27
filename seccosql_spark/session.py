"""SeccoSession — the engine entry point, wrapping a SparkSession.

Reference parity: ``SeccoSession.scala:18-99`` (entry point holding parser /
analyzer / optimizer / catalog) and the singleton ``currentSession``
(``SeccoSession.scala:119-134``). In this rebuild the SparkSession IS the
parser+analyzer+optimizer+executor; the session contributes:

- dialect-extended ``sql()`` (``WITH RECURSIVE(n)``, ``UNION BYUPDATE``,
  ``MATCH`` — SURVEY.md §2.6),
- dataset creation from local rows / RDDs / Spark DataFrames
  (``SeccoDataFrame.fromSeq/fromRDD/fromSparkSQL``,
  ``SeccoDataFrame.scala:421-503``),
- the side catalog carrying primary-key metadata for PK-FK join reordering
  (``catalog/interface.scala:99-104``).
"""

from __future__ import annotations

import os
import threading
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from seccosql_spark.catalog import SideCatalog, TableStats

# TPC-H-ish tables the driver materializes (TESTDATA.md) with their natural
# primary keys — registered when `load_dir` is used so PK-FK reordering and
# tests have key metadata available.
_TESTDATA_PKS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

TESTDATA_TABLES = tuple(_TESTDATA_PKS)


def _ship_package(spark: SparkSession) -> None:
    """Make `seccosql_spark` importable on executor Python workers.

    Closures inside applyInPandas/mapInPandas reference module-level
    functions BY REFERENCE (cloudpickle), so workers must import the
    package. Workers only see the driver's cwd, not its sys.path — if the
    driver process runs from outside the repo, unpickling fails with
    ModuleNotFoundError. Shipping a zip via addPyFile puts the package on
    every worker's sys.path regardless of cwd (and would also work on a
    real multi-node cluster, where workers share nothing with the driver).
    """
    sc = spark.sparkContext
    if getattr(sc, "_secco_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"seccosql_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.join(
                            "seccosql_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    sc.addPyFile(zpath)
    sc._secco_pkg_shipped = True


class SeccoSession:
    """Engine session: a SparkSession plus dialect SQL and a PK-aware catalog."""

    _current: "SeccoSession | None" = None
    _lock = threading.Lock()

    def __init__(self, spark: SparkSession | None = None) -> None:
        self.spark = spark or self.default_spark()
        # Data-generation robustness: nanosAsLong tolerates TIMESTAMP(NANOS)
        # parquet (some driver generations; a no-op on the current
        # TIMESTAMP(MICROS) files), and a UTC session timezone makes
        # TIMESTAMP_NTZ <-> TIMESTAMP casts and date extraction
        # engine-portable (DuckDB treats naive timestamps as UTC).
        # NOTE: these are SESSION-level confs set on the (possibly
        # externally-provided) SparkSession — a caller sharing that session
        # keeps any timezone they explicitly set to a NON-JVM-default value
        # (we warn instead of overriding); an unset timezone is pinned to
        # UTC. Caveat: Spark resolves an unset conf to the JVM default, so
        # an explicit set EQUAL to the JVM default is indistinguishable
        # from unset and is also pinned to UTC.
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        tz = self.spark.conf.get("spark.sql.session.timeZone", None)
        jvm_default = (
            self.spark.sparkContext._jvm.java.util.TimeZone.getDefault().getID()
            if self.spark.sparkContext._jvm is not None
            else None
        )
        if tz in (None, "", jvm_default):
            # unset (Spark reports the JVM default when nothing was chosen)
            self.spark.conf.set("spark.sql.session.timeZone", "UTC")
        elif tz != "UTC":
            import warnings

            warnings.warn(
                f"SeccoSession: keeping caller-set session timezone {tz!r}; "
                "engine oracles/timestamps assume UTC — set "
                "spark.sql.session.timeZone=UTC for engine-portable results",
                stacklevel=2,
            )
        _ship_package(self.spark)
        self.catalog = SideCatalog()

    # -- session management (reference: SeccoSession.currentSession singleton) --

    @classmethod
    def get_or_create(cls, spark: SparkSession | None = None) -> "SeccoSession":
        with cls._lock:
            if cls._current is None:
                cls._current = cls(spark)
            return cls._current

    @staticmethod
    def default_spark(app_name: str = "seccosql_spark") -> SparkSession:
        return (
            SparkSession.builder.master("local[*]")
            .appName(app_name)
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )

    def stop(self) -> None:
        self.spark.stop()
        with SeccoSession._lock:
            if SeccoSession._current is self:
                SeccoSession._current = None

    # -- dataset creation (SeccoDataFrame.fromSeq/fromRDD/fromSparkSQL) --

    def from_seq(self, rows: Iterable, schema=None) -> "SeccoDataFrame":
        """Local rows -> dataset (reference ``LocalRows``, leafOperators.scala:155-168)."""
        from seccosql_spark.dataframe import SeccoDataFrame

        return SeccoDataFrame(self, self.spark.createDataFrame(rows, schema=schema))

    def create_empty_dataset(self, schema) -> "SeccoDataFrame":
        """Zero-row dataset with a declared schema (reference
        ``SeccoSession.scala:64`` ``createEmptyDataset`` — the last API-table
        row without a named twin; was covered by ``from_seq([], schema)``)."""
        return self.from_seq([], schema)

    createEmptyDataset = create_empty_dataset

    def from_rdd(self, rdd, schema, primary_keys: tuple[str, ...] = ()) -> "SeccoDataFrame":
        """Distributed rows -> dataset (reference ``RDDRows``, leafOperators.scala:134-147)."""
        from seccosql_spark.dataframe import SeccoDataFrame

        df = self.spark.createDataFrame(rdd, schema=schema)
        return SeccoDataFrame(self, df, primary_keys=primary_keys)

    def from_spark(self, df: DataFrame, primary_keys: tuple[str, ...] = ()) -> "SeccoDataFrame":
        """Adopt a SparkSQL DataFrame (reference ``SeccoDataFrame.scala:421-454``)."""
        from seccosql_spark.dataframe import SeccoDataFrame

        return SeccoDataFrame(self, df, primary_keys=primary_keys)

    def table(self, name: str) -> "SeccoDataFrame":
        """Named relation from the catalog (reference ``Relation``, leafOperators.scala:121-126)."""
        from seccosql_spark.dataframe import SeccoDataFrame

        return SeccoDataFrame(
            self, self.spark.table(name), primary_keys=self.catalog.primary_keys(name)
        )

    # -- table registration --

    def create_table(
        self,
        name: str,
        df: DataFrame | "SeccoDataFrame",
        primary_keys: tuple[str, ...] | list[str] = (),
    ) -> None:
        """Register a (Secco)DataFrame as a temp view + side-catalog entry
        (reference ``createOrReplaceTable``, SeccoDataFrame.scala:64-67)."""
        sdf = df if isinstance(df, DataFrame) else df.df
        sdf.createOrReplaceTempView(name)
        self.catalog.register(name, primary_keys=primary_keys)

    def load_parquet(
        self, path: str, name: str | None = None, primary_keys: tuple[str, ...] = ()
    ) -> "SeccoDataFrame":
        df = self.spark.read.parquet(path)
        if name:
            self.create_table(name, df, primary_keys)
        return self.from_spark(df, primary_keys=primary_keys)

    def load_dir(self, sf_dir: str, tables: Iterable[str] = TESTDATA_TABLES) -> None:
        """Register every testdata table under `sf_dir` as a temp view with PK metadata."""
        for t in tables:
            self.load_parquet(f"{sf_dir}/{t}.parquet", name=t, primary_keys=_TESTDATA_PKS.get(t, ()))

    def analyze_table(self, name: str, columns: Iterable[str] = ()) -> TableStats:
        """Compute row count (+ per-column approx NDV) into the side catalog —
        the analog of the reference's StatisticComputer
        (``execution/statsComputation/*``); feeds the GHD planner's ordering."""
        from pyspark.sql import functions as F

        df = self.spark.table(name)
        aggs = [F.count(F.lit(1)).alias("__rc")]
        cols = list(columns)
        aggs += [F.approx_count_distinct(c).alias(f"__ndv_{c}") for c in cols]
        row = df.agg(*aggs).collect()[0]
        meta = self.catalog.get(name) or self.catalog.register(name)
        meta.stats.row_count = row["__rc"]
        for c in cols:
            meta.stats.ndv[c] = row[f"__ndv_{c}"]
        return meta.stats

    def analyze_max_frequency(self, name: str, column: str) -> "TableStats":
        """Heavy-hitter statistic: the row count of `column`'s hottest value,
        into the side catalog. One aggregation (groupBy + max). Feeds
        ``plans.stats.join_skew_ceiling`` / ``choose_multiway_algorithm`` —
        the skew evidence that routes adversarial cyclic joins to the
        worst-case-optimal path (WCOJ_BOUNDARY.md)."""
        from pyspark.sql import functions as F

        row = (
            self.spark.table(name)
            .groupBy(column)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(F.max("__c").alias("__m"))
            .collect()[0]
        )
        meta = self.catalog.get(name) or self.catalog.register(name)
        meta.stats.max_freq[column] = int(row["__m"] or 0)
        return meta.stats

    def analyze_histogram(self, name: str, column: str, bins: int = 32) -> "TableStats":
        """Equi-height histogram (+ per-bin distinct counts) for a numeric
        column into the side catalog (reference
        ``HistogramStatisticComputer`` / ``statsEstimation/histogram``
        tier); two aggregation jobs at ANALYZE time. Feeds
        ``plans.stats.estimate_range_selectivity`` and
        ``estimate_equality_selectivity``."""
        from seccosql_spark.plans.stats import build_histogram

        meta = self.catalog.get(name) or self.catalog.register(name)
        meta.stats.histograms[column] = build_histogram(self.spark.table(name), column, bins)
        return meta.stats

    # -- SQL entry point (reference SeccoSession.sql, SeccoSession.scala:89-91) --

    def sql(self, text: str) -> "SeccoDataFrame":
        """Run SQL with the three dialect extensions the reference adds over
        standard SQL (SURVEY.md §2.6): ``WITH RECURSIVE(n)``, ``UNION
        BYUPDATE``, graph ``MATCH``. Standard SQL passes straight to
        ``spark.sql`` so Catalyst owns the whole lifecycle."""
        from seccosql_spark.dataframe import SeccoDataFrame
        from seccosql_spark.sql.preprocessor import execute_dialect_sql

        return SeccoDataFrame(self, execute_dialect_sql(self, text))
