"""File-format connectors: parquet / csv / json / orc / binaryFile in,
parquet / orc / csv / json out.

Scale notes: all readers return plain scan DataFrames, so Catalyst owns
split planning (`spark.sql.files.maxPartitionBytes`), predicate pushdown and
column pruning; `write_parquet` supports `partition_by` (directory layout =
partition pruning at read) and `bucket_by` (co-located joins without a
shuffle when both sides are bucketed on the join key — the engine's answer
to the reference's pre-partitioned `PartitionedRDDRows`)."""

from __future__ import annotations

from collections.abc import Sequence
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:
    from seccosql_spark.session import SeccoSession


def _register(sess: "SeccoSession", df: DataFrame, name: str | None, pks: Sequence[str]):
    from seccosql_spark.dataframe import SeccoDataFrame

    if name:
        sess.create_table(name, df, primary_keys=tuple(pks))
    return SeccoDataFrame(sess, df, primary_keys=tuple(pks))


def read_parquet(
    sess: "SeccoSession",
    path: str,
    name: str | None = None,
    primary_keys: Sequence[str] = (),
):
    return _register(sess, sess.spark.read.parquet(path), name, primary_keys)


def read_orc(
    sess: "SeccoSession",
    path: str,
    name: str | None = None,
    primary_keys: Sequence[str] = (),
):
    """ORC scan — same pushdown/pruning properties as parquet (columnar,
    predicate pushdown via ORC's min/max indexes)."""
    return _register(sess, sess.spark.read.orc(path), name, primary_keys)


def read_csv(
    sess: "SeccoSession",
    path: str,
    schema: str | None = None,
    header: bool = True,
    name: str | None = None,
    primary_keys: Sequence[str] = (),
):
    """Explicit schema strongly preferred — inference scans the data twice
    and infers permissive types."""
    reader = sess.spark.read
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return _register(
        sess, reader.csv(path, header=header), name, primary_keys
    )


def read_json(
    sess: "SeccoSession",
    path: str,
    schema: str | None = None,
    name: str | None = None,
    primary_keys: Sequence[str] = (),
):
    reader = sess.spark.read
    if schema:
        reader = reader.schema(schema)
    return _register(sess, reader.json(path), name, primary_keys)


def read_binary_files(
    sess: "SeccoSession",
    path: str,
    glob: str | None = None,
    name: str | None = None,
):
    """Opaque media-file scan via Spark's built-in `binaryFile` source:
    (path, modificationTime, length, content) per file. The 100 TB media
    ingestion path — `pathGlobFilter` prunes the listing before any byte is
    read, split planning is per-file under
    `spark.sql.files.maxPartitionBytes`, and metadata-only queries
    (path/length) never deserialize `content`. Pair with
    `operators.multimodal.decode_*` for Arrow-batched decode."""
    reader = sess.spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return _register(sess, reader.load(path), name, ())


def write_parquet(
    df,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    bucket_by: tuple[int, Sequence[str]] | None = None,
    table_name: str | None = None,
) -> None:
    """Parquet sink. `partition_by` → directory partition pruning;
    `bucket_by=(n, cols)` → bucketed table (requires `table_name`, uses
    saveAsTable) for shuffle-free co-located joins."""
    sdf = df if isinstance(df, DataFrame) else df.df
    writer = sdf.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucket_by requires table_name (saveAsTable)")
        writer.bucketBy(n, *cols).option("path", path).saveAsTable(table_name)
        return
    writer.parquet(path)


def write_orc(
    df,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """ORC sink with optional directory partitioning."""
    sdf = df if isinstance(df, DataFrame) else df.df
    writer = sdf.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(
    df,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    partition_by: Sequence[str] = (),
) -> None:
    """CSV sink (header on by default, matching `read_csv`'s expectation);
    optional directory partitioning for pruning at read."""
    sdf = df if isinstance(df, DataFrame) else df.df
    writer = sdf.write.mode(mode).option("header", str(header).lower())
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.csv(path)


def write_json(
    df,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """JSON-lines sink; optional directory partitioning."""
    sdf = df if isinstance(df, DataFrame) else df.df
    writer = sdf.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
