"""Source/sink connectors. The reference has NO file-format layer (SURVEY.md
§2.1: ingestion only from Seqs/RDDs/DataFrames); this engine adds the
standard Spark sources as first-class connectors with PK metadata plumbed
into the side catalog."""

from seccosql_spark.sources.connectors import (
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)

__all__ = [
    "read_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "read_binary_files",
    "write_parquet",
    "write_csv",
    "write_json",
    "write_orc",
]
