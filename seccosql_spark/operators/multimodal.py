"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake behind ``decode_image_stub`` (clearly marked; swap the
function body for PIL/ffmpeg in a real deployment). Everything AROUND the
decode — the binary column handling, the Arrow-batched ``mapInPandas``
plumbing, the output schema, partition-parallel batch shape — is real and
tested; that is the part that matters for the 100 TB design:

- payloads travel as Spark ``BinaryType`` columns (parquet binary — column
  pruning means metadata-only queries never read the bytes);
- decode/feature-extract runs in ``mapInPandas`` so each Arrow batch is
  processed vectorized in one Python call, not per-row;
- the decode output is a flat typed schema, so downstream ops are ordinary
  JVM-side expressions again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Materialize an opaque binary payload column + media metadata struct.
    (Testdata has no real media, so the payload is the utf-8 text bytes —
    the schema/plumbing is what's under test.)"""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """STUB decode — deterministic fake standing in for a real image decoder.

    Real deployments replace this with PIL/libvips; the surrounding Spark
    plumbing does not change. Raises nothing, returns (n_bytes, width,
    height, format) purely from the byte content.
    """
    n = len(payload)
    first = payload[0] if n else 0
    return n, 64 + (n % 640), 48 + (first % 480), "fake"


def decode_image_stub(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas: one Python call per batch,
    vectorized pandas ops inside, flat typed schema out."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": decoded.map(lambda t: t[0]).astype("int32"),
                    "width": decoded.map(lambda t: t[1]).astype("int32"),
                    "height": decoded.map(lambda t: t[2]).astype("int32"),
                    "format": decoded.map(lambda t: t[3]),
                }
            )

    return with_payload.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample_stub(with_payload: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """STUB frame sampler (video analog): emits one row per sampled 'frame'
    offset — demonstrates the 1-to-N mapInPandas shape for frame extraction."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for off in range(0, len(payload), every_n_bytes):
                    rows.append((doc_id, off, int(payload[off])))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_offset", "sample_value"])

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_offset", T.IntegerType()),
            T.StructField("sample_value", T.IntegerType()),
        ]
    )
    return with_payload.mapInPandas(sample, schema)
