"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode tiers:

- ``decode_image`` — a REAL image decoder for uncompressed formats that
  need no external codec: netpbm P6/P5 (PPM/PGM) and 24-bit BI_RGB BMP,
  parsed header-and-raster in pure Python + vectorized numpy inside
  Arrow-batched ``mapInPandas``. ``encode_ppm`` / ``encode_bmp`` /
  ``encode_pgm`` are the matching writers (used to synthesize
  deterministic test images).
- ``decode_audio`` — a REAL audio decoder for RIFF/WAVE PCM16: a proper
  chunk walk (LIST/fact chunks, word alignment), fmt parse, and a
  numpy-folded sample sum; ``encode_wav`` is the matching writer.
- ``decode_image_stub`` — the original deterministic fake, kept for the
  formats that DO need external codecs (JPEG/PNG/video); swap its body for
  PIL/libvips/ffmpeg in a real deployment.

Everything around the decode — the binary column handling, the
Arrow-batched ``mapInPandas`` plumbing, the output schema,
partition-parallel batch shape — is shared by both tiers and is the part
that matters for the 100 TB design:

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


# ----------------------------------------------------------- real codecs

def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (netpbm P6, maxval 255): `pixels` is row-major RGB,
    len == width*height*3."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"P6 needs {width * height * 3} pixel bytes, got {len(pixels)}")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def encode_pgm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PGM (netpbm P5, maxval 255): row-major grayscale bytes."""
    if len(pixels) != width * height:
        raise ValueError(f"P5 needs {width * height} pixel bytes, got {len(pixels)}")
    return b"P5\n%d %d\n255\n" % (width, height) + pixels


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER, BI_RGB): `pixels` is
    row-major TOP-DOWN RGB; the writer flips to BMP's bottom-up BGR rows and
    pads each row to 4 bytes, like any real encoder."""
    import struct

    if len(pixels) != width * height * 3:
        raise ValueError(f"BMP needs {width * height * 3} pixel bytes, got {len(pixels)}")
    row_stride = (3 * width + 3) & ~3
    raster = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = pixels[y * width * 3 : (y + 1) * width * 3]
        bgr = bytearray(len(row))
        bgr[0::3], bgr[1::3], bgr[2::3] = row[2::3], row[1::3], row[0::3]
        raster += bgr + b"\x00" * (row_stride - 3 * width)
    file_size = 14 + 40 + len(raster)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + dib + bytes(raster)


def _parse_netpbm(payload: bytes) -> tuple[int, int, str, "object"]:
    """Parse binary PPM (P6) / PGM (P5): whitespace-separated header tokens
    with '#' comments, then the raster. Returns (width, height, fmt,
    uint8-ndarray of samples)."""
    import numpy as np

    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then the raster
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    channels = 3 if payload[:2] == b"P6" else 1
    n = width * height * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return width, height, ("ppm" if channels == 3 else "pgm"), raster


def _parse_bmp(payload: bytes) -> tuple[int, int, str, "object"]:
    """Parse 24-bit BI_RGB BMP: fixed little-endian headers, bottom-up
    4-byte-padded BGR rows. Returns (width, height, 'bmp', uint8-ndarray of
    the pixel samples with row padding stripped)."""
    import struct

    import numpy as np

    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size, width, height = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if dib_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB BMP supported (dib={dib_size}, bpp={bpp})")
    height = abs(height)  # top-down BMPs store negative height
    row_stride = (3 * width + 3) & ~3
    raster = (
        np.frombuffer(payload, dtype=np.uint8, count=row_stride * height, offset=data_offset)
        .reshape(height, row_stride)[:, : 3 * width]
    )
    return width, height, "bmp", raster


def decode_image_bytes(payload: bytes) -> tuple[int, int, str, int, int]:
    """REAL single-image decode: sniff magic, parse header + raster, return
    (width, height, format, n_pixels, pixel_sum). pixel_sum is the sum of
    all decoded samples — orientation/channel-order invariant, so PPM and
    BMP encodings of the same image agree on it."""
    if payload[:2] in (b"P6", b"P5"):
        width, height, fmt, raster = _parse_netpbm(payload)
    elif payload[:2] == b"BM":
        width, height, fmt, raster = _parse_bmp(payload)
    else:
        raise ValueError(f"unsupported image magic {payload[:2]!r}")
    return width, height, fmt, width * height, int(raster.astype("int64").sum())


DECODED_REAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def decode_image(with_payload: DataFrame) -> DataFrame:
    """Real-codec decode over Arrow-batched mapInPandas: one Python call per
    batch, numpy-vectorized raster math per image, flat typed schema out.
    Input needs (doc_id, payload). Scale shape is identical to the stub
    path: binary columns stream batch-wise through Python once; everything
    downstream is JVM-side again."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [decode_image_bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([o[0] for o in out], dtype="int32"),
                    "height": pd.Series([o[1] for o in out], dtype="int32"),
                    "n_bytes": pd.Series([len(p) for p in pdf["payload"]], dtype="int32"),
                    "format": [o[2] for o in out],
                    "pixel_sum": pd.Series([o[4] for o in out], dtype="int64"),
                }
            )

    return with_payload.mapInPandas(decode_batches, DECODED_REAL_SCHEMA)


def synthesize_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic image payloads for the differential gate:
    per doc, width = 4 + id%5, height = 3 + id%4, sample (y, x, c) =
    (id*31 + y*7 + x*3 + c) % 256; ids cycle through ALL THREE real
    codecs — id%3 == 0 PPM, == 1 BMP (3-channel RGB), == 2 PGM (grayscale,
    the c=0 plane only) — so one driver row exercises every writer+parser
    pair. The closed-form pixel rule is what lets a SQL oracle predict
    pixel_sum without a codec."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                w, h = 4 + d % 5, 3 + d % 4
                ch = 1 if d % 3 == 2 else 3
                idx = np.arange(h * w * ch, dtype=np.int64)
                y, rem = idx // (w * ch), idx % (w * ch)
                x, c = rem // ch, rem % ch
                px = ((d * 31 + y * 7 + x * 3 + c) % 256).astype(np.uint8).tobytes()
                enc = (encode_ppm, encode_bmp, encode_pgm)[d % 3]
                payloads.append(enc(w, h, px))
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return df.select(id_col).mapInPandas(gen, schema)


# ----------------------------------------------------------- audio (WAV)

def encode_wav(sample_rate: int, channels: int, pcm16: bytes) -> bytes:
    """Canonical RIFF/WAVE PCM16 writer: 44-byte header (fmt chunk with
    block align / byte rate derived like any real encoder) + the
    little-endian int16 sample payload."""
    import struct

    if len(pcm16) % (2 * channels):
        raise ValueError(
            f"PCM payload ({len(pcm16)} bytes) must be whole {channels}-channel frames"
        )
    block_align = 2 * channels
    byte_rate = sample_rate * block_align
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm16))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, 16)
        + b"data"
        + struct.pack("<I", len(pcm16))
        + pcm16
    )


def decode_audio_bytes(payload: bytes) -> tuple[int, int, int, int]:
    """REAL single-clip WAV decode: walk the RIFF chunk list (not a fixed
    44-byte offset — real files carry LIST/fact chunks too), parse the fmt
    chunk, then fold the PCM16 data chunk. Returns (sample_rate, channels,
    n_frames, amp_sum) with amp_sum = exact signed int sum of every
    sample — order-invariant and engine-exact."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload: {payload[:12]!r}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return sample_rate, channels, len(samples) // channels, int(samples.astype("int64").sum())


DECODED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("amp_sum", T.LongType()),
    ]
)


def decode_audio(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched WAV decode over mapInPandas — the audio sibling of
    decode_image, same scale shape (binary columns stream through Python
    once, numpy-vectorized sample math, flat typed schema out)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [decode_audio_bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series([o[0] for o in out], dtype="int32"),
                    "channels": pd.Series([o[1] for o in out], dtype="int32"),
                    "n_frames": pd.Series([o[2] for o in out], dtype="int32"),
                    "n_bytes": pd.Series([len(p) for p in pdf["payload"]], dtype="int32"),
                    "amp_sum": pd.Series([o[3] for o in out], dtype="int64"),
                }
            )

    return with_payload.mapInPandas(decode_batches, DECODED_AUDIO_SCHEMA)


def synthesize_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic WAV payloads: per doc, sample_rate =
    8000 * (1 + id%3), channels = 1 + id%2, n_frames = 10 + id%13, sample
    value at flat index i = ((id*37 + i*11) % 4096) - 2048 — signed,
    closed-form, so a SQL oracle predicts amp_sum without a codec."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                rate, ch, n = 8000 * (1 + d % 3), 1 + d % 2, 10 + d % 13
                i = np.arange(n * ch, dtype=np.int64)
                samples = (((d * 37 + i * 11) % 4096) - 2048).astype("<i2")
                payloads.append(encode_wav(rate, ch, samples.tobytes()))
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "payload": payloads})

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return df.select(id_col).mapInPandas(gen, schema)
