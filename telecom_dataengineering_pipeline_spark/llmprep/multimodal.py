"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern for a 100 TB media pipeline:

- media lives in a ``binary`` column (or object-store URIs for very large
  blobs) beside a typed metadata struct — schema'd, partitionable,
  predicate-prunable on the metadata without touching bytes;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  stages — Arrow-batched, one Python worker pass, no per-row pickling;
- partitioning keys come from metadata (modality, format), never from bytes.

The container has no image/audio libraries, so the *real* decoders are
stubbed: ``decode_image`` raises NotImplementedError unless a deterministic
fake is requested. The Spark-side plumbing — schema, batch iteration, UDF
signatures, partitioning — is real and tested; swapping the stub for
PIL/libav is a pure function replacement inside the mapInPandas stage.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# mapInPandas closures must survive workers that cannot import this package
# (driver-only sys.path) — pickle this module by value, not by reference.
import sys as _sys

try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("format", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum_md5", StringType()),
        StructField("crc32", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def synthesize_media_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media corpus: each document's utf-8 bytes become an
    'image' payload with metadata derived from the byte length. Stands in for
    real ingestion (S3 blobs / tar shards) with identical schema/plumbing."""
    payload = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(payload).cast("long")
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("fake-rgb8").alias("format"),
        payload.alias("payload"),
        F.struct(
            F.pmod(n, F.lit(64)).cast("int").alias("width"),
            F.pmod(n, F.lit(48)).cast("int").alias("height"),
            n.alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode stub. Real implementation needs PIL/turbojpeg (not in this
    container). ``fake=True`` returns a deterministic pseudo-decode so
    downstream stages are testable."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    return {
        "n_bytes": len(payload),
        "checksum_md5": hashlib.md5(payload).hexdigest(),
        "crc32": zlib.crc32(payload) & 0xFFFFFFFF,
    }


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    Arrow delivers each partition as pandas batches; one Python pass computes
    per-blob features. At 100 TB this is the only Python stage in the plan —
    everything before (scan, metadata pruning) and after (joins, aggregates)
    stays JVM-side.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=fake_decode) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "modality": pdf["modality"].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "checksum_md5": [f["checksum_md5"] for f in feats],
                    "crc32": [f["crc32"] for f in feats],
                    "width": pdf["meta"].map(lambda m: m["width"]).values,
                    "height": pdf["meta"].map(lambda m: m["height"]).values,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, target_w: int = 32, target_h: int = 24) -> DataFrame:
    """'Resize' as a mapInPandas stage: 1 row in → 1 row out with a new
    payload and updated metadata, preserving ``MEDIA_SCHEMA`` so resize
    composes with every other media stage. The stub resamples payload bytes
    nearest-neighbor to ``target_w·target_h`` length — deterministic, and
    exactly the batch shape a PIL ``Image.resize`` replacement drops into."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = target_w * target_h
        for pdf in batches:
            out = pdf.copy()
            resized = []
            for payload in pdf["payload"]:
                n = len(payload)
                if n == 0:
                    resized.append(b"\x00" * size)
                else:  # nearest-neighbor index scaling, like a 1-D Image.resize
                    resized.append(bytes(payload[(i * n) // size] for i in range(size)))
            out["payload"] = resized
            out["meta"] = [
                {"width": target_w, "height": target_h, "n_bytes": size} for _ in resized
            ]
            yield out

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the fake payload: slice every Nth byte — the same
    mapInPandas shape a video frame sampler uses (1 input row → K output
    rows), exercising the row-expansion path."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offsets, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for off in range(0, len(payload), every_n_bytes):
                    ids.append(mid)
                    offsets.append(off)
                    frames.append(bytes(payload[off : off + every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_offset": offsets, "frame": frames})

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_offset", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )
    return media.mapInPandas(_sample, schema=schema)


# --- Real container-header parsing (no codec library needed) --------------
#
# Unlike pixel decode (which genuinely needs PIL/libav and stays stubbed),
# the container HEADERS are fixed byte layouts — parseable with pure column
# expressions, JVM-side, zero Python. This is the metadata-extraction pass
# a crawl pipeline runs over billions of blobs BEFORE deciding what to
# decode: format sniffing + dimensions + sanity bounds, one map stage.


def image_format(payload: Column | str) -> Column:
    """Magic-byte format sniff over a binary column: 'png' / 'jpeg' /
    'gif' / NULL (unknown). hex() of the leading bytes keeps the whole
    comparison inside codegen."""
    c = F.col(payload) if isinstance(payload, str) else payload
    head8 = F.hex(F.substring(c, 1, 8))
    head3 = F.hex(F.substring(c, 1, 3))
    return (
        F.when(head8 == "89504E470D0A1A0A", F.lit("png"))
        .when(head3 == "FFD8FF", F.lit("jpeg"))
        .when(head3 == "474946", F.lit("gif"))
    )


def _be32(c: Column, pos: int) -> Column:
    """Big-endian uint32 at 1-based byte offset ``pos`` of a binary col."""
    return F.conv(F.hex(F.substring(c, pos, 4)), 16, 10).cast("long")


def _le16(c: Column, pos: int) -> Column:
    """Little-endian uint16 at 1-based byte offset ``pos``."""
    lo = F.conv(F.hex(F.substring(c, pos, 1)), 16, 10).cast("long")
    hi = F.conv(F.hex(F.substring(c, pos + 1, 1)), 16, 10).cast("long")
    return hi * 256 + lo


def image_dimensions(payload: Column | str) -> Column:
    """(width, height) struct parsed from the container header — PNG
    (IHDR big-endian at bytes 17-24) and GIF (logical screen descriptor,
    little-endian at bytes 7-10); NULL for JPEG (its SOF marker floats —
    that one needs the scan pass) and unknown formats. Pure column
    arithmetic: runs on billions of blobs without a Python worker."""
    c = F.col(payload) if isinstance(payload, str) else payload
    fmt = image_format(c)
    png = F.struct(
        _be32(c, 17).alias("width"), _be32(c, 21).alias("height")
    )
    gif = F.struct(
        _le16(c, 7).alias("width"), _le16(c, 9).alias("height")
    )
    return F.when(fmt == "png", png).when(fmt == "gif", gif)


def media_header_profile(
    media: DataFrame,
    payload_col: str = "payload",
    max_pixels: int = 64_000_000,
) -> DataFrame:
    """Header-level screen over a media table: sniffed format, parsed
    dimensions where the container allows it, byte size, and a
    plausibility verdict (dimension bomb guard — a 100k×100k PNG header
    on a 2 KB payload is a decompression bomb, rejected WITHOUT
    decoding). Adds (sniffed_format, width, height, n_bytes, header_ok);
    all input columns pass through."""
    c = F.col(payload_col)
    fmt = image_format(c)
    dims = image_dimensions(c)
    w, h = dims["width"], dims["height"]
    # NULL dims mean "pending the scan pass" ONLY for jpeg (whose SOF
    # floats); a png/gif too short to carry its fixed-offset dimension
    # bytes is malformed and gets a False verdict, not a pending NULL.
    ok = (
        F.when(fmt.isNull(), F.lit(False))
        .when(fmt == "jpeg", F.lit(None).cast("boolean"))  # needs scan
        .when(w.isNull() | h.isNull(), F.lit(False))  # truncated header
        .otherwise((w > 0) & (h > 0) & (w * h <= max_pixels))
    )
    return media.select(
        "*",
        image_format(c).alias("sniffed_format"),
        w.alias("width"),
        h.alias("height"),
        F.length(c).cast("long").alias("n_bytes"),
        ok.alias("header_ok"),
    )


JPEG_DIMS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def jpeg_dimensions_scan(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_scan_bytes: int = 65_536,
) -> DataFrame:
    """JPEG dimensions via the marker scan the fixed-offset parser can't
    do: walk the segment chain to the first SOF0-SOF15 frame header and
    read its big-endian height/width. Runs as ONE Arrow-batched
    ``mapInPandas`` pass (the sanctioned vectorized-Python form — the
    walk is genuinely sequential per blob, a few dozen byte reads), scan
    bounded by ``max_scan_bytes`` so a truncated or adversarial stream
    costs O(bound), never O(blob). Non-JPEG / unparseable payloads yield
    NULL dims. Returns (id, width, height)."""

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def dims(b):
            try:
                if b is None or len(b) < 4 or b[0:3] != b"\xff\xd8\xff":
                    return None
                i, n = 2, min(len(b), max_scan_bytes)
                while i + 9 < n:
                    if b[i] != 0xFF:
                        return None  # lost sync: corrupt stream
                    # 0xFF fill bytes are legal padding between segments
                    # (JPEG spec B.1.1.2): advance to the last 0xFF so the
                    # length parse below stays marker-aligned.
                    while i + 1 < n and b[i + 1] == 0xFF:
                        i += 1
                    if i + 9 >= n:
                        return None
                    marker = b[i + 1]
                    if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                        i += 2  # standalone markers carry no length
                        continue
                    seg_len = (b[i + 2] << 8) | b[i + 3]
                    if seg_len < 2:
                        return None
                    # SOF0..SOF15 except the DHT/DAC/restart family
                    if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                        h = (b[i + 5] << 8) | b[i + 6]
                        w = (b[i + 7] << 8) | b[i + 8]
                        return (w, h)
                    i += 2 + seg_len
                return None
            except (IndexError, TypeError):
                return None

        for pdf in batches:
            out = pd.DataFrame({"media_id": pdf[id_col].astype("int64")})
            parsed = [dims(bytes(p) if p is not None else None) for p in pdf[payload_col]]
            out["width"] = pd.array(
                [p[0] if p else None for p in parsed], dtype="Int32"
            )
            out["height"] = pd.array(
                [p[1] if p else None for p in parsed], dtype="Int32"
            )
            yield out

    return media.select(id_col, payload_col).mapInPandas(_scan, JPEG_DIMS_SCHEMA)



def _le32(c: Column, pos: int) -> Column:
    """Little-endian uint32 at 1-based byte offset ``pos``."""
    return _le16(c, pos) + _le16(c, pos + 2) * 65536


def wav_header_profile(
    media: DataFrame,
    payload_col: str = "payload",
) -> DataFrame:
    """RIFF/WAVE header parse — the audio modality's analog of the image
    tier's fixed-offset pass: the canonical 44-byte PCM header is a fixed
    little-endian layout, so format sniff, channel/rate/depth extraction
    and duration all run as pure column expressions (zero Python, zero
    shuffle — one map stage over billions of blobs).

    Parses the CANONICAL layout ('fmt ' at 13, 'data' at 37). A
    non-canonical file (extra LIST/INFO chunks before 'data' — the WAV
    analog of JPEG's floating SOF) still sniffs as WAV but gets
    ``header_ok = False``; a chunk-walk pass can resolve those the way
    ``jpeg_dimensions_scan`` resolves SOF. The verdict cross-checks the
    header's INTERNAL consistency — ``byte_rate`` and ``block_align``
    must equal their definitions and the payload must actually contain
    the declared data bytes — a truncation/forgery screen that needs no
    decoding (the audio twin of the image dimension-bomb guard).

    Adds (is_wav, audio_format, channels, sample_rate, bits_per_sample,
    data_bytes, duration_ms, header_ok); input columns pass through.
    ``duration_ms = data_bytes * 1000 div byte_rate`` — exact integer
    floor division, engine-stable (``div`` in Spark, ``//`` in DuckDB)."""
    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    is_wav = (F.hex(F.substring(c, 1, 4)) == "52494646") & (
        F.hex(F.substring(c, 9, 4)) == "57415645"
    )
    canonical = (F.hex(F.substring(c, 13, 4)) == "666D7420") & (
        F.hex(F.substring(c, 37, 4)) == "64617461"
    )
    audio_format = _le16(c, 21)
    channels = _le16(c, 23)
    rate = _le32(c, 25)
    byte_rate = _le32(c, 29)
    block_align = _le16(c, 33)
    bits = _le16(c, 35)
    data_bytes = _le32(c, 41)
    bytes_per_frame = channels * (bits.cast("long") / F.lit(8)).cast("long")
    consistent = (
        canonical
        & (channels > 0)
        & (rate > 0)
        & bits.isin(8, 16, 24, 32)
        & (byte_rate == rate * bytes_per_frame)
        & (block_align == bytes_per_frame)
        & (F.length(c).cast("long") >= data_bytes + 44)
    )
    # floor division via floor(a/b): exact — both operands are headers'
    # uint32-scale longs, far inside double's 2^53 integer range
    duration_ms = F.when(
        is_wav & consistent & (byte_rate > 0),
        F.floor((data_bytes * 1000) / byte_rate).cast("long"),
    )
    return media.select(
        "*",
        is_wav.alias("is_wav"),
        F.when(is_wav & canonical, audio_format).alias("audio_format"),
        F.when(is_wav & canonical, channels).alias("channels"),
        F.when(is_wav & canonical, rate).alias("sample_rate"),
        F.when(is_wav & canonical, bits).alias("bits_per_sample"),
        F.when(is_wav & canonical, data_bytes).alias("data_bytes"),
        duration_ms.alias("duration_ms"),
        F.when(is_wav, consistent).otherwise(F.lit(False)).alias("header_ok"),
    )
