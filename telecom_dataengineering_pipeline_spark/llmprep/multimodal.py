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
