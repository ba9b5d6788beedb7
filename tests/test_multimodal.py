"""Multimodal column plumbing: schema, mapInPandas batch shape, decode stub
gating, frame-sampling row expansion."""

from __future__ import annotations

import hashlib
import zlib

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.llmprep.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    synthesize_media_table,
)
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"abc", fake=False)
    d = decode_image(b"abc", fake=True)
    assert d["checksum_md5"] == hashlib.md5(b"abc").hexdigest()
    assert d["crc32"] == zlib.crc32(b"abc") & 0xFFFFFFFF


def test_feature_extraction_end_to_end(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    media = synthesize_media_table(docs)
    feats = extract_features(media, fake_decode=True)
    assert feats.count() == docs.count()
    row = feats.join(docs, feats.media_id == docs.doc_id).select("text", "n_bytes", "checksum_md5", "crc32").first()
    payload = row["text"].encode("utf-8")
    assert row["n_bytes"] == len(payload)
    assert row["checksum_md5"] == hashlib.md5(payload).hexdigest()
    assert row["crc32"] == zlib.crc32(payload) & 0xFFFFFFFF


def test_frame_sampling_row_expansion(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(20)
    media = synthesize_media_table(docs)
    frames = frame_sample(media, every_n_bytes=64)
    # every doc expands to ceil(n_bytes/64) frames
    expected = media.select(
        F.ceil(F.col("meta.n_bytes") / 64).cast("long").alias("k")
    ).agg(F.sum("k")).collect()[0][0]
    assert frames.count() == expected
    # frames reassemble to the original payload
    one = media.orderBy("media_id").first()
    got = b"".join(
        bytes(r["frame"])
        for r in frames.filter(F.col("media_id") == one["media_id"]).orderBy("frame_offset").collect()
    )
    assert got == bytes(one["payload"])


def test_resize_preserves_schema_and_sets_target(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.llmprep.multimodal import resize_media

    docs = load_table(spark, sf_smoke, "documents").limit(20)
    media = synthesize_media_table(docs)
    resized = resize_media(media, target_w=32, target_h=24)
    # same names/types (nullability differs: literals are non-null)
    assert resized.schema.simpleString() == media.schema.simpleString()
    rows = resized.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r["meta"]["width"], r["meta"]["height"]) == (32, 24)
        assert len(bytes(r["payload"])) == 32 * 24 == r["meta"]["n_bytes"]
    # deterministic: same input → same bytes
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_media(media, 32, 24).collect()}
    assert {r["media_id"]: bytes(r["payload"]) for r in rows} == again
    # nearest-neighbor resample preserves leading byte
    orig = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, p in again.items():
        if orig[mid]:
            assert p[0] == orig[mid][0]


def test_header_parsing_real_containers(spark):
    """Format sniff + dimension parse on REAL container bytes (no codec
    library): PNG IHDR big-endian, GIF LSD little-endian, JPEG detected
    but dims deferred to the scan pass, unknown rejected, and the
    dimension-bomb guard fires from the header alone."""
    import struct

    from telecom_dataengineering_pipeline_spark.llmprep.multimodal import (
        media_header_profile,
    )

    def png(w, h):
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">II", w, h)
            + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
        )

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 5
    jpeg = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + b"\x00" * 8
    rows = [
        (1, png(640, 480)),
        (2, gif),
        (3, jpeg),
        (4, b"plain text, not an image"),
        (5, png(100_000, 100_000)),  # 10-gigapixel claim in a tiny payload
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (
            r["sniffed_format"],
            r["width"],
            r["height"],
            r["header_ok"],
        )
        for r in media_header_profile(df).collect()
    }
    assert got[1] == ("png", 640, 480, True)
    assert got[2] == ("gif", 320, 200, True)
    assert got[3] == ("jpeg", None, None, None)  # needs the SOF scan pass
    assert got[4] == (None, None, None, False)
    assert got[5] == ("png", 100_000, 100_000, False)  # bomb guard


def test_header_profile_truncated_png_gif_fail_not_pending(spark):
    """A png/gif whose payload is too short to carry its fixed-offset
    dimension bytes is MALFORMED (header_ok False) — only jpeg, whose SOF
    genuinely floats, gets the pending-NULL verdict."""
    from telecom_dataengineering_pipeline_spark.llmprep.multimodal import (
        media_header_profile,
    )

    rows = [
        (1, b"\x89PNG\r\n\x1a\n\x00\x00"),  # magic only: no IHDR dims
        (2, b"GIF89a\x14"),  # one byte of the LSD: width incomplete
        (3, b"\xff\xd8\xff\xe0\x00\x10JFIF\x00"),  # jpeg: legitimately pending
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (r["sniffed_format"], r["header_ok"])
        for r in media_header_profile(df).collect()
    }
    assert got[1] == ("png", False)
    assert got[2] == ("gif", False)
    assert got[3] == ("jpeg", None)


def test_jpeg_sof_scan_finds_floating_frame_header(spark):
    """The SOF marker sits after variable-length APP/comment segments; the
    scan must walk the chain, survive junk, and bound its work."""
    import struct

    from telecom_dataengineering_pipeline_spark.llmprep.multimodal import (
        jpeg_dimensions_scan,
    )

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def jpeg(w, h, pad=0):
        sof = seg(0xC0, b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9)
        return (
            b"\xff\xd8"
            + seg(0xE0, b"JFIF\x00" + b"\x00" * 9)
            + seg(0xFE, b"c" * (10 + pad))  # comment pushes SOF deeper
            + sof
            + b"\xff\xd9"
        )

    rows = [
        (1, jpeg(1024, 768)),
        (2, jpeg(33, 44, pad=500)),   # SOF past several hundred bytes
        (3, b"\xff\xd8\xff\xe0 garbage without any frame header"),
        (4, b"not a jpeg at all"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (r["width"], r["height"])
        for r in jpeg_dimensions_scan(df).collect()
    }
    assert got[1] == (1024, 768)
    assert got[2] == (33, 44)
    assert got[3] == (None, None)
    assert got[4] == (None, None)
    assert got[5] == (None, None)


def test_jpeg_sof_scan_skips_fill_bytes_between_segments(spark):
    """The JPEG spec permits runs of 0xFF fill/padding bytes between
    segments (B.1.1.2); the walk must realign on the true marker instead
    of misparsing a fill byte as a segment length."""
    import struct

    from telecom_dataengineering_pipeline_spark.llmprep.multimodal import (
        jpeg_dimensions_scan,
    )

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof = seg(0xC0, b"\x08" + struct.pack(">HH", 77, 99) + b"\x03" + b"\x00" * 9)
    padded = (
        b"\xff\xd8"
        + b"\xff" * 5  # fill bytes straight after SOI
        + seg(0xE0, b"JFIF\x00" + b"\x00" * 9)
        + b"\xff" * 3  # and between segments
        + sof
        + b"\xff\xd9"
    )
    df = spark.createDataFrame([(1, padded)], "media_id long, payload binary")
    row = jpeg_dimensions_scan(df).collect()[0]
    assert (row["width"], row["height"]) == (99, 77)
