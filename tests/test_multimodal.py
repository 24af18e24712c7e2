"""Multimodal plumbing: binary payload columns through mapInPandas."""

from __future__ import annotations

from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
    attach_payload,
    extract_media_features,
)
from airflow_pipelines_from_mongo_to_postgres_spark.sources.catalog import load_table


def test_extract_features_stub(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    media = attach_payload(docs, "text")
    feats = extract_media_features(media, "doc_id", "payload")
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r.payload_bytes > 0 for r in rows)
    assert all(16 <= r.width < 80 for r in rows)  # stub decoder bounds
    assert all(r.format == "stub" for r in rows)


def test_custom_decoder_and_empty_payload(spark):
    df = spark.createDataFrame([("a", b""), ("b", b"xyz")], ["mid", "payload"])
    feats = extract_media_features(df, "mid", "payload",
                                   decoder=lambda b: {"width": len(b),
                                                      "height": 1,
                                                      "format": "len"}
                                   if b else (_ for _ in ()).throw(NotImplementedError()))
    rows = {r.media_id: r for r in feats.collect()}
    assert rows["a"].width is None      # stubbed decode failure → null features
    assert rows["a"].payload_bytes == 0
    assert rows["b"].width == 3 and rows["b"].format == "len"


def test_resize_media_stub(spark, sf_dir):
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        resize_media,
    )
    docs = load_table(spark, "documents", sf_dir).limit(20)
    out = resize_media(attach_payload(docs, "text"), "doc_id", "payload",
                       width=32, height=32).collect()
    assert len(out) == 20
    assert all(r.width == 32 and r.height == 32 for r in out)
    assert all(r.payload is not None and len(r.payload) > 0 for r in out)


def test_sample_frames_one_to_n(spark):
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        sample_frames,
    )
    df = spark.createDataFrame(
        [("v1", b"0123456789abcdef"), ("v2", b"xy"), ("v3", b"")],
        ["mid", "payload"])
    rows = sample_frames(df, "mid", "payload", num_frames=4).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id["v1"]) == 4                   # full expansion
    assert len(by_id["v2"]) == 2                   # payload shorter than n
    assert "v3" not in by_id                       # empty payload -> no frames
    assert b"".join(f.frame for f in sorted(by_id["v1"], key=lambda r: r.frame_idx))
    assert sorted(r.frame_idx for r in by_id["v1"]) == [0, 1, 2, 3]


def test_header_dimensions_real_bytes(spark):
    """image_dimensions parses REAL format headers (constructed with
    struct.pack, no image libraries) — and stays JVM-side: the plan must
    contain no Python worker stage."""
    import struct

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        header_media_features,
    )

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00" + b"\x00" * 8)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 20
    bmp = (b"BM" + struct.pack("<IHHI", 100, 0, 0, 54)
           + struct.pack("<III", 40, 800, 600) + b"\x00" * 20)
    junk = b"\x00\x01\x02 not an image"

    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif)),
         (3, bytearray(bmp)), (4, bytearray(junk))],
        "media_id long, payload binary")
    out = header_media_features(df, "media_id", "payload")
    got = {r.media_id: (r.format, r.width, r.height) for r in out.collect()}
    assert got["1"] == ("png", 640, 480)
    assert got["2"] == ("gif", 320, 200)
    assert got["3"] == ("bmp", 800, 600)
    assert got["4"] == (None, None, None)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_header_dimensions_adversarial_bytes_never_crash(spark):
    """Malformed headers must degrade (nulls / clamped values), never
    throw under ANSI mode: top-down BMP (negative int32 height), a PNG
    claiming width >= 2^31, and truncated magics."""
    import struct

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        header_media_features,
    )

    topdown_bmp = (b"BM" + struct.pack("<IHHI", 100, 0, 0, 54)
                   + struct.pack("<Iii", 40, 800, -600) + b"\x00" * 20)
    huge_png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">II", 0xFFFFFFFF, 10) + b"\x00" * 13)
    short_gif = b"GIF8"
    df = spark.createDataFrame(
        [(1, bytearray(topdown_bmp)), (2, bytearray(huge_png)),
         (3, bytearray(short_gif))],
        "media_id long, payload binary")
    got = {r.media_id: (r.format, r.width, r.height)
           for r in header_media_features(df, "media_id", "payload").collect()}
    assert got["1"] == ("bmp", 800, 600)            # |negative height|
    assert got["2"] == ("png", (1 << 31) - 1, 10)   # clamped, not crashed
    assert got["3"] == (None, None, None)           # truncated magic
