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


# --- real pixel decoding (no image library in the container) ---------------

def _make_png(pixels, ctype: int, filters=None) -> bytes:
    """Independent PNG encoder for the decode tests: forward-filters each
    scanline with the given filter types (0..4), so the decoder's
    unfilter pass is checked against separately-written filter math.
    ``pixels`` is rows × width × channels nested lists, 8-bit."""
    import struct
    import zlib

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    height, width = len(pixels), len(pixels[0])
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytes(width * ch)
    for y, ftype in zip(range(height), filters):
        line = bytes(b for px in pixels[y] for b in px)
        raw.append(ftype)
        for i in range(width * ch):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                f = line[i]
            elif ftype == 1:
                f = line[i] - left
            elif ftype == 2:
                f = line[i] - up
            elif ftype == 3:
                f = line[i] - ((left + up) >> 1)
            else:                       # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                f = line[i] - pred
            raw.append(f & 0xFF)
        prev = line

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + \
            struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    comp = zlib.compress(bytes(raw))
    # split IDAT in two to exercise multi-chunk concatenation
    mid = len(comp) // 2
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", comp[:mid]) + chunk(b"IDAT", comp[mid:])
            + chunk(b"IEND", b""))


def _make_bmp(pixels, bpp: int = 24, top_down: bool = False) -> bytes:
    """Minimal uncompressed BMP writer (BITMAPINFOHEADER, padded rows)."""
    import struct

    ch = bpp // 8
    height, width = len(pixels), len(pixels[0])
    stride = (width * ch + 3) & ~3
    rows = pixels if top_down else pixels[::-1]     # file order is bottom-up
    body = b"".join(
        bytes(b for px in row for b in px).ljust(stride, b"\x00")
        for row in rows)
    h = -height if top_down else height
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + struct.pack("<iiiHHIIiiII", 40, width, h, 1, bpp, 0,
                            len(body), 2835, 2835, 0, 0))
    return header + body


def _expected_mean(pixels) -> float:
    flat = [b for row in pixels for px in row for b in px]
    return round(sum(flat) / len(flat), 4)


def test_decode_png_all_filter_types():
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decode_image,
    )
    import random

    rng = random.Random(7)
    # 5 rows -> one scanline per filter type; RGB
    pixels = [[[rng.randrange(256) for _ in range(3)] for _ in range(9)]
              for _ in range(5)]
    payload = _make_png(pixels, ctype=2, filters=[0, 1, 2, 3, 4])
    got = decode_image(payload)
    px = got.pop("pixels")
    assert got == {"width": 9, "height": 5, "format": "png", "channels": 3,
                   "mean_pixel": _expected_mean(pixels)}
    # raw buffer is the exact unfiltered scanline content, top-down RGB
    assert px == bytes(b for row in pixels for p_ in row for b in p_)


def test_decode_png_gray_and_rgba():
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decode_image,
    )
    gray = [[[y * 8 + x] for x in range(4)] for y in range(3)]
    rgba = [[[x, y, 200, 255] for x in range(2)] for y in range(2)]
    g = decode_image(_make_png(gray, ctype=0, filters=[4, 4, 4]))
    assert (g["channels"], g["width"], g["height"]) == (1, 4, 3)
    assert g["mean_pixel"] == _expected_mean(gray)
    r = decode_image(_make_png(rgba, ctype=6, filters=[1, 2]))
    assert (r["channels"], r["mean_pixel"]) == (4, _expected_mean(rgba))


def test_decode_bmp_bottom_up_and_top_down():
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decode_image,
    )
    pixels = [[[10 * y + x, 0, 255] for x in range(3)] for y in range(4)]
    for td in (False, True):
        got = decode_image(_make_bmp(pixels, top_down=td))
        px = got.pop("pixels")
        assert got == {"width": 3, "height": 4, "format": "bmp",
                       "channels": 3, "mean_pixel": _expected_mean(pixels)}
        # normalized buffer: top-down rows, BGR file order -> RGB, for
        # BOTH storage orientations
        assert px == bytes(b for row in pixels for p_ in row
                           for b in p_[::-1])


def test_decoded_media_features_spark_path(spark):
    """The real decoder through the Arrow mapInPandas stage: real PNG and
    BMP rows decode to exact pixel stats; a non-image payload degrades to
    null features without dropping the row."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decoded_media_features,
    )

    png_px = [[[x * 40, y * 60, 7] for x in range(5)] for y in range(4)]
    bmp_px = [[[1, 2, 3], [4, 5, 6]]]
    rows = [("p1", _make_png(png_px, ctype=2, filters=[0, 1, 2, 3])),
            ("b1", _make_bmp(bmp_px)),
            ("junk", b"not an image at all")]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r.media_id: r for r in
           decoded_media_features(df, "media_id", "payload").collect()}
    assert got["p1"].format == "png" and got["p1"].channels == 3
    assert got["p1"].mean_pixel == _expected_mean(png_px)
    assert (got["p1"].width, got["p1"].height) == (5, 4)
    assert got["b1"].format == "bmp"
    assert got["b1"].mean_pixel == _expected_mean(bmp_px)
    assert got["junk"].format is None and got["junk"].mean_pixel is None
    assert got["junk"].payload_bytes == len(b"not an image at all")


def test_decode_image_agrees_with_header_parser(spark):
    """Same payload through the JVM header path (image_dimensions) and the
    Python pixel path (decode_image): dimensions must agree — the header
    fast-path is a correct pre-filter for the decode fleet."""
    from pyspark.sql import functions as F

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decode_image,
        image_dimensions,
    )

    import numpy as np

    px = [[[x, y, 0] for x in range(6)] for y in range(3)]
    jpg = _jpeg_encode(np.full((24, 40, 3), 99, dtype=np.uint8))
    payloads = [("png", _make_png(px, ctype=2)), ("bmp", _make_bmp(px)),
                ("jpeg", jpg)]
    df = spark.createDataFrame(payloads, "kind string, payload binary")
    jvm = {r.kind: r.d for r in
           df.select("kind", image_dimensions("payload").alias("d")).collect()}
    for kind, payload in payloads:
        py = decode_image(payload)
        assert (jvm[kind].format, jvm[kind].width, jvm[kind].height) == \
            (py["format"], py["width"], py["height"])


def _wav_bytes(channels=2, rate=44100, bits=16, n_frames=1000,
               fmt_tag=1, pre_data_chunks=()):
    """Canonical RIFF/WAVE bytes via struct.pack — optionally with extra
    chunks (e.g. LIST) between fmt and data, like real recorder output."""
    import struct

    block_align = channels * bits // 8
    data = b"\x00" * (n_frames * block_align)
    fmt = (b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", fmt_tag, channels, rate,
                         rate * block_align, block_align, bits))
    extra = b"".join(cid + struct.pack("<I", len(body)) + body
                     + (b"\x00" if len(body) % 2 else b"")
                     for cid, body in pre_data_chunks)
    payload = fmt + extra + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload


def test_audio_header_real_wav_bytes(spark):
    """audio_header parses canonical AND non-canonical (LIST-before-data)
    WAV layouts, names the codec, computes frames/duration — and stays
    JVM-side (no Python worker stage in the plan)."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        audio_media_features,
    )

    canonical = _wav_bytes(channels=2, rate=44100, bits=16, n_frames=44100)
    listy = _wav_bytes(channels=1, rate=16000, bits=8, n_frames=8000,
                       pre_data_chunks=[(b"LIST", b"INFOIART" + b"x" * 5)])
    floaty = _wav_bytes(channels=1, rate=48000, bits=32, n_frames=480,
                        fmt_tag=3)
    junk = b"RIFFxxxxNOPE" + b"\x00" * 64

    df = spark.createDataFrame(
        [(1, bytearray(canonical)), (2, bytearray(listy)),
         (3, bytearray(floaty)), (4, bytearray(junk)), (5, bytearray(b""))],
        "media_id long, payload binary")
    out = audio_media_features(df, "media_id", "payload")
    got = {r.media_id: r for r in out.collect()}

    r = got["1"]
    assert (r.format, r.codec, r.channels, r.sample_rate,
            r.bits_per_sample) == ("wav", "pcm", 2, 44100, 16)
    assert r.n_frames == 44100 and r.duration_ms == 1000

    r = got["2"]  # LIST chunk before data: fixed offsets would misparse
    assert (r.codec, r.channels, r.sample_rate) == ("pcm", 1, 16000)
    assert r.n_frames == 8000 and r.duration_ms == 500

    r = got["3"]
    assert r.codec == "ieee_float" and r.bits_per_sample == 32
    assert r.duration_ms == 10

    assert got["4"].format is None and got["5"].format is None

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_audio_header_adversarial_bytes_never_crash(spark):
    """Hostile WAV headers (zero block_align / zero rate / giant declared
    sizes / truncation mid-header) must yield nulls or clamped values,
    never an ANSI arithmetic crash."""
    import struct

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        audio_media_features,
    )

    zero_align = bytearray(_wav_bytes())
    zero_align[32:34] = struct.pack("<H", 0)   # block_align = 0
    zero_rate = bytearray(_wav_bytes())
    zero_rate[24:28] = struct.pack("<I", 0)    # sample_rate = 0
    huge = bytearray(_wav_bytes(n_frames=1))
    huge[40:44] = struct.pack("<I", 0xFFFFFFFF)  # data-chunk size field lies
    # fmt-chunk size lies too: the NEXT hop offset compounds past int32,
    # which must clamp (ANSI mode would otherwise crash on the cast)
    walker_bomb = bytearray(_wav_bytes(n_frames=1))
    walker_bomb[16:20] = struct.pack("<I", 0xFFFFFFF0)
    truncated = bytes(_wav_bytes())[:40]

    df = spark.createDataFrame(
        [(1, zero_align), (2, zero_rate), (3, huge), (4, bytearray(truncated)),
         (5, walker_bomb)],
        "media_id long, payload binary")
    rows = {r.media_id: r for r in
            audio_media_features(df, "media_id", "payload").collect()}
    assert rows["1"].n_frames is None and rows["1"].duration_ms is None
    assert rows["2"].duration_ms is None
    assert rows["3"].format == "wav"          # parses; frame count is bogus but finite
    assert rows["3"].n_frames == 0xFFFFFFFF // 4
    assert rows["4"].format is None           # shorter than a full header
    assert rows["5"].format == "wav"          # fmt parses; data never found
    assert rows["5"].n_frames is None         # -> no frame/duration claims


def test_decoded_features_corrupt_png_degrades_to_nulls(spark):
    """Corrupt PNGs (garbage IDAT, truncated pixel data, missing IDAT)
    raise zlib.error / IndexError inside the stdlib decoder — the
    mapInPandas stage must degrade those rows to null features, never
    fail the task."""
    import struct
    import zlib

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decoded_media_features,
    )

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    magic = b"\x89PNG\r\n\x1a\n"
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
    garbage_idat = magic + ihdr + chunk(b"IDAT", b"not-zlib-data") \
        + chunk(b"IEND", b"")
    truncated_idat = magic + ihdr \
        + chunk(b"IDAT", zlib.compress(b"\x00\x01")) + chunk(b"IEND", b"")
    no_idat = magic + ihdr + chunk(b"IEND", b"")
    good = magic + ihdr \
        + chunk(b"IDAT", zlib.compress(b"\x00\x10\x20\x00\x30\x40")) \
        + chunk(b"IEND", b"")

    df = spark.createDataFrame(
        [(1, bytearray(garbage_idat)), (2, bytearray(truncated_idat)),
         (3, bytearray(no_idat)), (4, bytearray(good))],
        "media_id long, payload binary")
    rows = {r.media_id: r for r in
            decoded_media_features(df, "media_id", "payload").collect()}
    assert rows["1"].format is None and rows["1"].mean_pixel is None
    assert rows["2"].format is None
    assert rows["3"].format is None
    assert rows["4"].format == "png" and rows["4"].width == 2


def _jpeg_bytes(width, height, *, sof=0xC0, pre_segments=()):
    """Hand-pack a JPEG header: SOI, the given marker segments, then a
    SOFn frame header carrying (height, width). No image libraries."""
    import struct

    out = b"\xff\xd8"  # SOI
    for mtype, payload in pre_segments:
        out += bytes([0xFF, mtype]) + struct.pack(">H", len(payload) + 2) + payload
    sof_payload = b"\x08" + struct.pack(">HH", height, width) + b"\x03" + b"\x00" * 9
    out += bytes([0xFF, sof]) + struct.pack(">H", len(sof_payload) + 2) + sof_payload
    return out


def test_jpeg_header_dimensions(spark):
    """VERDICT r4 #7: JPEG dimensions via the SOF marker walk — baseline
    and progressive SOF, EXIF-first layouts (big APP1 before the frame
    header), and a no-SOF hostile payload degrading to nulls. Stays
    JVM-side (no Python worker stage)."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        header_media_features,
    )

    jfif = (0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    exif = (0xE1, b"Exif\x00\x00" + b"\x00" * 600)   # big APP1 first
    dqt = (0xDB, b"\x00" + b"\x10" * 64)
    baseline = _jpeg_bytes(1920, 1080, pre_segments=(jfif, dqt))
    progressive = _jpeg_bytes(640, 480, sof=0xC2, pre_segments=(jfif,))
    exif_first = _jpeg_bytes(4032, 3024, pre_segments=(exif, jfif, dqt))
    bare = _jpeg_bytes(8, 8)                          # SOF immediately
    no_sof = b"\xff\xd8" + b"\xff\xe0\x00\x04\x00\x00" * 20  # APP0s forever
    truncated = b"\xff\xd8\xff\xc0"  # SOF marker, dims cut off

    df = spark.createDataFrame(
        [(1, bytearray(baseline)), (2, bytearray(progressive)),
         (3, bytearray(exif_first)), (4, bytearray(bare)),
         (5, bytearray(no_sof)), (6, bytearray(truncated))],
        "media_id long, payload binary")
    out = header_media_features(df, "media_id", "payload")
    got = {r.media_id: (r.format, r.width, r.height) for r in out.collect()}
    assert got["1"] == ("jpeg", 1920, 1080)
    assert got["2"] == ("jpeg", 640, 480)
    assert got["3"] == ("jpeg", 4032, 3024)
    assert got["4"] == ("jpeg", 8, 8)
    assert got["5"] == ("jpeg", None, None)   # bounded walk gives up
    assert got["6"] == ("jpeg", None, None)   # truncated degrades

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def _box(type4, payload):
    import struct
    return struct.pack(">I", len(payload) + 8) + type4 + payload


def _mp4_bytes(*, timescale=600, duration=1200, width=1280, height=720,
               mvhd_ver=0, tkhd_ver=0, pre_boxes=(), moov_pre=()):
    """Hand-pack an ISO-BMFF file: ftyp, optional filler boxes, then
    moov[<moov_pre...>, mvhd, trak[tkhd]]. No media libraries."""
    import struct

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    if mvhd_ver == 0:
        mv = b"\x00\x00\x00\x00" + struct.pack(">IIII", 1, 2, timescale,
                                               duration) + b"\x00" * 80
    else:
        mv = b"\x01\x00\x00\x00" + struct.pack(">QQIQ", 1, 2, timescale,
                                               duration) + b"\x00" * 80
    mvhd = _box(b"mvhd", mv)
    fixed = lambda v: struct.pack(">HH", v, 0)  # 16.16 fixed point
    if tkhd_ver == 0:
        tk = (b"\x00\x00\x00\x07" + struct.pack(">IIII", 1, 2, 1, 0)
              + struct.pack(">I", duration) + b"\x00" * 8
              + b"\x00" * 8 + b"\x00" * 36 + fixed(width) + fixed(height))
    else:
        tk = (b"\x01\x00\x00\x07" + struct.pack(">QQIIQ", 1, 2, 1, 0,
                                                duration) + b"\x00" * 8
              + b"\x00" * 8 + b"\x00" * 36 + fixed(width) + fixed(height))
    trak = _box(b"trak", _box(b"tkhd", tk))
    moov = _box(b"moov", b"".join(moov_pre) + mvhd + trak)
    return ftyp + b"".join(pre_boxes) + moov


def test_video_header_real_mp4_bytes(spark):
    """video_media_features parses hand-packed ISO-BMFF boxes: canonical
    layout, filler boxes before moov, iods/udta before mvhd, and the
    version-1 (64-bit-time) mvhd/tkhd layouts. JVM-only plan."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        video_media_features,
    )

    canonical = _mp4_bytes()
    filler = _mp4_bytes(pre_boxes=(_box(b"free", b"\x00" * 32),
                                   _box(b"skip", b"\x00" * 8)),
                        moov_pre=(_box(b"iods", b"\x00" * 12),),
                        timescale=1000, duration=2500,
                        width=1920, height=1080)
    v1 = _mp4_bytes(mvhd_ver=1, tkhd_ver=1, timescale=90000,
                    duration=450000, width=640, height=360)
    junk = b"\x00\x01\x02 not a video"

    df = spark.createDataFrame(
        [(1, bytearray(canonical)), (2, bytearray(filler)),
         (3, bytearray(v1)), (4, bytearray(junk))],
        "media_id long, payload binary")
    out = video_media_features(df, "media_id", "payload")
    got = {r.media_id: r for r in out.collect()}
    r1 = got["1"]
    assert (r1.format, r1.brand, r1.timescale) == ("mp4", "isom", 600)
    assert r1.duration_ms == 2000 and (r1.width, r1.height) == (1280, 720)
    r2 = got["2"]
    assert r2.duration_ms == 2500 and (r2.width, r2.height) == (1920, 1080)
    r3 = got["3"]
    assert r3.timescale == 90000 and r3.duration_ms == 5000
    assert (r3.width, r3.height) == (640, 360)
    assert got["4"].format is None and got["4"].duration_ms is None

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_video_header_adversarial_bytes_never_crash(spark):
    """Hostile MP4s degrade to nulls, never ANSI crashes: size-0 box
    (walk poison), 64-bit largesize (size == 1, unsupported), truncated
    mvhd, and a moov with no trak (duration without dims)."""
    import struct

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        video_media_features,
    )

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512))
    zero_size = ftyp + struct.pack(">I", 0) + b"moov"
    largesize = ftyp + struct.pack(">I", 1) + b"moov" + b"\x00" * 16
    truncated = _mp4_bytes()[:40]
    no_trak = ftyp + _box(b"moov", _box(b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 1, 2, 600, 600)
        + b"\x00" * 80))

    df = spark.createDataFrame(
        [(1, bytearray(zero_size)), (2, bytearray(largesize)),
         (3, bytearray(truncated)), (4, bytearray(no_trak))],
        "media_id long, payload binary")
    got = {r.media_id: r for r in
           video_media_features(df, "media_id", "payload").collect()}
    assert got["1"].format is None        # poisoned walk -> no moov found
    assert got["2"].format is None
    assert got["3"].duration_ms is None   # mvhd cut off -> not found
    r4 = got["4"]
    assert r4.format == "mp4" and r4.duration_ms == 1000
    assert r4.width is None and r4.height is None


# --- baseline JPEG: independent test-side encoder -> package decoder --------

def _jpeg_encode(rgb, *, gray=False, chroma_sub=1, qy=4, qc=8):
    """Independent baseline-JPEG encoder for the decode tests: forward
    DCT + quantization + canonical Huffman with flat single-length code
    tables (all DC symbols at 8 bits, all 162 AC run/size symbols at 16
    bits — valid prefix codes by construction, no transcribed Annex K
    tables to get wrong). ``rgb`` is an HxWx3 (or HxW if gray) numpy
    uint8 array; ``chroma_sub=2`` emits 4:2:0."""
    import math
    import struct

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        a = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        for x in range(8):
            m[u, x] = a * math.cos((2 * x + 1) * u * math.pi / 16)
    ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

    DC_SYMS = list(range(12))
    AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
    dc_codes = {sym: (8, i) for i, sym in enumerate(DC_SYMS)}
    ac_codes = {sym: (16, i) for i, sym in enumerate(AC_SYMS)}
    dc_bits = [0] * 16; dc_bits[7] = len(DC_SYMS)
    ac_bits = [0] * 16; ac_bits[15] = len(AC_SYMS)

    rgb = np.asarray(rgb, dtype=np.float64)
    if gray:
        planes = [rgb]
        samp = [(1, 1)]
        qids = [0]
    else:
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        cb = 128 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        if chroma_sub == 2:
            h, w = y.shape
            he, we = h + h % 2, w + w % 2
            cbp = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
            crp = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
            cb = (cbp[0::2, 0::2] + cbp[0::2, 1::2]
                  + cbp[1::2, 0::2] + cbp[1::2, 1::2]) / 4
            cr = (crp[0::2, 0::2] + crp[0::2, 1::2]
                  + crp[1::2, 0::2] + crp[1::2, 1::2]) / 4
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    height, width = planes[0].shape
    qts = {0: np.full((8, 8), float(qy)), 1: np.full((8, 8), float(qc))}

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    padded = []
    for p, (h, v) in zip(planes, samp):
        ph, pw = mcuy * v * 8, mcux * h * 8
        padded.append(np.pad(p, ((0, ph - p.shape[0]),
                                 (0, pw - p.shape[1])), mode="edge"))

    out = bytearray()
    bitbuf, nbits = 0, 0

    def put(code_len, code):
        nonlocal bitbuf, nbits
        for i in range(code_len - 1, -1, -1):
            bitbuf = (bitbuf << 1) | ((code >> i) & 1)
            nbits += 1
            if nbits == 8:
                out.append(bitbuf)
                if bitbuf == 0xFF:
                    out.append(0x00)
                bitbuf, nbits = 0, 0

    def put_val(v):
        s = v if v >= 0 else -v
        size = s.bit_length()
        if v < 0:
            v += (1 << size) - 1
        return size, v

    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (h, v)) in enumerate(zip(padded, samp)):
                for by in range(v):
                    for bx in range(h):
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8] - 128
                        fq = np.round((m @ blk @ m.T) / qts[qids[ci]]
                                      ).astype(int)
                        zz = [int(fq.flat[ZZ[k]]) for k in range(64)]
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        size, bitsv = put_val(diff)
                        put(*dc_codes[size])
                        if size:
                            put(size, bitsv)
                        run = 0
                        for k in range(1, 64):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                put(*ac_codes[0xF0])
                                run -= 16
                            size, bitsv = put_val(zz[k])
                            put(*ac_codes[(run << 4) | size])
                            put(size, bitsv)
                            run = 0
                        if run:
                            put(*ac_codes[0x00])
    if nbits:
        put(8 - nbits, (1 << (8 - nbits)) - 1)  # pad with 1s

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid):
        zzq = bytes(int(qts[tid].flat[ZZ[k]]) for k in range(64))
        return seg(0xDB, bytes([tid]) + zzq)

    def dht(cls, tid, bits, syms):
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(syms))

    sof = struct.pack(">BHHB", 8, height, width, len(planes))
    for i, (h, v) in enumerate(samp):
        sof += bytes([i + 1, (h << 4) | v, qids[i]])
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        sos += bytes([i + 1, 0x00])  # dc table 0, ac table 0
    sos += b"\x00\x3f\x00"

    jpg = b"\xff\xd8" + dqt(0)
    if not gray:
        jpg += dqt(1)
    jpg += seg(0xC0, sof) + dht(0, 0, dc_bits, DC_SYMS) \
        + dht(1, 0, ac_bits, AC_SYMS) + seg(0xDA, sos) \
        + bytes(out) + b"\xff\xd9"
    return jpg


def test_decode_jpeg_roundtrip_444_420_gray():
    """The package decoder reconstructs pixels from an INDEPENDENT
    encoder (forward DCT + quant + canonical Huffman written here):
    dims exact, channels right, mean within quantization error — for
    4:4:4 color, 4:2:0 subsampled, odd (cropped) dims, and grayscale."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import _decode_jpeg

    rng = np.random.default_rng(7)
    # smooth gradient + mild noise: realistic DCT energy, bounded error
    yy, xx = np.mgrid[0:24, 0:32]
    base = (40 + 3 * xx + 2 * yy)[..., None] + np.array([0, 20, 40])
    img = np.clip(base + rng.integers(-4, 5, (24, 32, 3)), 0, 255) \
        .astype(np.uint8)

    got = _decode_jpeg(_jpeg_encode(img))
    assert (got["width"], got["height"], got["channels"]) == (32, 24, 3)
    assert got["format"] == "jpeg"
    assert abs(got["mean_pixel"] - img.mean()) < 3.0, got

    sub = _decode_jpeg(_jpeg_encode(img, chroma_sub=2))
    assert (sub["width"], sub["height"]) == (32, 24)
    assert abs(sub["mean_pixel"] - img.mean()) < 3.0, sub

    odd = img[:17, :23]   # crop forces partial MCUs
    god = _decode_jpeg(_jpeg_encode(odd))
    assert (god["width"], god["height"]) == (23, 17)
    assert abs(god["mean_pixel"] - odd.mean()) < 3.0, god

    gray = img[..., 0]
    gg = _decode_jpeg(_jpeg_encode(gray, gray=True))
    assert (gg["width"], gg["height"], gg["channels"]) == (32, 24, 1)
    assert abs(gg["mean_pixel"] - gray.mean()) < 3.0, gg


def test_decode_jpeg_flat_color_exact():
    """A flat-color image is DC-only: every reconstruction step
    (dequant, IDCT, level shift, color transform) must land within one
    count of the source — a tight analytic correctness check."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import _decode_jpeg

    img = np.full((16, 16, 3), [200, 100, 50], dtype=np.uint8)
    got = _decode_jpeg(_jpeg_encode(img, qy=1, qc=1))
    assert abs(got["mean_pixel"] - img.mean()) < 1.0, got


def test_decode_jpeg_rejects_progressive_and_truncated():
    import numpy as np
    import pytest

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import _decode_jpeg

    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    good = _jpeg_encode(img)
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="non-baseline"):
        _decode_jpeg(progressive)
    with pytest.raises(NotImplementedError):
        _decode_jpeg(good[: len(good) // 2])


def test_decode_image_dispatches_jpeg(spark):
    """decode_image + the mapInPandas seam handle JPEG payloads end to
    end on Spark (decoded_media_features)."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decoded_media_features,
    )

    img = np.full((16, 16, 3), [10, 200, 30], dtype=np.uint8)
    jpg = _jpeg_encode(img)
    df = spark.createDataFrame([(1, bytearray(jpg)), (2, bytearray(b"nope"))],
                               "media_id long, payload binary")
    got = {r.media_id: r for r in
           decoded_media_features(df, "media_id", "payload").collect()}
    r1 = got["1"]
    assert (r1.format, r1.width, r1.height) == ("jpeg", 16, 16)
    assert abs(r1.mean_pixel - img.mean()) < 1.5
    assert got["2"].format is None


def test_webp_header_dimensions(spark):
    """image_dimensions parses all three WebP sub-formats from
    hand-packed RIFF bytes: VP8 (lossy), VP8L (lossless bit-packed
    dims), VP8X (extended canvas). JVM-only plan."""
    import struct

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        header_media_features,
    )

    def riff(tag, body):
        chunk = tag + struct.pack("<I", len(body)) + body
        return (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP"
                + chunk)

    # VP8 lossy: 3-byte frame tag, sync 9D 01 2A, LE14 dims (+2 scale bits)
    vp8 = riff(b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a"
               + struct.pack("<HH", 480, 640) + b"\x00" * 8)
    # VP8L lossless: 0x2F sig, then width-1 (14b) | height-1 (14b) LSB-first
    packed = (799) | ((599) << 14)
    vp8l = riff(b"VP8L", b"\x2f" + struct.pack("<I", packed) + b"\x00" * 8)
    # VP8X extended: 4 flag bytes, canvas w-1 and h-1 as 24-bit LE
    vp8x = riff(b"VP8X", b"\x00\x00\x00\x00"
                + (1023).to_bytes(3, "little")
                + (767).to_bytes(3, "little") + b"\x00" * 4)

    df = spark.createDataFrame(
        [(1, bytearray(vp8)), (2, bytearray(vp8l)), (3, bytearray(vp8x))],
        "media_id long, payload binary")
    out = header_media_features(df, "media_id", "payload")
    got = {r.media_id: (r.format, r.width, r.height) for r in out.collect()}
    assert got["1"] == ("webp", 480, 640)
    assert got["2"] == ("webp", 800, 600)
    assert got["3"] == ("webp", 1024, 768)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_decode_audio_pcm_and_float_samples(spark):
    """decode_audio reconstructs REAL samples: a pure sine at known
    amplitude has rms = amp/sqrt(2) and peak ~= amp — checked for PCM16
    and float32; alaw (compressed) degrades to nulls through the
    mapInPandas seam."""
    import math
    import struct

    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decode_audio,
        decoded_audio_features,
    )

    n, rate, amp = 4000, 8000, 0.5
    t = np.arange(n)
    sine = amp * np.sin(2 * np.pi * 440 * t / rate)

    pcm16 = _wav_bytes(channels=1, rate=rate, bits=16, n_frames=0)
    pcm16 = pcm16[:44] + (sine * (1 << 15)).astype("<i2").tobytes()
    # patch the data-chunk and RIFF sizes
    pcm16 = (pcm16[:4] + struct.pack("<I", len(pcm16) - 8) + pcm16[8:40]
             + struct.pack("<I", n * 2) + pcm16[44:])

    got = decode_audio(pcm16)
    assert (got["channels"], got["sample_rate"]) == (1, rate)
    assert got["n_frames"] == n and got["duration_ms"] == 500
    assert abs(got["rms"] - amp / math.sqrt(2)) < 0.01
    assert abs(got["peak"] - amp) < 0.01

    f32 = (b"RIFF" + struct.pack("<I", 36 + n * 4) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
           + b"data" + struct.pack("<I", n * 4)
           + sine.astype("<f4").tobytes())
    gf = decode_audio(f32)
    assert abs(gf["rms"] - amp / math.sqrt(2)) < 0.01

    alaw = _wav_bytes(channels=1, rate=8000, bits=8, fmt_tag=6, n_frames=10)
    df = spark.createDataFrame(
        [(1, bytearray(pcm16)), (2, bytearray(alaw)), (3, bytearray(b"x"))],
        "media_id long, payload binary")
    rows = {r.media_id: r for r in
            decoded_audio_features(df, "media_id", "payload").collect()}
    assert rows["1"].duration_ms == 500 and abs(rows["1"].peak - amp) < 0.01
    assert rows["2"].format is None     # compressed codec -> null fallback
    assert rows["3"].format is None


def test_video_header_huge_duration_never_overflows(spark):
    """A hostile v1 mvhd with duration ~2^60 must degrade via the clamp,
    never crash the scan with an ANSI ARITHMETIC_OVERFLOW."""
    import struct

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        video_media_features,
    )

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512))
    mv = (b"\x01\x00\x00\x00"
          + struct.pack(">QQIQ", 1, 2, 600, 1 << 60) + b"\x00" * 80)
    hostile = ftyp + _box(b"moov", _box(b"mvhd", mv))
    df = spark.createDataFrame([(1, bytearray(hostile))],
                               "media_id long, payload binary")
    r = video_media_features(df, "media_id", "payload").collect()[0]
    assert r.format == "mp4" and r.duration_ms is not None  # clamped, alive


# --- real MJPEG/AVI frame sampling ------------------------------------------

def _pack_avi(frames, extra_rec_frames=(), junk_tail=b""):
    """Hand-packed RIFF/AVI from the spec: hdrl stub + movi LIST holding
    '00dc' frame chunks (word-aligned), optionally a nested 'rec ' LIST
    (interleave shape), optionally trailing junk (idx1 stand-in)."""
    import struct

    def chunk(four, body):
        return four + struct.pack("<I", len(body)) + body + \
            (b"\x00" if len(body) & 1 else b"")

    movi_body = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    if extra_rec_frames:
        rec = b"rec " + b"".join(chunk(b"00dc", f) for f in extra_rec_frames)
        movi_body += chunk(b"LIST", rec)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", b"\x00" * 56))
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi + junk_tail
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_sample_frames_real_avi_mjpeg(spark):
    """The stub seam is closed: sample_frames on a hand-packed MJPEG/AVI
    yields COMPLETE JPEGs that the package's own decoder reconstructs to
    the exact per-frame flat colors, in even-spacing order; a nested
    'rec ' frame is picked up too."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        _decode_jpeg,
        sample_frames,
    )

    shades = [20, 60, 100, 140, 180, 220]
    jpegs = [_jpeg_encode(np.full((16, 16, 3), s, dtype=np.uint8),
                          qy=1, qc=1) for s in shades]
    avi = _pack_avi(jpegs[:5], extra_rec_frames=jpegs[5:],
                    junk_tail=b"idx1\x04\x00\x00\x00JUNK")
    df = spark.createDataFrame([("v1", bytearray(avi))],
                               "mid string, payload binary")
    rows = sorted(sample_frames(df, "mid", "payload", num_frames=3).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    # 6 frames sampled to 3 -> indices 0, 2, 4
    for row, want in zip(rows, [shades[0], shades[2], shades[4]]):
        dec = _decode_jpeg(bytes(row.frame))
        assert (dec["width"], dec["height"]) == (16, 16)
        assert abs(dec["mean_pixel"] - want) < 1.0


def test_sample_frames_bare_mjpeg_stream_and_hostile_tail(spark):
    """Concatenated-JPEG MJPEG: the marker walk splits on true frame
    boundaries (entropy data containing 0xFFD8-looking bytes must not
    fool it), and a corrupt tail yields the good prefix, not garbage."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        _decode_jpeg,
        mjpeg_frame_spans,
        sample_frames,
    )

    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 255, (24, 24, 3)).astype(np.uint8)
            for _ in range(4)]
    jpegs = [_jpeg_encode(im) for im in imgs]
    stream = b"".join(jpegs)
    spans = mjpeg_frame_spans(stream)
    assert [e - s for s, e in spans] == [len(j) for j in jpegs]

    df = spark.createDataFrame(
        [("ok", bytearray(stream)),
         ("tail", bytearray(stream + b"\xff\xd8\xff\xe0garbage"))],
        "mid string, payload binary")
    got = {}
    for r in sample_frames(df, "mid", "payload", num_frames=4).collect():
        got.setdefault(r.media_id, []).append(r)
    assert len(got["ok"]) == 4 and len(got["tail"]) == 4
    for r in got["ok"]:
        assert _decode_jpeg(bytes(r.frame))["width"] == 24


def test_avi_walk_guards_malformed_sizes():
    """Oversized/truncated chunk sizes end the walk (no raise, no
    over-read) — the hostile-payload rule the other parsers follow."""
    import struct

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        avi_movi_frames,
        extract_video_frames,
    )

    frame = b"\xff\xd8fakejpegdata\xff\xd9"
    good = _pack_avi([frame])
    assert avi_movi_frames(good) == [frame]
    # chunk size pointing past the buffer
    evil = good.replace(struct.pack("<I", len(frame)),
                        struct.pack("<I", 2 ** 31), 1)
    assert avi_movi_frames(evil) == []
    assert avi_movi_frames(good[:20]) == []
    assert extract_video_frames(b"RIFF\x00\x00\x00\x00AVI ", 4) == []
    assert extract_video_frames(b"", 4) == []


def test_resize_pixels_real_resample_png_bmp_jpeg(spark):
    """The resize seam is real: decoded pixels are nearest-neighbor
    resampled for all three decodable formats — exact pixel values for
    the lossless formats, within JPEG tolerance for flat color — and
    the Spark resize stage emits raw buffers of exactly w*h*ch bytes."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        resize_media,
        resize_pixels,
    )

    # PNG 4x4 gray gradient -> 2x2 picks rows/cols 0 and 2 (floor map)
    gray = [[[(4 * y + x) * 10] for x in range(4)] for y in range(4)]
    png = _make_png(gray, ctype=0)
    out = np.frombuffer(resize_pixels(png, 2, 2),
                        dtype=np.uint8).reshape(2, 2)
    assert out.tolist() == [[0, 20], [80, 100]]

    # BMP bottom-up BGR normalizes to top-down RGB before resampling
    # (pixels given in file channel order B,G,R)
    bgr = [[[0, 0, 0] for _ in range(2)] for _ in range(2)]
    bgr[0][0] = [0, 0, 255]       # top-left red (as BGR)
    bgr[1][1] = [255, 0, 0]       # bottom-right blue (as BGR)
    bmp = _make_bmp(bgr)
    up = np.frombuffer(resize_pixels(bmp, 4, 4),
                       dtype=np.uint8).reshape(4, 4, 3)
    assert up[0, 0].tolist() == [255, 0, 0]      # red stays top-left (RGB)
    assert up[3, 3].tolist() == [0, 0, 255]      # blue stays bottom-right

    # JPEG flat color survives decode+resample within codec tolerance
    img = np.full((16, 16, 3), [200, 100, 50], dtype=np.uint8)
    jp = np.frombuffer(resize_pixels(_jpeg_encode(img, qy=1, qc=1), 8, 8),
                       dtype=np.uint8).reshape(8, 8, 3)
    assert np.abs(jp.astype(int) - [200, 100, 50]).max() <= 2

    # Spark stage: decodable payload -> raw w*h*ch buffer; garbage falls
    # back to the bounded byte-slice stand-in
    df = spark.createDataFrame(
        [("p", bytearray(png)), ("junk", bytearray(b"not an image"))],
        "mid string, payload binary")
    rows = {r.media_id: r for r in
            resize_media(df, "mid", "payload", 2, 2).collect()}
    assert len(rows["p"].payload) == 2 * 2 * 1
    assert rows["junk"].payload is not None


def _sine_wav(freq, rate=8000, n=8192, bits=16):
    import struct

    import numpy as np

    t = np.arange(n) / rate
    s = (np.sin(2 * np.pi * freq * t) * 0.5 * (1 << (bits - 1) - 1)
         ).astype("<i2").tobytes()
    fmt = (b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, bits))
    payload = fmt + b"data" + struct.pack("<I", len(s)) + s
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE" + payload


def test_spectral_features_sine_vs_noise(spark):
    """Frequency-domain features from REAL decoded samples: a 1250 Hz
    sine at 8 kHz concentrates its energy in band 2 of 8 (each band =
    500 Hz) with centroid ≈ 1250 Hz and near-zero flatness; noise spreads
    energy (high flatness, no dominant band); junk degrades to nulls."""
    import struct

    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        audio_spectral_features,
        spectral_features,
    )

    # 1250 Hz = bin 160 at frame 1024 / 8 kHz (bin-aligned, dead center
    # of band 2 = [1000, 1500)): the Hann mainlobe stays inside the band
    sine = _sine_wav(1250)
    d = spectral_features(sine)
    assert d["band_energy"][2] > 0.95
    assert abs(d["centroid_hz"] - 1250) < 25
    assert d["flatness"] < 0.05

    rng = np.random.RandomState(3)
    noise = (rng.uniform(-0.5, 0.5, 8192) * 32767).astype("<i2").tobytes()
    fmt = (b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16))
    pl = fmt + b"data" + struct.pack("<I", len(noise)) + noise
    nz = b"RIFF" + struct.pack("<I", 4 + len(pl)) + b"WAVE" + pl
    dn = spectral_features(nz)
    assert dn["flatness"] > 0.5
    assert max(dn["band_energy"]) < 0.5        # no dominant band
    # Nyquist bin included: the last band is CLOSED at rate/2, so the
    # fractions account for every rfft bin and sum to 1 (rounding aside)
    assert abs(sum(dn["band_energy"]) - 1.0) < 1e-4
    assert abs(sum(d["band_energy"]) - 1.0) < 1e-4

    df = spark.createDataFrame(
        [("sine", bytearray(sine)), ("noise", bytearray(nz)),
         ("junk", bytearray(b"not audio"))],
        "mid string, payload binary")
    got = {r.media_id: r for r in
           audio_spectral_features(df, "mid", "payload").collect()}
    assert abs(got["sine"].centroid_hz - 1250) < 25
    assert got["noise"].flatness > 0.5
    assert got["junk"].centroid_hz is None and got["junk"].band_energy is None


def _lzw_encode(indices, min_code):
    """Independent GIF-LZW encoder (standard dictionary-building
    algorithm, variable width, leading CLEAR, trailing END)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    s = b""
    for i in indices:
        nxt = s + bytes([i])
        if nxt in table:
            s = nxt
            continue
        emit(table[s])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by one addition, so
            # its width bump (at table size 2^w) corresponds to
            # encoder next_code == 2^w + 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        s = bytes([i])
    if s:
        emit(table[s])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _make_gif(frames, palette, size, min_code=2, interlace_first=False,
              delay_cs=7):
    """Hand-packed GIF89a: global palette, graphics-control extension,
    one image block per frame (optionally interlaced)."""
    import struct

    w, h = size
    n = max(len(palette), 4)
    bits = max((n - 1).bit_length(), 1)
    gct = b"".join(bytes(c) for c in palette).ljust(3 * (1 << bits), b"\x00")
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", w, h,
                                            0x80 | (bits - 1), 0, 0) + gct)
    for fi, idx in enumerate(frames):
        out += (b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs)
                + b"\x00\x00")
        ipack = 0x40 if (interlace_first and fi == 0) else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipack)
        if interlace_first and fi == 0:
            order = [y for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
                     for y in range(s, h, st)]
            idx = [v for y in order for v in idx[y * w:(y + 1) * w]]
        data = _lzw_encode(idx, min_code)
        out.append(min_code)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_lzw_frames_decode_to_exact_pixels():
    """Real GIF decode: LZW (dictionary growth, width bumps, 255-byte
    sub-block splits), palette mapping, interlace reordering and
    per-frame delays all reproduce the exact source pixels — against an
    independently written encoder."""
    import random

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decode_image,
        gif_frames,
    )

    rng = random.Random(11)
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    w, h = 13, 9                       # odd dims: interlace passes uneven
    f0 = [rng.randrange(4) for _ in range(w * h)]
    f1 = [(i * 7) % 4 for i in range(w * h)]
    gif = _make_gif([f0, f1], palette, (w, h), interlace_first=True)

    frames = gif_frames(gif)
    assert len(frames) == 2
    for fr, src in zip(frames, (f0, f1)):
        assert (fr["width"], fr["height"], fr["delay_ms"]) == (w, h, 70)
        want = b"".join(bytes(palette[i]) for i in src)
        assert fr["pixels"] == want

    d = decode_image(gif)              # first frame through the contract
    assert (d["format"], d["width"], d["height"], d["channels"]) \
        == ("gif", w, h, 3)

    # hostile: truncated image data and palette-range indices must raise
    import pytest
    with pytest.raises(NotImplementedError):
        gif_frames(gif[:40])
    bad = bytearray(gif)
    with pytest.raises(NotImplementedError):
        gif_frames(bytes(bad[:6]) + b"\x00" * 7)


def test_header_dimensions_tiff_both_endians(spark):
    """TIFF dims from the first IFD, both byte orders, SHORT and LONG
    value types, extra entries before/after the dim tags — JVM-side
    (no Python stage in the plan); truncated TIFFs degrade to nulls."""
    import struct

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        header_media_features,
    )

    def tiff(le, w, h, wtype=3, htype=4):
        e, tagfmt = ("<", "II*\0") if le else (">", "MM\0*")
        def entry(tag, typ, val):
            if typ == 3:
                vf = struct.pack(e + "H", val) + b"\x00\x00"
            else:
                vf = struct.pack(e + "I", val)
            return struct.pack(e + "HHI", tag, typ, 1) + vf
        entries = (entry(254, 4, 0)            # decoy before
                   + entry(256, wtype, w)
                   + entry(257, htype, h)
                   + entry(258, 3, 8))         # decoy after
        ifd = struct.pack(e + "H", 4) + entries + struct.pack(e + "I", 0)
        return tagfmt.encode("latin1") + struct.pack(e + "I", 8) + ifd

    df = spark.createDataFrame(
        [(1, bytearray(tiff(True, 1920, 1080))),
         (2, bytearray(tiff(False, 640, 65536, wtype=4))),
         (3, bytearray(tiff(True, 10, 10)[:12]))],
        "media_id long, payload binary")
    out = header_media_features(df, "media_id", "payload")
    got = {r.media_id: (r.format, r.width, r.height) for r in out.collect()}
    assert got["1"] == ("tiff", 1920, 1080)
    assert got["2"] == ("tiff", 640, 65536)    # LONG value > uint16
    assert got["3"] == ("tiff", None, None)    # truncated IFD -> nulls

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_sample_frames_animated_gif(spark):
    """Animated GIFs flow through sample_frames as self-contained BMP
    frames decodable by decode_image — even spacing over the stored
    frame list, exact pixels preserved through the LZW→BMP round
    trip."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decode_image,
        sample_frames,
    )

    palette = [(0, 0, 0), (250, 10, 10), (10, 250, 10), (10, 10, 250)]
    w, h = 6, 4
    frames = [[c] * (w * h) for c in (1, 2, 3, 1, 2, 3)]   # 6 flat frames
    gif = _make_gif(frames, palette, (w, h))

    df = spark.createDataFrame([("g", bytearray(gif))],
                               "mid string, payload binary")
    rows = sorted(sample_frames(df, "mid", "payload", num_frames=3).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    # 6 frames sampled to 3 -> stored frames 0, 2, 4 -> colors 1, 3, 2
    for row, color in zip(rows, (1, 3, 2)):
        d = decode_image(bytes(row.frame))
        assert (d["format"], d["width"], d["height"]) == ("bmp", w, h)
        assert d["pixels"][:3] == bytes(palette[color])


def _pack_mjpeg_mp4(frames, *, co64=False, chunking=((1, 3), (2, 2))):
    """Hand-pack an MJPEG-in-MP4: ftyp + mdat holding the JPEG samples
    back-to-back, then moov/trak/mdia[hdlr 'vide']/minf/stbl with REAL
    stsz/stsc/stco(co64) tables pointing into mdat. Chunk layout from
    ``chunking``: (first_chunk, samples_per_chunk) stsc runs."""
    import struct

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_body = b"".join(frames)
    mdat_off = len(ftyp) + 8                 # first sample's file offset

    # chunk offsets: walk frames in stsc order
    spc_of = lambda ci: max((n for fc, n in chunking if fc <= ci + 1),
                            default=0)
    offs, si, off = [], 0, mdat_off
    ci = 0
    while si < len(frames):
        offs.append(off)
        for _ in range(min(spc_of(ci), len(frames) - si)):
            off += len(frames[si])
            si += 1
        ci += 1

    stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, len(frames))
                + b"".join(struct.pack(">I", len(f)) for f in frames))
    stsc = _box(b"stsc", b"\x00" * 4 + struct.pack(">I", len(chunking))
                + b"".join(struct.pack(">III", fc, n, 1)
                           for fc, n in chunking))
    if co64:
        stco = _box(b"co64", b"\x00" * 4 + struct.pack(">I", len(offs))
                    + b"".join(struct.pack(">Q", o) for o in offs))
    else:
        stco = _box(b"stco", b"\x00" * 4 + struct.pack(">I", len(offs))
                    + b"".join(struct.pack(">I", o) for o in offs))
    # stts: all samples at a fixed 100-tick delta, timescale 1000
    stts = _box(b"stts", b"\x00" * 4 + struct.pack(">I", 1)
                + struct.pack(">II", len(frames), 100))
    stbl = _box(b"stbl", stsz + stsc + stco + stts)
    minf = _box(b"minf", stbl)
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    mdhd = _box(b"mdhd", b"\x00" * 4 + struct.pack(">IIIIHH", 0, 0,
                                                    1000, 0, 0, 0))
    mdia = _box(b"mdia", hdlr + mdhd + minf)
    trak = _box(b"trak", mdia)
    mv = b"\x00" * 4 + __import__("struct").pack(">IIII", 1, 2, 600, 1200) \
        + b"\x00" * 80
    moov = _box(b"moov", _box(b"mvhd", mv) + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov


def test_sample_frames_real_mp4_mjpeg(spark):
    """MP4 frame extraction is REAL: the stbl walk (stsz sizes + stsc
    runs + stco offsets) recovers complete JPEG samples from a
    hand-packed MJPEG-in-MP4 that decode to exact per-frame colors —
    multi-chunk layout and the 64-bit co64 variant both."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        _decode_jpeg,
        extract_video_frames,
        mp4_sample_spans,
        sample_frames,
    )

    shades = [20, 60, 100, 140, 180]
    jpegs = [_jpeg_encode(np.full((16, 16, 3), s, dtype=np.uint8),
                          qy=1, qc=1) for s in shades]
    mp4 = _pack_mjpeg_mp4(jpegs)
    spans = mp4_sample_spans(mp4)
    assert [sz for _, sz in spans] == [len(j) for j in jpegs]
    assert [mp4[o:o + sz] for o, sz in spans] == jpegs

    for variant in (mp4, _pack_mjpeg_mp4(jpegs, co64=True)):
        got = extract_video_frames(variant, 5)
        assert got == jpegs
        for f, want in zip(got, shades):
            dec = _decode_jpeg(f)
            assert (dec["width"], dec["height"]) == (16, 16)
            assert abs(dec["mean_pixel"] - want) < 1.0

    df = spark.createDataFrame([("v1", bytearray(mp4))],
                               "mid string, payload binary")
    rows = sorted(sample_frames(df, "mid", "payload", num_frames=2).collect(),
                  key=lambda r: r.frame_idx)
    # 5 frames sampled to 2 -> indices 0, 2
    for row, want in zip(rows, [shades[0], shades[2]]):
        assert abs(_decode_jpeg(bytes(row.frame))["mean_pixel"] - want) < 1.0


def test_mp4_walk_guards_hostile_and_non_jpeg_payloads():
    """Hostile/foreign ISO-BMFF payloads: truncated tables, lying
    counts, and non-JPEG (predictive-codec) samples must yield [] from
    extract_video_frames — never raise, never over-allocate."""
    import struct

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        extract_video_frames,
        mp4_sample_spans,
    )

    h264ish = [b"\x00\x00\x00\x01\x67" + b"\x42" * 40,
               b"\x00\x00\x00\x01\x65" + b"\x88" * 64]
    mp4 = _pack_mjpeg_mp4(h264ish)
    assert len(mp4_sample_spans(mp4)) == 2       # spans resolve fine
    assert extract_video_frames(mp4, 4) == []    # but no JPEG frames

    good = _pack_mjpeg_mp4([b"\xff\xd8\xff\xd9"])
    # lying stsz count (2^31 samples): clamped, no MemoryError
    evil = good.replace(struct.pack(">II", 0, 1),
                        struct.pack(">II", 0, 0x7FFFFFFF), 1)
    assert mp4_sample_spans(evil) == [] or len(mp4_sample_spans(evil)) <= 1
    for cut in (10, 40, len(good) - 5):
        mp4_sample_spans(good[:cut])             # truncation never raises
    junk = b"\x00\x00\x00\x0cftypJUNKJUNK" + b"\xff" * 30
    assert mp4_sample_spans(junk) == []


def _flac_bytes(rate=44100, channels=2, bits=16, total=88200):
    """Hand-packed FLAC STREAMINFO header (first metadata block)."""
    import struct

    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) \
        | total
    info = (struct.pack(">HH", 4096, 4096) + b"\x00" * 6
            + struct.pack(">Q", packed) + b"\x00" * 16)
    return b"fLaC" + b"\x80" + len(info).to_bytes(3, "big") + info


def _mp3_bytes(*, ver=3, kbps_idx=9, sr_idx=0, mono=False, n_pad=4000,
               id3=0):
    """One Layer-III frame header + filler; optional ID3v2 tag with a
    syncsafe size in front."""
    b2 = 0xE0 | (ver << 3) | (1 << 1)              # sync tail|ver|layer III
    b3 = (kbps_idx << 4) | (sr_idx << 2)
    b4 = (3 << 6) if mono else 0
    frame = bytes([0xFF, b2, b3, b4]) + b"\x55" * n_pad
    if id3:
        ss = bytes([(id3 >> 21) & 0x7F, (id3 >> 14) & 0x7F,
                    (id3 >> 7) & 0x7F, id3 & 0x7F])
        return b"ID3\x04\x00\x00" + ss + b"\x00" * id3 + frame
    return frame


def _ogg_bytes(codec="vorbis", rate=48000, channels=2):
    """First OGG page wrapping a Vorbis or Opus identification header."""
    import struct

    if codec == "vorbis":
        body = (b"\x01vorbis" + struct.pack("<I", 0)
                + bytes([channels]) + struct.pack("<I", rate)
                + b"\x00" * 12 + b"\x01")
    else:
        body = (b"OpusHead" + bytes([1, channels])
                + struct.pack("<H", 312) + struct.pack("<I", rate)
                + b"\x00" * 3)
    head = (b"OggS" + b"\x00" + b"\x02" + b"\x00" * 8 + b"\x00" * 4
            + b"\x00" * 4 + b"\x00" * 4 + bytes([1, len(body)]))
    return head + body


def test_audio_header_flac_mp3_ogg(spark):
    """Header breadth beyond WAV: FLAC STREAMINFO bit-unpacking, MP3
    frame headers (MPEG1/2, ID3v2 skip, mono/stereo, CBR duration
    estimate), OGG Vorbis and Opus identification headers — all in the
    same JVM-only plan (no Python worker stage)."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        audio_media_features,
    )

    rows = [
        (1, _flac_bytes(rate=96000, channels=1, bits=24, total=960000)),
        (2, _mp3_bytes(ver=3, kbps_idx=9, sr_idx=0)),          # 128k 44.1
        (3, _mp3_bytes(ver=2, kbps_idx=8, sr_idx=1, mono=True,
                       id3=256)),                              # 64k 24k
        (4, _ogg_bytes("vorbis", rate=44100, channels=2)),
        (5, _ogg_bytes("opus", rate=48000, channels=1)),
        (6, _wav_bytes(channels=2, rate=44100, bits=16, n_frames=441)),
        (7, b"\xffnot really audio at all" + b"\x00" * 40),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "media_id long, payload binary")
    out = audio_media_features(df, "media_id", "payload")
    got = {r.media_id: r for r in out.collect()}

    r = got["1"]
    assert (r.format, r.codec, r.channels, r.sample_rate,
            r.bits_per_sample, r.n_frames) == \
        ("flac", "flac", 1, 96000, 24, 960000)
    assert r.duration_ms == 10000

    r = got["2"]
    assert (r.format, r.codec, r.channels, r.sample_rate) == \
        ("mp3", "mp3", 2, 44100)
    # 4004 bytes at 128 kbps -> ~250 ms CBR estimate
    assert abs(r.duration_ms - 250) <= 1

    r = got["3"]  # ID3-prefixed MPEG2: tag skipped, half-rate table
    assert (r.channels, r.sample_rate) == (1, 24000)
    assert abs(r.duration_ms - 4004 * 8 // 64) <= 1

    assert (got["4"].format, got["4"].codec, got["4"].channels,
            got["4"].sample_rate) == ("ogg", "vorbis", 2, 44100)
    assert (got["5"].format, got["5"].codec, got["5"].channels,
            got["5"].sample_rate) == ("ogg", "opus", 1, 48000)
    assert got["6"].format == "wav"                # wav path untouched
    assert got["7"].format is None

    # hostile variants: truncations and lying sizes degrade to nulls,
    # never an ANSI crash
    evil = [(10, _flac_bytes()[:10]), (11, _mp3_bytes()[:2]),
            (12, _ogg_bytes()[:20]),
            (13, b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f" + b"\xff" * 8),
            (14, b"fLaC" + b"\xff" * 60)]
    edf = spark.createDataFrame([(i, bytearray(p)) for i, p in evil],
                                "media_id long, payload binary")
    for r in audio_media_features(edf, "media_id", "payload").collect():
        assert r.format in (None, "flac", "mp3")   # parse or clean null

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_mp4_sample_times_from_stts():
    """stts run-length deltas x mdhd timescale -> per-sample ms,
    aligned with the span order; truncation yields []."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        mp4_sample_spans,
        mp4_sample_times,
    )

    frames = [b"\xff\xd8" + bytes([i]) * 10 + b"\xff\xd9"
              for i in range(4)]
    mp4 = _pack_mjpeg_mp4(frames)
    times = mp4_sample_times(mp4)
    # timescale 1000, delta 100 ticks -> 100 ms per frame
    assert times == [0, 100, 200, 300]
    assert len(times) == len(mp4_sample_spans(mp4))
    assert mp4_sample_times(mp4[:40]) == []
    assert mp4_sample_times(b"\x00\x00\x00\x0cftypJUNK") == []


# ---------------------------------------------------------------------------
# FLAC sample decode (RFC 9639): hand-written encoder below exercises every
# subframe type the decoder supports — CONSTANT / VERBATIM / FIXED / LPC,
# Rice partitions + escape partitions, wasted bits, and all three stereo
# decorrelation modes — against exact expected sample arrays.
# ---------------------------------------------------------------------------

class _BitW:
    def __init__(self):
        self.acc, self.n, self.out = 0, 0, bytearray()

    def w(self, v, n):
        assert 0 <= v < (1 << n), (v, n)
        self.acc, self.n = (self.acc << n) | v, self.n + n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def ws(self, v, n):
        self.w(v & ((1 << n) - 1), n)

    def align(self):
        if self.n:
            self.w(0, 8 - self.n)


_FIXED_COEFFS = ([], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1])


def _rice(bw, residuals, blocksize, order, param=3, porder=0,
          escape_last=False):
    bw.w(0, 2)                                   # method 0: 4-bit params
    bw.w(porder, 4)
    idx, parts, n = 0, 1 << porder, blocksize >> porder
    for p in range(parts):
        cnt = n - (order if p == 0 else 0)
        if escape_last and p == parts - 1:       # raw-bits escape partition
            raw = 18
            bw.w(0xF, 4)
            bw.w(raw, 5)
            for _ in range(cnt):
                bw.ws(residuals[idx], raw)
                idx += 1
            continue
        bw.w(param, 4)
        for _ in range(cnt):
            v = residuals[idx]
            idx += 1
            u = 2 * v if v >= 0 else -2 * v - 1
            for _ in range(u >> param):
                bw.w(0, 1)
            bw.w(1, 1)
            if param:
                bw.w(u & ((1 << param) - 1), param)


def _sub_constant(value, bps):
    def wr(bw):
        bw.w(0, 1); bw.w(0, 6); bw.w(0, 1)
        bw.ws(value, bps)
    return wr


def _sub_verbatim(samples, bps, wasted=0):
    def wr(bw):
        bw.w(0, 1); bw.w(1, 6)
        if wasted:
            bw.w(1, 1)                           # flag, then unary wasted-1
            for _ in range(wasted - 1):
                bw.w(0, 1)
            bw.w(1, 1)
        else:
            bw.w(0, 1)
        for s in samples:
            assert s % (1 << wasted) == 0
            bw.ws(s >> wasted, bps - wasted)
    return wr


def _sub_fixed(samples, order, bps, param=3, porder=0, escape_last=False):
    co = _FIXED_COEFFS[order]
    res = [samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(co))
           for i in range(order, len(samples))]

    def wr(bw):
        bw.w(0, 1); bw.w(8 + order, 6); bw.w(0, 1)
        for s in samples[:order]:
            bw.ws(s, bps)
        _rice(bw, res, len(samples), order, param, porder, escape_last)
    return wr


def _sub_lpc(samples, coeffs, shift, precision, bps, param=3):
    order = len(coeffs)
    res = [samples[i]
           - (sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
              >> shift)
           for i in range(order, len(samples))]

    def wr(bw):
        bw.w(0, 1); bw.w(31 + order, 6); bw.w(0, 1)
        for s in samples[:order]:
            bw.ws(s, bps)
        bw.w(precision - 1, 4)
        bw.ws(shift, 5)
        for c in coeffs:
            bw.ws(c, precision)
        _rice(bw, res, len(samples), order, param)
    return wr


def _flac_frame(bw, blocksize, sub_writers, ch_asgn, frame_no=0,
                ss_code=0):
    bw.w(0x3FFE, 14)
    bw.w(0, 1); bw.w(0, 1)                       # reserved, fixed blocksize
    bw.w(7, 4)                                   # 16-bit blocksize follows
    bw.w(0, 4)                                   # rate from STREAMINFO
    bw.w(ch_asgn, 4)
    bw.w(ss_code, 3)                             # 0 = bits from STREAMINFO
    bw.w(0, 1)
    assert frame_no < 128
    bw.w(frame_no, 8)                            # 1-byte utf8 frame number
    bw.w(blocksize - 1, 16)
    bw.w(0, 8)                                   # header crc-8 (unchecked)
    for swr in sub_writers:
        swr(bw)
    bw.align()
    bw.w(0, 16)                                  # frame crc-16 (unchecked)


def _flac_stream(frames, rate, bits, channels, total):
    """frames: [(blocksize, ch_asgn, [subframe writers])]"""
    bw = _BitW()
    for i, (bs, asgn, subs) in enumerate(frames):
        _flac_frame(bw, bs, subs, asgn, frame_no=i)
    return _flac_bytes(rate=rate, channels=channels, bits=bits,
                       total=total) + bytes(bw.out)


def test_flac_decode_mono_all_subframe_types():
    """CONSTANT, VERBATIM (incl. wasted bits), FIXED orders 0-4 with
    Rice partitions and an escape partition, and LPC — every decoded
    sample exact against the pre-encoding arrays."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import decode_flac

    rng = np.random.default_rng(7)
    const = [-1234] * 64
    verb = [int(v) for v in rng.integers(-30000, 30000, 64)]
    wast = [int(v) * 4 for v in rng.integers(-7000, 7000, 64)]
    # smooth-ish signal so FIXED residuals stay small
    fixed = [int(8000 * np.sin(i / 9)) for i in range(64)]
    lpc = [int(6000 * np.cos(i / 11)) for i in range(64)]
    frames = [
        (64, 0, [_sub_constant(-1234, 16)]),
        (64, 0, [_sub_verbatim(verb, 16)]),
        (64, 0, [_sub_verbatim(wast, 16, wasted=2)]),
        (64, 0, [_sub_fixed(fixed, 2, 16, param=5, porder=2)]),
        (64, 0, [_sub_fixed(verb, 0, 16, param=6, porder=1,
                            escape_last=True)]),
        (64, 0, [_sub_lpc(lpc, [3, -2], shift=1, precision=5, bps=16,
                          param=5)]),
    ]
    payload = _flac_stream(frames, rate=8000, bits=16, channels=1,
                           total=64 * 6)
    d = decode_flac(payload)
    assert (d["format"], d["channels"], d["sample_rate"], d["n_frames"]) \
        == ("flac", 1, 8000, 64 * 6)
    expect = np.array(const + verb + wast + fixed + verb + lpc,
                      dtype=np.float64) / 32768.0
    assert np.array_equal(d["samples"], expect)
    assert d["rms"] == round(float(np.sqrt((expect ** 2).mean())), 6)
    assert d["peak"] == round(float(np.abs(expect).max()), 6)


def test_mp3_decode_seam_gated_by_availability():
    """MP3 sample decode is an optional-dependency seam (the Pillow
    pattern): with a backend installed the samples decode to the
    standard contract; without one the payload raises the documented
    NotImplementedError (-> null fallback in the Spark stage) with an
    actionable message. Both bare-sync and ID3-tagged payloads route
    into the seam instead of the 'not a wav' error."""
    import pytest

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decode_audio,
        mp3_decoder_available,
    )

    for payload in (_mp3_bytes(), _mp3_bytes(id3=64)):
        if mp3_decoder_available():
            try:
                d = decode_audio(payload)
                assert d["format"] == "mp3"
                assert d["sample_rate"] > 0 and d["channels"] >= 1
                assert d["rms"] is None or d["rms"] >= 0.0
            except NotImplementedError as e:
                # backend present but rejects the synthetic header-only
                # fixture — still the documented error contract
                assert "mp3:" in str(e)
        else:
            with pytest.raises(NotImplementedError,
                               match="no sample decoder"):
                decode_audio(payload)


def test_mp3_null_fallback_in_spark_stage(spark):
    """Without an MP3 backend the Arrow-batched decode stage keeps the
    row and nulls the sample-derived features — never drops or errors;
    WAV rows in the same batch still decode fully."""
    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        decoded_audio_features,
        mp3_decoder_available,
    )

    if mp3_decoder_available():
        import pytest
        pytest.skip("an MP3 backend is installed; null-fallback branch "
                    "not reachable")
    rows = [(1, _mp3_bytes()), (2, _wav_bytes())]
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    got = {r.media_id: r for r in decoded_audio_features(
        df, "media_id", "payload").collect()}
    assert got["1"].rms is None and got["1"].format is None
    assert got["2"].format == "wav" and got["2"].rms is not None


def test_flac_reserved_bits_code_refuses():
    """A frame whose bits-per-sample code is the RESERVED value 3 must
    raise (into decode_audio's documented null fallback), never fall
    back to STREAMINFO bits and decode garbage samples."""
    import pytest

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import decode_flac

    bw = _BitW()
    _flac_frame(bw, 64, [_sub_constant(-1234, 16)], 0, ss_code=3)
    payload = _flac_bytes(rate=8000, channels=1, bits=16,
                          total=64) + bytes(bw.out)
    with pytest.raises(NotImplementedError, match="bits-per-sample"):
        decode_flac(payload)
    # the non-reserved table codes still decode (control: code 4 = 16 bit)
    bw2 = _BitW()
    _flac_frame(bw2, 64, [_sub_constant(-1234, 16)], 0, ss_code=4)
    d = decode_flac(_flac_bytes(rate=8000, channels=1, bits=16,
                                total=64) + bytes(bw2.out))
    assert d["n_frames"] == 64


def test_flac_decode_stereo_decorrelation_modes():
    """left/side, side/right, and mid/side frames all reconstruct the
    same known L/R arrays exactly; independent 2-channel as control."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import decode_flac

    rng = np.random.default_rng(11)
    L = [int(v) for v in rng.integers(-30000, 30000, 48)]
    R = [int(v) for v in rng.integers(-30000, 30000, 48)]
    side = [l - r for l, r in zip(L, R)]
    mid = [(l + r) >> 1 for l, r in zip(L, R)]
    frames = [
        (48, 1, [_sub_verbatim(L, 16), _sub_verbatim(R, 16)]),
        (48, 8, [_sub_verbatim(L, 16), _sub_verbatim(side, 17)]),
        (48, 9, [_sub_verbatim(side, 17), _sub_verbatim(R, 16)]),
        (48, 10, [_sub_verbatim(mid, 16), _sub_verbatim(side, 17)]),
    ]
    payload = _flac_stream(frames, rate=44100, bits=16, channels=2,
                           total=48 * 4)
    d = decode_flac(payload)
    assert d["channels"] == 2 and d["n_frames"] == 48 * 4
    inter = np.array([v for l, r in zip(L, R) for v in (l, r)] * 1,
                     dtype=np.float64)
    expect = np.concatenate([inter] * 4) / 32768.0
    assert np.array_equal(d["samples"], expect)


def test_flac_spectral_and_spark_paths(spark):
    """decode_audio dispatches FLAC; a pure FLAC sine lands its energy
    in the right spectral band through audio_spectral_features, and
    decoded_audio_features handles mixed WAV/FLAC/hostile payloads in
    one Arrow batch."""
    import numpy as np

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import (
        audio_spectral_features,
        decode_audio,
        decoded_audio_features,
    )

    rate, n = 8000, 8192
    # amplitude matches _sine_wav (0.5 * (1 << 14)) so the FLAC and WAV
    # encodings carry the same samples and rms/bands agree
    sine = [int(8192 * np.sin(2 * np.pi * 1250 * i / rate))
            for i in range(n)]
    frames = [(2048, 0, [_sub_verbatim(sine[i:i + 2048], 16)])
              for i in range(0, n, 2048)]
    flac_sine = _flac_stream(frames, rate=rate, bits=16, channels=1,
                             total=n)
    d = decode_audio(flac_sine)
    assert d["format"] == "flac" and d["n_frames"] == n

    wav_sine = _sine_wav(1250, rate=rate, n=n)
    df = spark.createDataFrame(
        [(1, bytearray(flac_sine)), (2, bytearray(wav_sine)),
         (3, bytearray(b"fLaC" + b"\xff" * 50)), (4, bytearray(b""))],
        "media_id long, payload binary")
    spec = {r.media_id: r
            for r in audio_spectral_features(df, "media_id", "payload",
                                             bands=8).collect()}
    # 1250 Hz at a 4000 Hz Nyquist -> band 2 of 8 dominates, and the
    # FLAC and WAV encodings of the same sine agree to float tolerance
    assert spec["1"].band_energy[2] > 0.9
    assert np.allclose(spec["1"].band_energy, spec["2"].band_energy,
                       atol=1e-3)
    assert spec["3"].band_energy is None and spec["4"].band_energy is None

    feats = {r.media_id: r
             for r in decoded_audio_features(df, "media_id",
                                             "payload").collect()}
    assert (feats["1"].format, feats["1"].sample_rate,
            feats["1"].n_frames) == ("flac", 8000, n)
    assert feats["2"].format == "wav"
    assert abs(feats["1"].rms - feats["2"].rms) < 1e-3
    assert feats["3"].format is None                    # hostile -> nulls


def test_flac_decode_hostile_never_misreads():
    """Corrupt streams raise NotImplementedError (the degrade-to-null
    signal), never return wrong samples or loop forever."""
    import pytest

    from airflow_pipelines_from_mongo_to_postgres_spark.operators.multimodal import decode_flac

    good = _flac_stream([(64, 0, [_sub_constant(100, 16)])],
                        rate=8000, bits=16, channels=1, total=64)
    for evil in (
        good[:20],                               # truncated STREAMINFO
        good[:len(good) - 6],                    # truncated mid-frame
        good[:42] + b"\x00\x00" + good[44:],     # sync bytes destroyed
        b"fLaC",                                 # nothing after magic
        b"RIFF1234WAVE",                         # not flac at all
    ):
        with pytest.raises(NotImplementedError):
            decode_flac(evil)
