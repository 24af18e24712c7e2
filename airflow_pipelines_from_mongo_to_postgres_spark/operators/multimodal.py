"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contract (schemas, partitioning, batch shapes) is real and
tested; the actual codec calls are STUBBED (``decoder=None`` → deterministic
fake) because image/audio libraries are not in this container. Swap in a
real decoder (PIL/torchaudio/ffmpeg) by passing ``decoder=`` — the Spark
plan is unchanged.

Scale notes: mapInPandas streams Arrow batches through one Python worker
per core — decode cost parallelizes with partitions, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory for
large payloads. Keep payloads ≤ a few MB per row; larger media belongs in
object storage with the column holding a URI.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the feature-extraction stage.
MEDIA_FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("media_type", StringType(), True),
    StructField("payload_bytes", IntegerType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("format", StringType(), True),
])


def _stub_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: derives pseudo-dimensions from the
    payload bytes. Replace with a real codec in production."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload: real decoder required")
    return {
        "width": 16 + payload[0] % 64,
        "height": 16 + payload[-1] % 64,
        "format": "stub",
    }


def extract_media_features(df: DataFrame, id_col: str, payload_col: str,
                           media_type_col: str | None = None,
                           decoder: Callable[[bytes], dict] | None = None,
                           ) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. One Arrow batch
    in, one feature frame out; no per-row Python round trips."""
    dec = decoder or _stub_decode
    mt = media_type_col

    def safe_dec(p: bytes) -> dict:
        try:
            return dec(p)
        except NotImplementedError:
            return {"width": None, "height": None, "format": None}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Metadata fields are vectorized pandas column ops; only the codec
        # hook itself goes through Series.map (its per-payload cost is the
        # whole point of the stage — no other per-row Python remains).
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf[payload_col].map(
                lambda p: bytes(p) if p is not None else b"")
            feats = payloads.map(safe_dec)
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "media_type": (pdf[mt] if mt
                               else "application/octet-stream"),
                "payload_bytes": payloads.str.len(),
                "width": feats.map(lambda d: d["width"]),
                "height": feats.map(lambda d: d["height"]),
                "format": feats.map(lambda d: d["format"]),
            })

    cols = [id_col, payload_col] + ([mt] if mt else [])
    return df.select(*cols).mapInPandas(run, MEDIA_FEATURES_SCHEMA)


#: Output schema of the resize stage: payload out, new dims recorded.
RESIZED_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def resize_media(df: DataFrame, id_col: str, payload_col: str,
                 width: int, height: int,
                 resizer: Callable[[bytes, int, int], bytes] | None = None,
                 ) -> DataFrame:
    """1→1 mapInPandas resize stage. ``resizer`` is the real codec hook
    (e.g. PIL thumbnail); the default stub is a deterministic fake that
    keeps the plumbing testable without image libraries."""
    rz = resizer or (lambda p, w, h: p[: max(1, (len(p) * w * h) // (w * h + len(p)))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf[payload_col].map(
                lambda p: bytes(p) if p is not None else b"")
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "payload": payloads.map(lambda p: rz(p, width, height)),
                "width": width,
                "height": height,
            })

    return df.select(id_col, payload_col).mapInPandas(run, RESIZED_SCHEMA)


#: Output schema of frame sampling — ONE ROW PER SAMPLED FRAME (1→N).
FRAMES_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), True),
])


def sample_frames(df: DataFrame, id_col: str, payload_col: str,
                  num_frames: int = 4,
                  sampler: Callable[[bytes, int], list[bytes]] | None = None,
                  ) -> DataFrame:
    """1→N mapInPandas frame sampling: each video payload row expands to
    ``num_frames`` frame rows. The Arrow batch out is larger than the batch
    in — mapInPandas (unlike a scalar pandas_udf) supports this shape,
    which is why the whole multimodal family uses it. Stub sampler slices
    the payload into ``num_frames`` even chunks."""
    def _stub(p: bytes, n: int) -> list[bytes]:
        if not p:
            return []
        step = max(1, len(p) // n)
        return [p[i * step:(i + 1) * step] for i in range(min(n, len(p)))]

    sm = sampler or _stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # 1→N via pandas explode: the sampler hook returns a frame list per
        # row; explode + per-row cumcount reproduce the enumerate order.
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf[payload_col].map(
                lambda p: bytes(p) if p is not None else b"")
            out = pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "frame": payloads.map(lambda p: sm(p, num_frames)),
            }).explode("frame")
            out = out[out["frame"].notna()]          # empty lists explode to NaN
            out["frame_idx"] = out.groupby(level=0).cumcount()
            yield out.reset_index(drop=True)[["media_id", "frame_idx", "frame"]]

    return df.select(id_col, payload_col).mapInPandas(run, FRAMES_SCHEMA)


def _be_uint(bin_col, pos: int, nbytes: int):
    """Big-endian unsigned int from ``nbytes`` at 1-indexed ``pos``.
    LONG arithmetic throughout: a 4-byte field can carry values ≥ 2³¹
    (e.g. a BMP top-down height stored as negative int32), and under
    Spark 4's default ANSI mode an int overflow would CRASH the query
    instead of yielding the documented null."""
    return F.conv(F.hex(F.substring(bin_col, pos, nbytes)), 16, 10).cast("long")


def _le_uint(bin_col, pos: int, nbytes: int):
    """Little-endian unsigned int: combine bytes low-to-high (long math)."""
    out = F.lit(0).cast("long")
    for i in range(nbytes):
        out = out + _be_uint(bin_col, pos + i, 1) * F.lit(1 << (8 * i)).cast("long")
    return out


def _clamp_int(col):
    """Clamp a long into int range before casting — adversarial header
    bytes must degrade to a saturated value, never an ANSI overflow crash."""
    return F.least(col, F.lit((1 << 31) - 1).cast("long")).cast("int")


def _le_int32_abs(bin_col, pos: int):
    """|signed little-endian int32| — BMP height is negative for top-down
    rows; the dimension filter wants magnitude either way."""
    raw = _le_uint(bin_col, pos, 4)
    return F.when(raw >= F.lit(1 << 31).cast("long"),
                  F.lit(1 << 32).cast("long") - raw).otherwise(raw)


def image_dimensions(payload_col) -> F.Column:
    """``struct(format, width, height)`` parsed from the payload's header
    bytes — PNG (IHDR, big-endian at offset 16), GIF (LE uint16 at 6),
    BMP (LE int32 at 18). Pure Column expressions over ``substring``/
    ``hex``/``conv``: runs inside whole-stage codegen with NO Python
    workers and no image libraries — the header path most curation
    pipelines need (dimension/aspect filters) without ever decoding.
    Unknown or truncated payloads → null fields."""
    b = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    is_png = F.hex(F.substring(b, 1, 8)) == "89504E470D0A1A0A"
    is_gif = F.hex(F.substring(b, 1, 4)) == "47494638"        # "GIF8"
    is_bmp = F.hex(F.substring(b, 1, 2)) == "424D"            # "BM"
    long_enough = F.octet_length(b)
    return (
        F.when(is_png & (long_enough >= 24), F.struct(
            F.lit("png").alias("format"),
            _clamp_int(_be_uint(b, 17, 4)).alias("width"),
            _clamp_int(_be_uint(b, 21, 4)).alias("height")))
        .when(is_gif & (long_enough >= 10), F.struct(
            F.lit("gif").alias("format"),
            _clamp_int(_le_uint(b, 7, 2)).alias("width"),
            _clamp_int(_le_uint(b, 9, 2)).alias("height")))
        .when(is_bmp & (long_enough >= 26), F.struct(
            F.lit("bmp").alias("format"),
            _clamp_int(_le_int32_abs(b, 19)).alias("width"),
            _clamp_int(_le_int32_abs(b, 23)).alias("height")))
        .otherwise(F.struct(
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height")))
    )


def header_media_features(df: DataFrame, id_col: str,
                          payload_col: str) -> DataFrame:
    """Scan-side (JVM-only) variant of ``extract_media_features`` for
    formats whose dimensions live in fixed header offsets: no mapInPandas
    stage, no Python workers — at 100 TB this is a plain projection
    fused into the scan. Falls back to nulls where the header isn't
    recognized (route those rows to the codec stage)."""
    dims = image_dimensions(payload_col)
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.octet_length(F.col(payload_col)).alias("payload_bytes"),
        dims.getField("format").alias("format"),
        dims.getField("width").alias("width"),
        dims.getField("height").alias("height"),
    )


def attach_payload(df: DataFrame, text_col: str, payload_col: str = "payload") -> DataFrame:
    """Test helper: fabricate a binary payload column from text (the
    fixtures carry no real media; the plumbing is what's under test)."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8")) \
             .withColumn(payload_col, F.col(payload_col).cast(BinaryType()))
