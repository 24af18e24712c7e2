"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contract (schemas, partitioning, batch shapes) is real and
tested. The IMAGE decode path is real too: ``decode_image`` reconstructs
pixels for PNG (stdlib zlib inflate + scanline unfilter) and uncompressed
BMP with no external library, preferring Pillow when importable
(``decoded_media_features``). Audio/video codecs remain pluggable seams
(``decoder=``/``sampler=`` hooks with deterministic fakes) — ffmpeg-class
dependencies don't belong in the engine.

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
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
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


# --- real pixel decoders (stdlib + numpy: PNG, BMP, baseline JPEG) ----------
#
# The container ships no image library, but PNG's pixel path needs nothing
# beyond zlib (stdlib) + the per-scanline unfilter pass, uncompressed BMP
# is plain byte arithmetic, and baseline JPEG is Huffman + dequant + an
# 8×8 IDCT (numpy) — so the decode seam is REAL for the three formats the
# tests exercise, not a stub. Pillow, when importable, is preferred (more
# formats, C-speed); these cover the container. Formats outside the
# decoders raise NotImplementedError and flow to the documented null
# fallback in extract_media_features.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> samples per pixel (8-bit depth, non-interlaced only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, width: int, height: int, ch: int) -> bytearray:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth).
    Sequential per scanline by necessity — each byte depends on the
    reconstructed left/up neighbours."""
    stride = width * ch
    out = bytearray(stride * height)
    prev = bytearray(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1: pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:      # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:    # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:    # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise NotImplementedError(f"png filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return out


def _decode_png(payload: bytes) -> dict:
    import struct
    import zlib

    if len(payload) < 33 or payload[:8] != _PNG_MAGIC:
        raise NotImplementedError("not a png")
    width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29])
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"png depth={depth} ctype={ctype} interlace={interlace}")
    ch = _PNG_CHANNELS[ctype]
    # walk chunks; IDAT may be split — concatenate before one inflate
    idat, pos = [], 8
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat.append(payload[pos + 8:pos + 8 + length])
        if tag == b"IEND":
            break
        pos += 12 + length          # len + tag + data + crc
    pixels = _png_unfilter(zlib.decompress(b"".join(idat)),
                           width, height, ch)
    n = len(pixels)
    return {"width": width, "height": height, "format": "png",
            "channels": ch,
            "mean_pixel": round(sum(pixels) / n, 4) if n else None,
            # packed h×w×ch, row-major top-down, PNG-native channel
            # order (gray / RGB / RGBA) — the raw buffer the resize
            # stage resamples
            "pixels": bytes(pixels)}


def _decode_bmp(payload: bytes) -> dict:
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not a bmp")
    data_off, = struct.unpack("<I", payload[10:14])
    width, raw_height = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression, = struct.unpack("<I", payload[30:34])
    if compression != 0 or bpp not in (24, 32) or planes != 1:
        raise NotImplementedError(f"bmp bpp={bpp} compression={compression}")
    height = abs(raw_height)        # negative = top-down
    ch = bpp // 8
    stride = (width * ch + 3) & ~3  # rows pad to 4 bytes
    total = n = 0
    rows = []
    for y in range(height):
        row = payload[data_off + y * stride:
                      data_off + y * stride + width * ch]
        total += sum(row)
        n += len(row)
        rows.append(row)
    # normalize the raw buffer to the shared convention: top-down
    # (positive-height BMPs store rows bottom-up) and RGB(A) order
    # (BMP stores BGR(A))
    if raw_height > 0:
        rows.reverse()
    px = bytearray()
    for row in rows:
        for x in range(0, len(row) - ch + 1, ch):
            px += row[x:x + 3][::-1] + row[x + 3:x + ch]
    return {"width": width, "height": height, "format": "bmp",
            "channels": ch,
            "mean_pixel": round(total / n, 4) if n else None,
            "pixels": bytes(px)}


# --- baseline JPEG pixel decode (stdlib + numpy — no image library) ---------
#
# Sequential baseline DCT (SOF0) with Huffman entropy coding covers the
# overwhelming majority of real-world JPEGs. Progressive (SOF2),
# arithmetic, lossless, and 12-bit variants raise NotImplementedError and
# flow to the documented null fallback. numpy is used only for the 8×8
# IDCT and plane math (vectorized); the entropy decode is a plain bit
# loop — correct first, and the mapInPandas seam batches it per Arrow
# block so the JVM pipeline shape is unchanged.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_DCT_M = None


def _dct_matrix():
    global _DCT_M
    if _DCT_M is None:
        import math

        import numpy as np
        m = np.zeros((8, 8))
        for u in range(8):
            a = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
            for x in range(8):
                m[u, x] = a * math.cos((2 * x + 1) * u * math.pi / 16)
        _DCT_M = m
    return _DCT_M


class _JpegMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; a real marker (RSTn/EOI/...) raises _JpegMarker."""

    def __init__(self, data: bytes, pos: int):
        self.d, self.p = data, pos
        self.buf, self.n = 0, 0

    def bit(self) -> int:
        if self.n == 0:
            if self.p >= len(self.d):
                raise NotImplementedError("jpeg: truncated entropy data")
            b = self.d[self.p]
            self.p += 1
            if b == 0xFF:
                nxt = self.d[self.p] if self.p < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.p += 1
                else:
                    self.p += 1
                    raise _JpegMarker(nxt)
            self.buf, self.n = b, 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def receive(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0


def _huff_table(bits: list, vals: bytes) -> dict:
    """Canonical Huffman: (code_length, code) -> symbol (ITU T.81 C.2)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("jpeg: invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def _decode_jpeg(payload: bytes) -> dict:
    import struct

    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a jpeg")
    try:
        return _decode_jpeg_inner(payload, np, struct)
    except (IndexError, KeyError, ValueError, struct.error) as e:
        # hostile/truncated payloads degrade to the documented
        # unsupported-format path, never a raw slicing error
        raise NotImplementedError(f"jpeg: malformed stream ({e})") from e


def _decode_jpeg_inner(payload: bytes, np, struct) -> dict:
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple, dict] = {}     # (class 0=DC/1=AC, id) -> table
    comps: list[dict] = []
    width = height = 0
    dri = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("jpeg: desynchronized marker stream")
        marker = payload[pos + 1]
        seg_len, = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:           # DQT (possibly several tables)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec != 0:
                    raise NotImplementedError("jpeg: 16-bit quant table")
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = np.frombuffer(
                    body[b + 1:b + 65], dtype=np.uint8)
                qt[tid] = tbl.reshape(8, 8)
                b += 65
        elif marker == 0xC4:         # DHT (possibly several tables)
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                huff[(cls, tid)] = _huff_table(
                    bits, body[b + 17:b + 17 + n])
                b += 17 + n
        elif marker == 0xC0:         # SOF0 baseline
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("jpeg: 12-bit precision")
            for i in range(nc):
                cid, hv, qid = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "q": qid})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: non-baseline frame (SOF{marker - 0xC0})")
        elif marker == 0xDD:         # DRI
            dri, = struct.unpack(">H", body[:2])
        elif marker == 0xDA:         # SOS — entropy data follows
            ns = body[0]
            for i in range(ns):
                cid, tids = body[1 + 2 * i:3 + 2 * i]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["dc"] = tids >> 4
                        comp["ac"] = tids & 0xF
            pos = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    else:
        raise NotImplementedError("jpeg: no SOS segment")
    if not comps or not width or not height:
        raise NotImplementedError("jpeg: missing SOF0")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    m = _dct_matrix()
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
              for c in comps]
    pred = [0] * len(comps)
    r = _BitReader(payload, pos)
    done = False
    for my in range(mcuy):
        if done:
            break
        for mx in range(mcux):
            if dri and (my * mcux + mx) and (my * mcux + mx) % dri == 0:
                # restart: byte-align, consume RSTn, reset DC predictors
                r.align()
                try:
                    while True:
                        r.bit()      # drain to the marker
                except _JpegMarker as mk:
                    if not 0xD0 <= mk.marker <= 0xD7:
                        raise NotImplementedError("jpeg: lost restart sync")
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = np.zeros(64)
                            s = _huff_decode(r, huff[(0, c["dc"])])
                            diff = _extend(r.receive(s), s)
                            pred[ci] += diff
                            coef[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(r, huff[(1, c["ac"])])
                                run, size = rs >> 4, rs & 0xF
                                if rs == 0x00:      # EOB
                                    break
                                if rs == 0xF0:      # ZRL
                                    k += 16
                                    continue
                                k += run
                                if k > 63:
                                    raise NotImplementedError(
                                        "jpeg: AC index overrun")
                                coef[_ZIGZAG[k]] = _extend(
                                    r.receive(size), size)
                                k += 1
                            block = (m.T @ ((coef.reshape(8, 8)
                                             * qt[c["q"]])) @ m) + 128
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            except _JpegMarker as mk:
                if mk.marker == 0xD9:   # EOI mid-grid: padded tail
                    done = True
                    break
                raise NotImplementedError(
                    f"jpeg: unexpected marker {mk.marker:#x}")
        # (restart markers between MCU rows are handled by the dri check)

    up = [np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                    hmax // c["h"], axis=1)[:height, :width]
          for p, c in zip(planes, comps)]
    if len(up) == 1:
        rgb = np.clip(up[0], 0, 255)
        channels = 1
    elif len(up) == 3:
        y, cb, cr = up
        rgb = np.stack([
            y + 1.402 * (cr - 128),
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
            y + 1.772 * (cb - 128),
        ])
        rgb = np.clip(rgb, 0, 255)
        channels = 3
    else:
        raise NotImplementedError(f"jpeg: {len(up)} components")
    arr = np.round(rgb).astype("uint8")
    if channels == 3:
        arr = arr.transpose(1, 2, 0)    # (3,h,w) -> (h,w,3)
    return {"width": width, "height": height, "format": "jpeg",
            "channels": channels,
            "mean_pixel": round(float(np.round(rgb).mean()), 4),
            "pixels": arr.tobytes()}


def _lzw_decode(data: bytes, min_code: int, expected: int) -> bytearray:
    """GIF-variant LZW: variable code width starting at ``min_code``+1,
    CLEAR resets the dictionary, widths grow at dictionary fill up to
    12 bits. Stops after ``expected`` output symbols or END; malformed
    streams raise NotImplementedError (hostile-payload rule)."""
    clear, end = 1 << min_code, (1 << min_code) + 1

    def fresh():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh()
    width = min_code + 1
    next_code = end + 1
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width, next_code, prev = fresh(), min_code + 1, \
                    end + 1, None
                continue
            if code == end:
                return out
            if code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise NotImplementedError("gif: corrupt LZW stream")
            out += entry
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= expected:
                return out
    return out


def gif_frames(payload: bytes) -> list:
    """REAL GIF pixel decode (stdlib only): logical-screen + color
    tables parsed, every image block LZW-decompressed and mapped
    through its palette. Returns one dict per stored frame —
    ``{left, top, width, height, delay_ms, pixels}`` with ``pixels``
    packed RGB (the shared raw-buffer convention). Frames are returned
    AS STORED (no disposal compositing — full-frame GIFs, the common
    case, need none; partial-frame animations keep their offsets for
    the caller). Interlaced frames are de-interlaced. Malformed or
    non-8-bit streams raise NotImplementedError."""
    import struct

    if len(payload) < 13 or payload[:4] != b"GIF8":
        raise NotImplementedError("not a gif")
    width, height, packed, _bg, _ar = struct.unpack(
        "<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    frames = []
    delay_ms = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:                      # trailer
            break
        if b == 0x21:                      # extension
            if pos + 2 > len(payload):
                raise NotImplementedError("gif: truncated extension")
            label = payload[pos + 1]
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                size = payload[pos]
                if label == 0xF9 and size >= 4:
                    delay_ms = struct.unpack(
                        "<H", payload[pos + 2:pos + 4])[0] * 10
                pos += 1 + size
            pos += 1                       # block terminator
        elif b == 0x2C:                    # image descriptor
            if pos + 10 > len(payload):
                raise NotImplementedError("gif: truncated descriptor")
            left, top, w, h, ipack = struct.unpack(
                "<HHHHB", payload[pos + 1:pos + 10])
            pos += 10
            table = gct
            if ipack & 0x80:
                n = 2 << (ipack & 7)
                table = payload[pos:pos + 3 * n]
                pos += 3 * n
            if table is None:
                raise NotImplementedError("gif: no color table")
            if pos >= len(payload):
                raise NotImplementedError("gif: truncated image")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 8:
                raise NotImplementedError(f"gif: lzw min {min_code}")
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                size = payload[pos]
                data += payload[pos + 1:pos + 1 + size]
                pos += 1 + size
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, w * h)
            if len(idx) < w * h:
                raise NotImplementedError("gif: short pixel data")
            if ipack & 0x40:               # interlaced: 4-pass row order
                rows = [None] * h
                src = 0
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    for y in range(start, h, step):
                        rows[y] = idx[src * w:(src + 1) * w]
                        src += 1
                idx = bytearray(b for r in rows for b in r)
            px = bytearray()
            for i in idx[:w * h]:
                off = 3 * i
                if off + 3 > len(table):
                    raise NotImplementedError("gif: palette index range")
                px += table[off:off + 3]
            frames.append({"left": left, "top": top, "width": w,
                           "height": h, "delay_ms": delay_ms,
                           "pixels": bytes(px)})
            delay_ms = None
        else:
            raise NotImplementedError(f"gif: unknown block {b:#x}")
    if not frames:
        raise NotImplementedError("gif: no image data")
    return frames


def _decode_gif(payload: bytes) -> dict:
    """First-frame stats + pixels through the shared decode contract."""
    f = gif_frames(payload)[0]
    px = f["pixels"]
    return {"width": f["width"], "height": f["height"], "format": "gif",
            "channels": 3,
            "mean_pixel": round(sum(px) / len(px), 4) if px else None,
            "pixels": px}


def decode_image(payload: bytes) -> dict:
    """REAL image decoder for the ``decoder=`` seam: Pillow when
    available, else the stdlib PNG (zlib inflate + unfilter) and
    uncompressed-BMP paths above. Returns width/height/format plus
    ``channels`` and ``mean_pixel`` (proof the pixels were actually
    reconstructed, not just the header read). Unsupported formats raise
    NotImplementedError → the extract stage's null fallback."""
    if not payload:
        raise NotImplementedError("empty payload")
    try:
        import io

        from PIL import Image  # optional fast path, not in this container
        img = Image.open(io.BytesIO(payload))
        import numpy as np
        # Mean over the NATIVE bands (alpha included, gray single-channel)
        # — the same definition the stdlib fallback uses — so the lake
        # value for a payload never depends on whether Pillow happens to
        # be installed on the executor image.
        arr = np.asarray(img, dtype="float64")
        return {"width": img.width, "height": img.height,
                "format": (img.format or "unknown").lower(),
                "channels": len(img.getbands()),
                "mean_pixel": round(float(arr.mean()), 4),
                "pixels": np.asarray(img, dtype="uint8").tobytes()}
    except ImportError:
        pass
    if payload[:8] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if payload[:4] == b"GIF8":
        return _decode_gif(payload)
    raise NotImplementedError("unsupported image format")


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


#: Output schema of the PIXEL-decode stage: header fields plus the two
#: that require actually reconstructing the image (channels, mean_pixel).
DECODED_FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("payload_bytes", IntegerType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("format", StringType(), True),
    StructField("channels", IntegerType(), True),
    StructField("mean_pixel", DoubleType(), True),
])


class _FlacBits:
    """Big-endian bit cursor over immutable bytes — the whole FLAC
    bitstream layer. ``read`` slices only the touched byte span, so a
    long payload costs O(bits consumed), not O(payload) per call."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data, self.pos = data, 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        start, end = self.pos >> 3, (self.pos + n + 7) >> 3
        if end > len(self.data):
            raise NotImplementedError("flac: truncated bitstream")
        chunk = int.from_bytes(self.data[start:end], "big")
        self.pos += n
        return (chunk >> ((end << 3) - self.pos)) & ((1 << n) - 1)

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        c = 0
        while self.read(1) == 0:
            c += 1
        return c

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def utf8_number(self) -> int:
        """FLAC's extended-UTF-8 frame/sample number (RFC 9639 §9.1.5;
        up to 36 bits / 7 bytes)."""
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        n = 0
        while (b0 << n) & 0x80:
            n += 1
        if n < 2 or n > 7:
            raise NotImplementedError("flac: bad utf8-coded number")
        v = b0 & (0x7F >> n)
        for _ in range(n - 1):
            c = self.read(8)
            if c & 0xC0 != 0x80:
                raise NotImplementedError("flac: bad utf8 continuation")
            v = (v << 6) | (c & 0x3F)
        return v


#: FIXED-predictor coefficients by order (RFC 9639 §9.2.2): s[i] is the
#: dot product with the trailing samples plus the residual.
_FLAC_FIXED_COEFFS = ([], [1], [2, -1], [3, -3, 1], [4, -6, 4, -1])

_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
# no frame-rate table: sr codes 1-11 carry no extra header bytes and the
# output rate always comes from STREAMINFO, so only the explicit-read
# codes (12-14) and the invalid code (15) need handling below
_FLAC_BITS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}  # 3 is reserved


def _flac_residual(br: _FlacBits, blocksize: int, order: int) -> list:
    """Rice-coded residual section shared by FIXED and LPC subframes:
    2-bit method (4- or 5-bit parameters), 4-bit partition order,
    2^order partitions of zigzag-coded residuals; parameter == escape
    means raw ``n``-bit verbatim residuals for that partition."""
    method = br.read(2)
    if method > 1:
        raise NotImplementedError("flac: reserved residual method")
    plen = 4 + method
    escape = (1 << plen) - 1
    porder = br.read(4)
    if blocksize >> porder << porder != blocksize:
        raise NotImplementedError("flac: partition order mismatch")
    out = []
    for p in range(1 << porder):
        cnt = (blocksize >> porder) - (order if p == 0 else 0)
        if cnt < 0:
            raise NotImplementedError("flac: partition shorter than order")
        param = br.read(plen)
        if param == escape:
            raw = br.read(5)
            out += [br.signed(raw) if raw else 0 for _ in range(cnt)]
        else:
            for _ in range(cnt):
                u = (br.unary() << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _flac_subframe(br: _FlacBits, blocksize: int, bps: int) -> list:
    """One channel's samples: CONSTANT / VERBATIM / FIXED(0-4) / LPC,
    with the wasted-bits shift (RFC 9639 §9.2)."""
    if br.read(1):
        raise NotImplementedError("flac: bad subframe pad bit")
    ftype = br.read(6)
    wasted = (br.unary() + 1) if br.read(1) else 0
    bps -= wasted
    if ftype == 0:                                       # CONSTANT
        out = [br.signed(bps)] * blocksize
    elif ftype == 1:                                     # VERBATIM
        out = [br.signed(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:                               # FIXED order 0-4
        order = ftype - 8
        out = [br.signed(bps) for _ in range(order)]
        coeffs = _FLAC_FIXED_COEFFS[order]
        for r in _flac_residual(br, blocksize, order):
            out.append(sum(c * out[-1 - j] for j, c in enumerate(coeffs)) + r)
    elif ftype >= 32:                                    # LPC order 1-32
        order = ftype - 31
        out = [br.signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise NotImplementedError("flac: invalid lpc precision")
        shift = br.signed(5)
        if shift < 0:
            raise NotImplementedError("flac: negative lpc shift")
        coeffs = [br.signed(precision) for _ in range(order)]
        for r in _flac_residual(br, blocksize, order):
            pred = sum(c * out[-1 - j] for j, c in enumerate(coeffs))
            out.append((pred >> shift) + r)
    else:
        raise NotImplementedError(f"flac: reserved subframe type {ftype}")
    return [v << wasted for v in out] if wasted else out


def decode_flac(payload: bytes) -> dict:
    """REAL FLAC sample decode from the public spec (RFC 9639) — no
    codec library: STREAMINFO, then every audio frame's header
    (sync/blocksize/rate/channel-assignment codes, UTF-8 frame number),
    subframes (CONSTANT / VERBATIM / FIXED / LPC with Rice residuals),
    and left-side / right-side / mid-side stereo decorrelation. Emits
    the exact contract ``decode_audio`` emits for WAV — normalized
    interleaved float64 ``samples`` plus rms/peak — so the spectral
    stage runs unchanged on FLAC payloads. CRCs are parsed-past, not
    validated (feature extraction wants samples, not integrity audit).
    Python-loop bit unpacking is fixture/probe-scale by design; bulk
    audio decode at 100 TB belongs on a codec-fleet seam, same as the
    image stubs."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise NotImplementedError("not a flac stream")
    br = _FlacBits(payload)
    br.pos = 32
    rate = channels = bits = total = None
    while True:                                # metadata blocks
        last, btype, blen = br.read(1), br.read(7), br.read(24)
        if btype == 0:                         # STREAMINFO
            br.read(16 + 16 + 24 + 24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36) or None        # 0 = unknown length
            br.read(128)                       # md5
        else:
            br.read(blen * 8)
        if last:
            break
    if rate is None or not rate:
        raise NotImplementedError("flac: missing/invalid STREAMINFO")
    chans: list = [[] for _ in range(channels)]
    while total is None or len(chans[0]) < total:
        if (br.pos >> 3) + 2 > len(payload):
            break
        if br.read(14) != 0x3FFE:
            raise NotImplementedError("flac: lost frame sync")
        br.read(2)                             # reserved + blocking strategy
        bs_code, sr_code = br.read(4), br.read(4)
        ch_asgn, ss_code = br.read(4), br.read(3)
        br.read(1)                             # reserved
        br.utf8_number()                       # frame/sample number
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        elif bs_code in _FLAC_BLOCKSIZES:
            blocksize = _FLAC_BLOCKSIZES[bs_code]
        else:
            raise NotImplementedError("flac: reserved blocksize code")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise NotImplementedError("flac: invalid sample-rate code")
        if ss_code and ss_code not in _FLAC_BITS:
            # reserved code 3: falling back to STREAMINFO bits would
            # decode garbage — surface the documented null fallback
            raise NotImplementedError(
                f"flac: reserved bits-per-sample code {ss_code}")
        fbits = _FLAC_BITS[ss_code] if ss_code else bits
        br.read(8)                             # header CRC-8
        if ch_asgn < 8:
            if ch_asgn + 1 != channels:
                raise NotImplementedError("flac: channel count mismatch")
            sub = [_flac_subframe(br, blocksize, fbits)
                   for _ in range(channels)]
        elif ch_asgn in (8, 9, 10):
            if channels != 2:
                raise NotImplementedError("flac: stereo assignment w/o 2ch")
            side_idx = 0 if ch_asgn == 9 else 1  # side subframe position
            a = _flac_subframe(br, blocksize, fbits + (side_idx == 0))
            b = _flac_subframe(br, blocksize, fbits + (side_idx == 1))
            if ch_asgn == 8:                   # a=left, b=side: R = L - S
                sub = [a, [x - s for x, s in zip(a, b)]]
            elif ch_asgn == 9:                 # a=side, b=right: L = R + S
                sub = [[x + s for x, s in zip(b, a)], b]
            else:                              # mid/side
                sub = [[], []]
                for m, s in zip(a, b):
                    m2 = (m << 1) | (s & 1)
                    sub[0].append((m2 + s) >> 1)
                    sub[1].append((m2 - s) >> 1)
        else:
            raise NotImplementedError("flac: reserved channel assignment")
        for c in range(channels):
            chans[c] += sub[c]
        br.align()
        br.read(16)                            # frame CRC-16
    n_frames = len(chans[0])
    if total and n_frames > total:             # last block may overrun
        chans = [c[:total] for c in chans]
        n_frames = total
    samples = (np.array(chans, dtype=np.float64).T.reshape(-1)
               / float(1 << (bits - 1)))
    return {
        "format": "flac",
        "channels": channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 / rate),
        "rms": round(float(np.sqrt((samples ** 2).mean())), 6)
        if len(samples) else None,
        "peak": round(float(np.abs(samples).max()), 6)
        if len(samples) else None,
        "samples": samples,
    }


def _normalized_audio_result(fmt: str, samples, channels: int,
                             rate: int) -> dict:
    """The decode_audio contract from normalized interleaved float64
    samples — shared by the optional-codec backends so every decoder
    emits identical fields (the spectral stage runs unchanged)."""
    import numpy as np

    samples = np.asarray(samples, dtype=np.float64)
    n_frames = len(samples) // max(channels, 1)
    return {
        "format": fmt,
        "channels": channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 / rate) if rate else None,
        "rms": round(float(np.sqrt((samples ** 2).mean())), 6)
        if len(samples) else None,
        "peak": round(float(np.abs(samples).max()), 6)
        if len(samples) else None,
        "samples": samples,
    }


def mp3_decoder_available() -> bool:
    """True when any optional MP3 sample-decode backend imports."""
    for mod in ("soundfile", "miniaudio", "pydub"):
        try:
            __import__(mod)
            return True
        except ImportError:
            continue
    return False


def _decode_mp3_samples(payload: bytes) -> dict:
    """MP3 sample decode behind the OPTIONAL-dependency seam (the
    Pillow pattern in ``decode_image``): an entropy-coded psychoacoustic
    codec is a codec-library job, not a from-spec reimplementation, so
    this tries the public backends in order — soundfile (libsndfile >=
    1.2), miniaudio, pydub (ffmpeg) — normalizes each to the exact
    ``decode_audio`` contract, and raises NotImplementedError into the
    documented null fallback when none is installed (this container
    ships none; a codec-fleet executor image ships one). Header
    metadata still parses library-free in ``audio_header_features``."""
    import io

    try:
        import soundfile as sf

        arr, rate = sf.read(io.BytesIO(payload), dtype="float64",
                            always_2d=True)
        # (frames, channels) C-order ravel == interleaved
        return _normalized_audio_result("mp3", arr.ravel(),
                                        arr.shape[1], int(rate))
    except ImportError:
        pass
    except Exception as exc:      # backend present but payload bad
        raise NotImplementedError(f"mp3: soundfile failed: {exc}") from exc
    try:
        import miniaudio
        import numpy as np

        d = miniaudio.decode(payload)
        samples = np.asarray(d.samples, dtype=np.float64) / 32768.0
        return _normalized_audio_result("mp3", samples, d.nchannels,
                                        d.sample_rate)
    except ImportError:
        pass
    except Exception as exc:
        raise NotImplementedError(f"mp3: miniaudio failed: {exc}") from exc
    try:
        import numpy as np
        from pydub import AudioSegment

        seg = AudioSegment.from_file(io.BytesIO(payload), format="mp3")
        scale = float(1 << (8 * seg.sample_width - 1))
        samples = np.asarray(seg.get_array_of_samples(),
                             dtype=np.float64) / scale
        return _normalized_audio_result("mp3", samples, seg.channels,
                                        seg.frame_rate)
    except ImportError:
        pass
    except Exception as exc:
        raise NotImplementedError(f"mp3: pydub failed: {exc}") from exc
    raise NotImplementedError(
        "mp3: no sample decoder available (install soundfile, miniaudio "
        "or pydub on the executor image); headers still parse via "
        "audio_header_features")


def decode_audio(payload: bytes) -> dict:
    """REAL audio sample decode: uncompressed RIFF/WAVE (walks the
    chunk list to ``fmt `` + ``data``, reconstructs the sample stream
    with numpy — PCM 8/16/32-bit and IEEE-float 32/64) and lossless
    FLAC (full bitstream decode, ``decode_flac``). MP3 routes through
    the optional-codec seam (``_decode_mp3_samples``) where a backend
    is installed. Returns channels/rate/duration plus ``rms`` and
    ``peak`` over normalized [-1, 1] samples — values that only exist
    if the samples were actually decoded, the audio analogue of
    ``mean_pixel``. Remaining lossy codecs (AAC/alaw/...) raise
    NotImplementedError → the null fallback."""
    import struct

    import numpy as np

    if payload[:4] == b"fLaC":
        return decode_flac(payload)
    if payload[:3] == b"ID3" or (len(payload) >= 2 and payload[0] == 0xFF
                                 and (payload[1] & 0xE0) == 0xE0):
        return _decode_mp3_samples(payload)
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a wav or flac")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        size, = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise NotImplementedError("wav: missing fmt/data chunk")
    tag, channels, rate, _byterate, _block, bits = fmt
    dtypes = {(1, 8): np.uint8, (1, 16): np.int16, (1, 32): np.int32,
              (3, 32): np.float32, (3, 64): np.float64}
    dt = dtypes.get((tag, bits))
    if dt is None:
        raise NotImplementedError(f"wav: format tag {tag} bits {bits}")
    samples = np.frombuffer(
        data[:len(data) - len(data) % np.dtype(dt).itemsize], dtype=dt
    ).astype(np.float64)
    if tag == 1 and bits == 8:
        samples = (samples - 128) / 128.0       # unsigned 8-bit
    elif tag == 1:
        samples = samples / float(1 << (bits - 1))
    n_frames = len(samples) // max(channels, 1)
    return {
        "format": "wav",
        "channels": channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 / rate) if rate else None,
        "rms": round(float(np.sqrt((samples ** 2).mean())), 6)
        if len(samples) else None,
        "peak": round(float(np.abs(samples).max()), 6)
        if len(samples) else None,
        # normalized interleaved float64 samples — the buffer the
        # spectral stage analyzes (stats consumers ignore the key)
        "samples": samples,
    }


DECODED_AUDIO_SCHEMA = StructType([
    StructField("media_id", StringType(), True),
    StructField("payload_bytes", IntegerType(), True),
    StructField("format", StringType(), True),
    StructField("channels", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("n_frames", LongType(), True),
    StructField("duration_ms", LongType(), True),
    StructField("rms", DoubleType(), True),
    StructField("peak", DoubleType(), True),
])


def decoded_audio_features(df: DataFrame, id_col: str, payload_col: str,
                           decoder: Callable[[bytes], dict] | None = None,
                           ) -> DataFrame:
    """Audio twin of ``decoded_media_features``: the REAL sample-decode
    path (``decode_audio``) behind the same Arrow-batched mapInPandas
    seam. Unsupported codecs degrade to null features; rows are never
    dropped."""
    dec = decoder or decode_audio

    def safe(p: bytes) -> dict:
        import struct
        try:
            return dec(p)
        except (NotImplementedError, ValueError, OSError,
                IndexError, struct.error):
            return {}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf[payload_col].map(
                lambda p: bytes(p) if p is not None else b"")
            feats = payloads.map(safe)
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "payload_bytes": payloads.str.len(),
                **{f: feats.map(lambda d, f=f: d.get(f))
                   for f in ("format", "channels", "sample_rate",
                             "n_frames", "duration_ms", "rms", "peak")},
            })

    return df.select(id_col, payload_col).mapInPandas(
        run, DECODED_AUDIO_SCHEMA)


SPECTRAL_SCHEMA = StructType([
    StructField("media_id", StringType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("band_energy", ArrayType(DoubleType()), True),
    StructField("centroid_hz", DoubleType(), True),
    StructField("flatness", DoubleType(), True),
])


def spectral_features(payload: bytes, bands: int = 8,
                      frame: int = 1024) -> dict:
    """Frequency-domain audio features from the REAL sample decode:
    mono mix → Hann-windowed non-overlapping ``frame``-sample rFFT →
    mean power spectrum → ``bands`` equal linear bands to Nyquist
    (fraction of total energy each), spectral centroid in Hz, and
    spectral flatness (geomean/mean of power — ~1 noise, ~0 tone). The
    content-level audio fingerprint a curation pipeline filters on
    (tone/noise/speech-band balance); numpy-vectorized per payload,
    deterministic."""
    import numpy as np

    d = decode_audio(payload)
    s, rate, ch = d["samples"], d["sample_rate"], max(d["channels"], 1)
    mono = s[: len(s) - len(s) % ch].reshape(-1, ch).mean(axis=1)
    n = (len(mono) // frame) * frame
    if n == 0 or rate <= 0:
        raise NotImplementedError("audio shorter than one analysis frame")
    frames = mono[:n].reshape(-1, frame) * np.hanning(frame)
    power = (np.abs(np.fft.rfft(frames, axis=1)) ** 2).mean(axis=0)
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
    total = float(power.sum())
    edges = np.linspace(0, rate / 2, bands + 1)
    # half-open [lo, hi) bands, except the LAST band is closed at
    # Nyquist: rfftfreq's top bin sits exactly at rate/2, and excluding
    # it would make band fractions sum below 1 while the bin still
    # counts in `total`
    band = [round(float(power[(freqs >= lo)
                              & ((freqs < hi) if i < bands - 1
                                 else (freqs <= hi))].sum())
                  / total, 6) if total else 0.0
            for i, (lo, hi) in enumerate(zip(edges, edges[1:]))]
    centroid = round(float((freqs * power).sum() / total), 2) \
        if total else None
    pos = power[power > 0]
    flat = round(float(np.exp(np.log(pos).mean()) / pos.mean()), 6) \
        if len(pos) else None
    return {"sample_rate": rate, "band_energy": band,
            "centroid_hz": centroid, "flatness": flat}


def audio_spectral_features(df: DataFrame, id_col: str, payload_col: str,
                            bands: int = 8, frame: int = 1024) -> DataFrame:
    """``spectral_features`` behind the Arrow mapInPandas seam — same
    degrade-to-null contract as the other decode stages."""
    def safe(p: bytes) -> dict:
        import struct
        try:
            return spectral_features(p, bands=bands, frame=frame)
        except (NotImplementedError, ValueError, OSError,
                IndexError, struct.error):
            return {}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf[payload_col].map(
                lambda p: bytes(p) if p is not None else b"")
            feats = payloads.map(safe)
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                **{f: feats.map(lambda d, f=f: d.get(f))
                   for f in ("sample_rate", "band_energy", "centroid_hz",
                             "flatness")},
            })

    return df.select(id_col, payload_col).mapInPandas(run, SPECTRAL_SCHEMA)


def decoded_media_features(df: DataFrame, id_col: str, payload_col: str,
                           decoder: Callable[[bytes], dict] | None = None,
                           ) -> DataFrame:
    """Full-decode feature extraction: like ``extract_media_features`` but
    through the REAL ``decode_image`` path, emitting channel count and
    mean pixel value (values that only exist if the pixels were
    reconstructed). Unsupported formats degrade to null features, rows
    are never dropped — route nulls to quarantine or a codec fleet."""
    dec = decoder or decode_image

    def safe(p: bytes) -> dict:
        # Catches every corrupt-payload failure mode of the stdlib path:
        # zlib.error (garbage/absent IDAT), IndexError/struct.error
        # (truncated pixel data mid-unfilter), alongside the decoder's
        # own declared errors — one bad file must degrade to nulls, not
        # kill the task ("rows are never dropped").
        import struct
        import zlib
        try:
            return dec(p)
        except (NotImplementedError, ValueError, OSError,
                zlib.error, IndexError, struct.error):
            return {"width": None, "height": None, "format": None,
                    "channels": None, "mean_pixel": None}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf[payload_col].map(
                lambda p: bytes(p) if p is not None else b"")
            feats = payloads.map(safe)
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "payload_bytes": payloads.str.len(),
                "width": feats.map(lambda d: d.get("width")),
                "height": feats.map(lambda d: d.get("height")),
                "format": feats.map(lambda d: d.get("format")),
                "channels": feats.map(lambda d: d.get("channels")),
                "mean_pixel": feats.map(lambda d: d.get("mean_pixel")),
            })

    return df.select(id_col, payload_col).mapInPandas(
        run, DECODED_FEATURES_SCHEMA)


#: Output schema of the resize stage: payload out, new dims recorded.
RESIZED_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def resize_pixels(p: bytes, w: int, h: int) -> bytes:
    """REAL resize for decodable payloads (PNG/BMP/JPEG via the
    package's own decoders): nearest-neighbor resample of the decoded
    pixel buffer, returned as PACKED RAW bytes (h×w×ch, top-down,
    RGB-family order — ``len(out) == w*h*ch`` recovers the channel
    count). Raw-out avoids any encoder dependency; plug a codec into
    ``resize_media``'s ``resizer`` hook to re-encode. Raises
    NotImplementedError for undecodable payloads (callers fall back)."""
    import numpy as np

    d = decode_image(p)
    if "pixels" not in d:
        raise NotImplementedError("decoder returned no pixel buffer")
    sh, sw, ch = d["height"], d["width"], d["channels"]
    arr = np.frombuffer(d["pixels"], dtype="uint8").reshape(sh, sw, ch)
    ys = (np.arange(h) * sh) // h
    xs = (np.arange(w) * sw) // w
    return arr[ys][:, xs].tobytes()


def resize_media(df: DataFrame, id_col: str, payload_col: str,
                 width: int, height: int,
                 resizer: Callable[[bytes, int, int], bytes] | None = None,
                 ) -> DataFrame:
    """1→1 mapInPandas resize stage. The default resizer REALLY
    resamples any payload the package can decode (PNG/BMP/baseline
    JPEG → nearest-neighbor raw RGB out, ``resize_pixels``); payloads
    in no decodable format keep the deterministic byte-slice stand-in
    so the stage stays total. ``resizer`` plugs in a codec (e.g. PIL
    thumbnail + re-encode) when re-encoded output is required."""
    def _default(p: bytes, w: int, h: int) -> bytes:
        try:
            return resize_pixels(p, w, h)
        except Exception:
            return p[: max(1, (len(p) * w * h) // (w * h + len(p)))]

    rz = resizer or _default

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


def _jpeg_end(p: bytes, start: int) -> int | None:
    """End offset (exclusive) of the JPEG starting at ``start`` — a
    marker/entropy WALK, no decode: length-prefixed segments up to SOS,
    then the entropy stream scanned for a real marker (FF00 stuffing and
    FFD0–D7 restarts skipped) until EOI. Returns None on malformed or
    truncated data (hostile-payload rule: never raise, never scan past
    the buffer)."""
    n = len(p)
    if start + 2 > n or p[start] != 0xFF or p[start + 1] != 0xD8:
        return None
    i = start + 2
    while i + 4 <= n:
        if p[i] != 0xFF:
            return None
        m = p[i + 1]
        if m == 0xD9:                       # EOI before any scan
            return i + 2
        if 0xD0 <= m <= 0xD7 or m in (0x01, 0xFF):
            i += 2
            continue
        seg = (p[i + 2] << 8) | p[i + 3]
        if seg < 2 or i + 2 + seg > n:
            return None
        i += 2 + seg
        if m == 0xDA:                       # entropy-coded scan
            while i + 1 < n:
                if p[i] != 0xFF:
                    i += 1
                    continue
                mm = p[i + 1]
                if mm == 0x00 or 0xD0 <= mm <= 0xD7:
                    i += 2                  # stuffed byte / restart
                elif mm == 0xD9:
                    return i + 2
                elif mm == 0xFF:
                    i += 1                  # fill byte
                else:
                    break                   # next segment (multi-scan)
            if i + 1 >= n:
                return None
    return None


def mjpeg_frame_spans(p: bytes) -> list:
    """(start, end) spans of each JPEG in a bare concatenated-MJPEG
    stream. Stops at the first byte run that is not a valid JPEG, so a
    corrupt tail yields the good prefix instead of garbage frames."""
    spans, i = [], 0
    while i + 2 <= len(p) and p[i] == 0xFF and p[i + 1] == 0xD8:
        end = _jpeg_end(p, i)
        if end is None:
            break
        spans.append((i, end))
        i = end
    return spans


def avi_movi_frames(p: bytes) -> list:
    """Video-frame payloads from a RIFF/AVI container: walk the chunk
    tree to the 'movi' LIST and collect '..dc'/'..db' chunk bodies (the
    compressed-frame chunks — JPEG data under the MJPG codec), honoring
    word alignment and one level of 'rec ' interleave nesting. Pure
    offset arithmetic from the RIFF spec; malformed sizes end the walk
    early rather than raising (same guard discipline as the header
    parsers in video_media_features)."""
    out: list = []
    if len(p) < 12 or p[0:4] != b"RIFF" or p[8:12] != b"AVI ":
        return out

    def chunks(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            four = p[i:i + 4]
            size = int.from_bytes(p[i + 4:i + 8], "little")
            body = i + 8
            if body + size > hi:
                return
            yield four, body, size
            i = body + size + (size & 1)    # chunks are word-aligned

    def collect(lo: int, hi: int, depth: int) -> None:
        for four, body, size in chunks(lo, hi):
            if four == b"LIST" and size >= 4 and depth > 0 \
                    and p[body:body + 4] == b"rec ":
                collect(body + 4, body + size, depth - 1)
            elif four[2:4] in (b"dc", b"db") and size > 0:
                out.append(p[body:body + size])

    for four, body, size in chunks(12, len(p)):
        if four == b"LIST" and size >= 4 and p[body:body + 4] == b"movi":
            collect(body + 4, body + size, depth=1)
            break
    return out


def _bmff_boxes(p: bytes, lo: int, hi: int):
    """(type4, body_start, box_end) for each ISO-BMFF box in [lo, hi):
    32-bit big-endian sizes, size==1 → 64-bit largesize follows the
    type, size==0 → box runs to the end of the enclosing scope. A
    malformed size ends the walk instead of raising (hostile-payload
    rule, same as the RIFF walker)."""
    i = lo
    while i + 8 <= hi:
        size = int.from_bytes(p[i:i + 4], "big")
        four = p[i + 4:i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > hi:
                return
            size = int.from_bytes(p[i + 8:i + 16], "big")
            if size < 16:
                return
            body = i + 16
            end = i + size
        elif size == 0:
            end = hi
        else:
            if size < 8:
                return
            end = i + size
        if end > hi or end <= i:
            return
        yield four, body, end
        i = end


def _bmff_find(p: bytes, lo: int, hi: int, type4: bytes):
    for four, body, end in _bmff_boxes(p, lo, hi):
        if four == type4:
            return body, end
    return None


def mp4_sample_spans(p: bytes) -> list:
    """(offset, size) file spans of every video-track sample in an
    ISO-BMFF (MP4/MOV) payload, derived from the sample tables the spec
    mandates: ``stsz`` (per-sample sizes), ``stsc`` (sample→chunk runs)
    and ``stco``/``co64`` (chunk file offsets) under each 'vide'-handler
    trak's ``stbl`` — samples lie back-to-back inside a chunk, so a
    cumulative walk yields exact spans with zero decoding. Codec-
    agnostic: callers decide what the bytes are
    (``extract_video_frames`` keeps JPEG samples — the MJPEG-in-MP4
    layout — which the shipped JPEG decoder reconstructs). Table counts
    are clamped to what the box/payload can physically hold, so a
    hostile header can neither over-allocate nor index past the buffer.
    Box layout per ISO/IEC 14496-12 (public spec); the reference repo
    has no media layer at all."""
    out: list = []
    if len(p) < 12 or p[4:8] != b"ftyp":
        return out
    moov = _bmff_find(p, 0, len(p), b"moov")
    if moov is None:
        return out

    def u32(at: int) -> int:
        return int.from_bytes(p[at:at + 4], "big")

    for four, t_lo, t_hi in _bmff_boxes(p, moov[0], moov[1]):
        if four != b"trak":
            continue
        mdia = _bmff_find(p, t_lo, t_hi, b"mdia")
        if mdia is None:
            continue
        hdlr = _bmff_find(p, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or hdlr[1] - hdlr[0] < 12 \
                or p[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        minf = _bmff_find(p, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = _bmff_find(p, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        stsz = _bmff_find(p, stbl[0], stbl[1], b"stsz")
        stsc = _bmff_find(p, stbl[0], stbl[1], b"stsc")
        stco = _bmff_find(p, stbl[0], stbl[1], b"stco")
        co64 = _bmff_find(p, stbl[0], stbl[1], b"co64")
        if stsz is None or stsc is None or (stco is None and co64 is None):
            continue
        # stsz: version/flags, fixed_size, count[, size table]
        b0 = stsz[0]
        if stsz[1] - b0 < 12:
            continue
        fixed, count = u32(b0 + 4), u32(b0 + 8)
        count = min(count, len(p))          # a sample is ≥ 1 byte
        if fixed == 0:
            count = min(count, (stsz[1] - b0 - 12) // 4)
            sizes = [u32(b0 + 12 + 4 * i) for i in range(count)]
        else:
            sizes = [fixed] * count
        # chunk offsets
        if stco is not None:
            c0 = stco[0]
            nch = min(u32(c0 + 4), (stco[1] - c0 - 8) // 4) \
                if stco[1] - c0 >= 8 else 0
            offs = [u32(c0 + 8 + 4 * i) for i in range(nch)]
        else:
            c0 = co64[0]
            nch = min(u32(c0 + 4), (co64[1] - c0 - 8) // 8) \
                if co64[1] - c0 >= 8 else 0
            offs = [int.from_bytes(p[c0 + 8 + 8 * i:c0 + 16 + 8 * i],
                                   "big") for i in range(nch)]
        # stsc runs: (first_chunk, samples_per_chunk, sdesc-index)
        s0 = stsc[0]
        nrun = min(u32(s0 + 4), (stsc[1] - s0 - 8) // 12) \
            if stsc[1] - s0 >= 8 else 0
        runs = [(u32(s0 + 8 + 12 * i), u32(s0 + 12 + 12 * i))
                for i in range(nrun)]
        si = 0
        for ci, off in enumerate(offs):
            spc = 0
            for fc, n_ in runs:
                if fc <= ci + 1:
                    spc = n_
                else:
                    break
            for _ in range(min(spc, len(sizes) - si)):
                sz = sizes[si]
                si += 1
                if sz > 0 and off + sz <= len(p):
                    out.append((off, sz))
                off += sz
    return out


def mp4_sample_times(p: bytes) -> list:
    """Per-sample decode timestamps in MILLISECONDS for the first
    'vide' track of an ISO-BMFF payload — ``stts`` run-length decode
    deltas scaled by ``mdhd``'s timescale (v0 and v1 layouts), aligned
    with ``mp4_sample_spans`` order. A video-training pipeline samples
    frames BY TIME (every N seconds), not by index; this is the timing
    side of the stbl walk. Hostile counts clamp to what the box holds;
    missing boxes yield []."""
    out: list = []
    if len(p) < 12 or p[4:8] != b"ftyp":
        return out
    moov = _bmff_find(p, 0, len(p), b"moov")
    if moov is None:
        return out

    def u32(at: int) -> int:
        return int.from_bytes(p[at:at + 4], "big")

    for four, t_lo, t_hi in _bmff_boxes(p, moov[0], moov[1]):
        if four != b"trak":
            continue
        mdia = _bmff_find(p, t_lo, t_hi, b"mdia")
        if mdia is None:
            continue
        hdlr = _bmff_find(p, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or hdlr[1] - hdlr[0] < 12 \
                or p[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _bmff_find(p, mdia[0], mdia[1], b"mdhd")
        if mdhd is None or mdhd[1] - mdhd[0] < 16:
            continue
        ver = p[mdhd[0]]
        ts_off = mdhd[0] + (20 if ver == 1 else 12)
        if ts_off + 4 > mdhd[1]:
            continue
        timescale = u32(ts_off)
        if timescale <= 0:
            continue
        minf = _bmff_find(p, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = _bmff_find(p, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        stts = _bmff_find(p, stbl[0], stbl[1], b"stts")
        if stts is None or stts[1] - stts[0] < 8:
            continue
        s0 = stts[0]
        nrun = min(u32(s0 + 4), (stts[1] - s0 - 8) // 8)
        t = 0
        for i in range(nrun):
            cnt = min(u32(s0 + 8 + 8 * i), len(p))
            delta = u32(s0 + 12 + 8 * i)
            for _ in range(cnt):
                out.append((t * 1000) // timescale)
                t += delta
    return out


def _bmp_encode(rgb: bytes, w: int, h: int) -> bytes:
    """Pack top-down RGB pixels as a minimal uncompressed BMP — the
    cheapest SELF-CONTAINED frame container (every emitted frame stays
    decodable by ``decode_image``, matching the MJPEG convention where
    frames are whole JPEGs). Negative height = top-down, rows BGR,
    4-byte padded."""
    import struct

    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h):
        row = bytearray()
        for x in range(w):
            off = 3 * (y * w + x)
            row += rgb[off:off + 3][::-1]
        body += row.ljust(stride, b"\x00")
    return (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack("<iiiHHIIiiII", 40, w, -h, 1, 24, 0,
                          len(body), 2835, 2835, 0, 0)
            + bytes(body))


def extract_video_frames(p: bytes, n: int) -> list:
    """Up to ``n`` evenly-spaced REAL frames from an animation payload:
    RIFF/AVI containers via the movi-chunk walk, ISO-BMFF (MP4/MOV)
    via the stbl sample-table walk (JPEG samples — MJPEG-in-MP4), and
    bare concatenated-JPEG streams via the marker walk (frames = whole
    JPEGs), plus animated GIFs via the LZW decode (frames re-wrapped as
    minimal BMPs so they stay self-contained) — every emitted frame is
    decodable by the package's own decoders, no codec dependency.
    Returns [] for payloads in none of these formats, including MP4s
    whose samples are a predictive codec this container has no decoder
    for (callers distinguish "no frames" from the byte-slicing stub
    explicitly)."""
    if len(p) >= 12 and p[0:4] == b"RIFF" and p[8:12] == b"AVI ":
        frames = avi_movi_frames(p)
    elif len(p) >= 12 and p[4:8] == b"ftyp":
        # ISO-BMFF: keep the JPEG samples (MJPEG-in-MP4); a predictive
        # codec (avc1 etc.) yields no JPEG starts → [] → callers fall
        # back explicitly, same contract as before
        frames = [p[o:o + s] for o, s in mp4_sample_spans(p)
                  if s >= 2 and p[o] == 0xFF and p[o + 1] == 0xD8]
    elif len(p) >= 2 and p[0] == 0xFF and p[1] == 0xD8:
        frames = [p[s:e] for s, e in mjpeg_frame_spans(p)]
    elif len(p) >= 6 and p[0:4] == b"GIF8":
        try:
            frames = [_bmp_encode(f["pixels"], f["width"], f["height"])
                      for f in gif_frames(p)]
        except NotImplementedError:
            return []
    else:
        return []
    if len(frames) <= n:
        return frames
    # deterministic even spacing over the full duration, first frame kept
    return [frames[(j * len(frames)) // n] for j in range(n)]


def sample_frames(df: DataFrame, id_col: str, payload_col: str,
                  num_frames: int = 4,
                  sampler: Callable[[bytes, int], list[bytes]] | None = None,
                  ) -> DataFrame:
    """1→N mapInPandas frame sampling: each video payload row expands to
    up to ``num_frames`` frame rows. The Arrow batch out is larger than
    the batch in — mapInPandas (unlike a scalar pandas_udf) supports
    this shape, which is why the whole multimodal family uses it.

    The default sampler extracts REAL frames from MJPEG-family payloads
    (RIFF/AVI 'movi' chunks, ISO-BMFF stbl sample tables, bare
    concatenated-JPEG streams) via ``extract_video_frames`` — each
    emitted frame is a complete JPEG the package's own decoder handles.
    Other payloads fall back to deterministic even byte slices (the
    documented stand-in for predictive codecs — H.264 etc. — this
    container has no decoder for); pass ``sampler`` to plug a real
    codec."""
    def _default(p: bytes, n: int) -> list[bytes]:
        if not p:
            return []
        real = extract_video_frames(p, n)
        if real:
            return real
        step = max(1, len(p) // n)
        return [p[i * step:(i + 1) * step] for i in range(min(n, len(p)))]

    sm = sampler or _default

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
    bytes must degrade to a saturated value, never an ANSI overflow
    crash. NULL-preserving: ``least`` skips nulls, so without the guard
    a truncated read (null) would 'clamp' to INT_MAX instead of staying
    the documented null."""
    return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(
        F.least(col, F.lit((1 << 31) - 1).cast("long")).cast("int"))


def _le_int32_abs(bin_col, pos: int):
    """|signed little-endian int32| — BMP height is negative for top-down
    rows; the dimension filter wants magnitude either way."""
    raw = _le_uint(bin_col, pos, 4)
    return F.when(raw >= F.lit(1 << 31).cast("long"),
                  F.lit(1 << 32).cast("long") - raw).otherwise(raw)


#: JPEG marker-segment hops to walk before giving up on finding SOF.
#: Real files put APP0/APP1(EXIF/XMP)/APP2(ICC)/DQT/DHT/COM before the
#: frame header — and ICC profiles over 64KB legally SPAN MANY APP2
#: segments (wide-gamut photos routinely carry 8+), so the bound is
#: generous: the walk is one runtime aggregate() loop, extra hops cost
#: iterations, not expression-tree size.
_JPEG_HOPS = 32

#: SOF0-SOF15 marker type bytes minus DHT(C4)/JPG(C8)/DAC(CC) — baseline,
#: progressive, lossless, arithmetic variants all share the
#: precision(1)+height(2)+width(2) layout after the segment length.
_JPEG_SOF_TYPES = [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]


def _jpeg_dims(b) -> F.Column:
    """``struct(w, h)`` from a JPEG payload by walking the marker-segment
    list to SOFn (ref: the JFIF/ISO 10918-1 segment grammar — FF <type>
    <BE16 len incl. itself> <payload>; SOF carries precision(1B),
    height(BE16), width(BE16) after the length). The walk is ONE
    ``aggregate`` higher-order expression over ``_JPEG_HOPS`` iterations —
    evaluated as a runtime loop, so unlike inlining compounding offsets
    it adds a constant-size expression tree (the audio RIFF walk's
    codegen-blowup lesson). Hostile/truncated payloads: substring past
    the end yields '' → conv → null, which propagates to null dims."""

    def dyn(pos, n):
        # big-endian uint at a DYNAMIC 1-indexed position (long math)
        p = F.least(pos, F.lit((1 << 31) - 1).cast("long")).cast("int")
        return F.conv(F.hex(F.substring(b, p, n)), 16, 10).cast("long")

    def step(acc, _):
        off = acc.getField("off")
        found = acc.getField("h").isNotNull()
        is_marker = dyn(off, 1) == 255
        mtype = dyn(off + 1, 1)
        is_sof = is_marker & mtype.isin(_JPEG_SOF_TYPES)
        seg_len = dyn(off + 2, 2)
        return (
            F.when(found, acc)
            .when(is_sof, F.struct(
                off.alias("off"),
                _clamp_int(dyn(off + 7, 2)).alias("w"),
                _clamp_int(dyn(off + 5, 2)).alias("h")))
            .otherwise(F.struct(
                (off + 2 + seg_len).alias("off"),
                F.lit(None).cast("int").alias("w"),
                F.lit(None).cast("int").alias("h")))
        )

    init = F.struct(F.lit(3).cast("long").alias("off"),  # first marker after SOI
                    F.lit(None).cast("int").alias("w"),
                    F.lit(None).cast("int").alias("h"))
    state = F.aggregate(F.sequence(F.lit(1), F.lit(_JPEG_HOPS)), init, step)
    return F.struct(state.getField("w").alias("w"),
                    state.getField("h").alias("h"))


_TIFF_ENTRIES = 32


def _tiff_dims(b, little: bool) -> F.Column:
    """``struct(w, h)`` from a TIFF header: read the first IFD's entry
    table and pick tags 256/257 (ImageWidth/ImageLength), honoring the
    file's endianness and the SHORT-vs-LONG value encoding (values are
    left-justified in the 4-byte field in both byte orders). The entry
    scan is ONE ``aggregate`` over ``_TIFF_ENTRIES`` iterations — a
    runtime loop, constant-size expression tree, same construction as
    ``_jpeg_dims``. Out-of-range reads yield null bytes → null dims."""

    def byte_at(pos0):
        # single byte at a DYNAMIC 0-based offset (1-indexed substring)
        p = F.least(pos0 + 1, F.lit((1 << 31) - 1).cast("long")).cast("int")
        return F.conv(F.hex(F.substring(b, p, 1)), 16, 10).cast("long")

    def u(pos0, n):
        out = F.lit(0).cast("long")
        for i in range(n):
            if little:
                out = out + byte_at(pos0 + i) \
                    * F.lit(1 << (8 * i)).cast("long")
            else:
                out = out * 256 + byte_at(pos0 + i)
        return out

    ifd = u(F.lit(4).cast("long"), 4)
    cnt = u(ifd, 2)

    def step(acc, i):
        base = ifd + 2 + 12 * i
        tag = u(base, 2)
        typ = u(base + 2, 2)
        val = F.when(typ == 3, u(base + 8, 2)) \
            .when(typ == 4, u(base + 8, 4))
        valid = i < cnt
        w = acc.getField("w")
        h = acc.getField("h")
        return F.struct(
            F.when(valid & (tag == 256) & w.isNull(), val)
            .otherwise(w).alias("w"),
            F.when(valid & (tag == 257) & h.isNull(), val)
            .otherwise(h).alias("h"))

    init = F.struct(F.lit(None).cast("long").alias("w"),
                    F.lit(None).cast("long").alias("h"))
    st = F.aggregate(F.sequence(F.lit(0).cast("long"),
                                F.lit(_TIFF_ENTRIES - 1).cast("long")),
                     init, step)
    return F.struct(st.getField("w").alias("w"), st.getField("h").alias("h"))


def image_dimensions(payload_col) -> F.Column:
    """``struct(format, width, height)`` parsed from the payload's header
    bytes — PNG (IHDR, big-endian at offset 16), GIF (LE uint16 at 6),
    BMP (LE int32 at 18), JPEG (SOF marker walk, ``_jpeg_dims``). Pure
    Column expressions over ``substring``/``hex``/``conv``: runs inside
    whole-stage codegen with NO Python workers and no image libraries —
    the header path most curation pipelines need (dimension/aspect
    filters) without ever decoding. Unknown or truncated payloads →
    null fields."""
    b = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    is_png = F.hex(F.substring(b, 1, 8)) == "89504E470D0A1A0A"
    is_gif = F.hex(F.substring(b, 1, 4)) == "47494638"        # "GIF8"
    is_bmp = F.hex(F.substring(b, 1, 2)) == "424D"            # "BM"
    is_jpg = F.hex(F.substring(b, 1, 2)) == "FFD8"            # SOI
    is_webp = (F.hex(F.substring(b, 1, 4)) == b"RIFF".hex().upper()) \
        & (F.hex(F.substring(b, 9, 4)) == b"WEBP".hex().upper())
    jpg = _jpeg_dims(b)
    # WebP sub-formats, all fixed offsets: VP8 (lossy — 14-bit LE dims
    # after the 0x9D012A sync), VP8L (lossless — 2×14 bits packed
    # LSB-first after the 0x2F signature), VP8X (extended — 24-bit LE
    # canvas minus one)
    webp_tag = F.hex(F.substring(b, 13, 4))
    vp8l_bits = _le_uint(b, 22, 4)
    webp_w = (
        F.when(webp_tag == b"VP8 ".hex().upper(),
               _le_uint(b, 27, 2).bitwiseAND(F.lit(0x3FFF).cast("long")))
        .when(webp_tag == b"VP8L".hex().upper(),
              vp8l_bits.bitwiseAND(F.lit(0x3FFF).cast("long")) + 1)
        .when(webp_tag == b"VP8X".hex().upper(), _le_uint(b, 25, 3) + 1))
    webp_h = (
        F.when(webp_tag == b"VP8 ".hex().upper(),
               _le_uint(b, 29, 2).bitwiseAND(F.lit(0x3FFF).cast("long")))
        .when(webp_tag == b"VP8L".hex().upper(),
              F.shiftright(vp8l_bits, 14)
              .bitwiseAND(F.lit(0x3FFF).cast("long")) + 1)
        .when(webp_tag == b"VP8X".hex().upper(), _le_uint(b, 28, 3) + 1))
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
        .when(is_jpg & (long_enough >= 4), F.struct(
            F.lit("jpeg").alias("format"),
            jpg.getField("w").alias("width"),
            jpg.getField("h").alias("height")))
        .when(is_webp & (long_enough >= 30), F.struct(
            F.lit("webp").alias("format"),
            _clamp_int(webp_w).alias("width"),
            _clamp_int(webp_h).alias("height")))
        .when((F.hex(F.substring(b, 1, 4)) == "49492A00")
              & (long_enough >= 8), F.struct(
            F.lit("tiff").alias("format"),
            _clamp_int(_tiff_dims(b, True).getField("w")).alias("width"),
            _clamp_int(_tiff_dims(b, True).getField("h")).alias("height")))
        .when((F.hex(F.substring(b, 1, 4)) == "4D4D002A")
              & (long_enough >= 8), F.struct(
            F.lit("tiff").alias("format"),
            _clamp_int(_tiff_dims(b, False).getField("w")).alias("width"),
            _clamp_int(_tiff_dims(b, False).getField("h")).alias("height")))
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


def _le_from_hex(hx_col, byte_off: int, nbytes: int):
    """Little-endian unsigned int from a HEX-STRING column at a fixed
    0-indexed byte offset: reverse byte order in hex space, parse long.
    Truncated payloads shorten the hex string, so missing HIGH bytes
    drop out of the reversed concat — zero-extension, the same
    degradation as the fixed-offset parsers. Long math for the
    ANSI-overflow reason in ``_be_uint``."""
    le = F.concat(*[F.substring(hx_col, 2 * (byte_off + i) + 1, 2)
                    for i in reversed(range(nbytes))])
    return F.coalesce(F.conv(le, 16, 10).cast("long"), F.lit(0).cast("long"))


#: WAVE format tags worth naming; anything else reports its tag number.
_WAV_FORMATS = {1: "pcm", 3: "ieee_float", 6: "alaw", 7: "mulaw",
                0xFFFE: "extensible"}

#: RIFF chunk-list hops to inspect — real recorder output puts LIST/INFO
#: or ``fact`` chunks before ``data``, so fixed offsets aren't enough.
_RIFF_HOPS = 4


def audio_media_features(df: DataFrame, id_col: str,
                         payload_col: str) -> DataFrame:
    """Audio twin of ``header_media_features``: ``(media_id,
    payload_bytes, format, codec, channels, sample_rate,
    bits_per_sample, n_frames, duration_ms)`` parsed from WAV/RIFF,
    FLAC (STREAMINFO), MP3 (frame header, ID3v2-skipping, CBR duration
    estimate) and OGG (Vorbis/Opus identification header) payloads —
    entirely JVM-side Column expressions (substring/hex/conv), zero
    Python workers, so at 100 TB it is a projection fused into the
    scan, exactly like ``image_dimensions``.

    The RIFF chunk list is walked for ``_RIFF_HOPS`` hops to find
    ``fmt `` and ``data`` wherever they sit. Each hop's offset/size is
    MATERIALIZED as a named column in a staged projection chain rather
    than inlined into one Column expression: the offsets compound per
    hop (off' = off + 8 + size(off) + pad(size(off))), so inlining
    multiplies the expression tree ~3× per level and ~7 header fields ×
    4 hops of that blew up codegen to a JVM heap OOM. Catalyst keeps
    the stages separate (CollapseProject refuses to inline non-cheap
    aliases referenced more than once), so the physical plan is a short
    chain of small projections inside one whole-stage-codegen span.

    Unknown/truncated/hostile payloads degrade to nulls; the frame math
    is zero-guarded so ANSI mode can't crash on a hostile block_align."""
    fmt_id = b"fmt ".hex().upper()
    data_id = b"data".hex().upper()

    def _pos(col):
        # Hostile chunk sizes compound the hop offsets past int range, and
        # under ANSI mode (the Spark 4 default) a bare cast("int") would
        # CRASH the job on one corrupt file. Clamp first: a saturated
        # position points past any real payload, substring returns "",
        # and the row degrades to nulls as documented.
        return F.least(col, F.lit((1 << 31) - 1).cast("long")).cast("int")

    w = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("_p"),
    ).withColumn("_off0", F.lit(13).cast("long"))
    for i in range(_RIFF_HOPS):
        # One 8-byte substring per hop: chunk id (4B) + LE size (4B).
        w = (
            w.withColumn(f"_hdr{i}",
                         F.hex(F.substring(F.col("_p"),
                                           _pos(F.col(f"_off{i}")), 8)))
            .withColumn(f"_sz{i}", _le_from_hex(F.col(f"_hdr{i}"), 4, 4))
            .withColumn(f"_off{i + 1}",
                        F.col(f"_off{i}") + 8 + F.col(f"_sz{i}")
                        + F.pmod(F.col(f"_sz{i}"), 2))  # word-aligned
        )
    w = (
        w.withColumn("_fmt_off", F.coalesce(*[
            F.when(F.substring(F.col(f"_hdr{i}"), 1, 8) == fmt_id,
                   F.col(f"_off{i}")) for i in range(_RIFF_HOPS)]))
        .withColumn("_data_sz", F.coalesce(*[
            F.when(F.substring(F.col(f"_hdr{i}"), 1, 8) == data_id,
                   F.col(f"_sz{i}")) for i in range(_RIFF_HOPS)]))
        # The 16-byte fmt body, grabbed once; fields are fixed offsets in it.
        .withColumn("_fmt_hex",
                    F.hex(F.substring(F.col("_p"),
                                      _pos(F.col("_fmt_off") + 8), 16)))
    )
    tag = _le_from_hex(F.col("_fmt_hex"), 0, 2)
    channels = _le_from_hex(F.col("_fmt_hex"), 2, 2)
    sample_rate = _le_from_hex(F.col("_fmt_hex"), 4, 4)
    block_align = _le_from_hex(F.col("_fmt_hex"), 12, 2)
    bits = _le_from_hex(F.col("_fmt_hex"), 14, 2)
    w = (
        w.withColumn("_valid",
                     (F.hex(F.substring(F.col("_p"), 1, 4)) == b"RIFF".hex().upper())
                     & (F.hex(F.substring(F.col("_p"), 9, 4)) == b"WAVE".hex().upper())
                     & (F.octet_length(F.col("_p")) >= 44)
                     & F.col("_fmt_off").isNotNull())
        .withColumn("_codec", F.coalesce(
            *[F.when(tag == k, F.lit(v)) for k, v in _WAV_FORMATS.items()],
            F.concat(F.lit("tag_"), tag.cast("string"))))
        .withColumn("_rate", sample_rate)
        .withColumn("_n_frames",
                    F.when(block_align > 0,
                           F.col("_data_sz") / block_align)
                    .otherwise(F.lit(None)).cast("long"))
    )
    # ---- FLAC / MP3 / OGG headers, same JVM-only discipline ----------
    # One 40-byte hex grab covers every fixed-offset field below.
    w = w.withColumn("_h40", F.hex(F.substring(F.col("_p"), 1, 40)))
    h40 = F.col("_h40")

    # FLAC: "fLaC" + STREAMINFO (spec-mandated FIRST metadata block) —
    # the packed 8-byte field at file offset 18 is split into two
    # 32-bit halves so conv() never has to round-trip a full unsigned
    # 64-bit value through cast("long") (ANSI overflow on hostile data).
    fl_hi = _be_from_hex(h40, 18, 4)
    fl_lo = _be_from_hex(h40, 22, 4)
    flac_rate = F.shiftrightunsigned(fl_hi, 12)                  # 20 bits
    flac_ch = F.shiftrightunsigned(fl_hi, 9).bitwiseAND(F.lit(7)) + 1
    flac_bits = F.shiftrightunsigned(fl_hi, 4).bitwiseAND(F.lit(31)) + 1
    flac_total = fl_hi.bitwiseAND(F.lit(15)) * F.lit(1 << 32) + fl_lo
    w = w.withColumn(
        "_flac_ok",
        (F.substring(h40, 1, 8) == b"fLaC".hex().upper())
        & (F.octet_length(F.col("_p")) >= 26)
        # first block must be STREAMINFO (type bits 0, any last-flag)
        & (_be_from_hex(h40, 4, 1).bitwiseAND(F.lit(0x7F)) == 0)
        & (flac_rate > 0))

    # MP3: optional ID3v2 tag (syncsafe 28-bit size) then a Layer III
    # frame header; duration is the CBR estimate bytes*8/kbps.
    id3_sz = (_be_from_hex(h40, 6, 1).bitwiseAND(F.lit(0x7F)) * F.lit(1 << 21)
              + _be_from_hex(h40, 7, 1).bitwiseAND(F.lit(0x7F)) * F.lit(1 << 14)
              + _be_from_hex(h40, 8, 1).bitwiseAND(F.lit(0x7F)) * F.lit(1 << 7)
              + _be_from_hex(h40, 9, 1).bitwiseAND(F.lit(0x7F)))
    w = (w.withColumn("_mp3_off",
                      F.when(F.substring(h40, 1, 6) == b"ID3".hex().upper(),
                             id3_sz + 10).otherwise(F.lit(0).cast("long")))
          .withColumn("_mh", F.hex(F.substring(
              F.col("_p"), _pos(F.col("_mp3_off") + 1), 4))))
    mh = _be_from_hex(F.col("_mh"), 0, 4)
    mp3_ver = F.shiftrightunsigned(mh, 19).bitwiseAND(F.lit(3))
    mp3_layer = F.shiftrightunsigned(mh, 17).bitwiseAND(F.lit(3))
    mp3_bi = F.shiftrightunsigned(mh, 12).bitwiseAND(F.lit(15))
    mp3_sri = F.shiftrightunsigned(mh, 10).bitwiseAND(F.lit(3))
    mp3_mode = F.shiftrightunsigned(mh, 6).bitwiseAND(F.lit(3))
    _arr = lambda xs: F.array(*[F.lit(x) for x in xs])
    kbps_v1 = F.element_at(_arr([0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                                 160, 192, 224, 256, 320, 0]),
                           (mp3_bi + 1).cast("int"))
    kbps_v2 = F.element_at(_arr([0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                                 96, 112, 128, 144, 160, 0]),
                           (mp3_bi + 1).cast("int"))
    mp3_kbps = F.when(mp3_ver == 3, kbps_v1).otherwise(kbps_v2)
    base_sr = F.element_at(_arr([44100, 48000, 32000, 0]),
                           (mp3_sri + 1).cast("int"))
    mp3_rate = F.when(mp3_ver == 3, base_sr) \
        .when(mp3_ver == 2, base_sr / 2) \
        .when(mp3_ver == 0, base_sr / 4).cast("long")
    w = w.withColumn(
        "_mp3_ok",
        (F.shiftrightunsigned(mh, 21).bitwiseAND(F.lit(0x7FF)) == 0x7FF)
        & (mp3_layer == 1) & (mp3_ver != 1)          # Layer III, real ver
        & (mp3_sri <= 2) & mp3_bi.between(1, 14))
    mp3_ch = F.when(mp3_mode == 3, F.lit(1)).otherwise(F.lit(2))
    mp3_dur = ((F.octet_length(F.col("_p")) - F.col("_mp3_off"))
               * F.lit(8) / mp3_kbps).cast("long")

    # OGG: first page's body is the codec identification header —
    # Vorbis ("\\x01vorbis") or Opus ("OpusHead"); body starts after the
    # 27-byte page header + segment table (count at byte 26).
    w = (w.withColumn("_ogg_body",
                      F.lit(27).cast("long") + _be_from_hex(h40, 26, 1))
          .withColumn("_oh", F.hex(F.substring(
              F.col("_p"), _pos(F.col("_ogg_body") + 1), 16))))
    oh = F.col("_oh")
    is_vorbis = F.substring(oh, 1, 14) == (b"\x01vorbis").hex().upper()
    is_opus = F.substring(oh, 1, 16) == b"OpusHead".hex().upper()
    w = w.withColumn(
        "_ogg_ok",
        (F.substring(h40, 1, 8) == b"OggS".hex().upper())
        & (_be_from_hex(h40, 4, 1) == 0) & (is_vorbis | is_opus))
    ogg_ch = F.when(is_vorbis, _le_from_hex(oh, 11, 1)) \
        .otherwise(_le_from_hex(oh, 9, 1))
    ogg_rate = F.when(is_vorbis, _le_from_hex(oh, 12, 4)) \
        .otherwise(_le_from_hex(oh, 12, 4))

    def pick(wav_col, flac_col, ogg_col, mp3_col):
        return (F.when(F.col("_valid"), wav_col)
                .when(F.col("_flac_ok"), flac_col)
                .when(F.col("_ogg_ok"), ogg_col)
                .when(F.col("_mp3_ok"), mp3_col))

    null_l = F.lit(None).cast("long")
    return w.select(
        F.col("media_id"),
        F.octet_length(F.col("_p")).alias("payload_bytes"),
        pick(F.lit("wav"), F.lit("flac"), F.lit("ogg"),
             F.lit("mp3")).alias("format"),
        pick(F.col("_codec"), F.lit("flac"),
             F.when(is_vorbis, F.lit("vorbis")).otherwise(F.lit("opus")),
             F.lit("mp3")).alias("codec"),
        pick(_clamp_int(channels), _clamp_int(flac_ch), _clamp_int(ogg_ch),
             mp3_ch.cast("int")).alias("channels"),
        pick(_clamp_int(F.col("_rate")), _clamp_int(flac_rate),
             _clamp_int(ogg_rate), _clamp_int(mp3_rate))
        .alias("sample_rate"),
        pick(_clamp_int(bits), _clamp_int(flac_bits), F.lit(None),
             F.lit(None)).cast("int").alias("bits_per_sample"),
        pick(F.col("_n_frames"), flac_total, null_l,
             null_l).alias("n_frames"),
        pick(F.when(F.col("_rate") > 0,
                    F.col("_n_frames") * F.lit(1000) / F.col("_rate")),
             F.when(flac_rate > 0, flac_total * F.lit(1000) / flac_rate),
             F.lit(None),
             F.when(mp3_kbps > 0, mp3_dur))
        .cast("long").alias("duration_ms"),
    )


def _be_from_hex(hx_col, byte_off: int, nbytes: int):
    """Big-endian unsigned int from a HEX-STRING column at a fixed
    0-indexed byte offset. Truncated payloads shorten the hex string —
    conv of the partial prefix yields a smaller value (same degradation
    class as ``_le_from_hex``); the callers' validity gates require the
    anchoring boxes to have been FOUND, so truncation lands on nulls."""
    return F.coalesce(
        F.conv(F.substring(hx_col, 2 * byte_off + 1, 2 * nbytes), 16, 10)
        .cast("long"),
        F.lit(0).cast("long"))


#: MP4/QuickTime box-walk hop counts: top level (ftyp, free/skip, wide,
#: mdat-before-moov layouts) and inside moov (mvhd, iods, udta, traks).
_MP4_TOP_HOPS = 4
_MP4_MOOV_HOPS = 6


def video_media_features(df: DataFrame, id_col: str,
                         payload_col: str) -> DataFrame:
    """Video twin of ``audio_media_features`` for the MP4/QuickTime
    container: ``(media_id, payload_bytes, format, brand, timescale,
    duration_ms, width, height)`` parsed from the ISO-BMFF box tree —
    entirely JVM-side Column expressions, zero Python workers, a
    projection fused into the scan at any scale.

    Box grammar (ISO 14496-12): ``size(4 BE) type(4)`` then payload;
    sizes INCLUDE the 8-byte header. The walk is the same staged
    projection chain as the RIFF walk (one named column per hop — the
    codegen-blowup lesson in ``audio_media_features``): top-level boxes
    are hopped to find ``moov``, then moov's children to find ``mvhd``
    (timescale + duration, version 0 and 1 layouts) and the first
    ``trak`` (whose first child is ``tkhd`` in every real muxer's
    output — width/height as 16.16 fixed point; the integer part is
    read). 64-bit largesize boxes (size == 1) and malformed sizes < 8
    poison the offset past any payload, degrading to nulls."""

    def _pos(col):
        return F.least(col, F.lit((1 << 31) - 1).cast("long")).cast("int")

    def _box_walk(w, start_col: str, prefix: str, hops: int):
        w = w.withColumn(f"{prefix}0", F.col(start_col))
        for i in range(hops):
            w = (
                w.withColumn(
                    f"{prefix}hdr{i}",
                    F.hex(F.substring(F.col("_p"),
                                      _pos(F.col(f"{prefix}{i}")), 8)))
                .withColumn(f"{prefix}sz{i}",
                            _be_from_hex(F.col(f"{prefix}hdr{i}"), 0, 4))
                .withColumn(
                    f"{prefix}{i + 1}",
                    F.when(F.col(f"{prefix}sz{i}") >= 8,
                           F.col(f"{prefix}{i}") + F.col(f"{prefix}sz{i}"))
                    .otherwise(F.lit(1 << 40).cast("long")))
            )
        return w

    def _find(prefix: str, hops: int, type4: bytes):
        t = type4.hex().upper()
        return F.coalesce(*[
            F.when(F.substring(F.col(f"{prefix}hdr{i}"), 9, 8) == t,
                   F.col(f"{prefix}{i}")) for i in range(hops)])

    w = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("_p"),
    ).withColumn("_t_start", F.lit(1).cast("long"))
    w = _box_walk(w, "_t_start", "_t", _MP4_TOP_HOPS)
    w = w.withColumn("_moov", _find("_t", _MP4_TOP_HOPS, b"moov"))
    w = w.withColumn("_m_start", F.col("_moov") + 8)
    w = _box_walk(w, "_m_start", "_m", _MP4_MOOV_HOPS)
    w = (
        w.withColumn("_mvhd", _find("_m", _MP4_MOOV_HOPS, b"mvhd"))
        .withColumn("_trak", _find("_m", _MP4_MOOV_HOPS, b"trak"))
        # mvhd payload: ver(1) flags(3) then v0: ctime(4) mtime(4)
        # timescale(4) duration(4) / v1: ctime(8) mtime(8) timescale(4)
        # duration(8) — grab 32 bytes once
        .withColumn("_mv", F.hex(F.substring(F.col("_p"),
                                             _pos(F.col("_mvhd") + 8), 32)))
        # trak header(8) + tkhd box; v1 width sits at byte 104 — grab 112
        .withColumn("_tk", F.hex(F.substring(F.col("_p"),
                                             _pos(F.col("_trak") + 8), 112)))
    )
    mv_ver = _be_from_hex(F.col("_mv"), 0, 1)
    timescale = F.when(mv_ver == 0, _be_from_hex(F.col("_mv"), 12, 4)) \
        .otherwise(_be_from_hex(F.col("_mv"), 20, 4))
    duration = F.when(mv_ver == 0, _be_from_hex(F.col("_mv"), 16, 4)) \
        .otherwise(_be_from_hex(F.col("_mv"), 24, 8))
    tk_is_tkhd = F.substring(F.col("_tk"), 9, 8) == b"tkhd".hex().upper()
    tk_ver = _be_from_hex(F.col("_tk"), 8, 1)
    # _tk starts at the tkhd box HEADER (trak's first child), so its
    # payload begins at byte 8; 16.16 fixed-point width/height sit at
    # payload offsets 76/80 (v0) or 88/92 (v1) — absolute 84/88 and
    # 96/100 — and the integer part is the first 2 bytes of each field
    width = F.when(tk_ver == 0, _be_from_hex(F.col("_tk"), 84, 2)) \
        .otherwise(_be_from_hex(F.col("_tk"), 96, 2))
    height = F.when(tk_ver == 0, _be_from_hex(F.col("_tk"), 88, 2)) \
        .otherwise(_be_from_hex(F.col("_tk"), 100, 2))
    w = w.withColumn(
        "_valid",
        (F.octet_length(F.col("_p")) >= 16)
        & (F.hex(F.substring(F.col("_p"), 5, 4)) == b"ftyp".hex().upper())
        & F.col("_moov").isNotNull() & F.col("_mvhd").isNotNull())
    dims_ok = F.col("_valid") & F.col("_trak").isNotNull() & tk_is_tkhd
    return w.select(
        "media_id",
        F.octet_length(F.col("_p")).alias("payload_bytes"),
        F.when(F.col("_valid"), F.lit("mp4")).alias("format"),
        F.when(F.col("_valid"),
               F.substring(F.col("_p"), 9, 4).cast("string")).alias("brand"),
        F.when(F.col("_valid"), _clamp_int(timescale)).alias("timescale"),
        # hostile duration bytes can read as ~2^63/1000-plus; clamp
        # BEFORE the ms multiply or ANSI mode crashes the scan on one
        # corrupt file (same rule as _clamp_int / the RIFF _pos clamp)
        F.when(F.col("_valid") & (timescale > 0),
               F.least(duration, F.lit(1 << 53).cast("long"))
               * F.lit(1000) / timescale)
        .cast("long").alias("duration_ms"),
        F.when(dims_ok, _clamp_int(width)).alias("width"),
        F.when(dims_ok, _clamp_int(height)).alias("height"),
    )


def attach_payload(df: DataFrame, text_col: str, payload_col: str = "payload") -> DataFrame:
    """Test helper: fabricate a binary payload column from text (the
    fixtures carry no real media; the plumbing is what's under test)."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8")) \
             .withColumn(payload_col, F.col(payload_col).cast(BinaryType()))
