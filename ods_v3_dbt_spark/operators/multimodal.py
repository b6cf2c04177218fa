"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch shape, partition-parallel
decode) is real and tested. Decoding is REAL for every mainstream
web-corpus raster format — PPM (P6), PGM (P5), uncompressed 24/32-bit
BMP, non-interlaced 8-bit gray/RGB/RGBA PNG (stdlib zlib + all five
scanline filters), and (round 3) baseline sequential JPEG (full
Huffman + DCT pipeline in ``operators/jpeg.py``) — parsed
pure-Python + numpy (no media libs needed). Only the exotic variants
(progressive JPEG, interlaced/palette/16-bit PNG, WebP/GIF) still
require PIL and raise a clearly-marked ``NotImplementedError`` when
it's absent (this container ships no media libs; see the round
brief). A deterministic fake decoder remains for fixtures. Real
audio (RIFF/WAV PCM) and video (YUV4MPEG2) codecs live in
``operators/audio.py`` / ``operators/video.py``.

Design for 100 TB: binary payloads never hit the driver; decode
happens inside ``mapInPandas`` batches (Arrow transfer, one Python
worker per core); derived features come back as flat typed columns so
downstream filtering/joins stay JVM-side. Media blobs should live in
their own parquet column-chunk (they do, as a binary column) so
metadata-only queries never read them (column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
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

#: Canonical media-row schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("byte_len", LongType(), True),
        StructField("sha256", StringType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, byte_len long, width int, height int, "
    "channels int, duration_ms long, frame_count int, "
    "px_sum long, px_mean_milli long, px_min int, px_max int, "
    "fmt string, ok boolean, error string"
)


def _try_import_pillow():
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Real pure-Python raster codecs (PPM P6 / PGM P5 / uncompressed BMP)
# ---------------------------------------------------------------------------


class UnsupportedMediaFormat(ValueError):
    """Payload magic not handled by the built-in codecs."""


def _read_pnm_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers from a PNM
    header starting at ``start``, honoring ``#`` comments. Returns
    (values, index of the byte AFTER the single whitespace that
    terminates the last token) — pixel data begins there."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i] == ord("#"):
            while i < len(payload) and payload[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


def decode_pnm(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Decode binary PPM (P6, RGB) / PGM (P5, gray) → (fmt, w, h,
    channels, uint8 array shaped (h, w, channels))."""
    magic = payload[:2]
    channels = 3 if magic == b"P6" else 1
    (w, h, maxval), px_start = _read_pnm_tokens(payload, 3, 2)
    if maxval > 255:
        raise ValueError(f"16-bit PNM not supported (maxval={maxval})")
    need = w * h * channels
    raw = payload[px_start : px_start + need]
    if len(raw) != need:
        raise ValueError(f"PNM pixel data truncated: {len(raw)} != {need}")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, channels)
    return ("ppm" if channels == 3 else "pgm", w, h, channels, arr)


def decode_bmp(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Decode an uncompressed (BI_RGB) 24/32-bit BMP → (fmt, w, h,
    channels, uint8 RGB(A) array shaped (h, w, channels)). Rows are
    4-byte aligned and stored bottom-up (top-down when height < 0);
    stored channel order is BGR(A) and is swapped to RGB(A)."""
    if len(payload) < 54:
        raise ValueError("BMP header truncated")
    px_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h_raw = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise ValueError(f"compressed BMP not supported (method={compression})")
    if bpp not in (24, 32):
        raise ValueError(f"only 24/32-bit BMP supported (bpp={bpp})")
    channels = bpp // 8
    h = abs(h_raw)
    stride = (w * channels + 3) // 4 * 4
    need = stride * h
    raw = payload[px_off : px_off + need]
    if len(raw) != need:
        raise ValueError(f"BMP pixel data truncated: {len(raw)} != {need}")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, : w * channels]
    arr = rows.reshape(h, w, channels)
    if h_raw > 0:  # bottom-up storage
        arr = arr[::-1]
    arr = arr[:, :, [2, 1, 0] + ([3] if channels == 4 else [])]  # BGR(A)→RGB(A)
    return ("bmp", w, h, channels, np.ascontiguousarray(arr))


# --- PNG (pure stdlib: zlib inflate + the five scanline filters) ----------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: IHDR color type → channel count (8-bit depth only; palette (3)
#: and 16-bit stay behind the PIL stub — web-corpus PNGs are
#: overwhelmingly 8-bit gray/RGB/RGBA).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4): nearest of
    left/up/up-left to the linear gradient p = a + b − c, ties
    breaking left, up, up-left."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def _png_defilter(raw: np.ndarray, w: int, h: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering: each of the ``h`` scanlines leads
    with a filter-type byte (0 none / 1 sub / 2 up / 3 average /
    4 paeth). Up/none are whole-row vectorized; sub/average/paeth
    carry a left-neighbor dependency, so those rows walk pixel
    positions with the ``bpp`` channels vectorized per step."""
    stride = w * bpp
    lines = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype, row = int(lines[y, 0]), lines[y, 1:].copy()
        prev = out[y - 1] if y else zero_prev
        if ftype == 0:
            out[y] = row
        elif ftype == 2:
            out[y] = row + prev  # uint8 wraparound == mod-256 add
        elif ftype in (1, 3, 4):
            cur = out[y]
            for x in range(0, stride, bpp):
                left = cur[x - bpp : x] if x else zero_prev[:bpp]
                if ftype == 1:
                    cur[x : x + bpp] = row[x : x + bpp] + left
                elif ftype == 3:
                    avg = (
                        left.astype(np.int32) + prev[x : x + bpp].astype(np.int32)
                    ) // 2
                    cur[x : x + bpp] = row[x : x + bpp] + avg.astype(np.uint8)
                else:
                    up_left = prev[x - bpp : x] if x else zero_prev[:bpp]
                    cur[x : x + bpp] = row[x : x + bpp] + _paeth_vec(
                        left, prev[x : x + bpp], up_left
                    )
        else:
            raise ValueError(f"bad PNG filter type {ftype} on line {y}")
    return out


def _png_chunks(payload: bytes):
    i = 8
    while i + 8 <= len(payload):
        length = int.from_bytes(payload[i : i + 4], "big")
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) != length:
            raise ValueError("PNG chunk truncated")
        yield ctype, data
        i += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def decode_png(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Decode a non-interlaced 8-bit gray/gray+alpha/RGB/RGBA PNG →
    (fmt, w, h, channels, uint8 array shaped (h, w, channels)).
    Pure stdlib: chunk walk → zlib inflate of the concatenated IDAT
    stream → scanline defilter (all five filter types, paeth
    included). Interlaced, paletted, or 16-bit PNGs raise — those
    fall to the PIL stub in :func:`decode_raster`."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    w = h = channels = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, color = data[8], data[9]
            compression, filt, interlace = data[10], data[11], data[12]
            if depth != 8:
                raise ValueError(f"only 8-bit PNG supported (depth={depth})")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if compression or filt:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (w * channels + 1):
        raise ValueError(
            f"PNG pixel data wrong size: {raw.size} != {h * (w * channels + 1)}"
        )
    arr = _png_defilter(raw, w, h, channels).reshape(h, w, channels)
    return ("png", w, h, channels, arr)


def encode_png(arr: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """uint8 (h, w, c) → PNG bytes (stdlib zlib + crc32). With
    ``filter_mode='cycle'`` scanline y uses filter type y mod 5, so a
    decode of our own output exercises every defilter path — the
    roundtrip property the tests and the declared PNG query lean on;
    ``'none'`` emits filter 0 only."""
    import zlib

    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    lines = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        row = arr[y].reshape(-1)
        ftype = (y % 5) if filter_mode == "cycle" else 0
        if ftype == 0:
            filt = row
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            filt = row - left
        elif ftype == 2:
            filt = row - prev
        elif ftype == 3:
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            avg = (left.astype(np.int32) + prev.astype(np.int32)) // 2
            filt = row - avg.astype(np.uint8)
        else:
            left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
            up_left = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            filt = row - _paeth_vec(left, prev, up_left)
        lines += bytes([ftype]) + filt.astype(np.uint8).tobytes()
        prev = row
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, color, 0, 0, 0])
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


def decode_raster(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Dispatch on magic bytes. PPM/PGM/BMP/PNG/baseline-JPEG decode
    here with no optional deps; anything else (progressive JPEG,
    exotic PNG variants, WebP/GIF/…) needs PIL and raises the
    clearly-marked ``NotImplementedError`` stub when absent."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_pnm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        try:
            return decode_jpeg(payload)
        except ValueError:
            if not _try_import_pillow():
                raise  # surfaced per-row as ok=false with the real reason
            # progressive/12-bit → PIL fallback below
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)
    if payload[:8] == _PNG_SIG:
        try:
            return decode_png(payload)
        except ValueError:
            if not _try_import_pillow():
                raise  # surfaced per-row as ok=false with the real reason
            # interlaced/paletted/16-bit → PIL fallback below
    if _try_import_pillow():  # pragma: no cover - PIL absent in container
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload))
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return (img.format or "pil").lower(), img.width, img.height, arr.shape[2], arr
    raise UnsupportedMediaFormat(
        "payload is not PPM/PGM/BMP/PNG/GIF/baseline-JPEG; decoding other "
        "formats (WebP/progressive JPEG/exotic PNG) requires PIL, not "
        "present in this container (NotImplemented: install pillow)"
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) RGB → binary PPM (P6); (h, w, 1) → PGM (P5)."""
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def resize_nearest(arr: np.ndarray, w_out: int, h_out: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index maps (vectorized
    fancy indexing — no per-pixel Python)."""
    h, w = arr.shape[:2]
    yy = (np.arange(h_out) * h) // h_out
    xx = (np.arange(w_out) * w) // w_out
    return np.ascontiguousarray(arr[yy][:, xx])


@dataclass
class FakeDecoded:
    """Deterministic fake decode result derived from payload bytes —
    lets the full pipeline (schema, batching, joins) run and be
    asserted on without media libraries."""

    width: int
    height: int
    channels: int
    duration_ms: int
    frame_count: int

    @classmethod
    def from_bytes(cls, payload: bytes) -> "FakeDecoded":
        h = hashlib.sha256(payload).digest()
        return cls(
            width=64 + h[0],
            height=64 + h[1],
            channels=3,
            duration_ms=1000 + int.from_bytes(h[2:4], "big"),
            frame_count=1 + h[4] % 32,
        )


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """JVM-side metadata: byte length + sha256 — no decode, no Python.
    These are the columns metadata-only scans should touch."""
    return df.withColumn("byte_len", F.octet_length(F.col(content_col)).cast("bigint")).withColumn(
        "sha256", F.sha2(F.col(content_col), 256)
    )


_FEATURE_COLS = [
    "media_id", "media_type", "byte_len", "width", "height",
    "channels", "duration_ms", "frame_count",
    "px_sum", "px_mean_milli", "px_min", "px_max", "fmt", "ok", "error",
]


def decode_features(
    df: DataFrame,
    decoder: str = "real",
) -> DataFrame:
    """Partition-parallel decode → flat feature columns.

    ``decoder='real'`` decodes PPM/PGM/BMP payloads with the
    built-in pure-Python codecs (pixel stats are real: sum / mean‰ /
    min / max over the raster); formats beyond those need PIL and
    surface per-row as ``ok=false`` with the NotImplemented error
    message. ``decoder='fake'`` derives deterministic pseudo-features
    from payload bytes (fixture path; pixel stats NULL).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["content"] or b"")
                mid, mtype = row["media_id"], row["media_type"]
                try:
                    if decoder == "fake":
                        d = FakeDecoded.from_bytes(payload)
                        out.append(
                            (
                                mid, mtype, len(payload),
                                d.width, d.height, d.channels,
                                d.duration_ms if mtype != "image" else 0,
                                d.frame_count if mtype == "video" else 1,
                                None, None, None, None, "fake", True, None,
                            )
                        )
                    else:
                        fmt, w, h, c, arr = decode_raster(payload)
                        px_sum = int(arr.sum(dtype=np.int64))
                        out.append(
                            (
                                mid, mtype, len(payload), w, h, c, 0, 1,
                                px_sum, px_sum * 1000 // arr.size,
                                int(arr.min()), int(arr.max()), fmt, True, None,
                            )
                        )
                except Exception as e:
                    out.append(
                        (mid, mtype, len(payload), None, None, None, None,
                         None, None, None, None, None, None, False, str(e)[:200])
                    )
            yield pd.DataFrame(out, columns=_FEATURE_COLS)

    return df.select("media_id", "media_type", "content").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to
    extract (media_id, frame_idx). The decode of each frame is the
    stubbed kernel; the explode/distribution strategy (what a real
    pipeline shuffles) is the part that matters at scale."""
    frames = F.sequence(F.lit(0), F.greatest(F.col("frame_count") - 1, F.lit(0)), F.lit(every_nth))
    return df.filter(F.col("media_type") == "video").select(
        "media_id", F.explode(frames).alias("frame_idx")
    )


RESIZED_SCHEMA = (
    "media_id long, content binary, width int, height int, ok boolean, error string"
)


def fit_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving fit into ``max_side``² (never upscale).
    Integer arithmetic only — the oracle twin is
    ``greatest(1, w*max_side // greatest(w,h))`` — so both engines
    compute identical geometry with no float rounding hazard."""
    m = max(w, h)
    if m <= max_side:
        return w, h
    return max(1, w * max_side // m), max(1, h * max_side // m)


def resize_images(
    df: DataFrame,
    max_side: int = 256,
    decoder: str = "real",
) -> DataFrame:
    """Bounded-box image resize → new payload + dims, partition-parallel.

    ``decoder='real'`` decodes PPM/PGM/BMP with the built-in codecs,
    resamples nearest-neighbor (vectorized numpy index maps) to an
    aspect-preserving fit in ``max_side``², and re-encodes as binary
    PPM/PGM — a real pixel pipeline end to end. Non-raster formats
    surface per-row as ``ok=false`` (PIL stub). ``decoder='fake'``
    keeps the fixture path: real target geometry from fake decoded
    dims, deterministic sha256-seeded payload of the right size.

    Scale notes: payloads stream through Arrow batches worker-side
    (never the driver); output rows are ≤ max_side² · channels bytes
    regardless of input size, so the stage's output is bounded and a
    shuffle after it is safe even when inputs are multi-MB originals.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["content"] or b"")
                try:
                    if decoder == "fake":
                        d = FakeDecoded.from_bytes(payload)
                        w, h = fit_dims(d.width, d.height, max_side)
                        seed = hashlib.sha256(payload + b"|resize").digest()
                        body = (seed * (w * h * d.channels // len(seed) + 1))[: w * h * d.channels]
                        out.append((row["media_id"], body, w, h, True, None))
                    else:
                        _, w0, h0, c, arr = decode_raster(payload)
                        if c == 4:  # drop alpha for the PPM re-encode
                            arr, c = arr[:, :, :3], 3
                        w, h = fit_dims(w0, h0, max_side)
                        body = encode_ppm(resize_nearest(arr, w, h))
                        out.append((row["media_id"], body, w, h, True, None))
                except Exception as e:
                    out.append((row["media_id"], None, None, None, False, str(e)[:200]))
            yield pd.DataFrame(
                out, columns=["media_id", "content", "width", "height", "ok", "error"]
            )

    return (
        df.filter(F.col("media_type") == "image")
        .select("media_id", "media_type", "content")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )
