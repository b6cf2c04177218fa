"""Real video columns: YUV4MPEG2 (Y4M) container codec + frame
sampling, pure stdlib/numpy.

Y4M is the uncompressed interchange format every video toolchain
speaks (ffmpeg/x264 pipelines) — a parseable-without-codecs
container, which makes it the honest "real video path" available in
a container with no media libraries: header parse, per-FRAME plane
extraction, frame sampling, and luma statistics all execute on real
bytes. Compressed codecs (H.264/VP9/AV1 in MP4/WebM) would need
external decoders — those payloads surface per-row as ok=false via
``ValueError``. The frame-sampling *plan* for such opaque videos
stays in :func:`operators.multimodal.frame_sample_plan`.

Features are integer arithmetic over uint8 luma planes so the
declared query's DuckDB oracle replays them exactly.

Scale notes: decode runs inside ``mapInPandas`` Arrow batches
(payloads never on the driver); per-row output is a handful of
integers regardless of video size, so the stage's shuffle/write
volume is bounded. Frame sampling happens inside the kernel —
unsampled frames are never materialized downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

VIDEO_FEATURE_SCHEMA = (
    "media_id long, width int, height int, frame_count int, "
    "fps_num int, fps_den int, duration_ms long, "
    "luma_sum long, luma_min int, luma_max int, "
    "sampled_frames int, sampled_luma_sum long, ok boolean, error string"
)

#: chroma tag → (x_div, y_div) subsampling divisors for the two
#: chroma planes; 'mono' has no chroma planes.
_CHROMA_DIVS = {
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2), "420paldv": (2, 2),
    "422": (2, 1), "444": (1, 1), "mono": None,
}


def encode_y4m(
    frames: list[tuple[np.ndarray, np.ndarray | None, np.ndarray | None]],
    fps: tuple[int, int] = (25, 1),
    chroma: str = "420jpeg",
) -> bytes:
    """frames = [(Y, Cb, Cr)] uint8 planes (Cb/Cr None for mono) →
    Y4M bytes: stream header + per-frame ``FRAME\\n`` + raw planes."""
    y0 = frames[0][0]
    h, w = y0.shape
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n"
    out = bytearray(hdr.encode("ascii"))
    for y, cb, cr in frames:
        out += b"FRAME\n"
        out += y.astype(np.uint8).tobytes()
        if chroma != "mono":
            out += cb.astype(np.uint8).tobytes()
            out += cr.astype(np.uint8).tobytes()
    return bytes(out)


def decode_y4m(payload: bytes):
    """Y4M bytes → (w, h, fps_num, fps_den, chroma_tag,
    iterator of (Y, Cb, Cr) uint8 planes) — planes are views over
    the payload buffer (zero-copy)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps_num, fps_den = 25, 1
    chroma = "420jpeg"
    for tok in payload[:nl].decode("ascii", "replace").split()[1:]:
        key, val = tok[0], tok[1:]
        if key == "W":
            w = int(val)
        elif key == "H":
            h = int(val)
        elif key == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif key == "C":
            chroma = val
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if chroma not in _CHROMA_DIVS:
        raise ValueError(f"unsupported Y4M chroma tag C{chroma}")
    divs = _CHROMA_DIVS[chroma]
    y_len = w * h
    if divs is None:
        c_len = 0
    else:
        c_len = ((w + divs[0] - 1) // divs[0]) * ((h + divs[1] - 1) // divs[1])

    def frames() -> Iterator[tuple[np.ndarray, np.ndarray | None, np.ndarray | None]]:
        i = nl + 1
        n = len(payload)
        while i < n:
            fnl = payload.find(b"\n", i)
            if fnl < 0 or payload[i : i + 5] != b"FRAME":
                raise ValueError(f"bad Y4M FRAME marker at byte {i}")
            i = fnl + 1
            need = y_len + 2 * c_len
            if i + need > n:
                raise ValueError("Y4M frame truncated")
            y = np.frombuffer(payload, dtype=np.uint8, count=y_len, offset=i).reshape(h, w)
            if c_len:
                cb = np.frombuffer(payload, dtype=np.uint8, count=c_len, offset=i + y_len)
                cr = np.frombuffer(payload, dtype=np.uint8, count=c_len, offset=i + y_len + c_len)
            else:
                cb = cr = None
            yield y, cb, cr
            i += need

    return w, h, fps_num, fps_den, chroma, frames()


def y4m_stats(payload: bytes, sample_every: int = 2):
    """Decode + integer features: full-stream luma sum/min/max and a
    sampled-frame (every ``sample_every``-th, starting at frame 0)
    luma sum — the decode-only-what-you-keep pattern a real frame
    sampler uses. duration_ms = frames·1000·den // num."""
    w, h, num, den, _chroma, frames = decode_y4m(payload)
    luma_sum = 0
    luma_min, luma_max = 255, 0
    n_frames = 0
    sampled = 0
    sampled_sum = 0
    for idx, (y, _cb, _cr) in enumerate(frames):
        s = int(y.sum(dtype=np.int64))
        luma_sum += s
        luma_min = min(luma_min, int(y.min()))
        luma_max = max(luma_max, int(y.max()))
        n_frames += 1
        if idx % sample_every == 0:
            sampled += 1
            sampled_sum += s
    if n_frames == 0:
        raise ValueError("Y4M stream has no frames")
    return (
        w, h, n_frames, num, den, n_frames * 1000 * den // num,
        luma_sum, luma_min, luma_max, sampled, sampled_sum,
    )


def video_features(
    df: DataFrame, sample_every: int = 2, content_col: str = "content"
) -> DataFrame:
    """Partition-parallel Y4M decode → flat integer feature columns
    (schema :data:`VIDEO_FEATURE_SCHEMA`); non-Y4M payloads surface
    per-row as ok=false."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "width", "height", "frame_count", "fps_num", "fps_den",
            "duration_ms", "luma_sum", "luma_min", "luma_max",
            "sampled_frames", "sampled_luma_sum", "ok", "error",
        ]
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col] or b"")
                try:
                    stats = y4m_stats(payload, sample_every=sample_every)
                    out.append((row["media_id"], *stats, True, None))
                except Exception as e:
                    out.append((row["media_id"], None, None, None, None, None,
                                None, None, None, None, None, None, False, str(e)[:200]))
            yield pd.DataFrame(out, columns=cols)

    return df.select("media_id", content_col).mapInPandas(run, schema=VIDEO_FEATURE_SCHEMA)
