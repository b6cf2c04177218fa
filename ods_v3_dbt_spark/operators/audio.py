"""Real audio columns: RIFF/WAVE PCM codec + signal features, pure
stdlib/numpy — upgrades audio from the deterministic-fake metadata
path to an actual decode, the same round-3 move PNG/JPEG made for
images.

Scope matches what an LLM-curation pipeline actually does with
audio at scale: parse the container, validate PCM layout, compute
cheap screening features (duration, energy, peak, zero-crossing
rate), resample, and frame-level energies for downstream VAD-ish
filtering. Lossy codecs (MP3/AAC/Opus) would need external
libraries this container doesn't ship — payloads in those formats
surface per-row as ok=false via :class:`ValueError`, never a crash.

Every feature is INTEGER arithmetic over int16 samples (sum of
squares, max |s|, sign-product crossing counts) so the declared
query's DuckDB oracle replays them exactly — no float accumulation
order hazard.

Scale notes: decode runs inside ``mapInPandas`` Arrow batches;
payloads never hit the driver; features come back as flat typed
columns. Zero shuffles.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, channels int, bits int, "
    "n_samples long, duration_ms long, "
    "sumsq long, peak int, zero_crossings long, ok boolean, error string"
)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array shaped (n,) or (n, channels) → RIFF/WAVE PCM16
    bytes (little-endian, interleaved frames)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    pcm = samples.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """RIFF/WAVE PCM → (sample_rate, channels, bits, int16 array
    shaped (n, channels)). Accepts PCM 16-bit (native) and 8-bit
    unsigned (centered to int16 via (s-128)·256); walks chunks in
    order, skipping LIST/INFO and other non-fmt/data chunks (chunk
    bodies are word-aligned per RIFF). Compressed formats raise."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    n = len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"WAV chunk {cid!r} truncated")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # word alignment
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_fmt != 1:
        raise ValueError(
            f"only PCM WAV supported (format tag {audio_fmt}: compressed "
            "audio needs external codecs, not present in this container)"
        )
    if ch < 1:
        raise ValueError("WAV has zero channels")
    if bits == 16:
        arr = np.frombuffer(data[: len(data) // (2 * ch) * 2 * ch], dtype="<i2")
        arr = arr.reshape(-1, ch).astype(np.int16)
    elif bits == 8:
        arr = np.frombuffer(data[: len(data) // ch * ch], dtype=np.uint8)
        arr = ((arr.astype(np.int16) - 128) * 256).reshape(-1, ch)
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    return rate, ch, bits, arr


def resample_nearest(samples: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """Integer-phase nearest-sample resample: out[i] = s[i·from//to],
    n_out = n·to//from — exact integer index map, vectorized, no
    float phase accumulator to drift."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n = samples.shape[0]
    n_out = n * to_rate // from_rate
    idx = (np.arange(n_out, dtype=np.int64) * from_rate) // to_rate
    return samples[idx]


def frame_energies(samples: np.ndarray, frame_len: int) -> np.ndarray:
    """Per non-overlapping frame: sum of squares over channel 0
    (int64) — the screening feature for silence/VAD-style gates.
    The ragged tail (< frame_len samples) is dropped."""
    mono = samples[:, 0].astype(np.int64) if samples.ndim == 2 else samples.astype(np.int64)
    n_frames = len(mono) // frame_len
    if n_frames == 0:
        return np.zeros(0, dtype=np.int64)
    return (mono[: n_frames * frame_len] ** 2).reshape(n_frames, frame_len).sum(axis=1)


def wav_stats(payload: bytes) -> tuple[int, int, int, int, int, int, int, int]:
    """Decode + integer features over channel 0: (rate, channels,
    bits, n_samples, duration_ms, sumsq, peak, zero_crossings).
    duration_ms = n·1000 // rate; crossings counts i ≥ 1 with
    s[i-1]·s[i] < 0 (zeros break runs, matching the SQL twin)."""
    rate, ch, bits, arr = decode_wav(payload)
    mono = arr[:, 0].astype(np.int64)
    n = int(mono.size)
    sumsq = int((mono * mono).sum())
    peak = int(np.abs(mono).max()) if n else 0
    crossings = int(((mono[:-1] * mono[1:]) < 0).sum()) if n > 1 else 0
    return rate, ch, bits, n, n * 1000 // rate, sumsq, peak, crossings


def audio_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Partition-parallel WAV decode → flat integer feature columns
    (schema :data:`AUDIO_FEATURE_SCHEMA`); malformed or compressed
    payloads surface per-row as ok=false."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "sample_rate", "channels", "bits", "n_samples",
            "duration_ms", "sumsq", "peak", "zero_crossings", "ok", "error",
        ]
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col] or b"")
                try:
                    rate, ch, bits, n, dur, sumsq, peak, zc = wav_stats(payload)
                    out.append((row["media_id"], rate, ch, bits, n, dur, sumsq, peak, zc, True, None))
                except Exception as e:
                    out.append((row["media_id"], None, None, None, None, None,
                                None, None, None, False, str(e)[:200]))
            yield pd.DataFrame(out, columns=cols)

    return df.select("media_id", content_col).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)
