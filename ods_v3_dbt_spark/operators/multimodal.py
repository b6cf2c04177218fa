"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch shape, partition-parallel
decode) is real and tested; the actual media decoding is stubbed —
the decode kernel raises ``NotImplementedError`` unless the optional
libs (PIL, soundfile, av) are importable, with a deterministic fake
decoder for tests (this container ships no media libs; see the
round-1 brief).

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
    "channels int, duration_ms long, frame_count int, ok boolean, error string"
)


def _try_import_pillow():
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


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


def decode_features(
    df: DataFrame,
    decoder: str = "fake",
) -> DataFrame:
    """Partition-parallel decode → flat feature columns.

    ``decoder='real'`` requires media libs and raises
    ``NotImplementedError`` in this environment (clearly-marked stub
    per the round brief); ``decoder='fake'`` derives deterministic
    pseudo-features from payload bytes so plumbing is testable.
    """
    if decoder == "real" and not _try_import_pillow():
        raise NotImplementedError(
            "real media decode requires PIL/soundfile/av, not present in this "
            "container — use decoder='fake' or install the optional deps"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["content"] or b""
                try:
                    d = FakeDecoded.from_bytes(bytes(payload))
                    out.append(
                        (
                            row["media_id"], row["media_type"], len(payload),
                            d.width, d.height, d.channels,
                            d.duration_ms if row["media_type"] != "image" else 0,
                            d.frame_count if row["media_type"] == "video" else 1,
                            True, None,
                        )
                    )
                except Exception as e:  # pragma: no cover - defensive
                    out.append(
                        (row["media_id"], row["media_type"], len(payload),
                         None, None, None, None, None, False, str(e))
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "media_type", "byte_len", "width", "height",
                    "channels", "duration_ms", "frame_count", "ok", "error",
                ],
            )

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


def resize_images(
    df: DataFrame,
    max_side: int = 256,
    decoder: str = "fake",
) -> DataFrame:
    """Bounded-box image resize → new payload + dims, partition-parallel.

    ``decoder='real'`` is the clearly-marked stub (needs PIL, absent in
    this container); ``decoder='fake'`` computes the REAL target
    geometry (aspect-preserving fit into ``max_side``² from the fake
    decoded dims) and emits a deterministic payload (sha256-seeded,
    sized width·height·channels bytes) so downstream batch shapes and
    memory behavior match a real resize.

    Scale notes: payloads stream through Arrow batches worker-side
    (never the driver); output rows are ≤ max_side² · channels bytes
    regardless of input size, so the stage's output is bounded and a
    shuffle after it is safe even when inputs are multi-MB originals.
    """
    if decoder == "real" and not _try_import_pillow():
        raise NotImplementedError(
            "real image resize requires PIL, not present in this container — "
            "use decoder='fake' or install the optional deps"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["content"] or b"")
                try:
                    d = FakeDecoded.from_bytes(payload)
                    scale = min(1.0, max_side / max(d.width, d.height))
                    w, h = max(1, int(d.width * scale)), max(1, int(d.height * scale))
                    seed = hashlib.sha256(payload + b"|resize").digest()
                    body = (seed * (w * h * d.channels // len(seed) + 1))[: w * h * d.channels]
                    out.append((row["media_id"], body, w, h, True, None))
                except Exception as e:  # pragma: no cover - defensive
                    out.append((row["media_id"], None, None, None, False, str(e)))
            yield pd.DataFrame(
                out, columns=["media_id", "content", "width", "height", "ok", "error"]
            )

    return (
        df.filter(F.col("media_type") == "image")
        .select("media_id", "media_type", "content")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )
