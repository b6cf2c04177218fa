"""WARC (ISO 28500 Web ARChive) source — the container web crawls
actually ship in (Common-Crawl-style pretraining corpora are WARC →
text extraction → curation; this module is the first stage of that
funnel), parsed pure-Python.

Format: concatenated records, each ``WARC/1.0`` + CRLF header block +
blank line + ``Content-Length`` bytes of body + CRLF CRLF. The
standard ``.warc.gz`` layout gzips EVERY RECORD as its own gzip
member so readers can seek; :func:`parse_warc` accepts both plain
and multi-member-gzip payloads (repeated ``zlib`` decompressobj over
the member boundaries — stdlib only). HTTP response records carry an
HTTP message as body; :func:`split_http` separates status/headers
from the entity payload.

Scale notes: WARC is not line-splittable, so the unit of parallelism
is the FILE (Common Crawl ships ~1 GB segments — thousands of files,
natural task granularity). ``warc_records`` reads files via Spark's
``binaryFile`` source and parses inside ``mapInPandas`` — payloads
never hit the driver, output rows are bounded metadata + body bytes.
A malformed record degrades to one error row (ok=false), never a
stage crash.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "path string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, record_id string, content_type string, "
    "content_length long, body binary, ok boolean, error string"
)


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout)."""
    out = bytearray()
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(31)  # gzip wrapper
        out += d.decompress(payload[pos:])
        out += d.flush()
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed
    return bytes(out)


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a WARC payload (plain or multi-member gzip) →
    [{warc_type, target_uri, warc_date, record_id, content_type,
    content_length, body, headers}] in record order. Raises
    ``ValueError`` on malformed framing."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    records = []
    i = 0
    n = len(payload)
    while i < n:
        # tolerate trailing CRLFs between records
        while i < n and payload[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not payload[i:].startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line at byte {i}")
        hdr_end = payload.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            raise ValueError("WARC header block unterminated")
        lines = payload[i:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record missing Content-Length") from e
        body_start = hdr_end + 4
        body = payload[body_start : body_start + length]
        if len(body) != length:
            raise ValueError(
                f"WARC body truncated: {len(body)} < {length}"
            )
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "record_id": headers.get("warc-record-id", ""),
                "content_type": headers.get("content-type", ""),
                "content_length": length,
                "body": body,
                "headers": headers,
            }
        )
        i = body_start + length
    return records


def split_http(body: bytes) -> tuple[int, dict, bytes]:
    """HTTP response message → (status_code, headers, entity body).
    Raises ``ValueError`` if the body is not an HTTP message."""
    end = body.find(b"\r\n\r\n")
    if end < 0 or not body.startswith(b"HTTP/"):
        raise ValueError("not an HTTP message body")
    lines = body[:end].decode("utf-8", "replace").split("\r\n")
    parts = lines[0].split(" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(f"bad HTTP status line {lines[0]!r}")
    headers = {}
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return int(parts[1]), headers, body[end + 4 :]


def build_warc(records: list[dict], gz: bool = False) -> bytes:
    """Synthesize WARC bytes from [{warc_type, target_uri, warc_date,
    record_id, content_type, body}] — the test/fixture twin of
    :func:`parse_warc`; ``gz=True`` emits one gzip member per record
    (the standard .warc.gz layout)."""
    out = bytearray()
    for r in records:
        body = r["body"]
        hdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('warc_type', 'response')}\r\n"
            f"WARC-Target-URI: {r.get('target_uri', '')}\r\n"
            f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}\r\n"
            f"Content-Type: {r.get('content_type', 'application/http; msgtype=response')}\r\n"
            f"Content-Length: {len(body)}\r\n"
            "\r\n"
        ).encode()
        rec = hdr + body + b"\r\n\r\n"
        out += gzip.compress(rec) if gz else rec
    return bytes(out)


def warc_records(spark: SparkSession, path: str) -> DataFrame:
    """Spark source: every WARC record of every file under ``path``
    as one row (schema :data:`WARC_SCHEMA`). Files parallelize as
    whole units (binaryFile source — WARC is not line-splittable);
    a malformed FILE yields one ok=false row carrying the error."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "path", "record_idx", "warc_type", "target_uri", "warc_date",
            "record_id", "content_type", "content_length", "body", "ok", "error",
        ]
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                try:
                    for idx, r in enumerate(parse_warc(bytes(row["content"]))):
                        out.append(
                            (row["path"], idx, r["warc_type"], r["target_uri"],
                             r["warc_date"], r["record_id"], r["content_type"],
                             r["content_length"], r["body"], True, None)
                        )
                except Exception as e:
                    out.append(
                        (row["path"], None, None, None, None, None, None,
                         None, None, False, str(e)[:200])
                    )
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(run, schema=WARC_SCHEMA)
