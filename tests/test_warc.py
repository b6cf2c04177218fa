"""WARC source: framing parse, multi-member gzip, HTTP split, the
binaryFile Spark reader, and malformed-stream degradation."""

from __future__ import annotations

import gzip

import pytest

from ods_v3_dbt_spark.sources import warc as W


def _recs(n=3):
    return [
        {
            "warc_type": "response" if i % 2 == 0 else "request",
            "target_uri": f"http://example.org/page/{i}",
            "warc_date": "2024-05-01T12:00:00Z",
            "record_id": f"<urn:uuid:{i}>",
            "content_type": "application/http; msgtype=response",
            "body": (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + f"<html>doc {i}</html>".encode()
            ),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip_multi_record(gz):
    recs = _recs(4)
    payload = W.build_warc(recs, gz=gz)
    got = W.parse_warc(payload)
    assert len(got) == 4
    for want, r in zip(recs, got):
        assert r["warc_type"] == want["warc_type"]
        assert r["target_uri"] == want["target_uri"]
        assert r["body"] == want["body"]
        assert r["content_length"] == len(want["body"])


def test_warc_gzip_members_are_independent():
    """The .warc.gz contract: each record its own gzip member —
    concatenating two single-record archives must parse as two
    records (this is what lets readers seek to member boundaries)."""
    a = W.build_warc(_recs(1), gz=True)
    b = W.build_warc(_recs(2)[1:], gz=True)
    got = W.parse_warc(a + b)
    assert [r["target_uri"] for r in got] == [
        "http://example.org/page/0", "http://example.org/page/1",
    ]


def test_split_http():
    status, headers, entity = W.split_http(
        b"HTTP/1.1 301 Moved\r\nLocation: /x\r\nContent-Type: a/b\r\n\r\nBODY"
    )
    assert status == 301 and headers["location"] == "/x" and entity == b"BODY"
    with pytest.raises(ValueError, match="HTTP"):
        W.split_http(b"not http at all")


def test_warc_malformed():
    payload = W.build_warc(_recs(2))
    with pytest.raises(ValueError, match="truncated"):
        W.parse_warc(payload[:-30])
    with pytest.raises(ValueError, match="version"):
        W.parse_warc(b"GARBAGE" + payload)
    # missing Content-Length
    bad = payload.replace(b"Content-Length:", b"X-Length:", 1)
    with pytest.raises(ValueError, match="Content-Length"):
        W.parse_warc(bad)


def test_warc_spark_source(spark, tmp_path):
    """End to end through binaryFile + mapInPandas: two files (one
    plain, one gzip), plus one garbage file that must degrade to a
    single ok=false row."""
    (tmp_path / "a.warc").write_bytes(W.build_warc(_recs(3)))
    (tmp_path / "b.warc.gz").write_bytes(W.build_warc(_recs(2), gz=True))
    (tmp_path / "c.warc").write_bytes(b"this is not a warc file")
    df = W.warc_records(spark, str(tmp_path))
    rows = df.collect()
    ok = [r for r in rows if r["ok"]]
    bad = [r for r in rows if not r["ok"]]
    assert len(ok) == 5 and len(bad) == 1
    assert "version" in bad[0]["error"]
    by_file = {}
    for r in ok:
        by_file.setdefault(r["path"].rsplit("/", 1)[1], []).append(r)
    assert len(by_file["a.warc"]) == 3
    assert len(by_file["b.warc.gz"]) == 2
    assert all(r["content_length"] == len(bytes(r["body"])) for r in ok)
