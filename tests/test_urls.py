"""URL canonicalization: rule-by-rule cases, idempotence, and the
things the normal form must NOT touch (non-default ports,
non-tracking params)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ods_v3_dbt_spark.functions.urls import canonicalize_url

CASES = [
    # case-folding of scheme and host, path case preserved
    ("HTTP://EXAMPLE.COM/A/B", "http://example.com/A/B"),
    # www strip + default port strip (both schemes)
    ("http://www.example.com:80/x", "http://example.com/x"),
    ("https://www.example.com:443/x", "https://example.com/x"),
    # non-default port preserved
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com:80/x", "https://example.com:80/x"),
    # fragment dropped, trailing slash stripped, root path normalized
    ("http://example.com/a/#frag", "http://example.com/a"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/#top", "http://example.com/"),
    # tracking params dropped, survivors sorted, empty query drops '?'
    ("http://example.com/p?utm_source=a&id=3", "http://example.com/p?id=3"),
    ("http://example.com/p?z=2&a=1", "http://example.com/p?a=1&z=2"),
    ("http://example.com/p?gclid=x&utm_campaign=y", "http://example.com/p"),
    ("http://example.com/p?ref=hn&x=1&fbclid=z", "http://example.com/p?x=1"),
    # utm_ prefix match is on the NAME only
    ("http://example.com/p?id=utm_like", "http://example.com/p?id=utm_like"),
    # empty path + query (valid per RFC 3986): the query must NOT
    # fold into the authority — it canonicalizes to the '/'-path twin
    ("http://example.com?utm_source=x&id=7", "http://example.com/?id=7"),
    ("http://www.example.com:80?z=2&a=1#f", "http://example.com/?a=1&z=2"),
    ("https://WWW.Example.com:443?gclid=g", "https://example.com/"),
    # '/' inside the query is harmless once the query is carved first
    ("http://example.com/p?next=/a/b&z=1", "http://example.com/p?next=/a/b&z=1"),
    # '?' inside a query VALUE survives (query = everything after the
    # FIRST '?', not split_part truncation at the second)
    ("http://example.com/p?next=/a?b=1", "http://example.com/p?next=/a?b=1"),
    ("http://example.com?r=/x?y=2&a=1", "http://example.com/?a=1&r=/x?y=2"),
    # everything stacked
    (
        "HTTPS://WWW.Example.COM:443/a/b/?b=2&utm_x=1&a=1#sec",
        "https://example.com/a/b?a=1&b=2",
    ),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, u string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonicalize_url(F.col("u")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonicalize_url_idempotent(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, u string"
    )
    once = df.select("i", canonicalize_url(F.col("u")).alias("c"))
    twice = once.select("i", canonicalize_url(F.col("c")).alias("c"))
    assert {(r.i, r.c) for r in once.collect()} == {
        (r.i, r.c) for r in twice.collect()
    }


TRACKING = {"gclid", "fbclid", "ref", "mc_cid", "mc_eid"}


def ref_canon(u: str) -> str:
    """Independent pure-Python oracle of the documented normal form —
    written against the module docstring, not the Spark expression,
    so a shared mis-parse in both engines (the round-3 advisor
    finding: empty-path+query folding the query into the authority)
    cannot pass on parity alone."""
    scheme, rest = u.split("://", 1)
    scheme = scheme.lower()
    nofrag = rest.split("#", 1)[0]
    preq, _, query = nofrag.partition("?")
    slash = preq.find("/")
    hostport = (preq if slash < 0 else preq[:slash]).lower()
    path = "" if slash < 0 else preq[slash:]
    host = hostport[4:] if hostport.startswith("www.") else hostport
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    if path == "":
        path = "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    keep = [
        p
        for p in query.split("&")
        if p
        and not p.split("=", 1)[0].startswith("utm_")
        and p.split("=", 1)[0] not in TRACKING
    ]
    qs = "&".join(sorted(keep))
    return f"{scheme}://{host}{path}" + (f"?{qs}" if qs else "")


def _grid_urls() -> list[str]:
    urls = []
    for scheme in ("http", "HTTPS", "https"):
        for host in ("Example.com", "www.example.com", "WWW.EX.ORG"):
            for port in ("", ":80", ":443", ":8080"):
                for path in ("", "/", "/a/B/"):
                    for query in (
                        "",
                        "?z=2&a=1",
                        "?utm_x=1&gclid=g&id=7",
                        "?next=/a?b=1&z=9",   # '?' and '/' in a value
                    ):
                        for frag in ("", "#Sec"):
                            urls.append(
                                f"{scheme}://{host}{port}{path}{query}{frag}"
                            )
    return urls


def test_grid_expected_values(spark):
    """Every grid cell — including the empty-path+query cells the
    round-3 advisor flagged — must equal the INDEPENDENT reference
    canonical form, not merely match DuckDB."""
    urls = _grid_urls()
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, u string"
    )
    got = {
        r.doc_id: r.c
        for r in df.select(
            "doc_id", canonicalize_url(F.col("u")).alias("c")
        ).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == ref_canon(u), f"{u!r}: {got[i]!r} != {ref_canon(u)!r}"


def test_cross_engine_grid_spark_vs_duckdb(spark):
    """Exhaustive component grid (scheme × host × port × path ×
    query × fragment — 864 URLs): the Spark column expression and
    the DuckDB CTE twin must canonicalize every combination
    identically. This is the same equivalence the oracle gate rests
    on, pinned at full combinatorial width rather than the fixture's
    6 dirt variants."""
    import duckdb

    from ods_v3_dbt_spark.functions.urls import canonical_url_cte

    urls = _grid_urls()
    assert len(urls) == 864

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, u string"
    )
    got_spark = {
        r.doc_id: r.c
        for r in df.select("doc_id", canonicalize_url(F.col("u")).alias("c")).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE raw AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{u}')" for i, u in enumerate(urls))
        + ") t(doc_id, u)"
    )
    sql = (
        "WITH u0 AS (SELECT doc_id, u FROM raw),\n"
        + canonical_url_cte("u0")
        + "\nSELECT doc_id, canon_url FROM u_canon"
    )
    got_duck = {int(i): c for i, c in con.execute(sql).fetchall()}
    assert got_spark == got_duck
