"""URL canonicalization — the first dedup stage of a web-corpus
pipeline (RefinedWeb/FineWeb dedup by canonical URL before any
content hashing: it is the only dedup that needs NO text read, so at
100 TB it runs on the metadata columns alone and prunes fetches).

Pure built-in column expressions (split_part / lower / filter /
array_sort — JVM-side, codegen-eligible, no UDF anywhere). Parsing
uses the delimiter-walk subset both ANSI engines agree on, not a
regex (Java regex vs RE2 is a cross-engine hazard), so the DuckDB
oracle replays it exactly via :func:`canonical_url_cte`.

Canonical form:
  1. scheme lowercased;
  2. host lowercased, leading ``www.`` stripped, default port
     stripped (``:80`` for http, ``:443`` for https — other ports
     kept);
  3. fragment dropped;
  4. path: empty → ``/``; a trailing slash on a non-root path is
     stripped;
  5. query: tracking params dropped (name starts ``utm_`` or is one
     of gclid/fbclid/ref/mc_cid/mc_eid), survivors SORTED
     byte-lexicographically (order variants collapse), an empty
     query drops its ``?``.

Contract: absolute http(s) URLs (``://`` present); ``?`` and ``#``
do not occur inside path segments — the crawl-record shape. The
host/path boundary is the FIRST of ``/`` or ``?`` after the
authority (RFC 3986 allows a query with an empty path, e.g.
``http://example.com?id=7``, and such URLs must canonicalize to
their ``/``-path twin), and ``/`` inside the query is harmless
because the query is carved off before the host/path split.
Idempotence (canon∘canon = canon) is pinned in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAMS = ("gclid", "fbclid", "ref", "mc_cid", "mc_eid")


def canonicalize_url(url: Column) -> Column:
    """Canonical URL of an absolute http(s) URL column (see module
    docstring for the exact normal form)."""
    scheme = F.lower(F.split_part(url, F.lit("://"), F.lit(1)))
    nofrag = F.split_part(
        F.split_part(url, F.lit("://"), F.lit(2)), F.lit("#"), F.lit(1)
    )
    # Carve the query off FIRST: the host/path boundary is the first
    # of '/' or '?', so 'host?q' (empty path, valid per RFC 3986)
    # must not fold its query into the authority. The query is
    # EVERYTHING after the first '?' — substring, not split_part,
    # because URL-shaped param values ('?next=/a?b=1') legitimately
    # carry further '?' characters and split_part would truncate at
    # the second one.
    preq = F.split_part(nofrag, F.lit("?"), F.lit(1))
    query = F.when(
        nofrag.contains("?"),
        F.substring(nofrag, F.length(preq) + 2, F.lit(2147483647)),
    ).otherwise(F.lit(""))
    hostport = F.lower(F.split_part(preq, F.lit("/"), F.lit(1)))
    path = F.substring(preq, F.length(hostport) + 1, F.lit(2147483647))

    host = F.when(
        hostport.startswith("www."), F.substring(hostport, 5, 2147483647)
    ).otherwise(hostport)
    host = (
        F.when(
            (scheme == "http") & host.endswith(":80"),
            F.substring(host, 1, F.length(host) - 3),
        )
        .when(
            (scheme == "https") & host.endswith(":443"),
            F.substring(host, 1, F.length(host) - 4),
        )
        .otherwise(host)
    )

    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)

    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.split_part(p, F.lit("="), F.lit(1)).startswith("utm_")
            & ~F.split_part(p, F.lit("="), F.lit(1)).isin(*TRACKING_PARAMS),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def canonical_url_cte(source_cte: str) -> str:
    """The identical normal form as a DuckDB CTE chain: given the
    name of a CTE exposing (doc_id, u), returns CTE-body text whose
    final stage ``u_canon`` yields (doc_id, u, canon_url). Splice
    into a WITH list after ``source_cte`` — this is how the oracle
    replays the Spark column expression step for step."""
    tracked = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    return f"""u1 AS (
      SELECT doc_id, u,
             split_part(split_part(u, '://', 2), '#', 1) AS nf,
             lower(split_part(u, '://', 1)) AS sch
      FROM {source_cte}),
    u2 AS (
      SELECT *, split_part(nf, '?', 1) AS pre,
             CASE WHEN contains(nf, '?')
                  THEN substr(nf, length(split_part(nf, '?', 1)) + 2)
                  ELSE '' END AS q
      FROM u1),
    u3 AS (
      SELECT *, lower(split_part(pre, '/', 1)) AS hp,
             substr(pre, length(split_part(pre, '/', 1)) + 1) AS p
      FROM u2),
    u4 AS (
      SELECT *, CASE WHEN hp LIKE 'www.%' THEN substr(hp, 5)
                     ELSE hp END AS h1
      FROM u3),
    u5 AS (
      SELECT *,
             CASE WHEN sch = 'http' AND h1 LIKE '%:80'
                  THEN substr(h1, 1, length(h1) - 3)
                  WHEN sch = 'https' AND h1 LIKE '%:443'
                  THEN substr(h1, 1, length(h1) - 4)
                  ELSE h1 END AS h2,
             CASE WHEN p = '' THEN '/'
                  WHEN length(p) > 1 AND p LIKE '%/'
                  THEN substr(p, 1, length(p) - 1)
                  ELSE p END AS p2,
             COALESCE(list_aggregate(list_sort(list_filter(
               string_split(q, '&'),
               x -> x <> '' AND NOT (split_part(x, '=', 1) LIKE 'utm_%'
                    OR split_part(x, '=', 1) IN ({tracked})))),
               'string_agg', '&'), '') AS qs
      FROM u4),
    u_canon AS (
      SELECT doc_id, u,
             sch || '://' || h2 || p2 ||
             CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canon_url
      FROM u5)"""
