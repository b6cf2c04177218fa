"""HTML text extraction — the stage between crawl ingestion (WARC)
and text curation: turn raw HTML into clean block text plus the
structural quality signals extraction-based filters use (link
density is the classic boilerplate discriminator — jusText/
trafilatura-class heuristics), pure-stdlib (``html.parser``).

Extraction contract (deterministic, engine-replayable):
- ``script``/``style``/``noscript``/``template`` subtrees contribute
  NOTHING;
- ``title`` is captured separately, not part of body text;
- block boundaries at p, h1-h6, li, nav, div, section, article,
  header, footer, blockquote, pre, td, th, tr (open OR close), plus
  ``br``; a block's text is whitespace-normalized (runs collapsed to
  one space, ends stripped); EMPTY blocks are dropped; body text =
  non-empty blocks joined with ``\\n``;
- the whitespace class is ``[ \\t\\n\\r\\f]`` — exactly RE2/DuckDB's
  ``\\s`` (verified: RE2 ``\\s`` = ``[\\t\\n\\f\\r ]`` and does NOT
  include vertical tab U+000B, unlike Python's ASCII ``\\s`` and
  Java's), NOT Python's Unicode ``str.split()`` class: VT, NBSP
  (U+00A0), NEL (U+0085) etc. are ordinary characters, so the
  DuckDB oracle's ``regexp_replace(..., '\\s+', ' ', 'g')`` replays
  the normalization byte-for-byte;
- ``n_links`` counts ``<a>`` opens; ``link_chars`` counts the
  normalized text characters contributed INSIDE anchors (link
  density = link_chars / text length);
- character/entity references are decoded (``convert_charrefs``), so
  escaped markup round-trips to the original text.

Scale notes: extraction is per-document Python — an Arrow-batched
``mapInPandas`` kernel like the codecs, one pass, no driver contact,
malformed HTML degrades per-row (``html.parser`` is tolerant by
design; a pathological document yields ok=false, never a stage
crash). At 100 TB this runs immediately after the WARC HTTP split on
the same file-partitioned tasks — no extra shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame

#: The shared extraction/DuckDB whitespace run — RE2's '\s' class
#: [\t\n\f\r ], which excludes vertical tab (U+000B). Python
#: str.split() would also split on \v and Unicode whitespace (NBSP,
#: NEL), which RE2-based engines do not; one class, declared once.
_WS = re.compile(r"[ \t\n\r\f]+")


def _ws_norm(s: str) -> str:
    """Collapse RE2-whitespace runs to one space, strip ends."""
    return _WS.sub(" ", s).strip(" \t\n\r\f")


_SKIP = {"script", "style", "noscript", "template"}
_BLOCK = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "nav", "div",
    "section", "article", "header", "footer", "blockquote", "pre",
    "td", "th", "tr",
}

HTML_EXTRACT_SCHEMA = (
    "doc_id long, title string, text string, n_blocks int, "
    "n_links int, link_chars long, ok boolean, error string"
)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[str] = []
        self._buf: list[str] = []
        self.title = ""
        self.n_links = 0
        self.link_chars = 0
        self._skip_depth = 0
        self._in_title = False
        self._anchor_depth = 0

    def _flush(self) -> None:
        text = _ws_norm("".join(self._buf))
        self._buf = []
        if text:
            self.blocks.append(text)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP:
            self._skip_depth += 1
            return
        # Inside a skipped subtree NOTHING contributes: an anchor in
        # <noscript> must not bump n_links, and a block tag there
        # must not _flush() and split the surrounding block.
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = True
            return
        if tag == "a":
            self.n_links += 1
            self._anchor_depth += 1
        if tag in _BLOCK or tag == "br":
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "title":
            self._in_title = False
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self.title += data
            return
        self._buf.append(data)
        if self._anchor_depth:
            self.link_chars += len(_ws_norm(data))


def extract_text(html: str | bytes) -> dict:
    """Extract (title, text, n_blocks, n_links, link_chars) from an
    HTML document per the module contract."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", "replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    p._flush()
    return {
        "title": _ws_norm(p.title),
        "text": "\n".join(p.blocks),
        "n_blocks": len(p.blocks),
        "n_links": p.n_links,
        "link_chars": p.link_chars,
    }


def html_extract(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched extraction over a DataFrame of HTML payloads →
    one row per document with the extraction contract's fields;
    per-row ok=false degradation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "title", "text", "n_blocks", "n_links",
            "link_chars", "ok", "error",
        ]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                try:
                    e = extract_text(r[html_col])
                    out.append(
                        (
                            r[id_col], e["title"], e["text"], e["n_blocks"],
                            e["n_links"], e["link_chars"], True, None,
                        )
                    )
                except Exception as ex:  # html.parser is tolerant; belt+braces
                    out.append((r[id_col], None, None, 0, 0, 0, False, str(ex)))
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(run, schema=HTML_EXTRACT_SCHEMA)
