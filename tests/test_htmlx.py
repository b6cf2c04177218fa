"""HTML extraction: skip subtrees, block segmentation, entity
round-trip, link accounting, tag-soup tolerance, and the Spark
kernel path."""

from __future__ import annotations

from ods_v3_dbt_spark.operators.htmlx import extract_text


def test_script_style_contribute_nothing():
    e = extract_text(
        "<p>keep</p><script>drop() < 1;</script><style>p{}</style>"
        "<noscript>gone</noscript><p>also keep</p>"
    )
    assert e["text"] == "keep\nalso keep"
    assert e["n_blocks"] == 2


def test_script_is_cdata_first_close_wins():
    """Spec behavior (html.parser matches browsers): script content
    is CDATA, so an apparent nested <script> does NOT nest — the
    FIRST </script> closes the element and what follows is ordinary
    content."""
    e = extract_text("<script>a<b><script>c</script>d</script><p>x</p>")
    assert e["text"] == "d\nx"


def test_blocks_normalize_whitespace_and_drop_empty():
    e = extract_text("<p>  a   b\t\nc </p><p>   </p><div></div><h1>t</h1>")
    assert e["text"] == "a b c\nt"
    assert e["n_blocks"] == 2


def test_entities_round_trip():
    e = extract_text("<title>A &amp; B</title><p>1 &lt; 2 &gt; 0</p>")
    assert e["title"] == "A & B"
    assert e["text"] == "1 < 2 > 0"


def test_link_accounting_and_density_fields():
    e = extract_text(
        "<nav><a href='/'>home</a> <a href='/x'>about  us</a></nav>"
        "<p>body text here</p>"
    )
    assert e["n_links"] == 2
    assert e["link_chars"] == len("home") + len("about us")
    assert e["text"] == "home about us\nbody text here"


def test_tag_soup_tolerance():
    # unclosed tags, stray closes, attributes with junk — html.parser
    # is tolerant; extraction must not raise and must keep the text
    e = extract_text("<p>one<p>two</div><a>three<br>four")
    assert "one" in e["text"] and "two" in e["text"] and "four" in e["text"]
    assert e["n_links"] == 1


def test_br_splits_blocks():
    e = extract_text("<p>a<br>b</p>")
    assert e["text"] == "a\nb"


def test_skipped_subtree_tags_are_inert():
    """Tags INSIDE noscript/template must not fire handlers: no
    n_links bump, no block split of the surrounding text (the
    round-3 advisor finding)."""
    e = extract_text(
        "<p>left <noscript><a href='/x'>x</a><p>mid</p></noscript>right</p>"
    )
    assert e["n_links"] == 0
    assert e["link_chars"] == 0
    assert e["text"] == "left right"
    assert e["n_blocks"] == 1
    t = extract_text(
        "<div>a<template><div>b</div><a>c</a><br></template>z</div>"
    )
    assert t["n_links"] == 0
    assert t["text"] == "az"
    # title inside a skipped subtree does not capture either
    s = extract_text("<noscript><title>shadow</title></noscript><title>real</title>")
    assert s["title"] == "real"


def test_whitespace_class_is_ascii_only():
    """NBSP/NEL are ordinary characters (the RE2/DuckDB '\\s' class),
    so the oracle's regexp_replace replays normalization exactly —
    Python's Unicode str.split() must NOT leak in."""
    e = extract_text("<p>a b</p><p>cd</p><p> x \t y </p>")
    assert e["text"] == "a b\ncd\nx y"
    # a block of ONLY Unicode whitespace is non-empty on both engines
    f = extract_text("<p> </p><p>k</p>")
    assert f["n_blocks"] == 2
    # link_chars uses the same class
    g = extract_text("<a>n m</a>")
    assert g["link_chars"] == len("n m")
    # vertical tab (U+000B) is NOT in RE2's \s — it must survive as
    # an ordinary character even though Python's own \s matches it
    v = extract_text("<p>m\x0bn</p>")
    assert v["text"] == "m\x0bn"


def test_html_extract_spark_kernel(spark):
    from ods_v3_dbt_spark.operators.htmlx import html_extract

    rows = [
        (1, "<title>T</title><p>hello</p><a href='/'>l</a>"),
        (2, "<p>only</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in html_extract(df).collect()}
    assert got[1].title == "T" and got[1].n_links == 1
    assert got[1].ok and got[2].text == "only"
