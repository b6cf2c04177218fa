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
