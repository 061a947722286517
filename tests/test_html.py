"""HTML → text extraction (functions/html.py).

Pins: block-content removal, break-tag line structure, entity decoding
(codegen chain vs the exact stdlib tier), title/link extraction, plain
text passthrough, NULL handling, and the map-only plan contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.functions.html import (
    decode_entities,
    decode_entities_exact,
    extract_links,
    extract_title,
    html_to_text,
)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("html")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _one(spark, html, expr):
    return (
        spark.createDataFrame([(html,)], "h string")
        .select(expr(F.col("h")).alias("v"))
        .first()["v"]
    )


PAGE = """<!DOCTYPE html><html><head><title> My &amp; Your  Page </title>
<style>body { color: red; }</style></head>
<body><!-- nav below -->
<script type="text/javascript">var x = "<p>not text</p>";</script>
<h1>Heading</h1>
<p>First paragraph with <b>bold</b> and a <a href="https://a.com/x?id=1#frag">link</a>.</p>
<p>Caf&eacute; costs &lt;5&nbsp;&euro;&#33;</p>
<div><ul><li>item one</li><li>item two</li></ul></div>
</body></html>"""


def test_html_to_text_structure_and_blocks(spark):
    txt = _one(spark, PAGE, html_to_text)
    assert "color: red" not in txt and "var x" not in txt  # block content gone
    assert "not text" not in txt  # script content INCLUDING its fake tags
    assert "nav below" not in txt  # comments gone
    lines = txt.split("\n")
    assert "Heading" in lines
    assert any(l.startswith("First paragraph with bold and a link") for l in lines)
    assert "item one" in lines and "item two" in lines
    # codegen chain leaves the uncommon &eacute;/&euro;, decodes the common set
    assert "<5 " in txt
    # no triple blank lines, no leading/trailing newline
    assert "\n\n\n" not in txt and txt == txt.strip("\n")


def test_html_to_text_exact_entities(spark):
    txt = _one(spark, PAGE, lambda c: html_to_text(c, exact_entities=True))
    assert "Café costs <5 €!" in txt.replace(" ", " ")


def test_plain_text_passthrough(spark):
    plain = "no markup here\n\njust two paragraphs."
    assert _one(spark, plain, html_to_text) == plain


def test_decode_entities_double_escape_one_level(spark):
    # &amp;lt; is an ESCAPED "&lt;" — must decode to "&lt;", not "<"
    assert _one(spark, "&amp;lt;", decode_entities) == "&lt;"
    assert _one(spark, "&amp;lt;", decode_entities_exact) == "&lt;"


def test_exact_tier_matches_stdlib_and_nulls(spark):
    import html as _html

    samples = ["&#72;&#x69; &sum; &notareal;", "a &amp; b", None]
    df = spark.createDataFrame([(s,) for s in samples], "h string")
    got = [r["v"] for r in df.select(decode_entities_exact(F.col("h")).alias("v")).collect()]
    assert got == [_html.unescape(s) if s is not None else None for s in samples]


def test_extract_title_and_links(spark):
    assert _one(spark, PAGE, extract_title) == "My & Your Page"
    assert _one(spark, "<body>no title</body>", extract_title) == ""
    links = _one(
        spark,
        PAGE + "<a href='http://b.org/y'>two</a><a href=\"#skip\">x</a>",
        extract_links,
    )
    assert links == ["https://a.com/x?id=1", "http://b.org/y"]


def test_map_only_plan(spark):
    df = spark.createDataFrame([(PAGE,)], "h string")
    plan = (
        df.select(html_to_text(F.col("h")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
