"""HTML → text extraction: golden outputs + cross-engine agreement
(the Spark expression and the DuckDB oracle SQL are generated from one
pattern table — these tests pin that the shared-pattern contract holds
on adversarial markup)."""

import duckdb
import pytest

from pybabe_spark.functions.html import html_to_text, html_to_text_sql

CASES = [
    (
        '<html><head><script>var x = "<p>hi</p>";</script>'
        "<style>a{color:red}</style></head><body><h1>Title</h1>"
        "<p>Hello <b>world</b>&nbsp;&amp; friends.</p>"
        "<ul><li>one</li><li>two</li></ul><!-- secret --></body></html>",
        "Title\n\nHello world & friends.\n\none\n\ntwo",
    ),
    (
        "plain text, no markup &amp;amp; stays &lt;tagged&gt;",
        "plain text, no markup &amp; stays <tagged>",
    ),
    ("<div>unclosed <script>alert(1); rest is gone", "unclosed"),
    ("a  b\t\tc\r\nd\n\n\n\ne", "a b c\nd\n\ne"),
    ("<P CLASS=\"x\">UPPER</P><BR><Br/>tail", "UPPER\n\ntail"),
    ("", ""),
    (None, None),
    ("<td>cells</td><tr>rows</tr>&quot;q&quot;&#39;s&apos;", 'cells\nrows\n"q"\'s\''),
]


def test_golden_extraction(spark):
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(CASES)], "i int, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text("h").alias("t")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_cross_engine_agreement(spark):
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(CASES)], "i int, h string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text("h").alias("t")).collect()
    }
    con = duckdb.connect()
    sql = "select " + html_to_text_sql("?::varchar") + " as t"
    for i, (c, _) in enumerate(CASES):
        want = con.execute(sql, [c]).fetchone()[0]
        assert got[i] == want, f"case {i}: spark {got[i]!r} != duck {want!r}"


def test_entity_double_encoding_is_not_over_decoded(spark):
    # "&amp;lt;" means the TEXT "&lt;" — one decode round only, never "<"
    df = spark.createDataFrame([("&amp;lt;b&amp;gt;",)], "h string")
    assert df.select(html_to_text("h").alias("t")).collect()[0]["t"] == "&lt;b&gt;"


def test_codegen_only(spark):
    # the whole extraction must stay JVM-side: no Python workers in plan
    df = spark.createDataFrame([("<p>x</p>",)], "h string")
    plan = df.select(html_to_text("h").alias("t"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
