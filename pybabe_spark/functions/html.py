"""HTML → text extraction for web-crawl ingestion, pure codegen.

Beyond-reference capability: the first step of every common-crawl-style
training-data pipeline is stripping markup before quality scoring /
dedup (the reference's closest machinery is its charset cleanup,
pybabe/charset.py — this is the markup analogue). Real boilerplate
removal (trafilatura/jusText) needs a DOM; this is the regex tier that
covers the bulk of the win — script/style/comment removal, block-tag →
newline, tag strip, common entity decode, whitespace canonicalization —
expressed as a chain of JVM-side ``regexp_replace``/``replace`` calls:
zero Python, whole-stage codegen, linear per row.

Single source of truth: the pattern list below drives BOTH the Spark
Column expression and the DuckDB oracle SQL (``html_to_text_sql``), so
the cross-engine contract cannot drift. Patterns stay inside the
RE2 ∩ Java-regex common subset (no backreferences, no lookaround;
inline ``(?is)`` flags only), because DuckDB is RE2 and Spark is
``java.util.regex``.

Caveats (documented contract): numeric character references other than
the whitelisted named entities are left verbatim; malformed markup
(unclosed ``<script>``) strips to the end of the document like any
streaming extractor; CDATA is treated as text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, replacement) regexp passes, applied in order
_REGEX_PASSES: list[tuple[str, str]] = [
    # script/style/noscript/comment blocks drop with their CONTENT
    (r"(?is)<script\b[^>]*>.*?(</script>|$)", " "),
    (r"(?is)<style\b[^>]*>.*?(</style>|$)", " "),
    (r"(?is)<noscript\b[^>]*>.*?(</noscript>|$)", " "),
    (r"(?s)<!--.*?(-->|$)", " "),
    # block-level boundaries become newlines so paragraphs survive
    (
        r"(?i)<(?:br|hr|/?p|/?div|/?h[1-6]|/?li|/?tr|/?table|/?ul|/?ol"
        r"|/?blockquote|/?pre|/?section|/?article|/?header|/?footer"
        r"|/?form|/?title)\b[^>]*>",
        "\n",
    ),
    # every remaining tag vanishes
    (r"<[^>]*>", " "),
]

#: literal entity decodes (exact string replace, not regex), in order —
#: &amp; LAST so "&amp;lt;" decodes to "&lt;" (text), never to "<"
_ENTITY_PASSES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

#: whitespace canonicalization, after everything else
_WS_PASSES: list[tuple[str, str]] = [
    (r"[ \t\r\f]+", " "),          # runs of horizontal space → one
    (r" ?\n ?", "\n"),             # trim around newlines
    (r"\n{3,}", "\n\n"),           # ≥3 newlines → paragraph break
    (r"^\s+|\s+$", ""),            # full trim incl. newlines
]


def html_to_text(col: Column | str) -> Column:
    """Extract readable text from an HTML string column (module
    docstring for the exact passes). NULL in → NULL out; plain text
    passes through with only entity + whitespace canonicalization."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _REGEX_PASSES:
        c = F.regexp_replace(c, pat, rep)
    for lit, rep in _ENTITY_PASSES:
        c = F.replace(c, F.lit(lit), F.lit(rep))
    for pat, rep in _WS_PASSES:
        c = F.regexp_replace(c, pat, rep)
    return c


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def html_to_text_sql(expr: str) -> str:
    """DuckDB mirror of :func:`html_to_text` built from the SAME
    pattern tables (global flag added — DuckDB replaces first match by
    default; Spark replaces all)."""
    out = expr
    for pat, rep in _REGEX_PASSES:
        out = (
            f"regexp_replace({out}, {_sql_quote(pat)}, "
            f"{_sql_quote(rep)}, 'g')"
        )
    for lit, rep in _ENTITY_PASSES:
        out = f"replace({out}, {_sql_quote(lit)}, {_sql_quote(rep)})"
    for pat, rep in _WS_PASSES:
        out = (
            f"regexp_replace({out}, {_sql_quote(pat)}, "
            f"{_sql_quote(rep)}, 'g')"
        )
    return out
