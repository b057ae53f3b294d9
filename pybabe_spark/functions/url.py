"""URL parsing, canonicalization, and domain extraction — pure codegen.

Beyond-reference capability: crawl pipelines dedup and aggregate by
canonical URL / registrable domain before anything else touches the
text (URL-level exact dedup is the cheapest dedup tier; per-domain
quality stats drive source weighting). All expressions are JVM-side
regexp/array functions (whole-stage codegen, no Python), with DuckDB
oracle mirrors built from the SAME constants so the cross-engine
contract cannot drift (the functions/html.py pattern).

Semantics (documented contract):

- RFC-3986-shaped split via one regex; userinfo is not supported
  (treated as host text — crawl URLs with credentials are garbage
  anyway and normalize to themselves).
- ``normalize_url``: scheme+host lowercased, ``www.`` prefix dropped,
  default ports (http:80, https:443) dropped, empty path → ``/``,
  fragment dropped, tracking params (``utm_*`` and
  ``gclid/fbclid/msclkid/ref``) dropped, remaining query params
  sorted bytewise (param ORDER is normalized, values untouched),
  empty query dropped.
- ``registered_domain``: last two host labels, or last three when the
  second-to-last is a well-known second-level label (``co com net org
  org ac gov edu``, e.g. ``bbc.co.uk``). A heuristic, not the public
  suffix list — documented trade; plug the PSL in by swapping
  ``_SLD_LABELS`` for a broadcast lookup when exactness matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: RFC-3986 splitter (scheme, authority, path, query, fragment)
_URL_RE = (
    r"^(?:([a-zA-Z][a-zA-Z0-9+.-]*):)?(?://([^/?#]*))?"
    r"([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"
)

#: exact-name tracking params dropped by normalize_url
_TRACKING = ("gclid", "fbclid", "msclkid", "ref")

#: second-level labels that take three-label registered domains
_SLD_LABELS = ("co", "com", "net", "org", "ac", "gov", "edu")

_DEFAULT_PORTS = (("http", "80"), ("https", "443"))


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_parts(col: Column | str) -> Column:
    """Struct (scheme, host, port, path, query, fragment) — raw split,
    no normalization; absent pieces are empty strings (regexp_extract
    convention)."""
    u = _c(col)
    auth = F.regexp_extract(u, _URL_RE, 2)
    return F.struct(
        F.regexp_extract(u, _URL_RE, 1).alias("scheme"),
        F.regexp_extract(auth, r"^([^:]*)", 1).alias("host"),
        F.regexp_extract(auth, r":([0-9]+)$", 1).alias("port"),
        F.regexp_extract(u, _URL_RE, 3).alias("path"),
        F.regexp_extract(u, _URL_RE, 4).alias("query"),
        F.regexp_extract(u, _URL_RE, 5).alias("fragment"),
    )


def _canon_host(host: Column) -> Column:
    return F.regexp_replace(F.lower(host), r"^www\.", "")


def host_of(col: Column | str) -> Column:
    """Lowercased host with any ``www.`` prefix removed."""
    return _canon_host(url_parts(col)["host"])


def registered_domain(col: Column | str) -> Column:
    """Registrable-domain heuristic over :func:`host_of` (module
    docstring): ``a.b.bbc.co.uk`` → ``bbc.co.uk``; ``x.example.com`` →
    ``example.com``; bare or 2-label hosts pass through."""
    h = host_of(col)
    sld = "|".join(_SLD_LABELS)
    three = F.regexp_extract(
        h, rf"([^.]+\.(?:{sld})\.[^.]+)$", 1
    )
    two = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    return F.when(three != "", three).when(two != "", two).otherwise(h)


def _clean_query(q: Column) -> Column:
    def keep(x: Column) -> Column:
        name = F.split(x, "=").getItem(0)
        return (
            (x != "")
            & ~name.startswith("utm_")
            & ~name.isin(*_TRACKING)
        )

    return F.array_join(F.array_sort(F.filter(F.split(q, "&"), keep)), "&")


def normalize_url(col: Column | str) -> Column:
    """Canonical URL (module docstring for the exact rules). NULL in →
    NULL out; scheme-less input normalizes its other pieces."""
    p = url_parts(col)
    scheme = F.lower(p["scheme"])
    host = _canon_host(p["host"])
    port = p["port"]
    drop_port = F.lit(False)
    for s, d in _DEFAULT_PORTS:
        drop_port = drop_port | ((scheme == s) & (port == d))
    port_part = F.when(
        (port != "") & ~drop_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    q = _clean_query(p["query"])
    q_part = F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    scheme_part = F.when(
        scheme != "", F.concat(scheme, F.lit("://"))
    ).otherwise(F.lit(""))
    return F.concat(scheme_part, host, port_part, path, q_part)


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors — built from the SAME constants
# ---------------------------------------------------------------------------

def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_part(expr: str, group: int) -> str:
    return f"regexp_extract({expr}, {_q(_URL_RE)}, {group})"


def _sql_host(expr: str) -> str:
    auth = _sql_part(expr, 2)
    host = f"regexp_extract({auth}, '^([^:]*)', 1)"
    return f"regexp_replace(lower({host}), '^www\\.', '')"


def host_of_sql(expr: str) -> str:
    return _sql_host(expr)


def registered_domain_sql(expr: str) -> str:
    sld = "|".join(_SLD_LABELS)
    h = _sql_host(expr)
    three = f"regexp_extract({h}, '([^.]+\\.(?:{sld})\\.[^.]+)$', 1)"
    two = f"regexp_extract({h}, '([^.]+\\.[^.]+)$', 1)"
    return (
        f"CASE WHEN {three} <> '' THEN {three} "
        f"WHEN {two} <> '' THEN {two} ELSE {h} END"
    )


def normalize_url_sql(expr: str) -> str:
    scheme = f"lower({_sql_part(expr, 1)})"
    auth = _sql_part(expr, 2)
    host = _sql_host(expr)
    port = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    drop = " OR ".join(
        f"({scheme} = {_q(s)} AND {port} = {_q(d)})"
        for s, d in _DEFAULT_PORTS
    )
    path = _sql_part(expr, 3)
    tracking = ", ".join(_q(t) for t in _TRACKING)
    q = (
        "array_to_string(list_sort(list_filter("
        f"string_split({_sql_part(expr, 4)}, '&'), "
        "x -> x <> '' AND NOT starts_with(string_split(x, '=')[1], 'utm_')"
        f" AND string_split(x, '=')[1] NOT IN ({tracking}))), '&')"
    )
    return (
        f"(CASE WHEN {scheme} <> '' THEN {scheme} || '://' ELSE '' END)"
        f" || {host}"
        f" || (CASE WHEN {port} <> '' AND NOT ({drop})"
        f"      THEN ':' || {port} ELSE '' END)"
        f" || (CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
        f" || (CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END)"
    )
