"""URL canonicalization: golden outputs + cross-engine agreement
(Spark expressions and DuckDB mirrors share their constants)."""

import duckdb

from pybabe_spark.functions.url import (
    host_of,
    host_of_sql,
    normalize_url,
    normalize_url_sql,
    registered_domain,
    registered_domain_sql,
    url_parts,
)

URLS = [
    "https://WWW.Example.COM:443/path/to/page?utm_source=x&b=2&a=1#frag",
    "http://example.com:80/",
    "http://example.com:8080/x",
    "HTTP://Sub.Example.Co.Uk/path?gclid=123&z=9&y=8",
    "https://bbc.co.uk",
    "ftp://files.example.net:21/pub",
    "example.com/no-scheme?ref=abc",
    "https://a.b.c.example.ac.jp/deep?fbclid=1",
    "http://localhost/x?a=1&a=0",
    "",
    None,
]

GOLDEN_NORM = [
    "https://example.com/path/to/page?a=1&b=2",
    "http://example.com/",
    "http://example.com:8080/x",
    "http://sub.example.co.uk/path?y=8&z=9",
    "https://bbc.co.uk/",
    "ftp://files.example.net:21/pub",
    "example.com/no-scheme",
    "https://a.b.c.example.ac.jp/deep",
    "http://localhost/x?a=0&a=1",
    "/",
    None,
]

GOLDEN_DOMAIN = [
    "example.com",
    "example.com",
    "example.com",
    "example.co.uk",
    "bbc.co.uk",
    "example.net",
    "",  # scheme-less: RFC-3986 parses "example.com/…" as PATH, no host
    "example.ac.jp",
    "localhost",
    "",
    None,
]


def _spark_col(spark, expr_fn):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(URLS)], "i int, u string"
    )
    return {
        r["i"]: r["v"]
        for r in df.select("i", expr_fn("u").alias("v")).collect()
    }


def test_normalize_url_golden(spark):
    got = _spark_col(spark, normalize_url)
    for i, want in enumerate(GOLDEN_NORM):
        assert got[i] == want, f"{URLS[i]!r}: {got[i]!r} != {want!r}"


def test_registered_domain_golden(spark):
    got = _spark_col(spark, registered_domain)
    for i, want in enumerate(GOLDEN_DOMAIN):
        assert got[i] == want, f"{URLS[i]!r}: {got[i]!r} != {want!r}"


def test_cross_engine_agreement(spark):
    con = duckdb.connect()
    for fn, sql_fn in [
        (normalize_url, normalize_url_sql),
        (registered_domain, registered_domain_sql),
        (host_of, host_of_sql),
    ]:
        got = _spark_col(spark, fn)
        sql = (
            "select " + sql_fn("u") + " as v"
            " from (select ?::varchar as u)"
        )
        for i, u in enumerate(URLS):
            want = con.execute(sql, [u]).fetchone()[0]
            assert got[i] == want, (
                f"{fn.__name__}({u!r}): spark {got[i]!r} != duck {want!r}"
            )


def test_url_parts_fields(spark):
    df = spark.createDataFrame([(URLS[0],)], "u string")
    p = df.select(url_parts("u").alias("p")).collect()[0]["p"]
    assert p["scheme"] == "https"
    assert p["host"] == "WWW.Example.COM"
    assert p["port"] == "443"
    assert p["path"] == "/path/to/page"
    assert p["query"] == "utm_source=x&b=2&a=1"
    assert p["fragment"] == "frag"


def test_codegen_only(spark):
    df = spark.createDataFrame([("https://x.com/a",)], "u string")
    plan = (
        df.select(normalize_url("u").alias("n"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
