"""Row enrichment: user-agent parsing and IP geolocation.

Reference: pybabe/user_agent.py:14-34 (httpagentparser → os/browser/
version) and pybabe/geoip.py:26-79 (MaxMind lookup → country/region/
city/lat/lon). Spark-first re-design:

- ``user_agent``: pure ``regexp_extract`` chains — stays in codegen,
  no UDF, no per-executor library state.
- ``geoip``: an IP-*range table* broadcast join (range lookup), the
  distributed-native formulation of "binary search in a .dat file".
  Load real MaxMind/GeoLite CSV ranges via ``load_ip_ranges``; a tiny
  deterministic built-in table serves tests and environments without
  the database (clearly a stub dataset, not a stub code path — the
  join plumbing is the real one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# user agent
# ---------------------------------------------------------------------------

_OS_PATTERNS = [
    ("Windows", "Windows NT [0-9.]+|Windows"),
    ("Android", "Android"),           # before Linux (Android UAs contain Linux)
    ("iOS", "iPhone OS|iPad|CPU OS"),
    ("Mac OS", "Mac OS X"),
    ("Linux", "Linux"),
]

_BROWSER_PATTERNS = [
    # order matters: Edge/Chrome UAs contain Safari; Chrome contains Safari
    ("Edge", "Edg(?:e|A|iOS)?/([0-9.]+)"),
    ("Chrome", "Chrome/([0-9.]+)"),
    ("Firefox", "Firefox/([0-9.]+)"),
    ("Safari", "Version/([0-9.]+).*Safari"),
    ("MSIE", "MSIE ([0-9.]+)"),
]


def ua_os(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(None).cast("string")
    for name, pat in reversed(_OS_PATTERNS):
        expr = F.when(c.rlike(pat), F.lit(name)).otherwise(expr)
    return expr


def ua_browser(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(None).cast("string")
    for name, pat in reversed(_BROWSER_PATTERNS):
        expr = F.when(c.rlike(pat), F.lit(name)).otherwise(expr)
    return expr


def ua_browser_version(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(None).cast("string")
    for _, pat in reversed(_BROWSER_PATTERNS):
        v = F.regexp_extract(c, pat, 1)
        expr = F.when(c.rlike(pat), v).otherwise(expr)
    return expr


def user_agent(
    df: DataFrame,
    field: str,
    output_os: str = "os",
    output_browser: str = "browser",
    output_browser_version: str = "browser_version",
) -> DataFrame:
    """UA string → os / browser / version (pybabe/user_agent.py:14-34)."""
    return (
        df.withColumn(output_os, ua_os(field))
        .withColumn(output_browser, ua_browser(field))
        .withColumn(output_browser_version, ua_browser_version(field))
    )


# ---------------------------------------------------------------------------
# geoip
# ---------------------------------------------------------------------------

#: Deterministic built-in range table (stub *dataset*): (start, end,
#: country_code, region, city, lat, lon) over the 32-bit IPv4 space.
BUILTIN_IP_RANGES = [
    (0x01000000, 0x1FFFFFFF, "US", "CA", "San Francisco", 37.77, -122.42),
    (0x20000000, 0x3FFFFFFF, "US", "NY", "New York", 40.71, -74.01),
    (0x40000000, 0x5FFFFFFF, "FR", "IDF", "Paris", 48.86, 2.35),
    (0x60000000, 0x7FFFFFFF, "DE", "BE", "Berlin", 52.52, 13.41),
    (0x80000000, 0x9FFFFFFF, "JP", "13", "Tokyo", 35.68, 139.69),
    (0xA0000000, 0xBFFFFFFF, "BR", "SP", "Sao Paulo", -23.55, -46.63),
    (0xC0000000, 0xDFFFFFFF, "IN", "MH", "Mumbai", 19.08, 72.88),
    (0xE0000000, 0xFFFFFFFF, "AU", "NSW", "Sydney", -33.87, 151.21),
]

_RANGE_SCHEMA = "ip_start bigint, ip_end bigint, country_code string, region string, city string, latitude double, longitude double"


def builtin_ip_ranges(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(BUILTIN_IP_RANGES, _RANGE_SCHEMA)


def load_ip_ranges(spark: SparkSession, path: str) -> DataFrame:
    """Load a GeoLite2-style CSV (network start/end int + location cols)."""
    return spark.read.csv(path, header=True, inferSchema=True).toDF(
        *_RANGE_SCHEMA.replace(" bigint", "").replace(" string", "")
        .replace(" double", "").split(", ")
    )


_IPV4_OCTET = "(25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])"
_IPV4_RE = f"^{_IPV4_OCTET}(\\.{_IPV4_OCTET}){{3}}$"


def ip_to_int(col: Column | str) -> Column:
    """Dotted-quad IPv4 string → 32-bit integer (codegen arithmetic);
    malformed IPs → NULL. The arithmetic is gated behind a full-format
    rlike — under Spark 4's default ANSI mode an unguarded cast of a
    non-numeric octet (or an index into a short split) would ABORT the
    job on the first bad log line instead of nulling it."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.split(c, "\\.")
    return F.when(
        c.rlike(_IPV4_RE),
        p[0].cast("bigint") * F.lit(16777216)
        + p[1].cast("bigint") * F.lit(65536)
        + p[2].cast("bigint") * F.lit(256)
        + p[3].cast("bigint"),
    )



#: /16 prefix bucketing for the range join: a range [start, end] lands
#: in every bucket floor(start/2^16)..floor(end/2^16) (GeoLite2-style
#: networks rarely span more than one), and a probe IP joins only its
#: own bucket's copies — the O(rows x ALL ranges) nested loop becomes a
#: hash equi-join on the bucket with the BETWEEN as a join filter.
_IP_BUCKET = 65536


def _range_lookup(
    probe: DataFrame, r: DataFrame, how: str, bucketize: bool = True
) -> DataFrame:
    """probe (carrying __ip_int) joined to DISJOINT ip ranges via the
    bucketed broadcast hash join. Disjointness guarantees at most one
    match per IP, and the per-range bucket replicas cannot duplicate a
    match because each IP joins exactly its own bucket's replica.

    ``bucketize=False`` keeps the plain broadcast nested-loop BETWEEN
    join — see the tiny-table trade note on :func:`geoip`."""
    if not bucketize:
        out = probe.join(
            F.broadcast(r),
            (F.col("__ip_int") >= F.col("ip_start"))
            & (F.col("__ip_int") <= F.col("ip_end")),
            how,
        )
        return out.drop("__ip_int", "ip_start", "ip_end")
    br = _bucketized_ranges(r).withColumnRenamed("__ipb", "__rpb")
    probe = probe.withColumn(
        "__ipb", (F.col("__ip_int") / _IP_BUCKET).cast("bigint")
    )
    out = probe.join(
        F.broadcast(br),
        (F.col("__ipb") == F.col("__rpb"))
        & (F.col("__ip_int") >= F.col("ip_start"))
        & (F.col("__ip_int") <= F.col("ip_end")),
        how,
    )
    return out.drop("__ipb", "__rpb", "__ip_int", "ip_start", "ip_end")


def _bucketized_ranges(r: DataFrame) -> DataFrame:
    """One replica of each range per /16 bucket it overlaps.

    PRECONDITION (documented contract): ranges are narrow — real
    registry data (GeoLite2-style) allocates networks that rarely span
    more than one /16, so the explode adds ~0–1 extra rows per range.
    The replication is unbounded by construction: a pathological
    user-supplied range like 0.0.0.0–255.255.255.255 replicates into
    65,536 broadcast rows. Feeding tables with ranges that span many
    /16s is misuse of this path — pass ``bucketize=False`` to
    :func:`geoip` / :func:`geoip_country_code` for such tables and take
    the nested-loop join instead (correct for any ranges, linear in
    ranges-per-row)."""
    return r.withColumn(
        "__ipb",
        F.explode(
            F.sequence(
                (F.col("ip_start") / _IP_BUCKET).cast("bigint"),
                (F.col("ip_end") / _IP_BUCKET).cast("bigint"),
            )
        ),
    )


def geoip(
    df: DataFrame,
    field: str = "ip",
    ranges: DataFrame | None = None,
    ignore_error: bool = True,
    bucketize: bool = True,
) -> DataFrame:
    """IP → country_code, region, city, latitude, longitude
    (pybabe/geoip.py:26-53): broadcast range join.

    The ranges table is broadcast (GeoLite2 is ~10 MB — well under the
    threshold) bucketed by /16 prefix, so the probe side runs a hash
    EQUI-join on the bucket with the BETWEEN as a join filter — per-row
    work is the handful of ranges in the IP's own bucket, not ALL
    ranges (the nested-loop shape scans the full ~3M-network GeoLite2
    table per row at real scale). Non-matching / malformed IPs get
    NULLs when ``ignore_error`` (reference errors→NULLs behavior), else
    are dropped.

    Tiny-table trade: bucketizing pays a fixed cost (replica explode +
    equi-join machinery) that only amortizes once the ranges table has
    enough rows for the per-row nested-loop scan to dominate — with a
    ~20-row table the nested loop is measurably faster at small scale
    (≈0.3 s at sf0.1). ``bucketize=False`` selects that nested-loop
    form; it is also REQUIRED for range tables violating the
    narrow-range precondition of the bucketed path (ranges spanning
    many /16s — see :func:`_bucketized_ranges`). Default stays the
    bucketed join: it is the only shape that survives the real ~3M-row
    registry at 100 TB probe scale.
    """
    spark = df.sparkSession
    r = ranges if ranges is not None else builtin_ip_ranges(spark)
    probe = df.withColumn("__ip_int", ip_to_int(field))
    how = "left" if ignore_error else "inner"
    return _range_lookup(probe, r, how, bucketize)


def geoip_country_code(
    df: DataFrame,
    field: str = "ip",
    output: str = "country_code",
    ranges: DataFrame | None = None,
    bucketize: bool = True,
) -> DataFrame:
    """IP → country code only (pybabe/geoip.py:55-79); same bucketed
    equi-join as :func:`geoip` (and the same ``bucketize=False``
    tiny-table / wide-range escape)."""
    spark = df.sparkSession
    r = ranges if ranges is not None else builtin_ip_ranges(spark)
    r = r.select("ip_start", "ip_end", F.col("country_code").alias(output))
    probe = df.withColumn("__ip_int", ip_to_int(field))
    return _range_lookup(probe, r, "left", bucketize)


def _cp1252_fold_tables() -> tuple[str, str]:
    """(from, to) for translate(): each cp1252-specific graphic char →
    the C1 code point of the byte it decoded from."""
    src, dst = [], []
    for b in range(0x80, 0xA0):
        try:
            ch = bytes([b]).decode("cp1252")
        except UnicodeDecodeError:
            continue
        src.append(ch)
        dst.append(chr(b))
    return "".join(src), "".join(dst)


_CP1252_FROM, _CP1252_TO = _cp1252_fold_tables()


def utf8_cleanup(col) -> Column:
    """Repair UTF-8-read-as-latin1 mojibake ("CafÃ©" → "Café").

    Reference behavior: pybabe/charset.py:23-35 (UTF8RecoderWithCleanup,
    backed by the encoding_cleaner map table). Spark-first form: the exact
    inverse transform — re-encode the text as latin-1 bytes and decode
    them as UTF-8 — entirely JVM-side. Guarded twice: applied only to
    strings showing mojibake lead characters (Â/Ã/â...), and kept only
    when the repair round-trips without U+FFFD replacement characters
    (i.e. the bytes really were double-encoded UTF-8).
    """
    c = F.col(col) if isinstance(col, str) else col
    looks_double_encoded = c.rlike("[ÂÃâ]")
    # Text mangled through cp1252 (the common case: "donâ€™t") contains
    # the cp1252-specific graphics (€ ™ ’ …) whose code points are NOT
    # ≤ 0xFF; fold them back to their byte-equivalent C1 code points
    # with translate() so ONE latin-1 re-encode covers latin-1 and
    # cp1252 mojibake alike (Spark 4 whitelists encode charsets — no
    # windows-1252 — and THROWS on unmappable chars, so the encode is
    # additionally gated on every char being ≤ 0xFF after the fold).
    normalized = F.translate(c, _CP1252_FROM, _CP1252_TO)
    encode_safe = normalized.rlike("^[\\x00-\\xff]*$")
    as_latin1 = F.encode(normalized, "ISO-8859-1")
    # decode() throws on malformed bytes — gate it behind is_valid_utf8 so
    # the branch only evaluates when the bytes really are UTF-8
    return F.when(
        looks_double_encoded & encode_safe & F.is_valid_utf8(as_latin1),
        F.decode(as_latin1, "UTF-8"),
    ).otherwise(c)


# ---------------------------------------------------------------------------
# URL parsing (log-processing enrichment)
# ---------------------------------------------------------------------------

#: Regexes shared verbatim with the SQL oracle (both engines run the
#: same extraction, so parity is by construction — Spark's parse_url
#: would need a DuckDB twin that doesn't exist).
URL_PATTERNS: dict[str, str] = {
    "protocol": r"^([a-zA-Z][a-zA-Z0-9+.-]*)://",
    "host": r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)",
    "path": r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)",
    "query": r"\?([^#]*)",
}


def url_parse(col: Column | str) -> Column:
    """Struct(protocol, host, path, query) extracted from a URL string.

    Pure regexp_extract chain (codegen, reference analogue: the
    kontagent log parser's request-line split, pybabe/kontagent.py).
    Missing components come back as empty strings, matching
    regexp_extract's no-match contract in both Spark and DuckDB.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.regexp_extract(c, URL_PATTERNS["protocol"], 1).alias("protocol"),
        F.regexp_extract(c, URL_PATTERNS["host"], 1).alias("host"),
        F.regexp_extract(c, URL_PATTERNS["path"], 1).alias("path"),
        F.regexp_extract(c, URL_PATTERNS["query"], 1).alias("query"),
    )


def url_param(col: Column | str, name: str) -> Column:
    """Value of one query parameter (empty string when absent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, rf"[?&]{name}=([^&#]*)", 1)


def pseudonymize(
    df,
    cols,
    salt: str,
    prefix_len: int = 16,
):
    """GDPR-style column pseudonymization: replace each named column
    with the ``prefix_len``-hex-char md5 of ``salt || ':' || value``
    (NULL stays NULL). Deterministic — equal values map to equal
    tokens, so joins/group-bys on the pseudonym still work — and
    one-way for the pipeline (recovery requires the salt AND a
    dictionary attack; rotate the salt to unlink datasets). Pure
    codegen projection; the complement of functions/text.pii_scrub
    (which redacts inside free text — this tokenizes whole key
    columns)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    if not 4 <= int(prefix_len) <= 32:
        raise ValueError("pseudonymize: prefix_len must be 4..32")
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{salt}:"), F.col(c).cast("string")
                        )
                    ),
                    1,
                    int(prefix_len),
                ),
            ),
        )
    return out


def pseudonymize_sql(col: str, salt: str, prefix_len: int = 16) -> str:
    """DuckDB oracle expression for one pseudonymized column."""
    q = salt.replace("'", "''")
    return (
        f"CASE WHEN {col} IS NOT NULL THEN substr(md5('{q}:' || "
        f"CAST({col} AS VARCHAR)), 1, {int(prefix_len)}) END"
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: "list[str]",
    k: int = 10,
) -> DataFrame:
    """Privacy re-identification audit — the k-anonymity check that
    belongs next to :func:`pseudonymize`/PII scrubbing before any
    dataset leaves the boundary: ONE summary row over the
    quasi-identifier combination ``quasi_cols``:

    - ``n_rows`` / ``n_groups`` — population and distinct QI tuples
    - ``min_group_size`` — the dataset's achieved k (0 when empty)
    - ``risky_groups`` / ``risky_rows`` — equivalence classes (and the
      rows inside them) smaller than ``k``, i.e. re-identifiable
    - ``risky_rows_ppm`` — risky share, exact integral ppm

    NULL is a legitimate QI value (an attacker sees the blank too), so
    groups are formed NULL-safely over all rows. The dataset is
    k-anonymous over these columns iff ``risky_rows == 0``.

    Scale shape: one map-side-combinable hash agg to the QI group
    table, one 1-row agg over it — the profile idiom; nothing is
    collected, no window.
    """
    if k < 2:
        raise ValueError(f"k_anonymity: k {k} must be >= 2")
    if not quasi_cols:
        raise ValueError("k_anonymity: quasi_cols must be non-empty")
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__sz")
    )
    risky = F.col("__sz") < k
    out = groups.agg(
        F.coalesce(F.sum("__sz"), F.lit(0)).cast("bigint").alias(
            "n_rows"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.coalesce(F.min("__sz"), F.lit(0)).cast("bigint").alias(
            "min_group_size"
        ),
        F.coalesce(F.sum(risky.cast("bigint")), F.lit(0)).cast(
            "bigint"
        ).alias("risky_groups"),
        F.coalesce(F.sum(F.when(risky, F.col("__sz"))), F.lit(0)).cast(
            "bigint"
        ).alias("risky_rows"),
    )
    return out.withColumn(
        "risky_rows_ppm",
        F.when(F.col("n_rows") > 0, F.expr(
            "CAST(risky_rows * 1000000 div n_rows AS BIGINT)"
        )).otherwise(F.lit(0).cast("bigint")),
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: "list[str]",
    sensitive_col: str,
    l: int = 2,  # noqa: E741
) -> DataFrame:
    """l-diversity audit — the companion :func:`k_anonymity` misses:
    a group can be large (k-anonymous) yet leak the SENSITIVE
    attribute outright when every member shares one value (the
    homogeneity attack). ONE summary row over the quasi-identifier
    combination:

    - ``n_rows`` / ``n_groups`` — population and distinct QI tuples
    - ``min_distinct_sensitive`` — the dataset's achieved l (0 empty)
    - ``risky_groups`` / ``risky_rows`` — equivalence classes (and
      their rows) with fewer than ``l`` distinct sensitive values
    - ``risky_rows_ppm`` — risky share, exact integral ppm

    NULL is a value on BOTH sides: a blank QI cell is visible to the
    attacker, and a blank sensitive cell is still a disclosure class —
    distinct counts include the NULL bucket (``COUNT(DISTINCT s) +
    [any NULL present]``, identical shape in the oracle). The dataset
    is (distinct-)l-diverse over these columns iff ``risky_rows == 0``.

    Scale shape: one hash agg to the (QI, sensitive) grain, one to the
    QI grain, one 1-row agg — no window, nothing collected; the
    distinct count never rides a shuffle wider than the cell table.
    """
    if l < 2:
        raise ValueError(f"l_diversity: l {l} must be >= 2")
    if not quasi_cols:
        raise ValueError("l_diversity: quasi_cols must be non-empty")
    if sensitive_col in quasi_cols:
        raise ValueError(
            "l_diversity: sensitive_col must not be a quasi-identifier"
        )
    cells = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("__s")
    ).agg(F.count(F.lit(1)).alias("__sz"))
    groups = cells.groupBy(*quasi_cols).agg(
        F.sum("__sz").alias("__n"),
        (
            F.count(F.when(F.col("__s").isNotNull(), F.lit(1)))
            + F.max(F.when(F.col("__s").isNull(), 1).otherwise(0))
        ).alias("__d"),
    )
    risky = F.col("__d") < l
    out = groups.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.coalesce(F.min("__d"), F.lit(0)).cast("bigint").alias(
            "min_distinct_sensitive"
        ),
        F.coalesce(F.sum(risky.cast("bigint")), F.lit(0)).cast(
            "bigint"
        ).alias("risky_groups"),
        F.coalesce(F.sum(F.when(risky, F.col("__n"))), F.lit(0)).cast(
            "bigint"
        ).alias("risky_rows"),
    )
    return out.withColumn(
        "risky_rows_ppm",
        F.when(F.col("n_rows") > 0, F.expr(
            "CAST(risky_rows * 1000000 div n_rows AS BIGINT)"
        )).otherwise(F.lit(0).cast("bigint")),
    )


def l_diversity_sql(
    table: str,
    quasi_cols: "list[str]",
    sensitive_col: str,
    l: int = 2,  # noqa: E741
) -> str:
    """DuckDB oracle of :func:`l_diversity` — same two-level
    aggregation, same NULL-inclusive distinct count, same ppm."""
    qi = ", ".join(quasi_cols)
    s = sensitive_col
    return f"""
    WITH cells AS (
        SELECT {qi}, {s} AS s, COUNT(*) AS sz
        FROM {table} GROUP BY {qi}, {s}
    ),
    groups AS (
        SELECT {qi}, SUM(sz) AS n,
               COUNT(CASE WHEN s IS NOT NULL THEN 1 END)
                 + MAX(CASE WHEN s IS NULL THEN 1 ELSE 0 END) AS d
        FROM cells GROUP BY {qi}
    ),
    agg AS (
        SELECT COALESCE(CAST(SUM(n) AS BIGINT), 0) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               COALESCE(CAST(MIN(d) AS BIGINT), 0)
                 AS min_distinct_sensitive,
               COALESCE(CAST(SUM(CASE WHEN d < {int(l)} THEN 1 END)
                        AS BIGINT), 0) AS risky_groups,
               COALESCE(CAST(SUM(CASE WHEN d < {int(l)} THEN n END)
                        AS BIGINT), 0) AS risky_rows
        FROM groups
    )
    SELECT *,
           CASE WHEN n_rows > 0 THEN
             CAST((risky_rows * 1000000) // n_rows AS BIGINT)
           ELSE 0 END AS risky_rows_ppm
    FROM agg
    """


def k_anonymity_sql(
    table: str, quasi_cols: "list[str]", k: int = 10
) -> str:
    """DuckDB oracle of :func:`k_anonymity` — same group/summary
    aggregation, same integral ppm."""
    qi = ", ".join(quasi_cols)
    return f"""
    WITH groups AS (
        SELECT {qi}, COUNT(*) AS sz FROM {table} GROUP BY {qi}
    ),
    s AS (
        SELECT COALESCE(CAST(SUM(sz) AS BIGINT), 0) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               COALESCE(CAST(MIN(sz) AS BIGINT), 0) AS min_group_size,
               COALESCE(CAST(SUM(CASE WHEN sz < {int(k)} THEN 1 END)
                        AS BIGINT), 0) AS risky_groups,
               COALESCE(CAST(SUM(CASE WHEN sz < {int(k)} THEN sz END)
                        AS BIGINT), 0) AS risky_rows
        FROM groups
    )
    SELECT *,
           CASE WHEN n_rows > 0 THEN
             CAST((risky_rows * 1000000) // n_rows AS BIGINT)
           ELSE 0 END AS risky_rows_ppm
    FROM s
    """
