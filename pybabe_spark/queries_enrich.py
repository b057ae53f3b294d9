"""Driver-contract queries for scalar enrichment (parse_time, typedetect,
user_agent, geoip), the arbitrary-Python UDF surface, and the remaining
order-sensitive relational operators.

UA strings and IPs don't exist in the testdata, so they are *derived
deterministically* from testdata columns (CASE mapping / arithmetic) in
both engines, then the operator under test runs on the derived column —
the op itself is what the oracle checks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pybabe_spark.functions.enrich import (
    BUILTIN_IP_RANGES,
    geoip_country_code,
    user_agent,
)
from pybabe_spark.functions.time import parse_time, typedetect
from pybabe_spark.operators.dedup_scale import dedup_exact  # noqa: F401 (re-export convenience)
from pybabe_spark.operators.group import group
from pybabe_spark.operators.relational import (
    dedup,
    head_per_group,
    insert_rows,
    replace_cell,
    sort,
)
from pybabe_spark.operators.reshape import transpose
from pybabe_spark.operators.udf_ops import bulk_map_to
from pybabe_spark.operators.window import window_map_udf
from pybabe_spark.queries import register
from pybabe_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# parse_time / typedetect
# ---------------------------------------------------------------------------

@register(
    "parse_time_lenient",
    """
    WITH src AS (
      SELECT o_orderkey, strftime(o_orderdate, '%Y/%m/%d') AS d_str FROM orders
    )
    SELECT o_orderkey, d_str,
           strptime(d_str, '%Y/%m/%d') AS parsed,
           strftime(strptime(d_str, '%Y/%m/%d'), '%Y-%m-%d') AS d_date,
           CAST(hour(strptime(d_str, '%Y/%m/%d')) AS INT) AS d_hour
    FROM src
    """,
)
def q_parse_time(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    src = orders.select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy/MM/dd").alias("d_str")
    )
    out = parse_time(
        src, "d_str", output_field="parsed", output_date="d_date", output_hour="d_hour"
    )
    return out.select(
        "o_orderkey", "d_str", "parsed",
        F.col("d_date").cast("string").alias("d_date"),
        F.col("d_hour").cast("int").alias("d_hour"),
    )


@register(
    "typedetect_strings",
    """
    WITH src AS (
      SELECT l_orderkey,
             CAST(l_linenumber AS VARCHAR) AS ln_s,
             CAST(l_quantity AS VARCHAR)  AS qty_s
      FROM lineitem
    )
    SELECT l_orderkey,
           CAST(ln_s AS BIGINT) AS ln_s,
           CAST(qty_s AS DOUBLE) AS qty_s
    FROM src
    """,
)
def q_typedetect(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    src = li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("string").alias("ln_s"),
        F.col("l_quantity").cast("string").alias("qty_s"),
    )
    return typedetect(src)


# ---------------------------------------------------------------------------
# user_agent / geoip (derived inputs, see module docstring)
# ---------------------------------------------------------------------------

_UA_MAP = {
    "click": "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "view": "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/17.1 Safari/605.1.15",
    "purchase": "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/121.0",
    "signup": "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.43 Mobile Safari/537.36",
    "error": "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 Edg/119.0.2151.44",
}

_UA_CASE = (
    "CASE event_type "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _UA_MAP.items())
    + " END"
)

#: expected parse per event_type — the oracle states the *contract*
#: (os/browser/version per UA), independently of the Spark regex impl.
_UA_EXPECT = {
    "click": ("Windows", "Chrome", "120.0.0.0"),
    "view": ("Mac OS", "Safari", "17.1"),
    "purchase": ("Linux", "Firefox", "121.0"),
    "signup": ("Android", "Chrome", "120.0.6099.43"),
    "error": ("Windows", "Edge", "119.0.2151.44"),
}

_UA_ORACLE = (
    "SELECT event_id, "
    + "CASE event_type "
    + " ".join(f"WHEN '{k}' THEN '{v[0]}'" for k, v in _UA_EXPECT.items())
    + " END AS os, "
    + "CASE event_type "
    + " ".join(f"WHEN '{k}' THEN '{v[1]}'" for k, v in _UA_EXPECT.items())
    + " END AS browser, "
    + "CASE event_type "
    + " ".join(f"WHEN '{k}' THEN '{v[2]}'" for k, v in _UA_EXPECT.items())
    + " END AS browser_version "
    + "FROM events"
)


@register("user_agent_parse", _UA_ORACLE)
def q_user_agent(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type")
    src = ev.withColumn("ua", F.expr(_UA_CASE))
    out = user_agent(src, "ua")
    return out.select("event_id", "os", "browser", "browser_version")


_IP_EXPR_SQL = (
    "((user_id * 2654435761) % 4278190079) + 16777216"  # deterministic pseudo-IP int
)
_GEO_CASE = (
    "CASE "
    + " ".join(
        f"WHEN ip_int BETWEEN {s} AND {e} THEN '{cc}'"
        for (s, e, cc, *_rest) in BUILTIN_IP_RANGES
    )
    + " ELSE NULL END"
)


@register(
    "geoip_country",
    f"""
    WITH src AS (
      SELECT event_id, {_IP_EXPR_SQL} AS ip_int FROM events
    ),
    ips AS (
      SELECT event_id,
             CAST(ip_int // 16777216 AS VARCHAR) || '.' ||
             CAST((ip_int // 65536) % 256 AS VARCHAR) || '.' ||
             CAST((ip_int // 256) % 256 AS VARCHAR) || '.' ||
             CAST(ip_int % 256 AS VARCHAR) AS ip,
             ip_int
      FROM src
    )
    SELECT event_id, ip, {_GEO_CASE} AS country_code FROM ips
    """,
)
def q_geoip(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    ip_int = (F.col("user_id") * F.lit(2654435761)) % F.lit(4278190079) + F.lit(16777216)
    src = ev.withColumn("__i", ip_int).withColumn(
        "ip",
        F.concat_ws(
            ".",
            (F.col("__i") / 16777216).cast("bigint").cast("string"),
            ((F.col("__i") / 65536).cast("bigint") % 256).cast("string"),
            ((F.col("__i") / 256).cast("bigint") % 256).cast("string"),
            (F.col("__i") % 256).cast("string"),
        ),
    ).drop("__i", "user_id")
    out = geoip_country_code(src, "ip")
    return out.select("event_id", "ip", "country_code")


# ---------------------------------------------------------------------------
# UDF surface (mapTo/bulkMapTo/reducer/window-udf): Python paths whose
# results the SQL oracle can state independently.
# ---------------------------------------------------------------------------

@register(
    "bulk_map_double_value",
    "SELECT event_id, value * 2.0 AS value2 FROM events",
)
def q_bulk_map(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("event_id", "value")

    def double_it(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame()
        out["event_id"] = pdf["event_id"]
        out["value2"] = pdf["value"] * 2.0
        return out

    return bulk_map_to(ev, double_it, fields="event_id bigint, value2 double")


@register(
    "group_reducer_pandas",
    """
    SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(SUM(l_linenumber) AS BIGINT) AS line_sum
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_group_reducer(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linenumber")

    def reducer(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_rows": [len(pdf)],
                "line_sum": [int(pdf["l_linenumber"].sum())],
            }
        )

    return group(
        li, "l_returnflag", reducer=reducer,
        reducer_schema="l_returnflag string, n_rows bigint, line_sum bigint",
    )


@register(
    "window_udf_rolling_max",
    """
    SELECT event_id,
           MAX(value) OVER (ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS window_value
    FROM events
    """,
)
def q_window_udf(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("event_id", "value")
    out = window_map_udf(
        ev, 3, lambda vals: max(vals), "value",
        out_col="window_value", return_type="double", order_by="event_id",
    )
    return out.select("event_id", "window_value")


# ---------------------------------------------------------------------------
# Remaining order-sensitive relational ops
# ---------------------------------------------------------------------------

@register(
    "head_per_group",
    """
    SELECT l_orderkey, l_linenumber, l_partkey FROM (
      SELECT l_orderkey, l_linenumber, l_partkey,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
      FROM lineitem
    ) t WHERE rn <= 2
    """,
)
def q_head_per_group(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    out = head_per_group(
        li, 2, ["l_orderkey"], order_by=["l_linenumber", "l_partkey", "l_suppkey"]
    )
    return out.select("l_orderkey", "l_linenumber", "l_partkey")


@register(
    "dedup_keep_first",
    """
    SELECT c_nationkey, c_custkey, c_name FROM (
      SELECT c_nationkey, c_custkey, c_name,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
      FROM customer
    ) t WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_name"
    )
    return dedup(cust, ["c_nationkey"], keep_first=True, order_col="c_custkey")


@register(
    "insert_rows_union",
    """
    SELECT r_regionkey, r_name FROM region
    UNION ALL SELECT 99, 'TESTREGION'
    """,
)
def q_insert_rows(spark, sf_dir):
    region = read_table(spark, sf_dir, "region")
    return insert_rows(region, [(99, "TESTREGION")], before=False)


@register(
    "replace_cell_all_columns",
    """
    SELECT c_custkey,
           CASE WHEN c_name = 'BUILDING' THEN 'BLDG' ELSE c_name END AS c_name,
           CASE WHEN c_mktsegment = 'BUILDING' THEN 'BLDG' ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    """,
)
def q_replace_cell(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return replace_cell(cust, "BUILDING", "BLDG")


@register(
    "sort_by_balance",
    "SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_acctbal DESC",
)
def q_sort(spark, sf_dir):
    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return sort(sup, "s_acctbal", reverse=True)


def _transpose_oracle() -> str:
    cols = ", ".join(
        f"(SELECT r_name FROM region WHERE r_regionkey = {k}) AS \"{k}\""
        for k in range(5)
    )
    return f"SELECT 'r_name' AS field, {cols}"


@register("transpose_region", _transpose_oracle())
def q_transpose(spark, sf_dir):
    region = read_table(spark, sf_dir, "region")
    return transpose(sort(region, "r_regionkey"))


def _soundex_nations_sql() -> str:
    from pybabe_spark.functions.phonetic import soundex_sql

    return f"""
    SELECT n_name, {soundex_sql('n_name')} AS sdx
    FROM nation
    """


@register("soundex_nations", _soundex_nations_sql())
def q_soundex_nations(spark, sf_dir):
    """Phonetic keys (functions/phonetic.py::soundex) over the 25 real
    country names — every code value-checked against the DuckDB mirror
    generated from the same letter table and collapse passes. Pure
    codegen (translate + 7 regexp passes), zero shuffles."""
    from pybabe_spark.functions.phonetic import soundex

    nation = read_table(spark, sf_dir, "nation")
    return nation.select("n_name", soundex("n_name").alias("sdx"))


def _kanon_sql():
    from pybabe_spark.functions.enrich import k_anonymity_sql

    return k_anonymity_sql(
        "customer", ["c_nationkey", "c_mktsegment"], 10
    )


@register("k_anonymity_customers", _kanon_sql())
def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit over (nation, segment) quasi-identifiers
    (functions/enrich.py::k_anonymity): one hash agg to the QI group
    table + one 1-row summary — re-identification risk as exact
    integral ppm, the release gate next to pseudonymize/pii_scrub."""
    from pybabe_spark.functions.enrich import k_anonymity

    cust = read_table(spark, sf_dir, "customer")
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment"], 10)


_LDIV_BAND_SQL = """
    CASE WHEN c_acctbal < 0 THEN 'debt'
         WHEN c_acctbal < 3000 THEN 'low'
         WHEN c_acctbal < 7000 THEN 'mid'
         ELSE 'high' END
"""


def _ldiv_sql():
    from pybabe_spark.functions.enrich import l_diversity_sql

    inner = (
        f"(SELECT c_nationkey, c_mktsegment, {_LDIV_BAND_SQL} AS band "
        "FROM customer)"
    )
    return l_diversity_sql(
        inner, ["c_nationkey", "c_mktsegment"], "band", 4
    )


@register("l_diversity_customers", _ldiv_sql())
def q_l_diversity(spark, sf_dir):
    """l-diversity audit (functions/enrich.py::l_diversity): the
    homogeneity-attack check k-anonymity misses — per (nation,
    segment) group, how many DISTINCT account-balance bands appear;
    groups below l=4 leak the sensitive band. Two stacked hash aggs
    ((QI, sensitive) cells → QI groups) + one 1-row summary, NULL
    counted as a disclosure class on both sides, risk as exact
    integral ppm."""
    from pybabe_spark.functions.enrich import l_diversity

    cust = read_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("band"),
    )
    return l_diversity(
        cust, ["c_nationkey", "c_mktsegment"], "band", 4
    )
