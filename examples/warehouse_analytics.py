#!/usr/bin/env python
"""Warehouse analytics tour over the event log and order tables: the
round-7 analytics surface composed as one runnable script — quality
gate → imputation → SCD2 history → retention / funnel / sequence /
transitions → anomalies → Pareto → incremental rollup. Every stage is
a registry operator with a driver oracle; the script is the dashboard
backend shape in miniature (aggregates and bounded heads, never a
corpus collect).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark
from pybabe_spark.sources.io import read_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("warehouse-analytics")
    orders = Babe.from_df(read_table(spark, sf_dir, "orders"))
    events = Babe.from_df(read_table(spark, sf_dir, "events"))
    cust = read_table(spark, sf_dir, "customer")

    # 1. contract gate: what is broken, and how badly?
    violations = orders.validate(
        [
            ("not_null", "o_custkey"),
            ("unique", ["o_orderkey"]),
            ("range", "o_totalprice", 0, 1_000_000),
            ("fk", "o_custkey", cust, "c_custkey"),
        ]
    ).df.collect()
    print("violations:", [(r["rule"], r["violations"]) for r in violations])

    # 2. SCD2 user-state history from the raw event changelog
    history = events.scd2("user_id", "ts", ["event_type"])
    print("scd2 intervals:", history.df.count())

    # 3. the product-analytics block — each one aggregation-shaped
    retention = events.retention_cohorts("user_id", "ts", period_seconds=604800)
    funnel = events.funnel(["view", "click", "purchase"], within=86400)
    repeats = events.sequence_count(["view", "click", "purchase"])
    transitions = events.transition_matrix(order_cols=["event_id"])
    print("cohort rows:", retention.df.count())
    print("funnel:", [(r["step"], r["users"]) for r in funnel.df.collect()])
    print("repeat converters:", repeats.df.count())
    print("transitions:", transitions.df.count())

    # 4. which readings are suspicious, which keys dominate revenue —
    # z-score (moment-based) next to MAD (robust to the outliers
    # themselves), plus the level metrics: EWMA trend and TWAP
    anomalies = events.zscore_anomalies("user_id", "value", "ts", threshold=1.5)
    robust = events.mad_anomalies("event_type", "value", "ts", threshold=3.5)
    smoothed = events.ewma("user_id", "value", "ts", id_col="event_id")
    twap = events.time_weighted_avg("user_id", "ts", "value", id_col="event_id")
    pareto = Babe.from_df(read_table(spark, sf_dir, "lineitem")).pareto_report(
        "l_suppkey", "l_extendedprice", top_n=10
    )
    print("anomalies:", anomalies.df.count(), "robust:", robust.df.count())
    last = smoothed.df.orderBy(F.col("event_id").desc()).limit(1).collect()
    print("ewma tail:", round(last[0]["ewma"], 4))
    print("twap users:", twap.df.count())
    print(
        "top suppliers cum ppm:",
        [(r["l_suppkey"], r["cum_share_ppm"]) for r in pareto.df.collect()[:3]],
    )

    # 4b. channel attribution and the OLAP subtotal grid
    attr = events.attribute_conversions(
        conversion=F.col("event_type") == "purchase",
        touch=F.col("event_type").isin("click", "view", "signup"),
        channel_col="event_type",
        model="linear",
        value_col="value",
    )
    grid = orders.cube(
        ["o_orderstatus", "o_orderpriority"],
        {"n": F.count(F.lit(1))},
    )
    fk = orders.foreign_key_check("o_custkey", cust, "c_custkey")
    print("attribution:", [(r["channel"], round(r["conversions"], 2))
                           for r in attr.df.collect()])
    print("cube rows:", grid.df.count(),
          "fk ok:", fk.df.collect()[0]["full_coverage"])

    # 4b. the round-8 blocks: trend fits, downsampling, persistence,
    # CDC state, layout, spatial, recommendations, survivorship
    li = Babe.from_df(read_table(spark, sf_dir, "lineitem"))
    trend = li.ols("l_quantity", "l_extendedprice", ["l_returnflag"])
    print("ols slopes:", [(r["l_returnflag"], r["slope"])
                          for r in trend.df.collect()])
    bars = events.ohlc_bars("user_id", "ts", "value", 86400,
                            volume_col="value")
    print("ohlc bars:", bars.df.count())
    persistence = events.acf("user_id", "ts", "value", lags=2)
    print("acf rows:", persistence.df.count())

    # CDC: replay the post-cutoff events as an upsert/delete feed over
    # the pre-cutoff per-user state
    cutoff = F.lit("2024-01-24").cast("timestamp")
    pre = events.df.filter(F.col("ts") < cutoff)
    base = Babe.from_df(
        pre.groupBy("user_id").agg(
            F.max_by("event_type", "ts").alias("event_type"),
            F.max_by("value", "ts").alias("value"),
        )
    )
    feed = events.df.filter(F.col("ts") >= cutoff).select(
        "user_id", "ts", "event_type", "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
    )
    snapshot = base.apply_cdc(feed, "user_id", "ts")
    print("cdc snapshot keys:", snapshot.df.count())

    # layout: how well does a (custkey, totalprice) Z-curve cluster?
    from pybabe_spark.operators.layout import zorder_stats

    zstats = zorder_stats(
        orders.df, ["o_custkey", "o_totalprice"], bits=12, num_files=8
    )
    print("zorder files:", zstats.count())

    # spatial: md5-placed customers near suppliers
    from pybabe_spark.operators.spatial import radius_join

    def coord(tag, key):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(tag),
                   F.col(key).cast("string"))), 1, 15), 16, 10)
            .cast("bigint") % 10000
        ).cast("double")

    supp = read_table(spark, sf_dir, "supplier")
    near = radius_join(
        cust.select("c_custkey", coord("cx", "c_custkey").alias("cx"),
                    coord("cy", "c_custkey").alias("cy")),
        supp.select("s_suppkey", coord("sx", "s_suppkey").alias("sx"),
                    coord("sy", "s_suppkey").alias("sy")),
        300.0, ("cx", "cy"), ("sx", "sy"),
    )
    print("spatial pairs:", near.count())

    # recommendations + survivorship
    also_bought = li.item_neighbors("l_orderkey", "l_partkey", k=3)
    print("item neighbors:", also_bought.df.count())
    merged = Babe.from_df(
        events.df.select(
            "user_id", "ts",
            F.when(F.col("value") > 50, F.col("value")).alias("big_value"),
            F.when(F.col("event_type") != "view", F.col("event_type"))
            .alias("last_action"),
        )
    ).golden_record("user_id", "ts")
    print("golden records:", merged.df.count())

    # 5. the always-fresh dashboard aggregate: build once, fold batches
    from pybabe_spark.operators.rollup import (
        rollup_append,
        rollup_build,
        rollup_query,
    )

    with tempfile.TemporaryDirectory(prefix="pybabe_rollup_ex_") as root:
        path = os.path.join(root, "rollup")
        o = orders.df
        rollup_build(
            o.filter(F.col("o_orderkey") % 2 == 0),
            ["o_orderstatus"],
            {"o_totalprice": "sum"},
            path,
        )
        rollup_append(
            o.filter(F.col("o_orderkey") % 2 != 0),
            path,
            ["o_orderstatus"],
            {"o_totalprice": "sum"},
        )
        cube = rollup_query(spark, path, [], {"o_totalprice": "sum"})
        print("rollup grand total:", cube.collect()[0]["o_totalprice_sum"])

    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
