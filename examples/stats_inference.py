#!/usr/bin/env python
"""Inferential-statistics tour: the round-10 k-group / time-series /
survival testing surface composed end to end through the Babe facade.

The experimentation example covers the two-arm case (srm → cuped →
mean/proportion tests). This tour answers the questions that come NEXT,
each mapped to a registry operator with a driver oracle:

1. *Do the k groups differ at all?* ``anova_f`` (means), with
   ``brown_forsythe`` first — the spread-homogeneity check ANOVA
   assumes — and ``kruskal_wallis`` as the rank-based fallback when
   spreads or skew disqualify it.
2. *Is model A actually better than model B on the same examples?*
   ``mcnemar`` on the discordant pairs.
3. *Is this per-user series noise or structure?* ``durbin_watson``
   (lag-1 readout) and ``ljung_box`` (joint lags-1..k test) over the
   exact-ppm acf machinery.
4. *How long until the event, as a number?* ``km_survival`` →
   ``nelson_aalen`` (additive hazard) → ``rmst`` (the scalar effect
   size) → ``logrank_test`` (the significance).

Everything is hash-agg/window-on-small-table shaped; nothing is
collected except the final few-row readouts.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark
from pybabe_spark.sources.io import read_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("stats_inference")
    orders = read_table(spark, sf_dir, "orders")
    ev = read_table(spark, sf_dir, "events")

    # -- 1. k-group comparison on order value by priority ---------------
    b = Babe.from_df(orders)
    spread = b.brown_forsythe("o_orderpriority", "o_totalprice")
    print("spread homogeneity:", spread.df.collect()[0].asDict())
    av = b.anova_f("o_orderpriority", "o_totalprice")
    print("one-way ANOVA:", av.df.collect()[0].asDict())
    kw = b.kruskal_wallis("o_orderpriority", "o_totalprice",
                          chi2_crit=9.487729)  # chi2(4), alpha=0.05
    print("kruskal-wallis:", kw.df.collect()[0].asDict())

    # -- 2. paired model comparison -------------------------------------
    docs = read_table(spark, sf_dir, "documents").select(
        F.col("lang").alias("gold"),
        F.when(F.col("doc_id") % 10 < 7, F.col("lang"))
        .otherwise(F.lit("en")).alias("pred_a"),
        F.when(F.col("doc_id") % 7 < 5, F.col("lang"))
        .otherwise(F.lit("de")).alias("pred_b"),
    )
    mc = Babe.from_df(docs).mcnemar("gold", "pred_a", "pred_b",
                                    chi2_crit=3.841459)
    print("mcnemar A-vs-B:", mc.df.collect()[0].asDict())

    # -- 3. per-user series structure ------------------------------------
    dw = Babe.from_df(ev).durbin_watson("user_id", "ts", "value")
    print("durbin-watson (3 users):",
          [r.asDict() for r in dw.df.orderBy("user_id").limit(3).collect()])
    lb = Babe.from_df(ev).ljung_box("user_id", "ts", "value", lags=3,
                                    chi2_crit=7.814728)
    n_sig = lb.df.filter("significant").count()
    print(f"ljung-box: {n_sig} of {lb.df.count()} user series reject"
          " white noise at lags 1-3")

    # -- 4. survival: curve -> hazard -> scalar -> test -------------------
    tp = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    subjects = ev.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("cohort"),
        F.min("ts").alias("t0"), tp.alias("tp"), F.max("ts").alias("tl"),
    ).select(
        "cohort",
        F.when(F.col("tp").isNotNull(),
               F.unix_micros("tp") - F.unix_micros("t0"))
        .otherwise(F.unix_micros("tl") - F.unix_micros("t0"))
        .alias("duration"),
        F.col("tp").isNotNull().cast("int").alias("event"),
    )
    sb = Babe.from_df(subjects)
    na = sb.nelson_aalen("duration", "event", group_col="cohort")
    print("nelson-aalen tail:",
          na.df.orderBy(F.col("cum_hazard").desc()).limit(2).collect())
    r = sb.rmst("duration", "event", tau=259_200_000_000,
                group_col="cohort")
    print("3-day RMST per cohort (hours):", {
        row["cohort"]: round(float(row["rmst"]) / 3.6e9, 2)  # rmst is exact DECIMAL
        for row in r.df.collect()
    })
    lr = sb.logrank_test("duration", "event", "cohort", "view", "click")
    print("log-rank view vs click:", lr.df.collect()[0].asDict())

    # -- 5. round-11 inference: post-hoc, likelihood, agreement, EB --------
    li = Babe.from_df(read_table(spark, sf_dir, "lineitem"))
    dunn = li.dunn_test("l_returnflag", "l_extendedprice", z_crit=2.394)
    print("dunn pairs:", [(r[0], r[1], r["z"], r["significant"])
                          for r in dunn.df.collect()])
    orders = Babe.from_df(read_table(spark, sf_dir, "orders"))
    g = orders.g_test("o_orderpriority", "o_orderstatus")
    print("g-test priority x status:", g.df.collect()[0].asDict())
    docs = read_table(spark, sf_dir, "documents")
    fk = Babe.from_df(docs.select(
        (F.col("doc_id") % 50).alias("item"), F.col("lang").alias("cat"))
    ).fleiss_kappa("item", "cat")
    print("fleiss kappa (lang agreement per doc bucket):",
          fk.df.collect()[0].asDict())
    eb = Babe.from_df(read_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 20).alias("bucket"),
        (F.col("o_orderstatus") == "F").cast("int").alias("done"))
    ).eb_shrink_rates("bucket", "done")
    row = eb.df.orderBy(F.col("n").asc()).limit(1).collect()[0]
    print(f"EB shrink, thinnest bucket: raw {row['p_ppm'] / 1e4:.1f}% "
          f"-> shrunk {row['shrunk_rate'] * 100:.1f}% "
          f"(prior weight {row['prior_strength']})")

    # -- 6. round-12 inference: parametric post-hoc, blocks, ordinal,
    #       confounders, 2x2 effect size, concentration ------------------
    tk = orders.tukey_hsd("o_orderpriority", "o_totalprice", q_crit=3.858)
    print("tukey pairs:", [(r[0], r[1], r["q_stat"], r["significant"])
                           for r in tk.df.collect()])
    fr = Babe.from_df(
        ev.filter(F.col("value").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    ).friedman_test("user_id", "event_type", "v", chi2_crit=9.487729)
    print("friedman across event types:", fr.df.collect()[0].asDict())
    kt = li.kendall_tau_b("l_quantity", "l_discount", by="l_returnflag")
    print("kendall tau-b qty vs discount:",
          [(r["l_returnflag"], r["tau_b"]) for r in kt.df.collect()])
    pc = li.partial_corr("l_quantity", "l_extendedprice", "l_discount")
    print("partial corr qty~price | discount:",
          pc.df.collect()[0].asDict())
    orr = Babe.from_df(orders.df.select(
        (F.col("o_orderpriority") == "1-URGENT").alias("urgent"),
        (F.col("o_orderstatus") == "F").alias("finished"),
    )).odds_ratio("urgent", "finished")
    print("odds ratio urgent->finished:", orr.df.collect()[0].asDict())
    hhi = orders.herfindahl_index(
        "o_custkey", "o_totalprice", by="o_orderpriority")
    lz = orders.lorenz_curve("o_orderpriority", "o_totalprice")
    top = lz.df.filter(F.col("bucket") == 9).orderBy(
        "o_orderpriority").collect()
    print("HHI by priority:",
          [(r["o_orderpriority"], r["hhi_ppm"]) for r in
           hhi.df.orderBy("o_orderpriority").collect()])
    print("lorenz: top decile's revenue share by priority:",
          [(r["o_orderpriority"], 1_000_000 - r["cum_value_share_ppm"])
           for r in top])


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
