#!/usr/bin/env python
"""Experimentation stack tour: assignment → raw readout → CUPED
variance reduction → decisions — the round-8 A/B analysis surface
composed end to end on the event log. Every stage is a registry
operator with a driver oracle; everything is aggregation-shaped (one
stats pass + broadcast-backs, never a corpus collect).

Flow: users split into arms by id parity; the pre-period value sum is
the CUPED covariate, the post-period sum the metric. The raw Welch
test, the CUPED-adjusted Welch test, the proportion z-test on a
derived conversion, and the per-arm weighted value quantiles all read
from the same per-user frame.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark
from pybabe_spark.sources.io import read_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("experimentation")
    ev = read_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-24").cast("timestamp")
    dec = F.col("value").cast("decimal(18,6)")

    frame = Babe.from_df(
        ev.groupBy("user_id").agg(
            F.sum(F.when(F.col("ts") < cutoff, dec))
            .cast("double")
            .alias("pre"),
            F.sum(F.when(F.col("ts") >= cutoff, dec))
            .cast("double")
            .alias("post"),
            F.max(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= cutoff)
            ).alias("converted"),
        ).withColumn(
            "arm",
            F.when(F.col("user_id") % 2 == 0, F.lit("control")).otherwise(
                F.lit("treatment")
            ),
        )
    )

    # gate 0: sample-ratio mismatch — a skewed split invalidates
    # everything below (id-parity assignment should be ~50/50)
    srm = frame.srm_check(
        "arm", {"control": 500_000, "treatment": 500_000}
    )
    print("srm gate:", srm.df.collect()[0].asDict())

    raw = frame.mean_test("arm", "post", "control", "treatment")
    print("raw mean test:", raw.df.collect()[0].asDict())

    mwu = frame.mann_whitney_u("arm", "post", "control", "treatment")
    r = mwu.df.collect()[0]
    print(
        "mann-whitney:",
        {k: r[k] for k in ("auc_ppm", "significant")},
    )

    robust = frame.trimmed_mean("post", by="arm", alpha=0.1)
    print(
        "trimmed means:",
        sorted((r["arm"], r["trimmed_mean"]) for r in robust.df.collect()),
    )

    adjusted = frame.cuped_adjust("post", "pre")
    cuped = adjusted.mean_test("arm", "adjusted", "control", "treatment")
    r = cuped.df.collect()[0]
    print(
        "cuped mean test:",
        {k: r[k] for k in ("diff", "significant")},
        "theta_ppm:",
        adjusted.df.select("theta_ppm").first()["theta_ppm"],
    )

    conv = frame.ab_test("arm", "converted", "control", "treatment")
    print("conversion z-test:", conv.df.collect()[0].asDict())

    # the r10 magnitude readouts: significance says "real", these say
    # "how big" — standardized (d/g), ordinal (Cliff's δ), and the
    # honest error bar for a ratio metric
    es = frame.effect_size("arm", "post", "control", "treatment")
    r = es.df.collect()[0]
    print("effect size:", {k: r[k] for k in ("cohens_d", "hedges_g")})

    cd = frame.cliffs_delta("arm", "post", "control", "treatment")
    print("cliffs delta:", cd.df.collect()[0]["delta"])

    rpe = Babe.from_df(
        ev.select(
            F.when(F.col("user_id") % 2 == 0, F.lit("control"))
            .otherwise(F.lit("treatment"))
            .alias("arm"),
            "user_id",
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(F.lit(0))
            .alias("revenue"),
            F.lit(1.0).alias("events"),
        )
    ).ratio_metric_ci("user_id", "revenue", "events", by="arm")
    print(
        "revenue/event delta-method CI:",
        sorted(
            (r["arm"], r["ratio"], r["ci_lo"], r["ci_hi"])
            for r in rpe.df.collect()
        ),
    )

    # quasi-experimental readout on the raw events: pre/post × arm
    did = Babe.from_df(
        ev.filter(F.col("event_type") == "purchase").select(
            F.when(F.col("user_id") % 2 == 0, F.lit("control"))
            .otherwise(F.lit("treatment"))
            .alias("arm"),
            F.when(F.col("ts") < cutoff, F.lit("pre"))
            .otherwise(F.lit("post"))
            .alias("period"),
            "value",
        )
    ).did_estimate(
        "arm", "period", "value", "control", "treatment", "pre", "post"
    )
    r = did.df.collect()[0]
    print("diff-in-diff:", {k: r[k] for k in ("did", "significant")})

    wq = frame.weighted_quantiles("post", "pre", [0.5, 0.9], by="arm")
    print(
        "pre-weighted post quantiles:",
        sorted(
            (r["arm"], r["prob"], r["value"]) for r in wq.df.collect()
        ),
    )

    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
