#!/usr/bin/env python
"""Monitoring & planning tour: the round-11 surface composed as one
runnable script — engagement (DAU/WAU/MAU stickiness) → classical
seasonal decomposition of the hourly load → seasonal-naive next-day
forecast with its backtest accuracy certificate → experiment planning
(required sample size) → model-eval (exact ROC-AUC + decile gains) →
corpus hygiene (readability, compression ratio, source-vocabulary
overlap, embedding centroid drift). Every stage except the zlib
compression ratio is a registry operator with a driver oracle; the
script is the on-call dashboard shape in miniature (aggregates and
bounded heads, never a corpus collect).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark
from pybabe_spark.sources.io import read_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("monitoring-forecast")
    events = Babe.from_df(read_table(spark, sf_dir, "events"))
    docs = Babe.from_df(read_table(spark, sf_dir, "documents"))
    emb = Babe.from_df(read_table(spark, sf_dir, "embeddings"))

    # 1. engagement: is usage a habit or a spike?
    stick = events.stickiness("user_id", "ts").df.orderBy("day")
    print("stickiness (last 3 days):")
    for r in stick.tail(3):
        print(f"  day {r['day']}: dau={r['dau']} wau={r['wau']} "
              f"mau={r['mau']} dau/wau={r['stickiness_ppm'] / 1e6:.2f}")

    # 2. what is trend vs daily rhythm vs noise in the hourly load?
    dec = events.seasonal_decompose("event_type", "ts", "value",
                                    period=24).df
    worst = (
        dec.filter(F.col("remainder").isNotNull())
        .orderBy(F.abs(F.col("remainder")).desc())
        .limit(3)
        .collect()
    )
    print("largest decomposition residuals (the hours to investigate):")
    for r in worst:
        print(f"  {r['event_type']} t={r['t']}: value={r['value']:.2f} "
              f"trend={r['trend']:.2f} seasonal={r['seasonal']:.2f} "
              f"remainder={r['remainder']:.2f}")

    # 3. next-day plan: the snaive baseline + how good it historically is
    fc = events.snaive_forecast("event_type", "ts", "value",
                                period=24, horizon=24).df
    print("forecast rows (one per type x next-24h):", fc.count())
    bt = events.forecast_backtest("event_type", "ts", "value",
                                  period=24).df.collect()
    for r in bt:
        smape = (f"{r['smape_ppm'] / 1e4:.1f}%"
                 if r["smape_ppm"] is not None else "n/a")
        print(f"  backtest {r[0]}: scored {r['n_scored']}/{r['n_holdout']}"
              f" sMAPE {smape}")

    # 4. can this segment support the experiment we want to run?
    plan = Babe.from_df(
        read_table(spark, sf_dir, "orders").select(
            "o_orderpriority",
            (F.col("o_orderstatus") == "F").cast("int").alias("done"),
        )
    ).required_sample_size("done", by="o_orderpriority").df.collect()
    for r in plan:
        print(f"  sample size {r['o_orderpriority']}: baseline "
              f"{r['p_ppm'] / 1e4:.1f}% -> n/arm {r['n_required']}")

    # 5. model eval: ranking quality + targeting table for a toy scorer
    frame = docs.df.select(
        "doc_id",
        (F.least(F.size(F.split("text", " ")) * 5000, F.lit(1_000_000))
         .cast("decimal(18,6)") / 1_000_000).alias("score"),
        F.array_contains(F.split("text", " "), "spark").cast("int")
        .alias("label"),
    )
    auc = Babe.from_df(frame).roc_auc("score", "label").df.collect()[0]
    print(f"toy scorer AUC: {auc['auc_ppm'] / 1e6:.3f} "
          f"({auc['n_pos']} pos / {auc['n_neg']} neg)")
    gains = Babe.from_df(frame).gains_table(
        "score", "label", "doc_id", n_buckets=5).df.orderBy("bucket")
    top = gains.collect()[0]
    print(f"top quintile: capture {top['capture_ppm'] / 1e4:.1f}% "
          f"lift {top['lift_ppm'] / 1e6:.2f}x")

    # 6. corpus hygiene for the training-data mix
    hygiene = docs.readability("text").compression_ratio("text").df
    agg = hygiene.agg(
        F.avg(F.col("readability.fk_grade_ppm") / 1e6).alias("fk"),
        F.avg("compression_ratio").alias("cr"),
    ).collect()[0]
    print(f"corpus mean FK grade {agg['fk']:.2f}, "
          f"mean zlib ratio {agg['cr']:.2f}")
    overlap = docs.vocab_overlap("source", "text").df
    red = overlap.orderBy(F.col("jaccard_ppm").desc()).limit(1).collect()[0]
    print(f"most redundant source pair: {red[0]} ~ {red[1]} "
          f"jaccard {red['jaccard_ppm'] / 1e4:.1f}%")
    drift = emb.centroid_drift("label", "embedding").df
    far = drift.orderBy(F.col("centroid_cosine").asc()).limit(1).collect()[0]
    print(f"label farthest from corpus centroid: {far['label']} "
          f"(cos {far['centroid_cosine']:.3f})")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
