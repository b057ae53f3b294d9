#!/usr/bin/env python
"""Search-evaluation tour: rank → judge → compare — the round-10
retrieval-metrics surface composed end to end on the documents table.

Three questions every search stack has to answer, each mapped to a
registry operator with a driver oracle:

1. *Is the ranking any good?* ``ranking_metrics`` scores a ranked
   result table against a relevance set: recall@k, MRR@k, NDCG@k —
   all gains are Python integer-ppm literals, so the numbers are
   bit-identical across engines and across runs.
2. *Did my change move the ranking?* ``rbo_overlap`` compares two
   rankings of the same queries label-free (truncated RBO@k,
   top-weighted) — the monitor you run BEFORE paying for judgments.
3. *Is the classifier feeding the pipeline honest?* ``cohens_kappa``
   + ``classification_report`` on predicted-vs-gold labels: the
   chance-corrected scalar and the per-class breakdown.

Everything is join/agg-shaped: rank≤k filters shrink each side to
queries×k before any shuffle; nothing quadratic, nothing collected.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark
from pybabe_spark.operators.ranking import ranking_metrics, rbo_overlap
from pybabe_spark.sources.io import read_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("search_eval")
    docs = read_table(spark, sf_dir, "documents")

    # -- two candidate rankings per "query" (one per language) -----------
    wa = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    wb = Window.partitionBy("lang").orderBy(
        (F.col("n_chars") - F.col("n_chars") % 10).desc(),
        F.col("doc_id").asc(),
    )
    rank_a = docs.select(
        "lang", "doc_id", F.row_number().over(wa).alias("rank")
    ).filter(F.col("rank") <= 10)
    rank_b = docs.select(
        "lang", "doc_id", F.row_number().over(wb).alias("rank")
    ).filter(F.col("rank") <= 10)

    # -- 1. judged quality of ranking A ----------------------------------
    truth = docs.filter(F.col("doc_id") % 3 == 0).select("lang", "doc_id")
    quality = ranking_metrics(rank_a, truth, "lang", "doc_id", "rank", k=10)
    print("ranking A vs relevance judgments:")
    quality.show(truncate=False)

    # -- 2. label-free drift between A and B -----------------------------
    drift = rbo_overlap(rank_a, rank_b, "lang", "doc_id", "rank", k=10)
    print("RBO@10 per query (1e6 ≈ identical prefixes):")
    drift.orderBy("rbo_ppm").show(truncate=False)

    # -- 3. classifier honesty: predicted lang vs gold lang --------------
    labeled = Babe.from_df(
        docs.select(
            F.col("lang").alias("gold"),
            F.when(F.col("doc_id") % 10 < 7, F.col("lang"))
            .otherwise(F.lit("en"))
            .alias("pred"),
        )
    )
    print("chance-corrected agreement (kappa):")
    labeled.cohens_kappa("gold", "pred").df.show()
    print("per-class precision/recall/F1 (ppm):")
    labeled.classification_report("gold", "pred").df.orderBy(
        "label"
    ).show(truncate=False)

    # -- 4. r12 eval surface: balanced number, ranking-for-rare,
    #       calibration rollup --------------------------------------------
    scored = Babe.from_df(
        docs.select(
            F.expr(
                "CAST(CAST(LEAST(1000000, size(split(text, ' ')) * 5000)"
                " AS DECIMAL(18,6)) / 1000000 AS DECIMAL(18,6))"
            ).alias("score"),
            F.expr(
                "array_contains(split(text, ' '), 'spark')"
            ).cast("int").alias("label"),
        )
    )
    print("MCC at the 0.25 threshold (balanced, imbalance-robust):")
    scored.df.selectExpr(
        "label", "score >= 0.25 AS pred"
    ).transform(lambda d: Babe.from_df(d).mcc("label", "pred").df).show()
    print("average precision (rare-positive ranking) + calibration:")
    scored.pr_auc("score", "label").df.show()
    scored.ece("score", "label").df.show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
