#!/usr/bin/env python
"""End-to-end training-data prep on the testdata corpus: quality/language
filter -> exact dedup -> near-dup clusters -> token packing, with the
plan linted before anything runs. Every stage is a registry operator;
this script is the composed 100 TB shape in miniature.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("training-prep")
    docs = Babe.from_df(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )

    # 1. annotate + filter (narrow codegen maps)
    kept = (
        docs.text_stats()
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.3))
        .assert_scales()
    )

    # 2. near-dup clusters from MinHash-LSH candidates
    pairs = kept.minhash_lsh_pairs("doc_id", "text")
    clustered = kept.dup_clusters(pairs)
    survivors = kept.filter(
        F.col("doc_id").isin(
            [r["component"] for r in
             clustered.df.select("component").distinct().collect()]
        )
    )

    # 3. pack surviving docs into 2048-token training sequences
    packed = survivors.pack_tokens(2048, tokens_col="n_tokens")
    stats = (
        packed.df.groupBy("bucket")
        .agg(F.count_distinct("pack_id").alias("n_packs"),
             F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket")
    )
    print(f"kept {survivors.count()} docs -> packs per bucket:")
    for r in stats.collect():
        print(f"  bucket {r['bucket']}: {r['n_packs']} packs / {r['n_docs']} docs")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
