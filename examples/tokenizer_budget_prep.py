#!/usr/bin/env python
"""Token-budget data prep in the corpus's OWN learned units (round-6
capabilities end to end): train a BPE tokenizer on the corpus, measure
every document through the Arrow-batched tokenizer seam, clip to a
token budget, then pack two ways — whole-document next-fit and
GPT-style contiguous concat-and-cut — and order the epoch by
curriculum bands. The only driver-side work is the bounded BPE merge
loop (top-of-frequency-table head); everything else is plan-side.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("tokenizer-budget-prep")
    docs = Babe.from_df(spark.read.parquet(f"{sf_dir}/documents.parquet"))

    # 1. learn the tokenizer from the corpus itself (one word-frequency
    #    agg + a bounded TakeOrdered head; merges broadcast in closures)
    tok = docs.train_bpe(num_merges=64)
    print(f"BPE: {len(tok.merges)} merges; first 5: {tok.merges[:5]}")

    # 2. per-doc stats in BPE units through the seam
    stats = docs.text_stats(tokenizer=tok)
    stats.df.select(
        F.avg("n_tokens").alias("avg_bpe_tokens"),
        F.avg("n_words").alias("avg_words"),
    ).show()

    # 3. clip overlong docs to a 48-token budget (word-boundary cut —
    #    BPE has no decode, costs are exact per-word token counts)
    clipped = docs.clip(48, mode="head", tokenizer=tok)

    # 4a. whole-document next-fit packs at 256 tokens/sequence
    packs = clipped.pack_tokens(
        256, text_col="text", tokenizer=tok, n_buckets=8
    )
    packs.df.groupBy("bucket").agg(
        F.countDistinct("pack_id").alias("n_packs")
    ).orderBy("bucket").show(4)

    # 4b. GPT-style contiguous stream cut at the same budget
    contig = clipped.pack_contiguous(
        256, text_col="text", tokenizer=tok, n_buckets=8
    )
    contig.df.agg(
        F.sum(F.col("spans_cut").cast("int")).alias("docs_spanning_cuts"),
        F.max("end_off").alias("max_stream_tokens"),
    ).show()

    # 5. curriculum order the clipped docs by quality band
    from pybabe_spark.functions.text import quality_score
    from pybabe_spark.operators.sampling import curriculum_order

    scored = clipped.df.withColumn("q", quality_score("text"))
    epoch = curriculum_order(scored, "q", [0.3, 0.4, 0.45], "doc_id", seed=1)
    print("epoch head:", [r["doc_id"] for r in epoch.limit(5).collect()])
    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
