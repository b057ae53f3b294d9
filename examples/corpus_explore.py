#!/usr/bin/env python
"""Corpus exploration + rebalancing with the round-6 analytics ops:
normalize -> histogram/PMI overview -> BM25 retrieval spot-checks (via
a persisted inverted index) -> k-means cells -> temperature-rebalanced
sample across cells. The ending is the point: cluster-then-rebalance is
the standard recipe for de-skewing a web corpus before training, and
every stage here is the operator's 100 TB shape in miniature (stored
index probes read only their posting buckets; the cluster rebalance is
a broadcast allocation + one selection pass).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("corpus-explore")
    docs = Babe.from_df(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).normalize_text("text")

    # 1. shape overview: doc-length histogram + strongest collocations
    print("-- length histogram --")
    for r in docs.histogram("n_chars", bins=8).df.collect():
        print(f"  [{r['lo']:9.1f}, {r['hi']:9.1f})  {r['n']}")
    print("-- top collocations --")
    for r in docs.pmi_collocations(k=5, min_count=3).df.collect():
        print(f"  {r['w1']} {r['w2']}  pmi={r['pmi']:.3f}  n={r['c12']}")

    # 1b. is the near-dup banding tuned for THIS corpus? (r12)
    print("-- LSH candidate-Jaccard deciles (16 hashes, 4 bands) --")
    for r in docs.lsh_candidate_calibration("doc_id", "text").df.orderBy(
        "jaccard_decile"
    ).collect():
        print(f"  decile {r['jaccard_decile']}: {r['n_pairs']} pairs")

    # 2. retrieval spot-check through the persisted inverted index
    from pybabe_spark.operators.tfidf import bm25_search_stored

    idx = os.path.join(tempfile.mkdtemp(prefix="corpus_explore_"), "bm25")
    docs.build_bm25_index(idx)
    print("-- bm25: 'spark window sort' --")
    for r in bm25_search_stored(spark, idx, ["spark", "window", "sort"], k=3).collect():
        print(f"  doc {r['id']}  score={r['score']:.4f}")

    # 3. cluster the embedding space, then temperature-rebalance across
    #    cells so over-represented regions stop dominating the sample
    emb = Babe.from_df(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    C = emb.kmeans_fit(k=4, iters=3)
    cells = emb.kmeans_assign(C)
    before = {r["cell"]: r["n"] for r in
              cells.df.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    sample = cells.temperature_resample("cell", "vec_id", budget=40, alpha=0.3)
    after = {r["cell"]: r["n"] for r in
             sample.df.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    print("-- cell sizes: corpus -> alpha=0.3 sample --")
    for c in sorted(before):
        print(f"  cell {c}: {before[c]} -> {after.get(c, 0)}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
