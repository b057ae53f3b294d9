#!/usr/bin/env python
"""End-to-end training-data prep on the testdata corpus: quality/language
filter -> cross-corpus near-dedup against the "already trained on" half
-> near-dup clusters + representative selection -> token packing ->
seeded global shuffle, with the plan linted before anything runs. Every
stage is a registry operator; this script is the composed 100 TB shape
in miniature (no driver-side collect decides membership anywhere).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from pybabe_spark import Babe, get_spark


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("training-prep")
    docs = Babe.from_df(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )

    # 0. the incremental-crawl split: every 5th doc stands in for the
    #    corpus we already trained on; the rest is the incoming batch
    seen = docs.filter(F.col("doc_id") % 5 == 0)
    batch = docs.filter(F.col("doc_id") % 5 != 0)

    # 0b. line-level boilerplate removal (C4/RefinedWeb): any line
    #     occurring in >= 3 distinct docs (nav, banners, footers) is
    #     deleted corpus-wide before anything else reads the text
    batch = batch.strip_boilerplate_lines("doc_id", "text", min_df=3)

    # 1. exact duplicated-substring scrub (Lee-et-al pass): delete
    #    spans covered by corpus-duplicated 6-grams, keep docs that
    #    still have text — BEFORE stats, so quality scores see the
    #    cleaned form
    batch = (
        batch.strip_duplicated_spans(n=6)
        .filter(F.col("text") != "")
        .filter_columns(keep_fields=["doc_id", "text"])
        .assert_scales()
    )

    # 1b. annotate + filter (narrow codegen maps)
    kept = (
        batch.text_stats()
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.3))
        .assert_scales()
    )

    # 1c. CCNet-style LM quality cut with the train-offline /
    #     score-online split: the bigram LM is trained on the SEEN
    #     corpus, stored, and the incoming batch scores against the
    #     stored model without re-reading seen text
    from pybabe_spark.operators.lm import load_lm, save_lm, train_bigram_lm

    lm_path = tempfile.mkdtemp(prefix="prep_lm_") + "/lm"
    save_lm(train_bigram_lm(seen.df), lm_path)
    kept = kept.perplexity_filter(
        max_ppl=10_000.0, lm=load_lm(spark, lm_path)
    ).assert_scales()

    # 2. drop batch docs near-duplicating the seen corpus — via the
    #    STORED MinHash index: the seen corpus's signature pass runs once
    #    at build time and later batches probe the index without ever
    #    re-reading seen text (the real incremental-crawl shape)
    idx = tempfile.mkdtemp(prefix="prep_mh_idx_") + "/index"
    from pybabe_spark.operators.dedup_scale import build_minhash_index

    build_minhash_index(seen.df, idx)
    fresh = kept.near_dedup_against_stored(idx, "doc_id", "text", threshold=0.8)

    # 3. near-dup clusters inside the batch; keep the min-id
    #    representative of each cluster via a semi-join (NOT a driver
    #    collect — membership stays on the cluster)
    pairs = fresh.minhash_lsh_pairs("doc_id", "text")
    clustered = fresh.dup_clusters(pairs)
    reps = clustered.filter(F.col("id") == F.col("component")).df.select(
        F.col("id").alias("doc_id")
    )
    survivors = Babe.from_df(fresh.df.join(reps, "doc_id", "left_semi"))

    # 3b. DSIR budget cut: of the deduped survivors, keep the (at most)
    #     1000 whose hashed-n-gram profile is most like the seen corpus
    #     — deterministic Gumbel-top-k, never a global sort
    survivors = survivors.dsir_select(seen.df, k=1000)

    # 4. pack surviving docs into 2048-token training sequences
    packed = survivors.pack_tokens(2048, tokens_col="n_tokens")
    stats = (
        packed.df.groupBy("bucket")
        .agg(F.count_distinct("pack_id").alias("n_packs"),
             F.count(F.lit(1)).alias("n_docs"))
        .orderBy("bucket")
    )

    # 5. epoch order: deterministic seeded global shuffle (range sort,
    #    reproducible on any cluster)
    epoch = survivors.global_shuffle("doc_id", seed=42)

    # 6. the embedding side: SemDeDup semantic near-dup removal
    #    (cluster-bucketed — never all-pairs), then PQ-compress the
    #    survivors' vectors 32x for the retrieval index
    emb = Babe.from_df(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    sem = emb.semantic_dedup(k_clusters=8, threshold=0.4).filter("kept")
    sem_vecs = Babe.from_df(
        emb.df.join(sem.df.select("vec_id"), "vec_id", "left_semi")
    )
    codes = sem_vecs.pq_encode()

    # 7. selection-side signals (round 7): what does the batch ADD
    #    beyond the seen corpus (novelty), and a curriculum signal from
    #    per-language length percentile (exact ppm — outlier-immune)
    novelty = batch.novelty_score(seen.df, n=3)
    ranked = docs.rank_normalize("n_chars", by="lang", tie_col="doc_id")

    # 8. hybrid retrieval over the kept corpus: BM25 + dense cosine
    #    fused by reciprocal rank (exact bigint credits), and the
    #    contrastive hard negatives for embedding finetuning
    from pybabe_spark.operators.similarity import ann_brute_force
    from pybabe_spark.operators.tfidf import bm25_search

    sparse = bm25_search(docs.df, ["spark", "window", "sort"], k=20)
    dense = (
        ann_brute_force(emb.df, emb.df.filter(F.col("vec_id") == 0), k=20)
        .select(F.col("neighbor_id").alias("id"), F.col("sim").alias("score"))
        .limit(20)
    )
    hybrid = Babe.from_df(sparse).rank_fuse(dense, k=5)
    negatives = emb.hard_negatives(emb.df.filter(F.col("vec_id") < 2), k=3)

    print(f"seen {seen.count()} | batch {batch.count()} -> "
          f"fresh {fresh.count()} -> survivors {survivors.count()}")
    print(f"embeddings {emb.count()} -> semantic survivors {sem.count()} "
          f"-> pq codes {codes.count()}")
    print("packs per bucket:")
    for r in stats.collect():
        print(f"  bucket {r['bucket']}: {r['n_packs']} packs / {r['n_docs']} docs")
    head = [r["doc_id"] for r in epoch.df.limit(5).collect()]
    print(f"epoch order head: {head}")
    mean_nov = novelty.df.agg(
        F.round(F.avg("novelty"), 3).alias("m")
    ).collect()[0]["m"]
    print(f"batch novelty vs seen: mean {mean_nov} over {novelty.count()} docs")
    print(f"curriculum signal rows: {ranked.count()}")
    print("hybrid top-5:", [r["id"] for r in hybrid.df.collect()])
    print(f"hard negatives mined: {negatives.count()}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
