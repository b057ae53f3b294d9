"""rank_fuse (RRF hybrid fusion) unit behavior: exact integer scores,
per-list rank determinism, the bounded-input contract, and a lint-clean
plan (the rank window is partitioned per list, never global)."""

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.fusion import RRF_SCALE, rank_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "id long, score double").orderBy(
        F.col("score").desc(), F.col("id").asc()
    ).limit(10)


def test_rank_fuse_exact_integer_scores(spark):
    a = _ranked(spark, [(1, 9.0), (2, 5.0), (3, 1.0)])
    b = _ranked(spark, [(2, 0.9), (4, 0.8), (1, 0.7)])
    out = {r["id"]: r for r in rank_fuse([a, b], k=10).collect()}
    c = lambda r: RRF_SCALE // (60 + r)  # noqa: E731
    assert out[1]["rrf_score"] == c(1) + c(3)
    assert out[2]["rrf_score"] == c(2) + c(1)
    assert out[3]["rrf_score"] == c(3)
    assert out[4]["rrf_score"] == c(2)
    assert out[2]["n_lists"] == 2 and out[4]["n_lists"] == 1
    # doc 2 (ranks 2+1) beats doc 1 (ranks 1+3)
    ordered = [r["id"] for r in rank_fuse([a, b], k=10).collect()]
    assert ordered[0] == 2 and ordered[1] == 1


def test_rank_fuse_score_ties_break_on_id(spark):
    a = _ranked(spark, [(7, 1.0), (3, 1.0), (5, 1.0)])
    out = rank_fuse([a], k=3).collect()
    # equal scores rank id-ascending: 3 first regardless of input order
    assert [r["id"] for r in out] == [3, 5, 7]


def test_rank_fuse_rejects_unbounded_input(spark, sf_dir):
    from pybabe_spark.sources.io import read_table

    # a parquet scan has no logical row bound — passing a corpus
    # instead of a top-k cut must be refused
    corpus = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.col("n_chars").cast("double").alias("score")
    )
    with pytest.raises(ValueError, match="no row bound"):
        rank_fuse([corpus], k=5)
    with pytest.raises(ValueError, match="at least one"):
        rank_fuse([], k=5)


def test_rank_fuse_plan_lints_clean(spark):
    from pybabe_spark.plans.lint import plan_lint

    a = _ranked(spark, [(1, 2.0), (2, 1.0)])
    b = _ranked(spark, [(2, 3.0), (3, 1.0)])
    assert plan_lint(rank_fuse([a, b], k=5)) == []


def test_rank_fuse_integer_weights(spark):
    a = _ranked(spark, [(1, 9.0), (2, 5.0)])
    b = _ranked(spark, [(2, 0.9), (3, 0.8)])
    out = {r["id"]: r["rrf_score"]
           for r in rank_fuse([a, b], k=10, weights=[3, 1]).collect()}
    c = lambda r: RRF_SCALE // (60 + r)  # noqa: E731
    assert out[1] == 3 * c(1)
    assert out[2] == 3 * c(2) + 1 * c(1)
    assert out[3] == 1 * c(2)
    with pytest.raises(ValueError, match="INTEGER"):
        rank_fuse([a, b], weights=[0.5, 1.5])
    with pytest.raises(ValueError, match="INTEGER"):
        rank_fuse([a, b], weights=[1])
