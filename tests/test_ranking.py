"""ranking_metrics (operators/ranking.py) — recall@k / MRR@k / NDCG@k
with Python-literal gain tables, exact-integer means."""

import math

import pytest

from pybabe_spark.operators.ranking import ranking_metrics


def _frames(spark, results, truth):
    r = spark.createDataFrame(results, "q string, d string, rank int")
    t = spark.createDataFrame(truth, "q string, d string")
    return r, t


def test_perfect_ranking_all_ones(spark):
    results = [("q1", "a", 1), ("q1", "b", 2)]
    truth = [("q1", "a"), ("q1", "b")]
    r, t = _frames(spark, results, truth)
    row = ranking_metrics(r, t, "q", "d", "rank", k=10).collect()[0]
    assert row["n_queries"] == 1
    assert row["recall_at_k_ppm"] == 1_000_000
    assert row["mrr_ppm"] == 1_000_000
    assert row["ndcg_ppm"] == 1_000_000


def test_hand_checked_mixed(spark):
    """q1: relevant {a, c}; results a@1, b@2, c@3.
    recall = 1; MRR = 1; DCG = g1+g3, IDCG = g1+g2."""
    results = [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3)]
    truth = [("q1", "a"), ("q1", "c")]
    r, t = _frames(spark, results, truth)
    row = ranking_metrics(r, t, "q", "d", "rank", k=10).collect()[0]
    g = [int(1_000_000 / math.log2(i + 1)) for i in range(1, 11)]
    assert row["recall_at_k_ppm"] == 1_000_000
    assert row["mrr_ppm"] == 1_000_000
    assert row["ndcg_ppm"] == (g[0] + g[2]) * 1_000_000 // (g[0] + g[1])


@pytest.mark.deep
def test_unanswered_query_scores_zero(spark):
    """A query in truth with NO results must drag the means down."""
    results = [("q1", "a", 1)]
    truth = [("q1", "a"), ("q2", "z")]
    r, t = _frames(spark, results, truth)
    row = ranking_metrics(r, t, "q", "d", "rank", k=5).collect()[0]
    assert row["n_queries"] == 2
    assert row["recall_at_k_ppm"] == 500_000  # (1.0 + 0.0) / 2
    assert row["mrr_ppm"] == 500_000
    assert row["ndcg_ppm"] == 500_000


def test_rank_beyond_k_ignored_and_first_hit_rank(spark):
    results = [
        ("q1", "x", 1), ("q1", "y", 2), ("q1", "a", 3), ("q1", "b", 99)
    ]
    truth = [("q1", "a"), ("q1", "b")]
    r, t = _frames(spark, results, truth)
    row = ranking_metrics(r, t, "q", "d", "rank", k=3).collect()[0]
    # only a@3 lands inside k: recall 1/2, MRR 1/3 floored
    assert row["recall_at_k_ppm"] == 500_000
    assert row["mrr_ppm"] == 1_000_000 // 3


def test_matches_python_model_randomized(spark):
    import random

    rng = random.Random(61)
    k = 5
    queries = [f"q{i}" for i in range(20)]
    docs = [f"d{i}" for i in range(30)]
    results, truth = [], []
    for q in queries:
        ranked = rng.sample(docs, k)
        results += [(q, d, i + 1) for i, d in enumerate(ranked)]
        truth += [(q, d) for d in rng.sample(docs, rng.randrange(1, 6))]
    r, t = _frames(spark, results, truth)
    row = ranking_metrics(r, t, "q", "d", "rank", k=k).collect()[0]

    inv = [1_000_000 // x for x in range(1, k + 1)]
    g = [int(1_000_000 / math.log2(x + 1)) for x in range(1, k + 1)]
    pre = [sum(g[: i + 1]) for i in range(k)]
    rec_s = mrr_s = ndcg_s = 0
    tru = {}
    for q, d in truth:
        tru.setdefault(q, set()).add(d)
    res = {}
    for q, d, rk in results:
        res.setdefault(q, {})[d] = rk
    for q, rel in tru.items():
        hits = sorted(
            rk for d, rk in res.get(q, {}).items() if d in rel and rk <= k
        )
        rec_s += len(hits) * 1_000_000 // len(rel)
        mrr_s += inv[hits[0] - 1] if hits else 0
        dcg = sum(g[rk - 1] for rk in hits)
        ndcg_s += dcg * 1_000_000 // pre[min(len(rel), k) - 1]
    n = len(tru)
    assert row["n_queries"] == n
    assert row["recall_at_k_ppm"] == rec_s // n
    assert row["mrr_ppm"] == mrr_s // n
    assert row["ndcg_ppm"] == ndcg_s // n


def test_duplicate_truth_collapsed_and_k_validation(spark):
    results = [("q1", "a", 1)]
    truth = [("q1", "a"), ("q1", "a")]
    r, t = _frames(spark, results, truth)
    row = ranking_metrics(r, t, "q", "d", "rank", k=3).collect()[0]
    assert row["recall_at_k_ppm"] == 1_000_000  # |relevant| = 1, not 2
    with pytest.raises(ValueError, match="k"):
        ranking_metrics(r, t, "q", "d", "rank", k=0)


def test_facade_hook(spark):
    from pybabe_spark.plans.facade import Babe

    r = spark.createDataFrame([("q", "a", 1)], "q string, d string, rank int")
    t = spark.createDataFrame([("q", "a")], "q string, d string")
    out = Babe(r).ranking_metrics(Babe(t), "q", "d", "rank", k=3)
    assert out.df.collect()[0]["mrr_ppm"] == 1_000_000


# -- rbo_overlap -------------------------------------------------------------------


def _rk(spark, rows):
    return spark.createDataFrame(rows, "q string, d string, rank int")


def test_rbo_identical_rankings_full_truncated_weight(spark):
    from pybabe_spark.operators.ranking import _rbo_suffix_ppm, rbo_overlap

    rows = [("q1", f"d{i}", i) for i in range(1, 6)]
    out = rbo_overlap(
        _rk(spark, rows), _rk(spark, rows), "q", "d", "rank", k=5
    ).collect()
    # every doc matches at depth m = its own rank → Σ S[m]
    suffix = _rbo_suffix_ppm(5, 0.9)
    assert out[0]["rbo_ppm"] == sum(suffix)
    # and that total is the full truncated weight Σ_{d<=k} w_d (ppm-ish,
    # floored per term so allow the k-ulp slack)
    w_total = sum(0.1 * 0.9 ** (d - 1) for d in range(1, 6))
    assert abs(out[0]["rbo_ppm"] - w_total * 1_000_000) <= 5


def test_rbo_disjoint_rankings_zero(spark):
    from pybabe_spark.operators.ranking import rbo_overlap

    ra = [("q1", f"a{i}", i) for i in range(1, 4)]
    rb = [("q1", f"b{i}", i) for i in range(1, 4)]
    out = rbo_overlap(_rk(spark, ra), _rk(spark, rb), "q", "d", "rank", k=3)
    assert out.collect()[0]["rbo_ppm"] == 0


def test_rbo_top_rank_agreement_weighs_most(spark):
    """Same single shared doc: shared at rank 1 in both lists scores
    strictly higher than shared at rank 3 in both lists."""
    from pybabe_spark.operators.ranking import rbo_overlap

    base = [("q1", "x1", 2), ("q1", "x2", 3)]
    top = [("q1", "s", 1)] + base
    bot = [("q1", "x1", 1), ("q1", "x2", 2), ("q1", "s", 3)]
    hi = rbo_overlap(
        _rk(spark, top), _rk(spark, top), "q", "d", "rank", k=3
    ).collect()[0]["rbo_ppm"]
    # compare the SHARED-DOC-ONLY contribution: rank-1-vs-rank-1 beats
    # rank-3-vs-rank-3
    from pybabe_spark.operators.ranking import _rbo_suffix_ppm

    s = _rbo_suffix_ppm(3, 0.9)
    assert s[0] > s[2]
    lo = rbo_overlap(
        _rk(spark, bot), _rk(spark, [("q1", "s", 3)]), "q", "d", "rank", k=3
    ).collect()[0]["rbo_ppm"]
    assert lo == s[2] and hi > lo


def test_rbo_query_in_one_system_scores_zero(spark):
    from pybabe_spark.operators.ranking import rbo_overlap

    ra = [("q1", "d1", 1), ("q2", "d1", 1)]
    rb = [("q1", "d1", 1)]
    got = {
        r["q"]: r["rbo_ppm"]
        for r in rbo_overlap(
            _rk(spark, ra), _rk(spark, rb), "q", "d", "rank", k=3
        ).collect()
    }
    assert got["q2"] == 0 and got["q1"] > 0
    assert set(got) == {"q1", "q2"}


def test_rbo_matches_python_model(spark):
    import random

    from pybabe_spark.operators.ranking import _rbo_suffix_ppm, rbo_overlap

    rng = random.Random(83)
    k = 6
    docs = [f"d{i}" for i in range(15)]
    ra, rb = [], []
    for q in [f"q{i}" for i in range(12)]:
        la = rng.sample(docs, k)
        lb = rng.sample(docs, k)
        ra += [(q, d, i + 1) for i, d in enumerate(la)]
        rb += [(q, d, i + 1) for i, d in enumerate(lb)]
    got = {
        r["q"]: r["rbo_ppm"]
        for r in rbo_overlap(
            _rk(spark, ra), _rk(spark, rb), "q", "d", "rank", k=k
        ).collect()
    }
    suffix = _rbo_suffix_ppm(k, 0.9)
    A, B = {}, {}
    for q, d, r in ra:
        A.setdefault(q, {})[d] = r
    for q, d, r in rb:
        B.setdefault(q, {})[d] = r
    for q in A:
        expect = sum(
            suffix[max(ra_, B[q][d]) - 1]
            for d, ra_ in A[q].items()
            if d in B[q]
        )
        assert got[q] == expect, q


def test_rbo_validation_and_facade(spark):
    from pybabe_spark.operators.ranking import rbo_overlap
    from pybabe_spark.plans.facade import Babe

    r = _rk(spark, [("q", "d", 1)])
    with pytest.raises(ValueError, match="p "):
        rbo_overlap(r, r, "q", "d", "rank", p=1.0)
    out = Babe(r).rbo_overlap(Babe(r), "q", "d", "rank", k=3)
    assert out.df.collect()[0]["rbo_ppm"] > 0


def test_matryoshka_recall_key(spark, sf_dir):
    """Registry key end-to-end: truncated-vs-full retrieval recall is a
    single row, with recall at most 1e6 and MORE dims = perfect
    self-recall sanity (64 vs 64 must be 1.0)."""
    from pybabe_spark.queries import all_queries

    qs = all_queries()
    row = qs["matryoshka_recall_embeddings"](spark, sf_dir).collect()[0]
    assert row["n_queries"] == 5
    assert 0 <= row["recall_at_k_ppm"] <= 1_000_000
    assert 0 <= row["ndcg_ppm"] <= 1_000_000


def test_truncated_self_recall_is_perfect(spark, sf_dir):
    """Control: ranking a width against ITSELF through the same
    composition scores exactly 1.0 on all three metrics."""
    from pyspark.sql import Window

    from pybabe_spark.operators.ranking import ranking_metrics
    from pybabe_spark.operators.similarity import ann_brute_force
    from pybabe_spark.sources.io import read_table
    import pyspark.sql.functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    top = ann_brute_force(emb, queries, k=5)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    ranked = top.select(
        "query_id", "neighbor_id", F.row_number().over(w).alias("rank")
    )
    row = ranking_metrics(
        ranked, ranked.select("query_id", "neighbor_id"),
        "query_id", "neighbor_id", "rank", k=5,
    ).collect()[0]
    assert (row["recall_at_k_ppm"], row["mrr_ppm"], row["ndcg_ppm"]) == (
        1_000_000, 1_000_000, 1_000_000,
    )
