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
