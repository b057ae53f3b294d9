"""containment_pairs (asymmetric near-dup) and ann_hard_negatives
unit behavior on hand-built fixtures."""

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.dedup_scale import containment_pairs
from pybabe_spark.operators.similarity import ann_hard_negatives


def _docs(spark):
    rows = [
        # doc 2 is doc 1's text quoted inside noise: containment(2→1)=1,
        # but Jaccard is low
        (1, "alpha beta gamma delta"),
        (2, "x1 y1 alpha beta gamma delta z1 w1 q1 r1 s1 t1 u1 v1 a1 b1"),
        (3, "totally different words here nothing shared at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_catches_quote_inclusion(spark):
    out = containment_pairs(
        _docs(spark), "doc_id", "text", threshold=0.9, shingle_n=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"], r["contained_id"]) == (1, 2, 1)
    assert r["containment"] == 1.0  # all of doc 1's 2-grams are in doc 2
    # sanity: the same pair's Jaccard is far below any dedup threshold
    from pybabe_spark.operators.dedup_scale import jaccard_pairs

    jp = jaccard_pairs(
        _docs(spark), "doc_id", "text", threshold=0.5, shingle_n=2
    ).collect()
    assert jp == []


def test_containment_stop_shingle_valve(spark):
    # the shared shingles appear in 2 docs; max_shingle_df=1 removes
    # them all -> no candidates survive (recall trade, join bounded)
    out = containment_pairs(
        _docs(spark), "doc_id", "text", threshold=0.5, shingle_n=2,
        max_shingle_df=1,
    ).collect()
    assert out == []


def test_containment_threshold_is_exact_integer_decision(spark):
    rows = [
        (1, "a b c d"),       # 2-grams: ab bc cd (3)
        (2, "a b c x y z"),   # shares ab bc -> c=2, min=3 -> 2/3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # containment is exactly 2/3; the ppm quantization is documented:
    # 0.666666 (floor) admits it, round(2/3*1e6)=666667 excludes it
    hit = containment_pairs(df, "doc_id", "text", threshold=0.666666,
                            shingle_n=2).collect()
    assert len(hit) == 1 and hit[0]["contained_id"] == 1
    miss = containment_pairs(df, "doc_id", "text", threshold=2 / 3,
                             shingle_n=2).collect()
    assert miss == []


def _emb(spark):
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.99, 0.14], 1),   # same label — nearest but NOT a negative
        (2, [0.9, 0.44], 2),    # nearest wrong-label
        (3, [0.0, 1.0], 2),
        (4, [0.5, 0.87], None),  # NULL label: distinct from everything
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_hard_negatives_exclude_same_label_and_self(spark):
    emb = _emb(spark)
    out = ann_hard_negatives(
        emb, emb.filter(F.col("vec_id") == 0), k=2
    ).collect()
    ids = [r["neighbor_id"] for r in out]
    assert ids == [2, 4]  # 1 excluded (same label), 0 excluded (self)
    assert out[0]["sim"] > out[1]["sim"]


def test_hard_negatives_null_label_query_sees_all_labeled(spark):
    emb = _emb(spark)
    out = ann_hard_negatives(
        emb, emb.filter(F.col("vec_id") == 4), k=10
    ).collect()
    # NULL is distinct from 1, 2 AND from the other NULL-labeled rows
    assert {r["neighbor_id"] for r in out} == {0, 1, 2, 3}


def test_new_ops_plan_lint(spark):
    from pybabe_spark.plans.lint import plan_lint

    codes = {c for c, _ in plan_lint(
        containment_pairs(_docs(spark), "doc_id", "text")
    )}
    assert codes == set()
    emb = _emb(spark)
    codes = {c for c, _ in plan_lint(
        ann_hard_negatives(emb, emb.filter(F.col("vec_id") == 0), k=2)
    )}
    assert codes <= {"broadcast-nested-loop"}


def test_novelty_score_fractions(spark):
    from pybabe_spark.operators.decontam import novelty_score

    probe = spark.createDataFrame(
        [(1, "a b c d"),        # 2-grams ab bc cd: ab seen -> 2/3 novel
         (2, "x y z w")],       # fully novel
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(10, "a b q r")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           novelty_score(probe, ref, n=2).collect()}
    assert out[1]["n_shingles"] == 3
    assert out[1]["novelty"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[2]["novelty"] == 1.0


def test_novelty_plan_lints_clean(spark):
    from pybabe_spark.operators.decontam import novelty_score
    from pybabe_spark.plans.lint import plan_lint

    probe = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    ref = spark.createDataFrame([(2, "a b")], "doc_id long, text string")
    assert plan_lint(novelty_score(probe, ref, n=2)) == []


def test_containment_matches_bruteforce_model(spark):
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(25):
        n = rng.randint(2, 14)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def shingles(text, n=2):
        w = text.split(" ")
        if len(w) < n:
            return {text}
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    thr_ppm = 600000
    want = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            sa, sb = shingles(ta), shingles(tb)
            c = len(sa & sb)
            m = min(len(sa), len(sb))
            if c * 1_000_000 >= thr_ppm * m:
                contained = ia if len(sa) <= len(sb) else ib
                want[(ia, ib)] = (contained, c / m)

    got = {
        (r["id_a"], r["id_b"]): (r["contained_id"], r["containment"])
        for r in containment_pairs(
            df, "doc_id", "text", threshold=0.6, shingle_n=2
        ).collect()
    }
    assert set(got) == set(want)
    for k, (cid, cont) in want.items():
        assert got[k][0] == cid, k
        assert abs(got[k][1] - cont) < 1e-12, k
