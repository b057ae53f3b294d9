"""Naive Bayes (operators/nb.py): counting classifier semantics."""

from pybabe_spark.operators.nb import nb_predict, train_naive_bayes


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_learns_separable_vocab(spark):
    train = _docs(
        spark,
        [
            (1, "hund katze hund", "de"),
            (2, "katze hund maus", "de"),
            (3, "dog cat dog", "en"),
            (4, "cat dog mouse", "en"),
        ],
    )
    model = train_naive_bayes(train, "lang")
    test = _docs(
        spark,
        [(10, "hund maus", None), (11, "dog mouse cat", None)],
    )
    got = {r["doc_id"]: r["label"] for r in nb_predict(test, model).collect()}
    assert got == {10: "de", 11: "en"}


def test_unseen_tokens_take_floor_and_priors_decide(spark):
    # 3 'a'-docs vs 1 'b'-doc, identical vocab per class: a fully
    # unseen test doc must fall to the prior → majority class 'a'
    train = _docs(
        spark,
        [(1, "x", "a"), (2, "x", "a"), (3, "x", "a"), (4, "y", "b")],
    )
    model = train_naive_bayes(train, "lang")
    out = nb_predict(_docs(spark, [(9, "zzz qqq", None)]), model).collect()
    assert out[0]["label"] == "a"
    assert out[0]["n_tokens"] == 2


def test_model_scores_are_exact_decimal_sums(spark):
    import math
    from decimal import Decimal

    train = _docs(spark, [(1, "p q", "a"), (2, "r r", "b")])
    model = train_naive_bayes(train, "lang")
    out = nb_predict(_docs(spark, [(9, "p p r", None)]), model).collect()[0]
    # class a: T=2, V=3: prior ln(1/2); p seen c=1 → ln(2/5) ×2;
    # r unseen → ln(1/5)
    def r6(v):
        return Decimal(v).quantize(Decimal("0.000001"))
    want_a = r6(math.log(0.5)) + 2 * r6(math.log(2 / 5)) + r6(math.log(1 / 5))
    # class b: r seen c=2 → ln(3/5); p unseen ×2 → ln(1/5)
    want_b = r6(math.log(0.5)) + r6(math.log(3 / 5)) + 2 * r6(math.log(1 / 5))
    want_label = "a" if want_a > want_b else "b"
    assert out["label"] == want_label
    assert abs(out["score"] - float(max(want_a, want_b))) < 1e-9


def test_null_labels_excluded_from_training(spark):
    train = _docs(
        spark, [(1, "u v", "a"), (2, "w", None), (3, "u", "b")]
    )
    model = train_naive_bayes(train, "lang")
    labels = {r["label"] for r in model.classes.collect()}
    assert labels == {"a", "b"}


def test_tie_breaks_to_smallest_label(spark):
    # perfectly symmetric classes → identical scores → label asc
    train = _docs(spark, [(1, "x", "b"), (2, "x", "a")])
    model = train_naive_bayes(train, "lang")
    out = nb_predict(_docs(spark, [(9, "x", None)]), model).collect()
    assert out[0]["label"] == "a"


# -- calibration_bins (operators/classifier.py) -----------------------------------


def test_calibration_hand_checked(spark):
    from pybabe_spark.operators.classifier import calibration_bins

    rows = [
        (0.05, 0), (0.05, 0), (0.05, 1),   # bin 0: rate 1/3, mean 50000
        (0.95, 1), (0.95, 1),              # bin 9: rate 1, mean 950000
        (1.0, 1),                          # clamps into bin 9
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["bin"]: r for r in
           calibration_bins(df, "score", "label", 10).collect()}
    assert set(got) == {0, 9}
    b0, b9 = got[0], got[9]
    assert (b0.n, b0.n_pos) == (3, 1)
    assert b0.pos_rate_ppm == 333333 and b0.mean_score_ppm == 50000
    assert b0.gap_ppm == 333333 - 50000
    assert (b9.n, b9.n_pos) == (3, 3)
    assert b9.mean_score_ppm == (950000 + 950000 + 1000000) // 3
    assert b9.pos_rate_ppm == 1000000


def test_calibration_nulls_and_nonbinary_labels(spark):
    from pybabe_spark.operators.classifier import calibration_bins

    rows = [(0.5, 2), (0.5, 0), (None, 1), (0.5, None)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = calibration_bins(df, "score", "label", 10).collect()
    assert len(got) == 1
    r = got[0]
    assert r.bin == 5 and r.n == 2 and r.n_pos == 1  # label 2 counts


def test_calibration_validation(spark):
    import pytest

    from pybabe_spark.operators.classifier import calibration_bins

    df = spark.createDataFrame([(0.5, 1)], "score double, label int")
    with pytest.raises(ValueError):
        calibration_bins(df, "score", "label", 1)
