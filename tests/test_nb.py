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


# ---------------------------------------------------------------------------
# brier_score / disparate_impact (operators/classifier.py)
# ---------------------------------------------------------------------------


def test_brier_matches_python_model(spark):
    import random

    from pybabe_spark.operators.classifier import brier_score

    rng = random.Random(31)
    rows = [
        (round(rng.random(), 6), 1 if rng.random() < 0.4 else 0)
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    r = brier_score(df, "score", "label").collect()[0]

    micros = [(int(round(s * 1e6)), y) for s, y in rows]
    n = len(micros)
    npos = sum(y for _, y in micros)
    ss = sum((m - y * 1_000_000) ** 2 for m, y in micros)
    assert r["n"] == n and r["n_pos"] == npos
    assert r["brier_ppm"] == ss // (n * 1_000_000)
    assert r["base_rate_ppm"] == npos * 1_000_000 // n
    assert r["skill_ppm"] == 1_000_000 - (ss * n) // (
        npos * (n - npos) * 1_000_000
    )


def test_brier_perfect_and_degenerate(spark):
    from pybabe_spark.operators.classifier import brier_score

    perfect = [(1.0, 1)] * 5 + [(0.0, 0)] * 5
    df = spark.createDataFrame(perfect, "score double, label int")
    r = brier_score(df, "score", "label").collect()[0]
    assert r["brier_ppm"] == 0 and r["skill_ppm"] == 1_000_000

    # base-rate predictor scores skill 0 (within floor rounding)
    base = [(0.5, 1)] * 5 + [(0.5, 0)] * 5
    df = spark.createDataFrame(base, "score double, label int")
    r = brier_score(df, "score", "label").collect()[0]
    assert r["brier_ppm"] == 250_000 and r["skill_ppm"] == 0

    # one-class labels: skill undefined
    one = [(0.7, 1)] * 4
    df = spark.createDataFrame(one, "score double, label int")
    r = brier_score(df, "score", "label").collect()[0]
    assert r["skill_ppm"] is None and r["brier_ppm"] == 90_000


def test_disparate_impact_hand_checked(spark):
    from pybabe_spark.operators.classifier import disparate_impact

    rows = (
        [("en", 1)] * 80 + [("en", 0)] * 20      # 80% kept
        + [("zh", 1)] * 30 + [("zh", 0)] * 70    # 30% kept
        + [("fr", 1)] * 64 + [("fr", 0)] * 36    # 64% kept
        + [("tiny", 1)] * 5                      # under min_n: excluded
    )
    df = spark.createDataFrame(rows, "lang string, kept int")
    got = {r["group"]: r for r in
           disparate_impact(df, "lang", "kept", min_n=20).collect()}
    assert set(got) == {"en", "zh", "fr"}
    assert got["en"]["di_ppm"] == 1_000_000
    assert got["zh"]["di_ppm"] == 375_000  # 0.30/0.80
    assert got["zh"]["below_four_fifths"] is True
    assert got["fr"]["di_ppm"] == 800_000  # exactly at the rule: not below
    assert got["fr"]["below_four_fifths"] is False


def test_disparate_impact_degenerate(spark):
    from pybabe_spark.operators.classifier import disparate_impact

    # all-zero rates: ratio undefined -> NULL di
    rows = [("a", 0)] * 25 + [("b", 0)] * 25
    df = spark.createDataFrame(rows, "g string, p int")
    got = disparate_impact(df, "g", "p", min_n=20).collect()
    assert all(r["di_ppm"] is None for r in got)

    import pytest

    with pytest.raises(ValueError):
        disparate_impact(df, "g", "p", min_n=0)
