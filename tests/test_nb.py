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
