"""Expectations: rule semantics (NULL policy!), single-pass summary,
row quarantine."""

import pytest

from pybabe_spark.operators.validate import quarantine, validate


def _summary(df, rules):
    return {
        (r["rule"], r["col_name"]): r["violations"]
        for r in validate(df, rules).collect()
    }


def test_rule_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5.0, "ok-1"),
            (1, "b", 50.0, "bad"),
            (2, None, -1.0, "ok-2"),
            (3, "z", None, None),
        ],
        "k int, s string, v double, code string",
    )
    ref = spark.createDataFrame([("a",), ("z",)], "r string")
    got = _summary(
        df,
        [
            ("not_null", "s"),
            ("unique", ["k"]),
            ("range", "v", 0, 10),
            ("in_set", "s", ["a", "b"]),
            ("regexp", "code", "^ok-"),
            ("fk", "s", ref, "r"),
        ],
    )
    assert got == {
        ("not_null", "s"): 1,   # the NULL s
        ("unique", "k"): 1,     # two k=1 rows → 1 surplus
        ("range", "v"): 2,      # 50.0 and -1.0; NULL v passes
        ("in_set", "s"): 1,     # 'z'; NULL passes
        ("regexp", "code"): 1,  # 'bad'; NULL passes
        ("fk", "s"): 1,         # 'b' not in ref; NULL passes
    }


def test_empty_input_all_zero(spark):
    df = spark.createDataFrame([], "k int, s string")
    got = _summary(df, [("not_null", "s"), ("unique", ["k"])])
    assert got == {("not_null", "s"): 0, ("unique", "k"): 0}


def test_quarantine_tags_and_clean_split(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (None, 5.0)], "k int, v double"
    )
    out = quarantine(
        df, [("not_null", "k"), ("range", "v", 0, 10)]
    )
    tags = {r["k"]: r["violations"] for r in out.collect()}
    assert tags[1] == ""
    assert tags[2] == "range:v"
    assert tags[None] == "not_null:k"
    assert out.filter("violations = ''").count() == 1


def test_unknown_rule_raises(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="unknown rule"):
        validate(df, [("bogus", "k")])
