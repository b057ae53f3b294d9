"""table_diff: added/removed/changed classification, null-safe value
compare, NULL-key non-matching, schema-order changed_cols."""

from pybabe_spark.operators.merge import table_diff


def _rows(df):
    return sorted(
        (r["k"], r["change"], r["changed_cols"]) for r in df.collect()
    )


def test_classification_and_changed_cols(spark):
    a = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, None, 40)],
        "k int, s string, v int",
    )
    b = spark.createDataFrame(
        [(1, "x", 10), (2, "Y", 21), (4, None, 40), (5, "new", 50)],
        "k int, s string, v int",
    )
    got = _rows(table_diff(a, b, "k"))
    assert got == [
        (2, "changed", "s,v"),
        (3, "removed", ""),
        (5, "added", ""),
    ]


def test_null_value_is_a_change_null_to_null_is_not(spark):
    a = spark.createDataFrame([(1, None), (2, "x")], "k int, s string")
    b = spark.createDataFrame([(1, None), (2, None)], "k int, s string")
    got = _rows(table_diff(a, b, "k"))
    assert got == [(2, "changed", "s")]


def test_null_keys_never_match(spark):
    a = spark.createDataFrame([(None, "x")], "k int, s string")
    b = spark.createDataFrame([(None, "x")], "k int, s string")
    got = _rows(table_diff(a, b, "k"))
    assert got == [(None, "added", ""), (None, "removed", "")]


def test_compare_cols_subset(spark):
    a = spark.createDataFrame([(1, "x", 1)], "k int, s string, v int")
    b = spark.createDataFrame([(1, "x", 999)], "k int, s string, v int")
    assert table_diff(a, b, "k", ["s"]).count() == 0
