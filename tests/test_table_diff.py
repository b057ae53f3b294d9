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


# -- golden_record (operators/merge.py) --------------------------------------


def test_golden_record_per_column_survivorship(spark):
    from pybabe_spark.operators.merge import golden_record

    rows = [
        # cluster 1: newest row (ts 3) lacks phone; older row has it
        (1, 1, "alice", None, 10.0),
        (1, 2, None, "555-1", None),
        (1, 3, "alicia", None, 30.0),
        # cluster 2: single row
        (2, 1, "bob", "555-2", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "c int, ts int, name string, phone string, bal double"
    )
    got = {
        r["c"]: (r["name"], r["phone"], r["bal"], r["n_members"])
        for r in golden_record(df, "c", "ts").collect()
    }
    # per-column: name/bal from ts3, phone survives from ts2
    assert got[1] == ("alicia", "555-1", 30.0, 3)
    assert got[2] == ("bob", "555-2", 5.0, 1)


def test_golden_record_all_null_column_stays_null(spark):
    from pybabe_spark.operators.merge import golden_record

    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, None)], "c int, ts int, v string"
    )
    r = golden_record(df, "c", "ts").collect()[0]
    assert r["v"] is None and r["n_members"] == 2


def test_golden_record_facade(spark):
    from pybabe_spark.plans.facade import Babe

    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 2, None)], "c int, ts int, v string"
    )
    out = Babe(df).golden_record("c", "ts")
    assert out.df.collect()[0]["v"] == "x"
