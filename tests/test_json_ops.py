"""JSON extraction: typed flatten, lenient malformed handling, codegen
purity."""

from pybabe_spark.functions.json_ops import json_flatten, json_get


def test_flatten_types_and_lenient_nulls(spark):
    df = spark.createDataFrame(
        [
            ('{"k": 69, "u": {"n": "bob"}, "a": [1,2], "b": true}',),
            (None,),
            ("notjson",),
            ('{"k": "notanint"}',),
        ],
        "props string",
    )
    out = json_flatten(
        df, "props",
        {"k": "int", "u.n": "string", "a[1]": "int", "b": "boolean"},
        keep=True,
    ).collect()
    assert (out[0]["k"], out[0]["u_n"], out[0]["a_1"], out[0]["b"]) == (
        69, "bob", 2, True)
    assert all(out[1][c] is None for c in ("k", "u_n", "a_1", "b"))
    assert all(out[2][c] is None for c in ("k", "u_n", "a_1", "b"))
    assert out[3]["k"] is None  # type-mismatch degrades to NULL


def test_drop_and_prefix(spark):
    df = spark.createDataFrame([('{"k": 1}',)], "props string")
    out = json_flatten(df, "props", {"k": "int"}, prefix="p_")
    assert out.columns == ["p_k"]


def test_json_get_absolute_path(spark):
    df = spark.createDataFrame([('{"k": 5}',)], "j string")
    assert df.select(json_get("j", "$.k").alias("v")).collect()[0]["v"] == "5"


def test_codegen_only(spark):
    df = spark.createDataFrame([('{"k": 1}',)], "props string")
    plan = (
        json_flatten(df, "props", {"k": "int"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
