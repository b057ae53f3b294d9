"""Incremental rollup: append == rebuild exactly, multi-append chains,
coarser-dim queries, non-mergeable rejection."""

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.rollup import (
    rollup_append,
    rollup_build,
    rollup_query,
    rollup_read,
)

MEASURES = {"v": "sum", "x": "min", "y": "max", "v2": "count"}


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [
            (
                f"g{i % 3}",
                f"h{i % 2}",
                float(i) + 0.1,
                i,
                -i,
                None if i % 5 == 0 else i,
            )
            for i in range(lo, hi)
        ],
        "d1 string, d2 string, v double, x bigint, y bigint, v2 int",
    )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_append_equals_rebuild(spark, tmp_path):
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    rollup_build(_mk(spark, 0, 60), ["d1", "d2"], MEASURES, inc)
    rollup_append(_mk(spark, 60, 100), inc, ["d1", "d2"], MEASURES)
    rollup_append(_mk(spark, 100, 130), inc, ["d1", "d2"], MEASURES)
    rollup_build(_mk(spark, 0, 130), ["d1", "d2"], MEASURES, full)
    got = _rows(rollup_read(spark, inc, MEASURES))
    want = _rows(rollup_read(spark, full, MEASURES))
    assert got == want and len(got) == 6


def test_query_coarser_dims(spark, tmp_path):
    p = str(tmp_path / "r")
    df = _mk(spark, 0, 90)
    rollup_build(df, ["d1", "d2"], MEASURES, p)
    got = _rows(rollup_query(spark, p, ["d1"], MEASURES))
    want = _rows(
        df.groupBy("d1").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("v").cast("decimal(18,6)"))
            .cast("double")
            .alias("v_sum"),
            F.min("x").alias("x_min"),
            F.max("y").alias("y_max"),
            F.count("v2").alias("v2_count"),
        )
    )
    assert got == want


def test_new_dim_values_in_append(spark, tmp_path):
    p = str(tmp_path / "r")
    a = spark.createDataFrame([("a", "z", 1.0, 1, 1, 1)],
                              "d1 string, d2 string, v double, x bigint, y bigint, v2 int")
    b = spark.createDataFrame([("NEW", "z", 2.0, 2, 2, 2)],
                              "d1 string, d2 string, v double, x bigint, y bigint, v2 int")
    rollup_build(a, ["d1", "d2"], MEASURES, p)
    rollup_append(b, p, ["d1", "d2"], MEASURES)
    got = {r["d1"]: r["n_rows"] for r in rollup_read(spark, p, MEASURES).collect()}
    assert got == {"a": 1, "NEW": 1}


def test_non_mergeable_rejected(spark, tmp_path):
    df = _mk(spark, 0, 5)
    with pytest.raises(ValueError, match="not mergeable"):
        rollup_build(df, ["d1"], {"v": "avg"}, str(tmp_path / "r"))


def test_first_last_measures_append_equals_rebuild(spark, tmp_path):
    """first:ts/last:ts witnesses fold exactly across appends — the
    OHLC open/close shape as stored mergeable state."""
    import os

    from pybabe_spark.operators.rollup import (
        rollup_append,
        rollup_build,
        rollup_read,
    )

    measures = {"v": "first:ts", "w": "last:ts"}
    rows1 = [("a", 5, 50.0, 500.0), ("a", 1, 10.0, 100.0),
             ("b", 3, 30.0, 300.0)]
    rows2 = [("a", 9, 90.0, 900.0), ("a", 0, 0.5, 5.0),
             ("c", 7, 70.0, 700.0)]
    schema = "d string, ts int, v double, w double"
    p1 = str(tmp_path / "roll")
    rollup_build(spark.createDataFrame(rows1, schema), ["d"], measures, p1)
    rollup_append(spark.createDataFrame(rows2, schema), p1, ["d"], measures)
    got = {
        r["d"]: (r["v_first"], r["w_last"], r["n_rows"])
        for r in rollup_read(spark, p1, measures).collect()
    }
    # a: first by ts over BOTH batches is ts=0 → 0.5; last is ts=9 → 900
    assert got == {
        "a": (0.5, 900.0, 4),
        "b": (30.0, 300.0, 1),
        "c": (70.0, 700.0, 1),
    }
    # rebuild over the union must match the incremental fold exactly
    p2 = str(tmp_path / "full")
    rollup_build(
        spark.createDataFrame(rows1 + rows2, schema), ["d"], measures, p2
    )
    want = {
        r["d"]: (r["v_first"], r["w_last"], r["n_rows"])
        for r in rollup_read(spark, p2, measures).collect()
    }
    assert got == want
    assert os.path.isdir(p1)


def test_first_last_survive_coarser_query(spark, tmp_path):
    from pybabe_spark.operators.rollup import rollup_build, rollup_query

    measures = {"v": "first:ts"}
    rows = [("a", "x", 2, 20.0), ("a", "y", 1, 10.0), ("b", "x", 3, 30.0)]
    p = str(tmp_path / "roll")
    rollup_build(
        spark.createDataFrame(rows, "d1 string, d2 string, ts int, v double"),
        ["d1", "d2"],
        measures,
        p,
    )
    got = {
        r["d1"]: r["v_first"]
        for r in rollup_query(spark, p, ["d1"], measures).collect()
    }
    # coarsening to d1 re-picks the earliest witness across d2 cells
    assert got == {"a": 10.0, "b": 30.0}


def test_first_without_order_rejected(spark):
    import pytest

    from pybabe_spark.operators.rollup import rollup_build

    with pytest.raises(ValueError, match="needs an order column"):
        rollup_build(
            spark.createDataFrame([("a", 1.0)], "d string, v double"),
            ["d"],
            {"v": "first"},
            "/tmp/never",
        )
