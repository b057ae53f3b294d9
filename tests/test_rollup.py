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
