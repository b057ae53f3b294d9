"""Z-order layout (operators/layout.py): exact interleave + stats."""

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.layout import (
    zorder_key,
    zorder_layout,
    zorder_stats,
)


def _mk(spark, rows, schema="x double, y double"):
    return spark.createDataFrame(rows, schema)


def test_known_interleave(spark):
    # x,y ∈ {0..3}, bits=2: min=0 max=3 → bucket = v (cents scale
    # cancels: (v·100 − 0)·3 div 300 = v). zkey = interleave bits:
    # x bit b at 2b, y bit b at 2b+1 → Morton order
    rows = [(float(x), float(y)) for x in range(4) for y in range(4)]
    out = zorder_key(_mk(spark, rows), ["x", "y"], bits=2)
    got = {(r["x"], r["y"]): r["zkey"] for r in out.collect()}
    def morton(x, y):
        z = 0
        for b in range(2):
            z += ((x >> b) & 1) << (2 * b)
            z += ((y >> b) & 1) << (2 * b + 1)
        return z
    for (x, y), z in got.items():
        assert z == morton(int(x), int(y))
    # Morton(3,3) = 15 — the full 4-bit space is used
    assert got[(3.0, 3.0)] == 15


def test_null_and_constant_columns(spark):
    rows = [(1.0, 5.0), (2.0, 5.0), (None, 5.0)]
    out = zorder_key(_mk(spark, rows), ["x", "y"], bits=4)
    got = {r["x"]: r["zkey"] for r in out.collect()}
    assert got[None] is None
    # y constant → bucket 0 contributes nothing; x spans min..max
    assert got[1.0] == 0 and got[2.0] > 0


def test_validation(spark):
    df = _mk(spark, [(1.0, 2.0)])
    with pytest.raises(ValueError, match="2-4 columns"):
        zorder_key(df, ["x"])
    with pytest.raises(ValueError, match="within 1..63"):
        zorder_key(df, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="power of 2"):
        zorder_stats(df, ["x", "y"], num_files=6)


def test_lazy_no_job_at_construction(spark):
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = _mk(spark, [(1.0, 2.0), (3.0, 4.0)])
    keyed = zorder_key(df, ["x", "y"], bits=8)
    keyed.schema  # analysis only
    assert tracker.getJobIdsForGroup(None) == before


def test_stats_pruning_power(spark):
    # clustered data: z-files must have per-column ranges far narrower
    # than the global range on BOTH columns
    rows = [
        (float(x), float(y))
        for x in range(64)
        for y in range(64)
    ]
    st = zorder_stats(
        _mk(spark, rows), ["x", "y"], bits=6, num_files=16
    ).collect()
    assert sum(r["n_rows"] for r in st) == 64 * 64
    # global span is 6300 cents per column; every file must span ≤ half
    for r in st:
        assert r["max_x"] - r["min_x"] <= 3200
        assert r["max_y"] - r["min_y"] <= 3200


def test_layout_files_are_zkey_ordered(spark):
    rows = [(float(x), float(x * 7 % 50)) for x in range(500)]
    laid = zorder_layout(_mk(spark, rows), ["x", "y"], bits=8, num_files=8)
    parts = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    # range partitioning: partition key ranges are disjoint & ordered
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] <= b["lo"]


def test_facade_hook(spark):
    from pybabe_spark.plans.facade import Babe

    df = _mk(spark, [(1.0, 2.0), (3.0, 4.0)])
    out = Babe(df).zorder_key(["x", "y"], bits=4)
    assert "zkey" in out.df.columns
