"""Count-min sketch: overcount-only guarantee, cross-engine
bit-identity, and linearity (merge == build-over-union)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.sketch import (
    cms_build,
    cms_estimate_sql,
    cms_lookup,
    cms_merge,
)


def _est(spark, df, width=64, depth=3):
    cms = cms_build(df, "k", width, depth)
    return dict(
        (r["k"], r["cms_count"])
        for r in cms_lookup(cms, df, "k", width, depth).collect()
    )


def test_overcount_only_and_exact_when_wide(spark):
    df = spark.createDataFrame(
        [(i % 50,) for i in range(5000)] + [(999,)], "k bigint"
    )
    true = {k: 100 for k in range(50)}
    true[999] = 1
    # tight width: estimates may exceed but never undercount
    est = _est(spark, df, width=64, depth=3)
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)
    # generous width: all estimates exact
    est_wide = _est(spark, df, width=8192, depth=4)
    assert est_wide == true


def test_cross_engine_bit_identity(spark):
    df = spark.createDataFrame(
        [((i * 7) % 97,) for i in range(3000)], "k bigint"
    )
    got = sorted(_est(spark, df, width=64, depth=3).items())
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = sorted(
        map(tuple, con.execute(cms_estimate_sql("t", "k", 64, 3)).fetchall())
    )
    assert got == want


def test_merge_equals_build_over_union(spark):
    df = spark.createDataFrame([(i % 40,) for i in range(4000)], "k bigint")
    h1 = cms_build(df.filter("k < 20"), "k", 64, 3)
    h2 = cms_build(df.filter("k >= 20"), "k", 64, 3)
    merged = cms_merge(h1, h2)
    got = sorted(
        (r["k"], r["cms_count"])
        for r in cms_lookup(merged, df, "k", 64, 3).collect()
    )
    want = sorted(_est(spark, df, width=64, depth=3).items())
    assert got == want


def test_null_and_string_keys(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "k string"
    )
    est = _est(spark, df, width=256, depth=3)
    assert est["a"] == 2 and est["b"] == 1 and est[None] == 1


def test_type_guard(spark):
    df = spark.createDataFrame([(1.5,)], "k double")
    with pytest.raises(TypeError, match="integral or string"):
        cms_build(df, "k")
