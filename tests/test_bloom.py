"""Bloom prefilter: no false negatives, exactness under forced false
positives, null/composite keys, prebuilt reuse."""

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.bloom import (
    BloomFilter,
    bloom_might_contain,
    build_bloom,
    dedup_against_bloom,
)
from pybabe_spark.operators.merge import dedup_against


@pytest.mark.deep
def test_no_false_negatives(spark):
    seen = spark.range(2000).selectExpr("concat('key_', id) as k")
    bf = build_bloom(seen, "k", m_bits=1 << 15, k=5)
    flagged = bloom_might_contain(seen, bf, "k")
    assert flagged.filter(~F.col("might_contain")).count() == 0


def test_exact_even_with_false_positives(spark):
    """A deliberately undersized filter (64 bits for 300 keys → nearly
    every probe is a hit) must still produce the exact anti-join result
    — the confirm join absorbs all false positives."""
    seen = spark.range(0, 600, 2).selectExpr("id as k")
    df = spark.range(600).selectExpr("id as k")
    bf = build_bloom(seen, "k", m_bits=64, k=2)
    assert bf.fill_ratio() > 0.9  # saturated on purpose
    got = sorted(
        r["k"] for r in dedup_against_bloom(df, seen, "k", bloom=bf).collect()
    )
    want = sorted(r["k"] for r in dedup_against(df, seen, "k").collect())
    assert got == want == list(range(1, 600, 2))


def test_composite_and_null_keys(spark):
    seen = spark.createDataFrame(
        [(1, "a"), (2, None)], "x bigint, y string"
    )
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, None), (None, "a")],
        "x bigint, y string",
    )
    out = dedup_against_bloom(df, seen, ["x", "y"], m_bits=1 << 10, k=3)
    got = {(r["x"], r["y"]) for r in out.collect()}
    # (1,a) dropped; (2,None) survives — SQL anti-join null semantics
    # keep it (NULL key never matches), and the bloom prefilter must
    # not override that contract
    assert got == {(1, "b"), (2, None), (None, "a")}


def test_prebuilt_filter_reuses_across_batches(spark):
    seen = spark.range(100).selectExpr("id as k")
    bf = build_bloom(seen, "k", m_bits=1 << 12, k=4)
    b1 = spark.range(50, 150).selectExpr("id as k")
    b2 = spark.range(140, 160).selectExpr("id as k")
    got1 = sorted(r["k"] for r in dedup_against_bloom(b1, seen, "k", bloom=bf).collect())
    got2 = sorted(r["k"] for r in dedup_against_bloom(b2, seen, "k", bloom=bf).collect())
    assert got1 == list(range(100, 150)) and got2 == list(range(140, 160))


def test_param_validation():
    import numpy as np

    with pytest.raises(ValueError, match="multiple of 64"):
        BloomFilter(words=np.zeros(1, dtype=np.uint64), m_bits=63, k=2)
    with pytest.raises(ValueError, match="k must be"):
        BloomFilter(words=np.zeros(1, dtype=np.uint64), m_bits=64, k=0)


def test_build_validates_m_bits(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(spark.range(1), "id", m_bits=100)


def test_probe_dtype_mismatch_raises(spark):
    # double 1.0 and decimal 1.00 compare equal natively but cast to
    # different strings — the probe must refuse rather than emit a
    # silent bloom false negative (ADVICE r6)
    seen = spark.range(3).selectExpr("cast(id as decimal(10,2)) as k")
    bf = build_bloom(seen, "k", m_bits=1 << 10, k=3)
    assert bf.key_types == ("decimal(10,2)",)
    batch = spark.range(3).selectExpr("cast(id as double) as k")
    with pytest.raises(TypeError, match="dtypes"):
        dedup_against_bloom(batch, seen, "k", bloom=bf).collect()
    # matching dtypes still pass
    ok = dedup_against_bloom(
        batch.selectExpr("cast(k as decimal(10,2)) as k"), seen, "k", bloom=bf
    )
    assert ok.count() == 0


def test_dedup_against_bloom_type_mismatch_without_prebuilt(spark):
    seen = spark.range(3).selectExpr("cast(id as decimal(10,2)) as k")
    batch = spark.range(3).selectExpr("cast(id as double) as k")
    with pytest.raises(TypeError, match="dtypes"):
        dedup_against_bloom(batch, seen, "k").collect()
