"""z-score anomalies: hand-checked flags, zero-variance and NULL
policies, rolling-frame semantics."""

from pybabe_spark.operators.anomaly import zscore_anomalies


def test_global_flags_outlier_only(spark):
    # note: with x inside its own statistics, a lone outlier among
    # n−1 constants sits at EXACTLY z = sqrt(n−1), whatever its
    # magnitude — ten 10s (n=11) → z = sqrt(10) ≈ 3.16 flags at 3.0,
    # nine 10s (n=10) → z = 3.0 exactly and strict > must NOT flag
    rows = [(1, i, 10.0) for i in range(10)] + [(1, 10, 101.0)]
    rows += [(2, i, float(i)) for i in range(10)]  # linear: no 3-sigma
    rows += [(3, i, 10.0) for i in range(9)] + [(3, 9, 100.0)]  # z == 3.0
    df = spark.createDataFrame(rows, "k int, ts int, v double")
    got = [
        (r["k"], r["ts"], r["v"])
        for r in zscore_anomalies(df, "k", "v", "ts", 3.0).collect()
    ]
    assert got == [(1, 10, 101.0)]


def test_zero_variance_and_null_policy(spark):
    rows = [(1, i, 5.0) for i in range(10)]          # constant: nothing
    rows += [(2, 0, None), (2, 1, 1.0), (2, 2, 1.0)]  # NULL never flagged
    df = spark.createDataFrame(rows, "k int, ts int, v double")
    assert zscore_anomalies(df, "k", "v", "ts", 1.0).count() == 0


def test_rolling_local_shift_detection(spark):
    # level shift: globally the two plateaus split variance, locally
    # the first post-shift point is a spike vs the trailing window
    rows = [(1, i, 10.0 + (0.01 * (i % 3))) for i in range(20)]
    rows += [(1, 20 + i, 50.0 + (0.01 * (i % 3))) for i in range(20)]
    df = spark.createDataFrame(rows, "k int, ts int, v double")
    got = [
        r["ts"]
        for r in zscore_anomalies(
            df, "k", "v", "ts", 2.5, mode="rolling", window=10
        ).collect()
    ]
    assert 20 in got                     # the shift point flags
    assert all(t >= 20 for t in got)     # pre-shift plateau is quiet


def test_rolling_requires_full_frame(spark):
    rows = [(1, 0, 0.0), (1, 1, 100.0)]
    df = spark.createDataFrame(rows, "k int, ts int, v double")
    out = zscore_anomalies(df, "k", "v", "ts", 0.5, mode="rolling", window=5)
    assert out.count() == 0
