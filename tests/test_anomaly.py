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


# ---------------------------------------------------------------------------
# seasonal_zscore
# ---------------------------------------------------------------------------


def _ts(h, d=0, m=0):
    # deterministic timestamps: day d, hour h, minute m of Jan 2024
    from datetime import datetime

    return datetime(2024, 1, 7 + d, h, m)  # 2024-01-07 is a Sunday


def test_seasonal_zscore_catches_slot_anomaly_global_misses(spark):
    """A value normal for the day overall but wild for ITS HOUR: the
    seasonal baseline flags it, the global per-key baseline doesn't."""
    from pybabe_spark.operators.anomaly import seasonal_zscore, zscore_anomalies

    rows = []
    # hour 3 is always quiet (~1.0), hour 12 always busy (~100)
    for d in range(10):
        rows.append((1, _ts(3, d), 1.0 + (d % 3) * 0.1))
        rows.append((1, _ts(12, d), 100.0 + (d % 3)))
    # the anomaly: a 50.0 at hour 3 — mid-range globally, wild for 3am
    rows.append((1, _ts(3, 10), 50.0))
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")

    seasonal = seasonal_zscore(df, "k", "v", "ts", threshold=3.0,
                               season="hour_of_day").collect()
    assert [(r["bucket"], r["v"]) for r in seasonal] == [(3, 50.0)]

    global_ = zscore_anomalies(df, "k", "v", "ts", threshold=3.0).collect()
    assert all(r["v"] != 50.0 for r in global_)


def test_seasonal_zscore_matches_python_model(spark):
    import math
    import random

    from pybabe_spark.operators.anomaly import seasonal_zscore

    rng = random.Random(77)
    rows = [
        (1, _ts(h % 24, h // 24, i), round(rng.uniform(0, 40), 2))
        for h in range(48)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    got = {(r["ts"], r["v"]) for r in seasonal_zscore(
        df, "k", "v", "ts", threshold=1.5, season="hour_of_day"
    ).collect()}

    from collections import defaultdict

    cells = defaultdict(list)
    for _, ts, v in rows:
        cells[ts.hour].append((ts, v))
    exp = set()
    for h, vs in cells.items():
        n = len(vs)
        s = sum(v for _, v in vs)
        q = sum(v * v for _, v in vs)
        if n < 2 or n * q - s * s <= 0:
            continue
        m, sd = s / n, math.sqrt((n * q - s * s)) / n
        for ts, v in vs:
            if abs(v - m) > 1.5 * sd:
                exp.add((ts, v))
    assert got == exp and len(exp) > 0


def test_seasonal_zscore_buckets_and_validation(spark):
    from pybabe_spark.operators.anomaly import seasonal_zscore

    rows = [(1, _ts(5, d), float(d)) for d in range(7)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    # day_of_week buckets: each day appears once -> n=1 cells, nothing
    # flagged (and Sunday-first alignment is covered by parity)
    assert seasonal_zscore(df, "k", "v", "ts", 1.0,
                           "day_of_week").count() == 0

    import pytest

    with pytest.raises(ValueError):
        seasonal_zscore(df, "k", "v", "ts", 3.0, "fortnight")
