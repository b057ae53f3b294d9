"""RFM segmentation (operators/rfm.py) — score orientation, tie rule,
NULL filtering, recency clamp."""

from pybabe_spark.operators.rfm import rfm_segments


def _run(spark, rows, k=2, as_of="2024-02-01"):
    df = spark.createDataFrame(
        rows, "cust int, d string, v double"
    ).selectExpr("cust", "CAST(d AS DATE) AS d", "v")
    return {
        r["key"]: r
        for r in rfm_segments(df, "cust", "d", "v", as_of, k).collect()
    }


def test_rfm_orientation_recent_big_spender_scores_high(spark):
    rows = [
        # cust 1: recent, frequent, big
        (1, "2024-01-30", 500.0), (1, "2024-01-25", 500.0),
        (1, "2024-01-20", 500.0),
        # cust 2: stale, one small order
        (2, "2023-06-01", 10.0),
        # cust 3: middling
        (3, "2023-12-01", 50.0), (3, "2023-11-01", 50.0),
    ]
    got = _run(spark, rows, k=2)
    assert (got[1].r_score, got[1].f_score, got[1].m_score) == (2, 2, 2)
    assert got[1].rfm_code == 222
    assert (got[2].r_score, got[2].f_score, got[2].m_score) == (1, 1, 1)
    assert got[2].rfm_code == 111
    assert got[1].monetary_cents == 150000
    assert got[1].recency_days == 2
    assert got[1].frequency == 3


def test_rfm_edge_ties_fall_in_lower_bin(spark):
    # all customers identical -> every raw bin 0: f=m=1, r=k
    rows = [(i, "2024-01-01", 100.0) for i in range(1, 5)]
    got = _run(spark, rows, k=3)
    for r in got.values():
        assert (r.r_score, r.f_score, r.m_score) == (3, 1, 1)


def test_rfm_null_rows_dropped_and_future_clamped(spark):
    rows = [
        (1, "2024-03-01", 100.0),  # after as_of -> recency clamps to 0
        (2, "2024-01-01", 100.0),
        (None, "2024-01-01", 100.0),
        (3, None, 100.0),
        (4, "2024-01-01", None),
    ]
    got = _run(spark, rows, k=2)
    assert set(got) == {1, 2}
    assert got[1].recency_days == 0


def test_rfm_k_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, "2024-01-01", 1.0)], "c int, d string, v double")
    for bad in (1, 10):
        with pytest.raises(ValueError):
            rfm_segments(df, "c", "d", "v", "2024-02-01", bad)
