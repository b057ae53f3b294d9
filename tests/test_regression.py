"""Grouped OLS (operators/regression.py): exact ppm fits."""

from pybabe_spark.operators.regression import ols


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g string, x double, y double")


def _one(df, g):
    return df.filter(df.g == g).collect()[0]


def test_perfect_line(spark):
    # y = 2x + 3 exactly → slope 2, intercept 3, r² = 1
    pts = [("a", float(x), 2.0 * x + 3.0) for x in range(1, 8)]
    r = _one(ols(_mk(spark, pts), "x", "y", "g"), "a")
    assert r["n"] == 7
    assert r["slope_ppm"] == 2_000_000
    assert r["intercept_ppm"] == 3_000_000
    assert r["slope"] == 2.0 and r["intercept"] == 3.0
    assert r["r2"] == 1.0


def test_negative_slope_and_intercept(spark):
    pts = [("a", float(x), -1.5 * x - 0.25) for x in range(0, 6)]
    r = _one(ols(_mk(spark, pts), "x", "y", "g"), "a")
    assert r["slope_ppm"] == -1_500_000
    assert r["intercept_ppm"] == -250_000


def test_known_imperfect_fit(spark):
    # hand-checked: x=[1,2,3], y=[1,2,4] → slope 3/2, intercept -2/3
    # (num = 3·17-6·7 = 9, denx = 3·14-36 = 6, (Σy-slope·Σx)/n = -2/3);
    # truncation toward zero
    pts = [("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 3.0, 4.0)]
    r = _one(ols(_mk(spark, pts), "x", "y", "g"), "a")
    assert r["slope_ppm"] == 1_500_000
    assert r["intercept_ppm"] == -666_666  # trunc(-2e6/3)
    # r² = num²/(denx·deny) = 81/(6·14) = 0.964286 (rounded to 6 dp)
    assert abs(r["r2"] - 0.964286) < 1e-9


def test_constant_x_yields_nulls(spark):
    pts = [("a", 5.0, 1.0), ("a", 5.0, 2.0), ("a", 5.0, 3.0)]
    r = _one(ols(_mk(spark, pts), "x", "y", "g"), "a")
    assert r["slope_ppm"] is None and r["intercept_ppm"] is None
    assert r["r2"] is None


def test_constant_y_r2_null_slope_zero(spark):
    pts = [("a", 1.0, 7.0), ("a", 2.0, 7.0), ("a", 3.0, 7.0)]
    r = _one(ols(_mk(spark, pts), "x", "y", "g"), "a")
    assert r["slope_ppm"] == 0 and r["intercept_ppm"] == 7_000_000
    assert r["r2"] is None


def test_null_rows_excluded_and_groups_independent(spark):
    pts = [
        ("a", 1.0, 5.0), ("a", None, 9.0), ("a", 2.0, None),
        ("a", 2.0, 7.0),
        ("b", 1.0, 1.0), ("b", 2.0, 0.0),
    ]
    out = ols(_mk(spark, pts), "x", "y", "g")
    a, b = _one(out, "a"), _one(out, "b")
    assert a["n"] == 2 and a["slope_ppm"] == 2_000_000
    assert b["slope_ppm"] == -1_000_000


def test_ungrouped(spark):
    pts = [("a", float(x), 0.5 * x) for x in range(4)]
    out = ols(_mk(spark, pts), "x", "y")
    r = out.collect()[0]
    assert out.columns[0] == "n" and r["slope_ppm"] == 500_000


def test_facade_hook(spark):
    from pybabe_spark.plans.facade import Babe

    pts = [("a", float(x), 3.0 * x) for x in range(3)]
    out = Babe(_mk(spark, pts)).ols("x", "y", "g")
    assert out.df.collect()[0]["slope_ppm"] == 3_000_000
