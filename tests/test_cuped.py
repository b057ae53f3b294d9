"""CUPED adjustment (operators/cuped.py)."""

import pytest

from pybabe_spark.operators.cuped import cuped_adjust


def _mk(spark, rows):
    return spark.createDataFrame(rows, "u int, y double, x double")


def test_perfectly_correlated_covariate_flattens_metric(spark):
    # y = 2x exactly → theta = 2, adjusted = ȳ for every row
    rows = [(i, 2.0 * i, float(i)) for i in range(1, 6)]
    out = cuped_adjust(_mk(spark, rows), "y", "x").collect()
    assert all(r["theta_ppm"] == 2_000_000 for r in out)
    vals = {r["adjusted"] for r in out}
    assert vals == {6.0}  # mean of 2,4,6,8,10


def test_variance_actually_shrinks(spark):
    import random

    rng = random.Random(3)
    rows = []
    for i in range(200):
        x = rng.uniform(0, 100)
        rows.append((i, round(0.8 * x + rng.uniform(-5, 5), 2),
                     round(x, 2)))
    out = cuped_adjust(_mk(spark, rows), "y", "x").collect()
    ys = [r["y"] for r in out]
    adj = [r["adjusted"] for r in out]
    def var(v):
        m = sum(v) / len(v)
        return sum((a - m) ** 2 for a in v) / len(v)
    assert var(adj) < 0.2 * var(ys)  # ≥80% variance reduction
    # CUPED preserves the mean
    assert abs(sum(adj) / len(adj) - sum(ys) / len(ys)) < 1e-6


def test_constant_covariate_is_noop(spark):
    rows = [(1, 5.0, 3.0), (2, 9.0, 3.0)]
    out = {r["u"]: (r["adjusted"], r["theta_ppm"])
           for r in cuped_adjust(_mk(spark, rows), "y", "x").collect()}
    assert out == {1: (5.0, 0), 2: (9.0, 0)}


def test_null_rows_keep_null_adjustment_but_pass_through(spark):
    rows = [(1, 5.0, 1.0), (2, None, 2.0), (3, 7.0, None), (4, 9.0, 3.0)]
    out = {r["u"]: r["adjusted"]
           for r in cuped_adjust(_mk(spark, rows), "y", "x").collect()}
    assert out[2] is None and out[3] is None
    assert out[1] is not None and out[4] is not None
    assert len(out) == 4


def test_grouped_theta_is_per_group(spark):
    rows = (
        [(i, 3.0 * i, float(i)) for i in range(1, 5)]
        + [(10 + i, -1.0 * i, float(i)) for i in range(1, 5)]
    )
    df = spark.createDataFrame(
        [(u, y, x, "a" if u < 10 else "b") for u, y, x in rows],
        "u int, y double, x double, g string",
    )
    out = {r["g"]: r["theta_ppm"]
           for r in cuped_adjust(df, "y", "x", by="g").collect()}
    assert out == {"a": 3_000_000, "b": -1_000_000}


def test_facade_hook(spark):
    from pybabe_spark.plans.facade import Babe

    rows = [(1, 2.0, 1.0), (2, 4.0, 2.0)]
    out = Babe(_mk(spark, rows)).cuped_adjust("y", "x")
    assert "adjusted" in out.df.columns


# -- mean_test (operators/sketch.py) ------------------------------------------


def _arms(spark, rows):
    return spark.createDataFrame(rows, "arm string, v double")


def test_mean_test_clear_separation_significant(spark):
    from pybabe_spark.operators.sketch import mean_test

    rows = [("control", 10.0 + (i % 3) * 0.1) for i in range(50)] + [
        ("treatment", 20.0 + (i % 3) * 0.1) for i in range(50)
    ]
    r = mean_test(_arms(spark, rows), "arm", "v", "control",
                  "treatment").collect()[0]
    assert r["significant"] is True
    assert abs(r["diff"] - 10.0) < 1e-9
    assert r["n_control"] == 50 and r["n_treatment"] == 50


def test_mean_test_identical_arms_not_significant(spark):
    from pybabe_spark.operators.sketch import mean_test

    rows = [("control", float(i % 7)) for i in range(60)] + [
        ("treatment", float(i % 7)) for i in range(60)
    ]
    r = mean_test(_arms(spark, rows), "arm", "v", "control",
                  "treatment").collect()[0]
    assert r["significant"] is False and r["diff"] == 0.0


def test_mean_test_degenerate_arms(spark):
    from pybabe_spark.operators.sketch import mean_test

    rows = [("control", 5.0), ("treatment", 9.0)]  # n=1 each
    r = mean_test(_arms(spark, rows), "arm", "v", "control",
                  "treatment").collect()[0]
    assert r["significant"] is False
    assert r["mean_control"] == 5.0 and r["mean_treatment"] == 9.0


@pytest.mark.deep
def test_mean_test_cuped_composition_flips_decision(spark):
    """The reason cuped exists: a treatment effect invisible under raw
    noise becomes significant after the covariate is regressed out."""
    import random

    from pybabe_spark.operators.cuped import cuped_adjust
    from pybabe_spark.operators.sketch import mean_test

    rng = random.Random(17)
    rows = []
    for i in range(400):
        x = rng.uniform(0, 100)             # pre-period signal
        arm = "treatment" if i % 2 else "control"
        effect = 1.0 if arm == "treatment" else 0.0
        rows.append((i, arm, round(x + effect + rng.uniform(-0.2, 0.2), 2),
                     round(x, 2)))
    df = spark.createDataFrame(rows, "u int, arm string, y double, x double")
    raw = mean_test(df, "arm", "y", "control", "treatment").collect()[0]
    adj = cuped_adjust(df, "y", "x")
    after = mean_test(adj, "arm", "adjusted", "control",
                      "treatment").collect()[0]
    assert raw["significant"] is False   # drowned by covariate noise
    assert after["significant"] is True  # recovered by CUPED


# -- chi2_independence (operators/sketch.py) -----------------------------------


def _chi2_model(pairs):
    """Floored-ppm Python model of chi2_independence."""
    from collections import Counter

    cells = Counter(pairs)
    if not cells:
        return (0, 0, 0)
    r = Counter()
    c = Counter()
    for (a, b), nab in cells.items():
        r[a] += nab
        c[b] += nab
    n = sum(cells.values())
    ppm = 0
    for (a, b), nab in cells.items():
        num = (n * nab - r[a] * c[b]) ** 2
        ppm += (num * 1_000_000) // (n * r[a] * c[b])
    return (n, (len(r) - 1) * (len(c) - 1), ppm)


@pytest.mark.deep
def test_chi2_hand_checked_2x2(spark):
    from pybabe_spark.operators.sketch import chi2_independence

    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20
        + [("y", "u")] * 20 + [("y", "v")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b", crit=3.841459).collect()[0]
    # each cell: (60*nab - 900)^2 = 90000; ppm = 90000e6 // 54000
    assert r.n == 60 and r.dof == 1
    assert r.chi2_ppm == 4 * ((90000 * 1_000_000) // 54000)
    assert r.significant is True


def test_chi2_independent_columns_zero(spark):
    from pybabe_spark.operators.sketch import chi2_independence

    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(7)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert r.chi2_ppm == 0 and r.significant is False


def test_chi2_empty_and_nulls(spark):
    from pybabe_spark.operators.sketch import chi2_independence

    empty = spark.createDataFrame([], "a string, b string")
    r = chi2_independence(empty, "a", "b").collect()[0]
    assert (r.n, r.dof, r.chi2_ppm, r.significant) == (0, 0, 0, False)
    rows = [("x", None), (None, "u"), ("x", "u"), ("y", "v")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    assert r.n == 2  # null pairs dropped


def test_chi2_randomized_model(spark):
    import random

    from pybabe_spark.operators.sketch import chi2_independence

    rng = random.Random(80)
    pairs = [
        (rng.choice("abc"), rng.choice("uvwx")) for _ in range(300)
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    r = chi2_independence(df, "a", "b").collect()[0]
    n, dof, ppm = _chi2_model(pairs)
    assert (r.n, r.dof, r.chi2_ppm) == (n, dof, ppm)


# -- mann_whitney_u (operators/sketch.py) ---------------------------------------


def _mwu_frame(spark, a_vals, b_vals):
    rows = [("control", v) for v in a_vals] + [
        ("treatment", v) for v in b_vals
    ]
    return spark.createDataFrame(rows, "arm string, v double")


def test_mwu_hand_checked_no_ties(spark):
    from pybabe_spark.operators.sketch import mann_whitney_u

    r = mann_whitney_u(
        _mwu_frame(spark, [1.0, 2.0], [3.0, 4.0]),
        "arm", "v", "control", "treatment",
    ).collect()[0]
    assert (r.n_control, r.n_treatment, r.u2) == (2, 2, 8)
    assert r.auc_ppm == 1_000_000  # full separation
    assert r.significant is False  # n too small for z


def test_mwu_half_tie_counting(spark):
    from pybabe_spark.operators.sketch import mann_whitney_u

    r = mann_whitney_u(
        _mwu_frame(spark, [1.0, 2.0], [2.0, 3.0]),
        "arm", "v", "control", "treatment",
    ).collect()[0]
    assert r.u2 == 7  # U = 3.5 with the tie counting half
    assert r.auc_ppm == (7 * 500000) // 4


def test_mwu_identical_arms_auc_half(spark):
    from pybabe_spark.operators.sketch import mann_whitney_u

    vals = [float(i) for i in range(1, 21)]
    r = mann_whitney_u(
        _mwu_frame(spark, vals, vals), "arm", "v", "control",
        "treatment",
    ).collect()[0]
    assert r.auc_ppm == 500_000 and r.significant is False


def test_mwu_clear_separation_significant(spark):
    from pybabe_spark.operators.sketch import mann_whitney_u

    a = [float(i) for i in range(30)]
    b = [float(i + 100) for i in range(30)]
    r = mann_whitney_u(
        _mwu_frame(spark, a, b), "arm", "v", "control", "treatment"
    ).collect()[0]
    assert r.u2 == 2 * 900 and r.significant is True


def test_mwu_empty_arm(spark):
    from pybabe_spark.operators.sketch import mann_whitney_u

    r = mann_whitney_u(
        _mwu_frame(spark, [1.0, 2.0], []), "arm", "v", "control",
        "treatment",
    ).collect()[0]
    assert (r.n_treatment, r.u2) == (0, 0)
    assert r.auc_ppm is None and r.significant is False


# -- did_estimate (operators/cuped.py) ------------------------------------------


def _did_frame(spark, cells):
    """cells: dict (arm, period) -> list of values."""
    rows = [
        (arm, period, v)
        for (arm, period), vals in cells.items()
        for v in vals
    ]
    return spark.createDataFrame(rows, "arm string, period string, v double")


def test_did_parallel_trends_effect_zero(spark):
    from pybabe_spark.operators.cuped import did_estimate

    # both arms rise by exactly 10 -> DiD = 0
    cells = {
        ("control", "pre"): [10.0, 20.0, 30.0],
        ("control", "post"): [20.0, 30.0, 40.0],
        ("treatment", "pre"): [50.0, 60.0, 70.0],
        ("treatment", "post"): [60.0, 70.0, 80.0],
    }
    r = did_estimate(
        _did_frame(spark, cells), "arm", "period", "v",
        "control", "treatment", "pre", "post",
    ).collect()[0]
    assert r.did == 0.0 and r.significant is False
    assert r.mean_cpre == 20.0 and r.mean_tpost == 70.0


def test_did_hand_checked_lift(spark):
    from pybabe_spark.operators.cuped import did_estimate

    # control +10, treatment +25 -> DiD = 15, tight cells -> significant
    cells = {
        ("control", "pre"): [10.0, 10.0, 10.0, 10.1],
        ("control", "post"): [20.0, 20.0, 20.0, 20.1],
        ("treatment", "pre"): [30.0, 30.0, 30.0, 30.1],
        ("treatment", "post"): [55.0, 55.0, 55.0, 55.1],
    }
    r = did_estimate(
        _did_frame(spark, cells), "arm", "period", "v",
        "control", "treatment", "pre", "post",
    ).collect()[0]
    assert abs(r.did - 15.0) < 1e-9
    assert r.significant is True


def test_did_degenerate_cell_not_significant(spark):
    from pybabe_spark.operators.cuped import did_estimate

    cells = {
        ("control", "pre"): [10.0],  # n=1: variance undefined
        ("control", "post"): [20.0, 21.0],
        ("treatment", "pre"): [30.0, 31.0],
        ("treatment", "post"): [55.0, 56.0],
    }
    r = did_estimate(
        _did_frame(spark, cells), "arm", "period", "v",
        "control", "treatment", "pre", "post",
    ).collect()[0]
    assert r.did is None and r.significant is False
    assert r.n_cpre == 1 and r.mean_cpre == 10.0


# -- srm_check (operators/sketch.py) --------------------------------------------


def _arm_frame(spark, counts):
    rows = [(arm,) for arm, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "arm string")


def test_srm_balanced_not_detected(spark):
    from pybabe_spark.operators.sketch import srm_check

    r = srm_check(
        _arm_frame(spark, {"a": 500, "b": 500}),
        "arm", {"a": 500_000, "b": 500_000},
    ).collect()[0]
    assert (r.n, r.unexpected_n, r.chi2_ppm, r.srm_detected) == (
        1000, 0, 0, False)


def test_srm_skewed_detected_hand_checked(spark):
    from pybabe_spark.operators.sketch import srm_check

    # 600/400 under a 50/50 design: chi2 = 2*(100^2/500) = 40
    r = srm_check(
        _arm_frame(spark, {"a": 600, "b": 400}),
        "arm", {"a": 500_000, "b": 500_000},
    ).collect()[0]
    # per arm: (1e6*600 - 1000*500000)^2 // (1000*500000)
    t = (1_000_000 * 600 - 1000 * 500_000) ** 2 // (1000 * 500_000)
    assert r.chi2_ppm == 2 * t == 40_000_000
    assert r.srm_detected is True


def test_srm_unexpected_arm_and_empty(spark):
    from pybabe_spark.operators.sketch import srm_check

    r = srm_check(
        _arm_frame(spark, {"a": 10, "b": 10, "rogue": 3}),
        "arm", {"a": 500_000, "b": 500_000},
    ).collect()[0]
    assert r.n == 20 and r.unexpected_n == 3 and r.chi2_ppm == 0
    empty = spark.createDataFrame([], "arm string")
    r = srm_check(empty, "arm", {"a": 500_000, "b": 500_000}).collect()[0]
    assert (r.n, r.unexpected_n, r.chi2_ppm, r.srm_detected) == (
        0, 0, 0, False)


def test_srm_validation(spark):
    import pytest

    from pybabe_spark.operators.sketch import srm_check

    df = spark.createDataFrame([("a",)], "arm string")
    with pytest.raises(ValueError):
        srm_check(df, "arm", {})
    with pytest.raises(ValueError):
        srm_check(df, "arm", {"a": 600_000, "b": 500_000})
    with pytest.raises(ValueError):
        srm_check(df, "arm", {"a": 1_000_000, "b": 0})


# -- trimmed_mean (operators/sketch.py) -----------------------------------------


def test_trimmed_mean_drops_outlier(spark):
    from pybabe_spark.operators.sketch import trimmed_mean

    vals = [10.0] * 9 + [1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = trimmed_mean(df, "v", alpha=0.1).collect()[0]
    assert r.n == 10
    # 10% trim drops the single outlier at the top (and nothing real
    # at the bottom: lo edge is 10.0, values >= lo survive)
    assert r.n_kept == 9 and r.trimmed_mean == 10.0


def test_trimmed_mean_alpha_zero_is_plain_mean(spark):
    from pybabe_spark.operators.sketch import trimmed_mean

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 6.0)], "g string, v double"
    )
    r = trimmed_mean(df, "v", by="g", alpha=0.0).collect()[0]
    assert r.n_kept == 3 and r.trimmed_mean == 3.0


def test_trimmed_mean_groups_and_validation(spark):
    import pytest

    from pybabe_spark.operators.sketch import trimmed_mean

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", None)],
        "g string, v double",
    )
    got = {r["g"]: r for r in
           trimmed_mean(df, "v", by="g", alpha=0.2).collect()}
    assert got["a"].trimmed_mean == 1.0
    assert got["b"].n == 1 and got["b"].trimmed_mean == 5.0
    with pytest.raises(ValueError):
        trimmed_mean(df, "v", alpha=0.5)


# -- category_diversity (operators/sketch.py) ------------------------------------


def test_diversity_uniform_and_concentrated(spark):
    import math

    from pybabe_spark.operators.sketch import category_diversity

    rows = [("g1", c) for c in "abcd" for _ in range(5)] + [
        ("g2", "a")
    ] * 20
    df = spark.createDataFrame(rows, "g string, c string")
    got = {r["g"]: r for r in
           category_diversity(df, "c", by="g").collect()}
    u = got["g1"]
    assert (u.n, u.n_categories) == (20, 4)
    assert abs(u.entropy - math.log(4)) < 1e-5  # uniform -> ln k
    # simpson = 1 - 4*(5/20)^2 = 0.75
    assert u.simpson_ppm == ((20 * 20 - 4 * 25) * 1_000_000) // 400
    c = got["g2"]
    assert c.entropy == 0.0 and c.simpson_ppm == 0
    assert c.n_categories == 1


def test_diversity_model_replica(spark):
    import math
    from collections import Counter
    from decimal import Decimal, ROUND_HALF_UP

    from pybabe_spark.operators.sketch import category_diversity

    import random

    rng = random.Random(3)
    vals = [rng.choice("abcdefg") for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "c string")
    r = category_diversity(df, "c").collect()[0]
    cnt = Counter(vals)
    n = sum(cnt.values())

    def r6(x):
        return Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )

    s = sum(r6(ni * math.log(ni)) for ni in cnt.values())
    want_h = float(r6(math.log(n) - float(s) / n))
    assert abs(r.entropy - want_h) < 2e-6
    q = sum(ni * ni for ni in cnt.values())
    assert r.simpson_ppm == ((n * n - q) * 1_000_000) // (n * n)


def test_chi2_sparse_table_counts_zero_cells(spark):
    """Unobserved cells must contribute their expected-count terms:
    a perfect 3x3 association has chi2 = n*(min(r,c)-1) = 2n exactly
    (the 6 zero cells carry a third of it)."""
    from pybabe_spark.operators.sketch import chi2_independence

    rows = [(f"a{i % 3}", f"b{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b", crit=9.487).collect()[0]
    # floored integral ppm: within #cells ppm of exactly 600.0
    assert abs(r["chi2_ppm"] - 600_000_000) <= 9
    assert r["dof"] == 4 and r["significant"]


# -- ks_test (operators/sketch.py) -----------------------------------------------


def _ks_frame(spark, a_vals, b_vals):
    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    return spark.createDataFrame(rows, "grp string, v double")


def test_ks_hand_checked_full_separation(spark):
    from pybabe_spark.operators.sketch import ks_test

    # a = {1,2}, b = {3,4}: at v=2 ECDF gap is |2*2 - 0*2| = 4 = n_a*n_b
    r = ks_test(
        _ks_frame(spark, [1.0, 2.0], [3.0, 4.0]), "grp", "v", "a", "b"
    ).collect()[0]
    assert (r.n_a, r.n_b, r.d_num) == (2, 2, 4)
    assert r.d_ppm == 1_000_000  # D = 1, full separation
    assert r.significant is False  # but n too small: D_crit > 1 here


def test_ks_identical_distributions_zero_gap_modulo_ties(spark):
    from pybabe_spark.operators.sketch import ks_test

    vals = [float(i) for i in range(1, 41)]
    r = ks_test(_ks_frame(spark, vals, vals), "grp", "v", "a", "b").collect()[0]
    assert r.d_num == 0 and r.d_ppm == 0 and r.significant is False


def test_ks_shift_detected_significant(spark):
    from pybabe_spark.operators.sketch import ks_test

    a = [float(i) for i in range(100)]
    b = [float(i) + 60.0 for i in range(100)]
    r = ks_test(_ks_frame(spark, a, b), "grp", "v", "a", "b").collect()[0]
    # shift of 60 over range 100 → D = 0.6 ≫ 1.358·sqrt(2/100) ≈ 0.192
    assert r.d_ppm == 600_000 and r.significant is True


def test_ks_equal_means_different_shape_detected(spark):
    """The case mean/rank tests miss: same center, different spread."""
    from pybabe_spark.operators.sketch import ks_test, mann_whitney_u

    # narrow around 50 vs wide around 50 (symmetric → same mean/median)
    a = [50.0 + d for d in (-1, -0.5, 0.5, 1) for _ in range(25)]
    b = [50.0 + d for d in (-40, -20, 20, 40) for _ in range(25)]
    fr = _ks_frame(spark, a, b)
    ks = ks_test(fr, "grp", "v", "a", "b").collect()[0]
    mwu = mann_whitney_u(fr, "grp", "v", "a", "b").collect()[0]
    assert ks.significant is True  # shape gap: ECDFs cross hard
    assert mwu.auc_ppm == 500_000  # rank test sees nothing (AUC = 1/2)


def test_ks_matches_python_model(spark):
    """Exact-integer d_num equals a brute-force two-sample KS in
    Python (scipy-free model: max over pooled values of the scaled
    ECDF gap), across a deterministic pseudo-random draw with ties."""
    import random

    from pybabe_spark.operators.sketch import ks_test

    rng = random.Random(17)
    a = [round(rng.uniform(0, 50), 1) for _ in range(200)]
    b = [round(rng.expovariate(1 / 15), 1) for _ in range(150)]
    r = ks_test(_ks_frame(spark, a, b), "grp", "v", "a", "b").collect()[0]

    def model_dnum(xs, ys):
        pooled = sorted(set(xs) | set(ys))
        best = 0
        for v in pooled:
            ca = sum(1 for x in xs if x <= v)
            cb = sum(1 for y in ys if y <= v)
            best = max(best, abs(ca * len(ys) - cb * len(xs)))
        return best

    assert (r.n_a, r.n_b) == (200, 150)
    assert r.d_num == model_dnum(a, b)
    assert r.d_ppm == (r.d_num * 1_000_000) // (200 * 150)


def test_ks_empty_arm_and_nulls(spark):
    from pybabe_spark.operators.sketch import ks_test

    r = ks_test(
        _ks_frame(spark, [1.0, 2.0], []), "grp", "v", "a", "b"
    ).collect()[0]
    assert (r.n_a, r.n_b, r.d_num) == (2, 0, 0)
    assert r.d_ppm is None and r.significant is False

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", None), ("c", 9.0), ("b", 2.0)],
        "grp string, v double",
    )
    r2 = ks_test(df, "grp", "v", "a", "b").collect()[0]
    assert (r2.n_a, r2.n_b) == (1, 1)  # NULLs + other groups excluded


def test_ks_empty_input_zero_row_contract(spark):
    from pybabe_spark.operators.sketch import ks_test

    r = ks_test(_ks_frame(spark, [], []), "grp", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.d_num, r.d_ppm, r.significant) == (
        0, 0, 0, None, False,
    )


def test_ks_facade_hook(spark):
    from pybabe_spark.plans.facade import Babe

    out = Babe(_ks_frame(spark, [1.0], [2.0])).ks_test("grp", "v", "a", "b")
    assert out.df.collect()[0].n_a == 1


# -- proportion_ci (operators/sketch.py) ------------------------------------------


def test_wilson_hand_checked(spark):
    """Textbook Wilson: k=8, n=10, z=1.959964 → interval ≈
    (0.4901, 0.9433) (replay the op's own fixed-shape formula)."""
    import math

    from pybabe_spark.operators.sketch import proportion_ci

    df = spark.createDataFrame(
        [(1,)] * 8 + [(0,)] * 2, "s int"
    )
    r = proportion_ci(df, "s").collect()[0]
    assert (r["n"], r["successes"], r["p_ppm"]) == (10, 8, 800_000)
    z = 1.959964
    zz = z * z
    p, n = 0.8, 10.0
    denom = 1.0 + zz / n
    center = (p + zz / (2.0 * n)) / denom
    half = (z / denom) * math.sqrt(p * (1.0 - p) / n + zz / (4.0 * n * n))
    assert abs(r["ci_lo"] - round(center - half, 6)) <= 1e-9
    assert abs(r["ci_hi"] - round(center + half, 6)) <= 1e-9
    assert 0.49 < r["ci_lo"] < 0.491 and 0.943 < r["ci_hi"] < 0.944


def test_wilson_stays_inside_unit_interval_at_extremes(spark):
    """p̂ = 1 with small n: the naive normal interval would exceed 1;
    Wilson must not."""
    from pybabe_spark.operators.sketch import proportion_ci

    df = spark.createDataFrame([(1,)] * 3, "s int")
    r = proportion_ci(df, "s").collect()[0]
    assert r["p_ppm"] == 1_000_000
    assert r["ci_hi"] <= 1.0 and r["ci_lo"] > 0.2


def test_wilson_per_group_and_null_exclusion(spark):
    from pybabe_spark.operators.sketch import proportion_ci

    rows = [("a", 1), ("a", 0), ("a", None), ("b", 1), ("b", 1)]
    df = spark.createDataFrame(rows, "g string, s int")
    got = {
        r["g"]: (r["n"], r["successes"])
        for r in proportion_ci(df, "s", by="g").collect()
    }
    assert got == {"a": (2, 1), "b": (2, 2)}  # NULL excluded entirely


def test_wilson_empty_input_keyless(spark):
    from pybabe_spark.operators.sketch import proportion_ci

    df = spark.createDataFrame([], "s int")
    r = proportion_ci(df, "s").collect()[0]
    assert (r["n"], r["successes"], r["p_ppm"], r["ci_lo"], r["ci_hi"]) == (
        0, 0, None, None, None,
    )


def test_wilson_facade(spark):
    from pybabe_spark.plans.facade import Babe

    df = spark.createDataFrame([(1,), (0,)], "s int")
    out = Babe(df).proportion_ci("s")
    assert out.df.collect()[0]["n"] == 2


# -- ab_test_by (operators/sketch.py) ---------------------------------------------


def _ab_frame(spark, rows):
    return spark.createDataFrame(
        rows, "variant string, seg string, converted int"
    )


def test_ab_test_by_heterogeneity(spark):
    """A lift confined to ONE segment: the global test would average it
    away; the per-segment rows localize it."""
    from pybabe_spark.operators.sketch import ab_test_by

    rows = (
        # seg X: strong effect (A 10%, B 90%, n=100/arm)
        [("A", "X", 1)] * 10 + [("A", "X", 0)] * 90
        + [("B", "X", 1)] * 90 + [("B", "X", 0)] * 10
        # seg Y: no effect (both 50%)
        + [("A", "Y", 1)] * 50 + [("A", "Y", 0)] * 50
        + [("B", "Y", 1)] * 50 + [("B", "Y", 0)] * 50
    )
    got = {
        r["seg"]: r
        for r in ab_test_by(
            _ab_frame(spark, rows), "variant", "converted", "A", "B", "seg"
        ).collect()
    }
    x, y = got["X"], got["Y"]
    assert (x["n_control"], x["n_treatment"]) == (100, 100)
    assert x["lift_ppm"] == 800_000 and x["significant"] is True
    assert y["lift_ppm"] == 0 and y["significant"] is False


def test_ab_test_by_missing_arm_and_null_segment(spark):
    from pybabe_spark.operators.sketch import ab_test_by

    rows = [("A", "solo", 1), ("A", "solo", 0), ("A", None, 1),
            ("B", None, 0)]
    got = ab_test_by(
        _ab_frame(spark, rows), "variant", "converted", "A", "B", "seg"
    ).collect()
    assert len(got) == 1  # NULL segment dropped
    r = got[0]
    assert (r["seg"], r["n_control"], r["n_treatment"]) == ("solo", 2, 0)
    assert r["conv_treatment_ppm"] is None and r["lift_ppm"] is None
    assert r["significant"] is False


def test_ab_test_by_matches_global_on_single_segment(spark):
    """With one segment, ab_test_by's row equals ab_test's output."""
    from pybabe_spark.operators.sketch import ab_test, ab_test_by

    rows = (
        [("A", "all", 1)] * 30 + [("A", "all", 0)] * 70
        + [("B", "all", 1)] * 45 + [("B", "all", 0)] * 55
    )
    fr = _ab_frame(spark, rows)
    seg = ab_test_by(fr, "variant", "converted", "A", "B", "seg").collect()[0]
    glob = ab_test(fr, "variant", "converted", "A", "B").collect()[0]
    for c in ("n_control", "conv_control_ppm", "n_treatment",
              "conv_treatment_ppm", "lift_ppm", "significant"):
        assert seg[c] == glob[c], c


def test_ab_test_by_facade(spark):
    from pybabe_spark.plans.facade import Babe

    rows = [("A", "s", 1), ("B", "s", 0)]
    out = Babe(_ab_frame(spark, rows)).ab_test_by(
        "variant", "converted", "A", "B", "seg"
    )
    assert out.df.collect()[0]["n_control"] == 1


# ---------------------------------------------------------------------------
# one-way ANOVA
# ---------------------------------------------------------------------------


def test_anova_clear_separation(spark):
    """Three well-separated tight groups → huge F, eta² near 1."""
    from pybabe_spark.operators.sketch import anova_f

    rows = (
        [("a", 10.0 + (i % 3) * 0.1) for i in range(30)]
        + [("b", 50.0 + (i % 3) * 0.1) for i in range(30)]
        + [("c", 90.0 + (i % 3) * 0.1) for i in range(30)]
    )
    r = anova_f(_arms(spark, rows), "arm", "v").collect()[0]
    assert r["group_count"] == 3 and r["n_total"] == 90
    assert r["df_between"] == 2 and r["df_within"] == 87
    assert r["f_stat"] > 1000.0
    assert r["eta_squared"] > 0.99


def test_anova_matches_python_model(spark):
    """F and eta² match a plain-float Python computation on random
    data (tolerance: the engine rounds once to 1e-6)."""
    import random

    from pybabe_spark.operators.sketch import anova_f

    rng = random.Random(23)
    rows = [
        (g, round(rng.uniform(0, 100), 2))
        for g in ("a", "b", "c", "d")
        for _ in range(rng.randint(20, 40))
    ]
    r = anova_f(_arms(spark, rows), "arm", "v").collect()[0]

    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    n = sum(len(vs) for vs in groups.values())
    k = len(groups)
    mean = sum(v for vs in groups.values() for v in vs) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - mean) ** 2
              for vs in groups.values())
    sst = sum((v - mean) ** 2 for vs in groups.values() for v in vs)
    ssw = sst - ssb
    f_exp = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(r["f_stat"] - f_exp) < 1e-4 * max(1.0, f_exp)
    assert abs(r["eta_squared"] - ssb / sst) < 1e-5


def test_anova_identical_groups_f_small(spark):
    """Same distribution in every group → F ≈ 0, eta² ≈ 0."""
    from pybabe_spark.operators.sketch import anova_f

    rows = [(g, float(i % 7)) for g in ("a", "b", "c") for i in range(70)]
    r = anova_f(_arms(spark, rows), "arm", "v").collect()[0]
    assert r["f_stat"] is not None and abs(r["f_stat"]) < 1e-6
    assert abs(r["eta_squared"]) < 1e-9


def test_anova_degenerate(spark):
    from pybabe_spark.operators.sketch import anova_f

    # one group only → F undefined
    one = [("a", float(i)) for i in range(10)]
    r = anova_f(_arms(spark, one), "arm", "v").collect()[0]
    assert r["group_count"] == 1 and r["f_stat"] is None

    # zero within-group variance but distinct means → F undefined
    # (infinite), eta² = 1
    flat = [("a", 1.0)] * 5 + [("b", 2.0)] * 5
    r = anova_f(_arms(spark, flat), "arm", "v").collect()[0]
    assert r["f_stat"] is None and abs(r["eta_squared"] - 1.0) < 1e-9

    # all-constant → SST = 0 → both NULL
    const = [("a", 3.0)] * 5 + [("b", 3.0)] * 5
    r = anova_f(_arms(spark, const), "arm", "v").collect()[0]
    assert r["f_stat"] is None and r["eta_squared"] is None

    # NULLs excluded
    rows = [("a", 1.0), ("a", None), (None, 9.0), ("b", 2.0), ("b", 4.0)]
    r = anova_f(_arms(spark, rows), "arm", "v").collect()[0]
    assert r["n_total"] == 3 and r["group_count"] == 2


def test_anova_two_groups_is_squared_mean_test_z(spark):
    """With k=2 equal-size groups, F = t² (Student pooled form): check
    against the pooled two-sample t computed in Python."""
    from pybabe_spark.operators.sketch import anova_f

    rows = [("control", 10.0 + (i % 5)) for i in range(40)] + [
        ("treatment", 12.0 + (i % 5)) for i in range(40)
    ]
    r = anova_f(_arms(spark, rows), "arm", "v").collect()[0]
    a = [10.0 + (i % 5) for i in range(40)]
    b = [12.0 + (i % 5) for i in range(40)]
    n_a, n_b = len(a), len(b)
    ma, mb = sum(a) / n_a, sum(b) / n_b
    sp2 = (
        sum((x - ma) ** 2 for x in a) + sum((x - mb) ** 2 for x in b)
    ) / (n_a + n_b - 2)
    t2 = (mb - ma) ** 2 / (sp2 * (1 / n_a + 1 / n_b))
    assert abs(r["f_stat"] - t2) < 1e-6 * max(1.0, t2)


# ---------------------------------------------------------------------------
# Kruskal–Wallis
# ---------------------------------------------------------------------------


def test_kw_matches_python_model(spark):
    """H (with and without tie correction) matches a plain-Python
    midrank computation on random data with ties."""
    import random

    from pybabe_spark.operators.sketch import kruskal_wallis

    rng = random.Random(41)
    rows = [
        (g, float(rng.randint(0, 30)))
        for g in ("a", "b", "c")
        for _ in range(rng.randint(25, 45))
    ]
    r = kruskal_wallis(_arms(spark, rows), "arm", "v").collect()[0]

    vals = sorted(v for _, v in rows)
    n = len(vals)
    # midrank per value
    ranks, i = {}, 0
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        ranks[vals[i]] = (i + 1 + j) / 2.0
        i = j
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(ranks[v])
    h = 12.0 / (n * (n + 1)) * sum(
        sum(rs) ** 2 / len(rs) for rs in groups.values()
    ) - 3 * (n + 1)
    from collections import Counter

    tie = sum(c**3 - c for c in Counter(vals).values())
    h_c = h / (1 - tie / (n**3 - n))
    assert abs(r["h"] - h) < 1e-4
    assert abs(r["h_tie_corrected"] - h_c) < 1e-4
    assert r["group_count"] == 3 and r["n_total"] == n


def test_kw_two_groups_consistent_with_mwu(spark):
    """k=2 KW is the squared standardized MWU (no tie correction):
    H = z² where z = (U − n₁n₂/2)/sqrt(n₁n₂(N+1)/12)."""
    from pybabe_spark.operators.sketch import kruskal_wallis, mann_whitney_u

    rows = [("control", 10.0 + (i % 11)) for i in range(40)] + [
        ("treatment", 13.0 + (i % 11)) for i in range(40)
    ]
    df = _arms(spark, rows)
    kw = kruskal_wallis(df, "arm", "v").collect()[0]
    mw = mann_whitney_u(df, "arm", "v", "control", "treatment").collect()[0]
    n1 = n2 = 40
    n = n1 + n2
    u = mw["u2"] / 2.0
    z2 = (u - n1 * n2 / 2.0) ** 2 / (n1 * n2 * (n + 1) / 12.0)
    assert abs(kw["h"] - z2) < 1e-6


def test_kw_separation_significant_identical_not(spark):
    from pybabe_spark.operators.sketch import kruskal_wallis

    far = (
        [("a", 1.0 + i * 0.01) for i in range(40)]
        + [("b", 100.0 + i * 0.01) for i in range(40)]
        + [("c", 200.0 + i * 0.01) for i in range(40)]
    )
    r = kruskal_wallis(_arms(spark, far), "arm", "v", 5.991465).collect()[0]
    assert r["significant"] is True and r["h"] > 50.0

    same = [(g, float(i % 9)) for g in ("a", "b", "c") for i in range(45)]
    r = kruskal_wallis(_arms(spark, same), "arm", "v", 5.991465).collect()[0]
    assert r["significant"] is False and abs(r["h_tie_corrected"]) < 0.5


def test_kw_degenerate(spark):
    from pybabe_spark.operators.sketch import kruskal_wallis

    # single group → H NULL, significant False
    one = [("a", float(i)) for i in range(10)]
    r = kruskal_wallis(_arms(spark, one), "arm", "v", 3.841459).collect()[0]
    assert r["h"] is None and r["significant"] is False

    # every value identical → tie-corrected H NULL (0/0)
    const = [("a", 2.0)] * 6 + [("b", 2.0)] * 6
    r = kruskal_wallis(_arms(spark, const), "arm", "v").collect()[0]
    assert r["h_tie_corrected"] is None

    # NULLs excluded
    rows = [("a", 1.0), ("a", None), (None, 9.0), ("b", 2.0)]
    r = kruskal_wallis(_arms(spark, rows), "arm", "v").collect()[0]
    assert r["n_total"] == 2


# ---------------------------------------------------------------------------
# Brown–Forsythe
# ---------------------------------------------------------------------------


def test_bf_unequal_spread_detected(spark):
    """Same center, wildly different spread: ANOVA sees nothing,
    Brown–Forsythe sees everything."""
    from pybabe_spark.operators.sketch import anova_f, brown_forsythe

    tight = [("a", 50.0 + (i % 3) * 0.01 - 0.01) for i in range(60)]
    wide = [("b", 50.0 + (i % 2) * 80.0 - 40.0) for i in range(60)]
    df = _arms(spark, tight + wide)
    av = anova_f(df, "arm", "v").collect()[0]
    bf = brown_forsythe(df, "arm", "v").collect()[0]
    assert av["eta_squared"] < 0.01  # near-identical means
    assert bf["f_stat"] > 100.0      # spread difference is huge


def test_bf_matches_python_model(spark):
    import random

    from pybabe_spark.operators.sketch import brown_forsythe

    rng = random.Random(5)
    rows = [
        (g, round(rng.uniform(0, spread), 2))
        for g, spread in (("a", 20), ("b", 60), ("c", 100))
        for _ in range(31)
    ]
    r = brown_forsythe(_arms(spark, rows), "arm", "v").collect()[0]

    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)

    def median(vs):
        s = sorted(vs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    # replicate the engine's roundings: median to 6dp, z to cents
    zs = {
        g: [round(abs(v - round(median(vs), 6)), 2) for v in vs]
        for g, vs in groups.items()
    }
    n = sum(len(v) for v in zs.values())
    k = len(zs)
    mean = sum(x for v in zs.values() for x in v) / n
    ssb = sum(len(v) * (sum(v) / len(v) - mean) ** 2 for v in zs.values())
    sst = sum((x - mean) ** 2 for v in zs.values() for x in v)
    f_exp = (ssb / (k - 1)) / ((sst - ssb) / (n - k))
    assert abs(r["f_stat"] - f_exp) < 1e-4 * max(1.0, f_exp)
    assert r["n_total"] == n and r["group_count"] == 3


def test_bf_equal_spread_f_small(spark):
    from pybabe_spark.operators.sketch import brown_forsythe

    # same shape shifted: medians differ, deviations identical
    rows = [("a", float(i % 10)) for i in range(100)] + [
        ("b", 500.0 + (i % 10)) for i in range(100)
    ]
    r = brown_forsythe(_arms(spark, rows), "arm", "v").collect()[0]
    assert r["f_stat"] is not None and r["f_stat"] < 1e-6


# ---------------------------------------------------------------------------
# McNemar
# ---------------------------------------------------------------------------


def _preds(spark, rows):
    return spark.createDataFrame(rows, "gold string, pa string, pb string")


def test_mcnemar_hand_checked(spark):
    """Textbook cells: b=10 (A only), c=2 (B only) →
    χ² = (|10−2|−1)²/12 = 49/12."""
    from pybabe_spark.operators.sketch import mcnemar

    rows = (
        [("x", "x", "x")] * 20        # both correct
        + [("x", "y", "y")] * 5       # both wrong
        + [("x", "x", "y")] * 10      # A only
        + [("x", "y", "x")] * 2       # B only
    )
    r = mcnemar(_preds(spark, rows), "gold", "pa", "pb",
                chi2_crit=3.841459).collect()[0]
    assert r["n"] == 37
    assert r["both_correct"] == 20 and r["both_wrong"] == 5
    assert r["a_only_correct"] == 10 and r["b_only_correct"] == 2
    assert abs(r["mcnemar_chi2"] - 49 / 12) < 1e-6
    assert r["significant"] is True  # 49/12 = 4.083 > 3.841


def test_mcnemar_symmetric_discordance_not_significant(spark):
    from pybabe_spark.operators.sketch import mcnemar

    rows = [("x", "x", "y")] * 6 + [("x", "y", "x")] * 6
    r = mcnemar(_preds(spark, rows), "gold", "pa", "pb",
                chi2_crit=3.841459).collect()[0]
    # |b-c|=0 -> corrected numerator clamps to 0
    assert r["mcnemar_chi2"] == 0.0 and r["significant"] is False


def test_mcnemar_degenerate(spark):
    from pybabe_spark.operators.sketch import mcnemar

    # no discordant pairs -> chi2 NULL, not significant
    rows = [("x", "x", "x")] * 4 + [("x", "y", "y")] * 3
    r = mcnemar(_preds(spark, rows), "gold", "pa", "pb",
                chi2_crit=3.841459).collect()[0]
    assert r["mcnemar_chi2"] is None and r["significant"] is False

    # NULLs excluded on any of the three columns
    rows = [("x", "x", None), (None, "x", "x"), ("x", None, "x"),
            ("x", "x", "y")]
    r = mcnemar(_preds(spark, rows), "gold", "pa", "pb").collect()[0]
    assert r["n"] == 1 and r["a_only_correct"] == 1

    # |b-c|=1: continuity correction clamps to 0 exactly
    rows = [("x", "x", "y")] * 3 + [("x", "y", "x")] * 2
    r = mcnemar(_preds(spark, rows), "gold", "pa", "pb").collect()[0]
    assert r["mcnemar_chi2"] == 0.0


# ---------------------------------------------------------------------------
# Cochran–Armitage trend test
# ---------------------------------------------------------------------------


def _dose(spark, rows):
    return spark.createDataFrame(rows, "g string, s int")


def test_trend_matches_python_model(spark):
    import random

    from pybabe_spark.operators.sketch import trend_test

    rng = random.Random(13)
    scores = {"low": 1, "mid": 2, "high": 3}
    # conversion rises with the bucket
    rows = []
    for g, p in (("low", 0.2), ("mid", 0.4), ("high", 0.7)):
        rows += [(g, 1 if rng.random() < p else 0) for _ in range(60)]
    r = trend_test(_dose(spark, rows), "g", "s", scores).collect()[0]

    n = len(rows)
    rr = sum(s for _, s in rows)
    nt = sum(scores[g] for g, _ in rows)
    nt2 = sum(scores[g] ** 2 for g, _ in rows)
    rt = sum(scores[g] * s for g, s in rows)
    num = n * rt - nt * rr
    den = rr * (n - rr) * (n * nt2 - nt * nt)
    z2 = n * num * num / den
    assert abs(r["z2"] - z2) < 1e-4
    assert r["trend_sign"] == 1 and r["significant"] is True
    assert r["n_total"] == n and r["n_success"] == rr


def test_trend_direction_and_flat(spark):
    from pybabe_spark.operators.sketch import trend_test

    scores = {"a": 1, "b": 2, "c": 3}
    falling = (
        [("a", 1)] * 30 + [("a", 0)] * 10
        + [("b", 1)] * 20 + [("b", 0)] * 20
        + [("c", 1)] * 8 + [("c", 0)] * 32
    )
    r = trend_test(_dose(spark, falling), "g", "s", scores).collect()[0]
    assert r["trend_sign"] == -1 and r["significant"] is True

    flat = [(g, i % 2) for g in ("a", "b", "c") for i in range(40)]
    r = trend_test(_dose(spark, flat), "g", "s", scores).collect()[0]
    assert r["trend_sign"] == 0 and r["significant"] is False


def test_trend_chi2_blind_case(spark):
    """A V-shaped rate (high at the ends, low in the middle) is strong
    chi2 association but ~zero TREND — the distinction this test
    prices."""
    from pybabe_spark.operators.sketch import chi2_independence, trend_test

    scores = {"a": 1, "b": 2, "c": 3}
    rows = (
        [("a", 1)] * 35 + [("a", 0)] * 5
        + [("b", 1)] * 5 + [("b", 0)] * 35
        + [("c", 1)] * 35 + [("c", 0)] * 5
    )
    df = _dose(spark, rows)
    tr = trend_test(df, "g", "s", scores).collect()[0]
    assert tr["significant"] is False  # no monotone trend
    chi = chi2_independence(df, "g", "s", crit=5.991465).collect()[0]
    assert chi["significant"] is True  # but strong association


def test_trend_degenerate(spark):
    from pybabe_spark.operators.sketch import trend_test

    scores = {"a": 1, "b": 2}
    # all successes -> variance 0 -> NULL
    rows = [("a", 1)] * 5 + [("b", 1)] * 5
    r = trend_test(_dose(spark, rows), "g", "s", scores).collect()[0]
    assert r["z2"] is None and r["significant"] is False

    # unscored groups and NULLs excluded
    rows = [("a", 1), ("zzz", 1), ("b", 0), (None, 1), ("a", None)]
    r = trend_test(_dose(spark, rows), "g", "s", scores).collect()[0]
    assert r["n_total"] == 2

    import pytest

    with pytest.raises(ValueError):
        trend_test(_dose(spark, rows), "g", "s", {})


# ---------------------------------------------------------------------------
# Cohen's d / Hedges' g
# ---------------------------------------------------------------------------


def test_effect_size_matches_python_model(spark):
    import math
    import random

    from pybabe_spark.operators.sketch import effect_size

    rng = random.Random(29)
    rows = [("control", round(rng.uniform(0, 50), 2)) for _ in range(80)] + [
        ("treatment", round(rng.uniform(10, 70), 2)) for _ in range(70)
    ]
    r = effect_size(_arms(spark, rows), "arm", "v", "control",
                    "treatment").collect()[0]

    a = [int(round(v * 100)) for g, v in rows if g == "control"]
    b = [int(round(v * 100)) for g, v in rows if g == "treatment"]
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    ssa = sum(x * x for x in a) - sum(a) ** 2 / na
    ssb = sum(x * x for x in b) - sum(b) ** 2 / nb
    sp = math.sqrt((ssa + ssb) / (na + nb - 2))
    d_exp = (mb - ma) / sp
    g_exp = d_exp * (1 - 3 / (4 * (na + nb) - 9))
    assert abs(r["cohens_d"] - d_exp) < 1e-5
    assert abs(r["hedges_g"] - g_exp) < 1e-5
    assert abs(r["diff"] - (mb - ma) / 100) < 1e-6


def test_effect_size_scale_invariant_and_degenerate(spark):
    from pybabe_spark.operators.sketch import effect_size

    # same shape at 10x the scale -> identical d (standardized)
    base = [("control", float(i % 5)) for i in range(40)] + [
        ("treatment", 2.0 + i % 5) for i in range(40)
    ]
    big = [(g, v * 10) for g, v in base]
    d1 = effect_size(_arms(spark, base), "arm", "v", "control",
                     "treatment").collect()[0]["cohens_d"]
    d2 = effect_size(_arms(spark, big), "arm", "v", "control",
                     "treatment").collect()[0]["cohens_d"]
    assert abs(d1 - d2) < 1e-6

    # n=1 arm -> NULL d
    rows = [("control", 1.0), ("treatment", 2.0), ("treatment", 3.0)]
    r = effect_size(_arms(spark, rows), "arm", "v", "control",
                    "treatment").collect()[0]
    assert r["cohens_d"] is None and r["diff"] is not None

    # zero pooled variance -> NULL
    rows = [("control", 1.0)] * 3 + [("treatment", 2.0)] * 3
    r = effect_size(_arms(spark, rows), "arm", "v", "control",
                    "treatment").collect()[0]
    assert r["cohens_d"] is None


def test_cliffs_delta_matches_brute_force(spark):
    import random

    from pybabe_spark.operators.sketch import cliffs_delta

    rng = random.Random(55)
    rows = [("control", float(rng.randint(0, 20))) for _ in range(40)] + [
        ("treatment", float(rng.randint(5, 25))) for _ in range(35)
    ]
    r = cliffs_delta(_arms(spark, rows), "arm", "v", "control",
                     "treatment").collect()[0]
    a = [v for g, v in rows if g == "control"]
    b = [v for g, v in rows if g == "treatment"]
    gt = sum(1 for x in b for y in a if x > y)
    lt = sum(1 for x in b for y in a if x < y)
    delta = (gt - lt) / (len(a) * len(b))
    assert abs(r["delta"] - delta) < 2e-6  # floored ppm
    assert r["n_control"] == 40 and r["n_treatment"] == 35


def test_cliffs_delta_extremes(spark):
    from pybabe_spark.operators.sketch import cliffs_delta

    sep = [("control", float(i)) for i in range(10)] + [
        ("treatment", 100.0 + i) for i in range(10)
    ]
    r = cliffs_delta(_arms(spark, sep), "arm", "v", "control",
                     "treatment").collect()[0]
    assert r["delta_ppm"] == 1_000_000

    same = [("control", 5.0)] * 6 + [("treatment", 5.0)] * 6
    r = cliffs_delta(_arms(spark, same), "arm", "v", "control",
                     "treatment").collect()[0]
    assert r["delta_ppm"] == 0

    one_arm = [("control", 1.0)]
    r = cliffs_delta(_arms(spark, one_arm), "arm", "v", "control",
                     "treatment").collect()[0]
    assert r["delta"] is None


# ---------------------------------------------------------------------------
# ratio_metric_ci (delta method)
# ---------------------------------------------------------------------------


def test_ratio_ci_matches_python_model(spark):
    import math
    import random

    from pybabe_spark.operators.sketch import ratio_metric_ci

    rng = random.Random(61)
    rows = []
    for u in range(80):
        for _ in range(rng.randint(1, 6)):
            rows.append((u, round(rng.uniform(0, 20), 2), 1.0))
    df = spark.createDataFrame(rows, "u int, x double, y double")
    r = ratio_metric_ci(df, "u", "x", "y").collect()[0]

    per = {}
    for u, x, y in rows:
        cx, cy = per.get(u, (0, 0))
        per[u] = (cx + int(round(x * 100)), cy + int(round(y * 100)))
    xs = [v[0] for v in per.values()]
    ys = [v[1] for v in per.values()]
    n = len(per)
    R = sum(xs) / sum(ys)
    vx = (n * sum(v * v for v in xs) - sum(xs) ** 2) / (n * (n - 1))
    vy = (n * sum(v * v for v in ys) - sum(ys) ** 2) / (n * (n - 1))
    cxy = (n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)) / (
        n * (n - 1)
    )
    ybar = sum(ys) / n
    var_r = (vx - 2 * R * cxy + R * R * vy) / (n * ybar * ybar)
    half = 1.959964 * math.sqrt(var_r)
    assert r["n_units"] == n
    assert abs(r["ratio"] - R) < 1e-6
    assert abs(r["ci_lo"] - (R - half)) < 1e-5
    assert abs(r["ci_hi"] - (R + half)) < 1e-5
    assert r["ci_lo"] < r["ratio"] < r["ci_hi"]


def test_ratio_ci_constant_denominator_reduces_to_mean_ci(spark):
    """With y ≡ 1 per unit, the ratio is the plain mean of x and the
    delta interval collapses to the classic mean CI."""
    import math

    from pybabe_spark.operators.sketch import ratio_metric_ci

    vals = [float(i % 7) + 1 for i in range(50)]
    rows = [(i, v, 1.0) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "u int, x double, y double")
    r = ratio_metric_ci(df, "u", "x", "y").collect()[0]
    n = len(vals)
    m = sum(vals) / n
    var = sum((v - m) ** 2 for v in vals) / (n - 1)
    half = 1.959964 * math.sqrt(var / n)
    assert abs(r["ratio"] - m) < 1e-9
    assert abs(r["ci_lo"] - (m - half)) < 1e-5
    assert abs(r["ci_hi"] - (m + half)) < 1e-5


def test_ratio_ci_degenerate_and_groups(spark):
    from pybabe_spark.operators.sketch import ratio_metric_ci

    # one unit: CI undefined
    rows = [(1, 5.0, 2.0)]
    df = spark.createDataFrame(rows, "u int, x double, y double")
    r = ratio_metric_ci(df, "u", "x", "y").collect()[0]
    assert r["ratio"] == 2.5 and r["ci_lo"] is None

    # zero denominator total: ratio undefined
    rows = [(1, 5.0, 0.0), (2, 3.0, 0.0)]
    df = spark.createDataFrame(rows, "u int, x double, y double")
    r = ratio_metric_ci(df, "u", "x", "y").collect()[0]
    assert r["ratio"] is None

    # grouped: per-group rows
    rows = [("a", 1, 2.0, 1.0), ("a", 2, 4.0, 1.0),
            ("b", 3, 10.0, 2.0), ("b", 4, 20.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, u int, x double, y double")
    got = {r["g"]: r for r in
           ratio_metric_ci(df, "u", "x", "y", by="g").collect()}
    assert abs(got["a"]["ratio"] - 3.0) < 1e-9
    assert abs(got["b"]["ratio"] - 7.5) < 1e-9
