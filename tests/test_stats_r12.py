"""Hand-model tests for the r12 statistics batch: tukey_hsd,
friedman_test, herfindahl_index, partial_corr, odds_ratio,
kendall_tau_b, lorenz_curve. Each is checked against an independent
Python computation (textbook formulas over exact ints / numpy), plus
its guard rails."""

import math

import pytest


def test_tukey_hsd_matches_hand_model(spark):
    from pybabe_spark.operators.sketch import tukey_hsd

    data = (
        [("a", 10.0), ("a", 12.0), ("a", 11.0)]
        + [("b", 20.0), ("b", 22.0), ("b", 21.0)]
        + [("c", 10.5), ("c", 11.5)]
    )
    df = spark.createDataFrame(data, "g string, v double")
    got = {
        (r["g_1"], r["g_2"]): r
        for r in tukey_hsd(df, "g", "v", q_crit=4.0).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    # hand model on cents ints
    import collections

    vals = collections.defaultdict(list)
    for g, v in data:
        vals[g].append(int(round(v * 100)))
    n = sum(len(v) for v in vals.values())
    k = len(vals)
    ssw_terms = {
        g: sum(x * x for x in v) for g, v in vals.items()
    }
    # per-group rounded s^2/n term (6 dp) then decimal sum
    from decimal import Decimal, ROUND_HALF_UP

    t = sum(
        Decimal(repr(sum(v) ** 2 / len(v))).quantize(
            Decimal("1e-6"), rounding=ROUND_HALF_UP
        )
        for v in vals.values()
    )
    msw = (float(sum(ssw_terms.values())) - float(t)) / (n - k)
    for (g1, g2), r in got.items():
        n1, n2 = len(vals[g1]), len(vals[g2])
        m1 = sum(vals[g1]) / (100.0 * n1)
        m2 = sum(vals[g2]) / (100.0 * n2)
        se = math.sqrt(msw / 2.0 * (1.0 / n1 + 1.0 / n2)) / 100.0
        assert abs(r["mean_diff"] - (m1 - m2)) < 1e-6
        assert abs(r["q_stat"] - abs(m1 - m2) / se) < 1e-5
        assert r["significant"] == (
            round(abs(m1 - m2) / se, 6) > 4.0
        ), (g1, g2)
    # a vs b separated by ~10 units: significant; a vs c is not
    assert got[("a", "b")]["significant"] is True
    assert got[("a", "c")]["significant"] is False

    with pytest.raises(ValueError):
        tukey_hsd(df, "g", "v", max_groups=1)


def test_friedman_textbook_no_ties(spark):
    """Classic 4-block 3-treatment layout with clean within-block
    ranks (1,2,3 everywhere in the same order): χ² = 12·Σ(R−R̄)²/...
    reduces to the maximum 2·B·(k−1)/... — compute longhand."""
    from pybabe_spark.operators.sketch import friedman_test

    # every block ranks t1 < t2 < t3 -> R = (4, 8, 12)
    rows = []
    for b in range(4):
        rows += [(b, "t1", 1.0 + b), (b, "t2", 10.0 + b),
                 (b, "t3", 20.0 + b)]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    out = friedman_test(df, "b", "t", "v", chi2_crit=5.991465).collect()[0]
    assert (out["k"], out["n_blocks"]) == (3, 4)
    # R_j = 4, 8, 12 ; chi2 = 12/(4*3*4) * (16+64+144) - 3*4*4 = 8.0
    assert out["chi2"] == 8.0
    assert out["chi2_tie_corrected"] == 8.0  # no ties
    assert out["significant"] is True

    # incomplete blocks are dropped: add a block with only 2 cells
    extra = rows + [(9, "t1", 5.0), (9, "t2", 6.0)]
    df2 = spark.createDataFrame(extra, "b int, t string, v double")
    out2 = friedman_test(df2, "b", "t", "v").collect()[0]
    assert out2["n_blocks"] == 4  # block 9 incomplete -> excluded

    # duplicate (block, treatment) cell must raise, not mis-rank
    dup = rows + [(0, "t1", 99.0)]
    df3 = spark.createDataFrame(dup, "b int, t string, v double")
    with pytest.raises(Exception, match="duplicate"):
        friedman_test(df3, "b", "t", "v").collect()


def test_friedman_all_tied_null_corrected(spark):
    from pybabe_spark.operators.sketch import friedman_test

    rows = [(b, t, 5.0) for b in range(3) for t in ("x", "y")]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    out = friedman_test(df, "b", "t", "v").collect()[0]
    assert out["chi2_tie_corrected"] is None  # C = 0, every block tied


def test_herfindahl_hand_values(spark):
    from pybabe_spark.operators.sketch import herfindahl_index

    df = spark.createDataFrame(
        [("m", "e1", 100.0)]  # monopoly group
        + [("d", "e1", 50.0), ("d", "e2", 50.0)]  # duopoly, even
        + [("s", "e1", 80.0), ("s", "e2", 20.0)],  # skewed
        "g string, e string, v double",
    )
    got = {r["g"]: r for r in
           herfindahl_index(df, "e", "v", by="g").collect()}
    assert got["m"]["hhi_ppm"] == 1_000_000
    assert got["m"]["hhi_norm_ppm"] is None  # n = 1
    assert got["d"]["hhi_ppm"] == 500_000
    assert got["d"]["hhi_norm_ppm"] == 0
    # 0.8^2 + 0.2^2 = 0.68 ; normalized = (0.68 - 0.5) / 0.5 = 0.36
    assert got["s"]["hhi_ppm"] == 680_000
    assert got["s"]["hhi_norm_ppm"] == 360_000


def test_partial_corr_kills_confounded_association(spark):
    """x and y both driven by z with no direct link: raw r_xy is
    strongly positive, partial r_xy·z collapses toward 0. Model the
    exact values with numpy on the cent-lifted ints."""
    import numpy as np

    from pybabe_spark.operators.sketch import partial_corr

    rows = []
    for i in range(40):
        z = float(i)
        nx = (i * 7919) % 101  # two INDEPENDENT deterministic noises,
        ny = (i * 104729) % 97  # cent-exact so the 2-dp lift is lossless
        rows.append((z + nx * 0.01, 2.0 * z + ny * 0.01, z))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = partial_corr(df, "x", "y", "z").collect()[0]
    xs = np.array([int(round(x * 100)) for x, _, _ in rows], dtype=float)
    ys = np.array([int(round(y * 100)) for _, y, _ in rows], dtype=float)
    zs = np.array([int(round(z * 100)) for _, _, z in rows], dtype=float)

    def r(a, b):
        n = len(a)
        cov = n * (a * b).sum() - a.sum() * b.sum()
        va = n * (a * a).sum() - a.sum() ** 2
        vb = n * (b * b).sum() - b.sum() ** 2
        return cov / (math.sqrt(va) * math.sqrt(vb))

    rxy, rxz, ryz = r(xs, ys), r(xs, zs), r(ys, zs)
    expect = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz**2) * (1 - ryz**2)
    )
    assert abs(out["r_xy"] - rxy) < 1e-5
    assert out["r_xy"] > 0.99  # confounded raw correlation
    assert abs(out["r_xy_given_z"] - expect) < 1e-4
    assert abs(out["r_xy_given_z"]) < 0.9  # partialling z removes most

    const = spark.createDataFrame(
        [(1.0, 2.0, 5.0), (2.0, 3.0, 5.0)], "x double, y double, z double"
    )
    row = partial_corr(const, "x", "y", "z").collect()[0]
    assert row["r_xy_given_z"] is None  # zero z variance


def test_odds_ratio_hand_2x2(spark):
    from pybabe_spark.operators.sketch import odds_ratio

    # a=30 b=10 c=20 d=40 -> OR = (30*40)/(10*20) = 6 ; RR = 0.75/(1/3)
    rows = (
        [(True, True)] * 30 + [(True, False)] * 10
        + [(False, True)] * 20 + [(False, False)] * 40
    )
    df = spark.createDataFrame(rows, "e boolean, o boolean")
    r = odds_ratio(df, "e", "o").collect()[0]
    assert (r["n_exposed_pos"], r["n_exposed_neg"]) == (30, 10)
    assert (r["n_unexposed_pos"], r["n_unexposed_neg"]) == (20, 40)
    assert r["odds_ratio"] == 6.0
    assert abs(r["relative_risk"] - 2.25) < 1e-9
    se = math.sqrt(1 / 30 + 1 / 10 + 1 / 20 + 1 / 40)
    lo = math.exp(math.log(6.0) - 1.959964 * se)
    hi = math.exp(math.log(6.0) + 1.959964 * se)
    assert abs(r["or_ci_low"] - lo) < 1e-5
    assert abs(r["or_ci_high"] - hi) < 1e-5
    assert r["or_ci_low"] < 6.0 < r["or_ci_high"]

    zero = spark.createDataFrame(
        [(True, True), (False, False)], "e boolean, o boolean"
    )
    rz = odds_ratio(zero, "e", "o").collect()[0]
    assert rz["odds_ratio"] is None  # zero cell -> undefined


def test_kendall_tau_b_vs_quadratic_reference(spark):
    from pybabe_spark.operators.sketch import kendall_tau_b

    pts = [(i % 7, (i * 3) % 5) for i in range(30)]
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    out = kendall_tau_b(df, "x", "y").collect()[0]
    con = dis = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                con += 1
            elif dx * dy < 0:
                dis += 1
    n = len(pts)
    tx = {}
    ty = {}
    for x, y in pts:
        tx[x] = tx.get(x, 0) + 1
        ty[y] = ty.get(y, 0) + 1
    a = n * (n - 1) - sum(t * (t - 1) for t in tx.values())
    b = n * (n - 1) - sum(t * (t - 1) for t in ty.values())
    expect = 2.0 * (con - dis) / math.sqrt(float(a) * float(b))
    assert (out["concordant"], out["discordant"]) == (con, dis)
    assert abs(out["tau_b"] - expect) < 1e-6

    # perfect monotone, no ties -> exactly 1
    mono = spark.createDataFrame(
        [(float(i), float(i * 2)) for i in range(10)],
        "x double, y double",
    )
    assert kendall_tau_b(mono, "x", "y").collect()[0]["tau_b"] == 1.0
    # constant margin -> NULL
    flat = spark.createDataFrame(
        [(1.0, float(i)) for i in range(5)], "x double, y double"
    )
    assert kendall_tau_b(flat, "x", "y").collect()[0]["tau_b"] is None
    # guard trips on a domain wider than max_cells
    wide = spark.createDataFrame(
        [(float(i), float(i)) for i in range(50)], "x double, y double"
    )
    with pytest.raises(Exception, match="max_cells"):
        kendall_tau_b(wide, "x", "y", max_cells=10).collect()


def test_lorenz_curve_hand_deciles(spark):
    from pybabe_spark.operators.skew import lorenz_curve

    # one key, values 1..10 in 2 buckets: bottom half = 15/55 of total
    df = spark.createDataFrame(
        [("k", float(i)) for i in range(1, 11)], "g string, v double"
    )
    got = {r["bucket"]: r for r in
           lorenz_curve(df, "g", "v", n_buckets=2).collect()}
    assert got[1]["cum_n"] == 5 and got[2]["cum_n"] == 10
    assert got[1]["cum_pop_share_ppm"] == 500_000
    assert got[1]["cum_value_share_ppm"] == (15 * 1_000_000) // 55
    assert got[2]["cum_value_share_ppm"] == 1_000_000

    with pytest.raises(ValueError):
        lorenz_curve(df, "g", "v", n_buckets=1)
    neg = spark.createDataFrame([("k", -1.0)], "g string, v double")
    with pytest.raises(Exception, match="negative"):
        lorenz_curve(neg, "g", "v").collect()


def test_page_trend_perfect_increase(spark):
    """Every block ranks t1<t2<t3 in weight order: R_j = B·j, so
    L = B·Σj·j = 14B, mu = 12B, sigma = sqrt(2B) -> z = 2B/sqrt(2B)."""
    from pybabe_spark.operators.sketch import page_trend_test

    rows = []
    for b in range(4):
        rows += [(b, "t1", 1.0 + b), (b, "t2", 10.0 + b),
                 (b, "t3", 20.0 + b)]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    scores = {"t1": 1, "t2": 2, "t3": 3}
    out = page_trend_test(df, "b", "t", "v", scores).collect()[0]
    assert (out["k"], out["n_blocks"]) == (3, 4)
    assert out["l_stat"] == 56.0  # 14 * 4
    expect_z = (56.0 - 48.0) / math.sqrt(8.0)
    assert abs(out["z"] - expect_z) < 1e-6
    assert out["significant"] is True

    # reversed ordering flips the sign and the one-sided verdict
    rev = page_trend_test(
        df, "b", "t", "v", {"t1": 3, "t2": 2, "t3": 1}
    ).collect()[0]
    assert abs(rev["z"] + expect_z) < 1e-6
    assert rev["significant"] is False

    # unscored treatments are excluded BEFORE the complete filter
    extra = rows + [(b, "t9", 99.0) for b in range(4)]
    df2 = spark.createDataFrame(extra, "b int, t string, v double")
    out2 = page_trend_test(df2, "b", "t", "v", scores).collect()[0]
    assert (out2["k"], out2["n_blocks"]) == (3, 4)
    assert out2["l_stat"] == 56.0

    with pytest.raises(ValueError, match="permutation"):
        page_trend_test(df, "b", "t", "v", {"t1": 1, "t2": 2, "t3": 4})
    with pytest.raises(ValueError, match="non-empty"):
        page_trend_test(df, "b", "t", "v", {})


def test_cochran_q_hand_matrix(spark):
    """4 blocks x 3 treatments 0/1 matrix: C=(4,2,1) T=7 SumC2=21
    R=(2,1,3,1) SumR2=15 -> Q = 2*(3*21-49)/(3*7-15) = 14/3."""
    from pybabe_spark.operators.sketch import cochran_q

    mat = [(0, 1, 1, 0), (1, 1, 0, 0), (2, 1, 1, 1), (3, 1, 0, 0)]
    rows = []
    for b, *vals in mat:
        for j, v in enumerate(vals):
            rows.append((b, f"t{j}", v))
    df = spark.createDataFrame(rows, "b int, t string, s int")
    out = cochran_q(df, "b", "t", "s", chi2_crit=5.991465).collect()[0]
    assert (out["k"], out["n_blocks"]) == (3, 4)
    assert abs(out["q"] - round(2 * 14 / 6, 6)) < 1e-9
    assert out["significant"] is False

    # all-uniform blocks (every R_i = 0 or k) carry no information
    flat = spark.createDataFrame(
        [(b, t, 1) for b in range(3) for t in ("x", "y")],
        "b int, t string, s int",
    )
    assert cochran_q(flat, "b", "t", "s").collect()[0]["q"] is None
    # duplicate cell raises
    dup = rows + [(0, "t0", 0)]
    with pytest.raises(Exception, match="duplicate"):
        cochran_q(
            spark.createDataFrame(dup, "b int, t string, s int"),
            "b", "t", "s",
        ).collect()


def test_mcc_hand_confusion(spark):
    from pybabe_spark.operators.classifier import mcc

    rows = (
        [(True, True)] * 4 + [(False, True)] * 1
        + [(True, False)] * 2 + [(False, False)] * 3
    )
    df = spark.createDataFrame(rows, "y boolean, p boolean")
    out = mcc(df, "y", "p").collect()[0]
    assert (out["tp"], out["fp"], out["fn"], out["tn"]) == (4, 1, 2, 3)
    expect = 10.0 / (
        math.sqrt(5.0) * math.sqrt(6.0) * math.sqrt(4.0) * math.sqrt(5.0)
    )
    assert abs(out["mcc"] - expect) < 1e-6

    perfect = spark.createDataFrame(
        [(True, True)] * 3 + [(False, False)] * 3, "y boolean, p boolean"
    )
    assert mcc(perfect, "y", "p").collect()[0]["mcc"] == 1.0
    constant = spark.createDataFrame(
        [(True, True), (False, True)], "y boolean, p boolean"
    )
    assert mcc(constant, "y", "p").collect()[0]["mcc"] is None


def test_jaccard_link_prediction_hand_graph(spark):
    from pybabe_spark.operators.graph import jaccard_link_prediction

    # square with one diagonal: 1-2, 1-3, 2-3, 2-4, 3-4. Non-edge
    # (1,4): N(1)={2,3}, N(4)={2,3} -> cn=2, J = 2/(2+2-2) = 1.
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    out = jaccard_link_prediction(df, top_n=10).collect()
    rows = {(r["id_a"], r["id_b"]): r for r in out}
    assert rows[(1, 4)]["common_neighbors"] == 2
    assert rows[(1, 4)]["jaccard_ppm"] == 1_000_000
    # every returned pair is a non-edge
    assert not (set(rows) & set(edges))
    # capping out the shared neighbors (deg 2 and 3 have degree 3)
    # removes the pair entirely
    capped = jaccard_link_prediction(df, max_degree=2, top_n=10).collect()
    assert (1, 4) not in {(r["id_a"], r["id_b"]) for r in capped}
    with pytest.raises(ValueError):
        jaccard_link_prediction(df, max_degree=1)


def test_assortativity_star_is_minus_one(spark):
    from pybabe_spark.operators.graph import assortativity

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a int, id_b int"
    )
    out = assortativity(star).collect()[0]
    assert out["n_edges"] == 3
    assert out["r"] == -1.0
    # a clique is degree-regular: zero variance -> NULL
    clique = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "id_a int, id_b int"
    )
    assert assortativity(clique).collect()[0]["r"] is None


def test_bollinger_bands_hand_window(spark):
    from datetime import datetime

    from pybabe_spark.operators.timeseries import bollinger_bands

    rows = [
        ("k", datetime(2024, 1, 1, h), float(h + 1)) for h in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    got = {r["t"]: r for r in
           bollinger_bands(df, "g", "ts", "v", window=3).collect()}
    ts = sorted(got)
    assert got[ts[0]]["mean"] is None and got[ts[1]]["mean"] is None
    # window [1,2,3]: mean 2, population var 2/3
    m, var = 2.0, 2.0 / 3.0
    sd = math.sqrt(9 * var * 10000) / 300.0  # engine shape, cents
    assert got[ts[2]]["mean"] == 2.0
    assert abs(got[ts[2]]["upper"] - round(m + 2 * sd, 6)) < 1e-9
    assert abs(got[ts[2]]["lower"] - round(m - 2 * sd, 6)) < 1e-9
    assert got[ts[4]]["mean"] == 4.0

    # a gap resets the full-window guard
    gap = [r for r in rows if r[1].hour != 3]
    got2 = {r["t"]: r for r in bollinger_bands(
        spark.createDataFrame(gap, "g string, ts timestamp, v double"),
        "g", "ts", "v", window=3).collect()}
    ts2 = sorted(got2)
    assert got2[ts2[2]]["mean"] is not None  # hours 0,1,2 complete
    assert got2[ts2[3]]["mean"] is None  # hour 4: frame has only {2,4}
    with pytest.raises(ValueError):
        bollinger_bands(df, "g", "ts", "v", window=1)


def test_ece_hand_bins(spark):
    """Two bins with known gaps: scores 0.2 (4 rows, 1 pos) and 0.8
    (4 rows, 4 pos): gaps |1-4·0.2·1e6/1e6|... computed exactly."""
    from pybabe_spark.operators.classifier import ece

    rows = ([(0.2, 1)] + [(0.2, 0)] * 3) + [(0.8, 1)] * 4
    df = spark.createDataFrame(rows, "score double, label int")
    out = ece(df, "score", "label", bins=10).collect()[0]
    assert (out["n"], out["n_bins"]) == (8, 2)
    # bin(0.2): p=1, sm=4*200000 -> |1e6 - 8e5| = 2e5
    # bin(0.8): p=4, sm=4*800000 -> |4e6 - 3.2e6| = 8e5
    assert out["ece_ppm"] == (200_000 + 800_000) // 8
    # per-bin ppm gaps: 2e5/4 = 50000 ; 8e5/4 = 200000
    assert out["mce_ppm"] == 200_000

    # perfectly calibrated constant-score coin: gap = 0 exactly
    cal = spark.createDataFrame(
        [(0.5, 1), (0.5, 0)] * 5, "score double, label int"
    )
    r = ece(cal, "score", "label").collect()[0]
    assert r["ece_ppm"] == 0 and r["mce_ppm"] == 0
    with pytest.raises(ValueError):
        ece(df, "score", "label", bins=1)


def test_pr_auc_matches_sklearn_style_model(spark):
    """Tie-safe AP against a pure-python replay of the same
    definition, plus the classic anchors: perfect ranking -> 1,
    all-ties -> base rate."""
    from pybabe_spark.operators.classifier import pr_auc

    data = [(0.9, 1), (0.8, 0), (0.8, 1), (0.6, 0), (0.5, 1), (0.2, 0)]
    df = spark.createDataFrame(data, "score double, label int")
    out = pr_auc(df, "score", "label").collect()[0]
    # python replay on the distinct-score grain, descending
    from collections import defaultdict

    cells = defaultdict(lambda: [0, 0])
    for s, y in data:
        m = int(round(s * 1_000_000))
        cells[m][0] += 1
        cells[m][1] += y
    cumn = cumtp = 0
    n_pos = sum(y for _, y in data)
    from decimal import Decimal, ROUND_HALF_UP

    terms = Decimal(0)
    for m in sorted(cells, reverse=True):
        c, p = cells[m]
        cumn += c
        cumtp += p
        terms += Decimal(repr(p * cumtp / cumn)).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP
        )
    expect = round(float(terms) / n_pos, 6)
    assert (out["n_pos"], out["n_neg"]) == (3, 3)
    assert abs(out["average_precision"] - expect) < 1e-9

    perfect = spark.createDataFrame(
        [(0.9, 1)] * 3 + [(0.1, 0)] * 3, "score double, label int"
    )
    assert pr_auc(perfect, "score", "label").collect()[0][
        "average_precision"] == 1.0
    ties = spark.createDataFrame(
        [(0.5, 1)] * 2 + [(0.5, 0)] * 6, "score double, label int"
    )
    assert pr_auc(ties, "score", "label").collect()[0][
        "average_precision"] == 0.25
    onec = spark.createDataFrame(
        [(0.5, 0)] * 3, "score double, label int"
    )
    assert pr_auc(onec, "score", "label").collect()[0][
        "average_precision"] is None


def test_lsh_calibration_separates_dup_from_noise(spark):
    """A corpus with exact-duplicate pairs and unrelated docs: the
    duplicates land in the top decile with Jaccard 1e6, and every
    histogram row is a real candidate count (sums to the pair
    total)."""
    from pybabe_spark.operators.dedup_scale import (
        lsh_candidate_calibration, minhash_lsh_pairs,
    )

    rows = []
    for i in range(8):
        text = f"alpha beta gamma delta epsilon zeta{i} eta{i} theta{i}"
        rows += [(2 * i, text), (2 * i + 1, text)]  # exact dup pairs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hist = {r["jaccard_decile"]: r["n_pairs"] for r in
            lsh_candidate_calibration(df, "doc_id", "text").collect()}
    n_pairs = minhash_lsh_pairs(df, "doc_id", "text").count()
    assert sum(hist.values()) == n_pairs
    assert hist.get(9, 0) >= 8  # every exact-dup pair scores 1e6
    with pytest.raises(ValueError):
        lsh_candidate_calibration(df, "doc_id", "text", n_buckets=1)


def test_grubbs_hand_model(spark):
    from pybabe_spark.operators.sketch import grubbs_test

    vals = [10.0, 11.0, 10.5, 9.5, 10.2, 30.0]  # 30 is the outlier
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, v double")
    out = grubbs_test(df, "v", by="g", g_crit=1.887).collect()[0]
    cents = [int(round(v * 100)) for v in vals]
    n = len(cents)
    mean = sum(cents) / n
    sd = math.sqrt(
        (n * sum(c * c for c in cents) - sum(cents) ** 2) / (n * (n - 1))
    )
    g = max(max(cents) - mean, mean - min(cents)) / sd
    assert out["n"] == 6
    assert out["suspect_value"] == 30.0
    assert abs(out["g_stat"] - round(g, 6)) < 1e-9
    assert out["significant"] is True  # G ≈ 2.02 > 1.887 (n=6, α=.05)

    # low-side outlier flips the suspect side
    low = spark.createDataFrame(
        [("g", v) for v in [10.0, 11.0, 10.5, -20.0]],
        "g string, v double",
    )
    assert grubbs_test(low, "v", by="g").collect()[0][
        "suspect_value"] == -20.0
    # constant series: NULL G
    const = spark.createDataFrame(
        [("g", 5.0)] * 4, "g string, v double"
    )
    assert grubbs_test(const, "v", by="g").collect()[0]["g_stat"] is None


def test_runs_test_patterns(spark):
    from datetime import datetime

    from pybabe_spark.operators.timeseries import runs_test

    base = datetime(2024, 1, 1)

    def series(vals, key="k"):
        return [
            (key, base.replace(hour=h % 24, day=1 + h // 24), float(v))
            for h, v in enumerate(vals)
        ]

    # perfect alternation around the mean: maximum runs, z > 0
    alt = spark.createDataFrame(
        series([1, 9] * 6), "g string, ts timestamp, v double"
    )
    r = runs_test(alt, "g", "ts", "v").collect()[0]
    assert (r["n"], r["n_above"], r["n_below"]) == (12, 6, 6)
    assert r["runs"] == 12
    # hand z: mu = 2*36/12+1 = 7 ; sigma2 = 72*(72-12)/(144*11)
    mu = 7.0
    sigma = math.sqrt(72 * 60 / (144.0 * 11))
    assert abs(r["z"] - round((12 - mu) / sigma, 6)) < 1e-9
    assert r["significant"] is True

    # two blocks (all lows then all highs): exactly 2 runs, z < 0
    blocks = spark.createDataFrame(
        series([1] * 6 + [9] * 6), "g string, ts timestamp, v double"
    )
    rb = runs_test(blocks, "g", "ts", "v").collect()[0]
    assert rb["runs"] == 2 and rb["z"] < 0
    # constant series: one side empty -> NULL z
    const = spark.createDataFrame(
        series([5] * 8), "g string, ts timestamp, v double"
    )
    rc = runs_test(const, "g", "ts", "v").collect()[0]
    assert rc["z"] is None and rc["significant"] is False
