"""ewma_smooth and mad_anomalies unit behavior on hand-built series."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.anomaly import mad_anomalies
from pybabe_spark.operators.timeseries import ewma_smooth

_TS = "id long, ts timestamp, k string, v double"


def _df(spark, vals, k="a"):
    rows = [
        (i, datetime(2024, 1, 1, 0, i), k, v) for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, _TS)


def test_ewma_halflife_weights(spark):
    out = (
        ewma_smooth(_df(spark, [1.0, 2.0, 4.0]), "k", "v", "ts", id_col="id",
                    depth=2)
        .orderBy("id")
        .collect()
    )
    # depth=2, weights (2,1) on cents: 200/200, (400+100)/300, (800+200)/300
    assert [r["ewma"] for r in out] == [1.0, 500 / 300, 1000 / 300]


def test_ewma_null_values_drop_their_term(spark):
    out = (
        ewma_smooth(_df(spark, [1.0, None, 4.0]), "k", "v", "ts",
                    id_col="id", depth=2)
        .orderBy("id")
        .collect()
    )
    # row1: value NULL, lag=1.0 with weight 1 -> 100/100 = 1.0
    # row2: own 4.0 (weight 2), lag NULL -> 800/200 = 4.0
    assert [r["ewma"] for r in out] == [1.0, 1.0, 4.0]


def test_ewma_all_null_window_is_null_and_depth_guard(spark):
    out = ewma_smooth(_df(spark, [None]), "k", "v", "ts", depth=3).collect()
    assert out[0]["ewma"] is None
    with pytest.raises(ValueError, match="depth"):
        ewma_smooth(_df(spark, [1.0]), "k", "v", "ts", depth=0)
    with pytest.raises(ValueError, match="depth"):
        ewma_smooth(_df(spark, [1.0]), "k", "v", "ts", depth=31)


def test_mad_flags_robust_outlier(spark):
    df = _df(spark, [10.0, 12.0, 14.0, 16.0, 18.0, 100.0], k="b")
    out = mad_anomalies(df, "k", "v", "ts", threshold=3.5).collect()
    # median 15, devs (5,3,1,1,3,85), MAD 3 -> only 100 flags (19.1σ̃)
    assert len(out) == 1 and out[0]["v"] == 100.0
    assert out[0]["median"] == 15.0 and out[0]["mad"] == 3.0
    assert out[0]["mscore"] == pytest.approx(0.6745 * 85 / 3, abs=1e-6)


def test_mad_zero_mad_flags_nothing(spark):
    # majority-constant series: MAD = 0 -> modified z undefined -> empty
    df = _df(spark, [1.0, 1.0, 1.0, 1.0, 100.0])
    assert mad_anomalies(df, "k", "v", "ts").count() == 0


def test_mad_ignores_nulls(spark):
    df = _df(spark, [10.0, 12.0, 14.0, None, 16.0, 18.0, 100.0])
    out = mad_anomalies(df, "k", "v", "ts", threshold=3.5).collect()
    assert [r["v"] for r in out] == [100.0]


def test_ewma_and_mad_plans_lint_clean(spark):
    from pybabe_spark.plans.lint import plan_lint

    df = _df(spark, [1.0, 2.0, 3.0])
    assert plan_lint(ewma_smooth(df, "k", "v", "ts", depth=4)) == []
    assert plan_lint(mad_anomalies(df, "k", "v", "ts")) == []


def test_time_weighted_avg_holds_values(spark):
    from datetime import datetime

    from pybabe_spark.operators.timeseries import time_weighted_avg

    rows = [
        # value 10 held 1s, value 20 held 3s -> twa = (10+60)/4 = 17.5
        (1, datetime(2024, 1, 1, 0, 0, 0), "a", 10.0),
        (2, datetime(2024, 1, 1, 0, 0, 1), "a", 20.0),
        (3, datetime(2024, 1, 1, 0, 0, 4), "a", 99.0),  # right boundary
        # key with a single observation: no interval -> absent
        (4, datetime(2024, 1, 1), "b", 5.0),
        # NULL value must not truncate the neighbors' interval
        (5, datetime(2024, 1, 1, 0, 0, 0), "c", 10.0),
        (6, datetime(2024, 1, 1, 0, 0, 1), "c", None),
        (7, datetime(2024, 1, 1, 0, 0, 2), "c", 10.0),
    ]
    df = spark.createDataFrame(rows, _TS)
    out = {r["k"]: r for r in
           time_weighted_avg(df, "k", "ts", "v", id_col="id").collect()}
    assert set(out) == {"a", "c"}
    assert out["a"]["twa"] == 17.5
    assert out["a"]["n_intervals"] == 2
    assert out["a"]["total_seconds"] == 4.0
    assert out["c"]["twa"] == 10.0 and out["c"]["total_seconds"] == 2.0


def test_time_weighted_avg_plan_lints_clean(spark):
    from pybabe_spark.operators.timeseries import time_weighted_avg
    from pybabe_spark.plans.lint import plan_lint

    df = _df(spark, [1.0, 2.0])
    assert plan_lint(time_weighted_avg(df, "k", "ts", "v")) == []


def test_time_weighted_avg_zero_duration_key_is_null(spark):
    from datetime import datetime

    from pybabe_spark.operators.timeseries import time_weighted_avg

    t = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t, "z", 1.0), (2, t, "z", 2.0)], _TS
    )
    out = time_weighted_avg(df, "k", "ts", "v", id_col="id").collect()
    # one zero-width interval: NULL twa, not an engine-dependent 0/0
    assert len(out) == 1 and out[0]["twa"] is None
    assert out[0]["total_seconds"] == 0.0


def test_ewma_matches_python_model_randomized(spark):
    import random
    from datetime import datetime, timedelta

    rng = random.Random(5)
    rows = []
    i = 0
    for k in "abc":
        for _ in range(rng.randint(3, 12)):
            v = None if rng.random() < 0.15 else round(rng.uniform(0, 99), 2)
            rows.append((i, datetime(2024, 1, 1) + timedelta(minutes=i), k, v))
            i += 1
    df = spark.createDataFrame(rows, _TS)
    depth = 3
    got = {
        r["id"]: r["ewma"]
        for r in ewma_smooth(df, "k", "v", "ts", id_col="id",
                             depth=depth).collect()
    }
    series = {}
    for rid, _, k, v in rows:
        series.setdefault(k, []).append((rid, v))
    for k, s in series.items():
        for pos, (rid, _) in enumerate(s):
            num = den = 0
            for j in range(depth):
                if pos - j < 0:
                    break
                v = s[pos - j][1]
                if v is None:
                    continue
                w = 1 << (depth - 1 - j)
                num += round(v * 100) * w
                den += w * 100
            want = (num / den) if den else None
            if want is None:
                assert got[rid] is None, rid
            else:
                assert got[rid] == want, (rid, got[rid], want)


def test_rank_normalize_exact_ppm(spark):
    from pybabe_spark.operators.sampling import rank_normalize

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "a", None),
         (5, "b", 7.0)],
        "id long, k string, v double",
    )
    out = {r["id"]: r["v_pctile_ppm"]
           for r in rank_normalize(df, "v", by="k", tie_col="id").collect()}
    # group a: 3 non-null values -> 0, 500000, 1000000; NULL -> NULL
    assert (out[1], out[2], out[3]) == (0, 500_000, 1_000_000)
    assert out[4] is None
    # singleton group -> 0
    assert out[5] == 0


def test_rank_normalize_tie_determinism(spark):
    from pybabe_spark.operators.sampling import rank_normalize

    df = spark.createDataFrame(
        [(2, "a", 5.0), (1, "a", 5.0), (3, "a", 5.0)],
        "id long, k string, v double",
    )
    out = {r["id"]: r["v_pctile_ppm"]
           for r in rank_normalize(df, "v", by="k", tie_col="id").collect()}
    # equal values rank by the unique tiebreak, id-ascending
    assert (out[1], out[2], out[3]) == (0, 500_000, 1_000_000)


def test_cusum_detects_level_shift(spark):
    from datetime import datetime, timedelta

    from pybabe_spark.operators.anomaly import cusum_alarms

    t0 = datetime(2024, 1, 1)
    # key 'a': 10 obs at the 5.0 target, then a +2 level shift
    rows = [(i, t0 + timedelta(minutes=i), "a",
             5.0 if i < 10 else 7.0) for i in range(20)]
    # key 'b': stays on target -> never alarms
    rows += [(100 + i, t0 + timedelta(minutes=i), "b", 5.0)
             for i in range(20)]
    df = spark.createDataFrame(rows, _TS)
    out = {r["k"]: r for r in cusum_alarms(
        df, "k", "v", "ts", target=5.0, slack=0.5, threshold=4.0,
        id_col="id",
    ).collect()}
    a, b = out["a"], out["b"]
    assert a["alarm_dir"] == "up"
    # s grows 1.5/obs after the shift; crosses 4.0 on the 3rd shifted
    # row (ts index 12)
    assert a["first_alarm_ts"] == t0 + timedelta(minutes=12)
    assert b["first_alarm_ts"] is None and b["alarm_dir"] is None
    assert b["max_s_up"] == 0 and b["max_s_down"] == 0


def test_cusum_downward_and_nulls(spark):
    from datetime import datetime, timedelta

    from pybabe_spark.operators.anomaly import cusum_alarms

    t0 = datetime(2024, 1, 1)
    rows = [(i, t0 + timedelta(minutes=i), "a",
             None if i == 3 else (5.0 if i < 8 else 2.0))
            for i in range(16)]
    df = spark.createDataFrame(rows, _TS)
    r = cusum_alarms(
        df, "k", "v", "ts", target=5.0, slack=0.5, threshold=5.0,
        id_col="id",
    ).collect()[0]
    assert r["alarm_dir"] == "down"
    assert r["n_obs"] == 15  # the NULL contributes nothing


def test_cusum_plan_and_guards(spark):
    from pybabe_spark.operators.anomaly import cusum_alarms
    from pybabe_spark.plans.lint import plan_lint

    df = _df(spark, [1.0, 2.0])
    assert plan_lint(
        cusum_alarms(df, "k", "v", "ts", target=1.0, threshold=1.0)
    ) == []
    import pytest as _pt
    with _pt.raises(ValueError, match="threshold"):
        cusum_alarms(df, "k", "v", "ts", target=1.0, threshold=0.0)


def test_km_survival_textbook_curve(spark):
    from pybabe_spark.operators.timeseries import km_survival

    # classic KM fixture: events at t=1 (1 death of 5), t=3 (1 death of
    # 3 after a censor at 2), censor at 4, death at 5 (1 of 1 -> 0)
    rows = [
        ("g", 1, 1), ("g", 2, 0), ("g", 3, 1), ("g", 4, 0), ("g", 5, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    out = {r["t"]: r for r in
           km_survival(df, "duration", "event", group_col="grp").collect()}
    assert set(out) == {1, 3, 5}  # censor-only times don't plot
    import pytest as _pt
    assert out[1]["n_risk"] == 5 and out[1]["survival"] == _pt.approx(0.8)
    assert out[3]["n_risk"] == 3
    assert out[3]["survival"] == _pt.approx(0.8 * 2 / 3, abs=1e-6)
    # last subject dies: extinction -> exactly 0, no ln(0) arithmetic
    assert out[5]["n_risk"] == 1 and out[5]["survival"] == 0.0


def test_km_tied_events_and_censors(spark):
    from pybabe_spark.operators.timeseries import km_survival

    # a censor tied WITH a death at t=2: the censored subject counts in
    # the t=2 risk set (standard convention)
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 2, 0), ("g", 3, 1)]
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    out = {r["t"]: r for r in
           km_survival(df, "duration", "event", group_col="grp").collect()}
    assert out[2]["n_risk"] == 3 and out[2]["n_censored"] == 1
    import pytest as _pt
    assert out[2]["survival"] == _pt.approx(0.75 * 2 / 3, abs=1e-6)
    assert out[3]["n_risk"] == 1 and out[3]["survival"] == 0.0


def test_km_plan_lints_clean(spark):
    from pybabe_spark.operators.timeseries import km_survival
    from pybabe_spark.plans.lint import plan_lint

    df = spark.createDataFrame(
        [("g", 1, 1)], "grp string, duration int, event int"
    )
    assert plan_lint(km_survival(df, "duration", "event", "grp")) == []


def test_gini_known_values(spark):
    from pybabe_spark.operators.skew import gini

    df = spark.createDataFrame(
        [("even", v) for v in (5.0, 5.0, 5.0, 5.0)]
        + [("onehas", 0.0), ("onehas", 0.0), ("onehas", 0.0),
           ("onehas", 10.0)]
        + [("zeros", 0.0), ("zeros", 0.0)],
        "k string, v double",
    )
    out = {r["k"]: r for r in gini(df, "k", "v").collect()}
    assert out["even"]["gini_ppm"] == 0
    # one of n holds all: G = (n-1)/n = 0.75
    assert out["onehas"]["gini_ppm"] == 750_000
    assert out["zeros"]["gini_ppm"] is None  # zero total -> undefined


def test_gini_negative_raises_in_plan(spark):
    import pytest as _pt

    from pybabe_spark.operators.skew import gini

    df = spark.createDataFrame([("a", -1.0)], "k string, v double")
    plan = gini(df, "k", "v")  # construction stays lazy
    with _pt.raises(Exception, match="negative"):
        plan.collect()


def test_gini_plan_lints_clean(spark):
    from pybabe_spark.operators.skew import gini
    from pybabe_spark.plans.lint import plan_lint

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    assert plan_lint(gini(df, "k", "v")) == []


def test_personalized_pagerank_seeds_get_the_mass(spark):
    from pybabe_spark.operators.graph import pagerank

    # star: seed 1 -> {2,3}; node 4 isolated-ish (4 -> 1)
    e = [(1, 2), (1, 3), (4, 1), (2, 1), (3, 1)]
    edges = spark.createDataFrame(e, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    pr = {r["node"]: r["rank_micro"]
          for r in pagerank(edges, iters=5, seeds=seeds).collect()}
    # only the seed receives teleport mass; unreachable-from-seed node 4
    # decays to 0 (nothing links INTO 4)
    assert pr[4] == 0
    assert pr[1] > pr[2] == pr[3] > 0
    # plain pagerank on the same graph gives 4 a base share
    plain = {r["node"]: r["rank_micro"]
             for r in pagerank(edges, iters=5).collect()}
    assert plain[4] > 0


def test_nelson_aalen_textbook_curve(spark):
    import math

    import pytest as _pt

    from pybabe_spark.operators.timeseries import nelson_aalen

    # same fixture as the KM test: events at 1 (1/5), 3 (1/3 after the
    # censor at 2), censor at 4, event at 5 (1/1)
    rows = [
        ("g", 1, 1), ("g", 2, 0), ("g", 3, 1), ("g", 4, 0), ("g", 5, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    out = {r["t"]: r for r in
           nelson_aalen(df, "duration", "event", group_col="grp").collect()}
    assert set(out) == {1, 3, 5}
    assert out[1]["cum_hazard"] == _pt.approx(0.2)
    assert out[3]["cum_hazard"] == _pt.approx(0.2 + 1 / 3, abs=1e-6)
    # n == d is finite here (H += 1), not an extinction special case
    assert out[5]["cum_hazard"] == _pt.approx(0.2 + 1 / 3 + 1.0, abs=1e-6)
    assert out[5]["na_survival"] == _pt.approx(
        math.exp(-(0.2 + 1 / 3 + 1.0)), abs=1e-5
    )
    # Fleming–Harrington survival dominates the KM step product
    from pybabe_spark.operators.timeseries import km_survival

    km = {r["t"]: r["survival"] for r in
          km_survival(df, "duration", "event", group_col="grp").collect()}
    for t in (1, 3, 5):
        assert out[t]["na_survival"] >= km[t] - 1e-9


def test_nelson_aalen_ties_and_groups(spark):
    import pytest as _pt

    from pybabe_spark.operators.timeseries import nelson_aalen

    rows = [
        ("a", 1, 1), ("a", 2, 1), ("a", 2, 0), ("a", 3, 1),
        ("b", 1, 0), ("b", 2, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    out = {(r["grp"], r["t"]): r for r in
           nelson_aalen(df, "duration", "event", group_col="grp").collect()}
    # group a at t=2: risk 3 (tied censor at risk), d=1
    assert out[("a", 2)]["n_risk"] == 3
    assert out[("a", 2)]["cum_hazard"] == _pt.approx(0.25 + 1 / 3, abs=1e-6)
    # group b: censor at 1 leaves risk set -> t=2 risk 1
    assert out[("b", 2)]["n_risk"] == 1
    assert out[("b", 2)]["cum_hazard"] == _pt.approx(1.0)
    # keyless form works too
    single = nelson_aalen(df.filter("grp = 'b'"), "duration", "event")
    assert single.count() == 1


def test_rmst_textbook(spark):
    import pytest as _pt

    from pybabe_spark.operators.timeseries import rmst

    # KM fixture: S = 0.8 on [1,3), 0.5333 on [3,5), 0 after 5
    rows = [
        ("g", 1, 1), ("g", 2, 0), ("g", 3, 1), ("g", 4, 0), ("g", 5, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    # tau = 4: 1*1 + 0.8*(3-1) + 0.533333*(4-3) = 3.133333
    r = rmst(df, "duration", "event", 4, group_col="grp").collect()[0]
    assert float(r["rmst"]) == _pt.approx(1 + 0.8 * 2 + 0.533333, abs=1e-5)
    # tau beyond the last event: the S=0 tail adds nothing
    r = rmst(df, "duration", "event", 100, group_col="grp").collect()[0]
    assert float(r["rmst"]) == _pt.approx(
        1 + 0.8 * 2 + 0.533333 * 2 + 0.0 * 95, abs=1e-5
    )
    # tau before the first event: rmst = tau exactly
    r = rmst(df, "duration", "event", 1, group_col="grp").collect()[0]
    assert float(r["rmst"]) == _pt.approx(1.0)


def test_rmst_no_events_and_groups(spark):
    import pytest as _pt

    from pybabe_spark.operators.timeseries import rmst

    rows = [("a", 1, 1), ("a", 10, 1), ("b", 2, 1)]
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    got = {r["grp"]: r for r in
           rmst(df, "duration", "event", 6, group_col="grp").collect()}
    # a: S=0.5 on [1,6) capped -> 1 + 0.5*5 = 3.5 ; b: 2 + 0*4 = 2
    assert float(got["a"]["rmst"]) == _pt.approx(3.5)
    assert float(got["b"]["rmst"]) == _pt.approx(2.0)
    assert got["a"]["n_steps"] == 2

    import pytest

    with pytest.raises(ValueError):
        rmst(df, "duration", "event", 0)


@pytest.mark.deep
def test_km_quantiles_textbook(spark):
    from pybabe_spark.operators.timeseries import km_quantiles

    # curve: S=0.8 at t=1, 0.533 at t=3, 0 at t=5
    rows = [
        ("g", 1, 1), ("g", 2, 0), ("g", 3, 1), ("g", 4, 0), ("g", 5, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    got = {r["q"]: r for r in km_quantiles(
        df, "duration", "event", probs=(0.9, 0.6, 0.5, 0.1),
        group_col="grp",
    ).collect()}
    assert got[0.9]["t_cross"] == 1      # S=0.8 <= 0.9 first at t=1
    assert got[0.6]["t_cross"] == 3      # 0.533 <= 0.6
    assert got[0.5]["t_cross"] == 5      # only extinction reaches 0.5
    assert got[0.5]["survival_at_cross"] == 0.0
    assert got[0.1]["t_cross"] == 5


def test_km_quantiles_censoring_vs_naive_median(spark):
    """Half the cohort censored early: the naive duration median is
    tiny, the KM median is NULL (the curve never reaches 0.5) — the
    censoring-honesty this operator exists for."""
    from pybabe_spark.operators.timeseries import km_quantiles

    rows = [("g", 1, 0)] * 6 + [("g", 10, 1)] * 2 + [("g", 20, 0)] * 2
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    got = {r["q"]: r for r in km_quantiles(
        df, "duration", "event", probs=(0.5,), group_col="grp"
    ).collect()}
    # at t=10: risk 4, d=2 -> S = 0.5 exactly -> crossing AT t=10
    assert got[0.5]["t_cross"] == 10
    # tighten: with only 1 event of 4 the curve stays at 0.75 -> NULL
    rows = [("g", 1, 0)] * 6 + [("g", 10, 1)] + [("g", 20, 0)] * 3
    df = spark.createDataFrame(rows, "grp string, duration int, event int")
    got = km_quantiles(df, "duration", "event", probs=(0.5,),
                       group_col="grp").collect()
    assert got[0]["t_cross"] is None

    import pytest

    with pytest.raises(ValueError):
        km_quantiles(df, "duration", "event", probs=(1.5,))
