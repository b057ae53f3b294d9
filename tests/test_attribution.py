"""attribute_conversions model behavior on a hand-built journey:
window boundaries, tie-breaks, the '(none)' channel, linear floor
truncation, and exact value distribution."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.attribution import (
    CREDIT_SCALE,
    attribute_conversions,
)

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark):
    T = datetime
    rows = [
        # user 1: view(d1) -> click(d5) -> purchase(d8, $10)
        (1, T(2024, 1, 1), 1, "view", 0.0),
        (2, T(2024, 1, 5), 1, "click", 0.0),
        (3, T(2024, 1, 8), 1, "purchase", 10.0),
        # user 2: click outside the 7-day lookback, then purchase
        (4, T(2024, 1, 1), 2, "click", 0.0),
        (5, T(2024, 1, 9, 0, 0, 1), 2, "purchase", 7.5),
        # user 3: three touches inside the window -> linear split of $9
        (6, T(2024, 2, 1), 3, "view", 0.0),
        (7, T(2024, 2, 2), 3, "click", 0.0),
        (8, T(2024, 2, 3), 3, "signup", 0.0),
        (9, T(2024, 2, 4), 3, "purchase", 9.0),
        # user 4: same-timestamp touches -> tie breaks on event_id
        (10, T(2024, 3, 1), 4, "view", 0.0),
        (11, T(2024, 3, 1), 4, "click", 0.0),
        (12, T(2024, 3, 2), 4, "purchase", 1.0),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def _run(spark, model):
    out = attribute_conversions(
        _events(spark),
        conversion=F.col("event_type") == "purchase",
        touch=F.col("event_type").isin("view", "click", "signup"),
        channel_col="event_type",
        model=model,
        lookback_days=7,
        value_col="value",
    )
    return {r["channel"]: r for r in out.collect()}


def test_last_touch(spark):
    got = _run(spark, "last")
    # u1 -> click(d5); u2 -> (none); u3 -> signup; u4 -> click (id 11 > 10)
    assert got["click"]["credit_micro"] == 2 * CREDIT_SCALE
    assert got["signup"]["credit_micro"] == CREDIT_SCALE
    assert got["(none)"]["credit_micro"] == CREDIT_SCALE
    assert "view" not in got
    assert got["click"]["attributed_value"] == pytest.approx(11.0)
    assert got["(none)"]["attributed_value"] == pytest.approx(7.5)
    assert got["(none)"]["touches"] == 0


def test_first_touch(spark):
    got = _run(spark, "first")
    # u1 -> view(d1 is 7 days before d8 -> INSIDE >=); u3 -> view;
    # u4 -> view (id 10 < 11); u2 -> (none)
    assert got["view"]["credit_micro"] == 3 * CREDIT_SCALE
    assert got["(none)"]["credit_micro"] == CREDIT_SCALE
    assert "click" not in got and "signup" not in got


def test_linear_split_floors(spark):
    got = _run(spark, "linear")
    third = CREDIT_SCALE // 3  # 333333 — floor, 1 micro lost
    # u3 contributes `third` to each of view/click/signup
    assert got["signup"]["credit_micro"] == third
    # view: u1 half + u3 third + u4 half
    half = CREDIT_SCALE // 2
    assert got["view"]["credit_micro"] == half + third + half
    assert got["click"]["credit_micro"] == half + third + half
    # u3's $9 splits exactly: 9 * 333333/1e6 each
    assert got["signup"]["attributed_value"] == pytest.approx(9 * third / 1e6)
    assert got["(none)"]["credit_micro"] == CREDIT_SCALE


def test_conversions_column_and_model_guard(spark):
    got = _run(spark, "last")
    assert got["click"]["conversions"] == pytest.approx(2.0)
    with pytest.raises(ValueError, match="unknown model"):
        _run(spark, "w_shaped")
    with pytest.raises(ValueError, match="lookback_days"):
        attribute_conversions(
            _events(spark),
            conversion=F.lit(True),
            touch=F.lit(False),
            channel_col="event_type",
            lookback_days=0,
        )


def test_no_value_column_gives_null_value(spark):
    out = attribute_conversions(
        _events(spark),
        conversion=F.col("event_type") == "purchase",
        touch=F.col("event_type") == "click",
        channel_col="event_type",
        model="last",
    ).collect()
    assert all(r["attributed_value"] is None for r in out)


def test_attribution_plan_lints_clean(spark):
    from pybabe_spark.plans.lint import plan_lint

    for model in ("last", "first", "linear"):
        df = attribute_conversions(
            _events(spark),
            conversion=F.col("event_type") == "purchase",
            touch=F.col("event_type") == "click",
            channel_col="event_type",
            model=model,
        )
        assert plan_lint(df) == [], model


def test_u_shaped_split(spark):
    got = _run(spark, "u_shaped")
    # u3 (3 touches): view 40%, click 20%, signup 40%
    # u1 (2 touches): view 50%, click 50%
    # u4 (2 same-ts touches): view 50%, click 50%  (id tiebreak)
    # u2: (none)
    assert got["signup"]["credit_micro"] == 400_000
    assert got["view"]["credit_micro"] == 500_000 + 400_000 + 500_000
    assert got["click"]["credit_micro"] == 500_000 + 200_000 + 500_000
    assert got["(none)"]["credit_micro"] == CREDIT_SCALE
    # u3's $9: view 3.6, click 1.8, signup 3.6
    assert got["signup"]["attributed_value"] == pytest.approx(3.6)


def _python_model(rows, model, lookback_days=7):
    """Brute-force reference: rows = (event_id, ts_epoch_s, user, type,
    value); conversions = 'purchase', touches = everything else."""
    from collections import defaultdict

    S = 1_000_000
    credits = defaultdict(int)
    values = defaultdict(int)  # cents * micro
    touch_counts = defaultdict(int)
    convs = [r for r in rows if r[3] == "purchase"]
    touches = [r for r in rows if r[3] != "purchase"]
    for cid, cts, cu, _, cval in convs:
        cents = round(cval * 100)
        win = [
            t for t in touches
            if t[2] == cu and t[1] < cts and t[1] >= cts - lookback_days * 86400
        ]
        win.sort(key=lambda t: (t[1], t[0]))
        if not win:
            credits["(none)"] += S
            values["(none)"] += cents * S
            continue
        n = len(win)
        if model == "last":
            per = {win[-1][0]: S}
        elif model == "first":
            per = {win[0][0]: S}
        elif model == "linear":
            per = {t[0]: S // n for t in win}
        elif model == "u_shaped":
            if n == 1:
                per = {win[0][0]: S}
            elif n == 2:
                per = {win[0][0]: S // 2, win[1][0]: S // 2}
            else:
                forty = (S * 2) // 5
                per = {t[0]: (S - 2 * forty) // (n - 2) for t in win[1:-1]}
                per[win[0][0]] = forty
                per[win[-1][0]] = forty
        else:  # time_decay
            L = lookback_days
            ws = {t[0]: 1 << (L - 1 - (cts - t[1]) // 86400) for t in win}
            tot = sum(ws.values())
            per = {tid: S * w // tot for tid, w in ws.items()}
        for t in win:
            c = per.get(t[0], 0)
            if c:
                credits[t[3]] += c
                values[t[3]] += cents * c
            touch_counts[t[3]] += 1 if model in ("linear", "u_shaped") else 0
    return credits, values


@pytest.mark.deep
def test_attribution_matches_bruteforce_model(spark):
    import random
    from datetime import datetime, timedelta

    rng = random.Random(11)
    rows = []
    eid = 0
    for u in range(12):
        t = 0
        for _ in range(rng.randint(1, 14)):
            t += rng.randint(600, 5 * 86400)
            kind = rng.choice(["view", "click", "signup", "purchase",
                               "purchase"])
            rows.append((eid, t, u, kind, round(rng.uniform(0, 50), 2)))
            eid += 1
    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, base + timedelta(seconds=t), u, k, v)
         for i, t, u, k, v in rows],
        _SCHEMA,
    )
    for model in ("last", "first", "linear", "u_shaped", "time_decay"):
        want_credits, want_values = _python_model(rows, model)
        got = {
            r["channel"]: r
            for r in attribute_conversions(
                df,
                conversion=F.col("event_type") == "purchase",
                touch=F.col("event_type") != "purchase",
                channel_col="event_type",
                model=model,
                lookback_days=7,
                value_col="value",
            ).collect()
        }
        assert {c: r["credit_micro"] for c, r in got.items()} == dict(
            want_credits
        ), model
        for ch, r in got.items():
            assert r["attributed_value"] == pytest.approx(
                want_values[ch] / (1_000_000 * 100.0), abs=1e-9
            ), (model, ch)
