"""Spatial grid joins (operators/spatial.py) vs brute force."""

import random

import pytest

from pybabe_spark.operators.spatial import nearest_join, radius_join


def _pts(spark, rows, prefix):
    return spark.createDataFrame(
        rows, f"{prefix}id int, {prefix}x double, {prefix}y double"
    )


def _micros(v):
    # mirror the engine lift: exact binary double → DECIMAL(.,6)
    # HALF_UP → integer micro-units
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP) * 1_000_000
    )


def _brute(left, right, r):
    out = set()
    for lid, lx, ly in left:
        for rid, rx, ry in right:
            dx = _micros(lx) - _micros(rx)
            dy = _micros(ly) - _micros(ry)
            if dx * dx + dy * dy <= (r * 1e6) ** 2:
                out.add((lid, rid, dx * dx + dy * dy))
    return out


def test_matches_brute_force_with_negatives(spark):
    rng = random.Random(11)
    left = [
        (i, rng.uniform(-50, 50), rng.uniform(-50, 50)) for i in range(60)
    ]
    right = [
        (i, rng.uniform(-50, 50), rng.uniform(-50, 50)) for i in range(40)
    ]
    r = 12.0
    got = {
        (row["aid"], row["bid"], int(row["dist2"]))
        for row in radius_join(
            _pts(spark, left, "a"),
            _pts(spark, right, "b"),
            r,
            left_xy=("ax", "ay"),
            right_xy=("bx", "by"),
        ).collect()
    }
    assert got == _brute(left, right, r)


def test_replicate_left_equivalent(spark):
    rng = random.Random(3)
    left = [(i, rng.uniform(0, 30), rng.uniform(0, 30)) for i in range(30)]
    right = [(i, rng.uniform(0, 30), rng.uniform(0, 30)) for i in range(30)]
    kw = dict(left_xy=("ax", "ay"), right_xy=("bx", "by"))
    a = radius_join(
        _pts(spark, left, "a"), _pts(spark, right, "b"), 8.0, **kw
    )
    b = radius_join(
        _pts(spark, left, "a"),
        _pts(spark, right, "b"),
        8.0,
        replicate="left",
        **kw,
    )
    key = lambda df: sorted(  # noqa: E731
        (r["aid"], r["bid"], int(r["dist2"])) for r in df.collect()
    )
    assert key(a) == key(b)


def test_radius_boundary_inclusive(spark):
    left = [(1, 0.0, 0.0)]
    right = [(1, 3.0, 4.0), (2, 3.0, 4.000001)]
    out = radius_join(
        _pts(spark, left, "a"),
        _pts(spark, right, "b"),
        5.0,
        left_xy=("ax", "ay"),
        right_xy=("bx", "by"),
    ).collect()
    # exactly distance 5 is IN; one micro-unit past is OUT
    assert [r["bid"] for r in out] == [1]


def test_null_coords_never_match(spark):
    left = [(1, None, 0.0), (2, 0.0, 0.0)]
    right = [(1, 0.0, 0.0)]
    out = radius_join(
        _pts(spark, left, "a"),
        _pts(spark, right, "b"),
        1.0,
        left_xy=("ax", "ay"),
        right_xy=("bx", "by"),
    ).collect()
    assert [r["aid"] for r in out] == [2]


def test_nearest_join_tie_breaks_on_id(spark):
    left = [(1, 0.0, 0.0)]
    # two right points at the same distance — smaller id must win
    right = [(7, 1.0, 0.0), (3, -1.0, 0.0), (9, 5.0, 5.0)]
    out = nearest_join(
        _pts(spark, left, "a"),
        _pts(spark, right, "b"),
        2.0,
        right_id="bid",
        left_xy=("ax", "ay"),
        right_xy=("bx", "by"),
        left_key="aid",
    ).collect()
    assert len(out) == 1 and out[0]["bid"] == 3


def test_nearest_join_tie_breaks_on_string_id(spark):
    # string ids would cast to NULL under the old bigint tiebreaker,
    # making the pick nondeterministic — lexicographically smallest
    # id must win among equidistant neighbors
    left = spark.createDataFrame(
        [(1, 0.0, 0.0)], "aid int, ax double, ay double"
    )
    right = spark.createDataFrame(
        [("store-b", 1.0, 0.0), ("store-a", -1.0, 0.0),
         ("store-c", 0.5, 0.0)],
        "bid string, bx double, by double",
    )
    out = nearest_join(
        left, right, 2.0, right_id="bid",
        left_xy=("ax", "ay"), right_xy=("bx", "by"), left_key="aid",
    ).collect()
    # store-c is strictly nearer; among the tie pair store-a < store-b
    assert len(out) == 1 and out[0]["bid"] == "store-c"
    right_tied = spark.createDataFrame(
        [("store-b", 1.0, 0.0), ("store-a", -1.0, 0.0)],
        "bid string, bx double, by double",
    )
    out2 = nearest_join(
        left, right_tied, 2.0, right_id="bid",
        left_xy=("ax", "ay"), right_xy=("bx", "by"), left_key="aid",
    ).collect()
    assert len(out2) == 1 and out2[0]["bid"] == "store-a"


def test_overlapping_columns_rejected(spark):
    df = _pts(spark, [(1, 0.0, 0.0)], "a")
    with pytest.raises(ValueError, match="overlapping"):
        radius_join(df, df, 1.0, ("ax", "ay"), ("ax", "ay"))


def test_facade_hook(spark):
    from pybabe_spark.plans.facade import Babe

    left = _pts(spark, [(1, 0.0, 0.0)], "a")
    right = _pts(spark, [(2, 0.5, 0.5)], "b")
    out = Babe(left).radius_join(
        right, 1.0, left_xy=("ax", "ay"), right_xy=("bx", "by")
    )
    assert out.df.count() == 1
