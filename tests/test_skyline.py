"""skyline2d (operators/skyline.py) vs brute-force dominance."""

import random

from pybabe_spark.operators.skyline import skyline2d


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id int, x double, y double")


def _brute(rows):
    out = set()
    for i, x, y in rows:
        dominated = any(
            (px <= x and py <= y and (px < x or py < y))
            for _, px, py in rows
        )
        if not dominated:
            out.add(i)
    return out


def test_matches_brute_force_randomized(spark):
    rng = random.Random(13)
    rows = [
        (i, round(rng.uniform(0, 100), 2), round(rng.uniform(0, 100), 2))
        for i in range(300)
    ]
    got = {r["id"] for r in skyline2d(_mk(spark, rows), "x", "y").collect()}
    assert got == _brute(rows)


def test_duplicates_and_ties_survive_together(spark):
    rows = [
        (1, 1.0, 5.0), (2, 1.0, 5.0),   # exact duplicates: both stay
        (3, 1.0, 6.0),                  # same x, worse y: dominated
        (4, 0.5, 9.0),                  # staircase member
        (5, 2.0, 5.0),                  # same y as 1/2, worse x
    ]
    got = {r["id"] for r in skyline2d(_mk(spark, rows), "x", "y").collect()}
    assert got == {1, 2, 4}


def test_nulls_excluded_and_single_bucket(spark):
    rows = [(1, None, 1.0), (2, 1.0, 1.0), (3, 2.0, 0.5)]
    got = {
        r["id"]
        for r in skyline2d(_mk(spark, rows), "x", "y", buckets=1).collect()
    }
    assert got == {2, 3}


def test_cross_bucket_domination(spark):
    # a point in an early bucket dominates everything in later buckets
    rows = [(1, 0.0, 0.0)] + [
        (i, float(i), float(i)) for i in range(2, 60)
    ]
    got = {r["id"] for r in skyline2d(_mk(spark, rows), "x", "y",
                                      buckets=8).collect()}
    assert got == {1}


def test_facade_hook(spark):
    from pybabe_spark.plans.facade import Babe

    rows = [(1, 1.0, 2.0), (2, 2.0, 1.0), (3, 2.0, 2.0)]
    out = Babe(_mk(spark, rows)).skyline2d("x", "y")
    assert {r["id"] for r in out.df.collect()} == {1, 2}
