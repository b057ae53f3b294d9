"""item_neighbors (operators/recommend.py): exact item-item cosine."""

import pytest

from pybabe_spark.operators.recommend import item_neighbors


def _mk(spark, rows):
    return spark.createDataFrame(rows, "b int, i string")


def test_known_cosines_and_ranks(spark):
    # baskets: {A,B} ×3, {A,C} ×1, {B,C} ×1 → n_A=4, n_B=4, n_C=2
    rows = []
    bid = 0
    for _ in range(3):
        rows += [(bid, "A"), (bid, "B")]; bid += 1
    rows += [(bid, "A"), (bid, "C")]; bid += 1
    rows += [(bid, "B"), (bid, "C")]; bid += 1
    out = item_neighbors(_mk(spark, rows), "b", "i", k=5, min_support=1)
    got = {
        (r["item"], r["neighbor"]): (r["cosine2_ppm"], r["rank"])
        for r in out.collect()
    }
    # cos²(A,B) = 9/16, cos²(A,C) = 1/8, cos²(B,C) = 1/8
    assert got[("A", "B")] == (562_500, 1)
    assert got[("A", "C")] == (125_000, 2)
    assert got[("B", "A")] == (562_500, 1)
    assert got[("C", "A")][0] == 125_000
    # C's two neighbors tie at 1/8 → neighbor asc: A rank 1, B rank 2
    assert got[("C", "A")][1] == 1 and got[("C", "B")][1] == 2


def test_support_floor_and_k(spark):
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C")]
    out = item_neighbors(_mk(spark, rows), "b", "i", k=1, min_support=2)
    got = {(r["item"], r["neighbor"]) for r in out.collect()}
    # (A,C) support 1 < 2 → gone entirely; C absent from the table
    assert got == {("A", "B"), ("B", "A")}


def test_duplicate_rows_in_basket_count_once(spark):
    rows = [(1, "A"), (1, "A"), (1, "B")]
    out = item_neighbors(_mk(spark, rows), "b", "i", k=5, min_support=1)
    r = out.filter("item = 'A'").collect()[0]
    assert r["n_item"] == 1 and r["n_both"] == 1
    assert r["cosine2_ppm"] == 1_000_000


def test_validation(spark):
    df = _mk(spark, [(1, "A")])
    with pytest.raises(ValueError, match="k must be"):
        item_neighbors(df, "b", "i", k=0)
    with pytest.raises(ValueError, match="min_support"):
        item_neighbors(df, "b", "i", min_support=0)


def test_facade_hook(spark):
    from pybabe_spark.plans.facade import Babe

    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B")]
    out = Babe(_mk(spark, rows)).item_neighbors("b", "i", k=3, min_support=1)
    assert out.df.count() == 2
