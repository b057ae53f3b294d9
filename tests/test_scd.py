"""SCD2 changelog collapse + incremental upsert.

The upsert's contract (operators/scd.py module docstring): folding a
batch equals a rebuild over (changelog ∪ updates) unless a
different-attr update lands inside an existing run's row span — that
case must RAISE, not silently produce wrong intervals (ADVICE r6: the
old weighted re-emit lost intra-run timestamps and returned
A[10,25) n=3 where a rebuild gives A[10,25) n=2, B[25,30), A[30,∞)).
"""

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.scd import (
    scd2_from_changelog,
    scd2_upsert,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, ts int, attr string")


def _assert_upsert_equals_rebuild(spark, base, updates):
    hist = scd2_from_changelog(_mk(spark, base), "k", "ts", ["attr"])
    up = scd2_upsert(hist, _mk(spark, updates), "k", "ts", ["attr"])
    rebuild = scd2_from_changelog(
        _mk(spark, base + updates), "k", "ts", ["attr"]
    )
    assert _rows(up) == _rows(rebuild)


def test_changelog_collapse_basic(spark):
    out = scd2_from_changelog(
        _mk(
            spark,
            [(1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "A"),
             (2, 5, "X")],
        ),
        "k",
        "ts",
        ["attr"],
    )
    got = {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["last_ts"],
         r["n_rows"], r["is_current"])
        for r in out.collect()
    }
    assert got == {
        (1, "A", 10, 30, 20, 2, False),
        (1, "B", 30, 40, 30, 1, False),
        (1, "A", 40, None, 40, 1, True),
        (2, "X", 5, None, 5, 1, True),
    }


def test_changelog_null_safe_attrs(spark):
    out = scd2_from_changelog(
        _mk(spark, [(1, 10, None), (1, 20, None), (1, 30, "A")]),
        "k", "ts", ["attr"],
    )
    got = {(r["attr"], r["valid_from"], r["n_rows"]) for r in out.collect()}
    assert got == {(None, 10, 2), ("A", 30, 1)}


def test_upsert_append_only_equals_rebuild(spark):
    base = [(1, 10, "A"), (1, 20, "A"), (1, 30, "B"),
            (2, 10, "X"), (3, 10, "Y")]
    updates = [(1, 40, "B"), (1, 50, "C"), (2, 35, "X")]
    _assert_upsert_equals_rebuild(spark, base, updates)


def test_upsert_untouched_keys_pass_through(spark):
    base = [(1, 10, "A"), (2, 10, "X"), (2, 20, "Y")]
    hist = scd2_from_changelog(_mk(spark, base), "k", "ts", ["attr"])
    up = scd2_upsert(
        hist, _mk(spark, [(1, 20, "B")]), "k", "ts", ["attr"]
    )
    # key 2 rows are byte-identical to their history form
    assert _rows(up.filter("k = 2")) == _rows(hist.filter("k = 2"))


def test_upsert_gap_update_equals_rebuild(spark):
    # update lands BETWEEN two runs (after run A's last row at 20,
    # before run B's first row at 30) — exact without re-expansion
    base = [(1, 10, "A"), (1, 20, "A"), (1, 30, "B")]
    _assert_upsert_equals_rebuild(spark, base, [(1, 25, "C")])
    # gap update merging backward (same attrs as preceding run)
    _assert_upsert_equals_rebuild(spark, base, [(1, 25, "A")])
    # gap update merging forward (same attrs as following run)
    _assert_upsert_equals_rebuild(spark, base, [(1, 25, "B")])


def test_upsert_same_attr_mid_run_equals_rebuild(spark):
    # same-attr update INSIDE a run's span just raises n_rows — exact
    base = [(1, 10, "A"), (1, 20, "A"), (1, 30, "A"), (1, 40, "B")]
    _assert_upsert_equals_rebuild(spark, base, [(1, 15, "A")])


def test_upsert_prepend_equals_rebuild(spark):
    base = [(1, 10, "A"), (1, 20, "B")]
    _assert_upsert_equals_rebuild(spark, base, [(1, 5, "C")])
    _assert_upsert_equals_rebuild(spark, base, [(1, 5, "A")])


def test_upsert_mid_run_different_attr_raises(spark):
    # the ADVICE r6 counterexample: changelog A@10,A@20,A@30 collapsed,
    # then B@25 lands inside the A run — the collapsed history cannot
    # split it; must raise, not return A[10,25) n=3
    base = [(1, 10, "A"), (1, 20, "A"), (1, 30, "A")]
    hist = scd2_from_changelog(_mk(spark, base), "k", "ts", ["attr"])
    up = scd2_upsert(hist, _mk(spark, [(1, 25, "B")]), "k", "ts", ["attr"])
    with pytest.raises(Exception, match="SCD2_OUT_OF_ORDER"):
        up.collect()


def test_upsert_valid_from_tie_different_attr_raises(spark):
    # a differing-attr tie at the run's first timestamp is
    # order-ambiguous once order_cols are collapsed away — raise
    base = [(1, 10, "A"), (1, 20, "A")]
    hist = scd2_from_changelog(_mk(spark, base), "k", "ts", ["attr"])
    up = scd2_upsert(hist, _mk(spark, [(1, 10, "B")]), "k", "ts", ["attr"])
    with pytest.raises(Exception, match="SCD2_OUT_OF_ORDER"):
        up.collect()


@pytest.mark.deep
def test_upsert_randomized_equals_rebuild(spark):
    """Randomized contract sweep (ADVICE r6 follow-up): for unique
    per-key timestamps, EVERY split of a changelog into (base, updates)
    either folds to exactly the rebuild or raises SCD2_OUT_OF_ORDER —
    no silent third outcome. 60 seeded trials over 2-8 timestamps."""
    import random

    rng = random.Random(7)
    checked = raised = 0
    for _ in range(60):
        ts_pool = rng.sample(range(0, 20), rng.randint(2, 8))
        rng.shuffle(ts_pool)
        n_base = rng.randint(1, len(ts_pool) - 1)
        base = sorted(
            (1, t * 5, rng.choice("AB")) for t in ts_pool[:n_base]
        )
        updates = [
            (1, t * 5, rng.choice("AB")) for t in ts_pool[n_base:]
        ]
        hist = scd2_from_changelog(_mk(spark, base), "k", "ts", ["attr"])
        up = scd2_upsert(
            hist, _mk(spark, updates), "k", "ts", ["attr"]
        )
        try:
            got = _rows(up)
        except Exception as e:  # noqa: BLE001 — raise class varies by plan
            assert "SCD2_OUT_OF_ORDER" in str(e)
            raised += 1
            continue
        rebuild = scd2_from_changelog(
            _mk(spark, base + updates), "k", "ts", ["attr"]
        )
        assert got == _rows(rebuild), (base, updates)
        checked += 1
    # both outcomes must actually occur across the sweep
    assert checked > 10 and raised > 3


def test_upsert_guard_is_lazy(spark):
    # building the conflicting plan runs NO job and raises nothing;
    # the error surfaces at the query's own first action
    base = [(1, 10, "A"), (1, 20, "A"), (1, 30, "A")]
    hist = scd2_from_changelog(_mk(spark, base), "k", "ts", ["attr"])
    up = scd2_upsert(hist, _mk(spark, [(1, 25, "B")]), "k", "ts", ["attr"])
    up.schema  # analysis only — must not raise
    with pytest.raises(Exception, match="SCD2_OUT_OF_ORDER"):
        up.count()


def test_upsert_randomized_append_equals_rebuild(spark):
    # 40 keys, dense changelog, update batch strictly after each key's
    # last row (the warehouse case) — rebuild equivalence end to end
    import random

    rng = random.Random(7)
    base, updates = [], []
    for k in range(40):
        n = rng.randint(1, 8)
        ts = 0
        for _ in range(n):
            ts += rng.randint(1, 5)
            base.append((k, ts, rng.choice("ABC")))
        if rng.random() < 0.6:
            for _ in range(rng.randint(1, 3)):
                ts += rng.randint(1, 5)
                updates.append((k, ts, rng.choice("ABC")))
    _assert_upsert_equals_rebuild(spark, base, updates)
