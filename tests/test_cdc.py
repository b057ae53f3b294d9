"""apply_cdc: last-wins I/U/D feed folding (operators/cdc.py)."""

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.cdc import apply_cdc


def _base(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _feed(spark, rows):
    return spark.createDataFrame(rows, "k int, ts int, v string, op string")


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "v").collect())


def test_insert_update_delete(spark):
    base = _base(spark, [(1, "a"), (2, "b"), (3, "c")])
    feed = _feed(
        spark,
        [
            (2, 10, "b2", "U"),   # update existing
            (3, 10, None, "D"),   # delete existing
            (4, 10, "d", "I"),    # insert new
            (5, 10, None, "D"),   # delete absent key — no-op
        ],
    )
    out = apply_cdc(base, feed, "k", "ts")
    assert _rows(out) == [(1, "a"), (2, "b2"), (4, "d")]
    assert out.columns == base.columns


def test_last_wins_within_feed(spark):
    base = _base(spark, [(1, "a")])
    feed = _feed(
        spark,
        [
            (1, 10, "x", "U"),
            (1, 30, None, "D"),   # latest: delete wins
            (1, 20, "y", "U"),
            (2, 10, "n", "U"),
            (2, 20, "m", "U"),    # latest: m
        ],
    )
    out = apply_cdc(base, feed, "k", "ts")
    assert _rows(out) == [(2, "m")]


def test_delete_then_reinsert_order(spark):
    base = _base(spark, [(1, "a")])
    feed = _feed(spark, [(1, 10, None, "D"), (1, 20, "a2", "I")])
    assert _rows(apply_cdc(base, feed, "k", "ts")) == [(1, "a2")]


@pytest.mark.deep
def test_idempotent_and_composable(spark):
    base = _base(spark, [(1, "a"), (2, "b")])
    f1 = _feed(spark, [(1, 10, "a1", "U"), (3, 10, "c", "I")])
    f2 = _feed(spark, [(1, 20, None, "D"), (2, 20, "b2", "U")])
    once = apply_cdc(base, f1, "k", "ts")
    # idempotence: re-applying the same feed changes nothing
    assert _rows(apply_cdc(once, f1, "k", "ts")) == _rows(once)
    # composability under the append-only order contract
    seq = apply_cdc(once, f2, "k", "ts")
    both = apply_cdc(base, f1.unionByName(f2), "k", "ts")
    assert _rows(seq) == _rows(both) == [(2, "b2"), (3, "c")]


def test_null_key_matches_null_safely(spark):
    base = _base(spark, [(None, "ghost"), (1, "a")])
    feed = _feed(spark, [(None, 10, None, "D")])
    assert _rows(apply_cdc(base, feed, "k", "ts")) == [(1, "a")]


def test_duplicate_order_tuple_raises_lazily(spark):
    base = _base(spark, [(1, "a")])
    feed = _feed(spark, [(1, 10, "x", "U"), (1, 10, "y", "U")])
    out = apply_cdc(base, feed, "k", "ts")
    out.schema  # plan construction and analysis must not raise
    with pytest.raises(Exception, match="duplicate order_by"):
        out.collect()
    # a tie BELOW the winner is harmless
    feed2 = _feed(
        spark,
        [(1, 30, "w", "U"), (1, 10, "x", "U"), (1, 10, "y", "U")],
    )
    # still raises: rows 2/3 tie — contract asks per-key uniqueness
    # only for the winner; 10 vs 10 sit below 30 and must pass
    assert _rows(apply_cdc(base, feed2, "k", "ts")) == [(1, "w")]


def test_null_op_on_winner_raises_lazily(spark):
    # a NULL op on the winning row used to act as a silent DELETE
    # (op != 'D' is NULL → dropped from writes, key still anti-joined)
    base = _base(spark, [(1, "a"), (2, "b")])
    feed = _feed(spark, [(1, 10, "x", None)])
    out = apply_cdc(base, feed, "k", "ts")
    out.schema  # lazy: construction/analysis fine
    with pytest.raises(Exception, match="NULL op"):
        out.collect()
    # NULL op on a NON-winning row is superseded and harmless
    feed2 = _feed(spark, [(1, 10, "x", None), (1, 20, "y", "U")])
    assert _rows(apply_cdc(base, feed2, "k", "ts")) == [(1, "y"), (2, "b")]


def test_schema_validation(spark):
    base = _base(spark, [(1, "a")])
    bad = spark.createDataFrame([(1, 10, "x")], "k int, ts int, op string")
    with pytest.raises(ValueError, match="changes side lacks"):
        apply_cdc(base, bad, "k", "ts")


def test_facade_hook(spark):
    from pybabe_spark.plans.facade import Babe

    base = _base(spark, [(1, "a")])
    feed = _feed(spark, [(1, 10, "a1", "U")])
    out = Babe(base).apply_cdc(feed, "k", "ts")
    assert _rows(out.df) == [(1, "a1")]


@pytest.mark.deep
def test_randomized_against_python_model(spark):
    """Random feeds vs a dict last-wins model — insert/update/delete,
    multiple keys, unique (key, ts)."""
    import random

    rng = random.Random(31)
    for trial in range(6):
        base_rows = [
            (k, f"b{k}") for k in range(8) if rng.random() < 0.7
        ]
        used = set()
        feed_rows = []
        for _ in range(25):
            k = rng.randint(0, 11)
            ts = rng.randint(0, 99)
            if (k, ts) in used:
                continue
            used.add((k, ts))
            op = "D" if rng.random() < 0.3 else "U"
            feed_rows.append((k, ts, f"v{k}_{ts}", op))
        base = spark.createDataFrame(base_rows or [(99, "x")],
                                     "k int, v string")
        feed = spark.createDataFrame(
            feed_rows or [(0, 0, "v", "U")],
            "k int, ts int, v string, op string",
        )
        got = sorted(
            tuple(r) for r in apply_cdc(base, feed, "k", "ts").collect()
        )
        state = dict(base_rows or [(99, "x")])
        latest = {}
        for k, ts, v, op in (feed_rows or [(0, 0, "v", "U")]):
            if k not in latest or ts > latest[k][0]:
                latest[k] = (ts, v, op)
        for k, (ts, v, op) in latest.items():
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = v
        assert got == sorted(state.items()), trial
