"""Symmetric-delete fuzzy matching: blocking completeness vs a
brute-force all-pairs reference, lazy length guard, join forms."""

import random

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.fuzzy import (
    deletion_keys,
    fuzzy_join,
    fuzzy_pairs,
    fuzzy_string_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("max_dist", [1, 2])
def test_blocking_complete_vs_bruteforce(spark, max_dist):
    """Every all-pairs edit-distance pair must survive the deletion-key
    blocking — randomized fixed-seed corpus over a tiny alphabet so
    near-pairs are dense."""
    rng = random.Random(42)
    strings = sorted(
        {
            "".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
            for _ in range(120)
        }
    )
    want = {
        (s1, s2, _lev(s1, s2))
        for i, s1 in enumerate(strings)
        for s2 in strings[i + 1 :]
        if _lev(s1, s2) <= max_dist
    }
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {
        (r["s1"], r["s2"], r["dist"])
        for r in fuzzy_string_pairs(df, "s", max_dist).collect()
    }
    assert got == want and len(want) > 50


def test_deletion_keys_edge_cases(spark):
    df = spark.createDataFrame([("",), ("a",)], "s string")
    rows = df.select(deletion_keys("s", 2).alias("k")).collect()
    by = {tuple(sorted(r["k"])) for r in rows}
    # "" -> just itself; "a" -> itself + ""
    assert ("",) in by and ("", "a") in by


def test_fuzzy_pairs_reattaches_duplicate_ids(spark):
    # two rows share the string 'cat': both ids must pair with 'cats'
    df = spark.createDataFrame(
        [(1, "cat"), (2, "cat"), (3, "cats")], "id bigint, s string"
    )
    got = {(r["id1"], r["id2"]) for r in fuzzy_pairs(df, "id", "s").collect()}
    assert got == {(1, 3), (2, 3)}


def test_max_len_guard_is_lazy_and_raises(spark):
    df = spark.createDataFrame([("x" * 100,), ("ok",)], "s string")
    out = fuzzy_string_pairs(df, "s", 1, max_len=64)  # no job yet
    with pytest.raises(Exception, match="max_len"):
        out.collect()


def test_fuzzy_join_left_and_overlap(spark):
    left = spark.createDataFrame(
        [(1, "kitten"), (2, "dog"), (3, "zzz")], "id bigint, s string"
    )
    right = spark.createDataFrame(
        [("sitten", "S1"), ("dig", "D1")], "name string, code string"
    )
    got = {
        (r["id"], r["code"], r["dist"])
        for r in fuzzy_join(left, right, "s", "name", 1, how="left")
        .select("id", "code", "dist")
        .collect()
    }
    assert got == {(1, "S1", 1), (2, "D1", 1), (3, None, None)}
    with pytest.raises(ValueError, match="overlapping"):
        fuzzy_join(left, left, "s", "s")
    with pytest.raises(ValueError, match="how"):
        fuzzy_join(left, right, "s", "name", how="full")
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_string_pairs(left, "s", 3)


def test_fuzzy_candidates_scan_distinct_strings_only(spark):
    """The candidate join must be fed by distinct strings: 1000 rows of
    the same two strings generate exactly one confirmed string pair."""
    rows = [(i, "cat" if i % 2 else "cats") for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, s string")
    assert fuzzy_string_pairs(df, "s", 1).count() == 1


# -- fellegi_sunter (operators/fuzzy.py) --------------------------------------


def test_fellegi_sunter_hand_checked(spark):
    import math

    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from pybabe_spark.operators.fuzzy import fellegi_sunter

    rows = [
        (1, 2, True, True),    # both agree: strong match
        (1, 3, False, False),  # both disagree: non-match
        (1, 4, True, None),    # NULL contributes 0
    ]
    df = spark.createDataFrame(
        rows, "id1 int, id2 int, a boolean, b boolean"
    )
    fields = {"a": (0.9, 0.1), "b": (0.8, 0.2)}
    wa_a = int(round(math.log(0.9 / 0.1) * 1e6))
    wd_a = int(round(math.log(0.1 / 0.9) * 1e6))
    wa_b = int(round(math.log(0.8 / 0.2) * 1e6))
    wd_b = int(round(math.log(0.2 / 0.8) * 1e6))
    got = {
        (r["id1"], r["id2"]): (r["fs_score"], r["fs_tier"])
        for r in fellegi_sunter(df, fields, lower=0.0, upper=3.0).collect()
    }
    assert got[(1, 2)] == (wa_a + wa_b, "match")
    assert got[(1, 3)] == (wd_a + wd_b, "non_match")
    assert got[(1, 4)] == (wa_a, "possible")  # 2.197 < 3.0 upper

    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fellegi_sunter(df, {"a": (0.1, 0.9)})
    with pytest.raises(ValueError, match="not in pairs"):
        fellegi_sunter(df, {"zz": (0.9, 0.1)})
    with pytest.raises(ValueError, match="fields"):
        fellegi_sunter(df, {})
    with pytest.raises(ValueError, match="lower"):
        fellegi_sunter(df, fields, lower=5.0, upper=1.0)


# -- fuzzy_connectivity_pairs (star-reduced CC edge set) ----------------------


@pytest.mark.deep
def test_connectivity_pairs_same_components_as_full(spark):
    """The star-reduced edge set must (a) contain only TRUE distance-1
    pairs, and (b) induce exactly the same connected components as the
    full fuzzy_pairs graph — the property _er_clusters relies on."""
    from pybabe_spark.operators.fuzzy import fuzzy_connectivity_pairs
    from pybabe_spark.operators.graph import connected_components

    rng = random.Random(7)
    strings = sorted(
        {
            "".join(rng.choice("ab0") for _ in range(rng.randint(1, 5)))
            for _ in range(100)
        }
    )
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "id int, s string"
    )

    full = fuzzy_pairs(df, "id", "s", max_dist=1)
    red = fuzzy_connectivity_pairs(df, "id", "s")

    # (a) soundness: every reduced edge is a true distance-1 pair
    id2s = dict(enumerate(strings))
    red_edges = {(r["id1"], r["id2"]) for r in red.collect()}
    assert red_edges, "fixture produced no edges"
    for a, b in red_edges:
        assert _lev(id2s[a], id2s[b]) == 1

    # (b) same components (reduced is a subset, so it can only
    # under-connect — equality certifies nothing was lost)
    full_edges = {(r["id1"], r["id2"]) for r in full.collect()}
    assert red_edges <= full_edges
    cc_full = {
        r["id"]: r["component"]
        for r in connected_components(full, "id1", "id2").collect()
    }
    cc_red = {
        r["id"]: r["component"]
        for r in connected_components(red, "id1", "id2").collect()
    }
    assert cc_full == cc_red


def test_connectivity_pairs_duplicate_strings_attach(spark):
    """Rows sharing a string must all attach to the string's edges
    (same id-multiplication contract as fuzzy_pairs)."""
    from pybabe_spark.operators.fuzzy import fuzzy_connectivity_pairs

    df = spark.createDataFrame(
        [(1, "aa"), (2, "aa"), (3, "ab")], "id int, s string"
    )
    got = {
        (r["id1"], r["id2"])
        for r in fuzzy_connectivity_pairs(df, "id", "s").collect()
    }
    # "aa"~"ab" is the only string edge; both ids of "aa" carry it
    assert got == {(1, 3), (2, 3)}


# -- vocab_overlap (operators/tfidf.py) ---------------------------------------


def test_vocab_overlap_hand_checked(spark):
    from pybabe_spark.operators.tfidf import vocab_overlap

    df = spark.createDataFrame(
        [
            ("s1", "a b c"), ("s1", "c d"),          # V1 = {a,b,c,d}
            ("s2", "c d e"),                          # V2 = {c,d,e}
            ("s3", "zz"),                             # V3 = {zz}, disjoint
        ],
        "source string, text string",
    )
    got = {
        (r["source_1"], r["source_2"]): r
        for r in vocab_overlap(df, "source", "text").collect()
    }
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    r = got[("s1", "s2")]
    # |V1|=4, |V2|=3, inter={c,d}=2, union=5 -> 400000 ppm
    assert (r["v1"], r["v2"], r["intersection"]) == (4, 3, 2)
    assert r["jaccard_ppm"] == 400000
    # disjoint pair emitted with zeros, not dropped
    assert got[("s1", "s3")]["intersection"] == 0
    assert got[("s1", "s3")]["jaccard_ppm"] == 0


def test_vocab_overlap_group_guard(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from pybabe_spark.operators.tfidf import vocab_overlap

    df = spark.createDataFrame(
        [(f"s{i}", "w") for i in range(5)], "source string, text string"
    )
    out = vocab_overlap(df, "source", "text", max_groups=3)  # lazy: no job
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="max_groups"):
        out.collect()
    with pytest.raises(ValueError):
        vocab_overlap(df, "source", "text", max_groups=1)


def test_vocab_overlap_edge_rows_and_nonflat_groups(spark):
    """r14 group-set rewrite: empty-text/NULL-text rows contribute
    nothing, and a non-flat (array) group type rides the same path
    with identical values."""
    from pybabe_spark.operators.tfidf import vocab_overlap

    rows = [
        ("s1", "a b c"), ("s1", "c d"),
        ("s2", "c d e"), ("s3", "zz"),
        ("s2", ""), ("s4", None),  # empty text / NULL text edge rows
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    flat = {
        tuple(r) for r in vocab_overlap(df, "source", "text").collect()
    }
    assert ("s1", "s2", 4, 3, 2, 400000) in flat
    assert ("s1", "s3", 4, 1, 0, 0) in flat  # disjoint pair kept, 0 ppm
    assert not any(r[0] == "s4" or r[1] == "s4" for r in flat)
    arr = df.select(F.array("source").alias("source"), "text")
    wrapped = {
        (r["source_1"][0], r["source_2"][0]) + tuple(r)[2:]
        for r in vocab_overlap(arr, "source", "text").collect()
    }
    assert wrapped == flat
