"""Expectations: rule semantics (NULL policy!), single-pass summary,
row quarantine."""

import pytest

from pybabe_spark.operators.validate import quarantine, validate


def _summary(df, rules):
    return {
        (r["rule"], r["col_name"]): r["violations"]
        for r in validate(df, rules).collect()
    }


def test_rule_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5.0, "ok-1"),
            (1, "b", 50.0, "bad"),
            (2, None, -1.0, "ok-2"),
            (3, "z", None, None),
        ],
        "k int, s string, v double, code string",
    )
    ref = spark.createDataFrame([("a",), ("z",)], "r string")
    got = _summary(
        df,
        [
            ("not_null", "s"),
            ("unique", ["k"]),
            ("range", "v", 0, 10),
            ("in_set", "s", ["a", "b"]),
            ("regexp", "code", "^ok-"),
            ("fk", "s", ref, "r"),
        ],
    )
    assert got == {
        ("not_null", "s"): 1,   # the NULL s
        ("unique", "k"): 1,     # two k=1 rows → 1 surplus
        ("range", "v"): 2,      # 50.0 and -1.0; NULL v passes
        ("in_set", "s"): 1,     # 'z'; NULL passes
        ("regexp", "code"): 1,  # 'bad'; NULL passes
        ("fk", "s"): 1,         # 'b' not in ref; NULL passes
    }


def test_empty_input_all_zero(spark):
    df = spark.createDataFrame([], "k int, s string")
    got = _summary(df, [("not_null", "s"), ("unique", ["k"])])
    assert got == {("not_null", "s"): 0, ("unique", "k"): 0}


def test_quarantine_tags_and_clean_split(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (None, 5.0)], "k int, v double"
    )
    out = quarantine(
        df, [("not_null", "k"), ("range", "v", 0, 10)]
    )
    tags = {r["k"]: r["violations"] for r in out.collect()}
    assert tags[1] == ""
    assert tags[2] == "range:v"
    assert tags[None] == "not_null:k"
    assert out.filter("violations = ''").count() == 1


def test_unknown_rule_raises(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="unknown rule"):
        validate(df, [("bogus", "k")])


def test_impute_strategies(spark):
    from pybabe_spark.operators.validate import impute

    df = spark.createDataFrame(
        [
            ("a", 1.0, 10, "x"),
            ("a", 3.0, None, "x"),
            ("a", None, 30, None),
            ("b", None, None, "y"),
        ],
        "g string, v double, i int, s string",
    )
    out = impute(
        df, {"v": "mean", "i": "zero", "s": "mode"}
    ).orderBy("g", "v").collect()
    vals = [(r["g"], r["v"], r["i"], r["s"]) for r in out]
    # mean(v)=2.0 over non-nulls; zero keeps int type; mode(s)='x'
    assert vals == [
        ("a", 1.0, 10, "x"),
        ("a", 2.0, 30, "x"),   # was (None, 30, None)
        ("a", 3.0, 0, "x"),    # was (3.0, None, 'x')
        ("b", 2.0, 0, "y"),
    ]
    assert all(isinstance(r["i"], int) for r in out)


def test_impute_grouped_median_and_all_null_group(spark):
    from pybabe_spark.operators.validate import impute

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 9.0), ("a", None), ("b", None)],
        "g string, v double",
    )
    out = {(r["g"], i): r["v"] for i, r in enumerate(
        impute(df, {"v": "median"}, by="g").orderBy("g", "v").collect())}
    rows = sorted(out.items())
    # group a's NULL -> 5.0; group b is all-NULL -> stays NULL
    vals_a = [v for (g, _), v in rows if g == "a"]
    vals_b = [v for (g, _), v in rows if g == "b"]
    assert sorted(vals_a) == [1.0, 5.0, 9.0]
    assert vals_b == [None]


def test_impute_mode_tie_breaks_to_smallest(spark):
    from pybabe_spark.operators.validate import impute

    df = spark.createDataFrame(
        [(2,), (2,), (1,), (1,), (None,)], "v int"
    )
    out = impute(df, {"v": "mode"}).collect()
    assert sorted(r["v"] for r in out) == [1, 1, 1, 2, 2]


def test_benford_accepts_benford_rejects_uniform(spark):
    from pybabe_spark.operators.validate import benford_audit

    import math
    import random

    rng = random.Random(3)
    # log-uniform magnitudes ARE Benford-distributed
    benford = [(10 ** (rng.uniform(0, 5)),) for _ in range(5000)]
    uniform = [(rng.uniform(1000, 5000),) for _ in range(5000)]
    b = spark.createDataFrame(benford, "v double")
    u = spark.createDataFrame(uniform, "v double")
    rows_b = benford_audit(b, "v").collect()
    rows_u = benford_audit(u, "v").collect()
    assert len(rows_b) == 9 and len(rows_u) == 9
    assert not rows_b[0]["suspicious"]
    assert rows_u[0]["suspicious"]
    # digit-1 expectation ppm = floor(log10(2) * 1e6)
    d1 = [r for r in rows_b if r["digit"] == 1][0]
    assert d1["expected_ppm"] == int(math.log10(2) * 1e6)


def test_benford_excludes_zero_null_and_uses_first_nonzero(spark):
    from pybabe_spark.operators.validate import benford_audit

    df = spark.createDataFrame(
        [(0.0,), (None,), (-230.0,), (0.045,), (7.0,)], "v double"
    )
    rows = {r["digit"]: r["n"] for r in benford_audit(df, "v").collect()}
    # -230 -> 2, 0.045 -> 4, 7 -> 7; zero and NULL excluded
    assert rows[2] == 1 and rows[4] == 1 and rows[7] == 1
    assert sum(rows.values()) == 3


# -- k_anonymity (functions/enrich.py) -----------------------------------------


def test_k_anonymity_hand_checked(spark):
    from pybabe_spark.functions.enrich import k_anonymity

    rows = (
        [("us", "a")] * 5 + [("us", "b")] * 2 + [("fr", "a")] * 1
        + [(None, "a")] * 3
    )
    df = spark.createDataFrame(rows, "country string, seg string")
    r = k_anonymity(df, ["country", "seg"], k=3).collect()[0]
    assert r.n_rows == 11 and r.n_groups == 4
    assert r.min_group_size == 1
    # (us,b)=2 and (fr,a)=1 are risky; NULL group of 3 is NOT
    assert r.risky_groups == 2 and r.risky_rows == 3
    assert r.risky_rows_ppm == (3 * 1_000_000) // 11


def test_k_anonymity_anonymous_and_empty(spark):
    from pybabe_spark.functions.enrich import k_anonymity

    rows = [("x",)] * 4 + [("y",)] * 4
    df = spark.createDataFrame(rows, "g string")
    r = k_anonymity(df, ["g"], k=4).collect()[0]
    assert r.risky_rows == 0 and r.risky_rows_ppm == 0
    empty = spark.createDataFrame([], "g string")
    r = k_anonymity(empty, ["g"], k=4).collect()[0]
    assert (r.n_rows, r.n_groups, r.min_group_size, r.risky_rows_ppm) \
        == (0, 0, 0, 0)


def test_k_anonymity_validation(spark):
    import pytest

    from pybabe_spark.functions.enrich import k_anonymity

    df = spark.createDataFrame([("x",)], "g string")
    with pytest.raises(ValueError):
        k_anonymity(df, [], 10)
    with pytest.raises(ValueError):
        k_anonymity(df, ["g"], 1)


def test_register_rejects_duplicate_keys():
    """A duplicate registry key must raise at import/registration time,
    never silently replace an existing query+oracle pair (the driver
    gate would quietly verify the wrong thing)."""
    import pytest

    from pybabe_spark.queries import REGISTRY, register

    key = next(iter(REGISTRY))
    with pytest.raises(ValueError, match="duplicate registry key"):
        register(key, "SELECT 1")(lambda spark, sf_dir: None)


# -- l_diversity (functions/enrich.py) ------------------------------------------


def test_l_diversity_hand_checked(spark):
    from pybabe_spark.functions.enrich import l_diversity

    rows = [
        # group (US, A): 3 rows, 1 distinct sensitive -> risky at l=2
        ("US", "A", "flu"), ("US", "A", "flu"), ("US", "A", "flu"),
        # group (US, B): 3 rows, 2 distinct -> diverse at l=2
        ("US", "B", "flu"), ("US", "B", "cold"), ("US", "B", "flu"),
        # group (FR, A): 2 rows, 2 distinct (NULL is a class)
        ("FR", "A", None), ("FR", "A", "flu"),
    ]
    df = spark.createDataFrame(rows, "country string, seg string, dx string")
    r = l_diversity(df, ["country", "seg"], "dx", 2).collect()[0]
    assert r["n_rows"] == 8 and r["n_groups"] == 3
    assert r["min_distinct_sensitive"] == 1
    assert r["risky_groups"] == 1 and r["risky_rows"] == 3
    assert r["risky_rows_ppm"] == 3 * 1_000_000 // 8


def test_l_diversity_homogeneity_invisible_to_k_anonymity(spark):
    """The motivating case: a big (k-anonymous) group that is fully
    homogeneous in the sensitive column — k_anonymity passes, l_diversity
    flags it."""
    from pybabe_spark.functions.enrich import k_anonymity, l_diversity

    rows = [("US", "flu")] * 20 + [("FR", "flu")] * 10 + [("FR", "cold")] * 10
    df = spark.createDataFrame(rows, "country string, dx string")
    k = k_anonymity(df, ["country"], k=5).collect()[0]
    assert k["risky_rows"] == 0  # both groups are large
    r = l_diversity(df, ["country"], "dx", 2).collect()[0]
    assert r["risky_groups"] == 1 and r["risky_rows"] == 20


def test_l_diversity_null_sensitive_and_empty(spark):
    from pybabe_spark.functions.enrich import l_diversity

    # all-NULL sensitive: 1 distinct class (the blank) -> risky at l=2
    rows = [("g1", None), ("g1", None)]
    df = spark.createDataFrame(rows, "g string, s string")
    r = l_diversity(df, ["g"], "s", 2).collect()[0]
    assert r["min_distinct_sensitive"] == 1 and r["risky_groups"] == 1

    empty = df.filter("1=0")
    r = l_diversity(empty, ["g"], "s", 2).collect()[0]
    assert r["n_rows"] == 0 and r["risky_rows_ppm"] == 0


def test_l_diversity_validation(spark):
    import pytest

    from pybabe_spark.functions.enrich import l_diversity

    df = spark.createDataFrame([("a", "b")], "g string, s string")
    with pytest.raises(ValueError):
        l_diversity(df, ["g"], "s", 1)
    with pytest.raises(ValueError):
        l_diversity(df, [], "s", 2)
    with pytest.raises(ValueError):
        l_diversity(df, ["g"], "g", 2)


# -- js_divergence (operators/validate.py) --------------------------------------


def _side(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "w string")


def test_jsd_matches_python_model(spark):
    import math
    import random
    from collections import Counter

    from pybabe_spark.operators.validate import js_divergence

    rng = random.Random(7)
    a = [rng.choice("abcdefgh") for _ in range(300)]
    b = [rng.choice("defghijk") for _ in range(250)]
    r = js_divergence(_side(spark, a), _side(spark, b), "w").collect()[0]

    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    js = 0.0
    for v in set(ca) | set(cb):
        p, q = ca.get(v, 0) / na, cb.get(v, 0) / nb
        if p > 0:
            js += 0.5 * p * math.log(2 * p / (p + q))
        if q > 0:
            js += 0.5 * q * math.log(2 * q / (p + q))
    assert abs(r["js"] - js) < 1e-9
    assert abs(r["js_normalized"] - js / math.log(2)) < 1e-6
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["vocab_size"] == len(set(ca) | set(cb))


def test_jsd_identical_zero_disjoint_ln2(spark):
    import math

    from pybabe_spark.operators.validate import js_divergence

    same = ["x"] * 5 + ["y"] * 3
    r = js_divergence(
        _side(spark, same), _side(spark, same), "w"
    ).collect()[0]
    assert abs(r["js"]) < 1e-12 and abs(r["js_normalized"]) < 1e-6

    r = js_divergence(
        _side(spark, ["a", "b"]), _side(spark, ["c", "d"]), "w"
    ).collect()[0]
    assert abs(r["js"] - math.log(2)) < 1e-9
    assert abs(r["js_normalized"] - 1.0) < 1e-6


def test_jsd_symmetric(spark):
    from pybabe_spark.operators.validate import js_divergence

    a = ["a"] * 8 + ["b"] * 2
    b = ["a"] * 3 + ["b"] * 6 + ["c"]
    r1 = js_divergence(_side(spark, a), _side(spark, b), "w").collect()[0]
    r2 = js_divergence(_side(spark, b), _side(spark, a), "w").collect()[0]
    assert abs(r1["js"] - r2["js"]) < 1e-12


def test_jsd_nulls_and_empty(spark):
    from pybabe_spark.operators.validate import js_divergence

    a = _side(spark, ["a", None, "b"])
    b = _side(spark, ["a", "b"])
    r = js_divergence(a, b, "w").collect()[0]
    assert r["n_a"] == 2  # NULL excluded

    empty = a.filter("1=0")
    r = js_divergence(a, empty, "w").collect()[0]
    assert r["n_b"] == 0 and r["js"] is None and r["js_normalized"] is None

    r = js_divergence(empty, empty, "w").collect()[0]
    assert r["n_a"] == 0 and r["vocab_size"] == 0 and r["js"] is None


# -- schema_drift (operators/validate.py) ---------------------------------------


def test_schema_drift_hand_checked(spark):
    from pybabe_spark.operators.validate import schema_drift

    a = spark.createDataFrame(
        [(1, "x", 1.5), (2, None, 2.5)], "id bigint, name string, v double"
    )
    b = spark.createDataFrame(
        [(1, "1.5", "tag"), (None, "2.5", "tag2")],
        "id bigint, v string, extra string",
    )
    got = {r["column"]: r for r in schema_drift(a, b).collect()}
    assert set(got) == {"id", "name", "v", "extra"}
    assert got["name"]["status"] == "removed"
    assert got["name"]["type_b"] is None
    assert got["extra"]["status"] == "added"
    assert got["v"]["status"] == "type_changed"
    assert got["v"]["type_a"] == "double" and got["v"]["type_b"] == "string"
    assert got["id"]["status"] == "same"
    # null rates: name 1/2 in a; id 1/2 in b; absent sides NULL
    assert got["name"]["null_ppm_a"] == 500_000
    assert got["name"]["null_ppm_b"] is None
    assert got["id"]["null_ppm_a"] == 0
    assert got["id"]["null_ppm_b"] == 500_000
    assert got["extra"]["null_ppm_a"] is None


def test_schema_drift_identical_and_empty(spark):
    from pybabe_spark.operators.validate import schema_drift

    a = spark.createDataFrame([(1, "x")], "id bigint, name string")
    got = schema_drift(a, a).collect()
    assert all(r["status"] == "same" for r in got)
    assert all(r["null_ppm_a"] == r["null_ppm_b"] == 0 for r in got)

    empty = a.filter("1=0")
    got = {r["column"]: r for r in schema_drift(a, empty).collect()}
    # empty side: schema still compares, rates are NULL (0 rows)
    assert got["id"]["status"] == "same"
    assert got["id"]["null_ppm_b"] is None
