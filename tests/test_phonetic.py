"""Soundex (documented H/W-as-vowel variant) against classic names,
edge inputs, and the phonetic blocking join."""

from pyspark.sql import functions as F

from pybabe_spark.functions.phonetic import phonetic_pairs, soundex


def _codes(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "n string")
    return [r["s"] for r in df.select(soundex("n").alias("s")).collect()]


def test_soundex_classic_names(spark):
    got = _codes(
        spark,
        ["Robert", "Rupert", "Tymczak", "Pfister", "Jackson", "AUBREY",
         "Smith", "Smyth", "Honeyman"],
    )
    assert got == ["R163", "R163", "T522", "P236", "J250", "A160",
                   "S530", "S530", "H555"]


def test_soundex_variant_hw_as_vowel(spark):
    # the documented divergence from the archival rule: S and C around
    # the H stay separate codes here (A226, not A261)
    assert _codes(spark, ["Ashcraft"]) == ["A226"]


def test_soundex_edge_inputs(spark):
    got = _codes(spark, ["", "###123", "A", "lee", "Customer#000000042"])
    assert got == ["", "", "A000", "L000", "C235"]


def test_soundex_case_insensitive(spark):
    assert _codes(spark, ["ROBERT", "robert", "RoBeRt"]) == ["R163"] * 3


def test_phonetic_pairs_blocking(spark):
    df = spark.createDataFrame(
        [(1, "Smith"), (2, "Smyth"), (3, "Jones"), (4, "Robert"),
         (5, "Rupert"), (6, "###")],
        "id long, name string",
    )
    got = {
        (r["id1"], r["id2"])
        for r in phonetic_pairs(df, "id", "name").collect()
    }
    assert got == {(1, 2), (4, 5)}
    # the levenshtein confirm prunes the distance-2 phonetic match
    confirmed = {
        (r["id1"], r["id2"])
        for r in phonetic_pairs(df, "id", "name", max_dist=1).collect()
    }
    assert confirmed == {(1, 2)}


def test_phonetic_pairs_plan_lints_clean(spark):
    from pybabe_spark.plans.lint import plan_lint

    df = spark.createDataFrame(
        [(1, "Smith"), (2, "Smyth")], "id long, name string"
    )
    assert plan_lint(phonetic_pairs(df, "id", "name")) == []
    assert plan_lint(df.select(soundex("name"))) == []
