"""Flesch readability (functions/text.py::readability): the struct's
ppm scores against an independent Python model of the same definition,
including floor semantics on negative grades — the case truncating
integer division silently gets wrong."""

import re

from pybabe_spark.functions.text import readability


def _model(text: str):
    w = len(text.split(" "))
    s = max(len(re.findall(r"[.!?]+", text)), 1)
    y = max(len(re.findall(r"[aeiouy]+", text.lower())), w)
    den = s * w
    ease = (206835000 * s * w - 1015000 * w * w - 84600000 * y * s) // den
    grade = (390000 * w * w + 11800000 * y * s - 15590000 * s * w) // den
    return w, s, y, ease, grade


FIXTURES = [
    "The cat sat.",                      # classic: ease 119.19, grade -2.62
    "banana mango papaya",               # positive grade, non-divisible den
    "xyz qqq",                           # vowel-free: syllables floor to W
    "One sentence. Two sentences! Three?",
    "a",                                 # single word, no sentence marks
    "",                                  # empty text: one empty word
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
]


def test_readability_matches_python_model(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(FIXTURES)],
                               "id int, text string")
    rows = {
        r["id"]: r
        for r in df.select("id", readability("text").alias("r")).select(
            "id", "r.*"
        ).collect()
    }
    for i, t in enumerate(FIXTURES):
        w, s, y, ease, grade = _model(t)
        got = rows[i]
        assert (got["n_words"], got["n_sentences"], got["n_syllables"]) == (
            w, s, y
        ), t
        assert got["reading_ease_ppm"] == ease, t
        assert got["fk_grade_ppm"] == grade, t


def test_readability_hand_checked_values(spark):
    # "The cat sat.": W=3 S=1 Y=3 -> ease = 206.835 - 3.045 - 84.6 =
    # 119.19 exactly; grade = 1.17 + 11.8 - 15.59 = -2.62 exactly.
    df = spark.createDataFrame([("The cat sat.",)], "text string")
    r = df.select(readability("text").alias("r")).select("r.*").collect()[0]
    assert r["reading_ease_ppm"] == 119190000
    assert r["fk_grade_ppm"] == -2620000


def test_readability_negative_floor_not_truncation(spark):
    # W=7, S=2, Y=8: grade numerator = 390000*49 + 11800000*16
    # - 15590000*14 = -10350000, den = 14 -> -739285.714...:
    # floor = -739286, truncation = -739285. Pin the floor.
    t = "go. to! ada is on up at"
    w, s, y, ease, grade = _model(t)
    assert (w, s, y) == (7, 2, 8), "fixture drifted"
    num = 390000 * w * w + 11800000 * y * s - 15590000 * s * w
    assert num < 0 and num % (s * w) != 0, "fixture lost non-divisibility"
    df = spark.createDataFrame([(t,)], "text string")
    r = df.select(readability("text").alias("r")).select("r.*").collect()[0]
    assert r["fk_grade_ppm"] == grade == -739286  # floor, not trunc


def test_readability_huge_document_no_int64_overflow(spark):
    # 3e5 one-syllable one-word sentences: the ease numerator's
    # 206835000·S·W term is ~1.9e19 > int64 max — the DECIMAL(38,0)
    # numerator path must stay exact where BIGINT products would
    # abort under ANSI (r12 advice fix). Python ints model it exactly.
    n = 300_000
    t = "a. " * n
    w = n + 1  # trailing split yields one empty word
    s = n
    y = max(n, w)
    ease_num = 206835000 * s * w - 1015000 * w * w - 84600000 * y * s
    grade_num = 390000 * w * w + 11800000 * y * s - 15590000 * s * w
    den = s * w
    assert abs(ease_num) > 2**63, "fixture no longer exercises overflow"
    df = spark.createDataFrame([(t,)], "text string")
    r = df.select(readability("text").alias("r")).select("r.*").collect()[0]
    assert r["n_words"] == w and r["n_sentences"] == s
    assert r["reading_ease_ppm"] == ease_num // den
    assert r["fk_grade_ppm"] == grade_num // den


def test_compression_ratio_exact_zlib(spark):
    """Pin exact zlib ratios (deterministic by spec: input+level fix the
    output bytes) and NULL semantics for empty/NULL text."""
    import zlib

    from pybabe_spark.functions.text import compression_ratio

    texts = ["the the the the the the the the", "a", "", None,
             "incompressible-ish 8f3k2j 9x!q"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id int, text string")
    got = {r["id"]: r["cr"] for r in
           df.select("id", compression_ratio("text").alias("cr")).collect()}
    for i, t in enumerate(texts):
        if not t:
            assert got[i] is None, t
        else:
            raw = t.encode()
            assert got[i] == len(raw) / len(zlib.compress(raw, 6)), t
    # repetitive text compresses better than the short unique one
    assert got[0] > got[4]

    import pytest

    with pytest.raises(ValueError):
        compression_ratio("text", level=0)


def test_facade_readability_and_compression(spark):
    from pybabe_spark.plans.facade import Babe

    df = spark.createDataFrame([("go go go go.",)], "text string")
    out = Babe(df).readability("text").compression_ratio("text").df
    row = out.collect()[0]
    assert row["readability"]["n_words"] == 4
    assert row["compression_ratio"] > 0


def test_required_sample_size_textbook(spark):
    """Baseline 10% with a 10% relative MDE at alpha=.05/power=.8 is the
    classic ~14.7k-per-arm case; pin the exact Python-replayed value."""
    import math

    from pybabe_spark.operators.sketch import required_sample_size

    rows = [("g", 1)] * 100 + [("g", 0)] * 900    # p1 = 0.1 exactly
    df = spark.createDataFrame(rows, "g string, done int")
    r = required_sample_size(df, "done", by="g").collect()[0]
    assert (r["n"], r["successes"], r["p_ppm"]) == (1000, 100, 100000)

    p1, m = 100 / 1000, 1.10
    p2 = p1 * m
    pbar = (p1 + p2) / 2.0
    num = (1.959964 * math.sqrt(2.0 * pbar * (1.0 - pbar))
           + 0.841621 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2)))
    expect = math.ceil((num * num) / ((p2 - p1) * (p2 - p1)))
    assert r["n_required"] == expect
    assert 14000 < r["n_required"] < 15500  # the textbook ballpark

    # undefined regimes -> NULL, not a crash
    z = spark.createDataFrame([("z", 0), ("z", 0)], "g string, done int")
    assert required_sample_size(z, "done", by="g").collect()[0][
        "n_required"] is None
    sat = spark.createDataFrame([("s", 1)] * 99 + [("s", 0)],
                                "g string, done int")
    # p1=0.99 -> p2=1.089 >= 1 -> NULL
    assert required_sample_size(sat, "done", by="g").collect()[0][
        "n_required"] is None

    import pytest

    with pytest.raises(ValueError):
        required_sample_size(df, "done", relative_mde=0.0)


def test_roc_auc_matches_rank_model(spark):
    """Tie-corrected rank-sum AUC against a pure-Python model of the
    same definition (== sklearn's trapezoidal roc_auc_score)."""
    import random

    from pybabe_spark.operators.classifier import roc_auc

    rng = random.Random(11)
    rows = [(round(rng.choice([0.1, 0.3, 0.3, 0.5, 0.7, 0.9]), 6),
             rng.randint(0, 1)) for _ in range(200)]
    df = spark.createDataFrame(rows, "score double, label int")
    r = roc_auc(df, "score", "label").collect()[0]

    scores = sorted(set(s for s, _ in rows))
    # average ranks per value (1-based), doubled to stay integral
    from collections import Counter
    cnt = Counter(s for s, _ in rows)
    pos = Counter(s for s, l in rows if l)
    cum, s2 = 0, 0
    for s in scores:
        s2 += pos[s] * (2 * cum + cnt[s] + 1)
        cum += cnt[s]
    n1 = sum(l for _, l in rows)
    n0 = len(rows) - n1
    expect = (1_000_000 * (s2 - n1 * (n1 + 1))) // (2 * n1 * n0)
    assert (r["n_pos"], r["n_neg"]) == (n1, n0)
    assert r["auc_ppm"] == expect

    # perfect separation -> 1e6; random labels on one value -> 500000
    perf = spark.createDataFrame(
        [(0.9, 1)] * 5 + [(0.1, 0)] * 5, "score double, label int")
    assert roc_auc(perf, "score", "label").collect()[0]["auc_ppm"] == 1000000
    allties = spark.createDataFrame(
        [(0.5, 1)] * 4 + [(0.5, 0)] * 6, "score double, label int")
    assert roc_auc(allties, "score", "label").collect()[0][
        "auc_ppm"] == 500000
    # degenerate: single class -> NULL
    onec = spark.createDataFrame([(0.5, 1)] * 3, "score double, label int")
    assert roc_auc(onec, "score", "label").collect()[0]["auc_ppm"] is None


def test_gains_table_hand_checked(spark):
    """10 rows, 2 buckets of 5: top-5 scores hold 3 of 4 positives ->
    capture 750000 ppm, lift = (3/5)/(4/10) = 1.5x."""
    from pybabe_spark.operators.classifier import gains_table

    rows = [
        (1, 0.9, 1), (2, 0.8, 1), (3, 0.7, 0), (4, 0.6, 1), (5, 0.5, 0),
        (6, 0.4, 0), (7, 0.3, 1), (8, 0.2, 0), (9, 0.1, 0), (10, 0.05, 0),
    ]
    df = spark.createDataFrame(rows, "id int, score double, label int")
    got = {r["bucket"]: r for r in
           gains_table(df, "score", "label", "id", n_buckets=2).collect()}
    b1, b2 = got[1], got[2]
    assert (b1["n"], b1["n_pos"], b1["cum_pos"]) == (5, 3, 3)
    assert b1["capture_ppm"] == 750000
    assert b1["lift_ppm"] == 1500000
    assert (b2["cum_n"], b2["cum_pos"]) == (10, 4)
    assert b2["capture_ppm"] == 1000000
    assert b2["lift_ppm"] == 1000000  # full population = base rate

    import pytest

    with pytest.raises(ValueError):
        gains_table(df, "score", "label", "id", n_buckets=1)


def test_gains_table_tie_order_by_id(spark):
    """All-equal scores: bucket assignment must follow id order (the
    deterministic tiebreak), not engine partition luck."""
    from pybabe_spark.operators.classifier import gains_table

    rows = [(i, 0.5, 1 if i <= 2 else 0) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "id int, score double, label int")
    got = {r["bucket"]: r for r in
           gains_table(df, "score", "label", "id", n_buckets=3).collect()}
    # ids 1,2 (both positive) land in bucket 1
    assert (got[1]["n"], got[1]["n_pos"]) == (2, 2)
    assert (got[2]["n_pos"], got[3]["n_pos"]) == (0, 0)


def test_gains_table_duplicate_id_in_tie_cell_raises(spark):
    """Duplicate ids inside a (score) tie cell would make the
    ORDER BY id tiebreak engine-dependent — the in-plan guard must
    fail loudly (r12 advice fix), and ids duplicated across DIFFERENT
    scores must stay legal (the tiebreak never compares them)."""
    import pytest
    from pybabe_spark.operators.classifier import gains_table

    dup = spark.createDataFrame(
        [(1, 0.5, 1), (1, 0.5, 0), (2, 0.5, 0), (3, 0.1, 0)],
        "id int, score double, label int",
    )
    with pytest.raises(Exception, match="duplicate"):
        gains_table(dup, "score", "label", "id", n_buckets=2).collect()

    across = spark.createDataFrame(
        [(1, 0.9, 1), (1, 0.5, 0), (2, 0.5, 0), (3, 0.1, 0)],
        "id int, score double, label int",
    )
    rows = gains_table(across, "score", "label", "id",
                       n_buckets=2).collect()
    assert sum(r["n"] for r in rows) == 4


def test_g_test_matches_python_model(spark):
    """2x2 hand table vs a pure-python O*ln(O/E) model with the same
    per-term 12dp rounding; plus an exactly-independent table -> g=0."""
    import math
    from decimal import Decimal, ROUND_HALF_UP

    from pybabe_spark.operators.sketch import g_test

    rows = ([("x", "p")] * 30 + [("x", "q")] * 10
            + [("y", "p")] * 15 + [("y", "q")] * 45)
    df = spark.createDataFrame(rows, "a string, b string")
    r = g_test(df, "a", "b", crit=3.841459).collect()[0]
    assert (r["n"], r["dof"]) == (100, 1)

    cells = {("x", "p"): 30, ("x", "q"): 10, ("y", "p"): 15, ("y", "q"): 45}
    ra = {"x": 40, "y": 60}
    cb = {"p": 45, "q": 55}
    total = Decimal(0)
    for (a, b), o in cells.items():
        t = 2.0 * o * math.log((o * 100) / (ra[a] * cb[b]))
        total += Decimal(repr(t)).quantize(
            Decimal("1e-12"), rounding=ROUND_HALF_UP)
    expect = float(total.quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))
    assert r["g"] == expect
    assert r["significant"] is True and r["g"] > 20  # strong dependence

    # exact independence: O == E in every cell -> every term ln(1) = 0
    ind = ([("x", "p")] * 20 + [("x", "q")] * 20
           + [("y", "p")] * 10 + [("y", "q")] * 10)
    r0 = g_test(spark.createDataFrame(ind, "a string, b string"),
                "a", "b").collect()[0]
    assert r0["g"] == 0.0 and r0["significant"] is False


def test_fleiss_kappa_textbook_and_guards(spark):
    """Hand-checked 4 items x 3 raters x 2 categories, exact rational
    replayed in python; perfect agreement -> 1e6; constant-raters
    guard raises on ragged items."""
    from pybabe_spark.operators.sketch import fleiss_kappa

    # items: a,b unanimous 'x'; c unanimous 'y'; d split 2x/1y
    rows = ([("a", "x")] * 3 + [("b", "x")] * 3 + [("c", "y")] * 3
            + [("d", "x")] * 2 + [("d", "y")])
    df = spark.createDataFrame(rows, "item string, cat string")
    r = fleiss_kappa(df, "item", "cat").collect()[0]
    assert (r["n_items"], r["n_raters"], r["n_categories"]) == (4, 3, 2)
    # exact rational: S = 9*3 + 4 + 1 = 32; N=4 n=3
    # A = 32-12 = 20, B = 12*2 = 24, C = 8^2+4^2 = 80, D = 144
    # kappa = (20*144 - 80*24)/(24*(144-80)) = 960/1536 = 0.625
    assert r["kappa_ppm"] == 625000

    perfect = spark.createDataFrame(
        [("a", "x")] * 3 + [("b", "y")] * 3, "item string, cat string")
    assert fleiss_kappa(perfect, "item", "cat").collect()[0][
        "kappa_ppm"] == 1000000

    # negative kappa (agreement worse than chance) floors, not truncs:
    # 2 items, 2 raters, each item split -> kappa = -1 exactly here
    neg = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")],
        "item string, cat string")
    assert fleiss_kappa(neg, "item", "cat").collect()[0][
        "kappa_ppm"] == -1000000

    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    ragged = spark.createDataFrame(
        [("a", "x")] * 3 + [("b", "x")] * 2, "item string, cat string")
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="constant number of raters"):
        fleiss_kappa(ragged, "item", "cat").collect()


def test_dunn_test_matches_python_model(spark):
    """Three skew groups vs a pure-python Dunn model (midranks with
    ties, tie-corrected variance); z rounds to 6dp before comparing."""
    from decimal import Decimal, ROUND_HALF_UP

    from pybabe_spark.operators.sketch import dunn_test

    rows = ([("a", 1.0)] * 5 + [("a", 2.0)] * 3
            + [("b", 2.0)] * 4 + [("b", 3.0)] * 4
            + [("c", 3.0)] * 2 + [("c", 9.0)] * 6)
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r["g_1"], r["g_2"]): r
           for r in dunn_test(df, "g", "v", z_crit=2.394).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    # python model
    from collections import Counter
    vals = [v for _, v in rows]
    cnt = Counter(vals)
    cum, mid = 0, {}
    for v in sorted(cnt):
        mid[v] = cum + (cnt[v] + 1) / 2.0
        cum += cnt[v]
    n = len(rows)
    tt = sum(c ** 3 - c for c in cnt.values())
    sigma2 = n * (n + 1) / 12.0 - tt / (12.0 * (n - 1))
    import itertools
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    for g1, g2 in itertools.combinations(sorted(groups), 2):
        m1 = sum(mid[v] for v in groups[g1]) / len(groups[g1])
        m2 = sum(mid[v] for v in groups[g2]) / len(groups[g2])
        se = (sigma2 * (1 / len(groups[g1]) + 1 / len(groups[g2]))) ** 0.5
        z = float(Decimal(repr((m1 - m2) / se)).quantize(
            Decimal("1e-6"), rounding=ROUND_HALF_UP))
        r = got[(g1, g2)]
        assert (r["n1"], r["n2"]) == (len(groups[g1]), len(groups[g2]))
        assert r["z"] == z, (g1, g2)
        assert r["significant"] == (abs(z) > 2.394)

    # all-tied corpus: zero variance -> NULL z, not a crash
    flat = spark.createDataFrame(
        [("a", 5.0)] * 3 + [("b", 5.0)] * 3, "g string, v double")
    r0 = dunn_test(flat, "g", "v").collect()[0]
    assert r0["z"] is None and r0["significant"] is False

    import pytest

    with pytest.raises(ValueError):
        dunn_test(df, "g", "v", max_groups=1)


def test_eb_shrinkage_behaviour_and_model(spark):
    """Shrinkage sanity: a 2/2 group ends between its raw 1.0 and the
    corpus mean; high-evidence groups barely move; exact replay of the
    moment-matched prior in python; degenerate (zero-variance) corpus
    returns raw rates with NULL prior."""
    from decimal import Decimal, ROUND_HALF_UP

    from pybabe_spark.operators.sketch import eb_shrink_rates

    rows = (
        [("tiny", 1)] * 2                 # 2/2 raw 1.0, thin evidence
        + [("big", 1)] * 60 + [("big", 0)] * 40     # 0.6 on n=100
        + [("mid", 1)] * 5 + [("mid", 0)] * 15      # 0.25 on n=20
        + [("low", 0)] * 10                          # 0.0 on n=10
    )
    df = spark.createDataFrame(rows, "g string, done int")
    got = {r["g"]: r for r in eb_shrink_rates(df, "g", "done").collect()}

    # python model with the operator's exact rounding chain
    def d12(x):
        return Decimal(repr(x)).quantize(Decimal("1e-12"),
                                         rounding=ROUND_HALF_UP)
    ps = {"tiny": d12(2 / 2), "big": d12(60 / 100),
          "mid": d12(5 / 20), "low": d12(0 / 10)}
    k = len(ps)
    sp, sq = sum(ps.values()), sum(p * p for p in ps.values())
    m = float(sp) / k
    v = (float(sq) - k * m * m) / (k - 1)
    s = m * (1 - m) / v - 1.0
    assert s > 0
    counts = {"tiny": (2, 2), "big": (100, 60),
              "mid": (20, 5), "low": (10, 0)}
    for g, (n, kk) in counts.items():
        shrunk = (kk + m * s) / (n + m * s + (1 - m) * s)
        expect = float(Decimal(repr(shrunk)).quantize(
            Decimal("1e-6"), rounding=ROUND_HALF_UP))
        assert got[g]["shrunk_rate"] == expect, g
    # direction: thin evidence moves a lot, heavy evidence barely
    assert got["tiny"]["shrunk_rate"] < 1.0
    assert abs(got["big"]["shrunk_rate"] - 0.6) < abs(
        got["tiny"]["shrunk_rate"] - 1.0)

    flat = spark.createDataFrame(
        [("a", 1), ("a", 0), ("b", 1), ("b", 0)], "g string, done int")
    r0 = {r["g"]: r for r in eb_shrink_rates(flat, "g", "done").collect()}
    assert r0["a"]["shrunk_rate"] == 0.5  # raw, zero-variance corpus
    assert r0["a"]["prior_strength"] is None
