"""n-gram LM perplexity (operators/lm.py) and DSIR importance
resampling (operators/dsir.py): model-based checks against pure-Python
references, edge cases, and plan-shape assertions."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pybabe_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
    hashed_ngram_features,
)
from pybabe_spark.operators.lm import (
    bigram_rows,
    perplexity,
    perplexity_filter,
    train_bigram_lm,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "the cat sat"),
    (4, "one"),
    (5, "completely different words entirely here"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def _py_bigrams(text):
    ws = text.split(" ")
    return list(zip(ws, ws[1:]))


def test_bigram_rows_matches_python(spark, docs):
    got = sorted(
        (r["doc_id"], r["w1"], r["w2"]) for r in bigram_rows(docs).collect()
    )
    want = sorted(
        (i, a, b) for i, t in DOCS for a, b in _py_bigrams(t)
    )
    assert got == want


def test_bigram_rows_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "a b")], "doc_id bigint, text string"
    )
    got = [(r["doc_id"], r["w1"], r["w2"]) for r in bigram_rows(df).collect()]
    # '' splits to [''] (one token) -> no bigrams, same as the 1-word doc
    assert got == [(3, "a", "b")]


def _py_perplexity(corpus, alpha=1.0):
    """Reference add-alpha bigram model over the same corpus."""
    from collections import Counter

    uni = Counter(w for _, t in corpus for w in t.split(" "))
    bi = Counter(p for _, t in corpus for p in _py_bigrams(t))
    v = len(uni)
    out = {}
    for i, t in corpus:
        bgs = _py_bigrams(t)
        if not bgs:
            out[i] = (0, None)
            continue
        s = sum(
            # mirror the DECIMAL(18,6) per-term rounding (round-half-up
            # like Spark's decimal cast; quantities here are not near
            # boundaries so floor(x*1e6+0.5) is fine)
            math.floor(
                math.log((bi[p] + alpha) / (uni[p[0]] + alpha * v)) * 1e6 + 0.5
            )
            / 1e6
            for p in bgs
        )
        out[i] = (len(bgs), round(s, 6))
    return out


def test_perplexity_matches_python_model(spark, docs):
    lm = train_bigram_lm(docs)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logp"], r["avg_logp"], r["ppl"])
        for r in perplexity(docs, lm).collect()
    }
    want = _py_perplexity(DOCS)
    assert set(got) == set(want)
    for i, (n, s) in want.items():
        gn, gs, ga, gp = got[i]
        assert gn == n
        if n == 0:
            assert gs is None and ga is None and gp is None
        else:
            assert gs == pytest.approx(s, abs=1e-9)
            assert ga == pytest.approx(s / n, abs=1e-9)
            assert gp == pytest.approx(math.exp(-s / n), abs=1e-5)


def test_perplexity_cross_corpus_unseen_ngrams(spark, docs):
    """Scoring a corpus against an LM trained elsewhere: unseen bigrams
    and contexts fall back to the smoothing floor instead of erroring."""
    other = spark.createDataFrame(
        [(9, "qx wz vb nm")], "doc_id bigint, text string"
    )
    lm = train_bigram_lm(docs)
    row = perplexity(other, lm).collect()[0]
    v = lm.vocab.collect()[0]["v"]
    # every bigram unseen, every context unseen: p = alpha/(alpha*V) = 1/V
    assert row["avg_logp"] == pytest.approx(math.log(1.0 / v), abs=1e-5)


def test_perplexity_min_count_prunes_toward_floor(spark, docs):
    """Pruned bigrams score as unseen — perplexity can only rise."""
    full = {
        r["doc_id"]: r["ppl"]
        for r in perplexity(docs, train_bigram_lm(docs)).collect()
    }
    pruned = {
        r["doc_id"]: r["ppl"]
        for r in perplexity(docs, train_bigram_lm(docs, min_count=2)).collect()
    }
    assert all(
        pruned[i] >= full[i] - 1e-9 for i in full if full[i] is not None
    )
    assert any(
        pruned[i] > full[i] for i in full if full[i] is not None
    )


def test_perplexity_filter_keeps_low_tail_drops_short(spark, docs):
    lm = train_bigram_lm(docs)
    scores = {
        r["doc_id"]: r["ppl"] for r in perplexity(docs, lm).collect()
    }
    cut = sorted(p for p in scores.values() if p is not None)[2]
    kept = sorted(
        r["doc_id"] for r in perplexity_filter(docs, lm, cut).collect()
    )
    want = sorted(
        i for i, p in scores.items() if p is not None and p <= cut
    )
    assert kept == want
    assert 4 not in kept  # the 1-word doc has no evidence and is dropped


def _py_bucket(feat, buckets):
    """Mirror of sampling.hash_bucket(kind='string') then % buckets."""
    h = int(hashlib.md5(feat.encode()).hexdigest()[:15], 16)
    folded = h % 1_000_003
    return (folded * 2_654_435_761 + 123_456_789) % 1_000_000 % buckets


def test_hashed_features_match_python(spark, docs):
    got = sorted(
        (r["doc_id"], r["bucket"])
        for r in hashed_ngram_features(docs, buckets=97).collect()
    )
    want = sorted(
        (i, _py_bucket(f"{a} {b}", 97))
        for i, t in DOCS
        for a, b in _py_bigrams(t)
    )
    assert got == want


def test_dsir_weights_match_python_model(spark, docs):
    buckets, alpha = 97, 1.0
    target_ids = {1, 3}
    target = docs.filter(F.col("doc_id").isin(*target_ids))
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_log_weights(docs, target, buckets=buckets).collect()
    }

    from collections import Counter

    raw_f = [
        (i, _py_bucket(f"{a} {b}", buckets))
        for i, t in DOCS
        for a, b in _py_bigrams(t)
    ]
    tgt_f = [b for i, b in raw_f if i in target_ids]
    cr, ct = Counter(b for _, b in raw_f), Counter(tgt_f)
    nr, nt = len(raw_f), len(tgt_f)
    for i, _ in DOCS:
        feats = [b for j, b in raw_f if j == i]
        gn, gw = got[i]
        assert gn == len(feats)
        if not feats:
            assert gw is None
            continue
        s = sum(
            math.floor(
                (
                    math.log((ct[b] + alpha) / (nt + alpha * buckets))
                    - math.log((cr[b] + alpha) / (nr + alpha * buckets))
                )
                * 1e6
                + 0.5
            )
            / 1e6
            for b in feats
        )
        assert gw == pytest.approx(s, abs=1e-9)
    # target-like docs must outrank the unrelated one (per feature)
    assert got[1][1] / got[1][0] > got[5][1] / got[5][0]


def test_dsir_resample_deterministic_and_seeded(spark, docs):
    target = docs.filter(F.col("doc_id").isin(1, 3))
    w = dsir_log_weights(docs, target, buckets=97)
    pick = lambda seed: [
        r["doc_id"] for r in dsir_resample(w, 2, seed=seed).collect()
    ]
    a, b = pick(0), pick(0)
    assert a == b and len(a) == 2
    assert 4 not in a  # NULL-weight doc excluded
    seeds = {tuple(pick(s)) for s in range(6)}
    assert len(seeds) > 1  # the noise actually depends on the seed


def test_dsir_resample_plan_is_topk_not_global_sort(spark, docs):
    target = docs.filter(F.col("doc_id").isin(1, 3))
    w = dsir_log_weights(docs, target, buckets=97)
    plan = dsir_resample(w, 2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_lint_proves_single_row_scalar_join_safe(spark):
    """attach_scalars plans a BroadcastNestedLoopJoin, but the build side
    is a grouping-key-free aggregate (maxRows=1) — lint must not flag
    it, while a genuine multi-row cross join stays flagged."""
    from pybabe_spark.operators._util import attach_scalars
    from pybabe_spark.plans.lint import plan_lint

    big = spark.range(100)
    ok = attach_scalars(big, big.agg(F.count("*").alias("n")))
    assert "BroadcastNestedLoopJoin" in (
        ok._jdf.queryExecution().executedPlan().toString()
    )
    assert plan_lint(ok) == []

    bad = big.crossJoin(F.broadcast(spark.range(5).select(F.col("id").alias("j"))))
    assert [c for c, _ in plan_lint(bad)] == ["broadcast-nested-loop"]


# ---------------------------------------------------------------------------
# strip_duplicated_spans (operators/decontam.py) — exact-substring removal
# ---------------------------------------------------------------------------

def _py_strip(corpus, n, min_dup=2):
    from collections import Counter

    grams = Counter(
        tuple(t.split(" ")[i : i + n])
        for _, t in corpus
        for i in range(len(t.split(" ")) - n + 1)
    )
    out = {}
    for doc_id, t in corpus:
        ws = t.split(" ")
        covered = set()
        for i in range(len(ws) - n + 1):
            if grams[tuple(ws[i : i + n])] >= min_dup:
                covered.update(range(i, i + n))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        out[doc_id] = (" ".join(kept), len(ws), len(covered))
    return out


def test_strip_duplicated_spans_matches_python(spark):
    from pybabe_spark.operators.decontam import strip_duplicated_spans

    corpus = [
        (1, "a b c d e unique tail one"),
        (2, "prefix two a b c d e suffix"),          # shares the 5-span
        (3, "x y z completely different words"),
        (4, "a b c d e"),                            # the whole doc is the span
        (5, "tiny"),                                 # shorter than n
        (6, "a b c d e a b c d e"),                  # internal repeat too
    ]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_words"], r["n_removed"])
        for r in strip_duplicated_spans(df, n=5).collect()
    }
    assert got == _py_strip(corpus, 5)
    # the shared 5-gram is gone everywhere, full-span doc is emptied
    assert got[4][0] == ""
    assert got[3] == ("x y z completely different words", 6, 0)
    assert got[5] == ("tiny", 1, 0)


def test_strip_duplicated_spans_window_is_per_doc(spark):
    """The coverage window must be partitioned by doc — plan_lint's
    global-window check would catch a statless regression."""
    from pybabe_spark.operators.decontam import strip_duplicated_spans
    from pybabe_spark.plans.lint import plan_lint

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id bigint, text string"
    )
    assert plan_lint(strip_duplicated_spans(df, n=5)) == []


def test_lm_save_load_roundtrip_scores_identically(spark, docs, tmp_path):
    from pybabe_spark.operators.lm import load_lm, save_lm

    lm = train_bigram_lm(docs)
    save_lm(lm, str(tmp_path / "lm"))
    loaded = load_lm(spark, str(tmp_path / "lm"))
    fresh = {tuple(r) for r in perplexity(docs, lm).collect()}
    stored = {tuple(r) for r in perplexity(docs, loaded).collect()}
    assert fresh == stored


def test_merge_lm_equals_training_on_union(spark, docs):
    """Counts are additive: merging per-half models must reproduce the
    whole-corpus model exactly, scoring included (the incremental-batch
    contract; min_count pruning intentionally breaks additivity and is
    a train-time-only knob)."""
    from pybabe_spark.operators.lm import merge_lm

    half_a = docs.filter(F.col("doc_id") <= 2)
    half_b = docs.filter(F.col("doc_id") > 2)
    merged = merge_lm(train_bigram_lm(half_a), train_bigram_lm(half_b))
    whole = train_bigram_lm(docs)
    assert {tuple(r) for r in merged.bigrams.collect()} == {
        tuple(r) for r in whole.bigrams.collect()
    }
    assert {tuple(r) for r in perplexity(docs, merged).collect()} == {
        tuple(r) for r in perplexity(docs, whole).collect()
    }


def test_strip_duplicated_spans_keeps_null_text_rows(spark):
    """NULL text behaves like '' — the row must survive (review finding:
    posexplode of a NULL split array emits zero rows and dropped it)."""
    from pybabe_spark.operators.decontam import strip_duplicated_spans

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_words"], r["n_removed"])
        for r in strip_duplicated_spans(df, n=2).collect()
    }
    assert got[2] == ("", 1, 0)
    assert got[1] == ("a b c", 3, 0)


def test_dsir_empty_target_degrades_to_uniform_not_null(spark, docs):
    """An empty target corpus carries no information: weights must stay
    FINITE (uniform target model), not NULL — a NULL would silently wipe
    dsir_resample/dsir_select output (review finding)."""
    import math

    empty = docs.filter(F.col("doc_id") < 0)
    w = dsir_log_weights(docs, empty, buckets=97)
    rows = {r["doc_id"]: r for r in w.collect()}
    # per-feature term: ln(1/97) - ln(p_raw(f)); finite for every doc
    assert all(
        rows[i]["log_weight"] is not None
        for i in rows
        if rows[i]["n_feats"] > 0
    )
    assert rows[4]["log_weight"] is None  # featureless doc stays NULL
    picked = dsir_resample(w, 3).collect()
    assert len(picked) == 3
    assert all(math.isfinite(r["gumbel"]) for r in picked)


def test_lint_one_row_equi_join_does_not_mask_real_bnlj(spark):
    """Review finding: a benign 1-row-side EQUI join (plans as a hash
    join, produces no BNLJ node) must not be subtracted from the BNLJ
    count and mask a genuine quadratic nested loop in the same plan."""
    from pyspark.sql import functions as F

    from pybabe_spark.plans.lint import plan_lint

    big = spark.range(100)
    one = spark.range(1).select(F.col("id"), F.lit(7).alias("x"))
    five = spark.range(5).select(F.col("id").alias("j"))
    mixed = big.join(one, "id").crossJoin(F.broadcast(five))
    assert [c for c, _ in plan_lint(mixed)] == ["broadcast-nested-loop"]


# ---------------------------------------------------------------------------
# Logistic-regression quality classifier (operators/classifier.py)
# ---------------------------------------------------------------------------

def _py_train_classifier(corpus, labels, buckets, iters, lr_num, lr_den):
    """Exact integer micro-unit replay of train_quality_classifier."""
    from collections import Counter, defaultdict

    prof = defaultdict(Counter)
    for i, t in corpus:
        for a, b in _py_bigrams(t):
            prof[i][_py_bucket(f"{a} {b}", buckets)] += 1
    n = len(corpus)
    all_buckets = {b for c in prof.values() for b in c}
    wm = {b: 0 for b in all_buckets}

    def halfup(p, q):
        if p >= 0:
            return (2 * p + q) // (2 * q)
        return -((2 * (-p) + q) // (2 * q))

    for _ in range(iters):
        rm = {}
        for i, _t in corpus:
            sm = sum(nf * wm[b] for b, nf in prof[i].items())
            sd = sm / 1e6
            sig = 0.5 + 0.5 * sd / (1.0 + abs(sd))
            sig_dec = __import__("math").floor(sig * 1e6 + 0.5)
            rm[i] = sig_dec - labels[i] * 1_000_000
        gm = Counter()
        for i, _t in corpus:
            for b, nf in prof[i].items():
                gm[b] += nf * rm[i]
        for b in wm:
            wm[b] -= halfup(gm[b] * lr_num, n * lr_den)
    return {b: w / 1e6 for b, w in wm.items()}


def test_quality_classifier_matches_python_model(spark, docs):
    from pybabe_spark.operators.classifier import train_quality_classifier

    labeled = docs.withColumn(
        "__lbl", (F.col("doc_id") % 2 == 0).cast("int")
    )
    got = {
        r["bucket"]: float(r["w"])
        for r in train_quality_classifier(
            labeled, "__lbl", buckets=97, iters=2, lr=1.0
        ).collect()
    }
    want = _py_train_classifier(
        DOCS, {i: int(i % 2 == 0) for i, _ in DOCS}, 97, 2, 1, 1
    )
    assert got == pytest.approx(want, abs=1e-12)


def test_quality_classifier_scores_and_filter(spark, docs):
    from pybabe_spark.operators.classifier import (
        quality_classifier_filter,
        score_quality,
        train_quality_classifier,
    )

    labeled = docs.withColumn("__lbl", (F.col("doc_id") <= 2).cast("int"))
    w = train_quality_classifier(labeled, "__lbl", buckets=97, iters=2, lr=1.0)
    scored = {r["doc_id"]: r for r in score_quality(docs, w, buckets=97).collect()}
    assert scored[4]["n_feats"] == 0 and scored[4]["prob"] is None
    # training docs labeled 1 must outscore the unrelated doc 5
    assert scored[1]["prob"] > scored[5]["prob"]
    kept = sorted(
        r["doc_id"]
        for r in quality_classifier_filter(
            docs, w, min_prob=0.5, buckets=97
        ).collect()
    )
    want = sorted(
        i for i, r in scored.items()
        if r["prob"] is not None and r["prob"] >= 0.5
    )
    assert kept == want and 4 not in kept


def test_quality_classifier_training_is_deterministic(spark, docs):
    from pybabe_spark.operators.classifier import train_quality_classifier
    from pybabe_spark.plans.lint import plan_lint

    labeled = docs.withColumn("__lbl", (F.col("doc_id") % 2 == 0).cast("int"))
    a = {
        tuple(r)
        for r in train_quality_classifier(labeled, "__lbl", buckets=97).collect()
    }
    b = {
        tuple(r)
        for r in train_quality_classifier(labeled, "__lbl", buckets=97).collect()
    }
    assert a == b
    assert plan_lint(train_quality_classifier(labeled, "__lbl", buckets=97)) == []


def test_quality_classifier_oov_docs_score_neutral_not_dropped(spark, docs):
    """Review finding: scoring joined the profile to the weight table
    INNER, so docs whose features all hash to training-unseen buckets
    were conflated with featureless docs (NULL prob, dropped at any
    min_prob). OOV features must carry weight 0 — the doc scores a
    neutral ~0.5 and n_feats counts ALL its features."""
    from pybabe_spark.operators.classifier import (
        quality_classifier_filter,
        score_quality,
        train_quality_classifier,
    )

    labeled = docs.withColumn("__lbl", (F.col("doc_id") % 2 == 0).cast("int"))
    w = train_quality_classifier(labeled, "__lbl", buckets=997, iters=2, lr=1.0)
    other = spark.createDataFrame(
        [(9, "zq xv qj wk pf"), (10, "the cat zq xv")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in score_quality(other, w, buckets=997).collect()}
    assert got[9]["n_feats"] == 4 and got[9]["prob"] == 0.5  # fully OOV
    assert got[10]["n_feats"] == 3  # all features counted, not just seen
    kept = {r["doc_id"] for r in
            quality_classifier_filter(other, w, min_prob=0.0, buckets=997).collect()}
    assert kept == {9, 10}


def test_quality_classifier_null_labels_excluded_from_n(spark, docs):
    """NULL labels must drop out of BOTH gradients and N — keeping them
    in N while their residuals silently vanished from sums would skew
    every update. Training on labels-with-nulls must equal training on
    the non-null subset's labels with the same corpus profile."""
    from pybabe_spark.operators.classifier import train_quality_classifier

    with_nulls = docs.withColumn(
        "__lbl",
        F.when(F.col("doc_id") <= 3, (F.col("doc_id") % 2 == 0).cast("int")),
    )
    # same supervision, docs 4-5 explicitly labeled... nothing: compare
    # against a corpus whose unlabeled docs are REMOVED from labels but
    # whose features still shape the profile — which is exactly what
    # the NULL-filter inside training does
    a = {
        tuple(r)
        for r in train_quality_classifier(
            with_nulls, "__lbl", buckets=97, iters=2, lr=1.0
        ).collect()
    }
    from pybabe_spark.operators.dsir import doc_feature_profile

    prof = doc_feature_profile(docs, buckets=97)
    only_labeled = docs.filter(F.col("doc_id") <= 3).withColumn(
        "__lbl", (F.col("doc_id") % 2 == 0).cast("int")
    )
    b = {
        tuple(r)
        for r in train_quality_classifier(
            only_labeled, "__lbl", buckets=97, iters=2, lr=1.0, profile=prof
        ).collect()
    }
    assert a == b


def test_ngram_lm_matches_python_model(spark, docs):
    """Order-3 LM vs an exact Python replay (prefix-count contexts,
    distinct-unigram vocab, decimal-rounded log terms)."""
    import math
    from collections import Counter

    from pybabe_spark.operators.lm import ngram_perplexity, train_ngram_lm

    got = {
        r["doc_id"]: (r["n_ngrams"], r["sum_logp"])
        for r in ngram_perplexity(docs, train_ngram_lm(docs, n=3), n=3).collect()
    }

    def tri(t):
        ws = t.split(" ")
        return [((f"{a} {b}"), c) for a, b, c in zip(ws, ws[1:], ws[2:])]

    grams = Counter(g for _, t in DOCS for g in tri(t))
    ctxs = Counter()
    for (ctx, _w), c in grams.items():
        ctxs[ctx] += c
    v = len({w for _, t in DOCS for w in t.split(" ")})
    for i, t in DOCS:
        occ = tri(t)
        gn, gs = got[i]
        assert gn == len(occ)
        if not occ:
            assert gs is None
            continue
        s = sum(
            math.floor(
                math.log((grams[g] + 1) / (ctxs[g[0]] + v)) * 1e6 + 0.5
            )
            / 1e6
            for g in occ
        )
        assert gs == pytest.approx(s, abs=1e-9)


def test_ngram_lm_guards_and_short_docs(spark):
    from pybabe_spark.operators.lm import (
        ngram_occurrences,
        ngram_perplexity,
        train_ngram_lm,
    )

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="order n"):
        ngram_occurrences(df, n=1)
    rows = {
        r["doc_id"]: (r["n_ngrams"], r["ppl"])
        for r in ngram_perplexity(df, train_ngram_lm(df, n=3), n=3).collect()
    }
    assert rows[1] == (0, None)  # shorter than n: no evidence
    assert rows[2][0] == 2 and rows[2][1] is not None


def test_clip_documents_matches_python(spark):
    from pybabe_spark.operators.packing import clip_documents

    corpus = [
        (1, " ".join(f"w{i}" for i in range(10))),
        (2, "short doc"),
        (3, None),
    ]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")

    def py_clip(t, m, mode):
        ws = (t or "").split(" ")
        nw = 0 if not (t or "") else len(ws)  # empty doc has 0 words
        if len(ws) <= m:
            return (t or "", nw, False)
        if mode == "head":
            kept = ws[:m]
        elif mode == "tail":
            kept = ws[-m:]
        else:
            h = (m + 1) // 2
            kept = ws[:h] + ws[len(ws) - (m - h):]
        return (" ".join(kept), len(ws), True)

    for mode in ("head", "tail", "middle"):
        got = {
            r["doc_id"]: (r["text"], r["n_words"], r["clipped"])
            for r in clip_documents(df, 5, mode=mode).collect()
        }
        want = {i: py_clip(t, 5, mode) for i, t in corpus}
        assert got == want, mode

    with pytest.raises(ValueError, match="max_words"):
        clip_documents(df, 0)
    with pytest.raises(ValueError, match="unknown mode"):
        clip_documents(df, 5, mode="rand")


def test_curriculum_order_bands_then_shuffles(spark):
    import hashlib

    from pybabe_spark.operators.sampling import curriculum_order

    rows = [(i, float(i % 10) / 10.0) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, score double")
    got = [
        r["doc_id"]
        for r in curriculum_order(df, "score", [0.3, 0.7], "doc_id", seed=3)
        .coalesce(1)
        .collect()
    ]

    def band(s):
        return (s >= 0.3) + (s >= 0.7)

    def hkey(i):
        return hashlib.md5(f"3:{i}".encode()).hexdigest()

    want = [i for i, s in sorted(rows, key=lambda r: (-band(r[1]), hkey(r[0]), r[0]))]
    assert got == want
    # hardest-first flips the band order only
    got_hard = [
        r["doc_id"]
        for r in curriculum_order(
            df, "score", [0.3, 0.7], "doc_id", seed=3, easiest_first=False
        ).coalesce(1).collect()
    ]
    want_hard = [i for i, s in sorted(rows, key=lambda r: (band(r[1]), hkey(r[0]), r[0]))]
    assert got_hard == want_hard


def test_curriculum_order_sharded_is_range_partitioned(spark):
    from pybabe_spark.operators.sampling import curriculum_order

    rows = [(i, float(i % 10) / 10.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, score double")
    sharded = curriculum_order(
        df, "score", [0.5], "doc_id", seed=1, shards=4
    )
    plan = sharded._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    assert sharded.rdd.getNumPartitions() == 4
    # concatenating shards in order reproduces the total order
    total = [
        r["doc_id"]
        for r in curriculum_order(df, "score", [0.5], "doc_id", seed=1)
        .coalesce(1)
        .collect()
    ]
    by_shard = sharded.rdd.glom().collect()
    flat = [r["doc_id"] for part in by_shard for r in part]
    assert flat == total


def test_ngram_lm_save_load_and_filter_dispatch(spark, docs, tmp_path):
    from pybabe_spark.operators.lm import (
        load_lm,
        ngram_perplexity,
        save_lm,
        train_ngram_lm,
    )

    lm = train_ngram_lm(docs, n=3)
    save_lm(lm, str(tmp_path / "tri"))
    loaded = load_lm(spark, str(tmp_path / "tri"))
    assert loaded.n == 3
    fresh = {tuple(r) for r in ngram_perplexity(docs, lm).collect()}
    stored = {tuple(r) for r in ngram_perplexity(docs, loaded).collect()}
    assert fresh == stored
    # perplexity_filter dispatches on the model type (order carried in
    # the model — no n argument anywhere)
    scores = {r["doc_id"]: r["ppl"] for r in ngram_perplexity(docs, lm).collect()}
    cut = max(p for p in scores.values() if p is not None)
    kept = sorted(
        r["doc_id"] for r in perplexity_filter(docs, loaded, cut).collect()
    )
    assert kept == sorted(i for i, p in scores.items() if p is not None and p <= cut)


def test_ngram_perplexity_rejects_order_mismatch(spark, docs):
    """Review finding: a mismatched explicit n missed every context key
    and silently scored the uniform floor for every gram."""
    from pybabe_spark.operators.lm import ngram_perplexity, train_ngram_lm

    lm = train_ngram_lm(docs, n=3)
    with pytest.raises(ValueError, match="does not match the model's order"):
        ngram_perplexity(docs, lm, n=4)


def test_curriculum_band_nulls_band_to_zero(spark):
    """NULL scores must band to 0 on BOTH engines (the SQL mirror's
    CASE ... ELSE 0), not propagate NULL through the Spark sum."""
    from pybabe_spark.operators.sampling import curriculum_band

    df = spark.createDataFrame(
        [(1, 0.9), (2, None)], "doc_id bigint, s double"
    )
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", curriculum_band("s", [0.3, 0.7]).alias("b")
        ).collect()
    }
    assert got == {1: 2, 2: 0}


def test_classifier_save_load_roundtrip(spark, docs, tmp_path):
    """Persisted weights + pinned bucket count score identically to the
    in-session model; a corrupted params table is refused."""
    from pybabe_spark.operators.classifier import (
        load_classifier,
        save_classifier,
        score_quality,
        train_quality_classifier,
    )

    labeled = docs.withColumn("__lbl", (F.col("doc_id") % 2 == 0).cast("int"))
    w = train_quality_classifier(labeled, "__lbl", iters=1, buckets=512)
    path = str(tmp_path / "clf")
    save_classifier(w, path, buckets=512)
    w2, buckets = load_classifier(spark, path)
    assert buckets == 512
    a = {r["doc_id"]: r["prob"] for r in score_quality(labeled, w, buckets=512).collect()}
    b = {r["doc_id"]: r["prob"] for r in score_quality(labeled, w2, buckets=buckets).collect()}
    assert a == b
    # second params row (mixed bucket spaces) must refuse, not guess
    spark.createDataFrame([(1024,)], "buckets int").write.mode("append").parquet(
        path + "/params"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="params"):
        load_classifier(spark, path)


def test_dsir_target_model_save_load(spark, docs, tmp_path):
    """Stored target bucket model scores raw batches identically to the
    direct two-corpus computation, without touching target text."""
    from pybabe_spark.operators.dsir import (
        dsir_log_weights,
        load_dsir_target,
        save_dsir_target,
    )

    target = docs.filter(F.col("doc_id") % 3 == 0)
    raw = docs.filter(F.col("doc_id") % 3 != 0)
    path = str(tmp_path / "dsir_target")
    save_dsir_target(target, path, buckets=512)
    model, buckets = load_dsir_target(spark, path)
    assert buckets == 512
    direct = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw, target, buckets=512).collect()
    }
    stored = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            raw, None, buckets=buckets, target_model=model
        ).collect()
    }
    assert direct == stored


# strip_boilerplate_lines (operators/decontam.py) — corpus-frequency line dedup


def test_strip_boilerplate_lines_hand_checked(spark):
    from pybabe_spark.operators.decontam import strip_boilerplate_lines

    rows = [
        (1, "COOKIE\nalpha body\n\nFOOTER"),
        (2, "COOKIE\nbeta body\nFOOTER"),
        (3, "COOKIE\ngamma body\nunique tail"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(df, "doc_id", "text").collect()
    }
    # COOKIE (df=3) and FOOTER (df=2) are removed everywhere; the blank
    # line (under min_line_chars) is structure and survives; unique
    # body lines survive in order; NULL text rows are dropped
    assert got == {
        1: "alpha body\n",
        2: "beta body",
        3: "gamma body\nunique tail",
    }


def test_strip_boilerplate_lines_edges(spark):
    import pytest

    from pybabe_spark.operators.decontam import strip_boilerplate_lines

    # a fully-boilerplate doc survives as an empty string
    rows = [(1, "SAME"), (2, "SAME"), (3, "SAME\nown line")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(df, "doc_id", "text").collect()
    }
    assert got == {1: "", 2: "", 3: "own line"}
    # repeats WITHIN one doc don't make a line boilerplate (df counts
    # distinct docs)
    rows2 = [(1, "dup\ndup\nbody"), (2, "other")]
    df2 = spark.createDataFrame(rows2, "doc_id int, text string")
    got2 = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(df2, "doc_id", "text").collect()
    }
    assert got2 == {1: "dup\ndup\nbody", 2: "other"}
    with pytest.raises(ValueError, match="min_df"):
        strip_boilerplate_lines(df2, "doc_id", "text", min_df=1)


def test_strip_boilerplate_lines_min_line_chars(spark):
    from pybabe_spark.operators.decontam import strip_boilerplate_lines

    # raising min_line_chars protects short shared lines ("---")
    rows = [(1, "---\nbody a"), (2, "---\nbody b")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    kept = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(
            df, "doc_id", "text", min_line_chars=5
        ).collect()
    }
    assert kept == {1: "---\nbody a", 2: "---\nbody b"}
    gone = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(df, "doc_id", "text").collect()
    }
    assert gone == {1: "body a", 2: "body b"}


def test_strip_boilerplate_lines_literal_separator(spark):
    """line_sep is a LITERAL separator, not a regex — a '.' or '|'
    separator must split on that character only (r9 advisory: F.split
    treated it as a Java regex, so '.' split between every char)."""
    from pybabe_spark.operators.decontam import strip_boilerplate_lines

    rows = [(1, "ad banner.keep me one"), (2, "ad banner.keep me two")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(
            df, "doc_id", "text", line_sep="."
        ).collect()
    }
    assert out == {1: "keep me one", 2: "keep me two"}

    rows2 = [(1, "nav|alpha"), (2, "nav|beta")]
    df2 = spark.createDataFrame(rows2, "doc_id int, text string")
    out2 = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate_lines(
            df2, "doc_id", "text", line_sep="|"
        ).collect()
    }
    assert out2 == {1: "alpha", 2: "beta"}


# ---------------------------------------------------------------------------
# Zipf fit (operators/tfidf.py::zipf_fit)
# ---------------------------------------------------------------------------


def test_zipf_fit_matches_python_model(spark):
    import math
    from collections import Counter

    from pybabe_spark.operators.tfidf import zipf_fit

    # a Zipfian-ish corpus: term i appears ~N/i times
    words = []
    for i in range(1, 21):
        words += [f"w{i:02d}"] * (200 // i)
    docs = spark.createDataFrame(
        [(" ".join(words[i::5]),) for i in range(5)], "text string"
    )
    r = zipf_fit(docs, top_n=50).collect()[0]

    cnt = Counter(words)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(c) for _, c in ranked]
    n = len(xs)
    vx = n * sum(x * x for x in xs) - sum(xs) ** 2
    vy = n * sum(y * y for y in ys) - sum(ys) ** 2
    cov = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    assert r["n_terms"] == n and r["total_tokens"] == len(words)
    assert abs(r["slope"] - cov / vx) < 1e-5
    assert abs(r["r2"] - cov * cov / (vx * vy)) < 1e-5
    # a 1/i corpus is close to slope -1
    assert -1.3 < r["slope"] < -0.7


def test_zipf_fit_rank_ties_and_cut(spark):
    """Equal-count terms rank by name; top_n cuts the same way both
    engines do (count desc, term asc)."""
    from pybabe_spark.operators.tfidf import zipf_fit

    docs = spark.createDataFrame(
        [("a a a b b c c d",)], "text string"
    )
    r3 = zipf_fit(docs, top_n=3).collect()[0]
    assert r3["n_terms"] == 3          # a(3), b(2), c(2) — d cut
    assert r3["total_tokens"] == 8

    r_all = zipf_fit(docs, top_n=10).collect()[0]
    assert r_all["n_terms"] == 4


def test_zipf_fit_degenerate(spark):
    from pybabe_spark.operators.tfidf import zipf_fit

    # single distinct term: vx = 0 -> NULL fit
    docs = spark.createDataFrame([("x x x",)], "text string")
    r = zipf_fit(docs).collect()[0]
    assert r["n_terms"] == 1 and r["slope"] is None and r["r2"] is None

    # empty / NULL text
    docs = spark.createDataFrame([(None,), ("",)], "text string")
    r = zipf_fit(docs).collect()[0]
    assert r["n_terms"] == 0 and r["total_tokens"] == 0


# ---------------------------------------------------------------------------
# feature_hash_encode (operators/dsir.py)
# ---------------------------------------------------------------------------


def test_feature_hash_matches_python_model(spark):
    """Vectors equal a Python replay of the md5 bucket arithmetic."""
    import hashlib

    from pybabe_spark.operators.dsir import feature_hash_encode

    rows = [(1, "a b c a b"), (2, "x y"), (3, "solo"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: list(r["features"]) for r in
           feature_hash_encode(df, dim=8).collect()}

    def bucket(w1, w2, dim=8):
        # full hash_bucket chain (operators/sampling.py): md5 60-bit
        # prefix -> fold -> multiplicative mix -> [0, 1e6) -> % dim
        h = hashlib.md5(f"{w1} {w2}".encode()).hexdigest()
        base = int(h[:15], 16)
        folded = base % 1_000_003
        return (folded * 2_654_435_761 + 123_456_789) % 1_000_000 % dim

    exp = {i: [0] * 8 for i in (1, 2, 3, 4)}
    for doc, text in rows:
        if not text:
            continue
        ws = text.split(" ")
        for a, b in zip(ws, ws[1:]):
            exp[doc][bucket(a, b)] += 1
    assert got == exp
    # one-word and NULL docs are present as zero vectors
    assert got[3] == [0] * 8 and got[4] == [0] * 8


def test_feature_hash_shape_and_validation(spark):
    from pybabe_spark.operators.dsir import feature_hash_encode

    df = spark.createDataFrame([(i, "w1 w2 w3") for i in range(10)],
                               "doc_id int, text string")
    out = feature_hash_encode(df, dim=16)
    rows = out.collect()
    assert len(rows) == 10
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(sum(r["features"]) == 2 for r in rows)  # 2 bigrams each

    import pytest

    with pytest.raises(ValueError):
        feature_hash_encode(df, dim=1)
