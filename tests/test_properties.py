"""Property-based tests (hypothesis): random inputs against pandas models
for the order-sensitive operators. The reference has no property testing
(SURVEY §5); these pin the semantics the golden tests can't sweep —
duplicates, empty groups, negative values, odd strings.

Examples are kept few (Spark jobs are ~1 s each); determinism comes from
hypothesis's own example database being disabled and derandomized runs.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pybabe_spark.operators import dedup, max_n, sort
from pybabe_spark.sources.io import with_ingest_id

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

keys = st.sampled_from(["a", "b", "c"])
vals = st.integers(min_value=-1000, max_value=1000)
rows = st.lists(st.tuples(keys, vals), min_size=1, max_size=40)


@given(data=rows)
@settings(**SETTINGS)
def test_dedup_keep_first_matches_pandas(spark, data):
    pdf = pd.DataFrame(data, columns=["k", "v"])
    expected = sorted(
        map(tuple, pdf.drop_duplicates(subset=["k"], keep="first")[["k", "v"]].values)
    )
    df = with_ingest_id(
        spark.createDataFrame(pdf.astype({"v": "int64"})).coalesce(1)
    )
    got = sorted(
        (r["k"], r["v"]) for r in dedup(df, ["k"], keep_first=True).collect()
    )
    assert got == expected


@given(data=rows)
@settings(**SETTINGS)
def test_sort_matches_python_sorted(spark, data):
    pdf = pd.DataFrame(data, columns=["k", "v"])
    df = spark.createDataFrame(pdf.astype({"v": "int64"}))
    got = [r["v"] for r in sort(df, "v").collect()]
    assert got == sorted(v for _, v in data)


@given(data=rows, n=st.integers(min_value=1, max_value=5))
@settings(**SETTINGS)
def test_max_n_is_top_n_multiset(spark, data, n):
    pdf = pd.DataFrame(data, columns=["k", "v"])
    df = spark.createDataFrame(pdf.astype({"v": "int64"}))
    got = sorted(r["v"] for r in max_n(df, "v", n).collect())
    expected = sorted(sorted((v for _, v in data), reverse=True)[:n])
    assert got == expected


@given(data=rows)
@settings(**SETTINGS)
def test_group_sum_matches_pandas(spark, data):
    from pybabe_spark.operators import group

    pdf = pd.DataFrame(data, columns=["k", "v"])
    expected = pdf.groupby("k")["v"].sum().to_dict()
    df = spark.createDataFrame(pdf.astype({"v": "int64"}))
    got = {
        r["k"]: r["total"]
        for r in group(df, "k", {"total": ("sum", "v")}).collect()
    }
    assert got == expected


ids = st.lists(st.integers(min_value=-(10**12), max_value=10**12),
               min_size=1, max_size=30, unique=True)


def py_bucket(k):
    from pybabe_spark.operators.sampling import BUCKETS
    base = -1 if k is None else k
    return ((base % 1_000_003) * 2_654_435_761 + 123_456_789) % BUCKETS


@given(data=ids, frac=st.sampled_from([0.0, 0.1, 0.5, 1.0]))
@settings(**SETTINGS)
def test_hash_sample_matches_python_model(spark, data, frac):
    """The Spark bucket arithmetic must equal the pure-Python model for
    any int64 key — negative ids included (Python % is already a
    positive modulus, matching Spark pmod)."""
    from pybabe_spark.operators.sampling import BUCKETS, hash_sample

    expect = {k for k in data if py_bucket(k) < int(round(frac * BUCKETS))}
    df = spark.createDataFrame([(k,) for k in data], "k bigint")
    got = {r["k"] for r in hash_sample(df, "k", frac).collect()}
    assert got == expect


@given(data=ids, frac=st.sampled_from([0.1, 0.5]))
@settings(**SETTINGS)
def test_hash_bucket_sql_matches_spark_negative_ids(spark, data, frac):
    """DuckDB oracle arithmetic == Spark arithmetic for negative ids and
    NULL keys (the advisory's sign-of-dividend divergence)."""
    import duckdb
    import pandas as pd
    from pybabe_spark.operators.sampling import (
        BUCKETS, hash_bucket, hash_bucket_sql)

    rows = [(k,) for k in data] + [(None,)]
    df = spark.createDataFrame(rows, "k bigint")
    got = {r["k"]: r["b"]
           for r in df.select("k", hash_bucket("k").alias("b")).collect()}
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": pd.array([r[0] for r in rows],
                                                  dtype="Int64")}))
    oracle = {r[0]: r[1] for r in con.execute(
        f"SELECT k, {hash_bucket_sql('k')} AS b FROM t").fetchall()}
    assert got == oracle
    assert got[None] == py_bucket(None)


def test_hash_sample_string_key_and_type_guard(spark):
    """String keys take the md5 path (Spark == DuckDB, non-empty
    selection); float keys raise instead of silently dropping rows."""
    import duckdb
    import pandas as pd
    import pytest
    from pybabe_spark.operators.sampling import (
        hash_bucket_sql, hash_sample)

    words = [f"doc-{i}" for i in range(200)] + [None]
    df = spark.createDataFrame([(w,) for w in words], "k string")
    got = sorted(r["k"] or "" for r in hash_sample(df, "k", 0.3).collect())
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": words}))
    oracle = sorted(r[0] or "" for r in con.execute(
        f"SELECT k FROM t WHERE {hash_bucket_sql('k', 'string')} < 300000"
    ).fetchall())
    assert got == oracle and 0 < len(got) < len(words)

    fdf = spark.createDataFrame([(1.5,)], "k double")
    with pytest.raises(TypeError, match="no cross-engine stable hash"):
        hash_sample(fdf, "k", 0.5)


@given(data=st.lists(st.tuples(st.integers(0, 9), vals), min_size=1,
                     max_size=30))
@settings(**SETTINGS)
@pytest.mark.deep
def test_upsert_idempotent_and_complete(spark, data):
    """upsert(upsert(b, u), u) == upsert(b, u); result keys = base ∪
    update keys; update rows always win."""
    from pybabe_spark.operators.merge import upsert

    base = spark.createDataFrame([(k, v) for k, v in data], "k bigint, v bigint")
    updates = spark.createDataFrame(
        [(k, v + 10_000) for k, v in data[: len(data) // 2 + 1]],
        "k bigint, v bigint",
    ).dropDuplicates(["k"])
    once = upsert(base.dropDuplicates(["k"]), updates, "k")
    twice = upsert(once, updates, "k")
    o = {r["k"]: r["v"] for r in once.collect()}
    t = {r["k"]: r["v"] for r in twice.collect()}
    assert o == t
    for r in updates.collect():
        assert o[r["k"]] == r["v"]


@given(edges=st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=25))
@settings(**SETTINGS)
@pytest.mark.deep
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation == classic union-find on any
    random small graph (self-loops excluded by construction)."""
    from pybabe_spark.operators.graph import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want = {n: find(n) for n in nodes}

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r["id"]: r["component"]
           for r in connected_components(df, max_iters=40).collect()}
    assert got == want


token_rows = st.lists(
    st.integers(min_value=1, max_value=900), min_size=1, max_size=30
)


@given(tokens=token_rows, budget=st.sampled_from([64, 256, 777]))
@settings(**SETTINGS)
@pytest.mark.deep
def test_pack_tokens_matches_sequential_model(spark, tokens, budget):
    """Distributed next-fit == the obvious sequential model, for any
    token mix and budget (oversized docs included)."""
    from pybabe_spark.operators.packing import pack_tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "doc_id long, n_tokens long"
    )
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_tokens(df, budget=budget, n_buckets=1).collect()
    }
    acc, pack, want = 0, -1, {}
    for i, t in enumerate(tokens):
        if pack < 0 or acc + t > budget:
            pack, acc = pack + 1, t
        else:
            acc += t
        want[i] = pack
    assert got == want


@given(
    n_words=st.integers(min_value=0, max_value=60),
    chunk=st.sampled_from([5, 10, 17]),
    overlap=st.sampled_from([0, 2, 4]),
)
@settings(**SETTINGS)
def test_chunk_documents_matches_python_model(spark, n_words, chunk, overlap):
    from pybabe_spark.operators.packing import chunk_documents

    words = [f"w{i}" for i in range(n_words)]
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["chunk_index"]: r["chunk_text"]
        for r in chunk_documents(df, chunk_words=chunk, overlap=overlap).collect()
    }
    stride = chunk - overlap
    base = text.split(" ")  # '' -> [''] like Spark's split
    want = {
        i: " ".join(base[s:s + chunk])
        for i, s in enumerate(range(0, max(len(base) - overlap, 1), stride))
    }
    assert got == want


csv_text = st.text(
    alphabet=st.sampled_from(list("abc ,\"'\n;|")), min_size=0, max_size=12
)
csv_rows = st.lists(st.tuples(vals, csv_text), min_size=1, max_size=10)


@given(data=csv_rows)
@settings(**SETTINGS)
def test_csv_push_pull_roundtrip(spark, data, tmp_path_factory):
    """push(csv) → pull(csv) is identity for any cell content —
    commas, quotes, embedded newlines, semicolons."""
    import pandas as pd

    from pybabe_spark.sources.io import pull, push

    out = str(tmp_path_factory.mktemp("csvrt") / "t.csv")
    pdf = pd.DataFrame(data, columns=["k", "s"]).astype({"k": "int64"})
    df = spark.createDataFrame(pdf)
    push(df, out)
    back = pull(spark, out, multiline=True)
    got = sorted((r["k"], r["s"] if r["s"] is not None else "")
                 for r in back.select("k", "s").collect())
    # a written empty string reads back as null (csv cannot distinguish);
    # the comparison folds both to "" — everything else must be exact
    want = sorted((k, s) for k, s in data)
    assert got == want


words5 = st.lists(
    st.sampled_from([f"w{i}" for i in range(8)]), min_size=1, max_size=6
)


@given(
    new_docs=st.lists(words5, min_size=1, max_size=8),
    seen_docs=st.lists(words5, min_size=1, max_size=8),
    threshold=st.sampled_from([0.4, 0.6, 0.8]),
)
@settings(**SETTINGS)
@pytest.mark.deep
def test_near_dedup_against_matches_python_model(
    spark, new_docs, seen_docs, threshold
):
    """Survivors = new docs whose word-set Jaccard with EVERY seen doc is
    below the threshold (plain-Python set model)."""
    from pybabe_spark.operators.dedup_scale import near_dedup_against

    new = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(new_docs)],
        "doc_id bigint, text string",
    )
    seen = spark.createDataFrame(
        [(1000 + i, " ".join(ws)) for i, ws in enumerate(seen_docs)],
        "doc_id bigint, text string",
    )
    want = {
        i
        for i, ws in enumerate(new_docs)
        if all(
            len(set(ws) & set(sw)) / len(set(ws) | set(sw)) < threshold
            for sw in seen_docs
        )
    }
    got = {
        r["doc_id"]
        for r in near_dedup_against(
            new, seen, "doc_id", "text", threshold=threshold
        ).collect()
    }
    assert got == want


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**6),
        min_size=1, max_size=15, unique=True,
    ),
    seed=st.sampled_from([0, 7, 42]),
)
@settings(**SETTINGS)
def test_global_shuffle_matches_python_model(spark, ids, seed):
    """Output order = ids sorted by md5(f'{seed}:{id}') — the pure-Python
    replay of the permutation contract."""
    import hashlib

    from pybabe_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = [r["doc_id"] for r in global_shuffle(df, "doc_id", seed).collect()]
    want = sorted(
        ids, key=lambda d: hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
    )
    assert got == want


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-8, max_value=8,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=12,
    ),
)
@settings(**SETTINGS)
def test_pq_encode_matches_python_model(spark, vecs):
    """codes == the brute-force Python PQ model: per subspace, first
    index of the minimum left-to-right-summed squared distance against
    the seeded (lowest-id) codebooks."""
    from pybabe_spark.operators.similarity import pq_encode

    m, ks = 2, min(3, len(vecs))
    sub = 2
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(df, m=m, ks=ks).collect()
    }

    import struct as _struct

    def f32(x):  # the float32 value Spark stores
        return _struct.unpack("f", _struct.pack("f", x))[0]

    seeds = [vecs[i] for i in range(ks)]
    for i, v in enumerate(vecs):
        want = []
        for j in range(m):
            dists = []
            for c in range(ks):
                d = 0.0
                for t in range(sub):
                    diff = f32(v[j * sub + t]) - f32(seeds[c][j * sub + t])
                    d = d + diff * diff
                dists.append(d)
            want.append(min(range(ks), key=lambda c: (dists[c], c)))
        assert got[i] == want, (i, got[i], want)


# ---------------------------------------------------------------------------
# Bigram-LM perplexity & duplicated-span removal vs pure-Python models
# ---------------------------------------------------------------------------

words_st = st.sampled_from(["a", "b", "c", "d", "ee", "ff"])
docs_st = st.lists(
    st.lists(words_st, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(texts=docs_st)
@settings(**SETTINGS)
@pytest.mark.deep
def test_perplexity_property_matches_python(spark, texts):
    import math
    from collections import Counter

    from pybabe_spark.operators.lm import perplexity, train_bigram_lm

    corpus = list(enumerate(texts))
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logp"])
        for r in perplexity(df, train_bigram_lm(df)).collect()
    }

    def bigrams(t):
        ws = t.split(" ")
        return list(zip(ws, ws[1:]))

    uni = Counter(w for _, t in corpus for w in t.split(" "))
    bi = Counter(p for _, t in corpus for p in bigrams(t))
    v = len(uni)
    for i, t in corpus:
        bgs = bigrams(t)
        gn, gs = got[i]
        assert gn == len(bgs)
        if not bgs:
            assert gs is None
            continue
        s = sum(
            math.floor(math.log((bi[p] + 1) / (uni[p[0]] + v)) * 1e6 + 0.5) / 1e6
            for p in bgs
        )
        assert gs == pytest.approx(s, abs=1e-9)


@given(texts=docs_st, n=st.sampled_from([2, 3]))
@settings(**SETTINGS)
def test_strip_duplicated_spans_property(spark, texts, n):
    from collections import Counter

    from pybabe_spark.operators.decontam import strip_duplicated_spans

    corpus = list(enumerate(texts))
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_words"], r["n_removed"])
        for r in strip_duplicated_spans(df, n=n).collect()
    }

    grams = Counter(
        tuple(t.split(" ")[i : i + n])
        for _, t in corpus
        for i in range(len(t.split(" ")) - n + 1)
    )
    for i, t in corpus:
        ws = t.split(" ")
        covered = set()
        for j in range(len(ws) - n + 1):
            if grams[tuple(ws[j : j + n])] >= 2:
                covered.update(range(j, j + n))
        kept = [w for j, w in enumerate(ws) if j not in covered]
        assert got[i] == (" ".join(kept), len(ws), len(covered))


@given(
    texts=st.lists(
        st.lists(words_st, min_size=0, max_size=15).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    m=st.sampled_from([1, 3, 7]),
    mode=st.sampled_from(["head", "tail", "middle"]),
)
@settings(**SETTINGS)
def test_clip_documents_property(spark, texts, m, mode):
    from pybabe_spark.operators.packing import clip_documents

    corpus = list(enumerate(texts))
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_words"], r["clipped"])
        for r in clip_documents(df, m, mode=mode).collect()
    }
    for i, t in corpus:
        ws = t.split(" ")
        nw = 0 if t == "" else len(ws)
        if len(ws) <= m:
            assert got[i] == (t, nw, False)
        else:
            if mode == "head":
                kept = ws[:m]
            elif mode == "tail":
                kept = ws[-m:]
            else:
                h = (m + 1) // 2
                kept = ws[:h] + ws[len(ws) - (m - h):]
            assert got[i] == (" ".join(kept), nw, True)
        # the clip never exceeds the budget
        out_ws = got[i][0].split(" ") if got[i][0] else []
        assert len(out_ws) <= max(m, 1)


def test_stratified_fixed_n_exact_counts_and_determinism(spark):
    from pybabe_spark.operators.sampling import stratified_fixed_n

    rows = [(f"s{i % 3}", i) for i in range(100)] + [("tiny", 999)]
    df = spark.createDataFrame(rows, "g string, k bigint")
    out1 = stratified_fixed_n(df, "g", "k", 10)
    counts = {r["g"]: r["n"] for r in out1.groupBy("g").count().withColumnRenamed("count", "n").collect()}
    # full strata give exactly n; the 1-row stratum gives all it has
    assert counts == {"s0": 10, "s1": 10, "s2": 10, "tiny": 1}
    # deterministic: same seed → same set; different seed → (almost surely) different
    s1 = {(r["g"], r["k"]) for r in out1.collect()}
    s2 = {(r["g"], r["k"]) for r in stratified_fixed_n(df, "g", "k", 10).collect()}
    s3 = {(r["g"], r["k"]) for r in stratified_fixed_n(df, "g", "k", 10, seed=7).collect()}
    assert s1 == s2 and s1 != s3


def test_winsorize_bounds_and_passthrough(spark):
    from pybabe_spark.operators.sampling import winsorize

    vals = [float(v) for v in range(1, 101)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["v"]: r["v_w"] for r in winsorize(df, "v", 0.05, 0.95).collect()}
    import numpy as np

    lo = round(float(np.percentile(vals, 5)), 6)
    hi = round(float(np.percentile(vals, 95)), 6)
    for v in vals:
        assert out[v] == min(max(v, lo), hi)
    # interior values pass through untouched (same double)
    assert out[50.0] == 50.0


def test_weighted_sample_bias_and_determinism(spark):
    from pybabe_spark.operators.sampling import weighted_sample

    # 100 heavy (w=100) + 900 light (w=1): a 100-row sample should be
    # dominated by heavy ids; zero/null weights never appear
    rows = [(i, 100.0) for i in range(100)]
    rows += [(i, 1.0) for i in range(100, 1000)]
    rows += [(5000, 0.0), (5001, None)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    out1 = {r["id"] for r in weighted_sample(df, "w", 100, "id").collect()}
    assert len(out1) == 100
    assert not {5000, 5001} & out1
    heavy = len([i for i in out1 if i < 100])
    assert heavy >= 60  # expectation ~91; 60 is a generous floor
    out2 = {r["id"] for r in weighted_sample(df, "w", 100, "id").collect()}
    out3 = {r["id"] for r in weighted_sample(df, "w", 100, "id", seed=9).collect()}
    assert out1 == out2 and out1 != out3


def test_quantile_bins_equal_frequency_and_nulls(spark):
    from pybabe_spark.operators.sampling import quantile_bins

    vals = [float(v) for v in range(100)]
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)], "v double")
    out = quantile_bins(df, "v", 4).collect()
    bins = {}
    for r in out:
        bins.setdefault(r["v_bin"], []).append(r["v"])
    assert sorted(b for b in bins if b is not None) == [0, 1, 2, 3]
    assert bins[None] == [None]
    # quartiles of 0..99: ~25 values per bin (edge ties go low)
    for b in range(4):
        assert 24 <= len(bins[b]) <= 26
    # monotone: every bin-b value < every bin-(b+1) value
    for b in range(3):
        assert max(bins[b]) < min(bins[b + 1])


def test_table_diff_matches_python_model_randomized(spark):
    """Randomized keyed diff vs a dict-based reference model."""
    import random

    from pybabe_spark.operators.merge import table_diff

    rng = random.Random(11)
    a_rows = {k: (rng.choice("xyz"), rng.randint(0, 3)) for k in range(60)
              if rng.random() < 0.8}
    b_rows = {}
    for k in range(60):
        if rng.random() < 0.8:
            if k in a_rows and rng.random() < 0.5:
                b_rows[k] = a_rows[k]          # unchanged
            else:
                b_rows[k] = (rng.choice("xyz"), rng.randint(0, 3))
    a = spark.createDataFrame(
        [(k, s, v) for k, (s, v) in a_rows.items()], "k int, s string, v int"
    )
    b = spark.createDataFrame(
        [(k, s, v) for k, (s, v) in b_rows.items()], "k int, s string, v int"
    )
    got = {
        r["k"]: (r["change"], r["changed_cols"])
        for r in table_diff(a, b, "k").collect()
    }
    want = {}
    for k in set(a_rows) | set(b_rows):
        if k not in a_rows:
            want[k] = ("added", "")
        elif k not in b_rows:
            want[k] = ("removed", "")
        elif a_rows[k] != b_rows[k]:
            cols = [c for c, (x, y) in zip("sv", zip(a_rows[k], b_rows[k]))
                    if x != y]
            want[k] = ("changed", ",".join(cols))
    assert got == want


def test_sequence_count_matches_python_model_randomized(spark):
    """Randomized event streams vs a greedy non-overlap counter."""
    import random

    from pybabe_spark.operators.group import sequence_count

    rng = random.Random(23)
    steps = ["view", "click", "purchase"]
    rows, model = [], {}
    for u in range(30):
        seq = [rng.choice(steps + ["error", "signup"]) for _ in
               range(rng.randint(0, 25))]
        rows += [(u, i, e) for i, e in enumerate(seq)]
        filtered = [e for e in seq if e in steps]
        # greedy leftmost non-overlapping count of the exact sequence
        s = "".join("ABC"[steps.index(e)] for e in filtered)
        model[u] = s.count("ABC")
    df = spark.createDataFrame(
        rows, "user_id int, sec int, event_type string"
    ).selectExpr("user_id", "timestamp_seconds(sec) as ts", "event_type")
    got = {
        r["user_id"]: r["n_matches"]
        for r in sequence_count(df, steps).collect()
    }
    want = {u: n for u, n in model.items() if n > 0}
    assert got == want


# -- r10 stats ops vs exact python models -----------------------------------------

_pair_labels = st.sampled_from(["x", "y", "z"])
_label_pairs = st.lists(
    st.tuples(_pair_labels, _pair_labels), min_size=1, max_size=40
)


@given(data=_label_pairs)
@settings(**SETTINGS)
def test_cohens_kappa_matches_model(spark, data):
    from collections import Counter

    from pybabe_spark.operators.sketch import cohens_kappa

    df = spark.createDataFrame(data, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    n = len(data)
    agree = sum(1 for a, b in data if a == b)
    ra = Counter(a for a, _ in data)
    cb = Counter(b for _, b in data)
    pe = sum(ra[v] * cb.get(v, 0) for v in ra)
    assert (r["n"], r["agree"]) == (n, agree)
    if n * n - pe > 0:
        expect = round((n * agree - pe) / (n * n - pe), 6)
        assert abs(r["kappa"] - expect) <= 1e-6
    else:
        assert r["kappa"] is None


@given(data=_label_pairs)
@settings(**SETTINGS)
def test_classification_report_matches_model(spark, data):
    from collections import Counter

    from pybabe_spark.operators.classifier import classification_report

    df = spark.createDataFrame(data, "g string, p string")
    got = {
        r["label"]: (r["tp"], r["fp"], r["fn"], r["support"])
        for r in classification_report(df, "g", "p").collect()
    }
    cells = Counter(data)
    labels = {g for g, _ in data} | {p for _, p in data}
    for lab in labels:
        tp = cells[(lab, lab)]
        fp = sum(c for (g, p), c in cells.items() if p == lab) - tp
        fn = sum(c for (g, p), c in cells.items() if g == lab) - tp
        assert got[lab] == (tp, fp, fn, tp + fn), lab
    assert set(got) == labels


_ks_vals = st.floats(
    min_value=-50, max_value=50, allow_nan=False, allow_infinity=False
).map(lambda x: round(x, 1))
_ks_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), _ks_vals),
    min_size=2, max_size=50,
)


@given(data=_ks_rows)
@settings(**SETTINGS)
@pytest.mark.deep
def test_ks_dnum_matches_model(spark, data):
    from pybabe_spark.operators.sketch import ks_test

    df = spark.createDataFrame(data, "g string, v double")
    r = ks_test(df, "g", "v", "a", "b").collect()[0]
    xs = [v for g, v in data if g == "a"]
    ys = [v for g, v in data if g == "b"]
    best = 0
    for t in sorted(set(xs) | set(ys)):
        ca = sum(1 for x in xs if x <= t)
        cb = sum(1 for y in ys if y <= t)
        best = max(best, abs(ca * len(ys) - cb * len(xs)))
    assert (r["n_a"], r["n_b"], r["d_num"]) == (len(xs), len(ys), best)


# -- round 11: readability / roc_auc / stickiness vs python models ------------


_texts = st.lists(
    st.text(
        alphabet="ab e.!xyz ",
        min_size=0,
        max_size=30,
    ),
    min_size=1,
    max_size=8,
)


@given(texts=_texts)
@settings(**SETTINGS)
@pytest.mark.deep
def test_readability_matches_model_random(spark, texts):
    import re as _re

    from pybabe_spark.functions.text import readability

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r["id"]: r
        for r in df.select("id", readability("text").alias("r"))
        .select("id", "r.*").collect()
    }
    for i, t in enumerate(texts):
        w = len(t.split(" "))
        s = max(len(_re.findall(r"[.!?]+", t)), 1)
        y = max(len(_re.findall(r"[aeiouy]+", t.lower())), w)
        den = s * w
        ease = (206835000 * s * w - 1015000 * w * w
                - 84600000 * y * s) // den
        grade = (390000 * w * w + 11800000 * y * s
                 - 15590000 * s * w) // den
        r = got[i]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            w, s, y), t
        assert (r["reading_ease_ppm"], r["fk_grade_ppm"]) == (ease, grade), t


_scored = st.lists(
    st.tuples(
        st.sampled_from([0.1, 0.25, 0.25, 0.5, 0.75, 0.9]),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=2,
    max_size=60,
)


@given(data=_scored)
@settings(**SETTINGS)
@pytest.mark.deep
def test_roc_auc_matches_rank_model_random(spark, data):
    from collections import Counter

    from pybabe_spark.operators.classifier import roc_auc

    df = spark.createDataFrame(data, "score double, label int")
    r = roc_auc(df, "score", "label").collect()[0]
    n1 = sum(l for _, l in data)
    n0 = len(data) - n1
    assert (r["n_pos"], r["n_neg"]) == (n1, n0)
    if n1 == 0 or n0 == 0:
        assert r["auc_ppm"] is None
        return
    cnt = Counter(s for s, _ in data)
    pos = Counter(s for s, l in data if l)
    cum, s2 = 0, 0
    for s in sorted(cnt):
        s2 += pos[s] * (2 * cum + cnt[s] + 1)
        cum += cnt[s]
    assert r["auc_ppm"] == (1_000_000 * (s2 - n1 * (n1 + 1))) // (
        2 * n1 * n0)


_activity = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2", "u3"]),
        st.integers(min_value=0, max_value=12),  # day offsets
    ),
    min_size=1,
    max_size=25,
)


@given(data=_activity)
@settings(**SETTINGS)
@pytest.mark.deep
def test_stickiness_matches_set_model_random(spark, data):
    import datetime as dt

    from pybabe_spark.operators.timeseries import stickiness

    base = dt.datetime(2024, 1, 1)
    rows = [(u, base + dt.timedelta(days=d)) for u, d in data]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    d0 = int(base.timestamp() * 1_000_000) // 86_400_000_000
    days = {d0 + d for _, d in data}
    active = {(u, d0 + d) for u, d in data}

    got = {r["day"]: r for r in
           stickiness(df, "user_id", "ts", 7, 28).collect()}
    assert set(got) == days
    for day in days:
        dau = len({u for u, d in active if d == day})
        wau = len({u for u, d in active if day - 6 <= d <= day})
        mau = len({u for u, d in active if day - 27 <= d <= day})
        r = got[day]
        assert (r["dau"], r["wau"], r["mau"]) == (dau, wau, mau), day
        assert r["stickiness_ppm"] == dau * 1_000_000 // wau


@given(data=rows, mult=st.sampled_from([2, 3, 7]))
@settings(**SETTINGS)
@pytest.mark.deep
def test_spearman_invariant_under_positive_scaling(spark, data, mult):
    """ρ depends only on ranks: scaling x by a positive integer
    preserves order AND tie structure (integer cents stay exact), so
    rho must be bit-identical."""
    from pybabe_spark.operators.sketch import spearman_corr

    df = spark.createDataFrame(
        [(k, float(v), float((v * 31) % 17)) for k, v in data],
        "g string, x double, y double",
    )
    base = {r["g"]: r["rho"] for r in
            spearman_corr(df, "x", "y", by="g").collect()}
    scaled = {r["g"]: r["rho"] for r in spearman_corr(
        df.withColumn("x", F.col("x") * mult), "x", "y", by="g"
    ).collect()}
    assert base == scaled


@given(data=rows, shift=st.integers(min_value=-50, max_value=50))
@settings(**SETTINGS)
@pytest.mark.deep
def test_kruskal_invariant_under_constant_shift(spark, data, shift):
    """H is rank-based: adding a constant to every value changes no
    rank, so H and its tie correction are bit-identical."""
    from pybabe_spark.operators.sketch import kruskal_wallis

    df = spark.createDataFrame(
        [(k, float(v)) for k, v in data], "g string, v double"
    )
    a = kruskal_wallis(df, "g", "v").collect()[0]
    b = kruskal_wallis(
        df.withColumn("v", F.col("v") + shift), "g", "v"
    ).collect()[0]
    assert a == b


@given(data=rows)
@settings(**SETTINGS)
@pytest.mark.deep
def test_friedman_invariant_under_per_block_shift(spark, data):
    """The whole point of blocking: adding a DIFFERENT constant to
    each block changes no within-block rank, so χ² is bit-identical.
    Blocks are synthesized so every block has one value per
    treatment (complete by construction)."""
    from pybabe_spark.operators.sketch import friedman_test

    treatments = ["t1", "t2", "t3"]
    rows_in = []
    for b in range(max(2, len(data) // 3)):
        for j, t in enumerate(treatments):
            v = data[(b * 3 + j) % len(data)][1]
            rows_in.append((b, t, float(v)))
    df = spark.createDataFrame(rows_in, "b int, t string, v double")
    a = friedman_test(df, "b", "t", "v").collect()[0]
    shifted = df.withColumn("v", F.col("v") + F.col("b") * 1000)
    b_ = friedman_test(shifted, "b", "t", "v").collect()[0]
    assert a == b_


@given(data=rows, mult=st.sampled_from([2, 5]))
@settings(**SETTINGS)
def test_kendall_invariant_under_monotone_int_scaling(spark, data, mult):
    """τ-b counts concordances: any strictly increasing transform of
    either margin that preserves the tie structure (positive integer
    scaling of integral values) leaves C, D, and τ unchanged."""
    from pybabe_spark.operators.sketch import kendall_tau_b

    df = spark.createDataFrame(
        [(float(v), float((v * 13) % 23)) for _, v in data],
        "x double, y double",
    )
    a = kendall_tau_b(df, "x", "y").collect()[0]
    b = kendall_tau_b(
        df.withColumn("y", F.col("y") * mult), "x", "y"
    ).collect()[0]
    assert a == b


@given(data=rows)
@settings(**SETTINGS)
def test_lorenz_shares_monotone_and_complete(spark, data):
    """Lorenz invariants: cumulative shares are non-decreasing in the
    bucket index, the last bucket closes at exactly 10⁶ of both
    population and value (when total > 0), and cum_n ends at n."""
    from pybabe_spark.operators.skew import lorenz_curve

    df = spark.createDataFrame(
        [(k, float(abs(v))) for k, v in data], "g string, v double"
    )
    rows_out = lorenz_curve(df, "g", "v", n_buckets=4).collect()
    by_key = {}
    for r in rows_out:
        by_key.setdefault(r["g"], []).append(r)
    for g, rs in by_key.items():
        rs.sort(key=lambda r: r["bucket"])
        pops = [r["cum_pop_share_ppm"] for r in rs]
        assert pops == sorted(pops)
        vals = [r["cum_value_share_ppm"] for r in rs]
        if all(v is not None for v in vals):
            assert vals == sorted(vals)
            assert vals[-1] == 1_000_000
        assert pops[-1] == 1_000_000
