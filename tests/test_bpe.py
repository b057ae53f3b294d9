"""Corpus-trained BPE (operators/bpe.py): merge selection, encode
inference, seam integration, persistence — all checked against an
INDEPENDENT naive reference implementation written here (different
code path: list-of-symbols vocab, full recount per merge)."""

import random

import pytest

from pyspark.sql import functions as F

from pybabe_spark.functions.text import token_count
from pybabe_spark.operators.bpe import (
    TrainedBPETokenizer,
    load_bpe,
    save_bpe,
    train_bpe,
    word_frequencies,
)


def _ref_train(word_freqs: dict, num_merges: int, min_pair_count: int = 2):
    """Reference BPE trainer (Sennrich-style, naive)."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best_pair = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best_pair[1] < min_pair_count:
            break
        (a, b) = best_pair[0]
        merges.append((a, b))
        nv = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    return merges


def _ref_encode(word: str, merges: list) -> list:
    """Reference encode: apply merges strictly in rank order."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_train_bpe_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "ab ab ab ac")], "doc_id int, text string"
    )
    tok = train_bpe(df, num_merges=10)
    # (a,b) count 3 wins; then no pair reaches min_pair_count=2
    assert tok.merges == [("a", "b")]
    assert tok.encode("abc ab ac") == ["ab", "c", "ab", "a", "c"]
    assert tok.encode("") == []


def test_train_bpe_matches_reference(spark):
    rows = [
        (1, "low low low low low lower lower"),
        (2, "newest newest newest newest newest newest"),
        (3, "widest widest widest"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    wf = {
        r["word"]: r["c"] for r in word_frequencies(df).collect()
    }
    ref_merges = _ref_train(wf, 12)
    tok = train_bpe(df, num_merges=12)
    assert tok.merges == ref_merges
    # encode must agree with strict rank-order application: the
    # lowest-rank-first inference loop is equivalent because later
    # merges can only involve symbols earlier merges produced
    rng = random.Random(7)
    words = ["low", "lower", "newest", "widest", "lowest", "wild", "news"]
    for _ in range(50):
        w = "".join(rng.choice("abdeilnorstw") for _ in range(rng.randint(0, 9)))
        words.append(w)
    for w in words:
        assert list(tok._encode_word_raw(w)) == _ref_encode(w, tok.merges), w


def test_bpe_through_seam_and_pack(spark):
    from pybabe_spark.operators.packing import clip_documents, pack_tokens

    df = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest low"), (3, None)],
        "doc_id int, text string",
    )
    tok = train_bpe(df, num_merges=6)
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", token_count("text", tok).alias("n")
        ).collect()
    }
    expect = {
        1: len(tok.encode("low low lower")),
        2: len(tok.encode("newest low")),
        3: 0,
    }
    assert got == expect
    packs = pack_tokens(
        df, budget=4, text_col="text", tokenizer=tok, n_buckets=1
    ).collect()
    assert {r["doc_id"] for r in packs} == {1, 2, 3}
    # no decode -> clip takes the word-boundary fallback, never splits
    clipped = clip_documents(df, 2, "head", tokenizer=tok).collect()
    for r in clipped:
        for w in (r["text"] or "").split(" "):
            assert w in ("", "low", "lower", "newest")


def test_bpe_save_load_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "low low low lower lower newest newest")],
        "doc_id int, text string",
    )
    tok = train_bpe(df, num_merges=8)
    assert tok.merges, "expected at least one merge"
    path = str(tmp_path / "bpe_model")
    save_bpe(tok, spark, path)
    tok2 = load_bpe(spark, path)
    assert tok2.merges == tok.merges
    assert tok2.encode("lowest newest") == tok.encode("lowest newest")


def test_bpe_incremental_frequency_merge(spark):
    """merge_word_frequencies(a, b) must equal word_frequencies over the
    concatenated corpora — so incremental retrains are exact."""
    from pybabe_spark.operators.bpe import (
        merge_word_frequencies,
        train_bpe_from_frequencies,
    )

    d1 = spark.createDataFrame(
        [(1, "low low lower")], "doc_id int, text string"
    )
    d2 = spark.createDataFrame(
        [(2, "low newest newest")], "doc_id int, text string"
    )
    both = d1.unionByName(d2)
    merged = merge_word_frequencies(word_frequencies(d1), word_frequencies(d2))
    a = {(r["word"], r["c"]) for r in merged.collect()}
    b = {(r["word"], r["c"]) for r in word_frequencies(both).collect()}
    assert a == b
    tok_inc = train_bpe_from_frequencies(merged, num_merges=6)
    tok_full = train_bpe(both, num_merges=6)
    assert tok_inc.merges == tok_full.merges


def test_bpe_concat_invariant():
    """BPE merges only concatenate adjacent symbols, so for ANY merge
    list and ANY text: ''.join(encode(text)) == text without spaces, and
    token counts are bracketed by [#nonempty words, #non-space chars]."""
    rng = random.Random(3)
    merges = [("a", "b"), ("ab", "c"), ("b", "a"), ("c", "ba")]
    tok = TrainedBPETokenizer(merges)
    alphabet = "abc "
    for _ in range(300):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        toks = tok.encode(text)
        assert "".join(toks) == text.replace(" ", ""), text
        n_words = len([w for w in text.split(" ") if w])
        assert n_words <= len(toks) <= len(text.replace(" ", "")), text


def test_bpe_pickles_into_udf_closure():
    import pickle

    tok = TrainedBPETokenizer([("a", "b"), ("ab", "c")])
    tok.encode("abc")  # populate the lru cache, which must not pickle
    tok2 = pickle.loads(pickle.dumps(tok))
    assert tok2.merges == tok.merges
    assert tok2.encode("abcabd") == ["abc", "ab", "d"]
