"""The pluggable Arrow-batched tokenizer seam (VERDICT r5 next-round
item 1): an injected toy tokenizer must flow through token_count,
pack_tokens, clip_documents and Babe.text_stats, while tokenizer=None
keeps the oracle-checked codegen heuristic byte-identical."""

import pytest

from pyspark.sql import functions as F

from pybabe_spark.functions.text import resolve_tokenizer, token_count
from pybabe_spark.operators.packing import clip_documents, pack_tokens
from pybabe_spark.plans.facade import Babe


class PairTokenizer:
    """Toy deterministic tokenizer: non-overlapping 2-char chunks.

    Shaped like the public tokenizer protocol (tiktoken / HF):
    encode -> token list, decode -> exact text reassembly.
    """

    def encode(self, s):
        return [s[i:i + 2] for i in range(0, len(s), 2)]

    def decode(self, toks):
        return "".join(toks)


class BatchOnlyTokenizer:
    """encode_batch works, per-string encode raises — so the query only
    succeeds if the batch entry point (the HF-fast path) is the one
    actually taken on the executors."""

    def encode(self, s):
        raise AssertionError("per-string encode used despite encode_batch")

    def encode_batch(self, texts):
        return [[t[i:i + 2] for i in range(0, len(t), 2)] for t in texts]


class EncodeOnly:
    """No decode: exercises the word-boundary fallback cut."""

    def encode(self, s):
        return [s[i:i + 2] for i in range(0, len(s), 2)]


def _py_count(s: str) -> int:
    return (len(s) + 1) // 2


def test_resolve_tokenizer_shapes():
    tok = resolve_tokenizer(PairTokenizer())
    assert tok["encode"]("abcd") == ["ab", "cd"]
    assert tok["decode"](["ab", "cd"]) == "abcd"
    assert tok["encode_batch"] is None
    # bare callable
    tok2 = resolve_tokenizer(lambda s: s.split())
    assert tok2["encode"]("a b") == ["a", "b"]
    assert tok2["decode"] is None
    with pytest.raises(TypeError, match="tokenizer"):
        resolve_tokenizer(42)
    assert resolve_tokenizer(None) is None


def test_token_count_with_tokenizer(spark):
    rows = [(1, "hello world"), (2, "ab"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", token_count("text", PairTokenizer()).alias("n")
        ).collect()
    }
    assert got == {1: _py_count("hello world"), 2: 1, 3: 0, 4: 0}


def test_token_count_uses_encode_batch(spark):
    df = spark.createDataFrame([(i, "x" * i) for i in range(20)], "id int, text string")
    got = df.select(token_count("text", BatchOnlyTokenizer()).alias("n")).agg(
        F.sum("n")
    ).head()[0]
    assert got == sum(_py_count("x" * i) for i in range(20))


def test_token_count_default_path_unchanged(spark):
    """tokenizer=None must stay the exact regexp heuristic the DuckDB
    oracles mirror — no Python stage in the plan."""
    df = spark.createDataFrame([(1, "a b, c!")], "id int, text string")
    col = token_count("text")
    assert df.select(col.alias("n")).head()["n"] == 5
    plan = df.select(col.alias("n"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


def test_pack_tokens_from_text_with_tokenizer(spark):
    rows = [(i, "x" * (2 * i)) for i in range(1, 8)]  # i tokens each
    df = spark.createDataFrame(rows, "doc_id int, text string")
    packs = pack_tokens(
        df, budget=5, text_col="text", tokenizer=PairTokenizer(), n_buckets=1
    ).collect()
    by_id = {r["doc_id"]: r["pack_id"] for r in packs}
    # next-fit over ids 1..7 with costs 1..7, budget 5:
    # [1,2]=3, [3]=3.. wait 1+2=3, +3=6>5 -> new; [3]=3, +4=7>5 -> new;
    # [4], [5], [6], [7] each alone
    assert by_id == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5}


def test_clip_documents_tokenizer_exact_slice(spark):
    text = "abcdefghij"  # 5 pair-tokens
    df = spark.createDataFrame([(1, text), (2, "ab")], "doc_id int, text string")
    tok = PairTokenizer()
    head = {r["doc_id"]: r for r in clip_documents(df, 3, "head", tokenizer=tok).collect()}
    assert head[1]["text"] == "abcdef"
    assert head[1]["n_tokens"] == 5 and head[1]["clipped"]
    assert head[2]["text"] == "ab" and not head[2]["clipped"]
    tail = clip_documents(df, 3, "tail", tokenizer=tok).filter("doc_id = 1").head()
    assert tail["text"] == "efghij"
    mid = clip_documents(df, 3, "middle", tokenizer=tok).filter("doc_id = 1").head()
    # h=2 tokens head ('abcd'), t=1 token tail ('ij'), joined by ' '
    assert mid["text"] == "abcd ij"


def test_clip_documents_word_boundary_fallback(spark):
    # words cost (pair-tokens): aa=1, bbbb=2, cc=1, dddd=2
    df = spark.createDataFrame([(1, "aa bbbb cc dddd")], "doc_id int, text string")
    tok = EncodeOnly()
    head = clip_documents(df, 3, "head", tokenizer=tok).head()
    assert head["text"] == "aa bbbb" and head["clipped"]
    tail = clip_documents(df, 3, "tail", tokenizer=tok).head()
    assert tail["text"] == "cc dddd"
    mid = clip_documents(df, 2, "middle", tokenizer=tok).head()
    # h=1 -> 'aa'; t=1 -> 'dddd' costs 2 > 1 -> no tail word fits... suffix
    # fit of budget 1 over reversed costs [2,1,2,1] keeps 0 words
    assert mid["text"] == "aa"


def test_tokens_array_both_paths(spark):
    from pybabe_spark.functions.text import tokens

    df = spark.createDataFrame(
        [(1, "ab cd!"), (2, None)], "doc_id int, text string"
    )
    default = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", tokens("text").alias("t")).collect()
    }
    assert default[1] == ["ab", "cd", "!"]
    assert default[2] is None  # NULL propagates on the codegen path
    seam = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", tokens("text", PairTokenizer()).alias("t")
        ).collect()
    }
    assert seam[1] == ["ab", " c", "d!"]
    assert seam[2] == []  # the UDF path normalizes NULL to empty


def test_text_stats_threads_tokenizer(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id int, text string")
    out = Babe.from_df(df).text_stats(tokenizer=PairTokenizer()).df.head()
    assert out["n_tokens"] == 3  # he,ll,o
    default = Babe.from_df(df).text_stats().df.head()
    assert default["n_tokens"] == 1  # regexp heuristic: one word run
