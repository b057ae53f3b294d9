"""Corpus-trained byte-pair-encoding tokenizer, pluggable into the
Arrow-batched tokenizer seam (functions/text.py::resolve_tokenizer).

Completes the round-6 "real token budgets" story: round 6 added the
SEAM (inject any tokenizer into token_count / pack_tokens /
clip_documents / text_stats); this module supplies a tokenizer TRAINED
ON THE CORPUS ITSELF, so a pipeline can budget in its own learned
subword units with no external artifacts. Beyond-reference (PyBabe has
no tokenization; nearest primitive is the char-level transform family,
pybabe/charset.py).

Algorithm: classic BPE (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — start from characters,
repeatedly merge the most frequent adjacent symbol pair. Training
operates on the WORD-FREQUENCY table, not the corpus (the standard
formulation): pair counts are weighted by word frequency, so the corpus
is touched exactly once.

100 TB shape, stated honestly:

- :func:`word_frequencies` is the only corpus-scale stage — one
  explode + hash aggregation, map-side combinable, linear.
- Training consumes the TOP-``top_words`` rows of that table via
  TakeOrderedAndProject (per-partition heaps, bounded driver transfer)
  and runs the merge loop driver-side over that bounded dict — the
  train-on-the-head shape production tokenizer pipelines use (the
  frequency head covers ~99% of token mass; the tail cannot win a
  merge anyway at realistic ``num_merges``). Driver work is
  O(top_words · avg_word_len · num_merges), independent of corpus size.
- The trained model is a merge list of ``num_merges`` pairs — a few KB
  — shipped to executors inside the seam's pandas-UDF closure exactly
  like any other tokenizer.

Determinism: merge selection tie-breaks by (count DESC, pair ASC) and
the top-words cut by (count DESC, word ASC), so two engines / two runs
over the same corpus produce the identical merge list.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TrainedBPETokenizer:
    """A trained merge list, exposing the seam protocol (``encode``).

    ``encode`` pre-tokenizes on single spaces (the engine's word
    convention — SURVEY §4), then encodes each word by repeatedly
    applying the LOWEST-RANK merge present until none applies (the
    standard BPE inference loop). There is deliberately no ``decode``:
    token streams do not retain word boundaries, so
    ``clip_documents(tokenizer=...)`` takes its documented
    word-boundary fallback cut with exact per-word token costs.
    """

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = [tuple(m) for m in merges]
        self._ranks = {pair: i for i, pair in enumerate(self.merges)}
        # per-word memo: real corpora follow Zipf, so a bounded cache
        # absorbs almost every encode after the first few batches
        self._encode_word = lru_cache(maxsize=65536)(self._encode_word_raw)

    def _encode_word_raw(self, word: str) -> tuple[str, ...]:
        syms = tuple(word)
        ranks = self._ranks
        while len(syms) >= 2:
            best_rank = None
            for pair in zip(syms, syms[1:]):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
            if best_rank is None:
                break
            a, b = self.merges[best_rank]
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = tuple(out)
        return syms

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in text.split(" "):
            if w:
                out.extend(self._encode_word(w))
        return out

    def __getstate__(self):  # the lru_cache wrapper is not picklable
        return {"merges": self.merges}

    def __setstate__(self, state):
        self.__init__(state["merges"])


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c) corpus word counts — the one corpus-scale pass of BPE
    training. Empty tokens from multi-space runs are dropped (they
    carry no symbols)."""
    return (
        df.select(
            F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1))
            .alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _merge_word(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def merge_word_frequencies(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sum two (word, c) frequency tables — counts are additive, so an
    incremental pipeline folds each new batch's cheap local table into
    the stored global one and retrains merges WITHOUT re-scanning
    history (the merge_lm shape, operators/lm.py). Exact: the result
    equals :func:`word_frequencies` over the concatenated corpora."""
    return (
        a.unionByName(b).groupBy("word").agg(F.sum("c").alias("c"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    top_words: int = 10_000,
    min_pair_count: int = 2,
) -> TrainedBPETokenizer:
    """Train a BPE merge list on the corpus.

    One distributed word-frequency aggregation, a TakeOrdered head of
    ``top_words`` rows, then the merge loop on that bounded table.
    Stops early when no pair reaches ``min_pair_count`` (merging a
    pair seen once memorizes a word, it does not generalize).
    """
    return train_bpe_from_frequencies(
        word_frequencies(df, text_col),
        num_merges=num_merges,
        top_words=top_words,
        min_pair_count=min_pair_count,
    )


def train_bpe_from_frequencies(
    wf: DataFrame,
    num_merges: int = 200,
    top_words: int = 10_000,
    min_pair_count: int = 2,
) -> TrainedBPETokenizer:
    """Train from a persisted / incrementally-merged (word, c) table —
    see :func:`merge_word_frequencies` — skipping the corpus scan."""
    head = (
        wf
        .orderBy(F.col("c").desc(), F.col("word").asc())
        .limit(top_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for row in head:
        vocab[tuple(row["word"])] = (
            vocab.get(tuple(row["word"]), 0) + int(row["c"])
        )
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        # deterministic: max count, then lexicographically first pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = {
            _merge_word(syms, a, b): freq for syms, freq in vocab.items()
        }
    return TrainedBPETokenizer(merges)


def save_bpe(
    tokenizer: TrainedBPETokenizer, spark: SparkSession, path: str
) -> None:
    """Persist the merge list as a (rank, left, right) parquet — the
    model is merge-ORDER-sensitive, so rank is part of the data."""
    rows = [
        (i, a, b) for i, (a, b) in enumerate(tokenizer.merges)
    ]
    spark.createDataFrame(
        rows, "rank int, left string, right string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_bpe(spark: SparkSession, path: str) -> TrainedBPETokenizer:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return TrainedBPETokenizer([(r["left"], r["right"]) for r in rows])
