"""Distributed n-gram language model: train on a corpus, score documents
by perplexity, filter the low-quality tail.

The CCNet recipe (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", 2020) scores every document
with a language model and drops the high-perplexity tail; at 100 TB the
LM itself must be trained distributed. This module implements the whole
loop corpus-side with nothing but hash aggregations and equi-joins
(beyond-reference; the reference's closest primitive is the scalar
enrichment family, pybabe/geoip.py / pybabe/user_agent.py — per-row
lookup against a trained side table):

- :func:`train_bigram_lm` — add-alpha (Laplace) bigram LM as three
  DataFrames: bigram counts, context (unigram) counts, vocabulary size.
  Two hash aggregations over exploded n-grams, both map-side combinable,
  linear in corpus size.
- :func:`perplexity` — per-document mean log-probability and perplexity
  under a trained LM. One shuffle join on (w1, w2) against the bigram
  table, one on w1 against the (vocabulary-sized, much smaller) context
  table, then a per-doc hash aggregation.
- :func:`perplexity_filter` — keep documents at or below a perplexity
  ceiling (the CCNet "head+middle" cut).

Scale shapes: nothing here is quadratic and nothing collects. Training
is two groupBy counts over exploded tokens. Scoring joins the exploded
corpus against the LM on its natural keys — hash-partitioned on both
sides, AQE-broadcastable when the LM is pruned (``min_count``) small
enough. Cross-engine determinism follows the registry convention: each
per-bigram log-probability is cast to DECIMAL(18,6) before the exact
decimal sum, so Spark's and the oracle's summation orders cannot
diverge (see pybabe_spark/queries.py module docstring).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pybabe_spark.operators._util import attach_scalars


class BigramLM(NamedTuple):
    """A trained add-alpha bigram model.

    ``bigrams``: (w1, w2, c12) observed-bigram counts;
    ``contexts``: (w1, c1) unigram counts — the denominator contexts;
    ``vocab``: single row (v) — vocabulary size for the smoothing mass.

    Smoothing-denominator variant, stated explicitly: contexts are TOTAL
    unigram counts, which include each document's final token even though
    that token never serves as a bigram context — so P(.|w1) sums to
    slightly below 1. :class:`NgramLM` instead derives its denominators
    from exact prefix counts (summing the gram table over ctx), where the
    conditional mass is exact. Both variants are internally consistent
    with their oracles and tests; the difference only matters when
    comparing absolute perplexities across the two model families.
    """

    bigrams: DataFrame
    contexts: DataFrame
    vocab: DataFrame


def _word_array(text_col: str) -> F.Column:
    return F.split(F.col(text_col), " ", -1)


def bigram_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per bigram OCCURRENCE: (id, w1, w2).

    Pure codegen: ``zip_with`` over two shifted array slices — no
    Python, no index arithmetic that trips Spark's descending
    ``sequence`` on one-word documents (slice length is clamped to 0).
    """
    ws = _word_array(text_col)
    n1 = F.greatest(F.size(ws) - F.lit(1), F.lit(0))
    pairs = F.zip_with(
        F.slice(ws, 1, n1),
        F.slice(ws, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        df.select(F.col(id_col), F.explode(pairs).alias("__bg"))
        .select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )


def unigram_rows(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per token occurrence: (w1)."""
    return df.select(F.explode(_word_array(text_col)).alias("w1"))


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> BigramLM:
    """Count-based bigram LM over the corpus.

    ``min_count`` prunes bigram rows below the threshold — the 100 TB
    knob that shrinks the model toward broadcastable; pruned bigrams
    simply fall back to the smoothing floor at scoring time (they score
    as unseen), so pruning trades a little probability mass for a much
    smaller join build side. Contexts and vocabulary are never pruned —
    the smoothing denominator must stay exact.
    """
    uni = unigram_rows(df, text_col)
    contexts = uni.groupBy("w1").agg(F.count("*").alias("c1"))
    bigrams = (
        bigram_rows(df, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    if min_count > 1:
        bigrams = bigrams.filter(F.col("c12") >= min_count)
    vocab = contexts.agg(F.count("*").alias("v"))
    return BigramLM(bigrams=bigrams, contexts=contexts, vocab=vocab)


def _ppl_output(
    df: DataFrame, scored: DataFrame, id_col: str, count_alias: str
) -> DataFrame:
    """Shared scorer tail for both LM orders: decimal-exact log-prob
    sum per doc, left join back so every doc keeps a row, raw IEEE
    average (re-rounding to decimal would land exact-halfway quotients
    — a 6-decimal sum over a small integer — on engine-specific
    rounding modes), and one DECIMAL(18,6) rounding on the
    transcendental ppl."""
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias(count_alias),
        F.sum("__lp").cast("decimal(28,6)").alias("__sum"),
    )
    out = (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(count_alias), F.lit(0)).alias(count_alias),
            F.col("__sum").cast("double").alias("sum_logp"),
            (F.col("__sum").cast("double") / F.col(count_alias)).alias(
                "avg_logp"
            ),
        )
    )
    return out.withColumn(
        "ppl",
        F.exp(-(F.col("avg_logp"))).cast("decimal(18,6)").cast("double"),
    )


def perplexity(
    df: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document add-alpha bigram log-likelihood and perplexity.

    Output: (id, n_bigrams, sum_logp, avg_logp, ppl). Documents with
    fewer than two tokens have ``n_bigrams = 0`` and NULL scores.

    P(w2 | w1) = (c12 + alpha) / (c1 + alpha * V); unseen bigrams and
    unseen contexts coalesce their counts to 0, so cross-corpus scoring
    (an LM trained elsewhere) is well-defined. ``sum_logp`` is the exact
    decimal sum of per-bigram DECIMAL(18,6) log-probabilities —
    bit-identical across engines regardless of summation order;
    ``avg_logp`` is its raw IEEE division by the bigram count (exact
    inputs → correctly-rounded identical quotient); only ``ppl`` (a
    transcendental) is DECIMAL(18,6)-rounded.
    """
    bg = bigram_rows(df, id_col, text_col)
    scored = attach_scalars(
        bg.join(lm.bigrams, ["w1", "w2"], "left").join(
            lm.contexts, "w1", "left"
        ),
        lm.vocab,
    ).select(
        F.col(id_col),
        F.log(
            (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
        )
        .cast("decimal(18,6)")
        .alias("__lp"),
    )
    return _ppl_output(df, scored, id_col, "n_bigrams")


def perplexity_filter(
    df: DataFrame,
    lm: "BigramLM | NgramLM",
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Keep documents whose perplexity under ``lm`` is ≤ ``max_ppl``
    (too-short docs with no n-grams are dropped — no evidence either
    way, and CCNet's cut drops them too). Dispatches on the model type:
    a :class:`BigramLM` scores via :func:`perplexity`, an
    :class:`NgramLM` via :func:`ngram_perplexity` at its own order."""
    if isinstance(lm, NgramLM):
        scores = ngram_perplexity(df, lm, None, id_col, text_col, alpha)
    else:
        scores = perplexity(df, lm, id_col, text_col, alpha)
    keep = scores.filter(F.col("ppl") <= max_ppl).select(id_col)
    return df.join(keep, id_col, "semi")


def save_lm(lm: "BigramLM | NgramLM", path: str, mode: str = "overwrite") -> None:
    """Persist a trained LM (either form) as parquet tables under
    ``path`` plus a 1-row ``meta/`` table recording kind and order —
    the train-offline / score-online split every production quality
    filter runs (cf. the stored ANN indexes,
    similarity.build_lsh_index): the expensive corpus aggregation
    happens once; later batches score against the stored model without
    re-reading the training corpus."""
    if isinstance(lm, NgramLM):
        spark = lm.grams.sparkSession
        lm.grams.write.mode(mode).parquet(f"{path}/grams")
        meta = [("ngram", lm.n)]
    else:
        spark = lm.bigrams.sparkSession
        lm.bigrams.write.mode(mode).parquet(f"{path}/bigrams")
        meta = [("bigram", 2)]
    lm.contexts.write.mode(mode).parquet(f"{path}/contexts")
    lm.vocab.write.mode(mode).parquet(f"{path}/vocab")
    spark.createDataFrame(meta, "kind string, n int").write.mode(
        mode
    ).parquet(f"{path}/meta")


def load_lm(spark, path: str) -> "BigramLM | NgramLM":
    """Load a :func:`save_lm` model (kind restored from ``meta/``;
    pre-meta saves load as bigram); scoring plans are identical to the
    freshly-trained form (same schemas, same joins)."""
    from pyspark.errors import AnalysisException

    try:
        meta = spark.read.parquet(f"{path}/meta").head()
        kind, n = meta["kind"], meta["n"]
    except AnalysisException:
        # only the path-missing case (a pre-meta bigram save) falls
        # back; any other error must surface — a blanket fallback could
        # silently misload an n-gram model as a stale bigram layout
        kind, n = "bigram", 2
    contexts = spark.read.parquet(f"{path}/contexts")
    # limit(1) restores the single-row guarantee a file scan cannot
    # carry (save_lm wrote exactly one row), so plan_lint can again
    # PROVE the scalar-attach nested loop safe via maxRows
    vocab = spark.read.parquet(f"{path}/vocab").limit(1)
    if kind == "ngram":
        return NgramLM(
            grams=spark.read.parquet(f"{path}/grams"),
            contexts=contexts,
            vocab=vocab,
            n=int(n),
        )
    return BigramLM(
        bigrams=spark.read.parquet(f"{path}/bigrams"),
        contexts=contexts,
        vocab=vocab,
    )


def merge_lm(a: BigramLM, b: BigramLM) -> BigramLM:
    """Combine two trained LMs by summing counts — for models trained
    with ``min_count=1`` (no pruning) this is EXACTLY the model
    :func:`train_bigram_lm` would produce on the concatenated corpora
    (counts are additive), so incremental pipelines can fold each new
    batch's cheap local model into the stored global one instead of
    re-scanning history. Two union+sum aggregations, model-sized not
    corpus-sized.

    If either input was pruned (``min_count > 1``), merged bigram counts
    are LOWER BOUNDS: bigram rows already pruned from an input are lost,
    and a bigram pruned in both inputs stays absent even if its combined
    count would clear the threshold. Contexts and vocab are never pruned,
    so denominators stay exact either way — pruned-merge models just
    smooth a little more mass than a from-scratch retrain would."""
    bigrams = (
        a.bigrams.unionByName(b.bigrams)
        .groupBy("w1", "w2")
        .agg(F.sum("c12").alias("c12"))
    )
    contexts = (
        a.contexts.unionByName(b.contexts)
        .groupBy("w1")
        .agg(F.sum("c1").alias("c1"))
    )
    return BigramLM(
        bigrams=bigrams,
        contexts=contexts,
        vocab=contexts.agg(F.count("*").alias("v")),
    )


class NgramLM(NamedTuple):
    """Order-n generalization of :class:`BigramLM` with string context
    keys: ``grams`` (ctx, w, c) n-gram counts; ``contexts`` (ctx, cc)
    PREFIX counts — derived by summing the gram table over ctx, the
    textbook MLE denominator, sharing the gram table's exchange instead
    of re-scanning the corpus; ``vocab`` single row (v); ``n`` the
    order, carried so scorers need not be told twice."""

    grams: DataFrame
    contexts: DataFrame
    vocab: DataFrame
    n: int


def ngram_occurrences(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, ctx, w) per n-gram occurrence: ctx is the space-joined
    (n-1)-word history, w the predicted word. Docs shorter than n
    contribute no rows. Pure codegen (transform over an index
    sequence), no Python."""
    if n < 2:
        raise ValueError(f"ngram_occurrences: order n {n} < 2")
    ws = _word_array(text_col)
    gram = lambda i: F.struct(  # noqa: E731
        F.concat_ws(
            " ", *[F.element_at(ws, i + k + 1) for k in range(n - 1)]
        ).alias("ctx"),
        F.element_at(ws, i + F.lit(n)).alias("w"),
    )
    occs = F.when(
        F.size(ws) >= n,
        F.transform(F.sequence(F.lit(0), F.size(ws) - n), gram),
    ).otherwise(F.array().cast("array<struct<ctx:string,w:string>>"))
    return df.select(F.col(id_col), F.explode(occs).alias("__g")).select(
        id_col, F.col("__g.ctx").alias("ctx"), F.col("__g.w").alias("w")
    )


def train_ngram_lm(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> NgramLM:
    """Add-alpha order-n LM (CCNet trains order-5): one n-gram count
    aggregation over the exploded corpus; context (prefix) counts are
    DERIVED from it (one more model-sized aggregation, no second corpus
    pass — and computed before ``min_count`` pruning so the smoothing
    denominator stays exact); vocabulary is the distinct-unigram count.
    """
    grams = (
        ngram_occurrences(df, id_col, text_col, n)
        .groupBy("ctx", "w")
        .agg(F.count("*").alias("c"))
    )
    contexts = grams.groupBy("ctx").agg(F.sum("c").alias("cc"))
    if min_count > 1:
        grams = grams.filter(F.col("c") >= min_count)
    vocab = unigram_rows(df, text_col).agg(
        F.count_distinct("w1").alias("v")
    )
    return NgramLM(grams=grams, contexts=contexts, vocab=vocab, n=n)


def ngram_perplexity(
    df: DataFrame,
    lm: NgramLM,
    n: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document order-n perplexity, same output contract and
    decimal-exact arithmetic as :func:`perplexity`: (id, n_ngrams,
    sum_logp, avg_logp, ppl); docs shorter than n score NULL.

    P(w | ctx) = (c + alpha) / (cc + alpha·V); unseen grams/contexts
    coalesce to 0 so cross-corpus scoring is defined.
    """
    if n is not None and n != lm.n:
        raise ValueError(
            f"ngram_perplexity: n={n} does not match the model's order "
            f"{lm.n}; a mismatched order would miss every context key "
            "and score the uniform smoothing floor for every gram"
        )
    n = lm.n
    occ = ngram_occurrences(df, id_col, text_col, n)
    scored = attach_scalars(
        occ.join(lm.grams, ["ctx", "w"], "left").join(
            lm.contexts, "ctx", "left"
        ),
        lm.vocab,
    ).select(
        F.col(id_col),
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
            / (F.coalesce(F.col("cc"), F.lit(0)) + F.lit(alpha) * F.col("v"))
        )
        .cast("decimal(18,6)")
        .alias("__lp"),
    )
    return _ppl_output(df, scored, id_col, "n_ngrams")
