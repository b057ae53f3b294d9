"""Multinomial Naive Bayes text classifier — trained and scored as
pure aggregations/joins, with the registry's decimal-rounded-log
determinism (operators/lm.py convention).

Beyond-reference capability completing the classifier family: the
logistic quality classifier (operators/classifier.py) learns by
iterative gradient descent; Naive Bayes is its closed-form sibling —
training IS counting (add-one-smoothed per-class token counts), which
makes it the cheapest serious baseline for language-ID, topic
routing, and spam/quality gating over a 100 TB corpus: two hash
aggregations to train, no iterations, no learning rate.

    score(d, c) = ln P(c) + Σ_{w∈d} m_w · ln( (c_wc + 1) / (T_c + V) )

All counts are exact integers; every log factor is one IEEE ``ln`` of
a ratio of exact integers, rounded once to DECIMAL(18,6) — identical
on both engines for identical inputs — and summed exactly in
DECIMAL(28,6). Unseen-in-class tokens (including tokens absent from
the training vocabulary) take the smoothing floor ``ln(1/(T_c+V))``,
applied via the count identity ``(n_tok − seen)·default`` so the
score join only touches (token, class) pairs that EXIST in the model.
Prediction is argmax with ties broken by smallest label — no float
comparison ambiguity survives the rounding + tiebreak.

Scale shape: training = two map-side-combinable aggs over the token
stream. Scoring = one (doc, token, m) projection (per-doc token
multiplicities — join volume is DISTINCT tokens per doc, not
occurrences), one equi-join against the (w, label, logp) model, one
(doc, label) hash agg, a broadcast of the C-row class table onto the
per-doc token counts, and one per-doc top-1 window over C·docs rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.operators._util import attach_scalars
from pybabe_spark.operators.lm import _word_array


@dataclass
class NaiveBayesModel:
    """(w, label, lp) token log-probs; (label, prior_lp, default_lp)
    class table; both plain DataFrames (save with any sink)."""

    token_logp: DataFrame
    classes: DataFrame


def train_naive_bayes(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
) -> NaiveBayesModel:
    """Count-train add-one multinomial NB. NULL labels are excluded."""
    toks = docs.filter(F.col(label_col).isNotNull()).select(
        F.col(label_col).alias("label"),
        F.explode(_word_array(text_col)).alias("w"),
    )
    # The (label, word) count grain feeds three branches (totals,
    # vocab, token_logp). r13 pinned it (and the predict grain) with
    # lazy_persist to stop AQE broadcast-build jobs re-running the
    # explode+count — but the pins REGRESSED the bench 1.07→6.17 s
    # driver-measured (r13 verdict #1): the cache-fill's full task
    # waves over the word grains cost more than the recomputation they
    # saved, and got WORSE with more cores (8-core ran 2× faster than
    # 32-core). r14 A/B: unpinned 1.9→1.0 s at matched calib. The
    # recomputed subtrees are map-combinable aggregations AQE builds
    # concurrently — the wq lesson (don't serialize concurrent
    # builds) applied to caching.
    tok_counts = toks.groupBy("label", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = tok_counts.groupBy("label").agg(
        F.sum("c").alias("t")
    )
    vocab = tok_counts.select("w").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    doc_counts = (
        docs.filter(F.col(label_col).isNotNull())
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    ndocs = doc_counts.agg(F.sum("nd").alias("n"))
    lp = lambda num, den: F.log(num / den).cast(  # noqa: E731
        "decimal(18,6)"
    )
    classes = attach_scalars(
        doc_counts.join(totals, "label"), vocab
    )
    classes = attach_scalars(classes, ndocs).select(
        "label",
        lp(F.col("nd").cast("double"), F.col("n")).alias("prior_lp"),
        lp(F.lit(1.0), (F.col("t") + F.col("v"))).alias("default_lp"),
        "t",
        "v",
    )
    token_logp = attach_scalars(
        tok_counts.join(totals, "label"), vocab
    ).select(
        "w",
        "label",
        lp(
            (F.col("c") + F.lit(1)).cast("double"),
            (F.col("t") + F.col("v")),
        ).alias("lp"),
    )
    return NaiveBayesModel(token_logp=token_logp, classes=classes)


def nb_predict(
    docs: DataFrame,
    model: NaiveBayesModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document argmax class: ``(id, label, score, n_tokens)``.
    ``score`` is the exact DECIMAL(28,6) log-posterior (as double);
    ties break to the smallest label."""
    # (id, word) grain feeds the seen-scores join AND the token totals.
    # Deliberately UNPINNED (see train_naive_bayes): the r13
    # lazy_persist here was the round's one measured regression.
    toks = docs.select(
        F.col(id_col), F.explode(_word_array(text_col)).alias("w")
    ).groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("m"))
    seen = (
        toks.join(model.token_logp, "w")
        .groupBy(id_col, "label")
        .agg(
            F.sum(F.col("m") * F.col("lp")).cast("decimal(28,6)").alias(
                "__seen_lp"
            ),
            F.sum("m").alias("__seen_m"),
        )
    )
    ntok = toks.groupBy(id_col).agg(F.sum("m").alias("n_tokens"))
    grid = ntok.crossJoin(
        F.broadcast(
            model.classes.select("label", "prior_lp", "default_lp")
        )
    )
    scored = grid.join(seen, [id_col, "label"], "left").select(
        F.col(id_col),
        "label",
        "n_tokens",
        (
            F.col("prior_lp")
            + F.coalesce(F.col("__seen_lp"), F.lit(0).cast("decimal(28,6)"))
            + (
                F.col("n_tokens") - F.coalesce(F.col("__seen_m"), F.lit(0))
            )
            * F.col("default_lp")
        ).cast("decimal(28,6)").alias("__score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            "label",
            F.col("__score").cast("double").alias("score"),
            "n_tokens",
        )
    )


def naive_bayes_sql(
    train_where: str,
    test_where: str,
    label_col: str,
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB oracle: train on ``table WHERE train_where``, score
    ``table WHERE test_where`` — same counts, same DECIMAL(18,6) log
    factors, same coverage identity, same (score desc, label asc)
    argmax."""
    return f"""
    WITH train AS (
        SELECT {label_col} AS label, string_split(text, ' ') AS ws
        FROM {table} WHERE ({train_where}) AND {label_col} IS NOT NULL
    ),
    toks AS (SELECT label, unnest(ws) AS w FROM train),
    tc AS (SELECT label, w, COUNT(*) AS c FROM toks GROUP BY label, w),
    tot AS (SELECT label, SUM(c) AS t FROM tc GROUP BY label),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM tc),
    dc AS (SELECT label, COUNT(*) AS nd FROM train GROUP BY label),
    n AS (SELECT SUM(nd) AS n FROM dc),
    classes AS (
        SELECT dc.label,
               CAST(ln(CAST(nd AS DOUBLE) / n) AS DECIMAL(18,6))
                 AS prior_lp,
               CAST(ln(CAST(1 AS DOUBLE) / (t + v)) AS DECIMAL(18,6))
                 AS default_lp
        FROM dc JOIN tot ON dc.label = tot.label CROSS JOIN v CROSS JOIN n
    ),
    model AS (
        SELECT w, tc.label,
               CAST(ln(CAST(c + 1 AS DOUBLE) / (t + v))
                    AS DECIMAL(18,6)) AS lp
        FROM tc JOIN tot ON tc.label = tot.label CROSS JOIN v
    ),
    test AS (
        SELECT {id_col}, string_split(text, ' ') AS ws
        FROM {table} WHERE {test_where}
    ),
    ttoks AS (
        SELECT {id_col}, w, COUNT(*) AS m
        FROM (SELECT {id_col}, unnest(ws) AS w FROM test)
        GROUP BY {id_col}, w
    ),
    seen AS (
        SELECT {id_col}, label,
               CAST(SUM(m * lp) AS DECIMAL(28,6)) AS seen_lp,
               SUM(m) AS seen_m
        FROM ttoks JOIN model USING (w)
        GROUP BY {id_col}, label
    ),
    ntok AS (SELECT {id_col}, CAST(SUM(m) AS BIGINT) AS n_tokens
             FROM ttoks GROUP BY {id_col}),
    scored AS (
        SELECT ntok.{id_col}, c.label, ntok.n_tokens,
               CAST(c.prior_lp
                    + COALESCE(seen.seen_lp, 0)
                    + (ntok.n_tokens - COALESCE(seen.seen_m, 0))
                      * c.default_lp
                 AS DECIMAL(28,6)) AS score
        FROM ntok CROSS JOIN classes c
        LEFT JOIN seen ON seen.{id_col} = ntok.{id_col}
                      AND seen.label = c.label
    )
    SELECT {id_col}, label, CAST(score AS DOUBLE) AS score, n_tokens
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY {id_col}
                 ORDER BY score DESC, label ASC) AS rn
        FROM scored
    ) WHERE rn = 1
    """
