"""Distributed logistic-regression quality classifier over hashed
n-gram features — the fastText-style quality filter the LLaMA /
RedPajama / CCNet pipelines run over every crawl document, trained and
applied corpus-side (beyond-reference; nearest reference primitive is
row filtering, pybabe/filter_.py).

The model is a plain logistic regression on the same hashed-bigram
bag-of-features DSIR uses (operators/dsir.py::doc_feature_profile):
small enough to broadcast (``buckets`` weights), trained by full-batch
gradient descent where each iteration is two equi-joins and two hash
aggregations — no parameter server, no Python in the loop:

  score_i  = Σ_b w_t[b] · nf_ib            (profile ⋈ broadcast weights)
  p_i      = σ(score_i)                     (rounded DECIMAL(18,6))
  grad_b   = Σ_i (p_i − y_i) · nf_ib        (residuals ⋈ profile)
  w_t+1[b] = w_t[b] − lr · grad_b / N

Cross-engine exactness (beyond the registry's decimal convention,
pybabe_spark/queries.py): the training loop runs in exact INTEGER
micro-units — weights, residuals, and gradients as value×1e6 bigints,
the update step an explicit half-away-from-zero integer division — so
every iteration is bit-identical on any engine by construction. The
single inexact step per iteration, the σ̃ link, uses only IEEE
correctly-rounded ops (see :func:`_sigmoid` for why not ``exp``). The
DuckDB oracle replays whole training runs value-for-value by unrolling
the iterations as CTEs (queries_text.py::quality_classifier_docs).

Scale shapes: the weight table is ≤ ``buckets`` rows and broadcasts;
each iteration shuffles the (already aggregated) doc-feature profile
twice — by doc for scores, by bucket for gradients — both map-side
combinable and linear in corpus size. Each iteration's weights are
``localCheckpoint``-ed (the graph.connected_components idiom), so
iteration t+1 starts from materialized weights instead of replaying
the whole lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pybabe_spark.operators._util import attach_scalars
from pybabe_spark.operators.dsir import doc_feature_profile

_DEC = "decimal(18,6)"


def _sigmoid(s):
    """Rational logistic surrogate σ̃(s) = 0.5 + 0.5·s/(1+|s|) — the
    'fast sigmoid' link. Chosen over exp-based σ deliberately: every op
    here (abs/add/mul/div) is IEEE correctly-rounded, so both engines —
    and every JIT tier of the same JVM — produce bit-identical doubles,
    whereas ``exp`` is only 1-ulp-accurate and its HotSpot intrinsic
    may differ from the interpreted path, which was observed flipping a
    DECIMAL(18,6) rounding mid-training. σ̃ is monotone with the same
    fixed point σ̃(0)=0.5, so gradient directions, rankings, and
    threshold filters keep their semantics."""
    return F.lit(0.5) + F.lit(0.5) * s / (F.lit(1.0) + F.abs(s))


def _doc_scores(profile: DataFrame, weights: DataFrame, id_col: str) -> DataFrame:
    """(id, n_feats, score): exact decimal Σ w·nf per doc over the
    doc's feature occurrences (docs with no features emit no row).

    LEFT join against the weight table: a feature bucket the training
    corpus never saw carries weight 0 — the standard logistic treatment
    of out-of-vocabulary features. An inner join would instead conflate
    partially/fully-OOV docs with featureless ones (undercounted
    n_feats, NULL prob, silently dropped by the filter)."""
    return (
        profile.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("nf").alias("n_feats"),
            F.sum(F.col("nf") * F.coalesce(F.col("w"), F.lit(0).cast(_DEC)))
            .cast("decimal(28,6)")
            .alias("score"),
        )
    )


def train_quality_classifier(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    iters: int = 2,
    lr: float = 0.5,
    profile: DataFrame | None = None,
) -> DataFrame:
    """Full-batch GD logistic regression; returns the weight table
    (bucket, w DECIMAL(18,6)) over every bucket observed in training.

    ``label_col`` must be 0/1 (or boolean). Deterministic end to end:
    zero init, fixed iteration count, exact integer intermediates —
    two engines replaying the same data produce bit-equal weights.
    ``profile`` lets a caller share one materialized feature profile
    between training and scoring.
    """
    from fractions import Fraction

    frac = Fraction(lr).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator

    # the profile feeds every iteration twice (scores + gradients);
    # checkpointing it once stops each round from re-exploding and
    # re-hashing the corpus (at cluster scale: persist the profile)
    if profile is None:
        profile = doc_feature_profile(
            docs, id_col, text_col, buckets
        ).localCheckpoint(eager=True)
    # NULL labels carry no supervision: excluded from BOTH the gradient
    # and N (keeping them in N while their NULL residual silently
    # dropped out of sums would skew every update)
    labels = docs.select(
        F.col(id_col), F.col(label_col).cast("int").cast("double").alias("__y")
    ).filter(F.col("__y").isNotNull())
    n = int(labels.agg(F.count("*").alias("__n")).collect()[0]["__n"])

    # The loop runs ENTIRELY in exact integer micro-units (1e-6): wm is
    # the weight ×1e6 as bigint, residuals/gradients likewise. The one
    # inexact step per iteration is σ̃ (IEEE-deterministic, see
    # _sigmoid); its DECIMAL(18,6) rounding re-enters the integer grid.
    # The update division uses explicit half-away-from-zero INTEGER
    # division — lr·g/n on doubles instead puts values on a 2e-9
    # rational grid that hits decimal half-points for ~1/n of buckets,
    # where Spark's shortest-string double→decimal rounding and the
    # oracle's binary rounding disagree (observed, not theoretical).
    #
    # r13 optimization: the weight table is ≤``buckets`` rows of
    # integers, so each round's gradient COLLECTS (bounded by the
    # bucket domain — the limit is the proof) and the half-away-from-
    # zero integer update runs driver-side; the next round re-enters
    # the plan as a broadcast VALUES literal. The old shape embedded
    # round i's full pipeline inside round i+1's broadcast build —
    # nested single-threaded broadcast jobs whose analysis and
    # execution dominated training wall time. Per round: one flat job,
    # two corpus-grain shuffles, nothing nested.
    from pybabe_spark.operators._util import local_rows_df

    spark = docs.sparkSession
    wm_d = {
        int(r["bucket"]): 0
        for r in profile.select("bucket")
        .distinct()
        .limit(buckets + 1)  # bucket ∈ [0, buckets) by construction
        .collect()
    }
    for _ in range(iters):
        wm = F.broadcast(
            local_rows_df(
                spark, sorted(wm_d.items()), "bucket bigint, wm bigint"
            )
        )
        s_micro = (
            profile.join(wm, "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("nf") * F.col("wm")).alias("__sm"))
        )
        resid = (
            labels.join(s_micro, id_col, "left")
            .select(
                F.col(id_col),
                # featureless docs (NULL score) sit at σ̃(0)=0.5 but
                # have no feature occurrences, so they add nothing to
                # any gradient bucket — they are dropped by the inner
                # join back to the profile below
                (
                    (
                        _sigmoid(
                            F.coalesce(F.col("__sm"), F.lit(0)).cast("double")
                            / F.lit(1_000_000.0)
                        ).cast(_DEC)
                        - F.col("__y").cast(_DEC)
                    ).cast(_DEC)
                    * F.lit(1_000_000)
                )
                .cast("bigint")
                .alias("__rm"),
            )
        )
        grad_rows = (
            profile.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("nf") * F.col("__rm")).alias("__gm"))
            .limit(buckets + 1)  # same bucket-domain boundedness proof
            .collect()
        )
        q = 2 * n * den
        for r in grad_rows:
            p = int(r["__gm"]) * num
            step = (
                (2 * p + n * den) // q
                if p >= 0
                else -((2 * (-p) + n * den) // q)
            )
            wm_d[int(r["bucket"])] -= step
    from decimal import ROUND_HALF_UP, Decimal

    six = Decimal("0.000001")
    return local_rows_df(
        spark,
        [
            (b, Decimal(v / 1_000_000.0).quantize(six, ROUND_HALF_UP))
            for b, v in sorted(wm_d.items())
        ],
        "bucket bigint, w decimal(18,6)",
    )


def score_quality(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    profile: DataFrame | None = None,
) -> DataFrame:
    """(id, n_feats, score, prob) under a trained weight table; docs
    with no bigram features get n_feats = 0 and NULL score/prob (no
    evidence — the caller decides, same contract as lm.perplexity).
    ``score`` is the exact decimal Σ w·nf as a double; ``prob`` is the
    DECIMAL(18,6)-rounded sigmoid. Pass the training ``profile`` to
    score the training corpus without re-exploding it."""
    if profile is None:
        profile = doc_feature_profile(docs, id_col, text_col, buckets)
    scores = _doc_scores(profile, weights, id_col)
    return (
        docs.select(id_col)
        .join(scores, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.col("score").cast("double").alias("score"),
            _sigmoid(F.col("score").cast("double"))
            .cast(_DEC)
            .cast("double")
            .alias("prob"),
        )
    )


def quality_classifier_filter(
    docs: DataFrame,
    weights: DataFrame,
    min_prob: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    profile: DataFrame | None = None,
) -> DataFrame:
    """Keep documents the classifier scores at or above ``min_prob``
    (featureless docs carry no evidence and are dropped, like
    lm.perplexity_filter; OOV features score as weight 0, so a doc the
    training corpus never saw still gets its honest ~0.5). Pass a
    materialized ``profile`` to avoid re-exploding the corpus."""
    scored = score_quality(docs, weights, id_col, text_col, buckets, profile)
    keep = scored.filter(F.col("prob") >= min_prob).select(id_col)
    return docs.join(keep, id_col, "semi")


def save_classifier(
    weights: DataFrame, path: str, buckets: int = 4096,
    mode: str = "overwrite",
) -> None:
    """Persist trained weights for the build-offline / score-many
    deployment shape: ``weights/`` (bucket, w) plus a one-row
    ``params/`` pinning the feature-bucket count — scoring against a
    model trained in a DIFFERENT bucket space would silently hash
    features into the wrong weights, the exact failure the stored
    MinHash/LSH indexes also pin params against
    (dedup_scale.build_minhash_index)."""
    import posixpath

    weights.write.mode(mode).parquet(posixpath.join(path, "weights"))
    weights.sparkSession.createDataFrame(
        [(int(buckets),)], "buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(
        posixpath.join(path, "params")
    )


def load_classifier(spark, path: str) -> tuple[DataFrame, int]:
    """(weights, buckets) — pass ``buckets`` through to
    :func:`score_quality` / :func:`quality_classifier_filter` so the
    scoring feature space always matches the trained one."""
    import posixpath

    prows = spark.read.parquet(posixpath.join(path, "params")).collect()
    if len(prows) != 1:
        raise ValueError(
            f"load_classifier: model at {path!r} has {len(prows)} params "
            "rows (expected exactly 1) — rewrite it with save_classifier"
        )
    weights = spark.read.parquet(posixpath.join(path, "weights"))
    return weights, int(prows[0]["buckets"])


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability curve for probabilistic scores: one row per
    occupied bin — ``(bin, n, n_pos, pos_rate_ppm, mean_score_ppm,
    gap_ppm)`` where scores in [0, 1] bucket by
    ``least(bins−1, floor(score·bins))``, ``pos_rate_ppm`` is the
    observed positive rate and ``gap_ppm`` the signed calibration gap
    (observed − predicted). A well-calibrated model has gaps near 0;
    Σ n_b·|gap_b|/N is ECE. The threshold-free companion to the AUC
    certificate (`quality_classifier_eval`).

    Determinism: scores lift to exact integral micro-units
    (DECIMAL(18,6)·10⁶ — scores are probabilities, 6 dp is their
    resolution) BEFORE binning, so bin edges, sums, and all three ppm
    outputs are pure integer arithmetic — no IEEE anywhere. NULL
    score/label rows drop; labels must be 0/1 (anything non-zero
    counts as positive via ``label != 0``).

    Scale shape: ONE map-side-combinable hash agg to ≤ ``bins`` rows.
    """
    if bins < 2:
        raise ValueError(f"calibration_bins: bins {bins} must be >= 2")
    micro = (F.col(score_col).cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    ok = F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    binned = (
        df.filter(ok)
        .select(
            micro.alias("__m"),
            (F.col(label_col) != 0).cast("long").alias("__pos"),
        )
        .select(
            F.expr(
                f"least(CAST({bins - 1} AS BIGINT),"
                f" (__m * {bins}) div 1000000)"
            ).alias("bin"),
            "__m",
            "__pos",
        )
    )
    out = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("__m").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("__sm"),
    )
    return out.select(
        F.col("bin").cast("int").alias("bin"),
        "n",
        "n_pos",
        F.expr(
            "CAST(n_pos * 1000000 div n AS BIGINT)"
        ).alias("pos_rate_ppm"),
        F.expr("CAST(__sm div n AS BIGINT)").alias("mean_score_ppm"),
        F.expr(
            "CAST(n_pos * 1000000 div n AS BIGINT)"
            " - CAST(__sm div n AS BIGINT)"
        ).cast("bigint").alias("gap_ppm"),
    )


def calibration_bins_sql(
    select: str, score_col: str, label_col: str, bins: int = 10
) -> str:
    """DuckDB oracle of :func:`calibration_bins` — same micro lift,
    same integer bin edges and ppm arithmetic."""
    m = f"CAST(CAST({score_col} AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    return f"""
    WITH rows_in AS ({select}),
    binned AS (
        SELECT LEAST(CAST({bins - 1} AS BIGINT),
                     ({m} * {bins}) // 1000000) AS bin,
               {m} AS mm,
               CASE WHEN {label_col} != 0 THEN 1 ELSE 0 END AS pos
        FROM rows_in
        WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
    ),
    agg AS (
        SELECT bin, COUNT(*) AS n, SUM(pos) AS n_pos,
               SUM(CAST(mm AS HUGEINT)) AS sm
        FROM binned GROUP BY bin
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST((n_pos * 1000000) // n AS BIGINT) AS pos_rate_ppm,
           CAST(sm // n AS BIGINT) AS mean_score_ppm,
           CAST(CAST((n_pos * 1000000) // n AS BIGINT)
                - CAST(sm // n AS BIGINT) AS BIGINT) AS gap_ppm
    FROM agg
    """


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision/recall/F1 over (gold, predicted) label
    pairs — one row per label appearing in EITHER column:
    ``(label, tp, fp, fn, support, precision_ppm, recall_ppm,
    f1_ppm)``. The per-class view :func:`cohens_kappa` (one scalar)
    and raw accuracy both hide: a 99%-accurate lang-id that never
    predicts a minority language shows recall_ppm = 0 on exactly that
    row. ``support = tp + fn`` is the gold count.

    All three ratios are EXACT floored integral ppm — ``tp·10⁶ div
    (tp+fp)``, ``tp·10⁶ div (tp+fn)``, and F1 in its
    harmonic-mean-free integer form ``2·tp·10⁶ div (2·tp+fp+fn)`` —
    NULL when the denominator is 0 (a label never predicted has NULL
    precision, never gold has NULL recall). Rows with NULL on either
    side are excluded, matching :func:`cohens_kappa`.

    Scale shape: one (gold, pred) cell hash agg with map-side combine,
    two margin aggs over the ≤R·C cell table, one full-outer equi-join
    of the ≤R- and ≤C-row margins plus a diagonal lookup — nothing
    bigger than the cell table moves.
    """
    ok = F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
    cells = (
        df.filter(ok)
        .groupBy(
            F.col(label_col).alias("__g"), F.col(pred_col).alias("__p")
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    gold = cells.groupBy(F.col("__g").alias("label")).agg(
        F.sum("__n").alias("__gold_n")
    )
    pred = cells.groupBy(F.col("__p").alias("label")).agg(
        F.sum("__n").alias("__pred_n")
    )
    diag = cells.filter(F.col("__g") == F.col("__p")).select(
        F.col("__g").alias("label"), F.col("__n").alias("__tp")
    )
    base = (
        gold.join(pred, "label", "full_outer")
        .join(diag, "label", "left")
        .select(
            "label",
            F.coalesce(F.col("__tp"), F.lit(0)).alias("tp"),
            (
                F.coalesce(F.col("__pred_n"), F.lit(0))
                - F.coalesce(F.col("__tp"), F.lit(0))
            ).alias("fp"),
            (
                F.coalesce(F.col("__gold_n"), F.lit(0))
                - F.coalesce(F.col("__tp"), F.lit(0))
            ).alias("fn"),
            F.coalesce(F.col("__gold_n"), F.lit(0)).alias("support"),
        )
    )
    ppm = lambda num, den: F.expr(  # noqa: E731
        f"CASE WHEN ({den}) > 0 THEN"
        f" CAST(({num}) * 1000000 div ({den}) AS BIGINT) END"
    )
    return base.select(
        "label",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.col("support").cast("bigint").alias("support"),
        ppm("tp", "tp + fp").alias("precision_ppm"),
        ppm("tp", "tp + fn").alias("recall_ppm"),
        ppm("2 * tp", "2 * tp + fp + fn").alias("f1_ppm"),
    )


def classification_report_sql(
    table: str, label_col: str, pred_col: str
) -> str:
    """DuckDB oracle of :func:`classification_report` — identical
    margins, identical floored integer-ppm ratios."""
    return f"""
    WITH cells AS (
        SELECT {label_col} AS g, {pred_col} AS p, COUNT(*) AS n
        FROM {table}
        WHERE {label_col} IS NOT NULL AND {pred_col} IS NOT NULL
        GROUP BY 1, 2
    ),
    gold AS (SELECT g AS label, SUM(n) AS gold_n FROM cells GROUP BY g),
    pred AS (SELECT p AS label, SUM(n) AS pred_n FROM cells GROUP BY p),
    diag AS (SELECT g AS label, n AS tp FROM cells WHERE g = p),
    base AS (
        SELECT COALESCE(gold.label, pred.label) AS label,
               COALESCE(diag.tp, 0) AS tp,
               COALESCE(pred.pred_n, 0) - COALESCE(diag.tp, 0) AS fp,
               COALESCE(gold.gold_n, 0) - COALESCE(diag.tp, 0) AS fn,
               COALESCE(gold.gold_n, 0) AS support
        FROM gold
        FULL OUTER JOIN pred ON gold.label = pred.label
        LEFT JOIN diag ON COALESCE(gold.label, pred.label) = diag.label
    )
    SELECT label,
           CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CAST(support AS BIGINT) AS support,
           CASE WHEN tp + fp > 0 THEN
             CAST((tp * 1000000) // (tp + fp) AS BIGINT) END
             AS precision_ppm,
           CASE WHEN tp + fn > 0 THEN
             CAST((tp * 1000000) // (tp + fn) AS BIGINT) END
             AS recall_ppm,
           CASE WHEN 2 * tp + fp + fn > 0 THEN
             CAST((2 * tp * 1000000) // (2 * tp + fp + fn) AS BIGINT) END
             AS f1_ppm
    FROM base
    """


def ece(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Expected + maximum calibration error — the single numbers
    :func:`calibration_bins`' reliability curve rolls up to: ONE row
    ``(n, n_bins, ece_ppm, mce_ppm)`` where

        ECE = Σ_b (n_b/N)·|pos_rate_b − mean_score_b|,
        MCE = max_b |pos_rate_b − mean_score_b|

    over the same ``bins`` equal-width probability buckets.

    PURE integer arithmetic, sharper than summing the bins' rounded
    gaps: with micro-unit score sums ``sm_b`` and positives
    ``p_b``, each bin's weighted absolute gap is EXACTLY
    ``|p_b·10⁶ − sm_b|`` (the n_b factors cancel), so
    ``ece_ppm = (Σ_b |p_b·10⁶ − sm_b|) div N`` is a single floored
    division of exact integers — no per-bin rounding enters the sum
    at all. MCE takes each bin's floored ppm gap and maxes (exact
    comparisons of exact integers). NULL score/label rows drop;
    N = 0 yields an empty frame upstream of any division.

    Scale shape: one map-side-combinable hash agg to ≤ ``bins`` rows,
    one ≤ bins-row reduction. No window, no join.
    """
    if bins < 2:
        raise ValueError(f"ece: bins {bins} must be >= 2")
    micro = (F.col(score_col).cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    ok = F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    per_b = (
        df.filter(ok)
        .select(
            F.expr(
                f"least(CAST({bins - 1} AS BIGINT),"
                f" (CAST(CAST({score_col} AS DECIMAL(18,6)) * 1000000"
                f" AS BIGINT) * {bins}) div 1000000)"
            ).alias("__b"),
            micro.alias("__m"),
            (F.col(label_col) != 0).cast("long").alias("__pos"),
        )
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__pos").alias("__p"),
            F.sum(F.col("__m").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("__sm"),
        )
    )
    gap = F.abs(
        F.col("__p").cast("decimal(38,0)") * 1_000_000 - F.col("__sm")
    ).cast("decimal(38,0)")
    per_b = per_b.withColumn("__gap", gap)
    agg = per_b.agg(
        F.sum("__n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(F.col("__gap")).cast("decimal(38,0)").alias("__g"),
        F.max(
            F.expr("CAST(__gap div __n AS BIGINT)")
        ).alias("mce_ppm"),
    )
    return agg.select(
        "n",
        "n_bins",
        F.expr("CAST(__g div n AS BIGINT)").alias("ece_ppm"),
        F.col("mce_ppm").cast("bigint").alias("mce_ppm"),
    )


def ece_sql(
    select: str, score_col: str, label_col: str, bins: int = 10
) -> str:
    """DuckDB oracle of :func:`ece` — same micro lift, bin edges,
    exact integer gap sum and floored divisions."""
    m = f"CAST(CAST({score_col} AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    return f"""
    WITH rows_in AS ({select}),
    per_b AS (
        SELECT LEAST(CAST({int(bins) - 1} AS BIGINT),
                     ({m} * {int(bins)}) // 1000000) AS b,
               CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN {label_col} <> 0 THEN 1 ELSE 0 END)
                    AS HUGEINT) AS p,
               SUM(CAST({m} AS HUGEINT)) AS sm
        FROM rows_in
        WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
        GROUP BY b
    )
    SELECT CAST(SUM(n_b) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(abs(p * 1000000 - sm)) // SUM(n_b) AS BIGINT)
             AS ece_ppm,
           CAST(MAX(abs(p * 1000000 - sm) // n_b) AS BIGINT) AS mce_ppm
    FROM per_b
    """


def pr_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: str | None = None,
) -> DataFrame:
    """Average precision (area under the precision–recall curve, the
    step-interpolated sklearn ``average_precision_score`` form) —
    ``(group?, n_pos, n_neg, average_precision)``: the ranking
    certificate that, unlike :func:`roc_auc`, does not reward true
    negatives — THE metric for rare-positive retrieval (near-dup
    candidates, policy hits) where AUC saturates.

        AP = Σ_t (R(t) − R(t₋))·P(t)
           = Σ_v (tp_v / n_pos) · (cumtp_v / cumn_v)

    over distinct scores v descending (a whole tie class enters at
    one threshold — the tie-safe definition; trapezoids would
    overstate ties).

    Determinism: scores lift to integral micro-units and the
    cumulative runs on the distinct-score grain (bounded by the 6 dp
    resolution, the :func:`roc_auc` shape). Each threshold's
    ``tp_v·cumtp_v / cumn_v`` is ONE IEEE division of exact integers
    rounded to DECIMAL(38,12); the terms sum as decimals
    (order-independent — the anova_f per-term discipline) and the
    final ``/ n_pos`` rounds once to DECIMAL(18,6). NULL when a group
    has no positives.

    Scale shape: one corpus hash agg to the (group, micro-score)
    grain + one bounded-grain cumulative window + one group agg.
    """
    keys = [by] if by else []
    micro = (F.col(score_col).cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    ok = F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    g = (
        df.filter(ok)
        .select(
            *keys,
            micro.alias("__m"),
            (F.col(label_col) != 0).cast("long").alias("__pos"),
        )
        .groupBy(*keys, "__m")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("__c"),
            F.sum("__pos").cast("decimal(38,0)").alias("__p"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__m").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cumtp = F.sum("__p").over(w)
    cumn = F.sum("__c").over(w)
    term = (
        (F.col("__p") * cumtp).cast("double") / cumn.cast("double")
    ).cast("decimal(38,12)")
    agg = g.withColumn("__t", term).groupBy(*keys).agg(
        F.sum("__t").cast("decimal(38,12)").alias("__s"),
        F.sum(F.col("__p")).cast("decimal(38,0)").alias("__n1"),
        F.sum(F.col("__c")).cast("decimal(38,0)").alias("__n"),
    )
    from pybabe_spark.operators.sketch import _sdiv

    ap = _sdiv(
        F.col("__s").cast("double"), F.col("__n1").cast("double")
    )
    return agg.select(
        *keys,
        F.col("__n1").cast("bigint").alias("n_pos"),
        (F.col("__n") - F.col("__n1")).cast("bigint").alias("n_neg"),
        F.when(
            F.col("__n1") > 0,
            ap.cast("decimal(18,6)").cast("double"),
        ).alias("average_precision"),
    )


def pr_auc_sql(
    select: str, score_col: str, label_col: str, by: str | None = None
) -> str:
    """DuckDB oracle of :func:`pr_auc` — same micro grain, descending
    cumulative, DECIMAL(38,12) per-term rounding, 6 dp finish."""
    keys = f"{by}, " if by else ""
    part = f"PARTITION BY {by} " if by else ""
    gby = f"GROUP BY {keys.rstrip(', ')}" if by else ""
    m = f"CAST(CAST({score_col} AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    return f"""
    WITH rows_in AS ({select}),
    g AS (
        SELECT {keys}{m} AS v,
               CAST(COUNT(*) AS HUGEINT) AS c,
               CAST(SUM(CASE WHEN {label_col} <> 0 THEN 1 ELSE 0 END)
                    AS HUGEINT) AS p
        FROM rows_in
        WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
        GROUP BY {keys}v
    ),
    cum AS (
        SELECT {keys}p,
               SUM(p) OVER w AS cumtp,
               SUM(c) OVER w AS cumn
        FROM g
        WINDOW w AS ({part}ORDER BY v DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    agg AS (
        SELECT {keys}
               SUM(CAST(CAST(p * cumtp AS DOUBLE) / CAST(cumn AS DOUBLE)
                        AS DECIMAL(38,12))) AS s
        FROM cum {gby}
    ),
    tot AS (
        SELECT {keys}CAST(SUM(c) AS HUGEINT) AS n, SUM(p) AS n1
        FROM g {gby}
    )
    SELECT {keys}CAST(tot.n1 AS BIGINT) AS n_pos,
           CAST(tot.n - tot.n1 AS BIGINT) AS n_neg,
           CASE WHEN tot.n1 > 0 THEN
             CAST(CAST(CAST(agg.s AS DOUBLE) / CAST(tot.n1 AS DOUBLE)
                  AS DECIMAL(18,6)) AS DOUBLE) END AS average_precision
    FROM tot {"JOIN agg USING (" + by + ")" if by else "CROSS JOIN agg"}
    """


def mcc(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Matthews correlation coefficient for a binary classifier — the
    single balanced number precision/recall/F1 each miss (F1 ignores
    true negatives entirely; MCC is the full-confusion-matrix
    correlation, robust to class imbalance): ONE row
    ``(tp, fp, fn, tn, mcc)`` with

        MCC = (tp·tn − fp·fn)
              / (√(tp+fp) · √(tp+fn) · √(tn+fp) · √(tn+fn))

    Exact bigint cells from one conditional pass; the numerator is an
    exact DECIMAL(38,0) product difference cast to double ONCE, and
    the denominator multiplies four separate square roots instead of
    rooting the 4-way product — (tp+fp)(tp+fn)(tn+fp)(tn+fn) ~ n⁴
    would overflow DECIMAL(38,0) past ~10⁹ rows, while each factor
    stays a bigint at any scale (the fixed shape the oracle mirrors
    exactly). Rounded once to DECIMAL(18,6). NULL when any margin is
    zero (a constant truth or prediction carries no correlation).
    Labels/predictions are truthy-cast (nonzero/true = positive).

    Scale shape: one map-side-combinable aggregation, 1-row finish.
    """
    y = F.col(label_col).cast("boolean")
    p = F.col(pred_col).cast("boolean")
    ok = y.isNotNull() & p.isNotNull()
    cell = lambda c: F.sum(  # noqa: E731
        F.when(c, F.lit(1)).otherwise(F.lit(0))
    ).cast("bigint")
    agg = df.filter(ok).agg(
        cell(y & p).alias("tp"),
        cell(~y & p).alias("fp"),
        cell(y & ~p).alias("fn"),
        cell(~y & ~p).alias("tn"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = (d("tp") * F.col("tn") - d("fp") * F.col("fn")).cast("double")
    root = lambda a, b: F.sqrt(  # noqa: E731
        (F.col(a) + F.col(b)).cast("double")
    )
    den = (
        root("tp", "fp") * root("tp", "fn")
        * root("tn", "fp") * root("tn", "fn")
    )
    okm = (
        (F.col("tp") + F.col("fp") > 0)
        & (F.col("tp") + F.col("fn") > 0)
        & (F.col("tn") + F.col("fp") > 0)
        & (F.col("tn") + F.col("fn") > 0)
    )
    from pybabe_spark.operators.sketch import _sdiv

    return agg.select(
        "tp", "fp", "fn", "tn",
        F.when(okm, _sdiv(num, den).cast("decimal(18,6)").cast("double"))
        .alias("mcc"),
    )


def mcc_sql(select: str, label_col: str, pred_col: str) -> str:
    """DuckDB oracle of :func:`mcc` — same exact cells, HUGEINT
    numerator, the identical four-root denominator shape."""
    num = (
        "CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn"
        " AS DOUBLE)"
    )
    den = (
        "(sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE))"
        " * sqrt(CAST(tn + fp AS DOUBLE))"
        " * sqrt(CAST(tn + fn AS DOUBLE)))"
    )
    return f"""
    WITH rows_in AS ({select}),
    cells AS (
        SELECT
          CAST(SUM(CASE WHEN y AND p THEN 1 ELSE 0 END) AS BIGINT)
            AS tp,
          CAST(SUM(CASE WHEN NOT y AND p THEN 1 ELSE 0 END) AS BIGINT)
            AS fp,
          CAST(SUM(CASE WHEN y AND NOT p THEN 1 ELSE 0 END) AS BIGINT)
            AS fn,
          CAST(SUM(CASE WHEN NOT y AND NOT p THEN 1 ELSE 0 END)
               AS BIGINT) AS tn
        FROM (SELECT CAST({label_col} AS BOOLEAN) AS y,
                     CAST({pred_col} AS BOOLEAN) AS p
              FROM rows_in) t
        WHERE y IS NOT NULL AND p IS NOT NULL
    )
    SELECT tp, fp, fn, tn,
           CASE WHEN tp + fp > 0 AND tp + fn > 0
                 AND tn + fp > 0 AND tn + fn > 0 THEN
             CAST(CAST({num} / {den} AS DECIMAL(18,6)) AS DOUBLE)
           END AS mcc
    FROM cells
    """


def brier_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Brier score + skill — the single-number calibration certificate
    next to :func:`calibration_bins`'s per-bin curve: ONE row
    ``(n, n_pos, brier_ppm, base_rate_ppm, skill_ppm)`` where

        BS  = mean (score − label)²            (0 best, 1 worst)
        BSS = 1 − BS / (p̄(1−p̄))               (vs always-predict-p̄)

    All-integer arithmetic end to end: scores lift to exact micro-units
    (the calibration_bins rule), each residual ``(m − label·10⁶)²`` is
    an exact integer, and every output is a floored integral ppm —
    ``skill_ppm`` via ``10⁶ − (Σ·n) div (r·(n−r)·10⁶)`` with the
    squared micro scale folded in exactly. NULL rows drop; labels are 0/1 via
    ``label != 0``. Skill is NULL when the base rate is degenerate
    (r = 0 or r = n). One map-side-combinable aggregation.
    """
    micro = (F.col(score_col).cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    ok = F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    pos = (F.col(label_col) != 0).cast("long")
    res = micro - pos * 1_000_000
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = df.filter(ok).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(pos), F.lit(0)).cast("bigint").alias("n_pos"),
        F.coalesce(F.sum(d(res) * res), F.lit(0))
        .cast("decimal(38,0)")
        .alias("__ss"),
    )
    return agg.select(
        "n",
        "n_pos",
        F.when(
            F.col("n") > 0,
            F.expr("CAST(__ss div (CAST(n AS DECIMAL(38,0)) * 1000000)"
                   " AS BIGINT)"),
        ).alias("brier_ppm"),
        F.when(
            F.col("n") > 0,
            F.expr("CAST(n_pos * 1000000 div n AS BIGINT)"),
        ).alias("base_rate_ppm"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_pos") < F.col("n")),
            # `div` (not `/`): Spark decimal `/` rounds HALF_UP while
            # the oracle's `//` floors — the quotient here is always
            # ≥ 0, where truncation and floor agree
            F.expr(
                "1000000 - CAST((__ss * n) div"
                " (CAST(n_pos AS DECIMAL(38,0)) * (n - n_pos)"
                " * 1000000) AS BIGINT)"
            ),
        ).alias("skill_ppm"),
    )


def brier_score_sql(select: str, score_col: str, label_col: str) -> str:
    """DuckDB oracle of :func:`brier_score` — same micro residuals,
    same floored integral ppm."""
    m = f"CAST(CAST({score_col} AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    pos = f"(CASE WHEN {label_col} != 0 THEN 1 ELSE 0 END)"
    return f"""
    WITH agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               COALESCE(CAST(SUM({pos}) AS BIGINT), 0) AS n_pos,
               COALESCE(SUM(CAST({m} - {pos} * 1000000 AS HUGEINT)
                            * ({m} - {pos} * 1000000)), 0) AS ss
        FROM ({select})
        WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
    )
    SELECT n, n_pos,
           CASE WHEN n > 0 THEN
             CAST(ss // (n::HUGEINT * 1000000) AS BIGINT)
           END AS brier_ppm,
           CASE WHEN n > 0 THEN
             CAST((n_pos * 1000000) // n AS BIGINT)
           END AS base_rate_ppm,
           CASE WHEN n_pos > 0 AND n_pos < n THEN
             CAST(1000000 - (ss * n)
                  // (n_pos::HUGEINT * (n - n_pos) * 1000000)
                  AS BIGINT)
           END AS skill_ppm
    FROM agg
    """


def disparate_impact(
    df: DataFrame,
    group_col: str,
    pred_col: str,
    min_n: int = 20,
) -> DataFrame:
    """Disparate-impact fairness report for a binary decision column —
    the selection-rate parity check a training-data FILTER needs as
    much as a model does (a length filter "keeps" CJK documents at a
    fraction of the English rate; this table is where that shows up).
    One row per group with ≥ ``min_n`` decided rows:

    - ``n`` / ``n_pos`` / ``pos_rate_ppm`` — exact selection rate
    - ``di_ppm`` — the group's rate as a floored-ppm RATIO of the
      highest-rate qualifying group (the reference group convention)
    - ``below_four_fifths`` — the EEOC 80% rule-of-thumb flag

    All integer arithmetic (rates and the ratio are floored ppm of
    exact counts); NULL group or prediction rows drop; groups under
    ``min_n`` are excluded from BOTH the report and the reference
    (small-cell rates are noise, and letting one tiny group set the
    reference would flag everyone). Scale shape: one hash agg to the
    group grain + a 1-row max attach.
    """
    if min_n < 1:
        raise ValueError(f"disparate_impact: min_n {min_n} must be >= 1")
    from pybabe_spark.operators._util import attach_scalars

    ok = F.col(group_col).isNotNull() & F.col(pred_col).isNotNull()
    pos = (F.col(pred_col) != 0).cast("long")
    groups = (
        df.filter(ok)
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.coalesce(F.sum(pos), F.lit(0)).cast("bigint").alias("n_pos"),
        )
        .filter(F.col("n") >= min_n)
        .withColumn(
            "pos_rate_ppm",
            F.expr("CAST(n_pos * 1000000 div n AS BIGINT)"),
        )
    )
    ref = groups.agg(F.max("pos_rate_ppm").alias("__ref"))
    out = attach_scalars(groups, ref).select(
        "group",
        "n",
        "n_pos",
        "pos_rate_ppm",
        F.when(
            F.col("__ref") > 0,
            F.expr("CAST(pos_rate_ppm * 1000000 div __ref AS BIGINT)"),
        ).alias("di_ppm"),
        F.when(
            F.col("__ref") > 0,
            F.expr("pos_rate_ppm * 1000000 div __ref") < 800_000,
        ).alias("below_four_fifths"),
    )
    return out


def disparate_impact_sql(
    select: str, group_col: str, pred_col: str, min_n: int = 20
) -> str:
    """DuckDB oracle of :func:`disparate_impact` — same exact counts,
    min_n gate, reference max, and floored ppm ratio."""
    pos = f"(CASE WHEN {pred_col} != 0 THEN 1 ELSE 0 END)"
    return f"""
    WITH groups AS (
        SELECT {group_col} AS "group",
               CAST(COUNT(*) AS BIGINT) AS n,
               COALESCE(CAST(SUM({pos}) AS BIGINT), 0) AS n_pos
        FROM ({select})
        WHERE {group_col} IS NOT NULL AND {pred_col} IS NOT NULL
        GROUP BY {group_col}
        HAVING COUNT(*) >= {int(min_n)}
    ),
    rated AS (
        SELECT *, CAST((n_pos * 1000000) // n AS BIGINT) AS pos_rate_ppm
        FROM groups
    ),
    ref AS (SELECT MAX(pos_rate_ppm) AS ref FROM rated)
    SELECT "group", n, n_pos, pos_rate_ppm,
           CASE WHEN ref > 0 THEN
             CAST((pos_rate_ppm * 1000000) // ref AS BIGINT)
           END AS di_ppm,
           CASE WHEN ref > 0 THEN
             (pos_rate_ppm * 1000000) // ref < 800000
           END AS below_four_fifths
    FROM rated CROSS JOIN ref
    """


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: str | None = None,
) -> DataFrame:
    """Exact tie-corrected ROC-AUC per group: ``(group?, n_pos, n_neg,
    auc_ppm)`` — the threshold-free ranking certificate
    (:func:`classification_report` grades ONE threshold;
    :func:`calibration_bins` grades probability VALUES; this grades the
    ORDERING). Computed through the rank-sum identity
    ``AUC = (R₁ − n₁(n₁+1)/2) / (n₁·n₀)`` with average ranks for
    ties — the Mann–Whitney U view, so ties cost exactly half a
    concordance, matching sklearn's trapezoidal ``roc_auc_score``.

    Exactness: scores lift to integral micro-units (6 dp — their
    resolution as probabilities, the :func:`calibration_bins`
    convention), so the value grain is an integer key; doubled average
    ranks ``2·R = Σ_v p_v·(2·cum_before_v + c_v + 1)`` stay integers;
    the finish is one floored integral-ppm division in DECIMAL(38,0).
    No IEEE arithmetic anywhere. Degenerate groups (no positives or no
    negatives) report NULL auc_ppm.

    Scale shape: ONE corpus-scale hash agg to the (group, distinct
    micro-score) grain; the cumulative window runs on that grain,
    which is BOUNDED by the 6 dp score resolution (≤ 1e6+1 rows per
    group) — never corpus-sized, so even the keyless window is safe.
    """
    keys = [by] if by else []
    micro = (F.col(score_col).cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    ok = F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    g = (
        df.filter(ok)
        .select(
            *keys,
            micro.alias("__m"),
            (F.col(label_col) != 0).cast("long").alias("__pos"),
        )
        .groupBy(*keys, "__m")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("__c"),
            F.sum("__pos").cast("decimal(38,0)").alias("__p"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("__m")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cb = F.coalesce(F.sum("__c").over(w), F.lit(0).cast("decimal(38,0)"))
    term = F.col("__p") * (
        F.lit(2).cast("decimal(38,0)") * cb + F.col("__c") + F.lit(1)
    )
    agg = g.withColumn("__t", term).groupBy(*keys).agg(
        F.sum("__t").cast("decimal(38,0)").alias("__s2"),
        F.sum("__p").cast("decimal(38,0)").alias("__n1"),
        F.sum("__c").cast("decimal(38,0)").alias("__n"),
    )
    n0 = F.col("__n") - F.col("__n1")
    num = (
        F.lit(1_000_000).cast("decimal(38,0)")
        * (F.col("__s2") - F.col("__n1") * (F.col("__n1") + F.lit(1)))
    )
    den = F.lit(2).cast("decimal(38,0)") * F.col("__n1") * n0
    return agg.select(
        *keys,
        F.col("__n1").cast("bigint").alias("n_pos"),
        n0.cast("bigint").alias("n_neg"),
        F.when(
            (F.col("__n1") > 0) & (n0 > 0),
            # pmod-floor: Spark decimal division ROUNDS to its result
            # scale before a bigint cast could truncate — subtracting
            # the mod first makes the quotient integral, so no rounding
            # can fire and the result is the exact floor DuckDB's //
            # computes
            ((num - F.pmod(num, den)) / den).cast("bigint"),
        ).alias("auc_ppm"),
    )


def roc_auc_sql(
    select: str,
    score_col: str,
    label_col: str,
    by: str | None = None,
) -> str:
    """DuckDB oracle of :func:`roc_auc` — same micro lift, value-grain
    cumulative counts, HUGEINT rank-sum identity, floored ppm."""
    keys = f"{by}, " if by else ""
    grp = f"GROUP BY {by}" if by else ""
    part = f"PARTITION BY {by}" if by else ""
    return f"""
    WITH rows_in AS ({select}),
    g AS (
      SELECT {keys}
             CAST(CAST({score_col} AS DECIMAL(18,6)) * 1000000 AS BIGINT)
               AS m,
             CAST(COUNT(*) AS HUGEINT) AS c,
             CAST(SUM(CASE WHEN {label_col} <> 0 THEN 1 ELSE 0 END)
                  AS HUGEINT) AS p
      FROM rows_in
      WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
      GROUP BY {keys}m
    ),
    cum AS (
      SELECT *, COALESCE(SUM(c) OVER ({part} ORDER BY m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS cb
      FROM g
    ),
    agg AS (
      SELECT {keys}SUM(p * (2 * cb + c + 1)) AS s2,
             SUM(p) AS n1, SUM(c) AS n
      FROM cum {grp}
    )
    SELECT {keys}CAST(n1 AS BIGINT) AS n_pos,
           CAST(n - n1 AS BIGINT) AS n_neg,
           CASE WHEN n1 > 0 AND n - n1 > 0 THEN
             CAST((1000000 * (s2 - n1 * (n1 + 1)))
                  // (2 * n1 * (n - n1)) AS BIGINT)
           END AS auc_ppm
    FROM agg
    """


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
    by: str | None = None,
) -> DataFrame:
    """Decile gains/lift table per group: rows ranked by score
    DESCENDING into ``n_buckets`` equal-population buckets, then per
    bucket ``(group?, bucket, n, n_pos, cum_n, cum_pos, capture_ppm,
    lift_ppm)`` — "mail the top 2 deciles, capture 61% of responders
    at 3.1× lift", the campaign-targeting readout AUC compresses away.
    ``capture_ppm`` = cumulative share of ALL positives found so far;
    ``lift_ppm`` = cumulative precision over the base rate. Both
    floored integral ppm; NULL when the group has no positives.

    Ranking is made deterministic WITHOUT a global sort (the
    de-globalized rank machinery): scores lift to 6 dp micro-units;
    per distinct (group, micro) the cumulative count of STRICTLY
    HIGHER scores comes from a window over the bounded distinct-score
    grain; within a tied score, rows order by ``id_col`` via a window
    PARTITIONED BY the (group, score) cell — so no partition exceeds
    the largest tie class and no engine-dependent tie order exists.
    That determinism REQUIRES ``id_col`` to be unique within each
    (group, score) tie cell; an in-plan guard raises on duplicate ids
    rather than silently emitting engine-dependent buckets.
    ``rank = higher + row_number_within_tie``; ``bucket = ((rank−1) ·
    n_buckets) div n + 1`` (ntile's exact arithmetic).

    Scale shape: one hash agg to the distinct-score grain, one
    cell-partitioned row_number, one tiny per-group totals join, one
    ≤ n_buckets-row cumulative. Corpus-scale work is linear.
    """
    if n_buckets < 2:
        raise ValueError(f"gains_table: n_buckets {n_buckets} must be >= 2")
    keys = [by] if by else []
    micro = (F.col(score_col).cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    ok = (
        F.col(score_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(id_col).isNotNull()
    )
    base = df.filter(ok).select(
        *keys,
        micro.alias("__m"),
        (F.col(label_col) != 0).cast("long").alias("__pos"),
        F.col(id_col).alias("__id"),
    )
    grain = base.groupBy(*keys, "__m").agg(
        F.count(F.lit(1)).alias("__c")
    )
    from pyspark.sql import Window

    w_hi = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__m").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grain = grain.withColumn(
        "__higher", F.coalesce(F.sum("__c").over(w_hi), F.lit(0))
    )
    totals = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__pos").alias("__tp"),
    )
    w_tie = Window.partitionBy(*keys, "__m").orderBy("__id")
    ranked = (
        base.join(grain, [*keys, "__m"])
        .join(F.broadcast(totals), keys) if keys else
        base.join(grain, ["__m"]).crossJoin(F.broadcast(totals))
    )
    # duplicate ids inside a tie cell leave row_number() ORDER BY __id
    # engine/shuffle-dependent — fail loudly instead of emitting
    # nondeterministic buckets (the vocab_overlap guard idiom); the
    # guard window shares w_tie's partitioning, no extra shuffle
    dup_msg = (
        "gains_table: id_col has duplicate values within a "
        "(group, score) tie cell — tie order and bucket assignment "
        "would be nondeterministic; deduplicate or pass a unique id"
    )
    w_dup = Window.partitionBy(*keys, "__m", "__id")
    ranked = ranked.withColumn(
        "__idc", F.count(F.lit(1)).over(w_dup)
    ).filter(
        F.when(
            F.col("__idc") > 1,
            F.raise_error(F.lit(dup_msg)).cast("boolean"),
        ).otherwise(F.lit(True))
    ).drop("__idc")
    ranked = ranked.withColumn(
        "__rank", F.col("__higher") + F.row_number().over(w_tie)
    ).withColumn(
        "bucket",
        F.expr(f"((__rank - 1) * {int(n_buckets)}) div __n + 1"),
    )
    per = ranked.groupBy(*keys, "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__pos").cast("bigint").alias("n_pos"),
        F.first("__n").alias("__n"),
        F.first("__tp").alias("__tp"),
    )
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    per = per.withColumn(
        "cum_n", F.sum("n").over(w_cum).cast("bigint")
    ).withColumn("cum_pos", F.sum("n_pos").over(w_cum).cast("bigint"))
    return per.select(
        *keys,
        F.col("bucket").cast("int"),
        "n", "n_pos", "cum_n", "cum_pos",
        F.when(
            F.col("__tp") > 0,
            F.expr("CAST(cum_pos * 1000000 div __tp AS BIGINT)"),
        ).alias("capture_ppm"),
        F.when(
            F.col("__tp") > 0,
            # DECIMAL(38,0) + pmod-floor: the cum_pos·n·1e6 product
            # overflows BIGINT past ~3e6 rows, and Spark decimal
            # division would HALF_UP-round where DuckDB // floors
            F.expr(
                "CAST(("
                " CAST(cum_pos AS DECIMAL(38,0)) * __n * 1000000"
                " - pmod(CAST(cum_pos AS DECIMAL(38,0)) * __n * 1000000,"
                "        CAST(cum_n AS DECIMAL(38,0)) * __tp)"
                ") / (CAST(cum_n AS DECIMAL(38,0)) * __tp) AS BIGINT)"
            ),
        ).alias("lift_ppm"),
    )


def gains_table_sql(
    select: str,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
    by: str | None = None,
) -> str:
    """DuckDB oracle of :func:`gains_table` — identical micro lift,
    higher-count window, tie order by id, ntile arithmetic, floored
    ppm cumulatives."""
    k = int(n_buckets)
    keys = f"{by}, " if by else ""
    part = f"PARTITION BY {by}" if by else ""
    comma_part = f"PARTITION BY {by}," if by else "PARTITION BY"
    grp = f"GROUP BY {by}" if by else ""
    join_keys = f"USING ({by}, m)" if by else "USING (m)"
    tot_join = f"USING ({by})" if by else "ON TRUE"
    return f"""
    WITH rows_in AS ({select}),
    base AS (
      SELECT {keys}
             CAST(CAST({score_col} AS DECIMAL(18,6)) * 1000000 AS BIGINT)
               AS m,
             CASE WHEN {label_col} <> 0 THEN 1 ELSE 0 END AS pos,
             {id_col} AS id
      FROM rows_in
      WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
        AND {id_col} IS NOT NULL
    ),
    grain AS (
      SELECT {keys}m, COUNT(*) AS c FROM base GROUP BY {keys}m
    ),
    cum AS (
      SELECT *, COALESCE(SUM(c) OVER ({part} ORDER BY m DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS higher
      FROM grain
    ),
    totals AS (
      SELECT {keys}COUNT(*) AS tot_n, SUM(pos) AS tot_p
      FROM base {grp}
    ),
    ranked AS (
      SELECT base.*, cum.higher, totals.tot_n, totals.tot_p,
             cum.higher + ROW_NUMBER() OVER
               ({comma_part} m ORDER BY id) AS rnk
      FROM base JOIN cum {join_keys} JOIN totals {tot_join}
    ),
    per AS (
      SELECT {keys}((rnk - 1) * {k}) // tot_n + 1 AS bucket,
             COUNT(*) AS n, SUM(pos) AS n_pos,
             ANY_VALUE(tot_n) AS tot_n, ANY_VALUE(tot_p) AS tot_p
      FROM ranked GROUP BY {keys}bucket
    ),
    cumb AS (
      SELECT *,
             SUM(n) OVER ({part} ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
             SUM(n_pos) OVER ({part} ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
      FROM per
    )
    SELECT {keys}CAST(bucket AS INT) AS bucket,
           CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           CAST(cum_n AS BIGINT) AS cum_n,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CASE WHEN tot_p > 0 THEN
             CAST(cum_pos * 1000000 // tot_p AS BIGINT) END AS capture_ppm,
           CASE WHEN tot_p > 0 THEN
             CAST((CAST(cum_pos AS HUGEINT) * tot_n * 1000000)
                  // (CAST(cum_n AS HUGEINT) * tot_p) AS BIGINT)
           END AS lift_ppm
    FROM cumb
    """


def hosmer_lemeshow(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
    chi2_crit: float | None = None,
) -> DataFrame:
    """Hosmer–Lemeshow goodness-of-fit over the same fixed-width score
    bins as :func:`calibration_bins`: the inferential companion to the
    reliability curve — is the observed/expected gap LARGER than
    chance, ``HL = Σ_g n_g(O_g − E_g)² / (E_g(n_g − E_g))`` vs
    χ²(bins−2)? ONE output row ``(bins_occupied, n, hl_chi2_ppm,
    hl_chi2[, significant])``.

    Exactness: scores lift to exact micro-units before binning (the
    calibration_bins contract), so with ``O_m = 10⁶·O_g`` and
    ``E_m = Σ micro-scores``, each bin's term is the PURE INTEGER
    ratio ``n_g·(O_m − E_m)² / (E_m·(10⁶·n_g − E_m))`` — emitted as
    exact integral ppm per bin and summed as integers: no IEEE
    anywhere, the whole statistic is engine-identical by construction.
    Magnitude contract: ``n_g·(O_m−E_m)²·10⁶`` within DECIMAL(38,0) —
    holds through ~10⁶ rows per bin; beyond that raise ``bins``.
    HL is NULL when any occupied bin has E_m = 0 or E_m = 10⁶·n_g
    (degenerate expected rate — the classical applicability bound).

    Scale shape: ONE map-side-combinable hash agg to ≤ ``bins`` rows
    plus a ≤ ``bins``-row finish.
    """
    if bins < 3:
        raise ValueError(f"hosmer_lemeshow: bins {bins} must be >= 3")
    micro = (F.col(score_col).cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    ok = F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    binned = df.filter(ok).select(
        F.expr(
            f"least(CAST({bins - 1} AS BIGINT),"
            f" (CAST(CAST({score_col} AS DECIMAL(18,6)) * 1000000"
            f" AS BIGINT) * {bins}) div 1000000)"
        ).alias("__b"),
        micro.alias("__m"),
        (F.col(label_col) != 0).cast("long").alias("__pos"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = binned.groupBy("__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__pos").cast("bigint").alias("__o"),
        F.sum(d(F.col("__m"))).cast("decimal(38,0)").alias("__em"),
    )
    om = d(F.col("__o") * 1_000_000)
    nm = d(F.col("__n") * 1_000_000)
    diff = d(om - F.col("__em"))
    den = d(F.col("__em") * (nm - F.col("__em")))
    term = F.expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * __n * __diff * __diff)"
        " div __den"
    )
    per = (
        per.withColumn("__diff", diff)
        .withColumn("__den", den)
        .withColumn(
            "__term",
            F.when(F.col("__den") != 0, term).cast("decimal(38,0)"),
        )
    )
    one = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("bins_occupied"),
        F.sum("__n").cast("bigint").alias("n"),
        F.sum(F.when(F.col("__den") == 0, 1).otherwise(0)).alias(
            "__bad"
        ),
        F.coalesce(F.sum("__term"), F.lit(0))
        .cast("decimal(38,0)")
        .alias("__hl"),
    )
    ppm = F.when(F.col("__bad") == 0, F.col("__hl")).cast("bigint")
    cols = [
        F.col("bins_occupied"),
        F.col("n"),
        ppm.alias("hl_chi2_ppm"),
        (ppm.cast("double") / 1e6).alias("hl_chi2"),
    ]
    if chi2_crit is not None:
        crit_ppm = int(round(float(chi2_crit) * 1e6))
        cols.append(
            F.when(ppm.isNotNull(), ppm > F.lit(crit_ppm))
            .otherwise(F.lit(False))
            .alias("significant")
        )
    return one.select(*cols)


def hosmer_lemeshow_sql(
    select: str,
    score_col: str,
    label_col: str,
    bins: int = 10,
    chi2_crit: float | None = None,
) -> str:
    """DuckDB oracle of :func:`hosmer_lemeshow` — same micro lift and
    integer bin edges, same all-integer per-bin term and ppm sum."""
    m = f"CAST(CAST({score_col} AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    sig = ""
    if chi2_crit is not None:
        crit_ppm = int(round(float(chi2_crit) * 1e6))
        sig = (
            ", COALESCE(CASE WHEN bad = 0 THEN hl > "
            f"{crit_ppm} END, FALSE) AS significant"
        )
    return f"""
    WITH rows_in AS ({select}),
    binned AS (
        SELECT LEAST({bins - 1}, ({m} * {bins}) // 1000000) AS b,
               {m} AS mval,
               CASE WHEN {label_col} <> 0 THEN 1 ELSE 0 END AS pos
        FROM rows_in
        WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
    ),
    per AS (
        SELECT b, COUNT(*)::HUGEINT AS n,
               SUM(pos)::HUGEINT AS o,
               SUM(CAST(mval AS HUGEINT)) AS em
        FROM binned GROUP BY b
    ),
    terms AS (
        SELECT n, (o * 1000000 - em) AS diff,
               em * (n * 1000000 - em) AS den
        FROM per
    ),
    one AS (
        SELECT COUNT(*)::BIGINT AS bins_occupied,
               CAST(SUM(n) AS BIGINT) AS n,
               SUM(CASE WHEN den = 0 THEN 1 ELSE 0 END) AS bad,
               COALESCE(SUM(CASE WHEN den <> 0 THEN
                 (1000000::HUGEINT * n * diff * diff) // den END), 0)
                 AS hl
        FROM terms
    )
    SELECT bins_occupied, n,
           CAST(CASE WHEN bad = 0 THEN hl END AS BIGINT) AS hl_chi2_ppm,
           CAST(CAST(CASE WHEN bad = 0 THEN hl END AS BIGINT)
                AS DOUBLE) / 1e6 AS hl_chi2{sig}
    FROM one
    """


def pairwise_winrate(
    df: DataFrame,
    item_a_col: str,
    item_b_col: str,
    outcome_col: str,
    z_crit: float | None = None,
) -> DataFrame:
    """Pairwise win-rate matrix with sign-test verdicts — the
    arena-style eval readout (which model/variant beats which, and is
    the edge real): input rows are comparisons ``(item_a, item_b,
    outcome)`` with outcome > 0 an A-win, < 0 a B-win, 0 a tie;
    output one row per ORDERED observed pair: ``(item_a, item_b, n,
    wins, losses, ties, win_rate_ppm, z[, significant])``.

    ``win_rate_ppm`` is the exact integral ppm of wins/(wins+losses)
    (ties excluded, the sign-test convention; NULL when no decisive
    comparisons). z is the continuity-corrected sign-test normal score
    ``(|w − d/2| − 1/2)/(√d/2)`` signed toward the winner, one
    fixed-shape IEEE expression rounded once — NULL when d = 0.

    Determinism: counts are integers; the single IEEE step rounds
    once (house convention). Pairs are kept AS GIVEN (A vs B and
    B vs A are different experiment orientations — mirror upstream if
    you want them folded).

    Scale shape: ONE map-side-combinable hash agg to the pair grain —
    the 100 TB plan is the partial-agg plan.
    """
    ok = (
        F.col(item_a_col).isNotNull()
        & F.col(item_b_col).isNotNull()
        & F.col(outcome_col).isNotNull()
    )
    o = F.col(outcome_col)
    agg = (
        df.filter(ok)
        .groupBy(
            F.col(item_a_col).alias("item_a"),
            F.col(item_b_col).alias("item_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((o > 0).cast("long")).cast("bigint").alias("wins"),
            F.sum((o < 0).cast("long")).cast("bigint").alias("losses"),
            F.sum((o == 0).cast("long")).cast("bigint").alias("ties"),
        )
    )
    w = F.col("wins")
    l_ = F.col("losses")
    dd = (w + l_).cast("double")
    ppm = F.when(
        w + l_ > 0,
        F.expr("CAST(wins * 1000000 div (wins + losses) AS BIGINT)"),
    )
    sign = F.when(w >= l_, F.lit(1.0)).otherwise(F.lit(-1.0))
    zraw = (
        sign
        * (F.abs((w - l_).cast("double")) / 2.0 - 0.5)
        / (F.sqrt(dd) / 2.0)
    )
    out = lambda e: e.cast("decimal(18,6)").cast("double")  # noqa: E731
    z = F.when(w + l_ > 0, out(zraw))
    cols = [
        "item_a", "item_b", "n", "wins", "losses", "ties",
        ppm.alias("win_rate_ppm"),
        z.alias("z"),
    ]
    if z_crit is not None:
        cols.append(
            F.coalesce(
                F.when(w + l_ > 0, F.abs(z) > float(z_crit)),
                F.lit(False),
            ).alias("significant")
        )
    return agg.select(*cols)


def pairwise_winrate_sql(
    select: str,
    item_a_col: str,
    item_b_col: str,
    outcome_col: str,
    z_crit: float | None = None,
) -> str:
    """DuckDB oracle of :func:`pairwise_winrate` — same pair counts,
    same exact ppm and once-rounded continuity-corrected z."""
    r6 = lambda e: f"CAST(CAST({e} AS DECIMAL(18,6)) AS DOUBLE)"  # noqa: E731
    zraw = (
        "(CASE WHEN wins >= losses THEN 1.0 ELSE -1.0 END"
        " * (abs(CAST(wins - losses AS DOUBLE)) / 2.0 - 0.5)"
        " / (sqrt(CAST(wins + losses AS DOUBLE)) / 2.0))"
    )
    z = f"CASE WHEN wins + losses > 0 THEN {r6(zraw)} END"
    sig = ""
    if z_crit is not None:
        sig = (
            f", COALESCE(abs({z}) > {float(z_crit)}, FALSE)"
            " AS significant"
        )
    return f"""
    WITH rows_in AS ({select}),
    agg AS (
        SELECT {item_a_col} AS item_a, {item_b_col} AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN {outcome_col} > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS wins,
               CAST(SUM(CASE WHEN {outcome_col} < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS losses,
               CAST(SUM(CASE WHEN {outcome_col} = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS ties
        FROM rows_in
        WHERE {item_a_col} IS NOT NULL AND {item_b_col} IS NOT NULL
          AND {outcome_col} IS NOT NULL
        GROUP BY item_a, item_b
    )
    SELECT item_a, item_b, n, wins, losses, ties,
           CASE WHEN wins + losses > 0 THEN
             CAST(wins * 1000000 // (wins + losses) AS BIGINT)
           END AS win_rate_ppm,
           {z} AS z{sig}
    FROM agg
    """


def equalized_odds(
    df: DataFrame,
    group_col: str,
    label_col: str,
    pred_col: str,
    min_n: int = 20,
    gap_ppm: int = 100_000,
) -> DataFrame:
    """Equalized-odds fairness report for a binary decision —
    :func:`disparate_impact` checks selection RATES; this checks
    selection ERRORS: does the filter catch true positives (TPR) and
    spare true negatives (FPR) at the same rate in every group? A
    length filter can keep 40% of every language (passing the
    four-fifths test) while keeping the GOOD documents of one
    language and the junk of another — only the (TPR, FPR) pair sees
    that. One row per group with ≥ ``min_n`` positive AND ≥ ``min_n``
    negative labeled rows:

    ``(group, n_pos, n_neg, tpr_ppm, fpr_ppm, tpr_gap_ppm,
    fpr_gap_ppm, violated)``

    - ``tpr_gap_ppm`` — best (max) qualifying TPR minus this group's
    - ``fpr_gap_ppm`` — this group's FPR minus the best (min)
      qualifying FPR
    - ``violated`` — either gap exceeds ``gap_ppm`` (default 10 pts)

    All integer arithmetic on exact counts (floored ppm); NULL
    group/label/pred rows drop; under-supported groups are excluded
    from the report AND the reference extremes (the
    :func:`disparate_impact` small-cell convention). Scale shape: one
    hash agg to the group grain + a 1-row extremes attach.
    """
    if min_n < 1:
        raise ValueError(f"equalized_odds: min_n {min_n} must be >= 1")
    from pybabe_spark.operators._util import attach_scalars

    ok = (
        F.col(group_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(pred_col).isNotNull()
    )
    pos = F.col(label_col) != 0
    hit = F.col(pred_col) != 0
    groups = (
        df.filter(ok)
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.coalesce(F.sum(pos.cast("long")), F.lit(0))
            .cast("bigint")
            .alias("n_pos"),
            F.coalesce(F.sum((~pos).cast("long")), F.lit(0))
            .cast("bigint")
            .alias("n_neg"),
            F.coalesce(F.sum((pos & hit).cast("long")), F.lit(0))
            .cast("bigint")
            .alias("__tp"),
            F.coalesce(F.sum(((~pos) & hit).cast("long")), F.lit(0))
            .cast("bigint")
            .alias("__fp"),
        )
        .filter((F.col("n_pos") >= min_n) & (F.col("n_neg") >= min_n))
        .withColumn(
            "tpr_ppm",
            F.expr("CAST(__tp * 1000000 div n_pos AS BIGINT)"),
        )
        .withColumn(
            "fpr_ppm",
            F.expr("CAST(__fp * 1000000 div n_neg AS BIGINT)"),
        )
    )
    ref = groups.agg(
        F.max("tpr_ppm").alias("__best_tpr"),
        F.min("fpr_ppm").alias("__best_fpr"),
    )
    out = attach_scalars(groups, ref).select(
        "group",
        "n_pos",
        "n_neg",
        "tpr_ppm",
        "fpr_ppm",
        (F.col("__best_tpr") - F.col("tpr_ppm")).alias("tpr_gap_ppm"),
        (F.col("fpr_ppm") - F.col("__best_fpr")).alias("fpr_gap_ppm"),
        (
            (F.col("__best_tpr") - F.col("tpr_ppm") > int(gap_ppm))
            | (F.col("fpr_ppm") - F.col("__best_fpr") > int(gap_ppm))
        ).alias("violated"),
    )
    return out


def equalized_odds_sql(
    select: str,
    group_col: str,
    label_col: str,
    pred_col: str,
    min_n: int = 20,
    gap_ppm: int = 100_000,
) -> str:
    """DuckDB oracle of :func:`equalized_odds` — same exact counts,
    support gate, floored ppm rates, extremes reference."""
    pos = f"({label_col} != 0)"
    hit = f"({pred_col} != 0)"
    return f"""
    WITH groups AS (
        SELECT {group_col} AS "group",
               COALESCE(SUM(CASE WHEN {pos} THEN 1 ELSE 0 END), 0)
                 ::BIGINT AS n_pos,
               COALESCE(SUM(CASE WHEN NOT {pos} THEN 1 ELSE 0 END), 0)
                 ::BIGINT AS n_neg,
               COALESCE(SUM(CASE WHEN {pos} AND {hit} THEN 1
                            ELSE 0 END), 0)::BIGINT AS tp,
               COALESCE(SUM(CASE WHEN (NOT {pos}) AND {hit} THEN 1
                            ELSE 0 END), 0)::BIGINT AS fp
        FROM ({select})
        WHERE {group_col} IS NOT NULL AND {label_col} IS NOT NULL
          AND {pred_col} IS NOT NULL
        GROUP BY {group_col}
        HAVING SUM(CASE WHEN {pos} THEN 1 ELSE 0 END) >= {int(min_n)}
           AND SUM(CASE WHEN NOT {pos} THEN 1 ELSE 0 END)
               >= {int(min_n)}
    ),
    rated AS (
        SELECT "group", n_pos, n_neg,
               CAST(tp * 1000000 // n_pos AS BIGINT) AS tpr_ppm,
               CAST(fp * 1000000 // n_neg AS BIGINT) AS fpr_ppm
        FROM groups
    ),
    ref AS (
        SELECT MAX(tpr_ppm) AS best_tpr, MIN(fpr_ppm) AS best_fpr
        FROM rated
    )
    SELECT rated."group" AS "group", n_pos, n_neg, tpr_ppm, fpr_ppm,
           (ref.best_tpr - tpr_ppm) AS tpr_gap_ppm,
           (fpr_ppm - ref.best_fpr) AS fpr_gap_ppm,
           ((ref.best_tpr - tpr_ppm > {int(gap_ppm)})
            OR (fpr_ppm - ref.best_fpr > {int(gap_ppm)})) AS violated
    FROM rated CROSS JOIN ref
    """


def youden_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Youden-J optimal operating point — the threshold that maximizes
    ``J = TPR − FPR`` over every distinct score cut:
    :func:`roc_auc` certifies the ORDERING, :func:`classification_report`
    grades ONE chosen threshold; this finds the threshold worth
    choosing (equal-cost regime; re-weight upstream for asymmetric
    costs). ONE output row:

    ``(n_pos, n_neg, threshold, tpr_ppm, fpr_ppm, j_ppm)``

    where ``threshold`` is the smallest score whose ≥-cut attains the
    maximal J (decide positive when ``score ≥ threshold``; J-ties
    resolve to the HIGHEST threshold — the conservative cut, stated).

    Exactness: scores lift to integral micro-units (the
    :func:`roc_auc` convention); TP/FP at each cut are suffix sums of
    exact integer counts over the distinct-micro-score grain;
    ``tpr/fpr/j_ppm`` are floored integral-ppm divisions and the
    argmax is a deterministic max of ``(j, threshold)`` structs — no
    IEEE anywhere. NULL row values when either class is empty.

    Scale shape: one corpus hash agg to the distinct-micro-score
    grain, one cumulative window on that grain (bounded ≤ 1e6+1 rows
    by the 6 dp resolution — never corpus-sized), one 1-row argmax
    agg.
    """
    micro = (F.col(score_col).cast("decimal(18,6)") * 1_000_000).cast(
        "bigint"
    )
    pos = (F.col(label_col) != 0).cast("long")
    ok = F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    grain = (
        df.filter(ok)
        .select(micro.alias("__s"), pos.alias("__y"))
        .groupBy("__s")
        .agg(
            F.sum("__y").cast("bigint").alias("__p"),
            F.sum(F.lit(1) - F.col("__y")).cast("bigint").alias("__n"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.col("__s").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grain.withColumn(
        "__tp", F.sum("__p").over(w).cast("bigint")
    ).withColumn("__fp", F.sum("__n").over(w).cast("bigint"))
    from pybabe_spark.operators._util import attach_scalars

    tot = grain.agg(
        F.coalesce(F.sum("__p"), F.lit(0)).cast("bigint").alias("__ptot"),
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("__ntot"),
    )
    j = attach_scalars(cum, tot).withColumn(
        "__tpr",
        F.expr(
            "CAST(CASE WHEN __ptot > 0 THEN __tp * 1000000 div __ptot"
            " END AS BIGINT)"
        ),
    ).withColumn(
        "__fpr",
        F.expr(
            "CAST(CASE WHEN __ntot > 0 THEN __fp * 1000000 div __ntot"
            " END AS BIGINT)"
        ),
    ).withColumn("__j", F.col("__tpr") - F.col("__fpr"))
    best = j.agg(
        F.max("__ptot").alias("n_pos"),
        F.max("__ntot").alias("n_neg"),
        F.max(
            F.struct(
                F.col("__j"), F.col("__s"), F.col("__tpr"), F.col("__fpr")
            )
        ).alias("__b"),
    )
    okb = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return best.select(
        F.coalesce(F.col("n_pos"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.col("n_neg"), F.lit(0)).alias("n_neg"),
        F.when(
            okb, F.col("__b.__s").cast("double") / 1e6
        ).alias("threshold"),
        F.when(okb, F.col("__b.__tpr")).alias("tpr_ppm"),
        F.when(okb, F.col("__b.__fpr")).alias("fpr_ppm"),
        F.when(okb, F.col("__b.__j")).alias("j_ppm"),
    )


def youden_threshold_sql(
    select: str,
    score_col: str,
    label_col: str,
) -> str:
    """DuckDB oracle of :func:`youden_threshold` — same micro grain,
    suffix sums, floored ppm, (j, threshold) argmax."""
    micro = f"CAST(CAST({score_col} AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    return f"""
    WITH rows_in AS ({select}),
    grain AS (
        SELECT {micro} AS s,
               SUM(CASE WHEN {label_col} != 0 THEN 1 ELSE 0 END)
                 ::BIGINT AS p,
               SUM(CASE WHEN {label_col} != 0 THEN 0 ELSE 1 END)
                 ::BIGINT AS n
        FROM rows_in
        WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
        GROUP BY 1
    ),
    cum AS (
        SELECT s,
               SUM(p) OVER (ORDER BY s DESC
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS tp,
               SUM(n) OVER (ORDER BY s DESC
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS fp
        FROM grain
    ),
    tot AS (
        SELECT COALESCE(SUM(p), 0)::BIGINT AS ptot,
               COALESCE(SUM(n), 0)::BIGINT AS ntot
        FROM grain
    ),
    j AS (
        SELECT s,
               CAST(tp * 1000000 // ptot AS BIGINT) AS tpr,
               CAST(fp * 1000000 // ntot AS BIGINT) AS fpr,
               CAST(tp * 1000000 // ptot AS BIGINT)
                 - CAST(fp * 1000000 // ntot AS BIGINT) AS jj
        FROM cum CROSS JOIN tot
        WHERE ptot > 0 AND ntot > 0
    )
    SELECT tot.ptot AS n_pos, tot.ntot AS n_neg,
           CASE WHEN tot.ptot > 0 AND tot.ntot > 0
                THEN CAST(best.s AS DOUBLE) / 1e6 END AS threshold,
           CASE WHEN tot.ptot > 0 AND tot.ntot > 0
                THEN best.tpr END AS tpr_ppm,
           CASE WHEN tot.ptot > 0 AND tot.ntot > 0
                THEN best.fpr END AS fpr_ppm,
           CASE WHEN tot.ptot > 0 AND tot.ntot > 0
                THEN best.jj END AS j_ppm
    FROM tot LEFT JOIN (
        SELECT MAX(struct_pack(jj := jj, s := s, tpr := tpr,
                               fpr := fpr)) AS best
        FROM j
    ) b ON TRUE
    """
