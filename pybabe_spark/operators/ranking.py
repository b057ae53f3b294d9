"""Retrieval-quality metrics — recall@k / MRR@k / NDCG@k for a ranked
result table against a relevance table.

The evaluation half the search stack (``tfidf.py`` BM25, ``similarity.py``
ANN, ``fusion.py`` hybrid RRF) needs to be TUNABLE: "is bands=8 better
than bands=16" is unanswerable without a harness-checkable ranking
metric. The reference has no counterpart (its joins stop at equality);
this is the superset direction of the engine's search family, same
spirit as the in-query recall certificates on the ANN keys.

Cross-engine exactness discipline: the per-rank gains ``1/r`` (MRR)
and ``1/log₂(r+1)`` (DCG) are transcendental for the engines but
CONSTANT for a given k — they are computed ONCE in Python as floored
integer ppm literals and emitted into both the Spark plan and the
DuckDB oracle as CASE tables, so neither engine evaluates a log or a
division by rank. Every downstream step is exact integer arithmetic
(sums of literals, floored ``div``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gain_tables(k: int) -> tuple[list[int], list[int], list[int]]:
    """(inv_ppm, dcg_ppm, idcg_prefix_ppm) for ranks 1..k — Python
    integer literals shared verbatim by both engines."""
    import math

    inv = [1_000_000 // r for r in range(1, k + 1)]
    dcg = [int(1_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]
    prefix = []
    s = 0
    for g in dcg:
        s += g
        prefix.append(s)
    return inv, dcg, prefix


def _case_over_rank(col: str, values: list[int]) -> str:
    arms = " ".join(
        f"WHEN {r} THEN {v}" for r, v in enumerate(values, start=1)
    )
    return f"CASE {col} {arms} ELSE 0 END"


def ranking_metrics(
    results: DataFrame,
    truth: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str,
    k: int = 10,
) -> DataFrame:
    """Mean recall@k, MRR@k and NDCG@k (binary relevance) of a ranked
    ``results`` table — ``(query, doc, rank)`` with rank 1-based —
    against a ``truth`` table of relevant ``(query, doc)`` pairs. ONE
    output row: ``(n_queries, recall_at_k_ppm, mrr_ppm, ndcg_ppm)``,
    each the floored mean over the TRUTH-side query universe (a query
    the results table never answered scores 0 on all three — missing
    queries must hurt, not vanish).

    Per query: recall@k = |top-k ∩ relevant| / |relevant|; MRR@k =
    1/rank of the first relevant hit (0 when none in top k); NDCG@k =
    Σ_hits 1/log₂(rank+1) normalized by the ideal prefix
    Σ_{i≤min(k,|relevant|)} 1/log₂(i+1). All gains are Python-computed
    integer-ppm literals (see module docstring); every mean is an
    exact floored ``div``. Duplicate truth pairs are collapsed;
    ``results`` is trusted to carry one row per (query, doc) — ranks
    beyond k are filtered before any join.

    Scale shape: one rank≤k filter (the results side shrinks to
    queries×k BEFORE the shuffle), one (query, doc) equi-join against
    the deduped truth, one per-query hash agg of three fixed-shape
    sums, one join back to the ≤|queries|-row truth-totals table, one
    1-row finish. Nothing moves that is larger than queries×k.
    """
    if k < 1:
        raise ValueError(f"ranking_metrics: k {k} must be >= 1")
    inv, dcg, _prefix = _gain_tables(k)
    rel = truth.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d")
    ).distinct()
    rel_tot = rel.groupBy("__q").agg(F.count(F.lit(1)).alias("__rel"))
    top = results.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rank_col).cast("int").alias("__r"),
    ).filter((F.col("__r") >= 1) & (F.col("__r") <= k))
    hits = top.join(rel, ["__q", "__d"])
    per_q = hits.groupBy("__q").agg(
        F.count(F.lit(1)).alias("__hits"),
        F.min("__r").alias("__first"),
        F.sum(F.expr(_case_over_rank("__r", dcg))).alias("__dcg"),
    )
    mrr_case = _case_over_rank("__first", inv)
    idcg_case = _case_over_rank("least(__rel, " + str(k) + ")", _prefix)
    scored = rel_tot.join(per_q, "__q", "left").select(
        "__q",
        F.expr(
            "CAST(COALESCE(__hits, 0) * 1000000 div __rel AS BIGINT)"
        ).alias("__recall"),
        F.coalesce(F.expr(mrr_case), F.lit(0)).alias("__mrr"),
        F.expr(
            "CAST(COALESCE(__dcg, 0) * 1000000"
            f" div ({idcg_case}) AS BIGINT)"
        ).alias("__ndcg"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.coalesce(
            F.expr("CAST(SUM(__recall) div COUNT(1) AS BIGINT)"), F.lit(0)
        ).alias("recall_at_k_ppm"),
        F.coalesce(
            F.expr("CAST(SUM(__mrr) div COUNT(1) AS BIGINT)"), F.lit(0)
        ).alias("mrr_ppm"),
        F.coalesce(
            F.expr("CAST(SUM(__ndcg) div COUNT(1) AS BIGINT)"), F.lit(0)
        ).alias("ndcg_ppm"),
    )


def ranking_metrics_sql(
    results_select: str,
    truth_select: str,
    query_col: str,
    doc_col: str,
    rank_col: str,
    k: int = 10,
) -> str:
    """DuckDB oracle of :func:`ranking_metrics` — the identical
    Python-literal gain tables and floored integer arithmetic."""
    inv, dcg, prefix = _gain_tables(k)
    dcg_case = _case_over_rank("r", dcg)
    mrr_case = _case_over_rank("first", inv)
    idcg_tot_case = _case_over_rank(f"LEAST(rel_tot.rel, {k})", prefix)
    return f"""
    WITH res AS ({results_select}),
    tru AS ({truth_select}),
    rel AS (SELECT DISTINCT {query_col} AS q, {doc_col} AS d FROM tru),
    rel_tot AS (SELECT q, COUNT(*) AS rel FROM rel GROUP BY q),
    top AS (
        SELECT {query_col} AS q, {doc_col} AS d,
               CAST({rank_col} AS INT) AS r
        FROM res WHERE {rank_col} BETWEEN 1 AND {k}
    ),
    hits AS (SELECT top.q, top.r FROM top JOIN rel USING (q, d)),
    per_q AS (
        SELECT q, COUNT(*) AS hits, MIN(r) AS first,
               SUM({dcg_case}) AS dcg
        FROM hits GROUP BY q
    ),
    scored AS (
        SELECT rel_tot.q,
               COALESCE(per_q.hits, 0) * 1000000 // rel_tot.rel AS recall,
               COALESCE({mrr_case}, 0) AS mrr,
               COALESCE(per_q.dcg, 0) * 1000000
                 // ({idcg_tot_case}) AS ndcg
        FROM rel_tot LEFT JOIN per_q USING (q)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(CASE WHEN COUNT(*) = 0 THEN 0
                ELSE SUM(recall) // COUNT(*) END AS BIGINT)
             AS recall_at_k_ppm,
           CAST(CASE WHEN COUNT(*) = 0 THEN 0
                ELSE SUM(mrr) // COUNT(*) END AS BIGINT) AS mrr_ppm,
           CAST(CASE WHEN COUNT(*) = 0 THEN 0
                ELSE SUM(ndcg) // COUNT(*) END AS BIGINT) AS ndcg_ppm
    FROM scored
    """


def _rbo_suffix_ppm(k: int, p: float) -> list[int]:
    """S[m] = Σ_{d=m..k} (1−p)·p^{d−1}/d as floored integer ppm, for
    m = 1..k — a doc first appearing in BOTH prefixes at depth m
    contributes exactly S[m] to truncated RBO. Python-computed floats
    collapse to shared literals, so both engines sum identical ints."""
    w = [(1 - p) * p ** (d - 1) / d for d in range(1, k + 1)]
    out = []
    for m in range(1, k + 1):
        out.append(int(sum(w[m - 1:]) * 1_000_000))
    return out


def rbo_overlap(
    results_a: DataFrame,
    results_b: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str,
    k: int = 10,
    p: float = 0.9,
) -> DataFrame:
    """Truncated rank-biased overlap (RBO@k, Webber et al. 2010)
    between two RANKINGS of the same queries — ``(query, rbo_ppm)``
    per query in EITHER system. The label-free companion of
    :func:`ranking_metrics`: comparing the BM25 ranking against the
    hybrid-RRF ranking (or yesterday's index against today's) needs no
    relevance judgments, just how much the top-k lists agree, with
    top-weighted emphasis (rank 1 disagreements cost most).

    ``RBO@k = Σ_{d=1..k} (1−p)·p^{d−1} · |A_d ∩ B_d| / d`` — truncated,
    not extrapolated: identical prefixes score Σ_{d≤k} w_d < 1 (the
    tail weight beyond k is unobserved; comparisons at the same k are
    what matter). Exactness: a doc in both prefixes with ranks
    (r_a, r_b) enters every depth d ≥ max(r_a, r_b), so its total
    contribution is the suffix sum S[max(r_a, r_b)] — a Python integer
    ppm literal per possible depth (see :func:`_rbo_suffix_ppm`), and
    the per-query score is an exact integer sum of literals. A query
    present in only one system scores 0 (a vanished query IS maximal
    disagreement).

    Scale shape: two rank≤k filters (each side shrinks to queries×k
    before any shuffle), one (query, doc) equi-join, one per-query hash
    agg, one union-distinct of the two query universes + a left join
    back. Nothing larger than queries×k moves.
    """
    if k < 1:
        raise ValueError(f"rbo_overlap: k {k} must be >= 1")
    if not 0.0 < p < 1.0:
        raise ValueError(f"rbo_overlap: p {p} must be in (0, 1)")
    suffix = _rbo_suffix_ppm(k, p)

    def top(df):
        return df.select(
            F.col(query_col).alias("__q"),
            F.col(doc_col).alias("__d"),
            F.col(rank_col).cast("int").alias("__r"),
        ).filter((F.col("__r") >= 1) & (F.col("__r") <= k))

    ta, tb = top(results_a), top(results_b)
    both = ta.alias("a").join(
        tb.alias("b"),
        (F.col("a.__q") == F.col("b.__q"))
        & (F.col("a.__d") == F.col("b.__d")),
    ).select(
        F.col("a.__q").alias("__q"),
        F.greatest(F.col("a.__r"), F.col("b.__r")).alias("__m"),
    )
    contrib = _case_over_rank("__m", suffix)
    per_q = both.groupBy("__q").agg(
        F.sum(F.expr(contrib)).alias("__rbo")
    )
    universe = ta.select("__q").union(tb.select("__q")).distinct()
    return universe.join(per_q, "__q", "left").select(
        F.col("__q").alias(query_col),
        F.coalesce(F.col("__rbo"), F.lit(0))
        .cast("bigint")
        .alias("rbo_ppm"),
    )


def rbo_overlap_sql(
    results_a_select: str,
    results_b_select: str,
    query_col: str,
    doc_col: str,
    rank_col: str,
    k: int = 10,
    p: float = 0.9,
) -> str:
    """DuckDB oracle of :func:`rbo_overlap` — identical suffix-sum
    literal table, identical integer arithmetic."""
    suffix = _rbo_suffix_ppm(k, p)
    contrib = _case_over_rank("m", suffix)
    return f"""
    WITH ra AS ({results_a_select}),
    rb AS ({results_b_select}),
    ta AS (
        SELECT {query_col} AS q, {doc_col} AS d,
               CAST({rank_col} AS INT) AS r
        FROM ra WHERE {rank_col} BETWEEN 1 AND {k}
    ),
    tb AS (
        SELECT {query_col} AS q, {doc_col} AS d,
               CAST({rank_col} AS INT) AS r
        FROM rb WHERE {rank_col} BETWEEN 1 AND {k}
    ),
    both_side AS (
        SELECT ta.q, GREATEST(ta.r, tb.r) AS m
        FROM ta JOIN tb ON ta.q = tb.q AND ta.d = tb.d
    ),
    per_q AS (SELECT q, SUM({contrib}) AS rbo FROM both_side GROUP BY q),
    universe AS (
        SELECT DISTINCT q FROM (SELECT q FROM ta UNION ALL SELECT q FROM tb)
    )
    SELECT u.q AS {query_col},
           CAST(COALESCE(per_q.rbo, 0) AS BIGINT) AS rbo_ppm
    FROM universe u LEFT JOIN per_q USING (q)
    """
