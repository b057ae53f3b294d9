"""Rank fusion for hybrid retrieval (RRF).

Beyond-reference capability: the retrieval layer a RAG / training-data
pipeline puts ON TOP of the engine's two search families — sparse
(BM25, ``operators/tfidf.py``) and dense (cosine ANN,
``operators/similarity.py``). Reciprocal-rank fusion (Cormack et al.,
SIGIR 2009) combines any number of ranked lists without score
calibration: each list contributes ``1 / (rrf_k + rank)`` per document,
and documents are re-ranked by the summed contribution. RRF is the
standard fusion in hybrid search engines precisely because it only
consumes RANKS — BM25 log-scores and cosine similarities never have to
share a scale.

Scale shape (100 TB): fusion itself never touches the corpus — its
inputs are the top-k CUTS the search operators already produce
(TakeOrdered results, k rows each). The per-list ranking window is
partitioned by list index (each partition is one bounded list, never a
corpus funnel), the fuse is a k·n_lists-row hash aggregation, and the
final cut is again TakeOrdered. Everything upstream keeps its own scale
story (filtered posting lists for BM25, bucketed/IVF candidate
generation for ANN).

Cross-engine determinism: ranks are integers (ties broken by id), and
each contribution is the INTEGER ``1_000_000_000_000 // (rrf_k + rank)``
— floor division of exact bigints, identical in Spark (``div``) and
DuckDB (``//``); the fused score is an exact bigint sum, so the result
hash cannot drift. The ppm-style fixed-point keeps six significant
digits of the reciprocal at rank 1000, far beyond any tie the float
form could distinguish.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.operators._util import gen_col

#: fixed-point scale of one reciprocal-rank unit: score = Σ SCALE//(K+r)
RRF_SCALE = 1_000_000_000_000


def _max_rows(df: DataFrame) -> tuple[bool, int | None]:
    """``(known, bound)``: the logical plan's row-count bound.
    ``known=False`` means the classic plan handle is absent (Spark
    Connect) and nothing can be proven either way; ``(True, None)``
    means the plan is provably unbounded."""
    try:
        opt = df._jdf.queryExecution().optimizedPlan().maxRows()
    except Exception:
        return False, None
    return True, (int(opt.get()) if not opt.isEmpty() else None)


def rank_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "id",
    score_col: str = "score",
    weights: Sequence[int] | None = None,
) -> DataFrame:
    """Fuse ranked lists with reciprocal-rank fusion → top-``k``
    ``(id, rrf_score, n_lists)``.

    Each input must be a BOUNDED ranked result — a top-k cut such as
    :func:`~pybabe_spark.operators.tfidf.bm25_search` or
    :func:`~pybabe_spark.operators.similarity.ann_brute_force` output —
    with an ``id_col`` and a ``score_col``. Boundedness is asserted
    from the logical plan's ``maxRows`` where the classic plan handle
    exists (an unbounded input means someone passed a corpus, not a
    ranking — the per-list rank would funnel it through one task); on
    Spark Connect the check degrades to trusting the caller.

    Ranks within each list are recomputed here as
    ``row_number() over (order by score desc, id asc)`` — deterministic
    under score ties, independent of the input's physical row order
    (top-k cuts arrive unsorted after a shuffle). ``rrf_score`` is the
    exact integer ``Σ_lists RRF_SCALE // (rrf_k + rank)``; ``n_lists``
    counts how many lists surfaced the id (a useful hybrid-agreement
    signal). Final ties break id-ascending.

    ``weights`` (one positive INTEGER per list, default all-1) scale
    each list's contribution — the standard weighted-RRF bias toward a
    trusted retriever, kept integral so the fused score stays exact.

    EAGER (r14) when every input's bound is provable and small: each
    list collects (the bound IS the proof) and the fusion — integer
    ranks, integer contributions, the final (score desc, id asc) cut —
    runs driver-side, returning a VALUES literal; the in-plan window +
    union + hash-agg shape (a tail of tiny AQE stages per action) is
    kept for Spark Connect inputs or NULL/NaN ids/scores, where plan
    bounds or Python sort order cannot be trusted.
    """
    if not rankings:
        raise ValueError("rank_fuse: need at least one ranking")
    if k <= 0 or rrf_k < 0:
        raise ValueError("rank_fuse: k must be positive and rrf_k >= 0")
    if weights is None:
        weights = [1] * len(rankings)
    if len(weights) != len(rankings) or any(
        (not isinstance(w, int)) or w <= 0 for w in weights
    ):
        raise ValueError(
            "rank_fuse: weights must be one positive INTEGER per ranking "
            "(integer multipliers keep the fused score exact)"
        )
    sides = []
    side_col = gen_col([id_col, score_col], "__rrf_side")
    bounds = []
    for i, r in enumerate(rankings):
        known, bound = _max_rows(r)
        if known and bound is None:
            raise ValueError(
                f"rank_fuse: ranking {i} has no row bound in its plan; "
                "pass top-k cuts (orderBy(...).limit(k)), not corpora"
            )
        bounds.append(bound if known else None)
        sides.append(
            r.select(
                F.lit(i).alias(side_col),
                F.lit(int(weights[i])).alias("__rrf_w"),
                F.col(id_col).cast("long").alias(id_col),
                F.col(score_col).cast("double").alias(score_col),
            )
        )
    if all(b is not None and b <= 100_000 for b in bounds):
        fused_local = _rank_fuse_local(
            rankings[0].sparkSession,
            [sides[i] for i in range(len(sides))],
            list(weights),
            k,
            rrf_k,
            id_col,
            score_col,
        )
        if fused_local is not None:
            return fused_local
    allr = sides[0]
    for s in sides[1:]:
        allr = allr.unionByName(s)
    rk = gen_col([id_col, score_col, side_col], "__rrf_rank")
    w = Window.partitionBy(side_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    contrib = allr.withColumn(rk, F.row_number().over(w)).select(
        id_col,
        (
            F.col("__rrf_w")
            * F.expr(f"{RRF_SCALE} div ({rrf_k} + {rk})")
        ).alias("__c"),
    )
    fused = contrib.groupBy(id_col).agg(
        F.sum("__c").alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    ).limit(k)


def _rank_fuse_local(
    spark,
    sides: "Sequence[DataFrame]",
    weights: "list[int]",
    k: int,
    rrf_k: int,
    id_col: str,
    score_col: str,
):
    """Driver-side RRF over bounded, collected lists (see
    :func:`rank_fuse`): integer ranks from the same (score desc, id
    asc) order, the same ``RRF_SCALE // (rrf_k + rank)`` integer
    contributions, the same final cut. Returns ``None`` when a NULL or
    NaN id/score makes Python sort order diverge from Spark's NULL/NaN
    ordering — the caller keeps the in-plan shape for those."""
    import math
    from concurrent.futures import ThreadPoolExecutor

    from pybabe_spark.operators._util import local_rows_df

    # the input lists are independent pipelines (e.g. a BM25 pass and a
    # dense cosine pass): collect them CONCURRENTLY so their stages
    # overlap exactly as the old single-action plan's independent
    # subtrees did (guide §2.6 — actions are only sequential when the
    # driver calls them sequentially)
    def _grab(s):
        return [
            (r[id_col], r[score_col])
            for r in s.select(id_col, score_col).collect()
        ]

    with ThreadPoolExecutor(max_workers=min(4, len(sides))) as pool:
        collected = list(pool.map(_grab, sides))

    contrib: dict[int, int] = {}
    nlists: dict[int, int] = {}
    for i, rows in enumerate(collected):
        if any(
            v is None or x is None or math.isnan(x) for v, x in rows
        ):
            return None
        rows.sort(key=lambda t: (-t[1], t[0]))
        w = weights[i]
        for rank, (v, _x) in enumerate(rows, start=1):
            contrib[v] = contrib.get(v, 0) + w * (
                RRF_SCALE // (rrf_k + rank)
            )
            nlists[v] = nlists.get(v, 0) + 1
    top = sorted(contrib, key=lambda v: (-contrib[v], v))[:k]
    esc = id_col.replace("`", "``")
    return local_rows_df(
        spark,
        [(v, contrib[v], nlists[v]) for v in top],
        f"`{esc}` bigint, rrf_score bigint, n_lists bigint",
    )


def rrf_contrib_sql(rank_expr: str, rrf_k: int = 60) -> str:
    """The DuckDB mirror of one list's integer RRF contribution."""
    return f"({RRF_SCALE} // ({rrf_k} + {rank_expr}))"
