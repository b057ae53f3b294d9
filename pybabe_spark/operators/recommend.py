"""Item-to-item collaborative filtering: exact co-occurrence cosine
neighbors (the "customers who bought X also bought Y" primitive —
Linden et al., Amazon item-item CF, IEEE Internet Computing 2003).

Beyond-reference capability completing the association family:
``frequent_pairs`` (operators/collocations.py:121) mines support+lift
PAIRS; this ranks each item's NEIGHBORS by binary-vector cosine
``n_ab / √(n_a·n_b)`` and keeps the top-k — the deployable
recommendation / substitutes table. Squaring removes the sqrt:
``cosine²_ppm = 10⁶·n_ab² div (n_a·n_b)`` is exact 128-bit integer
arithmetic (monotone in cosine, so ranking by it IS ranking by
cosine), with ties broken by neighbor id — no float anywhere.

Scale shape: the distinct (basket, item) projection feeds a
within-basket pair self-join (fanout bounded by basket width — the
triangle-census discipline; cap pathological baskets upstream with
``head_per_group``), one pair hash agg with the support floor applied
BEFORE any join, two equi-joins against the (item, count) table
(unbounded vocabulary — no explicit broadcast hint, AQE decides),
and ONE key-partitioned row_number window over the ranked pairs —
whose input is the support-pruned pair table, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_neighbors(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 10,
    min_support: int = 2,
    core=None,
) -> DataFrame:
    """Top-``k`` most-cosine-similar neighbors per item:
    ``(item, neighbor, n_item, n_neighbor, n_both, cosine2_ppm,
    rank)`` — rank 1..k by (cosine² desc, neighbor asc); items whose
    every pair falls under ``min_support`` are absent. Both directions
    of each pair are ranked (the neighbor table is asymmetric in
    general: a niche item's best neighbor may be a blockbuster whose
    own top-k excludes it)."""
    if k < 1:
        raise ValueError("item_neighbors: k must be >= 1")
    if min_support < 1:
        raise ValueError("item_neighbors: min_support must be >= 1")
    from pybabe_spark.operators.collocations import basket_pair_core

    if core is None:
        core = basket_pair_core(df, basket_col, item_col, min_support)
    raw_pairs, items, _baskets = core
    pairs = raw_pairs.select(
        F.col("item_a").alias("ia"),
        F.col("item_b").alias("ib"),
        F.col("n_pairs").alias("n_both"),
    )
    # symmetrize AFTER the support floor: each kept pair becomes one
    # candidate row per direction
    sym = pairs.select(
        F.col("ia").alias("item"), F.col("ib").alias("neighbor"), "n_both"
    ).unionByName(
        pairs.select(
            F.col("ib").alias("item"), F.col("ia").alias("neighbor"),
            "n_both",
        )
    )
    ni = items.select(F.col("i").alias("item"), F.col("__ni").alias("n_item"))
    nn = items.select(
        F.col("i").alias("neighbor"), F.col("__ni").alias("n_neighbor")
    )
    scored = (
        sym.join(ni, "item")
        .join(nn, "neighbor")
        .withColumn(
            "cosine2_ppm",
            F.expr(
                "(cast(n_both as decimal(38,0)) * n_both * 1000000)"
                " div (cast(n_item as decimal(38,0)) * n_neighbor)"
            ).cast("bigint"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cosine2_ppm").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "item", "neighbor", "n_item", "n_neighbor", "n_both",
            "cosine2_ppm", "rank",
        )
    )


def item_neighbors_sql(
    table: str,
    basket_col: str,
    item_col: str,
    k: int = 10,
    min_support: int = 2,
) -> str:
    """DuckDB oracle of :func:`item_neighbors` — same counts, same
    HUGEINT cosine², same (cosine² desc, neighbor asc) window."""
    return f"""
    WITH bi AS (
        SELECT DISTINCT {basket_col} AS b, {item_col} AS i
        FROM {table}
        WHERE {basket_col} IS NOT NULL AND {item_col} IS NOT NULL
    ), pairs AS (
        SELECT x.i AS ia, y.i AS ib, COUNT(*) AS n_both
        FROM bi x JOIN bi y ON x.b = y.b AND x.i < y.i
        GROUP BY x.i, y.i
        HAVING COUNT(*) >= {int(min_support)}
    ), sym AS (
        SELECT ia AS item, ib AS neighbor, n_both FROM pairs
        UNION ALL
        SELECT ib, ia, n_both FROM pairs
    ), items AS (
        SELECT i, COUNT(*) AS n FROM bi GROUP BY i
    ), scored AS (
        SELECT s.item, s.neighbor,
               a.n AS n_item, b.n AS n_neighbor, s.n_both,
               CAST((CAST(s.n_both AS HUGEINT) * s.n_both * 1000000)
                    // (CAST(a.n AS HUGEINT) * b.n) AS BIGINT)
                 AS cosine2_ppm
        FROM sym s
        JOIN items a ON a.i = s.item
        JOIN items b ON b.i = s.neighbor
    )
    SELECT item, neighbor, n_item, n_neighbor, n_both, cosine2_ppm,
           rank
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY item
                   ORDER BY cosine2_ppm DESC, neighbor ASC)
               AS INT) AS rank
        FROM scored
    ) WHERE rank <= {int(k)}
    """
