"""RFM customer-value segmentation (Recency / Frequency / Monetary).

Beyond-reference capability rounding out the customer-analytics family
(retention cohorts, attribution, funnel): the classic direct-marketing
segmentation — score every customer 1..k on how recently they bought,
how often, and how much, then act on the combined code (555 =
champion, 111 = lost). Still the workhorse lifecycle model because it
needs nothing but the order log.

Scoring is the engine's scale-safe equal-frequency binning idiom
(``sampling.quantile_bins``): the k−1 quantile edges of each dimension
are ONE aggregation over the per-customer rollup (all 3·(k−1) probs in
a single pass), attached as a 1-row broadcast, and compared in pure
codegen — NO global NTILE window (that would funnel every customer
through one task at 100 TB). Ties at an edge fall in the LOWER raw bin
deterministically; both engines round edges once to 6 dp.

Score orientation: frequency and monetary score k for the TOP quantile;
recency scores k for the MOST RECENT (smallest days-since) — the
standard convention, so bigger is always better.

Determinism: monetary sums are exact bigint cents; recency is whole
days against a caller-pinned ``as_of`` date (pin it — defaulting to
max(ts) would make scores drift as data lands); edges are
6 dp-rounded ``percentile``/``quantile_cont`` (the proven
quantile_bins convention).

Scale shape: one map-side-combinable hash agg to the per-customer
rollup, one 1-row edge agg over it, broadcast attach, codegen. Two
passes over the rollup (tiny vs the order log), zero over the log
beyond the first agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pybabe_spark.operators._util import attach_scalars

_DIMS = ("recency_days", "frequency", "monetary_cents")


def rfm_segments(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    as_of: str,
    k: int = 5,
) -> DataFrame:
    """Per-``key_col`` RFM rollup and scores: ``(key, recency_days,
    frequency, monetary_cents, r_score, f_score, m_score, rfm_code)``
    with scores in 1..k and ``rfm_code = r·100 + f·10 + m`` (k ≤ 9).
    Rows with NULL key, timestamp, or value are ignored; ``as_of`` is
    a date string — orders after it still count (score caveat emptor),
    their recency clamps at 0.
    """
    if not 2 <= k <= 9:
        raise ValueError(f"rfm_segments: k {k} must be in 2..9")
    ok = (
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    rollup = (
        df.filter(ok)
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.greatest(
                F.datediff(
                    F.lit(as_of).cast("date"), F.max(ts_col).cast("date")
                ),
                F.lit(0),
            )
            .cast("int")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                (F.col(value_col).cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("monetary_cents"),
        )
    )
    edges = rollup.agg(
        *[
            F.round(
                F.percentile(F.col(dim), F.lit(i / k)), 6
            ).alias(f"__{dim}_e{i}")
            for dim in _DIMS
            for i in range(1, k)
        ]
    )
    binned = attach_scalars(rollup, edges)

    def _bin(dim: str):
        expr = None
        for i in range(1, k):
            term = (F.col(dim) > F.col(f"__{dim}_e{i}")).cast("int")
            expr = term if expr is None else expr + term
        return expr

    scored = binned.select(
        "key",
        "recency_days",
        "frequency",
        "monetary_cents",
        (F.lit(k) - _bin("recency_days")).alias("r_score"),
        (_bin("frequency") + 1).alias("f_score"),
        (_bin("monetary_cents") + 1).alias("m_score"),
    )
    return scored.withColumn(
        "rfm_code",
        F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"),
    )


def rfm_segments_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    as_of: str,
    k: int = 5,
) -> str:
    """DuckDB oracle of :func:`rfm_segments` — same rollup, same
    6 dp quantile_cont edges, same lower-bin tie rule."""
    edges = ", ".join(
        f"ROUND(quantile_cont({dim}, {i / k}), 6) AS {dim}_e{i}"
        for dim in _DIMS
        for i in range(1, k)
    )

    def _bin(dim: str) -> str:
        return " + ".join(
            f"CAST({dim} > {dim}_e{i} AS INT)" for i in range(1, k)
        )

    return f"""
    WITH rollup AS (
        SELECT {key_col} AS key,
               CAST(GREATEST(date_diff('day',
                    CAST(MAX({ts_col}) AS DATE), DATE '{as_of}'), 0)
                    AS INT) AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(CAST({value_col} AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS monetary_cents
        FROM {table}
        WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
              AND {value_col} IS NOT NULL
        GROUP BY {key_col}
    ),
    e AS (SELECT {edges} FROM rollup),
    scored AS (
        SELECT key, recency_days, frequency, monetary_cents,
               {k} - ({_bin('recency_days')}) AS r_score,
               ({_bin('frequency')}) + 1 AS f_score,
               ({_bin('monetary_cents')}) + 1 AS m_score
        FROM rollup CROSS JOIN e
    )
    SELECT *, r_score * 100 + f_score * 10 + m_score AS rfm_code
    FROM scored
    """
