"""Sketch-based aggregates: heavy hitters / frequent items.

Completes the single-pass approximate family next to the HLL++ and
approx-percentile surface (queries.py::approx_stats_scale). Capability
extension — the reference's only frequency tool is a full groupBy
(pybabe/group.py); at 100 TB a full distinct-key aggregation of a
high-cardinality column shuffles billions of groups, while these run in
fixed memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, col: str, support: float = 0.01) -> DataFrame:
    """Approximate frequent items: every value occurring in more than
    ``support`` fraction of rows (one-pass Karp–Papadimitriou–Shenker via
    ``df.stat.freqItems``; may contain false positives, never misses a
    true heavy hitter). Returns one row per candidate item.

    Fixed memory ∝ 1/support per partition regardless of input size —
    the 100 TB shape for "which keys are hot" (e.g. to pick salting
    targets) without a full-cardinality shuffle.
    """
    if not 1e-4 <= support <= 1.0:
        raise ValueError(
            f"heavy_hitters: support {support} outside [1e-4, 1] "
            "(Spark's freqItems sketch floor)"
        )
    items_row = df.stat.freqItems([col], support).collect()[0]
    items = items_row[f"{col}_freqItems"]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i,) for i in items], df.select(col).schema
    )


def exact_heavy_hitters(df: DataFrame, col: str, min_count: int) -> DataFrame:
    """Exact frequent values (``count >= min_count``) — the verifiable
    definition the sketch approximates: one hash aggregation with
    map-side partial counts."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(min_count))
    )


def histogram(df: DataFrame, col: str, bins: int = 10) -> DataFrame:
    """Fixed-width histogram of a numeric column: one row per bin —
    (bin, lo, hi, n) — empty bins included with n=0, NULLs excluded.

    Two linear passes (min/max scalars, then the binned count — both
    map-side combinable); the bin edges ride a 1-row broadcast attach,
    never a collect. The top edge is closed (a value equal to the max
    lands in the last bin via the ``LEAST`` clamp). Every edge/bin
    computation is plain IEEE arithmetic replayed with identical
    operation order in the oracle — exact cross-engine, no rounding
    step needed.
    """
    from pybabe_spark.operators._util import attach_scalars

    if bins < 1:
        raise ValueError(f"histogram: bins {bins} must be >= 1")
    vals = df.select(F.col(col).cast("double").alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    scalars = vals.agg(
        F.min("__x").cast("double").alias("__mn"),
        F.max("__x").cast("double").alias("__mx"),
    )
    width = (F.col("__mx") - F.col("__mn")) / F.lit(bins)
    binned = attach_scalars(vals, scalars).select(
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.lit(bins - 1).cast("bigint"),
                F.floor((F.col("__x") - F.col("__mn")) / width),
            )
        )
        .alias("bin")
    )
    counts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    spark = df.sparkSession
    grid = spark.range(bins).select(F.col("id").alias("bin"))
    return (
        attach_scalars(grid.join(counts, "bin", "left"), scalars)
        .select(
            F.col("bin").cast("int").alias("bin"),
            (F.col("__mn") + F.col("bin") * width).alias("lo"),
            (F.col("__mn") + (F.col("bin") + 1) * width).alias("hi"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )


def histogram_sql(table: str, col: str, bins: int = 10) -> str:
    """DuckDB oracle of :func:`histogram` — identical IEEE edge/bin
    arithmetic, identical clamp and empty-bin grid."""
    w = f"((s.mx - s.mn) / {bins})"
    return f"""
    WITH s AS (
      SELECT CAST(MIN({col}) AS DOUBLE) AS mn,
             CAST(MAX({col}) AS DOUBLE) AS mx
      FROM {table} WHERE {col} IS NOT NULL
    ),
    binned AS (
      SELECT CASE WHEN s.mx = s.mn THEN CAST(0 AS BIGINT)
                  ELSE LEAST(CAST({bins - 1} AS BIGINT),
                             CAST(FLOOR((CAST({col} AS DOUBLE) - s.mn) / {w})
                                  AS BIGINT))
             END AS bin
      FROM {table}, s WHERE {col} IS NOT NULL
    ),
    counts AS (SELECT bin, COUNT(*) AS n FROM binned GROUP BY bin)
    SELECT CAST(g.i AS INT) AS bin,
           s.mn + g.i * {w} AS lo,
           s.mn + (g.i + 1) * {w} AS hi,
           COALESCE(c.n, 0) AS n
    FROM generate_series(0, {bins - 1}) g(i)
    LEFT JOIN counts c ON c.bin = g.i
    CROSS JOIN s
    """
