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
