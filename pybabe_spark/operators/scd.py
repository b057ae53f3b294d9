"""Slowly-changing-dimension type 2: changelog → validity intervals,
and key-pruned incremental upsert of new change batches.

Beyond-reference capability (the reference's ``push_sql`` replaces
whole partitions, pybabe/sql.py:253-342; SCD1 row merge is
operators/merge.py::upsert — this adds the history-keeping form every
warehouse dimension eventually needs).

Scale shape: one shuffle on the dimension key, then per-key-linear
window work (lag for change detection, running sum for run ids, lead
for interval close) — the sessionization plan shape with an equality
predicate instead of a time gap. The incremental form recomputes ONLY
keys present in the update batch: untouched keys' history rows are
kept by one anti-join and never re-windowed, so a daily batch touching
0.1% of keys costs 0.1% of a rebuild plus two key joins.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.operators._util import gen_col


def scd2_from_changelog(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Collapse an attribute changelog into SCD2 history: per key, in
    time order, consecutive rows with IDENTICAL attributes (null-safe)
    merge into one validity interval. Returns one row per interval:
    ``(key, attrs…, valid_from, valid_to, n_rows, is_current)`` where
    ``valid_to`` is the next interval's ``valid_from`` (NULL on the
    current interval — the half-open [from, to) convention).

    ``order_cols`` breaks timestamp ties deterministically; pass a
    unique id column when one key can change twice in one timestamp.
    """
    wcol = gen_col(df.columns, "__w")
    extra = [c for c in (order_cols or []) if c not in attr_cols]
    return _scd2_weighted(
        df.select(key_col, ts_col, *attr_cols, *extra, F.lit(1).alias(wcol)),
        key_col,
        ts_col,
        list(attr_cols),
        wcol,
        order_cols,
    )


def scd2_upsert(
    history: DataFrame,
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Fold a new change batch into existing SCD2 ``history``
    (a :func:`scd2_from_changelog` output) WITHOUT re-windowing
    untouched keys. Exact: equals a fresh rebuild over (original
    changelog ∪ updates) — asserted in tests — because each interval
    row preserves its run's (first-ts, attrs) and ``n_rows`` carries
    the collapsed multiplicity.

    Plan: untouched keys survive via one left-anti join; affected
    keys' intervals re-expand to ``n_rows`` synthetic changelog rows
    only where a same-(ts, attrs) merge could occur — one row per
    interval plus the update rows — then re-collapse. Cost is
    proportional to the update batch's keys, not the dimension.

    Caveat: exactness of ``n_rows`` across the merge needs the
    re-expansion; this implementation re-emits each affected interval
    as ONE changelog row weighted by its ``n_rows`` (weights sum
    through the re-collapse), so every output column including
    ``n_rows`` matches the rebuild.
    """
    attr_cols = list(attr_cols)
    affected = updates.select(key_col).distinct()
    untouched = history.join(affected, key_col, "left_anti")
    wcol = gen_col(
        list(history.columns) + list(updates.columns), "__w"
    )
    old_log = history.join(affected, key_col).select(
        F.col(key_col),
        F.col("valid_from").alias(ts_col),
        *[F.col(c) for c in attr_cols],
        F.col("n_rows").alias(wcol),
    )
    new_log = updates.select(
        key_col, ts_col, *attr_cols, F.lit(1).alias(wcol)
    )
    merged = old_log.unionByName(new_log)
    rebuilt = _scd2_weighted(
        merged, key_col, ts_col, attr_cols, wcol, order_cols
    )
    return untouched.unionByName(rebuilt)


def _scd2_weighted(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    weight_col: str,
    order_cols: Sequence[str] | None,
) -> DataFrame:
    """:func:`scd2_from_changelog` with ``n_rows = SUM(weight)`` —
    shared by the incremental path so collapsed multiplicities carry
    through re-collapse."""
    attr_cols = list(attr_cols)
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = gen_col(df.columns, "__changed")
    run = gen_col(df.columns, "__run")
    diff = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.lag(c).over(w)) for c in attr_cols],
    )
    first = F.lag(ts_col).over(w).isNull()
    runs = df.withColumn(
        changed, F.when(first | diff, F.lit(1)).otherwise(F.lit(0))
    ).withColumn(
        run,
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = runs.groupBy(key_col, run, *attr_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.sum(weight_col).alias("n_rows"),
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col(run).asc())
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(run)
        .select(
            key_col,
            *attr_cols,
            "valid_from",
            "valid_to",
            "n_rows",
            "is_current",
        )
    )


def scd2_sql(
    table: str,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    order_cols: Sequence[str] | None = None,
) -> str:
    """DuckDB oracle of :func:`scd2_from_changelog` — identical
    lag/run-sum/lead formulation (IS NOT DISTINCT FROM = null-safe)."""
    attr_cols = list(attr_cols)
    order = ", ".join([ts_col] + list(order_cols or []))
    attrs = ", ".join(attr_cols)
    diff = " OR ".join(
        f"{c} IS DISTINCT FROM LAG({c}) OVER w" for c in attr_cols
    )
    return f"""
    WITH flagged AS (
        SELECT *,
               CASE WHEN LAG({ts_col}) OVER w IS NULL
                         OR {diff}
                    THEN 1 ELSE 0 END AS __changed
        FROM {table}
        WINDOW w AS (PARTITION BY {key_col} ORDER BY {order})
    ), runs AS (
        SELECT *,
               SUM(__changed) OVER (
                   PARTITION BY {key_col} ORDER BY {order}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS __run
        FROM flagged
    ), intervals AS (
        SELECT {key_col}, __run, {attrs},
               MIN({ts_col}) AS valid_from,
               COUNT(*) AS n_rows
        FROM runs
        GROUP BY {key_col}, __run, {attrs}
    )
    SELECT {key_col}, {attrs}, valid_from,
           LEAD(valid_from) OVER (
               PARTITION BY {key_col} ORDER BY __run
           ) AS valid_to,
           n_rows,
           LEAD(valid_from) OVER (
               PARTITION BY {key_col} ORDER BY __run
           ) IS NULL AS is_current
    FROM intervals
    """
