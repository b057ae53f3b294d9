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

Exactness model of the incremental path: a history interval keeps
``(valid_from, last_ts, n_rows)`` — the first row's timestamp, the
LAST row's timestamp, and the collapsed multiplicity — but not the
intermediate row timestamps. Folding an update batch is provably equal
to a rebuild over (original changelog ∪ updates) EXCEPT when an update
with DIFFERENT attributes lands inside an existing run's row span
``[valid_from, last_ts]``: the rebuild would split that run at a row
the collapsed form no longer knows about (or, at the exact
``valid_from`` boundary, order the tie ambiguously). That one case is
detected by an in-plan guard that raises at the query's first action
(no hidden construction-time job — the FAIL-join idiom,
operators/join.py:96-120). Same-attribute updates anywhere, updates in
the gaps between runs, prepends, and the common append-only case all
fold exactly. Out-of-order different-attr updates need the original
changelog: keep it and call :func:`scd2_from_changelog` on the union.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.operators._util import gen_col

#: output columns appended after (key, attrs...)
_OUT_COLS = ["valid_from", "valid_to", "last_ts", "n_rows", "is_current"]


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
    ``(key, attrs…, valid_from, valid_to, last_ts, n_rows,
    is_current)`` where ``valid_to`` is the next interval's
    ``valid_from`` (NULL on the current interval — the half-open
    [from, to) convention) and ``last_ts`` is the run's last row
    timestamp — the witness :func:`scd2_upsert` needs to stay exact.

    ``order_cols`` breaks timestamp ties deterministically; pass a
    unique id column when one key can change twice in one timestamp.
    """
    wcol = gen_col(df.columns, "__w")
    lcol = gen_col(list(df.columns) + [wcol], "__last")
    extra = [c for c in (order_cols or []) if c not in attr_cols]
    return _scd2_weighted(
        df.select(
            key_col,
            ts_col,
            *attr_cols,
            *extra,
            F.lit(1).alias(wcol),
            F.col(ts_col).alias(lcol),
        ),
        key_col,
        ts_col,
        list(attr_cols),
        wcol,
        lcol,
        order_cols,
    )


def scd2_upsert(
    history: DataFrame,
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
) -> DataFrame:
    """Fold a new change batch into existing SCD2 ``history``
    (a :func:`scd2_from_changelog` output) WITHOUT re-windowing
    untouched keys. Equals a fresh rebuild over (original changelog ∪
    updates) — asserted in ``tests/test_scd.py`` — for every update
    EXCEPT a different-attribute row landing inside an existing run's
    row span ``[valid_from, last_ts]`` (strictly inside = the rebuild
    would split the run at a row the collapsed form no longer knows;
    at the ``valid_from`` boundary = an order-ambiguous tie, since
    ``order_cols`` do not survive collapse); that case raises
    ``SCD2_OUT_OF_ORDER`` at the query's first action via an in-plan
    guard (module docstring). Append-only feeds (every update after
    its key's ``last_ts``) — the normal warehouse case — never hit it.

    Plan: untouched keys survive via one left-anti join; affected
    keys' intervals re-expand to one changelog row each, weighted by
    ``n_rows`` and carrying ``last_ts``, merge with the update rows,
    and re-collapse — cost proportional to the update batch's keys,
    not the dimension. The guard is a left join of the update rows
    against the affected intervals' spans that raises on a match —
    it rides the same lineage, no separate job.
    """
    attr_cols = list(attr_cols)
    affected = updates.select(key_col).distinct()
    untouched = history.join(affected, key_col, "left_anti")
    touched = history.join(affected, key_col)

    all_cols = list(history.columns) + list(updates.columns)
    wcol = gen_col(all_cols, "__w")
    lcol = gen_col(all_cols + [wcol], "__last")

    # in-plan out-of-order guard: an update row (ts, attrs) conflicts
    # with an interval of its key iff valid_from < ts <= last_ts and
    # any attribute differs (null-safe) — the only inexact fold case.
    spans = touched.select(
        F.col(key_col).alias("__k"),
        F.col("valid_from").alias("__vf"),
        F.col("last_ts").alias("__lt"),
        *[F.col(c).alias(f"__a_{c}") for c in attr_cols],
    )
    upd = updates.select(key_col, ts_col, *attr_cols)
    differs = reduce(
        lambda a, b: a | b,
        [
            ~upd[c].eqNullSafe(spans[f"__a_{c}"])
            for c in attr_cols
        ],
    )
    # inclusive at valid_from too: a differing-attr tie with the run's
    # first row has no deterministic order once order_cols are gone
    cond = (
        (upd[key_col] == spans["__k"])
        & (upd[ts_col] >= spans["__vf"])
        & (upd[ts_col] <= spans["__lt"])
        & differs
    )
    checked = upd.join(spans, cond, "left")
    guard = F.when(
        F.col("__vf").isNotNull(),
        F.raise_error(
            F.concat(
                F.lit("SCD2_OUT_OF_ORDER: update for key "),
                F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")),
                F.lit(" at "),
                F.col(ts_col).cast("string"),
                F.lit(
                    " lands inside an existing run's row span with "
                    "different attributes; the collapsed history cannot "
                    "split that run exactly — rebuild from the kept "
                    "changelog with scd2_from_changelog instead"
                ),
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    new_log = (
        checked.filter(guard)
        .select(
            upd[key_col],
            upd[ts_col],
            *[upd[c] for c in attr_cols],
            F.lit(1).alias(wcol),
            upd[ts_col].alias(lcol),
        )
    )

    old_log = touched.select(
        F.col(key_col),
        F.col("valid_from").alias(ts_col),
        *[F.col(c) for c in attr_cols],
        F.col("n_rows").alias(wcol),
        F.col("last_ts").alias(lcol),
    )
    merged = old_log.unionByName(new_log)
    rebuilt = _scd2_weighted(
        merged, key_col, ts_col, attr_cols, wcol, lcol, None
    )
    return untouched.unionByName(rebuilt)


def _scd2_weighted(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: Sequence[str],
    weight_col: str,
    last_col: str,
    order_cols: Sequence[str] | None,
) -> DataFrame:
    """:func:`scd2_from_changelog` over pre-weighted rows:
    ``n_rows = SUM(weight)`` and ``last_ts = MAX(last)`` — shared by
    the incremental path so collapsed multiplicities AND run-end
    witnesses carry through re-collapse (a re-expanded interval row
    sits at its ``valid_from`` but still knows its span's last row)."""
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
        F.max(last_col).alias("last_ts"),
        F.sum(weight_col).alias("n_rows"),
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col(run).asc())
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(run)
        .select(key_col, *attr_cols, *_OUT_COLS)
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
               MAX({ts_col}) AS last_ts,
               COUNT(*) AS n_rows
        FROM runs
        GROUP BY {key_col}, __run, {attrs}
    )
    SELECT {key_col}, {attrs}, valid_from,
           LEAD(valid_from) OVER (
               PARTITION BY {key_col} ORDER BY __run
           ) AS valid_to,
           last_ts,
           n_rows,
           LEAD(valid_from) OVER (
               PARTITION BY {key_col} ORDER BY __run
           ) IS NULL AS is_current
    FROM intervals
    """
