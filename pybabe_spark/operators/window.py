"""Trailing row-frame window map.

Reference: pybabe/transform.py:345-397 (``windowMap``) — for each row,
``function(last window_size rows)``; the frame grows 1..N then slides.
The only windowing construct in the reference: row-based, trailing,
unpartitioned, ordered by arrival.

Spark-first: ``Window.orderBy(order).rowsBetween(-(n-1), currentRow)``.
Built-in aggregates stay JVM-side; arbitrary functions go through
``collect_list`` over the frame + a pandas UDF. Ranking/lead/lag/range
frames are capability supersets exposed via plain pyspark.sql.Window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.sources.io import INGEST_ID

_BUILTINS = {
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "stddev": F.stddev,
}

#: plan-estimated input size above which an unpartitioned window warns
GLOBAL_WINDOW_WARN_BYTES = 256 << 20


def _warn_if_global_window(df: DataFrame, op: str) -> None:
    """An unpartitioned ordered window funnels EVERY row through one
    task — faithful to the reference's single-stream semantics, but a
    scale-killer. Warn (cheaply, from plan statistics — no job) when the
    input looks big enough for that to matter, pointing at the
    ``partition_by`` form. Inputs with UNKNOWN statistics stay silent —
    Catalyst reports Long.MaxValue for statless plans (e.g. a local
    relation in tests), and a warning that fires on every tiny input
    would be ignored when it matters."""
    import warnings

    from pybabe_spark.plans.introspect import plan_size_bytes

    size = plan_size_bytes(df)
    if size is None:
        return
    if size > GLOBAL_WINDOW_WARN_BYTES:
        warnings.warn(
            f"{op}: unpartitioned window over ~{size >> 20} MB funnels all"
            " rows through a single task; pass partition_by= for per-key"
            " frames (the scale path)",
            RuntimeWarning,
            stacklevel=3,
        )


def window_map(
    df: DataFrame,
    window_size: int,
    agg: str | Column,
    source_col: str | None = None,
    out_col: str = "window_value",
    order_by: str | None = None,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Trailing window aggregate (pybabe/transform.py:345-397).

    ``agg`` is a builtin name ('sum', 'avg', ...) applied to ``source_col``
    over the trailing ``window_size``-row frame, or any Column aggregate
    expression. The reference is unpartitioned (single stream) — a global
    row-ordered window; ``partition_by`` extends it to per-key frames,
    which is also the scale path (an unpartitioned row window is a
    single-task total order, kept only for reference parity on small data).
    """
    w = _trailing_frame(df, "window_map", window_size, order_by, partition_by)
    if isinstance(agg, str):
        if source_col is None:
            raise ValueError("builtin agg needs source_col")
        if agg not in _BUILTINS:
            raise ValueError(
                f"window_map: unknown builtin agg {agg!r}; use one of "
                f"{sorted(_BUILTINS)} or pass a Column expression"
            )
        expr = _BUILTINS[agg](source_col)
    else:
        expr = agg
    return df.withColumn(out_col, expr.over(w))


def _trailing_frame(df, op, window_size, order_by, partition_by):
    """The shared trailing row frame: one construction site so the
    missing-order-column guard and the global-window warning cannot
    drift between the builtin and UDF forms."""
    key = order_by or INGEST_ID
    if key not in df.columns:
        raise ValueError(f"{op} needs an order column; attach {INGEST_ID} at read")
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(F.col(key))
    else:
        _warn_if_global_window(df, op)
        w = Window.orderBy(F.col(key))
    return w.rowsBetween(-(window_size - 1), Window.currentRow)


def window_map_udf(
    df: DataFrame,
    window_size: int,
    fn,
    source_col: str,
    out_col: str = "window_value",
    return_type: str = "double",
    order_by: str | None = None,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Arbitrary-function windowMap: collect_list over the frame + pandas UDF.

    ``fn`` receives a Python list of the frame's values (1..window_size
    elements, trailing), INCLUDING ``None`` for NULL cells — the frame is
    collected as single-field structs because a bare ``collect_list``
    silently skips NULLs, which would shorten and mis-align positional
    frames. Slow path by design — prefer :func:`window_map`.
    """
    from pyspark.sql.functions import pandas_udf

    w = _trailing_frame(df, "window_map_udf", window_size, order_by, partition_by)

    def _apply(frames):
        return frames.map(lambda vals: fn([v["v"] for v in vals]))

    apply_udf = pandas_udf(_apply, return_type)
    frame = F.collect_list(F.struct(F.col(source_col).alias("v"))).over(w)
    return df.withColumn(out_col, apply_udf(frame))
