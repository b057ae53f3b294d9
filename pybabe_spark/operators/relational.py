"""Projection / filtering / row transforms / sort / dedup / set ops.

Each function cites the reference operator it re-expresses (SURVEY §2.2,
§2.5, §2.7). All are thin declarative compositions — Catalyst keeps
predicate pushdown, column pruning, and TakeOrderedAndProject available.

Order-sensitive operators (skip/head/dedup keep-first/insert_rows) use the
engine ingest-order convention (:data:`pybabe_spark.sources.io.INGEST_ID`);
callers that need exact reference parity attach it at read time via
``pull(..., ingest_id=True)``. Without the column, the cheaper
order-agnostic Spark-native path is used — correct for set semantics,
unordered like any distributed engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.operators._util import attach_scalars, gen_col
from pybabe_spark.sources.io import INGEST_ID, with_ingest_id


def filter_columns(
    df: DataFrame,
    keep_fields: Sequence[str] | None = None,
    remove_fields: Sequence[str] | None = None,
) -> DataFrame:
    """Projection: keep or drop named columns (pybabe/transform.py:244-259)."""
    if (keep_fields is None) == (remove_fields is None):
        raise ValueError("pass exactly one of keep_fields / remove_fields")
    if keep_fields is not None:
        keep = list(keep_fields)
        if INGEST_ID in df.columns and INGEST_ID not in keep:
            keep.append(INGEST_ID)
        return df.select(*keep)
    return df.drop(*remove_fields)


def rename(df: DataFrame, **mapping: str) -> DataFrame:
    """Rename columns old=new (pybabe/transform.py:318-331)."""
    return df.withColumnsRenamed(dict(mapping))


def filter_rows(df: DataFrame, condition: Column | str) -> DataFrame:
    """Predicate filter (pybabe/transform.py:294-302).

    The reference takes an arbitrary row→bool Python function; here the
    fast path is a Column expression / SQL string so the predicate stays
    JVM-side and pushes down to the scan. For a genuinely opaque Python
    predicate use ``pybabe_spark.operators.udf_ops.map_filter``.
    """
    return df.filter(condition)


def filter_values(df: DataFrame, **equals) -> DataFrame:
    """Conjunctive equality predicate (pybabe/transform.py:262-275).

    Null-safe: ``filter_values(df, k=None)`` matches rows whose cell IS
    NULL, like the reference's Python ``==`` — SQL ``= NULL`` would
    silently match nothing."""
    out = df
    for col, val in equals.items():
        out = out.filter(F.col(col).eqNullSafe(F.lit(val)))
    return out


def filter_out_null_values(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """Drop rows with NULL in any given field (pybabe/transform.py:278-291)."""
    return df.na.drop(subset=list(fields))


def filter_by_regexp(df: DataFrame, field: str, regexp: str) -> DataFrame:
    """Keep rows where re.match(regexp, field) (pybabe/transform.py:305-315).

    ``re.match`` anchors at the start only → rlike with a leading anchor
    over a NON-CAPTURING group: a bare '^' + 'cat|dog' would anchor only
    the first alternative ('^cat|dog' matches 'hotdog' mid-string,
    re.match does not).
    """
    pattern = regexp if regexp.startswith("^") else f"^(?:{regexp})"
    return df.filter(F.col(field).rlike(pattern))


def skip(df: DataFrame, n: int, order_by: str | None = None) -> DataFrame:
    """Drop the first n rows (pybabe/transform.py:158-171).

    Ordered by ``order_by`` (default: the ingest-id column), which must
    be UNIQUE — the reference's skip is positional over a deterministic
    stream, and a unique order key is what gives that position meaning
    on a distributed table.

    Scale shape, FULLY LAZY (no job at construction): the n-th-smallest
    key boundary is a 1-row aggregate over a TakeOrdered subquery
    (per-partition heaps of n keys — no global sort, no data shuffle),
    attached to every row with the ``attach_scalars`` crossJoin idiom
    and compared map-side. The boundary evaluates inside the query's own
    action, so a ``skip`` composed before upstream data lands sees the
    data as of the action — and interactive users pay no hidden job at
    plan-build time. Trade disclosed: the boundary is a plan column,
    not a literal, so the comparison no longer reaches the parquet
    scan's PushedFilters; the filter is still map-side and row-cheap.

    NULL order keys sort first and are part of the skipped prefix. If
    MORE than n keys are NULL no deterministic prefix exists — that is
    detected in-plan (a surviving NULL-key row when the whole skipped
    prefix was NULL is itself the (n+1)-th NULL) and raised from the
    action via ``raise_error``.
    """
    key = order_by or INGEST_ID
    if key not in df.columns:
        raise ValueError(f"skip() needs an order column; attach {INGEST_ID} at read")
    if n <= 0:
        return df
    c_cnt = gen_col(df.columns, "__skip_cnt")
    c_b = gen_col(df.columns, "__skip_b")
    c_nulls1 = gen_col(df.columns, "__skip_nulls1")
    ordered = df.select(key).orderBy(F.col(key).asc_nulls_first())
    stats = ordered.limit(n).agg(
        F.count(F.lit(1)).alias(c_cnt),
        F.max(key).alias(c_b),
    )
    # NULLs sort first, so 'more than n NULL keys' (no deterministic
    # prefix exists) is exactly 'the first n+1 keys are all NULL' —
    # provable from a second n+1-key TakeOrdered, never a full scan.
    over = ordered.limit(n + 1).agg(
        F.coalesce(
            F.sum(F.col(key).isNull().cast("long")), F.lit(0)
        ).alias(c_nulls1)
    )
    # fewer than n rows total (cnt < n) → whole stream skipped; a NULL
    # boundary with cnt == n means the entire prefix was NULL-keyed, so
    # every non-NULL row survives.
    keep = (
        (F.col(c_cnt) == n)
        & F.col(key).isNotNull()
        & (F.col(c_b).isNull() | (F.col(key) > F.col(c_b)))
    )
    cond = F.when(
        F.col(c_nulls1) == n + 1,
        F.raise_error(
            F.lit(
                f"skip(): more than {n} NULL values in order column "
                f"{key!r}; a deterministic prefix needs a unique key"
            )
        ).cast("boolean"),
    ).otherwise(keep)
    return (
        attach_scalars(attach_scalars(df, stats), over)
        .filter(cond)
        .drop(c_cnt, c_b, c_nulls1)
    )


def head(df: DataFrame, n: int) -> DataFrame:
    """First n rows (pybabe/transform.py:174-205) → df.limit.

    Spark's limit short-circuits the scan exactly like the reference's
    generator break (pybabe/base.py:244-253). For per-partition-value
    heads (all_streams=True) use :func:`head_per_group`.
    """
    return df.limit(n)


def head_per_group(
    df: DataFrame,
    n: int,
    partition_cols: Sequence[str],
    order_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """head(all_streams=True): first n rows per substream
    (pybabe/transform.py:174-205 + partition model SURVEY §1.2).

    ``order_by`` should be unique within a group for deterministic
    results (compose a tie-break column list if needed)."""
    keys = [order_by] if isinstance(order_by, str) else list(order_by or [INGEST_ID])
    w = Window.partitionBy(*partition_cols).orderBy(*[F.col(k) for k in keys])
    rn = gen_col(df.columns, "__rn")
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= n)
        .drop(rn)
    )


def sort(df: DataFrame, field: str | Sequence[str], reverse: bool = False) -> DataFrame:
    """Sort on field(s) (pybabe/sort.py:9-22 and sort_diskbased 25-60).

    One operator covers both reference spellings: Spark's sort is always
    external (UnsafeExternalSorter spills), so no disk-based variant is
    needed. Range-partitioned → total order across partitions.
    """
    fields = [field] if isinstance(field, str) else list(field)
    cols = [F.col(f).desc() if reverse else F.col(f).asc() for f in fields]
    return df.orderBy(*cols)


def max_n(
    df: DataFrame,
    column: str,
    n: int,
    extremum: str = "max",
    tie_break: str | None = None,
) -> DataFrame:
    """Top-k by column (pybabe/minmax.py:19-45).

    orderBy+limit compiles to TakeOrderedAndProject: per-partition heaps +
    a driver merge of k rows — the distributed analogue of the reference's
    heapq, no full sort or shuffle of the data.

    ``tie_break`` (ascending) pins the order of equal values; it defaults
    to the ingest-id column when present — first-seen wins, like the
    reference's insertion-ordered heap (pybabe/minmax.py:28-31).
    """
    col = F.col(column).desc() if extremum == "max" else F.col(column).asc()
    order = [col]
    tb = tie_break or (INGEST_ID if INGEST_ID in df.columns else None)
    if tb is not None:
        order.append(F.col(tb).asc())
    return df.orderBy(*order).limit(n)


def min_n(
    df: DataFrame, column: str, n: int, tie_break: str | None = None
) -> DataFrame:
    """Bottom-k (pybabe/minmax.py:34-45)."""
    return max_n(df, column, n, extremum="min", tie_break=tie_break)


def dedup(
    df: DataFrame,
    fields: Sequence[str] | None = None,
    keep_first: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """Drop duplicate rows on all columns or a subset (pybabe/dedup.py:5-35).

    keep_first=True reproduces the reference's keep-first-occurrence
    semantics exactly via a min-ingest-id window; the default uses
    ``dropDuplicates`` (any representative row), which is cheaper at scale
    because AQE can pre-aggregate map-side.
    """
    value_cols = [c for c in df.columns if c != INGEST_ID]
    subset = list(fields) if fields else value_cols
    if not keep_first:
        return df.dropDuplicates(subset)
    key = order_col or INGEST_ID
    if key not in df.columns:
        raise ValueError(f"dedup(keep_first=True) needs {INGEST_ID}; pull(ingest_id=True)")
    w = Window.partitionBy(*subset).orderBy(F.col(key))
    rn = gen_col(df.columns, "__rn")
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )


def replace_cell(df: DataFrame, oldvalue, newvalue) -> DataFrame:
    """Replace an exact cell value across all columns (pybabe/transform.py:222-241)."""
    return df.replace(oldvalue, newvalue)


def replace_in_string(df: DataFrame, match: str, replacement: str, field: str) -> DataFrame:
    """Substring replace in one field (pybabe/transform.py:98-109).

    Literal (non-regex) replacement like the reference's str.replace.
    """
    return df.withColumn(field, F.replace(F.col(field), F.lit(match), F.lit(replacement)))


def split_rows(df: DataFrame, field: str, separator: str) -> DataFrame:
    """Split a string field on separator → one row per part
    (pybabe/transform.py:208-219): explode(split(...))."""
    return df.withColumn(field, F.explode(F.split(F.col(field), separator, -1)))


def union_streams(*dfs: DataFrame) -> DataFrame:
    """Concatenate streams (pybabe/base.py:365-368, partition.py:8-27).

    unionByName so column order differences don't silently mis-zip.

    When every input carries the ingest id, the ids are RE-DERIVED over
    the union: each source's ids start at 0, so keeping them would
    interleave the streams under an ingest-ordered read-back instead of
    concatenating them. Union appends partitions left-to-right and
    ``monotonically_increasing_id`` is partition-major, so the re-derived
    ids give exact concatenation order with zero extra jobs (id VALUES
    change; only their order is contractual).
    """
    if not dfs:
        raise ValueError("union_streams needs at least one DataFrame")
    tagged = len(dfs) > 1 and all(INGEST_ID in d.columns for d in dfs)
    out = dfs[0].drop(INGEST_ID) if tagged else dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(
            d.drop(INGEST_ID) if tagged else d, allowMissingColumns=False
        )
    return with_ingest_id(out) if tagged else out


def insert_rows(df: DataFrame, new_rows: list, before: bool = True) -> DataFrame:
    """Prepend/append literal rows (pybabe/transform.py:455-470).

    Set-wise this is a union with literals; positional placement is only
    observable under an ingest-id ordering, so when the column is present
    the literals get ids below/above the existing range.
    """
    spark = df.sparkSession
    value_cols = [c for c in df.columns if c != INGEST_ID]
    lit_df = spark.createDataFrame(new_rows, df.select(*value_cols).schema)
    if INGEST_ID in df.columns:
        if before:
            lit_df = lit_df.withColumn(
                INGEST_ID, F.monotonically_increasing_id() - F.lit(1 << 62)
            )
        else:
            lit_df = lit_df.withColumn(
                INGEST_ID, F.monotonically_increasing_id() + F.lit(1 << 62)
            )
        return df.unionByName(lit_df) if not before else lit_df.unionByName(df)
    return lit_df.unionByName(df) if before else df.unionByName(lit_df)


def throttle(
    df: DataFrame,
    key: str,
    ts_col: str,
    min_gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Rate-limit events per key: keep a row only when it arrives more
    than ``min_gap_seconds`` after the key's PREVIOUS row (the first row
    per key always survives). The standard bot/double-fire scrubbing
    step in event pipelines.

    Lag-based semantics (each row compares against its immediate
    predecessor, kept or not) — one window over (key, ts); a sequential
    "compare against last KEPT" debounce would be an ordered fold, not
    expressible as one window and rarely what log dedup wants.
    ``tiebreak`` orders equal timestamps deterministically.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    gap_us = int(min_gap_seconds) * 1_000_000
    keep = prev.isNull() | (F.unix_micros(F.col(ts_col)) - prev > F.lit(gap_us))
    kc = gen_col(df.columns, "__keep")
    return df.withColumn(kc, keep).filter(F.col(kc)).drop(kc)
