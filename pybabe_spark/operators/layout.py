"""Z-order data layout: multi-column space-filling-curve clustering
(the Delta/Iceberg ``OPTIMIZE ZORDER BY`` primitive, exact-integer).

Beyond-reference capability, and a pure scale play: at 100 TB the
difference between a table range-partitioned on ONE column and one
laid out on a Z-curve over (k) columns is which predicates can prune
files. Interleaving the bits of k bucketized columns gives a single
sort key whose contiguous ranges are axis-aligned-ish hyperrectangles:
sorting/range-partitioning by it co-locates rows close in EVERY
interleaved dimension, so min/max file statistics prune on any of
them — the reason every lakehouse grew this verb.

Exact arithmetic end to end: bucketization is integral —
``(v − min)·(2^bits − 1) div (max − min)`` on bigint cents (min/max
attached lazily in-plan via one broadcast scalar row, the
``attach_scalars`` idiom — no construction-time job) — and the
interleave is pure bit shifts, identical on Spark and DuckDB. No
floats anywhere, so the whole layout decision is value-oracle-able.

Scale shape: bucketize + interleave are zero-shuffle codegen;
``zorder_layout`` adds exactly one range-partitioning shuffle (the
same cost as any global sort) and writes size-balanced files via
range boundaries sampled by Spark's RangePartitioner. The statistics
query (``zorder_stats``) is one hash agg over the keyed rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pybabe_spark.operators._util import attach_scalars, gen_col


def _cents(col: str) -> "F.Column":
    """Exact integer lift shared with the regression/gini family:
    decimal(18,2) cents. Numeric columns only — cast dates/timestamps
    to epoch days/seconds upstream."""
    return (F.col(col).cast("decimal(18,2)") * 100).cast("bigint")


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Append an exact Z-order key over 2–4 numeric columns. Each
    column is bucketized to ``bits`` bits by equal-width integral
    scaling between its own min and max (computed lazily in-plan), and
    the buckets' bits are interleaved column-major: bit ``b`` of
    column ``i`` lands at position ``b·k + i``. Constant columns
    bucketize to 0. NULL in any interleaved column yields a NULL key
    (sort them to one end explicitly if wanted). ``k·bits`` must fit
    63 bits."""
    cols = list(cols)
    k = len(cols)
    if not (2 <= k <= 4):
        raise ValueError("zorder_key: need 2-4 columns")
    if bits < 1 or k * bits > 63:
        raise ValueError("zorder_key: k*bits must be within 1..63")
    stats = df.agg(
        *[
            m(_cents(c)).alias(f"__{pre}_{i}")
            for i, c in enumerate(cols)
            for pre, m in (("mn", F.min), ("mx", F.max))
        ]
    )
    top = (1 << bits) - 1
    with_stats = attach_scalars(df, stats)
    bucket_cols = []
    for i, c in enumerate(cols):
        mn, mx = f"__mn_{i}", f"__mx_{i}"
        b = gen_col(list(df.columns) + bucket_cols, f"__zb_{i}")
        bucket_cols.append(b)
        with_stats = with_stats.withColumn(
            b,
            F.when(
                F.col(c).isNull(), F.lit(None).cast("bigint")
            ).when(
                F.col(mx) > F.col(mn),
                F.expr(
                    f"((cast(cast({c} as decimal(18,2)) * 100 as bigint)"
                    f" - {mn}) * {top}) div ({mx} - {mn})"
                ),
            ).otherwise(F.lit(0).cast("bigint")),
        )
    # interleaved bit positions never overlap, so arithmetic + equals
    # bitwise OR — and matches the SQL oracle's formulation exactly
    interleave = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, bc in enumerate(bucket_cols):
            interleave = interleave + F.shiftleft(
                F.shiftright(F.col(bc), b).bitwiseAND(F.lit(1)),
                b * k + i,
            ).cast("bigint")
    return with_stats.withColumn(out_col, interleave).select(
        *df.columns, out_col
    )


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 32,
) -> DataFrame:
    """``OPTIMIZE ZORDER BY``: range-partition the table into
    ``num_files`` size-balanced partitions by the Z-key and sort
    within each — write the result with any sink and every file's
    min/max stats prune on all interleaved columns. One shuffle."""
    keyed = zorder_key(df, cols, bits)
    return keyed.repartitionByRange(num_files, F.col("zkey")).sortWithinPartitions("zkey")


def zorder_stats(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 16,
) -> DataFrame:
    """Layout-quality report, exactly computable on both engines: rows
    are assigned to ``num_files`` FIXED-WIDTH Z-key ranges (file ``f``
    = keys in [f·W, (f+1)·W), W = key-space / num_files — deterministic,
    unlike sampled range boundaries) and each file reports its row
    count and per-column bucket min/max — the min/max statistics a
    reader would prune on. Tight per-file ranges on every column = the
    curve is doing its job. NULL-keyed rows land in file -1."""
    cols = list(cols)
    k = len(cols)
    nf = int(num_files)
    if nf < 1 or (nf & (nf - 1)) != 0:
        raise ValueError("zorder_stats: num_files must be a power of 2")
    keyed = zorder_key(df, cols, bits)
    shift = k * bits - nf.bit_length() + 1  # log2(nf) high bits
    keyed = keyed.withColumn(
        "file_id",
        F.when(
            F.col("zkey").isNotNull(),
            F.shiftright(F.col("zkey"), shift).cast("int"),
        ).otherwise(F.lit(-1)),
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(_cents(c)).alias(f"min_{c}"))
        aggs.append(F.max(_cents(c)).alias(f"max_{c}"))
    return keyed.groupBy("file_id").agg(*aggs)


def zorder_stats_sql(
    table: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int = 16,
) -> str:
    """DuckDB oracle of :func:`zorder_stats` — same cents, same
    integral equal-width bucketization, same bit interleave, same
    fixed-width file ranges."""
    cols = list(cols)
    k = len(cols)
    top = (1 << bits) - 1
    shift = k * bits - int(num_files).bit_length() + 1
    cent = (
        lambda c: f"CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    stats = ", ".join(
        f"MIN({cent(c)}) AS mn_{i}, MAX({cent(c)}) AS mx_{i}"
        for i, c in enumerate(cols)
    )
    buckets = ", ".join(
        f"CASE WHEN {c} IS NULL THEN NULL "
        f"WHEN mx_{i} > mn_{i} THEN "
        f"(({cent(c)} - mn_{i}) * {top}) // (mx_{i} - mn_{i}) "
        f"ELSE 0 END AS zb_{i}"
        for i, c in enumerate(cols)
    )
    terms = " + ".join(
        f"(((zb_{i} >> {b}) & 1) << {b * k + i})"
        for b in range(bits)
        for i in range(k)
    )
    zkey = (
        "CASE WHEN "
        + " AND ".join(f"zb_{i} IS NOT NULL" for i in range(k))
        + f" THEN {terms} END"
    )
    outs = ", ".join(
        f"MIN({cent(c)}) AS min_{c}, MAX({cent(c)}) AS max_{c}"
        for c in cols
    )
    return f"""
    WITH s AS (SELECT {stats} FROM {table}),
    keyed AS (
        SELECT t.*, {zkey} AS zkey
        FROM (SELECT {table}.*, {buckets} FROM {table}, s) t
    )
    SELECT CASE WHEN zkey IS NOT NULL
                THEN CAST(zkey >> {shift} AS INT) ELSE -1 END AS file_id,
           COUNT(*) AS n_rows, {outs}
    FROM keyed
    GROUP BY 1
    """
