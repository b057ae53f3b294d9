"""Incremental materialized rollup: build an aggregate table once,
fold new batches in WITHOUT re-reading old raw data.

Beyond-reference capability (the reference recomputes aggregations per
run, pybabe/group.py; its only incrementality is push_sql partition
replace). This is the warehouse pattern that makes 100 TB dashboards
affordable: the raw corpus is scanned once per batch, the stored state
is (dims × mergeable partials), and every append is
``agg(batch) ∪ stored → re-merge`` — cost proportional to the BATCH
plus the rollup's own (tiny) cardinality, never the corpus.

Only decomposable aggregates are allowed (``sum`` / ``count`` /
``min`` / ``max`` / ``first:<order>`` / ``last:<order>``; ``n_rows``
is always kept) — their merge is the same shape as their build, which
is what makes append ≡ rebuild EXACT (asserted in tests and by the
driver oracle). ``first``/``last`` store an (order, value) witness
pair and re-pick by the stored order at merge time — the OHLC
open/close shape, mergeable because argmin/argmax compose; the order
column must be unique per dims cell for 'the' first to be defined. Averages are derived at
read time (sum/count). Double sums are stored as DECIMAL(38,6) — the
engine's exact-decimal convention — so append order can never change
a stored value by an IEEE rounding.

Swap safety: appends rewrite the (small) rollup via write-aside +
two metadata renames (the ``compact_files`` dance, sources/io.py) —
a crash leaves either the old or the new rollup, never a torn one.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MERGEABLE = ("sum", "count", "min", "max", "first", "last")


def _measure_name(col: str, how: str) -> str:
    return f"{col}_{how.split(':', 1)[0]}"


def _parse(how: str) -> tuple[str, str | None]:
    """'first:ts' → ('first', 'ts'); plain aggregates → (how, None)."""
    kind, _, order = how.partition(":")
    return kind, (order or None)


def _check(measures: Mapping[str, str]) -> None:
    for col, how in measures.items():
        kind, order = _parse(how)
        if kind not in _MERGEABLE:
            raise ValueError(
                f"rollup: {how!r} on {col!r} is not mergeable; only "
                f"{_MERGEABLE} fold exactly across appends (derive avg "
                "at read time from sum/count)"
            )
        if kind in ("first", "last") and not order:
            raise ValueError(
                f"rollup: {kind!r} on {col!r} needs an order column — "
                f"use '{kind}:<order_col>' (e.g. 'first:ts'); the order "
                "value is stored with the witness so appends stay exact"
            )


def _first_pass(df: DataFrame, dims: list[str], measures) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, how in measures.items():
        name = _measure_name(col, how)
        if how == "sum":
            aggs.append(
                F.sum(F.col(col).cast("decimal(18,6)"))
                .cast("decimal(38,6)")
                .alias(name)
            )
        elif how == "count":  # non-null count, SQL COUNT(col)
            aggs.append(F.count(F.col(col)).alias(name))
        elif how == "min":
            aggs.append(F.min(col).alias(name))
        elif how == "max":
            aggs.append(F.max(col).alias(name))
        else:  # first:o / last:o — store (order, value) witness pairs
            kind, order = _parse(how)
            pair = F.struct(F.col(order).alias("o"), F.col(col).alias("v"))
            pick = F.min_by if kind == "first" else F.max_by
            aggs.append(pick(pair, F.col(order)).alias(name))
    return df.groupBy(*dims).agg(*aggs)


def _merge_pass(parts: DataFrame, dims: list[str], measures) -> DataFrame:
    aggs = [F.sum("n_rows").cast("bigint").alias("n_rows")]
    for col, how in measures.items():
        name = _measure_name(col, how)
        how = _parse(how)[0] if ":" in how else how
        if how in ("sum",):
            aggs.append(
                F.sum(name).cast("decimal(38,6)").alias(name)
            )
        elif how == "count":
            aggs.append(F.sum(name).cast("bigint").alias(name))
        elif how == "min":
            aggs.append(F.min(name).alias(name))
        elif how == "max":
            aggs.append(F.max(name).alias(name))
        else:  # witness pairs re-pick by their stored order
            kind, _ = _parse(how)
            pick = F.min_by if kind == "first" else F.max_by
            aggs.append(pick(F.col(name), F.col(name)["o"]).alias(name))
    return parts.groupBy(*dims).agg(*aggs)


def rollup_build(
    df: DataFrame,
    dims: list[str],
    measures: Mapping[str, str],
    path: str,
) -> None:
    """Aggregate ``df`` to (dims, n_rows, measures…) and persist."""
    _check(measures)
    _first_pass(df, dims, measures).write.mode("overwrite").parquet(path)


def rollup_append(
    batch: DataFrame,
    path: str,
    dims: list[str],
    measures: Mapping[str, str],
) -> None:
    """Fold a new raw batch into the stored rollup: one aggregation of
    the batch, one merge with the stored partials, one swap. Exact:
    the result equals :func:`rollup_build` over (all batches) — the
    partials are decomposable and sums are decimal.

    Classic (JVM-attached) sessions only, like ``compact_files``: the
    atomic swap needs the Hadoop FS handle (Connect sessions can
    rebuild with :func:`rollup_build` instead). Single-writer, like
    ``append_bm25_index``: the read-merge-swap is not transactional
    against a concurrent append — serialize appends (Structured
    Streaming's sequential foreachBatch, streaming/ops.stream_rollup,
    does this for free)."""
    _check(measures)
    spark = batch.sparkSession
    old = spark.read.parquet(path)
    part = _first_pass(batch, dims, measures)
    merged = _merge_pass(
        old.unionByName(part, allowMissingColumns=False), dims, measures
    )
    # the rollup is small (dims cardinality); collect-free swap via
    # tmp-write + rename, same crash contract as compact_files
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(jsc.hadoopConfiguration())
    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".rollup.tmp")
    oldp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".rollup.old")
    merged.write.mode("overwrite").parquet(tmp.toString())
    fs.delete(oldp, True)
    if not fs.rename(hp, oldp):
        raise IOError(f"rollup_append: could not move {path} aside")
    if not fs.rename(tmp, hp):
        fs.rename(oldp, hp)
        raise IOError(f"rollup_append: could not swap in {path}")
    fs.delete(oldp, True)


def rollup_read(
    spark: SparkSession,
    path: str,
    measures: Mapping[str, str],
) -> DataFrame:
    """Load the rollup for consumption: decimal sums surface as
    doubles (the engine's convention — exact value, familiar type)."""
    df = spark.read.parquet(path)
    for col, how in measures.items():
        name = _measure_name(col, how)
        if how == "sum":
            df = df.withColumn(name, F.col(name).cast("double"))
        elif _parse(how)[0] in ("first", "last"):
            df = df.withColumn(name, F.col(name)["v"])
    return df


def rollup_query(
    spark: SparkSession,
    path: str,
    dims_subset: list[str],
    measures: Mapping[str, str],
) -> DataFrame:
    """Re-aggregate the STORED rollup to a coarser dimension subset —
    the cube walk that never touches raw data."""
    df = spark.read.parquet(path)
    out = _merge_pass(df, dims_subset, measures)
    for col, how in measures.items():
        name = _measure_name(col, how)
        if how == "sum":
            out = out.withColumn(name, F.col(name).cast("double"))
        elif _parse(how)[0] in ("first", "last"):
            out = out.withColumn(name, F.col(name)["v"])
    return out
