"""Structured Streaming extensions (capability beyond the reference).

PyBabe is batch-only (SURVEY §2.9); these operators define the unbounded
versions of the engine's aggregations using Spark's native event-time
machinery: watermarks bound state, windows are ``F.window`` structs, and
every function works identically on a batch DataFrame (Spark's unified
semantics) — which is how the driver's oracle checks them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_counts(
    df: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    value_col: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window: count + exact-decimal sum per window.

    Streaming: watermark bounds state and admits late rows up to the
    bound. Batch: same plan minus the watermark node.
    """
    src = with_event_time(df, ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("value_sum")
        )
    out = src.groupBy(F.window(ts_col, window).alias("w")).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_events",
        *(["value_sum"] if value_col else []),
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time window counts (each row lands in window/slide
    overlapping windows)."""
    src = with_event_time(df, ts_col, watermark)
    out = src.groupBy(F.window(ts_col, window, slide).alias("w")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_events",
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup with bounded state
    (dropDuplicatesWithinWatermark); exact dropDuplicates on batch."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def stream_events(spark, events_dir: str, schema=None) -> DataFrame:
    """File-source stream over an events directory (one parquet per
    micro-batch discovery; the unbounded analogue of read_table).

    The events table stores ts as TIMESTAMP(NANOS), which Spark reads as
    long under the nanosAsLong conf — the stream reads the raw schema and
    converts to a micros timestamp, mirroring sources.io.read_table.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    df = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(events_dir)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def run_to_memory(stream_df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drain a stream into an in-memory table with availableNow (test/dev
    harness; production sinks are kafka/delta/parquet writeStream)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
