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

    The events table has stored ts as TIMESTAMP(NANOS) (read as long
    under the nanosAsLong conf, converted to micros) and as un-flagged
    TIMESTAMP(MICROS) (inferred TIMESTAMP_NTZ, which watermarks reject —
    cast to the session type, exact under the UTC session timezone).
    Mirrors sources.io.read_table so stream and batch plans agree.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    df = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(events_dir)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream (or batch-batch) interval join: pairs where
    ``right_ts ∈ [left_ts + lower, left_ts + upper)`` and keys match.

    Streaming: BOTH sides carry watermarks and the time bound is part of
    the join condition — that is what lets Spark expire join state (the
    unbounded-state pitfall of naive stream joins). Batch: identical
    condition, plain join, which is how tests/oracles check it.
    """
    if left_ts == right_ts:
        raise ValueError(
            "interval_join: left_ts and right_ts share a name — alias one "
            "side first so the joined timestamps stay unambiguous"
        )
    l = with_event_time(left, left_ts, watermark)
    r = with_event_time(right, right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (r[right_ts] < l[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    # keep ONE key column (the left one) so by-name references on the
    # result aren't ambiguous
    return l.join(r, cond, "inner").drop(r[key])


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, value_sum double"
)
#: vsum is held as exact integer micro-units (value × 10⁶ after the
#: engine's decimal(18,6) cast) so state round-trips don't accumulate
#: float error across micro-batches
_SESSION_STATE_SCHEMA = "start long, end long, n long, vsum long"


def _micros6(v) -> int:
    """One value through the engine's decimal(18,6) convention, as exact
    integer micro-units: Decimal(repr(v)) matches Spark's
    BigDecimal.valueOf(double) shortest-representation parse, HALF_UP
    matches Spark's decimal cast rounding (Python's quantize default is
    banker's rounding, which diverges at half-way points)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(float(v)))
        .quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        .scaleb(6)
    )


def _from_micros6(m: int) -> float:
    """Exact micro-unit sum → double, rounding once (same as the batch
    path's single decimal→double cast after the exact sum)."""
    from decimal import Decimal

    return float(Decimal(m).scaleb(-6))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge into one
    session row (start, end, count, value sum).

    - **Streaming**: custom stateful operator via
      ``applyInPandasWithState`` — per-key state holds the open session;
      a processing-time timeout flushes it. The watermark bounds state.
    - **Batch**: the native ``session_window`` aggregation — same
      contract, lets tests assert stream == batch.
    """
    gap_secs = _duration_seconds(gap)

    if not df.isStreaming:
        agg = (
            df.groupBy(
                F.col(user_col),
                F.session_window(F.col(ts_col), gap).alias("w"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                # exact-decimal accumulation (engine convention) → double
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("value_sum"),
            )
        )
        return agg.select(
            F.col(user_col).alias("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdfs, state):
        import pandas as pd

        us = 1_000_000

        if state.hasTimedOut:
            (start, end, n, vsum) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end + gap_secs * us, unit="us")],
                    "n_events": [n],
                    "value_sum": [_from_micros6(vsum)],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        ts_us = rows[ts_col].astype("int64") // 1000  # ns → µs
        vals = rows[value_col].astype("float64")

        if state.exists:
            start, end, n, vsum = state.get
        else:
            start = end = None
            n, vsum = 0, 0

        gap_us = gap_secs * us
        closed = []
        for t, v in zip(ts_us, vals):
            t, mv = int(t), _micros6(v)
            if start is None:
                start, end, n, vsum = t, t, 1, mv
            elif t >= start - gap_us and t - end < gap_us:
                # within the open session's reach — merge, WIDENING in
                # both directions so a late (but in-watermark) event
                # extends the session backward instead of corrupting it
                start, end = min(start, t), max(end, t)
                n += 1
                vsum += mv
            elif t - end >= gap_us:
                closed.append((start, end, n, vsum))
                start, end, n, vsum = t, t, 1, mv
            else:
                # t < start - gap_us: a late event gap-disjoint BEFORE the
                # open session — it can't merge with anything still open,
                # so it closes immediately as its own session (documented
                # single-open-session approximation; batch session_window
                # would merge it with other equally-late neighbors)
                closed.append((t, t, 1, mv))
        state.update((start, end, n, vsum))
        state.setTimeoutDuration(int(gap_secs * 1000))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [
                        pd.Timestamp(e + gap_secs * us, unit="us")
                        for _, e, *_ in closed
                    ],
                    "n_events": [c[2] for c in closed],
                    "value_sum": [_from_micros6(c[3]) for c in closed],
                }
            )

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            _update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


RUNNING_SCHEMA = "user_id bigint, n_events bigint, value_sum double"
#: exact integer micro-units, like _SESSION_STATE_SCHEMA
_RUNNING_STATE_SCHEMA = "n long, vsum long"


def running_totals(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-key lifetime running totals (count + value sum).

    - **Streaming**: custom stateful operator via
      ``applyInPandasWithState`` — per-key state carries (n, sum)
      forever; every micro-batch that touches a key emits that key's
      updated totals (update-style output). The canonical "running
      counter" shape: state is O(keys), not O(events).
    - **Batch**: a plain groupBy aggregate — identical to the FINAL
      streaming emission per key, which is what tests assert.

    Sums accumulate through the engine's decimal convention so batch,
    stream, and the SQL oracle agree bit-for-bit.
    """
    if not df.isStreaming:
        return (
            df.groupBy(F.col(user_col).alias("user_id"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col(value_col).cast("decimal(18,6)"))
                .cast("double")
                .alias("value_sum"),
            )
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return

        n, vsum = state.get if state.exists else (0, 0)
        # exact micro-unit accumulation mirrors the batch decimal(18,6)
        # sum bit-for-bit, including Spark's HALF_UP cast rounding, and
        # round-trips through state without float error
        for pdf in pdfs:
            n += len(pdf)
            for v in pdf[value_col].astype("float64"):
                vsum += _micros6(v)
        state.update((n, vsum))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [_from_micros6(vsum)],
            }
        )

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


GHH_SCHEMA = (
    "group string, value string, n bigint, group_n bigint"
)
#: the Misra–Gries summary: parallel value/count arrays + rows seen
_GHH_STATE_SCHEMA = "vals array<string>, counts array<long>, n long"


def stream_group_heavy_hitters(
    df: DataFrame,
    group_col: str,
    value_col: str,
    support: float = 0.01,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-group heavy hitters over an unbounded stream — the third
    custom stateful operator (with ``sessionize`` / ``running_totals``)
    and the streaming twin of :func:`~pybabe_spark.operators.sketch.
    group_heavy_hitters`.

    - **Streaming**: ``applyInPandasWithState`` keyed by group; the
      state is a Misra–Gries summary of ⌈1/support⌉ counters (bulk
      per-batch updates — no Python row loop inside a batch) plus the
      rows-seen total. Every trigger that touches a group re-emits its
      current candidates ``(group, value, n, group_n)`` where ``n`` is
      the MG count — a LOWER bound on the true count, within
      ``group_n·support`` of it, and never missing a value whose true
      in-group frequency exceeds ``support`` (the classic MG
      guarantee). State is O(groups / support), independent of stream
      length — the property a streaming exact count lacks.
    - **Batch**: delegates to the exact operator (same schema, string-
      cast keys), which is what the parity test bounds against.
    """
    import math

    if not 1e-4 <= support <= 1.0:
        raise ValueError(
            f"stream_group_heavy_hitters: support {support} "
            "outside [1e-4, 1]"
        )
    if not df.isStreaming:
        from pybabe_spark.operators.sketch import group_heavy_hitters

        out = group_heavy_hitters(df, group_col, value_col, support)
        return out.select(
            F.col(group_col).cast("string").alias("group"),
            F.col(value_col).cast("string").alias("value"),
            "n",
            "group_n",
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    k = math.ceil(1.0 / support)

    def _update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            vals, counts, n = state.get
            cnt = dict(zip(vals, counts))
        else:
            cnt, n = {}, 0
        for pdf in pdfs:
            col = pdf["__v"].dropna()
            n += len(col)
            for v, c in col.value_counts(sort=False).items():
                if v in cnt or len(cnt) < k:
                    cnt[v] = cnt.get(v, 0) + int(c)
                else:
                    # bulk decrement (the batch helper's discipline)
                    dec = min(int(c), min(cnt.values()))
                    for kk in list(cnt):
                        cnt[kk] -= dec
                        if cnt[kk] <= 0:
                            del cnt[kk]
                    rem = int(c) - dec
                    if rem > 0 and (v in cnt or len(cnt) < k):
                        cnt[v] = cnt.get(v, 0) + rem
        state.update(
            (list(cnt.keys()), [int(x) for x in cnt.values()], int(n))
        )
        if cnt:
            yield pd.DataFrame(
                {
                    "group": [key[0]] * len(cnt),
                    "value": list(cnt.keys()),
                    "n": [int(x) for x in cnt.values()],
                    "group_n": [int(n)] * len(cnt),
                }
            )

    keyed = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("__g"),
        F.col(value_col).cast("string").alias("__v"),
        F.col(ts_col).alias("__ts"),
    )
    return (
        keyed.withWatermark("__ts", watermark)
        .groupBy(F.col("__g"))
        .applyInPandasWithState(
            _update,
            outputStructType=GHH_SCHEMA,
            stateStructType=_GHH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _duration_seconds(s: str) -> int:
    from pybabe_spark.functions.time import parse_duration_seconds

    return parse_duration_seconds(s)


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


def run_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Production file sink: append-mode parquet with checkpointed
    exactly-once progress; ``partition_by`` lays out the 100 TB
    directory structure (the streaming analogue of push's filename
    templates / partitionBy)."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def run_foreach_batch(
    stream_df: DataFrame,
    fn,
    checkpoint: str,
    output_mode: str = "update",
    available_now: bool = True,
):
    """foreachBatch sink: ``fn(batch_df, batch_id)`` runs per micro-batch
    with the full batch DataFrame API — the escape hatch for sinks with
    no native streaming writer (JDBC upserts, MERGE targets). Checkpoint
    + batch_id give at-least-once with idempotent-by-batch-id dedup."""
    w = (
        stream_df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_near_dedup_against_index(
    stream_df: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    update_index: bool = True,
    available_now: bool = True,
):
    """Incremental-crawl near-dedup: each arriving micro-batch is
    deduplicated against the STORED MinHash index
    (operators/dedup_scale.py::near_dedup_against_stored — banded
    bucket equi-join, signature-fraction estimate, seen text never
    read), survivors are appended to ``output_path``, and — with
    ``update_index`` — their signatures/buckets are appended to the
    index so LATER batches dedup against them too. This is the
    steady-state shape of a production crawl pipeline: the corpus is
    write-once, the index is the only growing working set (~1/1000 of
    corpus), and each batch costs one signature pass over the batch
    plus index-sized joins.

    Runs through foreachBatch deliberately: the candidate-distinct and
    keep-decision steps are per-batch aggregates, which the micro-batch
    boundary already scopes — no unbounded streaming state, no
    watermark tuning. Batches are processed sequentially by Structured
    Streaming, so the read-then-append on the index is race-free.
    At-least-once note: a batch REPLAYED after a crash re-appends its
    survivors; replayed docs collide with their own signatures already
    in the index and drop to zero survivors, so the index stays
    duplicate-bounded while ``output_path`` should be compacted
    idempotently by id downstream (the standard foreachBatch contract).
    """
    from pybabe_spark.operators.dedup_scale import (
        _band_buckets,
        minhash_signature,
        near_dedup_against_stored,
    )

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        import posixpath

        spark = batch_df.sparkSession
        kept = near_dedup_against_stored(
            batch_df, index_path, id_col=id_col, text_col=text_col,
            threshold=threshold,
        )
        # the keep-set feeds BOTH the sink and the index append — cut
        # the lineage once instead of re-running the probe joins twice
        kept = kept.localCheckpoint(eager=True)
        kept.write.mode("append").parquet(output_path)
        if update_index:
            p = spark.read.parquet(
                posixpath.join(index_path, "params")
            ).collect()[0]
            sig = minhash_signature(
                kept, id_col, text_col, p["num_hashes"], p["shingle_n"]
            )
            sig.write.mode("append").parquet(
                posixpath.join(index_path, "signatures")
            )
            _band_buckets(sig, id_col, id_col, p["num_hashes"], p["bands"]) \
                .write.mode("append").partitionBy("band").parquet(
                    posixpath.join(index_path, "buckets")
                )

    return run_foreach_batch(
        stream_df, _batch, checkpoint,
        output_mode="update", available_now=available_now,
    )


def stream_dedup_against(
    stream_df: DataFrame,
    seen_path: str,
    output_path: str,
    checkpoint: str,
    keys: "str | list[str]",
    ts_col: str | None = None,
    watermark: str | None = None,
    update_seen: bool = True,
    available_now: bool = True,
):
    """Streaming twin of ``operators/merge.py::dedup_against`` (the
    batch key ``dedup_against_seen``): every arriving micro-batch is
    deduplicated against the STORED seen-key table, survivors append to
    ``output_path``, and — with ``update_seen`` — their keys append to
    the seen table so later batches (and later RUNS: the table is the
    durable all-time memory) drop them too.

    Two dedup layers, each doing the job the other can't:

    * ``ts_col`` + ``watermark`` turns on
      ``dropDuplicatesWithinWatermark`` BEFORE the sink — in-flight
      duplicate suppression with BOUNDED state (keys older than the
      watermark are evicted), which is the only sane within-stream
      dedup at 100 TB/day; without a watermark the within-batch
      ``dropDuplicates`` still guarantees one row per key per batch.
    * the seen-table anti-join is the UNBOUNDED-horizon memory the
      watermark deliberately gave up: a key first seen last month
      still drops, because table storage (not executor state) holds
      the history — same stored-sidecar discipline as the MinHash
      index twin above.

    Per batch: one left-anti equi-join against a key-only projection
    (AQE broadcasts a small seen side) + one append of a key-only
    delta. foreachBatch scopes the read-then-append race-free (batches
    run sequentially); on an at-least-once replay the batch's own keys
    are already in the table, so the replay appends zero survivors —
    the seen table is self-healing, ``output_path`` compacts
    idempotently by key downstream (the standard foreachBatch
    contract).
    """
    from pybabe_spark.operators.merge import dedup_against

    key_list = [keys] if isinstance(keys, str) else list(keys)
    if watermark is not None:
        if ts_col is None:
            raise ValueError(
                "stream_dedup_against: watermark needs ts_col"
            )
        stream_df = stream_df.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(key_list)

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(key_list)
        try:
            seen = spark.read.parquet(seen_path)
        except AnalysisException:
            # missing path = first batch bootstraps the table; any
            # OTHER read failure must propagate — silently treating a
            # transient error as "empty table" would re-admit the
            # whole corpus
            seen = None
        kept = (
            dedup_against(fresh, seen, key_list)
            if seen is not None
            else fresh
        )
        # survivors feed BOTH the sink and the seen append — cut the
        # lineage once instead of re-running the anti-join twice
        kept = kept.localCheckpoint(eager=True)
        kept.write.mode("append").parquet(output_path)
        if update_seen:
            kept.select(*key_list).write.mode("append").parquet(seen_path)

    return run_foreach_batch(
        stream_df, _batch, checkpoint,
        output_mode="update", available_now=available_now,
    )


def stream_rollup(
    stream_df: DataFrame,
    rollup_path: str,
    checkpoint: str,
    dims: list[str],
    measures: dict,
    available_now: bool = True,
):
    """Continuously-maintained materialized rollup: every arriving
    micro-batch folds into the stored aggregate via
    operators/rollup.py::rollup_append (batch agg ∪ stored partials →
    re-merge → atomic swap). The streaming complement of the batch
    rollup — dashboards read a dims-cardinality parquet that is always
    a bounded swap behind the stream, and NO raw history is retained
    or re-scanned.

    foreachBatch deliberately (like stream_near_dedup_against_index):
    the merge is a per-batch aggregate scoped by the micro-batch
    boundary — no unbounded streaming state, no watermark. Batches are
    sequential, so read-merge-swap is race-free. At-least-once note: a
    REPLAYED batch double-counts into the rollup; exactly-once needs an
    idempotent batch-id ledger — this op targets the additive-metrics
    dashboards where the occasional replayed micro-batch is an
    accepted trade (the standard foreachBatch contract).

    The first batch creates the rollup (build), later batches append.
    """
    from pybabe_spark.operators.rollup import rollup_append, rollup_build

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        # Hadoop-FS existence check, not os.path: on s3a/hdfs a local
        # isdir is always False and every batch would silently REBUILD,
        # dropping prior state (this sink is classic-session-only via
        # rollup_append's swap anyway)
        spark = batch_df.sparkSession
        jvm = spark.sparkContext._jvm
        hp = jvm.org.apache.hadoop.fs.Path(rollup_path)
        fs = hp.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        if not fs.exists(hp):
            rollup_build(batch_df, dims, measures, rollup_path)
        else:
            rollup_append(batch_df, rollup_path, dims, measures)

    return run_foreach_batch(
        stream_df, _batch, checkpoint,
        output_mode="update", available_now=available_now,
    )


def stream_quarantine(
    stream_df: DataFrame,
    rules,
    clean_path: str,
    quarantine_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming data-contract gate: every micro-batch splits by the
    row-level expectation rules (operators/validate.py::quarantine) —
    clean rows append to ``clean_path``, violating rows append to
    ``quarantine_path`` WITH their ``violations`` tags — the standard
    ingest topology (bad rows never block the pipeline, never get
    silently dropped, and arrive pre-labelled for triage).

    foreachBatch so one batch writes both sinks consistently; the
    tagging itself is the same single-scan codegen projection as the
    batch op. At-least-once on replay like every foreachBatch sink —
    compact idempotently downstream.
    """
    from pybabe_spark.operators.validate import quarantine as _q

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        tagged = _q(batch_df, rules).localCheckpoint(eager=True)
        tagged.filter(F.col("violations") == "").drop(
            "violations"
        ).write.mode("append").parquet(clean_path)
        tagged.filter(F.col("violations") != "").write.mode(
            "append"
        ).parquet(quarantine_path)

    return run_foreach_batch(
        stream_df, _batch, checkpoint,
        output_mode="update", available_now=available_now,
    )


def stream_apply_cdc(
    stream_df: DataFrame,
    snapshot_path: str,
    checkpoint: str,
    keys,
    order_by,
    op_col: str = "op",
    delete_op: str = "D",
    available_now: bool = True,
):
    """Continuously-maintained keyed snapshot from a CDC stream: every
    micro-batch folds into the stored table via
    operators/cdc.py::apply_cdc (read snapshot → last-wins fold →
    atomic swap). The streaming sink a Debezium/outbox topic wants —
    the snapshot is always one bounded swap behind the stream and NO
    raw change history is retained or re-scanned.

    foreachBatch deliberately (the stream_rollup contract): the fold is
    scoped by the micro-batch boundary — no unbounded streaming state,
    no watermark; batches are sequential so read-fold-swap is race-free.
    apply_cdc is idempotent per feed (last-wins is stable), so an
    at-least-once REPLAYED batch re-folds to the same snapshot —
    stronger than the rollup's additive trade. Cross-batch order
    follows the stream: a later batch's changes overwrite earlier ones
    via the fold itself (its rows win only where their op is the key's
    latest — within the batch — and base rows lose by replacement),
    i.e. the append-only ``order_by`` contract of apply_cdc.

    The first batch applies against an empty snapshot (pure inserts).
    ``op_col`` rows with ``delete_op`` delete; everything else upserts.
    """
    from pybabe_spark.operators.cdc import apply_cdc

    keys_l = [keys] if isinstance(keys, str) else list(keys)
    order_l = [order_by] if isinstance(order_by, str) else list(order_by)
    drop = [op_col] + [c for c in order_l if c not in keys_l]

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark.sparkContext._jvm
        hp = jvm.org.apache.hadoop.fs.Path(snapshot_path)
        fs = hp.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        value_cols = [c for c in batch_df.columns if c not in drop]
        if not fs.exists(hp):
            from pyspark.sql import functions as F

            base = batch_df.select(*value_cols).filter(F.lit(False))
        else:
            base = spark.read.parquet(snapshot_path)
        out = apply_cdc(
            base, batch_df, keys_l, order_l, op_col, delete_op
        )
        # collect-free tmp-write + rename swap (the rollup_append
        # discipline): the plan reads the live path, so write the fold
        # to a sibling and swap with two metadata renames — snapshot
        # size never touches the driver
        tmp = jvm.org.apache.hadoop.fs.Path(
            snapshot_path.rstrip("/") + ".cdc.tmp"
        )
        oldp = jvm.org.apache.hadoop.fs.Path(
            snapshot_path.rstrip("/") + ".cdc.old"
        )
        out.write.mode("overwrite").parquet(tmp.toString())
        fs.delete(oldp, True)
        if fs.exists(hp) and not fs.rename(hp, oldp):
            raise IOError(
                f"stream_apply_cdc: could not move {snapshot_path} aside"
            )
        if not fs.rename(tmp, hp):
            fs.rename(oldp, hp)
            raise IOError(
                f"stream_apply_cdc: could not swap in {snapshot_path}"
            )
        fs.delete(oldp, True)

    return run_foreach_batch(
        stream_df, _batch, checkpoint,
        output_mode="update", available_now=available_now,
    )


def build_seasonal_baseline(
    df: DataFrame,
    path: str,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    season: str = "hour_of_day",
) -> None:
    """Materialize a historical :func:`~pybabe_spark.operators.anomaly.
    seasonal_baseline` table to parquet — the stored-model side of
    :func:`stream_anomalies_against` (the ann/bm25 stored-index
    pattern applied to anomaly detection: train on history once, score
    live data forever)."""
    from pybabe_spark.operators.anomaly import seasonal_baseline

    seasonal_baseline(df, key_col, value_col, ts_col, season).write.mode(
        "overwrite"
    ).parquet(path)


def stream_anomalies_against(
    stream_df: DataFrame,
    baseline_path: str,
    flagged_path: str,
    checkpoint: str,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    threshold: float = 3.0,
    season: str = "hour_of_day",
    available_now: bool = True,
):
    """Streaming seasonality-aware anomaly gate: every micro-batch is
    scored against the STORED (key, season-bucket) baseline — built
    from history by :func:`build_seasonal_baseline` — and flagged rows
    append to ``flagged_path`` with their slot mean/std attached. The
    monitoring topology every metrics pipeline runs: the baseline is a
    small broadcastable table, the stream never maintains unbounded
    state, and retraining is just rewriting the parquet.

    The scorer is LITERALLY the batch operator's
    ``flag_against_baseline`` (one equi-join + the fixed-shape
    decision), so batch and stream cannot drift — the test pins
    stream output == batch seasonal_zscore when the baseline is built
    from the same history. foreachBatch appends are at-least-once on
    replay, like every foreachBatch sink here.
    """
    from pybabe_spark.operators.anomaly import flag_against_baseline

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        stats = F.broadcast(spark.read.parquet(baseline_path))
        flagged = flag_against_baseline(
            batch_df, stats, key_col, value_col, ts_col, threshold,
            season,
        )
        flagged.write.mode("append").parquet(flagged_path)

    return run_foreach_batch(
        stream_df, _batch, checkpoint,
        output_mode="update", available_now=available_now,
    )


def stream_bucket_sums(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    store_path: str,
    checkpoint: str,
    bucket_seconds: int = 3600,
    available_now: bool = True,
):
    """Streaming-maintained exact (key, time-bucket) cents-sum store —
    the series state every bucket-grain analytic (Bollinger bands,
    seasonal decomposition, EWMA baselines) needs, kept EXACT without
    unbounded streaming aggregation: every micro-batch reduces to its
    per-(key, bucket) partial cents sums and writes them under its own
    ``__batch=<id>`` partition with DYNAMIC partition overwrite — so a
    REPLAYED batch overwrites exactly itself and the sink is
    idempotent (the property a read-add-write additive rollup cannot
    have; the activity-grain store gets it from anti-join, this one
    from partition ownership). State is the batch × key × bucket
    partial grain, never the event volume; read any time via
    :func:`~pybabe_spark.operators.timeseries.bollinger_from_store`,
    whose bands are proven output-identical to the batch operator
    over the full history (bigint cents partials reaggregate exactly).
    """
    bus = int(bucket_seconds) * 1_000_000

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        part = (
            batch_df.filter(
                F.col(key_col).isNotNull()
                & F.col(ts_col).isNotNull()
                & F.col(value_col).isNotNull()
            )
            .select(
                F.col(key_col).alias("k"),
                F.expr(f"unix_micros({ts_col}) div {bus}").alias("t"),
                (F.col(value_col).cast("decimal(18,2)") * 100)
                .cast("bigint")
                .alias("__x"),
            )
            .groupBy("k", "t")
            .agg(F.sum("__x").alias("__s"))
            .withColumn("__batch", F.lit(int(batch_id)))
        )
        (
            part.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(store_path)
        )

    return run_foreach_batch(
        stream_df, _batch, checkpoint,
        output_mode="update", available_now=available_now,
    )


def stream_activity_grain(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    store_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming-maintained (key, UTC day) activity store — the state
    engagement metrics (DAU/WAU/MAU, streaks, retention) need, kept
    EXACT without unbounded streaming aggregation: every micro-batch
    reduces to its distinct (key, day) pairs, anti-joins the pairs
    already stored, and appends only the new ones. State is the
    user×day grain on disk (bounded by actives × horizon, never the
    event volume), and the raw stream is never re-scanned; read the
    engagement table any time via
    :func:`~pybabe_spark.operators.timeseries.stickiness_from_store`,
    which is proven output-identical to running the batch operator
    over the full history (the stream ≡ batch twin test).

    foreachBatch deliberately (stream_rollup's contract): the
    dedup-append is scoped by the micro-batch boundary, batches are
    sequential so read-anti-join-append is race-free, and a REPLAYED
    batch is harmless here — its pairs are already stored, the
    anti-join drops them, so this sink is naturally idempotent (an
    exactly-once property the additive rollup sink cannot have).

    Reference lineage: the kontagent log-ingest pipeline
    (pybabe/examples, SURVEY §2.1) folded raw logs into per-day user
    activity; this is that fold as an incremental stream.
    """
    from pybabe_spark.operators.timeseries import activity_grain

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        act = activity_grain(batch_df, key_col, ts_col)
        jvm = spark.sparkContext._jvm
        hp = jvm.org.apache.hadoop.fs.Path(store_path)
        fs = hp.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        if fs.exists(hp):
            stored = spark.read.parquet(store_path).select("__k", "__d")
            act = act.join(stored, ["__k", "__d"], "left_anti")
        act.write.mode("append").parquet(store_path)

    return run_foreach_batch(
        stream_df, _batch, checkpoint,
        output_mode="update", available_now=available_now,
    )
