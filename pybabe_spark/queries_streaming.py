"""Event-time windowing queries (batch form of the streaming operators —
Spark's unified batch/stream semantics make the batch plan the oracle-
checkable definition; tests/test_streaming.py runs the same operators as
real streams and asserts stream == batch).

Window starts are surfaced as strings: DuckDB's time_bucket and Spark's
F.window agree on epoch-aligned boundaries, and string rendering avoids
timestamp-unit differences between the engines' pandas conversions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pybabe_spark.queries import register
from pybabe_spark.sources.io import read_table
from pybabe_spark.streaming.ops import sliding_counts, tumbling_counts

_TS = "CAST(ts AS TIMESTAMP)"  # DuckDB: ns → µs


@register(
    "stream_tumbling_hour",
    f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, {_TS}), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1
    """,
)
def q_tumbling(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    out = tumbling_counts(ev, "ts", "1 hour", value_col="value")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_events",
        "value_sum",
    )


@register(
    "stream_sliding_hour",
    f"""
    WITH b AS (
      SELECT strftime(time_bucket(INTERVAL 1 HOUR, {_TS}), '%Y-%m-%d %H:%M:%S')
               AS window_start
      FROM events
      UNION ALL
      SELECT strftime(time_bucket(INTERVAL 1 HOUR, {_TS} - INTERVAL 30 MINUTE)
                      + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
      FROM events
    )
    SELECT window_start, COUNT(*) AS n_events FROM b GROUP BY 1
    """,
)
def q_sliding(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    out = sliding_counts(ev, "ts", "1 hour", "30 minutes")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_events",
    )


@register(
    "sessionize_users",
    f"""
    WITH e AS (SELECT user_id, {_TS} AS ts, value FROM events),
    marked AS (
      SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    grp AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
    FROM grp GROUP BY user_id, sid
    """,
)
def q_sessionize(spark, sf_dir):
    from pybabe_spark.streaming.ops import sessionize

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return sessionize(ev, gap="30 minutes")


@register(
    "stream_running_totals",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
    FROM events GROUP BY user_id
    """,
)
def q_running_totals(spark, sf_dir):
    """Batch form of the stateful per-key running counter
    (streaming/ops.py::running_totals, applyInPandasWithState with
    O(keys) state); the real-stream final emission is asserted equal in
    tests/test_streaming.py::test_running_totals_stream_matches_batch."""
    from pybabe_spark.streaming.ops import running_totals

    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return running_totals(ev)


@register(
    "stream_dedup_users",
    "SELECT user_id, COUNT(*) AS n FROM (SELECT DISTINCT user_id, event_type FROM events) GROUP BY user_id",
)
def q_stream_dedup(spark, sf_dir):
    from pybabe_spark.streaming.ops import dedup_within_watermark

    ev = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    distinct = dedup_within_watermark(ev, ["user_id", "event_type"], "ts")
    return distinct.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))


@register(
    "interval_join_click_purchase",
    f"""
    WITH c AS (SELECT event_id, user_id, {_TS} AS ts FROM events
               WHERE event_type = 'click'),
         p AS (SELECT event_id, user_id, {_TS} AS ts FROM events
               WHERE event_type = 'purchase')
    SELECT c.event_id AS click_id, p.event_id AS purchase_id
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 10 MINUTE
    """,
)
def q_interval_join(spark, sf_dir):
    """Batch form of the stream-stream interval join (purchases within 10
    minutes after a click by the same user); the real two-stream run is
    asserted equal in tests/test_streaming.py."""
    from pybabe_spark.streaming.ops import interval_join

    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    return interval_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="pts"
    ).select("click_id", "purchase_id")


def _ghh_stream_sql():
    from pybabe_spark.operators.sketch import group_heavy_hitters_sql

    frame = """
        SELECT event_type,
               CAST(CASE WHEN user_id % 3 = 0 THEN 0
                         ELSE user_id % 50 END AS VARCHAR) AS val
        FROM events
    """
    inner = group_heavy_hitters_sql(frame, "event_type", "val", 0.05)
    return (
        "SELECT CAST(event_type AS VARCHAR) AS \"group\", val AS value, "
        f"n, group_n FROM ({inner})"
    )


@register("stream_group_hh_events", _ghh_stream_sql())
def q_stream_group_hh(spark, sf_dir):
    """Batch arm of the streaming Misra–Gries heavy-hitters twin
    (streaming/ops.py::stream_group_heavy_hitters): per event type,
    values above 5% in-group share of a deliberately skewed derived
    column — exact counts, string-cast twin schema. The REAL stateful
    stream (applyInPandasWithState, MG state per group) is bounded
    against this in tests/test_streaming.py."""
    from pybabe_spark.streaming.ops import stream_group_heavy_hitters

    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("user_id") % 3 == 0, F.lit(0))
        .otherwise(F.col("user_id") % 50)
        .cast("string")
        .alias("val"),
        "ts",
    )
    return stream_group_heavy_hitters(ev, "event_type", "val", 0.05)
