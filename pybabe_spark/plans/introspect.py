"""Safe plan/partitioning introspection.

Several operators tune themselves from cheap plan metadata (estimated
input size, current partition count). Classic PySpark exposes these only
through private surfaces (``df._jdf``, ``df.rdd``) that do not exist
under Spark Connect sessions — so every probe lives here, wrapped to
degrade to "unknown" (None) instead of raising, and callers must treat
None as "no information", never as zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Catalyst reports Long.MaxValue-ish sizes when no estimate exists;
#: anything at/above this is "statistics unknown", not "huge".
STATS_UNKNOWN_BYTES = 1 << 60


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's estimated input size in bytes, or None when the
    estimate is unavailable (Connect session) or unknown (statless
    plan — Catalyst's Long.MaxValue sentinel)."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
    return None if size >= STATS_UNKNOWN_BYTES else size


def num_partitions(df: DataFrame) -> int | None:
    """Current partition count of the analyzed plan, or None when the
    RDD surface is unavailable (Connect session)."""
    try:
        return int(df.rdd.getNumPartitions())
    except Exception:
        return None


def default_parallelism(spark: SparkSession, fallback: int = 8) -> int:
    """Cluster default parallelism, falling back to the shuffle-partition
    setting (available on every session type) and finally ``fallback``."""
    try:
        return int(spark.sparkContext.defaultParallelism)
    except Exception:
        pass
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return fallback
