"""SparkSession construction tuned for the engine.

The defaults here are chosen for scale-out first (AQE on, skew-join
handling, broadcast threshold sized for dimension tables) and then bounded
for the local[N] test harness via ``SPARK_GRAFT_CPUS``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pybabe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Scale notes: on a real cluster the master/shuffle settings come from
    spark-submit; everything set here is safe under both local and cluster
    deployment. AQE coalesces the small-SF shuffles locally and re-plans
    skew joins at 100 TB; we intentionally do NOT hand-tune parallelism
    beyond a sane shuffle-partition default.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 32)))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce with parallelism-first (the Spark default, restored in
        # the r13 optimization round): with parallelismFirst=false every
        # sub-64MB shuffle collapsed to ONE partition, serializing every
        # mid-size compute stage (a 594k-row/15MB rank grain ran its
        # window, cache fill and aggregates single-task on a 32-core
        # box — measured 2-3× slower per stage). parallelism-first still
        # collapses genuinely tiny shuffles (minPartitionSize 1MB floor
        # keeps a 100KB shuffle at one task — no empty-tasklet waves),
        # but lets a 15MB shuffle fan to ~15 tasks. At 100 TB every
        # shuffle is far above the advisory size, so both settings plan
        # identically there; this only changes the small-shuffle regime.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
