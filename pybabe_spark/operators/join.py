"""PyBabe-style lookup join with the 4-mode on_error policy.

Reference: pybabe/join.py:5-50 — the only join in PyBabe. Semantics:

- build side = entire ``join_stream`` hashed into a dict keeping the
  **first** row per key (join.py:14-16) → never duplicates probe rows;
- ``on_error`` selects the flavor (pybabe/base.py:132-135):
  * WARN (default): inner join, dropped probe rows are counted/logged
  * FAIL: raise if any probe row misses
  * SKIP: silent inner join
  * NONE: left outer (missing → NULLs, join.py:41-45)

Spark-first: ``broadcast(dim.dropDuplicates-first)`` + hash join. The dim
side is deduplicated to one row per key *before* the broadcast so the join
is provably non-expanding. WARN's dropped-row count is an ``observe()``
metric, not a driver-side loop.
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from pybabe_spark.sources.io import INGEST_ID

log = logging.getLogger("pybabe_spark.join")

ON_ERROR_FAIL = "FAIL"
ON_ERROR_SKIP = "SKIP"
ON_ERROR_WARN = "WARN"
ON_ERROR_NONE = "NONE"


def _first_per_key(dim: DataFrame, key: str) -> DataFrame:
    """Build-side first-row-per-key dedup (pybabe/join.py:14-16).

    With an ingest id present we reproduce keep-first exactly; otherwise
    dropDuplicates picks an arbitrary representative (documented
    relaxation — identical results whenever the dim key is unique).
    """
    if INGEST_ID in dim.columns:
        w = Window.partitionBy(key).orderBy(F.col(INGEST_ID))
        return (
            dim.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", INGEST_ID)
        )
    return dim.dropDuplicates([key])


def join(
    probe: DataFrame,
    join_stream: DataFrame,
    key: str,
    join_key: str | None = None,
    add_fields: Sequence[str] | None = None,
    on_error: str = ON_ERROR_WARN,
    broadcast_build: bool = True,
) -> DataFrame:
    """Equi lookup join, PyBabe flavor (pybabe/join.py:5-50).

    Parameters mirror the reference: ``key`` on the probe side,
    ``join_key`` on the build side (defaults to ``key``), ``add_fields``
    restricts which build-side columns are appended (default: all except
    the join key).

    ``broadcast_build=False`` opts out of the broadcast hint for build
    sides too large for executor memory — Spark then picks sort-merge and
    AQE may still convert back to broadcast at runtime.
    """
    jk = join_key or key
    dim = _first_per_key(join_stream, jk)
    wanted = list(add_fields) if add_fields else [c for c in dim.columns if c != jk]
    dim = dim.select(jk, *[c for c in wanted if c != jk])
    # avoid output-name collisions with probe columns (reference appends fields)
    collisions = {c for c in dim.columns if c != jk and c in probe.columns}
    for c in collisions:
        dim = dim.withColumnRenamed(c, f"{c}_joined")
    build = F.broadcast(dim) if broadcast_build else dim

    if on_error == ON_ERROR_WARN:
        # observe probe cardinality pre-join; dropped = probe_rows − output
        # rows, readable from the Observation after any action — a metric,
        # not an extra job (reference logs each dropped row, join.py:38-40).
        obs = Observation("join_misses")
        probe = probe.observe(obs, F.count(F.lit(1)).alias("probe_rows"))

    cond = probe[key] == build[jk]
    how = "left" if on_error == ON_ERROR_NONE else "inner"
    joined = probe.join(build, cond, how)
    # drop the build-side key column (reference appends only non-key fields)
    joined = joined.drop(build[jk])

    if on_error == ON_ERROR_WARN:
        joined._pybabe_join_observation = obs  # type: ignore[attr-defined]
    elif on_error == ON_ERROR_FAIL:
        # fail if any probe key has no match: left_anti probe is non-empty
        misses = probe.join(build, probe[key] == build[jk], "left_anti").limit(1)
        if misses.count() > 0:
            row = misses.collect()[0]
            raise KeyError(f"join: probe key {row[key]!r} not found in build side")
    return joined
