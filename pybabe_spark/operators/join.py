"""PyBabe-style lookup join with the 4-mode on_error policy.

Reference: pybabe/join.py:5-50 — the only join in PyBabe. Semantics:

- build side = entire ``join_stream`` hashed into a dict keeping the
  **first** row per key (join.py:14-16) → never duplicates probe rows;
- ``on_error`` selects the flavor (pybabe/base.py:132-135):
  * WARN (default): inner join, dropped probe rows are counted/logged
  * FAIL: raise if any probe row misses — detected IN-PLAN (a
    ``raise_error`` guard over the left join's match marker), so the
    error surfaces from the query's FIRST ACTION as a Spark
    ``USER_RAISED_EXCEPTION``, the plan stays lazy, and the join runs
    exactly once (the reference raises during the pull, pybabe's
    equivalent of the action)
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

    if on_error == ON_ERROR_FAIL:
        # fail if any probe key has no match — detected IN-PLAN so the
        # join stays lazy and single-execution: a left join against the
        # marked build side followed by a raise_error on unmarked rows.
        # The check rides the same left join that produces the output
        # (one job, at the query's own first action) instead of the old
        # eager left_anti probe at construction time, which both ran a
        # hidden job and re-executed the probe lineage for the main join.
        from pybabe_spark.operators._util import gen_col

        marker = gen_col(list(probe.columns) + list(dim.columns), "__matched")
        build = build.withColumn(marker, F.lit(True))
        joined = probe.join(build, probe[key] == build[jk], "left")
        joined = joined.drop(build[jk])
        check = F.when(
            F.col(marker).isNull(),
            F.raise_error(
                F.concat(
                    F.lit("join: probe key "),
                    F.coalesce(F.col(key).cast("string"), F.lit("NULL")),
                    F.lit(" not found in build side"),
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
        return joined.filter(check).drop(marker)

    cond = probe[key] == build[jk]
    how = "left" if on_error == ON_ERROR_NONE else "inner"
    joined = probe.join(build, cond, how)
    # drop the build-side key column (reference appends only non-key fields)
    joined = joined.drop(build[jk])

    if on_error == ON_ERROR_WARN:
        joined._pybabe_join_observation = obs  # type: ignore[attr-defined]
    return joined


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    nearest ``right_ts`` at-or-before (``backward``), at-or-after
    (``forward``), or closest either side (``nearest`` — absolute-gap
    winner, ties → the backward row, pandas' rule) of the left row's
    ``left_ts``, per ``on`` key. Left outer:
    unmatched left rows keep NULL right columns. ``tolerance`` (an
    interval string like ``'5 minutes'``, matching pandas
    ``merge_asof(tolerance=...)``) voids matches farther than that from
    the left timestamp — a map-side post-filter on the matched payload,
    no change to the join shape.

    Capability extension over the reference (PyBabe has only the equi
    lookup join, pybabe/join.py:5-50); time-series enrichment needs this.

    Scale-first plan: NOT a windowed inequality join (which is O(n·m)
    per key under sort-merge). Both sides are tagged and **unioned**,
    then a single ``last(..., ignorenulls)`` running window over
    ``(key, ts)`` carries the right payload forward onto left rows —
    one shuffle on the key, one sort, linear scan; identical shape at
    100 TB. The right payload travels as ONE struct so all its columns
    are taken from the SAME matched row even when payload values are
    NULL.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: bad direction {direction!r}")

    payload_cols = [c for c in right.columns if c not in (on,)]
    collide = [c for c in payload_cols if c in left.columns and c != right_ts]
    if collide:
        raise ValueError(
            f"asof_join: right columns {collide} collide with left; rename first"
        )
    # The matched right timestamp is part of the payload; if its name
    # collides with a left column (the documented defaults left_ts ==
    # right_ts == 'ts'), alias it rather than clobber the left column —
    # pandas.merge_asof likewise keeps the left key/timestamp intact.
    out_name = {
        c: (f"{right_ts}_right" if c == right_ts and c in left.columns else c)
        for c in payload_cols
    }
    recollide = [n for n in out_name.values() if n in left.columns]
    if recollide:
        raise ValueError(
            f"asof_join: right columns {recollide} collide with left; rename first"
        )
    r = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("__asof_ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
        F.lit(0).alias("__is_left"),
    ).filter(F.col("__asof_ts").isNotNull())
    # NULL-timestamp right rows can never be "nearest at-or-before/after"
    # (they'd sort nulls-first under asc and leak their payload onto every
    # earlier left row); pandas merge_asof likewise drops NaT right rows.
    l = left.select(
        "*",
        F.col(left_ts).cast("timestamp").alias("__asof_ts"),
        F.lit(1).alias("__is_left"),
    )
    both = l.unionByName(r, allowMissingColumns=True)

    # Ordering: right rows must be visible to left rows at the same
    # timestamp iff allow_exact_matches — the tag column is the tiebreak.
    tie = F.col("__is_left").asc() if allow_exact_matches else F.col("__is_left").desc()
    wb = Window.partitionBy(on).orderBy(
        F.col("__asof_ts").asc(), tie
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = Window.partitionBy(on).orderBy(
        F.col("__asof_ts").desc(), tie
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def _side(w):
        m = F.last("__payload", ignorenulls=True).over(w)
        # a NULL left timestamp matches nothing (pandas NaT semantics);
        # under the forward window's desc order such rows sort last and
        # would otherwise pick up the final payload
        return F.when(F.col("__asof_ts").isNotNull(), m)

    def _within(mcol, side):
        if tolerance is None:
            return mcol
        tol = F.expr(f"INTERVAL {tolerance}")
        mts = mcol[right_ts].cast("timestamp")
        cond = (
            mts >= F.col("__asof_ts") - tol
            if side == "backward"
            else mts <= F.col("__asof_ts") + tol
        )
        return F.when(cond, mcol)

    if direction in ("backward", "forward"):
        w = wb if direction == "backward" else wf
        matched = both.withColumn("__m", _side(w))
        matched = matched.withColumn(
            "__m", _within(F.col("__m"), direction)
        )
    else:
        # nearest: both running candidates in one plan (same key
        # shuffle, two sorts), tolerance voids each side independently
        # (pandas: filter by tolerance, then take the closer), then the
        # per-row pick — smaller absolute gap, ties → backward (the
        # pandas nearest tiebreak)
        matched = (
            both.withColumn("__mb", _within(_side(wb), "backward"))
            .withColumn("__mf", _within(_side(wf), "forward"))
        )
        gapb = F.col("__asof_ts").cast("double") - F.col("__mb")[
            right_ts
        ].cast("timestamp").cast("double")
        gapf = F.col("__mf")[right_ts].cast("timestamp").cast(
            "double"
        ) - F.col("__asof_ts").cast("double")
        matched = matched.withColumn(
            "__m",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(gapb <= gapf, F.col("__mb"))
            .otherwise(F.col("__mf")),
        ).drop("__mb", "__mf")
    out = matched.filter(F.col("__is_left") == 1)
    for c in payload_cols:
        out = out.withColumn(out_name[c], F.col("__m")[c])
    return out.drop("__m", "__payload", "__asof_ts", "__is_left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    key: str | None = None,
    bucket: str = "1 hour",
    broadcast_right: bool = False,
) -> DataFrame:
    """Interval containment join: left rows whose ``point`` falls in
    ``[start, end)`` of a right-side interval (capability extension; the
    reference has no non-equi join).

    Plan strategy by shape:

    - ``key`` given → plain equi-join on the key plus the range filter:
      Catalyst runs a hash/sort-merge join on the key and evaluates the
      range predicate as a post-join filter — no quadratic blowup as long
      as keys are selective.
    - no ``key`` → a raw inequality join would be a nested-loop cross
      product. Instead both sides are **bucketized** on time (intervals
      explode into every ``bucket`` they overlap via ``sequence``), the
      join becomes an equi-join on the bucket id, and the exact
      containment predicate filters within buckets. Shuffle is
      data-linear; at 100 TB pick ``bucket`` ≈ median interval length.
    """
    contain = (F.col(point) >= F.col(start)) & (F.col(point) < F.col(end))
    if key is not None:
        r = F.broadcast(right) if broadcast_right else right
        return left.join(r, on=[key], how="inner").filter(contain)

    from pybabe_spark.functions.time import parse_duration_seconds

    step_us = parse_duration_seconds(bucket) * 1_000_000
    lb = left.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(point)) / step_us).cast("long")
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start)) / step_us).cast("long"),
                F.floor((F.unix_micros(F.col(end)) - 1) / step_us).cast("long"),
            )
        ),
    )
    rb = F.broadcast(rb) if broadcast_right else rb
    return lb.join(rb, "__bucket").filter(contain).drop("__bucket")


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    key: str | None = None,
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval-OVERLAP join: all (left, right) pairs whose half-open
    time ranges intersect — ``a.start < b.end AND b.start < a.end`` —
    plus ``overlap_us`` (exact microseconds of intersection). The
    two-interval-sets temporal join :func:`range_join` (point-in-
    interval) cannot express: concurrent sessions, meeting conflicts,
    downtime × deploy windows. Column names must not overlap —
    except the ``key`` column itself, which (when given as a single
    name) must exist on BOTH sides and is emitted once.

    Plan: with ``key`` (a shared column name, or a
    ``(left_key, right_key)`` pair), an equi-join plus the overlap
    filter. Without,
    both interval sets explode into the time ``bucket`` cells they
    cover and join on the cell — and each qualifying pair is emitted
    EXACTLY once with no dedup shuffle: overlapping intervals both
    cover the cell containing the LATER of the two starts, so the join
    keeps only that canonical cell (``cell == floor(max(starts)/s)``).
    Cells per interval is duration/bucket + 1 — pick ``bucket`` ≈ the
    typical interval length; intervals are otherwise unbounded (a
    year-long interval costs a year of hourly cells, it does not
    break).
    """
    # the equi-join key is the one legitimately shared name (joined by
    # name → emitted once); everything else shared is ambiguous
    lk, rk = (key, key) if key is None or isinstance(key, str) else key
    exempt = {lk} if key is not None and lk == rk else set()
    overlap = (set(left.columns) & set(right.columns)) - exempt
    if overlap:
        raise ValueError(
            f"overlap_join: overlapping column names {sorted(overlap)}; "
            "rename one side first"
        )
    ls, le = left_range
    rs, re = right_range
    # empty/inverted intervals ([t, t)) contain nothing and would both
    # trip the strict overlap predicate and explode a DESCENDING cell
    # sequence — excluded on both sides (and in the oracle)
    left = left.filter(F.col(ls) < F.col(le))
    right = right.filter(F.col(rs) < F.col(re))
    meet = (F.col(ls) < F.col(re)) & (F.col(rs) < F.col(le))
    ov_us = (
        F.least(F.unix_micros(F.col(le)), F.unix_micros(F.col(re)))
        - F.greatest(F.unix_micros(F.col(ls)), F.unix_micros(F.col(rs)))
    ).alias("overlap_us")
    if key is not None:
        if lk == rk:
            # join by name: the key column appears once in the output
            return (
                left.join(right, on=lk)
                .filter(meet)
                .select(
                    *left.columns,
                    *[c for c in right.columns if c != rk],
                    ov_us,
                )
            )
        return (
            left.join(right, left[lk] == right[rk])
            .filter(meet)
            .select(*left.columns, *right.columns, ov_us)
        )
    from pybabe_spark.functions.time import parse_duration_seconds

    step_us = parse_duration_seconds(bucket) * 1_000_000

    def cells(s: str, e: str) -> "F.Column":
        return F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(s)) / step_us).cast("long"),
                F.floor((F.unix_micros(F.col(e)) - 1) / step_us).cast(
                    "long"
                ),
            )
        )

    lb = left.select("*", cells(ls, le).alias("__cell"))
    rb = right.select("*", cells(rs, re).alias("__cell"))
    canonical = F.col("__cell") == F.floor(
        F.greatest(F.unix_micros(F.col(ls)), F.unix_micros(F.col(rs)))
        / step_us
    ).cast("long")
    return (
        lb.join(rb, "__cell")
        .filter(meet & canonical)
        .select(*left.columns, *right.columns, ov_us)
    )


def overlap_join_sql(
    left_select: str,
    right_select: str,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    left_cols: list[str],
    right_cols: list[str],
) -> str:
    """DuckDB oracle of :func:`overlap_join` — the raw inequality-join
    definition the bucketed plan must reproduce exactly."""
    ls, le = left_range
    rs, re = right_range
    cols = ", ".join(
        [f"l.{c}" for c in left_cols] + [f"r.{c}" for c in right_cols]
    )
    return f"""
    SELECT {cols},
           least(epoch_us(l.{le}), epoch_us(r.{re}))
             - greatest(epoch_us(l.{ls}), epoch_us(r.{rs})) AS overlap_us
    FROM ({left_select}) l JOIN ({right_select}) r
      ON l.{ls} < r.{re} AND r.{rs} < l.{le}
    WHERE l.{ls} < l.{le} AND r.{rs} < r.{re}
    """
