"""Spatial joins on planar coordinates: grid-bucketed radius join and
nearest-neighbor-within-radius — exact integer geometry.

Beyond-reference capability: the reference's only "join by closeness"
machinery is the time-based as-of join; point data (store/customer
geo, embedding 2-D projections, sensor grids) needs the spatial
analogue. The classic scale trap is the all-pairs distance filter —
O(n·m) — which no 100 TB table survives. The fix is the uniform grid:
with cell size = radius, any pair within the radius lies in the same
or an adjacent cell, so candidates = one equi-join on cell id with
one side replicated to its 3×3 neighborhood — 9× one side's rows,
never n·m. The confirm is an exact integer squared-distance compare.

Exact arithmetic: coordinates lift to bigint micro-units
(DECIMAL(18,6)·10⁶ — six decimal places covers GPS precision), cells
come from explicit positive-modulus floor division (``x div s``
truncates toward zero and would split cells at the origin; the
``(x − pmod(x,s)) / s`` form floors identically on both engines), and
the squared distance is DECIMAL(38,0)/HUGEINT — no floats, no sqrt,
fully value-oracle-able.

Scale shape: one explode (×9 on the replicated side — choose the
smaller), one equi-join shuffle on the cell id, codegen confirm.
Skewed cells (urban density) are ordinary join skew — AQE's skew
split or the salted-join operator apply unchanged. The nearest form
adds one min_by hash agg on the left key, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _micros(col) -> "F.Column":
    return (
        (F.col(col) if isinstance(col, str) else col)
        .cast("decimal(18,6)")
        * 1_000_000
    ).cast("bigint")


def _cell(col: "F.Column", size: int) -> "F.Column":
    # exact floor division (both engines): subtracting the positive
    # modulus makes the numerator an exact multiple, so the IEEE
    # division is bit-exact for |micros| < 2^53 (coordinates to ~9e9
    # units — far past geographic micro-degrees) and truncation equals
    # floor regardless of sign
    return ((col - F.pmod(col, F.lit(size))) / F.lit(size)).cast(
        "bigint"
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_xy: tuple[str, str] = ("x", "y"),
    right_xy: tuple[str, str] = ("x", "y"),
    replicate: str = "right",
) -> DataFrame:
    """All (left row, right row) pairs within planar Euclidean
    ``radius`` (inclusive): left columns + right columns + ``dist2``
    (squared distance in micro-units², DECIMAL(38,0) — take
    ``sqrt(dist2)/1e6`` for the float distance). Column names must not
    overlap between the sides. NULL coordinates never match.
    ``replicate`` ∈ 'left'/'right' picks the side exploded ×9 — use
    the smaller."""
    if replicate not in ("left", "right"):
        raise ValueError("radius_join: replicate must be 'left'/'right'")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"radius_join: overlapping columns {sorted(overlap)}; "
            "rename one side first"
        )
    r = int(round(float(radius) * 1_000_000))
    if r <= 0:
        raise ValueError("radius_join: radius must be positive")
    lx, ly = (_micros(c) for c in left_xy)
    rx, ry = (_micros(c) for c in right_xy)
    lt = left.withColumn("__lx", lx).withColumn("__ly", ly).filter(
        F.col("__lx").isNotNull() & F.col("__ly").isNotNull()
    )
    rt = right.withColumn("__rx", rx).withColumn("__ry", ry).filter(
        F.col("__rx").isNotNull() & F.col("__ry").isNotNull()
    )
    off = F.explode(
        F.expr(
            "transform(sequence(0, 8), "
            "i -> struct(i div 3 - 1 as dx, i % 3 - 1 as dy))"
        )
    ).alias("__o")
    if replicate == "right":
        rt = rt.select("*", off).select(
            *[c for c in rt.columns],
            (_cell(F.col("__rx"), r) + F.col("__o.dx")).alias("__cx"),
            (_cell(F.col("__ry"), r) + F.col("__o.dy")).alias("__cy"),
        )
        lt = lt.withColumn("__cx", _cell(F.col("__lx"), r)).withColumn(
            "__cy", _cell(F.col("__ly"), r)
        )
    else:
        lt = lt.select("*", off).select(
            *[c for c in lt.columns],
            (_cell(F.col("__lx"), r) + F.col("__o.dx")).alias("__cx"),
            (_cell(F.col("__ly"), r) + F.col("__o.dy")).alias("__cy"),
        )
        rt = rt.withColumn("__cx", _cell(F.col("__rx"), r)).withColumn(
            "__cy", _cell(F.col("__ry"), r)
        )
    dxc = (F.col("__lx") - F.col("__rx")).cast("decimal(38,0)")
    dyc = (F.col("__ly") - F.col("__ry")).cast("decimal(38,0)")
    d2 = (dxc * dxc + dyc * dyc).cast("decimal(38,0)")
    out = (
        lt.join(rt, ["__cx", "__cy"])
        .withColumn("dist2", d2)
        .filter(
            F.col("dist2")
            <= F.lit(r).cast("decimal(38,0)") * F.lit(r)
        )
    )
    keep = [c for c in left.columns] + [c for c in right.columns]
    return out.select(*keep, "dist2")


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    right_id: str,
    left_xy: tuple[str, str] = ("x", "y"),
    right_xy: tuple[str, str] = ("x", "y"),
    left_key: str | None = None,
) -> DataFrame:
    """For each left row, its single nearest right row within
    ``radius`` — ties broken by smallest ``right_id``. Left rows with
    no neighbor in range are absent (inner semantics; anti-join the
    keys for the rest). ``left_key`` defaults to all left columns
    (requires distinct left rows); pass the left table's key column
    for clarity. One min_by hash agg over the radius join."""
    pairs = radius_join(left, right, radius, left_xy, right_xy)
    keys = [left_key] if left_key else list(left.columns)
    rest = [c for c in left.columns if c not in keys]
    # deterministic best: minimize (dist2, right_id) — the raw id
    # column, NOT cast to bigint: struct ordering handles strings,
    # while a failed cast would NULL the tiebreaker and pick an
    # arbitrary neighbor among equidistant candidates
    pick = F.struct(F.col("dist2"), F.col(right_id).alias("__tid"))
    others = [c for c in right.columns] + ["dist2"]
    return pairs.groupBy(*keys).agg(
        *[F.first(c).alias(c) for c in rest],
        *[F.min_by(c, pick).alias(c) for c in others],
    )


def nearest_join_sql(
    left_select: str,
    right_select: str,
    radius: float,
    right_id: str,
    left_key: str,
    left_cols: list[str],
    right_cols: list[str],
    left_xy: tuple[str, str] = ("x", "y"),
    right_xy: tuple[str, str] = ("x", "y"),
) -> str:
    """DuckDB oracle of :func:`nearest_join` — the all-pairs radius
    join ranked per left key by (dist2, right_id), keeping rank 1.
    The window over all pairs is the DEFINITION the grid + min_by agg
    must reproduce; the engine never materializes all pairs."""
    inner = radius_join_sql(
        left_select, right_select, radius, left_cols, right_cols,
        left_xy, right_xy,
    )
    cols = ", ".join(left_cols + right_cols + ["dist2"])
    return f"""
    SELECT {cols} FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY {left_key} ORDER BY dist2, {right_id}
        ) AS __rn
        FROM ({inner})
    ) WHERE __rn = 1
    """


def radius_join_sql(
    left_select: str,
    right_select: str,
    radius: float,
    left_cols: list[str],
    right_cols: list[str],
    left_xy: tuple[str, str] = ("x", "y"),
    right_xy: tuple[str, str] = ("x", "y"),
) -> str:
    """DuckDB oracle of :func:`radius_join` — the all-pairs definition
    the grid must reproduce exactly (same micro lift, same HUGEINT
    squared distance, inclusive radius)."""
    r = int(round(float(radius) * 1_000_000))
    lx, ly = left_xy
    rx, ry = right_xy
    cols = ", ".join(
        [f"l.{c}" for c in left_cols] + [f"r.{c}" for c in right_cols]
    )
    m = (
        lambda t, c: f"CAST(CAST({t}.{c} AS DECIMAL(18,6)) * 1000000"
        " AS BIGINT)"
    )
    d2 = (
        f"(CAST({m('l', lx)} - {m('r', rx)} AS HUGEINT)"
        f" * ({m('l', lx)} - {m('r', rx)})"
        f" + CAST({m('l', ly)} - {m('r', ry)} AS HUGEINT)"
        f" * ({m('l', ly)} - {m('r', ry)}))"
    )
    return f"""
    SELECT {cols}, CAST({d2} AS DECIMAL(38,0)) AS dist2
    FROM ({left_select}) l, ({right_select}) r
    WHERE l.{lx} IS NOT NULL AND l.{ly} IS NOT NULL
      AND r.{rx} IS NOT NULL AND r.{ry} IS NOT NULL
      AND {d2} <= {r}::HUGEINT * {r}::HUGEINT
    """
