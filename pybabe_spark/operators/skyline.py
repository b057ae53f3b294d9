"""2-D skyline (Pareto front): the rows no other row beats on both
dimensions — cheapest-AND-fastest suppliers, smallest-AND-newest
files, best price/quality documents.

Beyond-reference capability, and a textbook engine-vs-definition
split: the DEFINITION is quadratic (a row survives iff NO other row
weakly dominates it — the oracle's all-pairs NOT EXISTS), but the
2-D computation is linear after a sort: scanning x ascending, a row
is on the skyline iff its y beats the running minimum so far. The
distributed form keeps even that sort partition-parallel:

1. lift both columns to exact bigint cents and bucketize x into ``B``
   equal-width integral cells (min/max attached lazily in-plan — the
   zorder/attach_scalars idiom, no construction job);
2. per bucket (partitioned window, never global): drop rows beaten by
   a same-bucket row — ``y > min y over x' < x`` (range frame on the
   integer cents) or ``y > min y at the same x``;
3. cross-bucket: bucket ids are monotone in x, so anything in an
   earlier bucket has strictly smaller x — one ≤ B-row bucket-stats
   table (``limit(B)`` proves boundedness to the plan linter) carries
   each bucket's min y; its prefix-min joins back and drops survivors
   with ``prefix_min ≤ y``.

No global window, no all-pairs: cost is one shuffle on the bucket id
plus bounded small-table work. Duplicate (x, y) points tie — neither
dominates — and all survive, matching the oracle's strict-in-one
dominance. NULL in either column excludes the row. Minimization on
both axes; negate upstream to maximize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pybabe_spark.operators._util import attach_scalars, gen_col


def skyline2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    buckets: int = 32,
) -> DataFrame:
    """All rows not weakly dominated on (``x_col``, ``y_col``), both
    minimized; original columns pass through."""
    if buckets < 1:
        raise ValueError("skyline2d: buckets must be >= 1")
    cx = (F.col(x_col).cast("decimal(18,2)") * 100).cast("bigint")
    cy = (F.col(y_col).cast("decimal(18,2)") * 100).cast("bigint")
    xb = gen_col(df.columns, "__sx")
    yb = gen_col(list(df.columns) + [xb], "__sy")
    bk = gen_col(list(df.columns) + [xb, yb], "__sb")
    nn = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select("*", cx.alias(xb), cy.alias(yb))
    stats = nn.agg(
        F.min(xb).alias("__mn"), F.max(xb).alias("__mx")
    )
    top = buckets - 1
    withb = attach_scalars(nn, stats).withColumn(
        bk,
        F.when(
            F.col("__mx") > F.col("__mn"),
            F.expr(f"(({xb} - __mn) * {top}) div (__mx - __mn)"),
        ).otherwise(F.lit(0)),
    ).drop("__mn", "__mx")
    # 2) bucket-local pruning: beaten by smaller-x (range frame) or
    # same-x-smaller-y rows of the SAME bucket
    wx = (
        Window.partitionBy(bk)
        .orderBy(F.col(xb).asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local = (
        withb.withColumn("__prev_min", F.min(yb).over(wx))
        .withColumn(
            "__same_min", F.min(yb).over(Window.partitionBy(bk, xb))
        )
        .filter(
            (F.col("__prev_min").isNull() | (F.col("__prev_min") > F.col(yb)))
            & (F.col("__same_min") == F.col(yb))
        )
        .drop("__prev_min", "__same_min")
    )
    # 3) cross-bucket pruning via the bounded bucket-stats prefix min:
    # earlier bucket ⟹ strictly smaller x, so prefix_min ≤ y dominates
    bstats = (
        withb.groupBy(F.col(bk).alias("__b"))
        .agg(F.min(yb).alias("__bmin"))
        .limit(buckets)  # semantically a no-op; proves maxRows ≤ B
    )
    a = bstats.alias("a")
    b = bstats.alias("b")
    prefix = (
        a.join(b, F.col("b.__b") < F.col("a.__b"))
        .groupBy(F.col("a.__b").alias("__b"))
        .agg(F.min("b.__bmin").alias("__pmin"))
    )
    out = local.join(
        prefix, local[bk] == prefix["__b"], "left"
    ).filter(F.col("__pmin").isNull() | (F.col("__pmin") > F.col(yb)))
    return out.select(*df.columns)


def skyline2d_sql(table: str, x_col: str, y_col: str) -> str:
    """DuckDB oracle of :func:`skyline2d` — the quadratic all-pairs
    dominance definition on the same cents lift."""
    cx = f"CAST(CAST({x_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    cy = f"CAST(CAST({y_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    return f"""
    WITH pts AS (
        SELECT *, {cx} AS sx, {cy} AS sy
        FROM {table}
        WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
    )
    SELECT * EXCLUDE (sx, sy) FROM pts q
    WHERE NOT EXISTS (
        SELECT 1 FROM pts p
        WHERE p.sx <= q.sx AND p.sy <= q.sy
          AND (p.sx < q.sx OR p.sy < q.sy)
    )
    """
