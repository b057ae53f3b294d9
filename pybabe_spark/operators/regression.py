"""Grouped ordinary-least-squares: per-group slope / intercept / R²
from one hash aggregation (the ``REGR_*`` family, computed exactly).

Beyond-reference capability: trend fitting over billions of rows is a
pure map-side-combinable aggregation — the textbook Spark-shaped
statistic — yet the naive float implementation is order-dependent
(IEEE summation) and engine-dependent (fused multiply-adds), so it
cannot be value-oracled. Here both inputs enter as exact bigint cents
(DECIMAL(18,2)·100), the five sufficient statistics (n, Σx, Σy, Σxy,
Σx², Σy²) accumulate in DECIMAL(38,0), and the closed forms

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²̲)
    intercept = (Σy·denx − num·Σx) / (n·denx)
    r²        = num² / (denx · deny)

are emitted as exact integer ppm via sign-split integral ``div``
(truncation toward zero on the absolute value — Spark's ``div`` and
DuckDB's ``//`` agree on non-negatives, so the sign is reapplied
outside the division). R² alone is the exception: its numerator is
``num²`` which overflows 38 digits for groups past ~10⁷ rows of
10⁵-scale values, so it is computed as the IEEE ratio of the
decimal-exact statistics and rounded to DECIMAL(18,6) — identical on
both engines for identical inputs (the LM log-prob convention,
operators/lm.py).

Magnitude contract (documented, not silently wrong): the exact ppm
columns need ``Σy·denx`` within DECIMAL(38,0) — holds through ~10⁷
rows per group of values up to 10⁶.00; beyond that pre-scale the
inputs (slope/intercept/R² are invariant to a common rescale of x, and
rescale linearly in y).

Scale shape: ONE map-side-combinable groupBy — a single shuffle of
6 decimals per group, no window, no join, no second pass. This is the
plan a 100 TB trend fit wants: partial aggregation does all the work.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ppm(num: str, den: str) -> "F.Column":
    """Exact sign-split ppm: sign(num/den) · (1e6·|num| div |den|);
    NULL when den = 0. num/den are DECIMAL(38,0) column names."""
    mag = F.expr(
        f"(CAST(1000000 AS DECIMAL(38,0)) * abs({num})) div abs({den})"
    )
    sign = F.when(
        (F.col(num) < 0) != (F.col(den) < 0), F.lit(-1)
    ).otherwise(F.lit(1))
    return F.when(
        F.col(den) != 0, (sign * mag).cast("bigint")
    )


def ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: str | Sequence[str] | None = None,
) -> DataFrame:
    """Per-group OLS fit of ``y = slope·x + intercept``: returns
    ``(group…, n, slope_ppm, intercept_ppm, slope, intercept, r2)``.
    ``slope_ppm`` is the exact integer 10⁶·slope in natural units;
    ``intercept_ppm`` is 10⁶·intercept in ``y``'s units. Rows with a
    NULL in either column are excluded (the REGR_* convention). Groups
    with constant x (den = 0) report NULL slope/intercept/r2; n = 1
    groups likewise. r2 is NULL when y is constant (deny = 0)."""
    groups = (
        [group_cols]
        if isinstance(group_cols, str)
        else list(group_cols or [])
    )
    cx = (F.col(x_col).cast("decimal(18,2)") * 100).cast("bigint")
    cy = (F.col(y_col).cast("decimal(18,2)") * 100).cast("bigint")
    nn = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*groups, cx.alias("__x"), cy.alias("__y"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = nn.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("__x"))).alias("__sx"),
        F.sum(d(F.col("__y"))).alias("__sy"),
        F.sum(d(F.col("__x")) * F.col("__y")).alias("__sxy"),
        F.sum(d(F.col("__x")) * F.col("__x")).alias("__sxx"),
        F.sum(d(F.col("__y")) * F.col("__y")).alias("__syy"),
    )
    terms = (
        agg.withColumn(
            "__num",
            d(F.col("n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")),
        )
        .withColumn(
            "__denx",
            d(F.col("n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")),
        )
        .withColumn(
            "__deny",
            d(F.col("n") * F.col("__syy") - F.col("__sy") * F.col("__sy")),
        )
        .withColumn(
            "__inum",
            d(
                F.col("__sy") * F.col("__denx")
                - F.col("__num") * F.col("__sx")
            ),
        )
        .withColumn("__iden", d(F.col("n") * F.col("__denx")))
    )
    slope_ppm = _ppm("__num", "__denx")
    # intercept is in cents of y (both sides carry the ×100): the ppm
    # output divides the cents back out via a 10⁴ numerator scale
    intercept_ppm = F.when(
        F.col("__denx") != 0,
        F.when(
            (F.col("__inum") < 0) != (F.col("__iden") < 0), F.lit(-1)
        ).otherwise(F.lit(1))
        * F.expr(
            "(CAST(10000 AS DECIMAL(38,0)) * abs(__inum))"
            " div abs(__iden)"
        ),
    ).cast("bigint")
    r2 = F.when(
        (F.col("__denx") != 0) & (F.col("__deny") != 0),
        (
            (F.col("__num").cast("double") * F.col("__num").cast("double"))
            / (
                F.col("__denx").cast("double")
                * F.col("__deny").cast("double")
            )
        ).cast("decimal(18,6)"),
    ).cast("double")
    return terms.select(
        *groups,
        "n",
        slope_ppm.alias("slope_ppm"),
        intercept_ppm.alias("intercept_ppm"),
        (slope_ppm.cast("double") / 1e6).alias("slope"),
        (intercept_ppm.cast("double") / 1e6).alias("intercept"),
        r2.alias("r2"),
    )


def ols_sql(
    table: str,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] | None = None,
) -> str:
    """DuckDB oracle of :func:`ols` — same cents, same HUGEINT
    sufficient statistics, same sign-split integral division, same
    DECIMAL(18,6)-rounded IEEE r²."""
    groups = list(group_cols or [])
    gsel = "".join(f"{g}, " for g in groups)
    gby = f"GROUP BY {', '.join(groups)}" if groups else ""
    return f"""
    WITH pts AS (
        SELECT {gsel}
               CAST(CAST({x_col} AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
               CAST(CAST({y_col} AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        FROM {table}
        WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
    ), s AS (
        SELECT {gsel} COUNT(*) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM pts {gby}
    ), t AS (
        SELECT *,
               n * sxy - sx * sy AS num,
               n * sxx - sx * sx AS denx,
               n * syy - sy * sy AS deny,
               sy * (n * sxx - sx * sx)
                 - (n * sxy - sx * sy) * sx AS inum,
               n * (n * sxx - sx * sx) AS iden
        FROM s
    )
    SELECT {gsel} n,
           CASE WHEN denx <> 0 THEN
             CAST((CASE WHEN (num < 0) <> (denx < 0) THEN -1 ELSE 1 END)
               * ((1000000::HUGEINT * abs(num)) // abs(denx)) AS BIGINT)
           END AS slope_ppm,
           CASE WHEN denx <> 0 THEN
             CAST((CASE WHEN (inum < 0) <> (iden < 0) THEN -1 ELSE 1 END)
               * ((10000::HUGEINT * abs(inum)) // abs(iden)) AS BIGINT)
           END AS intercept_ppm,
           CASE WHEN denx <> 0 THEN
             CAST((CASE WHEN (num < 0) <> (denx < 0) THEN -1 ELSE 1 END)
               * ((1000000::HUGEINT * abs(num)) // abs(denx)) AS BIGINT)
             / 1e6
           END AS slope,
           CASE WHEN denx <> 0 THEN
             CAST((CASE WHEN (inum < 0) <> (iden < 0) THEN -1 ELSE 1 END)
               * ((10000::HUGEINT * abs(inum)) // abs(iden)) AS BIGINT)
             / 1e6
           END AS intercept,
           CASE WHEN denx <> 0 AND deny <> 0 THEN
             CAST(CAST(
               (CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
               / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE))
             AS DECIMAL(18,6)) AS DOUBLE)
           END AS r2
    FROM t
    """
