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


def chow_test(
    df: DataFrame,
    x_col: str,
    y_col: str,
    regime_col: str,
    f_crit: float | None = None,
) -> DataFrame:
    """Chow structural-break test: did the linear relation
    ``y = a + b·x`` CHANGE between two regimes (before/after a launch,
    two cohorts)? Fits pooled and per-regime OLS from the same exact
    cents moments as :func:`ols` and prices

        F = ((RSS_p − RSS₁ − RSS₂) / 2) / ((RSS₁ + RSS₂) / (n − 4))

    against F(2, n−4). ``regime_col`` is a boolean column (NULL rows
    excluded). ONE output row ``(n_total, n_a, n_b, rss_pooled,
    rss_a, rss_b, f[, significant])``.

    Determinism: the six sufficient statistics accumulate per regime
    in DECIMAL(38,0) inside ONE conditional aggregation (the pooled
    moments are their sums — no second pass); each RSS is the single
    IEEE expression ``(deny·denx − num²)/(n·denx·10⁴)`` over exact
    decimals (the 10⁴ undoes the cents lift — RSS reports in y's
    natural squared units), rounded once to DECIMAL(18,6) (the r²
    convention — num² can exceed 38 digits), and F is one fixed-shape
    expression over the three rounded terms, rounded once. F is NULL
    when either regime has n < 3, any denx = 0, or RSS₁ + RSS₂ = 0.

    Scale shape: ONE map-side-combinable aggregation to a single row —
    the 100 TB plan is the partial-agg plan.
    """
    ok = (
        F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(regime_col).isNotNull()
    )
    cx = (F.col(x_col).cast("decimal(18,2)") * 100).cast("bigint")
    cy = (F.col(y_col).cast("decimal(18,2)") * 100).cast("bigint")
    r = F.col(regime_col).cast("boolean")
    nn = df.filter(ok).select(
        r.alias("__r"), cx.alias("__x"), cy.alias("__y")
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def moments(tag: str, pred):
        w = lambda c: F.when(pred, c)  # noqa: E731
        return [
            F.coalesce(F.sum(w(F.lit(1))), F.lit(0))
            .cast("bigint")
            .alias(f"n{tag}"),
            F.coalesce(F.sum(w(d(F.col("__x")))), F.lit(0))
            .cast("decimal(38,0)")
            .alias(f"sx{tag}"),
            F.coalesce(F.sum(w(d(F.col("__y")))), F.lit(0))
            .cast("decimal(38,0)")
            .alias(f"sy{tag}"),
            F.coalesce(
                F.sum(w(d(F.col("__x")) * F.col("__y"))), F.lit(0)
            )
            .cast("decimal(38,0)")
            .alias(f"sxy{tag}"),
            F.coalesce(
                F.sum(w(d(F.col("__x")) * F.col("__x"))), F.lit(0)
            )
            .cast("decimal(38,0)")
            .alias(f"sxx{tag}"),
            F.coalesce(
                F.sum(w(d(F.col("__y")) * F.col("__y"))), F.lit(0)
            )
            .cast("decimal(38,0)")
            .alias(f"syy{tag}"),
        ]

    one = nn.agg(
        *moments("a", F.col("__r")),
        *moments("b", ~F.col("__r")),
        *moments("p", F.lit(True)),
    )

    def rss(tag: str):
        n = F.col(f"n{tag}").cast("decimal(38,0)")
        num = d(
            n * F.col(f"sxy{tag}") - F.col(f"sx{tag}") * F.col(f"sy{tag}")
        )
        denx = d(
            n * F.col(f"sxx{tag}") - F.col(f"sx{tag}") * F.col(f"sx{tag}")
        )
        deny = d(
            n * F.col(f"syy{tag}") - F.col(f"sy{tag}") * F.col(f"sy{tag}")
        )
        nd = n.cast("double")
        val = (
            deny.cast("double")
            - (num.cast("double") * num.cast("double"))
            / denx.cast("double")
        ) / (nd * 10000.0)
        return F.when(
            (F.col(f"n{tag}") >= 3) & (denx != 0),
            val.cast("decimal(18,6)"),
        )

    one = (
        one.withColumn("__ra", rss("a"))
        .withColumn("__rb", rss("b"))
        .withColumn("__rp", rss("p"))
    )
    nt = F.col("np").cast("double")
    rsum = F.col("__ra").cast("double") + F.col("__rb").cast("double")
    fstat = (
        (F.col("__rp").cast("double") - rsum)
        / 2.0
        / (rsum / (nt - 4.0))
    )
    out = lambda e: e.cast("decimal(18,6)").cast("double")  # noqa: E731
    f_ok = (
        F.col("__ra").isNotNull()
        & F.col("__rb").isNotNull()
        & F.col("__rp").isNotNull()
        & (rsum > 0.0)
    )
    fcol = F.when(f_ok, out(fstat))
    cols = [
        F.col("np").alias("n_total"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.col("__rp").cast("double").alias("rss_pooled"),
        F.col("__ra").cast("double").alias("rss_a"),
        F.col("__rb").cast("double").alias("rss_b"),
        fcol.alias("f"),
    ]
    if f_crit is not None:
        cols.append(
            F.when(f_ok, fcol > float(f_crit))
            .otherwise(F.lit(False))
            .alias("significant")
        )
    return one.select(*cols)


def chow_test_sql(
    select: str,
    x_col: str,
    y_col: str,
    regime_col: str,
    f_crit: float | None = None,
) -> str:
    """DuckDB oracle of :func:`chow_test` — same HUGEINT conditional
    moments, same once-rounded RSS terms and fixed-shape F."""
    cx = f"CAST(CAST({x_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    cy = f"CAST(CAST({y_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"

    def mom(tag: str, pred: str) -> str:
        return (
            f"COALESCE(SUM(CASE WHEN {pred} THEN 1 END), 0)::HUGEINT"
            f" AS n{tag},"
            f" COALESCE(SUM(CASE WHEN {pred} THEN CAST(x AS HUGEINT)"
            f" END), 0) AS sx{tag},"
            f" COALESCE(SUM(CASE WHEN {pred} THEN CAST(y AS HUGEINT)"
            f" END), 0) AS sy{tag},"
            f" COALESCE(SUM(CASE WHEN {pred} THEN CAST(x AS HUGEINT)"
            f" * y END), 0) AS sxy{tag},"
            f" COALESCE(SUM(CASE WHEN {pred} THEN CAST(x AS HUGEINT)"
            f" * x END), 0) AS sxx{tag},"
            f" COALESCE(SUM(CASE WHEN {pred} THEN CAST(y AS HUGEINT)"
            f" * y END), 0) AS syy{tag}"
        )

    def rss(tag: str) -> str:
        n = f"n{tag}"
        num = f"({n} * sxy{tag} - sx{tag} * sy{tag})"
        denx = f"({n} * sxx{tag} - sx{tag} * sx{tag})"
        deny = f"({n} * syy{tag} - sy{tag} * sy{tag})"
        nd = f"CAST({n} AS DOUBLE)"
        val = (
            f"(CAST({deny} AS DOUBLE)"
            f" - (CAST({num} AS DOUBLE) * CAST({num} AS DOUBLE))"
            f" / CAST({denx} AS DOUBLE)) / ({nd} * 10000.0)"
        )
        return (
            f"CASE WHEN {n} >= 3 AND {denx} <> 0"
            f" THEN CAST({val} AS DECIMAL(18,6)) END"
        )

    r6 = lambda e: f"CAST(CAST({e} AS DECIMAL(18,6)) AS DOUBLE)"  # noqa: E731
    fstat = (
        "(CAST(rp AS DOUBLE) - (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE)))"
        " / 2.0 / ((CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE))"
        " / (CAST(np AS DOUBLE) - 4.0))"
    )
    f_ok = (
        "ra IS NOT NULL AND rb IS NOT NULL AND rp IS NOT NULL"
        " AND (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE)) > 0.0"
    )
    fcol = f"CASE WHEN {f_ok} THEN {r6(fstat)} END"
    sig = ""
    if f_crit is not None:
        sig = (
            f", CASE WHEN {f_ok} THEN ({fcol}) > {float(f_crit)}"
            " ELSE FALSE END AS significant"
        )
    return f"""
    WITH rows_in AS ({select}),
    pts AS (
        SELECT CAST({regime_col} AS BOOLEAN) AS r, {cx} AS x, {cy} AS y
        FROM rows_in
        WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
          AND {regime_col} IS NOT NULL
    ),
    m AS (
        SELECT {mom('a', 'r')}, {mom('b', 'NOT r')},
               {mom('p', 'TRUE')}
        FROM pts
    ),
    one AS (
        SELECT np, na, nb, {rss('a')} AS ra, {rss('b')} AS rb,
               {rss('p')} AS rp
        FROM m
    )
    SELECT CAST(np AS BIGINT) AS n_total, CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(rp AS DOUBLE) AS rss_pooled,
           CAST(ra AS DOUBLE) AS rss_a, CAST(rb AS DOUBLE) AS rss_b,
           {fcol} AS f{sig}
    FROM one
    """


def breusch_pagan(
    df: DataFrame,
    x_col: str,
    y_col: str,
    crit: float = 3.841459,
    resid_unit: float = 10_000.0,
) -> DataFrame:
    """Breusch–Pagan heteroscedasticity test on the :func:`ols` fit —
    does the residual VARIANCE move with x? The check that decides
    whether that fit's standard errors (and every CI built on them)
    can be trusted, and a first-class data-quality signal of its own
    (fan-shaped price-vs-quantity residuals = segment-dependent
    pricing noise). ONE output row:
    ``(n, slope, intercept, lm, significant)`` — the LM statistic
    ``n·R²`` of the auxiliary regression of squared residuals on x,
    against a χ²(1) critical.

    Determinism: pass 1 is :func:`ols`'s exact DECIMAL(38,0) cents
    moments; slope/intercept reach pass 2 as the fixed-shape IEEE
    ratios of those exact decimals (deterministic — same numerator,
    same denominator, same division, both engines). Pass 2 computes
    each row's squared residual in units of ``resid_unit``·y (R² —
    hence LM — is invariant to the rescale): pick it near the typical
    residual so the one-round DECIMAL(18,6) term neither overflows
    its 12 integer digits (big-money fits, the 10⁴ default) nor
    quantizes to zero (cents-scale residuals want 1.0 — the gate a
    zero-variance z then reports is honest NULL, not noise); the term
    rounds ONCE to DECIMAL(18,6) — after which every aux moment (Σz, Σz², Σxz, with
    x in exact cents) is pure associative decimal arithmetic,
    order-independent and engine-identical; products round to
    DECIMAL(38,6) (both engines half-up, non-negative). The LM finish
    is the ols-r² IEEE-ratio convention rounded once. NULL rows drop
    (pairwise). LM is NULL when x or z is constant (den = 0) or
    n < 3.

    Scale shape: two map-side-combinable corpus aggregations with a
    1-row broadcast attach between — no window, no join, no second
    source scan (the pass-1 grain is re-read from the same pushed-
    down column pair).
    """
    from pybabe_spark.operators._util import attach_scalars
    from pybabe_spark.operators.sketch import _sdiv

    ok = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    cx = (F.col(x_col).cast("decimal(18,2)") * 100).cast("bigint")
    cy = (F.col(y_col).cast("decimal(18,2)") * 100).cast("bigint")
    base = df.filter(ok).select(cx.alias("__x"), cy.alias("__y"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m1 = base.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.coalesce(F.sum(d(F.col("__x"))), F.lit(0))
        .cast("decimal(38,0)")
        .alias("__sx"),
        F.coalesce(F.sum(d(F.col("__y"))), F.lit(0))
        .cast("decimal(38,0)")
        .alias("__sy"),
        F.coalesce(F.sum(d(F.col("__x")) * F.col("__y")), F.lit(0))
        .cast("decimal(38,0)")
        .alias("__sxy"),
        F.coalesce(F.sum(d(F.col("__x")) * F.col("__x")), F.lit(0))
        .cast("decimal(38,0)")
        .alias("__sxx"),
    )
    num = d(F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
    denx = d(
        F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    )
    inum = d(F.col("__sy") * denx - num * F.col("__sx"))
    iden = d(F.col("__n") * denx)
    m1 = (
        m1.withColumn("__num", num)
        .withColumn("__denx", denx)
        .withColumn(
            "__slope", _sdiv(num.cast("double"), denx.cast("double"))
        )
        .withColumn(
            "__icpt", _sdiv(inum.cast("double"), iden.cast("double"))
        )
    )
    j = attach_scalars(base, m1)
    # squared residual in units of 10^4 y (cents/1e6), rounded ONCE
    # per row — the aux R^2 is invariant to a linear rescale of z, so
    # LM is unchanged, and the scaling keeps the one-round term inside
    # DECIMAL(18,6) even at petabyte residual magnitudes (a raw
    # dollars^2 term overflows the 12 integer digits); everything
    # after is associative decimal arithmetic
    e = (
        F.col("__y").cast("double")
        - F.col("__slope") * F.col("__x").cast("double")
        - F.col("__icpt")
    ) / (100.0 * float(resid_unit))
    zr = (e * e).cast("decimal(18,6)")
    xd = F.col("__x").cast("decimal(18,0)")
    m2 = j.agg(
        F.max("__n").alias("__n"),
        F.max("__sx").alias("__sx"),
        F.max("__sxx").alias("__sxx"),
        F.max("__denx").alias("__denx"),
        F.max("__slope").alias("__slope"),
        F.max("__icpt").alias("__icpt"),
        F.coalesce(F.sum(zr), F.lit(0))
        .cast("decimal(38,6)")
        .alias("__sz"),
        # zr² keeps its native scale 12: a cast to scale 6 flushes
        # small squared residuals to zero and the aux moment matrix
        # loses Cauchy–Schwarz (observed: negative LM in tests).
        # Envelope: Σzr² fits DECIMAL(38,12) through 10¹² rows of
        # z ≤ 10⁷ — the point of the 10⁴·y residual rescale
        F.coalesce(
            F.sum(zr * zr), F.lit(0)
        )
        .cast("decimal(38,12)")
        .alias("__szz"),
        F.coalesce(
            F.sum((xd * zr).cast("decimal(38,6)")), F.lit(0)
        )
        .cast("decimal(38,6)")
        .alias("__sxz"),
    )
    nd = F.col("__n").cast("double")
    anum = (
        nd * F.col("__sxz").cast("double")
        - F.col("__sx").cast("double") * F.col("__sz").cast("double")
    )
    adown = (
        F.col("__denx").cast("double")
        * (
            nd * F.col("__szz").cast("double")
            - F.col("__sz").cast("double")
            * F.col("__sz").cast("double")
        )
    )
    lm6 = (nd * _sdiv(anum * anum, adown)).cast("decimal(18,6)")
    okl = (F.col("__n") >= 3) & (adown != 0.0)
    lm = F.when(okl, lm6.cast("double"))
    out6 = lambda c: c.cast("decimal(18,6)").cast("double")  # noqa: E731
    return m2.select(
        F.col("__n").cast("bigint").alias("n"),
        out6(F.col("__slope")).alias("slope"),
        out6(F.col("__icpt")).alias("intercept"),
        lm.alias("lm"),
        F.coalesce(
            F.when(okl, lm6.cast("double") > float(crit)), F.lit(False)
        ).alias("significant"),
    )


def breusch_pagan_sql(
    select: str,
    x_col: str,
    y_col: str,
    crit: float = 3.841459,
    resid_unit: float = 10_000.0,
) -> str:
    """DuckDB oracle of :func:`breusch_pagan` — same exact pass-1
    moments, same fixed-shape slope/intercept ratios, same one-round
    residual-square and associative decimal aux moments."""
    cx = f"CAST(CAST({x_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    cy = f"CAST(CAST({y_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    lm6 = (
        "CAST(CAST(n AS DOUBLE) * ((anum * anum) /"
        " (CASE WHEN adown != 0.0 THEN adown END))"
        " AS DECIMAL(18,6))"
    )
    okl = "n >= 3 AND adown != 0.0"
    r6 = lambda e: f"CAST(CAST({e} AS DECIMAL(18,6)) AS DOUBLE)"  # noqa: E731
    return f"""
    WITH rows_in AS ({select}),
    base AS (
        SELECT {cx} AS x, {cy} AS y
        FROM rows_in
        WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
    ),
    m1 AS (
        SELECT COUNT(*)::HUGEINT AS n,
               COALESCE(SUM(CAST(x AS HUGEINT)), 0)::HUGEINT AS sx,
               COALESCE(SUM(CAST(y AS HUGEINT)), 0)::HUGEINT AS sy,
               COALESCE(SUM(CAST(x AS HUGEINT) * y), 0)::HUGEINT
                 AS sxy,
               COALESCE(SUM(CAST(x AS HUGEINT) * x), 0)::HUGEINT
                 AS sxx
        FROM base
    ),
    m1b AS (
        SELECT n, sx, sxx,
               n * sxy - sx * sy AS num,
               n * sxx - sx * sx AS denx,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) != 0.0
                    THEN CAST(n * sxx - sx * sx AS DOUBLE) END)
                 AS slope,
               CAST(sy * (n * sxx - sx * sx)
                    - (n * sxy - sx * sy) * sx AS DOUBLE)
                 / (CASE WHEN
                      CAST(n * (n * sxx - sx * sx) AS DOUBLE) != 0.0
                    THEN CAST(n * (n * sxx - sx * sx) AS DOUBLE) END)
                 AS icpt
        FROM m1
    ),
    m2 AS (
        SELECT MAX(m1b.n) AS n, MAX(m1b.sx) AS sx,
               MAX(m1b.denx) AS denx,
               MAX(m1b.slope) AS slope, MAX(m1b.icpt) AS icpt,
               COALESCE(SUM(zr), 0) AS sz,
               COALESCE(SUM(CAST(zr * zr AS DECIMAL(38,12))), 0)
                 AS szz,
               COALESCE(SUM(CAST(CAST(base.x AS DECIMAL(18,0)) * zr
                            AS DECIMAL(38,6))), 0) AS sxz
        FROM base CROSS JOIN m1b,
        LATERAL (SELECT CAST(
            (((CAST(base.y AS DOUBLE)
               - m1b.slope * CAST(base.x AS DOUBLE) - m1b.icpt)
              / {100.0 * float(resid_unit)})
             * ((CAST(base.y AS DOUBLE)
               - m1b.slope * CAST(base.x AS DOUBLE) - m1b.icpt)
              / {100.0 * float(resid_unit)})) AS DECIMAL(18,6)) AS zr) z
    ),
    fin AS (
        SELECT n, slope, icpt,
               CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE) AS anum,
               CAST(denx AS DOUBLE)
                 * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                    - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))
                 AS adown
        FROM m2
    )
    SELECT CAST(n AS BIGINT) AS n,
           {r6('slope')} AS slope,
           {r6('icpt')} AS intercept,
           CASE WHEN {okl} THEN CAST({lm6} AS DOUBLE) END AS lm,
           COALESCE(CASE WHEN {okl}
                    THEN CAST({lm6} AS DOUBLE) > {float(crit)} END,
                    FALSE) AS significant
    FROM fin
    """
