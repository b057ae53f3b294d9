"""CUPED variance reduction for experiments (Deng, Xu, Kohavi &
Walker, WSDM 2013): adjust each unit's metric by its pre-experiment
covariate, ``y' = y − θ·(x − x̄)`` with ``θ = Cov(x, y)/Var(x)`` —
the industry-standard way to shrink A/B-test variance without bias
(θ from pooled arms keeps the treatment-effect estimate unbiased).

Beyond-reference capability completing the experimentation family:
``ab_test`` (operators/sketch.py) decides on raw conversions; CUPED
feeds it (or any mean comparison) metrics with the pre-period signal
regressed out — typically 30-70% variance reduction on retention/
revenue metrics, i.e. the same sensitivity at half the traffic.

Determinism: θ's numerator and denominator are the regression
family's exact DECIMAL(38,0) sufficient statistics on bigint cents
(operators/regression.py); ``theta_ppm`` is the sign-split integral
ppm certificate. The per-row adjusted value is one fixed-shape IEEE
expression over those exact statistics, rounded once to
DECIMAL(18,6) — identical across engines for identical inputs (the
r²/LM convention). Constant covariate ⟹ θ = 0 (adjustment is a
no-op, not a crash).

Scale shape: ONE map-side-combinable stats aggregation (per group —
1 row each), broadcast back onto the rows, codegen arithmetic. No
window, no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pybabe_spark.operators._util import attach_scalars


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    by: str | None = None,
    out_col: str = "adjusted",
) -> DataFrame:
    """Append ``out_col`` (the CUPED-adjusted metric, DECIMAL(18,6)-
    rounded double) and ``theta_ppm`` (the exact integral ppm θ,
    constant per group). Rows with NULL metric or covariate keep a
    NULL adjustment. θ pools ALL rows of the group — compute it on
    the union of arms, the unbiasedness condition."""
    keys = [by] if by else []
    cx = (F.col(covariate_col).cast("decimal(18,2)") * 100).cast("bigint")
    cy = (F.col(metric_col).cast("decimal(18,2)") * 100).cast("bigint")
    ok = F.col(metric_col).isNotNull() & F.col(covariate_col).isNotNull()
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = (
        df.filter(ok)
        .select(*keys, cx.alias("__x"), cy.alias("__y"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(d(F.col("__x"))).alias("__sx"),
            F.sum(d(F.col("__y"))).alias("__sy"),
            F.sum(d(F.col("__x")) * F.col("__y")).alias("__sxy"),
            F.sum(d(F.col("__x")) * F.col("__x")).alias("__sxx"),
        )
        .withColumn(
            "__num",
            d(
                F.col("__n") * F.col("__sxy")
                - F.col("__sx") * F.col("__sy")
            ),
        )
        .withColumn(
            "__den",
            d(
                F.col("__n") * F.col("__sxx")
                - F.col("__sx") * F.col("__sx")
            ),
        )
    )
    if keys:
        joined = df.join(F.broadcast(stats), keys, "left")
    else:
        joined = attach_scalars(df, stats)
    # fixed-shape IEEE: theta and mean from the exact decimal stats,
    # applied in cents, rounded once — deterministic cross-engine
    theta = F.when(
        F.col("__den") != 0,
        F.col("__num").cast("double") / F.col("__den").cast("double"),
    ).otherwise(F.lit(0.0))
    mean_x = F.col("__sx").cast("double") / F.col("__n").cast("double")
    adj = (
        (
            cy.cast("double")
            - theta * (cx.cast("double") - mean_x)
        )
        / 100.0
    ).cast("decimal(18,6)").cast("double")
    theta_ppm = F.when(
        F.col("__den") != 0,
        F.when(
            (F.col("__num") < 0) != (F.col("__den") < 0), F.lit(-1)
        ).otherwise(F.lit(1))
        * F.expr(
            "(CAST(1000000 AS DECIMAL(38,0)) * abs(__num))"
            " div abs(__den)"
        ),
    ).otherwise(F.lit(0)).cast("bigint")
    return joined.select(
        *df.columns,
        F.when(ok, adj).alias(out_col),
        theta_ppm.alias("theta_ppm"),
    )


def cuped_adjust_sql(
    select: str,
    metric_col: str,
    covariate_col: str,
    by: str | None = None,
    out_col: str = "adjusted",
    columns: str = "*",
) -> str:
    """DuckDB oracle of :func:`cuped_adjust` over an arbitrary
    ``select`` subquery — same HUGEINT statistics, same fixed-shape
    IEEE adjustment, same ppm certificate."""
    part = f"PARTITION BY {by}" if by else ""
    cx = f"CAST(CAST({covariate_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    cy = f"CAST(CAST({metric_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    return f"""
    WITH rows_in AS ({select}),
    lifted AS (
        SELECT *, {cx} AS x__, {cy} AS y__,
               ({metric_col} IS NOT NULL AND {covariate_col} IS NOT NULL)
                   AS ok__
        FROM rows_in
    ),
    st AS (
        SELECT *,
               SUM(CASE WHEN ok__ THEN 1 ELSE 0 END)
                   OVER w__ AS n__,
               SUM(CASE WHEN ok__ THEN CAST(x__ AS HUGEINT) END)
                   OVER w__ AS sx__,
               SUM(CASE WHEN ok__ THEN CAST(y__ AS HUGEINT) END)
                   OVER w__ AS sy__,
               SUM(CASE WHEN ok__ THEN CAST(x__ AS HUGEINT) * y__ END)
                   OVER w__ AS sxy__,
               SUM(CASE WHEN ok__ THEN CAST(x__ AS HUGEINT) * x__ END)
                   OVER w__ AS sxx__
        FROM lifted
        WINDOW w__ AS ({part})
    ),
    t AS (
        SELECT *,
               n__ * sxy__ - sx__ * sy__ AS num__,
               n__ * sxx__ - sx__ * sx__ AS den__
        FROM st
    )
    SELECT {columns},
           CASE WHEN ok__ THEN CAST(CAST(
             (CAST(y__ AS DOUBLE)
              - (CASE WHEN den__ <> 0
                      THEN CAST(num__ AS DOUBLE) / CAST(den__ AS DOUBLE)
                      ELSE 0.0 END)
                * (CAST(x__ AS DOUBLE)
                   - CAST(sx__ AS DOUBLE) / CAST(n__ AS DOUBLE))
             ) / 100.0 AS DECIMAL(18,6)) AS DOUBLE)
           END AS {out_col},
           CASE WHEN den__ <> 0 THEN
             CAST((CASE WHEN (num__ < 0) <> (den__ < 0)
                        THEN -1 ELSE 1 END)
               * ((1000000::HUGEINT * abs(num__)) // abs(den__))
               AS BIGINT)
           ELSE 0 END AS theta_ppm
    FROM t
    """


def did_estimate(
    df: DataFrame,
    arm_col: str,
    period_col: str,
    value_col: str,
    control: str,
    treatment: str,
    pre: str,
    post: str,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Difference-in-differences — the quasi-experimental estimator
    when you can't randomize (feature launched to one cohort, policy
    hit one region): ONE output row with the four cell means
    (arm × period), the DiD effect

        (m̄_t,post − m̄_t,pre) − (m̄_c,post − m̄_c,pre)

    and ``significant`` under the large-sample squared-form decision

        did² > z²·Σᵢ s²ᵢ/nᵢ   (i over the four cells)

    — the parallel-trends estimator with independent-samples variance
    (repeated cross-sections; for panel data CUPED on the same module
    is the stronger tool). House determinism: all moments are exact
    DECIMAL(38,0) sums on bigint cents; means and the effect round
    once to DECIMAL(18,6); the decision is one fixed-shape IEEE
    expression over exact inputs, replayed verbatim by the oracle.
    Cells need n ≥ 2 for the variance — otherwise significant=false;
    means are NULL for empty cells. ONE conditional aggregation,
    map-side combinable.
    """
    x = (F.col(value_col).cast("decimal(18,2)") * 100).cast("bigint")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cells = {
        "cpre": (F.col(arm_col) == control) & (F.col(period_col) == pre),
        "cpost": (F.col(arm_col) == control) & (F.col(period_col) == post),
        "tpre": (F.col(arm_col) == treatment) & (F.col(period_col) == pre),
        "tpost": (F.col(arm_col) == treatment)
        & (F.col(period_col) == post),
    }
    aggs = []
    for name, cond in cells.items():
        ok = cond & F.col(value_col).isNotNull()
        aggs += [
            F.sum(ok.cast("long")).alias(f"n_{name}"),
            F.coalesce(F.sum(F.when(ok, d(x))), F.lit(0)).cast(
                "decimal(38,0)"
            ).alias(f"s_{name}"),
            F.coalesce(F.sum(F.when(ok, d(x) * x)), F.lit(0)).cast(
                "decimal(38,0)"
            ).alias(f"q_{name}"),
        ]
    agg = df.agg(*aggs)

    def _n(c):
        return F.col(f"n_{c}").cast("double")

    def _s(c):
        return F.col(f"s_{c}").cast("double")

    def _q(c):
        return F.col(f"q_{c}").cast("double")

    def _mean(c):
        return _s(c) / _n(c) / 100.0

    def _var_over_n(c):
        n, s, q = _n(c), _s(c), _q(c)
        return ((n * q - s * s) / (n * (n - 1.0))) / n

    did = (
        (_s("tpost") / _n("tpost") - _s("tpre") / _n("tpre"))
        - (_s("cpost") / _n("cpost") - _s("cpre") / _n("cpre"))
    )  # cents
    all_n2 = None
    for c in cells:
        cond = F.col(f"n_{c}") > 1
        all_n2 = cond if all_n2 is None else (all_n2 & cond)
    var_sum = sum(
        (_var_over_n(c) for c in list(cells)[1:]),
        _var_over_n(next(iter(cells))),
    )
    rounded = lambda m: m.cast("decimal(18,6)").cast("double")  # noqa: E731
    out = [F.col(f"n_{c}").cast("bigint").alias(f"n_{c}") for c in cells]
    out += [
        F.when(F.col(f"n_{c}") > 0, rounded(_mean(c))).alias(f"mean_{c}")
        for c in cells
    ]
    out += [
        F.when(all_n2, rounded(did / 100.0)).alias("did"),
        F.when(
            all_n2, (did * did) > (z_crit * z_crit) * var_sum
        ).otherwise(F.lit(False)).alias("significant"),
    ]
    return agg.select(*out)


def did_estimate_sql(
    select: str,
    arm_col: str,
    period_col: str,
    value_col: str,
    control: str,
    treatment: str,
    pre: str,
    post: str,
    z_crit: float = 1.959964,
) -> str:
    """DuckDB oracle of :func:`did_estimate` — same HUGEINT moments,
    same fixed-shape decision with identical operation order."""
    x = f"CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    conds = {
        "cpre": f"({arm_col} = '{control}' AND {period_col} = '{pre}')",
        "cpost": f"({arm_col} = '{control}' AND {period_col} = '{post}')",
        "tpre": f"({arm_col} = '{treatment}' AND {period_col} = '{pre}')",
        "tpost": f"({arm_col} = '{treatment}'"
        f" AND {period_col} = '{post}')",
    }
    moments = ",\n".join(
        f"SUM(CASE WHEN {c} AND {value_col} IS NOT NULL THEN 1 ELSE 0 END)"
        f" AS n_{k},\n"
        f"COALESCE(SUM(CASE WHEN {c} AND {value_col} IS NOT NULL"
        f" THEN CAST({x} AS HUGEINT) END), 0) AS s_{k},\n"
        f"COALESCE(SUM(CASE WHEN {c} AND {value_col} IS NOT NULL"
        f" THEN CAST({x} AS HUGEINT) * {x} END), 0) AS q_{k}"
        for k, c in conds.items()
    )

    def m(k):
        return (
            f"(CAST(s_{k} AS DOUBLE) / CAST(n_{k} AS DOUBLE))"
        )

    def von(k):
        return (
            f"(((CAST(n_{k} AS DOUBLE) * CAST(q_{k} AS DOUBLE)"
            f" - CAST(s_{k} AS DOUBLE) * CAST(s_{k} AS DOUBLE))"
            f" / (CAST(n_{k} AS DOUBLE) * (CAST(n_{k} AS DOUBLE) - 1.0)))"
            f" / CAST(n_{k} AS DOUBLE))"
        )

    did = (
        f"(({m('tpost')} - {m('tpre')}) - ({m('cpost')} - {m('cpre')}))"
    )
    all_n2 = " AND ".join(f"n_{k} > 1" for k in conds)
    var_sum = " + ".join(von(k) for k in conds)
    means = ",\n".join(
        f"CASE WHEN n_{k} > 0 THEN CAST(CAST({m(k)} / 100.0"
        f" AS DECIMAL(18,6)) AS DOUBLE) END AS mean_{k}"
        for k in conds
    )
    ns = ", ".join(f"CAST(n_{k} AS BIGINT) AS n_{k}" for k in conds)
    return f"""
    WITH rows_in AS ({select}),
    agg AS (SELECT {moments} FROM rows_in)
    SELECT {ns},
           {means},
           CASE WHEN {all_n2} THEN CAST(CAST({did} / 100.0
             AS DECIMAL(18,6)) AS DOUBLE) END AS did,
           CASE WHEN {all_n2} THEN
             ({did} * {did}) > ({z_crit} * {z_crit}) * ({var_sum})
           ELSE FALSE END AS significant
    FROM agg
    """
