"""Data-quality expectations: declarative rules → violation counts and
row-level quarantine.

Beyond-reference capability (the reference's only gate is
``ignore_bad_lines`` at parse time, pybabe/format_csv.py — this is the
post-ingest contract layer every production pipeline adds: "keys are
unique, prices are in range, statuses are from the enum, every order
has a customer").

Rule specs are plain tuples so they serialize/log cleanly:

- ``("not_null", col)``
- ``("unique", [cols…])`` — violations = surplus rows (Σ per-group
  count−1 over groups larger than 1; NULL keys group like values)
- ``("range", col, lo, hi)`` — inclusive; NULL passes (pair with
  not_null to reject NULLs)
- ``("regexp", col, pattern)`` — full-match NOT required (Java
  ``rlike`` / RE2 ``regexp_matches`` find semantics); NULL passes
- ``("in_set", col, [values…])`` — NULL passes
- ``("fk", col, ref_df, ref_col)`` — NULL passes; violations = rows
  whose value has no match in the reference column

Scale shape: ALL row-level rules fold into ONE conditional aggregation
over a single scan (adding a rule adds a counter, not a pass);
``unique`` adds one keyed aggregation; each ``fk`` adds one left join
(broadcast when the reference is small). ``validate`` returns the
summary as a DataFrame — compose it, don't collect it.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_RULES = ("not_null", "range", "regexp", "in_set")


def _row_violation(df: DataFrame, rule: tuple) -> "F.Column":
    kind = rule[0]
    col = F.col(rule[1])
    if kind == "not_null":
        return col.isNull()
    if kind == "range":
        _, _, lo, hi = rule
        return col.isNotNull() & ((col < F.lit(lo)) | (col > F.lit(hi)))
    if kind == "regexp":
        return col.isNotNull() & ~col.rlike(rule[2])
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(*rule[2])
    raise ValueError(f"validate: unknown row rule {kind!r}")


def _label(rule: tuple) -> tuple[str, str]:
    kind = rule[0]
    col = ",".join(rule[1]) if isinstance(rule[1], (list, tuple)) else rule[1]
    return kind, col


def validate(df: DataFrame, rules: Sequence[tuple]) -> DataFrame:
    """Violation summary: one row per rule —
    ``(rule, col_name, violations)`` (module docstring for rule specs
    and NULL policy)."""
    if not rules:
        raise ValueError("validate: no rules given")
    parts: list[DataFrame] = []
    row_rules = [r for r in rules if r[0] in _ROW_RULES]
    if row_rules:
        aggs = [
            F.sum(
                F.when(_row_violation(df, r), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__v{i}")
            for i, r in enumerate(row_rules)
        ]
        one = df.agg(*aggs)
        stack = ", ".join(
            "'{0}', '{1}', coalesce(__v{2}, 0)".format(*_label(r), i)
            for i, r in enumerate(row_rules)
        )
        parts.append(
            one.selectExpr(
                f"stack({len(row_rules)}, {stack}) AS "
                "(rule, col_name, violations)"
            )
        )
    for r in rules:
        if r[0] == "unique":
            keys = list(r[1]) if isinstance(r[1], (list, tuple)) else [r[1]]
            grouped = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
            kind, col = _label(("unique", keys))
            parts.append(
                grouped.agg(
                    F.coalesce(
                        F.sum(
                            F.when(F.col("__c") > 1, F.col("__c") - 1)
                        ),
                        F.lit(0),
                    ).alias("violations")
                ).select(
                    F.lit(kind).alias("rule"),
                    F.lit(col).alias("col_name"),
                    F.col("violations"),
                )
            )
        elif r[0] == "fk":
            _, col, ref_df, ref_col = r
            misses = (
                df.filter(F.col(col).isNotNull())
                .join(
                    ref_df.select(F.col(ref_col).alias(col)).distinct(),
                    col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            parts.append(
                misses.select(
                    F.lit("fk").alias("rule"),
                    F.lit(col).alias("col_name"),
                    F.col("violations"),
                )
            )
        elif r[0] not in _ROW_RULES:
            raise ValueError(f"validate: unknown rule {r[0]!r}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def quarantine(
    df: DataFrame, rules: Sequence[tuple], out_col: str = "violations"
) -> DataFrame:
    """Row-level tagging for the ROW rules only (not_null / range /
    regexp / in_set — dataset-level rules have no per-row meaning):
    adds ``out_col`` = comma-joined failed-rule labels, '' for clean
    rows. Split with ``.filter(col == '')`` / ``!= ''`` — one scan,
    pure codegen, no shuffle."""
    row_rules = [r for r in rules if r[0] in _ROW_RULES]
    if not row_rules:
        raise ValueError("quarantine: no row-level rules given")
    tags = [
        F.when(
            _row_violation(df, r),
            F.lit("{0}:{1}".format(*_label(r))),
        )
        for r in row_rules
    ]
    return df.withColumn(
        out_col,
        F.concat_ws(",", F.filter(F.array(*tags), lambda x: x.isNotNull())),
    )


def _sql_quote(v: Any) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def validate_sql(table: str, rules: Sequence[tuple]) -> str:
    """DuckDB oracle of :func:`validate` — same rules, same NULL
    policy; ``fk`` refs are table names here."""
    selects = []
    for r in rules:
        kind = r[0]
        if kind in _ROW_RULES:
            col = r[1]
            if kind == "not_null":
                cond = f"{col} IS NULL"
            elif kind == "range":
                cond = (
                    f"{col} IS NOT NULL AND ({col} < {_sql_quote(r[2])}"
                    f" OR {col} > {_sql_quote(r[3])})"
                )
            elif kind == "regexp":
                cond = (
                    f"{col} IS NOT NULL AND NOT regexp_matches"
                    f"({col}, {_sql_quote(r[2])})"
                )
            else:  # in_set
                vals = ", ".join(_sql_quote(v) for v in r[2])
                cond = f"{col} IS NOT NULL AND {col} NOT IN ({vals})"
            label_kind, label_col = _label(r)
            selects.append(
                f"SELECT '{label_kind}' AS rule, '{label_col}' AS col_name,"
                f" CAST(COALESCE(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END), 0)"
                f" AS BIGINT) AS violations FROM {table}"
            )
        elif kind == "unique":
            keys = list(r[1]) if isinstance(r[1], (list, tuple)) else [r[1]]
            _, label_col = _label(("unique", keys))
            klist = ", ".join(keys)
            selects.append(
                f"SELECT 'unique' AS rule, '{label_col}' AS col_name,"
                " CAST(COALESCE(SUM(CASE WHEN __c > 1 THEN __c - 1 END), 0)"
                " AS BIGINT) AS violations FROM ("
                f"SELECT COUNT(*) AS __c FROM {table} GROUP BY {klist})"
            )
        elif kind == "fk":
            _, col, ref_table, ref_col = r
            selects.append(
                f"SELECT 'fk' AS rule, '{col}' AS col_name,"
                " CAST(COUNT(*) AS BIGINT) AS violations"
                f" FROM {table} t WHERE t.{col} IS NOT NULL AND NOT EXISTS"
                f" (SELECT 1 FROM {ref_table} r WHERE r.{ref_col} = t.{col})"
            )
        else:
            raise ValueError(f"validate_sql: unknown rule {kind!r}")
    return " UNION ALL ".join(selects)


def impute(
    df: DataFrame,
    cols: Mapping[str, str],
    by: str | None = None,
) -> DataFrame:
    """Fill NULLs per column by strategy — ``{"col": "mean" | "median"
    | "mode" | "zero"}`` — optionally per ``by`` group (the ML-prep
    step after :func:`validate` finds the holes).

    Deterministic fills: ``mean`` is the decimal-exact sum over count
    rounded to 6 dp; ``median`` the exact interpolated percentile
    rounded to 6 dp; ``mode`` the most frequent non-null value with
    ties to the SMALLEST value (cross-engine reproducible, unlike
    Spark's own ``mode()`` tie behavior); ``zero`` a literal 0. Fill
    values compute in ONE aggregation (mode adds one keyed count per
    mode-column) and attach by broadcast join (1-row cross join
    ungrouped); a group whose fill value is itself NULL (all-NULL
    group) leaves its NULLs in place. Type note: mean/median fills are
    doubles, so an integer column imputed by them widens to double
    (the fractional fill is the point); zero/mode preserve the
    column's type.
    """
    strategies = dict(cols)
    for c, how in strategies.items():
        if how not in ("mean", "median", "mode", "zero"):
            raise ValueError(f"impute: unknown strategy {how!r} for {c!r}")
    keys = [by] if by else []
    aggs = []
    for c, how in strategies.items():
        if how == "mean":
            aggs.append(
                F.round(
                    F.sum(F.col(c).cast("decimal(18,6)")).cast("double")
                    / F.count(F.col(c)),
                    6,
                ).alias(f"__fill_{c}")
            )
        elif how == "median":
            aggs.append(
                F.round(F.percentile(F.col(c), F.lit(0.5)), 6).alias(
                    f"__fill_{c}"
                )
            )
        elif how == "zero":
            aggs.append(
                F.lit(0).cast(df.schema[c].dataType).alias(f"__fill_{c}")
            )
        else:  # mode — min_by over (-count, value) with deterministic tie
            aggs.append(F.lit(None).alias(f"__fill_{c}"))  # placeholder
    fills = df.groupBy(*keys).agg(*aggs)
    for c, how in strategies.items():
        if how != "mode":
            continue
        counts = (
            df.filter(F.col(c).isNotNull())
            .groupBy(*keys, F.col(c).alias("__v"))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        from pyspark.sql import Window

        w = (
            Window.partitionBy(*keys)
            if keys
            else Window.partitionBy(F.lit(1))
        )
        mode_rows = (
            counts.withColumn(
                "__rn",
                F.row_number().over(
                    w.orderBy(F.col("__n").desc(), F.col("__v").asc())
                ),
            )
            .filter(F.col("__rn") == 1)
            .select(*keys, F.col("__v").alias(f"__mode_{c}"))
        )
        if keys:
            fills = fills.join(mode_rows, keys, "left")
        else:
            from pybabe_spark.operators._util import attach_scalars

            fills = attach_scalars(fills, mode_rows)
        fills = fills.withColumn(
            f"__fill_{c}", F.col(f"__mode_{c}")
        ).drop(f"__mode_{c}")
    if keys:
        out = df.join(F.broadcast(fills), keys, "left")
    else:
        from pybabe_spark.operators._util import attach_scalars

        out = attach_scalars(df, fills)
    for c in strategies:
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.col(f"__fill_{c}"))
        )
    return out.drop(*[f"__fill_{c}" for c in strategies])


def benford_audit(
    df: DataFrame, col: str, chi2_crit: float = 15.507
) -> DataFrame:
    """First-digit Benford's-law audit of a positive numeric column —
    the fraud/synthetic-data smell test. One row per leading digit
    1..9: ``(digit, n, expected_ppm, observed_ppm)`` plus the same
    ``suspicious`` boolean on every row (χ² over the 9 digits >
    ``chi2_crit``; default = 95th percentile at 8 dof). Zero, NULL,
    and negative-sign rows are excluded (Benford applies to positive
    magnitudes; the leading digit of |x| < 1 is its first NONZERO
    digit).

    TWO passes over the column (like ``histogram``'s documented
    two-pass shape): one scan aggregates to the 9-row digit table,
    and ONE further 1-row aggregate over those 9 rows carries both the
    total and the χ² — via the algebraic identity
    ``χ² = Σ(n²/p)/t − t`` (expand ``Σ(n−tp)²/(tp)`` with ``Σp = 1``)
    so no per-digit expected-count stage re-derives the scan. The
    per-digit ``n²/p`` terms round to exact decimals before summing
    (9-term IEEE sum order would otherwise differ across engines);
    everything else is fixed-shape scalar arithmetic, replayed
    verbatim by the oracle. Digits with zero rows still appear (n=0).
    """
    import math

    digit = F.regexp_extract(
        F.format_number(F.abs(F.col(col)).cast("double"), 10),
        r"([1-9])",
        1,
    )
    counted = (
        df.filter(F.col(col).isNotNull() & (F.abs(F.col(col)) > 0))
        .select(digit.alias("__d"))
        .filter(F.col("__d") != "")
        .groupBy(F.col("__d").cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    full = grid.join(counted, "digit", "left").select(
        "digit", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    from pybabe_spark.operators._util import attach_scalars

    probs = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    p_expr = None
    for d, p in probs.items():
        term = F.when(F.col("digit") == d, F.lit(p))
        p_expr = term if p_expr is None else p_expr.when(
            F.col("digit") == d, F.lit(p)
        )
    nn = F.col("n").cast("double")
    term6 = F.round(nn * nn / p_expr, 6).cast("decimal(18,6)")
    scalars = full.agg(
        F.sum("n").cast("bigint").alias("__t"),
        F.sum(term6).cast("double").alias("__s2"),
    )
    out = attach_scalars(full.withColumn("__p", p_expr), scalars)
    chi2 = F.col("__s2") / F.col("__t").cast("double") - F.col(
        "__t"
    ).cast("double")
    return out.select(
        "digit",
        "n",
        F.floor(F.col("__p") * 1e6).cast("bigint").alias("expected_ppm"),
        F.expr("(n * 1000000) div __t").alias("observed_ppm"),
        (chi2 > F.lit(float(chi2_crit))).alias("suspicious"),
    )


def benford_audit_sql(
    table: str, col: str, chi2_crit: float = 15.507
) -> str:
    """DuckDB oracle of :func:`benford_audit` — identical digit
    extraction (format_number 10-dp rendering) and χ² shape."""
    import math

    digit = (
        f"regexp_extract(format('{{:.10f}}', "
        f"CAST(ABS({col}) AS DOUBLE)), '([1-9])', 1)"
    )
    p_case = " ".join(
        f"WHEN {d} THEN {math.log10(1 + 1 / d)!r}" for d in range(1, 10)
    )
    return f"""
    WITH counted AS (
        SELECT CAST(d AS INT) AS digit, COUNT(*) AS n FROM (
            SELECT {digit} AS d FROM {table}
            WHERE {col} IS NOT NULL AND ABS({col}) > 0
        ) WHERE d <> '' GROUP BY d
    ),
    full_grid AS (
        SELECT g.digit, COALESCE(c.n, 0) AS n
        FROM (SELECT UNNEST(range(1, 10)) AS digit) g
        LEFT JOIN counted c ON c.digit = g.digit
    ),
    scalars AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total,
               CAST(SUM(CAST(ROUND(
                   CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   / (CASE digit {p_case} END), 6)
                   AS DECIMAL(18,6))) AS DOUBLE) AS s2
        FROM full_grid
    )
    SELECT CAST(digit AS INT) AS digit, n,
           CAST(FLOOR((CASE digit {p_case} END) * 1e6) AS BIGINT)
               AS expected_ppm,
           (n * 1000000) // total AS observed_ppm,
           s2 / CAST(total AS DOUBLE) - CAST(total AS DOUBLE)
               > {float(chi2_crit)!r} AS suspicious
    FROM full_grid CROSS JOIN scalars
    """


def population_stability(
    ref: DataFrame,
    new: DataFrame,
    col: str,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference distribution and
    a new batch of the same column — THE production drift monitor for
    model inputs and scores (rule of thumb: PSI < 0.1 stable, 0.1-0.25
    drifting, > 0.25 shifted).

    Bins are the REFERENCE's equal-frequency quantile edges (exact
    6 dp-rounded percentiles, the ``quantile_bins`` rule: ties fall in
    the lower bin), so the reference lands ~uniform and drift shows as
    mass moving between bins. Output: one row per bin
    ``(bin, ref_n, new_n, term)`` plus the attached total ``psi`` —
    ``term = (p − q)·ln(p/q)`` with Laplace-smoothed shares
    ``p = (ref_n+1)/(ref_total+bins)`` (empty bins stay finite,
    deterministically). NULLs are excluded from both sides.

    Cross-engine determinism: counts are exact; shares are fixed-shape
    double expressions; each term takes one DECIMAL(18,6) rounding
    (ln is transcendental — the house measure-zero boundary) and the
    total is their exact decimal sum. Scale shape: one percentile agg
    on the reference, one 1-row broadcast attach per side, two
    bin-grid hash aggs, a ``bins``-row join — corpus cost is two scans.
    """
    if bins < 2:
        raise ValueError("population_stability: bins must be >= 2")
    from pybabe_spark.operators._util import attach_scalars

    edges = ref.agg(
        *[
            F.round(F.percentile(F.col(col), F.lit(i / bins)), 6).alias(
                f"__e{i}"
            )
            for i in range(1, bins)
        ]
    )

    def _binned(df: DataFrame, name: str) -> DataFrame:
        expr = None
        for i in range(1, bins):
            term = (F.col(col) > F.col(f"__e{i}")).cast("int")
            expr = term if expr is None else expr + term
        return (
            attach_scalars(df.filter(F.col(col).isNotNull()), edges)
            .select(expr.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    spark = ref.sparkSession
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    counts = (
        grid.join(_binned(ref, "ref_n"), "bin", "left")
        .join(_binned(new, "new_n"), "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("new_n", F.lit(0)).alias("new_n"),
        )
    )
    totals = counts.agg(
        F.sum("ref_n").alias("__rt"), F.sum("new_n").alias("__nt")
    )
    p = (F.col("ref_n") + 1).cast("double") / (F.col("__rt") + bins).cast("double")
    q = (F.col("new_n") + 1).cast("double") / (F.col("__nt") + bins).cast("double")
    terms = attach_scalars(counts, totals).select(
        "bin",
        "ref_n",
        "new_n",
        ((p - q) * F.log(p / q)).cast("decimal(18,6)").alias("__term"),
    )
    psi = terms.agg(F.sum("__term").cast("double").alias("__psi"))
    return attach_scalars(terms, psi).select(
        "bin",
        "ref_n",
        "new_n",
        F.col("__term").cast("double").alias("term"),
        F.col("__psi").alias("psi"),
    )


def population_stability_sql(
    ref_sql: str,
    new_sql: str,
    col: str,
    bins: int = 10,
) -> str:
    """DuckDB mirror of :func:`population_stability`; ``ref_sql`` /
    ``new_sql`` are table names or parenthesized subqueries."""
    edges = ", ".join(
        f"ROUND(quantile_cont({col}, {i / bins}), 6) AS e{i}"
        for i in range(1, bins)
    )
    terms = " + ".join(
        f"CAST({col} > e{i} AS INT)" for i in range(1, bins)
    )
    binned = lambda src, name: f"""(
      SELECT ({terms}) AS bin, COUNT(*) AS {name}
      FROM {src} CROSS JOIN e WHERE {col} IS NOT NULL GROUP BY 1
    )"""  # noqa: E731
    return f"""
    WITH e AS (SELECT {edges} FROM {ref_sql}),
    grid AS (SELECT UNNEST(range({bins})) AS bin),
    counts AS (
      SELECT grid.bin,
             COALESCE(r.ref_n, 0) AS ref_n,
             COALESCE(n.new_n, 0) AS new_n
      FROM grid
      LEFT JOIN {binned(ref_sql, 'ref_n')} r ON grid.bin = r.bin
      LEFT JOIN {binned(new_sql, 'new_n')} n ON grid.bin = n.bin
    ),
    tot AS (SELECT SUM(ref_n) AS rt, SUM(new_n) AS nt FROM counts),
    terms AS (
      SELECT bin, ref_n, new_n,
             CAST((CAST(ref_n + 1 AS DOUBLE) / (rt + {bins})
                   - CAST(new_n + 1 AS DOUBLE) / (nt + {bins}))
                  * ln((CAST(ref_n + 1 AS DOUBLE) / (rt + {bins}))
                       / (CAST(new_n + 1 AS DOUBLE) / (nt + {bins})))
                  AS DECIMAL(18,6)) AS term
      FROM counts CROSS JOIN tot
    ),
    psi AS (SELECT CAST(SUM(term) AS DOUBLE) AS psi FROM terms)
    SELECT CAST(bin AS INT) AS bin,
           CAST(ref_n AS BIGINT) AS ref_n,
           CAST(new_n AS BIGINT) AS new_n,
           CAST(term AS DOUBLE) AS term, psi
    FROM terms CROSS JOIN psi
    """


def js_divergence(
    a: DataFrame,
    b: DataFrame,
    col: str,
) -> DataFrame:
    """Jensen–Shannon divergence between the distributions of a
    CATEGORICAL column (token, domain, label, n-gram) on two sides —
    the discrete sibling of :func:`population_stability` (which bins a
    continuous column): symmetric, bounded in [0, ln 2], finite even
    on disjoint supports, the corpus-shift monitor for training-data
    mixes (yesterday's crawl vs today's, source A vs source B). ONE
    output row: per-side token totals, the union vocabulary size,
    ``js`` (nats) and ``js_normalized`` (share of ln 2, so 1.0 means
    fully disjoint).

    ``JS = ½·Σ p·ln(2p/(p+q)) + ½·Σ q·ln(2q/(p+q))`` with p, q the
    per-value shares. Each value's term is ONE fixed-shape IEEE
    expression over exact integer counts rounded once to
    DECIMAL(38,12) — fine enough that a 10⁶-term vocabulary keeps six
    honest digits, coarse enough to absorb sub-ulp ln() noise — and
    the terms sum as decimals (order-independent, engine-identical;
    ln itself is the house measure-zero boundary, as in
    :func:`population_stability`). NULL values are excluded on both
    sides.

    Scale shape: union → one conditional hash agg to the value grain
    (map-side combinable), a 1-row totals attach, one 1-row finish.
    The only shuffle is the value vocabulary; nothing is collected.
    """
    ok = F.col(col).isNotNull()
    from pybabe_spark.operators._util import attach_scalars

    tagged = a.filter(ok).select(
        F.col(col).alias("__v"), F.lit(1).alias("__a"), F.lit(0).alias("__b")
    ).unionAll(
        b.filter(ok).select(
            F.col(col).alias("__v"),
            F.lit(0).alias("__a"),
            F.lit(1).alias("__b"),
        )
    )
    cnt = tagged.groupBy("__v").agg(
        F.sum("__a").cast("bigint").alias("__ca"),
        F.sum("__b").cast("bigint").alias("__cb"),
    )
    tot = cnt.agg(
        F.coalesce(F.sum("__ca"), F.lit(0)).cast("bigint").alias("__na"),
        F.coalesce(F.sum("__cb"), F.lit(0)).cast("bigint").alias("__nb"),
    )
    # shares guarded on the side totals: an empty side divides nowhere
    # (ANSI mode raises on 0/0), and each taken CASE arm has its own
    # share > 0 so every ln() argument is positive
    pa = (
        "(CASE WHEN __na > 0 THEN"
        " CAST(__ca AS DOUBLE) / CAST(__na AS DOUBLE) ELSE 0.0 END)"
    )
    qb = (
        "(CASE WHEN __nb > 0 THEN"
        " CAST(__cb AS DOUBLE) / CAST(__nb AS DOUBLE) ELSE 0.0 END)"
    )
    term_sql = (
        "CAST("
        f"0.5 * (CASE WHEN __ca > 0 THEN"
        f" {pa} * ln(2.0 * {pa} / ({pa} + {qb}))"
        " ELSE 0.0 END)"
        f" + 0.5 * (CASE WHEN __cb > 0 THEN"
        f" {qb} * ln(2.0 * {qb} / ({pa} + {qb}))"
        " ELSE 0.0 END)"
        " AS DECIMAL(38,12))"
    )
    terms = attach_scalars(cnt, tot).select(
        F.col("__na"),
        F.col("__nb"),
        F.expr(term_sql).alias("__t"),
    )
    agg = terms.agg(
        F.first("__na").alias("n_a"),
        F.first("__nb").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.coalesce(
            F.sum("__t"), F.lit(0).cast("decimal(38,12)")
        ).cast("decimal(38,12)").alias("__js"),
    )
    # empty input: the terms frame has 0 rows, first() yields NULL —
    # recover totals as 0 and JS as NULL (undefined, not "identical")
    js = F.col("__js").cast("double")
    return agg.select(
        F.coalesce(F.col("n_a"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("bigint").alias("n_b"),
        F.col("vocab_size"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0), js
        ).alias("js"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            (js / F.lit(0.6931471805599453))
            .cast("decimal(18,6)")
            .cast("double"),
        ).alias("js_normalized"),
    )


def js_divergence_sql(a_select: str, b_select: str, col: str) -> str:
    """DuckDB oracle of :func:`js_divergence` — same conditional
    counts, same per-term DECIMAL(38,12) rounding, same finish."""
    return f"""
    WITH tagged AS (
        SELECT {col} AS v, 1 AS a, 0 AS b FROM ({a_select})
        WHERE {col} IS NOT NULL
        UNION ALL
        SELECT {col} AS v, 0 AS a, 1 AS b FROM ({b_select})
        WHERE {col} IS NOT NULL
    ),
    cnt AS (
        SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
               CAST(SUM(b) AS BIGINT) AS cb
        FROM tagged GROUP BY v
    ),
    tot AS (
        SELECT COALESCE(CAST(SUM(ca) AS BIGINT), 0) AS na,
               COALESCE(CAST(SUM(cb) AS BIGINT), 0) AS nb
        FROM cnt
    ),
    terms AS (
        SELECT na, nb,
               CAST(
                 0.5 * (CASE WHEN ca > 0 THEN
                   (CASE WHEN na > 0 THEN
                      CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                    ELSE 0.0 END)
                   * ln(2.0 * (CASE WHEN na > 0 THEN
                        CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                      ELSE 0.0 END)
                        / ((CASE WHEN na > 0 THEN
                              CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                            ELSE 0.0 END)
                           + (CASE WHEN nb > 0 THEN
                                CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
                              ELSE 0.0 END)))
                 ELSE 0.0 END)
                 + 0.5 * (CASE WHEN cb > 0 THEN
                   (CASE WHEN nb > 0 THEN
                      CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
                    ELSE 0.0 END)
                   * ln(2.0 * (CASE WHEN nb > 0 THEN
                        CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
                      ELSE 0.0 END)
                        / ((CASE WHEN na > 0 THEN
                              CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                            ELSE 0.0 END)
                           + (CASE WHEN nb > 0 THEN
                                CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
                              ELSE 0.0 END)))
                 ELSE 0.0 END)
               AS DECIMAL(38,12)) AS t
        FROM cnt CROSS JOIN tot
    ),
    agg AS (
        SELECT MIN(na) AS n_a, MIN(nb) AS n_b,
               CAST(COUNT(*) AS BIGINT) AS vocab_size,
               COALESCE(SUM(t), CAST(0 AS DECIMAL(38,12))) AS js_d
        FROM terms
    )
    SELECT COALESCE(n_a, 0) AS n_a,
           COALESCE(n_b, 0) AS n_b,
           vocab_size,
           CASE WHEN COALESCE(n_a, 0) > 0 AND COALESCE(n_b, 0) > 0
           THEN CAST(js_d AS DOUBLE) END AS js,
           CASE WHEN COALESCE(n_a, 0) > 0 AND COALESCE(n_b, 0) > 0
           THEN CAST(CAST(CAST(js_d AS DOUBLE) / 0.6931471805599453
                AS DECIMAL(18,6)) AS DOUBLE) END AS js_normalized
    FROM agg
    """


def schema_drift(a: DataFrame, b: DataFrame) -> DataFrame:
    """Schema + null-rate drift between two snapshots of "the same"
    table (yesterday's load vs today's, prod vs backfill) — the
    pipeline guard :func:`table_diff` (row-level) and
    :func:`population_stability` (value-level) bracket but don't
    cover: ONE row per column in either schema with

    - ``status`` — ``added`` / ``removed`` / ``type_changed`` /
      ``same`` (names from B's perspective: ``added`` = new in B)
    - ``type_a`` / ``type_b`` — Spark ``simpleString`` types
    - ``null_ppm_a`` / ``null_ppm_b`` — exact integral null rates
      (NULL where the column or side is absent/empty)

    The schema half reads DataFrame METADATA on the driver (schemas
    are driver objects by nature — no data moves); the null rates are
    ONE map-side-combinable aggregation per side (every column counted
    in a single pass) unpivoted via ``stack``. A silent upstream type
    widening or a column starting to arrive empty shows up here before
    it corrupts a join downstream.
    """
    fa = {f.name: f.dataType.simpleString() for f in a.schema.fields}
    fb = {f.name: f.dataType.simpleString() for f in b.schema.fields}
    cols = sorted(set(fa) | set(fb))
    spark = a.sparkSession
    meta = spark.createDataFrame(
        [
            (
                c,
                (
                    "added"
                    if c not in fa
                    else "removed"
                    if c not in fb
                    else "type_changed"
                    if fa[c] != fb[c]
                    else "same"
                ),
                fa.get(c),
                fb.get(c),
            )
            for c in cols
        ],
        "column string, status string, type_a string, type_b string",
    )

    def _null_ppm(df, own: dict, alias: str) -> DataFrame:
        names = sorted(own)
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nl_{i}")
            for i, c in enumerate(names)
        ]
        one = df.agg(*aggs)
        pairs = ", ".join(
            f"'{c}', __nl_{i}" for i, c in enumerate(names)
        )
        return one.select(
            F.expr(
                f"stack({len(names)}, {pairs}) as (column, __nulls)"
            ),
            F.col("__n"),
        ).select(
            "column",
            F.when(
                F.col("__n") > 0,
                F.expr("CAST(__nulls * 1000000 div __n AS BIGINT)"),
            ).alias(alias),
        )

    out = (
        meta.join(_null_ppm(a, fa, "null_ppm_a"), "column", "left")
        .join(_null_ppm(b, fb, "null_ppm_b"), "column", "left")
        .select(
            "column", "status", "type_a", "type_b",
            "null_ppm_a", "null_ppm_b",
        )
    )
    return out
