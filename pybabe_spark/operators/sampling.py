"""Deterministic sampling / splitting / source-mixing for training-data
pipelines.

Beyond-reference scale machinery (PyBabe has no sampling surface; its
closest primitive is ``head``, pybabe/transform.py:316-331). Every
operator here is DETERMINISTIC — a pure arithmetic hash of a key column
decides membership, so runs are reproducible across clusters, retries,
and engines (the DuckDB oracle computes the identical arithmetic), and
no shuffle or ordering assumption is involved: each row decides its own
fate map-side, which is the only sampling design that survives 100 TB
(`df.sample` re-draws per task attempt; ``limit`` funnels to one task).

The hash is a multiplicative congruential mix over a pre-folded key:

    bucket(id) = ((id mod 1000003) * 2654435761 + 123456789) mod 1000000

pre-folding by the prime 1000003 keeps the multiply far from int64
overflow for arbitrarily large ids (ANSI mode would fail the job on
overflow); 2654435761 is Knuth's 2^32 golden-ratio multiplier.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from pybabe_spark.operators._util import attach_scalars, gen_col

#: bucket space: membership thresholds are expressed in millionths
BUCKETS = 1_000_000
_FOLD = 1_000_003
_MULT = 2_654_435_761
_ADD = 123_456_789


#: null integral keys fold from this sentinel so they land in a real
#: bucket (disjoint + exhaustive even with NULL keys); null/empty string
#: keys hash the empty string.
_NULL_INT_SENTINEL = -1


def hash_bucket(key: Column | str, kind: str = "int") -> Column:
    """The row's deterministic bucket in [0, 1_000_000).

    ``kind='int'``: multiplicative mix over the bigint key (NULL →
    sentinel, negatives fine via pmod). ``kind='string'``: 60-bit
    integer from the md5 hex prefix of the raw string (NULL → ''), then
    the same mix — both forms are reproduced exactly by
    :func:`hash_bucket_sql` so the DuckDB oracle selects identical rows.
    """
    k = F.col(key) if isinstance(key, str) else key
    if kind == "int":
        base = F.coalesce(k.cast("bigint"), F.lit(_NULL_INT_SENTINEL))
    elif kind == "string":
        base = F.conv(
            F.substring(F.md5(F.coalesce(k, F.lit(""))), 1, 15), 16, 10
        ).cast("bigint")
    else:
        raise ValueError(f"hash_bucket: unknown kind {kind!r}")
    folded = F.pmod(base, F.lit(_FOLD))
    return F.pmod(folded * F.lit(_MULT) + F.lit(_ADD), F.lit(BUCKETS))


def hash_bucket_sql(key: str, kind: str = "int") -> str:
    """The identical arithmetic as ANSI SQL (the DuckDB oracle form).

    Uses explicit positive-modulus ``((x % m + m) % m)`` arithmetic:
    DuckDB's ``%`` takes the dividend's sign, Spark's ``pmod`` is always
    non-negative — without the wrap, negative keys diverge across
    engines.
    """
    if kind == "int":
        base = f"COALESCE({key}, {_NULL_INT_SENTINEL})"
    elif kind == "string":
        base = (
            f"CAST(('0x' || substr(md5(COALESCE({key}, ''))"
            f", 1, 15)) AS BIGINT)"
        )
    else:
        raise ValueError(f"hash_bucket_sql: unknown kind {kind!r}")
    folded = f"((({base}) % {_FOLD} + {_FOLD}) % {_FOLD})"
    return f"((({folded}) * {_MULT} + {_ADD}) % {BUCKETS})"


#: the names DataType.simpleString() actually produces for integral
#: types (tinyint/smallint/int/bigint — NOT the internal byte/short/
#: long/integer spellings)
_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _key_bucket(df: DataFrame, key: str) -> Column:
    """Schema-dispatched bucket for ``df[key]``: integral columns take
    the arithmetic path, strings the md5 path; anything else (float,
    date, ...) raises rather than silently bucketing NULL-casts — the
    failure mode the advisory flagged (string keys hashing to 0 rows)."""
    dtype = df.schema[key].dataType.simpleString()
    if dtype in _INTEGRAL:
        return hash_bucket(key, "int")
    if dtype == "string":
        return hash_bucket(key, "string")
    raise TypeError(
        f"sampling key {key!r} has type {dtype}; use an integral or "
        f"string key (float/date keys have no cross-engine stable hash)"
    )


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by ``key``.

    Map-side filter — no shuffle, no RNG state, stable under retries;
    the selected set is a property of the data, not of the run.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"hash_sample: fraction {fraction} outside [0, 1]")
    return df.filter(_key_bucket(df, key) < F.lit(int(round(fraction * BUCKETS))))


def train_test_split(
    df: DataFrame, key: str, test_fraction: float = 0.1
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (train, test) partition by key hash: disjoint,
    exhaustive, reproducible — the split every eval pipeline needs to
    be able to recompute from the raw table alone."""
    cut = int(round(test_fraction * BUCKETS))
    bucket = _key_bucket(df, key)
    test = df.filter(bucket < F.lit(cut))
    train = df.filter(bucket >= F.lit(cut))
    return train, test


def stratified_sample(
    df: DataFrame, strata: str, key: str, fractions: Mapping[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum value → keep fraction
    (strata absent from ``fractions`` are dropped, like ``sampleBy``).

    One map-side CASE over the bucket — no shuffle, exact determinism,
    unlike ``DataFrame.sampleBy`` whose Bernoulli draws differ per run.
    """
    expr = None
    bucket = _key_bucket(df, key)
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"stratified_sample: fraction {frac} outside [0, 1]")
        cond = (F.col(strata) == F.lit(value)) & (
            bucket < F.lit(int(round(frac * BUCKETS)))
        )
        expr = cond if expr is None else (expr | cond)
    if expr is None:
        raise ValueError("stratified_sample: no fractions given")
    return df.filter(expr)


def shuffle_key(key: Column | str, seed: int = 0) -> Column:
    """The row's deterministic shuffle position key: md5 over
    ``"{seed}:{key}"`` (NULL key hashes the empty string). A different
    seed is a different, equally uniform permutation; the mapping is a
    property of the data + seed, identical across engines
    (:func:`shuffle_key_sql` is the DuckDB mirror)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.md5(
        F.concat(F.lit(f"{seed}:"), F.coalesce(k.cast("string"), F.lit("")))
    )


def shuffle_key_sql(key: str, seed: int = 0) -> str:
    """The identical md5 position key as ANSI SQL (DuckDB oracle form)."""
    return f"md5('{seed}:' || COALESCE(CAST({key} AS VARCHAR), ''))"


def global_shuffle(
    df: DataFrame, key: str, seed: int = 0, shards: int | None = None
) -> DataFrame:
    """Deterministic seeded reorder of the whole dataset — the global
    shuffle every training run needs before epoch streaming, made
    reproducible: row order is ``ORDER BY md5(seed:key), key`` so any
    engine, any cluster size, any retry produces the same permutation.
    Full determinism requires ``key`` to be unique per row (a doc id);
    rows sharing a key value sort together but order arbitrarily among
    themselves.

    ``shards=None`` returns a totally ordered frame (Spark range-samples
    the sort key and runs a range-partitioned external merge sort — the
    100 TB-safe total order, no single-task funnel). ``shards=N``
    instead range-partitions into exactly N sorted shards (what a
    sharded training-data write wants: globally range-ordered,
    per-shard sorted, no total-order barrier).
    """
    return _range_ordered(
        df, [shuffle_key(key, seed), F.col(key)], shards, "global_shuffle"
    )


def temperature_resample(
    df: DataFrame,
    group_col: str,
    key: str,
    budget: int,
    alpha: float = 0.5,
    seed: int = 0,
    min_rows: int = 1,
    exact: bool = True,
) -> DataFrame:
    """Temperature-based group rebalancing (the multilingual α-sampling
    of mBERT/mT5/UNIMAX): allocate a row budget across groups in
    proportion to ``count^alpha`` — ``alpha=1`` keeps natural
    proportions, ``alpha→0`` approaches uniform, upweighting
    low-resource groups — then deterministically select each group's
    allocation.

    Allocation: ``t_g = min(n_g, max(min_rows, floor(budget · w_g /
    Σw)))`` with ``w_g = pow(n_g, alpha)`` rounded to DECIMAL(18,6) so
    the total Σw is an exact decimal sum (group-order-independent); the
    floor runs on IEEE doubles built identically in the SQL mirror.
    Floor allocation means Σt_g ≤ budget (plus any min_rows lift).

    Selection, ``exact=True``: each group's first ``t_g`` rows in
    deterministic ``shuffle_key`` order (row_number window partitioned
    by group — exact counts; a single enormous group sorts in one task,
    so prefer ``exact=False`` when groups can be huge). ``exact=False``:
    a map-side hash-fraction filter at threshold ``t_g/n_g`` — no
    window, no sort, fully distributed; group sizes come out binomially
    close to ``t_g`` rather than exact. Both paths are properties of the
    data + seed: stable under retries, identical across engines.
    """
    if budget <= 0:
        raise ValueError(f"temperature_resample: budget {budget} must be > 0")
    if alpha < 0:
        raise ValueError(f"temperature_resample: alpha {alpha} must be >= 0")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w = counts.withColumn(
        "__w", F.pow(F.col("__n"), F.lit(float(alpha))).cast("decimal(18,6)")
    )
    totals = w.agg(F.sum("__w").alias("__tw"))
    alloc = attach_scalars(w, totals).select(
        group_col,
        "__n",
        F.least(
            F.col("__n"),
            F.greatest(
                F.lit(min_rows).cast("bigint"),
                F.floor(
                    (F.col("__w").cast("double") * budget)
                    / F.col("__tw").cast("double")
                ).cast("bigint"),
            ),
        ).alias("__t"),
    )
    joined = df.join(F.broadcast(alloc), group_col)
    if exact:
        rk = gen_col(joined.columns, "__rk")
        wnd = Window.partitionBy(group_col).orderBy(
            shuffle_key(key, seed), F.col(key)
        )
        return (
            joined.withColumn(rk, F.row_number().over(wnd))
            .filter(F.col(rk) <= F.col("__t"))
            .drop(rk, "__n", "__t")
        )
    bucket = _key_bucket(df, key)
    thresh = F.floor(
        (F.col("__t").cast("double") / F.col("__n")) * BUCKETS
    ).cast("bigint")
    return joined.filter(bucket < thresh).drop("__n", "__t")


def temperature_resample_sql(
    table: str,
    group_col: str,
    key: str,
    budget: int,
    alpha: float = 0.5,
    seed: int = 0,
    min_rows: int = 1,
    select_cols: str = "*",
) -> str:
    """DuckDB oracle of the ``exact=True`` path — same decimal weight
    rounding, same IEEE floor allocation, same md5 selection order."""
    return f"""
    WITH counts AS (
      SELECT {group_col}, COUNT(*) AS n FROM {table} GROUP BY {group_col}
    ),
    w AS (SELECT {group_col}, n,
                 CAST(pow(n, {float(alpha)}) AS DECIMAL(18,6)) AS w
          FROM counts),
    tot AS (SELECT SUM(w) AS tw FROM w),
    alloc AS (
      SELECT {group_col}, n,
             LEAST(n, GREATEST({min_rows},
               CAST(floor((CAST(w AS DOUBLE) * {budget})
                          / CAST(tot.tw AS DOUBLE)) AS BIGINT))) AS t
      FROM w, tot
    ),
    ranked AS (
      SELECT d.*, a.t,
             ROW_NUMBER() OVER (
               PARTITION BY d.{group_col}
               ORDER BY {shuffle_key_sql(key, seed)}, d.{key}
             ) AS rk
      FROM {table} d JOIN alloc a USING ({group_col})
    )
    SELECT {select_cols} FROM ranked WHERE rk <= t
    """


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    token_col: str,
    budget: int,
    seed: int = 0,
) -> DataFrame:
    """Greedy per-group TOKEN-budget fill — the data-mixing primitive
    row-count sampling (``temperature_resample``) can't express: each
    group keeps documents in deterministic seeded-shuffle order until
    its cumulative ``token_col`` reaches ``budget``. A doc is kept
    while the tokens BEFORE it are under budget, so a group overshoots
    by at most one document — budgets are fuzzy at doc granularity,
    exact at corpus scale (the standard mixing contract). Rows with
    NULL ``token_col`` are excluded; ``token_col`` must be
    non-negative (compose with ``functions.text.token_count`` or a
    stored length column upstream).

    Deterministic: the order is the md5 ``shuffle_key`` (a property of
    data + seed — stable under retries, identical across engines), so
    re-running a mixing job reproduces the same corpus slice.

    Scale shape: ONE key-partitioned cumulative window over each
    group's rows — no global sort, no driver state; groups fill in
    parallel. At 100 TB this is one shuffle by group key.
    """
    if budget <= 0:
        raise ValueError(f"token_budget_sample: budget {budget} must be > 0")
    w = Window.partitionBy(group_col).orderBy(
        shuffle_key(key, seed), F.col(key)
    )
    prior = gen_col(df.columns, "__prior")
    return (
        df.filter(F.col(token_col).isNotNull())
        .withColumn(
            prior,
            F.coalesce(
                F.sum(F.col(token_col).cast("bigint")).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("bigint"),
            ),
        )
        .filter(F.col(prior) < budget)
        .drop(prior)
    )


def token_budget_sample_sql(
    table: str,
    group_col: str,
    key: str,
    token_col: str,
    budget: int,
    seed: int = 0,
    columns: str = "*",
) -> str:
    """DuckDB oracle of :func:`token_budget_sample` — identical md5
    order, exclusive-prefix cumulative sum, strict budget test."""
    return f"""
    SELECT {columns} FROM (
        SELECT *, COALESCE(SUM(CAST({token_col} AS BIGINT)) OVER (
                   PARTITION BY {group_col}
                   ORDER BY {shuffle_key_sql(key, seed)}, {key}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS __prior
        FROM {table} WHERE {token_col} IS NOT NULL
    ) WHERE __prior < {budget}
    """


def mix_sources(
    sources: Sequence[tuple[DataFrame, float]], key: str
) -> DataFrame:
    """Weighted blend of corpora: each (df, keep_fraction) is hash-sampled
    then unioned by name — the standard training-mix step (e.g. 100% of
    curated text, 10% of web crawl). Deterministic end to end; the union
    is a no-shuffle narrow op."""
    if not sources:
        raise ValueError("mix_sources: no sources")
    parts = [hash_sample(df, key, frac) for df, frac in sources]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _range_ordered(df, cols, shards, op_name):
    """Shared total-order / N-shard mechanics for the epoch-ordering
    family: ``shards=None`` → range-partitioned external merge sort
    (the 100 TB-safe total order), ``shards=N`` → N globally
    range-ordered, per-shard-sorted shards."""
    if shards is None:
        return df.orderBy(*cols)
    if shards < 1:
        raise ValueError(f"{op_name}: shards {shards} < 1")
    return df.repartitionByRange(shards, *cols).sortWithinPartitions(*cols)


def curriculum_band(
    score: Column | str, boundaries: Sequence[float]
) -> Column:
    """The score's band index: the number of (ascending, fixed)
    boundaries at or below it — data-INDEPENDENT thresholds, so banding
    is a narrow map with no global quantile pass (an ntile over an
    unpartitioned window would be the single-task funnel plan_lint
    rejects). Mirrored exactly by :func:`curriculum_band_sql`."""
    s = F.col(score) if isinstance(score, str) else score
    band = F.lit(0)
    for b in sorted(boundaries):
        # when/otherwise, not a bare comparison cast: a NULL score must
        # band to 0 exactly like the SQL mirror's CASE ... ELSE 0
        band = band + F.when(s >= F.lit(b), F.lit(1)).otherwise(F.lit(0))
    return band


def curriculum_band_sql(score: str, boundaries: Sequence[float]) -> str:
    """The identical band arithmetic as ANSI SQL (DuckDB oracle form)."""
    terms = " + ".join(
        f"(CASE WHEN {score} >= {b} THEN 1 ELSE 0 END)"
        for b in sorted(boundaries)
    )
    return f"({terms})"


def curriculum_order(
    df: DataFrame,
    score_col: str,
    boundaries: Sequence[float],
    key: str,
    seed: int = 0,
    easiest_first: bool = True,
    shards: int | None = None,
) -> DataFrame:
    """Curriculum epoch ordering: band documents by fixed score
    thresholds, order bands easiest-first (highest band = highest
    score first by default) and SHUFFLE deterministically inside each
    band — the curriculum-learning schedule (Bengio et al. 2009)
    epoch writers need, fully reproducible: order is a pure function of
    (data, boundaries, seed).

    Same 100 TB mechanics as :func:`global_shuffle`: a range-partitioned
    external merge sort on (band, md5(seed:key), key) — no single-task
    funnel; ``shards=N`` yields N globally-range-ordered sorted shards
    instead of a total order.
    """
    band = gen_col(df.columns, "__band")
    bcol = F.col(band)
    border = bcol.desc() if easiest_first else bcol.asc()
    work = df.withColumn(band, curriculum_band(score_col, boundaries))
    return _range_ordered(
        work,
        [border, shuffle_key(key, seed), F.col(key)],
        shards,
        "curriculum_order",
    ).drop(band)


def stratified_fixed_n(
    df: DataFrame,
    strata: str,
    key: str,
    n_per_stratum: int,
    seed: int = 0,
) -> DataFrame:
    """EXACTLY ``n_per_stratum`` rows from every stratum (all rows when
    a stratum is smaller) — the eval-set constructor
    ``stratified_sample`` (rate-based, run-size ~n·p) cannot give.
    Deterministic: rows are ranked inside each stratum by the seeded
    md5 shuffle key (:func:`shuffle_key` — a property of the data, not
    the run), ties impossible for distinct keys.

    One shuffle on the stratum column; the per-stratum rank is a
    key-partitioned window, and Spark's WindowGroupLimit pushes the
    ``rank <= n`` cut below the full sort at scale. Skew bound: one
    stratum's rows sort within one partition — same bound as any
    per-group top-k.
    """
    if n_per_stratum < 1:
        raise ValueError("stratified_fixed_n: n_per_stratum must be >= 1")
    from pyspark.sql import Window

    from pybabe_spark.operators._util import gen_col

    rn = gen_col(df.columns, "__rn")
    w = Window.partitionBy(strata).orderBy(
        shuffle_key(key, seed).asc(), F.col(key).asc()
    )
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= n_per_stratum)
        .drop(rn)
    )


def stratified_fixed_n_sql(
    table: str,
    strata: str,
    key: str,
    n_per_stratum: int,
    seed: int = 0,
    columns: str = "*",
) -> str:
    """DuckDB oracle of :func:`stratified_fixed_n` (same md5 rank)."""
    return f"""
    SELECT {columns} FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY {strata}
            ORDER BY {shuffle_key_sql(key, seed)}, {key}
        ) AS __rn
        FROM {table}
    ) WHERE __rn <= {int(n_per_stratum)}
    """


def winsorize(
    df: DataFrame,
    col: str,
    lower_p: float = 0.01,
    upper_p: float = 0.99,
    by: str | None = None,
) -> DataFrame:
    """Clamp ``col`` into its [lower_p, upper_p] quantile range —
    per group with ``by`` — the standard outlier-taming step before
    statistics that squares or averages values. Adds ``{col}_w``.

    The clamp bounds are the EXACT 6-dp-rounded quantiles
    (operators/sketch.quantiles — exact for ≤2 dp data), attached by a
    broadcastable group join (or a 1-row cross join ungrouped), so the
    clamped column is cross-engine deterministic: every output value is
    either the untouched input double or a shared 6-dp bound.
    Exact quantiles buffer per-group values — bounded groups, like
    ``quantiles`` itself; at corpus scale swap in approx bounds via
    ``quantiles_approx`` and accept sketch-defined bounds.
    """
    if not 0.0 <= lower_p < upper_p <= 1.0:
        raise ValueError("winsorize: need 0 <= lower_p < upper_p <= 1")
    keys = [by] if by else []
    bounds = df.groupBy(*keys).agg(
        F.round(F.percentile(F.col(col), F.lit(lower_p)), 6).alias("__lo"),
        F.round(F.percentile(F.col(col), F.lit(upper_p)), 6).alias("__hi"),
    )
    if by:
        j = df.join(F.broadcast(bounds), by)
    else:
        from pybabe_spark.operators._util import attach_scalars

        j = attach_scalars(df, bounds)
    return j.withColumn(
        f"{col}_w",
        F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi")),
    ).drop("__lo", "__hi")


def winsorize_sql(
    table: str,
    col: str,
    lower_p: float = 0.01,
    upper_p: float = 0.99,
    by: str | None = None,
    columns: str = "*",
) -> str:
    """DuckDB oracle of :func:`winsorize`."""
    if by:
        return f"""
        WITH b AS (
            SELECT {by},
                   ROUND(quantile_cont({col}, {lower_p}), 6) AS __lo,
                   ROUND(quantile_cont({col}, {upper_p}), 6) AS __hi
            FROM {table} GROUP BY {by}
        )
        SELECT {columns},
               LEAST(GREATEST({col}, __lo), __hi) AS {col}_w
        FROM {table} JOIN b USING ({by})
        """
    return f"""
    WITH b AS (
        SELECT ROUND(quantile_cont({col}, {lower_p}), 6) AS __lo,
               ROUND(quantile_cont({col}, {upper_p}), 6) AS __hi
        FROM {table}
    )
    SELECT {columns},
           LEAST(GREATEST({col}, __lo), __hi) AS {col}_w
    FROM {table} CROSS JOIN b
    """


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Deterministic sample of ``n`` rows WITHOUT replacement with
    inclusion probability ∝ ``weight_col`` (Efraimidis–Spirakis via
    Gumbel-top-k: keep the n largest ``ln(w) − ln(−ln(u))`` keys, u
    from the seeded md5 of the id — dsir.gumbel_key's idiom, DECIMAL-
    rounded so the libm ln difference across engines is absorbed).
    Rows with NULL or non-positive weight are excluded (they have no
    sampling mass). Ties break by id. Physical plan is
    TakeOrderedAndProject — no global sort at any scale; a different
    seed is an independent sample.
    """
    if n < 1:
        raise ValueError("weighted_sample: n must be >= 1")
    from pybabe_spark.operators.dsir import gumbel_key

    lw = gen_col(df.columns, "__lw")
    g = gen_col(df.columns + [lw], "__g")
    keyed = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(lw, F.log(F.col(weight_col).cast("double")))
        .withColumn(g, gumbel_key(lw, id_col, seed))
    )
    return (
        keyed.orderBy(F.col(g).desc(), F.col(id_col).asc())
        .limit(n)
        .drop(lw, g)
    )


def weighted_sample_sql(
    table: str,
    weight_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
    columns: str = "*",
) -> str:
    """DuckDB oracle of :func:`weighted_sample`."""
    from pybabe_spark.operators.dsir import gumbel_key_sql

    g = gumbel_key_sql(f"ln(CAST({weight_col} AS DOUBLE))", id_col, seed)
    return f"""
    SELECT {columns} FROM {table}
    WHERE {weight_col} IS NOT NULL AND {weight_col} > 0
    ORDER BY {g} DESC, {id_col} ASC
    LIMIT {int(n)}
    """


def quantile_bins(
    df: DataFrame,
    col: str,
    k: int,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency discretization: adds ``{col}_bin`` ∈ [0, k) by
    the column's exact (6 dp-rounded) quantile edges at i/k — the
    ML-prep binning step (feature bucketization, calibration bins).
    ``bin = #{edges strictly below the value}``, so ties at an edge
    fall in the LOWER bin deterministically; NULL values get NULL.
    One aggregation for the k−1 edges (single pass — all probs in one
    ``percentile`` call family), one 1-row broadcast attach, then pure
    codegen comparisons. Exact-percentile caveat as
    ``sketch.quantiles``: edges buffer the column once — ungrouped,
    that is one aggregation state; swap in approx edges at true corpus
    scale."""
    if k < 2:
        raise ValueError("quantile_bins: k must be >= 2")
    from pybabe_spark.operators._util import attach_scalars

    out_col = out_col or f"{col}_bin"
    edges = df.agg(
        *[
            F.round(F.percentile(F.col(col), F.lit(i / k)), 6).alias(
                f"__e{i}"
            )
            for i in range(1, k)
        ]
    )
    binned = attach_scalars(df, edges)
    expr = None
    for i in range(1, k):
        term = (F.col(col) > F.col(f"__e{i}")).cast("int")
        expr = term if expr is None else expr + term
    return binned.withColumn(
        out_col, F.when(F.col(col).isNotNull(), expr)
    ).drop(*[f"__e{i}" for i in range(1, k)])


def quantile_bins_sql(
    table: str, col: str, k: int, columns: str = "*",
    out_col: str | None = None,
) -> str:
    """DuckDB oracle of :func:`quantile_bins`."""
    out_col = out_col or f"{col}_bin"
    edges = ", ".join(
        f"ROUND(quantile_cont({col}, {i / k}), 6) AS e{i}"
        for i in range(1, k)
    )
    terms = " + ".join(
        f"CAST({col} > e{i} AS INT)" for i in range(1, k)
    )
    return f"""
    WITH e AS (SELECT {edges} FROM {table})
    SELECT {columns},
           CASE WHEN {col} IS NOT NULL THEN {terms} END AS {out_col}
    FROM {table} CROSS JOIN e
    """


def rank_normalize(
    df: DataFrame,
    col: str,
    by: str | Sequence[str] | None = None,
    tie_col: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Rank-based feature scaling: adds ``{col}_pctile_ppm`` — the
    value's percent-rank within its group as an EXACT integer ppm
    (``(rank−1)·1e6 div (n−1)``; a 1-row group maps to 0). The robust
    normalization for quality scores and curriculum signals: immune to
    outliers and distribution shape, comparable across groups.

    Deterministic under value ties via ``tie_col`` (default: the value
    alone — tied values then share ORDER but not rank, so pass a unique
    tiebreak like the doc id whenever ties are possible; with a unique
    tie_col the output is reproducible on any engine). NULL values get
    NULL rank.

    Scale shape: one key-partitioned rank window + one key count window
    — same pass, no joins. ``by=None`` ranks globally, which funnels
    the corpus through one task and is refused at plan-lint level for
    registry use; prefer a group key.
    """
    keys = (
        [] if by is None else ([by] if isinstance(by, str) else list(by))
    )
    out = out_col or f"{col}_pctile_ppm"
    wall = Window.partitionBy(*keys)
    nn = F.col(col).isNotNull()
    # NULLs are excluded from both rank and n: rank over the non-null
    # subframe via a conditional row_number surrogate — rank among
    # non-nulls = row_number minus the count of leading NULLs, but
    # NULLS FIRST ordering makes that count constant per group
    w_nf = Window.partitionBy(*keys).orderBy(
        *[F.col(col).asc_nulls_first()]
        + ([F.col(tie_col).asc()] if tie_col is not None else [])
    )
    n_null = F.sum((~nn).cast("long")).over(wall)
    n_val = F.sum(nn.cast("long")).over(wall)
    rk = F.row_number().over(w_nf) - n_null
    c_rk = gen_col(df.columns, "__rn_rk")
    c_n = gen_col(df.columns, "__rn_n")
    return (
        df.withColumn(c_rk, rk)
        .withColumn(c_n, n_val)
        .withColumn(
            out,
            F.when(
                nn & (F.col(c_n) > 1),
                F.expr(
                    f"CAST(1000000 AS BIGINT) * ({c_rk} - 1)"
                    f" div ({c_n} - 1)"
                ),
            ).when(nn, F.lit(0).cast("bigint")),
        )
        .drop(c_rk, c_n)
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: int = 20,
    loo: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Smoothed target encoding — the high-cardinality categorical
    feature for tree/linear models: adds ``{cat_col}_te_micro``, the
    category's smoothed mean target in exact integral MICRO-units
    (sign-split ``div`` — engine-identical at any scale):

        te = (Σ_cat target + m · global_mean) / (n_cat + m)

    With ``loo=True`` (the default, and the leakage-safe form for
    training data) each row's OWN target is excluded:
    ``(Σ_cat − xᵢ + m·ḡ) / (n_cat − 1 + m)``. The global-mean prior
    ``ḡ = S/N`` stays a single exact rational — both numerator and
    denominator are carried symbolically, so the whole encoding is ONE
    integral division per row, never a float intermediate:

        ((Σ_cat [− xᵢ]) · N + m · S) · 10⁶ div (N · (n_cat [−1] + m) · 100)

    (cents → micro-units; NULL when the denominator is 0, i.e. a
    singleton category at m = 0, or a NULL category/target — those
    rows keep a NULL encoding for the caller's imputer).

    Scale shape: one map-side-combinable hash agg per category, one
    1-row global agg, a broadcast join back on the category key, then
    pure codegen — no window, no second pass over the data.
    """
    if smoothing < 0:
        raise ValueError("target_encode: smoothing must be >= 0")
    from pybabe_spark.operators._util import attach_scalars, gen_col

    out = out_col or f"{cat_col}_te_micro"
    x = (F.col(target_col).cast("decimal(18,2)") * 100).cast("bigint")
    ok = F.col(cat_col).isNotNull() & F.col(target_col).isNotNull()
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # collision-proof working names: these land on the USER's row-level
    # frame, so fixed "__x" names could shadow (and later drop) real
    # columns — the rank_normalize gen_col discipline
    c_cat = gen_col(df.columns, "__te_cat")
    c_nc = gen_col(df.columns, "__te_nc")
    c_sc = gen_col(df.columns, "__te_sc")
    c_n = gen_col(df.columns, "__te_n")
    c_s = gen_col(df.columns, "__te_s")
    cat = (
        df.filter(ok)
        .groupBy(F.col(cat_col).alias(c_cat))
        .agg(
            F.count(F.lit(1)).alias(c_nc),
            F.sum(d(x)).cast("decimal(38,0)").alias(c_sc),
        )
    )
    tot = df.filter(ok).agg(
        F.count(F.lit(1)).alias(c_n),
        F.coalesce(F.sum(d(x)), F.lit(0)).cast("decimal(38,0)").alias(
            c_s
        ),
    )
    c_x = gen_col(df.columns, "__te_x")
    joined = attach_scalars(
        df.withColumn(c_x, F.when(ok, x)).join(
            F.broadcast(cat), F.col(cat_col) == F.col(c_cat), "left"
        ),
        tot,
    )
    m = int(smoothing)
    if loo:
        num = (
            (F.col(c_sc) - F.col(c_x)) * F.col(c_n)
            + F.lit(m) * F.col(c_s)
        ).cast("decimal(38,0)")
        den = (
            d(F.col(c_n)) * (F.col(c_nc) - 1 + m) * 100
        ).cast("decimal(38,0)")
    else:
        num = (
            F.col(c_sc) * F.col(c_n) + F.lit(m) * F.col(c_s)
        ).cast("decimal(38,0)")
        den = (
            d(F.col(c_n)) * (F.col(c_nc) + m) * 100
        ).cast("decimal(38,0)")
    c_num = gen_col(df.columns, "__te_num")
    c_den = gen_col(df.columns, "__te_den")
    from pybabe_spark.operators.regression import _ppm

    return (
        joined.withColumn(c_num, num)
        .withColumn(c_den, den)
        .withColumn(out, F.when(ok, _ppm(c_num, c_den)))
        .drop(c_cat, c_nc, c_sc, c_n, c_s, c_x, c_num, c_den)
    )


def target_encode_sql(
    table: str,
    cat_col: str,
    target_col: str,
    smoothing: int = 20,
    loo: bool = True,
    columns: str = "*",
    out_col: str | None = None,
) -> str:
    """DuckDB oracle of :func:`target_encode` — same HUGEINT symbolic
    rational, same sign-split integral division."""
    out = out_col or f"{cat_col}_te_micro"
    m = int(smoothing)
    x = f"CAST(CAST({target_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    ok = f"({cat_col} IS NOT NULL AND {target_col} IS NOT NULL)"
    if loo:
        num = f"((sc - {x}) * n + {m} * s)"
        den = f"(CAST(n AS HUGEINT) * (nc - 1 + {m}) * 100)"
    else:
        num = f"(sc * n + {m} * s)"
        den = f"(CAST(n AS HUGEINT) * (nc + {m}) * 100)"
    return f"""
    WITH cat AS (
        SELECT {cat_col} AS cat, COUNT(*) AS nc,
               SUM(CAST({x} AS HUGEINT)) AS sc
        FROM {table} WHERE {ok} GROUP BY {cat_col}
    ),
    tot AS (
        SELECT COUNT(*) AS n,
               COALESCE(SUM(CAST({x} AS HUGEINT)), 0) AS s
        FROM {table} WHERE {ok}
    )
    SELECT {columns},
           CASE WHEN {ok} AND {den} != 0 THEN
             CAST(CASE WHEN ({num} < 0) != ({den} < 0)
                       THEN -1 ELSE 1 END
                  * ((1000000::HUGEINT * ABS({num})) // ABS({den}))
                  AS BIGINT)
           END AS {out}
    FROM {table}
    LEFT JOIN cat ON {cat_col} = cat.cat
    CROSS JOIN tot
    """
