"""PCA over an embedding column: exact distributed covariance +
driver-side eigendecomposition of the tiny d×d matrix.

The scale split mirrors :mod:`pybabe_spark.operators.kmeans`: the
corpus-sized work (second moments over n vectors) is a map-combinable
aggregation producing a BOUNDED d(d+1)/2-entry upper triangle, and only
that d×d matrix — never data — reaches the driver, where ``numpy.eigh``
runs in microseconds. Variance explained by the top components is the
standard pre-ANN dimensionality check (similarity.py's IVF/PQ families
consume reduced vectors well).

Determinism: components lift to exact integer MICRO-units (×10⁶ —
embeddings are unit-scale floats, 6 dp is beyond their float32
resolution) inside the Arrow batches, per-batch Gram partial sums
accumulate in int64 (|x|≤10·10⁶ ⟹ per-pair ≤10¹⁴, safe for ≥10⁴-row
batches), and the cross-partition reduce is an exact DECIMAL(38,0) sum
— so the covariance matrix is an exact integer function of the data,
independent of partitioning and row order. The eigen step is plain
float64 LAPACK on that exact matrix.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: micro-unit lift applied to each embedding component
_SCALE = 1_000_000


def _gram_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-Arrow-batch exact Gram/linear/count partials as
    ``(i, j, q)`` rows: ``j ≥ 0`` → Σ xᵢ·xⱼ (micro² units, upper
    triangle), ``j = −1`` → Σ xᵢ (micro), ``i = −1`` → row count.
    Row volume is bounded by batches × d², never by n."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iu = np.triu_indices(dim)
        for pdf in batches:
            vecs = pdf[vec_col].dropna()
            if not len(vecs):
                continue
            x = np.stack(vecs.to_numpy())
            if x.shape[1] != dim:
                raise ValueError(
                    f"pca: expected dim {dim}, got {x.shape[1]}"
                )
            # half-up lift (floor(x*1e6 + 0.5)) — shared verbatim with
            # the oracle; np.rint's half-to-even would diverge on exact
            # .5 micro boundaries
            xi = np.floor(
                np.asarray(x, dtype=np.float64) * _SCALE + 0.5
            ).astype(np.int64)
            gram = xi.T @ xi  # int64-exact: |entry| <= n_batch * 1e14
            lin = xi.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu[0], np.arange(dim), [-1]]
                    ).astype("int32"),
                    "j": np.concatenate(
                        [iu[1], -np.ones(dim, dtype=int), [-1]]
                    ).astype("int32"),
                    "q": np.concatenate(
                        [gram[iu], lin, [len(xi)]]
                    ).astype("int64"),
                }
            )

    parts = df.select(vec_col).mapInPandas(
        run, schema="i int, j int, q long"
    )
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("q").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("q")
    )


def _cov_matrix(df: DataFrame, vec_col: str, dim: int):
    """Collect the bounded partial table and assemble the EXACT
    unbiased covariance (float64 from exact integer numerators):
    ``cov_ij = (n·Qij − Si·Sj) / (n(n−1)) / 10¹²``. Returns
    ``(n, cov ndarray)``; n < 2 → (n, None)."""
    import numpy as np

    rows = _gram_partials(df, vec_col, dim).collect()
    n = 0
    s = np.zeros(dim, dtype=object)
    q = np.zeros((dim, dim), dtype=object)
    for r in rows:
        i, j, v = r["i"], r["j"], int(r["q"])
        if i == -1:
            n = v
        elif j == -1:
            s[i] = v
        else:
            q[i][j] = v
            q[j][i] = v
    if n < 2:
        return n, None
    cov = np.empty((dim, dim), dtype=np.float64)
    for i in range(dim):
        for j in range(dim):
            cov[i, j] = float(n * q[i][j] - s[i] * s[j]) / (
                n * (n - 1)
            ) / (_SCALE * _SCALE)
    return n, cov


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    top: int = 8,
) -> DataFrame:
    """The top-left ``top × top`` corner of the exact unbiased
    covariance matrix of an embedding column, as rows
    ``(i, j, cov_ppm, cov)`` (upper triangle, i ≤ j) — the
    SQL-oracle-able certificate of the PCA moment machinery:
    ``cov_ppm`` is the exact sign-split integral ppm of
    ``(n·Q_ij − S_i·S_j) / (n(n−1)·10¹²)``, pure integers end to end.

    Scale shape: one Arrow ``mapInPandas`` pass emits per-batch int64
    Gram partials (bounded d² rows per batch), one (i, j) hash agg to
    d(d+1)/2 DECIMAL(38,0) rows, a 1-row count attach, fixed-shape
    ppm finish. Nothing corpus-sized is ever shuffled wider than the
    partial rows.
    """
    if top < 1 or top > dim:
        raise ValueError("embedding_covariance: need 1 <= top <= dim")
    parts = _gram_partials(df, vec_col, dim)
    from pybabe_spark.operators._util import attach_scalars

    # grouping-key-free agg: maxRows = 1, so the scalar attach is
    # provably a 1-row broadcast (plan_lint's BNLJ exemption)
    cnt = parts.agg(
        F.max(
            F.when((F.col("i") == -1) & (F.col("j") == -1), F.col("q"))
        ).alias("__n")
    )
    lin = parts.filter((F.col("j") == -1) & (F.col("i") >= 0)).select(
        F.col("i").alias("__li"), F.col("q").alias("__s")
    )
    quad = parts.filter(
        (F.col("i") >= 0) & (F.col("j") >= 0)
        & (F.col("i") < top) & (F.col("j") < top)
    )
    la = lin.withColumnRenamed("__li", "i").withColumnRenamed(
        "__s", "__si"
    )
    lb = lin.withColumnRenamed("__li", "j").withColumnRenamed(
        "__s", "__sj"
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    joined = attach_scalars(
        quad.join(F.broadcast(la), "i").join(F.broadcast(lb), "j"), cnt
    )
    num = d(
        F.col("__n") * F.col("q") - F.col("__si") * F.col("__sj")
    )
    den = d(
        F.col("__n")
        * (F.col("__n") - 1)
        * F.lit(_SCALE).cast("decimal(38,0)")
        * F.lit(_SCALE)
    )
    joined = joined.withColumn("__num", num).withColumn("__den", den)
    mag = F.expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * abs(__num)) div abs(__den)"
    )
    sign = F.when(
        (F.col("__num") < 0) != (F.col("__den") < 0), F.lit(-1)
    ).otherwise(F.lit(1))
    ppm = F.when(
        (F.col("__n") >= 2) & (F.col("__den") != 0), sign * mag
    ).cast("bigint")
    return joined.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        ppm.alias("cov_ppm"),
        (ppm.cast("double") / 1e6).alias("cov"),
    )


def embedding_covariance_sql(
    table: str,
    vec_col: str = "embedding",
    top: int = 8,
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle of :func:`embedding_covariance` — unnest the
    vectors to (id, i, micro-component) via 1-based list indexing,
    pairwise HUGEINT moments on the top corner, same half-up lift and
    sign-split ppm."""
    return f"""
    WITH comp AS (
        SELECT {id_col} AS rid, CAST(t.i AS INT) AS i,
               CAST(floor(CAST({vec_col}[t.i + 1] AS DOUBLE) * 1000000
                          + 0.5) AS BIGINT) AS x
        FROM {table}, (SELECT unnest(range(len({vec_col}))) AS i) t
        WHERE {vec_col} IS NOT NULL
    ),
    n AS (
        SELECT COUNT(DISTINCT rid)::HUGEINT AS n FROM comp
    ),
    lin AS (
        SELECT i, SUM(CAST(x AS HUGEINT)) AS s FROM comp
        WHERE i < {top} GROUP BY i
    ),
    quad AS (
        SELECT a.i AS i, b.i AS j,
               SUM(CAST(a.x AS HUGEINT) * b.x) AS q
        FROM comp a JOIN comp b
          ON a.rid = b.rid AND a.i <= b.i
        WHERE a.i < {top} AND b.i < {top}
        GROUP BY a.i, b.i
    ),
    t AS (
        SELECT q.i, q.j,
               (n.n * q.q - la.s * lb.s) AS num,
               (n.n * (n.n - 1) * 1000000::HUGEINT * 1000000) AS den,
               n.n AS n
        FROM quad q
        JOIN lin la ON la.i = q.i
        JOIN lin lb ON lb.i = q.j
        CROSS JOIN n
    )
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CASE WHEN n >= 2 AND den <> 0 THEN
             CAST((CASE WHEN (num < 0) <> (den < 0) THEN -1 ELSE 1 END)
               * ((1000000::HUGEINT * abs(num)) // abs(den)) AS BIGINT)
           END AS cov_ppm,
           CAST(CASE WHEN n >= 2 AND den <> 0 THEN
             CAST((CASE WHEN (num < 0) <> (den < 0) THEN -1 ELSE 1 END)
               * ((1000000::HUGEINT * abs(num)) // abs(den)) AS BIGINT)
           END AS DOUBLE) / 1e6 AS cov
    FROM t
    """


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    top_k: int = 8,
) -> DataFrame:
    """PCA spectrum of an embedding column: one row per leading
    component — ``(component, eigenvalue, explained_ppm,
    cum_explained_ppm)`` — the "how many dimensions actually carry
    signal" readout that sizes an IVF/PQ reduction before a 100 TB
    ANN build. Eigenvalues come from ``numpy.linalg.eigh`` on the
    EXACT covariance matrix assembled by the distributed moment pass
    (:func:`_cov_matrix` — only the d×d matrix reaches the driver);
    explained ratios are eigenvalue shares in integral ppm (floored,
    from float64 eigenvalues — the one genuinely non-SQL-expressible
    step, which is why this operator's registry key carries no DuckDB
    oracle and the covariance certificate
    (:func:`embedding_covariance`) is oracle-checked instead).

    Returns an EMPTY frame (stable schema) when n < 2.
    """
    if top_k < 1 or top_k > dim:
        raise ValueError("pca_fit: need 1 <= top_k <= dim")
    import numpy as np

    spark = df.sparkSession
    n, cov = _cov_matrix(df, vec_col, dim)
    schema = (
        "component int, eigenvalue double, explained_ppm bigint,"
        " cum_explained_ppm bigint"
    )
    from pybabe_spark.operators._util import local_rows_df

    if cov is None:
        return local_rows_df(spark, [], schema)
    vals = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(vals.sum())
    rows = []
    cum = 0
    for c in range(top_k):
        ev = float(vals[c])
        ppm = int(ev * 1e6 // total) if total > 0 else None
        cum = (cum + ppm) if ppm is not None else None
        rows.append((c, round(ev, 6), ppm, cum))
    # VALUES-literal LocalRelation — consumer actions skip the
    # ExistingRDD tasklet wave (see _util.local_rows_df)
    return local_rows_df(spark, rows, schema)
