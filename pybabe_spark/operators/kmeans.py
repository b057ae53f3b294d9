"""Distributed Lloyd k-means over an embedding column.

The clustering counterpart of the curation stack: SemDeDup cells,
IVF coarse quantizers, and cluster-balanced corpus sampling all start
from "partition the embedding space into k cells". `similarity.py`'s
internal `_ivf_centroids` fits on a bounded driver-side SAMPLE (the
right trade for an ANN coarse quantizer); this module is the
full-corpus distributed fit for when cluster quality is the product,
not an index detail — e.g. cluster-then-rebalance pipelines
(``kmeans_assign`` → ``sampling.temperature_resample(group_col="cell")``).

Scale shape: assignment is one Arrow-batched linear pass (the k × dim
centroid matrix ships in the UDF closure — kilobytes); the centroid
update is a posexplode to (cell, pos, component) rows aggregated by
(cell, pos) — map-side combinable, so the shuffle is k × dim rows per
partition regardless of corpus size; the k × dim result collects to the
driver each round (the Lloyd synchronization barrier, unavoidable and
tiny). Per iteration: one pass, one shuffle. Iterations are bounded by
``iters`` — no convergence polling over the corpus.

Determinism: init is the ``k`` lowest-id vectors (TakeOrdered — no full
sort), assignment breaks distance ties toward the lowest cell index
(``np.argmin`` first-minimum), and the update's mean is computed from
exact per-(cell, pos) sums — the whole fit is a reproducible function
of the data, no RNG. Cross-engine, the fit is certified (not replayed):
the registry key checks in-plan that every row sits in (numerically)
its nearest centroid's cell and that final inertia improved on the
init — the boolean-certificate pattern of the IVF recall oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pybabe_spark.operators._util import gen_col


def _assign_udf(C: "np.ndarray"):
    """Arrow-batched nearest-centroid (squared Euclidean) assignment;
    ties break to the lowest cell index (np.argmin first-minimum)."""

    def assign(vecs: pd.Series) -> pd.Series:
        X = np.asarray(vecs.tolist(), dtype="float64")
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 is constant
        # per row so the argmin needs only the cross and centroid terms
        d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        return pd.Series(d.argmin(axis=1).astype("int32"))

    assign.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    return pandas_udf(assign, "int")


def kmeans_assign(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """``df`` + ``out_col``: the index of the nearest centroid (squared
    Euclidean, lowest-index tiebreak). One linear Arrow pass, no
    shuffle."""
    C = np.asarray(centroids, dtype="float64")
    if C.ndim != 2 or len(C) == 0:
        raise ValueError("kmeans_assign: centroids must be a non-empty 2-D array")
    return df.withColumn(out_col, _assign_udf(C)(F.col(vec_col)))


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Fit ``k`` centroids by ``iters`` full-corpus Lloyd rounds;
    returns the k × dim centroid matrix (driver-side, kilobytes).

    Init = the ``k`` lowest-``id_col`` vectors. Empty cells keep their
    previous centroid (the deterministic no-reseed policy). Each round
    runs one assignment pass + one (cell, pos) aggregation; cost is
    ``iters`` linear passes over the corpus.
    """
    if k < 1:
        raise ValueError(f"kmeans_fit: k {k} must be >= 1")
    if iters < 0:
        raise ValueError(f"kmeans_fit: iters {iters} must be >= 0")
    seed_rows = (
        corpus.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(k).collect()
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"kmeans_fit: corpus has {len(seed_rows)} rows < k={k}"
        )
    C = np.asarray([r[vec_col] for r in seed_rows], dtype="float64")
    cell = gen_col(corpus.columns, "__cell")
    for _ in range(iters):
        assigned = kmeans_assign(corpus, C, vec_col=vec_col, out_col=cell)
        stats = (
            assigned.select(cell, F.posexplode(F.col(vec_col)).alias("__p", "__x"))
            .groupBy(cell, "__p")
            .agg(F.sum("__x").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        nxt = C.copy()
        sums = np.zeros_like(C)
        counts = np.zeros(len(C), dtype="int64")
        for r in stats:
            sums[r[cell]][r["__p"]] = r["__s"]
            counts[r[cell]] = r["__n"]
        occupied = counts > 0
        nxt[occupied] = sums[occupied] / counts[occupied, None]
        C = nxt
    return C


def kmeans_distances(
    df: DataFrame, centroids, vec_col: str = "embedding"
) -> DataFrame:
    """``df`` + ``__dists``: array of squared Euclidean distances to
    every centroid, computed as PURE JVM expressions (zip_with +
    aggregate fold, no Python) — the independent second path the
    certificate checks the Arrow assignment against."""
    C = np.asarray(centroids, dtype="float64")
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in row]),
                    lambda x, c: (x - c) * (x - c),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for row in C
        ]
    )
    return df.withColumn("__dists", dists)
