"""Distributed Bloom filter build + bloom-prefiltered EXACT anti-join.

Beyond-reference capability: the scale path for "drop everything we
have already seen" when the seen-key set is huge but the overlap is
small. A shuffle anti-join of a 100 TB batch against a billion-key seen
set moves the whole batch; with a Bloom prefilter only the rows the
filter cannot rule out enter the join — typically the true duplicates
plus an ``fpp`` fraction of false positives — and everything else
passes through WITHOUT A SHUFFLE. The result is still EXACT: Bloom
filters have no false negatives, so misses are provably new, and the
(small) hit set is confirmed by the ordinary anti-join. Spark's own
AQE runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter.*)
covers join pruning inside one query; this operator materializes the
filter as a reusable driver artifact — build once against the corpus,
prefilter many later batches, like the stored MinHash/IVF indexes.

Build is fully distributed and map-side combinable: positions are
computed JVM-side (``xxhash64`` with k seeds — pure codegen), exploded
to (word_index, single-bit word) rows, OR-folded by ``bit_or`` in one
hash aggregation, and only the m/64 words reach the driver. Probe ships
the packed bitset in an Arrow-batched pandas UDF closure and tests all
k bits vectorized in numpy; the k positions are computed JVM-side with
the SAME expressions, so build and probe cannot disagree.

Sizing: m bits for n keys at false-positive rate p needs
m ≈ -n·ln(p)/ln(2)² (1.2 GB of driver memory covers ~10⁹ keys at 1%);
``k ≈ (m/n)·ln 2`` hash functions. The filter is a driver/executor
memory object — the classic broadcast-bloom trade.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed, engine-independent hash seeds (first k are used)
_SEEDS = [
    0x9E3779B1,
    0x85EBCA77,
    0xC2B2AE3D,
    0x27D4EB2F,
    0x165667B1,
    0x1B873593,
    0xCC9E2D51,
    0x38B34AE5,
]


@dataclass
class BloomFilter:
    """Driver-held packed bitset (uint64 words) + parameters.

    ``key_types`` records the build-side key column dtypes: bloom keys
    are hashed from STRING casts, and two Spark types that compare
    equal natively can cast to different strings (double 1.0 vs
    decimal 1.00) — a probe against a differently-typed column would
    silently produce a false negative, breaking the no-false-negative
    contract. Probes assert the probe columns' dtypes match."""

    words: np.ndarray  # dtype uint64, length m_bits // 64
    m_bits: int
    k: int
    key_types: tuple[str, ...] | None = None

    def __post_init__(self):
        if self.k < 1 or self.k > len(_SEEDS):
            raise ValueError(f"bloom: k must be 1..{len(_SEEDS)}")
        if self.m_bits % 64 != 0 or self.m_bits <= 0:
            raise ValueError("bloom: m_bits must be a positive multiple of 64")

    @property
    def nbytes(self) -> int:
        return self.words.nbytes

    def fill_ratio(self) -> float:
        """Fraction of set bits — past ~0.5 the fpp degrades fast;
        rebuild with a larger m_bits."""
        return int(
            np.unpackbits(self.words.view(np.uint8)).sum()
        ) / self.m_bits


def _key_expr(cols: Sequence[str]):
    """Null-safe composite key string: null → a sentinel that cannot
    collide with a real value (mirrors eqNullSafe joins elsewhere)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols
    ]
    return F.concat_ws("\x1f", *parts)


def _positions(cols: Sequence[str], m_bits: int, k: int):
    key = _key_expr(cols)
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(_SEEDS[i])), F.lit(m_bits))
            for i in range(k)
        ]
    )


def build_bloom(
    df: DataFrame,
    cols: str | Sequence[str],
    m_bits: int = 1 << 23,
    k: int = 5,
) -> BloomFilter:
    """Build a Bloom filter over the (composite) key columns. One
    distributed job: codegen position explode → ``bit_or`` hash
    aggregation (map-side combined) → m/64 words collected. This is an
    estimator-style action (like ``kmeans_fit``): the returned object
    is the model, not a plan."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("bloom: m_bits must be a positive multiple of 64")
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    rows = (
        df.select(F.explode(_positions(cols, m_bits, k)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("bigint").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .collect()
    )
    for r in rows:
        words[r["w"]] = np.uint64(np.int64(r["word"]).view(np.uint64))
    types = tuple(dict(df.dtypes)[c] for c in cols)
    return BloomFilter(words=words, m_bits=m_bits, k=k, key_types=types)


def bloom_might_contain(
    df: DataFrame,
    bloom: BloomFilter,
    cols: str | Sequence[str],
    out_col: str = "might_contain",
) -> DataFrame:
    """Add a boolean column: False = PROVABLY not in the built set (no
    false negatives), True = in the set OR a false positive (rate set
    by the build's m/n and k). Positions are computed with the same
    JVM expressions as the build; the bit test is one Arrow-batched
    numpy pass against the closure-shipped bitset."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    if bloom.key_types is not None:
        probe_types = tuple(dict(df.dtypes)[c] for c in cols)
        if probe_types != bloom.key_types:
            raise TypeError(
                "bloom: probe key dtypes "
                f"{probe_types} != build dtypes {bloom.key_types}; "
                "string-cast hashing would diverge on coercible types "
                "(e.g. double 1.0 vs decimal 1.00) and yield silent "
                "false negatives — cast the probe columns to the build "
                "types first"
            )
    words, k = bloom.words, bloom.k

    def _test(batch):
        import pandas as pd

        def one(series: "pd.Series") -> "pd.Series":
            pos = np.vstack(series.to_numpy())  # (rows, k) int64
            w = words[pos >> 6]
            hit = (w >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
            return pd.Series(hit.all(axis=1))

        return one(batch)

    import pandas as pd

    _test.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_test, "boolean")
    return df.withColumn(out_col, udf(_positions(cols, bloom.m_bits, k)))


def dedup_against_bloom(
    df: DataFrame,
    seen: DataFrame,
    keys: str | Sequence[str],
    m_bits: int = 1 << 23,
    k: int = 5,
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """EXACT incremental dedup (same contract as ``merge.dedup_against``
    — drop rows whose key appears in ``seen``) with a Bloom prefilter:

    - bloom MISSES are provably new → pass through, NO join, NO shuffle;
    - bloom HITS (true dups + fpp false positives) go through the exact
      anti-join against ``seen``.

    Pass a prebuilt ``bloom`` to amortize one corpus filter across many
    batches; otherwise one is built from ``seen`` (one aggregation job
    over the key projection — still cheaper than shuffling ``df`` when
    the batch outweighs the key set).

    Precondition (asserted via the filter's recorded ``key_types``):
    ``df`` and ``seen`` key columns must have IDENTICAL dtypes. The
    bloom hashes string casts while the confirming anti-join compares
    natively, so a double/decimal mismatch would otherwise produce a
    bloom false negative that silently keeps a true duplicate."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if bloom is None:
        bloom = build_bloom(seen.select(*keys), keys, m_bits, k)
    from pybabe_spark.operators._util import gen_col

    flag = gen_col(df.columns, "__bloom_hit")
    flagged = bloom_might_contain(df, bloom, keys, flag)
    misses = flagged.filter(~F.col(flag)).drop(flag)
    hits = flagged.filter(F.col(flag)).drop(flag)
    confirmed_new = hits.join(
        seen.select(*keys).distinct(), keys, "left_anti"
    )
    return misses.unionByName(confirmed_new)
