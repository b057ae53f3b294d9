"""Sequence packing & document chunking for training-data pipelines.

Beyond-reference (the reference has no notion of token budgets; its
closest primitive is row ``split``, pybabe/transform.py:229-252). Both
operators prepare documents for fixed-context training:

- :func:`pack_tokens` — next-fit greedy bin packing: assign whole
  documents to training sequences ("packs") so each pack's token total
  stays within the context budget. Sequential by nature, so it runs as
  an Arrow-batched ``applyInPandas`` per deterministic hash bucket —
  the custom-stateful-operator escape hatch, used exactly where Spark's
  declarative operators genuinely cannot express the semantics. The
  DuckDB oracle replays the same recurrence as a recursive CTE.
- :func:`chunk_documents` — fixed-size overlapping word windows
  (stride = chunk - overlap): pure codegen ``sequence`` + ``explode``,
  linear, shuffle-free — the declarative path.

100 TB shape: packing state is one (acc, pack) pair per bucket — the
bucket count bounds parallelism AND recursion state; buckets are
deterministic (sampling.hash_bucket), so packs are reproducible across
runs/retries. Chunking is a narrow map. Neither touches the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pybabe_spark.operators.sampling import _key_bucket


def pack_tokens(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 32,
) -> DataFrame:
    """Next-fit greedy packing: (id, bucket, pack_id).

    Documents are hash-bucketed by ``id_col`` (deterministic — see
    sampling.hash_bucket), ordered by id within the bucket, and packed
    greedily: a document joins the current pack unless that would push
    the pack's token sum past ``budget``, in which case it starts the
    next pack. A single oversized document (> budget) gets its own
    pack. ``pack_id`` is local to the bucket; (bucket, pack_id) is the
    global pack key.
    """
    work = df.select(
        F.col(id_col),
        # NULL token counts pack as 0 (Arrow would deliver a nullable
        # bigint as float64+NaN and crash int() inside the executor)
        F.coalesce(F.col(tokens_col).cast("bigint"), F.lit(0)).alias("__t"),
        F.pmod(_key_bucket(df, id_col), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )
    # id field keeps the input's type (string/UUID ids are common in real
    # corpora — the schema must not assume bigint)
    id_ddl = work.schema[id_col].dataType.simpleString()
    schema = f"`{id_col}` {id_ddl}, bucket int, pack_id bigint"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        packs = []
        acc = 0
        pack = -1
        for t in pdf["__t"]:
            t = int(t)
            if pack < 0 or acc + t > budget:
                pack += 1
                acc = t
            else:
                acc += t
            packs.append(pack)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "bucket": pdf["bucket"].astype("int32"),
                "pack_id": pd.Series(packs, dtype="int64", index=pdf.index),
            }
        )

    return work.groupBy("bucket").applyInPandas(_pack, schema=schema)


def chunk_documents(
    df: DataFrame,
    chunk_words: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping fixed-size word windows:
    (id, chunk_index, chunk_text, n_words).

    Chunk i covers words [i*stride, i*stride + chunk_words) with
    stride = chunk_words - overlap; starts run 0, stride, 2*stride, ...
    while start < max(n_words - overlap, 1) — so every word is covered,
    the final partial chunk is kept, and an empty/short document yields
    exactly one chunk. Pure ``sequence``/``slice`` codegen + one
    explode: linear, shuffle-free, engine-portable.
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError("chunk_documents: need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    # NULL text chunks as the empty document (one empty chunk) rather
    # than vanishing into concat_ws(null) half-way through the plan
    w = F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1)
    n = F.size("__w")
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - F.lit(overlap) - F.lit(1), F.lit(0)),
        F.lit(stride),
    )
    chunks = df.select(
        F.col(id_col), w.alias("__w")
    ).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.concat_ws(
                    " ", F.slice(F.col("__w"), s + 1, chunk_words)
                ),
            )
        ).alias("chunk_index", "chunk_text"),
    )
    return chunks.withColumn(
        "n_words",
        # split('', ' ') is [''] (size 1) — an empty chunk has 0 words
        F.when(F.length("chunk_text") == 0, F.lit(0)).otherwise(
            F.size(F.split(F.col("chunk_text"), " ", -1))
        ),
    )


def clip_documents(
    df: DataFrame,
    max_words: int,
    mode: str = "head",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget truncation ahead of packing/training: keep at most
    ``max_words`` words per document — ``head`` the first, ``tail`` the
    last, ``middle`` the first ⌈max/2⌉ plus the last ⌊max/2⌋ (the
    head+tail clip long-context pipelines use so both the opening and
    the conclusion survive). Returns (id, text, n_words, clipped) with
    the ORIGINAL word count; NULL text behaves like ''.

    Pure codegen array slicing — narrow map, zero shuffle, no Python.
    """
    if max_words < 1:
        raise ValueError(f"clip_documents: max_words {max_words} < 1")
    ws = F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1)
    n = F.size(ws)
    if mode == "head":
        clip = F.slice(ws, 1, max_words)
    elif mode == "tail":
        clip = F.slice(ws, n - F.lit(max_words) + 1, max_words)
    elif mode == "middle":
        h = (max_words + 1) // 2
        t = max_words - h
        clip = F.concat(
            F.slice(ws, 1, h),
            F.slice(ws, n - F.lit(t) + 1, t) if t else F.array().cast(
                "array<string>"
            ),
        )
    else:
        raise ValueError(f"clip_documents: unknown mode {mode!r}")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col),
        F.when(n <= max_words, txt)
        .otherwise(F.array_join(clip, " "))
        .alias(text_col),
        # split('') is [''] — an empty doc has 0 words, not 1 (the same
        # correction chunk_documents makes)
        F.when(txt == "", F.lit(0)).otherwise(n).alias("n_words"),
        (n > max_words).alias("clipped"),
    )
