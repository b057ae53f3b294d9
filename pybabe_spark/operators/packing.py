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
    text_col: str | None = None,
    tokenizer=None,
) -> DataFrame:
    """Next-fit greedy packing: (id, bucket, pack_id).

    Documents are hash-bucketed by ``id_col`` (deterministic — see
    sampling.hash_bucket), ordered by id within the bucket, and packed
    greedily: a document joins the current pack unless that would push
    the pack's token sum past ``budget``, in which case it starts the
    next pack. A single oversized document (> budget) gets its own
    pack. ``pack_id`` is local to the bucket; (bucket, pack_id) is the
    global pack key.

    Token counts come from ``tokens_col`` (precomputed, the default) or
    — when ``text_col`` is given — are derived in the same plan via
    :func:`pybabe_spark.functions.text.token_count`, with an optional
    real ``tokenizer`` (Arrow-batched seam, see ``resolve_tokenizer``).
    The heuristic default keeps the oracle-checked path byte-identical.
    """
    if text_col is not None:
        from pybabe_spark.functions.text import token_count

        df = df.select(
            *[c for c in df.columns if c != tokens_col],
            token_count(text_col, tokenizer).alias(tokens_col),
        )
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


def pack_contiguous(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 32,
    text_col: str | None = None,
    tokenizer=None,
) -> DataFrame:
    """GPT-style contiguous packing: concatenate documents (in id order,
    within each deterministic hash bucket) into one token stream and cut
    it into fixed ``budget``-token training sequences — documents MAY
    span a cut (the standard pre-training "concat and chunk" regime,
    complementing :func:`pack_tokens`' whole-document next-fit).

    Returns per document: (id, bucket, start_off, end_off, first_seq,
    last_seq, spans_cut) where offsets index the bucket's token stream,
    ``first_seq``/``last_seq`` are the budget-window ids the document's
    tokens land in, and ``spans_cut`` marks boundary-crossing docs.
    Zero-token documents occupy no stream positions
    (start_off == end_off, first_seq == last_seq at the cursor).

    Scale shape: ONE window — a per-bucket running sum ordered by id —
    then pure arithmetic. Partitioned by bucket, so no single-task
    funnel; (bucket, seq) is the global sequence key, reproducible
    across runs/retries like pack_tokens' (bucket, pack_id). Token
    counts come from ``tokens_col`` or in-plan via ``text_col`` (+
    optional real ``tokenizer`` through the Arrow-batched seam).
    """
    from pyspark.sql import Window

    if text_col is not None:
        from pybabe_spark.functions.text import token_count

        df = df.select(
            *[c for c in df.columns if c != tokens_col],
            token_count(text_col, tokenizer).alias(tokens_col),
        )
    work = df.select(
        F.col(id_col),
        F.coalesce(F.col(tokens_col).cast("bigint"), F.lit(0)).alias("__t"),
        F.pmod(_key_bucket(df, id_col), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum("__t").over(w)
    start = end - F.col("__t")
    offs = work.select(
        id_col,
        "bucket",
        F.col("__t"),
        start.alias("start_off"),
        end.alias("end_off"),
    )
    # integer `div`, never floor(double /): offsets are bigint token
    # positions that exceed double's 2^53 exact range at real scale
    first_seq = F.expr(f"start_off div {budget}")
    # the last token sits at end_off-1; empty docs pin to the cursor
    last_seq = F.when(
        F.col("__t") > 0, F.expr(f"(end_off - 1) div {budget}")
    ).otherwise(first_seq)
    return offs.select(
        id_col,
        "bucket",
        "start_off",
        "end_off",
        first_seq.cast("bigint").alias("first_seq"),
        last_seq.cast("bigint").alias("last_seq"),
        (last_seq > first_seq).alias("spans_cut"),
    )


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
    tokenizer=None,
) -> DataFrame:
    """Token-budget truncation ahead of packing/training: keep at most
    ``max_words`` words per document — ``head`` the first, ``tail`` the
    last, ``middle`` the first ⌈max/2⌉ plus the last ⌊max/2⌋ (the
    head+tail clip long-context pipelines use so both the opening and
    the conclusion survive). Returns (id, text, n_words, clipped) with
    the ORIGINAL word count; NULL text behaves like ''.

    Pure codegen array slicing — narrow map, zero shuffle, no Python.

    With a ``tokenizer`` (see ``functions.text.resolve_tokenizer``) the
    budget is measured in REAL tokenizer tokens instead of words and the
    clip runs as an Arrow-batched ``mapInPandas`` stage returning
    (id, text, n_tokens, clipped) — ``n_tokens`` is the ORIGINAL count,
    mirroring the default path's ``n_words``. When the tokenizer has
    ``.decode`` the cut is an exact token-slice (encode → slice →
    decode; ``middle`` decodes head and tail separately and joins with
    a single space). Without ``.decode`` the cut falls back to word
    boundaries: the largest prefix/suffix of words whose summed
    per-word token cost fits the budget — never splitting a word,
    possibly keeping fewer than budget tokens (documented
    approximation; per-word costs ignore cross-space merges).
    """
    if max_words < 1:
        raise ValueError(f"clip_documents: max_words {max_words} < 1")
    if mode not in ("head", "tail", "middle"):
        raise ValueError(f"clip_documents: unknown mode {mode!r}")
    if tokenizer is not None:
        return _clip_tokenized(df, max_words, mode, id_col, text_col, tokenizer)
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


def _fit_prefix(costs: list, budget: int) -> int:
    """Length of the largest prefix with summed cost <= budget."""
    acc = 0
    for i, c in enumerate(costs):
        acc += c
        if acc > budget:
            return i
    return len(costs)


def _clip_tokenized(
    df: DataFrame,
    budget: int,
    mode: str,
    id_col: str,
    text_col: str,
    tokenizer,
) -> DataFrame:
    """Tokenizer-budget clip (see :func:`clip_documents`): Arrow-batched
    ``mapInPandas`` over (id, text) only — the kernel is resolved on the
    driver and shipped in the closure (multimodal._image_decoder seam).
    """
    from pybabe_spark.functions.text import resolve_tokenizer

    tok = resolve_tokenizer(tokenizer)
    encode, decode = tok["encode"], tok["decode"]
    id_ddl = df.schema[id_col].dataType.simpleString()
    schema = (
        f"`{id_col}` {id_ddl}, `{text_col}` string, "
        "n_tokens bigint, clipped boolean"
    )
    h = (budget + 1) // 2
    t = budget - h

    def _clip_one(text: str) -> tuple[str, int, bool]:
        toks = encode(text)
        n = len(toks)
        if n <= budget:
            return text, n, False
        if decode is not None:
            toks = list(toks)
            if mode == "head":
                new = decode(toks[:budget])
            elif mode == "tail":
                new = decode(toks[n - budget:])
            else:
                new = decode(toks[:h]) + (
                    " " + decode(toks[n - t:]) if t else ""
                )
            return new, n, True
        words = text.split(" ")
        costs = [len(encode(w)) for w in words]
        if mode == "head":
            keep = words[: _fit_prefix(costs, budget)]
        elif mode == "tail":
            keep = words[len(words) - _fit_prefix(costs[::-1], budget):]
        else:
            hd = _fit_prefix(costs, h)
            tl = _fit_prefix(costs[::-1], t)
            # never overlap the two halves on short-but-costly docs
            tl = min(tl, len(words) - hd)
            keep = words[:hd] + words[len(words) - tl:] if tl else words[:hd]
        return " ".join(keep), n, True

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("")
            new_text: list[str] = []
            n_tokens: list[int] = []
            clipped: list[bool] = []
            for txt in texts:
                s, n, c = _clip_one(txt)
                new_text.append(s)
                n_tokens.append(n)
                clipped.append(c)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    text_col: new_text,
                    "n_tokens": pd.Series(
                        n_tokens, dtype="int64", index=pdf.index
                    ),
                    "clipped": clipped,
                }
            )

    return df.select(id_col, text_col).mapInPandas(_run, schema=schema)
