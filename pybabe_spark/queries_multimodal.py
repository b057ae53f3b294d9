"""Multimodal-pipeline queries: the binary-column plumbing as first-class
driver-contract entries.

The decode kernel is the deterministic fake (operators/multimodal.py):
blob = UTF-8 bytes of ``text``, features = sha256(blob) bytes scaled to
[0, 1]. That makes the feature stage **oracle-checkable** — DuckDB
computes the identical sha256 hex and the per-byte scaling is exact IEEE
division — so the whole mapInPandas path (Arrow batches, schema, typed
metadata struct) is verified end-to-end, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pybabe_spark.operators.multimodal import (
    attach_fake_media,
    decode_features,
    sample_frames,
)
from pybabe_spark.queries import register
from pybabe_spark.sources.io import read_table

_N_FEATURES = 8

#: hex pair (chars 2i+1, 2i+2 of sha256 hex) → byte value / 255.0
_HEXV = "(instr('0123456789abcdef', substr(sha256(text), {pos}, 1)) - 1)"


def _feature_sql(i: int) -> str:
    hi = _HEXV.format(pos=2 * i + 1)
    lo = _HEXV.format(pos=2 * i + 2)
    return f"CAST(16 * {hi} + {lo} AS DOUBLE) / 255.0 AS f{i}"


@register(
    "multimodal_decode_features",
    "SELECT doc_id, "
    + ", ".join(_feature_sql(i) for i in range(_N_FEATURES))
    + " FROM documents WHERE doc_id < 2000",
)
def q_multimodal_decode(spark, sf_dir):
    """documents → fake media blobs → Arrow-batched decode_features."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    media = attach_fake_media(docs, "text")
    feats = decode_features(media, "doc_id", n_features=_N_FEATURES)
    return feats.select(
        "doc_id",
        *[F.col("features")[i].alias(f"f{i}") for i in range(_N_FEATURES)],
    )


# Frame sampling is 1→N over blob chunks. n_frames derives from the first
# 16 sha256 bits of the blob (attach_fake_media), so the whole explosion is
# exactly recomputable in SQL: chunk = max(len // n_frames, 1), indices
# 0, every_n, ... < n_frames, and each frame's byte length is the Python
# slice length max(0, min((fi+1)*chunk, len) - fi*chunk).
@register(
    "multimodal_frame_sample",
    """
    WITH d AS (
      SELECT doc_id,
             octet_length(encode(text)) AS len,
             (('0x' || substr(sha256(text), 1, 4))::INT % 24) + 1 AS n
      FROM documents WHERE doc_id < 500
    ),
    c AS (SELECT doc_id, len, n, GREATEST(len // n, 1) AS chunk FROM d),
    e AS (SELECT doc_id, len, chunk,
                 unnest(range(0, n, 3)) AS fi
          FROM c)
    SELECT doc_id,
           CAST(fi AS INT) AS frame_index,
           CAST(GREATEST(LEAST((fi + 1) * chunk, len) - fi * chunk, 0) AS INT)
               AS frame_bytes
    FROM e
    """,
)
def q_multimodal_frames(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    media = attach_fake_media(docs, "text")
    return sample_frames(media, every_n=3, id_col="doc_id").select(
        "doc_id", "frame_index", F.length("frame").alias("frame_bytes")
    )


def _mm_fp_sql() -> str:
    """16-bit fingerprint from the fake decode's sha256-byte features:
    bit i set iff feature_i > 0.5 — the same bytes, the same /255.0
    IEEE division, the same comparison as the engine kernel."""
    bits = " + ".join(
        f"(CASE WHEN CAST(16 * {_HEXV.format(pos=2 * i + 1)} + "
        f"{_HEXV.format(pos=2 * i + 2)} AS DOUBLE) / 255.0 > 0.5 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(16)
    )
    return f"CAST({bits} AS BIGINT)"


@register(
    "multimodal_neardup_media",
    f"""
    WITH fp AS (
        SELECT doc_id, {_mm_fp_sql()} AS f
        FROM documents WHERE doc_id < 2000
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= 2
    """,
)
def q_multimodal_neardup(spark, sf_dir):
    """Perceptual-hash near-dup over the MEDIA column: fake decode →
    16-bit feature-sign fingerprint → hamming_neardup_pairs (band
    pigeonhole + bit_count confirm, operators/dedup_scale.py). The
    image-dedup pipeline shape — swap the fake kernel for PIL pHash
    and nothing downstream changes; the oracle replays the sha256
    feature bytes and brute-forces the pairs."""
    from pybabe_spark.operators.dedup_scale import hamming_neardup_pairs

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 2000
    )
    media = attach_fake_media(docs, "text")
    feats = decode_features(media, "doc_id", n_features=16)
    fp = feats.select(
        "doc_id",
        F.expr(
            " + ".join(
                f"(CASE WHEN features[{i}] > 0.5D THEN {1 << i} ELSE 0 END)"
                for i in range(16)
            )
        ).cast("bigint").alias("fp"),
    )
    return hamming_neardup_pairs(fp, "doc_id", "fp", bits=16, max_hamming=2)


# Audio chunking is 1→N over byte windows: with the fake PCM kernel at
# bytes_per_second=100, chunk i of a len-L blob exists while i·step·100
# < L, spans ms [i·step·1000, min(i·step·1000 + window·1000, L·1000//100)]
# and carries min(L − i·step·100, window·100) bytes — all exactly
# recomputable in SQL.
@register(
    "multimodal_audio_chunks",
    """
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS len
      FROM documents WHERE doc_id < 500 AND text IS NOT NULL
    ),
    e AS (
      SELECT doc_id, len,
             unnest(range(0, (len + 999) // 1000)) AS i
      FROM d WHERE len > 0
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_index,
           CAST(i * 10000 AS BIGINT) AS start_ms,
           CAST(LEAST(i * 10000 + 30000, len * 1000 // 100) AS BIGINT)
               AS end_ms,
           CAST(LEAST(len - i * 1000, 3000) AS INT) AS chunk_bytes
    FROM e WHERE i * 1000 < len
    """,
)
def q_multimodal_audio(spark, sf_dir):
    """documents → fake PCM blobs → overlapping 30 s / 20 s-overlap
    audio windows (operators/multimodal.py::chunk_audio, step 10 s at
    100 bytes/s): the Whisper-style chunking primitive through the
    Arrow mapInPandas plumbing, exploded 1→N with exact byte/ms
    bookkeeping the oracle replays."""
    docs = read_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 500) & F.col("text").isNotNull()
    )
    media = attach_fake_media(docs, "text")
    from pybabe_spark.operators.multimodal import chunk_audio

    chunks = chunk_audio(
        media, window_s=30, overlap_s=20, id_col="doc_id",
        bytes_per_second=100,
    )
    return chunks.select(
        "doc_id",
        "chunk_index",
        "start_ms",
        "end_ms",
        F.length("chunk").cast("int").alias("chunk_bytes"),
    )
