"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the 100 TB shape): media lives in a ``binary`` column (or object
store paths) with a sibling metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so the
raw bytes never leave the executor and flow batch-by-batch, bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

The decode kernels themselves are STUBBED in this environment (no
PIL/ffmpeg in the container): ``codec='fake'`` runs a deterministic fake
decode so the Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and tested; any other codec raises
``NotImplementedError`` at the point a real library would be called.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct carried next to every media blob
MEDIA_META_DDL = "width int, height int, n_frames int, codec string"


def attach_fake_media(
    df: DataFrame, source_col: str, blob_col: str = "media", meta_col: str = "media_meta"
) -> DataFrame:
    """Synthesize a deterministic binary media column from a string column.

    Stands in for reading real media files (at scale:
    ``spark.read.format('binaryFile')`` or pointers into object storage).
    Width/height derive from the content hash so every downstream stage
    has real varying values to chew on.
    """
    blob = F.encode(F.col(source_col), "UTF-8")
    h = F.crc32(blob)
    meta = F.struct(
        (h % 640 + 64).cast("int").alias("width"),
        (h % 480 + 48).cast("int").alias("height"),
        (h % 24 + 1).cast("int").alias("n_frames"),
        F.lit("fake").alias("codec"),
    )
    return df.withColumn(blob_col, blob).withColumn(meta_col, meta)


def _require_fake(codec_series: pd.Series) -> None:
    real = codec_series[~codec_series.isin(["fake"])]
    if len(real):
        raise NotImplementedError(
            f"real media decode ({real.iloc[0]!r}) needs an image/av library "
            "not present in this environment; plumbing supports it via the "
            "same mapInPandas path"
        )


def decode_features(
    df: DataFrame,
    id_col: str,
    blob_col: str = "media",
    meta_col: str = "media_meta",
    n_features: int = 8,
) -> DataFrame:
    """Decode + feature-extract: blob → fixed-width float feature vector.

    Output schema: (id, width, height, features array<double>). The fake
    kernel derives features from the blob's sha256 — deterministic,
    content-sensitive, and shaped exactly like a real embedding stage.
    """
    schema = f"`{id_col}` bigint, width int, height int, features array<double>"

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _require_fake(pdf[meta_col].map(lambda m: m["codec"]))
            feats = []
            for blob in pdf[blob_col]:
                digest = hashlib.sha256(bytes(blob)).digest()
                feats.append([digest[i] / 255.0 for i in range(n_features)])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": pdf[meta_col].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf[meta_col].map(lambda m: m["height"]).astype("int32"),
                    "features": feats,
                }
            )

    return df.mapInPandas(_run, schema=schema)


def resize_media(
    df: DataFrame,
    target_width: int,
    target_height: int,
    blob_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Resize stage: new blob + updated metadata.

    Fake kernel truncates/pads bytes proportionally to the pixel-count
    ratio (a real kernel calls PIL/libvips here); metadata update is the
    real contract downstream stages rely on.
    """
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _require_fake(pdf[meta_col].map(lambda m: m["codec"]))
            out = pdf.copy()
            new_blobs, new_meta = [], []
            for blob, meta in zip(pdf[blob_col], pdf[meta_col]):
                ratio = (target_width * target_height) / max(meta["width"] * meta["height"], 1)
                size = max(int(len(blob) * min(ratio, 1.0)), 1)
                new_blobs.append(bytes(blob)[:size])
                new_meta.append(
                    {
                        "width": target_width,
                        "height": target_height,
                        "n_frames": meta["n_frames"],
                        "codec": meta["codec"],
                    }
                )
            out[blob_col] = new_blobs
            out[meta_col] = new_meta
            yield out

    return df.mapInPandas(_run, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n: int,
    id_col: str,
    blob_col: str = "media",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Frame sampling (video → rows of frames): 1→N explode through
    mapInPandas. Output: (id, frame_index, frame binary).

    The fake kernel slices the blob into n_frames chunks and keeps every
    ``every_n``-th; a real kernel seeks keyframes via av/ffmpeg.
    """
    schema = f"`{id_col}` bigint, frame_index int, frame binary"

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _require_fake(pdf[meta_col].map(lambda m: m["codec"]))
            ids, idxs, frames = [], [], []
            for rid, blob, meta in zip(pdf[id_col], pdf[blob_col], pdf[meta_col]):
                n = max(int(meta["n_frames"]), 1)
                blob = bytes(blob)
                chunk = max(len(blob) // n, 1)
                for fi in range(0, n, every_n):
                    ids.append(int(rid))
                    idxs.append(fi)
                    frames.append(blob[fi * chunk:(fi + 1) * chunk])
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame": frames})

    return df.mapInPandas(_run, schema=schema)
