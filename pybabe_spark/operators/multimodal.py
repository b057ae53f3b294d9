"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the 100 TB shape): media lives in a ``binary`` column (or object
store paths) with a sibling metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so the
raw bytes never leave the executor and flow batch-by-batch, bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

Decode kernels are resolved per codec: ``codec='fake'`` runs a
deterministic fake decode (always available — the oracle-checkable
path); image codecs (png/jpeg/...) run through PIL *if it is
importable* — the kernel is resolved on the DRIVER at plan time and
shipped in the UDF closure, so environments without PIL degrade to a
clear ``NotImplementedError`` instead of a worker ImportError; video
frame-sampling beyond the fake kernel would need av/ffmpeg and raises
the same way. Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is identical for every kernel.
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
    # n_frames comes from the first 16 sha256 bits (not crc32) so ANY SQL
    # engine can recompute it — that makes frame sampling exactly
    # oracle-checkable (queries_multimodal.py::multimodal_frame_sample)
    sha16 = F.conv(F.substring(F.sha2(blob, 256), 1, 4), 16, 10).cast("int")
    meta = F.struct(
        (h % 640 + 64).cast("int").alias("width"),
        (h % 480 + 48).cast("int").alias("height"),
        (sha16 % 24 + 1).cast("int").alias("n_frames"),
        F.lit("fake").alias("codec"),
    )
    return df.withColumn(blob_col, blob).withColumn(meta_col, meta)


#: codecs the PIL-backed image kernel accepts
_IMAGE_CODECS = {"png", "jpeg", "jpg", "bmp", "gif", "webp"}


def _png_gray8_decode(blob: bytes):
    """Minimal REAL PNG decoder for 8-bit grayscale, pure stdlib
    (struct + zlib): IHDR parse, IDAT inflate, all five standard
    scanline filters (None/Sub/Up/Average/Paeth). Returns
    ``(ndarray in [0,1], width, height)`` exactly like the PIL
    kernel, or raises ValueError for any PNG outside the supported
    subset (color, palette, interlace, 16-bit) — the PIL slot covers
    those where PIL exists. This is a genuine RFC-2083 decode path,
    not a fake: the zlib inflate and filter reconstruction are the
    actual codec work."""
    import struct
    import zlib

    import numpy as np

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, width, height, idat = 8, None, None, b""
    bit_depth = color_type = interlace = None
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        ctype = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG")
    if (bit_depth, color_type, interlace) != (8, 0, 0):
        raise ValueError(
            "stdlib PNG kernel supports non-interlaced 8-bit grayscale "
            f"only (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) < stride * height:
        raise ValueError("PNG pixel data shorter than geometry")
    out = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    for y in range(height):
        row = raw[y * stride:(y + 1) * stride]
        filt, line = row[0], np.frombuffer(
            row[1:], dtype=np.uint8
        ).astype(np.int32)
        cur = np.zeros(width, dtype=np.int32)
        for x in range(width):
            a = cur[x - 1] if x > 0 else 0
            b = prev[x]
            c = prev[x - 1] if x > 0 else 0
            if filt == 0:
                rec = line[x]
            elif filt == 1:
                rec = line[x] + a
            elif filt == 2:
                rec = line[x] + b
            elif filt == 3:
                rec = line[x] + (a + b) // 2
            elif filt == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                rec = line[x] + (
                    a if pa <= pb and pa <= pc else b if pb <= pc else c
                )
            else:
                raise ValueError(f"unknown PNG filter {filt}")
            cur[x] = rec & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.astype("float64") / 255.0, width, height


def _image_decoder():
    """Build the real image kernel: PIL when importable; otherwise a
    pure-stdlib REAL decoder covering non-interlaced 8-bit grayscale
    PNG (:func:`_png_gray8_decode` — actual zlib inflate + scanline
    unfiltering, the same seam a full codec fills) with resize and
    every other format raising the documented ``_unsupported``.

    Called on the driver when the plan is built; the returned functions
    are shipped to executors inside the mapInPandas closure (pickled by
    value, so a test-injected kernel travels too). ``decode`` →
    (grayscale ndarray in [0,1], width, height); ``resize`` →
    re-encoded bytes at the target size.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        def decode_gray_png(blob: bytes):
            return _png_gray8_decode(bytes(blob))

        def no_resize(blob, tw, th, codec):
            raise _unsupported(codec, "PIL (resize/re-encode)")

        # "codecs" scopes the kernel: only png decodes for real here;
        # jpeg/webp/... still raise the documented _unsupported
        return {
            "decode": decode_gray_png,
            "resize": no_resize,
            "codecs": {"png"},
            "resize_codecs": set(),
        }

    def decode(blob: bytes):
        import io

        import numpy as np
        from PIL import Image

        img = Image.open(io.BytesIO(bytes(blob))).convert("L")
        arr = np.asarray(img, dtype="float64") / 255.0
        return arr, img.size[0], img.size[1]

    def resize(blob: bytes, tw: int, th: int, codec: str) -> bytes:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(bytes(blob)))
        buf = io.BytesIO()
        fmt = {"jpg": "jpeg"}.get(codec, codec).upper()
        img.resize((tw, th)).save(buf, format=fmt)
        return buf.getvalue()

    return {
        "decode": decode,
        "resize": resize,
        "codecs": set(_IMAGE_CODECS),
        "resize_codecs": set(_IMAGE_CODECS),
    }


#: codecs the wave-backed audio kernel accepts (PCM WAV; soundfile /
#: ffmpeg would extend this set through the same seam)
_AUDIO_CODECS = {"wav"}


def _audio_decoder():
    """Build the real audio kernel: PCM WAV through the stdlib ``wave``
    module (always importable, a genuine RIFF/PCM decoder — the same
    seam a soundfile/ffmpeg kernel for compressed codecs would fill).
    Same contract as :func:`_image_decoder`: resolved on the driver,
    shipped to executors inside the mapInPandas closure. ``info`` →
    (framerate, n_frames, bytes_per_frame); ``slice_ms`` → raw PCM
    bytes between millisecond offsets, frame-aligned via real sample
    positions (never mid-sample, which byte arithmetic on a container
    with headers would happily do)."""
    try:
        import wave  # noqa: F401
    except ImportError:  # pragma: no cover - wave is stdlib
        return None

    def info(blob: bytes):
        import io
        import wave

        with wave.open(io.BytesIO(bytes(blob))) as w:
            return (
                w.getframerate(),
                w.getnframes(),
                w.getsampwidth() * w.getnchannels(),
            )

    def slice_ms(blob: bytes, start_ms: int, end_ms: int) -> bytes:
        import io
        import wave

        with wave.open(io.BytesIO(bytes(blob))) as w:
            fr = w.getframerate()
            n = w.getnframes()
            lo = min(int(start_ms * fr // 1000), n)
            hi = min(int(end_ms * fr // 1000), n)
            w.setpos(lo)
            return w.readframes(max(0, hi - lo))

    return {"info": info, "slice_ms": slice_ms}


def _unsupported(codec: str, need: str) -> NotImplementedError:
    return NotImplementedError(
        f"media codec {codec!r} needs {need}, which is not importable in "
        "this environment; the 'fake' codec exercises the identical "
        "mapInPandas plumbing"
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
    Image codecs decode through PIL when available: features are
    ``n_features`` band means of the grayscale pixels, and width/height
    come from the DECODED image (authoritative over metadata).
    """
    id_ddl = df.schema[id_col].dataType.simpleString()
    schema = f"`{id_col}` {id_ddl}, width int, height int, features array<double>"
    kernel = _image_decoder()

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, widths, heights, feats = [], [], [], []
            for rid, blob, meta in zip(pdf[id_col], pdf[blob_col], pdf[meta_col]):
                codec = meta["codec"]
                if codec == "fake":
                    digest = hashlib.sha256(bytes(blob)).digest()
                    feats.append([digest[i] / 255.0 for i in range(n_features)])
                    widths.append(int(meta["width"]))
                    heights.append(int(meta["height"]))
                elif kernel is not None and codec in kernel.get(
                    "codecs", _IMAGE_CODECS
                ):
                    arr, w, h = kernel["decode"](blob)
                    flat = np.ravel(arr)
                    if flat.size < n_features:
                        flat = np.pad(flat, (0, n_features - flat.size))
                    feats.append(
                        [float(b.mean()) for b in np.array_split(flat, n_features)]
                    )
                    widths.append(int(w))
                    heights.append(int(h))
                else:
                    raise _unsupported(
                        codec,
                        "PIL" if codec in _IMAGE_CODECS else "an image/av library",
                    )
                ids.append(rid)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
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
    ratio; image codecs re-encode through PIL when available; metadata
    update is the real contract downstream stages rely on.
    """
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    kernel = _image_decoder()

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            new_blobs, new_meta = [], []
            for blob, meta in zip(pdf[blob_col], pdf[meta_col]):
                codec = meta["codec"]
                if codec == "fake":
                    ratio = (target_width * target_height) / max(
                        meta["width"] * meta["height"], 1
                    )
                    size = max(int(len(blob) * min(ratio, 1.0)), 1)
                    new_blobs.append(bytes(blob)[:size])
                elif kernel is not None and codec in kernel.get(
                    "resize_codecs", _IMAGE_CODECS
                ):
                    new_blobs.append(
                        kernel["resize"](blob, target_width, target_height, codec)
                    )
                else:
                    raise _unsupported(
                        codec,
                        "PIL" if codec in _IMAGE_CODECS else "an image/av library",
                    )
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
    id_ddl = df.schema[id_col].dataType.simpleString()
    schema = f"`{id_col}` {id_ddl}, frame_index int, frame binary"

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            real = pdf[meta_col].map(lambda m: m["codec"])
            real = real[~real.isin(["fake"])]
            if len(real):
                # stills have no frames to sample; video needs av/ffmpeg
                raise _unsupported(real.iloc[0], "av/ffmpeg")
            ids, idxs, frames = [], [], []
            for rid, blob, meta in zip(pdf[id_col], pdf[blob_col], pdf[meta_col]):
                n = max(int(meta["n_frames"]), 1)
                blob = bytes(blob)
                chunk = max(len(blob) // n, 1)
                for fi in range(0, n, every_n):
                    ids.append(rid)
                    idxs.append(fi)
                    frames.append(blob[fi * chunk:(fi + 1) * chunk])
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame": frames})

    return df.mapInPandas(_run, schema=schema)


def chunk_audio(
    df: DataFrame,
    window_s: int,
    overlap_s: int,
    id_col: str,
    blob_col: str = "media",
    meta_col: str = "media_meta",
    bytes_per_second: int = 100,
) -> DataFrame:
    """Audio chunking (long recording → overlapping fixed-duration
    windows): the speech-pipeline primitive (Whisper-style 30 s
    windows with a few seconds of overlap so no utterance is cut at
    every boundary), 1→N through the same Arrow ``mapInPandas``
    plumbing as :func:`sample_frames`. Output:
    ``(id, chunk_index, start_ms, end_ms, chunk binary)``.

    The fake kernel treats the blob as PCM at ``bytes_per_second``
    (duration = len/bps; chunk *i* covers bytes
    ``[i·step·bps, i·step·bps + window·bps)`` while its start lies
    inside the blob) — exactly recomputable in SQL, so the whole
    explosion is oracle-checkable. Codec ``wav`` decodes FOR REAL
    through the stdlib ``wave`` kernel (:func:`_audio_decoder`):
    duration comes from the container's frame count and chunk bytes
    are frame-aligned PCM slices at true sample offsets — the same
    windows as the fake kernel, real geometry. Other codecs raise
    :func:`_unsupported` (soundfile/ffmpeg slot into the same seam).
    Empty/NULL blobs emit no chunks.
    """
    if window_s <= 0 or overlap_s < 0 or overlap_s >= window_s:
        raise ValueError(
            "chunk_audio: need window_s > 0 and 0 <= overlap_s < window_s"
        )
    if bytes_per_second <= 0:
        raise ValueError("chunk_audio: bytes_per_second must be positive")
    step_s = window_s - overlap_s
    id_ddl = df.schema[id_col].dataType.simpleString()
    schema = (
        f"`{id_col}` {id_ddl}, chunk_index int, start_ms bigint,"
        " end_ms bigint, chunk binary"
    )
    bps = int(bytes_per_second)
    bwin = window_s * bps
    bstep = step_s * bps
    kernel = _audio_decoder()

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            real = pdf[meta_col].map(lambda m: m["codec"])
            real = real[~real.isin(["fake"])]
            if kernel is not None:
                real = real[~real.isin(sorted(_AUDIO_CODECS))]
            if len(real):
                raise _unsupported(real.iloc[0], "soundfile/ffmpeg")
            ids, idxs, starts, ends, chunks = [], [], [], [], []
            for rid, blob, meta in zip(
                pdf[id_col], pdf[blob_col], pdf[meta_col]
            ):
                if blob is None:
                    continue
                blob = bytes(blob)
                if meta["codec"] in _AUDIO_CODECS:
                    fr, n_frames, _bpf = kernel["info"](blob)
                    dur_ms = n_frames * 1000 // fr
                    i = 0
                    while i * step_s * 1000 < dur_ms:
                        start_ms = i * step_s * 1000
                        end_ms = min(start_ms + window_s * 1000, dur_ms)
                        ids.append(rid)
                        idxs.append(i)
                        starts.append(start_ms)
                        ends.append(end_ms)
                        chunks.append(
                            kernel["slice_ms"](blob, start_ms, end_ms)
                        )
                        i += 1
                    continue
                tb = len(blob)
                dur_ms = tb * 1000 // bps
                i = 0
                while i * bstep < tb:
                    start_ms = i * step_s * 1000
                    ids.append(rid)
                    idxs.append(i)
                    starts.append(start_ms)
                    ends.append(min(start_ms + window_s * 1000, dur_ms))
                    chunks.append(blob[i * bstep:i * bstep + bwin])
                    i += 1
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_index": idxs,
                    "start_ms": starts,
                    "end_ms": ends,
                    "chunk": chunks,
                }
            )

    return df.mapInPandas(_run, schema=schema)
