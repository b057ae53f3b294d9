"""Multimodal plumbing: schema, batching, determinism of the media stages
(fake decode kernel; real kernels are gated behind NotImplementedError)."""

import pytest

from pybabe_spark.operators.multimodal import (
    attach_fake_media,
    decode_features,
    resize_media,
    sample_frames,
)
from pybabe_spark.sources.io import read_table


@pytest.fixture(scope="module")
def media_df(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(50)
    return attach_fake_media(docs, "text").cache()


def test_attach_schema(media_df):
    dt = dict(media_df.dtypes)
    assert dt["media"] == "binary"
    assert dt["media_meta"].startswith("struct<width:int,height:int,n_frames:int")


def test_decode_features_deterministic(media_df):
    out = decode_features(media_df, "doc_id", n_features=8)
    rows1 = {r["doc_id"]: r["features"] for r in out.collect()}
    rows2 = {r["doc_id"]: r["features"] for r in out.collect()}
    assert rows1 == rows2 and len(rows1) == 50
    assert all(len(v) == 8 and all(0 <= x <= 1 for x in v) for v in rows1.values())


def test_resize_updates_meta(media_df):
    out = resize_media(media_df, 128, 96)
    metas = out.select("media_meta").limit(5).collect()
    assert all(m["media_meta"]["width"] == 128 and m["media_meta"]["height"] == 96 for m in metas)
    # schema unchanged
    assert out.columns == media_df.columns


def test_sample_frames_explodes(media_df):
    frames = sample_frames(media_df, every_n=2, id_col="doc_id")
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"doc_id", "frame_index", "frame"}
    assert (pdf["frame_index"] % 2 == 0).all()
    assert pdf.groupby("doc_id").size().min() >= 1


def test_real_codec_raises(spark, media_df):
    from pyspark.sql import functions as F

    fake_real = media_df.withColumn(
        "media_meta",
        F.struct(
            F.col("media_meta.width").alias("width"),
            F.col("media_meta.height").alias("height"),
            F.col("media_meta.n_frames").alias("n_frames"),
            F.lit("jpeg").alias("codec"),
        ),
    )
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_features(fake_real, "doc_id").collect()
