from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_remote_table_spark.multimodal import (
    attach_media_metadata,
    decode_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")).repartition(4)


def test_metadata_schema(media):
    df = attach_media_metadata(media, "payload")
    meta = df.schema["media_meta"].dataType.simpleString()
    assert meta == "struct<mime:string,width:int,height:int,n_frames:int>"
    row = df.select("media_meta.*").first()
    assert row.mime == "image/fake" and 64 <= row.width < 576


def test_decode_stub_deterministic(media):
    a = sorted(tuple(r) for r in decode_media(media).collect())
    b = sorted(tuple(r) for r in decode_media(media).collect())
    assert a == b
    assert all(len(r[2]) == 32 for r in a)  # md5 hex
    assert all(0.0 <= r[3] <= 1.0 for r in a)


def test_real_decode_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        decode_media(media, real=True)


def test_sample_frames_shape(media):
    frames = sample_frames(media)
    assert frames.columns == ["doc_id", "frame_idx", "frame_payload"]
    assert frames.count() >= media.count()  # ≥1 frame per doc
    assert frames.filter(F.col("frame_idx") % 4 != 0).count() == 0


def test_resize_media_fixed_output(media):
    from datafusion_remote_table_spark.multimodal import resize_media

    out = resize_media(media, target=(8, 8)).collect()
    assert all(len(r.resized_payload) == 64 for r in out)
    assert all((r.width, r.height) == (8, 8) for r in out)
    again = resize_media(media, target=(8, 8)).collect()
    assert sorted((r.doc_id, bytes(r.resized_payload)) for r in out) == sorted(
        (r.doc_id, bytes(r.resized_payload)) for r in again
    )
