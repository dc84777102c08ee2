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


def test_real_decode_rejects_compressed_payloads(media):
    # text payloads are not BMP/PPM: the kernel raises inside the executor
    # (jpeg/video would need PIL/ffmpeg), surfaced through the Spark job
    with pytest.raises(Exception, match="PIL/ffmpeg"):
        decode_media(media, real=True).collect()


def test_bmp_ppm_codec_roundtrip():
    from datafusion_remote_table_spark.multimodal.decode import (
        decode_image,
        encode_bmp,
        encode_ppm,
    )

    pix = bytes(range(4 * 2 * 3))
    for enc, fmt in ((encode_bmp, "bmp"), (encode_ppm, "ppm")):
        f, w, h, out = decode_image(enc(pix, 4, 2))
        assert (f, w, h) == (fmt, 4, 2)
        assert out == pix  # BGR bottom-up (BMP) restored to RGB top-down
    # non-multiple-of-4 row stride exercises BMP padding
    pix3 = bytes(range(3 * 3 * 3))
    f, w, h, out = decode_image(encode_bmp(pix3, 3, 3))
    assert (w, h) == (3, 3) and out == pix3
    # PPM comments are skipped
    f, w, h, out = decode_image(b"P6\n# a comment\n2 1\n255\n" + bytes(6))
    assert (f, w, h) == ("ppm", 2, 1) and out == bytes(6)
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")


def test_real_decode_on_real_images(spark):
    from datafusion_remote_table_spark.multimodal.decode import encode_bmp, encode_ppm

    pix_dark, pix_light = bytes(24), bytes([255] * 24)
    rows = [(1, encode_bmp(pix_dark, 4, 2)), (2, encode_ppm(pix_light, 4, 2))]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_media(media, real=True).collect()}
    assert (out[1].fmt, out[1].width, out[1].height) == ("bmp", 4, 2)
    assert out[1].mean_luma == 0.0 and out[2].mean_luma == 1.0
    assert out[2].pixel_sum == 24 * 255


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


def test_bmp_ppm_codec_property_roundtrip():
    """Random dims/pixels survive encode->decode bit-for-bit in both
    codecs — covers BMP row padding at every width mod 4 and PPM header
    token widths."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from datafusion_remote_table_spark.multimodal.decode import (
        decode_image,
        encode_bmp,
        encode_ppm,
    )

    @st.composite
    def _img(draw):
        w = draw(st.integers(min_value=1, max_value=9))
        h = draw(st.integers(min_value=1, max_value=6))
        pix = draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
        return w, h, pix

    @settings(max_examples=100, deadline=None, suppress_health_check=list(HealthCheck))
    @given(img=_img())
    def run(img):
        w, h, pix = img
        for enc, fmt in ((encode_bmp, "bmp"), (encode_ppm, "ppm")):
            f, gw, gh, out = decode_image(enc(pix, w, h))
            assert (f, gw, gh) == (fmt, w, h)
            assert out == pix

    run()


def test_wav_codec_roundtrip():
    from datafusion_remote_table_spark.multimodal.decode import decode_wav, encode_wav

    samples = bytes(range(256))
    rate, out = decode_wav(encode_wav(samples, sample_rate=16000))
    assert rate == 16000 and out == samples
    # strictness: non-RIFF payloads are compressed-audio territory
    import pytest

    with pytest.raises(NotImplementedError):
        decode_wav(b"\xff\xfb\x90\x00 mp3 frame junk")


def test_phash_bmp_ppm_agree():
    from datafusion_remote_table_spark.multimodal.decode import (
        encode_bmp,
        encode_ppm,
        image_phash,
    )

    pix = bytes((i * 37) % 256 for i in range(24))
    fb, hb = image_phash(encode_bmp(pix, 4, 2))
    fp, hp = image_phash(encode_ppm(pix, 4, 2))
    assert (fb, fp) == ("bmp", "ppm")
    assert hb == hp, "same pixels must hash identically across containers"
    lumas = [pix[3 * i] + pix[3 * i + 1] + pix[3 * i + 2] for i in range(8)]
    total = sum(lumas)
    assert hb == sum(1 << i for i, l in enumerate(lumas) if 8 * l > total)


def test_y4m_codec_roundtrip():
    from datafusion_remote_table_spark.multimodal.decode import decode_y4m, encode_y4m

    frames = [
        (bytes(range(8)), b"\x01\x02", b"\x03\x04"),
        (bytes(range(8, 16)), b"\x05\x06", b"\x07\x08"),
    ]
    w, h, fps, out = decode_y4m(encode_y4m(frames, 4, 2, fps=30))
    assert (w, h, fps) == (4, 2, 30)
    assert out == frames
    import pytest

    with pytest.raises(NotImplementedError):
        decode_y4m(b"\x00\x00\x00\x18ftypmp42 fake mp4 header")
