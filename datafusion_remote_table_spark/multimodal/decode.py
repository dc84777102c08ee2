"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow batches via mapInPandas.

The decode kernels themselves are STUBS (this container ships no
image/audio libraries — see SURVEY.md §2.C): `_decode_stub` is a
deterministic fake and `decode_media(real=True)` raises
NotImplementedError where PIL/ffmpeg would be called. Everything
Spark-side — schema, Arrow batch shape, partitioning, UDF signatures —
is real and tested; swapping the kernel for a real decoder changes no
plumbing.

Scale: payloads never hit the driver; batches stream executor-side with
spark.sql.execution.arrow.maxRecordsPerBatch bounding memory. For
100TB media tables, pair with maxPartitionBytes tuning so one task
holds a bounded number of payloads.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "struct<mime:string,width:int,height:int,n_frames:int>"


def attach_media_metadata(df: DataFrame, payload_col: str, mime: str = "image/fake") -> DataFrame:
    """Add a typed metadata struct next to an opaque binary column — the
    canonical layout for a media table (payload + queryable metadata)."""
    n = F.length(F.col(payload_col))
    meta = F.struct(
        F.lit(mime).alias("mime"),
        (64 + n % 512).cast("int").alias("width"),
        (64 + (n * 7) % 512).cast("int").alias("height"),
        ((n % 8) + 1).cast("int").alias("n_frames"),
    )
    return df.withColumn("media_meta", meta)


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode: stands in for PIL.Image.open/ffmpeg."""
    return {
        "n_bytes": len(payload),
        "content_hash": hashlib.md5(payload).hexdigest(),
        "mean_luma": sum(payload[:64]) / max(min(len(payload), 64), 1) / 255.0,
    }


def decode_media(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", real: bool = False
) -> DataFrame:
    """Decode/feature-extract binary payloads executor-side.

    real=True is the seam for an actual decoder; it raises here because
    no media libraries exist in this environment.
    """
    if real:
        raise NotImplementedError(
            "real decode requires PIL/ffmpeg (not available in this container); "
            "use real=False for the deterministic stub kernel"
        )

    def batches(it):
        for pdf in it:
            feats = pdf[payload_col].map(lambda b: _decode_stub(bytes(b)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": feats.map(lambda f: f["n_bytes"]).astype("int64"),
                    "content_hash": feats.map(lambda f: f["content_hash"]),
                    "mean_luma": feats.map(lambda f: f["mean_luma"]).astype("float64"),
                }
            )

    return df.mapInPandas(batches, schema=f"{id_col} long, n_bytes long, content_hash string, mean_luma double")


def sample_frames(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", every_n: int = 4
) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame, frames
    faked as fixed-size payload slices (a real kernel yields decoded
    frames; the explode/batch shape is identical)."""

    def batches(it):
        for pdf in it:
            out_ids, out_idx, out_chunks = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                n_frames = (len(raw) % 8) + 1
                for f_idx in range(0, n_frames, every_n):
                    out_ids.append(i)
                    out_idx.append(f_idx)
                    out_chunks.append(raw[f_idx * 16 : f_idx * 16 + 16])
            yield pd.DataFrame({id_col: out_ids, "frame_idx": out_idx, "frame_payload": out_chunks})

    return df.mapInPandas(batches, schema=f"{id_col} long, frame_idx int, frame_payload binary")


def resize_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target: tuple[int, int] = (64, 64),
) -> DataFrame:
    """Resize plumbing: emits a fixed-size payload per row (a real kernel
    calls PIL.Image.resize; the stub deterministically resamples bytes so
    output size is exactly target area). Schema carries the new dims."""
    w, h = target

    def batches(it):
        for pdf in it:
            out = []
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                n = w * h
                if len(raw) == 0:
                    out.append(b"\x00" * n)
                else:
                    # nearest-neighbor byte resample — deterministic stand-in
                    out.append(bytes(raw[(i * len(raw)) // n] for i in range(n)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized_payload": out,
                    "width": [w] * len(pdf),
                    "height": [h] * len(pdf),
                }
            )

    return df.mapInPandas(
        batches, schema=f"{id_col} long, resized_payload binary, width int, height int"
    )
