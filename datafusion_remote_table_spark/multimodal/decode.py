"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow batches via mapInPandas.

Decode kernels: UNCOMPRESSED formats (24bpp BMP, binary PPM/P6) decode
for REAL via pure-stdlib struct/bytes parsing — `decode_media(real=True)`
parses actual headers and pixel data. Compressed formats (jpeg/video)
still need PIL/ffmpeg, which this container doesn't ship (SURVEY.md
§2.C); those raise NotImplementedError, and `_decode_stub` remains the
deterministic fake for plumbing tests. Swapping a real jpeg kernel in
changes no Spark-side plumbing: schema, Arrow batch shape, partitioning,
and UDF signatures are identical.

Scale: payloads never hit the driver; batches stream executor-side with
spark.sql.execution.arrow.maxRecordsPerBatch bounding memory. For
100TB media tables, pair with maxPartitionBytes tuning so one task
holds a bounded number of payloads.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "struct<mime:string,width:int,height:int,n_frames:int>"


# ---------------------------------------------------------------------------
# Pure-stdlib codecs for uncompressed formats (no PIL/ffmpeg needed).
def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """24bpp bottom-up BMP (BITMAPINFOHEADER). ``pixels`` is raw RGB
    triplets row-major top-down; rows are re-ordered bottom-up and
    channel-swapped to BGR, padded to 4-byte boundaries — a real BMP any
    external viewer opens."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} pixel bytes, got {len(pixels)}")
    stride = (width * 3 + 3) // 4 * 4
    pad = b"\x00" * (stride - width * 3)
    rows = []
    for y in reversed(range(height)):
        row = bytearray()
        for x in range(width):
            off = (y * width + x) * 3
            r, g, b = pixels[off : off + 3]
            row += bytes((b, g, r))
        rows.append(bytes(row) + pad)
    data = b"".join(rows)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 54)
    info_header = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return file_header + info_header + data


def encode_ppm(pixels: bytes, width: int, height: int) -> bytes:
    """Binary PPM (P6), raw RGB row-major."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} pixel bytes, got {len(pixels)}")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + pixels


def decode_image(payload: bytes) -> tuple[str, int, int, bytes]:
    """Parse an uncompressed image: returns (format, width, height,
    RGB pixel bytes row-major top-down). Raises NotImplementedError for
    formats that need external decoders (jpeg/png/video)."""
    if payload[:2] == b"BM":
        offset, = struct.unpack_from("<I", payload, 10)
        width, height, _planes, bpp, compression = struct.unpack_from("<iiHHI", payload, 18)
        if bpp != 24 or compression != 0:
            raise NotImplementedError(f"only uncompressed 24bpp BMP supported (bpp={bpp})")
        top_down = height < 0
        height = abs(height)
        stride = (width * 3 + 3) // 4 * 4
        out = bytearray()
        ys = range(height) if top_down else reversed(range(height))
        for y in ys:
            row = payload[offset + y * stride : offset + y * stride + width * 3]
            for x in range(width):
                b, g, r = row[x * 3 : x * 3 + 3]
                out += bytes((r, g, b))
        return "bmp", width, height, bytes(out)
    if payload[:2] == b"P6":
        # header: magic, width, height, maxval — ASCII tokens with
        # comment support, then ONE whitespace byte before raw pixels
        pos, tokens = 2, []
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        width, height, maxval = tokens
        if maxval != 255:
            raise NotImplementedError("only 8-bit PPM supported")
        return "ppm", width, height, bytes(payload[pos : pos + width * height * 3])
    raise NotImplementedError(
        "compressed formats (jpeg/png/video) require PIL/ffmpeg, not available "
        "in this container; BMP and PPM decode natively"
    )


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

    real=True parses ACTUAL image bytes (24bpp BMP / binary PPM via the
    stdlib codecs above) and computes pixel statistics from the decoded
    data: format + dimensions from the header, mean_luma as the mean of
    the RGB samples. Compressed payloads raise NotImplementedError from
    decode_image (jpeg/video need PIL/ffmpeg, not in this container).
    real=False keeps the deterministic stub kernel for plumbing tests.
    """
    if real:

        def batches(it):
            for pdf in it:
                fmts, widths, heights, sums, lumas = [], [], [], [], []
                for b in pdf[payload_col]:
                    fmt, w, h, pix = decode_image(bytes(b))
                    fmts.append(fmt)
                    widths.append(w)
                    heights.append(h)
                    sums.append(sum(pix))
                    lumas.append(round(sum(pix) / (len(pix) * 255.0), 6) if pix else 0.0)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "fmt": fmts,
                        "width": pd.Series(widths, dtype="int32"),
                        "height": pd.Series(heights, dtype="int32"),
                        "pixel_sum": pd.Series(sums, dtype="int64"),
                        "mean_luma": pd.Series(lumas, dtype="float64"),
                    }
                )

        return df.mapInPandas(
            batches,
            schema=f"{id_col} long, fmt string, width int, height int, pixel_sum long, mean_luma double",
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


def resize_image_real(payload: bytes, tw: int, th: int) -> tuple[str, bytes]:
    """REAL nearest-neighbor resize of an uncompressed image: decode via
    the stdlib codecs, resample to (tw, th) with floor source mapping
    (sx = x*w // tw — PIL's NEAREST convention), return (fmt, RGB bytes
    row-major top-down). Compressed formats raise NotImplementedError
    from decode_image."""
    fmt, w, h, pix = decode_image(payload)
    out = bytearray()
    for y in range(th):
        sy = (y * h) // th
        for x in range(tw):
            sx = (x * w) // tw
            off = (sy * w + sx) * 3
            out += pix[off : off + 3]
    return fmt, bytes(out)


def resize_media_real(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target: tuple[int, int] = (2, 1),
) -> DataFrame:
    """Real-decode resize over Arrow batches: per row, decode + NN-resample
    + per-channel integer sums (means/rounding stay in SQL so both engines
    round identically — no Python banker's-rounding in the data path)."""
    tw, th = target

    def batches(it):
        for pdf in it:
            fmts, psums, rsums, gsums, bsums = [], [], [], [], []
            for b in pdf[payload_col]:
                fmt, pix = resize_image_real(bytes(b), tw, th)
                fmts.append(fmt)
                psums.append(sum(pix))
                rsums.append(sum(pix[0::3]))
                gsums.append(sum(pix[1::3]))
                bsums.append(sum(pix[2::3]))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "fmt": fmts,
                    "width": pd.Series([tw] * len(pdf), dtype="int32"),
                    "height": pd.Series([th] * len(pdf), dtype="int32"),
                    "pixel_sum": pd.Series(psums, dtype="int64"),
                    "r_sum": pd.Series(rsums, dtype="int64"),
                    "g_sum": pd.Series(gsums, dtype="int64"),
                    "b_sum": pd.Series(bsums, dtype="int64"),
                }
            )

    return df.mapInPandas(
        batches,
        schema=(
            f"{id_col} long, fmt string, width int, height int, "
            "pixel_sum long, r_sum long, g_sum long, b_sum long"
        ),
    )


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


# ---------------------------------------------------------------------------
# Audio: genuine RIFF/WAVE PCM codec (pure stdlib) — the audio leg of the
# modality triple. Encode writes a file any player opens; decode walks the
# RIFF chunk list strictly, so a wrong header offset or chunk size breaks
# the oracle hash the same way the BMP/PPM decoders do.
def encode_wav(samples: bytes, sample_rate: int = 8000) -> bytes:
    """Genuine RIFF/WAVE container, PCM unsigned 8-bit mono."""
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(samples), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate, 1, 8,
        b"data", len(samples),
    )
    return hdr + samples


def decode_wav(payload: bytes) -> tuple[int, bytes]:
    """Strict RIFF walk: returns (sample_rate, u8 samples). Compressed
    audio (mp3/aac/opus) needs external codecs this container doesn't
    ship — those payloads raise NotImplementedError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed audio (mp3/aac/opus) requires external codecs; "
            "RIFF/WAVE PCM decodes natively"
        )
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, csz = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", payload, pos)
            if audio_fmt != 1 or channels != 1 or bits != 8:
                raise NotImplementedError("only PCM u8 mono WAV supported")
        elif cid == b"data":
            data = payload[pos : pos + csz]
        pos += csz + (csz & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, data


def audio_stats_real(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real-decode audio feature extraction over Arrow batches: parse the
    WAV container, emit integer waveform stats (peak deviation from the
    u8 midpoint 128, sum of absolute deviations, zero crossings). Means
    and rounding stay in SQL so both engines round identically."""

    def batches(it):
        import numpy as np

        for pdf in it:
            rates, ns, peaks, sads, zcs = [], [], [], [], []
            for b in pdf[payload_col]:
                rate, samples = decode_wav(bytes(b))
                d = np.frombuffer(samples, dtype=np.uint8).astype(np.int64) - 128
                rates.append(rate)
                ns.append(len(d))
                peaks.append(int(np.max(np.abs(d))) if len(d) else 0)
                sads.append(int(np.sum(np.abs(d))))
                zcs.append(int(np.sum(d[:-1] * d[1:] < 0)) if len(d) > 1 else 0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "peak_dev": pd.Series(peaks, dtype="int64"),
                    "sum_abs_dev": pd.Series(sads, dtype="int64"),
                    "zero_crossings": pd.Series(zcs, dtype="int64"),
                }
            )

    return df.mapInPandas(
        batches,
        schema=(
            f"{id_col} long, sample_rate int, n_samples int, "
            "peak_dev long, sum_abs_dev long, zero_crossings long"
        ),
    )


# ---------------------------------------------------------------------------
# Perceptual hash (aHash) over REAL decoded pixels: bit i is 1 when pixel
# i's luma exceeds the image mean — compared via integers (8*luma > total)
# so there is no float rounding anywhere in the hash.
def image_phash(payload: bytes) -> tuple[str, int]:
    """Average-hash of an uncompressed image: decode, per-pixel luma =
    r+g+b, bit_i = (n_pixels * luma_i > total_luma). Returns (fmt, hash)
    with one bit per pixel, LSB = pixel 0 (row-major top-down)."""
    fmt, w, h, pix = decode_image(payload)
    n = w * h
    lumas = [pix[3 * i] + pix[3 * i + 1] + pix[3 * i + 2] for i in range(n)]
    total = sum(lumas)
    return fmt, sum(1 << i for i, l in enumerate(lumas) if n * l > total)


def phash_media(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batch aHash kernel: doc_id, fmt, phash. All-integer — the
    census/dedup grouping downstream is plain SQL."""

    def batches(it):
        for pdf in it:
            fmts, hashes = [], []
            for b in pdf[payload_col]:
                fmt, ph = image_phash(bytes(b))
                fmts.append(fmt)
                hashes.append(ph)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "fmt": fmts,
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, schema=f"{id_col} long, fmt string, phash long")


def encode_y4m(
    frames: list[tuple[bytes, bytes, bytes]], width: int, height: int, fps: int = 25
) -> bytes:
    """Encode planar 4:2:0 frames as a genuine YUV4MPEG2 (.y4m) stream —
    the uncompressed interchange format mplayer/x264/ffmpeg consume:
    a plain-text signature line, then ``FRAME\\n`` + Y/U/V planes per
    frame. Real bytes a real tool could play."""
    out = [f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C420\n".encode("ascii")]
    for y, u, v in frames:
        if len(y) != width * height or len(u) != (width // 2) * (height // 2):
            raise ValueError("plane size mismatch")
        out.append(b"FRAME\n")
        out.extend((y, u, v))
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, int, int, list[tuple[bytes, bytes, bytes]]]:
    """Strict YUV4MPEG2 decode: returns (width, height, fps, frames).

    Only the uncompressed y4m container is implemented; anything else
    (mp4/h264/vp9...) raises NotImplementedError — real video codecs
    need ffmpeg, which this container does not ship."""
    if not payload.startswith(b"YUV4MPEG2 "):
        raise NotImplementedError("compressed video decode requires ffmpeg")
    nl = payload.index(b"\n")
    width = height = fps = None
    for tok in payload[10:nl].split(b" "):
        if tok.startswith(b"W"):
            width = int(tok[1:])
        elif tok.startswith(b"H"):
            height = int(tok[1:])
        elif tok.startswith(b"F"):
            fps = int(tok[1:].split(b":")[0])
        elif tok.startswith(b"C") and tok != b"C420":
            raise NotImplementedError(f"chroma mode {tok!r} not implemented")
    if width is None or height is None or fps is None:
        raise ValueError("missing y4m header params")
    ysz, csz = width * height, (width // 2) * (height // 2)
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 6] != b"FRAME\n":
            raise ValueError("bad FRAME marker")
        pos += 6
        y = payload[pos : pos + ysz]; pos += ysz
        u = payload[pos : pos + csz]; pos += csz
        v = payload[pos : pos + csz]; pos += csz
        if len(v) < csz:
            raise ValueError("truncated frame")
        frames.append((y, u, v))
    return width, height, fps, frames


def video_stats_real(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode a y4m payload column and reduce each video to integer
    stats: frame count, geometry, fps, total luma sum, and temporal
    motion (sum |Y_t - Y_{t-1}| over consecutive frames). Integer sums
    only — means/rounding stay in SQL so both engines agree exactly.
    Arrow-batch map; payloads never visit the driver."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, fps, frames = decode_y4m(bytes(payload))
                luma = sum(sum(y) for y, _u, _v in frames)
                motion = 0
                for (y0, _u0, _v0), (y1, _u1, _v1) in zip(frames, frames[1:]):
                    motion += sum(abs(a - b) for a, b in zip(y0, y1))
                rows.append((int(doc_id), w, h, fps, len(frames), luma, motion))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "fps", "n_frames", "sum_luma", "motion"],
            )

    return df.mapInPandas(
        run,
        schema=(
            f"{id_col} long, width int, height int, fps int, "
            "n_frames int, sum_luma long, motion long"
        ),
    )


def audio_fingerprint_real(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", frame: int = 4
) -> DataFrame:
    """Acoustic fingerprint over REAL decoded PCM (the chromaprint shape
    without an FFT — no scipy here): the waveform splits into fixed
    frames, each frame reduces to integer energy (sum of squared
    deviations from the u8 midpoint), and bit i of the fingerprint is 1
    when frame i's energy exceeds frame i+1's — the energy-contour
    sign-delta code used for audio dedup bucketing. All-integer, so the
    hash is deterministic down to the byte walk."""

    def batches(it):
        import numpy as np

        for pdf in it:
            ns, fps, tops = [], [], []
            for b in pdf[payload_col]:
                _rate, samples = decode_wav(bytes(b))
                d = np.frombuffer(samples, dtype=np.uint8).astype(np.int64) - 128
                nf = len(d) // frame
                e = (d[: nf * frame].reshape(nf, frame) ** 2).sum(axis=1)
                fp = sum(1 << i for i in range(nf - 1) if e[i] > e[i + 1])
                ns.append(nf)
                fps.append(int(fp))
                tops.append(int(np.argmax(e)) if nf else 0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_frames": pd.Series(ns, dtype="int32"),
                    "fingerprint": pd.Series(fps, dtype="int64"),
                    "top_frame": pd.Series(tops, dtype="int64"),
                }
            )

    return df.mapInPandas(
        batches, schema=f"{id_col} long, n_frames int, fingerprint long, top_frame long"
    )


def video_frame_deltas(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode a y4m payload column into per-TRANSITION luma deltas
    (transition k = sum |Y_k − Y_{k−1}|, integer) — the frame-difference
    signal scene-cut detection thresholds. One output row per
    consecutive frame pair; integer sums only so both engines agree
    exactly. Arrow-batch map; payloads never visit the driver."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                _w, _h, _fps, frames = decode_y4m(bytes(payload))
                for k, ((y0, _u0, _v0), (y1, _u1, _v1)) in enumerate(
                    zip(frames, frames[1:]), start=1
                ):
                    delta = sum(abs(a - b) for a, b in zip(y0, y1))
                    rows.append((int(doc_id), k, delta))
            yield pd.DataFrame(rows, columns=[id_col, "transition", "delta"])

    return df.mapInPandas(run, schema=f"{id_col} long, transition int, delta long")


def image_contrast_real(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode an image payload column (BMP/PPM via decode_image) into
    integer CONTRAST sums — the texture/sharpness signal image-quality
    filters threshold: per-pixel brightness = r+g+b, contrast_h_sum =
    sum of |brightness(x+1,y) - brightness(x,y)| over horizontal
    neighbors, contrast_v_sum over vertical neighbors. Integer sums
    only (division/normalization happens in SQL so both engines round
    identically). Arrow-batch map; payloads never visit the driver."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                fmt, w, h, px = decode_image(bytes(payload))
                br = [
                    px[3 * i] + px[3 * i + 1] + px[3 * i + 2]
                    for i in range(w * h)
                ]
                ch = sum(
                    abs(br[y * w + x + 1] - br[y * w + x])
                    for y in range(h)
                    for x in range(w - 1)
                )
                cv = sum(
                    abs(br[(y + 1) * w + x] - br[y * w + x])
                    for y in range(h - 1)
                    for x in range(w)
                )
                rows.append((int(doc_id), fmt, ch, cv))
            yield pd.DataFrame(
                rows, columns=[id_col, "fmt", "contrast_h_sum", "contrast_v_sum"]
            )

    return df.mapInPandas(
        run,
        schema=f"{id_col} long, fmt string, contrast_h_sum long, contrast_v_sum long",
    )
