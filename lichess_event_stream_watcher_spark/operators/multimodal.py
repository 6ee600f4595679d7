"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
decode/feature steps run as Arrow-batched ``mapInPandas`` so each partition
streams through Python once.

Decode status (rounds 7-9): REAL across the whole triad. Images: PPM
(P6 binary / P3 ASCII, maxval <= 255), uncompressed 24-bit BMP, baseline
JPEG (functions/jpeg.py, ITU T.81), and PNG (functions/png.py, ISO
15948) — all from-scratch pure-Python decoders (the same move as
``functions/mmdb.py`` and ``functions/uap.py``), dispatched on magic
bytes by :func:`decode_image`. Audio: WAV/RIFF PCM (functions/wav.py)
through :func:`audio_stats`. Video: MJPEG-AVI (functions/avi.py)
through :func:`video_manifest` / :func:`video_frames` /
:func:`video_frame_stats`. Anything else raises ``ValueError`` naming
the magic, and the stats operators verdict those rows
``decode_ok = false`` instead of failing the batch (the poison-pill
discipline a 100 TB media scan needs: one corrupt file must cost one
row, not one task retry storm).

Scale: payload columns dominate I/O; keep them in their own parquet column
(column pruning skips them unless referenced) and size partitions by bytes
(``spark.sql.files.maxPartitionBytes``), not rows.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("content_md5", T.StringType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_histogram_head", T.ArrayType(T.LongType()), False),
    ]
)


def to_media_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a media table from documents: payload = utf-8 bytes.

    Real pipelines land (path, bytes) pairs the same way; everything
    downstream only sees binary + metadata."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).cast("bigint").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ).alias("meta"),
    )


def _ppm_tokens(b: bytes, n: int, start: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer tokens from ``start``,
    honoring netpbm ``#`` comments (comment runs to end of line).
    Returns (values, position after the final token's delimiter)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(b):
            if b[i : i + 1].isspace():
                i += 1
            elif b[i : i + 1] == b"#":
                while i < len(b) and b[i] not in (0x0A, 0x0D):
                    i += 1
            else:
                break
        j = i
        while j < len(b) and b[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError(f"PPM: expected integer at byte {i}")
        vals.append(int(b[i:j]))
        i = j
    return vals, i


def decode_ppm(b: bytes) -> tuple[int, int, bytes]:
    """PPM decode (P6 binary / P3 ASCII), maxval <= 255 -> (w, h, rgb).

    From-scratch netpbm: magic, whitespace/comment-tolerant header
    (width, height, maxval), then the raster — P6 reads w*h*3 raw bytes
    after EXACTLY ONE whitespace byte past maxval (the spec's single-
    delimiter rule: a raster may begin with a byte that looks like
    whitespace), P3 reads w*h*3 ASCII ints. rgb is tightly packed
    row-major RGB, the layout every consumer here assumes."""
    magic = b[:2]
    if magic not in (b"P6", b"P3"):
        raise ValueError(f"PPM: bad magic {magic!r}")
    (w, h, maxval), pos = _ppm_tokens(b, 3, 2)
    if w <= 0 or h <= 0:
        raise ValueError(f"PPM: bad dimensions {w}x{h}")
    if not 0 < maxval <= 255:
        raise ValueError(f"PPM: unsupported maxval {maxval} (need <= 255)")
    n = w * h * 3
    if magic == b"P6":
        pos += 1  # the single post-maxval delimiter byte
        raster = b[pos : pos + n]
        if len(raster) < n:
            raise ValueError(f"PPM: raster truncated ({len(raster)} < {n})")
        return w, h, bytes(raster)
    vals, _ = _ppm_tokens(b, n, pos)
    if any(v > maxval for v in vals):
        raise ValueError("PPM: sample exceeds maxval")
    return w, h, bytes(vals)


def encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    """P6 encode of a packed row-major RGB buffer — the writer twin of
    :func:`decode_ppm` (tests and the resize sink use it)."""
    if len(rgb) != w * h * 3:
        raise ValueError(f"encode_ppm: {len(rgb)} bytes != {w}x{h}x3")
    return b"P6\n%d %d\n255\n" % (w, h) + rgb


def decode_bmp(b: bytes) -> tuple[int, int, bytes]:
    """Uncompressed 24/32-bit BMP decode -> (w, h, rgb).

    From-scratch Windows BITMAPINFOHEADER parsing: pixel-array offset at
    byte 10, int32 width/height at 18/22 (negative height = top-down
    rows), bpp at 28 (24-bit BGR or 32-bit BGRA/BGRX, round 9), and
    compression at 30 — BI_RGB always, and BI_BITFIELDS for 32-bit when
    its masks are the standard identity BGRA layout (what Windows
    screenshot tooling writes; the pixel data is then byte-identical to
    BI_RGB). Anything else raises. Rows are 4-byte aligned and stored
    bottom-up unless top-down; pixels return as packed RGB with any
    alpha/padding byte dropped."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("BMP: bad magic or truncated header")
    (pix_off,) = struct.unpack_from("<I", b, 10)
    w, h_raw = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (compression,) = struct.unpack_from("<I", b, 30)
    if bpp not in (24, 32):
        raise ValueError(f"BMP: unsupported bpp={bpp}")
    if compression == 3 and bpp == 32:
        # BI_BITFIELDS: both the 40-byte header + 3 appended mask dwords
        # and the V4/V5 headers put the R/G/B masks at file offset 54;
        # only the identity BGRA layout (pixel bytes identical to BI_RGB)
        # is accepted
        if len(b) < 66 or struct.unpack_from("<III", b, 54) != (
            0x00FF0000, 0x0000FF00, 0x000000FF
        ):
            raise ValueError("BMP: non-standard BI_BITFIELDS masks")
    elif compression != 0:
        raise ValueError(f"BMP: unsupported compression={compression}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError(f"BMP: bad dimensions {w}x{h_raw}")
    n_ch = bpp // 8
    stride = (w * n_ch + 3) // 4 * 4
    if len(b) < pix_off + stride * h:
        raise ValueError("BMP: pixel array truncated")
    # vectorized unpack: (h, stride) byte grid -> strip row padding ->
    # flip bottom-up rows -> take B,G,R (dropping 32-bit's alpha/padding
    # byte) -> reverse the channel axis (BGR -> RGB). A per-pixel Python
    # loop here would be the slow path of every image batch; numpy keeps
    # the decode at memcpy speed.
    grid = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=pix_off)
    px = grid.reshape(h, stride)[:, : w * n_ch].reshape(h, w, n_ch)[:, :, :3]
    if not top_down:
        px = px[::-1]
    return w, h, px[:, :, ::-1].tobytes()


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Image decode -> (width, height, packed RGB bytes), dispatched on
    magic bytes: PPM (P6/P3), uncompressed 24/32-bit BMP, baseline JPEG
    (from-scratch T.81 — functions/jpeg.py, round 8), PNG (from-scratch
    ISO 15948 over stdlib zlib — functions/png.py, round 9), and GIF
    (from-scratch 87a/89a LZW, first composited frame — functions/gif.py,
    round 9); anything else raises ``ValueError`` naming the magic — the
    remaining codec-library formats (audio/video) stay env-gated in this
    container. ``image_stats`` maps that error to a ``decode_ok = false``
    row, so unsupported/corrupt payloads cost one row, never a task."""
    if payload[:2] in (b"P6", b"P3"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from ..functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:4] == b"\x89PNG":
        from ..functions.png import decode_png

        return decode_png(payload)
    if payload[:4] == b"GIF8":
        from ..functions.gif import decode_gif

        return decode_gif(payload)
    raise ValueError(f"unsupported image magic {bytes(payload[:2])!r}")


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """REAL decoded-pixel statistics per image: (doc_id, decode_ok,
    width, height, per-channel means) via the same Arrow-batched
    ``mapInPandas`` shape as ``extract_features`` — but over actual
    pixels from :func:`decode_image`. Means are floor-quantized at 1e-6
    by integer arithmetic (engine-portable; see extract_features).
    Decode failures (unsupported magic, truncated raster) yield a
    ``decode_ok = false`` row with null stats."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    # a NULL payload is a poison pill like any other:
                    # one decode_ok=false row, never a task failure
                    w, h, rgb = decode_image(bytes(payload) if payload is not None else b"")
                except ValueError:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "decode_ok": False,
                            "width": None,
                            "height": None,
                            "mean_r": None,
                            "mean_g": None,
                            "mean_b": None,
                        }
                    )
                    continue
                n_px = w * h
                # int64 channel sums via numpy (a Python sum over a byte
                # slice is ~100x slower per megapixel); the floor-to-
                # micros arithmetic stays exact integer
                sums = (
                    np.frombuffer(rgb, dtype=np.uint8)
                    .reshape(-1, 3)
                    .sum(axis=0, dtype=np.int64)
                )
                rows.append(
                    {
                        "doc_id": doc_id,
                        "decode_ok": True,
                        "width": w,
                        "height": h,
                        "mean_r": (int(sums[0]) * 1_000_000 // n_px) / 1e6,
                        "mean_g": (int(sums[1]) * 1_000_000 // n_px) / 1e6,
                        "mean_b": (int(sums[2]) * 1_000_000 // n_px) / 1e6,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(stats, IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("peak_pcm", T.IntegerType(), True),
        T.StructField("rms_pcm", T.IntegerType(), True),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL decoded-audio statistics per clip: (doc_id, decode_ok, rate,
    channels, frames, duration, peak, rms) through the same Arrow-batched
    ``mapInPandas`` shape as ``image_stats``, over the from-scratch
    WAV/PCM decoder (functions/wav.py — round 9's audio counterpart to
    the image codecs). Every statistic is INTEGER in PCM units — peak is
    max |sample|, rms is isqrt(sum(sample^2) // frames_total) — so a SQL
    oracle derives the identical values with no float-rounding seam.
    Decode failures yield one ``decode_ok = false`` row, never a task."""
    import math

    from ..functions.wav import decode_wav_pcm

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rate, pcm16 = decode_wav_pcm(
                        bytes(payload) if payload is not None else b""
                    )
                except ValueError:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "decode_ok": False,
                            "sample_rate": None,
                            "channels": None,
                            "n_samples": None,
                            "duration_ms": None,
                            "peak_pcm": None,
                            "rms_pcm": None,
                        }
                    )
                    continue
                n, ch = pcm16.shape
                # ONE widening pass (int16 -> int64 for overflow-free
                # squares); the float view would cost two extra
                # full-array conversions per clip on this hot path
                pcm = pcm16.astype(np.int64)
                total = n * ch
                rows.append(
                    {
                        "doc_id": doc_id,
                        "decode_ok": True,
                        "sample_rate": rate,
                        "channels": ch,
                        "n_samples": n,
                        "duration_ms": n * 1000 // rate,
                        "peak_pcm": int(np.abs(pcm).max()) if total else 0,
                        "rms_pcm": int(math.isqrt(int((pcm * pcm).sum()) // total))
                        if total
                        else 0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(stats, AUDIO_STATS_SCHEMA)


VIDEO_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("micros_per_frame", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

VIDEO_FRAME_STATS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType(), False), T.StructField("frame_idx", T.LongType(), False)]
    + IMAGE_STATS_SCHEMA.fields[1:]
)


def video_manifest(media: DataFrame) -> DataFrame:
    """Container-level video metadata per clip — header walk ONLY, no
    frame decode (the cheap first pass a 100 TB video corpus runs before
    deciding what to decode). Malformed clips cost one
    ``decode_ok = false`` row."""
    from ..functions.avi import decode_avi_mjpeg

    def manifest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    micros, w, h, frames = decode_avi_mjpeg(
                        bytes(payload) if payload is not None else b""
                    )
                except ValueError:
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "decode_ok": False,
                            "micros_per_frame": None,
                            "width": None,
                            "height": None,
                            "n_frames": None,
                            "duration_ms": None,
                        }
                    )
                    continue
                rows.append(
                    {
                        "doc_id": doc_id,
                        "decode_ok": True,
                        "micros_per_frame": micros,
                        "width": w,
                        "height": h,
                        "n_frames": len(frames),
                        "duration_ms": len(frames) * micros // 1000,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_MANIFEST_SCHEMA.fields]
            )

    return media.select("doc_id", "payload").mapInPandas(manifest, VIDEO_MANIFEST_SCHEMA)


def video_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """REAL frame extraction (supersedes the ``sample_frames`` stand-in
    for actual video payloads): the AVI walk splits the container at
    chunk boundaries and every n-th JPEG frame comes out as its own row
    — 1 -> N expansion inside mapInPandas, frames stay with their source
    partition, and NO entropy decode happens here, so the extract pass
    costs container IO even when a later stage decodes only a sample.
    Undecodable containers drop out (``video_manifest`` carries their
    verdicts, the resize_image/image_stats split)."""
    if every_n < 1:
        raise ValueError(f"video_frames: bad every_n {every_n}")
    from ..functions.avi import decode_avi_mjpeg

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    _micros, _w, _h, frames = decode_avi_mjpeg(
                        bytes(payload) if payload is not None else b""
                    )
                except ValueError:
                    continue
                for idx in range(0, len(frames), every_n):
                    rows.append(
                        {"doc_id": doc_id, "frame_idx": idx, "frame_payload": frames[idx]}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def video_frame_stats(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Sampled-frame pixel statistics in ONE pass: container walk + JPEG
    decode of every n-th frame + the image_stats arithmetic, fused inside
    a single mapInPandas so sampled frames never round-trip through a
    shuffle. Per-frame decode failures (a corrupt frame inside a valid
    container) cost one decode_ok=false row for THAT frame only."""
    if every_n < 1:
        raise ValueError(f"video_frame_stats: bad every_n {every_n}")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.avi import decode_avi_mjpeg

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    _micros, _w, _h, frames = decode_avi_mjpeg(
                        bytes(payload) if payload is not None else b""
                    )
                except ValueError:
                    continue
                for idx in range(0, len(frames), every_n):
                    row = {"doc_id": doc_id, "frame_idx": idx}
                    try:
                        w, h, rgb = decode_image(frames[idx])
                        sums = (
                            np.frombuffer(rgb, dtype=np.uint8)
                            .reshape(-1, 3)
                            .sum(axis=0, dtype=np.int64)
                        )
                        n_px = w * h
                        row.update(
                            decode_ok=True, width=w, height=h,
                            mean_r=(int(sums[0]) * 1_000_000 // n_px) / 1e6,
                            mean_g=(int(sums[1]) * 1_000_000 // n_px) / 1e6,
                            mean_b=(int(sums[2]) * 1_000_000 // n_px) / 1e6,
                        )
                    except ValueError:
                        row.update(
                            decode_ok=False, width=None, height=None,
                            mean_r=None, mean_g=None, mean_b=None,
                        )
                    rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_STATS_SCHEMA.fields]
            )

    return media.select("doc_id", "payload").mapInPandas(stats, VIDEO_FRAME_STATS_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("width", T.IntegerType(), False),
                    T.StructField("height", T.IntegerType(), False),
                ]
            ),
            False,
        ),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize step: binary -> binary with updated typed metadata.

    The pixel transform is a deterministic fake (decode is stubbed — see
    ``decode_image``): output bytes are the payload truncated/cycled to
    width*height, standing in for a real thumbnail. Partitioning, Arrow
    batch flow, and the metadata contract are exactly what a PIL-backed
    implementation would use — swap the body, keep the plumbing."""
    n_out = width * height

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                out = (b * (n_out // max(1, len(b)) + 1))[:n_out] if b else b"\x00" * n_out
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload": out,
                        "meta": {"n_bytes": len(out), "width": width, "height": height},
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(do_resize, RESIZED_SCHEMA)


def resize_image(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """REAL resize for decodable payloads: decode (PPM/BMP) ->
    nearest-neighbor resample -> re-encode P6, through the same
    mapInPandas contract as ``resize_media`` (which remains the
    deterministic fake for non-decodable payloads). Nearest-neighbor
    with the standard floor mapping src = i * src_dim // dst_dim —
    deterministic, library-free, and exact for integer upscales.
    Undecodable rows drop out (callers wanting verdicts use
    ``image_stats``)."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    sw, sh, rgb = decode_image(bytes(payload) if payload is not None else b"")
                except ValueError:
                    continue
                # vectorized nearest-neighbor: integer source-index grids
                # (the floor mapping src = i * src_dim // dst_dim) +
                # numpy fancy indexing — no per-pixel Python loop
                px = np.frombuffer(rgb, dtype=np.uint8).reshape(sh, sw, 3)
                ys = np.arange(height, dtype=np.int64) * sh // height
                xs = np.arange(width, dtype=np.int64) * sw // width
                out = px[ys][:, xs]
                enc = encode_ppm(width, height, out.tobytes())
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload": enc,
                        "meta": {"n_bytes": len(enc), "width": width, "height": height},
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(do_resize, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_n: int = 4
) -> DataFrame:
    """Frame sampling: one input row -> many frame rows (a flatMap).

    The payload splits into fixed-size pseudo-frames and every n-th is
    kept — the FORMAT-AGNOSTIC stand-in (and the certified
    multimodal_frames shape). For actual MJPEG-AVI payloads use
    :func:`video_frames` / :func:`video_frame_stats` (round 9), which
    walk the real container at chunk boundaries. The 1->N row expansion
    via mapInPandas is the real shape of a frame extractor; frames stay
    with their source partition (no shuffle)."""
    if frame_bytes < 1 or every_n < 1:
        # driver-side, immediate: inside the UDF this would fail every
        # task (range step 0) or silently yield nothing (negative step)
        raise ValueError(f"sample_frames: bad frame_bytes/every_n {(frame_bytes, every_n)}")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_payload": b[idx * frame_bytes:(idx + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic fake feature extractor over the binary payload via
    mapInPandas: byte statistics stand in for real decoded features, with
    the exact batch shape a real extractor would use."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                hist = [0] * 8
                for byte in b:
                    if byte < 128:
                        hist[byte // 16] += 1
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(b),
                        # floor-to-micros instead of round(x, 6): the exact
                        # integer arithmetic is engine-portable (identical
                        # doubles in any SQL oracle), no half-even tie risk
                        "byte_mean": (sum(b) * 1_000_000 // len(b)) / 1e6 if b else 0.0,
                        "byte_histogram_head": hist,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(featurize, FEATURE_SCHEMA)
