"""Frozen PNG + GIF decode artifacts — the r10 driver-hash row
(``image_stats_lossless``), staged in r9.

Same frozen-recipe pattern as ``artifacts_jpeg.py`` with one structural
upgrade PNG's losslessness buys: the expected channel means are computed
at fixture-build time DIRECTLY from the integer recipe rasters (pure
integer floor-to-micros arithmetic — no decoder run in the provenance
chain at all), so the frozen table is ground truth independent of BOTH
codec halves. The staged query re-encodes the rasters with
``functions/png.py:encode_png`` and decodes them through the Arrow-batched
``image_stats`` path; any regression in chunk framing, CRC handling,
inflate bounding, unfiltering, or channel packing moves a mean and
mismatches the hash.

Both lossless codecs share the one staged row: PNG cases (ids 0-11)
through ``encode_png`` and GIF cases (ids 50-56, including an animated
clip whose FIRST composited frame is the ground truth and a
256-distinct-color boundary case) through ``encode_gif`` — every case's
expected means derive from the recipe rasters with no codec in the
provenance chain. Registration is QUEUED for round 10 (the r6-r9 window
precedent — the round-9 window is full at 50);
``tests/test_multimodal_decode.py`` pins the staged query against the
frozen table every session in the interim.
"""

from __future__ import annotations

import numpy as np

from .artifacts_jpeg import _raster

# (img_id, kind, w, h, seed) — rasters from artifacts_jpeg's integer
# recipe generator; the PNG path is lossless so no sampling/restart axes
PNG_CASES: list[tuple[int, str, int, int, int]] = [
    (0, "gradient", 16, 16, 0),
    (1, "gradient", 40, 24, 0),
    (2, "gradient", 1, 1, 0),      # single pixel
    (3, "gradient", 21, 17, 0),    # odd dims
    (4, "flat", 16, 16, 3),
    (5, "flat", 24, 8, 11),
    (6, "checker", 32, 32, 2),
    (7, "checker", 9, 31, 5),
    (8, "noise", 32, 32, 0),       # incompressible stream
    (9, "noise", 24, 24, 7),
    (10, "gradient", 64, 48, 0),
    (11, "noise", 16, 48, 9),
]

# GIF cases: (img_id, kind, w, h, seed, n_frames) — dims bounded so the
# raster stays within the encoder's 256-color exact palette (w*h <= 256,
# or few-color kinds); the animated clip's expected stats are FRAME 0's
# raster (image_stats sees the first composited frame)
GIF_CASES: list[tuple[int, str, int, int, int, int]] = [
    (50, "gradient", 16, 16, 0, 1),
    (51, "flat", 16, 16, 3, 1),
    (52, "checker", 16, 16, 2, 1),
    (53, "noise", 16, 16, 0, 1),   # 256 pixels = the palette boundary
    (54, "checker", 15, 9, 5, 1),  # odd dims
    (55, "gradient", 12, 12, 0, 3),  # animated: 3 frames, seed varies
    (56, "flat", 8, 4, 29, 1),
]

# poison pills appended by payloads(): 100 = one IDAT byte flipped
# (CRC mismatch), 101 = truncated mid-IDAT, 102 = GIF with a corrupt
# LZW stream — each must cost exactly one decode_ok=false row
PILL_IDS = (100, 101, 102)


def payloads() -> list[tuple[int, bytes]]:
    from .functions.gif import encode_gif
    from .functions.png import encode_png

    out = []
    for img_id, kind, w, h, seed in PNG_CASES:
        out.append((img_id, encode_png(w, h, _raster(kind, w, h, seed))))
    for img_id, kind, w, h, seed, n_frames in GIF_CASES:
        frames = [_raster(kind, w, h, seed + i) for i in range(n_frames)]
        out.append((img_id, encode_gif(w, h, frames)))
    base = out[0][1]
    idat_at = base.find(b"IDAT")
    flipped = bytearray(base)
    flipped[idat_at + 6] ^= 0xFF
    out.append((PILL_IDS[0], bytes(flipped)))
    out.append((PILL_IDS[1], base[: idat_at + 10]))
    gif_base = bytearray(dict(out)[50])
    # poison the LZW stream body: the image descriptor's offset is
    # STRUCTURAL (header 13 + GCT + the encoder's 8-byte GCE) — a byte
    # SEARCH for 0x2C could land inside the color table if a palette
    # entry happens to contain 44 and flip pixels instead of breaking
    # the stream (review finding)
    depth = (gif_base[10] & 0x07) + 1
    img_at = 13 + 3 * (1 << depth) + 8
    if gif_base[img_at] != 0x2C:  # pragma: no cover - fixture invariant
        raise ValueError("artifacts_png: GIF descriptor offset drifted")
    gif_base[img_at + 12] ^= 0xFF
    out.append((PILL_IDS[2], bytes(gif_base)))
    return out


def media_df(spark):
    return spark.createDataFrame(
        [(int(i), bytearray(p)) for i, p in payloads()],
        "doc_id bigint, payload binary",
    )


def expected_oracle_sql() -> str:
    """Frozen expected stats as a DuckDB VALUES table (floats via
    VARCHAR -> DOUBLE; see artifacts_jpeg.expected_oracle_sql)."""
    rows = []
    for img_id, ok, w, h, mr, mg, mb in EXPECTED_STATS:
        if ok:
            rows.append(f"({img_id}, true, {w}, {h}, '{mr!r}', '{mg!r}', '{mb!r}')")
        else:
            rows.append(f"({img_id}, false, NULL, NULL, NULL, NULL, NULL)")
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, decode_ok,\n"
        "       CAST(width AS INT) AS width, CAST(height AS INT) AS height,\n"
        "       CAST(mean_r AS DOUBLE) AS mean_r, CAST(mean_g AS DOUBLE) AS mean_g,\n"
        "       CAST(mean_b AS DOUBLE) AS mean_b\n"
        "FROM (VALUES\n  " + ",\n  ".join(rows) + "\n"
        ") AS t(doc_id, decode_ok, width, height, mean_r, mean_g, mean_b)"
    )


# fmt: off
# frozen at fixture-build time (round 9) from the RECIPE RASTERS
# THEMSELVES (floor-to-micros integer means — no codec in the chain);
# regenerate only on an intentional recipe change, via:
#   python -c "import lichess_event_stream_watcher_spark.artifacts_png as a; print(a.compute_expected_repr())"
EXPECTED_STATS: list = [
    (0, True, 16, 16, 127.5, 127.5, 63.003906),
    (1, True, 40, 24, 127.05, 127.041666, 63.001041),
    (2, True, 1, 1, 0.0, 0.0, 0.0),
    (3, True, 21, 17, 127.142857, 127.058823, 63.002801),
    (4, True, 16, 16, 35.0, 171.0, 51.0),
    (5, True, 24, 8, 43.0, 115.0, 187.0),
    (6, True, 32, 32, 127.001953, 120.390625, 124.824218),
    (7, True, 9, 31, 120.645161, 125.376344, 122.580645),
    (8, True, 32, 32, 127.5, 127.5, 127.5),
    (9, True, 24, 24, 127.722222, 127.833333, 127.5),
    (10, True, 64, 48, 127.03125, 127.020833, 63.000325),
    (11, True, 16, 48, 127.5, 127.5, 127.5),
    (50, True, 16, 16, 127.5, 127.5, 63.003906),
    (51, True, 16, 16, 35.0, 171.0, 51.0),
    (52, True, 16, 16, 125.507812, 121.5625, 124.296875),
    (53, True, 16, 16, 127.5, 127.5, 127.5),
    (54, True, 15, 9, 119.0, 126.666666, 122.0),
    (55, True, 12, 12, 127.083333, 127.083333, 63.006944),
    (56, True, 8, 4, 253.0, 117.0, 237.0),
    (100, False, None, None, None, None, None),
    (101, False, None, None, None, None, None),
    (102, False, None, None, None, None, None),
]
# fmt: on


def staged_query(spark, sf_dir: str):
    """The exact callable round 10 will register as
    ``image_stats_lossless`` (PNG + GIF on one row; corpus fixed by
    design, like image_stats_jpeg — the sf-scaled PPM branch carries the
    family's scale certification)."""
    from .operators.multimodal import image_stats

    return image_stats(media_df(spark))


def compute_expected_repr() -> str:
    """Fixture-build helper: integer channel means straight from the
    recipe rasters (never from decode output — losslessness makes the
    raster the ground truth the codec must hit; the animated GIF case
    uses FRAME 0's raster)."""
    rows = []
    for img_id, kind, w, h, seed in PNG_CASES + [c[:5] for c in GIF_CASES]:
        sums = (
            np.frombuffer(_raster(kind, w, h, seed), dtype=np.uint8)
            .reshape(-1, 3)
            .sum(axis=0, dtype=np.int64)
        )
        n_px = w * h
        rows.append(
            (
                img_id, True, w, h,
                (int(sums[0]) * 1_000_000 // n_px) / 1e6,
                (int(sums[1]) * 1_000_000 // n_px) / 1e6,
                (int(sums[2]) * 1_000_000 // n_px) / 1e6,
            )
        )
    for pid in PILL_IDS:
        rows.append((pid, False, None, None, None, None, None))
    body = ",\n    ".join(repr(r) for r in rows)
    return f"EXPECTED_STATS: list = [\n    {body},\n]"
