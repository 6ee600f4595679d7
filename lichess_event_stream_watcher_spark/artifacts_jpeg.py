"""Frozen baseline-JPEG decode artifacts — the codec's driver-hash row.

A DuckDB oracle cannot replay Huffman entropy decode, so the JPEG branch
of ``operators/multimodal.decode_image`` rides the same frozen-artifact
pattern as the trained-ANN twins (``artifacts.py``): deterministic
payloads are produced by the repo's OWN encoder twin
(``functions/jpeg.py:encode_jpeg_baseline`` — integer-arithmetic rasters,
Annex-K tables, every sampling/restart shape the decoder supports), the
decoded channel statistics were computed ONCE at fixture-build time —
validated against the pre-encode rasters within quantization error
bounds (``tests/test_jpeg_codec.py`` pins those bounds independently) —
and frozen below as exact repr literals that the oracle re-emits as a
VALUES table. The registered query (``queries_pipeline.image_stats_jpeg``)
re-encodes and re-decodes from the recipe at run time, so EVERY byte of
both codec halves (color transform, subsample, FDCT, quantization,
Huffman coding, byte stuffing/unstuffing, fill-byte handling, restart
resets, IDCT, upsample) sits on the committed driver hash: a regression
in either half moves a channel mean and mismatches.

Reference parity: the reference engine has no image codec — this family
belongs to the repo's LLM-data-pipeline surface (multimodal columns as
opaque binaries + typed metadata).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# deterministic rasters (integer arithmetic only — bit-identical anywhere)
# --------------------------------------------------------------------------


def _raster(kind: str, w: int, h: int, seed: int) -> bytes:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.int64)
    if kind == "gradient":
        r = (xx * 255 // max(1, w - 1)) if w > 1 else xx * 0
        g = (yy * 255 // max(1, h - 1)) if h > 1 else yy * 0
        b = (xx + yy) * 127 // max(1, h + w - 2)
    elif kind == "flat":
        r = xx * 0 + (seed * 97) % 256
        g = xx * 0 + (seed * 57) % 256
        b = xx * 0 + (seed * 17) % 256
    elif kind == "checker":
        cell = 1 + seed % 7
        q = ((xx // cell) + (yy // cell)) % 2
        r, g, b = q * 255, (1 - q) * 200 + 20, q * 90 + 80
    elif kind == "noise":
        # Knuth multiplicative hash over the pixel index — harsh,
        # stuffing-heavy entropy streams (the worst case for unstuffing)
        idx = (yy * w + xx) * 3
        r = ((idx + seed) * 2654435761) % 256
        g = ((idx + seed + 1) * 2654435761) % 256
        b = ((idx + seed + 2) * 2654435761) % 256
    else:  # pragma: no cover - recipe table is closed
        raise ValueError(kind)
    return np.stack([r, g, b], axis=2).astype(np.uint8).tobytes()


# (img_id, kind, w, h, seed, sampling (hs, vs), restart_interval)
JPEG_CASES: list[tuple[int, str, int, int, int, tuple[int, int], int]] = [
    (0, "gradient", 16, 16, 0, (1, 1), 0),
    (1, "gradient", 40, 24, 0, (1, 1), 0),   # non-multiple-of-8 crop
    (2, "gradient", 48, 32, 0, (2, 2), 0),   # 4:2:0 upsample
    (3, "gradient", 48, 32, 0, (2, 1), 0),   # 4:2:2 asymmetric
    (4, "gradient", 48, 32, 0, (1, 2), 0),   # 1x2 vertical mirror
    (5, "gradient", 21, 17, 0, (2, 2), 0),   # odd dims + subsample
    (6, "flat", 16, 16, 3, (1, 1), 0),       # DC-only blocks
    (7, "flat", 24, 8, 11, (2, 2), 0),
    (8, "checker", 32, 32, 2, (1, 1), 0),    # high-frequency AC
    (9, "checker", 32, 32, 5, (2, 1), 0),
    (10, "noise", 32, 32, 0, (1, 1), 0),     # stuffing-heavy stream
    (11, "noise", 24, 24, 7, (2, 2), 0),
    (12, "gradient", 80, 16, 0, (1, 1), 3),  # RSTn + DC reset
    (13, "noise", 48, 16, 1, (1, 1), 2),     # restarts on a harsh stream
    (14, "checker", 40, 40, 3, (2, 2), 4),   # restarts + subsample
    (15, "gradient", 64, 48, 0, (2, 2), 5),
    (16, "noise", 16, 48, 9, (1, 2), 0),
    (17, "flat", 8, 8, 29, (1, 1), 0),       # single-MCU minimum
]

# poison pills appended by payloads(): img_id 100 = entropy stream
# truncated mid-scan, 101 = SOF0 patched to progressive SOF2 — both must
# cost exactly one decode_ok=false row
PILL_IDS = (100, 101)


def payloads() -> list[tuple[int, bytes]]:
    """(img_id, payload) for every case + the poison pills — re-encoded
    from the recipe on each call (the encoder is deterministic; freezing
    the recipe instead of payload hex keeps the ENCODER on the hash
    too)."""
    from .functions.jpeg import encode_jpeg_baseline

    out = []
    for img_id, kind, w, h, seed, sampling, ri in JPEG_CASES:
        out.append(
            (
                img_id,
                encode_jpeg_baseline(
                    w, h, _raster(kind, w, h, seed), sampling=sampling, restart_interval=ri
                ),
            )
        )
    base = out[0][1]
    out.append((PILL_IDS[0], base[: len(base) * 2 // 3]))
    sof = base.find(b"\xff\xc0")
    out.append((PILL_IDS[1], base[:sof] + b"\xff\xc2" + base[sof + 2 :]))
    return out


def media_df(spark):
    """The frozen corpus as the (doc_id, payload) frame image_stats
    expects."""
    return spark.createDataFrame(
        [(int(i), bytearray(p)) for i, p in payloads()],
        "doc_id bigint, payload binary",
    )


def expected_oracle_sql() -> str:
    """The frozen expected stats as a DuckDB VALUES table (exact repr
    literals; see module docstring for provenance)."""
    rows = []
    for img_id, ok, w, h, mr, mg, mb in EXPECTED_STATS:
        if ok:
            # floats go through VARCHAR -> DOUBLE (strtod is correctly
            # rounded, bit-identical to Python's float parse; a DECIMAL
            # literal could land 1 ulp off the frozen double)
            rows.append(
                f"({img_id}, true, {w}, {h}, '{mr!r}', '{mg!r}', '{mb!r}')"
            )
        else:
            rows.append(
                f"({img_id}, false, NULL, NULL, NULL, NULL, NULL)"
            )
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, decode_ok,\n"
        "       CAST(width AS INT) AS width, CAST(height AS INT) AS height,\n"
        "       CAST(mean_r AS DOUBLE) AS mean_r, CAST(mean_g AS DOUBLE) AS mean_g,\n"
        "       CAST(mean_b AS DOUBLE) AS mean_b\n"
        "FROM (VALUES\n  " + ",\n  ".join(rows) + "\n"
        ") AS t(doc_id, decode_ok, width, height, mean_r, mean_g, mean_b)"
    )


# fmt: off
# frozen at fixture-build time (round 9) by decoding payloads() through
# operators/multimodal.image_stats' exact floor-to-micros arithmetic —
# regenerate ONLY on an intentional codec change, via:
#   python -c "import lichess_event_stream_watcher_spark.artifacts_jpeg as a; print(a.compute_expected_repr())"
EXPECTED_STATS: list = [
    (0, True, 16, 16, 127.4375, 127.207031, 63.523437),
    (1, True, 40, 24, 126.963541, 126.873958, 62.867708),
    (2, True, 48, 32, 126.70638, 127.182942, 63.27539),
    (3, True, 48, 32, 127.197265, 127.009765, 62.939453),
    (4, True, 48, 32, 126.949869, 127.052734, 63.276041),
    (5, True, 21, 17, 127.243697, 126.521008, 61.817927),
    (6, True, 16, 16, 36.0, 169.0, 52.0),
    (7, True, 24, 8, 42.0, 116.0, 189.0),
    (8, True, 32, 32, 127.664062, 119.875, 126.146484),
    (9, True, 32, 32, 125.815429, 120.17871, 125.078125),
    (10, True, 32, 32, 127.519531, 126.757812, 127.234375),
    (11, True, 24, 24, 127.57118, 127.689236, 127.126736),
    (12, True, 80, 16, 126.86875, 127.660156, 62.580468),
    (13, True, 48, 16, 127.009114, 127.777343, 128.141927),
    (14, True, 40, 40, 127.8125, 118.301875, 125.8925),
    (15, True, 64, 48, 126.916341, 127.010416, 63.237304),
    (16, True, 16, 48, 128.089843, 128.070312, 127.398437),
    (17, True, 8, 8, 252.0, 119.0, 236.0),
    (100, False, None, None, None, None, None),
    (101, False, None, None, None, None, None),
]
# fmt: on


def compute_expected_repr() -> str:
    """Fixture-build helper: decode the recipe payloads through the SAME
    floor-to-micros arithmetic as image_stats and emit the EXPECTED_STATS
    literal (used once per intentional codec change; never at query
    time)."""
    from .operators.multimodal import decode_image

    rows = []
    for img_id, payload in payloads():
        try:
            w, h, rgb = decode_image(payload)
        except ValueError:
            rows.append((img_id, False, None, None, None, None, None))
            continue
        sums = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).sum(axis=0, dtype=np.int64)
        n_px = w * h
        rows.append(
            (
                img_id, True, w, h,
                (int(sums[0]) * 1_000_000 // n_px) / 1e6,
                (int(sums[1]) * 1_000_000 // n_px) / 1e6,
                (int(sums[2]) * 1_000_000 // n_px) / 1e6,
            )
        )
    body = ",\n    ".join(repr(r) for r in rows)
    return f"EXPECTED_STATS: list = [\n    {body},\n]"
