"""From-scratch image decode (round 7): PPM (P6/P3) + uncompressed
24-bit BMP, and the Spark operators wired over them (image_stats,
resize_image). The decoder tests are pure Python (no session); the
operator tests drive the real mapInPandas plumbing.

Reference formats: the published netpbm PPM spec and the Windows
BITMAPINFOHEADER layout — public knowledge, implemented from scratch
(the same move as functions/mmdb.py and functions/uap.py)."""

from __future__ import annotations

import struct

import pytest

from lichess_event_stream_watcher_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_ppm,
    image_stats,
    resize_image,
)


def _bmp_24(w: int, h: int, rgb: bytes, top_down: bool = False) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (test-only twin of
    decode_bmp): BGR pixels, 4-byte-aligned rows, bottom-up unless
    top_down."""
    stride = (w * 3 + 3) // 4 * 4
    pix = bytearray()
    row_order = range(h) if top_down else range(h - 1, -1, -1)
    for row in row_order:
        line = bytearray()
        for x in range(w):
            s = (row * w + x) * 3
            line += bytes((rgb[s + 2], rgb[s + 1], rgb[s]))  # RGB -> BGR
        line += b"\x00" * (stride - len(line))
        pix += line
    h_field = -h if top_down else h
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h_field, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + dib + bytes(pix)


# 2x2 test image: R, G / B, white
RGB_2X2 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])


def test_ppm_p6_roundtrip():
    b = encode_ppm(2, 2, RGB_2X2)
    assert decode_ppm(b) == (2, 2, RGB_2X2)
    assert decode_image(b) == (2, 2, RGB_2X2)


def test_ppm_p6_header_comments_and_whitespace():
    b = b"P6 # comment right after magic\n# full-line comment\n 2\t2 # dims\n255\n" + RGB_2X2
    assert decode_ppm(b) == (2, 2, RGB_2X2)


def test_ppm_p6_raster_may_start_with_whitespace_byte():
    # the single post-maxval delimiter rule: a raster whose first byte is
    # 0x20 (ascii space) must NOT be eaten as extra whitespace
    rgb = bytes([0x20] * 12)
    assert decode_ppm(b"P6\n2 2\n255\n" + rgb) == (2, 2, rgb)


def test_ppm_p3_ascii():
    vals = " ".join(str(v) for v in RGB_2X2)
    b = f"P3\n2 2\n255\n{vals}\n".encode()
    assert decode_ppm(b) == (2, 2, RGB_2X2)


def test_ppm_errors():
    with pytest.raises(ValueError, match="magic"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00")
    with pytest.raises(ValueError, match="exceeds maxval"):
        decode_ppm(b"P3\n1 1\n10\n11 0 0\n")


def test_bmp_bottom_up_and_top_down():
    assert decode_bmp(_bmp_24(2, 2, RGB_2X2)) == (2, 2, RGB_2X2)
    assert decode_bmp(_bmp_24(2, 2, RGB_2X2, top_down=True)) == (2, 2, RGB_2X2)
    # odd width exercises row padding (3*3 = 9 bytes -> 12-byte stride)
    rgb3 = bytes(range(3 * 1 * 3))
    assert decode_bmp(_bmp_24(3, 1, rgb3)) == (3, 1, rgb3)


def test_bmp_errors():
    with pytest.raises(ValueError, match="magic|truncated"):
        decode_bmp(b"BM too short")
    bad_bpp = bytearray(_bmp_24(1, 1, b"\x00\x00\x00"))
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="unsupported bpp"):
        decode_bmp(bytes(bad_bpp))


def test_decode_image_dispatch_and_unsupported_magic():
    # PNG dispatches to the round-9 decoder (so the error is the PNG
    # parser's, not 'unsupported magic'); audio/video magics stay gated
    with pytest.raises(ValueError, match="PNG"):
        decode_image(b"\x89PNG\r\n\x1a\n...")
    with pytest.raises(ValueError, match="magic"):
        decode_image(b"RIFF....WAVE")


def test_image_stats_real_pixels_and_poison_pill(spark):
    rows = [
        (1, encode_ppm(2, 2, RGB_2X2)),
        (2, _bmp_24(2, 2, RGB_2X2)),
        (3, b"\xff\xd8\xff\xe0 fake jpeg"),  # unsupported -> decode_ok false
        (4, b"P6\n2 2\n255\n\x00"),  # truncated raster -> decode_ok false
        (5, None),  # NULL payload: one false row, never a task failure
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in image_stats(media).collect()}
    assert len(got) == 5
    assert not got[5].decode_ok and got[5].width is None
    for doc_id in (1, 2):
        r = got[doc_id]
        assert r.decode_ok and (r.width, r.height) == (2, 2)
        # channel means of RGB_2X2: R=(255+0+0+255)/4=127.5, same G, B
        assert r.mean_r == r.mean_g == r.mean_b == 127.5
    for doc_id in (3, 4):
        r = got[doc_id]
        assert not r.decode_ok
        assert r.width is None and r.mean_r is None


def test_resize_image_nearest_neighbor_exact_upscale(spark):
    media = spark.createDataFrame(
        [(1, encode_ppm(2, 2, RGB_2X2)), (2, b"not an image"), (3, None)],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in resize_image(media, width=4, height=4).collect()}
    assert list(out) == [1]  # undecodable / NULL rows drop out
    r = out[1]
    assert (r.meta.width, r.meta.height) == (4, 4)
    w, h, rgb = decode_ppm(bytes(r.payload))
    assert (w, h) == (4, 4)
    # integer 2x upscale: every source pixel becomes an exact 2x2 block
    for y in range(4):
        for x in range(4):
            s = ((y // 2) * 2 + (x // 2)) * 3
            d = (y * 4 + x) * 3
            assert rgb[d : d + 3] == RGB_2X2[s : s + 3], (x, y)


def test_image_stats_over_jpeg_payloads(spark):
    """End-to-end: baseline-JPEG payloads through the Arrow-batched
    image_stats operator — per-channel means must match a local decode of
    the same bytes, and a corrupt JPEG costs one decode_ok=false row."""
    import numpy as np

    from lichess_event_stream_watcher_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_baseline,
    )
    from lichess_event_stream_watcher_spark.operators import multimodal as M

    def img(seed: int, w: int, h: int) -> bytes:
        idx = np.arange(w * h * 3, dtype=np.int64)
        return ((idx * (seed * 2 + 1) * 97) % 256).astype(np.uint8).tobytes()

    payloads = [
        (0, encode_jpeg_baseline(16, 16, img(0, 16, 16))),
        (1, encode_jpeg_baseline(24, 8, img(1, 24, 8), subsample=True)),
        (2, encode_jpeg_baseline(40, 16, img(2, 40, 16), restart_interval=2)),
        (3, b"\xff\xd8corrupt"),
    ]
    df = spark.createDataFrame(payloads, "doc_id bigint, payload binary")
    rows = {r["doc_id"]: r for r in M.image_stats(df).collect()}
    assert rows[3]["decode_ok"] is False and rows[3]["width"] is None
    for doc_id, payload in payloads[:3]:
        w, h, rgb = decode_jpeg(payload)
        got = rows[doc_id]
        assert (got["width"], got["height"]) == (w, h) and got["decode_ok"] is True
        sums = np.frombuffer(rgb, np.uint8).reshape(-1, 3).sum(axis=0, dtype=np.int64)
        n_px = w * h
        for ch, col in enumerate(("mean_r", "mean_g", "mean_b")):
            assert got[col] == (int(sums[ch]) * 1_000_000 // n_px) / 1e6


def test_documents_corpus_is_pure_ascii():
    """Round-9 ADVICE pin: the image_stats/resize_image oracles equate
    Spark's char-based length/substring + UTF-8 encode with DuckDB's
    unicode()/md5-over-string — valid ONLY while every document text is
    pure ASCII (1 char == 1 byte == 1 codepoint). Pin the fixture property
    at every SF the oracles run at, so generator drift fails loudly here
    instead of as an opaque driver hash mismatch."""
    import os

    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        n_bad = duckdb.sql(
            f"SELECT count(*) FROM '{path}' "
            "WHERE text IS NOT NULL AND octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n_bad == 0, f"sf{sf}: {n_bad} non-ASCII document texts"


def test_image_stats_png_staged_row_matches_frozen_oracle(spark, duck):
    """Dress rehearsal of the round-10 driver row (artifacts_png.py): the
    staged Spark query (encode_png recipes -> Arrow-batched image_stats)
    must match the frozen raster-ground-truth VALUES oracle exactly,
    pills included — the same compare the driver runs."""
    from lichess_event_stream_watcher_spark import artifacts_png as A

    from conftest import driver_norm

    got = A.staged_query(spark, "unused").toPandas()
    exp = duck.sql(A.expected_oracle_sql()).df()
    assert len(got) == len(exp) == len(A.PNG_CASES) + len(A.GIF_CASES) + 3
    assert driver_norm(got) == driver_norm(exp)


def test_bmp_32bit_bgra():
    """Round 9: 32-bit BI_RGB BMPs (BGRA/BGRX, the screenshot format)
    decode with the alpha/padding byte dropped; rows have no padding at
    32 bpp so odd widths are exact."""
    import struct as _s

    def bmp32(w, h, rgb, top_down=False):
        pix = bytearray()
        rows = range(h) if top_down else range(h - 1, -1, -1)
        for row in rows:
            for x in range(w):
                s = (row * w + x) * 3
                pix += bytes((rgb[s + 2], rgb[s + 1], rgb[s], 0x7F))  # BGRA
        header = b"BM" + _s.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 54)
        dib = _s.pack(
            "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 32, 0, len(pix), 0, 0, 0, 0
        )
        return header + dib + bytes(pix)

    assert decode_bmp(bmp32(2, 2, RGB_2X2)) == (2, 2, RGB_2X2)
    assert decode_bmp(bmp32(2, 2, RGB_2X2, top_down=True)) == (2, 2, RGB_2X2)
    rgb3 = bytes(range(3 * 1 * 3))
    assert decode_bmp(bmp32(3, 1, rgb3)) == (3, 1, rgb3)
    assert decode_image(bmp32(2, 2, RGB_2X2)) == (2, 2, RGB_2X2)
    # truncated 32-bit pixel array is still a pill
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bmp32(2, 2, RGB_2X2)[:-5])


def test_bmp_32bit_bitfields_identity_masks():
    """BI_BITFIELDS (compression=3) with the standard identity BGRA
    masks — what Windows screenshot tooling writes — decodes identically
    to BI_RGB; non-standard masks stay poison pills."""
    import struct as _s

    def bmp32_bf(w, h, rgb, masks=(0x00FF0000, 0x0000FF00, 0x000000FF)):
        pix = bytearray()
        for row in range(h - 1, -1, -1):
            for x in range(w):
                s = (row * w + x) * 3
                pix += bytes((rgb[s + 2], rgb[s + 1], rgb[s], 0xFF))
        off = 14 + 40 + 12
        header = b"BM" + _s.pack("<IHHI", off + len(pix), 0, 0, off)
        dib = _s.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 3, len(pix), 0, 0, 0, 0)
        return header + dib + _s.pack("<III", *masks) + bytes(pix)

    assert decode_bmp(bmp32_bf(2, 2, RGB_2X2)) == (2, 2, RGB_2X2)
    with pytest.raises(ValueError, match="masks"):
        decode_bmp(bmp32_bf(2, 2, RGB_2X2, masks=(0xFF, 0xFF00, 0xFF0000)))
    # BI_BITFIELDS on 24-bit stays unsupported
    bad = bytearray(bmp32_bf(2, 2, RGB_2X2))
    import struct as _s2
    _s2.pack_into("<H", bad, 28, 24)
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))
