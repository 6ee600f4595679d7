"""From-scratch PNG codec (functions/png.py) — pure numpy/zlib, no Spark
session. PNG is lossless, so the encoder-twin round trip is EXACT; the
decoder additionally covers what the filter-0 encoder never emits
(Sub/Up/Average/Paeth rows, Adam7 interlacing, gray/palette/alpha color
types) via hand-assembled streams built on the module's own chunk/CRC
primitives. Corrupt payloads must raise ValueError (the mapInPandas
poison-pill contract), never struct.error/zlib.error/IndexError."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from lichess_event_stream_watcher_spark.functions.png import (
    _SIGNATURE,
    decode_png,
    encode_png,
)


def _rgb(h: int, w: int) -> bytes:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(1, w - 1)).astype(np.uint8) if w > 1 else (xx * 0).astype(np.uint8)
    g = (yy * 255 // max(1, h - 1)).astype(np.uint8) if h > 1 else (yy * 0).astype(np.uint8)
    b = ((xx * 7 + yy * 13) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=2).tobytes()


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_rows(px: np.ndarray, bpp: int, ftypes: list[int]) -> bytes:
    """FORWARD-filter a (h, w*bpp) raster with the chosen per-row filter
    types — the reference arithmetic from spec §6, written independently
    of the decoder's unfilter."""
    h, stride = px.shape
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        cur = px[y].astype(np.int32)
        out.append(ft)
        for i in range(stride):
            left = int(cur[i - bpp]) if i >= bpp else 0
            up = int(prev[i])
            ul = int(prev[i - bpp]) if i >= bpp else 0
            if ft == 0:
                v = cur[i]
            elif ft == 1:
                v = cur[i] - left
            elif ft == 2:
                v = cur[i] - up
            elif ft == 3:
                v = cur[i] - ((left + up) >> 1)
            else:
                v = cur[i] - _paeth(left, up, ul)
            out.append(int(v) & 0xFF)
        prev = cur
    return bytes(out)


def _assemble(w: int, h: int, depth: int, color_type: int, raw: bytes,
              palette: bytes | None = None, interlace: int = 0) -> bytes:
    out = _SIGNATURE + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    )
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_encoder_twin_roundtrip_is_exact():
    for w, h in ((1, 1), (7, 3), (16, 16), (33, 21)):
        rgb = _rgb(h, w)
        ww, hh, out = decode_png(encode_png(w, h, rgb))
        assert (ww, hh) == (w, h)
        assert out == rgb  # lossless, byte-exact
    with pytest.raises(ValueError):
        encode_png(4, 4, b"\x00" * 5)


def test_all_filter_types_reconstruct():
    """Each filter type alone, then a mixed rotation, against the
    independent forward-filter reference."""
    rgb = _rgb(12, 10)
    px = np.frombuffer(rgb, np.uint8).reshape(12, 30)
    for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        raw = _filter_rows(px, 3, ftypes)
        w, h, out = decode_png(_assemble(10, 12, 8, 2, raw))
        assert (w, h) == (10, 12) and out == rgb, ftypes


def test_color_types_normalize_to_rgb():
    # grayscale replicates across channels
    gray = (np.arange(6 * 5, dtype=np.int64) * 37 % 256).astype(np.uint8).reshape(6, 5)
    raw = _filter_rows(gray.reshape(6, 5), 1, [0, 1])
    w, h, out = decode_png(_assemble(5, 6, 8, 0, raw))
    assert (w, h) == (5, 6)
    assert out == np.repeat(gray[:, :, None], 3, axis=2).tobytes()

    # gray+alpha drops alpha
    ga = np.zeros((6, 10), np.uint8)
    ga[:, 0::2] = gray
    ga[:, 1::2] = 7
    w, h, out = decode_png(_assemble(5, 6, 8, 4, _filter_rows(ga, 2, [2])))
    assert out == np.repeat(gray[:, :, None], 3, axis=2).tobytes()

    # RGBA drops alpha
    rgb = _rgb(4, 4)
    rgba = np.concatenate(
        [np.frombuffer(rgb, np.uint8).reshape(4, 4, 3), np.full((4, 4, 1), 9, np.uint8)],
        axis=2,
    ).reshape(4, 16)
    w, h, out = decode_png(_assemble(4, 4, 8, 6, _filter_rows(rgba, 4, [4])))
    assert out == rgb

    # palette resolves through PLTE
    pal = bytes(range(30))  # 10 entries
    idx = (np.arange(3 * 7, dtype=np.int64) % 10).astype(np.uint8).reshape(3, 7)
    w, h, out = decode_png(_assemble(7, 3, 8, 3, _filter_rows(idx, 1, [1]), palette=pal))
    expect = np.frombuffer(pal, np.uint8).reshape(10, 3)[idx]
    assert out == expect.tobytes()


def test_adam7_interlace():
    """Hand-interlace a raster on the spec's seven pass grids and the
    decoder must merge it back exactly — including edge passes that are
    EMPTY when a dimension is small."""
    for w, h in ((11, 9), (3, 2), (8, 8), (1, 1)):
        rgb = _rgb(h, w)
        full = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        passes = []
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            sub = full[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            passes.append(_filter_rows(sub.reshape(ph, pw * 3), 3, [0, 2]))
        ww, hh, out = decode_png(_assemble(w, h, 8, 2, b"".join(passes), interlace=1))
        assert (ww, hh) == (w, h) and out == rgb, (w, h)


def test_multiple_idat_chunks_concatenate():
    rgb = _rgb(9, 9)
    px = np.frombuffer(rgb, np.uint8).reshape(9, 27)
    z = zlib.compress(_filter_rows(px, 3, [0]))
    cut = len(z) // 2
    payload = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 9, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", z[:cut])
        + _chunk(b"IDAT", z[cut:])
        + _chunk(b"IEND", b"")
    )
    assert decode_png(payload)[2] == rgb


def test_corrupt_payloads_raise_valueerror_only():
    good = encode_png(8, 8, _rgb(8, 8))
    ihdr_at = good.find(b"IHDR") - 4
    cases = [
        b"",
        b"\x89PNG\r\n",  # truncated signature
        _SIGNATURE,  # no chunks
        good[:20],  # truncated IHDR
        good[:-4],  # truncated final CRC
        good[: len(good) - 13],  # missing IEND
        # flip one IHDR byte without fixing the CRC
        good[: ihdr_at + 8] + b"\x01" + good[ihdr_at + 9 :],
        # bit depth 16 (unsupported profile), CRC fixed up
        _assemble(8, 8, 16, 2, b"\x00" * 8),
        # bad color type
        _assemble(8, 8, 8, 5, b"\x00" * 8),
        # zero dimension
        _assemble(0, 8, 8, 2, b"\x00" * 8),
        # filter type 9 in the scanline stream
        _assemble(2, 1, 8, 2, b"\x09" + b"\x00" * 6),
        # decompressed size does not match dimensions
        _assemble(4, 4, 8, 2, b"\x00" * 5),
        # garbage where DEFLATE should be
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", b"not deflate")
        + _chunk(b"IEND", b""),
        # palette image without PLTE / with an out-of-range index
        _assemble(2, 1, 8, 3, b"\x00\x00\x01"),
        _assemble(2, 1, 8, 3, b"\x00\x00\x05", palette=bytes(9)),
        # interlaced stream whose pass data is too long
        _assemble(2, 2, 8, 2, b"\x00" * 40, interlace=1),
        # pixel budget bomb: huge declared frame, tiny IDAT
        _assemble(65535, 65535, 8, 2, b"\x00" * 10),
    ]
    for i, payload in enumerate(cases):
        with pytest.raises(ValueError):
            decode_png(payload)


def test_decode_image_dispatches_png():
    from lichess_event_stream_watcher_spark.operators.multimodal import decode_image

    rgb = _rgb(6, 6)
    w, h, out = decode_image(encode_png(6, 6, rgb))
    assert (w, h) == (6, 6) and out == rgb


def test_decompression_bomb_is_a_poison_pill():
    """Review finding: inflate must be BOUNDED by the IHDR-derived raw
    size — a tiny IDAT expanding to GBs raises ValueError before
    allocating, and a truncated DEFLATE stream (missing adler32) raises
    too, per the ValueError-only contract."""
    bomb = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 50_000_000, 9))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="exceeds declared"):
        decode_png(bomb)

    good = encode_png(8, 8, _rgb(8, 8))
    idat_at = good.find(b"IDAT") - 4
    (idat_len,) = struct.unpack_from(">I", good, idat_at)
    z = good[idat_at + 8 : idat_at + 8 + idat_len]
    cut = z[:-4]  # drop the adler32 tail: stream decodes but never ends
    truncated = (
        good[:idat_at]
        + struct.pack(">I", len(cut))
        + b"IDAT"
        + cut
        + struct.pack(">I", zlib.crc32(b"IDAT" + cut) & 0xFFFFFFFF)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(truncated)


def test_bit_depths_1_2_4_and_16():
    """Round-9 depth generalization: every ISO-15948-valid depth/color
    combination decodes — packed sub-byte gray with exact bit-replication
    scaling, packed palette indices, 16-bit high-byte reduction, and the
    byte-wise filters still applying at the right bpp distance."""
    # 1-bit gray, 10 px wide: rows pack to 2 bytes with 6 padding bits
    w, h = 10, 3
    pattern = [(x + y) % 2 for y in range(h) for x in range(w)]
    rows = bytearray()
    for y in range(h):
        rows.append(0)  # filter None
        bits = pattern[y * w : (y + 1) * w] + [0] * 6
        for i in range(0, 16, 8):
            rows.append(int("".join(map(str, bits[i : i + 8])), 2))
    ww, hh, out = decode_png(_assemble(w, h, 1, 0, bytes(rows)))
    px = np.frombuffer(out, np.uint8).reshape(h, w, 3)
    assert (ww, hh) == (w, h)
    assert all(
        tuple(px[y, x]) == ((255, 255, 255) if pattern[y * w + x] else (0, 0, 0))
        for y in range(h) for x in range(w)
    )

    # 2-bit gray scaling: 0,1,2,3 -> 0,85,170,255 (v * 255 // 3, exact)
    raw = bytes([0, 0b00011011])  # one row, 4 px
    _, _, out = decode_png(_assemble(4, 1, 2, 0, raw))
    assert list(np.frombuffer(out, np.uint8)[::3]) == [0, 85, 170, 255]

    # 4-bit palette: two indices per byte, resolved through PLTE
    pal = bytes(range(48))  # 16 entries
    raw = bytes([0, 0x10, 0x23, 0, 0xFF, 0x01])  # 2 rows x 4 px
    _, _, out = decode_png(_assemble(4, 2, 4, 3, raw, palette=pal))
    expect = np.frombuffer(pal, np.uint8).reshape(16, 3)[
        [1, 0, 2, 3, 15, 15, 0, 1]
    ]
    assert out == expect.tobytes()

    # 16-bit RGB: high byte survives, low byte drops; Sub filter applies
    # at bpp=6 (verified against the independent forward filter)
    rgb16 = np.zeros((2, 3 * 2 * 2), np.uint8)  # (h, w*ch*2) byte grid
    hi = np.array([[10, 200, 30, 40, 250, 60], [1, 2, 3, 4, 5, 6]], np.uint8)
    rgb16[:, 0::2] = hi
    rgb16[:, 1::2] = 123  # low bytes, must be ignored
    raw = _filter_rows(rgb16, 6, [1])  # Sub with the 16-bit bpp
    ww, hh, out = decode_png(_assemble(2, 2, 16, 2, raw))
    assert np.array_equal(np.frombuffer(out, np.uint8).reshape(2, 6), hi)

    # 16-bit gray+alpha: gray high byte replicates, alpha drops
    ga16 = np.zeros((1, 2 * 2 * 2), np.uint8)
    ga16[0, 0::2] = [77, 9, 200, 9]  # gray hi, alpha hi per pixel
    raw = _filter_rows(ga16, 4, [0])
    _, _, out = decode_png(_assemble(2, 1, 16, 4, raw))
    assert list(np.frombuffer(out, np.uint8)) == [77] * 3 + [200] * 3

    # spec-invalid combinations are poison pills
    for depth, ctype in ((2, 2), (16, 3), (4, 6), (3, 0)):
        with pytest.raises(ValueError, match="invalid for color type|filter"):
            decode_png(_assemble(2, 2, depth, ctype, b"\x00" * 8))


def test_sub_byte_interlaced_gray():
    """Adam7 with packed 1-bit rows: per-pass strides are sub-byte, so
    the shared pass-geometry helper and the bit unpacking must agree."""
    w = h = 5
    pattern = np.array(
        [[1, 0, 1, 0, 1], [0, 1, 0, 1, 0], [1, 1, 0, 0, 1], [0, 0, 1, 1, 0], [1, 0, 0, 1, 1]],
        np.uint8,
    )
    passes = []
    for x0, y0, dx, dy in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        sub = pattern[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            passes.append(0)
            byte_row = np.packbits(row)
            passes.extend(byte_row.tolist())
    ww, hh, out = decode_png(_assemble(w, h, 1, 0, bytes(passes), interlace=1))
    px = np.frombuffer(out, np.uint8).reshape(h, w, 3)[:, :, 0]
    assert np.array_equal(px, pattern * 255)
