"""From-scratch PNG codec (ISO/IEC 15948 / RFC 2083) — stdlib + numpy only.

The remaining image format the container can decode without codec
libraries: chunk framing, IHDR/PLTE/IDAT/IEND parsing with CRC-32
verification, DEFLATE via the stdlib ``zlib`` module (a public,
deterministic inflate — the one compression primitive the spec
delegates), all five scanline filters (None/Sub/Up/Average/Paeth, spec
§6), Adam7 deinterlacing, and EVERY spec-valid depth/color-type
combination — 1/2/4-bit packed gray and palette, 8-bit everything,
16-bit gray/RGB/alpha reduced to the high byte — normalized to packed
RGB like every other decoder in ``operators/multimodal.py``. The encoder twin emits non-interlaced
filter-0 RGB — PNG is lossless, so ``decode(encode(x)) == x`` exactly,
which is what makes a future frozen-artifact driver row for this branch
fully derivable from the recipe rasters alone.

Poison-pill contract (shared with jpeg.py/netpbm): every malformed input
raises ``ValueError`` — never IndexError/struct.error/zlib.error — so
``image_stats`` maps it to one ``decode_ok = false`` row, never a task
failure.

Reference parity: the reference engine has no image codec — this module
belongs to the repo's LLM-data-pipeline multimodal surface.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel, per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# spec-valid bit depths per color type (ISO 15948 table 11.1)
_VALID_DEPTHS = {0: {1, 2, 4, 8, 16}, 2: {8, 16}, 3: {1, 2, 4, 8}, 4: {8, 16}, 6: {8, 16}}

# Adam7 pass grids: (x_start, y_start, x_step, y_step), spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_passes(w: int, h: int):
    """Yield (x0, y0, dx, dy, pass_w, pass_h) for each NON-EMPTY Adam7
    pass — the single source of pass geometry for both the bounded-inflate
    size guard and the deinterlace loop (they must never disagree)."""
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            yield x0, y0, dx, dy, pw, ph


def _chunks(b: bytes):
    """Yield (type, data) for each chunk, CRC-verified."""
    pos = 8
    n = len(b)
    while pos < n:
        if pos + 8 > n:
            raise ValueError("PNG: truncated chunk header")
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        if length > n - pos - 12:
            raise ValueError("PNG: truncated chunk data")
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG: CRC mismatch in {ctype!r}")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG: missing IEND")


def _paeth(a: int, bb: int, c: int) -> int:
    p = a + bb - c
    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return bb if pb <= pc else c


def _unfilter(raw: bytes, stride: int, h: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters -> (h, stride) uint8 array.
    ``stride`` is the BYTE width of a row (sub-byte depths pack pixels,
    so it is ceil(w * depth * channels / 8)); ``bpp`` is the filter
    distance in bytes (max(1, depth * channels // 8), spec §6).

    Fast paths: filters 0 (None) and 2 (Up) are whole-row numpy ops, and
    filter 1 (Sub) is a per-residue-class cumulative sum — the common
    encoder outputs. Filters 3/4 carry an intra-row serial dependency
    (each byte needs the just-reconstructed LEFT byte), so they take a
    per-byte loop; that cost is bounded per image and the decode runs
    inside Arrow-batched ``mapInPandas`` workers, so a pathological
    all-Paeth corpus costs CPU, not a re-architecture."""
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: decompressed data does not match dimensions")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    if np.any(ftypes > 4):
        raise ValueError("PNG: invalid filter type")
    out = np.zeros((h, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        ft = int(ftypes[y])
        cur = rows[y, 1:].astype(np.uint16)
        if ft == 0:
            rec = cur
        elif ft == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ft == 1:  # Sub: cumsum per residue class mod bpp
            rec = cur.copy()
            for r in range(bpp):
                rec[r::bpp] = np.cumsum(cur[r::bpp].astype(np.int64)) & 0xFF
        elif ft == 3:  # Average
            rec = np.empty(stride, np.uint16)
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        else:  # Paeth
            rec = np.empty(stride, np.uint16)
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                rec[i] = (int(cur[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def _expand_rows(rows: np.ndarray, w: int, depth: int, channels: int) -> np.ndarray:
    """Unfiltered (h, stride) row bytes -> (h, w, channels) 8-bit samples.
    Depth 16 keeps the most-significant byte (the standard 16 -> 8
    reduction); sub-byte depths unpack MSB-first packed pixels — row
    padding bits fall away with the ``: w * depth`` slice. Scaling gray
    samples onto 0..255 (and resolving palette indices) is _to_rgb's
    job."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        return rows[:, : w * channels * 2].reshape(h, w, channels, 2)[:, :, :, 0]
    # depths 1/2/4: single-channel (gray or palette index), packed
    bits = np.unpackbits(rows, axis=1)[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[:, :, None]


def _to_rgb(
    px: np.ndarray, color_type: int, palette: bytes | None, depth: int
) -> np.ndarray:
    """(h, w, channels) -> (h, w, 3) packed RGB (alpha dropped, palette
    resolved, gray replicated — sub-byte gray samples scale onto 0..255
    by bit replication, exact: v * 255 // (2^depth - 1))."""
    if color_type == 2:
        return px
    if color_type == 6:
        return px[:, :, :3]
    if color_type in (0, 4):
        g = px[:, :, :1]
        if depth < 8:
            g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.repeat(g, 3, axis=2)
    # palette
    if palette is None or len(palette) % 3 or not palette:
        raise ValueError("PNG: palette image without a valid PLTE")
    pal = np.frombuffer(palette, np.uint8).reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("PNG: palette index out of range")
    return pal[idx]


def decode_png(b: bytes) -> tuple[int, int, bytes]:
    """PNG -> (width, height, packed RGB bytes). ValueError on anything
    malformed or outside the spec profile (every ISO-15948-valid
    depth/color-type combination decodes: 1/2/4-bit gray + palette,
    8-bit everything, 16-bit reduced to the high byte; interlace 0 or
    Adam7)."""
    if b[:8] != _SIGNATURE:
        raise ValueError("PNG: bad signature")
    ihdr = None
    palette: bytes | None = None
    idat = bytearray()
    saw_end = False
    for ctype, data in _chunks(b):
        if ihdr is None:
            if ctype != b"IHDR" or len(data) != 13:
                raise ValueError("PNG: first chunk is not a valid IHDR")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            saw_end = True
    if ihdr is None or not saw_end:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if not (0 < w and 0 < h):
        raise ValueError("PNG: zero dimension")
    if w * h > 64_000_000:
        raise ValueError("PNG: pixel budget exceeded")  # poison-pill bound
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    if depth not in _VALID_DEPTHS[color_type]:
        raise ValueError(f"PNG: bit depth {depth} invalid for color type {color_type}")
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError("PNG: unsupported compression/filter/interlace")
    if not idat:
        raise ValueError("PNG: no IDAT data")
    channels = _CHANNELS[color_type]
    bits_pp = depth * channels
    bpp = max(1, bits_pp // 8)  # the byte-wise filter distance (spec §6)

    def row_bytes(width: int) -> int:
        return (width * bits_pp + 7) // 8

    # the exact decompressed size is derivable from IHDR, so inflate is
    # BOUNDED to it: a decompression-bomb payload (tiny IDAT, huge
    # expansion) hits the cap and raises ValueError instead of allocating
    # multi-GB before _unfilter's length check — the poison-pill contract
    # also covers allocation, not just parsing
    if interlace == 0:
        expected = h * (row_bytes(w) + 1)
    else:
        expected = sum(ph * (row_bytes(pw) + 1) for *_xy, pw, ph in _adam7_passes(w, h))
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except (zlib.error, MemoryError) as e:
        raise ValueError(f"PNG: inflate failed: {e}") from None
    if len(raw) > expected or dec.unconsumed_tail:
        raise ValueError("PNG: decompressed data exceeds declared dimensions")
    if not dec.eof:
        raise ValueError("PNG: DEFLATE stream incomplete")
    if interlace == 0:
        px = _expand_rows(_unfilter(raw, row_bytes(w), h, bpp), w, depth, channels)
    else:
        # Adam7: seven independently-filtered sub-images, merged on the
        # pass grids
        px = np.zeros((h, w, channels), np.uint8)
        pos = 0
        for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h):
            size = ph * (row_bytes(pw) + 1)
            sub = _expand_rows(
                _unfilter(raw[pos : pos + size], row_bytes(pw), ph, bpp),
                pw, depth, channels,
            )
            px[y0::dy, x0::dx] = sub
            pos += size
        if pos != len(raw):
            raise ValueError("PNG: interlaced data does not match dimensions")
    rgb = _to_rgb(px, color_type, palette, depth)
    return w, h, np.ascontiguousarray(rgb).tobytes()


def encode_png(w: int, h: int, rgb: bytes) -> bytes:
    """Non-interlaced filter-0 8-bit RGB PNG — the lossless encoder twin
    (``decode_png(encode_png(w, h, x)) == x`` exactly)."""
    if len(rgb) != w * h * 3:
        raise ValueError(f"encode_png: {len(rgb)} bytes != {w}x{h}x3")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    px = np.frombuffer(rgb, np.uint8).reshape(h, w * 3)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), px], axis=1).tobytes()
    return (
        _SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
