"""From-scratch GIF87a/89a codec — stdlib + numpy only.

The last library-free image format a web-scrape corpus carries in volume
(WebP/AVIF stay env-gated: their codecs are not re-implementable here).
Covers the full static + animated profile: logical screen descriptor,
global/local color tables, variable-width LZW decompression (3-12 bit
codes, CLEAR/EOI, deferred clear), the 4-pass interlace row order,
graphic control extensions (frame delay, transparency index, all four
disposal methods — unspecified/keep, restore-background,
restore-previous), and frame COMPOSITING onto the logical screen, so an
animated GIF yields one full-canvas RGB raster per frame exactly as a
viewer would show it. The encoder twin writes single- or multi-frame
GIFs from rasters of <= 256 distinct colors (exact palette, full-frame
replace semantics) and is lossless, so frozen-artifact oracles can
derive expected statistics from the recipe rasters with no codec in the
provenance chain (the artifacts_png.py pattern).

Poison-pill contract (shared with jpeg/png/wav/avi): every malformed
input raises ``ValueError`` — never IndexError/struct.error — so the
stats operators map it to one ``decode_ok = false`` row, never a task.

Reference parity: the reference engine has no image path — this module
belongs to the repo's LLM-data-pipeline multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 64_000_000  # per-canvas bound, same as PNG's pixel budget
_MAX_FRAMES = 10_000

# interlace passes: (row start, row step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a data sub-block chain -> (data, position after the
    0x00 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("GIF: truncated sub-block chain")
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(b):
            raise ValueError("GIF: truncated sub-block")
        out += b[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Variable-width LZW (GIF flavor) -> index stream of n_expected
    bytes. Raises ValueError on bad codes or wrong output length."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF: bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state (LSB-first within and across bytes)
    acc = 0
    n_bits = 0
    pos = 0

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = reset_table()
    prev: bytes | None = None
    while True:
        while n_bits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream ended without EOI")
            acc |= data[pos] << n_bits
            n_bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= next_code:
                raise ValueError("GIF: first LZW code out of range")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("GIF: LZW code out of range")
        out += entry
        if len(out) > n_expected:
            raise ValueError("GIF: LZW output exceeds frame size")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) != n_expected:
        raise ValueError(f"GIF: LZW produced {len(out)} of {n_expected} pixels")
    return bytes(out)


def decode_gif_frames(
    b: bytes, max_frames: int | None = None
) -> tuple[int, int, list[bytes]]:
    """GIF -> (width, height, [full-canvas packed RGB, one per frame]),
    composited per the GCE disposal semantics. ``max_frames`` stops the
    decode as soon as that many frames are composited (the first-frame
    view must not pay for a 500-frame animation); a capped decode skips
    trailer validation for the undecoded remainder by design."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", b, 6)
    if w == 0 or h == 0 or w * h > _MAX_PIXELS:
        raise ValueError("GIF: bad logical screen dimensions")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            raise ValueError("GIF: truncated global color table")
        gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_idx < gct.shape[0]:
        canvas[:, :] = gct[bg_idx]
    background = canvas.copy()
    frames: list[bytes] = []
    transparent: int | None = None
    disposal = 0
    saw_trailer = False
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            saw_trailer = True
            break
        if block == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("GIF: truncated extension")
            label = b[pos]
            pos += 1
            data, pos = _sub_blocks(b, pos)
            if label == 0xF9:  # graphic control
                if len(data) < 4:
                    raise ValueError("GIF: short graphic control extension")
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(b):
            raise ValueError("GIF: truncated image descriptor")
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("GIF: frame exceeds logical screen")
        if len(frames) >= _MAX_FRAMES:
            raise ValueError("GIF: frame budget exceeded")
        if (len(frames) + 1) * w * h > _MAX_PIXELS:
            # JOINT bound (review finding, confirmed by a 926-byte payload
            # demanding ~2.9 GB): each composited frame materializes a
            # full canvas, so frames x pixels is the real allocation —
            # cap the AGGREGATE at the pixel budget, or a tiny crafted
            # animation OOMs the task with MemoryError, which the stats
            # operators do not catch
            raise ValueError("GIF: aggregate frame-pixel budget exceeded")
        lct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            if pos + 3 * n > len(b):
                raise ValueError("GIF: truncated local color table")
            lct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF: frame without any color table")
        if pos >= len(b):
            raise ValueError("GIF: missing LZW minimum code size")
        min_code = b[pos]
        pos += 1
        data, pos = _sub_blocks(b, pos)
        idx = np.frombuffer(_lzw_decode(data, min_code, fw * fh), np.uint8)
        if int(idx.max(initial=0)) >= lct.shape[0]:
            raise ValueError("GIF: pixel index outside color table")
        if fpacked & 0x40:  # interlaced: reorder rows into display order
            grid = idx.reshape(fh, fw)
            display = np.empty_like(grid)
            src = 0
            for start, step in _INTERLACE:
                rows = range(start, fh, step)
                for r in rows:
                    display[r] = grid[src]
                    src += 1
            idx = display.reshape(-1)
        grid = idx.reshape(fh, fw)
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[fy : fy + fh, fx : fx + fw]
        rgb = lct[grid]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.tobytes())
        if max_frames is not None and len(frames) >= max_frames:
            return int(w), int(h), frames
        if disposal == 2:  # restore the frame region to background
            canvas[fy : fy + fh, fx : fx + fw] = background[fy : fy + fh, fx : fx + fw]
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent = None
        disposal = 0
    if not saw_trailer:
        raise ValueError("GIF: missing trailer")
    if not frames:
        raise ValueError("GIF: no image data")
    return int(w), int(h), frames


def decode_gif(b: bytes) -> tuple[int, int, bytes]:
    """First composited frame — the static-image view ``decode_image``
    dispatches to. Stops decoding after frame 1, so an animated GIF in
    the stats hot path costs one LZW decode, not n_frames of them."""
    w, h, frames = decode_gif_frames(b, max_frames=1)
    return w, h, frames[0]


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    n_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: reset (the simple conformant strategy)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(w: int, h: int, rgb_frames: list[bytes], delay_cs: int = 4) -> bytes:
    """Rasters (each <= 256 distinct colors, full-frame) -> GIF89a with
    one shared exact palette; lossless replace-semantics animation."""
    if not rgb_frames:
        raise ValueError("encode_gif: no frames")
    if w < 1 or h < 1 or w * h > _MAX_PIXELS:
        raise ValueError("encode_gif: bad dimensions")
    for f in rgb_frames:
        if len(f) != w * h * 3:
            raise ValueError(f"encode_gif: frame has {len(f)} bytes != {w}x{h}x3")
    px = np.stack(
        [np.frombuffer(f, np.uint8).reshape(-1, 3) for f in rgb_frames]
    ).reshape(-1, 3)
    palette, inverse = np.unique(px, axis=0, return_inverse=True)
    if palette.shape[0] > 256:
        raise ValueError(f"encode_gif: {palette.shape[0]} colors exceed the 256-color palette")
    depth = max(1, int(palette.shape[0] - 1).bit_length())
    table_size = 1 << depth
    pal_bytes = palette.tobytes() + b"\x00" * (3 * (table_size - palette.shape[0]))
    min_code = max(2, depth)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07) | ((depth - 1) << 4), 0, 0)
    out += pal_bytes
    per_frame = w * h
    codes = inverse.astype(np.uint8)
    for i in range(len(rgb_frames)):
        out += bytes([0x21, 0xF9, 4, 0x04, delay_cs & 0xFF, (delay_cs >> 8) & 0xFF, 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode(codes[i * per_frame : (i + 1) * per_frame].tobytes(), min_code)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
