"""From-scratch GIF87a/89a codec (functions/gif.py) — pure numpy, no
Spark session. The encoder twin is lossless (exact shared palette,
full-frame replace), so round trips are byte-exact; the decoder
additionally covers what the twin never emits: interlacing, sub-rect
frames, transparency, all four disposal methods, local color tables,
and the LZW table-reset path. Corrupt payloads must raise ValueError
only (the mapInPandas poison-pill contract)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lichess_event_stream_watcher_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def _raster(w: int, h: int, seed: int = 0, colors: int = 200) -> bytes:
    """<= `colors` distinct colors so the exact-palette encoder accepts."""
    idx = (np.arange(w * h, dtype=np.int64) * 2654435761 + seed) % colors
    pal = np.stack(
        [(np.arange(colors) * 7) % 256, (np.arange(colors) * 57) % 256,
         (np.arange(colors) * 97) % 256],
        axis=1,
    ).astype(np.uint8)
    return pal[idx].tobytes()


def test_lzw_primitive_roundtrip_including_table_reset():
    for min_code in (2, 4, 8):
        n_sym = 1 << min_code
        # long varied stream: forces width growth to 12 bits and at least
        # one table-full CLEAR/reset cycle
        data = bytes(
            int(v) for v in (np.arange(30_000, dtype=np.int64) * 2654435761) % n_sym
        )
        assert _lzw_decode(_lzw_encode(data, min_code), min_code, len(data)) == data


def test_single_frame_roundtrip_is_exact():
    for w, h in ((1, 1), (13, 7), (16, 16)):
        rgb = _raster(w, h, seed=3)
        ww, hh, out = decode_gif(encode_gif(w, h, [rgb]))
        assert (ww, hh, out) == (w, h, rgb)
    with pytest.raises(ValueError, match="colors"):
        # 300 pixels, every one a distinct color
        i = np.arange(300, dtype=np.int64)
        px = np.stack([i % 256, i // 256, i * 0], axis=1).astype(np.uint8)
        encode_gif(20, 15, [px.tobytes()])


def test_animation_roundtrip_and_first_frame_view():
    frames = [_raster(10, 8, seed=s) for s in (0, 1, 2)]
    payload = encode_gif(10, 8, frames, delay_cs=7)
    w, h, got = decode_gif_frames(payload)
    assert (w, h) == (10, 8) and got == frames  # full-frame replace: exact
    assert decode_gif(payload)[2] == frames[0]


def _hand_gif(w, h, blocks, gct_colors=4):
    """Assemble a GIF from raw block bytes over a tiny fixed GCT."""
    pal = b"".join(bytes((i * 60, 255 - i * 60, i * 30)) for i in range(gct_colors))
    depth = max(1, (gct_colors - 1).bit_length())
    pal += b"\x00" * (3 * ((1 << depth) - gct_colors))
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0) + pal
    return head + b"".join(blocks) + b"\x3b"


def _img_block(fx, fy, fw, fh, indices, interlace=False, min_code=2):
    lzw = _lzw_encode(bytes(indices), min_code)
    body = bytearray(struct.pack("<BHHHHB", 0x2C, fx, fy, fw, fh, 0x40 if interlace else 0))
    body.append(min_code)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        body.append(len(chunk))
        body += chunk
    body.append(0)
    return bytes(body)


def _gce(disposal=0, transparent=None):
    flags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
    return bytes([0x21, 0xF9, 4, flags, 0, 0, transparent or 0, 0])


def test_interlaced_frame_reorders_rows():
    """Hand-interlace an 8-row frame: rows stored in pass order
    (0,4,2,6,1,3,5,7 for h=8) must come back in display order."""
    w, h = 4, 8
    display = [[(r % 4) for _ in range(w)] for r in range(h)]
    pass_order = [0, 4, 2, 6, 1, 3, 5, 7]
    stored = []
    for r in pass_order:
        stored += display[r]
    payload = _hand_gif(w, h, [_img_block(0, 0, w, h, stored, interlace=True)])
    _, _, frames = decode_gif_frames(payload)
    pal = [bytes((i * 60, 255 - i * 60, i * 30)) for i in range(4)]
    expect = b"".join(pal[v] for row in display for v in row)
    assert frames[0] == expect


def test_subrect_transparency_and_disposal_compositing():
    """Frame 2 is a 2x2 sub-rect with a transparent index over frame 1;
    disposal=3 (restore previous) makes frame 3 start from frame 1's
    canvas again; disposal=2 restores the background region."""
    w = h = 4
    base = [0] * 16  # full-frame color 0
    sub = [1, 2, 2, 1]  # 2x2 at (1,1), index 2 transparent
    blocks = [
        _img_block(0, 0, w, h, base),
        _gce(disposal=3, transparent=2),
        _img_block(1, 1, 2, 2, sub),
        _gce(),
        _img_block(0, 0, w, h, [3] * 16),
    ]
    _, _, frames = decode_gif_frames(_hand_gif(w, h, blocks))
    pal = [bytes((i * 60, 255 - i * 60, i * 30)) for i in range(4)]
    f1 = np.frombuffer(frames[0], np.uint8).reshape(h, w, 3)
    f2 = np.frombuffer(frames[1], np.uint8).reshape(h, w, 3)
    f3 = np.frombuffer(frames[2], np.uint8).reshape(h, w, 3)
    assert bytes(f1[0, 0]) == pal[0]
    # transparent cells keep frame 1's color; opaque corners take color 1
    assert bytes(f2[1, 1]) == pal[1] and bytes(f2[1, 2]) == pal[0]
    assert bytes(f2[2, 1]) == pal[0] and bytes(f2[2, 2]) == pal[1]
    # disposal=3 restored frame 1's canvas before frame 3 painted over all
    assert (f3 == np.frombuffer(pal[3] * 16, np.uint8).reshape(h, w, 3)).all()

    # disposal=2: the sub-rect region returns to the background color
    blocks2 = [
        _img_block(0, 0, w, h, base),
        _gce(disposal=2),
        _img_block(1, 1, 2, 2, [1] * 4),
        _gce(),
        _img_block(0, 0, 1, 1, [3]),  # tiny frame so the canvas shows through
    ]
    _, _, frames2 = decode_gif_frames(_hand_gif(w, h, blocks2))
    f3b = np.frombuffer(frames2[2], np.uint8).reshape(h, w, 3)
    assert bytes(f3b[1, 1]) == pal[0]  # background-restored, not color 1
    assert bytes(f3b[0, 0]) == pal[3]


def test_corrupt_payloads_raise_valueerror_only():
    good = encode_gif(8, 8, [_raster(8, 8)])
    cases = [
        b"",
        b"GIF8",
        b"GIF89a",  # no screen descriptor
        good[:20],  # truncated GCT
        good[:-1],  # missing trailer
        good[:-2] + b"\xff\x3b",  # dangling unknown block
        # zero dimensions / pixel bomb
        b"GIF89a" + struct.pack("<HHBBB", 0, 5, 0, 0, 0) + b"\x3b",
        b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0) + b"\x3b",
        # frame exceeding the logical screen
        _hand_gif(4, 4, [_img_block(3, 3, 2, 2, [0, 1, 2, 3])]),
        # LZW stream shorter than the frame
        _hand_gif(4, 4, [_img_block(0, 0, 4, 4, [0] * 15)]),
        # pixel index outside the color table (min_code wider than the
        # table depth lets LZW carry symbols the 4-entry GCT lacks)
        _hand_gif(2, 1, [_img_block(0, 0, 2, 1, [0, 100], min_code=7)]),
        # no frames at all
        b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x3b",
    ]
    for i, payload in enumerate(cases):
        with pytest.raises(ValueError):
            decode_gif_frames(payload)
    with pytest.raises(ValueError):
        encode_gif(2, 2, [])


def test_decode_image_dispatches_gif():
    from lichess_event_stream_watcher_spark.operators.multimodal import decode_image

    rgb = _raster(6, 5, seed=9)
    w, h, out = decode_image(encode_gif(6, 5, [rgb]))
    assert (w, h) == (6, 5) and out == rgb


def test_animation_memory_bomb_and_first_frame_cost():
    """Review finding (confirmed pre-fix with a 926-byte / 2.9 GB
    payload): frames x canvas is the REAL allocation, so the aggregate
    frame-pixel budget must bound it; and the first-frame view must stop
    after one composited frame instead of decoding the whole animation."""
    import time

    # many 1x1 frames on a large canvas: per-frame pixel budget passes,
    # the aggregate must not
    w = h = 4000
    blocks = [_img_block(0, 0, 1, 1, [0]) for _ in range(60)]
    bomb = _hand_gif(w, h, blocks)
    with pytest.raises(ValueError, match="aggregate"):
        decode_gif_frames(bomb)

    # decode_gif (first-frame view) must return without paying for the
    # remaining 59 frames — and therefore also without tripping the
    # aggregate bound
    t0 = time.perf_counter()
    ww, hh, rgb = decode_gif(bomb)
    assert (ww, hh) == (w, h) and len(rgb) == w * h * 3
    assert time.perf_counter() - t0 < 5.0
