"""Property-based codec fuzzing (no Spark session): random rasters,
random filter choices, random PCM grids, and random fill-byte insertion
— the from-scratch codecs must round-trip (lossless formats exactly,
JPEG within documented bounds) and must NEVER raise anything but
ValueError on mutated payloads (the mapInPandas poison-pill contract;
an IndexError/struct.error/zlib.error here would fail a Spark TASK, not
a row)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lichess_event_stream_watcher_spark.functions.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from lichess_event_stream_watcher_spark.functions.gif import decode_gif, encode_gif
from lichess_event_stream_watcher_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
)
from lichess_event_stream_watcher_spark.functions.png import decode_png, encode_png
from lichess_event_stream_watcher_spark.functions.wav import decode_wav, encode_wav


@st.composite
def _raster(draw, max_dim=24):
    w = draw(st.integers(1, max_dim))
    h = draw(st.integers(1, max_dim))
    seed = draw(st.integers(0, 2**31 - 1))
    idx = np.arange(w * h * 3, dtype=np.int64)
    rgb = ((idx * 2654435761 + seed) % 256).astype(np.uint8).tobytes()
    return w, h, rgb


@given(_raster())
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_is_exact_on_random_rasters(r):
    w, h, rgb = r
    ww, hh, out = decode_png(encode_png(w, h, rgb))
    assert (ww, hh, out) == (w, h, rgb)


@given(_raster(max_dim=16))
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_is_exact_on_random_rasters(r):
    # dims <= 16x16 bound distinct colors at w*h <= 256, inside the
    # exact-palette encoder's profile
    w, h, rgb = r
    ww, hh, out = decode_gif(encode_gif(w, h, [rgb]))
    assert (ww, hh, out) == (w, h, rgb)


@given(_raster(max_dim=20), st.sampled_from([(1, 1), (2, 2), (2, 1), (1, 2)]),
       st.integers(0, 3))
@settings(max_examples=25, deadline=None)
def test_jpeg_random_rasters_decode_with_correct_dims(r, sampling, ri):
    w, h, rgb = r
    payload = encode_jpeg_baseline(w, h, rgb, sampling=sampling, restart_interval=ri)
    ww, hh, out = decode_jpeg(payload)
    assert (ww, hh) == (w, h) and len(out) == len(rgb)


@given(_raster(max_dim=16), st.data())
@settings(max_examples=25, deadline=None)
def test_jpeg_fill_bytes_anywhere_before_markers_are_transparent(r, data):
    """T.81 fill-byte conformance as a property: inserting 0xFF fill runs
    immediately before ANY marker in the entropy stream leaves the decode
    bit-identical."""
    w, h, rgb = r
    payload = encode_jpeg_baseline(w, h, rgb, restart_interval=2)
    _, _, expect = decode_jpeg(payload)
    # positions of real markers (RSTn + EOI) inside the scan
    scan_at = payload.find(b"\xff\xda")
    marks = [
        i
        for i in range(scan_at, len(payload) - 1)
        if payload[i] == 0xFF and (payload[i + 1] == 0xD9 or 0xD0 <= payload[i + 1] <= 0xD7)
    ]
    chosen = data.draw(st.sets(st.sampled_from(marks), min_size=1) if marks else st.none())
    if chosen is None:
        return
    fill = data.draw(st.integers(1, 3))
    mutated = bytearray()
    last = 0
    for pos in sorted(chosen):
        mutated += payload[last:pos] + b"\xff" * fill
        last = pos
    mutated += payload[last:]
    _, _, got = decode_jpeg(bytes(mutated))
    assert got == expect


@given(st.integers(1, 4), st.integers(1, 500), st.integers(1, 48000),
       st.integers(0, 2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_exact_on_random_pcm(ch, n, rate, seed):
    idx = np.arange(n * ch, dtype=np.int64)
    pcm = (((idx + seed) * 1103515245) % 65536 - 32768).reshape(n, ch)
    rate_out, out = decode_wav(encode_wav(rate, pcm.astype(np.float64) / 32768.0))
    assert rate_out == rate
    assert (np.round(out * 32768).astype(np.int64) == pcm).all()


@given(st.lists(st.binary(min_size=1, max_size=64), min_size=1, max_size=8),
       st.integers(1, 10**6))
@settings(max_examples=40, deadline=None)
def test_avi_container_roundtrips_arbitrary_frame_bytes(frames, micros):
    payload = encode_avi_mjpeg(frames, micros, 4, 4)
    m, w, h, got = decode_avi_mjpeg(payload)
    assert (m, w, h) == (micros, 4, 4) and got == frames


@given(st.data())
@settings(max_examples=120, deadline=None)
def test_mutated_payloads_raise_valueerror_only(data):
    """Byte-level mutation fuzz across all five codecs: flip/truncate/
    insert anywhere — decode either succeeds or raises ValueError."""
    kind = data.draw(st.sampled_from(["png", "jpeg", "wav", "avi", "gif"]))
    rgb = bytes(range(48)) * 4  # 192 bytes = 8x8x3
    if kind == "png":
        payload, dec = encode_png(8, 8, rgb), decode_png
    elif kind == "jpeg":
        payload, dec = encode_jpeg_baseline(8, 8, rgb), decode_jpeg
    elif kind == "wav":
        pcm = (np.arange(64, dtype=np.float64).reshape(-1, 2) - 32.0) / 32768.0
        payload, dec = encode_wav(8000, pcm), decode_wav
    elif kind == "avi":
        payload, dec = (
            encode_avi_mjpeg([encode_jpeg_baseline(8, 8, rgb)], 1000, 8, 8),
            decode_avi_mjpeg,
        )
    else:
        payload, dec = encode_gif(8, 8, [rgb]), decode_gif
    op = data.draw(st.sampled_from(["flip", "truncate", "insert", "garbage"]))
    b = bytearray(payload)
    if op == "flip":
        i = data.draw(st.integers(0, len(b) - 1))
        b[i] ^= data.draw(st.integers(1, 255))
    elif op == "truncate":
        b = b[: data.draw(st.integers(0, len(b) - 1))]
    elif op == "insert":
        i = data.draw(st.integers(0, len(b)))
        b[i:i] = data.draw(st.binary(min_size=1, max_size=8))
    else:
        b = bytearray(data.draw(st.binary(min_size=0, max_size=64)))
    try:
        dec(bytes(b))
    except ValueError:
        pass  # the contract
