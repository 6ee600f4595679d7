"""From-scratch baseline JPEG codec (functions/jpeg.py) — pure numpy, no
Spark session. The encoder twin round-trips pixels through the full
pipeline (color convert, optional 4:2:0 subsample, FDCT, Annex K
quantization, Huffman entropy coding, byte stuffing, restart markers) and
the decoder must recover them within the quantization error bound; exact
small cases pin DC-only blocks. Corrupt payloads must raise ValueError
(the mapInPandas poison-pill contract), never IndexError/struct.error."""

from __future__ import annotations

import numpy as np
import pytest

from lichess_event_stream_watcher_spark.functions.jpeg import (
    ZIGZAG,
    _DCT,
    decode_jpeg,
    encode_jpeg_baseline,
)


def _rgb(h: int, w: int) -> bytes:
    """Deterministic smooth test image (JPEG-friendly gradients)."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(1, w - 1)).astype(np.uint8)
    g = (yy * 255 // max(1, h - 1)).astype(np.uint8)
    b = ((xx + yy) * 127 // max(1, h + w - 2)).astype(np.uint8)
    return np.stack([r, g, b], axis=2).tobytes()


def _max_err(a: bytes, b: bytes) -> int:
    return int(
        np.abs(
            np.frombuffer(a, np.uint8).astype(np.int32)
            - np.frombuffer(b, np.uint8).astype(np.int32)
        ).max()
    )


def test_zigzag_and_dct_basis():
    # zigzag is a permutation of 0..63 with the spec's first diagonal runs
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    # orthonormal: C C^T = I (so decode's C^T Y C inverts encode's C X C^T)
    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)


def test_flat_color_roundtrip_is_near_exact():
    """A flat block is DC-only; quantized DC error is at most qstep/2
    mapped through the color transform — allow a small bound."""
    for color in ((128, 128, 128), (255, 0, 0), (3, 200, 77)):
        rgb = bytes(color) * (16 * 16)
        w, h, out = decode_jpeg(encode_jpeg_baseline(16, 16, rgb))
        assert (w, h) == (16, 16)
        assert _max_err(rgb, out) <= 14, color


def test_gradient_roundtrip_within_quant_error():
    rgb = _rgb(24, 40)  # non-multiple-of-8 width/height exercise padding/crop
    w, h, out = decode_jpeg(encode_jpeg_baseline(40, 24, rgb))
    assert (w, h) == (40, 24)
    assert len(out) == 40 * 24 * 3
    # Annex K luma steps reach 16 in the low bands a gradient occupies;
    # observed max err ~20 — bound with headroom against regressions
    assert _max_err(rgb, out) <= 48
    # mean error should be tight for a smooth image
    diff = np.abs(
        np.frombuffer(rgb, np.uint8).astype(np.int32)
        - np.frombuffer(out, np.uint8).astype(np.int32)
    )
    assert diff.mean() <= 6.0


def test_subsampled_420_roundtrip():
    rgb = _rgb(32, 48)
    w, h, out = decode_jpeg(encode_jpeg_baseline(48, 32, rgb, subsample=True))
    assert (w, h) == (48, 32)
    assert _max_err(rgb, out) <= 64  # chroma is box-averaged 2x2
    # luma plane survives subsampling almost as well as 4:4:4
    y_in = np.frombuffer(rgb, np.uint8).reshape(32, 48, 3).astype(np.float64)
    y_out = np.frombuffer(out, np.uint8).reshape(32, 48, 3).astype(np.float64)
    luma = np.array([0.299, 0.587, 0.114])
    assert np.abs((y_in @ luma) - (y_out @ luma)).mean() <= 4.0


def test_restart_intervals_reset_dc_prediction():
    rgb = _rgb(16, 80)  # 10 MCUs at 4:4:4 -> several RSTn markers
    payload = encode_jpeg_baseline(80, 16, rgb, restart_interval=3)
    assert b"\xff\xdd" in payload  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
    w, h, out = decode_jpeg(payload)
    assert (w, h) == (80, 16)
    assert _max_err(rgb, out) <= 48
    # the same image without restarts decodes to the same pixels
    _, _, out_plain = decode_jpeg(encode_jpeg_baseline(80, 16, rgb))
    assert out == out_plain


def test_byte_stuffing_roundtrip():
    """An image whose entropy stream necessarily contains 0xFF bytes (big
    random-ish coefficient churn) must survive stuffing/unstuffing."""
    rng = np.arange(32 * 32 * 3, dtype=np.int64)
    rgb = ((rng * 2654435761) % 256).astype(np.uint8).tobytes()  # harsh noise
    payload = encode_jpeg_baseline(32, 32, rgb)
    w, h, out = decode_jpeg(payload)
    assert (w, h) == (32, 32) and len(out) == len(rgb)
    # noise round-trips poorly by design (quantization), but the stream
    # must parse and the DC means must track per 8x8 block
    a = np.frombuffer(rgb, np.uint8).reshape(32, 32, 3).astype(np.float64)
    b = np.frombuffer(out, np.uint8).reshape(32, 32, 3).astype(np.float64)
    for c in range(3):
        blk_a = a[:, :, c].reshape(4, 8, 4, 8).mean(axis=(1, 3))
        blk_b = b[:, :, c].reshape(4, 8, 4, 8).mean(axis=(1, 3))
        assert np.abs(blk_a - blk_b).max() <= 24


def test_corrupt_payloads_raise_valueerror_only():
    good = encode_jpeg_baseline(16, 16, _rgb(16, 16))
    cases = [
        b"",
        b"\xff\xd8",  # SOI only
        b"\xff\xd8\xff\xd9",  # empty
        good[:20],  # truncated header
        good[: len(good) // 2],  # truncated entropy data
        good[:2] + b"\xff\xc2" + good[4:],  # progressive SOF2
        b"\xff\xd8\xff\xdb\x00\x03\x10",  # short DQT
        good.replace(b"\xff\xda", b"\xff\xda\x00", 1),  # mangled SOS
    ]
    for i, payload in enumerate(cases):
        with pytest.raises(ValueError):
            decode_jpeg(payload)


def test_decode_image_dispatches_jpeg():
    from lichess_event_stream_watcher_spark.operators.multimodal import decode_image

    rgb = _rgb(8, 8)
    w, h, out = decode_image(encode_jpeg_baseline(8, 8, rgb))
    assert (w, h) == (8, 8) and len(out) == 8 * 8 * 3
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n")  # PNG dispatches (round 9) but a
        # truncated signature is a poison pill like any other
    with pytest.raises(ValueError):
        decode_image(b"RIFF....WAVE")  # audio stays env-gated


def test_round8_review_guards():
    """Round-8 review fixes: (a) a scan covering fewer components than the
    frame must raise, not silently decode grayscale; (b) a tiny payload
    declaring a huge frame must raise ValueError BEFORE allocating
    coefficient arrays; (c) stray RSTn markers with no restart interval
    must raise like the pre-rewrite reader did."""
    import struct

    good = encode_jpeg_baseline(16, 16, _rgb(16, 16))

    # (a) partial scan: rewrite the SOS to list only component 1
    sos_at = good.find(b"\xff\xda")
    partial_sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    sos_end = sos_at + 2 + struct.unpack_from(">H", good, sos_at + 2)[0]
    with pytest.raises(ValueError, match="scan covers 1 of 3"):
        decode_jpeg(good[:sos_at] + partial_sos + good[sos_end:])

    # (b) huge declared frame, tiny payload: patch SOF0 h/w to 65535
    sof_at = good.find(b"\xff\xc0")
    patched = (
        good[: sof_at + 5]
        + struct.pack(">HH", 65535, 65535)
        + good[sof_at + 9 :]
    )
    with pytest.raises(ValueError, match="blocks declared"):
        decode_jpeg(patched)

    # (c) stray RSTn in the entropy stream of a no-DRI image
    eoi = good.rfind(b"\xff\xd9")
    with pytest.raises(ValueError, match="RSTn"):
        decode_jpeg(good[: eoi - 4] + b"\xff\xd0" + good[eoi - 4 :])


def test_second_pass_review_guards():
    """Review second pass: (a) a duplicate scan-component entry must raise
    even though the length matches; (b) a payload large enough to 'afford'
    a huge frame under the bits-per-block bound still hits the absolute
    block budget with ValueError, never a multi-GB allocation."""
    import struct

    good = encode_jpeg_baseline(16, 16, _rgb(16, 16))

    # (a) SOS listing components [1, 1, 2]: same length, wrong SET
    sos_at = good.find(b"\xff\xda")
    dup_sos = b"\xff\xda" + struct.pack(">HB", 12, 3) + bytes(
        [1, 0x00, 1, 0x00, 2, 0x11, 0, 63, 0]
    )
    sos_end = sos_at + 2 + struct.unpack_from(">H", good, sos_at + 2)[0]
    with pytest.raises(ValueError, match="scan covers"):
        decode_jpeg(good[:sos_at] + dup_sos + good[sos_end:])

    # (b) 16384x16384 declared frame + ~3 MB of entropy padding passes the
    # payload-relative bound (12.6M blocks < 8*3.2M*8) but must hit the
    # absolute 2M-block budget before allocating ~6 GB of coefficients
    sof_at = good.find(b"\xff\xc0")
    big = (
        good[: sof_at + 5]
        + struct.pack(">HH", 16384, 16384)
        + good[sof_at + 9 : good.rfind(b"\xff\xd9")]
        + b"\x55" * 3_200_000
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="block budget"):
        decode_jpeg(big)


def test_asymmetric_sampling_roundtrips():
    """Round-9 ADVICE: the decoder's hi != vi plane assembly/upsample
    (4:2:2 and its 1x2 vertical mirror) had no in-repo exerciser — the
    encoder twin only emitted square factors. Encode with explicit
    sampling overrides and bound pixel error against the source."""
    rgb = _rgb(32, 48)
    for sampling in ((2, 1), (1, 2)):
        payload = encode_jpeg_baseline(48, 32, rgb, sampling=sampling)
        # the SOF really carries the asymmetric factor pair
        sof_at = payload.find(b"\xff\xc0")
        assert payload[sof_at + 11] == (sampling[0] << 4) | sampling[1]
        w, h, out = decode_jpeg(payload)
        assert (w, h) == (48, 32), sampling
        # chroma averaged over 2 pixels along ONE axis: tighter than 4:2:0
        assert _max_err(rgb, out) <= 64, sampling
        y_in = np.frombuffer(rgb, np.uint8).reshape(32, 48, 3).astype(np.float64)
        y_out = np.frombuffer(out, np.uint8).reshape(32, 48, 3).astype(np.float64)
        luma = np.array([0.299, 0.587, 0.114])
        assert np.abs((y_in @ luma) - (y_out @ luma)).mean() <= 4.0, sampling
    # odd dims exercise the subsampled-plane ceil-division edge
    rgb_odd = _rgb(17, 21)
    for sampling in ((2, 1), (1, 2)):
        w, h, out = decode_jpeg(encode_jpeg_baseline(21, 17, rgb_odd, sampling=sampling))
        assert (w, h) == (21, 17) and len(out) == 21 * 17 * 3, sampling
        assert _max_err(rgb_odd, out) <= 64, sampling
    with pytest.raises(ValueError, match="sampling"):
        encode_jpeg_baseline(8, 8, _rgb(8, 8), sampling=(4, 1))


def test_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2 conformance (round-9 ADVICE): 0xFF FILL bytes may pad
    before any marker; a spec-conformant stream using fill before RSTn or
    EOI must decode identically, not raise 'truncated'."""
    rgb = _rgb(16, 80)
    plain = encode_jpeg_baseline(80, 16, rgb, restart_interval=3)
    _, _, expect = decode_jpeg(plain)

    # pad two fill bytes before EVERY RSTn and before the EOI
    padded = plain
    for i in range(8):
        padded = padded.replace(bytes([0xFF, 0xD0 + i]), bytes([0xFF, 0xFF, 0xFF, 0xD0 + i]))
    padded = padded[: padded.rfind(b"\xff\xd9")] + b"\xff\xff" + b"\xff\xd9"
    w, h, out = decode_jpeg(padded)
    assert (w, h) == (80, 16)
    assert out == expect

    # FF FF 00 = one fill byte + a stuffed data 0xFF (the unstuffer must
    # not eat the stuffed byte): build on the harsh-noise stuffing image
    noisy = ((np.arange(32 * 32 * 3, dtype=np.int64) * 2654435761) % 256).astype(np.uint8).tobytes()
    payload = encode_jpeg_baseline(32, 32, noisy)
    assert b"\xff\x00" in payload  # the stream really contains stuffing
    _, _, expect2 = decode_jpeg(payload)
    eoi = payload.rfind(b"\xff\xd9")
    entropy_start = payload.find(b"\xff\xda")
    first_stuff = payload.find(b"\xff\x00", entropy_start)
    assert entropy_start < first_stuff < eoi
    filled = payload[:first_stuff] + b"\xff" + payload[first_stuff:]
    _, _, out2 = decode_jpeg(filled)
    assert out2 == expect2

    # fill bytes cannot launder a genuinely incomplete entropy stream:
    # cutting mid-scan and padding with fill still raises
    with pytest.raises(ValueError):
        decode_jpeg(payload[: (entropy_start + eoi) // 2] + b"\xff\xff\xff")
