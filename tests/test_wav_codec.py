"""From-scratch WAV/RIFF PCM codec (functions/wav.py) and the
audio_stats operator — the round-9 audio counterpart to the image
codecs. 16-bit encode/decode is lossless on the PCM grid; the decoder
additionally covers 8-bit payloads, word-aligned odd chunks, and extra
chunks the encoder twin never emits. Corrupt payloads must raise
ValueError only (the mapInPandas poison-pill contract)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lichess_event_stream_watcher_spark.functions.wav import decode_wav, encode_wav


def _pcm16(vals, channels=1):
    a = np.asarray(vals, dtype=np.float64).reshape(-1, channels)
    return a / 32768.0


def test_encode_decode_lossless_on_pcm_grid():
    for ch in (1, 2, 3):
        pcm = np.arange(-60, 60, dtype=np.int64).reshape(-1, ch) * 500
        rate, out = decode_wav(encode_wav(8000, pcm.astype(np.float64) / 32768.0))
        assert rate == 8000
        assert (np.round(out * 32768).astype(np.int64) == pcm).all()
    with pytest.raises(ValueError):
        encode_wav(8000, np.zeros(5))  # 1-D rejected


def test_eight_bit_and_extra_chunks():
    # hand-assembled 8-bit mono file with a LIST chunk between fmt and
    # data, and an odd-length chunk exercising word alignment
    samples = bytes([0, 64, 128, 192, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    odd = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + odd
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, out = decode_wav(payload)
    assert rate == 8000 and out.shape == (5, 1)
    # 8-bit unsigned maps 128 -> 0.0, 0 -> -1.0
    assert out[2, 0] == 0.0 and out[0, 0] == -1.0 and abs(out[4, 0] - 127 / 128) < 1e-12


def test_corrupt_payloads_raise_valueerror_only():
    good = encode_wav(8000, _pcm16([0, 1000, -1000, 32767]))
    fmt_at = good.find(b"fmt ")
    cases = [
        b"",
        b"RIFF",
        b"RIFF\x00\x00\x00\x00WAVX",  # not WAVE
        good[:20],  # truncated fmt
        good[:-3],  # data not whole frames
        good[: fmt_at + 8] + b"\x02" + good[fmt_at + 9 :],  # ADPCM tag
        # bit depth 24
        good[: fmt_at + 22] + struct.pack("<H", 24) + good[fmt_at + 24 :],
        # zero channels
        good[: fmt_at + 10] + b"\x00\x00" + good[fmt_at + 12 :],
        # sample-budget bomb: huge declared data chunk, truncated body
        good[: good.find(b"data") + 4] + struct.pack("<I", 2**31) + b"\x00" * 64,
    ]
    for i, payload in enumerate(cases):
        with pytest.raises(ValueError):
            decode_wav(payload)


def test_audio_stats_operator_and_pills(spark):
    from lichess_event_stream_watcher_spark.operators.multimodal import audio_stats

    clips = [
        (1, encode_wav(8000, _pcm16([4000] * 80 + [-4000] * 80))),
        (2, b"RIFF not a wav"),
        (3, None),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(p) if p is not None else None) for i, p in clips],
        "doc_id bigint, payload binary",
    )
    got = {r.doc_id: r for r in audio_stats(media).collect()}
    assert len(got) == 3
    r = got[1]
    assert r.decode_ok and r.sample_rate == 8000 and r.channels == 1
    assert r.n_samples == 160 and r.duration_ms == 160 * 1000 // 8000
    assert r.peak_pcm == 4000 and r.rms_pcm == 4000  # constant magnitude
    for i in (2, 3):
        assert not got[i].decode_ok and got[i].sample_rate is None


def test_audio_stats_wav_staged_row_matches_frozen_oracle(spark, duck):
    """Dress rehearsal of the round-10 audio_stats_wav driver row
    (artifacts_wav.py) — the driver's own normalize-and-compare against
    the integer-recipe VALUES oracle, pills included."""
    from conftest import driver_norm

    from lichess_event_stream_watcher_spark import artifacts_wav as A

    got = A.staged_query(spark, "unused").toPandas()
    exp = duck.sql(A.expected_oracle_sql()).df()
    assert len(got) == len(exp) == len(A.WAV_CASES) + 2
    assert driver_norm(got) == driver_norm(exp)


def test_int32_overflow_headers_are_poison_pills(spark):
    """Review finding (confirmed empirically pre-fix): a crafted uint32
    sample rate above int32 max decoded cleanly and then killed the WHOLE
    Spark task at Arrow conversion of the IntegerType field. It must be
    a ValueError -> one decode_ok=false row."""
    good = encode_wav(8000, _pcm16([0, 1000, -1000, 32767]))
    fmt_at = good.find(b"fmt ")
    bombed = good[: fmt_at + 12] + struct.pack("<I", 3_000_000_000) + good[fmt_at + 16 :]
    with pytest.raises(ValueError, match="implausible"):
        decode_wav(bombed)
    with pytest.raises(ValueError, match="rate"):
        encode_wav(0, _pcm16([0, 1]))
    with pytest.raises(ValueError, match="rate"):
        encode_wav(2**31, _pcm16([0, 1]))

    from lichess_event_stream_watcher_spark.operators.multimodal import audio_stats

    media = spark.createDataFrame(
        [(1, bytearray(bombed)), (2, bytearray(good))], "doc_id bigint, payload binary"
    )
    got = {r.doc_id: r for r in audio_stats(media).collect()}
    assert not got[1].decode_ok and got[2].decode_ok  # row, not task


def test_extended_pcm_profiles_reduce_onto_int16():
    """24/32-bit PCM keep their top two bytes; IEEE float32/float64
    quantize onto the int16 grid; bad float payloads (NaN) and odd
    depths stay poison pills."""
    from lichess_event_stream_watcher_spark.functions.wav import decode_wav_pcm

    def hand_wav(tag, bits, data, channels=1, rate=8000):
        width = bits // 8
        fmt = struct.pack(
            "<HHIIHH", tag, channels, rate, rate * channels * width, channels * width, bits
        )
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # 24-bit: little-endian (lo, mid, hi) -> int16 of (hi, mid)
    samples24 = b"\xff\x34\x12" + b"\x00\xcd\xab"  # 0x1234ff, 0xabcd00
    rate, pcm = decode_wav_pcm(hand_wav(1, 24, samples24))
    assert pcm.ravel().tolist() == [0x1234, 0xABCD - 0x10000]  # 0xabcd as int16

    # 32-bit: top two bytes survive
    samples32 = struct.pack("<ii", 0x7FFF0000, -0x80000000)
    _, pcm = decode_wav_pcm(hand_wav(1, 32, samples32))
    assert pcm.ravel().tolist() == [0x7FFF, -0x8000]

    # float32 quantizes (0.5 -> 16384) and clips (2.0 -> 32767)
    samplesf = struct.pack("<fff", 0.5, -1.0, 2.0)
    _, pcm = decode_wav_pcm(hand_wav(3, 32, samplesf))
    assert pcm.ravel().tolist() == [16384, -32768, 32767]

    # float64 too
    samplesd = struct.pack("<dd", 0.25, -0.25)
    _, pcm = decode_wav_pcm(hand_wav(3, 64, samplesd))
    assert pcm.ravel().tolist() == [8192, -8192]

    with pytest.raises(ValueError, match="non-finite"):
        decode_wav_pcm(hand_wav(3, 32, struct.pack("<f", float("nan"))))
    with pytest.raises(ValueError, match="bit depth"):
        decode_wav_pcm(hand_wav(1, 12, b"\x00\x00"))
    with pytest.raises(ValueError, match="bit depth"):
        decode_wav_pcm(hand_wav(3, 16, b"\x00\x00"))
