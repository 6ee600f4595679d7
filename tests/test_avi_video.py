"""MJPEG-AVI container walk (functions/avi.py) and the video operators
(video_manifest / video_frames / video_frame_stats) — the round-9 video
leg of the multimodal surface. The container walk is pure Python; the
operator tests drive the real mapInPandas plumbing; the staged r10
driver row gets the same dress rehearsal as the PNG/WAV artifacts."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lichess_event_stream_watcher_spark.functions.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from lichess_event_stream_watcher_spark.functions.jpeg import encode_jpeg_baseline


def _rgb(h: int, w: int, seed: int = 0) -> bytes:
    idx = np.arange(w * h * 3, dtype=np.int64)
    return (((idx + seed) * 97) % 256).astype(np.uint8).tobytes()


def _clip(n_frames: int, w: int = 16, h: int = 16) -> tuple[bytes, list[bytes]]:
    frames = [encode_jpeg_baseline(w, h, _rgb(h, w, i)) for i in range(n_frames)]
    return encode_avi_mjpeg(frames, 40000, w, h), frames


def test_container_roundtrip_preserves_frames_exactly():
    payload, frames = _clip(5)
    micros, w, h, got = decode_avi_mjpeg(payload)
    assert (micros, w, h) == (40000, 16, 16)
    assert got == frames  # container walk is byte-exact, no re-encode
    # odd-length frame exercises RIFF word alignment
    odd_frames = [b"\xff\xd8" + b"x" * 7, b"\xff\xd8" + b"y" * 8]
    payload2 = encode_avi_mjpeg(odd_frames, 1000, 2, 2)
    assert decode_avi_mjpeg(payload2)[3] == odd_frames


def test_corrupt_containers_raise_valueerror_only():
    good, _ = _clip(3)
    avih_at = good.find(b"avih")
    mism = bytearray(good)
    mism[avih_at + 8 + 16] ^= 0x01  # dwTotalFrames off by one
    cases = [
        b"",
        b"RIFF\x00\x00\x00\x00WAVE",  # wrong form type
        good[: len(good) // 2],  # truncated movi
        bytes(mism),
        good.replace(b"avih", b"avhX", 1),  # missing avih
        good.replace(b"movi", b"mov!", 1),  # missing movi
    ]
    for i, payload in enumerate(cases):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(payload)
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 1000, 2, 2)


def test_video_operators(spark):
    from lichess_event_stream_watcher_spark.operators.multimodal import (
        video_frame_stats,
        video_frames,
        video_manifest,
    )

    payload, frames = _clip(6)
    media = spark.createDataFrame(
        [(1, bytearray(payload)), (2, b"not a video"), (3, None)],
        "doc_id bigint, payload binary",
    )
    man = {r.doc_id: r for r in video_manifest(media).collect()}
    assert man[1].decode_ok and man[1].n_frames == 6
    assert man[1].duration_ms == 6 * 40000 // 1000
    assert not man[2].decode_ok and not man[3].decode_ok

    fr = video_frames(media, every_n=2).collect()
    assert sorted(r.frame_idx for r in fr) == [0, 2, 4]
    assert all(r.doc_id == 1 for r in fr)
    by_idx = {r.frame_idx: bytes(r.frame_payload) for r in fr}
    assert by_idx[2] == frames[2]  # extraction is byte-exact

    st = {(r.doc_id, r.frame_idx): r for r in video_frame_stats(media, every_n=3).collect()}
    assert set(st) == {(1, 0), (1, 3)}
    from lichess_event_stream_watcher_spark.functions.jpeg import decode_jpeg

    for idx in (0, 3):
        w, h, rgb = decode_jpeg(frames[idx])
        sums = np.frombuffer(rgb, np.uint8).reshape(-1, 3).sum(axis=0, dtype=np.int64)
        r = st[(1, idx)]
        assert r.decode_ok and (r.width, r.height) == (w, h)
        assert r.mean_r == (int(sums[0]) * 1_000_000 // (w * h)) / 1e6


def test_video_frame_stats_avi_staged_row_matches_frozen_oracle(spark, duck):
    """Dress rehearsal of the round-10 video_frame_stats_avi driver row
    (artifacts_avi.py): container pills contribute zero rows, the
    corrupt MIDDLE frame costs exactly one decode_ok=false row with its
    neighbors green, and the full compare matches the frozen oracle."""
    from conftest import driver_norm

    from lichess_event_stream_watcher_spark import artifacts_avi as A

    got = A.staged_query(spark, "unused").toPandas()
    exp = duck.sql(A.expected_oracle_sql()).df()
    assert len(got) == len(exp) == len(A.EXPECTED_STATS)
    bad = got[~got.decode_ok]
    assert [(int(r.doc_id), int(r.frame_idx)) for r in bad.itertuples()] == [
        (A.CORRUPT_CLIP, A.CORRUPT_FRAME)
    ]
    assert driver_norm(got) == driver_norm(exp)


def test_int32_overflow_and_bad_params_are_rejected(spark):
    """Review findings: (a) uint32 avih width/height above int32 max (or
    a 64M+ pixel budget) must ValueError instead of overflowing the
    IntegerType manifest fields task-wide; (b) the encoder twin rejects
    parameters its own decoder would refuse; (c) every_n < 1 errors
    immediately driver-side, not as a per-task range() crash."""
    good, _ = _clip(2)
    avih_at = good.find(b"avih")
    for patches in (
        ((32, 3_000_000_000),),            # width > int32 max
        ((32, 9000), (36, 9000)),          # 81M pixels > the 64M budget
        ((0, 3_000_000_000),),             # frame period > int32 max
    ):
        bombed = bytearray(good)
        for field_off, value in patches:
            struct.pack_into("<I", bombed, avih_at + 8 + field_off, value)
        with pytest.raises(ValueError, match="implausible"):
            decode_avi_mjpeg(bytes(bombed))

    frame = b"\xff\xd8xx"
    with pytest.raises(ValueError, match="bad frame period"):
        encode_avi_mjpeg([frame], 0, 2, 2)
    with pytest.raises(ValueError, match="bad frame period"):
        encode_avi_mjpeg([frame], 2**31, 2, 2)
    with pytest.raises(ValueError, match="bad frame period"):
        encode_avi_mjpeg([frame], 1000, 9000, 9000)

    from lichess_event_stream_watcher_spark.operators.multimodal import (
        sample_frames,
        video_frame_stats,
        video_frames,
    )

    media = spark.createDataFrame([(1, b"x")], "doc_id bigint, payload binary")
    with pytest.raises(ValueError, match="every_n"):
        video_frames(media, every_n=0)
    with pytest.raises(ValueError, match="every_n"):
        video_frame_stats(media, every_n=-1)
    with pytest.raises(ValueError, match="every_n"):
        sample_frames(media, every_n=0)
