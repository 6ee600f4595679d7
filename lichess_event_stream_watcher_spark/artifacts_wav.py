"""Frozen WAV decode artifacts — the r10 ``audio_stats_wav`` driver row,
staged in r9 alongside ``artifacts_png.py``.

Same provenance as the PNG artifacts: recipes generate the PCM sample
grid DIRECTLY as integers (square / sawtooth / LCG-noise / silence —
deterministic integer arithmetic, no trig, no floats), the expected
statistics are computed from those integers at fixture-build time with
no codec in the chain, and the staged query re-encodes through the
lossless 16-bit twin and decodes through the Arrow-batched
``audio_stats`` path. Every statistic is integer (PCM units), so the
VALUES oracle needs no float parsing at all.
"""

from __future__ import annotations

import math

import numpy as np

# (clip_id, kind, rate, n_frames, channels, seed)
WAV_CASES: list[tuple[int, str, int, int, int, int]] = [
    (0, "square", 8000, 8000, 1, 4000),     # 1 s, amplitude 4000
    (1, "square", 16000, 4000, 2, 12000),   # stereo
    (2, "saw", 8000, 1600, 1, 0),
    (3, "saw", 44100, 4410, 2, 3),          # odd-rate duration floor
    (4, "noise", 8000, 8000, 1, 1),
    (5, "noise", 22050, 2205, 4, 2),        # multi-channel
    (6, "silence", 8000, 800, 1, 0),
    (7, "square", 8000, 1, 1, 32767),       # single frame, full scale
]

# pills appended by payloads(): 100 = format tag patched to 2 (ADPCM,
# unsupported), 101 = data chunk truncated mid-frame
PILL_IDS = (100, 101)


def _pcm(kind: str, n: int, ch: int, seed: int) -> np.ndarray:
    idx = np.arange(n, dtype=np.int64)
    if kind == "square":
        wave = np.where((idx // 8) % 2 == 0, seed, -seed)
    elif kind == "saw":
        wave = (idx * 257 + seed) % 16384 - 8192
    elif kind == "noise":
        wave = ((idx + seed) * 1103515245 + 12345) % 32768 - 16384
    elif kind == "silence":
        wave = idx * 0
    else:  # pragma: no cover - recipe table is closed
        raise ValueError(kind)
    out = np.stack([wave + c for c in range(ch)], axis=1)
    return np.clip(out, -32768, 32767)


def payloads() -> list[tuple[int, bytes]]:
    from .functions.wav import encode_wav

    out = []
    for clip_id, kind, rate, n, ch, seed in WAV_CASES:
        samples = _pcm(kind, n, ch, seed).astype(np.float64) / 32768.0
        out.append((clip_id, encode_wav(rate, samples)))
    base = bytearray(out[0][1])
    fmt_at = bytes(base).find(b"fmt ")
    bad_tag = bytearray(base)
    bad_tag[fmt_at + 8] = 2  # PCM -> ADPCM
    out.append((PILL_IDS[0], bytes(bad_tag)))
    out.append((PILL_IDS[1], bytes(base[: len(base) - 3])))
    return out


def media_df(spark):
    return spark.createDataFrame(
        [(int(i), bytearray(p)) for i, p in payloads()],
        "doc_id bigint, payload binary",
    )


def staged_query(spark, sf_dir: str):
    """The exact callable round 10 registers as ``audio_stats_wav``."""
    from .operators.multimodal import audio_stats

    return audio_stats(media_df(spark))


def expected_oracle_sql() -> str:
    rows = []
    for cid, ok, rate, ch, n, dur, peak, rms in EXPECTED_STATS:
        if ok:
            rows.append(f"({cid}, true, {rate}, {ch}, {n}, {dur}, {peak}, {rms})")
        else:
            rows.append(f"({cid}, false, NULL, NULL, NULL, NULL, NULL, NULL)")
    return (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, decode_ok,\n"
        "       CAST(sample_rate AS INT) AS sample_rate, CAST(channels AS INT) AS channels,\n"
        "       CAST(n_samples AS BIGINT) AS n_samples, CAST(duration_ms AS BIGINT) AS duration_ms,\n"
        "       CAST(peak_pcm AS INT) AS peak_pcm, CAST(rms_pcm AS INT) AS rms_pcm\n"
        "FROM (VALUES\n  " + ",\n  ".join(rows) + "\n"
        ") AS t(doc_id, decode_ok, sample_rate, channels, n_samples, duration_ms, peak_pcm, rms_pcm)"
    )


# fmt: off
# frozen at fixture-build time (round 9) from the INTEGER RECIPE GRIDS
# (no codec in the chain); regenerate only on an intentional recipe
# change, via:
#   python -c "import lichess_event_stream_watcher_spark.artifacts_wav as a; print(a.compute_expected_repr())"
EXPECTED_STATS: list = [
    (0, True, 8000, 1, 8000, 1000, 4000, 4000),
    (1, True, 16000, 2, 4000, 250, 12001, 12000),
    (2, True, 8000, 1, 1600, 200, 8192, 4743),
    (3, True, 44100, 2, 4410, 100, 8192, 4736),
    (4, True, 8000, 1, 8000, 1000, 16383, 9460),
    (5, True, 22050, 4, 2205, 100, 16376, 9459),
    (6, True, 8000, 1, 800, 100, 0, 0),
    (7, True, 8000, 1, 1, 0, 32767, 32767),
    (100, False, None, None, None, None, None, None),
    (101, False, None, None, None, None, None, None),
]
# fmt: on


def compute_expected_repr() -> str:
    rows = []
    for clip_id, kind, rate, n, ch, seed in WAV_CASES:
        pcm = _pcm(kind, n, ch, seed)
        total = n * ch
        rows.append(
            (
                clip_id, True, rate, ch, n,
                n * 1000 // rate,
                int(np.abs(pcm).max()),
                int(math.isqrt(int((pcm * pcm).sum()) // total)),
            )
        )
    for pid in PILL_IDS:
        rows.append((pid, False, None, None, None, None, None, None))
    body = ",\n    ".join(repr(r) for r in rows)
    return f"EXPECTED_STATS: list = [\n    {body},\n]"
