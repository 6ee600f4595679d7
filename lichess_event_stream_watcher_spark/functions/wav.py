"""From-scratch WAV/RIFF PCM codec — stdlib struct + numpy only.

The one audio container this environment can decode without codec
libraries: RIFF/WAVE chunk framing, the ``fmt `` chunk (PCM tag 1 and
IEEE-float tag 3 — compressed tags stay env-gated), 8-bit unsigned /
16/24/32-bit signed little-endian / float32/float64 samples, mono or
multi-channel, via the ``data`` chunk — every profile reduced onto the
int16 grid (high bytes / clipped quantization), the audio analog of the
PNG 16 -> 8 reduction.
Decoded output is a float64 (n_samples, channels) numpy array in
[-1, 1), plus the sample rate — the canonical shape an audio feature
extractor consumes. The encoder twin is lossless for 16-bit input, so a
frozen-artifact driver row derives its expected statistics from the
recipe samples themselves (the artifacts_png.py provenance pattern).

Poison-pill contract (shared with jpeg.py/png.py/netpbm): every
malformed input raises ``ValueError`` — never struct.error/KeyError —
so ``audio_stats`` maps it to one ``decode_ok = false`` row, never a
task failure.

Reference parity: the reference engine has no audio path — this module
belongs to the repo's LLM-data-pipeline multimodal surface (opaque
binary columns + typed metadata, decode as Arrow-batched map work).
"""

from __future__ import annotations

import struct

import numpy as np

# one poison-pill bound, same role as PNG's pixel budget: a crafted
# header cannot make a worker allocate unbounded sample arrays
_MAX_SAMPLES = 256_000_000


def decode_wav_pcm(b: bytes) -> tuple[int, np.ndarray]:
    """WAV -> (sample_rate, int16 PCM of shape (n, channels)) — the
    integer fast path (8-bit input is rescaled onto the int16 grid).
    Integer-statistic consumers (``audio_stats``) read this directly and
    skip the float conversion; ``decode_wav`` wraps it for feature
    extractors that want normalized floats. ValueError on anything
    malformed or out of the supported profile (RIFF/WAVE; PCM tag 1 at
    8/16/24/32 bits, IEEE-float tag 3 at 32/64 — all reduced onto the
    int16 grid)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        ctype = b[pos : pos + 4]
        (length,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("WAV: truncated chunk")
        if ctype == b"fmt ":
            fmt = body
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("WAV: short fmt chunk")
    tag, channels, rate, _byte_rate, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag not in (1, 3):
        raise ValueError(f"WAV: unsupported format tag {tag} (PCM/float only)")
    if channels < 1 or rate < 1:
        raise ValueError("WAV: zero channels or sample rate")
    if rate > 2**31 - 1:
        # the uint32 dword must stay int32-representable: a crafted
        # 3e9 Hz header would otherwise decode cleanly and then fail the
        # WHOLE Spark task at Arrow conversion of the IntegerType field —
        # the task-retry storm the poison-pill contract forbids
        raise ValueError(f"WAV: implausible sample rate {rate}")
    if tag == 1 and bits not in (8, 16, 24, 32):
        raise ValueError(f"WAV: unsupported PCM bit depth {bits}")
    if tag == 3 and bits not in (32, 64):
        raise ValueError(f"WAV: unsupported float bit depth {bits}")
    width = bits // 8
    if block_align != channels * width:
        raise ValueError("WAV: block alignment does not match fmt")
    if len(data) % block_align:
        raise ValueError("WAV: data chunk is not whole frames")
    n = len(data) // block_align
    if n * channels > _MAX_SAMPLES:
        raise ValueError("WAV: sample budget exceeded")
    # every profile reduces onto the int16 grid (the 16-bit high bytes,
    # the same move as PNG's 16 -> 8 reduction) so downstream integer
    # statistics are depth-portable
    if tag == 3:
        f = np.frombuffer(data, "<f4" if bits == 32 else "<f8")
        if not np.all(np.isfinite(f)):
            raise ValueError("WAV: non-finite float sample")
        pcm = np.clip(np.round(f * 32768.0), -32768, 32767).astype("<i2")
    elif bits == 16:
        pcm = np.frombuffer(data, "<i2")
    elif bits == 8:
        # rescale the unsigned 8-bit grid onto int16 (x - 128) * 256
        pcm = ((np.frombuffer(data, np.uint8).astype(np.int16) - 128) * 256).astype("<i2")
    else:
        # 24/32-bit little-endian signed: keep the top two bytes
        grid = np.frombuffer(data, np.uint8).reshape(-1, width)
        pcm = (
            grid[:, width - 2].astype(np.int16)
            | (grid[:, width - 1].astype(np.int8).astype(np.int16) << 8)
        ).astype("<i2")
    return int(rate), pcm.reshape(n, int(channels))


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """WAV -> (sample_rate, float64 samples of shape (n, channels) in
    [-1, 1)) — the normalized-float view over :func:`decode_wav_pcm`."""
    rate, pcm = decode_wav_pcm(b)
    return rate, pcm.astype(np.float64) / 32768.0


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """(n, channels) float64 in [-1, 1) -> 16-bit PCM WAV. Lossless for
    values on the 1/32768 grid (the decoder twin's own output domain)."""
    if not 1 <= rate <= 2**31 - 1:
        # the decoder twin rejects these; an encoder that emitted them
        # would freeze artifacts the staged query can never decode
        raise ValueError(f"encode_wav: bad sample rate {rate}")
    if samples.ndim != 2 or samples.shape[0] < 1 or samples.shape[1] < 1:
        raise ValueError("encode_wav: samples must be (n, channels)")
    n, channels = samples.shape
    pcm = np.clip(np.round(samples * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body
