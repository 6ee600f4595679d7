"""From-scratch AVI (RIFF) container walk for motion-JPEG video — the
third leg of the multimodal surface (image/audio/video), stdlib-only.

AVI is the same RIFF framing as WAV (functions/wav.py) with nested
LISTs: ``RIFF('AVI ' LIST('hdrl' avih [LIST('strl' strh strf)])
LIST('movi' 00dc...))``. The supported profile is what the encoder twin
emits and what a real MJPEG file carries: an ``avih`` main header for
frame timing/dimensions and ``00dc``/``00db`` chunks in ``movi`` whose
payloads are complete baseline JPEGs (decoded by functions/jpeg.py).
Frame extraction is a container-level walk — NO entropy decode — so
sampling every n-th frame from a corpus of clips is cheap map work, and
only the sampled frames pay the JPEG decode. That is the 100 TB shape:
1 -> N frame expansion inside ``mapInPandas`` keeps frames with their
source partition (no shuffle), and decode cost scales with frames KEPT,
not frames stored.

Poison-pill contract: every malformed input raises ``ValueError`` only.

Reference parity: the reference engine has no video path — this module
belongs to the repo's LLM-data-pipeline multimodal surface.
"""

from __future__ import annotations

import struct

# header-bomb bound, same role as PNG's pixel budget / WAV's sample cap
_MAX_FRAMES = 1_000_000


def decode_avi_mjpeg(b: bytes) -> tuple[int, int, int, list[bytes]]:
    """AVI -> (micros_per_frame, width, height, [jpeg frame bytes]).

    Walks the RIFF tree iteratively; only ``avih`` and ``movi`` are
    load-bearing, every other chunk/LIST is skipped by size (the same
    lenient-but-bounded posture as the WAV reader's LIST handling)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("AVI: bad RIFF/AVI header")
    avih = None
    frames: list[bytes] = []
    saw_movi = False

    def walk(start: int, end: int, depth: int) -> None:
        nonlocal avih, saw_movi
        if depth > 8:
            raise ValueError("AVI: LIST nesting too deep")
        pos = start
        while pos + 8 <= end:
            ctype = b[pos : pos + 4]
            (length,) = struct.unpack_from("<I", b, pos + 4)
            body_start = pos + 8
            if length > end - body_start:
                raise ValueError("AVI: truncated chunk")
            if ctype == b"LIST":
                if length < 4:
                    raise ValueError("AVI: short LIST")
                kind = b[body_start : body_start + 4]
                if kind == b"movi":
                    saw_movi = True
                walk(body_start + 4, body_start + length, depth + 1)
            elif ctype == b"avih":
                if length < 40:
                    raise ValueError("AVI: short avih")
                avih = struct.unpack_from("<10I", b, body_start)
            elif ctype in (b"00dc", b"00db"):
                if len(frames) >= _MAX_FRAMES:
                    raise ValueError("AVI: frame budget exceeded")
                frames.append(b[body_start : body_start + length])
            pos = body_start + length + (length & 1)  # word-aligned

    walk(12, len(b), 0)
    if avih is None:
        raise ValueError("AVI: missing avih header")
    if not saw_movi:
        raise ValueError("AVI: missing movi list")
    micros, _, _, _, total, _, _, _, w, h = avih
    if micros == 0 or w == 0 or h == 0:
        raise ValueError("AVI: zero frame period or dimensions")
    if w * h > 64_000_000 or micros > 2**31 - 1:
        # same header-bomb posture as PNG's pixel budget — and the uint32
        # dwords must stay int32-representable, or a crafted header would
        # decode cleanly and then fail the whole Spark task at Arrow
        # conversion of the IntegerType manifest fields
        raise ValueError("AVI: implausible dimensions or frame period")
    if total != len(frames):
        raise ValueError(f"AVI: avih declares {total} frames, movi has {len(frames)}")
    return int(micros), int(w), int(h), frames


def encode_avi_mjpeg(
    frames: list[bytes], micros_per_frame: int, w: int, h: int
) -> bytes:
    """Minimal spec-shaped MJPEG AVI writer (the decoder twin): avih +
    one vids/MJPG stream header pair + movi with one 00dc per frame."""
    if not frames:
        raise ValueError("encode_avi: no frames")
    if not (1 <= micros_per_frame <= 2**31 - 1) or w < 1 or h < 1 or w * h > 64_000_000:
        # the decoder twin rejects these; emitting them would break the
        # encode->decode round-trip invariant every codec pair keeps
        raise ValueError("encode_avi: bad frame period or dimensions")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return ctype + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    max_bytes = max(len(f) for f in frames)
    # dwMaxBytesPerSec is informational; clamp it into the uint32 field
    # (a 1-micro frame period would otherwise overflow struct.pack)
    byte_rate = min(max_bytes * 10**6 // micros_per_frame, 2**32 - 1)
    avih = struct.pack(
        "<10I", micros_per_frame, byte_rate,
        0, 0x10, len(frames), 0, 1, max_bytes, w, h
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, micros_per_frame,
                                        10**6, 0, len(frames), max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D, w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
