"""Multimodal ingestion through Structured Streaming (round 9): media
payloads landing as base64 NDJSON flow through the SAME Arrow-batched
decode operators (image_stats / audio_stats) that batch uses — the
operators are trigger-agnostic mapInPandas, so the streaming wiring is
source + sink only. Covers: micro-batch decode of real JPEG/PNG/PPM and
WAV payloads, poison pills costing one decode_ok=false row inside a
micro-batch (never a task/query failure), and checkpointed exactly-once
file progress across a second batch of landed files."""

from __future__ import annotations

import base64
import json
import os

import numpy as np

from lichess_event_stream_watcher_spark.functions.jpeg import encode_jpeg_baseline
from lichess_event_stream_watcher_spark.functions.png import encode_png
from lichess_event_stream_watcher_spark.functions.wav import decode_wav_pcm, encode_wav
from lichess_event_stream_watcher_spark.operators.multimodal import (
    audio_stats,
    decode_image,
    encode_ppm,
    image_stats,
)


def _rgb(w: int, h: int, seed: int) -> bytes:
    idx = np.arange(w * h * 3, dtype=np.int64)
    return (((idx + seed) * 97) % 256).astype(np.uint8).tobytes()


def _land(path: str, name: str, rows: list[tuple[int, bytes]]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for doc_id, payload in rows:
            f.write(
                json.dumps(
                    {"doc_id": doc_id, "b64": base64.b64encode(payload).decode()}
                )
                + "\n"
            )


def _media_stream(spark, landing: str):
    from pyspark.sql import functions as F

    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "10")
        .load(landing)
    )
    parsed = lines.select(
        F.from_json(F.col("value"), "doc_id BIGINT, b64 STRING").alias("j")
    )
    return parsed.select(
        F.col("j.doc_id").alias("doc_id"), F.unbase64("j.b64").alias("payload")
    )


def _run_once(df, out_dir: str, checkpoint: str) -> None:
    # parquet sink, not memory: the memory sink cannot RESUME from a
    # checkpoint, and resuming is exactly what the second landing batch
    # asserts (exactly-once file progress)
    q = (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive and q.exception() is None


def test_streaming_image_decode_with_pills_and_checkpoint(spark, tmp_path):
    landing = str(tmp_path / "img_landing")
    ckpt = str(tmp_path / "img_ckpt")
    batch1 = [
        (1, encode_jpeg_baseline(16, 16, _rgb(16, 16, 1))),
        (2, encode_png(8, 8, _rgb(8, 8, 2))),
        (3, encode_ppm(4, 4, _rgb(4, 4, 3))),
        (4, b"\xff\xd8 truncated jpeg"),  # poison pill
    ]
    out = str(tmp_path / "img_out")
    _land(landing, "b1.ndjson", batch1)
    _run_once(image_stats(_media_stream(spark, landing)), out, ckpt)
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert len(got) == 4
    assert not got[4].decode_ok and got[4].width is None  # one row, query alive
    for doc_id, payload in batch1[:3]:
        w, h, rgb = decode_image(payload)
        sums = np.frombuffer(rgb, np.uint8).reshape(-1, 3).sum(axis=0, dtype=np.int64)
        r = got[doc_id]
        assert r.decode_ok and (r.width, r.height) == (w, h)
        assert r.mean_r == (int(sums[0]) * 1_000_000 // (w * h)) / 1e6

    # second landing: the checkpoint must make progress exactly-once —
    # only the NEW file's rows append
    _land(landing, "b2.ndjson", [(5, encode_png(6, 6, _rgb(6, 6, 5)))])
    _run_once(image_stats(_media_stream(spark, landing)), out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 3, 4, 5]  # no replays
    assert {r.doc_id: r.decode_ok for r in rows}[5] is True


def test_streaming_audio_decode(spark, tmp_path):
    landing = str(tmp_path / "wav_landing")
    ckpt = str(tmp_path / "wav_ckpt")
    pcm = ((np.arange(400, dtype=np.int64) * 991) % 32768 - 16384).reshape(-1, 2)
    clip = encode_wav(8000, pcm.astype(np.float64) / 32768.0)
    out = str(tmp_path / "wav_out")
    _land(landing, "a1.ndjson", [(1, clip), (2, b"RIFF junk")])
    _run_once(audio_stats(_media_stream(spark, landing)), out, ckpt)
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert len(got) == 2 and not got[2].decode_ok
    rate, pcm_back = decode_wav_pcm(clip)
    r = got[1]
    assert r.decode_ok and r.sample_rate == 8000 and r.channels == 2
    assert r.n_samples == 200 and r.peak_pcm == int(np.abs(pcm_back).max())
