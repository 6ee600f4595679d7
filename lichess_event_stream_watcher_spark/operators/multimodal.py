"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
decode/feature steps run as Arrow-batched ``mapInPandas`` so each partition
streams through Python once. The actual media decode is STUBBED (no
image/audio libs in this container) behind ``decode_image``; the Spark-side
plumbing — schema, batching, partition flow — is real and tested.

Scale: payload columns dominate I/O; keep them in their own parquet column
(column pruning skips them unless referenced) and size partitions by bytes
(``spark.sql.files.maxPartitionBytes``), not rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("content_md5", T.StringType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_histogram_head", T.ArrayType(T.LongType()), False),
    ]
)


def to_media_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a media table from documents: payload = utf-8 bytes.

    Real pipelines land (path, bytes) pairs the same way; everything
    downstream only sees binary + metadata."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).cast("bigint").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":  # pragma: no cover - stub
    """STUB: image decode (PIL/OpenCV not available in this container).

    At deploy time, replace the body with e.g. PIL.Image.open(BytesIO(b));
    the mapInPandas plumbing around it does not change."""
    raise NotImplementedError("media decode libs not available in this environment")


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), False),
                    T.StructField("width", T.IntegerType(), False),
                    T.StructField("height", T.IntegerType(), False),
                ]
            ),
            False,
        ),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize step: binary -> binary with updated typed metadata.

    The pixel transform is a deterministic fake (decode is stubbed — see
    ``decode_image``): output bytes are the payload truncated/cycled to
    width*height, standing in for a real thumbnail. Partitioning, Arrow
    batch flow, and the metadata contract are exactly what a PIL-backed
    implementation would use — swap the body, keep the plumbing."""
    n_out = width * height

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                out = (b * (n_out // max(1, len(b)) + 1))[:n_out] if b else b"\x00" * n_out
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload": out,
                        "meta": {"n_bytes": len(out), "width": width, "height": height},
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(do_resize, RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_n: int = 4
) -> DataFrame:
    """Frame sampling: one input row -> many frame rows (a flatMap).

    The payload splits into fixed-size pseudo-frames and every n-th is
    kept — the video-decode stand-in. The 1->N row expansion via
    mapInPandas is the real shape of a frame extractor; frames stay with
    their source partition (no shuffle)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_payload": b[idx * frame_bytes:(idx + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic fake feature extractor over the binary payload via
    mapInPandas: byte statistics stand in for real decoded features, with
    the exact batch shape a real extractor would use."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                hist = [0] * 8
                for byte in b:
                    if byte < 128:
                        hist[byte // 16] += 1
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(b),
                        # floor-to-micros instead of round(x, 6): the exact
                        # integer arithmetic is engine-portable (identical
                        # doubles in any SQL oracle), no half-even tie risk
                        "byte_mean": (sum(b) * 1_000_000 // len(b)) / 1e6 if b else 0.0,
                        "byte_histogram_head": hist,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(featurize, FEATURE_SCHEMA)
