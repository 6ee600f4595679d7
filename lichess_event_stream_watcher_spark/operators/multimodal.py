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
                        "byte_mean": round(sum(b) / len(b), 6) if b else 0.0,
                        "byte_histogram_head": hist,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(featurize, FEATURE_SCHEMA)
