"""Stream-stream interval joins (event attribution across two live streams).

The reference never joins two event sets (SURVEY.md §2.4 "absent" row) —
this is the beyond-reference capability Structured Streaming adds: joining
two UNBOUNDED streams with bounded state, because the time-range predicate
plus both watermarks tells Spark exactly how long a row can possibly still
find a partner, after which its state is evicted.

Batch-first contract like the rest of the repo: the same function body
works on batch DataFrames (watermarks are a no-op there), so every
streaming test pins the streaming result equal to the batch twin run on
identical input files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner interval join of two (possibly streaming) event sets: a right
    row attributes to a left row with the same key when it lands in
    ``[left_ts, left_ts + within]``.

    State-bound analysis (what makes this legal on unbounded streams):
    both inputs carry a ``watermark``; with the range condition, a left
    row older than ``watermark + within`` and a right row older than
    ``watermark`` can never match anything new, so the join state evicts
    behind the watermark instead of growing with the stream. The join
    itself shuffles both sides on the key — the standard stateful
    symmetric hash join, sharded by key at any rate.

    Left/right payloads come back as ``l`` / ``r`` structs (column-name
    collisions between the two streams are the caller's least interesting
    problem); the key and both timestamps are lifted out flat. Output:
    (key, l_ts, r_ts, lag_seconds, l, r).

    Outer variants note: left_outer/full_outer stream-stream joins emit
    the null-padded row only once the watermark passes the join window —
    correct but trigger-timing-dependent; this engine pins the inner form
    and leaves outer emission timing to the sink's retry semantics."""
    l = (
        left.withWatermark(left_ts, watermark)
        .select(
            F.col(key).alias("key"),
            F.col(left_ts).alias("l_ts"),
            F.struct(*[c for c in left.columns]).alias("l"),
        )
    )
    r = (
        right.withWatermark(right_ts, watermark)
        .select(
            F.col(key).alias("r_key"),
            F.col(right_ts).alias("r_ts"),
            F.struct(*[c for c in right.columns]).alias("r"),
        )
    )
    cond = (
        (F.col("key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return (
        l.join(r, cond, "inner")
        .select(
            "key",
            "l_ts",
            "r_ts",
            (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("lag_seconds"),
            "l",
            "r",
        )
    )
