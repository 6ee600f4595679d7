"""Distributed stateful streaming twins of the bounded in-memory windows.

The reference's state (SURVEY.md §1.1.4) is a GLOBAL count-based window:
the last 10,000 events + per-user row lists (src/eventhandler.rs:91-113)
and a 2,000-id notification dedup deque (:211-214). A global COUNT-based
window is inherently sequential — it cannot shard without a total order.
The engine facade keeps the exact semantics driver-side (bounded, tiny);
this module provides the DISTRIBUTED twins that scale to any event rate by
trading the count bound for a TIME bound (the documented divergence,
SURVEY.md §2.5 A4 / §7 stage 3):

- ``seen_window_stream``: per-user running state via
  ``applyInPandasWithState`` — count, first/last seen, last-k rows —
  with processing-time TTL eviction replacing count-based eviction.
  State shards by user key; each micro-batch touches only updated keys.
- ``notify_dedup_stream``: first-occurrence-only emission via watermarked
  ``dropDuplicates`` — the W2/J3 suppression with watermark-bounded state.

Both operate on the parsed signup stream (streaming.source) and run
identically under ``availableNow`` replay for tests.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEEN_OUTPUT_SCHEMA = (
    "user_id string, seen_count bigint, first_seen timestamp, "
    "last_seen timestamp, recent_json array<string>"
)
SEEN_STATE_SCHEMA = (
    "seen_count bigint, first_seen timestamp, last_seen timestamp, "
    "recent_json array<string>"
)
RECENT_K = 3  # last-k retained rows per user (the A3-style bound)


def tws_time_mode(ttl_ms: int | None) -> str:
    """transformWithState time mode for a given state TTL: Spark only
    honors ttlDurationMs under ProcessingTime (it rejects TTL state vars
    at query start under timeMode="None"), while TTL-less availableNow
    replays want "None" so no timer batches are scheduled — the exact
    mirror of the GroupStateTimeout switch in seen_window_stream."""
    return "None" if ttl_ms is None else "ProcessingTime"


def seen_window_stream(
    events: DataFrame,
    ttl_minutes: int | None = None,
    recent_k: int = RECENT_K,
) -> DataFrame:
    """Per-user `seen` state (A4/J4/A5), sharded by user key.

    Emits one update row per user per micro-batch in which that user
    appeared. With ``ttl_minutes`` set (the production continuous-trigger
    mode), idle users evict after that much processing time — the
    time-based stand-in for "fell out of the last 10K events". Leave it
    None for bounded ``availableNow`` replays: a processing-time timeout
    makes Spark schedule timer-check batches forever, so an availableNow
    query would never terminate.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_minutes is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )

    def update(
        key: Tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            count, first_seen, last_seen, recent = state.get
            recent = list(recent)
        else:
            count, first_seen, last_seen, recent = 0, None, None, []
        count += len(rows)
        ts = rows["ingest_time"]
        batch_min, batch_max = ts.min(), ts.max()
        first_seen = batch_min if first_seen is None else min(first_seen, batch_min)
        last_seen = batch_max if last_seen is None else max(last_seen, batch_max)
        recent = (recent + list(rows["user_json"]))[-recent_k:]
        state.update((count, first_seen, last_seen, recent))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "seen_count": [count],
                "first_seen": [first_seen],
                "last_seen": [last_seen],
                "recent_json": [recent],
            }
        )

    keyed = events.select(
        F.lower(F.col("username")).alias("user_id"),
        F.col("ingest_time"),
        F.to_json(
            F.struct("username", "email", "ip", "user_agent", "finger_print", "susp_ip")
        ).alias("user_json"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SEEN_OUTPUT_SCHEMA,
        stateStructType=SEEN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def notify_dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """W2/J3 as a stream: emit only the FIRST signup per user id within the
    watermark horizon; duplicates are suppressed by keyed dedup state that
    the watermark garbage-collects (the 2,000-id deque, time-bounded).

    ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``: with plain
    dropDuplicates Spark only evicts dedup state when the event-time
    column is part of the dedup keys — keyed on user_id alone the state
    would grow one row per distinct user forever AND suppress a user who
    signs up again days later, both contrary to the documented
    time-bounded-deque semantics. The WithinWatermark variant keys state
    on user_id and expires each entry once the watermark passes its
    event time (round-7 review fix)."""
    return (
        events.withColumn("user_id", F.lower(F.col("username")))
        .withWatermark("ingest_time", watermark)
        .dropDuplicatesWithinWatermark(["user_id"])
    )


def seen_window_stream_tws(
    events: DataFrame,
    ttl_minutes: int | None = None,
    recent_k: int = RECENT_K,
) -> DataFrame:
    """``transformWithStateInPandas`` twin of ``seen_window_stream`` — the
    Spark 4.x arbitrary-state API (StatefulProcessor + typed state vars)
    that replaces ``applyInPandasWithState`` going forward.

    Same semantics and output schema as the applyInPandasWithState twin,
    with two operational upgrades the new API gives for free: state TTL is
    declared PER STATE VARIABLE (``ttlDurationMs``) instead of hand-rolled
    timeout callbacks, and the state store is RocksDB-backed (the query
    must run with ``spark.sql.streaming.stateStore.providerClass`` set to
    the RocksDB provider — transformWithState requires it), which keeps
    per-executor state off-heap and spillable — the property that lets a
    100 TB-scale key space (hundreds of millions of users) hold state that
    no longer fits an in-memory HDFS-backed store.

    Scale shape is unchanged: state shards by user key; each micro-batch
    touches only updated keys.

    Environment note: the TWS Python worker talks to the JVM state server
    over protobuf — running this path requires the ``protobuf`` package
    (absent in some minimal containers; the differential test skips there
    and ``seen_window_stream`` remains the fallback)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60 * 1000

    class SeenProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", SEEN_STATE_SCHEMA, ttl_ms)

        def handleInputRows(
            self, key: Tuple[str], rows: Iterable[pd.DataFrame], timer_values: Any
        ) -> Iterable[pd.DataFrame]:
            batch = pd.concat(list(rows), ignore_index=True)
            if self._agg.exists():
                count, first_seen, last_seen, recent = self._agg.get()
                recent = list(recent)
            else:
                count, first_seen, last_seen, recent = 0, None, None, []
            count += len(batch)
            ts = batch["ingest_time"]
            batch_min, batch_max = ts.min(), ts.max()
            first_seen = batch_min if first_seen is None else min(first_seen, batch_min)
            last_seen = batch_max if last_seen is None else max(last_seen, batch_max)
            recent = (recent + list(batch["user_json"]))[-recent_k:]
            self._agg.update((count, first_seen, last_seen, recent))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "seen_count": [count],
                    "first_seen": [first_seen],
                    "last_seen": [last_seen],
                    "recent_json": [recent],
                }
            )

        def close(self) -> None:
            pass

    keyed = events.select(
        F.lower(F.col("username")).alias("user_id"),
        F.col("ingest_time"),
        F.to_json(
            F.struct("username", "email", "ip", "user_agent", "finger_print", "susp_ip")
        ).alias("user_json"),
    )
    return keyed.groupBy("user_id").transformWithStateInPandas(
        SeenProcessor(),
        outputStructType=SEEN_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode=tws_time_mode(ttl_ms),
    )
