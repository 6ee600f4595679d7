"""Distributed stateful streaming tests: applyInPandasWithState seen window
(state continuity across micro-batches) and watermarked notify dedup."""

from __future__ import annotations

import json

import pytest

from lichess_event_stream_watcher_spark.streaming import read_ndjson_stream
from lichess_event_stream_watcher_spark.streaming.state import (
    notify_dedup_stream,
    seen_window_stream,
)


def wire(username, email="a@b.c", ip="1.1.1.1", **kw):
    return json.dumps({"t": "signup", "username": username, "email": email, "ip": ip, **kw})


@pytest.fixture()
def few_state_partitions(spark):
    # one state store per shuffle partition per batch: keep the fan-out tiny
    # so local state-store commit overhead doesn't dominate the test
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def drain(spark, stream_df, name, ckpt, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_seen_window_state_across_batches(spark, tmp_path, few_state_partitions):
    landing = tmp_path / "landing"
    landing.mkdir()
    # two files; maxFilesPerTrigger=1 forces TWO micro-batches in one run,
    # so the second batch exercises existing-state merge
    (landing / "a.ndjson").write_text("\n".join([wire("Alice"), wire("BOB"), wire("alice")]))
    (landing / "b.ndjson").write_text("\n".join([wire("ALICE"), wire("carol")]))

    events = read_ndjson_stream(spark, str(landing), max_files_per_trigger=1)
    out = drain(
        spark,
        seen_window_stream(events, recent_k=2),
        "seen_updates",
        str(tmp_path / "ckpt1"),
        "update",
    ).collect()

    # per-user final counts: alice seen 3x (case-folded), bob 1x, carol 1x
    final = {}
    for r in sorted(out, key=lambda r: r["seen_count"]):
        final[r["user_id"]] = r
    assert final["alice"]["seen_count"] == 3
    assert final["bob"]["seen_count"] == 1
    assert final["carol"]["seen_count"] == 1
    # alice got TWO update emissions (one per batch she appeared in); file
    # processing order is not guaranteed, so the first is 1 or 2, last is 3
    alice_updates = sorted(r["seen_count"] for r in out if r["user_id"] == "alice")
    assert len(alice_updates) == 2 and alice_updates[-1] == 3
    assert alice_updates[0] in (1, 2)
    # last-k rows retained, original case preserved in the payload
    recent = final["alice"]["recent_json"]
    assert len(recent) == 2
    assert all(json.loads(r)["username"].lower() == "alice" for r in recent)


def test_notify_dedup_stream(spark, tmp_path, few_state_partitions):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.ndjson").write_text(
        "\n".join([wire("Dup"), wire("dup"), wire("Other"), wire("DUP")])
    )
    events = read_ndjson_stream(spark, str(landing))
    out = drain(
        spark,
        notify_dedup_stream(events),
        "notify_dedup",
        str(tmp_path / "ckpt2"),
        "append",
    ).collect()
    assert sorted(r["user_id"] for r in out) == ["dup", "other"]
