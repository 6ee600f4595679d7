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
    # round-7 review pin: the plan must use dropDuplicatesWITHINWatermark
    # — plain dropDuplicates keyed on user_id alone never evicts its
    # state (the watermark predicate for the keys is empty) and
    # suppresses a user forever instead of within the horizon
    plan = notify_dedup_stream(events)._jdf.queryExecution().logical().toString()
    assert "DeduplicateWithinWatermark" in plan, plan


@pytest.fixture()
def rocksdb_state_store(spark):
    """transformWithStateInPandas requires the RocksDB state store
    provider; restore the default provider afterwards so the
    applyInPandasWithState tests keep their HDFS-backed stores."""
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_seen_window_tws_matches_apply_in_pandas_twin(
    spark, tmp_path, few_state_partitions, rocksdb_state_store
):
    """The transformWithStateInPandas twin must produce the exact same
    final per-user state as the applyInPandasWithState path on a two-batch
    replay (state continuity, lowercase keying, last-k truncation).

    Environment-gated: the TWS Python state-server protocol runs over
    protobuf, which this container does not ship — skip (not fail) where
    google.protobuf is absent, exactly like the ua-parser auto-upgrade."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol requires protobuf",
    )
    from lichess_event_stream_watcher_spark.streaming.state import (
        seen_window_stream_tws,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.ndjson").write_text(
        "\n".join([wire("Alice"), wire("BOB"), wire("alice")])
    )
    (landing / "b.ndjson").write_text("\n".join([wire("ALICE"), wire("carol")]))

    def final_states(fn, name, ckpt):
        events = read_ndjson_stream(spark, str(landing), max_files_per_trigger=1)
        rows = drain(spark, fn(events, recent_k=2), name, ckpt, "update").collect()
        # update mode emits one row per touched key per batch: keep the last
        out = {}
        for r in rows:
            prev = out.get(r.user_id)
            if prev is None or r.seen_count > prev.seen_count:
                out[r.user_id] = r
        return out

    tws = final_states(seen_window_stream_tws, "seen_tws", str(tmp_path / "ck_tws"))
    apw = final_states(seen_window_stream, "seen_apw", str(tmp_path / "ck_apw"))
    assert set(tws) == set(apw) == {"alice", "bob", "carol"}
    for uid in tws:
        assert tws[uid].seen_count == apw[uid].seen_count, uid
        assert list(tws[uid].recent_json) == list(apw[uid].recent_json), uid
        assert tws[uid].first_seen == apw[uid].first_seen, uid
        assert tws[uid].last_seen == apw[uid].last_seen, uid
    assert tws["alice"].seen_count == 3
    assert len(tws["alice"].recent_json) == 2


def test_tws_time_mode_switch():
    """TTL requires ProcessingTime mode: Spark rejects ttlDurationMs under
    timeMode="None" at query start, so the mode must track the ttl knob
    (regression: the twin hardcoded "None", so every ttl_minutes call
    failed at start — or silently never expired state)."""
    from lichess_event_stream_watcher_spark.streaming.state import tws_time_mode

    assert tws_time_mode(None) == "None"
    assert tws_time_mode(60_000) == "ProcessingTime"


def test_seen_window_tws_with_ttl_runs(
    spark, tmp_path, few_state_partitions, rocksdb_state_store
):
    """A ttl_minutes-enabled TWS query must start and produce state (the
    TTL is far longer than the test, so nothing evicts — this guards the
    query-start validation path, which rejects TTL state variables unless
    timeMode is ProcessingTime). protobuf-gated like the twin test."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol requires protobuf",
    )
    from lichess_event_stream_watcher_spark.streaming.state import (
        seen_window_stream_tws,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.ndjson").write_text("\n".join([wire("Alice"), wire("alice")]))
    events = read_ndjson_stream(spark, str(landing), max_files_per_trigger=1)
    rows = drain(
        spark,
        seen_window_stream_tws(events, ttl_minutes=60, recent_k=2),
        "seen_tws_ttl",
        str(tmp_path / "ck_tws_ttl"),
        "update",
    ).collect()
    assert max(r.seen_count for r in rows if r.user_id == "alice") == 2


def test_stream_stream_interval_join_matches_batch_twin(spark, tmp_path, few_state_partitions):
    """Two live streams (views, clicks) interval-join with bounded state;
    the streaming result must equal the batch twin on the same files, and
    clicks outside [view_ts, view_ts + 30 min] must not attribute."""
    import json as _json

    from lichess_event_stream_watcher_spark.streaming.joins import stream_interval_join

    views_dir = tmp_path / "views"
    clicks_dir = tmp_path / "clicks"
    views_dir.mkdir()
    clicks_dir.mkdir()

    def ev(user, ts):
        return _json.dumps({"user_id": user, "ts": ts})

    (views_dir / "v.json").write_text(
        "\n".join(
            [
                ev("u1", "2024-01-01 10:00:00"),
                ev("u2", "2024-01-01 10:05:00"),
                ev("u3", "2024-01-01 10:00:00"),
            ]
        )
    )
    (clicks_dir / "c.json").write_text(
        "\n".join(
            [
                ev("u1", "2024-01-01 10:10:00"),  # in window (+10 min)
                ev("u1", "2024-01-01 11:10:00"),  # out (+70 min)
                ev("u2", "2024-01-01 10:04:00"),  # out (before the view)
                ev("u2", "2024-01-01 10:35:00"),  # in window (+30 min exactly)
                ev("u4", "2024-01-01 10:10:00"),  # no view at all
            ]
        )
    )
    schema = "user_id string, ts timestamp"

    def run(reader):
        views = reader(str(views_dir))
        clicks = reader(str(clicks_dir))
        return stream_interval_join(
            views, clicks, key="user_id", left_ts="ts", right_ts="ts"
        )

    batch_rows = {
        (r.key, str(r.l_ts), str(r.r_ts), r.lag_seconds)
        for r in run(lambda d: spark.read.schema(schema).json(d)).collect()
    }
    stream_df = run(lambda d: spark.readStream.schema(schema).json(d))
    assert stream_df.isStreaming
    out = drain(
        spark, stream_df, "attrib", str(tmp_path / "ckpt_join"), "append"
    ).collect()
    stream_rows = {(r.key, str(r.l_ts), str(r.r_ts), r.lag_seconds) for r in out}
    assert stream_rows == batch_rows
    assert stream_rows == {
        ("u1", "2024-01-01 10:00:00", "2024-01-01 10:10:00", 600),
        ("u2", "2024-01-01 10:05:00", "2024-01-01 10:35:00", 1800),
    }
    # payload structs survive the join
    assert all(r.l.user_id == r.key and r.r.user_id == r.key for r in out)
