"""Loopback HTTP end-to-end: a localhost chunked-NDJSON server feeds
HttpNdjsonPoller (S1 transport + S2 reconnect), the landing dir feeds the
checkpointed foreachBatch engine, the query is killed and resumed, and the
side-effect log must show every event exactly once — the full
src/eventstream.rs:13-73 path with real sockets instead of network stubs."""

from __future__ import annotations

import datetime as dt
import http.server
import json
import random
import threading

import pytest

from lichess_event_stream_watcher_spark.control.engine import Engine
from lichess_event_stream_watcher_spark.control.sinks import CollectingSink
from lichess_event_stream_watcher_spark.rules.model import (
    UTC,
    Action,
    Criterion,
    CriterionKind,
    Rule,
)
from lichess_event_stream_watcher_spark.rules.store import SignupRulesManager
from lichess_event_stream_watcher_spark.streaming import (
    read_ndjson_stream,
    run_engine_stream,
)
from lichess_event_stream_watcher_spark.streaming.source import HttpNdjsonPoller

NOW = dt.datetime(2026, 8, 13, 12, 0, 0, tzinfo=UTC)


def wire(username, email="a@b.c", ip="1.1.1.1"):
    return json.dumps(
        {"t": "signup", "username": username, "email": email, "ip": ip}
    )


class _StreamHandler(http.server.BaseHTTPRequestHandler):
    """Each GET serves the next scripted session: a list of byte chunks
    (written with flushes, like a chunked upstream), then closes — a clean
    stream end, which the reference treats identically to an error: back
    off and reconnect (src/eventstream.rs:64-71)."""

    sessions: list[list[bytes]] = []
    hits = 0
    auth_seen: list[str] = []

    def do_GET(self):  # noqa: N802 - BaseHTTPRequestHandler API
        cls = type(self)
        cls.auth_seen.append(self.headers.get("Authorization", ""))
        session = cls.sessions[min(cls.hits, len(cls.sessions) - 1)]
        cls.hits += 1
        self.send_response(200)
        self.send_header("Content-Type", "application/x-ndjson")
        self.end_headers()
        for chunk in session:
            self.wfile.write(chunk)
            self.wfile.flush()

    def log_message(self, *a):  # silence request logging
        pass


@pytest.fixture()
def http_stream():
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _StreamHandler)
    _StreamHandler.sessions = []
    _StreamHandler.hits = 0
    _StreamHandler.auth_seen = []
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server, f"http://127.0.0.1:{server.server_address[1]}/api/stream"
    server.shutdown()


def mk_engine(tmp_path) -> Engine:
    store = SignupRulesManager(str(tmp_path / "rules.json"))
    store.add_rule(
        Rule("spam", Criterion(CriterionKind.EMAIL_CONTAINS, "spam"), [Action.NOTIFY_ZULIP])
    )
    return Engine(
        store,
        messages=CollectingSink(),
        mod_api=CollectingSink(),
        rng=random.Random(1),
        now_fn=lambda: NOW,
    )


def test_poller_reconnects_and_engine_sees_each_event_once(
    spark, tmp_path, http_stream
):
    server, url = http_stream
    landing = tmp_path / "landing"
    landing.mkdir()
    # session 1: two lines, split MID-LINE across chunks (the line assembler
    # must join them) plus a dangling partial that the close drops;
    # session 2 (after reconnect): two more lines; session 3+: empty
    l1, l2 = wire("U1", email="spam@x"), wire("U2")
    l3, l4 = wire("U3", email="spam@y"), wire("U4")
    _StreamHandler.sessions = [
        [(l1 + "\n").encode() + l2[:7].encode(), l2[7:].encode() + b"\n" + b'{"t":"signup","partial'],
        [(l3 + "\n" + l4 + "\n").encode()],
        [b""],
    ]

    poller = HttpNdjsonPoller(url, "tok-123", str(landing), backoff_s=0.01)
    poller.run_forever(max_connects=2)
    assert poller.connects == 2  # stream end -> backoff -> reconnect (S2)
    assert _StreamHandler.auth_seen[0] == "Bearer tok-123"  # src/eventstream.rs:24-28
    files = sorted(p.name for p in landing.iterdir())
    assert files and all(f.startswith("poll-") for f in files)

    # drain 1: the checkpointed engine processes U1..U4 exactly once
    engine = mk_engine(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    q = run_engine_stream(
        engine, read_ndjson_stream(spark, str(landing)), ckpt, available_now=True
    )
    q.awaitTermination(120)
    assert engine.store.find_rule("spam").match_count == 2
    assert sorted(engine.store.find_rule("spam").most_recent_caught) == ["U1", "U3"]
    assert len(engine.messages.channel("notify")) == 2

    # kill/resume: more data arrives over a THIRD transport session, the
    # query restarts from the checkpoint — replays nothing, picks up only
    # the new file, total side effects stay exactly-once
    _StreamHandler.sessions[2] = [(wire("U5", email="spam@z") + "\n").encode()]
    poller.run_forever(max_connects=3)
    q2 = run_engine_stream(
        engine, read_ndjson_stream(spark, str(landing)), ckpt, available_now=True
    )
    q2.awaitTermination(120)
    assert engine.store.find_rule("spam").match_count == 3
    assert len(engine.messages.channel("notify")) == 3
    notifies = engine.messages.channel("notify")
    assert len(set(notifies)) == 3  # no duplicate side effects


def test_watchdog_restarts_dead_query(spark, tmp_path):
    """The S2 supervisor loop: a query that terminates (here: availableNow
    drains and stops) reads as dead; the watchdog backs off and restarts it
    via the factory until max_restarts, then returns."""
    from lichess_event_stream_watcher_spark.streaming.watchdog import Watchdog

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.ndjson").write_text(wire("W1") + "\n")
    starts = []

    def factory():
        q = (
            read_ndjson_stream(spark, str(landing))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / f"ck{len(starts)}"))
            .trigger(availableNow=True)
            .start()
        )
        starts.append(q.id)
        return q

    wd = Watchdog(spark, factory, silence_s=60, period_s=0.2, backoff_s=0.01)
    wd.run(max_restarts=2)
    assert wd.restarts == 2
    assert len(starts) == 3  # initial + 2 restarts


def test_poller_progress_metric(tmp_path, http_stream, capsys):
    """A6: the reference prints "400 done" every 400 ingested lines
    (src/eventstream.rs:45-48); the poller keeps the same cadence."""
    server, url = http_stream
    landing = tmp_path / "landing"
    landing.mkdir()
    _StreamHandler.sessions = [[("\n".join(wire(f"u{i}") for i in range(10)) + "\n").encode()]]
    poller = HttpNdjsonPoller(url, "t", str(landing), backoff_s=0.01)
    poller.PROGRESS_EVERY = 4
    poller.run_forever(max_connects=1)
    assert poller.lines_total == 10
    assert capsys.readouterr().out.count("400 done") == 2  # 10 lines / every-4


def test_watchdog_ignores_other_queries_progress(spark, tmp_path):
    """Round-7 review fix: StreamingQueryListener is session-wide, so
    progress from an UNRELATED query must not reset the supervised
    query's silence clock — otherwise one busy query masks another's
    hang forever. Driven through the listener directly with fake
    events scoped by query id."""
    import time as _time

    from lichess_event_stream_watcher_spark.streaming.watchdog import (
        Watchdog,
        _ProgressListener,
    )

    wd = Watchdog(spark, query_factory=lambda: None, silence_s=60)
    wd.supervised_id = "q-supervised"
    listener = _ProgressListener(wd)

    class _Evt:
        def __init__(self, qid):
            self.id = qid
            self.progress = self

    stale = _time.monotonic() - 1000
    wd.last_progress = stale
    listener.onQueryProgress(_Evt("q-other"))
    assert wd.last_progress == stale  # unrelated query: clock untouched
    listener.onQueryIdle(_Evt("q-other"))
    assert wd.last_progress == stale
    listener.onQueryProgress(_Evt("q-supervised"))
    assert wd.last_progress > stale  # the supervised query counts


def test_poller_filenames_survive_transport_restart(tmp_path, http_stream):
    """Round-7 review fix: a NEW poller instance (transport-process
    restart, same landing dir) must never reuse a previous instance's
    landing-file names — Spark's file source remembers processed paths
    in its checkpoint, so a reused name is silently skipped (and the
    overwrite corrupts replay). Also: no visible half-written files —
    publication is dot-temp + rename."""
    server, url = http_stream
    landing = tmp_path / "landing"
    landing.mkdir()
    payload = [(wire("u1") + "\n").encode()]
    _StreamHandler.sessions = [list(payload)]
    p1 = HttpNdjsonPoller(url, "t", str(landing), backoff_s=0.01)
    p1.run_forever(max_connects=1)
    _StreamHandler.sessions = [list(payload)]
    p2 = HttpNdjsonPoller(url, "t", str(landing), backoff_s=0.01)
    p2.run_forever(max_connects=1)
    files = sorted(f.name for f in landing.iterdir())
    assert len(files) == 2, files  # no overwrite across instances
    assert len(set(files)) == 2
    assert all(f.startswith("poll-") and f.endswith(".ndjson") for f in files)
    assert not any(f.startswith(".") for f in files)  # no leftover temps
