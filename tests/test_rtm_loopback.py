"""Loopback Zulip RTM transport test (S3): a localhost HTTP server plays the
/api/v1/register + /api/v1/events long-poll protocol (src/zulip/rtm.rs:16-179)
and the client must carry the cursor, honor basic auth, dispatch only
bot-addressed messages in the configured stream+topic, treat heartbeats as
liveness, and re-register after a transport error with the 7s-backoff loop."""

from __future__ import annotations

import base64
import http.server
import json
import threading
import urllib.parse

import pytest

from lichess_event_stream_watcher_spark.control.rtm import ZulipRtmClient

BOT = "watcherbot"
STREAM = "mod-log"
TOPIC = "signups"


def msg_event(eid: int, content: str, stream: str = STREAM, topic: str = TOPIC) -> dict:
    return {
        "id": eid,
        "type": "message",
        "message": {"content": content, "display_recipient": stream, "subject": topic},
    }


class _ZulipHandler(http.server.BaseHTTPRequestHandler):
    polls: list[dict] = []          # parsed query params per /events call
    auth: list[str] = []
    registers = 0
    # scripted /events responses; "ERROR" -> 500 (forces reconnect+re-register)
    script: list = []

    def _reply(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):  # noqa: N802
        cls = type(self)
        cls.auth.append(self.headers.get("Authorization", ""))
        if self.path == "/api/v1/register":
            cls.registers += 1
            self._reply({"queue_id": f"q{cls.registers}", "last_event_id": -1})
        else:
            self._reply({"result": "error"}, 404)

    def do_GET(self):  # noqa: N802
        cls = type(self)
        path, _, query = self.path.partition("?")
        if path != "/api/v1/events":
            self._reply({"result": "error"}, 404)
            return
        cls.polls.append({k: v[0] for k, v in urllib.parse.parse_qs(query).items()})
        step = cls.script[min(len(cls.polls) - 1, len(cls.script) - 1)]
        if step == "ERROR":
            self._reply({"result": "error"}, 500)
        else:
            self._reply({"result": "success", "events": step})

    def log_message(self, *a):
        pass


@pytest.fixture()
def zulip_server():
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _ZulipHandler)
    _ZulipHandler.polls = []
    _ZulipHandler.auth = []
    _ZulipHandler.registers = 0
    _ZulipHandler.script = []
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_long_poll_cursor_dispatch_and_reconnect(zulip_server):
    server, url = zulip_server
    _ZulipHandler.script = [
        [  # poll 1: heartbeat + two messages (one for the bot, one not)
            {"id": 7, "type": "heartbeat"},
            msg_event(8, f"@**{BOT}** status"),
            msg_event(9, "@**someoneelse** status"),
        ],
        "ERROR",  # poll 2: transport error -> backoff -> re-register
        [msg_event(12, f"@**{BOT}** list rules")],  # poll 3 (new queue)
        [msg_event(13, f"@**{BOT}** off-topic", topic="other")],  # poll 4: filtered
        [],  # idle
    ]
    got: list[str] = []
    client = ZulipRtmClient(
        url, "bot@example", "tok", BOT, STREAM, TOPIC, got.append, backoff_s=0.01
    )
    client.run_forever(max_polls=4)

    # auth: basic base64(bot_id:token) on every call (src/zulip/rtm.rs:30-40)
    expected = "Basic " + base64.b64encode(b"bot@example:tok").decode()
    assert set(_ZulipHandler.auth) == {expected}
    # only bot-addressed, on-stream+topic messages dispatched, ping stripped
    assert got == ["status", "list rules"]
    # the error forced a re-register: two queues seen, cursor restarts at -1
    assert client.registers == 2
    assert _ZulipHandler.polls[0]["queue_id"] == "q1"
    assert _ZulipHandler.polls[2]["queue_id"] == "q2"
    # the cursor advanced past every event id seen in poll 1 (:101 max fold)
    assert _ZulipHandler.polls[1]["last_event_id"] == "9"
    # heartbeat + messages refreshed liveness
    assert client.last_heartbeat > 0


def test_dispatch_error_does_not_tear_down_the_poll_loop(zulip_server):
    """Round-7 review fix: a command HANDLER raising is not a transport
    error — it must cost only its own event. The remaining events in the
    response still dispatch, the cursor advances past the poisoned
    event, and the client does NOT abandon its queue and re-register
    (which would drop anything posted before the new registration)."""
    server, url = zulip_server
    _ZulipHandler.script = [
        [  # one poisoned command between two good ones
            msg_event(5, f"@**{BOT}** status"),
            msg_event(6, f"@**{BOT}** explode"),
            msg_event(7, f"@**{BOT}** list rules"),
        ],
        [],  # idle
    ]
    got: list[str] = []

    def handler(cmd: str) -> None:
        if cmd == "explode":
            raise ValueError("boom")
        got.append(cmd)

    client = ZulipRtmClient(
        url, "bot@example", "tok", BOT, STREAM, TOPIC, handler, backoff_s=0.01
    )
    client.run_forever(max_polls=2)
    assert got == ["status", "list rules"]  # later events still dispatched
    assert client.dispatch_errors == 1
    assert client.registers == 1  # queue NOT abandoned
    # cursor advanced past the poisoned event too
    assert _ZulipHandler.polls[1]["last_event_id"] == "7"
