"""Chat command source — the reference's Zulip long-poll client (S3).

Parity target: src/zulip/rtm.rs:16-179. The reference registers an event
queue (``event_types=["message"]``, :47), long-polls ``/api/v1/events``
carrying the ``(queue_id, last_event_id)`` cursor (:71-99), filters
messages that @-mention the bot in one stream+topic (:126-135), dispatches
the text to the command parser, and replies with parse errors (:143-155).
Heartbeat events count as liveness (:158-166).

This is the CONTROL plane, not a data stream (SURVEY.md §1.1): the client
is a driver-side thread that feeds ``Engine.handle_command``. The
cursor-carrying long-poll is exactly an offset-tracking source; if a
durable command log is ever needed, land the messages in a directory and
read them with the same file source the data plane uses.

The transport is plain urllib long-polling, covered by a loopback HTTP
test (tests/test_rtm_loopback.py): register -> cursor-carrying polls ->
heartbeat liveness -> reconnect-with-re-register on error; the
filter/dispatch/reply logic is additionally unit-tested via
``dispatch_message``.
"""

from __future__ import annotations

import base64
import json
import time
import urllib.parse
import urllib.request
from typing import Callable

RECONNECT_BACKOFF_S = 7


def dispatch_message(
    text: str,
    bot_name: str,
    stream: str,
    topic: str,
    message: dict,
    handle: Callable[[str], None],
) -> bool:
    """The mention/stream/topic filter + dispatch (src/zulip/rtm.rs:126-142).

    Returns True iff the message was addressed to the bot and dispatched.
    """
    ping = f"@**{bot_name}** "
    if (
        text.startswith(ping)
        and message.get("display_recipient") == stream
        and message.get("subject") == topic
    ):
        handle(text[len(ping):])
        return True
    return False


class ZulipRtmClient:
    """Long-poll loop: register queue -> poll with cursor -> dispatch."""

    def __init__(self, url: str, bot_id: str, token: str, bot_name: str,
                 stream: str, topic: str, handle: Callable[[str], None],
                 backoff_s: float = RECONNECT_BACKOFF_S):
        self.url, self.bot_id, self.token = url, bot_id, token
        self.bot_name, self.stream, self.topic = bot_name, stream, topic
        self.handle = handle
        self.backoff_s = backoff_s
        self.last_heartbeat = time.monotonic()
        self.registers = 0
        self.polls = 0
        self.dispatch_errors = 0

    def _auth(self) -> str:
        raw = f"{self.bot_id}:{self.token}".encode()
        return "Basic " + base64.b64encode(raw).decode()

    def _post(self, path: str, form: dict) -> dict:
        req = urllib.request.Request(
            self.url + path,
            data=urllib.parse.urlencode(form).encode(),
            headers={"Authorization": self._auth()},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=90) as r:
            return json.load(r)

    def _get(self, path: str, params: dict) -> dict:
        req = urllib.request.Request(
            self.url + path + "?" + urllib.parse.urlencode(params),
            headers={"Authorization": self._auth()},
        )
        with urllib.request.urlopen(req, timeout=90) as r:
            return json.load(r)

    def run_forever(self, max_polls: int | None = None, sleep=None) -> None:
        """``max_polls``/``sleep`` bound and accelerate the loop under test;
        production callers use the defaults (poll forever, 7 s backoff on
        any transport error — src/zulip/rtm.rs:171-177)."""
        sleep = sleep or time.sleep
        while True:
            try:
                reg = self._post(
                    "/api/v1/register", {"event_types": json.dumps(["message"])}
                )
                self.registers += 1
                queue_id, last_event_id = reg["queue_id"], reg["last_event_id"]
                while True:
                    if max_polls is not None and self.polls >= max_polls:
                        return
                    resp = self._get(
                        "/api/v1/events",
                        {"queue_id": queue_id, "last_event_id": last_event_id},
                    )
                    self.polls += 1
                    for event in resp.get("events", []):
                        last_event_id = max(last_event_id, event.get("id", -1))
                        if event.get("type") == "heartbeat":
                            self.last_heartbeat = time.monotonic()
                        elif event.get("type") == "message":
                            self.last_heartbeat = time.monotonic()
                            msg = event.get("message", {})
                            # dispatch errors are NOT transport errors: a
                            # command handler raising (bad command args,
                            # rules-file OSError, ...) must cost only its
                            # own event — tearing down the poll loop here
                            # would drop the remaining events in this
                            # response and abandon the queue, losing
                            # anything posted before re-registration
                            # (the reference isolates dispatch from the
                            # transport the same way, src/zulip/rtm.rs)
                            try:
                                dispatch_message(
                                    msg.get("content", ""), self.bot_name,
                                    self.stream, self.topic, msg, self.handle,
                                )
                            except Exception as e:  # noqa: BLE001
                                self.dispatch_errors += 1
                                print(f"command dispatch error (event kept): {e}")
            except Exception as e:
                print(f"zulip rtm error, reconnecting in {self.backoff_s}s: {e}")
                if max_polls is not None and self.polls >= max_polls:
                    return
                sleep(self.backoff_s)
