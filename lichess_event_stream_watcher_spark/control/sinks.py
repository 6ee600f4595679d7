"""Pluggable side-effect sinks (SURVEY.md §2.1 K1-K3).

The reference fires HTTP POSTs fire-and-forget from spawned tasks
(src/eventhandler.rs:151-193, src/zulip/web.rs:11-53). Here side effects are
behind two tiny interfaces so the engine core stays pure and testable:

- ``MessageSink.post(channel, text)`` — the three Zulip stream/topic pairs
  collapse to logical channels: "command", "notify", "log".
- ``ModApiSink.post(endpoint, delay_ms)`` — moderation API calls with the
  jitter policy K2 already computed (executors never sleep; delivery delay
  is the SINK's concern, e.g. a delay-queue table or a timer pool).

Delivery semantics: the reference is at-most-once fire-and-forget
(SURVEY.md §2.10); sinks here receive an idempotency key (the endpoint is
one — POST /mod/{u}/engine/true is idempotent) so an at-least-once retry
wrapper is safe to add.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Protocol


class MessageSink(Protocol):
    def post(self, channel: str, text: str) -> None: ...


class ModApiSink(Protocol):
    def post(self, endpoint: str, delay_ms: int = 0) -> None: ...


@dataclass
class CollectingSink:
    """Test sink: records everything, delivers nothing."""

    messages: list[tuple[str, str]] = field(default_factory=list)
    api_calls: list[tuple[str, int]] = field(default_factory=list)

    def post(self, channel_or_endpoint: str, text_or_delay=None) -> None:
        if isinstance(text_or_delay, str):
            self.messages.append((channel_or_endpoint, text_or_delay))
        else:
            self.api_calls.append((channel_or_endpoint, int(text_or_delay or 0)))

    def channel(self, name: str) -> list[str]:
        return [t for c, t in self.messages if c == name]


class HttpModApiSink:  # pragma: no cover - network not available in tests
    """Production K1/K2: POST {base_url}{endpoint} with Bearer auth after
    delay_ms, from a daemon timer thread — fire-and-forget like the
    reference's spawned tasks, without blocking the driver."""

    def __init__(self, base_url: str, token: str):
        self.base_url = base_url
        self.token = token

    def post(self, endpoint: str, delay_ms: int = 0) -> None:
        timer = threading.Timer(delay_ms / 1000.0, self._send, args=(endpoint,))
        timer.daemon = True
        timer.start()

    def _send(self, endpoint: str) -> None:
        import urllib.request

        req = urllib.request.Request(
            self.base_url + endpoint,
            data=b"",
            method="POST",
            headers={"Authorization": f"Bearer {self.token}"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
        except Exception as e:  # fire-and-forget (src/eventhandler.rs:190-192)
            print(f"Error on mod action: {e}")
