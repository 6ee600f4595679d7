"""Liveness watchdog — src/status.rs as a StreamingQueryListener + restart loop.

The reference runs a 15 s watchdog state machine (src/status.rs:70-85):
stream silent > 90 s -> restart the source (:35-43); command channel silent
> 300 s -> reconnect (:47-64). Spark-side, progress events from the
streaming query ARE the liveness pings; the driver supervises and restarts
the query on silence, with the reference's 7 s reconnect backoff
(src/eventstream.rs:68-69).
"""

from __future__ import annotations

import threading
import time

from pyspark.sql.streaming import StreamingQueryListener

STREAM_SILENCE_RESTART_S = 90  # src/status.rs:36
WATCHDOG_PERIOD_S = 15  # src/status.rs:73
RECONNECT_BACKOFF_S = 7  # src/eventstream.rs:68-69


class _ProgressListener(StreamingQueryListener):
    """Session-wide listener scoped to ONE query: listeners see events
    from EVERY streaming query in the SparkSession, so progress from an
    unrelated query (e.g. the corpus-dedup stream next to the engine
    stream) must not reset the supervised query's silence clock — that
    would mask a hang forever. Events are filtered by query id."""

    def __init__(self, watchdog: "Watchdog"):
        self._watchdog = watchdog

    def _mark(self, query_id) -> None:
        w = self._watchdog
        if w.supervised_id is not None and str(query_id) == str(w.supervised_id):
            w.last_progress = time.monotonic()

    def onQueryStarted(self, event) -> None:
        self._mark(event.id)

    def onQueryProgress(self, event) -> None:
        # any progress (even 0-row batches) counts as liveness, like the
        # reference's heartbeat pings (src/zulip/rtm.rs:158-166)
        self._mark(event.progress.id)

    def onQueryIdle(self, event) -> None:
        self._mark(event.id)

    def onQueryTerminated(self, event) -> None:
        pass


class Watchdog:
    """Supervise a streaming query factory: restart on failure or silence.

    ``query_factory()`` must start and return a StreamingQuery. The watchdog
    polls every ``period_s``; if no progress for ``silence_s`` or the query
    died, it stops the query, sleeps the reconnect backoff, and restarts —
    the S2 auto-reconnect loop, driver-side.
    """

    def __init__(
        self,
        spark,
        query_factory,
        silence_s: float = STREAM_SILENCE_RESTART_S,
        period_s: float = WATCHDOG_PERIOD_S,
        backoff_s: float = RECONNECT_BACKOFF_S,
    ):
        self.spark = spark
        self.query_factory = query_factory
        self.silence_s = silence_s
        self.period_s = period_s
        self.backoff_s = backoff_s
        self.last_progress = time.monotonic()
        self.restarts = 0
        self.supervised_id = None  # set per (re)start; gates the listener
        self._stop = threading.Event()
        self._listener = _ProgressListener(self)

    def run(self, max_restarts: int | None = None) -> None:
        self.spark.streams.addListener(self._listener)
        query = self.query_factory()
        self.supervised_id = query.id
        try:
            while not self._stop.is_set():
                self._stop.wait(self.period_s)
                silent = time.monotonic() - self.last_progress > self.silence_s
                if not query.isActive or silent:
                    if max_restarts is not None and self.restarts >= max_restarts:
                        return
                    try:
                        query.stop()
                    except Exception:
                        pass
                    time.sleep(self.backoff_s)
                    self.restarts += 1
                    self.last_progress = time.monotonic()
                    query = self.query_factory()
                    self.supervised_id = query.id
        finally:
            self.spark.streams.removeListener(self._listener)
            try:
                query.stop()
            except Exception:
                pass

    def stop(self) -> None:
        self._stop.set()
