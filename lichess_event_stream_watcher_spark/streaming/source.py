"""Streaming ingestion — the NDJSON signup stream as Structured Streaming.

Parity target: src/eventstream.rs:13-73 (S1/S2). The reference GETs an HTTP
chunked body, splits chunks on newlines, JSON-parses each line and drops
malformed ones with a log (:51-58). Spark-first form:

- the LINE TRANSPORT is a pluggable landing zone: a directory of NDJSON
  files (file source — used in tests and by the HTTP poller below), a
  socket, or Kafka. All feed the same parser.
- the PARSE stage is ``from_json`` with the explicit wire schema
  (schema-on-read with defaults, SURVEY.md §1.2) and DROPMALFORMED
  semantics: unparseable lines and rows missing required fields are
  filtered out, exactly like Event::from_json failures (:53-58).
- an ``ingest_time`` column is stamped per row — the reference has no
  event-time field; arrival time IS event time (src/eventhandler.rs:52,395;
  SURVEY.md §2.10).

The same parser runs batch (``read_ndjson_batch``) and streaming
(``read_ndjson_stream``) — every streaming op has a batch twin on the same
DataFrame code (SURVEY.md §7).

Scale: parsing is a map-side projection (no shuffle); the file source
scales by partitioning the landing files; malformed-row filtering pushes
into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SIGNUP_WIRE_SCHEMA


def parse_signup_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """NDJSON lines -> engine-schema signup rows (DROPMALFORMED).

    Drops: blank lines (src/eventstream.rs:51-52), malformed JSON (:53-58),
    non-signup events (tag dispatch on "t", src/event.rs:11-14), and rows
    missing serde-required fields (username/email/ip, src/event.rs:42-52).
    ``susp_ip`` defaults false (src/event.rs:48-49,60-62).
    """
    parsed = lines.select(
        F.from_json(F.trim(F.col(value_col)), SIGNUP_WIRE_SCHEMA).alias("e")
    )
    return (
        parsed.filter(F.col("e").isNotNull() & (F.col("e.t") == "signup"))
        .filter(
            F.col("e.username").isNotNull()
            & F.col("e.email").isNotNull()
            & F.col("e.ip").isNotNull()
        )
        .select(
            F.col("e.username").alias("username"),
            F.col("e.email").alias("email"),
            F.col("e.ip").alias("ip"),
            F.col("e.userAgent").alias("user_agent"),
            F.col("e.fingerPrint").alias("finger_print"),
            F.coalesce(F.col("e.suspIp"), F.lit(False)).alias("susp_ip"),
            F.current_timestamp().alias("ingest_time"),
        )
    )


def read_ndjson_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan over an NDJSON landing directory."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_signup_lines(reader.load(landing_dir))


def read_ndjson_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch twin of the streaming scan (same parse code)."""
    return parse_signup_lines(spark.read.format("text").load(path))


class NdjsonTailDataSource:
    """Spark 4 Python streaming data source: tail a growing NDJSON file with
    byte-offset tracking — the zero-landing-zone form of S1
    (src/eventstream.rs:13-73).

    The transport thread (``HttpNdjsonPoller`` in append mode, or anything
    else) appends lines to one file; this source's offsets are byte
    positions, so every micro-batch is an exact, REPLAYABLE line range:
    ``readBetweenOffsets`` re-reads any committed range verbatim, giving
    Spark-side exactly-once over an at-least-once transport (SURVEY.md
    §2.10). Only complete (newline-terminated) lines are emitted; a partial
    trailing line stays un-consumed until its newline arrives — mirroring
    the reference's chunk-buffering split (:41-51).

    Usage::

        spark.dataSource.register(ndjson_tail_source())
        lines = spark.readStream.format("ndjson_tail").option("path", p).load()
        signups = parse_signup_lines(lines)
    """

    @staticmethod
    def build():
        from pyspark.sql.datasource import (
            DataSource,
            SimpleDataSourceStreamReader,
        )

        class _Reader(SimpleDataSourceStreamReader):
            def __init__(self, options):
                self.path = options.get("path")
                if not self.path:
                    raise ValueError("ndjson_tail requires .option('path', ...)")

            def initialOffset(self) -> dict:
                return {"pos": 0}

            def _read_range(self, start_pos: int, end_pos: int | None):
                import os

                try:
                    size = os.path.getsize(self.path)
                except OSError:
                    return [], start_pos
                stop = size if end_pos is None else min(end_pos, size)
                if stop <= start_pos:
                    return [], start_pos
                with open(self.path, "rb") as f:
                    f.seek(start_pos)
                    data = f.read(stop - start_pos)
                # only complete lines advance the offset (partial tail waits)
                last_nl = data.rfind(b"\n")
                if end_pos is None and last_nl < 0:
                    return [], start_pos
                if end_pos is None:
                    data = data[: last_nl + 1]
                rows = [
                    (ln.decode("utf-8", errors="replace"),)
                    for ln in data.split(b"\n")
                    if ln.strip()
                ]
                return rows, start_pos + len(data)

            def read(self, start: dict):
                rows, new_pos = self._read_range(start["pos"], None)
                return iter(rows), {"pos": new_pos}

            def readBetweenOffsets(self, start: dict, end: dict):
                # replay of a COMMITTED range: the bytes must still exist.
                # A shrunken file means truncation/rotation corrupted the
                # replay contract — surface it, never silently return less.
                import os

                size = os.path.getsize(self.path)
                if size < end["pos"]:
                    raise RuntimeError(
                        f"ndjson_tail replay corruption: {self.path} is "
                        f"{size} bytes but committed batch ends at "
                        f"{end['pos']} — the tailed file was truncated or "
                        "rotated after commit"
                    )
                rows, _ = self._read_range(start["pos"], end["pos"])
                return iter(rows)

        class NdjsonTail(DataSource):
            @classmethod
            def name(cls) -> str:
                return "ndjson_tail"

            def schema(self) -> str:
                return "value string"

            def simpleStreamReader(self, schema):
                return _Reader(self.options)

        return NdjsonTail


def ndjson_tail_source():
    """The registerable DataSource class (factory keeps the pyspark.datasource
    import lazy so batch-only callers never pay it)."""
    return NdjsonTailDataSource.build()


class HttpNdjsonPoller:
    """Production S1/S2: a driver-side thread GETs the chunked NDJSON stream
    and appends complete lines to the landing directory in rotating files;
    on stream end/error it sleeps the 7 s backoff and reconnects forever
    (src/eventstream.rs:64-71). The streaming query then tails the landing
    dir — decoupling transport restarts from query restarts.

    (A Spark 4 Python streaming data source is the zero-landing-zone
    alternative; the landing-dir form is kept primary because it preserves
    replayability and exactly-once file-source semantics.)
    """

    RECONNECT_BACKOFF_S = 7  # src/eventstream.rs:68-69
    PROGRESS_EVERY = 400  # src/eventstream.rs:45-48 ("400 done")
    # socket timeout on the chunked GET: the reference restarts the
    # source after 90 s of silence (src/status.rs:35-43); without a
    # timeout a half-open TCP connection blocks resp.read() forever and
    # run_forever never reaches its reconnect path — and the query-level
    # watchdog can't see it (the query keeps making 0-row progress)
    READ_TIMEOUT_S = 90

    def __init__(
        self,
        url: str,
        token: str,
        landing_dir: str,
        backoff_s: float | None = None,
        read_timeout_s: float | None = None,
    ):
        import uuid

        self.url, self.token, self.landing_dir = url, token, landing_dir
        self.backoff_s = self.RECONNECT_BACKOFF_S if backoff_s is None else backoff_s
        self.read_timeout_s = (
            self.READ_TIMEOUT_S if read_timeout_s is None else read_timeout_s
        )
        # landing-file names carry a per-poller run id: Spark's file
        # stream source remembers PROCESSED PATHS in its checkpoint, so
        # a restarted transport process re-counting from poll-00000001
        # would overwrite old names and every new file would be silently
        # ignored as already-seen
        self.run_id = uuid.uuid4().hex[:12]
        self.connects = 0
        self.files_written = 0
        self.lines_total = 0
        self._progress_residue = 0

    def poll_once(self) -> None:
        """One transport session: connect, stream chunks, flush complete
        lines to a fresh landing file per chunk batch; returns on stream
        end, raises on transport error. A partial trailing line is DROPPED
        (the server closed mid-line — the reference's line iterator likewise
        only ever yields complete lines, src/eventstream.rs:45-58)."""
        import urllib.request

        import os as _os

        self.connects += 1
        req = urllib.request.Request(
            self.url, headers={"Authorization": f"Bearer {self.token}"}
        )
        with urllib.request.urlopen(req, timeout=self.read_timeout_s) as resp:
            buf = b""
            for chunk in iter(lambda: resp.read(8192), b""):
                buf += chunk
                *lines, buf = buf.split(b"\n")
                lines = [ln for ln in lines if ln.strip()]
                if lines:
                    # A6 ingest progress: the reference prints "400 done"
                    # every 400 lines (src/eventstream.rs:45-48)
                    self.lines_total += len(lines)
                    self._progress_residue += len(lines)
                    while self._progress_residue >= self.PROGRESS_EVERY:
                        self._progress_residue -= self.PROGRESS_EVERY
                        print("400 done")
                    self.files_written += 1
                    # atomic publish: write to a dot-prefixed temp name
                    # (Spark's file listing ignores dot files) and rename
                    # into place, so a concurrent trigger can never list
                    # a half-written file, mark it seen, and lose lines
                    final = (
                        f"{self.landing_dir}/poll-{self.run_id}-"
                        f"{self.files_written:08d}.ndjson"
                    )
                    tmp = f"{self.landing_dir}/.{_os.path.basename(final)}.tmp"
                    with open(tmp, "wb") as f:
                        f.write(b"\n".join(lines) + b"\n")
                    _os.rename(tmp, final)

    def run_forever(self, max_connects: int | None = None, sleep=None) -> None:
        """The S2 reconnect loop: poll, then ALWAYS back off 7 s and
        reconnect — both clean stream end and transport error re-enter the
        connect loop (src/eventstream.rs:64-71). ``max_connects``/``sleep``
        bound and accelerate the loop under test."""
        import time as _time

        sleep = sleep or _time.sleep
        while True:
            try:
                self.poll_once()
            except Exception as e:  # noqa: BLE001 — reconnect on any transport error
                print(f"stream error, reconnecting in {self.backoff_s}s: {e}")
            if max_connects is not None and self.connects >= max_connects:
                return
            sleep(self.backoff_s)
