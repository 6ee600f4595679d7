"""lichess_event_stream_watcher_spark — a PySpark-native streaming rule engine.

A brand-new engine with the query/data-processing capabilities of the
reference (thomas-daniels/lichess-event-stream-watcher, Rust): NDJSON event
ingestion, GeoIP/user-agent enrichment, a dynamic predicate-rule table
compiled to Catalyst Column expressions, bounded stateful dedup windows,
per-rule match statistics, rule TTL lifecycle, dry-run evaluation, and a
chat-command DSL — re-expressed Spark-first (DataFrame/SQL + Structured
Streaming), and extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Architecture map (reference file:line cites are in each module):

- ``schemas``      — User/Rule/Event StructTypes (src/event.rs:42-101)
- ``rules.model``  — Rule/Criterion/Action data model (src/signup/rules.rs)
- ``rules.store``  — rule store: CRUD, persistence, expiry (src/signup/rules.rs:21-161)
- ``plans.compile``— rules -> broadcast Column predicates (the J1 join)
- ``operators``    — enrichment, stateful windows, dedup, similarity, text
- ``functions``    — scalar function library (ip_to_num, is_in_ip_range, ...)
- ``sources``      — NDJSON batch/stream sources with DROPMALFORMED
- ``sinks``        — action sinks (collecting/HTTP), jitter policy
- ``streaming``    — Structured Streaming pipeline wiring + watchdog
- ``control``      — the chat-command DSL parser (src/zulip/command.rs)
- ``lua_compat``   — user-code predicate runtime parity (src/lua.rs)
"""

__version__ = "0.1.0"
