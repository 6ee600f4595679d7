"""Registry certification-policy guards (no SparkSession needed).

Rounds 2-4 each ended with ~40 registered queries that no driver window
had ever hash-checked, because registration outpaced the 50-row
correctness window. These tests make that debt a CI failure instead of a
verdict finding: every registered query must either sit inside the
current driver window (the head-50 of ``_DRIVER_PRIORITY``) or already
hold a lifetime green row in a committed ``CORRECTNESS_r*.json``.

Round 6 (the backlog is zero) adds the FRESHNESS rule: a green row decays
— any query whose newest green row is more than ``STALE_ROUNDS`` rounds
old must be back in the window head. Rotating the 50 slots over the
~177-query registry on that bound re-certifies everything on a <= 4-round
cycle, so "green" always means "green through reasonably current code".
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries whose output is legitimately not hash-comparable cross-engine
# (documented in each one's docstring); everything else must carry an
# oracle so the driver records a full hash check, not rows-only. The
# driver records rows_match=None (err: no_oracle) for these, so they can
# never earn a lifetime green row — they count as covered through
# test_rows_only_queries_run instead of taxing a window slot forever.
ROWS_ONLY_ALLOWLIST = {"sketch_stats"}

DRIVER_WINDOW = 50

# A green row older than this many rounds (vs the newest committed
# CORRECTNESS file) no longer certifies current code by itself. 4 is the
# strict rotation cycle for ~177 queries over 50 slots (ceil(177/50)) and
# the largest bound that never turns a round RED at its start: a query
# certified in round k must re-enter the window during round k+4 (when
# the newest committed file is r(k+3) and k == horizon), so each round
# opens green and the test forces the rotation within the round.
STALE_ROUNDS = 4


def _registry():
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


def _green_rounds() -> dict[str, int]:
    """Newest round with a FULL HASH green row per query (rows_match alone
    does not certify an oracled query — a hash mismatch with matching row
    counts must not count as green)."""
    newest: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def _max_round() -> int:
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    return max(rounds) if rounds else 0


def _window(qs) -> list[str]:
    from lichess_event_stream_watcher_spark.queries import _DRIVER_PRIORITY

    return [n for n in _DRIVER_PRIORITY if n in qs][:DRIVER_WINDOW]


def test_driver_priority_names_are_all_registered():
    from lichess_event_stream_watcher_spark.queries import _DRIVER_PRIORITY

    qs, _ = _registry()
    dead = [n for n in _DRIVER_PRIORITY if n not in qs]
    assert not dead, f"_DRIVER_PRIORITY names without a registration: {dead}"
    dupes = [n for n in set(_DRIVER_PRIORITY) if _DRIVER_PRIORITY.count(n) > 1]
    assert not dupes, f"duplicated window slots: {dupes}"


def test_every_query_is_window_covered_or_lifetime_green():
    qs, _ = _registry()
    covered = set(_window(qs)) | set(_green_rounds()) | ROWS_ONLY_ALLOWLIST
    debt = sorted(n for n in qs if n not in covered)
    assert not debt, (
        f"{len(debt)} registered queries are outside the {DRIVER_WINDOW}-row "
        f"driver window AND have no lifetime hash-green driver row — "
        f"registering them re-opens the certification backlog. Either rotate "
        f"them into the window head or defer registration: {debt}"
    )


def test_no_stale_green_outside_window():
    """The freshness rotation rule, mechanized: every registered query must
    hold a hash-green row at most STALE_ROUNDS rounds old, or sit in the
    current window head (about to be re-certified). Allowlisted rows-only
    queries are exempt (the driver cannot green them)."""
    qs, _ = _registry()
    newest = _green_rounds()
    horizon = _max_round() - STALE_ROUNDS
    window = set(_window(qs))
    stale = sorted(
        n
        for n in qs
        if n not in window
        and n not in ROWS_ONLY_ALLOWLIST
        and newest.get(n, -(10**9)) <= horizon
    )
    assert not stale, (
        f"{len(stale)} queries hold only stale green rows (newest <= round "
        f"{horizon}) and are not queued in the current {DRIVER_WINDOW}-row "
        f"window — rotate them into the window head: "
        f"{[(n, newest.get(n)) for n in stale]}"
    )


def test_rows_only_registrations_are_explicitly_allowlisted():
    qs, oracles = _registry()
    rows_only = {n for n in qs if n not in oracles}
    stray = rows_only - ROWS_ONLY_ALLOWLIST
    assert not stray, (
        f"queries registered without an oracle but not allowlisted: "
        f"{sorted(stray)} — add an oracle (preferred) or document why the "
        f"output is not hash-comparable and extend the allowlist"
    )
    stale = ROWS_ONLY_ALLOWLIST - set(qs)
    assert not stale, f"allowlist entries no longer registered: {sorted(stale)}"
