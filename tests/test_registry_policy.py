"""Registry certification-policy guards (no SparkSession needed).

Rounds 2-4 each ended with ~40 registered queries that no driver window
had ever hash-checked, because registration outpaced the 50-row
correctness window. These tests make that debt a CI failure instead of a
verdict finding: every registered query must either sit inside the
current driver window (the head-50 of ``_DRIVER_PRIORITY``) or already
hold a lifetime green row in a committed ``CORRECTNESS_r*.json``. A new
registration is only legal once something else has certified out of the
window — the mechanical form of "register new queries only into leftover
slots".
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries whose output is legitimately not hash-comparable cross-engine
# (documented in each one's docstring); everything else must carry an
# oracle so the driver records a full hash check, not rows-only.
ROWS_ONLY_ALLOWLIST = {"sketch_stats"}

DRIVER_WINDOW = 50


def _registry():
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


def _lifetime_green() -> set[str]:
    green: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") or row.get("rows_match"):
                green.add(name)
    return green


def test_driver_priority_names_are_all_registered():
    from lichess_event_stream_watcher_spark.queries import _DRIVER_PRIORITY

    qs, _ = _registry()
    dead = [n for n in _DRIVER_PRIORITY if n not in qs]
    assert not dead, f"_DRIVER_PRIORITY names without a registration: {dead}"
    dupes = [n for n in set(_DRIVER_PRIORITY) if _DRIVER_PRIORITY.count(n) > 1]
    assert not dupes, f"duplicated window slots: {dupes}"


def test_every_query_is_window_covered_or_lifetime_green():
    from lichess_event_stream_watcher_spark.queries import _DRIVER_PRIORITY

    qs, _ = _registry()
    window = [n for n in _DRIVER_PRIORITY if n in qs][:DRIVER_WINDOW]
    covered = set(window) | _lifetime_green()
    debt = sorted(n for n in qs if n not in covered)
    assert not debt, (
        f"{len(debt)} registered queries are outside the {DRIVER_WINDOW}-row "
        f"driver window AND have no lifetime green driver row — registering "
        f"them re-opens the certification backlog. Either rotate them into "
        f"the window head or defer registration: {debt}"
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
