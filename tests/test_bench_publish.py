"""bench.py publication invariants (no SparkSession needed): the per-phase
splits written to BENCH_DETAIL.json must sum EXACTLY to their published
(independently rounded) totals — round-5 published phases that drifted a
few ms from the total because each phase rounded independently."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _publish_phases  # noqa: E402


def test_phases_sum_exactly_to_published_total():
    phases = {"a": 1.23456, "b": 0.00049, "c": 7.89012}
    total = round(sum(phases.values()), 3)  # what the bench publishes
    out = _publish_phases(phases, total)
    assert round(sum(out.values()), 3) == total
    assert list(out) == ["a", "b", "c"]  # insertion order preserved
    # non-final phases round plainly; the final one absorbs the drift
    assert out["a"] == 1.235 and out["b"] == 0.0


def test_phases_absorb_total_residual():
    # the curation total includes a few ms outside the stamped stages
    # (call overhead, unpersist); the derived last phase absorbs it so
    # the invariant holds against the PUBLISHED total, not the stamp sum
    phases = {"x": 1.0, "y": 2.0}
    out = _publish_phases(phases, 3.01)
    assert out == {"x": 1.0, "y": 2.01}


def test_empty_phases():
    assert _publish_phases({}, 5.0) == {}


def test_median_ratio_skips_fixed_overhead_and_small_samples():
    from bench import _median_ratio_vs_prev

    timings = {f"q{i}": 2.0 for i in range(15)}
    prev = {f"q{i}": 1.0 for i in range(15)}
    assert _median_ratio_vs_prev(timings, prev) == 2.0
    # sub-floor entries on either side are excluded
    prev["q0"] = 0.1
    timings["q1"] = 0.05
    assert _median_ratio_vs_prev(timings, prev) == 2.0
    # missing / non-numeric priors are skipped, not crashed on
    del prev["q2"]
    prev["q3"] = "n/a"
    assert _median_ratio_vs_prev(timings, prev) == 2.0
    # below min_n comparable entries -> None, never a noisy "signal"
    assert _median_ratio_vs_prev(dict(list(timings.items())[:5]), prev) is None
    assert _median_ratio_vs_prev(timings, {}) is None


def test_eps_ratio_calibration_field():
    from bench import _eps_ratio

    prev = {"engine_events_per_sec": 20000.0}
    # current/prev, not inverted: faster run -> ratio > 1
    assert _eps_ratio(25000.0, prev, "engine_events_per_sec") == 1.25
    assert _eps_ratio(10000.0, prev, "engine_events_per_sec") == 0.5
    # missing / zero / non-numeric / boolean priors -> None, never a crash
    assert _eps_ratio(25000.0, {}, "engine_events_per_sec") is None
    assert _eps_ratio(25000.0, {"engine_events_per_sec": 0}, "engine_events_per_sec") is None
    assert _eps_ratio(25000.0, {"engine_events_per_sec": "n/a"}, "engine_events_per_sec") is None
    assert _eps_ratio(25000.0, {"engine_events_per_sec": True}, "engine_events_per_sec") is None


def test_prev_detail_malformed_queries_yield_empty_calibration():
    # the main() guard: a committed artifact with "queries": null (or a
    # list) must produce ratio None, not an AttributeError at the end of
    # a multi-minute bench run
    from bench import _median_ratio_vs_prev

    for malformed in (None, [], "x"):
        prev_queries = malformed if isinstance(malformed, dict) else {}
        assert _median_ratio_vs_prev({f"q{i}": 1.0 for i in range(15)}, prev_queries) is None


def test_position_debt_suspects_selection():
    """Round-9 fix (VERDICT r8 task #2): >2x movers against a FLAT median
    get isolation re-measured; a uniformly slow boot (median moved too),
    an uncalibrated run (median None), sub-floor entries, and
    custom-harness metrics never flag."""
    from bench import _position_debt_suspects

    prev = {"a": 1.0, "b": 1.0, "c": 0.1, "engine_batch": 3.0}
    cur = {"a": 2.5, "b": 1.05, "c": 0.5, "engine_batch": 9.0}
    eligible = {"a", "b", "c"}
    # flat median, a moved 2.5x -> suspect; c is sub-floor on the prev
    # side; engine_batch moved 3x but is not an eligible registry entry
    assert _position_debt_suspects(cur, prev, 1.05, eligible) == ["a"]
    # the whole boot is slow: median 2.4 -> nothing flags
    assert _position_debt_suspects(cur, prev, 2.4, eligible) == []
    # no calibration -> nothing flags
    assert _position_debt_suspects(cur, prev, None, eligible) == []
    # exactly at the threshold is not a suspect (strictly greater)
    assert _position_debt_suspects({"a": 2.0}, {"a": 1.0}, 1.0, {"a"}) == []
    # missing/garbage prior entries never flag
    assert _position_debt_suspects({"a": 9.0}, {"a": True}, 1.0, {"a"}) == []
    assert _position_debt_suspects({"a": 9.0}, {}, 1.0, {"a"}) == []
