from __future__ import annotations

import datetime as dt
import json

import pytest

from lichess_event_stream_watcher_spark.rules import (
    Action,
    Criterion,
    CriterionKind,
    Rule,
    SignupRulesManager,
)
from lichess_event_stream_watcher_spark.rules.model import UTC

NOW = dt.datetime(2026, 8, 13, tzinfo=UTC)


def mk(name="r1", **kw) -> Rule:
    return Rule(name, Criterion(CriterionKind.EMAIL_CONTAINS, "x"), [Action.NOTIFY_ZULIP], **kw)


def test_action_endpoints():
    # src/signup/rules.rs:302-321
    assert Action.SHADOWBAN.endpoint("bob") == "/mod/bob/troll/true"
    assert Action.ENGINE_MARK.endpoint("bob") == "/mod/bob/engine/true"
    assert Action.BOOST_MARK.endpoint("bob") == "/mod/bob/booster/true"
    assert Action.IP_BAN.endpoint("bob") == "/mod/bob/ban/true"
    assert Action.CLOSE.endpoint("bob") == "/mod/bob/close"
    assert Action.ALT.endpoint("bob") == "/mod/bob/alt/true"
    assert Action.ENABLE_CHAT_PANIC.endpoint() == "/mod/chat-panic"
    assert Action.NOTIFY_ZULIP.endpoint("bob") is None
    # jitter policy (src/eventhandler.rs:167-178)
    assert Action.CLOSE.delayed and Action.CLOSE.extra_delay_ms == 1500
    assert not Action.SHADOWBAN.delayed
    assert Action.from_dsl("engine") is Action.ENGINE_MARK


def test_rule_expiry_and_active():
    r = mk(expiry=NOW - dt.timedelta(seconds=1))
    assert r.has_expired(NOW) and not r.is_active(NOW)
    assert not mk(expiry=None).has_expired(NOW)
    assert not mk(enabled=False).is_active(NOW)


def test_caught_last3_dedup_semantics():
    # src/signup/rules.rs:128-161: dup username short-circuits count AND list
    r = mk()
    for u in ["a", "b", "a", "c", "d"]:
        r.caught(u, NOW)
    assert r.match_count == 4
    assert r.most_recent_caught == ["b", "c", "d"]  # last-3 FIFO evict
    assert r.latest_match_date == NOW


def test_json_roundtrip_epoch_millis():
    r = mk(expiry=NOW, creation_date=NOW)
    obj = json.loads(r.to_json())
    assert obj["expiry"] == int(NOW.timestamp() * 1000)
    back = Rule.from_json_obj(obj)
    assert back.expiry == NOW and back.criterion == r.criterion and back.actions == r.actions


def test_store_crud_persistence(tmp_path):
    path = str(tmp_path / "rules.json")
    mgr = SignupRulesManager(path)
    mgr.add_rule(mk("a"))
    with pytest.raises(ValueError):
        mgr.add_rule(mk("a"))  # uniqueness (src/signup/rules.rs:49-55)
    mgr.add_rule(mk("b", enabled=False))
    mgr2 = SignupRulesManager(path)
    # disabled rules render parenthesized (src/signup/rules.rs:115-126)
    assert mgr2.list_names() == ["a", "(b)"]
    assert [r.name for r in mgr2.active_rules(NOW)] == ["a"]
    mgr2.set_enabled("b", True)
    assert len(mgr2.active_rules(NOW)) == 2
    assert mgr2.remove_rule("a") is True
    assert mgr2.remove_rule("nope") is False  # src/signup/rules.rs:60-66
    assert SignupRulesManager(path).list_names() == ["b"]
    # regex enable/disable over names (src/signup/rules.rs:68-98)
    mgr2.add_rule(mk("bot-1"))
    mgr2.add_rule(mk("bot-2"))
    assert mgr2.disable_rules("^bot-") == 2
    assert SignupRulesManager(path).list_names() == ["b", "(bot-1)", "(bot-2)"]
    assert mgr2.enable_rules("bot") == 2
    with pytest.raises(ValueError):
        mgr2.disable_rules("(unclosed")


def test_expiry_sweep_lifecycle(tmp_path):
    # warn <1d (latch 0->1), announce at expiry (->2), delete +3d
    # (src/eventhandler.rs:432-487)
    path = str(tmp_path / "rules.json")
    mgr = SignupRulesManager(path)
    exp = NOW + dt.timedelta(hours=12)
    mgr.add_rule(mk("r", expiry=exp))
    assert [k for k, _ in mgr.expiry_sweep(NOW)] == ["warn"]
    assert mgr.find_rule("r").exp_notification == 1
    assert list(mgr.expiry_sweep(NOW)) == []  # latched
    assert [k for k, _ in mgr.expiry_sweep(exp + dt.timedelta(minutes=1))] == ["expired"]
    assert mgr.find_rule("r").exp_notification == 2
    assert [k for k, _ in mgr.expiry_sweep(exp + dt.timedelta(days=3, minutes=1))] == ["deleted"]
    assert mgr.list_names() == []


def test_renew_keeps_latch(tmp_path):
    # reference parity: renew sets expiry only — the exp_notification latch
    # is NOT reset (src/signup/rules.rs:100-113, src/eventhandler.rs:489-501)
    mgr = SignupRulesManager(str(tmp_path / "rules.json"))
    mgr.add_rule(mk("r", expiry=NOW, exp_notification=2))
    mgr.renew("r", dt.timedelta(weeks=2), now=NOW)
    r = mgr.find_rule("r")
    assert r.expiry == NOW + dt.timedelta(weeks=2) and r.exp_notification == 2
    mgr.renew("ghost", dt.timedelta(days=1), now=NOW)  # silent no-op (:105-110)


def test_expiry_sweep_warn_and_delete_same_pass(tmp_path):
    # a long-expired latch-0 rule warns AND deletes in one sweep, mirroring
    # the reference's independent branch order (src/eventhandler.rs:431-487)
    mgr = SignupRulesManager(str(tmp_path / "rules.json"))
    mgr.add_rule(mk("old", expiry=NOW - dt.timedelta(days=10)))
    assert [k for k, _ in mgr.expiry_sweep(NOW)] == ["warn", "deleted"]
    assert mgr.list_names() == []


def test_expiry_sweep_classify_matches_store(tmp_path, spark):
    """The distributed classifier and the driver-side sweep agree on every
    scenario row (branch order, latch gating, warn+deleted double yield)."""
    from lichess_event_stream_watcher_spark import fixtures
    from lichess_event_stream_watcher_spark.rules.model import Action, Criterion, CriterionKind, Rule
    from lichess_event_stream_watcher_spark.rules.store import expiry_sweep_classify

    mgr = SignupRulesManager(str(tmp_path / "rules.json"))
    for name, off, latch in fixtures.SWEEP_SCENARIOS:
        rule = Rule(
            name,
            Criterion(CriterionKind.USERNAME_CONTAINS, "x"),
            [Action.NOTIFY_ZULIP],
            expiry=None if off is None else fixtures.SWEEP_NOW + off,
        )
        rule.exp_notification = latch
        mgr.add_rule(rule)
    driver = sorted((kind, r.name) for kind, r in mgr.expiry_sweep(now=fixtures.SWEEP_NOW))
    dist = sorted(
        (r.kind, r.name)
        for r in expiry_sweep_classify(
            fixtures.sweep_scenarios_df(spark), fixtures.SWEEP_NOW
        ).collect()
    )
    assert dist == driver


def test_find_rule_index_tracks_every_mutation_shape(tmp_path):
    # find_rule is served from a name index whose staleness check is
    # (list identity, length) — rules/store.py:_index. Every mutation in
    # the codebase either replaces the list (load/remove_rule), changes
    # its length (add_rule, sweep-delete, the bench's direct
    # .rules.append), or mutates fields of an existing Rule in place
    # without touching its name (enable/renew). Exercise each shape and
    # assert the index never serves a stale answer.
    path = str(tmp_path / "rules.json")
    mgr = SignupRulesManager(path)
    mgr.add_rule(mk("a"))
    assert mgr.find_rule("a") is mgr.rules[0]  # warm the index

    # append after a warm index (length change)
    mgr.add_rule(mk("b"))
    assert mgr.find_rule("b") is mgr.rules[1]

    # list replacement (remove_rule rebuilds self.rules)
    mgr.find_rule("a")
    assert mgr.remove_rule("a") is True
    assert mgr.find_rule("a") is None
    assert mgr.find_rule("b") is not None

    # direct append without going through add_rule (the bench pattern)
    mgr.find_rule("b")
    mgr.rules.append(mk("c"))
    assert mgr.find_rule("c") is mgr.rules[-1]

    # in-place sweep deletion (list identity unchanged, length shrinks)
    exp = NOW - dt.timedelta(days=4)
    mgr.add_rule(mk("doomed", expiry=exp))
    mgr.find_rule("doomed")  # warm with doomed present
    kinds = sorted(k for k, _ in mgr.expiry_sweep(NOW))
    assert "deleted" in kinds
    assert mgr.find_rule("doomed") is None

    # in-place field mutation (names untouched -> cached index stays valid
    # AND serves the mutated object, not a copy)
    mgr.find_rule("b")
    mgr.set_enabled("b", False)
    assert mgr.find_rule("b").enabled is False

    # list replacement via load()
    mgr2 = SignupRulesManager(path)
    mgr2.find_rule("b")
    mgr2.load()
    assert mgr2.find_rule("b") is mgr2.rules[[r.name for r in mgr2.rules].index("b")]


def test_find_rule_survives_same_length_sweep_then_append(tmp_path):
    # The (identity, length) heuristic ALONE cannot see a sweep-delete
    # followed by an append that restores the original length with no
    # find_rule call in between — the methods must invalidate explicitly
    # (rules/store.py:_invalidate_index). Regression for exactly that
    # sequence: the deleted name must be gone and the new name servable.
    mgr = SignupRulesManager(str(tmp_path / "rules.json"))
    exp = NOW - dt.timedelta(days=4)
    mgr.add_rule(mk("keeper"))
    mgr.add_rule(mk("doomed", expiry=exp))
    assert mgr.find_rule("doomed") is not None  # warm index at length 2
    kinds = [k for k, _ in mgr.expiry_sweep(NOW)]  # in-place delete -> 1
    assert "deleted" in kinds
    mgr.add_rule(mk("fresh"))  # back to length 2, same list identity
    assert mgr.find_rule("doomed") is None
    assert mgr.find_rule("fresh") is mgr.rules[-1]
    assert mgr.find_rule("keeper") is not None


def test_find_rule_duplicate_names_serve_first_match(tmp_path):
    # Direct .rules appends can bypass add_rule's uniqueness check; the
    # index must serve the FIRST rule with a name — what the linear scan
    # it replaced returned — and must not thrash (rebuild per call) just
    # because the dict is smaller than the list.
    mgr = SignupRulesManager(str(tmp_path / "rules.json"))
    first, second = mk("dup"), mk("dup")
    mgr.rules.append(first)
    mgr.rules.append(second)
    assert mgr.find_rule("dup") is first
    idx_before = mgr._by_name
    mgr.find_rule("dup")
    assert mgr._by_name is idx_before  # no per-call rebuild


def test_expiry_sweep_classify_subsecond_precision(tmp_path, spark):
    """Round-7 review fix: the classifier's `now` literal used to be a
    strftime string truncated to whole seconds, so a sweep 700 ms past a
    300 ms-ago expiry disagreed with the driver sweep. F.lit(now) keeps
    microseconds — the two must agree at sub-second offsets too."""
    import datetime as dt

    from lichess_event_stream_watcher_spark.rules.model import (
        Action,
        Criterion,
        CriterionKind,
        Rule,
    )
    from lichess_event_stream_watcher_spark.rules.store import expiry_sweep_classify

    now = dt.datetime(2026, 8, 13, 12, 0, 0, 700000)
    mgr = SignupRulesManager(str(tmp_path / "rules.json"))
    r = Rule(
        "subsec",
        Criterion(CriterionKind.USERNAME_CONTAINS, "x"),
        [Action.NOTIFY_ZULIP],
        expiry=now - dt.timedelta(milliseconds=400),  # expired 400 ms ago
    )
    r.exp_notification = 1  # past the warn latch -> "expired" branch
    mgr.add_rule(r)
    driver = sorted((kind, ru.name) for kind, ru in mgr.expiry_sweep(now=now))
    df = spark.createDataFrame(
        [("subsec", now - dt.timedelta(milliseconds=400), 1)],
        "name string, expiry timestamp, exp_notification int",
    )
    dist = sorted((row.kind, row.name) for row in expiry_sweep_classify(df, now).collect())
    assert dist == driver == [("expired", "subsec")]


def test_load_warns_on_not_precedence_shift(tmp_path):
    """Round-8 ADVICE fix: stored CODE predicates written as `not x == y`
    changed meaning under the round-7 Lua-precedence fix; the store
    surfaces them with a warning at load instead of silently evaluating
    the shifted semantics. Clean predicates load silently."""
    import warnings

    path = str(tmp_path / "rules.json")
    mgr = SignupRulesManager(path)
    mgr.add_rule(
        Rule(
            "shifted",
            Criterion(CriterionKind.CODE, 'not user:name() == "x"'),
            [Action.NOTIFY_ZULIP],
        )
    )
    mgr.add_rule(
        Rule(
            "clean",
            Criterion(CriterionKind.CODE, 'not (user:name() == "x")'),
            [Action.NOTIFY_ZULIP],
        )
    )
    with pytest.warns(UserWarning, match="shifted.*`not` directly"):
        SignupRulesManager(path)
    mgr.remove_rule("shifted")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        SignupRulesManager(path)  # clean rules load without warnings
