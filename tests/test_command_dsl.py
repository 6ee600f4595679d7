"""Command-DSL parser tests — grammar at src/zulip/command.rs:10-261,
including backtick splicing (:53-62), positional nodelay/noexpiry variants
(:139-153), renew durations (:245-261), and every error path."""

from __future__ import annotations

import datetime as dt

import pytest

from lichess_event_stream_watcher_spark.control.command import (
    AddRuleCmd,
    DisableRulesCmd,
    EnableRulesCmd,
    HypotheticalSignupCmd,
    ListRulesCmd,
    ParseError,
    RemoveRuleCmd,
    RenewRuleCmd,
    SeenCmd,
    ShowRuleCmd,
    StatusCmd,
    parse_command,
)
from lichess_event_stream_watcher_spark.rules.model import UTC, Action, CriterionKind

NOW = dt.datetime(2026, 8, 13, tzinfo=UTC)


def parse(s):
    return parse_command(s, now=NOW)


def test_simple_commands():
    assert isinstance(parse("status"), StatusCmd)
    assert isinstance(parse("signup rules list"), ListRulesCmd)
    assert parse("signup seen Bob") == SeenCmd("Bob")
    assert parse("signup rules show r1") == ShowRuleCmd("r1")
    assert parse("signup rules remove r1") == RemoveRuleCmd("r1")
    assert parse("signup rules disable-re ^bot") == DisableRulesCmd("^bot")
    assert parse("signup rules enable-re ^bot") == EnableRulesCmd("^bot")


def test_add_basic_and_expiry_default():
    cmd = parse("signup rules add r1 if email contains gmail then notify")
    assert isinstance(cmd, AddRuleCmd)
    r = cmd.rule
    assert r.name == "r1"
    assert r.criterion.kind is CriterionKind.EMAIL_CONTAINS
    assert r.criterion.value == "gmail"
    assert r.actions == [Action.NOTIFY_ZULIP]
    assert not r.no_delay and not r.susp_ip and r.enabled
    assert r.expiry == NOW + dt.timedelta(days=182)  # default TTL (:149,152)
    assert r.creation_date == NOW


def test_add_combined_actions_and_flags():
    cmd = parse("signup rules add r2 if_susp_ip username regex ^bot then engine+close+notify nodelay noexpiry")
    r = cmd.rule
    assert r.susp_ip and r.no_delay and r.expiry is None
    assert r.actions == [Action.ENGINE_MARK, Action.CLOSE, Action.NOTIFY_ZULIP]
    # (?i) force-prepend (:237-243)
    assert r.criterion.value == "(?i)^bot"
    # if_ip_susp alias (:79-80)
    assert parse("signup rules add r3 if_ip_susp ip equals 1.2.3.4 then close").rule.susp_ip


def test_add_noexpiry_without_nodelay():
    r = parse("signup rules add r if email contains x then notify noexpiry").rule
    assert r.expiry is None and not r.no_delay
    # trailing garbage tolerated, means "not set" (:139-153)
    r = parse("signup rules add r if email contains x then notify whatever").rule
    assert r.expiry == NOW + dt.timedelta(days=182) and not r.no_delay


def test_add_regex_criteria_and_prepend():
    r = parse("signup rules add r if email regex (?i)@mail\\. then notify").rule
    assert r.criterion.kind is CriterionKind.EMAIL_REGEX
    assert r.criterion.value == "(?i)@mail\\."  # already prefixed, untouched
    with pytest.raises(ParseError) as e:
        parse("signup rules add r if username regex ( then notify")
    assert e.value.message.startswith("Invalid regex")


def test_add_useragent_and_int_error():
    r = parse("signup rules add r if useragent length-lte 30 then close").rule
    assert r.criterion.kind is CriterionKind.USERAGENT_LENGTH_LTE
    assert r.criterion.value == "30"
    with pytest.raises(ParseError) as e:
        parse("signup rules add r if useragent length-lte abc then close")
    assert e.value.message == "Can't parse int"


def test_add_lua_backtick_splicing():
    cmd = parse("signup rules add r if lua `user:email() == \"x\"` then notify")
    assert cmd.rule.criterion.kind is CriterionKind.CODE
    assert cmd.rule.criterion.value == 'user:email() == "x"'
    # without backticks, code is empty string (:54-61)
    assert parse("signup rules add r if lua x y then notify").rule.criterion.value == ""


def test_add_print_rejected():
    with pytest.raises(ParseError) as e:
        parse("signup rules add r if print equals abc then close")
    assert e.value.message == "Use lichess print ban instead"


def test_add_all_or_nothing_actions():
    with pytest.raises(ParseError):
        parse("signup rules add r if email contains x then notify+bogus")


def test_renew():
    assert parse("signup rules renew r1 14d") == RenewRuleCmd("r1", dt.timedelta(days=14))
    assert parse("signup rules renew r1 2w") == RenewRuleCmd("r1", dt.timedelta(weeks=2))
    for bad in ("14x", "d", "0d", "-3d", ""):
        with pytest.raises(ParseError) as e:
            parse(f"signup rules renew r1 {bad}")
        assert e.value.message.startswith("Invalid expiry date format")
    with pytest.raises(ParseError) as e:
        parse("signup rules renew r1")
    assert e.value.message == "Please provide a new expiry"
    with pytest.raises(ParseError) as e:
        parse("signup rules renew")
    assert e.value.message == "Please provide a rule name"


def test_signup_test_json():
    cmd = parse('signup rules test `{"username":"Bob","email":"b@x.y","ip":"1.2.3.4","suspIp":true}`')
    assert isinstance(cmd, HypotheticalSignupCmd)
    assert cmd.user["username"] == "Bob" and cmd.user["susp_ip"] is True
    assert cmd.user["user_agent"] is None
    with pytest.raises(ParseError) as e:
        parse("signup rules test `not json`")
    assert e.value.message == "Can't (de)serialize"
    # missing required field (serde: username/email/ip required, src/event.rs:42-52)
    with pytest.raises(ParseError):
        parse('signup rules test `{"username":"Bob"}`')


def test_namechk():
    cmd = parse("namechk SomeUser")
    assert cmd.user["username"] == "SomeUser"
    assert cmd.user["email"] == "qwe@asd.zxc" and cmd.user["ip"] == "127.0.0.1"
    with pytest.raises(ParseError) as e:
        parse("namechk")
    assert e.value.message == "Please provide a username"


def test_error_paths():
    for bad in ("", "frobnicate", "signup", "signup bogus x", "signup rules",
                "signup rules add r because email contains x then notify",
                "signup rules add r if email contains x maybe notify",
                "signup rules add r if email sounds-like x then notify",
                "signup rules bogus"):
        with pytest.raises(ParseError) as e:
            parse(bad)
        assert e.value.message == "Could not parse user command"


def test_rtm_dispatch_filter():
    # mention/stream/topic filter (src/zulip/rtm.rs:126-142)
    from lichess_event_stream_watcher_spark.control.rtm import dispatch_message

    seen = []
    msg = {"display_recipient": "mod-log", "subject": "signups"}
    ok = dispatch_message("@**bot** status", "bot", "mod-log", "signups", msg, seen.append)
    assert ok and seen == ["status"]
    # wrong stream / wrong topic / no mention -> filtered
    assert not dispatch_message("@**bot** status", "bot", "other", "signups", msg, seen.append)
    assert not dispatch_message("@**bot** status", "bot", "mod-log", "other", msg, seen.append)
    assert not dispatch_message("status", "bot", "mod-log", "signups", msg, seen.append)
    assert seen == ["status"]
