from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from lichess_event_stream_watcher_spark.plans.compile import compile_matches, would_fire
from lichess_event_stream_watcher_spark.rules.model import UTC, Action, Criterion, CriterionKind, Rule
from lichess_event_stream_watcher_spark.schemas import USER_SCHEMA

K, A = CriterionKind, Action
NOW = dt.datetime(2026, 8, 13, tzinfo=UTC)


def users_df(spark):
    rows = [
        Row(
            username="Alice", email="alice@GMail.com", ip="1.2.3.4",
            user_agent=None, finger_print=None, susp_ip=False, geoip=None, device=None,
        ),
        Row(
            username="bob_cheater", email="bob@proton.me", ip="5.6.7.8",
            user_agent="curl/8", finger_print="fp1", susp_ip=True, geoip=None, device=None,
        ),
        Row(
            username="Carol", email="carol@yahoo.fr", ip="5.6.7.9",
            user_agent="Mozilla/5.0 (very long browser user agent string)",
            finger_print="fp2", susp_ip=False, geoip=None, device=None,
        ),
    ]
    return spark.createDataFrame(rows, USER_SCHEMA)


def matched(spark, rule, now=NOW):
    df = compile_matches(users_df(spark), [rule], now=now)
    return sorted(r.username for r in df.select("username").collect())


def test_f1_ip_match(spark):
    assert matched(spark, Rule("r", Criterion(K.IP_MATCH, "5.6.7.8"), [A.CLOSE])) == ["bob_cheater"]


def test_f2_print_match_null_is_false(spark):
    # NULL finger_print must be false, not null (src/signup/rules.rs:250-253)
    assert matched(spark, Rule("r", Criterion(K.PRINT_MATCH, "fp1"), [A.CLOSE])) == ["bob_cheater"]


def test_f3_email_contains_ci(spark):
    assert matched(spark, Rule("r", Criterion(K.EMAIL_CONTAINS, "gmail"), [A.CLOSE])) == ["Alice"]


def test_f4_email_regex_search_semantics(spark):
    # unanchored search, like Regex::is_match (src/signup/rules.rs:257)
    assert matched(spark, Rule("r", Criterion(K.EMAIL_REGEX, "proton|yahoo"), [A.CLOSE])) == [
        "Carol",
        "bob_cheater",
    ]


def test_f5_username_contains_ci(spark):
    assert matched(spark, Rule("r", Criterion(K.USERNAME_CONTAINS, "CHEATER"), [A.CLOSE])) == [
        "bob_cheater"
    ]


def test_f6_username_regex_ci_prefix(spark):
    assert matched(spark, Rule("r", Criterion(K.USERNAME_REGEX, "(?i)^ALICE$"), [A.CLOSE])) == [
        "Alice"
    ]


def test_f7_ua_length_null_is_false(spark):
    # NULL UA -> false (src/signup/rules.rs:264-267)
    assert matched(spark, Rule("r", Criterion(K.USERAGENT_LENGTH_LTE, "10"), [A.CLOSE])) == [
        "bob_cheater"
    ]


def test_susp_ip_gate(spark):
    # rule.susp_ip && !user.susp_ip -> skip (src/eventhandler.rs:120-126)
    rule = Rule("r", Criterion(K.EMAIL_REGEX, "."), [A.CLOSE], susp_ip=True)
    assert matched(spark, rule) == ["bob_cheater"]


def test_plan_time_pruning_disabled_expired(spark):
    rules = [
        Rule("off", Criterion(K.EMAIL_REGEX, "."), [A.CLOSE], enabled=False),
        Rule("old", Criterion(K.EMAIL_REGEX, "."), [A.CLOSE], expiry=NOW - dt.timedelta(days=1)),
        Rule("on", Criterion(K.EMAIL_CONTAINS, "proton"), [A.CLOSE]),
    ]
    df = compile_matches(users_df(spark), rules, now=NOW)
    assert [(r.username, r.rule_name) for r in df.select("username", "rule_name").collect()] == [
        ("bob_cheater", "on")
    ]


def test_no_active_rules_empty_result_with_schema(spark):
    df = compile_matches(users_df(spark), [], now=NOW)
    assert df.count() == 0 and "rule_name" in df.columns


def test_multi_rule_multi_match_explosion(spark):
    rules = [
        Rule("r1", Criterion(K.EMAIL_CONTAINS, "proton"), [A.CLOSE, A.ENGINE_MARK]),
        Rule("r2", Criterion(K.USERNAME_CONTAINS, "bob"), [A.NOTIFY_ZULIP]),
    ]
    df = compile_matches(users_df(spark), rules, now=NOW, with_actions=True)
    got = sorted(
        (r.username, r.rule_name, r.action)
        for r in df.select("username", "rule_name", "action").collect()
    )
    assert got == [
        ("bob_cheater", "r1", "Close"),
        ("bob_cheater", "r1", "EngineMark"),
        ("bob_cheater", "r2", "NotifyZulip"),
    ]


def test_would_fire_dry_run(spark):
    rules = [
        Rule("r1", Criterion(K.EMAIL_CONTAINS, "proton"), [A.CLOSE]),
        Rule("r2", Criterion(K.USERNAME_CONTAINS, "o"), [A.NOTIFY_ZULIP]),
    ]
    df = would_fire(users_df(spark), rules, now=NOW)
    got = {r.username: sorted(r.would_fire) for r in df.collect()}
    assert got == {"Alice": [], "bob_cheater": ["r1", "r2"], "Carol": ["r2"]}


def test_code_predicate_criterion(spark):
    rule = Rule(
        "r",
        Criterion(K.CODE, 'regex(user.email(), "@proton") and user.fp() != "<NO PRINT>"'),
        [A.CLOSE],
    )
    assert matched(spark, rule) == ["bob_cheater"]
