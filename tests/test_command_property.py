"""Property-based round-trip for the add-rule command grammar
(src/zulip/command.rs:78-172): any well-formed DSL string parses into the
Rule its tokens describe — name, criterion kind/value, (?i)-forced regexes,
all-or-nothing action lists, susp_ip gate, nodelay and noexpiry slots."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lichess_event_stream_watcher_spark.control.command import (
    AddRuleCmd,
    ParseError,
    parse_command,
)
from lichess_event_stream_watcher_spark.rules.model import (
    _ACTION_DSL,
    CriterionKind,
    UTC,
)
from lichess_event_stream_watcher_spark.rules.store import DEFAULT_TTL

_NOW = dt.datetime(2026, 1, 1, tzinfo=UTC)
_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_-", min_size=1, max_size=12
)
_ACTIONS = st.lists(
    st.sampled_from(sorted(_ACTION_DSL.values())), min_size=1, max_size=4, unique=True
)
_KINDS = {
    ("ip", "equals"): CriterionKind.IP_MATCH,
    ("email", "contains"): CriterionKind.EMAIL_CONTAINS,
    ("email", "regex"): CriterionKind.EMAIL_REGEX,
    ("username", "contains"): CriterionKind.USERNAME_CONTAINS,
    ("username", "regex"): CriterionKind.USERNAME_REGEX,
    ("useragent", "length-lte"): CriterionKind.USERAGENT_LENGTH_LTE,
}
_CRIT = st.one_of(
    st.tuples(st.just(("ip", "equals")), _WORD),
    st.tuples(st.just(("email", "contains")), _WORD),
    st.tuples(st.just(("email", "regex")), _WORD),
    st.tuples(st.just(("username", "contains")), _WORD),
    st.tuples(st.just(("username", "regex")), _WORD),
    st.tuples(st.just(("useragent", "length-lte")), st.integers(0, 9999).map(str)),
)


def _dsl(name, element, check, value, actions, susp, nodelay, noexpiry) -> str:
    cmd = (
        f"signup rules add {name} {'if_susp_ip' if susp else 'if'} "
        f"{element} {check} {value} then {'+'.join(actions)}"
    )
    if nodelay:
        cmd += " nodelay"
    if noexpiry:
        cmd += " noexpiry"
    return cmd


@settings(max_examples=200, deadline=None)
@given(
    name=_WORD,
    crit=_CRIT,
    actions=_ACTIONS,
    susp=st.booleans(),
    nodelay=st.booleans(),
    noexpiry=st.booleans(),
)
def test_add_rule_round_trip(name, crit, actions, susp, nodelay, noexpiry):
    (element, check), value = crit
    parsed = parse_command(
        _dsl(name, element, check, value, actions, susp, nodelay, noexpiry), now=_NOW
    )
    assert isinstance(parsed, AddRuleCmd)
    r = parsed.rule
    assert r.name == name
    assert r.criterion.kind == _KINDS[(element, check)]
    if check == "regex":
        assert r.criterion.value == "(?i)" + value  # src/zulip/command.rs:237-243
    else:
        assert r.criterion.value == value
    assert [_ACTION_DSL[a] for a in r.actions] == actions
    assert r.susp_ip == susp
    assert r.no_delay == nodelay
    assert r.expiry == (None if noexpiry else _NOW + DEFAULT_TTL)
    assert r.creation_date == _NOW


@settings(max_examples=60, deadline=None)
@given(name=_WORD, actions=_ACTIONS)
def test_action_list_is_all_or_nothing(name, actions):
    """One bad token anywhere in the + list rejects the whole command
    (src/zulip/command.rs:135-137)."""
    bad = actions + ["bogus"]
    with pytest.raises(ParseError):
        parse_command(
            _dsl(name, "email", "contains", "x", bad, False, False, False), now=_NOW
        )
