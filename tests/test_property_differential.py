"""Property-based differential oracle (SURVEY.md §5.5): random rows x random
rules — the compiled Catalyst predicate must agree with a straight-Python
interpreter of the reference semantics (src/signup/rules.rs:246-270) on
every row, including NULL fields and the susp_ip gate. Also: DSL round-trip
— a rule rendered to the command grammar re-parses to the same rule."""

from __future__ import annotations

import random
import re
import string

from pyspark.sql import functions as F

from lichess_event_stream_watcher_spark.control.command import parse_command
from lichess_event_stream_watcher_spark.plans.compile import rule_predicate
from lichess_event_stream_watcher_spark.rules.model import (
    Action,
    Criterion,
    CriterionKind,
    Rule,
)

K = CriterionKind


def py_eval(rule: Rule, row: dict) -> bool:
    """The reference's interpreted semantics, straight-line Python."""
    if rule.susp_ip and not row["susp_ip"]:  # src/eventhandler.rs:120-126
        return False
    k, v = rule.criterion.kind, rule.criterion.value
    if k is K.IP_MATCH:
        return row["ip"] == v
    if k is K.PRINT_MATCH:
        return row["finger_print"] is not None and row["finger_print"] == v
    if k is K.EMAIL_CONTAINS:
        return v.upper() in row["email"].upper()
    if k is K.EMAIL_REGEX:
        return re.search(v, row["email"]) is not None
    if k is K.USERNAME_CONTAINS:
        return v.upper() in row["username"].upper()
    if k is K.USERNAME_REGEX:
        return re.search(v, row["username"]) is not None
    if k is K.USERAGENT_LENGTH_LTE:
        return row["user_agent"] is not None and len(row["user_agent"]) <= int(v)
    raise AssertionError(k)


def _rand_rules(rng: random.Random, n: int) -> list[Rule]:
    alphabet = string.ascii_letters + string.digits
    rules = []
    for i in range(n):
        kind = rng.choice(
            [
                K.IP_MATCH,
                K.PRINT_MATCH,
                K.EMAIL_CONTAINS,
                K.EMAIL_REGEX,
                K.USERNAME_CONTAINS,
                K.USERNAME_REGEX,
                K.USERAGENT_LENGTH_LTE,
            ]
        )
        if kind is K.IP_MATCH:
            v = f"10.{rng.randint(0, 3)}.{rng.randint(0, 3)}.{rng.randint(0, 3)}"
        elif kind is K.PRINT_MATCH:
            v = f"fp{rng.randint(0, 5)}"
        elif kind in (K.EMAIL_CONTAINS, K.USERNAME_CONTAINS):
            v = "".join(rng.choices(alphabet, k=rng.randint(1, 3)))
        elif kind in (K.EMAIL_REGEX, K.USERNAME_REGEX):
            stem = "".join(rng.choices(string.ascii_lowercase, k=2))
            v = rng.choice([f"(?i)^{stem}", f"(?i){stem}$", f"(?i){stem}[0-9]", f"(?i)({stem}|zz)"])
        else:
            v = str(rng.randint(0, 25))
        rules.append(
            Rule(
                f"pr{i}",
                Criterion(kind, v),
                [Action.NOTIFY_ZULIP],
                susp_ip=rng.random() < 0.3,
            )
        )
    return rules


def _rand_rows(rng: random.Random, n: int) -> list[dict]:
    alphabet = string.ascii_letters + string.digits
    rows = []
    for _ in range(n):
        rows.append(
            {
                "username": "".join(rng.choices(alphabet, k=rng.randint(1, 8))),
                "email": "".join(rng.choices(alphabet, k=rng.randint(1, 6)))
                + "@"
                + rng.choice(["gmail.com", "zz.org"]),
                "ip": f"10.{rng.randint(0, 3)}.{rng.randint(0, 3)}.{rng.randint(0, 3)}",
                "user_agent": None
                if rng.random() < 0.25
                else "U" * rng.randint(0, 30),
                "finger_print": None if rng.random() < 0.5 else f"fp{rng.randint(0, 5)}",
                "susp_ip": rng.random() < 0.4,
            }
        )
    return rows


def test_compiled_predicates_match_python_interpreter(spark):
    rng = random.Random(0xC0FFEE)
    rules = _rand_rules(rng, 24)
    rows = _rand_rows(rng, 400)
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "username string, email string, ip string, user_agent string, "
        "finger_print string, susp_ip boolean",
    )
    cols = [
        F.coalesce(rule_predicate(r), F.lit(False)).alias(r.name) for r in rules
    ]
    got = df.select(*cols).collect()
    fired_total = 0
    for r in rules:
        expected = [py_eval(r, row) for row in rows]
        actual = [bool(out[r.name]) for out in got]
        assert actual == expected, (
            f"divergence on {r.criterion.kind.value}({r.criterion.value!r}) "
            f"susp={r.susp_ip}"
        )
        fired_total += sum(expected)
    assert fired_total > 0  # the sample space actually exercises matches


def test_dsl_round_trip_property():
    rng = random.Random(0xBEEF)
    fields = {
        K.IP_MATCH: ("ip", "equals", lambda: "1.2.3.4"),
        K.EMAIL_CONTAINS: ("email", "contains", lambda: "gm" + str(rng.randint(0, 9))),
        K.EMAIL_REGEX: ("email", "regex", lambda: "(?i)@pro"),
        K.USERNAME_CONTAINS: ("username", "contains", lambda: "bot"),
        K.USERNAME_REGEX: ("username", "regex", lambda: "(?i)^x"),
        K.USERAGENT_LENGTH_LTE: ("useragent", "length-lte", lambda: str(rng.randint(1, 99))),
    }
    action_pool = list(Action)
    for _ in range(100):
        kind = rng.choice(list(fields))
        el, op, gen = fields[kind]
        value = gen()
        n_actions = rng.randint(1, 3)
        actions = rng.sample(action_pool, n_actions)
        gate = rng.choice(["if", "if_susp_ip"])
        nodelay = rng.random() < 0.5
        noexpiry = rng.random() < 0.5
        cmd = f"signup rules add r {gate} {el} {op} {value} then " + "+".join(
            a.dsl_name for a in actions
        )
        if nodelay:
            cmd += " nodelay"
        if noexpiry:
            cmd += " noexpiry"
        rule = parse_command(cmd).rule
        assert rule.criterion.kind is kind
        assert rule.criterion.value == value  # (?i) already present in gens
        assert rule.actions == actions
        assert rule.susp_ip == (gate == "if_susp_ip")
        assert rule.no_delay == nodelay
        assert (rule.expiry is None) == noexpiry
