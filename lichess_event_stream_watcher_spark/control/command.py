"""The command DSL — the reference's query language (src/zulip/command.rs).

Grammar (src/zulip/command.rs:10-235):

    status
    namechk <username>
    signup seen <username>
    signup rules list
    signup rules add <name> if|if_susp_ip|if_ip_susp <field> <op> <value>
                     then <a+b+c> [nodelay] [noexpiry]
    signup rules show|remove|disable-re|enable-re <name-or-pattern>
    signup rules renew <name> <Nd|Nw>
    signup rules test `{user json}`

Parsing replicates the reference byte-for-byte, including its quirks:

- backtick splicing (src/zulip/command.rs:53-62): code between the first
  pair of backticks is extracted BEFORE tokenization and the span replaced
  by ``$ $`` so the positional grammar still lines up (``lua`` criteria
  therefore see ``$``/``$`` at the check/value slots, which are ignored).
- tokenization is a plain split on single spaces — runs of spaces produce
  empty tokens, exactly as Rust's ``split(" ")`` (src/zulip/command.rs:12,63).
- regex values get ``(?i)`` force-prepended unless already present, for BOTH
  email and username regexes (src/zulip/command.rs:101,106,237-243).
- action lists are all-or-nothing: one unknown name fails the whole command
  (src/zulip/command.rs:135-137).
- trailing garbage after the action list is tolerated: anything but
  ``nodelay``/``noexpiry`` at those slots silently means "not set"
  (src/zulip/command.rs:139-153).
- ``print`` criteria are rejected with "Use lichess print ban instead"
  (src/zulip/command.rs:98).

This is the control plane: commands mutate the rules store / query engine
state on the driver; they are never stream rows (SURVEY.md §1.1).
"""

from __future__ import annotations

import datetime as dt
import json
import re
from dataclasses import dataclass
from typing import Any, Union

from ..rules.model import UTC, Action, Criterion, CriterionKind, Rule

DEFAULT_TTL_DAYS = 182  # src/zulip/command.rs:149,152


class ParseError(Exception):
    """src/zulip/command.rs:263-272 — default message on any grammar miss."""

    def __init__(self, message: str | None = None):
        self.message = message or "Could not parse user command"
        super().__init__(self.message)


# -- parsed command forms (the Event::Internal* control variants,
#    src/event.rs:15-31) --------------------------------------------------


@dataclass(frozen=True)
class StatusCmd:
    pass


@dataclass(frozen=True)
class SeenCmd:
    username: str


@dataclass(frozen=True)
class HypotheticalSignupCmd:
    """``signup test`` / ``namechk`` — dry-run a user through the pipeline."""

    user: dict[str, Any]


@dataclass(frozen=True)
class AddRuleCmd:
    rule: Rule


@dataclass(frozen=True)
class ShowRuleCmd:
    name: str


@dataclass(frozen=True)
class RemoveRuleCmd:
    name: str


@dataclass(frozen=True)
class DisableRulesCmd:
    pattern: str


@dataclass(frozen=True)
class EnableRulesCmd:
    pattern: str


@dataclass(frozen=True)
class RenewRuleCmd:
    name: str
    extend: dt.timedelta


@dataclass(frozen=True)
class ListRulesCmd:
    pass


Command = Union[
    StatusCmd,
    SeenCmd,
    HypotheticalSignupCmd,
    AddRuleCmd,
    ShowRuleCmd,
    RemoveRuleCmd,
    DisableRulesCmd,
    EnableRulesCmd,
    RenewRuleCmd,
    ListRulesCmd,
]


def parse_command(command: str, now: dt.datetime | None = None) -> Command:
    """Dispatch on the first token (src/zulip/command.rs:10-19)."""
    parts = command.split(" ")
    head = parts[0] if parts else None
    if head == "status":
        return StatusCmd()
    if head == "signup":
        return _parse_signup(command, now)
    if head == "namechk":
        return _parse_namechk(command)
    raise ParseError()


def _parse_namechk(command: str) -> HypotheticalSignupCmd:
    """src/zulip/command.rs:26-50 — synthesize a stub user."""
    parts = command.split(" ")
    if len(parts) < 2:
        raise ParseError("Please provide a username")
    return HypotheticalSignupCmd(
        user={
            "username": parts[1],
            "email": "qwe@asd.zxc",
            "ip": "127.0.0.1",
            "user_agent": None,
            "finger_print": None,
            "susp_ip": False,
        }
    )


def _splice_backticks(command: str) -> tuple[str, str]:
    """src/zulip/command.rs:53-62: pull code out between the first backtick
    pair, substitute ``$ $`` so positional parsing is unaffected."""
    first_split = command.split("`")
    code = ""
    if len(first_split) > 2:
        code = first_split[1]
        first_split[0] = first_split[0].strip()
        first_split[1] = "$ $"
        first_split[2] = first_split[2].strip()
    return " ".join(first_split), code


def _get(args: list[str], i: int, msg: str | None = None) -> str:
    if i >= len(args):
        raise ParseError(msg)
    return args[i]


def _parse_signup(command: str, now: dt.datetime | None) -> Command:
    joined, code = _splice_backticks(command)
    args = joined.split(" ")[1:]

    if _get(args, 0) != "rules":
        if args[0] == "seen":  # src/zulip/command.rs:66-71
            return SeenCmd(_get(args, 1))
        raise ParseError()

    verb = _get(args, 1)
    if verb == "add":
        return _parse_add(args, code, now)
    if verb == "show":
        return ShowRuleCmd(_get(args, 2))
    if verb == "remove":
        return RemoveRuleCmd(_get(args, 2))
    if verb == "disable-re":
        return DisableRulesCmd(_get(args, 2))
    if verb == "enable-re":
        return EnableRulesCmd(_get(args, 2))
    if verb == "renew":
        name = _get(args, 2, "Please provide a rule name")
        duration = _parse_expiry_duration(_get(args, 3, "Please provide a new expiry"))
        return RenewRuleCmd(name, duration)
    if verb == "list":
        return ListRulesCmd()
    if verb == "test":
        return HypotheticalSignupCmd(user=_user_from_json(code))
    raise ParseError()


def _parse_add(args: list[str], code: str, now: dt.datetime | None) -> AddRuleCmd:
    """src/zulip/command.rs:78-172 — the positional add grammar."""
    susp_ip = _get(args, 3) in ("if_susp_ip", "if_ip_susp")
    if not (_get(args, 3) == "if" or susp_ip) or _get(args, 7) != "then":
        raise ParseError()

    name = _get(args, 2)
    element, check, value = _get(args, 4), _get(args, 5), _get(args, 6)

    if element == "ip":
        if check != "equals":
            raise ParseError()
        criterion = Criterion(CriterionKind.IP_MATCH, value)
    elif element == "print":
        raise ParseError("Use lichess print ban instead")
    elif element == "email":
        if check == "contains":
            criterion = Criterion(CriterionKind.EMAIL_CONTAINS, value)
        elif check == "regex":
            criterion = Criterion(CriterionKind.EMAIL_REGEX, _value_to_regex(value))
        else:
            raise ParseError()
    elif element == "username":
        if check == "contains":
            criterion = Criterion(CriterionKind.USERNAME_CONTAINS, value)
        elif check == "regex":
            criterion = Criterion(CriterionKind.USERNAME_REGEX, _value_to_regex(value))
        else:
            raise ParseError()
    elif element == "useragent":
        if check != "length-lte":
            raise ParseError()
        try:
            int(value)
        except ValueError:
            raise ParseError("Can't parse int") from None
        criterion = Criterion(CriterionKind.USERAGENT_LENGTH_LTE, value)
    elif element == "lua":
        criterion = Criterion(CriterionKind.CODE, code)
    else:
        raise ParseError()

    # all-or-nothing action list (src/zulip/command.rs:117-137)
    tokens = _get(args, 8).split("+")
    try:
        actions = [Action.from_dsl(t) for t in tokens]
    except ValueError:
        raise ParseError() from None

    no_delay = len(args) > 9 and args[9] == "nodelay"
    expiry_slot = 10 if no_delay else 9
    now = now or dt.datetime.now(UTC)
    if len(args) > expiry_slot and args[expiry_slot] == "noexpiry":
        expiry = None
    else:
        expiry = now + dt.timedelta(days=DEFAULT_TTL_DAYS)

    return AddRuleCmd(
        Rule(
            name=name,
            criterion=criterion,
            actions=actions,
            no_delay=no_delay,
            susp_ip=susp_ip,
            expiry=expiry,
            creation_date=now,
        )
    )


def _value_to_regex(v: str) -> str:
    """Validate + force case-insensitivity (src/zulip/command.rs:237-243)."""
    pattern = v if v.startswith("(?i)") else "(?i)" + v
    try:
        re.compile(pattern)
    except re.error as err:
        raise ParseError(f"Invalid regex: {err}") from None
    return pattern


def _parse_expiry_duration(s: str) -> dt.timedelta:
    """``Nd``/``Nw`` (src/zulip/command.rs:245-261); bad input -> the exact
    reference error message."""
    step = s[-1] if s else "/"
    try:
        amount = int(s[:-1])
    except ValueError:
        amount = 0
    if amount <= 0 or step not in ("d", "w"):
        raise ParseError(
            "Invalid expiry date format. Example: `14d`. Supported: `d` (day), `w` (week)."
        )
    return dt.timedelta(days=amount) if step == "d" else dt.timedelta(weeks=amount)


def _user_from_json(code: str) -> dict[str, Any]:
    """User::from_json for ``signup test`` (src/event.rs:55-57): camelCase
    wire keys, required username/email/ip, defaults for the rest
    (src/event.rs:42-52)."""
    try:
        obj = json.loads(code)
        user = {
            "username": obj["username"],
            "email": obj["email"],
            "ip": obj["ip"],
            "user_agent": obj.get("userAgent"),
            "finger_print": obj.get("fingerPrint"),
            "susp_ip": bool(obj.get("suspIp", False)),
        }
    except (json.JSONDecodeError, KeyError, TypeError):
        raise ParseError("Can't (de)serialize") from None
    return user
