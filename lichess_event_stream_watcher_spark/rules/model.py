"""Rule / Criterion / Action data model.

Parity target: src/signup/rules.rs:164-187 (Rule fields + defaults),
:234-244 (Criterion enum), :272-287 (friendly rendering), :290-321 (Action
enum + endpoint map), src/zulip/command.rs:121-130 (DSL action names).

Timestamps serialize as epoch-millis on the wire (src/signup/rules.rs:179-186).
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

UTC = dt.timezone.utc
# serde's DateTime::MIN_UTC default for creation_date (src/signup/rules.rs:183-184);
# we use the epoch as a practical MIN that survives every timestamp backend.
MIN_UTC = dt.datetime(1970, 1, 1, tzinfo=UTC)


def _to_millis(ts: dt.datetime | None) -> int | None:
    if ts is None:
        return None
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=UTC)
    return int(ts.timestamp() * 1000)


def _from_millis(ms: int | None) -> dt.datetime | None:
    if ms is None:
        return None
    return dt.datetime.fromtimestamp(ms / 1000.0, tz=UTC)


class Action(str, Enum):
    """Side-effecting actions (src/signup/rules.rs:290-300).

    ``endpoint(username)`` mirrors Action::api_endpoint
    (src/signup/rules.rs:302-321); ``delayed`` mirrors the jitter policy at
    src/eventhandler.rs:167-178 (Close additionally lands +1500 ms after its
    sibling marks).
    """

    SHADOWBAN = "Shadowban"
    ENGINE_MARK = "EngineMark"
    BOOST_MARK = "BoostMark"
    IP_BAN = "IpBan"
    CLOSE = "Close"
    ALT = "Alt"
    ENABLE_CHAT_PANIC = "EnableChatPanic"
    NOTIFY_ZULIP = "NotifyZulip"

    @property
    def dsl_name(self) -> str:
        return _ACTION_DSL[self]

    @property
    def delayed(self) -> bool:
        return self in (Action.ENGINE_MARK, Action.BOOST_MARK, Action.IP_BAN, Action.CLOSE)

    @property
    def extra_delay_ms(self) -> int:
        return 1500 if self is Action.CLOSE else 0

    def endpoint(self, username: str | None = None) -> str | None:
        template = _ACTION_ENDPOINT[self]
        if template is None:
            return None
        return template.format(u=username)

    @classmethod
    def from_dsl(cls, token: str) -> "Action":
        try:
            return _DSL_ACTION[token]
        except KeyError:
            raise ValueError(f"unknown action: {token!r}") from None


_ACTION_DSL = {
    Action.SHADOWBAN: "shadowban",
    Action.ENGINE_MARK: "engine",
    Action.BOOST_MARK: "boost",
    Action.IP_BAN: "ipban",
    Action.CLOSE: "close",
    Action.ALT: "alt",
    Action.ENABLE_CHAT_PANIC: "panic",
    Action.NOTIFY_ZULIP: "notify",
}
_DSL_ACTION = {v: k for k, v in _ACTION_DSL.items()}
_ACTION_ENDPOINT = {
    Action.SHADOWBAN: "/mod/{u}/troll/true",
    Action.ENGINE_MARK: "/mod/{u}/engine/true",
    Action.BOOST_MARK: "/mod/{u}/booster/true",
    Action.IP_BAN: "/mod/{u}/ban/true",
    Action.CLOSE: "/mod/{u}/close",
    Action.ALT: "/mod/{u}/alt/true",
    Action.ENABLE_CHAT_PANIC: "/mod/chat-panic",
    Action.NOTIFY_ZULIP: None,
}


class CriterionKind(str, Enum):
    """The 8 predicate forms (src/signup/rules.rs:234-244).

    ``CODE`` is the arbitrary user-code predicate; the reference embeds Lua
    (src/lua.rs), we run a sandboxed Python expression with the same row
    bindings and sentinel semantics (see ``lua_compat``). The serialized tag
    stays "Lua" for wire parity.
    """

    IP_MATCH = "IpMatch"
    PRINT_MATCH = "PrintMatch"
    EMAIL_CONTAINS = "EmailContains"
    EMAIL_REGEX = "EmailRegex"
    USERNAME_CONTAINS = "UsernameContains"
    USERNAME_REGEX = "UsernameRegex"
    USERAGENT_LENGTH_LTE = "UseragentLengthLte"
    CODE = "Lua"


@dataclass(frozen=True)
class Criterion:
    kind: CriterionKind
    value: str

    def friendly(self) -> str:
        """Human-readable rendering (src/signup/rules.rs:272-287)."""
        k, v = self.kind, self.value
        if k is CriterionKind.IP_MATCH:
            return f"IP equals {v}"
        if k is CriterionKind.PRINT_MATCH:
            return f"Fingerprint hash equals {v}"
        if k is CriterionKind.EMAIL_CONTAINS:
            return f"Email address contains '{v}'"
        if k is CriterionKind.EMAIL_REGEX:
            return f"Email address matches regex `{v}`"
        if k is CriterionKind.USERNAME_CONTAINS:
            return f"Username contains '{v}'"
        if k is CriterionKind.USERNAME_REGEX:
            return f"Username matches regex `{v}`"
        if k is CriterionKind.USERAGENT_LENGTH_LTE:
            return f"User agent length is less than or equal to {v}"
        return f"Code predicate: `{v}`"

    def to_json_obj(self) -> dict[str, str]:
        return {"kind": self.kind.value, "value": self.value}

    @classmethod
    def from_json_obj(cls, obj: dict[str, str]) -> "Criterion":
        return cls(CriterionKind(obj["kind"]), obj["value"])


@dataclass
class Rule:
    """One rule row (src/signup/rules.rs:164-187), with reference defaults."""

    name: str
    criterion: Criterion
    actions: list[Action]
    match_count: int = 0
    most_recent_caught: list[str] = field(default_factory=list)  # last-3, FIFO
    no_delay: bool = False
    enabled: bool = True
    susp_ip: bool = False
    expiry: dt.datetime | None = None
    exp_notification: int = 0  # 0/1/2 latch (src/signup/rules.rs:181-182)
    creation_date: dt.datetime = field(default_factory=lambda: MIN_UTC)
    latest_match_date: dt.datetime | None = None

    def has_expired(self, now: dt.datetime | None = None) -> bool:
        """src/signup/rules.rs:225-232 — no expiry means never expires."""
        if self.expiry is None:
            return False
        now = now or dt.datetime.now(UTC)
        return self.expiry <= now

    def is_active(self, now: dt.datetime | None = None) -> bool:
        return self.enabled and not self.has_expired(now)

    def caught(self, username: str, event_time: dt.datetime | None = None) -> bool:
        """Per-match stats update (src/signup/rules.rs:128-161).

        A username already present in ``most_recent_caught`` short-circuits
        the WHOLE update — no count increment either
        (src/signup/rules.rs:147-149). Returns whether stats were updated.
        """
        if username in self.most_recent_caught:
            return False
        self.match_count += 1
        self.latest_match_date = event_time or dt.datetime.now(UTC)
        self.most_recent_caught.append(username)
        while len(self.most_recent_caught) > 3:  # bounded top-k by recency, k=3
            self.most_recent_caught.pop(0)
        return True

    def to_json_obj(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "criterion": self.criterion.to_json_obj(),
            "actions": [a.value for a in self.actions],
            "match_count": self.match_count,
            "most_recent_caught": list(self.most_recent_caught),
            "no_delay": self.no_delay,
            "enabled": self.enabled,
            "susp_ip": self.susp_ip,
            "expiry": _to_millis(self.expiry),
            "exp_notification": self.exp_notification,
            "creation_date": _to_millis(self.creation_date),
            "latest_match_date": _to_millis(self.latest_match_date),
        }

    @classmethod
    def from_json_obj(cls, obj: dict[str, Any]) -> "Rule":
        return cls(
            name=obj["name"],
            criterion=Criterion.from_json_obj(obj["criterion"]),
            actions=[Action(a) for a in obj.get("actions", [])],
            match_count=int(obj.get("match_count", 0)),
            most_recent_caught=list(obj.get("most_recent_caught", [])),
            no_delay=bool(obj.get("no_delay", False)),
            enabled=bool(obj.get("enabled", True)),
            susp_ip=bool(obj.get("susp_ip", False)),
            expiry=_from_millis(obj.get("expiry")),
            exp_notification=int(obj.get("exp_notification", 0)),
            creation_date=_from_millis(obj.get("creation_date")) or MIN_UTC,
            latest_match_date=_from_millis(obj.get("latest_match_date")),
        )

    def to_json(self) -> str:
        return json.dumps(self.to_json_obj())

    def friendly(self) -> str:
        acts = " and ".join(a.dsl_name for a in self.actions)
        gate = " (only if suspicious IP)" if self.susp_ip else ""
        return f"{self.name}: if {self.criterion.friendly()}{gate} then {acts}"
