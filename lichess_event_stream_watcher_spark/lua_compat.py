"""User-code predicate runtime — parity with the reference's embedded Lua.

Parity target: src/lua.rs. The reference wraps a rule's code string as
``function(user) return <code> end`` and calls it per event
(src/lua.rs:109-119). We accept a Python *expression* over a bound ``user``
object exposing the SAME accessor surface and sentinel values
(src/lua.rs:8-70): the code never sees NULLs — nullable fields surface as
sentinel strings, exactly as the reference's Lua bindings do. Example:

    regex(user.email(), "@gmail") and user.country() == "DE"

Registered helpers (src/lua.rs:75-101): ``regex(text, pattern)`` (search
semantics) and ``isInIpRange(ip, lo, hi)`` (inclusive bounds, :98).

Execution: the expression compiles ONCE per executor (closure capture), then
runs over Arrow-batched rows via ``pandas_udf`` — strictly better than the
reference, which re-compiles the Lua chunk per call (src/lua.rs:112-114).
This is the engine's only Python hot path; every other predicate stays in
whole-stage codegen. Errors propagate per-rule and are reported, not fatal
(src/eventhandler.rs:258-272): a row whose predicate raises evaluates False
and the error is recorded on the executor log.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Any

import pandas as pd

from .functions.ip import ip_to_num_py

NO_UA = "no user agent detected"  # src/lua.rs:13-16
NO_PRINT = "<NO PRINT>"  # src/lua.rs:17-20
NO_COUNTRY = "<NO COUNTRY>"  # src/lua.rs:21-27
NO_CITY = "<NO CITY>"  # src/lua.rs:28-34
NO_DEVICE = "<NO DEVICE>"  # src/lua.rs:48-54
NO_OS = "<NO OS>"  # src/lua.rs:55-61
NO_CLIENT = "<NO CLIENT>"  # src/lua.rs:62-68


@lru_cache(maxsize=1024)
def _compiled_regex(pattern: str) -> re.Pattern:
    return re.compile(pattern)


def regex(text: str, pattern: str) -> bool:
    """src/lua.rs:75-84 — unanchored search, like Regex::is_match."""
    return _compiled_regex(pattern).search(text) is not None


def is_in_ip_range(ip: str, lo: str, hi: str) -> bool:
    """src/lua.rs:85-101 — inclusive on both ends (:98)."""
    n, a, b = ip_to_num_py(ip), ip_to_num_py(lo), ip_to_num_py(hi)
    if n is None or a is None or b is None:
        return False
    return a <= n <= b


class UserRow:
    """Row bindings with total null-safety via sentinels (src/lua.rs:8-70)."""

    __slots__ = ("_row",)

    def __init__(self, row: dict[str, Any]):
        self._row = row

    def name(self) -> str:  # :10
        return self._row.get("username") or ""

    def email(self) -> str:  # :11
        return self._row.get("email") or ""

    def ip(self) -> str:  # :12
        return self._row.get("ip") or ""

    def ua(self) -> str:  # :13-16
        v = self._row.get("user_agent")
        return v if v is not None else NO_UA

    def fp(self) -> str:  # :17-20
        v = self._row.get("finger_print")
        return v if v is not None else NO_PRINT

    def _geo(self, key: str, sentinel: str) -> str:
        g = self._row.get("geoip")
        if g is None:
            return sentinel
        v = g.get(key) if isinstance(g, dict) else getattr(g, key, None)
        return v if v is not None else sentinel

    def country(self) -> str:  # :21-27
        return self._geo("country", NO_COUNTRY)

    def city(self) -> str:  # :28-34
        return self._geo("city", NO_CITY)

    def subdivisions(self) -> list[str]:  # :35-41
        g = self._row.get("geoip")
        if g is None:
            return []
        v = g.get("subdivisions") if isinstance(g, dict) else getattr(g, "subdivisions", None)
        return list(v) if v is not None else []

    def has_subdivision(self, s: str) -> bool:  # :42-47
        return s in self.subdivisions()

    def _dev(self, key: str, sentinel: str) -> str:
        d = self._row.get("device")
        if d is None:
            return sentinel
        v = d.get(key) if isinstance(d, dict) else getattr(d, key, None)
        return v if v is not None else sentinel

    def device(self) -> str:  # :48-54
        return self._dev("device", NO_DEVICE)

    def os(self) -> str:  # :55-61
        return self._dev("os", NO_OS)

    def client(self) -> str:  # :62-68
        return self._dev("client", NO_CLIENT)

    def susp_ip(self) -> bool:
        return bool(self._row.get("susp_ip"))


_SAFE_BUILTINS = {
    "len": len, "str": str, "int": int, "float": float, "bool": bool,
    "abs": abs, "min": min, "max": max, "any": any, "all": all,
    "True": True, "False": False, "None": None,
}


def compile_predicate(code: str):
    """Compile a predicate expression once; returns fn(row_dict) -> bool.

    Accepts BOTH surface syntaxes: reference-exported Lua (``user:email()``,
    ``~=``, ``..``, ``function(user) return ... end`` wrappers —
    src/lua.rs:109-119) and native Python expressions; the Lua->Python
    rewrite (lua_translate.py) is idempotent on the Python surface, so it
    runs unconditionally. The environment deliberately mirrors
    src/lua.rs:72-107: ``user`` plus the two helper functions, nothing else
    (no imports, no builtins beyond the safe arithmetic/logic set).
    """
    import ast

    from .lua_translate import lua_to_python

    src = lua_to_python(code)
    # Sandbox hardening: the helper FUNCTIONS in the env expose their
    # module __globals__ (with real builtins) through ordinary attribute
    # access — `regex.__globals__['__builtins__']['__import__']` is
    # arbitrary code execution on every executor. The reference's Lua
    # sandbox has no such reflective path (src/lua.rs:72-107), so reject
    # ALL dunder names/attributes at compile time: no legitimate rule
    # surface uses them, and this closes __globals__/__class__/
    # __subclasses__-style escapes categorically.
    # str.format replays dunder access through its FIELD-NAME mini-language
    # ('{0.__globals__}'.format(regex) renders module globals as text) with
    # no Attribute node in the AST — an information-disclosure side door
    # around the dunder check below (round-8 ADVICE fix). No reference rule
    # uses .format (Lua has no such method), so reject it outright rather
    # than trying to parse format-spec field names.
    _FORMAT_SIDE_DOORS = ("format", "format_map")
    for node in ast.walk(ast.parse(src, mode="eval")):
        if isinstance(node, ast.Attribute) and node.attr in _FORMAT_SIDE_DOORS:
            raise ValueError(
                f"str.{node.attr} is outside the rule-predicate surface "
                "(format-string field names replay attribute access)"
            )
        bad = (
            node.attr
            if isinstance(node, ast.Attribute) and "__" in node.attr
            else node.id
            if isinstance(node, ast.Name) and "__" in node.id
            else None
        )
        if bad is not None:
            raise ValueError(
                f"dunder access {bad!r} is outside the rule-predicate "
                "surface (sandbox escape vector)"
            )
    compiled = compile(src, "<rule-predicate>", "eval")
    env_globals = {
        "__builtins__": _SAFE_BUILTINS,
        "regex": regex,
        "isInIpRange": is_in_ip_range,
        "is_in_ip_range": is_in_ip_range,
    }

    def predicate(row: dict[str, Any]) -> bool:
        return bool(eval(compiled, env_globals, {"user": UserRow(row)}))

    return predicate


_CODE_STRUCT_FIELDS = ("username", "email", "ip", "user_agent", "finger_print", "susp_ip")


class _ErrorListParam:
    """AccumulatorParam for a capped list of error strings (the executor ->
    driver error channel for CODE predicates)."""

    CAP = 200

    def zero(self, value):  # noqa: D401
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        del a[self.CAP:]
        return a


def make_error_accumulator(sc):
    """Executor->driver channel for per-rule predicate errors.

    Spark accumulator semantics: updates are at-least-once under task
    retries — fine for an error REPORTING stream (the engine dedupes by
    message text before posting, src/eventhandler.rs:258-272 parity)."""
    return sc.accumulator([], _ErrorListParam())


def code_predicate_column(
    code: str,
    cols: dict[str, str] | None = None,
    rule_name: str | None = None,
    error_acc=None,
):
    """CODE criterion -> boolean Column via an Arrow-batched pandas UDF.

    A row whose predicate raises evaluates False (per-rule error isolation,
    src/eventhandler.rs:258-272); when ``error_acc`` is given, the error is
    also accumulated as "(rule_name) message" so the engine can surface it
    on the notify stream like the reference does."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    c = cols or {}
    fields = []
    for k in _CODE_STRUCT_FIELDS:
        fields.append(F.col(c.get(k, k)).alias(k))
    for opt in ("geoip", "device"):
        if opt in c:
            fields.append(F.col(c[opt]).alias(opt))

    fn = compile_predicate(code)
    tag = rule_name or "<code>"

    @pandas_udf("boolean")
    def _pred(rows: pd.DataFrame) -> pd.Series:
        def safe(row):
            try:
                return bool(fn(row))
            except Exception as e:  # noqa: BLE001 — per-rule error isolation
                if error_acc is not None:
                    error_acc.add([f"{tag}: {e!r}"])
                else:
                    print(f"rule predicate error ({tag}): {e!r}")
                return False

        return pd.Series([safe(r) for r in rows.to_dict("records")])

    return _pred(F.struct(*fields))
