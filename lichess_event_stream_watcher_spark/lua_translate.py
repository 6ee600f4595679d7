"""Lua-expression -> Python-expression translator for the CODE criterion.

The reference evaluates a rule's code by wrapping it as
``function(user) return <expr> end`` and calling it with the user bound as a
Lua userdata (src/lua.rs:109-119). Rules exported from a reference
deployment therefore arrive in LUA surface syntax:

    user:email() ~= "x" and regex(user:name(), "^ab") and not user:susp_ip()

The runtime here executes PYTHON expressions (lua_compat.py), whose operator
set is nearly a superset; this module closes the syntax gap with a small
tokenizer + token-level rewrite covering the reference's actual rule surface
(src/lua.rs:8-107):

- ``obj:method(...)``     -> ``obj.method(...)`` (Lua method-call sugar)
- ``~=``                  -> ``!=``
- ``..``                  -> ``+``   (string concat; operands are strings)
- ``true / false / nil``  -> ``True / False / None``
- ``#expr``               -> ``len(expr)`` (length of a primary expression)
- ``and / or / not``      -> unchanged (same keywords in Python)
- string literals (single or double quoted) pass through verbatim
- ``regex(...)`` / ``isInIpRange(...)`` are provided by the runtime env

The rewrite is IDEMPOTENT on expressions already in Python surface syntax
— with two documented precedence caveats, because the translator always
applies LUA semantics (reference-exported rules are the primary
contract): (1) ``not`` is parenthesized with Lua's tight unary binding,
so a native-Python ``not x == y`` becomes ``(not x) == y`` — a Python
predicate relying on Python's loose ``not`` must write its own parens;
(2) ``a[x:y(...)]`` where ``x`` is a NAME is read as a Lua method call
(Lua cannot produce that token sequence any other way) — Python slices
with a name lower bound and a call upper bound must parenthesize the
bound. Slices after a NUMBER bound (``x[0:len(x)]``) pass through
untouched. An optional ``function(user) return ... end`` wrapper is
stripped first, so a fully-wrapped reference chunk is accepted too.
Python set/dict literals (``{...}``) tokenize and pass through —
including NAME-keyed dicts with call values (``{a: f(x)}``): the
':'->'.' rewrite is suppressed inside brace nesting, which Lua syntax
cannot produce.

Deliberately out of scope (raise at compile, not silently mis-evaluate):
Lua statements (``if``/``local``), the ``string.*`` / ``table.*`` stdlib,
and multi-line chunks — none appear in the reference's rule surface.
"""

from __future__ import annotations

import re

_WRAPPER = re.compile(
    r"^\s*function\s*\(\s*user\s*\)\s*return\s+(?P<body>.*?)\s*end\s*$",
    re.DOTALL,
)

_TOKEN = re.compile(
    r"""
      (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
    | (?P<number>\d+\.\d+|\d+)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>~=|!=|==|<=|>=|\.\.|[-+*/%<>=(),:\#\.\[\]{}])
    | (?P<ws>\s+)
    """,
    re.VERBOSE,
)

_KEYWORD_MAP = {"true": "True", "false": "False", "nil": "None"}
_UNSUPPORTED = {"if", "then", "else", "elseif", "local", "for", "while", "do", "end", "function", "return"}


def _tokenize(expr: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if not m:
            raise ValueError(f"untranslatable Lua expression at {expr[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    return out


def _primary_span(toks: list[tuple[str, str]], i: int) -> int:
    """End index (exclusive) of the primary expression starting at ``i`` —
    the operand of a ``#`` length operator: name/string/( ... ) followed by
    any chain of .name / :name / (...) / [...]."""
    if i >= len(toks):
        raise ValueError("dangling '#' length operator")
    kind, val = toks[i]
    if kind in ("name", "string", "number"):
        i += 1
    elif val == "(":
        depth, i = 1, i + 1
        while i < len(toks) and depth:
            if toks[i][1] == "(":
                depth += 1
            elif toks[i][1] == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError("unbalanced parentheses after '#'")
    else:
        raise ValueError(f"unsupported '#' operand {val!r}")
    while i < len(toks) and toks[i][1] in (".", ":", "(", "["):
        if toks[i][1] in (".", ":"):
            i += 2  # member name
        else:
            open_, close = toks[i][1], ")" if toks[i][1] == "(" else "]"
            depth, i = 1, i + 1
            while i < len(toks) and depth:
                if toks[i][1] == open_:
                    depth += 1
                elif toks[i][1] == close:
                    depth -= 1
                i += 1
    return i


def _unary_operand_span(toks: list[tuple[str, str]], i: int) -> int:
    """End index (exclusive) of a unary operator's operand: nested unary
    operators (``not``/``#``) bind to the primary expression after them."""
    if i < len(toks) and toks[i] == ("name", "not"):
        return _unary_operand_span(toks, i + 1)
    if i < len(toks) and toks[i][1] == "#":
        return _unary_operand_span(toks, i + 1)
    return _primary_span(toks, i)


_COMPARISONS = {"==", "!=", "~=", "<", "<=", ">", ">="}
# every continuation that binds LOOSER than Python's `not` but TIGHTER
# than the translator's parenthesized form: comparisons (incl. the
# keyword forms `in` / `is`, missed by the first cut — round-8 review
# fix: `not user.country() in (...)` shifted silently) and arithmetic /
# concat operators (`(not x) + 1` raises where Python read `not (x+1)`)
_SHIFT_CONTINUATIONS = _COMPARISONS | {"in", "is", "+", "-", "*", "/", "%", ".."}


def not_precedence_shift(code: str) -> bool:
    """True iff the Lua-precedence ``not`` rewrite CHANGES this expression's
    meaning relative to native Python — i.e. some ``not`` operand span is
    immediately followed by a comparison (symbolic or ``in``/``is``) or
    arithmetic continuation, so Python reads ``not (x == y)`` while the
    translator emits ``(not x) == y``. The rules store calls this on load
    to warn about stored native-Python predicates written before the
    round-7 precedence fix (round-8 ADVICE fix); Lua-exported rules are
    unaffected (Lua always meant the tight binding)."""
    m = _WRAPPER.match(code)
    if m:
        code = m.group("body")
    try:
        toks = _tokenize(code)
    except ValueError:
        return False  # untranslatable anyway; compile will raise the real error
    for i, (kind, val) in enumerate(toks):
        if kind == "name" and val == "not":
            try:
                end = _unary_operand_span(toks, i + 1)
            except ValueError:
                return False
            if end < len(toks) and toks[end][1] in _SHIFT_CONTINUATIONS:
                return True
    return False


def lua_to_python(code: str) -> str:
    """Translate a reference-surface Lua expression (optionally wrapped in
    ``function(user) return ... end``) to the equivalent Python expression."""
    m = _WRAPPER.match(code)
    if m:
        code = m.group("body")
    toks = _tokenize(code)
    for kind, val in toks:
        if kind == "name" and val in _UNSUPPORTED:
            raise ValueError(
                f"Lua keyword {val!r} is outside the translatable rule "
                "surface (expressions only, src/lua.rs:109-119)"
            )

    def emit(toks: list[tuple[str, str]]) -> list[str]:
        out: list[str] = []
        i = 0
        # Inside a '{...}' literal a NAME ':' callable-value pair is a
        # Python dict entry ({a: f(x)}), not Lua method sugar — Lua rules
        # never contain '{' (table constructors are outside the surface),
        # so any brace nesting marks Python-surface tokens where the
        # ':'->'.' rewrite must not fire (round-8 ADVICE fix). Depth is
        # tracked per emit() call; unary-operand recursion never splits a
        # brace pair because _primary_span rejects '{' operands.
        brace_depth = 0
        while i < len(toks):
            kind, val = toks[i]
            if val == "{":
                brace_depth += 1
            elif val == "}":
                brace_depth -= 1
            if val == "#":
                end = _unary_operand_span(toks, i + 1)
                out += ["len", "("] + emit(toks[i + 1 : end]) + [")"]
                i = end
                continue
            if kind == "name" and val == "not":
                # Lua precedence: unary `not` binds TIGHTER than
                # comparison (`not x == y` means `(not x) == y`), while
                # Python's binds looser — parenthesize the operand so
                # reference-exported rules keep their Lua meaning. A
                # native-Python predicate relying on Python's weak `not`
                # must write the parens itself (documented above).
                end = _unary_operand_span(toks, i + 1)
                out += ["(", "not"] + emit(toks[i + 1 : end]) + [")"]
                i = end
                continue
            if (
                val == ":"
                and brace_depth == 0
                and i + 1 < len(toks)
                and toks[i + 1][0] == "name"
                and i + 2 < len(toks)
                and toks[i + 2][1] == "("
                and i > 0
                and (toks[i - 1][0] == "name" or toks[i - 1][1] in (")", "]"))
            ):
                # Lua method-call sugar `prefixexp:name(...)` only — a
                # ':' after a number literal is a Python slice bound
                # (`x[0:len(x)]`), which Lua syntax cannot produce, and
                # must pass through untouched
                out.append(".")
            elif val == "~=":
                out.append("!=")
            elif val == "..":
                out.append("+")
            elif kind == "name" and val in _KEYWORD_MAP:
                out.append(_KEYWORD_MAP[val])
            else:
                out.append(val)
            i += 1
        return out

    # Python's grammar allows whitespace around '.', '(' and every operator
    # inside an expression, so a plain space-join is already valid Python.
    return " ".join(emit(toks))
