"""Code-predicate runtime tests (SURVEY.md §2.8, §5.5).

Unit tests pin the sentinel semantics of src/lua.rs:8-70 (the code never
sees NULLs — nullable fields surface as sentinel STRINGS, so e.g.
``regex(user.fp(), "x")`` on a NULL fingerprint matches against
"<NO PRINT>", not NULL). The differential test runs random rows through the
Spark pandas-UDF path AND the pure-Python interpreter and requires
identical verdicts — the §5.5 property-based oracle for the one operator
DuckDB can't check.
"""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from lichess_event_stream_watcher_spark.lua_compat import (
    NO_CITY,
    NO_COUNTRY,
    NO_PRINT,
    NO_UA,
    UserRow,
    compile_predicate,
    code_predicate_column,
    is_in_ip_range,
    regex,
)


def test_sentinels_on_null_fields():
    r = UserRow({"username": "Bob", "email": "b@x.y", "ip": "1.2.3.4"})
    assert r.ua() == NO_UA and r.fp() == NO_PRINT
    assert r.country() == NO_COUNTRY and r.city() == NO_CITY
    assert r.subdivisions() == [] and not r.has_subdivision("A")
    # the reference's Lua sees sentinels, never nulls: a regex on a missing
    # fingerprint runs against "<NO PRINT>"
    assert compile_predicate('regex(user.fp(), "NO PRINT")')(
        {"username": "x", "email": "e", "ip": "i"}
    )


def test_geoip_device_bindings():
    row = {
        "username": "x", "email": "e", "ip": "i",
        "geoip": {"country": "DE", "city": None, "subdivisions": ["BY", "BW"]},
        "device": {"device": "Computer", "os": None, "client": "Firefox 128"},
    }
    r = UserRow(row)
    assert r.country() == "DE" and r.city() == NO_CITY
    assert r.has_subdivision("BY") and not r.has_subdivision("HH")
    assert r.os() == "<NO OS>" and r.client() == "Firefox 128"


def test_regex_search_semantics():
    assert regex("hello world", "o w")  # unanchored search (src/lua.rs:80)
    assert not regex("hello", "^world")


def test_ip_range_inclusive_bounds():
    # src/lua.rs:98 — inclusive on BOTH ends
    assert is_in_ip_range("10.0.0.0", "10.0.0.0", "10.0.0.255")
    assert is_in_ip_range("10.0.0.255", "10.0.0.0", "10.0.0.255")
    assert not is_in_ip_range("10.0.1.0", "10.0.0.0", "10.0.0.255")
    assert not is_in_ip_range("bogus", "10.0.0.0", "10.0.0.255")


def test_error_isolation():
    # a raising predicate evaluates False, never crashes the scan
    # (src/eventhandler.rs:258-272)
    bad = compile_predicate('int(user.email()) > 0')
    try:
        result = bad({"username": "x", "email": "not-a-number", "ip": "i"})
    except ValueError:
        result = "raised"
    assert result == "raised"  # the raw fn raises; the UDF wrapper catches


PREDICATES = [
    'regex(user.email(), "@(gmail|proton)")',
    'user.fp() != "<NO PRINT>"',
    'len(user.ua()) <= 20',
    'isInIpRange(user.ip(), "10.0.0.0", "10.127.255.255")',
    'user.susp_ip() and regex(user.name(), "(?i)bot")',
    'user.name().lower() == user.email().split("@")[0]',
]


def _random_rows(n: int, seed: int) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        name = "".join(rng.choices(string.ascii_letters, k=rng.randint(3, 10)))
        if rng.random() < 0.3:
            name += rng.choice(["Bot", "bOt", "bot"])
        rows.append(
            {
                "username": name,
                "email": f"{name.lower() if rng.random() < 0.3 else 'u' + str(i)}@"
                + rng.choice(["gmail.com", "proton.me", "x.org"]),
                "ip": f"10.{rng.randint(0, 255)}.{rng.randint(0, 255)}.{rng.randint(0, 255)}",
                "user_agent": None if rng.random() < 0.3 else "M" * rng.randint(1, 40),
                "finger_print": None if rng.random() < 0.5 else f"fp{i}",
                "susp_ip": rng.random() < 0.2,
            }
        )
    return rows


def test_differential_spark_vs_python(spark):
    rows = _random_rows(300, seed=20260813)
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows],
        "username string, email string, ip string, user_agent string, "
        "finger_print string, susp_ip boolean",
    )
    cols = [
        code_predicate_column(p).alias(f"p{i}") for i, p in enumerate(PREDICATES)
    ]
    got = df.select(*cols).collect()
    for i, p in enumerate(PREDICATES):
        fn = compile_predicate(p)
        expected = [bool(fn(r)) for r in rows]
        actual = [bool(row[f"p{i}"]) for row in got]
        assert actual == expected, f"divergence on predicate: {p}"
        assert any(expected), f"predicate never true (weak test): {p}"
        assert not all(expected), f"predicate always true (weak test): {p}"


class TestLuaSurfaceTranslation:
    """Reference-exported rules arrive in LUA syntax (src/lua.rs:109-119:
    ``function(user) return <expr> end`` with ``user:method()`` sugar).
    The translator must evaluate them identically to the Python surface."""

    ROW = {
        "username": "MeanieBob",
        "email": "bob@proton.me",
        "ip": "10.0.0.7",
        "finger_print": None,
        "user_agent": "Mozilla/5.0",
        "susp_ip": True,
    }

    def eval_(self, code):
        return compile_predicate(code)(dict(self.ROW))

    def test_method_call_sugar_and_neq(self):
        assert self.eval_('user:email() ~= "x"')
        assert self.eval_('user:fp() == "<NO PRINT>"')
        assert not self.eval_('user:name() ~= "MeanieBob"')

    def test_wrapped_chunk(self):
        assert self.eval_(
            'function(user) return regex(user:email(), "@proton") and user:susp_ip() end'
        )

    def test_lua_keywords_and_concat(self):
        assert self.eval_('user:fp() .. "!" == "<NO PRINT>!"')
        assert self.eval_("user:susp_ip() == true")
        assert self.eval_("not false")

    def test_length_operator(self):
        assert self.eval_("#user:name() == 9")
        assert self.eval_('#"abc" == 3')

    def test_is_in_ip_range_lua_spelling(self):
        assert self.eval_('isInIpRange(user:ip(), "10.0.0.0", "10.0.0.255")')

    def test_python_surface_unchanged(self):
        # idempotency: the translator must not disturb the Python surface
        assert self.eval_('regex(user.email(), "@proton") and user.fp() != "x"')
        assert self.eval_("len(user.name()) == 9")

    def test_statements_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="surface"):
            compile_predicate("local x = 1")

    def test_lua_python_pairs_agree_on_random_rows(self):
        """Differential: each (lua, python) expression pair must agree on
        every random row."""
        pairs = [
            ('user:email() ~= "q" and #user:name() > 3',
             'user.email() != "q" and len(user.name()) > 3'),
            ('regex(user:ua(), "Mozilla") or user:fp() == "<NO PRINT>"',
             'regex(user.ua(), "Mozilla") or user.fp() == "<NO PRINT>"'),
            ('function(user) return user:susp_ip() and user:country() == "<NO COUNTRY>" end',
             'user.susp_ip() and user.country() == "<NO COUNTRY>"'),
        ]
        rng = random.Random(7)
        for lua, py in pairs:
            f_lua, f_py = compile_predicate(lua), compile_predicate(py)
            for _ in range(50):
                row = {
                    "username": "".join(rng.choices(string.ascii_letters, k=rng.randint(1, 8))),
                    "email": rng.choice(["a@b.c", "q", "z@proton.me"]),
                    "ip": "1.2.3.4",
                    "user_agent": rng.choice([None, "Mozilla/5.0", "curl/8"]),
                    "finger_print": rng.choice([None, "fp1"]),
                    "susp_ip": rng.choice([True, False]),
                }
                assert f_lua(row) == f_py(row), (lua, row)


def test_translator_idempotent_on_python_surface():
    """Property: for generated Python-surface predicates, translation is a
    no-op semantically — compile_predicate(expr) == raw eval of the same
    expr — so running the rewrite unconditionally can never break rules
    written natively for this engine."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lichess_event_stream_watcher_spark.lua_translate import lua_to_python

    field = st.sampled_from(
        ["user.name()", "user.email()", "user.ip()", "user.ua()", "user.fp()"]
    )
    lit = st.sampled_from(['"a"', '"@x"', '"<NO PRINT>"', '"Z9"'])
    cmp_op = st.sampled_from(["==", "!=", "<", ">", "<=", ">="])

    atom = st.one_of(
        st.builds(lambda f, o, v: f"{f} {o} {v}", field, cmp_op, lit),
        st.builds(lambda f, v: f"regex({f}, {v})", field, lit),
        st.builds(lambda f: f"len({f}) > 2", field),
        st.just("user.susp_ip()"),
    )

    def combine(children):
        return st.one_of(
            st.builds(lambda a, b: f"({a}) and ({b})", children, children),
            st.builds(lambda a, b: f"({a}) or ({b})", children, children),
            st.builds(lambda a: f"not ({a})", children),
        )

    expr = st.recursive(atom, combine, max_leaves=6)

    @given(expr)
    @settings(max_examples=200, deadline=None)
    def check(e):
        assert compile(lua_to_python(e), "<t>", "eval")  # stays valid Python
        row = {"username": "Bob", "email": "b@x.y", "ip": "1.2.3.4",
               "user_agent": None, "finger_print": None, "susp_ip": True}
        import lichess_event_stream_watcher_spark.lua_compat as lc

        translated = lc.compile_predicate(e)(dict(row))
        raw = bool(
            eval(  # noqa: S307 - test-only twin without the rewrite
                compile(e, "<raw>", "eval"),
                {"__builtins__": {"len": len}, "regex": lc.regex,
                 "isInIpRange": lc.is_in_ip_range},
                {"user": lc.UserRow(dict(row))},
            )
        )
        assert translated == raw

    check()


def test_sandbox_rejects_dunder_escape_vectors():
    """Round-7 review fix: the helper functions in the eval env expose
    their module __globals__ (real builtins) through attribute access —
    every dunder name/attribute is rejected at COMPILE time, closing
    __globals__/__class__/__subclasses__-style escapes categorically."""
    import pytest

    for code in (
        "regex.__globals__['__builtins__']['__import__']('os').getpid() > 0",
        'user.__class__.__mro__[1] != None',
        "__import__('os')",
    ):
        with pytest.raises(ValueError, match="dunder"):
            compile_predicate(code)
    # the legitimate surface still compiles
    assert compile_predicate('regex(user.email(), "@x") or True')({"email": "a@x"})


def test_lua_not_binds_tighter_than_comparison():
    """Lua precedence: `not x == y` is `(not x) == y` (always False for a
    truthy x and string y) — NOT Python's `not (x == y)` (round-7 review
    fix). Bare `not` before a call chain is unchanged."""
    f = compile_predicate('not user:name() == "x"')
    assert f({"username": "x"}) is False  # Lua: (not "x") == "x" -> False
    assert f({"username": "y"}) is False  # Python reading would say True
    g = compile_predicate("not user:susp_ip()")
    assert g({"susp_ip": False}) is True and g({"susp_ip": True}) is False


def test_python_slices_and_set_literals_pass_through():
    """Round-7 review fix: a ':' after a NUMBER bound is a Python slice,
    not Lua method sugar; '{...}' set literals tokenize."""
    f = compile_predicate("user.name()[0:len(user.name())] == user.name()")
    assert f({"username": "alice"}) is True
    g = compile_predicate('user.email() in {"a@b.c", "z@q.r"}')
    assert g({"email": "a@b.c"}) is True and g({"email": "nope"}) is False


def test_ip_twins_agree_on_malformed_inputs(spark):
    """functions/ip.py: the Catalyst ip_to_num and the python twin must
    agree on EVERY input — octet > 255, '+'/whitespace octets, wrong
    part counts (round-7 review fix: '0.256.0.0' used to alias to
    1.0.0.0 on the Column side while the twin said None)."""
    from pyspark.sql import functions as F

    from lichess_event_stream_watcher_spark.functions.ip import ip_to_num, ip_to_num_py

    ips = [
        "1.2.3.4", "0.0.0.0", "255.255.255.255", "0.256.0.0", "256.1.1.1",
        "1.+2.3.4", " 1.2.3.4", "1.2.3.4 ", "1.2.3", "1.2.3.4.5",
        "01.002.3.4", "999.999.999.999", "a.b.c.d", "", "1..2.3",
    ]
    df = spark.createDataFrame([(ip,) for ip in ips], "ip string")
    got = {r.ip: r.n for r in df.select("ip", ip_to_num(F.col("ip")).alias("n")).collect()}
    for ip in ips:
        assert got[ip] == ip_to_num_py(ip), (ip, got[ip], ip_to_num_py(ip))
    assert ip_to_num_py(None) is None


def test_sandbox_rejects_format_string_side_door():
    """Round-8 ADVICE fix: str.format replays dunder access through its
    field-name mini-language with NO Attribute node in the AST —
    '{0.__globals__}'.format(regex) would render module globals as text.
    .format/.format_map are rejected at compile; ordinary string methods
    and the legitimate surface still compile."""
    import pytest

    for code in (
        '"{0.__globals__}".format(regex) != ""',
        'str.format("{0.__globals__}", regex) != ""',
        '"{x.__class__}".format_map({"x": regex}) != ""',
    ):
        with pytest.raises(ValueError, match="format"):
            compile_predicate(code)
    assert compile_predicate('user.email().lower() == "a@x"')({"email": "A@X"})


def test_leading_zero_octets_rejected_everywhere(spark):
    """Round-8 ADVICE fix: Rust std::net Ipv4Addr rejects leading-zero
    octets ('01.2.3.4'), so both ip_to_num twins must too — otherwise a
    reference-exported isInIpRange rule diverges on malformed-but-regex-
    matching IPs. '0.x.y.z' (a real zero octet) stays valid."""
    from pyspark.sql import functions as F

    from lichess_event_stream_watcher_spark.functions.ip import (
        ip_to_num,
        ip_to_num_py,
    )

    cases = {
        "01.2.3.4": None,
        "1.02.3.4": None,
        "1.2.3.004": None,
        # '$' matches before a final newline in Java/Python regex but not
        # in DuckDB's RE2 or Rust std::net — the twins use absolute end
        # anchors so all engines reject line-terminated input (round-8
        # review fix)
        "1.2.3.4\n": None,
        "1.2.3.4\r\n": None,
        "1.2.3.4\r": None,
        "0.2.3.4": 2 * 65536 + 3 * 256 + 4,
        "10.0.0.1": 10 * 16777216 + 1,
        "100.200.255.0": 100 * 16777216 + 200 * 65536 + 255 * 256,
    }
    df = spark.createDataFrame([(ip,) for ip in cases], "ip string")
    got = {
        r.ip: r.n
        for r in df.select("ip", ip_to_num(F.col("ip")).alias("n")).collect()
    }
    for ip, want in cases.items():
        assert ip_to_num_py(ip) == want, (ip, ip_to_num_py(ip), want)
        assert got[ip] == want, (ip, got[ip], want)


def test_dict_literal_with_name_key_and_call_value():
    """Round-8 ADVICE fix: the ':'->'.' method-sugar rewrite is suppressed
    inside '{...}' nesting, so a NAME-keyed dict with a call value
    ({a: f(x)}) stays valid Python instead of mangling to '{a. f(x)}'.
    Method sugar OUTSIDE the braces in the same expression still fires."""
    import ast

    from lichess_event_stream_watcher_spark.lua_translate import lua_to_python

    src = lua_to_python("{a: f(x)}")
    ast.parse(src, mode="eval")  # used to raise SyntaxError via '{a. f(x)}'
    assert ":" in src and ". f" not in src
    mixed = lua_to_python('user:name() ~= nil and {a: f(x)} != None')
    ast.parse(mixed, mode="eval")
    assert "user . name" in mixed.replace("user .name", "user . name")
    # runtime check: a dict-literal predicate evaluates
    f = compile_predicate('{True: len(user.name())}[True] == 5')
    assert f({"username": "alice"}) is True and f({"username": "bob"}) is False


def test_not_precedence_shift_detector():
    """Round-8 ADVICE fix: the detector flags exactly the expressions whose
    meaning the Lua-precedence rewrite changes vs native Python — `not`
    directly before a comparison — and nothing else."""
    from lichess_event_stream_watcher_spark.lua_translate import (
        not_precedence_shift,
    )

    assert not_precedence_shift('not user:name() == "x"')
    assert not_precedence_shift("not user.susp_ip() != False")
    assert not_precedence_shift(
        'function(user) return not user:email() ~= "a" end'
    )
    assert not not_precedence_shift("not user:susp_ip()")
    assert not not_precedence_shift('not (user:name() == "x")')
    assert not not_precedence_shift('user:email() == "a" and not user:susp_ip()')
    assert not not_precedence_shift("if broken syntax")


def test_not_shift_detector_keyword_and_arithmetic_continuations():
    """Round-8 review fix: `in`/`is` and arithmetic continuations shift
    meaning under the Lua `not` rewrite just like symbolic comparisons."""
    from lichess_event_stream_watcher_spark.lua_translate import (
        not_precedence_shift,
    )

    assert not_precedence_shift('not user.country() in ("US", "CA")')
    assert not_precedence_shift("not user:susp_ip() is None")
    assert not_precedence_shift("not user:name() .. 'x' == 'yx'")
    assert not not_precedence_shift('not (user.country() in ("US",))')
