"""Unit tests for the from-scratch ua-parser engine (functions/uap.py):
the public regexes.yaml FORMAT (loader, including the no-PyYAML subset
reader differentially against PyYAML) and the public uap-core ALGORITHM
(first-match-wins, $N replacement templates, regex_flag, defaults), plus
the reference's DeviceInfo formatting (src/event.rs:148-167). No Spark.
"""

from __future__ import annotations

from lichess_event_stream_watcher_spark.functions.uap import (
    BUILTIN_RULES_YAML,
    UAParser,
    _parse_simple_yaml,
    device_info,
    load_rules,
)

CHROME_WIN = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"
)
SAFARI_MAC = (
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.0 Safari/605.1.15"
)
IPHONE = (
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) "
    "AppleWebKit/605.1.15 Version/17.1 Mobile/15E148 Safari/604.1"
)
ANDROID_SAMSUNG = (
    "Mozilla/5.0 (Linux; Android 14; SM-S918B) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/121.0.0.0 Mobile Safari/537.36"
)
GOOGLEBOT = "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)"
IE11 = "Mozilla/5.0 (Windows NT 6.1; Trident/7.0; rv:11.0) like Gecko"
OPERA = (
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
    "Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0"
)


def test_simple_yaml_reader_matches_pyyaml_on_builtin_rules():
    """The subset reader must produce byte-identical rules to PyYAML on the
    shipped ruleset (and, by the format's shape, on uap-core's file)."""
    import yaml

    assert _parse_simple_yaml(BUILTIN_RULES_YAML) == yaml.safe_load(BUILTIN_RULES_YAML)


def test_simple_yaml_reader_quoting_and_escapes():
    got = _parse_simple_yaml(
        "section:\n"
        "  # comment\n"
        "  - regex: 'a''b'\n"
        "    family_replacement: \"C D\"\n"
        "  - regex: plain\n"
    )
    assert got == {
        "section": [
            {"regex": "a'b", "family_replacement": "C D"},
            {"regex": "plain"},
        ]
    }


def test_uap_semantics_first_match_and_replacements():
    p = UAParser(
        load_rules(
            "user_agent_parsers:\n"
            "  - regex: '(Alpha)/(\\d+)'\n"
            "    family_replacement: 'Renamed $1'\n"
            "  - regex: '(Alpha)'\n"
            "os_parsers:\n"
            "  - regex: 'OS9'\n"
            "    os_replacement: 'Nine'\n"
            "    os_v1_replacement: '9'\n"
            "device_parsers:\n"
            "  - regex: 'ALPHAPHONE'\n"
            "    regex_flag: 'i'\n"
            "    device_replacement: 'Alpha Phone'\n"
        )
    )
    # first match wins; $1 substitutes; v1 defaults to group 2
    assert p.parse("Alpha/7 OS9 alphaphone") == (
        "Renamed Alpha",
        "7",
        "Nine",
        "9",
        "Alpha Phone",
    )
    # no-hit defaults
    assert p.parse("nothing here") == ("Other", None, "Other", None, "Other")
    # missing capture group in a template -> empty, trimmed
    q = UAParser(
        load_rules(
            "user_agent_parsers:\n"
            "  - regex: 'Beta'\n"
            "    family_replacement: 'B $1'\n"
        )
    )
    assert q.parse("Beta")[0] == "B"


def test_builtin_ruleset_common_agents():
    cases = {
        CHROME_WIN: ("Computer", "Windows 10", "Chrome 120"),
        SAFARI_MAC: ("Computer", "Mac OS X 10", "Safari 17"),
        IPHONE: ("iPhone", "iOS 17", "Mobile Safari 17"),
        ANDROID_SAMSUNG: ("Samsung SM-S918B", "Android 14", "Chrome Mobile 121"),
        GOOGLEBOT: ("Spider", "Other", "Googlebot 2"),
        IE11: ("Computer", "Windows 7", "IE 11"),
        OPERA: ("Computer", "Linux", "Opera 105"),
        "curl/8.4.0": ("Computer", "Other", "curl 8"),
        "": ("Computer", "Other", "Other"),
    }
    for ua, want in cases.items():
        assert device_info(ua) == want, ua


def test_from_yaml_roundtrip(tmp_path):
    path = tmp_path / "regexes.yaml"
    path.write_text(BUILTIN_RULES_YAML, encoding="utf-8")
    p = UAParser.from_yaml(str(path))
    assert device_info(CHROME_WIN, p) == ("Computer", "Windows 10", "Chrome 120")
