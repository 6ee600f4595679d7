"""Environment-gated enrichment paths: the generic UA fallback (S6,
reference path (d)) is the real ua-parser library when importable, the
from-scratch uap engine otherwise — never a silent feature downgrade; the
legacy Catalyst regex chain survives behind use_ua_parser="never"."""

from __future__ import annotations

import pytest

from lichess_event_stream_watcher_spark.operators.enrich import enrich_device

ROWS = [
    ("A", "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36"),
    ("B", "lichess-bot/2.3 user:x"),
    ("C", None),
    # generic parses the Catalyst chain misses: a device that is not a
    # computer, and a branded Chromium shell that must not report Chrome
    ("D", "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 Version/17.1 Mobile/15E148 Safari/604.1"),
    ("E", "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0"),
]


def _has_ua_parser() -> bool:
    try:
        import ua_parser  # noqa: F401

        return True
    except ImportError:
        return False


def test_auto_mode_uses_from_scratch_uap_without_lib(spark):
    df = spark.createDataFrame(ROWS, "username string, user_agent string")
    auto = {r["username"]: r["device"] for r in enrich_device(df).collect()}
    builtin = {
        r["username"]: r["device"]
        for r in enrich_device(df, use_ua_parser="builtin").collect()
    }
    if not _has_ua_parser():
        assert auto == builtin  # auto resolves to the from-scratch engine
    # the lichess fast paths and NULL handling hold in every mode
    assert auto["B"]["client"] == "lichess-bot 2.3"
    assert auto["C"] is None
    # path (d) via the uap engine: family + " " + major formatting
    # (src/event.rs:148-167), device "Other" -> "Computer"
    assert builtin["A"]["client"] == "Chrome 120"
    assert builtin["A"]["os"] == "Windows 10"
    assert builtin["A"]["device"] == "Computer"
    # parses the regex chain cannot produce: real device family, iOS from
    # the iPad/iPhone "CPU ... OS" token, Mobile Safari vs Safari
    assert builtin["D"]["device"] == "iPhone"
    assert builtin["D"]["os"] == "iOS 17"
    assert builtin["D"]["client"] == "Mobile Safari 17"
    # first-match-wins: the Opera shell outranks its Chrome token
    assert builtin["E"]["client"] == "Opera 105"


def test_never_mode_pins_the_catalyst_chain(spark):
    """"never" must keep the zero-UDF plan: no Python stage at all."""
    df = spark.createDataFrame(ROWS, "username string, user_agent string")
    out = enrich_device(df, use_ua_parser="never")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    got = {r["username"]: r["device"] for r in out.collect()}
    assert got["A"]["client"].startswith("Chrome")
    # the chain's documented coarseness (why "auto" upgrades): generic
    # devices are always Computer
    assert got["D"]["device"] == "Computer"


def test_require_mode_raises_without_lib(spark):
    df = spark.createDataFrame(ROWS, "username string, user_agent string")
    if _has_ua_parser():
        pytest.skip("ua_parser present: require mode works")
    with pytest.raises(ImportError):
        enrich_device(df, use_ua_parser="require")


def test_unknown_mode_raises(spark):
    df = spark.createDataFrame(ROWS, "username string, user_agent string")
    with pytest.raises(ValueError, match="use_ua_parser"):
        enrich_device(df, use_ua_parser="yes")
