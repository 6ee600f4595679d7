"""Environment-gated enrichment paths: ua-parser upgrade (S6) degrades
cleanly to the built-in regex chain when the library is absent."""

from __future__ import annotations

import pytest

from lichess_event_stream_watcher_spark.operators.enrich import enrich_device

ROWS = [
    ("A", "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36"),
    ("B", "lichess-bot/2.3 user:x"),
    ("C", None),
]


def _has_ua_parser() -> bool:
    try:
        import ua_parser  # noqa: F401

        return True
    except ImportError:
        return False


def test_auto_mode_degrades_to_regex_chain(spark):
    df = spark.createDataFrame(ROWS, "username string, user_agent string")
    auto = {r["username"]: r["device"] for r in enrich_device(df).collect()}
    never = {r["username"]: r["device"] for r in enrich_device(df, use_ua_parser="never").collect()}
    if not _has_ua_parser():
        assert auto == never  # identical plans without the lib
    # the lichess fast paths and NULL handling hold in every mode
    assert auto["B"]["client"] == "lichess-bot 2.3"
    assert auto["C"] is None
    assert never["A"]["client"].startswith("Chrome")


def test_require_mode_raises_without_lib(spark):
    df = spark.createDataFrame(ROWS, "username string, user_agent string")
    if _has_ua_parser():
        pytest.skip("ua_parser present: require mode works")
    with pytest.raises(ImportError):
        enrich_device(df, use_ua_parser="require")
