"""Canonical fixture rule set over the derived ``signups`` view.

One rule per Criterion kind (FIXTURES.md §A2's checklist: plus a disabled
rule, an expired rule, a susp_ip-gated rule, a notify-only rule, and a
multi-action rule). ``SQL_PREDICATES`` carries, for every SQL-expressible
rule, the DuckDB-dialect WHERE clause that mirrors the compiled Column
semantics EXACTLY (case-insensitivity via upper(), search-semantics regex,
NULL->false) — these build the driver-oracle UNION queries.
"""

from __future__ import annotations

import datetime as dt

from .rules.model import UTC, Action, Criterion, CriterionKind, Rule

_PAST = dt.datetime(2020, 1, 1, tzinfo=UTC)


def reference_ruleset() -> list[Rule]:
    K, A = CriterionKind, Action
    return [
        Rule("r_ip_exact", Criterion(K.IP_MATCH, "10.8.0.0"), [A.IP_BAN, A.CLOSE]),
        Rule("r_fp_exact", Criterion(K.PRINT_MATCH, "fp_7"), [A.SHADOWBAN]),
        Rule("r_email_gmail", Criterion(K.EMAIL_CONTAINS, "gmail"), [A.NOTIFY_ZULIP]),
        Rule("r_email_re", Criterion(K.EMAIL_REGEX, "user1[0-9]@proton"), [A.ALT]),
        Rule("r_uname_sub", Criterion(K.USERNAME_CONTAINS, "SER_4"), [A.ENGINE_MARK]),
        Rule("r_uname_re", Criterion(K.USERNAME_REGEX, "(?i)^USER_1.$"), [A.BOOST_MARK]),
        Rule("r_ua_short", Criterion(K.USERAGENT_LENGTH_LTE, "12"), [A.NOTIFY_ZULIP], no_delay=True),
        Rule(
            "r_susp_proton",
            Criterion(K.EMAIL_CONTAINS, "proton"),
            [A.CLOSE, A.ENGINE_MARK, A.NOTIFY_ZULIP],
            susp_ip=True,
        ),
        Rule("r_disabled", Criterion(K.USERNAME_CONTAINS, "user"), [A.CLOSE], enabled=False),
        Rule("r_expired", Criterion(K.USERNAME_CONTAINS, "user"), [A.CLOSE], expiry=_PAST),
    ]


def code_rule() -> Rule:
    """The CODE-criterion rule (non-SQL-expressible; differential-tested)."""
    return Rule(
        "r_code",
        Criterion(
            CriterionKind.CODE,
            'regex(user.email(), "@proton") and user.fp() != "<NO PRINT>"',
        ),
        [Action.NOTIFY_ZULIP],
    )


# DuckDB-dialect WHERE clauses mirroring rule_predicate() for each ACTIVE rule.
SQL_PREDICATES: dict[str, str] = {
    "r_ip_exact": "ip = '10.8.0.0'",
    "r_fp_exact": "finger_print = 'fp_7'",
    "r_email_gmail": "instr(upper(email), 'GMAIL') > 0",
    "r_email_re": "regexp_matches(email, 'user1[0-9]@proton')",
    "r_uname_sub": "instr(upper(username), 'SER_4') > 0",
    "r_uname_re": "regexp_matches(username, '(?i)^USER_1.$')",
    "r_ua_short": "length(user_agent) <= 12",
    "r_susp_proton": "susp_ip AND instr(upper(email), 'PROTON') > 0",
}


def geoip_ranges() -> list[tuple[int, int, str, str, list[str]]]:
    """Deterministic ip-range dimension for the GeoIP range join (J2).

    Covers 10.0.0.0-13.255.255.255 in /10-quarter blocks, with the
    (12, 128-191) block deliberately absent so the no-covering-range ->
    NULL-geoip path (src/eventhandler.rs:79-83) is exercised by real rows.
    """
    out = []
    for a in (10, 11, 12, 13):
        for idx, (blo, bhi) in enumerate([(0, 63), (64, 127), (128, 191), (192, 255)]):
            if (a, idx) == (12, 2):
                continue  # the coverage gap
            lo = a * 16777216 + blo * 65536
            hi = a * 16777216 + bhi * 65536 + 65535
            country = f"C{a - 10}{idx}"
            out.append((lo, hi, country, f"city_{a - 10}_{idx}", [f"{country}-s1"]))
    return out


def geoip_ranges_df(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("lo", T.LongType(), False),
            T.StructField("hi", T.LongType(), False),
            T.StructField("country", T.StringType(), False),
            T.StructField("city", T.StringType(), False),
            T.StructField("subdivisions", T.ArrayType(T.StringType()), False),
        ]
    )
    return spark.createDataFrame(geoip_ranges(), schema)


def geoip_ranges_values_sql() -> str:
    """The same dimension as a SQL VALUES list (DuckDB oracle side)."""
    rows = ", ".join(
        f"({lo}, {hi}, '{country}', '{city}')" for lo, hi, country, city, _ in geoip_ranges()
    )
    return f"(VALUES {rows}) AS ranges(lo, hi, country, city)"


def oracle_union_sql(with_actions: bool = False) -> str:
    """UNION ALL oracle for the full rule scan (active rules only)."""
    rules = {r.name: r for r in reference_ruleset()}
    parts = []
    for name, where in SQL_PREDICATES.items():
        if with_actions:
            for a in rules[name].actions:
                parts.append(
                    f"SELECT event_id, username, '{name}' AS rule_name, '{a.value}' AS action "
                    f"FROM signups WHERE {where}"
                )
        else:
            parts.append(
                f"SELECT event_id, username, '{name}' AS rule_name FROM signups WHERE {where}"
            )
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# Expiry-sweep scenarios (§2.10 TTL; src/eventhandler.rs:428-487)
# ---------------------------------------------------------------------------
SWEEP_NOW = dt.datetime(2026, 1, 1, tzinfo=UTC)

# (name, expiry offset from SWEEP_NOW or None, exp_notification latch) —
# one row per branch combination of the sweep state machine, including the
# warn+deleted double-yield and the no-expiry skip.
SWEEP_SCENARIOS: list[tuple[str, dt.timedelta | None, int]] = [
    ("s_far", dt.timedelta(days=30), 0),
    ("s_warn", dt.timedelta(hours=12), 0),
    ("s_warn_latched", dt.timedelta(hours=12), 1),
    ("s_expired", dt.timedelta(hours=-1), 1),
    ("s_expired_relatch", dt.timedelta(hours=-1), 2),
    ("s_warn_and_deleted", dt.timedelta(days=-4), 0),
    ("s_deleted_only", dt.timedelta(days=-4), 2),
    ("s_expired_and_deleted", dt.timedelta(days=-4), 1),
    ("s_noexpiry", None, 0),
]


def _sweep_ts(off: dt.timedelta | None) -> dt.datetime | None:
    return None if off is None else SWEEP_NOW + off


def sweep_scenarios_df(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("expiry", T.TimestampType(), True),
            T.StructField("exp_notification", T.IntegerType(), False),
        ]
    )
    rows = [
        (name, _sweep_ts(off).replace(tzinfo=None) if off is not None else None, latch)
        for name, off, latch in SWEEP_SCENARIOS
    ]
    return spark.createDataFrame(rows, schema)


def sweep_scenarios_values_sql() -> str:
    rows = ", ".join(
        "('{n}', {e}, {l})".format(
            n=name,
            e=(
                "CAST(NULL AS TIMESTAMP)"
                if off is None
                else "TIMESTAMP '{}'".format(_sweep_ts(off).strftime("%Y-%m-%d %H:%M:%S"))
            ),
            l=latch,
        )
        for name, off, latch in SWEEP_SCENARIOS
    )
    return f"(VALUES {rows}) AS r(name, expiry, latch)"
