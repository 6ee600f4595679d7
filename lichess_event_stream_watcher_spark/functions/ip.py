"""Native IP expressions — the scalar helpers the reference exposes to Lua.

Parity target: ``isInIpRange(ip, min, max)`` (src/lua.rs:85-101) — inclusive
on both ends (src/lua.rs:98). The reference compares parsed ``IpAddr``
values; we map dotted-quad IPv4 to a BIGINT with pure Catalyst expressions so
range checks stay inside whole-stage codegen (no Python), and range joins
against ip-range dimension tables (the GeoIP J2 pattern) can use Spark's
optimized range-join strategies.

Scale note: ``ip_to_num`` is 4 splits + arithmetic per row — codegen'd, no
shuffle, no UDF. At 100 TB this is the difference between a scan-speed
enrichment and a Python bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# One pattern BODY, three engines — with per-engine END anchors, because
# '$' does not mean the same thing everywhere (round-8 review finding):
# Java regex (Spark rlike) and Python re let '$' match BEFORE a final
# line terminator, so '1.2.3.4\n' passed both twins while DuckDB's RE2
# '$' (absolute end) and Rust std::net reject it — a three-way
# divergence on exactly the malformed-input class this gate exists for.
# Java gets '\z' (absolute end), Python gets '\Z' (its absolute end;
# Python has no '\z'), DuckDB keeps '$' (already absolute in RE2).
# `(0|[1-9]\d{0,2})` = no leading zeros, 1-3 digits; the <= 255 range
# check stays separate (299 still matches the regex).
_IPV4_BODY = r"^(0|[1-9]\d{0,2})(\.(0|[1-9]\d{0,2})){3}"
IPV4_PATTERN = _IPV4_BODY + "$"  # the DuckDB-oracle form
_IPV4_PATTERN_JAVA = _IPV4_BODY + r"\z"
_IPV4_PATTERN_PY = _IPV4_BODY + r"\Z"


def ip_to_num(ip: Column | str) -> Column:
    """Dotted-quad IPv4 string -> BIGINT (non-IPv4 -> NULL).

    Octet-RANGE validated, not just digit-count: without the <= 255
    check, '0.256.0.0' numifies to the same bigint as '1.0.0.0' and a
    malformed IP silently aliases to a valid address in range joins and
    rule predicates (round-7 review fix). Leading-zero octets
    ('01.2.3.4') are rejected too — the reference parses with Rust's
    std::net Ipv4Addr, which refuses leading zeros, so accepting them
    here would diverge on reference-exported isInIpRange rules fed
    malformed-but-regex-matching IPs (round-8 ADVICE fix). Semantics
    identical to :func:`ip_to_num_py` on every input — the two are
    differential-tested in tests/test_lua_compat.py."""
    col = F.col(ip) if isinstance(ip, str) else ip
    parts = F.split(col, r"\.")
    octets = [parts.getItem(i).cast("bigint") for i in range(4)]
    valid = col.rlike(_IPV4_PATTERN_JAVA)
    for o in octets:
        valid = valid & (o <= F.lit(255))
    num = (
        octets[0] * F.lit(16777216)
        + octets[1] * F.lit(65536)
        + octets[2] * F.lit(256)
        + octets[3]
    )
    return F.when(valid, num).otherwise(F.lit(None).cast("bigint"))


def is_in_ip_range(ip: Column | str, lo: str, hi: str) -> Column:
    """Inclusive [lo, hi] membership on the numeric form (src/lua.rs:85-101)."""
    n = ip_to_num(ip)
    return (n >= _lit_ip(lo)) & (n <= _lit_ip(hi))


def _lit_ip(ip: str) -> Column:
    parts = [int(p) for p in ip.split(".")]
    if len(parts) != 4 or any(p < 0 or p > 255 for p in parts):
        raise ValueError(f"not a dotted-quad IPv4 literal: {ip!r}")
    return F.lit(parts[0] * 16777216 + parts[1] * 65536 + parts[2] * 256 + parts[3])


_IPV4_RE = None


def ip_to_num_py(ip: str) -> int | None:
    """Driver/UDF-side twin of ip_to_num — same regex-then-range gate, so
    the Lua CODE path (isInIpRange) and the native Column path agree on
    EVERY input. A bare int() split would accept '+2'/' 3' octets the
    Column form rejects (round-7 review fix); both twins share
    _IPV4_BODY (with engine-correct absolute end anchors) so the
    leading-zero and trailing-newline rejections cannot drift."""
    global _IPV4_RE
    if _IPV4_RE is None:
        import re

        _IPV4_RE = re.compile(_IPV4_PATTERN_PY)
    if not isinstance(ip, str) or not _IPV4_RE.match(ip):
        return None
    parts = [int(p) for p in ip.split(".")]
    if any(p > 255 for p in parts):
        return None
    return parts[0] * 16777216 + parts[1] * 65536 + parts[2] * 256 + parts[3]
