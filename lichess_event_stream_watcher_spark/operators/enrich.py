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
    # (d) generic fallback: family + " " + major, device Other->Computer;
    # the (a)-(c) precedence chain is the shared _fast_paths_then (ONE
    # source of truth for the reference-mirroring order — round-7 review
    # fix: this function used to carry its own verbatim copy)
    client = F.lit("Other")
    for fam, pat in reversed(_BROWSERS):
        client = F.when(ua.rlike(pat), F.concat(F.lit(fam + " "), F.regexp_extract(ua, pat, 1))).otherwise(client)
    os_col = F.lit("Other")
    for fam, pat in reversed(_OSES):
        hit = F.regexp_extract(ua, pat, 1) if "(" in pat else F.lit("")
        val = F.when(hit != "", F.concat(F.lit(fam + " "), hit)).otherwise(F.lit(fam))
        os_col = F.when(ua.rlike(pat), val).otherwise(os_col)
    generic = _device_struct(F.lit("Computer"), os_col, client)

    return _fast_paths_then(ua, generic)


def enrich_device(df: DataFrame, ua_col: str = "user_agent", use_ua_parser: str = "auto") -> DataFrame:
    """P2: add the ``device`` struct column (src/eventhandler.rs:86-88).

    ``use_ua_parser`` selects the GENERIC fallback (reference path (d),
    src/event.rs:148-167); the three lichess fast paths always run in
    Catalyst ahead of it:

    - "auto": the real ``ua_parser`` package when importable, else the
      from-scratch uap engine (``functions/uap.py`` — the public
      regexes.yaml format and first-match-wins algorithm reimplemented,
      same move as the ``.mmdb`` reader). Path (d) is therefore always a
      real family+major parser; the environment only changes WHICH
      ruleset answers.
    - "builtin": pin the from-scratch engine (deterministic ruleset,
      used by differential tests).
    - "never": pin the legacy Catalyst regex chain (no Python stage at
      all — the zero-UDF plan shape).
    - "require": the real lib or ImportError.
    """
    if use_ua_parser not in ("auto", "builtin", "never", "require"):
        raise ValueError(f"unknown use_ua_parser: {use_ua_parser!r}")
    if use_ua_parser in ("auto", "require"):
        try:
            col = _device_info_ua_parser_column(F.col(ua_col))
            return df.withColumn("device", col)
        except ImportError:
            if use_ua_parser == "require":
                raise
            use_ua_parser = "builtin"
    if use_ua_parser == "builtin":
        return df.withColumn(
            "device", _device_info_uap_builtin_column(F.col(ua_col))
        )
    return df.withColumn("device", device_info_column(F.col(ua_col)))


def _device_info_uap_builtin_column(ua: Column) -> Column:
    """Generic fallback via the from-scratch uap engine (functions/uap.py):
    an Arrow-batched pandas UDF whose compiled ruleset is a process-wide
    singleton per executor. Fast paths (a)-(c) stay in Catalyst ahead of
    it, mirroring parse_user_agent's order (src/event.rs:169-177)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse(uas):
        from lichess_event_stream_watcher_spark.functions.uap import device_info

        out = {"device": [], "os": [], "client": []}
        for s in uas:
            device, os_s, client = device_info(s or "")
            out["device"].append(device)
            out["os"].append(os_s)
            out["client"].append(client)
        return pd.DataFrame(out)

    _parse.__annotations__ = {"uas": pd.Series, "return": pd.DataFrame}
    generic = pandas_udf("struct<device:string,os:string,client:string>")(_parse)(ua)
    return _fast_paths_then(ua, generic)


def _fast_paths_then(ua: Column, generic: Column) -> Column:
    """The shared (a)-(c) Catalyst fast-path chain with ``generic`` as the
    path-(d) fallback (src/event.rs:169-177 precedence)."""
    bot_ver = F.split(F.substring(ua, len(BOT_PREFIX) + 1, 2147483647), " ").getItem(0)
    bot = _device_struct(F.lit("Computer"), F.lit("Other"), F.concat(F.lit("lichess-bot "), bot_ver))
    mob = _device_struct(
        F.regexp_extract(ua, MOB_UA_RE, 6),
        F.concat(F.regexp_extract(ua, MOB_UA_RE, 4), F.lit(" "), F.regexp_extract(ua, MOB_UA_RE, 5)),
        F.concat(F.lit("Lichess Mobile "), F.regexp_extract(ua, MOB_UA_RE, 1)),
    )
    trim = _device_struct(
        F.regexp_extract(ua, MOB_UA_TRIM_RE, 4),
        F.concat(
            F.regexp_extract(ua, MOB_UA_TRIM_RE, 2),
            F.lit(" "),
            F.regexp_extract(ua, MOB_UA_TRIM_RE, 3),
        ),
        F.concat(F.lit("Lichess Mobile "), F.regexp_extract(ua, MOB_UA_TRIM_RE, 1)),
    )
    return (
        F.when(ua.isNull(), F.lit(None).cast("struct<device:string,os:string,client:string>"))
        .when(ua.startswith(BOT_PREFIX), bot)
        .when(ua.rlike(MOB_UA_RE), mob)
        .when(ua.rlike(MOB_UA_TRIM_RE), trim)
        .otherwise(generic)
    )


def _device_info_ua_parser_column(ua: Column) -> Column:
    """Generic fallback via the real ua-parser library (Arrow-batched UDF,
    library loaded once per executor); the three lichess fast paths stay in
    Catalyst ahead of it, mirroring parse_user_agent's order
    (src/event.rs:169-177). Raises ImportError when ua_parser is absent."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    import ua_parser  # noqa: F401 — gate: raise before building the plan

    def _parse(uas):
        from ua_parser import user_agent_parser

        out = {"device": [], "os": [], "client": []}
        for s in uas:
            p = user_agent_parser.Parse(s or "")
            fam = p["user_agent"]["family"]
            major = p["user_agent"]["major"]
            osfam = p["os"]["family"]
            osmajor = p["os"]["major"]
            dev = p["device"]["family"]
            # the reference rewrites device "Other" -> "Computer"
            # (src/event.rs:148-153) and formats "<family> <major>"
            out["device"].append("Computer" if dev == "Other" else dev)
            out["os"].append(osfam if not osmajor else f"{osfam} {osmajor}")
            out["client"].append(fam if not major else f"{fam} {major}")
        return pd.DataFrame(out)

    _parse.__annotations__ = {"uas": pd.Series, "return": pd.DataFrame}
    generic = pandas_udf("struct<device:string,os:string,client:string>")(_parse)(ua)
    return _fast_paths_then(ua, generic)


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


def maxmind_geoip_udf(mmdb_bytes: bytes):
    """Faithful per-row variant: point lookups against the .mmdb search tree
    (src/eventhandler.rs:44-45,72-84), via the dependency-free reader in
    functions/mmdb.py. The database bytes ship once per executor inside the
    UDF closure; each Arrow batch walks the tree in-process.

    The banded range join (``enrich_geoip_banded`` fed by
    ``mmdb_to_range_df``) is still the preferred scale path — it keeps the
    lookup in codegen'd join code instead of Python. This UDF exists for
    parity and for ad-hoc use where converting the tree isn't worth it.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.ip import ip_to_num_py
    from ..functions.mmdb import MmdbReader, geoip_city_record

    reader_box: list[MmdbReader] = []

    # explicit __annotations__ with REAL classes: `from __future__ import
    # annotations` would leave strings that pandas_udf's type-hint
    # inference cannot resolve against this closure's locals
    def _lookup(ips):
        if not reader_box:  # construct once per executor process
            reader_box.append(MmdbReader(mmdb_bytes))
        reader = reader_box[0]
        out = {"country": [], "city": [], "subdivisions": []}
        for ip in ips:
            ipn = ip_to_num_py(ip) if ip is not None else None
            data = reader.lookup_ipv4(ipn) if ipn is not None else None
            country, city, subs = geoip_city_record(data) if data else (None, None, None)
            out["country"].append(country)
            out["city"].append(city)
            out["subdivisions"].append(subs)
        return pd.DataFrame(out)

    _lookup.__annotations__ = {"ips": pd.Series, "return": pd.DataFrame}
    return pandas_udf("struct<country:string,city:string,subdivisions:array<string>>")(_lookup)


def enrich_geoip_mmdb(df: DataFrame, mmdb_bytes: bytes, ip_col: str = "ip") -> DataFrame:
    """P1 via per-row mmdb lookups, with the same NULL-on-miss contract as
    the range join: a failed lookup leaves ``geoip`` NULL (not a struct of
    NULLs), matching src/eventhandler.rs:79-83."""
    raw = maxmind_geoip_udf(mmdb_bytes)(F.col(ip_col))
    return df.withColumn(
        "geoip",
        F.when(raw["country"].isNotNull() | raw["city"].isNotNull(), raw),
    )
