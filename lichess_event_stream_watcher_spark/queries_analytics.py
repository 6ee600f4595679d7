"""Analytics query family (SURVEY.md §2.2/2.4/2.5/2.6): enrichment,
stateful-aggregation batch twins, joins, windows, scalar-function suite, and
TPC-H-style headline queries over the driver tables.

Every query here registers a DuckDB oracle. Floating-point aggregates go
through DECIMAL so both engines sum exactly, then round+cast back to DOUBLE —
value hashes must be bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import fixtures, testdata
from .operators.enrich import enrich_device, enrich_geoip_banded
from .queries import ORACLES, _signups, query

_CTE = testdata.signups_cte("duckdb")


# ---------------------------------------------------------------------------
# P1/J2 — GeoIP enrichment as a broadcast range join
# ---------------------------------------------------------------------------
@query(
    "geoip_enrich",
    f"""{_CTE}
SELECT s.event_id, ranges.country, ranges.city
FROM (
  -- exact twin of functions/ip.py ip_to_num (IPV4_PATTERN): dotted-quad
  -- regex with no leading-zero octets + octet <= 255 gate, NULL
  -- otherwise (a malformed IP must not alias to a valid address on
  -- either engine; Rust std::net rejects '01.2.3.4' too)
  SELECT event_id,
         CASE WHEN regexp_matches(ip, '^(0|[1-9]\\d{{0,2}})(\\.(0|[1-9]\\d{{0,2}})){{3}}$')
               AND TRY_CAST(split_part(ip, '.', 1) AS BIGINT) <= 255
               AND TRY_CAST(split_part(ip, '.', 2) AS BIGINT) <= 255
               AND TRY_CAST(split_part(ip, '.', 3) AS BIGINT) <= 255
               AND TRY_CAST(split_part(ip, '.', 4) AS BIGINT) <= 255
         THEN TRY_CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
            + TRY_CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
            + TRY_CAST(split_part(ip, '.', 3) AS BIGINT) * 256
            + TRY_CAST(split_part(ip, '.', 4) AS BIGINT)
         END AS ipn
  FROM signups
) s
LEFT JOIN {fixtures.geoip_ranges_values_sql()}
  ON s.ipn BETWEEN ranges.lo AND ranges.hi""",
)
def geoip_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: ip -> geoip struct via broadcast point-in-range join; rows with no
    covering range keep geoip NULL (src/eventhandler.rs:79-83)."""
    df = _signups(spark, sf_dir)
    out = enrich_geoip_banded(df, fixtures.geoip_ranges_df(spark))
    return out.select(
        "event_id",
        F.col("geoip.country").alias("country"),
        F.col("geoip.city").alias("city"),
    )


# ---------------------------------------------------------------------------
# P2 — device/user-agent enrichment (regex fast paths + generic fallback)
# ---------------------------------------------------------------------------
_MOB = r"(?i)lichess mobile/(\S+)(?: \(\d*\))? as:(\S+) sri:(\S+) os:(Android|iOS)/(\S+) dev:(.*)"
_TRIM = r"LM/(\S+) (Android|iOS)/(\S+) (.*)"

_DEVICE_ORACLE = f"""{_CTE}
SELECT event_id,
  CASE WHEN user_agent IS NULL THEN NULL
       WHEN starts_with(user_agent, 'lichess-bot/') THEN 'Computer'
       WHEN regexp_matches(user_agent, '{_MOB}') THEN regexp_extract(user_agent, '{_MOB}', 6)
       WHEN regexp_matches(user_agent, '{_TRIM}') THEN regexp_extract(user_agent, '{_TRIM}', 4)
       ELSE 'Computer' END AS device,
  CASE WHEN user_agent IS NULL THEN NULL
       WHEN starts_with(user_agent, 'lichess-bot/') THEN 'Other'
       WHEN regexp_matches(user_agent, '{_MOB}')
         THEN regexp_extract(user_agent, '{_MOB}', 4) || ' ' || regexp_extract(user_agent, '{_MOB}', 5)
       WHEN regexp_matches(user_agent, '{_TRIM}')
         THEN regexp_extract(user_agent, '{_TRIM}', 2) || ' ' || regexp_extract(user_agent, '{_TRIM}', 3)
       WHEN regexp_matches(user_agent, 'Windows NT (\\d+)')
         THEN 'Windows ' || regexp_extract(user_agent, 'Windows NT (\\d+)', 1)
       WHEN regexp_matches(user_agent, 'Mac OS X (\\d+)')
         THEN 'Mac OS X ' || regexp_extract(user_agent, 'Mac OS X (\\d+)', 1)
       WHEN regexp_matches(user_agent, 'Android (\\d+)')
         THEN 'Android ' || regexp_extract(user_agent, 'Android (\\d+)', 1)
       WHEN regexp_matches(user_agent, 'iPhone OS (\\d+)')
         THEN 'iOS ' || regexp_extract(user_agent, 'iPhone OS (\\d+)', 1)
       WHEN regexp_matches(user_agent, 'Linux') THEN 'Linux'
       ELSE 'Other' END AS os,
  CASE WHEN user_agent IS NULL THEN NULL
       WHEN starts_with(user_agent, 'lichess-bot/')
         THEN 'lichess-bot ' || split_part(substr(user_agent, 13), ' ', 1)
       WHEN regexp_matches(user_agent, '{_MOB}')
         THEN 'Lichess Mobile ' || regexp_extract(user_agent, '{_MOB}', 1)
       WHEN regexp_matches(user_agent, '{_TRIM}')
         THEN 'Lichess Mobile ' || regexp_extract(user_agent, '{_TRIM}', 1)
       WHEN regexp_matches(user_agent, 'Firefox/(\\d+)')
         THEN 'Firefox ' || regexp_extract(user_agent, 'Firefox/(\\d+)', 1)
       WHEN regexp_matches(user_agent, 'Edg/(\\d+)')
         THEN 'Edge ' || regexp_extract(user_agent, 'Edg/(\\d+)', 1)
       WHEN regexp_matches(user_agent, 'Chrome/(\\d+)')
         THEN 'Chrome ' || regexp_extract(user_agent, 'Chrome/(\\d+)', 1)
       WHEN regexp_matches(user_agent, 'Version/(\\d+).*Safari')
         THEN 'Safari ' || regexp_extract(user_agent, 'Version/(\\d+).*Safari', 1)
       WHEN regexp_matches(user_agent, 'curl/(\\d+)')
         THEN 'curl ' || regexp_extract(user_agent, 'curl/(\\d+)', 1)
       ELSE 'Other' END AS client
FROM signups"""


@query("device_enrich", _DEVICE_ORACLE)
def device_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: UA -> DeviceInfo via the fast-path-then-fallback when/otherwise
    chain (src/event.rs:104-177); NULL UA -> NULL fields."""
    df = _signups(spark, sf_dir)
    out = enrich_device(df)
    return out.select(
        "event_id",
        F.col("device.device").alias("device"),
        F.col("device.os").alias("os"),
        F.col("device.client").alias("client"),
    )


# ---------------------------------------------------------------------------
# A1/A2 — per-rule lifetime stats as a grouped aggregation batch twin
# ---------------------------------------------------------------------------
@query(
    "match_stats",
    """SELECT event_type AS rule_name, COUNT(*) AS match_count, MAX(ts) AS latest_match_date
FROM events GROUP BY event_type""",
)
def match_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2 (src/signup/rules.rs:151-152): lifetime count + max event-time
    per key. Partial aggregation (map-side combine) makes this one shuffle of
    pre-aggregated partials — constant-size state per key at any scale."""
    ev = testdata.load(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("rule_name")).agg(
        F.count("*").alias("match_count"),
        F.max("ts").alias("latest_match_date"),
    )


# ---------------------------------------------------------------------------
# A3/W3 — bounded top-k by recency (last-3 distinct users per key)
# ---------------------------------------------------------------------------
@query(
    "last3_caught",
    """SELECT event_type, user_id FROM (
  SELECT event_type, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY last_ts DESC, user_id DESC) AS rn
  FROM (SELECT event_type, user_id, MAX(ts) AS last_ts FROM events GROUP BY event_type, user_id)
) WHERE rn <= 3""",
)
def last3_caught(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (src/signup/rules.rs:153-158): last-3 DISTINCT users per rule by
    recency. Batch twin: per-(key,user) max(ts), then threshold-pruned
    descending top-3 (operators/sketch.py:grouped_topk_threshold) — the
    rank window runs over ~O(k) survivors, so one hot rule at 10^9
    distinct users never concentrates its whole per-user table in one
    task. Dedup-before-rank mirrors the reference's duplicate
    short-circuit."""
    from .operators.sketch import grouped_topk_threshold

    ev = testdata.load(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(F.max("ts").alias("last_ts"))
    return grouped_topk_threshold(
        per_user, "event_type", ["last_ts", "user_id"], 3, descending=True
    ).select("event_type", "user_id")


@query(
    "sessionize",
    """WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
         ) AS session_no
  FROM gaps
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_no""",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap): lag + cumulative-sum
    session numbering, then per-session aggregates. One shuffle on user_id
    serves the lag window, the numbering window AND the final group-by (all
    three share the partitioning, so Catalyst reuses the exchange); at scale
    this is the standard sessionization shape for clickstream/training-log
    data. Streaming twin: ``F.session_window(ts, '30 minutes')``."""
    ev = testdata.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    numbered = ev.select(
        "user_id",
        "ts",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("session_no"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@query(
    "asof_join_orders",
    """WITH ranked AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, ts,
       o_orderkey AS asof_orderkey, o_totalprice AS asof_totalprice
FROM ranked WHERE rn = 1""",
)
def asof_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the latest order of the same key at or
    before its timestamp (ties on o_orderdate broken by highest o_orderkey).

    Implemented as the single-shuffle union-and-window as-of join: tag both
    inputs, sort within key by (time, side, orderkey), carry the last order
    struct forward with last(ignorenulls) — ONE exchange on the key, no
    join fan-out (a join+filter+rank shape would materialize every
    (event x earlier-order) pair before pruning; this never does)."""
    ev = testdata.load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),  # events sort AFTER orders at equal t (<=)
        "event_id",
        "ts",
        F.lit(None).cast(
            "struct<asof_orderkey:bigint,asof_totalprice:double>"
        ).alias("ostruct"),
    )
    orders = testdata.load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct(
            F.col("o_orderkey").alias("asof_orderkey"),
            F.col("o_totalprice").alias("asof_totalprice"),
        ).alias("ostruct"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side", F.col("ostruct.asof_orderkey").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.unionByName(orders)
        .select(
            "side",
            "event_id",
            F.col("k").alias("user_id"),
            "ts",
            F.last("ostruct", ignorenulls=True).over(w).alias("o"),
        )
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o.asof_orderkey").alias("asof_orderkey"),
            F.col("o.asof_totalprice").alias("asof_totalprice"),
        )
    )


@query(
    "topk_recent_events",
    """SELECT user_id, event_id, rn FROM (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn <= 3""",
)
def topk_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: bounded top-k by recency per user (rank <= 3)."""
    ev = testdata.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "rn")
    )


# ---------------------------------------------------------------------------
# W1/A4/A5 — the 10K sliding count window + per-user history (batch twin)
# ---------------------------------------------------------------------------
@query(
    "seen_window_counts",
    """SELECT user_id, COUNT(*) AS n_seen, MAX(event_id) AS last_event_id
FROM events
WHERE event_id > (SELECT MAX(event_id) - 10000 FROM events)
GROUP BY user_id""",
)
def seen_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+A4+A5 (src/eventhandler.rs:92-113,418): the last-10,000-events
    window grouped per user. Batch twin of the count-based sliding window;
    the streaming form lives in streaming/state.py."""
    ev = testdata.load(spark, sf_dir, "events")
    cutoff = ev.agg(F.max("event_id").alias("mx")).select((F.col("mx") - 10000).alias("cut"))
    return (
        ev.join(F.broadcast(cutoff), on=ev["event_id"] > cutoff["cut"])
        .groupBy("user_id")
        .agg(F.count("*").alias("n_seen"), F.max("event_id").alias("last_event_id"))
    )


# ---------------------------------------------------------------------------
# J3 — notification dedup as a left-anti join
# ---------------------------------------------------------------------------
@query(
    "notify_dedup_anti",
    f"""{_CTE},
matches AS (SELECT event_id, username FROM signups
            WHERE instr(upper(email), 'GMAIL') > 0),
notified AS (SELECT DISTINCT username FROM signups WHERE event_id % 13 = 0)
SELECT m.event_id, m.username FROM matches m
WHERE NOT EXISTS (SELECT 1 FROM notified n WHERE n.username = m.username)""",
)
def notify_dedup_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/W2 (src/eventhandler.rs:196-214): suppress notifications for users
    already in the notified set — a broadcast left-ANTI join (the notified
    set is bounded at 2,000 keys, so it always broadcasts)."""
    s = _signups(spark, sf_dir)
    matches = s.filter(F.upper("email").contains("GMAIL")).select("event_id", "username")
    notified = s.filter(F.col("event_id") % 13 == 0).select("username").distinct()
    return matches.join(F.broadcast(notified), "username", "left_anti").select(
        "event_id", "username"
    )


# ---------------------------------------------------------------------------
# J4 — `seen` lookup: left-semi existence + row retrieval
# ---------------------------------------------------------------------------
@query(
    "seen_lookup_semi",
    f"""{_CTE},
wanted AS (SELECT DISTINCT username FROM signups WHERE event_id % 97 = 0)
SELECT s.event_id, s.username, s.ip FROM signups s
WHERE EXISTS (SELECT 1 FROM wanted w WHERE w.username = s.username)""",
)
def seen_lookup_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 (src/eventhandler.rs:407-427): 'has user X been seen?' — semi-join
    the event window against the queried names, returning their rows."""
    s = _signups(spark, sf_dir)
    wanted = s.filter(F.col("event_id") % 97 == 0).select("username").distinct()
    return s.join(F.broadcast(wanted), "username", "left_semi").select(
        "event_id", "username", "ip"
    )


# ---------------------------------------------------------------------------
# W2 — keyed dedup, deterministic dropDuplicates twin
# ---------------------------------------------------------------------------
@query(
    "first_event_per_user",
    """SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1""",
)
def first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: keyed dedup keeping the FIRST row per key — the deterministic twin
    of dropDuplicates (which keeps an arbitrary row)."""
    ev = testdata.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Scalar-function suite (SURVEY.md §2.9)
# ---------------------------------------------------------------------------
@query(
    "scalar_suite",
    """SELECT c_custkey,
  lower(c_name) AS lname, upper(c_mktsegment) AS useg,
  length(c_name) AS name_len,
  split_part(c_name, '#', 2) AS name_num,
  trim('  ' || c_name || ' ') AS trimmed,
  c_name || '/' || c_mktsegment AS joined,
  starts_with(c_name, 'Customer') AS is_cust,
  CAST(split_part(c_name, '#', 2) AS BIGINT) AS parsed_num,
  contains(c_name, '9') AS has_nine
FROM customer""",
)
def scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar function inventory (§2.9): lower/upper/length/
    split/trim/concat/startswith/int-parse/contains — all JVM builtins."""
    c = testdata.load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("joined"),
        F.col("c_name").startswith("Customer").alias("is_cust"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).cast("bigint").alias("parsed_num"),
        F.col("c_name").contains("9").alias("has_nine"),
    )


@query(
    "scalar_encoding",
    f"""{_CTE}
SELECT event_id,
  base64(encode(email)) AS email_b64,
  replace(email, '@', '%40') AS email_urlenc,
  md5(email) AS email_md5
FROM signups WHERE event_id % 7 = 0""",
)
def scalar_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding scalar surface (§2.9): base64 (src/zulip/rtm.rs:43,87),
    url-encode (src/zulip/web.rs:41-45), md5. Spark's url_encode is
    form-encoding; the fixture email charset (letters/digits/@/.) makes the
    oracle a single %40 replace."""
    s = _signups(spark, sf_dir).filter(F.col("event_id") % 7 == 0)
    return s.select(
        "event_id",
        F.base64(F.encode(F.col("email"), "UTF-8")).alias("email_b64"),
        F.url_encode(F.col("email")).alias("email_urlenc"),
        F.md5(F.col("email")).alias("email_md5"),
    )


@query(
    "date_functions",
    """SELECT event_id,
  strftime(ts, '%d/%m/%Y %H:%M:%S') AS formatted,
  CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
  CAST(dayofmonth(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
  ts + INTERVAL 3 DAY AS plus3d,
  ts + INTERVAL 2 WEEK AS plus2w
FROM events WHERE event_id % 101 = 0""",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface (§2.9): the reference's %d/%m/%Y %T format
    (src/eventhandler.rs:399), day/week interval arithmetic
    (src/zulip/command.rs:256-259)."""
    ev = testdata.load(spark, sf_dir, "events").filter(F.col("event_id") % 101 == 0)
    return ev.select(
        "event_id",
        F.date_format("ts", "dd/MM/yyyy HH:mm:ss").alias("formatted"),
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
        (F.col("ts") + F.expr("INTERVAL 3 DAY")).alias("plus3d"),
        (F.col("ts") + F.expr("INTERVAL 2 WEEK")).alias("plus2w"),
    )


@query(
    "set_ops",
    f"""{_CTE},
susp AS (SELECT DISTINCT split_part(email, '@', 2) AS domain FROM signups WHERE susp_ip),
clean AS (SELECT DISTINCT split_part(email, '@', 2) AS domain FROM signups WHERE NOT susp_ip)
SELECT domain, 'both' AS tag FROM (SELECT domain FROM susp INTERSECT SELECT domain FROM clean)
UNION ALL
SELECT domain, 'susp_only' AS tag FROM (SELECT domain FROM susp EXCEPT SELECT domain FROM clean)""",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (§2.6 — absent in the reference, built-in here):
    email domains of suspicious vs clean signups via INTERSECT / EXCEPT."""
    s = _signups(spark, sf_dir)
    domain = F.split_part(F.col("email"), F.lit("@"), F.lit(2)).alias("domain")
    susp = s.filter(F.col("susp_ip")).select(domain).distinct()
    clean = s.filter(~F.col("susp_ip")).select(domain).distinct()
    both = susp.intersect(clean).select("domain", F.lit("both").alias("tag"))
    only = susp.exceptAll(clean).distinct().select(
        "domain", F.lit("susp_only").alias("tag")
    )
    return both.unionAll(only)


@query(
    "json_extract_props",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events WHERE event_type = 'signup'""",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parse surface (§2.9: from_json/get_json_object): extract the
    props payload — the filter pushes to the parquet scan, the JSON parse
    happens post-filter only."""
    ev = testdata.load(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


# ---------------------------------------------------------------------------
# TPC-H-style headline aggregations/joins (free-in-Spark rows of §2.4/2.5)
# ---------------------------------------------------------------------------
@query(
    "tpch_q1_pricing",
    """SELECT l_returnflag, l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: partial-agg shuffle on 2 low-cardinality
    keys; decimal-exact sums rounded to double for cross-engine hashing."""
    li = testdata.load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(price * (F.lit(1) - disc)), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)), 2)
            .cast("double")
            .alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "rollup_pricing",
    """SELECT
  COALESCE(l_returnflag, 'ALL') AS rflag,
  COALESCE(l_linestatus, 'ALL') AS lstatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets surface (§2.5 — absent in the reference, built-in
    here): ROLLUP over (returnflag, linestatus) with subtotal and grand
    total rows; one shuffle, grouping-set expansion map-side."""
    li = testdata.load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "sum_qty",
            "n",
        )
    )


@query(
    "tpch_q3_revenue",
    """SELECT c.c_mktsegment,
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c.c_mktsegment""",
)
def tpch_q3_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-style star join: customer (tiny) broadcasts into orders, the
    orders->lineitem join shuffles on orderkey; revenue decimal-exact."""
    c = testdata.load(spark, sf_dir, "customer")
    o = testdata.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = testdata.load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(price * (F.lit(1) - disc)), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q5_region_revenue",
    """SELECT r.r_name, n.n_name,
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY r.r_name, n.n_name""",
)
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style snowflake: region->nation->customer all broadcast (dims), so
    the only shuffle is orders<->lineitem on orderkey."""
    r = testdata.load(spark, sf_dir, "region")
    n = testdata.load(spark, sf_dir, "nation")
    c = testdata.load(spark, sf_dir, "customer")
    o = testdata.load(spark, sf_dir, "orders")
    li = testdata.load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    dims = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(dims), o["o_custkey"] == dims["c_custkey"])
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(price * (F.lit(1) - disc)), 2).cast("double").alias("revenue"))
    )


@query(
    "tpch_q6_forecast_revenue",
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-03-01 00:00:00' AND l_shipdate < TIMESTAMP '2001-03-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-style scan-only aggregate: every predicate (date range, discount
    band, quantity cap) pushes to the parquet scan — at 100 TB this is the
    row-group-pruning showcase, zero joins, one partial-agg shuffle of a
    single row per task."""
    li = testdata.load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("2000-03-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2001-03-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(price * disc), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q4_priority",
    """SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '2000-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority""",
)
def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-style EXISTS: left-semi join on orderkey with a non-equi residual
    (ship date > order date + 30 d, the late-shipment proxy for the
    reference-less commit/receipt columns). The date filter prunes orders
    at the scan; the semi join shuffles both sides on orderkey ONCE and
    emits each order at most once — no post-join dedup needed."""
    o = testdata.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-10-01 00:00:00").cast("timestamp"))
    )
    li = testdata.load(spark, sf_dir, "lineitem")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q7_volume_shipping",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name <> n2.n_name
  AND l.l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-style cross-nation volume: nation plays TWO roles (supplier side,
    customer side) — both broadcast, as do supplier and customer; the only
    shuffle is the lineitem<->orders orderkey join + the final agg. The
    cross-nation inequality applies post-broadcast, map-side."""
    li = testdata.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    s = testdata.load(spark, sf_dir, "supplier")
    o = testdata.load(spark, sf_dir, "orders")
    c = testdata.load(spark, sf_dir, "customer")
    n = testdata.load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    sup = s.join(F.broadcast(n1), s["s_nationkey"] == n1["n1_key"]).select(
        "s_suppkey", "supp_nation"
    )
    cust = c.join(F.broadcast(n2), c["c_nationkey"] == n2["n2_key"]).select(
        "c_custkey", "cust_nation"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(F.round(F.sum(price * (F.lit(1) - disc)), 2).cast("double").alias("revenue"))
    )


@query(
    "cube_pricing",
    """SELECT
  COALESCE(l_returnflag, 'ALL') AS rflag,
  COALESCE(l_linestatus, 'ALL') AS lstatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
  COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with the grouping id exposed —
    all four grouping sets in one shuffle (set expansion is map-side, so
    partial aggregation still combines before the exchange)."""
    li = testdata.load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
            F.count("*").alias("n"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "gid",
            "sum_price",
            "n",
        )
    )


@query(
    "window_suite",
    """SELECT event_id, user_id,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
  CAST(RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS type_rank,
  CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS type_dense_rank,
  LAG(event_id) OVER w AS prev_event_id,
  LEAD(event_id) OVER w AS next_event_id,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ), 2) AS DOUBLE) AS running_value,
  CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS user_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window surface in one query: row_number / rank /
    dense_rank / lag / lead / running DECIMAL sum / partition count, all
    sharing one user_id exchange (Catalyst collapses same-partitioning
    window specs into one shuffle + sorts)."""
    ev = testdata.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("user_id").orderBy("event_type")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(wt).cast("bigint").alias("type_rank"),
        F.dense_rank().over(wt).cast("bigint").alias("type_dense_rank"),
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        )
        .cast("double")
        .alias("running_value"),
        F.count("*")
        .over(Window.partitionBy("user_id"))
        .cast("bigint")
        .alias("user_n"),
    )


@query(
    "percentiles_exact",
    """SELECT event_type,
  CAST(ROUND(quantile_cont(value, 0.5), 6) AS DOUBLE) AS p50,
  CAST(ROUND(quantile_cont(value, 0.9), 6) AS DOUBLE) AS p90,
  CAST(ROUND(quantile_cont(value, 0.99), 6) AS DOUBLE) AS p99
FROM events GROUP BY event_type""",
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (the ORDER-STATISTIC agg;
    both engines use the standard p*(n-1) linear interpolation). Exact
    percentile buffers all group values — the scale path is the GK sketch
    in `sketch_error_bounds` (percentile_approx); this pins their agreement."""
    ev = testdata.load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9D)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99D)"), 6).alias("p99"),
    )


_MAX_ORDER_SQL = """SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice = (
  SELECT MAX(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)"""


@query("max_order_per_cust_subquery", _MAX_ORDER_SQL)
def max_order_per_cust_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL front end — Catalyst
    decorrelates it into an aggregate + join (one shuffle on o_custkey),
    not a per-row re-scan; the identical text runs on both engines."""
    testdata.load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_MAX_ORDER_SQL)


@query(
    "unpivot_measures",
    """SELECT l_orderkey, l_linenumber, measure,
       CAST(ROUND(CAST(val AS DECIMAL(18,2)), 2) AS DOUBLE) AS val
FROM lineitem
UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount))""",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT of the lineitem measures — a per-row generator
    (3 output rows per input, no shuffle); the long form feeds generic
    per-measure aggregation downstream."""
    li = testdata.load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "raw_val",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        F.round(F.col("raw_val").cast("decimal(18,2)"), 2).cast("double").alias("val"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_counts",
    "SELECT user_id,\n"
    + ",\n".join(
        f"  COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}"
        for t in _EVENT_TYPES
    )
    + "\nFROM events GROUP BY user_id",
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide PIVOT: per-user counts by event type. With the pivot
    values enumerated, Spark plans it as ONE aggregation with five
    conditional counts (same shape as the CASE oracle) — no second pass to
    discover values, one shuffle with map-side combine."""
    ev = testdata.load(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}") for t in _EVENT_TYPES],
    )


# ---------------------------------------------------------------------------
# TPC-H-style q8/q9/q10/q14/q19 — wider join/predicate coverage (§2.4/§2.5
# beyond-reference analytics; all dims broadcast, lineitem<->orders is the
# only shuffle anywhere in the family)
# ---------------------------------------------------------------------------
@query(
    "tpch_q8_market_share",
    """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
  CAST(ROUND(
    SUM(CASE WHEN n1.n_name = 'NATION_3'
        THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        ELSE 0 END)
    / SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))),
  6) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n2.n_regionkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
GROUP BY year(o.o_orderdate)""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-style national market share: the share of ASIA-region ECONOMY-part
    order volume supplied by NATION_3, per order year. Seven-table join in
    which every dim (part filter, supplier+nation, customer+nation+region)
    broadcasts; the single shuffle is lineitem<->orders on orderkey, then a
    one-row-per-year agg. The share is a conditional-sum ratio computed in
    the same partial agg — no second pass over the data."""
    li = testdata.load(spark, sf_dir, "lineitem")
    p = testdata.load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = testdata.load(spark, sf_dir, "supplier")
    o = testdata.load(spark, sf_dir, "orders")
    c = testdata.load(spark, sf_dir, "customer")
    n = testdata.load(spark, sf_dir, "nation")
    r = testdata.load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sup = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    cust = (
        c.join(
            F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    vol = price * (F.lit(1) - disc)
    return (
        li.join(F.broadcast(p.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(sup), li["l_suppkey"] == F.col("s_suppkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cust), o["o_custkey"] == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0)))
                / F.sum(vol),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


@query(
    "tpch_q9_profit",
    """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
  CAST(ROUND(SUM(
    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
    - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(0.4 AS DECIMAL(18,2))
  ), 2) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%rod%'
GROUP BY n.n_name, year(o.o_orderdate)""",
)
def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-style product-type profit by supplier nation and year. The testdata
    has no partsupp table, so supply cost is proxied as 40% of
    p_retailprice (documented adaptation, deterministic and decimal-exact).
    part (name-filtered) and supplier+nation broadcast; lineitem<->orders
    shuffles once on orderkey; profit folds into one partial agg."""
    li = testdata.load(spark, sf_dir, "lineitem")
    p = testdata.load(spark, sf_dir, "part").filter(F.col("p_name").like("%rod%"))
    s = testdata.load(spark, sf_dir, "supplier")
    o = testdata.load(spark, sf_dir, "orders")
    n = testdata.load(spark, sf_dir, "nation")
    sup = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    retail = F.col("p_retailprice").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    profit = price * (F.lit(1) - disc) - retail * qty * F.lit(0.4).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(sup), li["l_suppkey"] == F.col("s_suppkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


@query(
    "tpch_q10_returned_items",
    """SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-style returned-item report: top-20 customers by lost revenue in a
    two-quarter window. The returnflag + date filters prune at the scans;
    customer+nation broadcast; one orderkey shuffle + one groupBy shuffle;
    the top-20 is a TakeOrdered (no global sort materialization). Tie-broken
    on custkey so the row SET is deterministic."""
    c = testdata.load(spark, sf_dir, "customer")
    o = testdata.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-07-01 00:00:00").cast("timestamp"))
    )
    li = testdata.load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = testdata.load(spark, sf_dir, "nation")
    cn = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cn), o["o_custkey"] == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(price * (F.lit(1) - disc)), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q14_promo_effect",
    """SELECT
  CAST(ROUND(
    100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
        THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        ELSE 0 END)
    / SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))),
  6) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '2000-05-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '2000-06-01 00:00:00'""",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-style promo effect: percent of one month's revenue from PROMO
    parts. Date range prunes the lineitem scan (row-group pruning at 100 TB);
    part broadcasts; conditional-sum ratio in ONE partial agg — the whole
    query is map-side until the final single-row combine."""
    li = testdata.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-05-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-06-01 00:00:00").cast("timestamp"))
    )
    p = testdata.load(spark, sf_dir, "part").select("p_partkey", "p_type")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    vol = price * (F.lit(1) - disc)
    return (
        li.join(F.broadcast(p), li["l_partkey"] == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
                / F.sum(vol),
                6,
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q19_bracket_revenue",
    """SELECT
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)""",
)
def tpch_q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-style disjunctive bracket predicate: three (brand, size, quantity)
    conjunctions OR'd across the lineitem x part join. The part side of the
    disjunction (brand IN, size <= max) is pushed below the broadcast join
    so the build side only holds qualifying parts; the mixed l x p residual
    evaluates map-side post-join. Zero shuffles before the single-row agg."""
    li = testdata.load(spark, sf_dir, "lineitem")
    p = testdata.load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 30))
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(price * (F.lit(1) - disc)), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H-style q13/q15/q17/q18/q22 — outer-join histogram, max-of-agg,
# windowed correlated predicate, HAVING join, anti-join + global scalar.
# Cross-engine float hazards avoided throughout: correlated averages are
# rewritten as exact decimal cross-multiplications (qty*cnt*5 < sum instead
# of qty < 0.2*avg), and the one true division quantizes via floor.
# ---------------------------------------------------------------------------
@query(
    "tpch_q13_custdist",
    """SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'F'
  GROUP BY c.c_custkey
) t
GROUP BY c_count""",
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-style customer order-count distribution. The status filter lives
    in the JOIN CONDITION, not a WHERE — customers whose orders are all
    filtered out must still appear with count 0. Orders shuffle on custkey
    once; the histogram re-agg is a second tiny shuffle on the count."""
    c = testdata.load(spark, sf_dir, "customer")
    o = testdata.load(spark, sf_dir, "orders")
    joined = c.join(
        o, (o["o_custkey"] == c["c_custkey"]) & (o["o_orderstatus"] != "F"), "left"
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "tpch_q15_top_supplier",
    """WITH rev AS (
  SELECT l_suppkey,
    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-style top supplier: revenue per supplier over a ship window, then
    keep the max (ties included). The max is a 1-row broadcast joined back
    on the ROUNDED revenue — rounding first makes the equality exact in
    both engines. One suppkey shuffle; supplier dim broadcasts."""
    li = testdata.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    s = testdata.load(spark, sf_dir, "supplier")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(price * (F.lit(1) - disc)), 2).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17_small_qty_loss",
    """SELECT
  CAST(floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 * 100.0) / 100.0 AS DOUBLE) AS avg_yearly,
  COUNT(*) AS n_items
FROM (
  SELECT l.l_extendedprice,
    CAST(l.l_quantity AS DECIMAL(18,2)) AS qty,
    SUM(CAST(l.l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l.l_partkey) AS sum_qty,
    COUNT(*) OVER (PARTITION BY l.l_partkey) AS cnt
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#5'
) t
WHERE qty * cnt * 5 < sum_qty""",
)
def tpch_q17_small_qty_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-style small-quantity revenue loss. The correlated per-part
    average becomes a window over l_partkey (ONE exchange) and the
    avg-fifth comparison cross-multiplies to exact decimals
    (qty*cnt*5 < sum) — no float division anywhere until the final
    floor-quantized yearly average."""
    from pyspark.sql import Window

    li = testdata.load(spark, sf_dir, "lineitem")
    p = testdata.load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    w = Window.partitionBy("l_partkey")
    t = (
        li.join(F.broadcast(p.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .select(
            "l_extendedprice",
            qty.alias("qty"),
            F.sum(qty).over(w).alias("sum_qty"),
            F.count("*").over(w).alias("cnt"),
        )
        .filter(F.col("qty") * F.col("cnt") * F.lit(5) < F.col("sum_qty"))
    )
    return t.agg(
        (
            F.floor(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
                * F.lit(100.0)
            )
            / F.lit(100.0)
        )
        .cast("double")
        .alias("avg_yearly"),
        F.count("*").alias("n_items"),
    )


@query(
    "tpch_q18_large_orders",
    """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
  CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(ROUND(t.sum_qty, 2) AS DOUBLE) AS sum_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
) t
JOIN orders o ON o.o_orderkey = t.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-style large-volume orders: HAVING on the per-order quantity sum
    (exact decimal compare), then orders join on the already-orderkey-
    partitioned agg output (shuffle reused) and a broadcast customer dim."""
    li = testdata.load(spark, sf_dir, "lineitem")
    o = testdata.load(spark, sf_dir, "orders")
    c = testdata.load(spark, sf_dir, "customer")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    t = li.groupBy("l_orderkey").agg(F.sum(qty).alias("_sq")).filter(F.col("_sq") > 250)
    return (
        t.join(o, t["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.round(F.col("_sq"), 2).cast("double").alias("sum_qty"),
        )
    )


@query(
    "tpch_q22_idle_balances",
    """WITH cohort AS (SELECT * FROM customer WHERE c_acctbal > 0),
stats AS (
  SELECT COUNT(*) AS cnt, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tot FROM cohort
)
SELECT c.c_nationkey, COUNT(*) AS n_cust,
  CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
FROM cohort c, stats
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * stats.cnt > stats.tot
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c.c_nationkey""",
)
def tpch_q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-style idle high balances: positive-balance customers above the
    cohort average (exact decimal cross-multiply: bal*cnt > tot, avoiding
    float averaging) with no recent orders (left-anti join), grouped by
    nation. The 1-row stats broadcast; the anti join shuffles on custkey."""
    c = testdata.load(spark, sf_dir, "customer")
    o = testdata.load(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    cohort = c.filter(F.col("c_acctbal") > 0)
    stats = cohort.agg(F.count("*").alias("_cnt"), F.sum(bal).alias("_tot"))
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return (
        cohort.crossJoin(F.broadcast(stats))
        .filter(bal * F.col("_cnt") > F.col("_tot"))
        .join(recent, cohort["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum(bal), 2).cast("double").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H-style q2/q11/q12/q16/q20/q21 — the remaining six, completing 22/22.
# No partsupp table exists in the driver schema, so the part<->supplier
# relation is derived from lineitem (min observed price = supply cost); no
# commit/receipt dates exist, so "late" is l_shipdate > o_orderdate + N days.
# Same exact-arithmetic discipline as the first sixteen: DECIMAL sums and
# cross-multiplied ratios, ROUND+CAST DOUBLE only at the output edge.
# ---------------------------------------------------------------------------
@query(
    "tpch_q2_min_cost_supplier",
    """WITH cost AS (
  SELECT l.l_partkey, l.l_suppkey,
         MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY 1, 2
)
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
       CAST(c.cost AS DOUBLE) AS supply_cost
FROM cost c
JOIN part p ON p.p_partkey = c.l_partkey
JOIN supplier s ON s.s_suppkey = c.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
  AND c.cost = (SELECT MIN(c2.cost) FROM cost c2 WHERE c2.l_partkey = c.l_partkey)""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-style min-cost supplier per part, region-restricted. The
    correlated per-part MIN becomes a window over l_partkey on the already
    (partkey,suppkey)-aggregated rows — two exchanges, but only the first
    is wide: the partial (partkey,suppkey) agg shrinks the fact map-side,
    so the partkey window shuffle moves aggregated pairs, not lineitems.
    Every dim (regional suppliers, parts, nation) broadcasts. MIN over
    exact decimals makes the tie-equality bitwise."""
    li = testdata.load(spark, sf_dir, "lineitem")
    s = testdata.load(spark, sf_dir, "supplier")
    n = testdata.load(spark, sf_dir, "nation")
    r = testdata.load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = testdata.load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    regional = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    cost = (
        li.join(F.broadcast(regional.select("s_suppkey")), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("_mn", F.min("cost").over(w)).filter(F.col("cost") == F.col("_mn"))
    return (
        best.join(F.broadcast(p), best["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(regional), best["l_suppkey"] == regional["s_suppkey"])
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("cost").cast("double").alias("supply_cost"),
        )
    )


@query(
    "tpch_q11_important_values",
    """WITH val AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))) AS part_val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey = 7
  GROUP BY 1
), tot AS (SELECT SUM(part_val) AS tot FROM val)
SELECT v.l_partkey AS p_partkey,
       CAST(ROUND(v.part_val, 2) AS DOUBLE) AS part_value
FROM val v, tot
WHERE v.part_val * 1000 > tot.tot""",
)
def tpch_q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-style important part values for one nation's suppliers. The
    HAVING-over-global-fraction is the scalar-subquery pattern: the 1-row
    total broadcasts back over the per-part aggregate, and the 0.1%%
    threshold cross-multiplies to exact decimals (val*1000 > tot) instead
    of float-dividing. One shuffle (partkey agg); supplier dim broadcasts."""
    li = testdata.load(spark, sf_dir, "lineitem")
    s = testdata.load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    val = (
        li.join(F.broadcast(s.select("s_suppkey")), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_quantity").cast("decimal(18,2)")
            ).alias("part_val")
        )
    )
    tot = val.agg(F.sum("part_val").alias("_tot"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("part_val") * F.lit(1000) > F.col("_tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("part_val"), 2).cast("double").alias("part_value"),
        )
    )


@query(
    "tpch_q12_late_by_priority",
    """SELECT o.o_orderpriority,
       CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
       COUNT(*) AS total_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY o.o_orderpriority""",
)
def tpch_q12_late_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-style late-shipment histogram by order priority ("late" =
    shipped >60 days after the order date; the schema has no
    commit/receipt dates). The one-year shipdate band prunes the lineitem
    scan; the fact-fact join shuffles on orderkey once; the conditional
    sum is a partial (map-side) aggregate into a 5-row result."""
    li = testdata.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    o = testdata.load(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, F.lit(1)).otherwise(F.lit(0))).alias("late_count"),
            F.count("*").alias("total_count"),
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    """SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3""",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-style supplier counts per (brand, type, size). The complaint
    NOT IN becomes a broadcast left-anti join (negative-balance suppliers
    are a tiny list); the part predicate prunes the broadcast build side.
    COUNT(DISTINCT) expands to Spark's two-level partial-distinct agg —
    one logical shuffle on the group keys."""
    li = testdata.load(spark, sf_dir, "lineitem")
    p = testdata.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = testdata.load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(bad.select("s_suppkey")), li["l_suppkey"] == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_excess_suppliers",
    """WITH qty AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (
    SELECT q.l_suppkey FROM qty q
    JOIN part p ON p.p_partkey = q.l_partkey
    WHERE p.p_name LIKE 'red%' AND q.sq > 40)""",
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-style excess-stock suppliers: nation-filtered suppliers who
    moved >40 units of a 'red%'-named part in one year. The nested IN
    chain becomes two semi joins — part prunes the (partkey,suppkey)
    aggregate via broadcast, and the qualifying-supplier set (small by
    construction) broadcasts into a left-semi against the supplier dim.
    One shuffle total (the year-banded quantity agg)."""
    li = testdata.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01 00:00:00").cast("timestamp"))
    )
    p = testdata.load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = testdata.load(spark, sf_dir, "supplier")
    n = testdata.load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    qty = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"))
        .filter(F.col("sq") > 40)
        .join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"], "left_semi")
        .join(F.broadcast(qty), s["s_suppkey"] == qty["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    """WITH j AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2
), w AS (
  SELECT l_orderkey, l_suppkey, is_late,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         SUM(is_late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM j
)
SELECT s.s_name, COUNT(*) AS numwait
FROM w
JOIN supplier s ON s.s_suppkey = w.l_suppkey
WHERE w.is_late = 1 AND w.n_supp > 1 AND w.n_late = 1
GROUP BY s.s_name""",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-style suppliers who kept finished orders waiting: the supplier
    was late (>90 days after order date), the order had other suppliers
    (EXISTS), and no OTHER supplier was late (NOT EXISTS). Both correlated
    subqueries collapse into window counts over l_orderkey on the
    per-(order,supplier) aggregate — n_supp > 1 encodes EXISTS, n_late == 1
    encodes NOT-EXISTS-other-late given this row is late. At scale the
    orderkey-partitioned fact-fact sort-merge join output is reused by both
    the (orderkey,suppkey) agg and the orderkey window (clustering on a
    subset satisfies both), leaving one more exchange for the final s_name
    count; supplier dim broadcasts."""
    li = testdata.load(spark, sf_dir, "lineitem")
    o = testdata.load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = testdata.load(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, F.lit(1)).otherwise(F.lit(0))).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = j.select(
        "l_suppkey",
        "is_late",
        F.count("*").over(w).alias("n_supp"),
        F.sum("is_late").over(w).alias("n_late"),
    ).filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    return (
        flagged.join(F.broadcast(s), flagged["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Tumbling time-window rollup — the Structured Streaming aggregation idiom
# as its batch twin (same code shape runs under readStream + watermark;
# see tests/test_streaming_window.py for the stream-equals-batch pin)
# ---------------------------------------------------------------------------
@query(
    "windowed_event_rollup",
    """SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS TIMESTAMP) AS win_start,
       CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 + 3600) AS TIMESTAMP) AS win_end,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3""",
)
def windowed_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour tumbling-window rollup by event type: counts, distinct
    users, exact value sum. ``F.window`` buckets align to the unix epoch
    (the oracle floors epoch seconds to match). One shuffle on
    (window, event_type); the distinct-user count expands to the standard
    two-level partial-distinct agg. Under readStream the SAME expression
    plus ``withWatermark`` is the streaming form — late rows beyond the
    watermark drop instead of reopening finalized buckets."""
    ev = testdata.load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )


@query(
    "session_window_rollup",
    """WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
         ) AS session_no
  FROM gaps
)
SELECT user_id,
       MIN(ts) AS win_start,
       MAX(ts) + INTERVAL 30 MINUTE AS win_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_no""",
)
def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE session_window (30-min gap):
    the streaming-capable form of `sessionize` — under readStream the same
    expression maintains open sessions as state and finalizes them past
    the watermark. Semantics pinned against the batch islands oracle:
    session_window.start = first event, .end = last event + gap. One
    shuffle on (user, session)."""
    ev = testdata.load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
        )
    )


@query(
    "username_fuzzy_pairs",
    f"""{_CTE},
names AS (SELECT DISTINCT username FROM signups WHERE username IS NOT NULL)
SELECT a.username AS name_a, b.username AS name_b,
       CAST(levenshtein(a.username, b.username) AS INT) AS dist
FROM names a JOIN names b ON a.username < b.username
WHERE levenshtein(a.username, b.username) = 1""",
)
def username_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typosquat detection: distinct username pairs at edit distance 1,
    via exact deletion-neighborhood blocking (map-side |s|+1 variants,
    one variant-bucket shuffle, Levenshtein verify on candidates only) —
    never the O(n^2) cross join the ORACLE is allowed to run at test
    scale."""
    from .operators.fuzzy import edit_distance_pairs

    return edit_distance_pairs(_signups(spark, sf_dir), "username")


@query(
    "grouping_sets_pricing",
    """SELECT
  COALESCE(l_returnflag, 'ALL') AS rflag,
  COALESCE(l_linestatus, 'ALL') AS lstatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
  COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
)
def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the two single-dimension marginals plus
    the grand total, WITHOUT the cross product a CUBE would also compute.
    Same one-shuffle set-expansion execution as cube/rollup; the SQL front
    end is the only way PySpark expresses arbitrary set lists."""
    li = testdata.load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """SELECT
  COALESCE(l_returnflag, 'ALL') AS rflag,
  COALESCE(l_linestatus, 'ALL') AS lstatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
  COUNT(*) AS n
FROM lineitem_gs
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
    )


@query(
    "orders_column_stats",
    """SELECT
  COUNT(*) AS n_rows,
  COUNT(o_custkey) AS custkey_nonnull,
  COUNT(DISTINCT o_custkey) AS custkey_ndv,
  MIN(o_custkey) AS custkey_min,
  MAX(o_custkey) AS custkey_max,
  COUNT(DISTINCT o_orderstatus) AS status_ndv,
  MIN(o_orderdate) AS orderdate_min,
  MAX(o_orderdate) AS orderdate_max,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS totalprice_sum,
  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_nulls
FROM orders""",
)
def orders_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style one-pass column profile: row count, per-column
    non-null/NDV/min/max/null-count in a SINGLE aggregate — one scan, one
    partial-agg combine into a 1-row result. The primitive behind CBO
    statistics, data-quality monitors, and schema drift detection; at
    100 TB the one-pass bundle beats per-column passes by the number of
    columns profiled. (Exact NDV here, oracle-checkable; swap
    approx_count_distinct for the sketch form at cluster scale —
    sketch_error_bounds covers that path.)"""
    o = testdata.load(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.count_distinct("o_custkey").alias("custkey_ndv"),
        F.min("o_custkey").alias("custkey_min"),
        F.max("o_custkey").alias("custkey_max"),
        F.count_distinct("o_orderstatus").alias("status_ndv"),
        F.min("o_orderdate").alias("orderdate_min"),
        F.max("o_orderdate").alias("orderdate_max"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("totalprice_sum"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("totalprice_nulls"),
    )


@query(
    "funnel_view_click_purchase",
    """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT
  (SELECT COUNT(*) FROM v) AS n_view,
  (SELECT COUNT(*) FROM c) AS n_view_click,
  (SELECT COUNT(*) FROM p) AS n_view_click_purchase""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): stage N counts users
    whose earliest qualifying stage-N event follows their stage-(N-1)
    entry time. One pass per stage over a per-user min-ts aggregate —
    every stage is a groupBy(user) + broadcast-or-AQE join of the (ever
    smaller) qualified-user table; no window over the full event stream,
    no event-order shuffle. The classic product-analytics operator a
    training-data activity pipeline also uses for behavioral cohorts."""
    ev = testdata.load(spark, sf_dir, "events")

    def stage(event_type, prev=None, prev_t=None):
        e = ev.filter(F.col("event_type") == event_type)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return e.groupBy("user_id").agg(F.min("ts").alias(f"t_{event_type}"))

    v = stage("view")
    c = stage("click", v, "t_view")
    p = stage("purchase", c, "t_click")
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )


@query(
    "value_equidepth_histogram",
    """WITH t AS (
  SELECT value, NTILE(8) OVER (ORDER BY value, event_id) AS bucket
  FROM events WHERE value IS NOT NULL
)
SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
       CAST(ROUND(MIN(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS lo,
       CAST(ROUND(MAX(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS hi
FROM t GROUP BY bucket""",
)
def value_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of the value column via NTILE —
    the CBO/monitoring primitive for skew-aware bucketing. NTILE needs a
    total order, so this is the one deliberately-global-sort query in the
    registry: at 100 TB swap in approx quantile cut points (GK sketch, see
    percentiles_exact's docstring) and a map-side bucket assignment; the
    exact form stays as the oracle-checkable ground truth."""
    ev = testdata.load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        "value",
        F.ntile(8).over(Window.orderBy("value", "event_id")).alias("bucket"),
    )
    return t.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.round(F.min(F.col("value").cast("decimal(18,6)")), 6).cast("double").alias("lo"),
        F.round(F.max(F.col("value").cast("decimal(18,6)")), 6).cast("double").alias("hi"),
    ).select(F.col("bucket").cast("bigint").alias("bucket"), "n", "lo", "hi")


@query(
    "retention_cohorts",
    """WITH first_seen AS (
  SELECT user_id, CAST(floor(epoch(MIN(ts)) / 604800) AS BIGINT) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(floor(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_week AS week_offset
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
)
SELECT cohort_week, week_offset, COUNT(*) AS n_users
FROM activity GROUP BY 1, 2""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    once per (cohort, week-offset) they were active in — the classic
    retention triangle. Epoch-floored week buckets keep both engines
    integer-exact. Two shuffles: the per-user min and the cohort-cell
    distinct count (the first-seen table joins back AQE-planned)."""
    ev = testdata.load(spark, sf_dir, "events")
    week = (F.floor(F.unix_timestamp("ts") / 604800)).cast("bigint")
    first = ev.groupBy("user_id").agg(
        F.floor(F.unix_timestamp(F.min("ts")) / 604800).cast("bigint").alias("cohort_week")
    )
    activity = (
        ev.join(first, "user_id")
        .select("user_id", "cohort_week", (week - F.col("cohort_week")).alias("week_offset"))
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(F.count("*").alias("n_users"))


@query(
    "user_state_scd2",
    """SELECT user_id, event_type AS state, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       CAST(CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            THEN 1 ELSE 0 END AS BOOLEAN) AS is_current
FROM events""",
)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) builder: each user event opens a
    state row valid until the next event closes it; the open row is
    flagged current. ONE window exchange on user_id builds the whole
    dimension — the standard warehouse pattern for as-of attribution
    (pairs with asof_join_orders for point-in-time lookups)."""
    ev = testdata.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


_FUZZY_EDGES_SQL = ORACLES["username_fuzzy_pairs"]


@query(
    "fuzzy_graph_triangles",
    f"""WITH e AS ({_FUZZY_EDGES_SQL}),
canon AS (SELECT name_a AS x, name_b AS y FROM e),
w AS (SELECT a.x, a.y, b.y AS z FROM canon a JOIN canon b ON b.x = a.y)
SELECT w.x, w.y, w.z
FROM w JOIN canon c ON c.x = w.x AND c.y = w.z""",
)
def fuzzy_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the typosquat similarity graph: the ordered
    two-path (wedge) join closed by a third edge lookup — two shuffle
    joins, each triangle counted once via x < y < z. The classic
    distributed graph primitive (clustering coefficient, community
    seeding) over an edge list this repo itself produces."""
    from .operators.fuzzy import edit_distance_pairs
    from .operators.graph import triangles

    edges = edit_distance_pairs(_signups(spark, sf_dir), "username")
    return triangles(edges, "name_a", "name_b").select(
        F.col("x"), F.col("y"), F.col("z")
    )


@query(
    "fuzzy_graph_kcore",
    f"""WITH RECURSIVE fe AS MATERIALIZED ({_FUZZY_EDGES_SQL}),
e AS MATERIALIZED (
  SELECT name_a AS src, name_b AS dst FROM fe
  UNION
  SELECT name_b, name_a FROM fe
),
surv(it, nodes) AS (
  SELECT 0, (SELECT list(DISTINCT src ORDER BY src) FROM e)
  UNION ALL
  SELECT s.it + 1,
         (SELECT list(src ORDER BY src) FROM (
            SELECT src FROM e
            WHERE list_contains(s.nodes, src) AND list_contains(s.nodes, dst)
            GROUP BY src HAVING COUNT(*) >= 3) t)
  FROM surv s WHERE s.it < 50
)
SELECT unnest(nodes) AS id FROM surv WHERE it = 50""",
)
def fuzzy_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the typosquat similarity graph: iterative degree peeling
    (degree agg + semi join per round, localCheckpoint lineage cuts,
    convergence by monotone node count). Pure-integer fixpoint, so the
    driver gets a FULL hash check: the DuckDB twin runs the identical
    peeling recurrence (survivors_{{i+1}} = nodes with induced degree >= k)
    as a recursive CTE carrying the survivor LIST per iteration — 50
    bounded rounds, idempotent past convergence, so both engines read off
    the same fixpoint. Also pinned against a Python peeling twin in
    tests/test_pipeline_ops.py."""
    from .operators.fuzzy import edit_distance_pairs
    from .operators.graph import k_core

    edges = edit_distance_pairs(_signups(spark, sf_dir), "username")
    return k_core(edges, 3, "name_a", "name_b")


def outliers_3sigma(ev: DataFrame) -> DataFrame:
    """Per-group 3-sigma outliers with ZERO floating point, over any frame
    with (event_id, event_type, value). |x - mean| > 3*sigma
    cross-multiplies into (x*n - tot)^2 > 9*(ss*n - tot^2) on SCALE-0
    integer decimals: x is quantized once to micros (exact, value is
    decimal(18,6)), then every product lives in decimal(38,0) where Spark's
    precision-loss rule has no fractional digits to shave — the arithmetic
    is exact as long as the true magnitudes fit 38 digits, and ANSI mode
    raises (never rounds) past that. Exactness domain: with n rows per
    group and |value| <= B, it requires n * B * 1e6 < 10^19 (dev and ss*n
    both stay under 10^38) — e.g. 10^9 rows of |value| <= 10^4, or 10^6
    rows of |value| <= 10^7. The DuckDB twin runs the same inequality in
    HUGEINT (int128); the large-magnitude agreement is pinned in
    tests/test_pipeline_ops.py. Per-group stats are one partial agg
    broadcast back onto the rows."""
    x = F.col("value").cast("decimal(18,6)")
    xm = (x * F.lit(1000000)).cast("decimal(38,0)")
    q = ev.filter(F.col("value").isNotNull()).select(
        "event_id", "event_type", x.alias("x"), xm.alias("xm")
    )
    stats = q.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("xm").alias("tot"),
        F.sum(F.col("xm") * F.col("xm")).alias("ss"),
    )
    dev = F.col("xm") * F.col("n") - F.col("tot")
    return (
        q.join(F.broadcast(stats), "event_type")
        .filter(
            (dev * dev > F.lit(9) * (F.col("ss") * F.col("n") - F.col("tot") * F.col("tot")))
            & (F.col("n") > 1)
        )
        .select("event_id", "event_type", F.col("x").cast("double").alias("value"))
    )


OUTLIERS_3SIGMA_ORACLE = """WITH q AS (
  SELECT event_id, event_type, CAST(value AS DECIMAL(18,6)) AS x,
         CAST(CAST(CAST(value AS DECIMAL(18,6)) AS DECIMAL(25,6)) * 1000000 AS HUGEINT) AS xm
  FROM {table} WHERE value IS NOT NULL
),
stats AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(xm) AS tot, SUM(xm * xm) AS ss
  FROM q GROUP BY event_type
)
SELECT q.event_id, q.event_type, CAST(q.x AS DOUBLE) AS value
FROM q JOIN stats s ON s.event_type = q.event_type
WHERE (q.xm * s.n - s.tot) * (q.xm * s.n - s.tot)
      > 9 * (s.ss * s.n - s.tot * s.tot)
  AND s.n > 1"""


@query("value_outliers_3sigma", OUTLIERS_3SIGMA_ORACLE.format(table="events"))
def value_outliers_3sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 3-sigma outliers, exact-integer form (see
    ``outliers_3sigma``) — the data-quality gate a feature pipeline runs
    before training."""
    return outliers_3sigma(testdata.load(spark, sf_dir, "events"))


@query(
    "purchase_state_attribution",
    """WITH stream AS (
  SELECT user_id, ts, event_id, event_type AS state, 0 AS is_probe
  FROM events WHERE event_type <> 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, NULL, 1 FROM events WHERE event_type = 'purchase'
),
marked AS (
  SELECT *,
         LAST_VALUE(state IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS prev_state
  FROM stream
)
SELECT event_id, user_id, ts, prev_state
FROM marked WHERE is_probe = 1""",
)
def purchase_state_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time attribution: each purchase annotated with the user's
    most recent non-purchase activity — the generic as-of join done the
    single-shuffle way (union probe rows into the state stream, one
    window with an ignore-nulls running last) instead of
    join-then-filter-then-rank, which would shuffle both sides AND
    re-sort. Purchases before any other activity keep NULL. The pattern
    behind joining facts to the user_state_scd2 dimension at scale."""
    ev = testdata.load(spark, sf_dir, "events")
    changes = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id",
        F.col("event_type").alias("state"), F.lit(0).alias("is_probe"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("string").alias("state"), F.lit(1).alias("is_probe"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        changes.unionAll(probes)
        .withColumn("prev_state", F.last("state", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select("event_id", "user_id", "ts", "prev_state")
    )


@query(
    "interval_join_attribution",
    """SELECT v.user_id AS key, v.ts AS l_ts, p.ts AS r_ts,
       CAST(floor(epoch(p.ts)) - floor(epoch(v.ts)) AS BIGINT) AS lag_seconds,
       v.event_id AS view_event_id, p.event_id AS purchase_event_id
FROM events v
JOIN events p
  ON p.user_id = v.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
WHERE v.event_type = 'view' AND p.event_type = 'purchase'""",
)
def interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (streaming/joins.py:
    stream_interval_join, pinned stream-equals-batch in pytest): every
    purchase attributes to each same-user view it follows within 30
    minutes. Runs the SAME function body the streaming query runs —
    watermarks are a no-op on batch frames — so the driver row certifies
    the join logic both modes share. On streams the range condition plus
    both watermarks bound the symmetric-hash-join state; on batch it is
    a plain key-equi + range join."""
    from .streaming.joins import stream_interval_join

    ev = testdata.load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = stream_interval_join(views, purchases, "user_id", "ts", "ts")
    return out.select(
        "key",
        "l_ts",
        "r_ts",
        "lag_seconds",
        F.col("l.event_id").alias("view_event_id"),
        F.col("r.event_id").alias("purchase_event_id"),
    )


# ---------------------------------------------------------------------------
# Streaming-flavored rate anomaly: EWMA baseline per event type, exact
# ---------------------------------------------------------------------------
_EWMA_LAGS = 6  # EWMA horizon; 0.5^7 < 1% residual weight


def _ewma_sql_terms(col: str) -> tuple[str, str]:
    # alpha = 1/2: ewma_t = sum_{k=1..L} 0.5^k * x_{t-k}, normalized by the
    # weight actually present (leading buckets have fewer lags). Powers of
    # two are exact doubles, so Spark and DuckDB agree bit-for-bit.
    num = " + ".join(
        f"COALESCE(lag({col}, {k}) OVER w, 0) * {0.5 ** k!r}" for k in range(1, _EWMA_LAGS + 1)
    )
    den = " + ".join(
        f"(CASE WHEN lag({col}, {k}) OVER w IS NULL THEN 0 ELSE {0.5 ** k!r} END)"
        for k in range(1, _EWMA_LAGS + 1)
    )
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_sql_terms("n")

_RATE_ANOMALY_ORACLE = f"""WITH buckets AS (
  SELECT event_type,
         CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS TIMESTAMP) AS bucket,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, bucket, n,
         {_EWMA_NUM} AS wsum,
         {_EWMA_DEN} AS wtot
  FROM buckets
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
)
SELECT event_type, bucket, n,
       CAST(floor(wsum / wtot * 10000.0) AS BIGINT) AS ewma_q,
       CAST(n AS DOUBLE) * wtot > 2.0 * wsum AS anomaly
FROM scored WHERE wtot > 0"""


@query("event_rate_anomaly", _RATE_ANOMALY_ORACLE)
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-anomaly detection per event type: hourly counts vs an
    exponentially-weighted moving average of the preceding six buckets
    (alpha = 1/2 — powers of two, so the weighted sum is bit-identical
    across engines; the anomaly test cross-multiplies instead of dividing
    so no rounding ever flips a verdict at the threshold). An hour firing
    above 2x its EWMA baseline flags.

    Scale shape: one shuffle to build (event_type, hour) buckets — the
    heavy reduction off the raw stream — then a lag window over the TINY
    bucket table partitioned by event_type; at any event rate the window
    input is bounded by types x hours. The same bucket aggregate under
    readStream is the watermarked tumbling window (windowed_event_rollup),
    with the EWMA scan running on the rollup sink."""
    ev = testdata.load(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type",
        F.timestamp_seconds(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
        ).alias("bucket"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("bucket")
    wsum = sum(
        (
            F.coalesce(F.lag("n", k).over(w), F.lit(0)).cast("double") * F.lit(0.5**k)
            for k in range(1, _EWMA_LAGS + 1)
        ),
        F.lit(0.0),
    )
    wtot = sum(
        (
            F.when(F.lag("n", k).over(w).isNull(), F.lit(0.0)).otherwise(F.lit(0.5**k))
            for k in range(1, _EWMA_LAGS + 1)
        ),
        F.lit(0.0),
    )
    return (
        buckets.select(
            "event_type",
            "bucket",
            "n",
            wsum.alias("_wsum"),
            wtot.alias("_wtot"),
        )
        # a type's first bucket has no preceding baseline: no verdict row
        # (emitting NULLs instead would also force the bigint column to
        # float through every Arrow/pandas hop)
        .filter(F.col("_wtot") > 0.0)
        .select(
            "event_type",
            "bucket",
            "n",
            F.floor(F.col("_wsum") / F.col("_wtot") * F.lit(10000.0))
            .cast("bigint")
            .alias("ewma_q"),
            (F.col("n").cast("double") * F.col("_wtot") > F.lit(2.0) * F.col("_wsum"))
            .alias("anomaly"),
        )
    )
