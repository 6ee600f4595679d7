"""Loaders + shared derived views over the driver's synthetic tables.

The driver testdata (TESTDATA.md / FIXTURES.md §B) has no signup-shaped
table, so the oracle-checked rule-engine queries run on a DETERMINISTIC
derived view ``signups`` built from ``events`` with pure SQL that both Spark
and DuckDB evaluate identically (integer modulo + string concat only). The
view is the stand-in for the reference's NDJSON signup stream
(src/event.rs:42-52): username/email/ip/user_agent/finger_print/susp_ip with
the null patterns the criteria need (NULL UA every 7th row, NULL fingerprint
every 5th, susp_ip every 11th; lichess-bot / Lichess Mobile / browser /
short UAs mixed per src/event.rs:89-146).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# {S} = string cast type name: STRING for Spark, VARCHAR for DuckDB.
_SIGNUPS_SELECT = """
SELECT
  event_id,
  ts,
  'user_' || CAST(user_id AS {S}) AS username,
  'user' || CAST(user_id AS {S}) || '@' ||
    CASE WHEN event_id % 3 = 0 THEN 'Gmail.com'
         WHEN event_id % 3 = 1 THEN 'proton.me'
         ELSE 'hotmail.FR' END AS email,
  CAST(10 + (event_id % 4) AS {S}) || '.' || CAST(user_id % 256 AS {S}) || '.' ||
    CAST(event_id % 256 AS {S}) || '.' || CAST(event_id % 100 AS {S}) AS ip,
  CASE WHEN event_id % 7 = 0 THEN NULL
       WHEN event_id % 7 = 1 THEN 'lichess-bot/' || CAST(event_id % 9 AS {S}) || '.0.0 extras'
       WHEN event_id % 7 = 2 THEN 'Lichess Mobile/8.' || CAST(event_id % 5 AS {S}) ||
            ' as:user_' || CAST(user_id AS {S}) || ' sri:s' || CAST(event_id AS {S}) ||
            ' os:Android/' || CAST(10 + event_id % 4 AS {S}) || ' dev:Pixel 8'
       WHEN event_id % 7 = 3 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36'
       WHEN event_id % 7 = 4 THEN 'LM/8.' || CAST(event_id % 5 AS {S}) || ' iOS/17.' ||
            CAST(event_id % 3 AS {S}) || ' iPhone 15'
       WHEN event_id % 7 = 5 THEN 'curl/8.4.0'
       ELSE 'Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Safari/605.1.15'
  END AS user_agent,
  CASE WHEN event_id % 5 = 0 THEN NULL
       ELSE 'fp_' || CAST(event_id % 50 AS {S}) END AS finger_print,
  (event_id % 11 = 0) AS susp_ip
FROM events
"""


def signups_view_sql(dialect: str) -> str:
    s = {"spark": "STRING", "duckdb": "VARCHAR"}[dialect]
    return _SIGNUPS_SELECT.format(S=s)


def signups_cte(dialect: str) -> str:
    """`WITH signups AS (...)` prefix for oracle SQL strings."""
    return f"WITH signups AS ({signups_view_sql(dialect)})"


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver table.

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; we read nanos as long (runtime SQL conf) and
    convert losslessly to TimestampType (the data is µs-aligned — verified
    sub-µs component is 0 across all SFs)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer division: ts/1000 in double loses precision at 1.7e18 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def signups_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(signups_view_sql("spark"))
