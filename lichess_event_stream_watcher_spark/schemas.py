"""Declared schemas for the engine (schema-on-read with defaults, not inference).

Reference data model: src/event.rs:42-101 (User/GeoipInfo/DeviceInfo),
src/signup/rules.rs:164-187 (Rule), src/event.rs:11-32 (tagged Event union).
Newtype wrappers (Username/Email/Ip/...) collapse to their inner StringType.
Wire form is camelCase NDJSON with tag ``"t"``; engine-internal columns are
snake_case.
"""

from __future__ import annotations

from pyspark.sql import types as T

# GeoipInfo { country, city, subdivisions } — src/event.rs:65-69
GEOIP_SCHEMA = T.StructType(
    [
        T.StructField("country", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("subdivisions", T.ArrayType(T.StringType()), True),
    ]
)

# DeviceInfo { device, os, client } — src/event.rs:96-101
DEVICE_SCHEMA = T.StructType(
    [
        T.StructField("device", T.StringType(), True),
        T.StructField("os", T.StringType(), True),
        T.StructField("client", T.StringType(), True),
    ]
)

# User — src/event.rs:42-52. geoip/device are derived (filled by enrichment).
USER_SCHEMA = T.StructType(
    [
        T.StructField("username", T.StringType(), False),
        T.StructField("email", T.StringType(), False),
        T.StructField("ip", T.StringType(), False),
        T.StructField("user_agent", T.StringType(), True),
        T.StructField("finger_print", T.StringType(), True),
        T.StructField("susp_ip", T.BooleanType(), True),  # defaulted false (src/event.rs:48-49)
        T.StructField("geoip", GEOIP_SCHEMA, True),
        T.StructField("device", DEVICE_SCHEMA, True),
    ]
)

# NDJSON wire schema: {"t":"signup","username":...,"userAgent":...,"suspIp":...}
# (serde tag dispatch on "t" — src/event.rs:11-14; camelCase — src/event.rs:41)
SIGNUP_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("t", T.StringType(), False),
        T.StructField("username", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("ip", T.StringType(), True),
        T.StructField("userAgent", T.StringType(), True),
        T.StructField("fingerPrint", T.StringType(), True),
        T.StructField("suspIp", T.BooleanType(), True),
    ]
)

# Rule table schema (for DataFrame views of the rule store) —
# src/signup/rules.rs:164-187; criterion flattened to (kind, value).
RULE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("criterion_kind", T.StringType(), False),
        T.StructField("criterion_value", T.StringType(), False),
        T.StructField("actions", T.ArrayType(T.StringType()), False),
        T.StructField("match_count", T.LongType(), False),
        T.StructField("most_recent_caught", T.ArrayType(T.StringType()), False),
        T.StructField("no_delay", T.BooleanType(), False),
        T.StructField("enabled", T.BooleanType(), False),
        T.StructField("susp_ip", T.BooleanType(), False),
        T.StructField("expiry", T.TimestampType(), True),
        T.StructField("exp_notification", T.ByteType(), False),
        T.StructField("creation_date", T.TimestampType(), False),
        T.StructField("latest_match_date", T.TimestampType(), True),
    ]
)
