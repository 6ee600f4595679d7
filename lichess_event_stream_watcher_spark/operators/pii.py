"""PII scrubbing for training-data pipelines: detect + redact emails and
IPv4 addresses in free text.

Pure Catalyst (``regexp_extract_all`` for counting, ``regexp_replace`` for
redaction) — map-side only, no shuffle, no UDF; 100 TB of text scrubs
embarrassingly parallel. The patterns are deliberately RE2-compatible so the
DuckDB oracle (`regexp_replace(..., 'g')`) evaluates the identical language.

Order matters: emails are redacted BEFORE IPs so an address inside an
email's domain part can't be double-redacted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"


def email_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0))).cast("bigint")


def ipv4_count(col: Column) -> Column:
    """IPv4 occurrences AFTER email redaction (an IP-shaped domain inside an
    email counts as the email, not as an address)."""
    return F.size(
        F.regexp_extract_all(redact_emails(col), F.lit(IPV4_RE), F.lit(0))
    ).cast("bigint")


def redact_emails(col: Column) -> Column:
    return F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)


def redact_ipv4(col: Column) -> Column:
    return F.regexp_replace(col, IPV4_RE, IP_TOKEN)


def redact(col: Column) -> Column:
    """Full scrub: emails first, then IPv4."""
    return redact_ipv4(redact_emails(col))


def scrub(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-row scrub report: redacted text + per-category hit counts.

    One map-side projection; the counts let a pipeline route
    high-PII-density rows to quarantine without a second scan.
    """
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        redact(c).alias("redacted"),
        email_count(c).alias("n_emails"),
        ipv4_count(c).alias("n_ips"),
    )
