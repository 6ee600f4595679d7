"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions (no UDFs): language-ID via marker-token
occurrence scoring, quality scoring from length/punctuation/stopword ratios,
token counting (whitespace + BPE-ish regex), and document fingerprinting
(full-text and bag-of-words). Each has an exact DuckDB-oracle twin in
queries_pipeline.py.

Scale: every operator is a map-side projection over ``documents`` — no
shuffle, no state; 100 TB of text is embarrassingly parallel here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# marker tokens per language for the n-gram-ish heuristic language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " a ", " of "],
    "de": [" der ", " die ", " und "],
    "es": [" el ", " la ", " los "],
    "fr": [" le ", " les ", " et "],
}


def normalize_text(col: Column) -> Column:
    """lower + trim + collapse runs of whitespace to single spaces."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), TOKEN_SPLIT_RE)


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def distinct_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("bigint")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, or single
    punctuation — a deterministic stand-in for a BPE tokenizer's piece
    count."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH_RE), F.lit(0))).cast("bigint")


def fingerprint(col: Column) -> Column:
    """Full-text content fingerprint: md5 over normalized text."""
    return F.md5(normalize_text(col))


def bow_fingerprint(col: Column) -> Column:
    """Bag-of-words fingerprint: md5 over the sorted distinct token set —
    catches shuffled/duplicated-token copies that the exact hash misses."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(normalize_text(col)))), " "))


def _occurrences(padded: Column, marker: str) -> Column:
    """Count non-overlapping marker occurrences via the length-delta trick
    (identical semantics in Spark and DuckDB replace())."""
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("bigint")


def lang_scores(col: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), normalize_text(col), F.lit(" "))
    return {
        lang: sum((_occurrences(padded, m) for m in markers), F.lit(0).cast("bigint"))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Predict language as argmax of marker scores with fixed precedence
    (en > de > es > fr); no marker hit -> 'und'."""
    s = lang_scores(col)
    best = F.greatest(*s.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((s[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def punct_count(col: Column) -> Column:
    return (
        F.length(col) - F.length(F.regexp_replace(col, r"[.,!?;:]", ""))
    ).cast("bigint")


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality score: 0.4*length saturation +
    0.3*lexical diversity + 0.3*stopword-rate saturation.

    Quantized via floor at 1e-4 (NOT round): the score can land exactly on a
    half-ulp boundary where HALF_UP (Spark) and C rounding (DuckDB) diverge;
    floor of the identical double is engine-stable."""
    n = token_count(col).cast("double")
    nd = distinct_token_count(col).cast("double")
    en = lang_scores(col)["en"].cast("double")
    score = (
        F.lit(0.4) * F.least(n, F.lit(100.0)) / F.lit(100.0)
        + F.lit(0.3) * nd / n
        + F.lit(0.3) * F.least(en * F.lit(5.0) / n, F.lit(1.0))
    )
    return F.floor(score * F.lit(10000.0)) / F.lit(10000.0)


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile: all metrics as extra columns."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        distinct_token_count(c).alias("n_distinct_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        punct_count(c).alias("n_punct"),
        fingerprint(c).alias("fingerprint"),
        bow_fingerprint(c).alias("bow_fingerprint"),
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
    )
