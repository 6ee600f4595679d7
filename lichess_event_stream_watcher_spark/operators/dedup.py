"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:

- **Exact**: hash-groupBy on a content fingerprint — one shuffle on the
  16-byte hash, perfectly balanced unless the corpus is one giant dup class.
- **N-gram Jaccard**: the pair search uses an INVERTED INDEX (explode
  shingles, self-join on shingle) — never an O(n^2) cross join. Skew guard:
  ultra-common shingles are capped by a document-frequency filter.
- **MinHash+LSH**: per-doc signatures are a map-side explode + min-agg;
  candidate generation joins on (band, band_signature) buckets, so the join
  fans out only within buckets. Bands/rows trade recall vs candidates:
  b=4, r=4 -> s-curve threshold (1/4)^(1/4) ~ 0.71.
- **SimHash**: 64-bit signatures from per-token md5 bits; near-dup = low
  Hamming distance. Signature build is map-side; the bit explosion is 64x
  rows but stays pre-shuffle.

Hashing is md5-based everywhere (NOT Spark's murmur3 ``hash()``) so every
stage has a bit-identical DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, normalize_text, tokens

DEFAULT_MINHASH_K = 16
DEFAULT_BANDS = 4


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy: per content fingerprint, the kept
    (minimum) id and the duplicate count."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def shingles(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Built with transform over a token-index sequence — pure Catalyst, no UDF.
    """
    toks = tokens(normalize_text(F.col(text_col)))
    # guard: sequence(0, negative) would produce a DESCENDING range
    idx = F.when(F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    n: int = 2,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    Inverted-index join: |pairs| is bounded by sum over shingles of df^2 —
    ``max_shingle_df`` drops stop-shingles to keep skew bounded at scale.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    # cache: the shingle table feeds both sides of the self-join AND the
    # size aggregate — without it the normalize/shingle chain runs 3x
    sh = shingles(df, n, text_col, id_col).cache()
    if max_shingle_df is not None:
        rare = sh.groupBy("shingle").count().filter(F.col("count") <= max_shingle_df)
        sh = sh.join(rare.select("shingle"), "shingle")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    j = (
        inter.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def minhash_signatures(
    df: DataFrame,
    k: int = DEFAULT_MINHASH_K,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature rows: (id, seed, minhash) for seed in [0, k).

    hash_i(shingle) = md5(i || '|' || shingle); the per-seed minimum is taken
    LEXICOGRAPHICALLY on the hex digest — identical in any engine, no
    integer conversion needed. One explode (x k) + one partial min-agg.
    """
    sh = shingles(df, n, text_col, id_col)
    seeded = sh.withColumn("seed", F.explode(F.array(*[F.lit(i) for i in range(k)])))
    h = F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle")))
    return (
        seeded.withColumn("h", h)
        .groupBy("id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_bands(sigs: DataFrame, k: int = DEFAULT_MINHASH_K, bands: int = DEFAULT_BANDS) -> DataFrame:
    """Fold signatures into band buckets: (id, band, band_sig).

    band_sig = md5 of the band's r minhashes concatenated in seed order.
    """
    r = k // bands
    with_band = sigs.withColumn("band", (F.col("seed") / r).cast("int"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seed", "minhash"))), lambda s: s["minhash"]
    )
    return (
        with_band.groupBy("id", "band")
        .agg(F.md5(F.array_join(ordered, ",")).alias("band_sig"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidate pairs (id_a < id_b) + estimated Jaccard.

    Pairs collide iff they share any (band, band_sig) bucket; the estimate
    is the fraction of equal minhash seeds. Bucket join keeps the pair
    explosion local to buckets — the scale path for corpus-level dedup.
    """
    sigs = minhash_signatures(df, k, n, text_col, id_col).cache()
    bnd = lsh_bands(sigs, k, bands)
    a, b = bnd.alias("a"), bnd.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa, sb = sigs.alias("sa"), sigs.alias("sb")
    est = (
        sa.join(sb, (F.col("sa.seed") == F.col("sb.seed")) & (F.col("sa.id") < F.col("sb.id")))
        .filter(F.col("sa.minhash") == F.col("sb.minhash"))
        .groupBy(F.col("sa.id").alias("id_a"), F.col("sb.id").alias("id_b"))
        .agg((F.count("*") / F.lit(float(k))).alias("est_jaccard"))
    )
    return cand.join(est, ["id_a", "id_b"], "left").fillna({"est_jaccard": 0.0}).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


_HEX = "0123456789abcdef"


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document as a 16-hex-char string: (id, simhash).

    bit_j(token) = bit (j%4) of md5-hex nibble (j/4); the signature bit is 1
    iff the sum of (2*bit-1) over DISTINCT tokens is > 0. md5-nibble bit
    extraction keeps it engine-portable (exact DuckDB twin).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(normalize_text(F.col(text_col))))).alias("tok"),
    ).withColumn("th", F.md5(F.col("tok")))
    positions = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.lit(j // 4 + 1).alias("nib_pos"),
                F.lit(2 ** (j % 4)).alias("divisor"),
            )
            for j in range(64)
        ]
    )
    nibble_val = F.expr(f"instr('{_HEX}', substr(th, p.nib_pos, 1))") - 1
    bits = (
        toks.withColumn("p", F.explode(positions))
        .select(
            "id",
            F.col("p.j").alias("j"),
            (F.floor(nibble_val / F.col("p.divisor")).cast("int") % 2).alias("bit"),
        )
    )
    sums = bits.groupBy("id", "j").agg(F.sum(F.col("bit") * 2 - 1).alias("s"))
    sig_bits = sums.select(
        "id", "j", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)).alias("sbit")
    )
    nibbles = (
        sig_bits.withColumn("nib", F.floor(F.col("j") / 4).cast("int"))
        .withColumn("weight", F.pow(F.lit(2.0), (F.col("j") % 4).cast("double")).cast("int"))
        .groupBy("id", "nib")
        .agg(F.sum(F.col("sbit") * F.col("weight")).alias("v"))
        .withColumn("c", F.expr(f"substr('{_HEX}', v + 1, 1)"))
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("nib", "c"))), lambda s: s["c"]
    )
    return nibbles.groupBy("id").agg(F.array_join(ordered, "").alias("simhash"))
