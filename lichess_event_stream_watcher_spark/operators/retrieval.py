"""BM25 full-text retrieval over the document corpus.

The training-data use case: query-driven corpus inspection and
benchmark-decontamination lookups ("which documents score highest for
this eval question?") want a ranked lexical retrieval primitive, not just
pair-wise dedup. BM25 (Robertson et al., TREC-3) is the standard.

Scale shape — the part that matters at 100 TB:

- the query set is tiny and LITERAL: its term list inlines into a
  map-side filter on the token stream, so the postings materialized are
  ONLY for query terms (a vanishing fraction of the corpus token
  stream), never a full inverted index;
- doc lengths are a map-side projection; avgdl and N are 1-row
  aggregates broadcast into the scorer;
- per-term df comes from the already-filtered postings (bounded by
  |query terms| rows);
- scoring is one groupBy over (query, doc) matched postings — candidates
  are only docs sharing >= 1 query term.

Determinism split (the repo's standard twin pattern): ``idf_mode="ln"``
is textbook BM25 (Lucene's ln(1 + (N-df+0.5)/(df+0.5)) form) — natural
log is NOT guaranteed bit-identical across engines, so that form is
rows-only for the driver and pinned against a python float twin in
pytest. ``idf_mode="rsj_sqrt"`` replaces ln with sqrt on the same RSJ
odds ratio (both are monotone dampings of df; sqrt is correctly-rounded
IEEE) and quantizes each term contribution to integer micro-units before
the order-independent integer sum — fully hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text, tokens

K1 = 1.2
B = 0.75
SCALE = 1_000_000


def bm25_topk(
    docs: DataFrame,
    queries: dict[int, str],
    k: int = 10,
    idf_mode: str = "rsj_sqrt",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query by BM25 (k1=1.2, b=0.75).

    ``queries``: {query_id: query_string}; terms are the normalized
    whitespace tokens of each string. Output:
    (query_id, doc_id, score_q, rank) for rsj_sqrt (integer micro-unit
    scores) or (query_id, doc_id, score, rank) for ln (float scores,
    round-6).
    """
    if idf_mode not in ("ln", "rsj_sqrt"):
        raise ValueError(f"unknown idf_mode {idf_mode!r}")
    qterms = [
        (qid, t)
        for qid, qs in sorted(queries.items())
        for t in dict.fromkeys(qs.lower().split())  # per-query unique, ordered
    ]
    all_terms = sorted({t for _, t in qterms})
    spark = docs.sparkSession
    qdf = spark.createDataFrame(qterms, "query_id bigint, term string")

    tok = docs.select(
        F.col(id_col), F.explode(tokens(normalize_text(F.col(text_col)))).alias("term")
    ).filter(F.col("term").isin(all_terms))
    postings = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = docs.select(
        F.col(id_col),
        F.size(tokens(normalize_text(F.col(text_col)))).cast("bigint").alias("dl"),
    )
    stats = docs.select(
        F.count("*").cast("bigint").alias("n_docs")
    ).crossJoin(
        dl.select(F.sum("dl").cast("bigint").alias("sum_dl"))
    )
    df_t = postings.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))

    # odds = (N - df + 0.5) / (df + 0.5); idf = ln(1 + odds) or sqrt(odds)
    odds = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    idf = F.log(F.lit(1.0) + odds) if idf_mode == "ln" else F.sqrt(odds)
    # saturation = tf*(k1+1) / (tf + k1*(1 - b + b*(dl/avgdl))); avgdl as
    # the single exact division sum_dl/n_docs, association pinned to match
    # the oracle chain term-for-term
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    satur = (F.col("tf") * F.lit(K1 + 1)) / (
        F.col("tf")
        + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * (F.col("dl") / avgdl))
    )
    contrib = idf * satur

    matched = (
        postings.join(F.broadcast(qdf), "term")
        .join(dl, id_col)
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
    )
    if idf_mode == "rsj_sqrt":
        # integer micro-unit contributions -> order-independent sum
        scored = matched.groupBy("query_id", id_col).agg(
            F.sum(F.floor(contrib * SCALE).cast("bigint")).alias("score_q")
        )
        order = [F.desc("score_q"), F.asc(id_col)]
    else:
        scored = matched.groupBy("query_id", id_col).agg(
            F.round(F.sum(contrib), 6).alias("score")
        )
        order = [F.desc("score"), F.asc(id_col)]
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
