"""Beyond-reference training-data-pipeline queries: text analysis, dedup
(exact / n-gram Jaccard / MinHash-LSH / SimHash), embedding similarity
search, and multimodal manifest plumbing — each with an exact DuckDB oracle
(md5-based hashing + deterministic fold-order arithmetic make every stage
bit-reproducible across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import testdata
from .operators import dedup as D
from .operators import multimodal as M
from .operators import similarity as S
from .operators import text as X
from .queries import query

# ---------------------------------------------------------------------------
# shared DuckDB CTE fragments
# ---------------------------------------------------------------------------
_NORM = r"""norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
)"""
_TOKS = r"""toks AS (SELECT id, string_split_regex(t, '\s+') AS tk FROM norm)"""
_SHINGLES = r"""sh AS (
  SELECT id, unnest(list_distinct([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))])) AS shingle
  FROM toks
)"""
# the k=16 MinHash signature CTEs every banding oracle builds on — one
# fragment so the seed-hash / min-aggregation definition can never
# silently diverge across the oracles that must certify the SAME
# signatures (dedup_minhash_lsh, the band sweep, the cost census, the
# estimator calibration)
_MINHASH_SIGS = r"""seeded AS (
  SELECT id, seed, md5(CAST(seed AS VARCHAR) || '|' || shingle) AS h
  FROM sh CROSS JOIN (SELECT unnest(range(16)) AS seed)
),
sigs AS (SELECT id, seed, MIN(h) AS minhash FROM seeded GROUP BY id, seed)"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
_TEXT_PROFILE_ORACLE = rf"""WITH {_NORM}, {_TOKS},
base AS (
  SELECT d.doc_id, d.text, n.t, tk,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
         ' ' || n.t || ' ' AS p
  FROM documents d JOIN norm n ON n.id = d.doc_id JOIN toks USING (id)
),
scored AS (
  SELECT *,
    CAST((length(p) - length(replace(p, ' the ', ''))) / 5
       + (length(p) - length(replace(p, ' a ', ''))) / 3
       + (length(p) - length(replace(p, ' of ', ''))) / 4 AS BIGINT) AS en_score,
    CAST((length(p) - length(replace(p, ' der ', ''))) / 5
       + (length(p) - length(replace(p, ' die ', ''))) / 5
       + (length(p) - length(replace(p, ' und ', ''))) / 5 AS BIGINT) AS de_score,
    CAST((length(p) - length(replace(p, ' el ', ''))) / 4
       + (length(p) - length(replace(p, ' la ', ''))) / 4
       + (length(p) - length(replace(p, ' los ', ''))) / 5 AS BIGINT) AS es_score,
    CAST((length(p) - length(replace(p, ' le ', ''))) / 4
       + (length(p) - length(replace(p, ' les ', ''))) / 5
       + (length(p) - length(replace(p, ' et ', ''))) / 4 AS BIGINT) AS fr_score
  FROM base
)
SELECT doc_id,
  n_tokens,
  n_distinct_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
  md5(t) AS fingerprint,
  md5(array_to_string(list_sort(list_distinct(tk)), ' ')) AS bow_fingerprint,
  CASE WHEN en_score = greatest(en_score, de_score, es_score, fr_score) AND en_score > 0 THEN 'en'
       WHEN de_score = greatest(en_score, de_score, es_score, fr_score) AND de_score > 0 THEN 'de'
       WHEN es_score = greatest(en_score, de_score, es_score, fr_score) AND es_score > 0 THEN 'es'
       WHEN fr_score = greatest(en_score, de_score, es_score, fr_score) AND fr_score > 0 THEN 'fr'
       ELSE 'und' END AS lang_pred,
  floor((0.4 * least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0
      + 0.3 * CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      + 0.3 * least(CAST(en_score AS DOUBLE) * 5.0 / CAST(n_tokens AS DOUBLE), 1.0)) * 10000.0) / 10000.0 AS quality
FROM scored"""


@query("text_profile", _TEXT_PROFILE_ORACLE)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass text profile: token counts, punctuation, fingerprints,
    language-ID heuristic, quality score — all map-side Catalyst."""
    docs = testdata.load(spark, sf_dir, "documents")
    return X.analyze(docs).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "n_bpe_tokens", "n_punct",
        "fingerprint", "bow_fingerprint", "lang_pred", "quality",
    )


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    r"""WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents
)
SELECT md5(t) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM norm GROUP BY md5(t)""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-content fingerprint;
    keeps the minimum doc_id per group."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.exact_dedup_groups(docs)


_JACCARD_ORACLE = rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES},
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
WHERE ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= 0.5"""


@query("dedup_jaccard_pairs", _JACCARD_ORACLE)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bigram-shingle Jaccard near-dup pairs (J >= 0.5); the byte gate
    picks the dense-BLAS strategy at this corpus size — recovers the
    corpus's planted near-duplicates."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, n=2, threshold=0.5)


# The capped twin applies the IDENTICAL df filter and recomputes set sizes
# post-filter — certifying the skew guard's exact semantics, not just the
# happy path. NOTE the cap REDEFINES the shingle sets: a pair whose overlap
# includes capped stop-shingles scores differently from the uncapped run
# (and a pair overlapping ONLY in capped shingles disappears) — capped and
# uncapped outputs are not interchangeable (pinned in
# tests/test_pipeline_ops.py::test_jaccard_df_cap_drops_stop_shingle_pairs).
_JACCARD_CAPPED_ORACLE = rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES.replace("sh AS", "sh0 AS")},
rare AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 40),
sh AS (SELECT sh0.* FROM sh0 JOIN rare USING (shingle)),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
WHERE ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= 0.5"""


@query("dedup_jaccard_inverted", _JACCARD_CAPPED_ORACLE)
def dedup_jaccard_inverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME operator forced onto the postings sparse strategy (byte
    gate 0 -> full inverted-index self-join + length filter, no driver
    collect), WITH the max_shingle_df skew guard active — the exact
    configuration the strategy would run with at scale, so the guard's
    set-redefining semantics carry an oracle row of their own (the DuckDB
    twin applies the identical df cap)."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.jaccard_pairs(
        docs,
        n=2,
        threshold=0.5,
        dense_bytes_limit=0,
        sparse_strategy="postings",
        max_shingle_df=40,
    )


@query("dedup_jaccard_prefix", _JACCARD_ORACLE)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-robust sparse strategy: AllPairs-style prefix filtering
    under a global hash order (map-side array slice), candidate pairs only
    from prefix-shingle buckets, exact array_intersect verify — the path
    that survives stop-shingle-heavy corpora where posting lists go
    quadratic. Same oracle as the dense and postings paths."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.jaccard_pairs(
        docs, n=2, threshold=0.5, dense_bytes_limit=0, sparse_strategy="prefix"
    )


_MINHASH_ORACLE = rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES},
{_MINHASH_SIGS},
bands AS (
  SELECT id, CAST(seed // 4 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_sig
  FROM sigs GROUP BY id, seed // 4
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id
),
est AS (
  SELECT sa.id AS id_a, sb.id AS id_b, COUNT(*) AS n_eq
  FROM sigs sa JOIN sigs sb
    ON sa.seed = sb.seed AND sa.id < sb.id AND sa.minhash = sb.minhash
  GROUP BY sa.id, sb.id
)
SELECT c.id_a, c.id_b, ROUND(e.n_eq / 16.0, 6) AS est_jaccard
FROM cand c JOIN est e ON e.id_a = c.id_a AND e.id_b = c.id_b"""


@query("dedup_minhash_lsh", _MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (k=16) + LSH (4 bands x 4 rows) candidate pairs with
    estimated Jaccard — the sub-quadratic scale path for corpus dedup."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.lsh_candidate_pairs(docs, k=16, bands=4, n=2)


_SIMHASH_ORACLE = rf"""WITH {_NORM}, {_TOKS},
tok AS (SELECT id, unnest(list_distinct(tk)) AS tok FROM toks),
th AS (SELECT id, md5(tok) AS h FROM tok),
pos AS (
  SELECT CAST(j AS INT) AS j, CAST(j // 4 + 1 AS INT) AS nib_pos,
         CASE CAST(j % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END AS divisor
  FROM (SELECT unnest(range(64)) AS j)
),
bits AS (
  SELECT id, j,
         CAST(((instr('0123456789abcdef', substr(h, nib_pos, 1)) - 1) // divisor) % 2 AS INT) AS bit
  FROM th CROSS JOIN pos
),
sums AS (SELECT id, j, SUM(bit * 2 - 1) AS s FROM bits GROUP BY id, j),
sbits AS (SELECT id, j, CASE WHEN s > 0 THEN 1 ELSE 0 END AS sbit FROM sums),
nibbles AS (
  SELECT id, CAST(j // 4 AS INT) AS nib,
         SUM(sbit * (CASE CAST(j % 4 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)) AS v
  FROM sbits GROUP BY id, j // 4
)
SELECT id AS doc_id, string_agg(substr('0123456789abcdef', CAST(v AS INT) + 1, 1), '' ORDER BY nib) AS simhash
FROM nibbles GROUP BY id"""


@query("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signature per document (hex string); near-dup pairs =
    low Hamming distance between signatures."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.simhash64(docs).select(F.col("id").alias("doc_id"), "simhash")


_SIMHASH_PAIRS_ORACLE = rf"""WITH sigs AS ({_SIMHASH_ORACLE.replace("SELECT id AS doc_id", "SELECT id")}),
banded AS (
  SELECT id, simhash, band, substr(simhash, band * 4 + 1, 4) AS band_val
  FROM sigs CROSS JOIN (SELECT CAST(unnest(range(4)) AS INT) AS band)
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.simhash AS sim_a, b.simhash AS sim_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id
)
SELECT id_a, id_b, {D.hamming_hex_sql("sim_a", "sim_b", xor_fn="duckdb")} AS hamming
FROM cand
WHERE {D.hamming_hex_sql("sim_a", "sim_b", xor_fn="duckdb")} <= 3"""


@query("dedup_simhash_pairs", _SIMHASH_PAIRS_ORACLE)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3) via pigeonhole banding: pairs
    within 3 bit flips share one of 4 verbatim 16-bit bands, so candidates
    come from a bucket-local equi-join, verified by a codegen'd
    nibble-XOR-popcount expression."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(docs, max_hamming=3, bands=4)


# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------
def _dot_sql(a: str, b: str) -> str:
    terms = " + ".join(
        f"CAST({a}.embedding[{i}] AS DOUBLE) * CAST({b}.embedding[{i}] AS DOUBLE)"
        for i in range(1, 65)
    )
    return f"({terms})"


_COS_SQL = (
    f"{_dot_sql('a', 'b')} / sqrt({_dot_sql('a', 'a')} * {_dot_sql('b', 'b')})"
)

_KNN_ORACLE = f"""WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND({_COS_SQL}, 6) AS cos_sim
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.vec_id IN (0, 1, 2, 3, 4)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5"""


@query("knn_cosine_topk", _KNN_ORACLE)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 5 query vectors — the ANN
    correctness baseline (broadcast queries, corpus streams)."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.knn_brute_force(emb, [0, 1, 2, 3, 4], k=5)


@query(
    "embedding_near_dup",
    f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS_SQL}, 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND({_COS_SQL}, 6) >= 0.3""",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.3 on this corpus)."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.cosine_near_dup_pairs(emb, 0.3)


_BUCKET_ORACLE = f"""SELECT a.vec_id,
  string_agg(CASE WHEN {_dot_sql('a', 'b')} >= 0 THEN '1' ELSE '0' END, '' ORDER BY b.vec_id) AS bucket
FROM embeddings a JOIN embeddings b ON b.vec_id IN (0, 1, 2, 3, 4, 5, 6, 7)
GROUP BY a.vec_id"""


@query("ann_lsh_buckets", _BUCKET_ORACLE)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing (8 anchor vectors -> 8-bit bucket id)
    — the map-side half of bucketed ANN."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") <= 7).select(
        F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("anchor_vec")
    )
    return S.hyperplane_buckets(emb, anchors)


_IVF_ORACLE = f"""WITH cents AS (
  SELECT vec_id AS cent_id, embedding FROM embeddings WHERE vec_id BETWEEN 8 AND 15
),
assign AS (
  SELECT a.vec_id, b.cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND({_COS_SQL}, 6) DESC, b.cent_id ASC
         ) AS rnk
  FROM embeddings a CROSS JOIN cents b
),
cells AS (SELECT vec_id AS neighbor_id, cent_id AS cell FROM assign WHERE rnk = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM assign
  WHERE vec_id IN (0, 1, 2, 3, 4) AND rnk <= 2
),
cand AS (
  SELECT p.query_id, c.neighbor_id FROM probes p
  JOIN cells c ON c.cell = p.cell AND c.neighbor_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, ROUND({_COS_SQL}, 6) AS cos_sim
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.query_id
  JOIN embeddings b ON b.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5"""


@query("ann_ivf_topk", _IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: 8 coarse centroids (vec_ids 8-15), each vector in its
    nearest cell, queries probe their 2 nearest cells and rank exactly
    within them — the cell-local scale path next to the LSH variant."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id").between(8, 15)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    return S.ivf_ann_topk(emb, cents, [0, 1, 2, 3, 4], k=5, nprobe=2)


_LSH_TOPK_ORACLE = f"""WITH buckets AS ({_BUCKET_ORACLE}),
q AS (SELECT vec_id AS query_id, bucket FROM buckets WHERE vec_id IN (0, 1, 2, 3, 4)),
cand AS (
  SELECT q.query_id, c.vec_id AS neighbor_id
  FROM q JOIN buckets c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, ROUND({_COS_SQL}, 6) AS cos_sim
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.query_id
  JOIN embeddings b ON b.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5"""


# Serving-route candidate-volume census: how many corpus vectors each
# route scores per query. The IVF/LSH candidate CTEs are the topk
# oracles' own, with the rank windows replaced by per-query counts.
_ANN_COST_ORACLE = f"""WITH cents AS (
  SELECT vec_id AS cent_id, embedding FROM embeddings WHERE vec_id BETWEEN 8 AND 15
),
assign AS (
  SELECT a.vec_id, b.cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND({_COS_SQL}, 6) DESC, b.cent_id ASC
         ) AS rnk
  FROM embeddings a CROSS JOIN cents b
),
cells AS (SELECT vec_id AS neighbor_id, cent_id AS cell FROM assign WHERE rnk = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM assign
  WHERE vec_id IN (0, 1, 2, 3, 4) AND rnk <= 2
),
ivf_cand AS (
  SELECT p.query_id, c.neighbor_id FROM probes p
  JOIN cells c ON c.cell = p.cell AND c.neighbor_id <> p.query_id
),
buckets AS ({_BUCKET_ORACLE}),
q AS (SELECT vec_id AS query_id, bucket FROM buckets WHERE vec_id IN (0, 1, 2, 3, 4)),
lsh_cand AS (
  SELECT q.query_id, c.vec_id AS neighbor_id
  FROM q JOIN buckets c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings),
counts AS (
  SELECT 'brute_force' AS method, CAST(e.vec_id AS BIGINT) AS query_id,
         n.n_vecs - 1 AS n_scored
  FROM embeddings e, n WHERE e.vec_id IN (0, 1, 2, 3, 4)
  UNION ALL
  SELECT 'ivf' AS method, CAST(query_id AS BIGINT) AS query_id,
         CAST(COUNT(*) AS BIGINT) AS n_scored
  FROM ivf_cand GROUP BY query_id
  UNION ALL
  SELECT 'lsh' AS method, CAST(query_id AS BIGINT) AS query_id,
         CAST(COUNT(*) AS BIGINT) AS n_scored
  FROM lsh_cand GROUP BY query_id
),
scaffold AS (
  SELECT m.method, CAST(q.query_id AS BIGINT) AS query_id
  FROM (SELECT unnest(['brute_force', 'ivf', 'lsh']) AS method) m
  CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4]) AS query_id) q
)
SELECT s.method, s.query_id,
       CAST(COALESCE(c.n_scored, 0) AS BIGINT) AS n_scored
FROM scaffold s
LEFT JOIN counts c ON c.method = s.method AND c.query_id = s.query_id"""


@query("ann_cost_census", _ANN_COST_ORACLE)
def ann_cost_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-route candidate-volume census: per query, the number of
    corpus vectors brute force / IVF(2-probe) / hyperplane-LSH would
    score — the serving-side twin of dedup_cost_census and the exact
    quantity the threshold-pruned top-k shape bounds. Reuses the serving
    paths' own assignment projections, so counts are the routes' true
    candidate-set cardinalities; no scoring or ranking runs."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id").between(8, 15)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    anchors = emb.filter(F.col("vec_id") <= 7).select(
        F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("anchor_vec")
    )
    return S.ann_cost_census(emb, cents, anchors, [0, 1, 2, 3, 4], nprobe=2)


@query("ann_lsh_topk", _LSH_TOPK_ORACLE)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k within LSH buckets — exact ranking restricted to
    the query's bucket (recall vs the exact baseline is additionally
    asserted in tests/test_pipeline_ops.py)."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") <= 7).select(
        F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("anchor_vec")
    )
    return S.lsh_ann_topk(emb, anchors, [0, 1, 2, 3, 4], k=5)


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------
@query(
    "multimodal_manifest",
    """SELECT doc_id, 'text/plain' AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS content_md5
FROM documents""",
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media table manifest: typed metadata over opaque payloads."""
    docs = testdata.load(spark, sf_dir, "documents")
    m = M.to_media_table(docs)
    return m.select(
        "doc_id", "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
    )


@query(
    "multimodal_features",
    """SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_bytes,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE CAST(CAST(list_sum(list_transform(range(1, length(text) + 1),
                 i -> unicode(substring(text, CAST(i AS INT), 1)))) * 1000000
                 // length(text) AS BIGINT) AS DOUBLE) / 1000000 END AS byte_mean
FROM documents""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. The fake
    extractor's byte stats are exact integer arithmetic (floor-to-micros
    mean), so the documents table IS the oracle: payloads are the utf-8
    bytes of ``text`` and the corpus is ASCII, making per-char ``unicode()``
    the byte value."""
    docs = testdata.load(spark, sf_dir, "documents")
    return M.extract_features(M.to_media_table(docs)).drop("byte_histogram_head")


def _ppm_payload_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload) with a REAL P6 image synthesized per document —
    the deterministic fixture that lets the from-scratch PPM decode path
    (operators/multimodal.py decode_ppm) carry a full hash oracle: both
    engines can derive the expected pixels because the raster is the
    document's own ASCII text bytes, cycled to w*h*3 and framed by a
    'P6\\n{w} {h}\\n255\\n' header (w in 1..8 and h in 1..8 from doc_id).
    Built entirely with codegen'd string expressions — no UDF; at scale
    this stands in for a parquet binary column read straight off the
    scan. Empty-text docs get a truncated header ('P6\\n'), the poison
    pill that must cost one decode_ok=false row, never a task."""
    docs = testdata.load(spark, sf_dir, "documents")
    g = docs.selectExpr(
        "doc_id",
        "CAST(doc_id % 8 + 1 AS INT) AS w",
        "CAST((doc_id % 64) DIV 8 + 1 AS INT) AS h",
        "text",
    ).withColumn("n", F.col("w") * F.col("h") * F.lit(3))
    payload = F.when(
        F.length("text") > 0,
        F.concat(
            F.encode(
                F.format_string("P6\n%d %d\n255\n", F.col("w"), F.col("h")),
                "UTF-8",
            ),
            F.encode(
                F.expr(
                    "substring(repeat(text, CAST(n DIV length(text) AS INT) + 1), 1, n)"
                ),
                "UTF-8",
            ),
        ),
    ).otherwise(F.encode(F.lit("P6\n"), "UTF-8"))
    return g.select("doc_id", payload.alias("payload"))


# the oracle twin of _ppm_payload_view: w/h from doc_id, raster = text
# cycled to 3*w*h chars (ASCII corpus: 1 char == 1 byte == unicode()
# codepoint), NULL raster for the empty-text poison pill
_PPM_VIEW_SQL = """g AS (
  SELECT doc_id,
         CAST(doc_id % 8 + 1 AS INT) AS w,
         CAST((doc_id % 64) // 8 + 1 AS INT) AS h,
         text
  FROM documents
),
r AS (
  SELECT doc_id, w, h, w * h AS wh,
         CASE WHEN length(text) > 0
              THEN substring(repeat(text, CAST(3 * w * h // length(text) AS INT) + 1), 1, 3 * w * h)
         END AS raster
  FROM g
)"""


def _mean_channel_sql(offset: int) -> str:
    """Floor-to-micros per-channel mean over every 3rd raster byte —
    the exact integer arithmetic image_stats' decoder twin uses."""
    return (
        "CAST(list_sum(list_transform(range(0, wh), "
        f"i -> unicode(substring(raster, CAST({offset} + 3 * i AS INT), 1)))) "
        "* 1000000 // wh AS BIGINT) / 1000000.0"
    )


@query(
    "image_stats",
    f"""WITH {_PPM_VIEW_SQL}
SELECT doc_id,
  raster IS NOT NULL AS decode_ok,
  CASE WHEN raster IS NOT NULL THEN w END AS width,
  CASE WHEN raster IS NOT NULL THEN h END AS height,
  CASE WHEN raster IS NOT NULL THEN {_mean_channel_sql(1)} END AS mean_r,
  CASE WHEN raster IS NOT NULL THEN {_mean_channel_sql(2)} END AS mean_g,
  CASE WHEN raster IS NOT NULL THEN {_mean_channel_sql(3)} END AS mean_b
FROM r""",
)
def image_stats_decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, driver-certified: synthesized P6 payloads run
    through the from-scratch netpbm parser (header tokenizer, raster
    slice, numpy channel sums) and the oracle recomputes width/height and
    floor-to-micros channel means from the generating text bytes. Every
    byte of the decode path (operators/multimodal.py:105-258) is on the
    hash: a header-parse off-by-one, a channel swap, or a wrong poison-
    pill row all mismatch."""
    return M.image_stats(_ppm_payload_view(spark, sf_dir))


@query(
    "resize_image",
    f"""WITH {_PPM_VIEW_SQL}
SELECT doc_id,
  4 AS width, 4 AS height, CAST(59 AS BIGINT) AS n_bytes,
  md5('P6' || chr(10) || '4 4' || chr(10) || '255' || chr(10) ||
      list_aggregate(list_transform(range(0, 48),
        i -> substring(raster,
               CAST(1 + 3 * (((i // 12) * h // 4) * w + (((i % 12) // 3) * w // 4)) + (i % 3) AS INT),
               1)),
        'string_agg', '')) AS content_md5
FROM r WHERE raster IS NOT NULL""",
)
def resize_image_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize, driver-certified by content md5: the
    decode -> floor-mapped resample -> P6 re-encode path produces bytes
    whose md5 the oracle reconstructs character-by-character (src pixel
    (y * sh // 4, x * sw // 4), channel-preserving, 11-byte header + 48
    raster bytes). Undecodable payloads drop out (the operator contract;
    image_stats carries their verdicts)."""
    resized = M.resize_image(_ppm_payload_view(spark, sf_dir), width=4, height=4)
    return resized.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


def _jpeg_oracle() -> str:
    from . import artifacts_jpeg

    return artifacts_jpeg.expected_oracle_sql()


@query("image_stats_jpeg", _jpeg_oracle())
def image_stats_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The from-scratch baseline JPEG codec on a committed driver hash
    (VERDICT r8 task #3, frozen-artifact pattern): 18 recipe images —
    4:4:4 / 4:2:0 / 4:2:2 / 1x2 sampling, restart intervals, odd dims,
    DC-only flats, stuffing-heavy noise — are re-encoded from integer
    recipes by the encoder twin and decoded through the SAME Arrow-batched
    ``image_stats`` path as the PPM branch; the oracle replays the
    fixture-frozen channel means (``artifacts_jpeg.EXPECTED_STATS``,
    validated against pre-encode rasters at freeze time). Two poison
    pills (truncated scan, progressive SOF2) must each cost exactly one
    decode_ok=false row. The corpus is fixed by design — Huffman decode
    has no SQL twin, so scale certification rides the sf-scaled PPM
    branch (``image_stats``) while THIS row certifies codec bytes."""
    from . import artifacts_jpeg

    return M.image_stats(artifacts_jpeg.media_df(spark))


@query(
    "salted_event_type_counts",
    """WITH dim AS (
  SELECT DISTINCT event_type, upper(event_type) AS type_label FROM events
)
SELECT d.type_label, COUNT(*) AS n, CAST(ROUND(SUM(e.value), 2) AS DOUBLE) AS total_value
FROM events e JOIN dim d ON d.event_type = e.event_type
GROUP BY d.type_label""",
)
def salted_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join demo: event_type is a pathologically hot key (a
    handful of values over the whole fact table); the salted join spreads
    each hot key over 16 sub-keys. Oracle = the plain join, proving salting
    is semantics-free."""
    from .operators.util import salted_join

    ev = testdata.load(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().withColumn(
        "type_label", F.upper("event_type")
    )
    joined = salted_join(ev, dim, "event_type")
    return joined.groupBy("type_label").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).cast("double").alias("total_value"),
    )


@query(
    "sketch_error_bounds",
    """SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  TRUE AS approx_users_ok,
  CAST(ROUND(quantile_cont(value, 0.5), 6) AS DOUBLE) AS exact_median_value,
  TRUE AS approx_median_ok
FROM events""",
)
def sketch_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (HLL++ approx-distinct, GK approx-quantiles) next
    to their exact values — one partial-agg pass, no extra shuffle.

    Successor to the retired rows-only ``sketch_stats`` registration: raw
    sketch estimates are engine-specific (DuckDB's approx_distinct is a
    different HLL), but the DECISION each estimate supports is not — so
    the query emits the exact values plus boolean error-bound verdicts,
    all hash-comparable. The verdicts are deterministic: Spark's HLL++
    registers merge by max (partition-order free) and the GK bracket is
    p45..p55 while accuracy=10000 bounds rank error at n/10000, orders of
    magnitude inside the bracket. The raw estimate-vs-exact deltas stay
    pytest-asserted (tests/test_pipeline_ops.py) with tighter bounds."""
    ev = testdata.load(spark, sf_dir, "events")
    agg = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_median"),
        F.expr("percentile(value, 0.45D)").alias("p45"),
        F.expr("percentile(value, 0.5D)").alias("p50"),
        F.expr("percentile(value, 0.55D)").alias("p55"),
    )
    return agg.select(
        F.col("exact_users"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.lit(2.0), F.lit(0.06) * F.col("exact_users"))
        ).alias("approx_users_ok"),
        F.round(F.col("p50"), 6).cast("double").alias("exact_median_value"),
        F.col("approx_median").between(F.col("p45"), F.col("p55")).alias(
            "approx_median_ok"
        ),
    )


@query(
    "multimodal_frames",
    """WITH f AS (
  SELECT doc_id,
         (CAST(octet_length(encode(text)) AS BIGINT) + 99) // 100 AS n_frames
  FROM documents
)
SELECT doc_id,
  (n_frames + 1) // 2 AS n_sampled,
  2 * ((n_frames - 1) // 2) AS max_frame_idx
FROM f""",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1->N mapInPandas flatMap) summarized per doc; the
    oracle derives the sampled-frame arithmetic from payload lengths."""
    docs = testdata.load(spark, sf_dir, "documents")
    frames = M.sample_frames(M.to_media_table(docs), frame_bytes=100, every_n=2)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_sampled"),
        F.max("frame_idx").alias("max_frame_idx"),
    )


# ---------------------------------------------------------------------------
# Training-data curation (operators/curation.py): splits, packing, quotas,
# decontamination — all keyed on lexicographic md5 hex so the DuckDB twin is
# bit-identical.
# ---------------------------------------------------------------------------
_SPLIT_CASE = """CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
       ELSE 'test' END"""


@query(
    "dataset_split_counts",
    f"""SELECT {_SPLIT_CASE} AS split, source, COUNT(*) AS n
FROM documents GROUP BY split, source""",
)
def dataset_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split (12/2/2 sixteenths by first md5-hex char of
    the id), stratification summarized per source — the assignment is a
    map-side projection; only the tiny summary shuffles."""
    from .operators import curation as C

    docs = testdata.load(spark, sf_dir, "documents")
    return C.dataset_split(docs).groupBy("split", "source").agg(
        F.count("*").alias("n")
    )


@query(
    "pack_sequences_bins",
    rf"""WITH {_NORM}, {_TOKS},
base AS (
  SELECT id, substring(md5(CAST(id AS VARCHAR)), 1, 1) AS shard,
         CAST(len(tk) AS BIGINT) AS n_tok
  FROM toks
),
c AS (
  SELECT shard, id, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY id) - n_tok AS start_off
  FROM base
)
SELECT shard, CAST(FLOOR(start_off / 512) AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
FROM c GROUP BY shard, bin""",
)
def pack_sequences_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 512-token bins, windowed PER SHARD
    (16-way md5 sharding) so the cumulative sum never needs a global
    single-partition sort."""
    from .operators import curation as C

    docs = testdata.load(spark, sf_dir, "documents")
    return C.pack_sequences(docs, budget=512, shard_hex_chars=1)


@query(
    "source_quota_sample",
    """SELECT id, source, CAST(rk AS BIGINT) AS rk FROM (
  SELECT doc_id AS id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
WHERE rk <= 20""",
)
def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota (20 docs/source) by md5-hex order — a deterministic
    uniform shuffle, not crawl order; one window shuffle on source."""
    from .operators import curation as C

    docs = testdata.load(spark, sf_dir, "documents")
    return C.source_quota(docs, per_source=20).withColumn(
        "rk", F.col("rk").cast("bigint")
    )


_SHINGLES5 = r"""sh5 AS (
  SELECT id, unnest(list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4]
                                   for i in range(1, len(tk) - 3)])) AS shingle
  FROM toks
)"""


@query(
    "contamination_check",
    rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES5},
labeled AS (SELECT doc_id AS id, {_SPLIT_CASE} AS split FROM documents),
lsh AS (SELECT sh5.id, shingle, split FROM sh5 JOIN labeled USING (id)),
train_lex AS (SELECT DISTINCT shingle FROM lsh WHERE split = 'train'),
test_sh AS (SELECT id, shingle FROM lsh WHERE split = 'test')
SELECT t.id, COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN x.shingle IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_contaminated
FROM test_sh t LEFT JOIN train_lex x ON x.shingle = t.shingle
GROUP BY t.id""",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train->test 5-gram contamination per test doc: the train side
    reduces to a distinct-shingle lexicon before the join; zero-overlap
    test docs stay in the result via the left join."""
    from .operators import curation as C

    docs = testdata.load(spark, sf_dir, "documents")
    return C.contamination_check(docs, n=5)


_CLUSTERS_ORACLE = rf"""WITH RECURSIVE {_NORM}, {_TOKS}, {_SHINGLES},
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
jp AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
  WHERE ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= 0.5
),
edges AS (SELECT id_a AS x, id_b AS y FROM jp UNION SELECT id_b, id_a FROM jp),
reach(src, node) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.y FROM reach r JOIN edges e ON e.x = r.node
)
SELECT src AS id, MIN(node) AS comp FROM reach GROUP BY src"""


@query("dedup_clusters", _CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> duplicate clusters: iterative min-label propagation
    over the Jaccard pair graph (localCheckpoint-truncated lineage per
    round). comp = min reachable doc_id; the keep-one-per-cluster drop list
    follows as comp <> id. Oracle = DuckDB recursive-CTE fixpoint."""
    docs = testdata.load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, n=2, threshold=0.5)
    return D.dup_components(docs, pairs)


# ---------------------------------------------------------------------------
# Gopher-style repetition signals + PII scrubbing
# ---------------------------------------------------------------------------
_REPETITION_ORACLE = rf"""WITH {_NORM}, {_TOKS},
m AS (
  SELECT id AS doc_id, tk,
    CAST(len(tk) AS BIGINT) AS n_tokens,
    floor(CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
          / len(tk) * 10000.0) / 10000.0 AS mean_tok_len,
    floor(CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE)
          / len(tk) * 10000.0) / 10000.0 AS frac_dup_tokens
  FROM toks
),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bigram
  FROM m
),
bc AS (SELECT doc_id, bigram, COUNT(*) AS bn FROM bg GROUP BY doc_id, bigram),
agg AS (SELECT doc_id, MAX(bn) AS top_bigram_n, SUM(bn) AS n_bigrams FROM bc GROUP BY doc_id)
SELECT m.doc_id, m.n_tokens, m.mean_tok_len, m.frac_dup_tokens,
  CAST(agg.n_bigrams AS BIGINT) AS n_bigrams,
  CAST(agg.top_bigram_n AS BIGINT) AS top_bigram_n,
  floor(CAST(agg.top_bigram_n AS DOUBLE) / CAST(agg.n_bigrams AS DOUBLE) * 1000000.0)
    / 1000000.0 AS frac_top_bigram,
  (m.n_tokens >= 50
   AND floor(CAST(agg.top_bigram_n AS DOUBLE) / CAST(agg.n_bigrams AS DOUBLE) * 1000000.0)
       / 1000000.0 <= 0.08
   AND m.frac_dup_tokens <= 0.8) AS keep
FROM m JOIN agg USING (doc_id)"""


@query("repetition_profile", _REPETITION_ORACLE)
def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signals: duplicate-token fraction,
    mean token length (map-side) and top-bigram share (doc-local double
    agg), plus the keep/drop verdict."""
    docs = testdata.load(spark, sf_dir, "documents")
    return X.repetition_profile(docs)


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_ORACLE = rf"""{testdata.signups_cte("duckdb")},
lines AS (
  SELECT event_id, concat_ws(' ', username, email, ip, user_agent) AS line
  FROM signups
)
SELECT event_id,
  regexp_replace(regexp_replace(line, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_IP}', '<IP>', 'g') AS redacted,
  CAST(len(regexp_extract_all(line, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(regexp_replace(line, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                              '{_PII_IP}')) AS BIGINT) AS n_ips
FROM lines"""


@query("pii_scrub", _PII_ORACLE)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over reconstructed signup log lines: redact emails then
    IPv4s, reporting per-row hit counts. Pure map-side regexp — the RE2-safe
    patterns evaluate identically in the DuckDB oracle."""
    from .operators import pii as P

    lines = testdata.signups_df(spark, sf_dir).select(
        "event_id",
        F.concat_ws(" ", "username", "email", "ip", "user_agent").alias("line"),
    )
    return P.scrub(lines, "line", "event_id")


@query("dedup_clusters_star", _CLUSTERS_ORACLE)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clusters via alternating large-star/small-star (O(log diameter)
    rounds) — the scale path for adversarially deep pair graphs. Shares
    dedup_clusters' recursive-CTE oracle: both must produce the identical
    component map."""
    docs = testdata.load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, n=2, threshold=0.5)
    return D.dup_components_star(docs, pairs)


# (ann_ivf_trained is registered near the frozen-artifact oracle helpers
# further down — it serves from the frozen Lloyd-trained centroids and
# carries a full hash oracle; inline float kmeans_fit training stays
# pytest-pinned via its numpy twin and hash-certified via the quantized
# ann_kmeans_cells_q / ann_ivf_trained_q pair.)


@query(
    "dedup_corpus",
    rf"""WITH comp AS ({_CLUSTERS_ORACLE})
SELECT d.doc_id, d.source, d.lang, d.n_chars
FROM documents d JOIN comp ON comp.id = d.doc_id
WHERE comp.id = comp.comp""",
)
def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup REMOVAL: the full dedup pipeline applied —
    shingle -> Jaccard pairs -> connected components -> keep one canonical
    doc (the min doc_id) per cluster, singletons untouched. The keep-set
    (id == comp) includes every singleton, so it is CORPUS-sized — a
    forced broadcast of it is a driver OOM at real scale. The filter
    therefore anti-joins the DROPPED ids (id != comp — non-canonical dup
    members only, bounded by pair membership, empty when nothing
    duplicates) with no hint: AQE broadcasts the drop-set when it is
    small (the common case) and falls back to a shuffled anti join when
    a dup-heavy corpus makes it large.

    NULL ``doc_id`` rows are dropped explicitly: the keep-set semi join
    this replaced never matched them (NULL equals nothing), but an ANTI
    join inverts that default and would silently KEEP them — the filter
    preserves the original (and the oracle's) semantics."""
    docs = testdata.load(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    pairs = D.jaccard_pairs(docs, n=2, threshold=0.5)
    comp = D.dup_components_star(docs, pairs)
    drop = comp.filter(F.col("id") != F.col("comp")).select("id")
    return docs.join(
        drop, docs["doc_id"] == drop["id"], "left_anti"
    ).select("doc_id", "source", "lang", "n_chars")


@query(
    "dedup_incremental",
    rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES},
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS new_id, b.id AS old_id, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.id % 2 = 1 AND b.id % 2 = 0
  GROUP BY a.id, b.id
)
SELECT new_id, old_id,
       ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.id = new_id JOIN sizes sb ON sb.id = old_id
WHERE ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= 0.5""",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup: near-dups of a NEW batch (odd doc ids)
    against the EXISTING corpus (even ids) — the cross-corpus inverted
    join that replaces re-running the quadratic self-join over all
    history on every batch."""
    docs = testdata.load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    return D.jaccard_pairs_between(new, old, n=2, threshold=0.5)


_LEXICON_ORACLE = rf"""WITH {_NORM}, {_TOKS},
tok AS (SELECT id, unnest(tk) AS tok FROM toks),
freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
lex AS (SELECT tok FROM freq ORDER BY cnt DESC, tok ASC LIMIT 1000),
cov AS (
  SELECT t.id, COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN l.tok IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_in_lex
  FROM tok t LEFT JOIN lex l ON l.tok = t.tok
  GROUP BY t.id
),
covfull AS (
  SELECT d.doc_id AS id,
         CAST(COALESCE(c.n_tokens, 0) AS BIGINT) AS n_tokens,
         CAST(COALESCE(c.n_in_lex, 0) AS BIGINT) AS n_in_lex
  FROM documents d LEFT JOIN cov c ON c.id = d.doc_id
)
SELECT id, n_tokens, n_in_lex,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE floor(CAST(n_in_lex AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1000000.0) / 1000000.0
       END AS lex_ratio,
       n_tokens > 0 AND
       (CASE WHEN n_tokens = 0 THEN 0.0
             ELSE floor(CAST(n_in_lex AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 1000000.0) / 1000000.0
        END) >= 0.8 AS keep
FROM covfull"""


@query("lexicon_coverage", _LEXICON_ORACLE)
def lexicon_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-lexicon coverage quality signal: fraction of each doc's
    token occurrences covered by the corpus's top-1000 token lexicon
    (deterministic tie-break), all-integer until one floor-quantized
    division. The lexicon is built with a distributed top-k
    (TakeOrderedAndProject) and joins back as a broadcast set."""
    docs = testdata.load(spark, sf_dir, "documents")
    return X.lexicon_coverage(docs, lexicon_size=1000, min_ratio=0.8)


@query(
    "curation_gate",
    rf"""WITH rep AS ({_REPETITION_ORACLE}),
lexq AS ({_LEXICON_ORACLE}),
prof AS ({_TEXT_PROFILE_ORACLE})
SELECT p.doc_id, p.lang_pred, l.lex_ratio, r.frac_top_bigram,
       COALESCE(r.keep, FALSE) AS keep_repetition, l.keep AS keep_lexicon,
       p.lang_pred <> 'und' AS keep_lang,
       (COALESCE(r.keep, FALSE) AND l.keep AND p.lang_pred <> 'und') AS keep
FROM prof p
LEFT JOIN rep r ON r.doc_id = p.doc_id
JOIN lexq l ON l.id = p.doc_id""",
)
def curation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation POLICY layer: one keep/drop verdict per document from
    the conjunction of the repetition filter (Gopher-style), the
    lexicon-coverage filter, and language identification. Each signal is
    an independently-oracled operator; this query is their id-keyed join
    (AQE plans the three agg outputs, all partitioned on doc id) — the
    shape a production gate takes when signals are maintained as separate
    incremental tables rather than one monolithic scan.

    EVERY document gets a verdict: the profile base covers all docs
    (map-side), lexicon_coverage emits explicit zero-token rows, and the
    repetition signal — absent for docs with < 2 tokens — left-joins with
    keep_repetition defaulting to FALSE (a doc too short to even measure
    repetition is not training data)."""
    docs = testdata.load(spark, sf_dir, "documents")
    rep = X.repetition_profile(docs).select(
        "doc_id",
        "frac_top_bigram",
        F.col("keep").alias("keep_repetition"),
    )
    lex = X.lexicon_coverage(docs).select(
        F.col("id").alias("doc_id"),
        "lex_ratio",
        F.col("keep").alias("keep_lexicon"),
    )
    prof = X.analyze(docs).select("doc_id", "lang_pred")
    return (
        prof.join(rep, "doc_id", "left")
        .join(lex, "doc_id")
        .select(
            "doc_id",
            "lang_pred",
            "lex_ratio",
            "frac_top_bigram",
            F.coalesce("keep_repetition", F.lit(False)).alias("keep_repetition"),
            "keep_lexicon",
            (F.col("lang_pred") != "und").alias("keep_lang"),
            (
                F.coalesce("keep_repetition", F.lit(False))
                & F.col("keep_lexicon")
                & (F.col("lang_pred") != "und")
            ).alias("keep"),
        )
    )


_LSH_MULTIPROBE_ORACLE = f"""WITH buckets AS ({_BUCKET_ORACLE}),
q0 AS (SELECT vec_id AS query_id, bucket FROM buckets WHERE vec_id IN (0, 1, 2, 3, 4)),
probes AS (
  SELECT query_id, bucket AS probe FROM q0
  UNION
  SELECT query_id,
         substring(bucket, 1, i - 1)
         || (CASE WHEN substring(bucket, i, 1) = '1' THEN '0' ELSE '1' END)
         || substring(bucket, i + 1) AS probe
  FROM q0 CROSS JOIN (SELECT unnest(range(1, 9)) AS i)
),
cand AS (
  SELECT p.query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN buckets c ON c.bucket = p.probe AND c.vec_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, ROUND({_COS_SQL}, 6) AS cos_sim
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.query_id
  JOIN embeddings b ON b.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5"""


@query("ann_lsh_multiprobe", _LSH_MULTIPROBE_ORACLE)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k (own bucket + every Hamming-1 neighbor
    bucket): recovers near neighbors that fell just across one
    hyperplane. Probe expansion is per-query and map-side; the corpus
    keeps its single-bucket projection. Recall >= the single-probe
    ann_lsh_topk by construction (superset of candidates), asserted in
    tests/test_pipeline_ops.py."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") <= 7).select(
        F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("anchor_vec")
    )
    return S.lsh_ann_topk_multiprobe(emb, anchors, [0, 1, 2, 3, 4], k=5)


@query(
    "paragraph_dedup",
    r"""WITH docs2 AS (
  SELECT doc_id AS id, text || '. all rights reserved footer. contact us at example' AS text
  FROM documents
),
sp AS (SELECT id, string_split(text, '. ') AS ps FROM docs2),
paras AS (
  SELECT id, unnest(range(1, len(ps) + 1)) - 1 AS pos, unnest(ps) AS para FROM sp
),
keyed AS (
  SELECT id, pos, para,
         md5(regexp_replace(trim(lower(para)), '\s+', ' ', 'g')) AS pkey
  FROM paras WHERE trim(para) <> ''
),
block AS (SELECT pkey FROM keyed GROUP BY pkey HAVING COUNT(DISTINCT id) >= 2),
kept AS (SELECT k.* FROM keyed k LEFT JOIN block b ON b.pkey = k.pkey WHERE b.pkey IS NULL),
rebuilt AS (
  SELECT id, string_agg(para, '. ' ORDER BY pos) AS clean_text,
         COUNT(*) AS n_paras_kept
  FROM kept GROUP BY id
)
SELECT d.id, COALESCE(r.clean_text, '') AS clean_text,
       CAST(COALESCE(r.n_paras_kept, 0) AS BIGINT) AS n_paras_kept
FROM (SELECT doc_id AS id FROM documents) d
LEFT JOIN rebuilt r ON r.id = d.id""",
)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma/CCNet-style paragraph-level boilerplate removal, demonstrated
    on a corpus where every doc carries two injected boilerplate
    paragraphs (same construction in the oracle): paragraphs appearing in
    >= 2 docs drop, the unique remainder reassembles in order. The
    blocklist is one (hash -> doc-frequency) aggregate; reconstruction
    sorts (pos, para) structs so output never depends on shuffle order."""
    docs = testdata.load(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(F.col("text"), F.lit(". all rights reserved footer. contact us at example")),
    )
    return D.paragraph_dedup(docs, min_df=2)


# ---------------------------------------------------------------------------
# TRAINED PQ / IVF+PQ serving over FROZEN artifacts (artifacts.py): the
# codebooks and coarse centroids are genuine Lloyd-converged trainings
# (pq_fit iters=5 / kmeans_fit iters=3 over sf0.001), trained offline
# once and shipped as full-precision literals — the production serving
# shape. With the artifact identical on both sides, encode, ADC lookups,
# and cell assignment are the proven deterministic left-fold chains, so
# both queries carry FULL value-hash oracles (they were rows-only while
# training ran inline with the query).
# ---------------------------------------------------------------------------
_PQ_M, _PQ_K, _PQ_DSUB = 16, 16, 4


def _pq_frozen_cents_sql() -> str:
    """The frozen PQ codebooks as a (j, c, d1..d4, nb) VALUES table —
    repr'd doubles parse exactly, nb is the same left-fold self-dot
    literal Spark inlines."""
    from .artifacts import PQ_BOOKS
    from .operators.similarity import _self_dot_py

    rows = []
    for j, book in enumerate(PQ_BOOKS):
        for c, cv in enumerate(book):
            ds = ", ".join(f"CAST({x!r} AS DOUBLE)" for x in cv)
            rows.append(f"({j}, {c}, {ds}, CAST({_self_dot_py(cv)!r} AS DOUBLE))")
    return (
        "cents AS (SELECT * FROM (VALUES\n  "
        + ",\n  ".join(rows)
        + "\n) AS t(j, c, d1, d2, d3, d4, nb))"
    )


def _pq_frozen_serving_sql(query_pred: str) -> str:
    """codes + qtab CTEs against the frozen codebook table — the exact
    _pq_adc_codes_sql chains, with literal codewords instead of
    data-derived ones."""
    adot = " + ".join(
        f"CAST(a.embedding[ct.j * {_PQ_DSUB} + {i}] AS DOUBLE) * ct.d{i}"
        for i in range(1, _PQ_DSUB + 1)
    )
    qdot = " + ".join(
        f"CAST(q.embedding[ct.j * {_PQ_DSUB} + {i}] AS DOUBLE) * ct.d{i}"
        for i in range(1, _PQ_DSUB + 1)
    )
    return f"""dists AS (
  SELECT a.vec_id, ct.j, ct.c, -2.0 * ({adot}) + ct.nb AS dist
  FROM embeddings a CROSS JOIN cents ct
),
codes AS (
  SELECT vec_id, j, c AS code FROM (
    SELECT vec_id, j, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist ASC, c ASC) AS rn
    FROM dists) WHERE rn = 1
),
qtab AS (
  SELECT q.vec_id AS query_id, ct.j, ct.c, ({qdot}) AS ip
  FROM embeddings q CROSS JOIN cents ct
  WHERE {query_pred}
)"""


_PQ_FROZEN_ORACLE = f"""WITH {_pq_frozen_cents_sql()},
{_pq_frozen_serving_sql("q.vec_id IN (0, 1, 2, 3, 4)")},
scored AS (
  SELECT t.query_id, cd.vec_id AS neighbor_id,
         ROUND(list_sum(list(t.ip ORDER BY t.j)), 6) AS approx_ip
  FROM codes cd JOIN qtab t ON t.j = cd.j AND t.c = cd.code
  WHERE cd.vec_id <> t.query_id
  GROUP BY t.query_id, cd.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY approx_ip DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, approx_ip, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10"""


# Codebook distortion: the rn=1 row keeps its DIST; err = dist + x.x,
# quantized to integer micro-units per (vector, subspace) row before the
# 16-group sum, so no float crosses an aggregation.
def _pq_distort_oracle() -> str:
    adot = " + ".join(
        f"CAST(a.embedding[ct.j * {_PQ_DSUB} + {i}] AS DOUBLE) * ct.d{i}"
        for i in range(1, _PQ_DSUB + 1)
    )
    sdot = " + ".join(
        f"CAST(a.embedding[cd.j * {_PQ_DSUB} + {i}] AS DOUBLE) * "
        f"CAST(a.embedding[cd.j * {_PQ_DSUB} + {i}] AS DOUBLE)"
        for i in range(1, _PQ_DSUB + 1)
    )
    return f"""WITH {_pq_frozen_cents_sql()},
dists AS (
  SELECT a.vec_id, ct.j, ct.c, -2.0 * ({adot}) + ct.nb AS dist
  FROM embeddings a CROSS JOIN cents ct
),
codes AS (
  SELECT vec_id, j, dist FROM (
    SELECT vec_id, j, c, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist ASC, c ASC) AS rn
    FROM dists) WHERE rn = 1
),
err AS (
  SELECT cd.j,
         CAST(round((cd.dist + ({sdot})) * 1000000.0) AS BIGINT) AS err_micro
  FROM codes cd JOIN embeddings a ON a.vec_id = cd.vec_id
)
SELECT CAST(j AS BIGINT) AS subspace, CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(SUM(err_micro) AS BIGINT) AS total_err_micro,
  CAST(SUM(err_micro) // COUNT(*) AS BIGINT) AS mean_err_micro
FROM err GROUP BY j"""


@query("ann_pq_distortion", _pq_distort_oracle())
def ann_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subquantizer distortion of the frozen PQ codebooks over the
    corpus — total and mean squared reconstruction error in integer
    micro-units for each of the 16 subspaces: the codebook-quality table
    next to the serving recall eval (an outlier subspace means an
    under-trained book or a scale-skewed dimension block). Physical
    shape: the certified encode pass, a 16-row explode per vector, a
    broadcast join against the 256-row codeword table, map-side folds in
    the oracle's exact associativity, a 16-group aggregation."""
    from .artifacts import pq_books

    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.pq_distortion_census(emb, pq_books())


@query("ann_pq_topk", _PQ_FROZEN_ORACLE)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (IVF's memory-side companion): 64-dim
    float vectors compress to 16 one-byte codes (32x), queries score the
    corpus by asymmetric-distance table lookups — the full vectors are
    read once to encode and never shuffled. Codebooks are the FROZEN
    Lloyd-trained artifact (artifacts.py), so the whole trained serving
    path hash-checks; recall vs the exact baseline stays pinned in
    tests/test_pipeline_ops.py."""
    from .artifacts import pq_books

    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.pq_ann_topk(emb, pq_books(), [0, 1, 2, 3, 4], k=10)


def _ivf_frozen_cents_sql() -> str:
    """The frozen IVF coarse centroids as (cent_id, cv list-literal, nb)
    rows."""
    from .artifacts import IVF_CENTROIDS
    from .operators.similarity import _self_dot_py

    rows = []
    for cid, cv in IVF_CENTROIDS:
        lit = "[" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in cv) + "]"
        rows.append(
            f"SELECT {cid} AS cent_id, {lit} AS cv, "
            f"CAST({_self_dot_py(cv)!r} AS DOUBLE) AS nb"
        )
    return "ivf_cents AS (\n  " + "\n  UNION ALL ".join(rows) + "\n)"


def _ivf_frozen_assign_sql() -> str:
    adot = " + ".join(
        f"CAST(a.embedding[{i}] AS DOUBLE) * ct.cv[{i}]" for i in range(1, 65)
    )
    na = _dot_sql("a", "a")
    return f"""assign AS (
  SELECT a.vec_id, ct.cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND(({adot}) / sqrt({na} * ct.nb), 6) DESC, ct.cent_id ASC
         ) AS rnk
  FROM embeddings a CROSS JOIN ivf_cents ct
)"""


_IVFPQ_FROZEN_ORACLE = f"""WITH {_pq_frozen_cents_sql()},
{_pq_frozen_serving_sql("q.vec_id IN (0, 1, 2, 3, 4)")},
{_ivf_frozen_cents_sql()},
{_ivf_frozen_assign_sql()},
cells AS (SELECT vec_id AS neighbor_id, cent_id AS cell FROM assign WHERE rnk = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM assign
  WHERE vec_id IN (0, 1, 2, 3, 4) AND rnk <= 2
),
cand AS (
  SELECT p.query_id, c.neighbor_id FROM probes p
  JOIN cells c ON c.cell = p.cell AND c.neighbor_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND(list_sum(list(t.ip ORDER BY t.j)), 6) AS approx_ip
  FROM cand
  JOIN codes cd ON cd.vec_id = cand.neighbor_id
  JOIN qtab t ON t.query_id = cand.query_id AND t.j = cd.j AND t.c = cd.code
  GROUP BY cand.query_id, cand.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY approx_ip DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, approx_ip, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5"""


@query("ann_ivfpq_topk", _IVFPQ_FROZEN_ORACLE)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ end to end: coarse cells bound candidates, PQ codes make
    scoring m table lookups — the complete FAISS-style serving
    composition, with BOTH trained parts (coarse centroids + codebooks)
    frozen artifacts, so the whole path hash-checks; recall pinned in
    pytest."""
    from .artifacts import ivf_centroids_df, pq_books

    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.ivfpq_ann_topk(
        emb, ivf_centroids_df(spark), pq_books(), [0, 1, 2, 3, 4], k=5, nprobe=2
    )


# ---------------------------------------------------------------------------
# PQ with ITERATION-FREE codebooks: the deterministic first-k-by-md5 sample
# init IS the codebook (no Lloyd rounds), which makes the entire encode ->
# ADC-score -> rank serving path SQL-expressible — the DuckDB twin derives
# the identical codewords from the data, so the ADC machinery itself gets a
# full hash check, independent of any artifact (the frozen-artifact
# ann_pq_topk/ann_ivfpq_topk above certify the TRAINED serving path).
# Determinism contract: every dot product on both sides is the left-fold
# sum chain (see operators/similarity.py docstring).
# ---------------------------------------------------------------------------


def _pq_adc_cents_sql() -> str:
    comps = ",\n         ".join(
        f"CAST(embedding[j * {_PQ_DSUB} + {i}] AS DOUBLE) AS d{i}"
        for i in range(1, _PQ_DSUB + 1)
    )
    return f"""samp AS (
  SELECT embedding,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c
  FROM embeddings
),
cents AS (
  SELECT j, c,
         {comps}
  FROM samp CROSS JOIN (SELECT CAST(unnest(range({_PQ_M})) AS INT) AS j)
  WHERE c < {_PQ_K}
)"""


def _pq_adc_codes_sql() -> str:
    adot = " + ".join(
        f"CAST(a.embedding[ct.j * {_PQ_DSUB} + {i}] AS DOUBLE) * ct.d{i}"
        for i in range(1, _PQ_DSUB + 1)
    )
    nb = " + ".join(f"ct.d{i} * ct.d{i}" for i in range(1, _PQ_DSUB + 1))
    qdot = " + ".join(
        f"CAST(q.embedding[ct.j * {_PQ_DSUB} + {i}] AS DOUBLE) * ct.d{i}"
        for i in range(1, _PQ_DSUB + 1)
    )
    return f"""dists AS (
  SELECT a.vec_id, ct.j, ct.c, -2.0 * ({adot}) + ({nb}) AS dist
  FROM embeddings a CROSS JOIN cents ct
),
codes AS (
  SELECT vec_id, j, c AS code FROM (
    SELECT vec_id, j, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY dist ASC, c ASC) AS rn
    FROM dists) WHERE rn = 1
),
qtab AS (
  SELECT q.vec_id AS query_id, ct.j, ct.c, ({qdot}) AS ip
  FROM embeddings q CROSS JOIN cents ct
  WHERE q.vec_id IN (0, 1, 2, 3, 4)
)"""


_PQ_ADC_ORACLE = f"""WITH {_pq_adc_cents_sql()},
{_pq_adc_codes_sql()},
scored AS (
  SELECT t.query_id, cd.vec_id AS neighbor_id,
         ROUND(list_sum(list(t.ip ORDER BY t.j)), 6) AS approx_ip
  FROM codes cd JOIN qtab t ON t.j = cd.j AND t.c = cd.code
  WHERE cd.vec_id <> t.query_id
  GROUP BY t.query_id, cd.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY approx_ip DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, approx_ip, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10"""


@query("ann_pq_adc", _PQ_ADC_ORACLE)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC serving with iteration-free codebooks: 64-dim floats ->
    16 one-byte codes via argmin-L2 against the md5-sample codewords
    (map-side, inlined literals), queries score by m table lookups —
    hash-checked end to end against the SQL twin that re-derives the same
    codewords, codes, and ADC sums."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    books = S.pq_fit(emb, m=_PQ_M, k=_PQ_K, iters=0)
    return S.pq_ann_topk(emb, books, [0, 1, 2, 3, 4], k=10)


_IVFPQ_ADC_ORACLE = f"""WITH {_pq_adc_cents_sql()},
{_pq_adc_codes_sql()},
cents8 AS (
  SELECT vec_id AS cent_id, embedding FROM embeddings WHERE vec_id BETWEEN 8 AND 15
),
assign AS (
  SELECT a.vec_id, b.cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND({_COS_SQL}, 6) DESC, b.cent_id ASC
         ) AS rnk
  FROM embeddings a CROSS JOIN cents8 b
),
cells AS (SELECT vec_id AS neighbor_id, cent_id AS cell FROM assign WHERE rnk = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM assign
  WHERE vec_id IN (0, 1, 2, 3, 4) AND rnk <= 2
),
cand AS (
  SELECT p.query_id, c.neighbor_id FROM probes p
  JOIN cells c ON c.cell = p.cell AND c.neighbor_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND(list_sum(list(t.ip ORDER BY t.j)), 6) AS approx_ip
  FROM cand
  JOIN codes cd ON cd.vec_id = cand.neighbor_id
  JOIN qtab t ON t.query_id = cand.query_id AND t.j = cd.j AND t.c = cd.code
  GROUP BY cand.query_id, cand.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY approx_ip DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, approx_ip, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5"""


@query("ann_ivfpq_adc", _IVFPQ_ADC_ORACLE)
def ann_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ serving with fixed coarse cells (vec_ids 8-15, as
    ann_ivf_topk) and iteration-free PQ codebooks: cell assignment bounds
    candidates, ADC table lookups score them — the complete serving
    composition hash-checked, while the trained twin stays rows-only."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id").between(8, 15)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    books = S.pq_fit(emb, m=_PQ_M, k=_PQ_K, iters=0)
    return S.ivfpq_ann_topk(emb, cents, books, [0, 1, 2, 3, 4], k=5, nprobe=2)


_PAGERANK_F_ORACLE = rf"""WITH RECURSIVE jp AS MATERIALIZED ({_JACCARD_ORACLE}),
e AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM jp UNION SELECT id_b, id_a FROM jp
),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
allnodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
pr(it, ids, rs) AS (
  SELECT 0,
         (SELECT list(id ORDER BY id) FROM allnodes),
         (SELECT list(CAST(1.0 AS DOUBLE) ORDER BY id) FROM allnodes)
  UNION ALL
  SELECT s.it + 1,
         s.ids,
         (SELECT list(CAST({1.0 - 0.85!r} + 0.85 * COALESCE(contrib.c, 0.0) AS DOUBLE) ORDER BY n.id)
          FROM (SELECT unnest(s.ids) AS id) n
          LEFT JOIN (
            SELECT e.dst AS id,
                   SUM(s.rs[list_position(s.ids, e.src)] / d.deg) AS c
            FROM e JOIN deg d ON d.src = e.src
            GROUP BY e.dst
          ) contrib ON contrib.id = n.id)
  FROM pr s WHERE s.it < 10
)
SELECT unnest(ids) AS id, ROUND(unnest(rs), 6) AS rank FROM pr WHERE it = 10"""


@query("dup_graph_pagerank", _PAGERANK_F_ORACLE)
def dup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup pair graph (10 fixed iterations,
    d=0.85): the canonical iterative DataFrame algorithm — per round one
    rank-onto-edges join + one per-dst sum, lineage truncated with
    localCheckpoint so the plan stays O(1) deep. Hash-certified round 5
    (retiring the rows-only check): the output rank is round-6, the
    DuckDB twin carries the float rank vector through a recursive CTE
    with the SAME teleport constant Python produces for 1.0-0.85
    (0.15000000000000002 — lit(1.0 - damping) is computed driver-side),
    and per-dst contribution sums are few-term (near-dup components are
    tiny), so last-ulp summation-order divergence vanishes under the
    rounding. Exact unrounded values remain pinned against a numpy twin
    in tests/test_pipeline_ops.py."""
    from .operators.graph import pagerank

    docs = testdata.load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, n=2, threshold=0.5)
    return pagerank(docs.select(F.col("doc_id").alias("id")), pairs, iters=10)


@query(
    "dedup_containment",
    rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES},
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
directed AS (
  SELECT id_a AS src_id, id_b AS dst_id,
         ROUND(n_inter / CAST(sa.n_sh AS DOUBLE), 6) AS containment
  FROM inter JOIN sizes sa ON sa.id = id_a
  UNION ALL
  SELECT id_b, id_a, ROUND(n_inter / CAST(sb.n_sh AS DOUBLE), 6)
  FROM inter JOIN sizes sb ON sb.id = id_b
)
SELECT src_id, dst_id, containment FROM directed WHERE containment >= 0.8""",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup (excerpt/quotation detection):
    C(src,dst) = shared shingles / src's shingles >= 0.8. Single-shuffle
    inverted index; each unordered candidate emits its two directions."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.containment_pairs(docs, n=2, threshold=0.8)


@query(
    "cross_source_dups",
    rf"""WITH jp AS ({_JACCARD_ORACLE})
SELECT jp.id_a, jp.id_b, jp.jaccard,
       a.source AS source_a, b.source AS source_b
FROM jp
JOIN documents a ON a.doc_id = jp.id_a
JOIN documents b ON b.doc_id = jp.id_b
WHERE a.source <> b.source""",
)
def cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-aware dedup: near-duplicate content arriving from
    DIFFERENT sources (mirror sites, scraped re-posts) — the Jaccard
    pairs whose endpoints disagree on source, each annotated with both
    provenances. The source columns join back AQE-planned onto the
    (tiny) pair list; the signal that drives source-level trust weights
    in a crawl pipeline."""
    docs = testdata.load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, n=2, threshold=0.5)
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("source_a"))
    b = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("source_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("source_a") != F.col("source_b"))
        .select("id_a", "id_b", "jaccard", "source_a", "source_b")
    )


@query(
    "source_quality_scorecard",
    rf"""WITH rep AS ({_REPETITION_ORACLE}),
lexq AS ({_LEXICON_ORACLE}),
prof AS ({_TEXT_PROFILE_ORACLE}),
gate AS (
  SELECT p.doc_id,
         (COALESCE(r.keep, FALSE) AND l.keep AND p.lang_pred <> 'und') AS keep
  FROM prof p LEFT JOIN rep r ON r.doc_id = p.doc_id JOIN lexq l ON l.id = p.doc_id
)
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       floor(CAST(SUM(CASE WHEN g.keep THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) * 1000000.0) / 1000000.0 AS keep_rate,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN gate g ON g.doc_id = d.doc_id
GROUP BY d.source""",
)
def source_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'which sources are garbage' dashboard: curation-gate keep rate
    and volume per provenance — the aggregate that sets crawl priorities
    and source-level sampling weights. Reuses the composite gate's
    signals; one extra groupBy on source."""
    docs = testdata.load(spark, sf_dir, "documents")
    gate = curation_gate(spark, sf_dir).select("doc_id", "keep")
    return (
        docs.join(gate, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_keep"),
            (
                F.floor(
                    F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("double")
                    / F.count("*").cast("double")
                    * F.lit(1000000.0)
                )
                / F.lit(1000000.0)
            ).alias("keep_rate"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@query(
    "source_rate_sample",
    r"""WITH rated AS (
  SELECT doc_id, source, n_chars,
         CASE WHEN source LIKE 'web%' THEN 25
              WHEN source LIKE 'wiki%' THEN 100
              ELSE 50 END AS keep_pct,
         CAST(('0x' || substring(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS draw
  FROM documents
)
SELECT doc_id, source, n_chars, CAST(keep_pct AS BIGINT) AS keep_pct
FROM rated WHERE draw < keep_pct""",
)
def source_rate_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-based source rebalancing: each doc keeps with a per-source
    probability (downweight bulk web, keep all wiki) decided by a SEEDED
    md5 hash draw — deterministic, reproducible across runs and engines,
    and embarrassingly map-side (no shuffle at all: the sample decision
    never looks at another row). The complement of source_quota (top-N):
    rates preserve relative volume within a source; quotas cap it."""
    docs = testdata.load(spark, sf_dir, "documents")
    keep_pct = (
        F.when(F.col("source").like("web%"), 25)
        .when(F.col("source").like("wiki%"), 100)
        .otherwise(50)
    )
    draw = F.conv(
        F.substring(F.md5(F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint") % 100
    return (
        docs.select(
            "doc_id", "source", "n_chars",
            keep_pct.cast("bigint").alias("keep_pct"),
            draw.alias("_draw"),
        )
        .filter(F.col("_draw") < F.col("keep_pct"))
        .drop("_draw")
    )


# ---------------------------------------------------------------------------
# SemDeDup, int8 quantization, char-LM quality, temperature mix, epoch
# shuffle (round 3 additions — each a standard large-corpus pipeline stage)
# ---------------------------------------------------------------------------
_SEMANTIC_DEDUP_ORACLE = f"""WITH cents AS (
  SELECT vec_id AS cent_id, embedding FROM embeddings WHERE vec_id BETWEEN 8 AND 15
),
assign AS (
  SELECT a.vec_id, b.cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND({_COS_SQL}, 6) DESC, b.cent_id ASC
         ) AS rnk
  FROM embeddings a CROSS JOIN cents b
),
cells AS (SELECT vec_id, cent_id AS cell FROM assign WHERE rnk = 1),
dups AS (
  SELECT DISTINCT cb.vec_id
  FROM cells ca
  JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
  JOIN embeddings a ON a.vec_id = ca.vec_id
  JOIN embeddings b ON b.vec_id = cb.vec_id
  WHERE ROUND({_COS_SQL}, 6) >= 0.35
)
SELECT c.vec_id, c.cell, d.vec_id IS NULL AS keep
FROM cells c LEFT JOIN dups d ON d.vec_id = c.vec_id"""


@query("semantic_dedup", _SEMANTIC_DEDUP_ORACLE)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: coarse cells (fixed centroids vec_ids 8-15, as
    ann_ivf_topk) block the corpus, exact cosine prunes within a cell —
    a vector drops when a lower-id cell-mate sits at cosine >= 0.35.
    Every input vector gets a verdict row. Fixed k=8 is the REGRESSION
    form (it pins the explicit-centroid API); production callers use
    ``semantic_dedup_auto`` below — the round-8 scale probe measured
    fixed-k's n^2/k cost growing ~x^1.4 while the corpus-scaled k holds
    the expected cell size (and the benched time) flat."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id").between(8, 15)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    return S.semantic_dedup(emb, cents, threshold=0.35)


# the auto form's oracle derives k from COUNT(*) exactly as the operator
# does (k = clamp(ceil(n / target), 8, 4096)) and takes the k lowest-id
# vectors as centroids — fully deterministic, so the whole cell-assign +
# in-cell prune path rides the hash
_SEMANTIC_DEDUP_AUTO_ORACLE = f"""WITH params AS (
  SELECT LEAST(4096, GREATEST(8, CAST(ceil(COUNT(*) / 50.0) AS BIGINT))) AS k
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, embedding
  FROM (SELECT vec_id, embedding,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
        FROM embeddings)
  WHERE rn <= (SELECT k FROM params)
),
assign AS (
  SELECT a.vec_id, b.cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND({_COS_SQL}, 6) DESC, b.cent_id ASC
         ) AS rnk
  FROM embeddings a CROSS JOIN cents b
),
cells AS (SELECT vec_id, cent_id AS cell FROM assign WHERE rnk = 1),
dups AS (
  SELECT DISTINCT cb.vec_id
  FROM cells ca
  JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
  JOIN embeddings a ON a.vec_id = ca.vec_id
  JOIN embeddings b ON b.vec_id = cb.vec_id
  WHERE ROUND({_COS_SQL}, 6) >= 0.35
)
SELECT c.vec_id, c.cell, d.vec_id IS NULL AS keep
FROM cells c LEFT JOIN dups d ON d.vec_id = c.vec_id"""


@query("semantic_dedup_auto", _SEMANTIC_DEDUP_AUTO_ORACLE)
def semantic_dedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the cell count SCALED TO THE CORPUS — the production
    form (VERDICT r8 task #1): ``k = clamp(ceil(n / 50), 8, 4096)`` holds
    the expected cell size (and therefore the n^2/k in-cell pair term's
    per-cell share) bounded as the corpus grows, the lever whose absence
    the round-8 probe measured as fixed-k ``semantic_dedup``'s ~x^1.4
    growth (k=8 at 8x: 25-27 s; k=64: 6.8 s). Centroids are the k
    lowest-id vectors so the oracle derives the identical blocking from
    COUNT(*); swap in trained k-means centroids via ``semantic_dedup``
    when blocking quality outranks oracle portability. target_cell=50
    keeps k on the scaling branch at every certified SF (sf0.01: k=10,
    sf0.1: k=40)."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.semantic_dedup_auto(emb, threshold=0.35, target_cell=50)


def _q_terms() -> str:
    els = " + ".join(
        f"(x[{i}] - CAST(CAST(floor(x[{i}] / s * 127.0) AS INT) AS DOUBLE) * s / 127.0)"
        f" * (x[{i}] - CAST(CAST(floor(x[{i}] / s * 127.0) AS INT) AS DOUBLE) * s / 127.0)"
        for i in range(1, 65)
    )
    return els


_QUANTIZE_ORACLE = f"""WITH v AS (
  SELECT vec_id, [CAST(e AS DOUBLE) FOR e IN embedding] AS x FROM embeddings
),
scaled AS (
  SELECT vec_id, x,
         CASE WHEN list_max([abs(e) FOR e IN x]) = 0 THEN 1.0
              ELSE list_max([abs(e) FOR e IN x]) END AS s
  FROM v
),
coded AS (
  SELECT vec_id, x, s,
         [CAST(floor(e / s * 127.0) AS INT) FOR e IN x] AS codes
  FROM scaled
)
SELECT vec_id,
       ROUND(s, 6) AS scale,
       md5(array_to_string(codes, ',')) AS codes_md5,
       CAST(len(list_filter(codes, c -> abs(c) = 127)) AS BIGINT) AS n_sat,
       ROUND(sqrt({_q_terms()}), 6) AS recon_err
FROM coded"""


@query("embedding_quantize_int8", _QUANTIZE_ORACLE)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric absmax int8 quantization of the embedding corpus: scale,
    full code-array md5, saturation count, L2 reconstruction error —
    map-side, certifying every byte of the 4x-compressed layout."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.quantize_int8(emb)


_CHARLM_ORACLE = r"""WITH norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
bg AS (
  SELECT id, substring(t, CAST(i AS INT), 2) AS bg, COUNT(*) AS n
  FROM (SELECT id, t, unnest(range(1, length(t))) AS i FROM norm)
  GROUP BY id, substring(t, CAST(i AS INT), 2)
),
model AS (SELECT bg, SUM(n) AS cnt FROM bg GROUP BY bg),
ctx AS (SELECT substring(bg, 1, 1) AS c1, SUM(cnt) AS ctx_total FROM model GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT substring(bg, 1, 1)) AS v FROM model),
scored_model AS (
  SELECT m.bg,
         CAST(floor(CAST(m.cnt + 1 AS DOUBLE) * 1000000000.0
              / CAST(c.ctx_total + vocab.v AS DOUBLE)) AS BIGINT) AS prob_q
  FROM model m JOIN ctx c ON substring(m.bg, 1, 1) = c.c1 CROSS JOIN vocab
),
per_doc AS (
  SELECT bg.id, SUM(bg.n) AS n_bigrams, SUM(bg.n * sm.prob_q) AS sum_prob_q
  FROM bg JOIN scored_model sm ON sm.bg = bg.bg
  GROUP BY bg.id
),
full_t AS (
  SELECT d.doc_id AS id,
         CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         CASE WHEN COALESCE(p.n_bigrams, 0) = 0 THEN 0
              ELSE CAST(floor(CAST(p.sum_prob_q AS DOUBLE)
                   / CAST(p.n_bigrams AS DOUBLE)) AS BIGINT) END AS avg_prob_q
  FROM documents d LEFT JOIN per_doc p ON p.id = d.doc_id
)
SELECT id, n_bigrams, avg_prob_q,
       CASE WHEN avg_prob_q = 0 THEN 0
            ELSE CAST(floor(1000000000.0 / CAST(avg_prob_q AS DOUBLE)) AS BIGINT)
       END AS ppl_proxy
FROM full_t"""


@query("charlm_quality", _CHARLM_ORACLE)
def charlm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-bigram LM likelihood scoring (train + score in one pass,
    integer-quantized probabilities — see operators/text.py:charlm_score).
    Every doc gets a row."""
    docs = testdata.load(spark, sf_dir, "documents")
    return X.charlm_score(docs)


_TEMP_MIX_ORACLE = r"""WITH counts AS (
  SELECT lang AS source, COUNT(*) AS n_docs FROM documents GROUP BY lang
),
cmin AS (SELECT MIN(n_docs) AS c FROM counts),
rates AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(CAST(cmin.c AS DOUBLE) / CAST(n_docs AS DOUBLE))
              * 1000000.0) AS BIGINT) AS rate_q
  FROM counts CROSS JOIN cmin
)
SELECT d.doc_id AS id, d.lang AS source, r.rate_q
FROM documents d JOIN rates r ON r.source IS NOT DISTINCT FROM d.lang
WHERE CAST(('0x' || substring(md5('temp|' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 1000000 < r.rate_q"""


@query("temperature_mix_sample", _TEMP_MIX_ORACLE)
def temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=1/2) mixture rebalancing with a seeded md5 draw,
    over the LANGUAGE dimension (the XLM-R use case; the corpus's ``lang``
    counts are skewed 64..218 where ``source`` is deliberately uniform, so
    the rate computation AND the draw filter both exercise): the smallest
    language keeps 100%, larger ones keep sqrt-proportionally less
    (operators/curation.py:temperature_mix_sample)."""
    from .operators import curation as C

    docs = testdata.load(spark, sf_dir, "documents")
    return C.temperature_mix_sample(docs, source_col="lang")


_EPOCH_SHUFFLE_ORACLE = r"""WITH h AS (
  SELECT doc_id AS id,
         md5('epoch3|' || CAST(doc_id AS VARCHAR)) AS hx
  FROM documents
)
SELECT substring(hx, 1, 2) AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY substring(hx, 1, 2)
         ORDER BY substring(hx, 3, 30), id
       ) AS BIGINT) AS ord,
       id
FROM h"""


@query("epoch_shuffle", _EPOCH_SHUFFLE_ORACLE)
def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training order as 256 independent shard
    windows — a global shuffle with no global sort
    (operators/curation.py:epoch_shuffle, epoch=3)."""
    from .operators import curation as C

    docs = testdata.load(spark, sf_dir, "documents")
    return C.epoch_shuffle(docs, epoch=3)


_BLOOM_M, _BLOOM_K = 1 << 16, 4


def _bloom_pos_sql(key: str, j: int) -> str:
    return (
        f"CAST(('0x' || substring(md5('bloom{j}|' || CAST({key} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {_BLOOM_M}"
    )


_BLOOM_ORACLE = f"""WITH corpus AS (
  SELECT doc_id FROM documents WHERE doc_id % 2 = 0
),
pos AS (
  {" UNION ALL ".join(f"SELECT doc_id, {_bloom_pos_sql('doc_id', j)} AS p FROM corpus" for j in range(_BLOOM_K))}
),
words AS (
  SELECT CAST(p // 32 AS BIGINT) AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
  FROM pos GROUP BY 1
),
probes AS (
  {" UNION ALL ".join(f"SELECT doc_id AS key, {_bloom_pos_sql('doc_id', j)} AS p FROM documents" for j in range(_BLOOM_K))}
),
hits AS (
  SELECT pr.key,
         CASE WHEN COALESCE(w.bits, 0) & (CAST(1 AS BIGINT) << CAST(pr.p % 32 AS INT)) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM probes pr LEFT JOIN words w ON w.word_idx = CAST(pr.p // 32 AS BIGINT)
)
SELECT key, MIN(hit) = 1 AS maybe_present,
       NOT (MIN(hit) = 1) AS definitely_new
FROM hits GROUP BY key"""


@query("bloom_admission", _BLOOM_ORACLE)
def bloom_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter ingestion admission: the even-doc_id half of the corpus
    builds a 2^16-bit word-packed filter (bit_or aggregate -> at most 2048
    broadcastable rows regardless of corpus size); every doc then probes
    it. Members can never report new (no false negatives — pinned in
    pytest); a definitely_new verdict skips the expensive near-dup lookup
    entirely (operators/dedup.py:bloom_filter_words/bloom_probe)."""
    docs = testdata.load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    words = D.bloom_filter_words(corpus, "doc_id", m_bits=_BLOOM_M, k_hashes=_BLOOM_K)
    return D.bloom_probe(docs, words, "doc_id", m_bits=_BLOOM_M, k_hashes=_BLOOM_K)


_PAGERANK_Q_ORACLE = rf"""WITH RECURSIVE jp AS MATERIALIZED ({_JACCARD_ORACLE}),
e AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM jp UNION SELECT id_b, id_a FROM jp
),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
allnodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
pr(it, ids, rqs) AS (
  SELECT 0,
         (SELECT list(id ORDER BY id) FROM allnodes),
         (SELECT list(CAST(1000000 AS BIGINT) ORDER BY id) FROM allnodes)
  UNION ALL
  SELECT s.it + 1,
         s.ids,
         (SELECT list(CAST(150000 + COALESCE(contrib.c, 0) AS BIGINT) ORDER BY n.id)
          FROM (SELECT unnest(s.ids) AS id) n
          LEFT JOIN (
            SELECT e.dst AS id,
                   SUM((s.rqs[list_position(s.ids, e.src)] * 85) // (100 * d.deg)) AS c
            FROM e JOIN deg d ON d.src = e.src
            GROUP BY e.dst
          ) contrib ON contrib.id = n.id)
  FROM pr s WHERE s.it < 10
)
SELECT unnest(ids) AS id, unnest(rqs) AS rank_q FROM pr WHERE it = 10"""


@query("dup_graph_pagerank_q", _PAGERANK_Q_ORACLE)
def dup_graph_pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-quantized PageRank over the near-dup pair graph — the
    hash-checked twin of the rows-only float dup_graph_pagerank: micro-unit
    ranks, per-edge integer-division contributions, integer per-round sums
    (order-independent, so both engines reach the identical 10-iteration
    fixpoint; the DuckDB twin carries the rank vector through a recursive
    CTE). See operators/graph.py:pagerank_quantized."""
    from .operators.graph import pagerank_quantized

    docs = testdata.load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, n=2, threshold=0.5)
    return pagerank_quantized(docs.select(F.col("doc_id").alias("id")), pairs, iters=10)


_KMQ_ITERS = 3
_KMQ_DIST = " + ".join(
    f"(q.v[{i}] - s.c[{i}]) * (q.v[{i}] - s.c[{i}])" for i in range(1, 65)
)

_KMEANS_Q_CTE = f"""WITH RECURSIVE vq AS MATERIALIZED (
  SELECT vec_id, [CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT) FOR e IN embedding] AS v
  FROM embeddings
),
seeds AS MATERIALIZED (
  SELECT v, ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
  FROM (SELECT vec_id, embedding FROM embeddings) e
  JOIN vq USING (vec_id)
),
km(it, cents) AS (
  SELECT 0, (SELECT list({{'cid': cid, 'c': v}} ORDER BY cid) FROM seeds WHERE cid < 8)
  UNION ALL
  SELECT km.it + 1,
    (SELECT list({{'cid': cur.cid, 'c': COALESCE(nc.newc, cur.c)}} ORDER BY cur.cid)
     FROM (SELECT s.cid AS cid, s.c AS c FROM (SELECT unnest(km.cents) AS s)) cur
     LEFT JOIN (
       SELECT cid, list(m ORDER BY i) AS newc FROM (
         SELECT a.cid, d.i,
                CAST(floor(CAST(SUM(a.v[d.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
         FROM (
           SELECT q.vec_id, q.v,
                  (SELECT s.cid FROM (SELECT unnest(km.cents) AS st), LATERAL (SELECT st.cid AS cid, st.c AS c) s
                   ORDER BY ({_KMQ_DIST}), s.cid LIMIT 1) AS cid
           FROM vq q
         ) a CROSS JOIN (SELECT CAST(unnest(range(1, 65)) AS INT) AS i) d
         GROUP BY a.cid, d.i
       ) GROUP BY cid
     ) nc ON nc.cid = cur.cid)
  FROM km WHERE km.it < {_KMQ_ITERS}
),
cells AS (
  SELECT q.vec_id, q.v,
         (SELECT s.cid FROM (SELECT unnest((SELECT cents FROM km WHERE it = {_KMQ_ITERS})) AS st),
            LATERAL (SELECT st.cid AS cid, st.c AS c) s
          ORDER BY ({_KMQ_DIST}), s.cid LIMIT 1) AS cell
  FROM vq q
)"""


_KMEANS_Q_ORACLE = _KMEANS_Q_CTE + "\nSELECT vec_id, cell FROM cells"


@query("ann_kmeans_cells_q", _KMEANS_Q_ORACLE)
def ann_kmeans_cells_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED k-means clustering with a full hash check — the quantized
    twin of the rows-only ann_ivf_trained: 3 integer-quantized Lloyd
    iterations (micro-unit vectors, integer L2 argmin, floor-mean update)
    whose whole trajectory is order-independent, replayed by a DuckDB
    recursive CTE carrying the centroid lists. Output: final (vec_id,
    cell) assignment (operators/similarity.py:kmeans_fit_quantized)."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    cents = S.kmeans_fit_quantized(emb, k=8, iters=_KMQ_ITERS)
    return S.kmeans_cells_quantized(emb, cents)


_KMV_K = 64
_KMV_SCALE = 16 ** 12  # first-12-hex-chars hash space


_KMV_ORACLE = f"""WITH uh AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substring(md5('kmv|' || CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h
  FROM events
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM uh
),
stats AS (
  SELECT event_type,
         COUNT(*) AS n_kept,
         MAX(h) AS kth_hash
  FROM ranked WHERE rn <= {_KMV_K}
  GROUP BY event_type
),
exact AS (SELECT event_type, COUNT(*) AS exact_users FROM uh GROUP BY event_type)
SELECT s.event_type,
       e.exact_users,
       CASE WHEN s.n_kept < {_KMV_K} THEN s.n_kept
            ELSE ({_KMV_K} - 1) * {_KMV_SCALE} // s.kth_hash END AS est_users
FROM stats s JOIN exact e ON e.event_type = s.event_type"""


@query("kmv_distinct_sketch", _KMV_ORACLE)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event type, next
    to the exact count — the hash-checkable sketch (HLL++ estimates are
    engine-internal; KMV's estimate is a pure function of the k smallest
    md5 draws, so both engines compute the identical integer). Estimator:
    (k-1) * H / h_k with h_k the k-th smallest 48-bit hash, exact-count
    fallback below k. All integer arithmetic (the (k-1)*H product exceeds
    double precision, so the division stays in BIGINT on both sides).

    Scale shape (the sketch's own contract, physically): the k smallest
    hashes come from operators/sketch.py:kmin_hashes — threshold-pruned
    exact k-min with bounded state through every exchange (per-salt mins
    map-side, broadcast threshold, O(k)-expected survivors) — NO per-type
    rank/sort over the raw distinct set, so a hot type at 10^9 distinct
    users never concentrates in one task (plan-pinned: no Window node).
    The exact count keeps its standard distinct+partial-count plan — it
    is the comparison baseline the sketch exists to avoid. Accuracy ~
    1/sqrt(k) ~ 12% at k=64, pytest-asserted."""
    from .operators.sketch import kmin_hashes

    ev = testdata.load(spark, sf_dir, "events")
    hashes = ev.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))), 1, 12),
            16,
            10,
        ).cast("bigint").alias("h"),
    )
    stats = kmin_hashes(
        hashes, "event_type", "h", _KMV_K, hash_ceiling=_KMV_SCALE
    ).select(
        "event_type",
        F.size("ks").cast("bigint").alias("n_kept"),
        F.element_at("ks", F.size("ks")).alias("kth_hash"),
    )
    exact = hashes.distinct().groupBy("event_type").agg(
        F.count("*").alias("exact_users")
    )
    est = F.when(F.col("n_kept") < _KMV_K, F.col("n_kept")).otherwise(
        F.expr(f"({_KMV_K} - 1) * CAST({_KMV_SCALE} AS BIGINT) div kth_hash")
    )
    return (
        stats.join(exact, "event_type")
        .select("event_type", "exact_users", est.cast("bigint").alias("est_users"))
    )


_IVFQ_DIST_QN = " + ".join(
    f"(qv.v[{i}] - nb.v[{i}]) * (qv.v[{i}] - nb.v[{i}])" for i in range(1, 65)
)

_IVF_TRAINED_Q_ORACLE = (
    _KMEANS_Q_CTE
    + f""",
probes AS (SELECT vec_id AS query_id, v, cell FROM cells WHERE vec_id IN (0, 1, 2, 3, 4)),
scored AS (
  SELECT qv.query_id, nb.vec_id AS neighbor_id, ({_IVFQ_DIST_QN.replace('qv.v', 'qv.v').replace('nb.v', 'nb.v')}) AS dist_q
  FROM probes qv JOIN cells nb ON nb.cell = qv.cell AND nb.vec_id <> qv.query_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY dist_q ASC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, dist_q, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5"""
)


@query("ann_ivf_trained_q", _IVF_TRAINED_Q_ORACLE)
def ann_ivf_trained_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED IVF serving, hash-checked END TO END: quantized-Lloyd
    centroids (ann_kmeans_cells_q's trainer), cell-local candidates, and
    exact integer-L2 ranking within the probed cell — training AND serving
    both bit-identical across engines, closing the last rows-only gap in
    the trained-ANN family (the float ann_ivf_trained keeps its rows-only
    row as the production-shaped twin). Candidate join is cell-local with
    the 5-probe side broadcast; everything else is map-side."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    cents = S.kmeans_fit_quantized(emb, k=8, iters=_KMQ_ITERS)
    cells = emb.select(
        F.col("vec_id"),
        S._quantize_vec("embedding", 1_000_000).alias("v"),
    ).withColumn("cell", S._nearest_quantized_cell(F.col("v"), cents))
    probes = (
        cells.filter(F.col("vec_id").isin([0, 1, 2, 3, 4]))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("cell"),
        )
    )
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = (
        cells.join(F.broadcast(probes), ["cell"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), dist.alias("dist_q"))
    )
    # distance ascends, so the threshold-pruned top-k takes the key
    # directly (descending=False) — never a per-query rank window over
    # the probed-cell candidate set (~n·nprobe/cells rows per query)
    return S.serving_topk(scored, "dist_q", 5, descending=False)


_TF_COSINE_ORACLE = rf"""WITH {_NORM},
{_TOKS},
tok AS (
  SELECT id, tok, COUNT(*) AS tf FROM (
    SELECT id, unnest(tk) AS tok FROM toks
  ) WHERE tok IS NOT NULL AND tok <> ''
  GROUP BY id, tok
),
norms AS (SELECT id, SUM(tf * tf) AS n2 FROM tok GROUP BY id),
dots AS (
  SELECT a.id AS id_a, b.id AS id_b, SUM(a.tf * b.tf) AS dot
  FROM tok a JOIN tok b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id
),
scored AS (
  SELECT id_a, id_b,
         ROUND(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) AS cos_sim
  FROM dots JOIN norms na ON na.id = id_a JOIN norms nb ON nb.id = id_b
)
SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.8"""


@query("tf_cosine_pairs", _TF_COSINE_ORACLE)
def tf_cosine_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words tf-cosine near-dup pairs at 0.8 — integer numerators
    and norms, one sqrt per pair (operators/text.py:tf_cosine_pairs).
    The adaptive gate takes the dense-BLAS path on this tiny-vocab corpus;
    past the vocab gate the default sparse strategy is now the AllPairs
    PREFIX filter (round-6 fix: the uncapped postings self-join — shuffle
    volume sum(df^2) over tokens — is no longer any registration's
    at-scale shape; plan-pinned in tests/test_plans.py)."""
    docs = testdata.load(spark, sf_dir, "documents")
    return X.tf_cosine_pairs(docs, threshold=0.8)


_TF_COSINE_BETWEEN_ORACLE = rf"""WITH {_NORM},
{_TOKS},
tok AS (
  SELECT id, tok, COUNT(*) AS tf FROM (
    SELECT id, unnest(tk) AS tok FROM toks
  ) WHERE tok IS NOT NULL AND tok <> ''
  GROUP BY id, tok
),
norms AS (SELECT id, SUM(tf * tf) AS n2 FROM tok GROUP BY id),
dots AS (
  SELECT a.id AS new_id, b.id AS old_id, SUM(a.tf * b.tf) AS dot
  FROM tok a JOIN tok b ON a.tok = b.tok
  WHERE a.id % 2 = 1 AND b.id % 2 = 0
  GROUP BY a.id, b.id
),
scored AS (
  SELECT new_id, old_id,
         ROUND(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) AS cos_sim
  FROM dots JOIN norms na ON na.id = new_id JOIN norms nb ON nb.id = old_id
)
SELECT new_id, old_id, cos_sim FROM scored WHERE cos_sim >= 0.8"""


@query("tf_cosine_incremental", _TF_COSINE_BETWEEN_ORACLE)
def tf_cosine_incremental_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time tf-cosine dedup: near-dups of a NEW batch (odd doc
    ids) against the EXISTING corpus (even ids) — the counts-sensitive
    companion to dedup_incremental's Jaccard probe; pair volume linear in
    the corpus per batch (operators/text.py:tf_cosine_pairs_between)."""
    docs = testdata.load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    return X.tf_cosine_pairs_between(new, old, threshold=0.8)


@query("tf_cosine_pairs_sparse", _TF_COSINE_ORACLE)
def tf_cosine_pairs_sparse_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FORCED sparse prefix path of tf_cosine_pairs (dense gate pinned
    off), certified against the same oracle as the adaptive flagship —
    this is the strategy that runs on a realistic (vocab >> dense gate)
    web corpus, so it needs its own hash-green row, not just strategy-
    equivalence pytest. NOTE this synthetic corpus is adversarially DENSE
    (31-token vocab: every token is a stop token and prefixes overlap
    corpus-wide), so its absolute time here is the worst case, not the
    web-corpus case the strategy exists for — the dense gate exists
    precisely to route this corpus to BLAS."""
    docs = testdata.load(spark, sf_dir, "documents")
    return X.tf_cosine_pairs(
        docs, threshold=0.8, dense_vocab_limit=0, sparse_strategy="prefix"
    )


_CHUNK_ORACLE = r"""WITH norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
toks AS (
  SELECT id, string_split_regex(t, '\s+') AS tk FROM norm WHERE t <> ''
),
base AS (SELECT id, tk, len(tk) AS n FROM toks),
idx AS (
  SELECT id, tk, CAST(unnest(range(GREATEST(1,
           CAST(ceil(CAST(n - 8 AS DOUBLE) / 56) AS BIGINT)))) AS BIGINT) AS chunk_idx
  FROM base
)
SELECT id, chunk_idx,
       array_to_string(tk[chunk_idx * 56 + 1 : chunk_idx * 56 + 64], ' ') AS chunk_text,
       CAST(len(tk[chunk_idx * 56 + 1 : chunk_idx * 56 + 64]) AS BIGINT) AS n_tokens
FROM idx"""


@query("chunk_documents", _CHUNK_ORACLE)
def chunk_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks with 8-token overlap over the corpus — the
    context-window prep stage, map-side only
    (operators/curation.py:chunk_documents)."""
    from .operators import curation as C

    docs = testdata.load(spark, sf_dir, "documents")
    return C.chunk_documents(docs, chunk_tokens=64, overlap=8)


_FEATURE_STATS_ORACLE = r"""WITH vq AS (
  SELECT vec_id,
         [CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT) FOR e IN embedding] AS v
  FROM embeddings
),
expl AS (
  SELECT CAST(i AS INT) AS dim, v[CAST(i AS INT)] AS x
  FROM vq CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
)
SELECT dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(floor(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_q,
       CAST(floor((CAST(SUM(x * x) AS DOUBLE) - CAST(SUM(x) AS DOUBLE) * SUM(x) / COUNT(*))
            / COUNT(*)) AS BIGINT) AS var_q
FROM expl GROUP BY dim"""


@query("embedding_feature_stats", _FEATURE_STATS_ORACLE)
def embedding_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics over the embedding column — the
    whitening/normalization prep pass (feature means for centering,
    variances for scaling). Vectors quantize once to integer micro-units,
    so the sums feeding mean and variance are INTEGER sums
    (order-independent -> full hash check; raw float sums would differ in
    last-ulp order per engine). The two double steps (sum/n and the
    variance combination) are single correctly-rounded operations floored
    identically on both sides.

    Scale shape: posexplode is map-side; ONE groupBy on dim with partial
    aggregation — 64 cells of (sum, sumsq, count) state per partition, 64
    output rows at any corpus size. Magnitude domain: |x_q| <= ~1e8 and
    sum(x*x) <= n * 1e16 — exact in BIGINT up to ~900 rows per dim at
    that extreme; the fixture's |x| <= ~3 gives ~1e13 headroom (documented
    bound, same contract style as value_outliers_3sigma)."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    # posexplode_OUTER (round 11): the plain posexplode lets
    # InferFiltersFromGenerate push `size(v) > 0 AND isnotnull(v)` into
    # the scan stage, re-evaluating the full quantize transform() TWICE
    # more per row (3 evaluations total — plan-verified). The outer
    # variant infers nothing; its one extra (null, null) row per
    # null/empty vector dies in the unpushable post-generate filter on
    # the generated ordinal (i is never null for a real element), so the
    # aggregated rows are identical. Same pattern as dedup.shingles.
    vq = (
        emb.select(S._quantize_vec("embedding", 1_000_000).alias("v"))
        .select(F.posexplode_outer("v").alias("i", "x"))
        .filter(F.col("i").isNotNull())
    )
    sx = F.sum("x")
    sxx = F.sum(F.col("x") * F.col("x"))
    n = F.count("*")
    return (
        vq.groupBy((F.col("i") + 1).cast("int").alias("dim"))
        .agg(
            n.cast("bigint").alias("n"),
            F.floor(sx.cast("double") / n).cast("bigint").alias("mean_q"),
            F.floor(
                (sxx.cast("double") - sx.cast("double") * sx / n) / n
            ).cast("bigint").alias("var_q"),
        )
    )


_ROBUST_STATS_ORACLE = r"""WITH vq AS (
  SELECT vec_id,
         [CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT) FOR e IN embedding] AS v
  FROM embeddings
),
expl AS (
  SELECT CAST(i AS INT) AS dim, v[CAST(i AS INT)] AS x
  FROM vq CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
),
ranked AS (
  SELECT dim, x,
         ROW_NUMBER() OVER (PARTITION BY dim ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY dim) AS n
  FROM expl
)
SELECT dim, CAST(MAX(n) AS BIGINT) AS n,
       MAX(CASE WHEN rn = (n + 3) // 4 THEN x END) AS p25_q,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN x END) AS median_q,
       MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN x END) AS p75_q,
       MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN x END)
         - MAX(CASE WHEN rn = (n + 3) // 4 THEN x END) AS iqr_q
FROM ranked GROUP BY dim"""


@query("embedding_robust_stats", _ROBUST_STATS_ORACLE)
def embedding_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-dimension statistics (exact type-1 quartiles + IQR) over
    micro-unit-quantized embedding values — the outlier-resistant
    companion to embedding_feature_stats for robust scaling. Type-1
    quantiles (the value AT position ceil(q*n) of the sorted multiset) are
    well-defined regardless of tie order and need no interpolation, so the
    whole query is integer-exact and hash-checks; interpolating quantile
    functions (percentile_cont and friends) interpolate differently per
    engine.

    Scale shape: two-pass exact quantile (operators/sketch.py:
    grouped_exact_quantiles) — a bucketed histogram pass locates each
    target rank's bucket, a second pass value-counts only inside target
    buckets (<= bucket_width distinct integers by construction). NO
    per-dimension sort over the raw corpus: every window runs over
    pre-aggregated bucket/value-count tables whose size is independent of
    the row count, so parallelism is not capped at the dimension count
    and no task's state grows with the corpus (plan-pinned: no
    row_number)."""
    from .operators.sketch import grouped_exact_quantiles

    emb = testdata.load(spark, sf_dir, "embeddings")
    expl = emb.select(
        S._quantize_vec("embedding", 1_000_000).alias("v")
    ).select(F.posexplode("v").alias("i", "x")).select(
        (F.col("i") + 1).cast("int").alias("dim"), "x"
    )
    picked = grouped_exact_quantiles(
        expl,
        "dim",
        "x",
        [("p25", 1, 4), ("median", 1, 2), ("p75", 3, 4)],
    )
    wide = lambda name: F.max(F.when(F.col("q") == name, F.col("val")))  # noqa: E731
    p25, p75 = wide("p25"), wide("p75")
    return picked.groupBy("dim").agg(
        F.max("n").cast("bigint").alias("n"),
        p25.alias("p25_q"),
        wide("median").alias("median_q"),
        p75.alias("p75_q"),
        (p75 - p25).alias("iqr_q"),
    )


# ---------------------------------------------------------------------------
# End-to-end curation pipeline accounting: the whole composed DAG gets its
# own hash row. The oracle replays every stage in one DuckDB WITH chain —
# exact dedup, Jaccard pairs + recursive-CTE connected components over the
# SURVIVORS (not the raw corpus), the three-signal quality gate with the
# lexicon rebuilt from the gated stage's own input, the temperature draw
# over survivors, and the chunk-count arithmetic. PII scrubbing changes no
# counts (redaction placeholders contain no whitespace, so token counts
# are invariant — asserted in tests/test_pipeline_ops.py).
# ---------------------------------------------------------------------------
_PIPELINE_COUNTS_ORACLE = r"""WITH RECURSIVE
norm0 AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
keep1 AS (SELECT MIN(id) AS doc_id FROM norm0 GROUP BY md5(t)),
docs1 AS (SELECT d.* FROM documents d JOIN keep1 USING (doc_id)),
norm1 AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM docs1
),
toks1 AS (SELECT id, string_split_regex(t, '\s+') AS tk FROM norm1),
sh1 AS (
  SELECT id, unnest(list_distinct([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))])) AS shingle
  FROM toks1
),
sizes1 AS (SELECT id, COUNT(*) AS n_sh FROM sh1 GROUP BY id),
inter1 AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh1 a JOIN sh1 b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
jp1 AS (
  SELECT id_a, id_b
  FROM inter1 JOIN sizes1 sa ON sa.id = id_a JOIN sizes1 sb ON sb.id = id_b
  WHERE ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= 0.5
),
edges1 AS (SELECT id_a AS x, id_b AS y FROM jp1 UNION SELECT id_b, id_a FROM jp1),
reach1(src, node) AS (
  SELECT doc_id, doc_id FROM docs1
  UNION
  SELECT r.src, e.y FROM reach1 r JOIN edges1 e ON e.x = r.node
),
comp1 AS (SELECT src AS id, MIN(node) AS comp FROM reach1 GROUP BY src),
docs2 AS (
  SELECT d.* FROM docs1 d JOIN comp1 c ON c.id = d.doc_id AND c.comp = d.doc_id
),
norm2 AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM docs2
),
toks2 AS (SELECT id, string_split_regex(t, '\s+') AS tk FROM norm2),
m2 AS (
  SELECT id AS doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tokens,
         floor(CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE)
               / len(tk) * 10000.0) / 10000.0 AS frac_dup_tokens
  FROM toks2
),
bg2 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bigram
  FROM m2
),
bc2 AS (SELECT doc_id, bigram, COUNT(*) AS bn FROM bg2 GROUP BY doc_id, bigram),
agg2 AS (SELECT doc_id, MAX(bn) AS top_bigram_n, SUM(bn) AS n_bigrams FROM bc2 GROUP BY doc_id),
repkeep2 AS (
  SELECT m2.doc_id,
         (m2.n_tokens >= 50
          AND floor(CAST(agg2.top_bigram_n AS DOUBLE) / CAST(agg2.n_bigrams AS DOUBLE) * 1000000.0)
              / 1000000.0 <= 0.08
          AND m2.frac_dup_tokens <= 0.8) AS keep
  FROM m2 JOIN agg2 USING (doc_id)
),
tok2 AS (SELECT id, unnest(tk) AS tok FROM toks2),
freq2 AS (SELECT tok, COUNT(*) AS cnt FROM tok2 GROUP BY tok),
lex2 AS (SELECT tok FROM freq2 ORDER BY cnt DESC, tok ASC LIMIT 1000),
cov2 AS (
  SELECT t.id, COUNT(*) AS n_tokens,
         CAST(SUM(CASE WHEN l.tok IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_in_lex
  FROM tok2 t LEFT JOIN lex2 l ON l.tok = t.tok
  GROUP BY t.id
),
lexkeep2 AS (
  SELECT d.doc_id AS id,
         COALESCE(c.n_tokens, 0) > 0 AND
         (CASE WHEN COALESCE(c.n_tokens, 0) = 0 THEN 0.0
               ELSE floor(CAST(c.n_in_lex AS DOUBLE) / CAST(c.n_tokens AS DOUBLE) * 1000000.0) / 1000000.0
          END) >= 0.8 AS keep
  FROM docs2 d LEFT JOIN cov2 c ON c.id = d.doc_id
),
langp2 AS (
  SELECT n.id, ' ' || n.t || ' ' AS p FROM norm2 n
),
langs2 AS (
  SELECT id,
    CAST((length(p) - length(replace(p, ' the ', ''))) / 5
       + (length(p) - length(replace(p, ' a ', ''))) / 3
       + (length(p) - length(replace(p, ' of ', ''))) / 4 AS BIGINT) AS en_score,
    CAST((length(p) - length(replace(p, ' der ', ''))) / 5
       + (length(p) - length(replace(p, ' die ', ''))) / 5
       + (length(p) - length(replace(p, ' und ', ''))) / 5 AS BIGINT) AS de_score,
    CAST((length(p) - length(replace(p, ' el ', ''))) / 4
       + (length(p) - length(replace(p, ' la ', ''))) / 4
       + (length(p) - length(replace(p, ' los ', ''))) / 5 AS BIGINT) AS es_score,
    CAST((length(p) - length(replace(p, ' le ', ''))) / 4
       + (length(p) - length(replace(p, ' les ', ''))) / 5
       + (length(p) - length(replace(p, ' et ', ''))) / 4 AS BIGINT) AS fr_score
  FROM langp2
),
lang2 AS (
  SELECT id,
    CASE WHEN en_score = greatest(en_score, de_score, es_score, fr_score) AND en_score > 0 THEN 'en'
         WHEN de_score = greatest(en_score, de_score, es_score, fr_score) AND de_score > 0 THEN 'de'
         WHEN es_score = greatest(en_score, de_score, es_score, fr_score) AND es_score > 0 THEN 'es'
         WHEN fr_score = greatest(en_score, de_score, es_score, fr_score) AND fr_score > 0 THEN 'fr'
         ELSE 'und' END AS lang_pred
  FROM langs2
),
gated AS (
  SELECT d.doc_id, d.lang
  FROM docs2 d
  JOIN lexkeep2 lk ON lk.id = d.doc_id AND lk.keep
  JOIN lang2 lg ON lg.id = d.doc_id AND lg.lang_pred <> 'und'
  LEFT JOIN repkeep2 rk ON rk.doc_id = d.doc_id
  WHERE COALESCE(rk.keep, FALSE)
),
cnts AS (SELECT lang AS source, COUNT(*) AS n_docs FROM gated GROUP BY lang),
cmin AS (SELECT MIN(n_docs) AS c FROM cnts),
rates AS (
  SELECT source,
         CAST(floor(sqrt(CAST(cmin.c AS DOUBLE) / CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS rate_q
  FROM cnts CROSS JOIN cmin
),
sampled AS (
  SELECT g.doc_id FROM gated g JOIN rates r ON r.source IS NOT DISTINCT FROM g.lang
  WHERE CAST(('0x' || substring(md5('temp|' || CAST(g.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 1000000 < r.rate_q
),
chunkn AS (
  SELECT COALESCE(SUM(GREATEST(1, CAST(ceil(CAST(len(tk) - 8 AS DOUBLE) / 56) AS BIGINT))), 0) AS n
  FROM toks2 JOIN sampled s ON s.doc_id = toks2.id
  JOIN norm2 n2 ON n2.id = toks2.id
  WHERE n2.t <> ''
)
SELECT 'input' AS stage, CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n
UNION ALL SELECT 'exact_dedup', CAST((SELECT COUNT(*) FROM docs1) AS BIGINT)
UNION ALL SELECT 'near_dedup', CAST((SELECT COUNT(*) FROM docs2) AS BIGINT)
UNION ALL SELECT 'quality_gate', CAST((SELECT COUNT(*) FROM gated) AS BIGINT)
UNION ALL SELECT 'mix_sample', CAST((SELECT COUNT(*) FROM sampled) AS BIGINT)
UNION ALL SELECT 'chunks', CAST((SELECT n FROM chunkn) AS BIGINT)"""


@query("curation_pipeline_counts", _PIPELINE_COUNTS_ORACLE)
def curation_pipeline_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pipeline's per-stage survivor accounting
    (pipeline.py:curate_corpus — the real composed function, not a
    re-derivation): exact dedup -> near-dup components -> quality gate ->
    PII scrub -> temperature mix -> chunking, one (stage, n) row each.
    The oracle replays the entire composition in a single DuckDB WITH
    chain, with each stage computed over the PREVIOUS stage's survivors
    (the lexicon, mixture rates, and pair graph are all rebuilt from
    stage input, exactly as the pipeline does) — certifying the
    composition itself, not just the member operators."""
    from . import pipeline

    docs = testdata.load(spark, sf_dir, "documents")
    chunks, counts = pipeline.curate_corpus(docs)
    chunks.unpersist()
    rows = [(k, int(v)) for k, v in counts.items()]
    return spark.createDataFrame(rows, "stage string, n bigint")


# ---------------------------------------------------------------------------
# BPE tokenizer training: merge selection is pure integer counting, so the
# whole ranking hash-checks; the iterative multi-merge trainer (bpe_learn)
# is kmeans-style driver-looped and pinned against a pure-python twin in
# pytest.
# ---------------------------------------------------------------------------
_BPE_RANKS_ORACLE = r"""WITH norm AS (
  SELECT regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents
),
words AS (
  SELECT unnest(string_split_regex(t, '\s+')) AS word FROM norm
),
wc AS (SELECT word, COUNT(*) AS n FROM words WHERE word <> '' GROUP BY word),
wp AS (
  SELECT substring(word, CAST(i AS INT), 2) AS pair, n
  FROM (SELECT word, n, unnest(range(1, length(word))) AS i FROM wc WHERE length(word) >= 2)
),
pc AS (SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM wp GROUP BY pair),
ranked AS (
  SELECT pair, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS BIGINT) AS rank
  FROM pc
)
SELECT pair, cnt, rank FROM ranked WHERE rank <= 20"""


@query("bpe_merge_ranks", _BPE_RANKS_ORACLE)
def bpe_merge_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge selection (Sennrich et al., ACL'16), first step: the
    top-20 corpus-weighted adjacent character pairs with deterministic
    (count desc, pair asc) tie-break — all-integer, full hash check.

    Scale shape: the corpus reduces to its (word, n) vocabulary in one
    partial-agg groupBy (operators/text.py:word_counts); the per-character
    pass explodes only the vocab table, and the pair-count state is
    bounded by |alphabet|^2. The global top-20 is a
    TakeOrderedAndProject, never a full sort."""
    docs = testdata.load(spark, sf_dir, "documents")
    pc = X.bpe_pair_counts(docs)
    top = pc.orderBy(F.desc("cnt"), F.asc("pair")).limit(20)
    from pyspark.sql import Window as W

    return top.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.desc("cnt"), F.asc("pair"))).cast("bigint"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval (operators/retrieval.py). Twin split per the repo
# determinism contract: the rsj_sqrt form hash-checks end to end (sqrt is
# correctly-rounded IEEE; per-term contributions quantize to integer
# micro-units before an order-independent integer sum); the textbook
# ln-idf form is rows-only + pytest-pinned against a python float twin.
# ---------------------------------------------------------------------------
_BM25_QUERIES = {
    0: "hash join query",
    1: "window sort order",
    2: "fast vector scan",
    3: "dup stream",
}

_BM25_QT_VALUES = ", ".join(
    f"({qid}, '{t}')"
    for qid, qs in sorted(_BM25_QUERIES.items())
    for t in dict.fromkeys(qs.lower().split())
)

_BM25_CONTRIB = (
    "sqrt((n_docs - df + 0.5) / (df + 0.5)) * "
    "((tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * "
    "(dl / (CAST(sum_dl AS DOUBLE) / n_docs)))))"
)

# the CTE chain both BM25 oracles share verbatim — everything up through
# `matched`; each variant appends its own `scored` + `ranked` + projection
_BM25_CTE_PREFIX = rf"""WITH norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
tk AS (SELECT id, unnest(string_split_regex(t, '\s+')) AS term FROM norm),
qt AS (SELECT * FROM (VALUES {_BM25_QT_VALUES}) AS v(query_id, term)),
terms AS (SELECT DISTINCT term FROM qt),
postings AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tk JOIN terms USING (term) GROUP BY id, term
),
dl AS (SELECT id, CAST(len(string_split_regex(t, '\s+')) AS BIGINT) AS dl FROM norm),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS sum_dl
),
matched AS (
  SELECT q.query_id, p.id, p.tf, d.dl, f.df, s.n_docs, s.sum_dl
  FROM postings p
  JOIN qt q USING (term)
  JOIN dl d USING (id)
  JOIN (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY term) f USING (term)
  CROSS JOIN stats s
),
"""

_BM25_ORACLE = rf"""{_BM25_CTE_PREFIX}scored AS (
  SELECT query_id, id AS doc_id,
         CAST(SUM(CAST(floor({_BM25_CONTRIB} * 1000000) AS BIGINT)) AS BIGINT) AS score_q
  FROM matched GROUP BY query_id, id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score_q DESC, doc_id ASC) AS rank
  FROM scored)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_q, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10"""


@query("bm25_rsj_topk", _BM25_ORACLE)
def bm25_rsj_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval, hash-checkable form: sqrt-damped RSJ idf +
    integer micro-unit contribution sums (operators/retrieval.py). The
    query term list inlines map-side, so postings materialize only for
    query terms — never a full inverted index."""
    from .operators.retrieval import bm25_topk

    docs = testdata.load(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_QUERIES, k=10, idf_mode="rsj_sqrt")


_BM25_LN_CONTRIB = (
    "ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * "
    "((tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * "
    "(dl / (CAST(sum_dl AS DOUBLE) / n_docs)))))"
)

# same CTE chain as the hash-certified rsj oracle up through `matched`;
# only the contribution formula and the final projection differ
_BM25_LN_ORACLE = (
    _BM25_CTE_PREFIX
    + rf"""scored AS (
  SELECT query_id, id AS doc_id, ROUND(SUM({_BM25_LN_CONTRIB}), 6) AS score
  FROM matched GROUP BY query_id, id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10"""
)


@query("bm25_lucene_topk", _BM25_LN_ORACLE)
def bm25_lucene_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textbook BM25 (Lucene ln(1 + (N-df+0.5)/(df+0.5)) idf) — the
    production scoring form. Hash-certified round 5 as a RANK-ONLY
    registration (retiring the rows-only check): the ln score itself is
    dropped from the output — natural log is not bit-reproducible across
    engines (see determinism contract) — but the RANKING is computed on
    the round-6 score in both engines, where sub-ulp ln divergence
    cannot reorder. Exact float scores stay pinned against a python twin
    in tests/test_pipeline_ops.py; the rsj_sqrt twin hash-certifies the
    score column end to end."""
    from .operators.retrieval import bm25_topk

    docs = testdata.load(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_QUERIES, k=10, idf_mode="ln").select(
        "query_id", "doc_id", "rank"
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling (operators/curation.py:dsir_importance). Twin
# split: the integer-quantized linear-domain weights hash-check end to end
# (one exact integer division per bucket, integer sums); the paper's
# log-domain form is rows-only + python-twin-pinned (ln is not
# bit-reproducible across engines).
# ---------------------------------------------------------------------------
_DSIR_B = 4096

_DSIR_ORACLE = rf"""WITH norm AS (
  SELECT doc_id AS id, lang = 'en' AS is_target,
         regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
tk AS (
  SELECT id, is_target, unnest(string_split_regex(t, '\s+')) AS word FROM norm
),
counts AS (
  SELECT id,
         CAST(('0x' || substring(md5('dsir|' || word), 1, 12)) AS BIGINT) % {_DSIR_B} AS b,
         COUNT(*) AS c, MAX(is_target) AS is_target
  FROM tk WHERE word <> '' GROUP BY 1, 2
),
raw AS (SELECT b, SUM(c) AS cr FROM counts GROUP BY b),
tgt AS (SELECT b, SUM(c) AS ct FROM counts WHERE is_target GROUP BY b),
totals AS (
  SELECT (SELECT CAST(SUM(cr) AS BIGINT) FROM raw) AS n_r,
         (SELECT CAST(SUM(ct) AS BIGINT) FROM tgt) AS n_t
),
w AS (
  SELECT raw.b,
         CAST(floor(1000000 * (CAST((COALESCE(tgt.ct, 0) + 1) * (t.n_r + {_DSIR_B}) AS DOUBLE)
                               / CAST((raw.cr + 1) * (t.n_t + {_DSIR_B}) AS DOUBLE))) AS BIGINT) AS ratio_q
  FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN totals t
)
SELECT counts.id, CAST(SUM(counts.c) AS BIGINT) AS n_toks,
       CAST(SUM(counts.c * (w.ratio_q - 1000000)) AS BIGINT) AS score_q
FROM counts JOIN w ON w.b = counts.b
GROUP BY counts.id"""


@query("dsir_importance_q", _DSIR_ORACLE)
def dsir_importance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection, hash-checkable form: per-doc integer-quantized
    linear-domain importance of hashed unigram features against the
    English-language target slice — positive scores = target-like docs.
    Both feature distributions are <= 4096 broadcast rows; the corpus
    sees one token-bucket reduce and one scoring reduce."""
    from .operators.curation import dsir_importance

    docs = testdata.load(spark, sf_dir, "documents").withColumn(
        "is_en", F.col("lang") == "en"
    )
    return dsir_importance(docs, "is_en", n_buckets=_DSIR_B, mode="linear_q")


_DSIR_LOG_ORACLE = rf"""WITH norm AS (
  SELECT doc_id AS id, lang = 'en' AS is_target,
         regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
tk AS (
  SELECT id, is_target, unnest(string_split_regex(t, '\s+')) AS word FROM norm
),
counts AS (
  SELECT id,
         CAST(('0x' || substring(md5('dsir|' || word), 1, 12)) AS BIGINT) % {_DSIR_B} AS b,
         COUNT(*) AS c, MAX(is_target) AS is_target
  FROM tk WHERE word <> '' GROUP BY 1, 2
),
raw AS (SELECT b, SUM(c) AS cr FROM counts GROUP BY b),
tgt AS (SELECT b, SUM(c) AS ct FROM counts WHERE is_target GROUP BY b),
totals AS (
  SELECT (SELECT CAST(SUM(cr) AS BIGINT) FROM raw) AS n_r,
         (SELECT CAST(SUM(ct) AS BIGINT) FROM tgt) AS n_t
),
w AS (
  SELECT raw.b,
         ln(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE) / (t.n_t + {_DSIR_B}))
         - ln(CAST(raw.cr + 1 AS DOUBLE) / (t.n_r + {_DSIR_B})) AS lw
  FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN totals t
)
SELECT counts.id, CAST(SUM(counts.c) AS BIGINT) AS n_toks,
       ROUND(SUM(counts.c * w.lw), 6) AS score
FROM counts JOIN w ON w.b = counts.b
GROUP BY counts.id"""


@query("dsir_importance_log", _DSIR_LOG_ORACLE)
def dsir_importance_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR in the paper's log-domain form (score = sum c_b * (ln p_t -
    ln p_r)) — the production scorer. Hash-certified round 5 (retiring
    the rows-only check): the per-doc score rounds to 6 decimals, wide
    enough to absorb both the <=1-ulp ln divergence between the JVM and
    DuckDB's libm and few-hundred-term summation-order noise — the same
    round-6 contract every cosine/sqrt query in the registry already
    hash-checks under. Exact unrounded floats stay pinned against a
    python twin in pytest; the linear_q twin still certifies the
    integer-exact plumbing."""
    from .operators.curation import dsir_importance

    docs = testdata.load(spark, sf_dir, "documents").withColumn(
        "is_en", F.col("lang") == "en"
    )
    return dsir_importance(docs, "is_en", n_buckets=_DSIR_B, mode="log")


_IVF_TRAINED_FROZEN_ORACLE = f"""WITH {_ivf_frozen_cents_sql()},
{_ivf_frozen_assign_sql()},
cells AS (SELECT vec_id AS neighbor_id, cent_id AS cell FROM assign WHERE rnk = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM assign
  WHERE vec_id IN (0, 1, 2, 3, 4) AND rnk <= 2
),
cand AS (
  SELECT p.query_id, c.neighbor_id FROM probes p
  JOIN cells c ON c.cell = p.cell AND c.neighbor_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, ROUND({_COS_SQL}, 6) AS cos_sim
  FROM cand
  JOIN embeddings a ON a.vec_id = cand.query_id
  JOIN embeddings b ON b.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
  ) AS rank FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5"""


@query("ann_ivf_trained", _IVF_TRAINED_FROZEN_ORACLE)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end TRAINED IVF serving in floats, hash-checked: the coarse
    quantizer is the FROZEN Lloyd-trained centroid artifact
    (artifacts.py, kmeans_fit k=8 iters=3 offline), serving is identical
    to ann_ivf_topk (rounded-cosine cell assignment, 2-probe, exact
    in-cell ranking). This retired the rows-only registration that
    trained inline: offline-train-and-freeze is the production shape,
    inline float Lloyd stays numpy-twin-pinned in pytest, and the
    quantized ann_kmeans_cells_q / ann_ivf_trained_q keep hash evidence
    on the TRAINING trajectory itself."""
    from .artifacts import ivf_centroids_df

    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.ivf_ann_topk(
        emb, ivf_centroids_df(spark), [0, 1, 2, 3, 4], k=5, nprobe=2
    )


_DUP_SPAN_ORACLE = r"""WITH norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
base AS (
  SELECT id, string_split_regex(t, '\s+') AS tk FROM norm
),
ps AS (
  SELECT id, CAST(i AS INT) AS pos, array_to_string(tk[i:i+7], ' ') AS sh
  FROM (SELECT id, tk, unnest(range(1, len(tk) - 6)) AS i
        FROM base WHERE len(tk) >= 8)
),
occ AS (SELECT sh FROM ps GROUP BY sh HAVING COUNT(*) >= 2),
cov AS (
  SELECT DISTINCT id, ti FROM (
    SELECT ps.id, unnest(range(ps.pos, ps.pos + 8)) AS ti
    FROM ps JOIN occ USING (sh))
),
covc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_dup_tokens FROM cov GROUP BY id)
SELECT b.id, CAST(len(b.tk) AS BIGINT) AS n_tokens,
       COALESCE(c.n_dup_tokens, 0) AS n_dup_tokens,
       CAST(floor(1000000 * (CAST(COALESCE(c.n_dup_tokens, 0) AS DOUBLE) / len(b.tk))) AS BIGINT) AS dup_frac_q
FROM base b LEFT JOIN covc c USING (id)"""


@query("dup_span_profile", _DUP_SPAN_ORACLE)
def dup_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span coverage per document (Lee et al., ACL'22): the
    fraction of each doc's token positions inside an 8-gram occurring
    more than once in the corpus — the document-level substring-dedup
    signal (operators/dedup.py:dup_span_profile). Every doc gets a row;
    all-integer output hash-checks."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.dup_span_profile(docs, n=8)


_SUBSTR_DEDUP_ORACLE = r"""WITH norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
base AS (SELECT id, string_split_regex(t, '\s+') AS tk FROM norm),
ps AS (
  SELECT id, CAST(i AS INT) AS pos, array_to_string(tk[i:i+7], ' ') AS sh
  FROM (SELECT id, tk, unnest(range(1, len(tk) - 6)) AS i
        FROM base WHERE len(tk) >= 8)
),
ranked AS (
  SELECT id, pos,
         ROW_NUMBER() OVER (PARTITION BY sh ORDER BY id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY sh) AS occ
  FROM ps
),
dup_occ AS (SELECT id, pos, rn = 1 AS is_first FROM ranked WHERE occ >= 2),
marks AS (
  SELECT id, ti, MAX(is_first) AS kept FROM (
    SELECT id, unnest(range(pos, pos + 8)) AS ti, is_first FROM dup_occ
  ) GROUP BY id, ti
),
rm AS (SELECT id, list(ti) AS rml FROM marks WHERE NOT kept GROUP BY id)
SELECT b.id,
       -- COALESCE: duckdb's array_to_string yields NULL on an empty list
       -- (every token removed) where Spark's array_join yields ''
       COALESCE(array_to_string([b.tk[CAST(i AS INT)] for i in range(1, len(b.tk) + 1)
                        if NOT list_contains(COALESCE(r.rml, CAST([] AS BIGINT[])), i)], ' '), '') AS clean_text,
       CAST(len(b.tk) AS BIGINT) AS n_tokens,
       CAST(COALESCE(len(r.rml), 0) AS BIGINT) AS n_removed
FROM base b LEFT JOIN rm r USING (id)"""


@query("substring_dedup", _SUBSTR_DEDUP_ORACLE)
def substring_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring dedup WITH removal (Lee et al., ACL'22): duplicated
    8-grams keep their first (min (doc_id, pos)) occurrence, every other
    occurrence's exclusively-covered positions are cut, and each doc's
    text rebuilds from the survivors (operators/dedup.py:
    substring_dedup). Every doc gets a row; text + integer counts
    hash-check."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.substring_dedup(docs, n=8)


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch + Count-Min-Sketch heavy hitters — the
# constant-state members of the sketch family (KMV keeps k hashes; HLL
# keeps m registers; CMS keeps d*w counters)
# ---------------------------------------------------------------------------

_HLL_M = 256
_HLL_P = 25  # rho of an all-zero 24-bit suffix (32 - log2(m) + 1)
# frozen estimator constants, computed ONCE here and injected verbatim
# into BOTH engines (the trained-artifact recipe): a float literal
# round-trips identically through Spark and DuckDB parsers, and the
# linear-counting table is integer micro-units so the small-range branch
# never evaluates ln() inside either engine (cross-engine ln is not
# correctly rounded; a Python-side table is).
_HLL_K = (0.7213 / (1.0 + 1.079 / _HLL_M)) * _HLL_M * _HLL_M * float(1 << _HLL_P)
import math as _math  # noqa: E402

_HLL_LC_MICRO = [
    int(_math.floor(_HLL_M * _math.log(_HLL_M / z) * 1_000_000.0))
    for z in range(1, _HLL_M + 1)
]


def _hll_est_micro_sql(n: str, zeros: str) -> str:
    lc = "[" + ", ".join(str(v) for v in _HLL_LC_MICRO) + "]"
    raw = f"({_HLL_K!r} / CAST({n} AS DOUBLE))"
    return (
        f"CASE WHEN {raw} <= {2.5 * _HLL_M!r} AND {zeros} > 0"
        f" THEN {lc}[CAST({zeros} AS INT)]"
        f" ELSE CAST(floor({raw} * 1000000.0) AS BIGINT) END"
    )


_HLL_HASH = (
    "CAST(('0x' || substring(md5('hll|' || val), 1, 8)) AS BIGINT)"
)

_HLL_ORACLE = f"""WITH vals AS (
  SELECT 'user' AS keyspace, event_type, CAST(user_id AS VARCHAR) AS val FROM events
  UNION ALL
  SELECT 'event' AS keyspace, event_type, CAST(event_id AS VARCHAR) AS val FROM events
),
h AS (SELECT keyspace, event_type, {_HLL_HASH} AS h FROM vals),
r AS (SELECT keyspace, event_type, h % {_HLL_M} AS reg,
        CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_P}
             ELSE strpos(lpad(bin(h // {_HLL_M}), {_HLL_P - 1}, '0'), '1') END AS rho
      FROM h),
regs AS (SELECT keyspace, event_type, reg, MAX(rho) AS m_reg
         FROM r GROUP BY keyspace, event_type, reg),
agg AS (SELECT keyspace, event_type,
          SUM(CAST(1 AS BIGINT) << ({_HLL_P} - m_reg)) AS n_present,
          COUNT(*) AS nregs
        FROM regs GROUP BY keyspace, event_type),
st AS (SELECT keyspace, event_type,
         CAST({_HLL_M} - nregs AS BIGINT) AS zeros,
         n_present + ({_HLL_M} - nregs) * (CAST(1 AS BIGINT) << {_HLL_P}) AS n_sum
       FROM agg),
ex AS (SELECT 'user' AS keyspace, event_type, COUNT(DISTINCT user_id) AS exact_cnt
       FROM events GROUP BY event_type
       UNION ALL
       SELECT 'event' AS keyspace, event_type, COUNT(DISTINCT event_id)
       FROM events GROUP BY event_type)
SELECT s.keyspace, s.event_type, s.zeros,
       {_hll_est_micro_sql("s.n_sum", "s.zeros")} AS est_micro,
       e.exact_cnt
FROM st s JOIN ex e ON e.keyspace = s.keyspace AND e.event_type = s.event_type"""


@query("hll_distinct_sketch", _HLL_ORACLE)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch per event type over TWO
    keyspaces — users (~150 distinct at sf0.01: exercises the
    linear-counting small-range branch) and event ids (~2000 per type:
    exercises the bias-corrected raw branch) — next to the exact counts.

    Hash-checkable end to end, unlike approx_count_distinct (whose HLL++
    registers are engine-internal): registers are max(rho) over 32-bit
    md5 draws with rho computed on binary STRINGS both engines render
    identically (operators/sketch.py:hll_register_stats), the harmonic
    denominator is an exact integer, and the only float work is ONE
    correctly-rounded division by a frozen Python-side constant;
    the linear-counting branch reads a frozen 256-entry integer table
    instead of evaluating ln() (_HLL_LC_MICRO — the trained-artifact
    recipe applied to a transcendental).

    Scale shape: per-group state is EXACTLY m=256 registers through every
    exchange (map-side max partials), vs KMV's k hashes — the sketch
    family's constant-memory member. Accuracy ~1.04/sqrt(256) ~ 6.5%,
    pytest-asserted on both branches."""
    from .operators.sketch import hll_register_stats

    ev = testdata.load(spark, sf_dir, "events")
    users = hll_register_stats(
        ev.select("event_type", F.col("user_id").alias("v")), "event_type", "v", _HLL_M
    ).select(F.lit("user").alias("keyspace"), "event_type", "zeros", "N")
    evts = hll_register_stats(
        ev.select("event_type", F.col("event_id").alias("v")), "event_type", "v", _HLL_M
    ).select(F.lit("event").alias("keyspace"), "event_type", "zeros", "N")
    st = users.unionByName(evts)
    ex = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_cnt"))
        .select(F.lit("user").alias("keyspace"), "event_type", "exact_cnt")
        .unionByName(
            ev.groupBy("event_type")
            .agg(F.countDistinct("event_id").alias("exact_cnt"))
            .select(F.lit("event").alias("keyspace"), "event_type", "exact_cnt")
        )
    )
    raw = F.lit(_HLL_K) / F.col("N").cast("double")
    lc_arr = F.array(*[F.lit(v).cast("bigint") for v in _HLL_LC_MICRO])
    est = (
        F.when(
            (raw <= F.lit(2.5 * _HLL_M)) & (F.col("zeros") > 0),
            F.element_at(lc_arr, F.col("zeros").cast("int")),
        )
        .otherwise(F.floor(raw * F.lit(1000000.0)).cast("bigint"))
    )
    return st.join(ex, ["keyspace", "event_type"]).select(
        "keyspace", "event_type", "zeros", est.alias("est_micro"), "exact_cnt"
    )


_CMS_D = 4
_CMS_W = 1024
_CMS_PHI_DEN = 200  # heavy = est >= total // 200 (0.5% of the stream)

_CMS_BUCKET = (
    "CAST(('0x' || substring(md5(CAST(i AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 8))"
    f" AS BIGINT) % {_CMS_W}"
)

_CMS_ORACLE = f"""WITH ib AS (SELECT CAST(unnest(range({_CMS_D})) AS BIGINT) AS i),
cells AS (SELECT e.user_id, ib.i, {_CMS_BUCKET} AS b
          FROM events e, ib),
sk AS (SELECT i, b, COUNT(*) AS c FROM cells GROUP BY i, b),
probe AS (SELECT DISTINCT user_id FROM events),
pb AS (SELECT p.user_id, ib.i, {_CMS_BUCKET.replace("user_id", "p.user_id")} AS b
       FROM probe p, ib),
est AS (SELECT pb.user_id, MIN(sk.c) AS est_count
        FROM pb JOIN sk ON sk.i = pb.i AND sk.b = pb.b
        GROUP BY pb.user_id),
ex AS (SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id),
tot AS (SELECT COUNT(*) AS t FROM events)
SELECT e.user_id, e.est_count, x.exact_count
FROM est e JOIN ex x ON x.user_id = e.user_id, tot
WHERE e.est_count >= tot.t // {_CMS_PHI_DEN}"""


@query("cms_heavy_hitters", _CMS_ORACLE)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy hitters: users whose CMS frequency estimate
    reaches 0.5% of the event stream, next to their exact counts.

    The sketch is d=4 x w=1024 counters built in ONE aggregation whose
    exchange carries at most d*w rows per input partition (map-side
    partial sums); the probe side recomputes its cells map-side and joins
    the 4096-row sketch BROADCAST, so no step's state or shuffle grows
    with key cardinality — the exact per-key count shown alongside is the
    comparison baseline the sketch replaces at scale. Estimates are
    deterministic integers (md5 bucketing), over-counting only — the CMS
    one-sided guarantee, pytest-asserted (operators/sketch.py:
    cms_estimates)."""
    from .operators.sketch import cms_estimates

    ev = testdata.load(spark, sf_dir, "events")
    total = ev.count()  # one scalar job; the threshold is a literal below
    est = cms_estimates(ev.select("user_id"), "user_id", d=_CMS_D, w=_CMS_W)
    ex = ev.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    return (
        est.join(ex, "user_id")
        .filter(F.col("est_count") >= F.lit(total // _CMS_PHI_DEN))
        .select("user_id", "est_count", "exact_count")
    )


_HARDNEG_ORACLE = f"""WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND({_COS_SQL}, 6) AS cos_sim
  FROM embeddings a JOIN embeddings b
    ON b.vec_id <> a.vec_id AND b.label <> a.label
  WHERE a.vec_id IN (0, 1, 2, 3, 4)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 10"""


@query("hard_negative_mining", _HARDNEG_ORACLE)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval training: per query vector, the
    top-10 most-similar OTHER-label vectors (operators/similarity.py:
    hard_negatives). Broadcast queries, streaming corpus, and ranking via
    the threshold-pruned bounded-state top-k (no per-query full-corpus
    sort window — the oracle's row_number is the logical spec only)."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.hard_negatives(emb, [0, 1, 2, 3, 4], k=10)


# ---------------------------------------------------------------------------
# Boilerplate n-gram mining, JL random projection, corpus token accounting
# — round-4 late additions (round-5 certification queue; full local parity)
# ---------------------------------------------------------------------------

_BOILERPLATE_ORACLE = r"""WITH norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
base AS (SELECT id, string_split_regex(t, '\s+') AS tk FROM norm),
sh AS (
  SELECT DISTINCT id, array_to_string(tk[i:i+7], ' ') AS shingle
  FROM (SELECT id, tk, unnest(range(1, len(tk) - 6)) AS i
        FROM base WHERE len(tk) >= 8)
),
dfreq AS (
  SELECT shingle, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM sh GROUP BY shingle HAVING COUNT(*) >= 2
),
ranked AS (
  SELECT shingle, n_docs,
         ROW_NUMBER() OVER (ORDER BY n_docs DESC, shingle) AS rank
  FROM dfreq
)
SELECT shingle, n_docs, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 20"""


@query("boilerplate_ngrams", _BOILERPLATE_ORACLE)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus-wide repeated 8-grams by document frequency
    (operators/dedup.py:repeated_ngrams) — the boilerplate report Lee et
    al. (ACL'22) publish for C4 and the input to every blocklist
    decision. Global top-k via the bounded-state threshold-pruned
    primitive; the oracle's ORDER BY is the logical spec only."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.repeated_ngrams(docs, n=8, min_docs=2, k=20)


def _rp_duck_sql(n_proj: int, dim: int, quant: int) -> str:
    """DuckDB twin of operators/similarity.py:random_projection — the
    same frozen md5 sign matrix inlined as literal integer arithmetic
    (sums of bigint products are order-independent, so both engines are
    bit-identical by construction)."""
    signs = S.rp_signs(n_proj, dim)
    arms = "\nUNION ALL\n".join(
        "SELECT vec_id AS id, CAST({j} AS BIGINT) AS proj_id,\n  CAST({terms} AS BIGINT) AS proj_q FROM q".format(
            j=j,
            terms=" + ".join(
                f"({s})*qv[{d + 1}]" for d, s in enumerate(signs[j])
            ),
        )
        for j in range(n_proj)
    )
    return (
        "WITH q AS (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {float(quant)!r}) AS BIGINT)) AS qv "
        "FROM embeddings)\n" + arms
    )


@query("embedding_random_projection", _rp_duck_sql(8, 64, 1_000_000))
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-dim Johnson-Lindenstrauss +/-1 projection of the 64-dim corpus
    (operators/similarity.py:random_projection): quantize-first integer
    arithmetic, zero shuffle, whole-stage codegen — the projection pass
    every downstream LSH/SimHash consumer shares at 100 TB."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.random_projection(emb, n_proj=8, dim=64, quant=1_000_000)


_TOKEN_ACCT_ORACLE = r"""WITH base AS (
  SELECT source, lang, doc_id,
         CAST(len(string_split_regex(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), '\s+')) AS BIGINT) AS n_tokens,
         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
),
keep AS (SELECT fp, MIN(doc_id) AS keep_id FROM base GROUP BY fp)
SELECT b.source, b.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(b.n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN b.doc_id = k.keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_unique,
       CAST(SUM(CASE WHEN b.doc_id = k.keep_id THEN b.n_tokens ELSE 0 END) AS BIGINT) AS unique_tokens,
       CAST(floor(1000000.0 * (SUM(b.n_tokens) - SUM(CASE WHEN b.doc_id = k.keep_id THEN b.n_tokens ELSE 0 END))
                  / SUM(b.n_tokens)) AS BIGINT) AS dup_token_frac_q
FROM base b JOIN keep k USING (fp)
GROUP BY b.source, b.lang"""


@query("corpus_token_accounting", _TOKEN_ACCT_ORACLE)
def corpus_token_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus accounting report a 100 TB training-data pipeline
    publishes per (source, lang): docs and tokens before/after exact
    dedup (first occurrence by min doc_id keeps) and the duplicated-token
    fraction in micro-units. Physical shape: fingerprint + token count
    map-side; the keeps table is 1 row per fingerprint so the join back
    fans out x1; the final rollup is a tiny (source x lang) partial agg.
    No step's state grows faster than the distinct-fingerprint count."""
    docs = testdata.load(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        "doc_id",
        X.token_count(X.normalize_text(F.col("text"))).alias("n_tokens"),
        X.fingerprint(F.col("text")).alias("fp"),
    )
    keep = base.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    kept = F.col("doc_id") == F.col("keep_id")
    acc = (
        base.join(keep, "fp")
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_docs_unique"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("unique_tokens"),
        )
    )
    return acc.select(
        "source",
        "lang",
        "n_docs",
        "total_tokens",
        "n_docs_unique",
        "unique_tokens",
        F.floor(
            F.lit(1000000.0)
            * (F.col("total_tokens") - F.col("unique_tokens")).cast("double")
            / F.col("total_tokens").cast("double")
        )
        .cast("bigint")
        .alias("dup_token_frac_q"),
    )


_SNAPSHOT_DIFF_ORACLE = r"""WITH old AS (
  SELECT doc_id AS id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_old
  FROM documents WHERE doc_id % 7 <> 3
),
new AS (
  SELECT doc_id AS id,
         md5(regexp_replace(trim(lower(
           CASE WHEN doc_id % 13 = 2 THEN text || ' v2' ELSE text END)), '\s+', ' ', 'g')) AS fp_new
  FROM documents WHERE doc_id % 11 <> 5
),
diff AS (
  SELECT COALESCE(o.id, n.id) AS id,
         CASE WHEN o.fp_old IS NULL THEN 'added'
              WHEN n.fp_new IS NULL THEN 'removed'
              WHEN o.fp_old <> n.fp_new THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old o FULL OUTER JOIN new n ON o.id = n.id
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(id) AS BIGINT) AS min_id, CAST(MAX(id) AS BIGINT) AS max_id
FROM diff GROUP BY status"""


@query("corpus_snapshot_diff", _SNAPSHOT_DIFF_ORACLE)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two deterministic views of the corpus
    (operators/curation.py:snapshot_diff): old drops doc_id%7==3, new
    drops doc_id%11==5 and rewrites doc_id%13==2 — every status branch
    exercised. One full-outer id join, fingerprints map-side."""
    docs = testdata.load(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 3)
    new = docs.filter(F.col("doc_id") % 11 != 5).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 2, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    from .operators.curation import snapshot_diff

    return (
        snapshot_diff(old, new)
        .groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("id").cast("bigint").alias("min_id"),
            F.max("id").cast("bigint").alias("max_id"),
        )
    )


def _zorder_duck_terms(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of operators/layout.py:zorder_value — the identical
    Morton bit interleave as literal integer arithmetic."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_ZORDER_ORACLE = (
    "SELECT event_id, CAST("
    + _zorder_duck_terms(
        # floor, not CAST: epoch() yields fractional seconds and duckdb's
        # double->bigint cast ROUNDS where Spark's unix_timestamp truncates
        "(user_id & 65535)",
        "(CAST(floor(epoch(ts)) AS BIGINT) & 65535)",
    )
    + " AS BIGINT) AS zkey FROM events"
)


@query("zorder_key_events", _ZORDER_ORACLE)
def zorder_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morton key behind write_zorder_clustered (operators/layout.py:
    zorder_value), hash-checked per event over (user_id, epoch-second)
    low bits: pure map-side bit arithmetic, zero shuffle — the 2-D
    locality key a 100 TB events lake writes files by so range predicates
    on EITHER dimension prune most files."""
    from .operators.layout import zorder_value

    ev = testdata.load(spark, sf_dir, "events")
    a = F.col("user_id").cast("long").bitwiseAND(F.lit(65535))
    b = F.unix_timestamp("ts").cast("long").bitwiseAND(F.lit(65535))
    return ev.select(
        "event_id", zorder_value(a, b, bits=16).cast("bigint").alias("zkey")
    )


# Frozen tokenizer artifact (the trained-codebook recipe): an ordered BPE
# merge list applied verbatim in BOTH engines. Recursive chains (s p ->
# sp a -> spa r -> spar k) and an a==b rank (t t) exercise every merge
# mechanic the encoder owns.
_BPE_MERGES = [
    "t h", "th e", "e r", "a r", "s p", "sp a", "spa r", "spar k",
    "o r", "o w", "r ow", "t t", "a t", "b at", "bat ch",
]

_BPE_ENCODE_ORACLE = (
    r"""WITH norm AS (
  SELECT regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents
),
wc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split_regex(t, '\s+')) AS word FROM norm)
  WHERE word <> '' GROUP BY word
)
SELECT word, n, """
    + X.bpe_apply_sql("word", _BPE_MERGES)
    + r""" AS pieces,
       CAST(len(string_split("""
    + X.bpe_apply_sql("word", _BPE_MERGES)
    + r""", ' ')) AS BIGINT) AS n_pieces
FROM wc"""
)


@query("bpe_encode_pieces", _BPE_ENCODE_ORACLE)
def bpe_encode_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE under a frozen merge artifact (operators/text.py:
    bpe_encode_vocab) — the apply side of the tokenizer the corpus
    trains with bpe_merge_ranks. Vocab-reduced (one encode chain per
    DISTINCT word, never per token) and UDF-free: the doubled-boundary
    replace chain is exact greedy BPE (textbook-equivalence proven
    exhaustively in pytest) and runs identically in DuckDB, so the whole
    piece table hash-checks."""
    docs = testdata.load(spark, sf_dir, "documents")
    return X.bpe_encode_vocab(docs, _BPE_MERGES)


# ---------------------------------------------------------------------------
# End-to-end ingestion admission: bloom gate -> exact dedup -> near-dup
# check, as ONE certified composition (the batch twin of streaming/dedup's
# foreachBatch hook, with the bloom front-end the docstrings promise)
# ---------------------------------------------------------------------------
_FP_SQL = r"md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))"

_ADMISSION_ORACLE = f"""WITH batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
  UNION ALL
  -- re-keyed corpus copies: guaranteed exact dups so the bloom-positive
  -- and exact-dedup branches carry rows at every sf
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 3 <> 1 AND doc_id % 10 = 0
),
bfp AS (SELECT doc_id, {_FP_SQL} AS fp FROM batch),
cfp AS (
  SELECT DISTINCT {_FP_SQL} AS fp FROM documents WHERE doc_id % 3 <> 1
),
pos AS (
  {" UNION ALL ".join(f"SELECT fp, {_bloom_pos_sql('fp', j)} AS p FROM cfp" for j in range(_BLOOM_K))}
),
words AS (
  SELECT CAST(p // 32 AS BIGINT) AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
  FROM pos GROUP BY 1
),
bkeys AS (SELECT DISTINCT fp FROM bfp),
probes AS (
  {" UNION ALL ".join(f"SELECT fp AS key, {_bloom_pos_sql('fp', j)} AS p FROM bkeys" for j in range(_BLOOM_K))}
),
hits AS (
  SELECT pr.key,
         CASE WHEN COALESCE(w.bits, 0) & (CAST(1 AS BIGINT) << CAST(pr.p % 32 AS INT)) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM probes pr LEFT JOIN words w ON w.word_idx = CAST(pr.p // 32 AS BIGINT)
),
verdict AS (SELECT key, MIN(hit) = 1 AS maybe_present FROM hits GROUP BY key),
exact AS (SELECT b.doc_id FROM bfp b JOIN cfp c USING (fp)),
norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
toks AS (SELECT id, string_split_regex(t, '\\s+') AS tk FROM norm),
sh AS (
  SELECT id, unnest(list_distinct([tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))])) AS shingle
  FROM toks
),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
survivors AS (
  SELECT doc_id FROM batch WHERE doc_id NOT IN (SELECT doc_id FROM exact)
),
inter AS (
  SELECT a.id AS new_id, b.id AS old_id, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.id IN (SELECT doc_id FROM survivors) AND b.id % 3 <> 1
  GROUP BY a.id, b.id
),
near AS (
  SELECT DISTINCT new_id AS doc_id
  FROM inter JOIN sizes sa ON sa.id = new_id JOIN sizes sb ON sb.id = old_id
  WHERE ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= 0.5
),
status AS (
  SELECT b.doc_id, v.maybe_present,
         e.doc_id IS NOT NULL AS is_ex,
         n.doc_id IS NOT NULL AS is_nr
  FROM bfp b
  JOIN verdict v ON v.key = b.fp
  LEFT JOIN exact e ON e.doc_id = b.doc_id
  LEFT JOIN near n ON n.doc_id = b.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
       CAST(SUM(CASE WHEN NOT maybe_present THEN 1 ELSE 0 END) AS BIGINT) AS n_definitely_new,
       CAST(SUM(CASE WHEN maybe_present THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe_present,
       CAST(SUM(CASE WHEN is_ex THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
       CAST(SUM(CASE WHEN is_nr THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       CAST(SUM(CASE WHEN NOT is_ex AND NOT is_nr THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
FROM status"""


@query("ingestion_admission_counts", _ADMISSION_ORACLE)
def ingestion_admission_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete 100 TB ingestion-dedup front door as ONE certified
    composition: a batch (doc_id%3==1) admits against the corpus (the
    rest) through (1) the Bloom gate over content fingerprints — a
    bounded word table regardless of corpus size, definitely-new keys
    PROVE novelty and skip the exact lookup; (2) the exact fingerprint
    check; (3) the cross-corpus near-dup probe (jaccard_pairs_between —
    the inverted join that never re-self-joins history). One summary
    row: batch / bloom-verdict / exact-dup / near-dup / admitted counts.
    Within-batch dedup is the separate certified stage
    (curation_pipeline_counts); this query certifies the batch-vs-corpus
    path, the one the streaming hook (streaming/dedup.py) runs per
    micro-batch."""
    docs = testdata.load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 3 != 1)
    # re-keyed corpus copies guarantee the bloom-positive + exact-dup
    # branches carry rows at every sf (the synthetic corpus has few
    # cross-partition exact dups of its own)
    replayed = corpus.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    batch = docs.filter(F.col("doc_id") % 3 == 1).select("doc_id", "text").unionAll(
        replayed
    )
    bfp = batch.select("doc_id", X.fingerprint(F.col("text")).alias("fp"))
    cfp = corpus.select(X.fingerprint(F.col("text")).alias("fp")).distinct()
    words = D.bloom_filter_words(cfp, "fp", m_bits=_BLOOM_M, k_hashes=_BLOOM_K)
    verdict = D.bloom_probe(bfp, words, "fp", m_bits=_BLOOM_M, k_hashes=_BLOOM_K)
    exact_ids = bfp.join(cfp, "fp", "left_semi").select("doc_id")
    survivors = batch.join(exact_ids, "doc_id", "left_anti")
    near_ids = (
        D.jaccard_pairs_between(survivors, corpus, n=2, threshold=0.5)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    status = (
        bfp.join(verdict.withColumnRenamed("key", "fp"), "fp")
        .join(exact_ids.withColumn("_ex", F.lit(True)), "doc_id", "left")
        .join(near_ids.withColumn("_nr", F.lit(True)), "doc_id", "left")
    )
    ex = F.coalesce(F.col("_ex"), F.lit(False))
    nr = F.coalesce(F.col("_nr"), F.lit(False))
    return status.agg(
        F.count("*").cast("bigint").alias("n_batch"),
        F.sum(F.when(~F.col("maybe_present"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_definitely_new"),
        F.sum(F.when(F.col("maybe_present"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_maybe_present"),
        F.sum(F.when(ex, 1).otherwise(0)).cast("bigint").alias("n_exact_dup"),
        F.sum(F.when(nr, 1).otherwise(0)).cast("bigint").alias("n_near_dup"),
        F.sum(F.when(~ex & ~nr, 1).otherwise(0)).cast("bigint").alias("n_admitted"),
    )


_BPE_SOURCE_ORACLE = (
    r"""WITH norm AS (
  SELECT source, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
docwords AS (
  SELECT source, unnest(string_split_regex(t, '\s+')) AS word FROM norm
),
vocab AS (
  SELECT word,
         CAST(len(string_split("""
    + X.bpe_apply_sql("word", _BPE_MERGES)
    + r""", ' ')) AS BIGINT) AS n_pieces
  FROM (SELECT DISTINCT word FROM docwords WHERE word <> '')
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(v.n_pieces) AS BIGINT) AS n_bpe_tokens
FROM docwords d JOIN vocab v USING (word)
GROUP BY d.source"""
)


@query("bpe_source_token_counts", _BPE_SOURCE_ORACLE)
def bpe_source_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting under the TRAINED tokenizer: per source,
    total words and total BPE pieces — the number that actually prices a
    training run (compute budgets are piece counts, not whitespace
    counts). Physical shape: the doc word stream joins the encoded VOCAB
    (Heaps'-law small in practice but corpus-derived, so NO forced
    broadcast hint — AQE broadcasts when the vocab is actually small and
    falls back to a hash join when it is not, per the repo's
    bounded-broadcast discipline; the encode chain ran once per distinct
    word, never per token), then one partial-agg rollup per source."""
    docs = testdata.load(spark, sf_dir, "documents")
    vocab = X.bpe_encode_vocab(docs, _BPE_MERGES).select("word", "n_pieces")
    words = docs.select(
        "source",
        F.explode(X.tokens(X.normalize_text(F.col("text")))).alias("word"),
    ).filter(F.col("word") != "")
    return (
        words.join(vocab, "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_bpe_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and dense
# (embedding-cosine) rankers for "more-like-this" queries — the standard
# RAG-stack combiner (Cormack et al., SIGIR'09). doc_id and vec_id are the
# same key space in this corpus, so fusing by id is exact. All-integer:
# BM25 micro-unit scores, round-6 cosine ranks, and 1e6 div (60 + rank)
# fusion contributions — full hash check.
# ---------------------------------------------------------------------------
_RRF_QUERY_DOCS = [0, 1, 2, 3, 4]
_RRF_QLIST = ", ".join(str(i) for i in _RRF_QUERY_DOCS)

_RRF_ORACLE = rf"""WITH norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
qt AS (
  SELECT DISTINCT id AS query_id,
         unnest(list_slice(string_split_regex(t, '\s+'), 1, 8)) AS term
  FROM norm WHERE id IN ({_RRF_QLIST})
),
tk AS (SELECT id, unnest(string_split_regex(t, '\s+')) AS term FROM norm),
terms AS (SELECT DISTINCT term FROM qt),
postings AS (
  SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tk JOIN terms USING (term) GROUP BY id, term
),
dl AS (SELECT id, CAST(len(string_split_regex(t, '\s+')) AS BIGINT) AS dl FROM norm),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS sum_dl
),
matched AS (
  SELECT q.query_id, p.id, p.tf, d.dl, f.df, s.n_docs, s.sum_dl
  FROM postings p
  JOIN qt q USING (term)
  JOIN dl d USING (id)
  JOIN (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY term) f USING (term)
  CROSS JOIN stats s
),
lex_scored AS (
  SELECT query_id, id AS doc_id,
         CAST(SUM(CAST(floor({{BM25C}} * 1000000) AS BIGINT)) AS BIGINT) AS score_q
  FROM matched GROUP BY query_id, id
),
lex_ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score_q DESC, doc_id ASC) AS rank
  FROM lex_scored
),
den_scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
         ROUND({{COSQ}}, 6) AS cos_sim
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.vec_id IN ({_RRF_QLIST})
),
den_ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, doc_id ASC) AS rank
  FROM den_scored
),
contrib AS (
  SELECT query_id, doc_id, 1000000 // (60 + rank) AS c
  FROM lex_ranked WHERE rank <= 20 AND doc_id <> query_id
  UNION ALL
  SELECT query_id, doc_id, 1000000 // (60 + rank) AS c
  FROM den_ranked WHERE rank <= 20
),
fused AS (
  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_q
  FROM contrib GROUP BY query_id, doc_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY rrf_q DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(doc_id AS BIGINT) AS doc_id,
       rrf_q, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 10"""
_RRF_ORACLE = _RRF_ORACLE.replace("{BM25C}", _BM25_CONTRIB).replace("{COSQ}", _COS_SQL)


@query("hybrid_retrieval_rrf", _RRF_ORACLE)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this hybrid retrieval: for each query document, fuse the
    BM25 ranking of its leading 8 tokens (lexical) with its exact cosine
    neighbor ranking (dense) via integer reciprocal-rank fusion
    (operators/retrieval.py:rrf_fuse).

    Scale shape: the 5 query texts collect at compose time (bounded by
    construction — the query set IS driver-sized in retrieval); each
    system produces bounded top-20-per-query candidates; fusion is a
    union + one tiny groupBy; the final top-10 routes through the
    threshold-pruned top-k so no hot-group rank window exists anywhere
    in the chain."""
    import re as _re

    from .operators.retrieval import bm25_topk, rrf_fuse

    docs = testdata.load(spark, sf_dir, "documents")
    emb = testdata.load(spark, sf_dir, "embeddings")
    qrows = (
        docs.filter(F.col("doc_id").isin(_RRF_QUERY_DOCS))
        .select("doc_id", "text")
        .collect()
    )
    queries = {
        int(r.doc_id): " ".join(_re.split(r"\s+", r.text.strip().lower())[:8])
        for r in qrows
    }
    lex = bm25_topk(docs, queries, k=20, idf_mode="rsj_sqrt").filter(
        F.col("doc_id") != F.col("query_id")
    )
    den = S.knn_brute_force(emb, _RRF_QUERY_DOCS, k=20).withColumnRenamed(
        "neighbor_id", "doc_id"
    )
    return rrf_fuse(
        [
            lex.select("query_id", "doc_id", "rank"),
            den.select("query_id", "doc_id", "rank"),
        ],
        k=10,
    )


# ---------------------------------------------------------------------------
# CCNet-style per-language quality bucketing (Wenzek et al., LREC'20): rank
# every document by its char-LM likelihood within its language and cut the
# corpus into head/middle/tail tertiles — the standard web-corpus quality
# stratification that downstream sampling weights by. Thresholds are exact
# type-1 tertiles of the integer-quantized scores, computed with the
# bounded-state two-pass quantile primitive — never a per-language sort of
# the raw corpus.
# ---------------------------------------------------------------------------
_CCNET_ORACLE = rf"""WITH scores AS (
  SELECT d.lang, s.avg_prob_q
  FROM ({_CHARLM_ORACLE}) s JOIN documents d ON d.doc_id = s.id
),
ranked AS (
  SELECT lang, avg_prob_q,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY avg_prob_q) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM scores
),
thr AS (
  SELECT lang,
         MAX(CASE WHEN rn <= (1 * n + 2) // 3 THEN avg_prob_q END) AS t1,
         MAX(CASE WHEN rn <= (2 * n + 2) // 3 THEN avg_prob_q END) AS t2
  FROM ranked GROUP BY lang
),
bucketed AS (
  SELECT s.lang,
         CASE WHEN s.avg_prob_q <= t.t1 THEN 'tail'
              WHEN s.avg_prob_q <= t.t2 THEN 'middle'
              ELSE 'head' END AS bucket,
         s.avg_prob_q
  FROM scores s JOIN thr t USING (lang)
)
SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(avg_prob_q) AS BIGINT) AS sum_q
FROM bucketed GROUP BY lang, bucket"""


@query("ccnet_quality_buckets", _CCNET_ORACLE)
def ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language head/middle/tail quality tertiles over the char-LM
    likelihood score (higher avg_prob_q = more corpus-like = head).

    Physical shape at 100 TB: scoring is the certified charlm chain
    (bounded charset^2 model broadcast); the tertile thresholds come from
    operators/sketch.py:grouped_exact_quantiles (two bounded passes, no
    per-language rank over raw rows); the per-language threshold table is
    tiny and broadcasts back for the map-side bucket assignment; one
    partial-agg rollup emits the (lang, bucket) summary."""
    from .operators.sketch import grouped_exact_quantiles

    docs = testdata.load(spark, sf_dir, "documents")
    scores = X.charlm_score(docs).select("id", "avg_prob_q")
    # the scored frame feeds three consumers (quantile histogram pass,
    # quantile refine pass, final bucket rollup); persist so the
    # multi-shuffle charlm chain executes once — same memory-and-disk
    # materialization discipline as pipeline.curate_corpus (the returned
    # rollup keeps the cache alive for the caller's action; registered
    # for the harness's between-queries drain like the band-sweep cache)
    from .operators.session_cache import register_session_cache

    scored = register_session_cache(
        docs.select(F.col("doc_id").alias("id"), "lang").join(scores, "id").persist()
    )
    thr = grouped_exact_quantiles(
        scored, "lang", "avg_prob_q", [("t1", 1, 3), ("t2", 2, 3)]
    )
    pivot = thr.groupBy("lang").agg(
        F.max(F.when(F.col("q") == "t1", F.col("val"))).alias("t1"),
        F.max(F.when(F.col("q") == "t2", F.col("val"))).alias("t2"),
    )
    bucket = (
        F.when(F.col("avg_prob_q") <= F.col("t1"), F.lit("tail"))
        .when(F.col("avg_prob_q") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("head"))
    )
    return (
        scored.join(F.broadcast(pivot), "lang")
        .select("lang", bucket.alias("bucket"), "avg_prob_q")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("avg_prob_q").cast("bigint").alias("sum_q"),
        )
    )


# ---------------------------------------------------------------------------
# BPE-ish regex pre-tokenization counting (the GPT-2 pre-tokenizer shape:
# contraction suffixes, space-prefixed letter runs, digit runs, punctuation
# runs). Both engines evaluate the SAME pattern with leftmost-first
# alternation (Java regex and DuckDB's RE2 both follow PCRE submatch
# semantics here — no lookarounds used, so the simplification is portable).
# Counting only — the trained-merge piece counts live in bpe_encode_pieces.
# ---------------------------------------------------------------------------
_PRETOK_PAT = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"

_PRETOK_ORACLE = rf"""WITH norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
per AS (
  SELECT d.source,
         len(list_filter(string_split_regex(n.t, '\s+'), x -> x <> '')) AS nws,
         len(list_filter(regexp_extract_all(n.t, '{_PRETOK_PAT.replace("'", "''")}'),
                         x -> NOT regexp_matches(x, '^\s+$'))) AS nrx
  FROM norm n JOIN documents d ON d.doc_id = n.id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nws) AS BIGINT) AS n_ws_tokens,
       CAST(SUM(nrx) AS BIGINT) AS n_regex_tokens,
       CAST((1000000 * SUM(nrx)) // GREATEST(SUM(nws), 1) AS BIGINT)
         AS pretok_ratio_micro
FROM per GROUP BY source"""


@query("regex_token_counts", _PRETOK_ORACLE)
def regex_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token accounting under a GPT-2-style REGEX pre-tokenizer
    next to plain whitespace counts — the "BPE-ish regex" counting pass a
    compute-budget estimate runs before any trained tokenizer exists
    (regex pieces track BPE pieces far better than whitespace words on
    punctuation- and digit-heavy text).

    Physical shape: both counts are one regexp pass per row over the
    materialized normalized text (map-side, zero joins), then a single
    partial-agg rollup on the tiny source dimension. The whitespace-only
    filter is defensive: normalization collapses runs, so the \\s+
    fallback branch cannot fire on this corpus."""
    from .operators.util import spread

    docs = testdata.load(spark, sf_dir, "documents")
    base = spread(
        docs.select("source", X.normalize_text(F.col("text")).alias("_t"))
    )
    ws = F.size(F.filter(F.split(F.col("_t"), r"\s+"), lambda x: x != ""))
    rx = F.size(
        F.filter(
            F.regexp_extract_all(F.col("_t"), F.lit(_PRETOK_PAT), F.lit(0)),
            lambda x: ~x.rlike(r"^\s+$"),
        )
    )
    return (
        base.select("source", ws.alias("_nws"), rx.alias("_nrx"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_nws").cast("bigint").alias("n_ws_tokens"),
            F.sum("_nrx").cast("bigint").alias("n_regex_tokens"),
            F.expr(
                "(1000000 * sum(_nrx)) div greatest(sum(_nws), 1)"
            ).cast("bigint").alias("pretok_ratio_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-novelty accounting: the unique-n-gram-fraction report (the
# complement of boilerplate_ngrams). df==1 shingles keep their single
# owner as min(id) inside the doc-frequency aggregate itself, so the
# per-doc novel count never joins back to the exploded shingle table.
# ---------------------------------------------------------------------------
_NOVELTY_ORACLE = r"""WITH norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
base AS (SELECT id, string_split_regex(t, '\s+') AS tk FROM norm),
sh AS (
  SELECT DISTINCT id, array_to_string(tk[i:i+7], ' ') AS shingle
  FROM (SELECT id, tk, unnest(range(1, len(tk) - 6)) AS i
        FROM base WHERE len(tk) >= 8)
),
per_tot AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY id),
novel_doc AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_novel
  FROM (SELECT MIN(id) AS id FROM sh GROUP BY shingle HAVING COUNT(*) = 1)
  GROUP BY id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(p.id) AS BIGINT) AS n_docs_shingled,
       CAST(COALESCE(SUM(p.n_sh), 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(SUM(nd.n_novel), 0) AS BIGINT) AS n_novel,
       CAST((1000000 * COALESCE(SUM(nd.n_novel), 0))
            // GREATEST(COALESCE(SUM(p.n_sh), 0), 1) AS BIGINT) AS novelty_micro
FROM documents d
LEFT JOIN per_tot p ON p.id = d.doc_id
LEFT JOIN novel_doc nd ON nd.id = d.doc_id
GROUP BY d.source"""


@query("ngram_novelty_profile", _NOVELTY_ORACLE)
def ngram_novelty_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unique-8-gram-fraction accounting
    (operators/dedup.py:ngram_novelty): total distinct shingles, how many
    are corpus-unique (df == 1), and the novelty ratio in micro-units —
    the content-originality table a dataset card publishes next to the
    boilerplate top-k. All-integer output hash-checks exactly.

    Physical shape: ONE evaluation of the regex-heavy gram scan —
    grouping sets (shingle)+(id) over the exploded table compute doc
    frequencies and per-doc totals in a single Expand(x2) partial agg
    (the df==1 owner rides the frequency agg as min(id)), which a second
    per-doc agg collapses into (id, n_shingles, n_novel); the per-source
    rollup joins that one doc-keyed table to the (doc_id, source)
    projection — an equi-join AQE is free to broadcast or co-partition —
    then one partial agg on the tiny source dimension."""
    docs = testdata.load(spark, sf_dir, "documents")
    per_doc = D.ngram_novelty(docs, n=8)
    src = docs.select(F.col("doc_id").alias("id"), "source")
    return (
        src.join(per_doc, "id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count("n_shingles").cast("bigint").alias("n_docs_shingled"),
            F.coalesce(F.sum("n_shingles"), F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce(F.sum("n_novel"), F.lit(0)).cast("bigint").alias("n_novel"),
            F.expr(
                "(1000000 * coalesce(sum(n_novel), 0))"
                " div greatest(coalesce(sum(n_shingles), 0), 1)"
            ).cast("bigint").alias("novelty_micro"),
        )
    )


def _centroid_duck_sql(dim: int, quant: int) -> str:
    """DuckDB twin of operators/similarity.py:label_centroid_dispersion —
    the same quantize-first bigint sums, truncating `//` centroid
    division (DuckDB `//` == Spark `div` toward zero, signed-safe), and
    the identically-shaped 1e6*(dot/(sqrt*sqrt)) cosine tree."""
    qsum = ", ".join(f"SUM(qv[{i + 1}]) AS s{i}" for i in range(dim))
    carr = ", ".join(f"CAST(s{i} // n_vecs AS BIGINT)" for i in range(dim))
    return f"""WITH q AS (
  SELECT label, list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {float(quant)!r}) AS BIGINT)) AS qv
  FROM embeddings
),
sums AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs, {qsum} FROM q GROUP BY label),
cent AS (SELECT label, [{carr}] AS c FROM sums),
per AS (
  SELECT q.label,
         CAST(floor(1000000.0 *
           (CAST(list_sum(list_transform(range(1, {dim + 1}), i -> qv[i] * c[i])) AS DOUBLE)
            / (sqrt(CAST(GREATEST(list_sum(list_transform(qv, x -> x * x)), 1) AS DOUBLE))
               * sqrt(CAST(GREATEST(list_sum(list_transform(c, x -> x * x)), 1) AS DOUBLE)))))
           AS BIGINT) AS cq
  FROM q JOIN cent USING (label)
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(cq) // COUNT(*) AS BIGINT) AS mean_cos_micro,
       CAST(MIN(cq) AS BIGINT) AS min_cos_micro,
       CAST(MAX(cq) AS BIGINT) AS max_cos_micro
FROM per GROUP BY label"""


@query("label_centroid_dispersion", _centroid_duck_sql(64, 1_000_000))
def label_centroid_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid cohesion over the embedding corpus
    (operators/similarity.py:label_centroid_dispersion): the
    class-compactness audit table — quantize-first integer centroids,
    map-side cosine against the broadcast k-row centroid table, two
    partial-agg exchanges total."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.label_centroid_dispersion(emb, dim=64, quant=1_000_000)


def _confusion_duck_sql(dim: int, quant: int) -> str:
    """DuckDB twin of operators/similarity.py:label_centroid_confusion —
    same integer centroid CTE as _centroid_duck_sql, then the k x k
    inequality self-join and the shared 1e6*(dot/(sqrt*sqrt)) tree."""
    qsum = ", ".join(f"SUM(qv[{i + 1}]) AS s{i}" for i in range(dim))
    carr = ", ".join(f"CAST(s{i} // n_vecs AS BIGINT)" for i in range(dim))
    return f"""WITH q AS (
  SELECT label, list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {float(quant)!r}) AS BIGINT)) AS qv
  FROM embeddings
),
sums AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs, {qsum} FROM q GROUP BY label),
cent AS (SELECT label, n_vecs, [{carr}] AS c FROM sums)
SELECT a.label AS label_a, b.label AS label_b,
       a.n_vecs AS n_a, b.n_vecs AS n_b,
       CAST(floor(1000000.0 *
         (CAST(list_sum(list_transform(range(1, {dim + 1}), i -> a.c[i] * b.c[i])) AS DOUBLE)
          / (sqrt(CAST(GREATEST(list_sum(list_transform(a.c, x -> x * x)), 1) AS DOUBLE))
             * sqrt(CAST(GREATEST(list_sum(list_transform(b.c, x -> x * x)), 1) AS DOUBLE)))))
         AS BIGINT) AS cos_micro
FROM cent a JOIN cent b ON a.label < b.label"""


@query("label_centroid_confusion", _confusion_duck_sql(64, 1_000_000))
def label_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-label centroid separation matrix
    (operators/similarity.py:label_centroid_confusion): pairwise
    centroid-to-centroid cosine over the k-row integer centroid table —
    the confusion side of the embedding-space audit next to
    ``label_centroid_dispersion``'s cohesion side. Two exchanges (the
    k-row centroid partial agg, once per join branch); the k(k-1)/2
    pairs are a bounded tiny-BNLJ on the broadcast centroid table,
    never a corpus-scale join."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    return S.label_centroid_confusion(emb, dim=64, quant=1_000_000)


# ---------------------------------------------------------------------------
# Token-budget mixture construction: greedy hash-prefix admission per
# source. The oracle states the LOGICAL spec (one global running sum per
# source); the Spark plan replays it as the bucketed two-pass — full
# buckets admitted by their aggregates, one crossing bucket refined.
# ---------------------------------------------------------------------------
_TOKEN_BUDGET_ORACLE = r"""WITH base AS (
  SELECT source, doc_id AS id,
         CAST(len(string_split_regex(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), '\s+')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
tot AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS total_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST((2 * SUM(n_tokens)) // 5 AS BIGINT) AS budget_tokens
  FROM base GROUP BY source
),
ordered AS (
  SELECT b.source, b.n_tokens,
         SUM(b.n_tokens) OVER (PARTITION BY b.source ORDER BY b.h, b.id) AS cum
  FROM base b
),
kept AS (
  SELECT o.source, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
         CAST(COALESCE(SUM(o.n_tokens), 0) AS BIGINT) AS tokens_kept
  FROM ordered o JOIN tot t USING (source)
  WHERE o.cum <= t.budget_tokens
  GROUP BY o.source
)
SELECT t.source, t.total_docs, t.total_tokens, t.budget_tokens,
       CAST(COALESCE(k.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
FROM tot t LEFT JOIN kept k USING (source)"""


@query("token_budget_sample", _TOKEN_BUDGET_ORACLE)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy hash-prefix admission to 40% of each source's token mass
    (operators/curation.py:token_budget_prefix_sample) — the mixture-
    construction step of a fixed-token-budget training run. The logical
    per-source running sum is replayed physically as the bucketed
    two-pass: cumulative window over the 16^3-row bucket table, one
    crossing bucket per source refined per-doc — never a per-source sort
    of the corpus."""
    from .operators.curation import token_budget_prefix_sample

    docs = testdata.load(spark, sf_dir, "documents")
    return token_budget_prefix_sample(docs, f_num=2, f_den=5)


# ---------------------------------------------------------------------------
# Inter-corpus contamination: the source-pair shingle-overlap matrix
# (cross_source_dups lists the offending doc pairs; this is the
# aggregate slice-vs-slice view that drives mixing decisions).
# ---------------------------------------------------------------------------
_SOURCE_OVERLAP_ORACLE = r"""WITH norm AS (
  SELECT d.source, regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g') AS t
  FROM documents d
),
base AS (SELECT source, string_split_regex(t, '\s+') AS tk FROM norm),
sh AS (
  SELECT DISTINCT source, array_to_string(tk[i:i+7], ' ') AS shingle
  FROM (SELECT source, tk, unnest(range(1, len(tk) - 6)) AS i
        FROM base WHERE len(tk) >= 8)
),
counts AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS c FROM sh GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, ca.c AS n_a, cb.c AS n_b, p.n_common,
       CAST((1000000 * p.n_common) // (ca.c + cb.c - p.n_common) AS BIGINT)
         AS jaccard_micro
FROM pairs p
JOIN counts ca ON ca.source = p.source_a
JOIN counts cb ON cb.source = p.source_b"""


@query("source_overlap_matrix", _SOURCE_OVERLAP_ORACLE)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair 8-gram overlap matrix
    (operators/dedup.py:source_overlap_matrix): distinct shared shingles
    and set-level Jaccard per source pair. Per-shingle source sets are
    bounded by the source dimension, the pair explode is map-side over
    them, and the per-source totals broadcast — a shingle shared
    everywhere contributes k(k-1)/2 rows, never a cross join."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.source_overlap_matrix(docs, n=8)


# ---------------------------------------------------------------------------
# Winnowing (MOSS) fingerprint dedup: window-min k-gram hashes at ~2/(w+1)
# index density with the guaranteed-detection property for runs >= k+w-1.
# Registered WITH max_fp_df so the skew guard itself is certified (the
# dedup_jaccard_inverted convention).
# ---------------------------------------------------------------------------
_WINNOW_ORACLE = r"""WITH norm AS (
  SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
base AS (SELECT id, string_split_regex(t, '\s+') AS tk FROM norm),
g AS (
  SELECT id,
         [CAST('0x' || substr(md5(array_to_string(tk[i:i+4], ' ')), 1, 8) AS BIGINT)
          for i in range(1, len(tk) - 3)] AS hs
  FROM base WHERE len(tk) >= 8
),
wins AS (
  SELECT DISTINCT id,
         unnest(list_distinct([list_min(hs[j:j+3]) for j in range(1, len(hs) - 2)])) AS fp
  FROM g
),
okfp AS (SELECT fp FROM wins GROUP BY fp HAVING COUNT(*) <= 40),
kept AS (SELECT w.* FROM wins w JOIN okfp USING (fp))
SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.id < b.id
GROUP BY 1, 2 HAVING COUNT(*) >= 2"""


@query("winnowing_dup_pairs", _WINNOW_ORACLE)
def winnowing_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style near-dup pairs by shared winnowed fingerprints
    (operators/dedup.py:winnowing_dup_pairs, k=5 w=4): window-min 5-gram
    hashes keep ~2/(w+1) of the gram index yet cannot miss a shared run
    of >= 8 tokens; pairs sharing >= 2 selected fingerprints survive.
    max_fp_df=40 registers the boilerplate-fingerprint skew guard itself
    under certification. Postings groupBys only — never an all-pairs
    join."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.winnowing_dup_pairs(docs, k=5, w=4, min_shared=2, max_fp_df=40)


# ---------------------------------------------------------------------------
# Retrieval evaluation: recall@k and MRR of the LSH ANN ranking against
# the exact-kNN truth set — the eval-harness stage of a retrieval
# pipeline, composed from the two already-certified rankers.
# ---------------------------------------------------------------------------
_RETRIEVAL_EVAL_ORACLE = f"""WITH truth AS (SELECT * FROM ({_KNN_ORACLE}) t0),
cand AS (
  SELECT 'lsh' AS ranker, * FROM ({_LSH_TOPK_ORACLE}) c0
  UNION ALL
  SELECT 'lsh_multiprobe' AS ranker, * FROM ({_LSH_MULTIPROBE_ORACLE}) c1
),
hits AS (
  SELECT c.ranker, c.query_id, c.rank
  FROM cand c JOIN truth t
    ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id
),
per AS (
  SELECT ranker, query_id, CAST(COUNT(*) AS BIGINT) AS n_hits, MIN(rank) AS fr
  FROM hits GROUP BY ranker, query_id
),
qs AS (
  SELECT r.ranker, t.query_id
  FROM (SELECT DISTINCT query_id FROM truth) t
  CROSS JOIN (SELECT unnest(['lsh', 'lsh_multiprobe']) AS ranker) r
)
SELECT q.ranker, q.query_id,
       CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
       CAST((1000000 * COALESCE(p.n_hits, 0)) // 5 AS BIGINT) AS recall_micro,
       CAST(CASE WHEN p.fr IS NULL THEN 0 ELSE 1000000 // p.fr END AS BIGINT)
         AS rr_micro
FROM qs q LEFT JOIN per p ON p.ranker = q.ranker AND p.query_id = q.query_id"""


@query("retrieval_eval", _RETRIEVAL_EVAL_ORACLE)
def retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 and reciprocal rank of the single-probe and Hamming-1
    multiprobe LSH rankings against the exact brute-force truth
    (``knn_cosine_topk``) per probe query — the evaluation table every
    retrieval deployment builds before swapping an exact ranker for an
    approximate one, and the quantitative form of the recall>=single-
    probe guarantee the multiprobe pytest asserts. Pure composition of
    three certified rankers plus a tiny (10-row) join and rollup; every
    metric is integer micro units, so the rows hash-check."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    probes = [0, 1, 2, 3, 4]
    truth = S.knn_brute_force(emb, probes, k=5).select("query_id", "neighbor_id")
    anchors = emb.filter(F.col("vec_id") <= 7).select(
        F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("anchor_vec")
    )
    cand = (
        S.lsh_ann_topk(emb, anchors, probes, k=5)
        .select(F.lit("lsh").alias("ranker"), "query_id", "neighbor_id", "rank")
        .unionAll(
            S.lsh_ann_topk_multiprobe(emb, anchors, probes, k=5).select(
                F.lit("lsh_multiprobe").alias("ranker"),
                "query_id",
                "neighbor_id",
                "rank",
            )
        )
    )
    per = (
        cand.join(truth, ["query_id", "neighbor_id"])
        .groupBy("ranker", "query_id")
        .agg(F.count("*").cast("bigint").alias("n_hits"), F.min("rank").alias("_fr"))
    )
    rankers = emb.sparkSession.createDataFrame(
        [("lsh",), ("lsh_multiprobe",)], "ranker string"
    )
    qs = truth.select("query_id").distinct().crossJoin(F.broadcast(rankers))
    return qs.join(per, ["ranker", "query_id"], "left").select(
        "ranker",
        "query_id",
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        F.expr("(1000000 * coalesce(n_hits, 0)) div 5").cast("bigint").alias(
            "recall_micro"
        ),
        F.expr("coalesce(1000000 div _fr, 0)").cast("bigint").alias("rr_micro"),
    )


# ---------------------------------------------------------------------------
# Trained quality classifier (quantized GD) + Zipf shape diagnostics
# ---------------------------------------------------------------------------
_LR_ITERS = 6


def _lr_p_sql(w: list[str]) -> str:
    """Micro-unit hard-sigmoid probability under weight expressions ``w``
    — the SQL twin of operators/classifier.py:_score_q."""
    dot = " + ".join(f"{wj} * x{j}" for j, wj in enumerate(w))
    z = f"CAST(floor(CAST({dot} AS DOUBLE) / 1000.0) AS BIGINT)"
    return (
        f"LEAST(GREATEST(CAST(floor(CAST({z} AS DOUBLE) / 4.0) AS BIGINT)"
        f" + 500000, 0), 1000000)"
    )


_LR_STEP = ",\n     ".join(
    f"lr.w[{j + 1}] + CAST(floor(SUM(r * x{j}) / (COUNT(*) * 2000.0)) AS BIGINT)"
    for j in range(4)
)

_LR_ORACLE = f"""WITH RECURSIVE feats AS MATERIALIZED (
  SELECT source,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
    CAST(1000 AS BIGINT) AS x0,
    CAST(floor(1000.0 * LEAST(n_chars, 2000) / 2000.0) AS BIGINT) AS x1,
    CAST(floor(1000.0 * (length(text) - length(replace(text, ' ', ''))) / GREATEST(n_chars, 1)) AS BIGINT) AS x2,
    CAST(floor(1000.0 * length(regexp_replace(text, '[^0-9]', '', 'g')) / GREATEST(n_chars, 1)) AS BIGINT) AS x3
  FROM documents
),
lr(it, w) AS (
  SELECT 0, [CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)]
  UNION ALL
  SELECT lr.it + 1,
    (SELECT [
     {_LR_STEP}
    ] FROM (
      SELECT y * 1000000 - {_lr_p_sql(['lr.w[1]', 'lr.w[2]', 'lr.w[3]', 'lr.w[4]'])} AS r,
             x0, x1, x2, x3
      FROM feats
    ))
  FROM lr WHERE lr.it < {_LR_ITERS}
),
scored AS (
  SELECT f.source, f.y,
         {_lr_p_sql(['fin.w[1]', 'fin.w[2]', 'fin.w[3]', 'fin.w[4]'])} AS p
  FROM feats f, (SELECT w FROM lr WHERE it = {_LR_ITERS}) fin
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN p >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
  CAST(SUM(CASE WHEN (p >= 500000) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
  CAST(SUM(p) AS BIGINT) AS sum_score_q
FROM scored GROUP BY source"""


@query("quality_lr_source_scores", _LR_ORACLE)
def quality_lr_source_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED quality classifier, GPT-3/LLaMA-pipeline style: a
    hard-sigmoid linear model trained by integer-quantized batch gradient
    descent to recognize the trusted reference slice (here lang='en' as
    the weak positive label — features never see the label column), then
    scored over the full corpus and rolled up per source (docs, predicted
    positives, agreement with the weak label, summed micro score).  The
    entire 6-iteration trajectory is order-independent integer
    arithmetic, replayed by a DuckDB recursive CTE carrying the weight
    vector — a full hash check of a trained model, same contract as
    ann_kmeans_cells_q.  Per iteration: map-side scoring with inlined
    weight literals + ONE partial agg of 4 sums and a count; d+1 BIGINTs
    of state per partition regardless of corpus size
    (operators/classifier.py)."""
    from .operators import classifier as C

    docs = testdata.load(spark, sf_dir, "documents")
    xs = C.doc_features(F.col("text"), F.col("n_chars"))
    feats = docs.select(
        "source",
        (F.col("lang") == "en").cast("bigint").alias("y"),
        *[x.alias(f"x{j}") for j, x in enumerate(xs)],
    )
    w = C.lr_fit_quantized(feats, iters=_LR_ITERS)
    scored = C.lr_score_quantized(feats, w)
    return scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("pred").cast("bigint").alias("n_pred_pos"),
        F.sum((F.col("pred") == F.col("y")).cast("bigint")).cast("bigint").alias("n_correct"),
        F.sum("score_q").cast("bigint").alias("sum_score_q"),
    )


_ZIPF_K = 64

_ZIPF_ORACLE = rf"""WITH tc AS (
  SELECT source, t AS term, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT d.source,
           unnest(string_split(regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g'), ' ')) AS t
    FROM documents d
  ) WHERE t <> '' GROUP BY source, t
),
ranked AS (
  SELECT source, cnt,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, term DESC) AS rk
  FROM tc
),
oct AS (
  SELECT source, CAST(length(bin(rk)) - 1 AS BIGINT) AS octave,
         CAST(COUNT(*) AS BIGINT) AS n_terms, CAST(SUM(cnt) AS BIGINT) AS mass
  FROM ranked WHERE rk <= {_ZIPF_K} GROUP BY source, octave
),
o0 AS (SELECT source, mass AS m0 FROM oct WHERE octave = 0)
SELECT o.source, o.octave, o.n_terms, o.mass,
       CAST(floor(1000.0 * o.mass / o0.m0) AS BIGINT) AS mass_ratio_m
FROM oct o JOIN o0 ON o0.source = o.source"""


@query("zipf_octave_profile", _ZIPF_ORACLE)
def zipf_octave_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency shape per source: mass and term count per
    log2-rank octave of the top-64 terms, with each octave's mass as a
    milli-ratio of the rank-1 term's — the corpus-health diagnostic that
    catches template/boilerplate-dominated sources (flat head) and
    synthetic/degenerate ones (collapsed head) without any float log fit.
    Octave = floor(log2(rank)) computed EXACTLY as length(bin(rank))-1
    (both engines' log2 are libm calls whose floor can straddle exact
    powers).  Scale shape: term counts are one (source, term) hash agg;
    the per-source rank never touches the raw vocab — the
    threshold-pruned top-k (operators/sketch.py:grouped_topk_threshold)
    bounds per-task state to ~k survivors per source before the rank
    window; the octave rollup runs on a (sources x 7)-row table and the
    octave-0 reference mass comes from a window over that same tiny
    table (an octave-0 self-join would re-derive the whole corpus-scan
    subtree — two scans for one tiny lookup).  Milli-ratio uses one
    double floor — exact while the top term's count < 2^53/1000 (~9e12
    occurrences)."""
    from pyspark.sql import Window

    from .operators.sketch import grouped_topk_threshold

    docs = testdata.load(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source",
            F.explode(F.split(X.normalize_text(F.col("text")), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    top = grouped_topk_threshold(tc, "source", ["cnt", "term"], k=_ZIPF_K, descending=True)
    octaves = (
        top.select(
            "source",
            "cnt",
            (F.length(F.bin("rk")) - 1).cast("bigint").alias("octave"),
        )
        .groupBy("source", "octave")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.sum("cnt").cast("bigint").alias("mass"),
        )
    )
    m0 = F.max(F.when(F.col("octave") == 0, F.col("mass"))).over(
        Window.partitionBy("source")
    )
    return octaves.withColumn("m0", m0).select(
        "source",
        "octave",
        "n_terms",
        "mass",
        F.floor(F.lit(1000.0) * F.col("mass") / F.col("m0")).cast("bigint").alias("mass_ratio_m"),
    )


_DISTINCTIVE_K = 8

_DISTINCTIVE_ORACLE = rf"""WITH tok AS (
  SELECT source, doc_id, term FROM (
    SELECT d.source, d.doc_id,
           unnest(string_split(regexp_replace(trim(lower(d.text)), '\s+', ' ', 'g'), ' ')) AS term
    FROM documents d
  ) WHERE term <> ''
),
tf AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf_term FROM tok GROUP BY source, term),
dfr AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df_docs FROM tok GROUP BY term),
ts AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS t_s FROM tok GROUP BY source),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
scored AS (
  SELECT tf.source, tf.term, tf.tf_term, dfr.df_docs,
         CAST(floor(1000000.0 * CAST(tf.tf_term AS DOUBLE) * n.nd
                    / (CAST(dfr.df_docs AS DOUBLE) * CAST(ts.t_s AS DOUBLE))) AS BIGINT) AS score_q
  FROM tf JOIN dfr USING (term) JOIN ts USING (source), n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY score_q DESC, term DESC) AS rk
  FROM scored
)
SELECT source, term, tf_term, df_docs, score_q, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {_DISTINCTIVE_K}"""


@query("distinctive_terms_by_source", _DISTINCTIVE_ORACLE)
def distinctive_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 most DISTINCTIVE terms per source by an integer-quantized
    tf-idf-style score — floor(1e6 * tf * N / (df * T_s)): term frequency
    in the source, normalized by the source's token mass, weighted by
    inverse document frequency as a RATIO (N/df), never ln(N/df) — libm
    log would break the cross-engine hash; the monotone ratio ranks the
    same concept.  The per-source corpus fingerprint a curation pipeline
    uses to spot template/boilerplate sources and topic drift.

    Scale shape: ONE (term, source) aggregate over the corpus token scan
    feeds everything — tf comes out of it directly, per-term df is the
    SUM of its per-(term, source) distinct-doc counts (each doc belongs
    to exactly one source, so the partial distincts partition the global
    one), and per-source token mass is its per-source tf sum (tiny,
    broadcast joined).  All three consumer branches hang off the SAME
    aggregate subtree, so physical exchange reuse (ReuseExchange /
    AQE stage reuse) scans the corpus once; tf joins df on term (two
    vocab-sized tables, plain hash join); N is one scalar count job
    inlined as a literal (the cms_heavy_hitters convention).  The
    per-source rank never touches the scored vocab: threshold-pruned
    top-k bounds survivors to ~k per source.  Products stay in doubles
    with identical association in both engines, so the floor is
    bit-identical at any magnitude."""
    from .operators.sketch import grouped_topk_threshold

    docs = testdata.load(spark, sf_dir, "documents")
    n_docs = float(docs.count())  # one scalar job; inlined literal below
    tok = (
        docs.select(
            "source",
            "doc_id",
            F.explode(F.split(X.normalize_text(F.col("text")), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    base = tok.groupBy("term", "source").agg(
        F.count("*").cast("bigint").alias("tf_term"),
        F.count_distinct("doc_id").cast("bigint").alias("df_part"),
    )
    dfr = base.groupBy("term").agg(F.sum("df_part").cast("bigint").alias("df_docs"))
    ts = base.groupBy("source").agg(F.sum("tf_term").cast("bigint").alias("t_s"))
    scored = (
        base.join(dfr, "term")
        .join(F.broadcast(ts), "source")
        .select(
            "source",
            "term",
            "tf_term",
            "df_docs",
            F.floor(
                F.lit(1000000.0)
                * F.col("tf_term").cast("double")
                * F.lit(n_docs)
                / (F.col("df_docs").cast("double") * F.col("t_s").cast("double"))
            )
            .cast("bigint")
            .alias("score_q"),
        )
    )
    top = grouped_topk_threshold(
        scored, "source", ["score_q", "term"], k=_DISTINCTIVE_K, descending=True
    )
    return top.select(
        "source", "term", "tf_term", "df_docs", "score_q", F.col("rk").cast("bigint").alias("rk")
    )


# ---------------------------------------------------------------------------
# Quantized power-iteration PCA (operators/pca.py)
# ---------------------------------------------------------------------------
_PCA_ITERS = 8
_PCA_DIM = 64
_PCA_DOT = " + ".join(f"q.v[{j}] * {{w}}[{j}]" for j in range(1, _PCA_DIM + 1))
_PCA_USUMS = ", ".join(f"CAST(SUM(sh * v[{j}]) AS BIGINT)" for j in range(1, _PCA_DIM + 1))
_PCA_NRM = "sqrt(" + " + ".join(
    f"CAST(ul[{j}] AS DOUBLE) * CAST(ul[{j}] AS DOUBLE)" for j in range(1, _PCA_DIM + 1)
) + ")"
_PCA_E0 = "[" + ", ".join(
    ("CAST(1000000 AS BIGINT)" if j == 1 else "CAST(0 AS BIGINT)")
    for j in range(1, _PCA_DIM + 1)
) + "]"

_PCA_ORACLE = f"""WITH RECURSIVE vq AS MATERIALIZED (
  SELECT label,
         [CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT) FOR e IN embedding] AS v
  FROM embeddings
),
pi(it, w) AS (
  SELECT 0, [CAST(125000 AS BIGINT) FOR i IN range({_PCA_DIM})]
  UNION ALL
  SELECT pi.it + 1,
    (SELECT CASE WHEN {_PCA_NRM} = 0.0 THEN {_PCA_E0}
            ELSE [CAST(floor(CAST(ul[k] AS DOUBLE) * 1000000.0 / {_PCA_NRM}) AS BIGINT)
                  FOR k IN range(1, {_PCA_DIM + 1})] END
     FROM (
       SELECT (SELECT [{_PCA_USUMS}]
               FROM (SELECT CAST(floor(CAST({_PCA_DOT.format(w="pi.w")} AS DOUBLE) / 1000000000.0) AS BIGINT) AS sh,
                            q.v AS v
                     FROM vq q)) AS ul))
  FROM pi WHERE pi.it < {_PCA_ITERS}
),
proj AS (
  SELECT q.label,
         CAST(floor(CAST(CAST(floor(CAST({_PCA_DOT.format(w="f.w")} AS DOUBLE) / 1000000000.0) AS BIGINT) AS DOUBLE) / 100.0) AS BIGINT) AS bin
  FROM vq q, (SELECT w FROM pi WHERE it = {_PCA_ITERS}) f
)
SELECT label, bin, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM proj GROUP BY label, bin"""


@query("embedding_pca_projection_q", _PCA_ORACLE)
def embedding_pca_projection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED top-principal-component analysis with a full hash check:
    8 integer-quantized power-iteration rounds (micro-unit vectors and
    direction, milli-unit projections, driver-side fixed-order double
    re-normalization — sqrt is correctly rounded everywhere, unlike
    ln/pow), then the per-label histogram of top-PC projections — the
    anisotropy / collapse diagnostic an embedding-curation pipeline runs
    per corpus snapshot.  The DuckDB recursive CTE replays the identical
    trajectory carrying the direction list.  Per round: map-side
    projection with the direction inlined as literals + ONE d-sum
    partial agg (d BIGINTs per partition at any corpus size); the
    returned plan is a map projection + one tiny (label x ~20 bins)
    rollup (operators/pca.py)."""
    from .operators import pca as P

    emb = testdata.load(spark, sf_dir, "embeddings")
    w = P.power_iteration_quantized(emb, iters=_PCA_ITERS, dim=_PCA_DIM)
    return P.projection_histogram(emb, w, bin_width=100)


# ---------------------------------------------------------------------------
# Robust per-source statistics + weighted selection
# ---------------------------------------------------------------------------
# 3 * 1.4826 (the MAD-to-sigma consistency factor) in 1e-4 units: the
# robust-z outlier test dev > 3 * 1.4826 * MAD runs as the exact integer
# comparison dev * 10000 > 44478 * MAD in both engines.
_ROBUST_Z3_Q = 44478

_ROBUST_ORACLE = f"""WITH ranked AS (
  SELECT source, n_chars AS x,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
),
med AS (SELECT source, x AS med, n FROM ranked WHERE rn = (n + 1) // 2),
dev AS (
  SELECT d.source, abs(d.n_chars - m.med) AS dv, m.med, m.n
  FROM documents d JOIN med m USING (source)
),
devranked AS (
  SELECT source, dv, med, n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY dv) AS rn
  FROM dev
),
mad AS (SELECT source, dv AS mad, med, n FROM devranked WHERE rn = (n + 1) // 2)
SELECT d.source,
       CAST(m.n AS BIGINT) AS n_docs,
       CAST(m.med AS BIGINT) AS median_chars,
       CAST(m.mad AS BIGINT) AS mad_chars,
       CAST(SUM(CASE WHEN d.dv * 10000 > {_ROBUST_Z3_Q} * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (source)
GROUP BY d.source, m.n, m.med, m.mad"""


@query("robust_length_outliers", _ROBUST_ORACLE)
def robust_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source length outlier detection — median / MAD (median
    absolute deviation) instead of mean / sigma, so a source whose
    lengths are already polluted by the outliers it is being screened
    for does not have its own threshold dragged toward them.  The
    outlier test is the exact integer form of the standard robust z:
    dev > 3 * 1.4826 * MAD == dev * 10000 > 44478 * MAD.

    Both medians are TYPE-1 quantiles from the bounded two-pass
    histogram primitive (operators/sketch.py:grouped_exact_quantiles) —
    never a per-source rank over the raw corpus; the MAD pass runs the
    same primitive over the deviation column after a broadcast join of
    the per-source medians (sources x 1 rows).  Five corpus scans total
    (2 per quantile pass + the final flag pass), every exchange bounded
    by bucket-table size."""
    from .operators.sketch import grouped_exact_quantiles

    docs = testdata.load(spark, sf_dir, "documents")
    # Small-corpus tier (round-10, guide §1.2): the composition is FIVE
    # corpus scans (2 per two-pass quantile + the flag pass) over a
    # two-column integer table; when the input estimate admits the gate,
    # ONE Arrow collect + numpy sorts compute the same type-1 medians,
    # MAD and the integer outlier test — every quantity an exact integer,
    # rows identical by construction. Past the gate the bounded
    # histogram-primitive shape below is unchanged — the 100 TB path.
    from .operators.util import plan_size_bytes, small_corpus_cache_limit

    est = plan_size_bytes(docs)
    if est is not None and est <= small_corpus_cache_limit(docs):
        import numpy as np

        pdf = docs.select("source", "n_chars").toPandas()
        rows = []
        for src, vals in pdf.groupby("source", sort=False)["n_chars"]:
            v = np.sort(vals.to_numpy(np.int64))
            n = len(v)
            med_v = int(v[(n + 1) // 2 - 1])
            dv = np.abs(v - med_v)
            mad_v = int(np.sort(dv)[(n + 1) // 2 - 1])
            n_out = int((dv * 10000 > _ROBUST_Z3_Q * mad_v).sum())
            rows.append((src, n, med_v, mad_v, n_out))
        return spark.createDataFrame(
            rows,
            "source string, n_docs bigint, median_chars bigint, "
            "mad_chars bigint, n_outliers bigint",
        )
    med = (
        grouped_exact_quantiles(
            docs.select("source", "n_chars"), "source", "n_chars", [("p50", 1, 2)]
        )
        .select("source", F.col("val").alias("med"), F.col("n").alias("n_docs"))
    )
    dev = docs.join(F.broadcast(med), "source").select(
        "source", "med", "n_docs", F.abs(F.col("n_chars") - F.col("med")).alias("dv")
    )
    mad = (
        grouped_exact_quantiles(dev.select("source", "dv"), "source", "dv", [("p50", 1, 2)])
        .select("source", F.col("val").alias("mad"))
    )
    flagged = dev.join(F.broadcast(mad), "source")
    return flagged.groupBy("source").agg(
        F.max("n_docs").cast("bigint").alias("n_docs"),
        F.max("med").cast("bigint").alias("median_chars"),
        F.max("mad").cast("bigint").alias("mad_chars"),
        F.sum(
            (F.col("dv") * 10000 > F.lit(_ROBUST_Z3_Q) * F.col("mad")).cast("bigint")
        )
        .cast("bigint")
        .alias("n_outliers"),
    )


_WPS_K = 100

_WPS_ORACLE = f"""WITH pri AS (
  SELECT doc_id,
         CAST(GREATEST(n_chars, 1) AS BIGINT) AS w,
         CAST(floor(
           CAST(CAST(('0x' || substring(md5('wps|' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS DOUBLE)
           / CAST(CAST(GREATEST(n_chars, 1) AS BIGINT) AS DOUBLE)) AS BIGINT) AS priority
  FROM documents
)
SELECT doc_id, w, priority FROM pri
ORDER BY priority, doc_id LIMIT {_WPS_K}"""


@query("weighted_priority_sample", _WPS_ORACLE)
def weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional selection: each doc draws the
    md5 hash of its id and its priority is floor(hash / weight) (weight
    = character count; one correctly-rounded double quotient, identical
    in both engines) — a document with twice the weight halves its
    expected priority, so the global smallest-k skews toward heavy docs
    while staying fully reproducible (the Efraimidis-Spirakis idea with
    a division in place of the u^(1/w) key, which would need pow — not
    hash-safe across engines).  Physical shape: map-side priority +
    ORDER BY/LIMIT, which Spark executes as TakeOrderedAndProject —
    per-partition top-k pruning, O(k) state per task, no full sort
    anywhere (pinned)."""
    docs = testdata.load(spark, sf_dir, "documents")
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("bigint")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("wps|"), F.col("doc_id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("bigint")
    pri = docs.select(
        "doc_id",
        w.alias("w"),
        F.floor(h.cast("double") / w.cast("double")).cast("bigint").alias("priority"),
    )
    return pri.orderBy("priority", "doc_id").limit(_WPS_K)


# ---------------------------------------------------------------------------
# Distribution drift / diversity / collocation diagnostics
# ---------------------------------------------------------------------------
_DRIFT_SPLIT = "2024-01-16 00:00:00"
_DRIFT_BIN = 500  # milli-unit value bin width (0.5)

_DRIFT_ORACLE = f"""WITH binned AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 0 ELSE 1 END AS epoch,
         CAST(floor(CAST(CAST(floor(value * 1000.0) AS BIGINT) AS DOUBLE) / {_DRIFT_BIN}.0) AS BIGINT) AS bin
  FROM events
),
cells AS (
  SELECT event_type, bin,
         CAST(SUM(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM binned GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, c1, c2,
         SUM(c1) OVER (PARTITION BY event_type) AS n1,
         SUM(c2) OVER (PARTITION BY event_type) AS n2
  FROM cells
)
SELECT event_type,
       CAST(MAX(n1) AS BIGINT) AS n_early, CAST(MAX(n2) AS BIGINT) AS n_late,
       CAST(floor(1000000.0 * CAST(SUM(abs(c1 * n2 - c2 * n1)) AS DOUBLE)
                  / (2.0 * CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE))) AS BIGINT) AS tv_micro
FROM tot GROUP BY event_type"""


@query("histogram_drift_tv", _DRIFT_ORACLE)
def histogram_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift monitor: total-variation distance (in micro
    units) between the early and late halves of the event window, per
    event type, over fixed milli-unit value bins — the "did this
    metric's distribution move" check a pipeline runs before trusting a
    new batch.  TV instead of PSI/KL because those need ln (not
    hash-safe); TV = half the L1 histogram distance ranks the same
    drift.  The integer core |c1*n2 - c2*n1| keeps everything exact
    until one double floor at the end (identical association both
    engines).

    Scale shape: one scan -> (type, epoch-conditional) counts per (type,
    bin) cell — a partial-agg whose state is the bin-table size, not the
    event count; the TV rollup runs over that tiny cell table with a
    per-type window for the marginals."""
    from pyspark.sql import Window

    ev = testdata.load(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        (F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp")).alias("early"),
        F.floor(
            F.floor(F.col("value") * 1000.0).cast("bigint").cast("double") / float(_DRIFT_BIN)
        )
        .cast("bigint")
        .alias("bin"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("early"), 1).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(~F.col("early"), 1).otherwise(0)).cast("bigint").alias("c2"),
    )
    wt = Window.partitionBy("event_type")
    cells = cells.withColumn("n1", F.sum("c1").over(wt)).withColumn(
        "n2", F.sum("c2").over(wt)
    )
    return (
        cells.groupBy("event_type")
        .agg(
            F.max("n1").cast("bigint").alias("n_early"),
            F.max("n2").cast("bigint").alias("n_late"),
            F.sum(F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))).alias("s"),
        )
        .select(
            "event_type",
            "n_early",
            "n_late",
            F.floor(
                F.lit(1000000.0)
                * F.col("s").cast("double")
                / (F.lit(2.0) * F.col("n_early").cast("double") * F.col("n_late").cast("double"))
            )
            .cast("bigint")
            .alias("tv_micro"),
        )
    )


_GINI_ORACLE = """WITH lc AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY source, lang
),
agg AS (
  SELECT source, SUM(c) AS n, CAST(COUNT(*) AS BIGINT) AS n_langs, SUM(c * c) AS ss
  FROM lc GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_docs, n_langs,
       1000000 - CAST(floor(1000000.0 * CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT) AS gini_micro
FROM agg"""


@query("source_label_gini", _GINI_ORACLE)
def source_label_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-diversity score as GINI IMPURITY (1 - sum
    p_i^2) in micro units — the diversity diagnostic that needs no ln
    (entropy does, and ln is not hash-safe across engines).  Two tiny
    aggs: (source, lang) counts, then the per-source moment rollup; the
    integer sum of squares is exact, one double floor at the end."""
    docs = testdata.load(spark, sf_dir, "documents")
    lc = docs.groupBy("source", "lang").agg(F.count("*").cast("bigint").alias("c"))
    agg = lc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_langs"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_langs",
        (
            F.lit(1000000)
            - F.floor(
                F.lit(1000000.0)
                * F.col("ss").cast("double")
                / (F.col("n_docs").cast("double") * F.col("n_docs").cast("double"))
            ).cast("bigint")
        ).alias("gini_micro"),
    )


_COLLOC_K = 20
_COLLOC_MIN = 5

_COLLOC_ORACLE = rf"""WITH {_NORM}, {_TOKS},
uni AS (
  SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(tk) AS t FROM toks) WHERE t <> '' GROUP BY t
),
bi AS (
  SELECT a || ' ' || b AS bigram, a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM (
    SELECT tk[i] AS a, tk[i+1] AS b FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i)
  ) WHERE a <> '' AND b <> '' GROUP BY a, b
),
n1 AS (SELECT CAST(SUM(c) AS DOUBLE) AS v FROM uni),
n2 AS (SELECT CAST(SUM(cab) AS DOUBLE) AS v FROM bi),
scored AS (
  SELECT bi.bigram, bi.cab, ua.c AS ca, ub.c AS cb,
         CAST(floor(CAST(bi.cab AS DOUBLE) * n1.v * n1.v
                    / (n2.v * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))) AS BIGINT) AS lift_q
  FROM bi JOIN uni ua ON ua.term = bi.a JOIN uni ub ON ub.term = bi.b, n1, n2
  WHERE bi.cab >= {_COLLOC_MIN}
)
SELECT bigram, cab, ca, cb, lift_q FROM scored
ORDER BY lift_q DESC, bigram DESC LIMIT {_COLLOC_K}"""


@query("collocation_lift_topk", _COLLOC_ORACLE)
def collocation_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation (phrase) mining: the top-20 adjacent-word bigrams by
    LIFT — P(ab) / (P(a)P(b)) = cab * n1^2 / (n2 * ca * cb) — the
    word2vec-phrases / PMI idea with the ratio kept raw instead of
    logged (ln is not hash-safe; lift ranks identically to PMI).  Min
    support {_COLLOC_MIN} prunes the hapax tail before the joins.

    Scale shape: unigram and bigram counts are two hash aggs off one
    token scan; the support filter shrinks the bigram side BEFORE its
    two vocab-table joins (plain hash joins on term); the two corpus
    totals are one bounded driver agg each, inlined as literals; the
    global top-20 is TakeOrderedAndProject (per-partition pruning, O(k)
    state)."""
    docs = testdata.load(spark, sf_dir, "documents")
    toks = docs.select(F.split(X.normalize_text(F.col("text")), " ").alias("tk"))
    # explode_OUTER on both branches (round 11): plain explode lets
    # InferFiltersFromGenerate push `size(<expr>) > 0 AND isnotnull(<expr>)`
    # into the scan stage, re-evaluating the normalize regex (and for the
    # pair branch the whole transform/slice chain) per row before the
    # projection evaluates it again — 5 regexp_replace evaluations in the
    # r10 plan. The outer variant infers nothing, and the one null
    # row it adds per null text dies in the existing `!= ''` filters
    # (NULL != '' is NULL -> dropped), so every count is identical. Same
    # pattern as dedup.shingles.
    uni = (
        toks.select(F.explode_outer("tk").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    pairs = toks.select(
        F.explode_outer(
            F.expr("transform(slice(tk, 1, size(tk) - 1), (x, i) -> struct(x as a, tk[i + 1] as b))")
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    bi = (
        pairs.filter((F.col("a") != "") & (F.col("b") != ""))
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("cab"))
        .filter(F.col("cab") >= _COLLOC_MIN)
    )
    n1 = float(uni.agg(F.sum("c")).first()[0])  # bounded driver aggs,
    n2_row = pairs.filter((F.col("a") != "") & (F.col("b") != "")).count()  # inlined below
    n2 = float(n2_row)
    ua = uni.select(F.col("term").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("term").alias("b"), F.col("c").alias("cb"))
    scored = (
        bi.join(ua, "a")
        .join(ub, "b")
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            "cab",
            "ca",
            "cb",
            F.floor(
                F.col("cab").cast("double")
                * F.lit(n1)
                * F.lit(n1)
                / (F.lit(n2) * F.col("ca").cast("double") * F.col("cb").cast("double"))
            )
            .cast("bigint")
            .alias("lift_q"),
        )
    )
    return scored.orderBy(F.desc("lift_q"), F.desc("bigram")).limit(_COLLOC_K)


# ---------------------------------------------------------------------------
# Metric trend / changepoint / funnel / retention analytics over events
# ---------------------------------------------------------------------------
_TS_BASE = 1704067200  # 2024-01-01 00:00:00 UTC in epoch seconds

_OLS_ORACLE = f"""WITH pts AS (
  SELECT event_type,
         CAST(floor((epoch(ts) - {_TS_BASE}) / 3600.0) AS BIGINT) AS x,
         CAST(floor(value * 1000.0) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts GROUP BY event_type
)
SELECT event_type, n,
       CAST(floor(1000000.0 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)) AS BIGINT) AS slope_q
FROM s"""


@query("ols_trend_by_type", _OLS_ORACLE)
def ols_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type metric trend: the exact least-squares slope of (milli
    value) against (hours since epoch start), in micro units — the "is
    this metric drifting" monitor next to histogram_drift_tv's "did its
    distribution move".  The five sufficient statistics (n, Sx, Sy, Sxy,
    Sxx) are exact integer partial aggs (|Sxy| <= n * 3.5e8 at the data's
    hour/milli ranges — BIGINT-exact to ~2.6e10 rows per type); the
    closed-form slope combines them in doubles with fixed association —
    identical in both engines.  ONE map-side projection + one 5-sum agg:
    the cheapest possible trained line."""
    ev = testdata.load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.floor((F.unix_timestamp("ts") - F.lit(_TS_BASE)) / F.lit(3600.0)).cast("bigint").alias("x"),
        F.floor(F.col("value") * 1000.0).cast("bigint").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = F.col("n").cast("double") * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    # den == 0 (a type whose points all share one hour) must be NULL on
    # BOTH engines: unguarded, Spark's floor(inf)->bigint silently nulls
    # while DuckDB errors on CAST(nan AS BIGINT) — a data-dependent
    # parity break. The explicit when() + oracle nullif pin it.
    slope = F.when(
        den != F.lit(0.0), F.floor(F.lit(1000000.0) * num / den).cast("bigint")
    ).alias("slope_q")
    return s.select("event_type", "n", slope)


_CUSUM_ORACLE = f"""WITH hourly AS (
  SELECT event_type,
         CAST(floor((epoch(ts) - {_TS_BASE}) / 3600.0) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, h
),
tot AS (
  SELECT event_type, h, c,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nh,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS total,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY h) AS BIGINT) AS cum,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS BIGINT) AS rnk
  FROM hourly
),
dev AS (
  SELECT event_type, h, nh, abs(nh * cum - rnk * total) AS d FROM tot
)
SELECT event_type, CAST(MAX(nh) AS BIGINT) AS n_hours,
       CAST(MIN(CASE WHEN d = md THEN h END) AS BIGINT) AS peak_hour,
       CAST(MAX(md) AS BIGINT) AS max_dev
FROM (SELECT *, MAX(d) OVER (PARTITION BY event_type) AS md FROM dev)
GROUP BY event_type"""


@query("cusum_hourly_changepoint", _CUSUM_ORACLE)
def cusum_hourly_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on event rates: the hour where the
    cumulative deviation of hourly counts from the per-type mean rate
    peaks — the classic "when did the rate break" locator next to the
    EWMA anomaly score.  The mean never materializes as a float: the
    deviation is the pure-integer |n_hours * cum_count - rank * total|
    (the CUSUM statistic scaled by n_hours), so every row hash-checks.

    Scale shape: the raw scan reduces to a per-(type, hour) bucket table
    FIRST (bounded: 720 rows per type per month regardless of event
    count); all windows — cumulative sum, rank, max — run over that tiny
    table, the anti-pattern-free version of a per-type scan-ordered
    cumsum."""
    from pyspark.sql import Window

    ev = testdata.load(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.floor((F.unix_timestamp("ts") - F.lit(_TS_BASE)) / F.lit(3600.0))
            .cast("bigint")
            .alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("h")
    tot = (
        hourly.withColumn("nh", F.count("*").over(wt).cast("bigint"))
        .withColumn("total", F.sum("c").over(wt).cast("bigint"))
        .withColumn("cum", F.sum("c").over(wo).cast("bigint"))
        .withColumn("rnk", F.row_number().over(wo).cast("bigint"))
    )
    dev = tot.select(
        "event_type",
        "h",
        "nh",
        F.abs(F.col("nh") * F.col("cum") - F.col("rnk") * F.col("total")).alias("d"),
    ).withColumn("md", F.max("d").over(wt))
    return dev.groupBy("event_type").agg(
        F.max("nh").cast("bigint").alias("n_hours"),
        F.min(F.when(F.col("d") == F.col("md"), F.col("h"))).cast("bigint").alias("peak_hour"),
        F.max("md").cast("bigint").alias("max_dev"),
    )


_FUNNEL_ORACLE = """WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
),
flags AS (
  SELECT user_id,
         CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
         CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END AS s2,
         CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click THEN 1 ELSE 0 END AS s3
  FROM stages
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(s1) AS BIGINT) AS n_view,
       CAST(SUM(s2) AS BIGINT) AS n_view_click,
       CAST(SUM(s3) AS BIGINT) AS n_full_funnel,
       CAST(floor(1000000.0 * SUM(s2) / GREATEST(SUM(s1), 1)) AS BIGINT) AS click_rate_q,
       CAST(floor(1000000.0 * SUM(s3) / GREATEST(SUM(s2), 1)) AS BIGINT) AS purchase_rate_q"""


@query("funnel_conversion", _FUNNEL_ORACLE + "\nFROM flags")
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis view -> click -> purchase: a user counts
    for a stage only if that stage's FIRST occurrence is strictly after
    the previous stage's first occurrence (the standard ordered-funnel
    semantics; null comparisons are three-valued false in both engines).
    One per-user conditional-min agg (3 timestamps of state per user)
    + one global rollup — no joins, no per-user sorts."""
    ev = testdata.load(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull().cast("bigint")
    s2 = (F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))).cast("bigint")
    s3 = (
        F.col("t_view").isNotNull()
        & (F.col("t_click") > F.col("t_view"))
        & (F.col("t_purchase") > F.col("t_click"))
    ).cast("bigint")
    flags = stages.select(s1.alias("s1"), s2.alias("s2"), s3.alias("s3"))
    return flags.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("s1").cast("bigint").alias("n_view"),
        F.sum("s2").cast("bigint").alias("n_view_click"),
        F.sum("s3").cast("bigint").alias("n_full_funnel"),
        F.floor(
            F.lit(1000000.0) * F.sum("s2") / F.greatest(F.sum("s1"), F.lit(1))
        ).cast("bigint").alias("click_rate_q"),
        F.floor(
            F.lit(1000000.0) * F.sum("s3") / F.greatest(F.sum("s2"), F.lit(1))
        ).cast("bigint").alias("purchase_rate_q"),
    )


# ---------------------------------------------------------------------------
# Sequence, association, and optimizer-statistics analytics
# ---------------------------------------------------------------------------
_TRANSITION_ORACLE = """WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2"""


@query("event_transition_matrix", _TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence — the behavioral fingerprint (and the generator table for a
    sequence model's unigram->bigram smoothing).  (ts, event_id) is a
    deterministic total order within a user.

    Scale shape: ONE per-user window (parallelism = users, per-task state
    = one user's events, never the corpus) + one (from, to) agg over a
    |types|^2-bounded table.  No joins."""
    from pyspark.sql import Window

    ev = testdata.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


_HCORR_ORACLE = f"""WITH hourly AS (
  SELECT event_type, CAST(floor((epoch(ts) - {_TS_BASE}) / 3600.0) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, h
),
grid AS (SELECT MAX(h) - MIN(h) + 1 AS nh FROM hourly),
stats AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS ss
  FROM hourly GROUP BY event_type
),
sxy AS (
  SELECT a.event_type AS t1, b.event_type AS t2, CAST(SUM(a.c * b.c) AS BIGINT) AS sxy
  FROM hourly a JOIN hourly b ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p1.event_type AS t1, p2.event_type AS t2, g.nh AS n_hours,
       CAST(floor(1000000.0 *
            (CAST(g.nh AS DOUBLE) * CAST(COALESCE(x.sxy, 0) AS DOUBLE) - CAST(p1.s AS DOUBLE) * CAST(p2.s AS DOUBLE))
            / nullif(sqrt(CAST(g.nh AS DOUBLE) * CAST(p1.ss AS DOUBLE) - CAST(p1.s AS DOUBLE) * CAST(p1.s AS DOUBLE))
               * sqrt(CAST(g.nh AS DOUBLE) * CAST(p2.ss AS DOUBLE) - CAST(p2.s AS DOUBLE) * CAST(p2.s AS DOUBLE)), 0.0)) AS BIGINT) AS corr_micro
FROM stats p1 JOIN stats p2 ON p1.event_type < p2.event_type
CROSS JOIN grid g
LEFT JOIN sxy x ON x.t1 = p1.event_type AND x.t2 = p2.event_type"""


@query("hourly_corr_pairs", _HCORR_ORACLE)
def hourly_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation (micro units) between every pair of event
    types' hourly count series over the full observed hour grid — "do
    clicks move with views" co-movement monitoring.

    The zero-fill trick keeps it exact WITHOUT densifying: over the full
    grid missing hours contribute 0 to every sum, so Sx/Sxx come from
    per-type aggs over the sparse (type, hour) bucket table, Sxy from its
    self-join on hour (zero products vanish), and n is the global grid
    length.  All sums are exact integers; the only doubles are the final
    closed form (sqrt is correctly-rounded IEEE in both engines).

    Scale shape: the raw scan reduces to the bounded bucket table first;
    everything downstream — self-join, per-type stats, |types|^2 pair
    frame — is bucket-table-sized.  n_hours is a bounded 1-row driver
    agg inlined as a literal."""
    ev = testdata.load(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.floor((F.unix_timestamp("ts") - F.lit(_TS_BASE)) / F.lit(3600.0))
            .cast("bigint")
            .alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    lo, hi = hourly.agg(F.min("h"), F.max("h")).first()  # bounded 1-row driver agg
    nh = int(hi - lo + 1)
    stats = hourly.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
    )
    a = hourly.select(F.col("event_type").alias("t1"), "h", F.col("c").alias("ca"))
    b = hourly.select(F.col("event_type").alias("t2"), "h", F.col("c").alias("cb"))
    sxy = (
        a.join(b, "h")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("sxy"))
    )
    # the type enum is bounded (a handful of values): collect it once and
    # build the pair frame as literals so the t1<t2 pairing never becomes
    # a nested-loop join — the same bounded-driver-collect discipline as
    # the anchor/centroid queries.
    types = sorted(r[0] for r in stats.select("event_type").collect())
    pair_rows = [(x, y) for i, x in enumerate(types) for y in types[i + 1 :]]
    lit_pairs = spark.createDataFrame(pair_rows, "t1 string, t2 string")
    p1 = stats.select(F.col("event_type").alias("t1"), F.col("s").alias("s1"), F.col("ss").alias("ss1"))
    p2 = stats.select(F.col("event_type").alias("t2"), F.col("s").alias("s2"), F.col("ss").alias("ss2"))
    pairs = (
        lit_pairs.join(p1, "t1")
        .join(p2, "t2")
        .join(sxy, ["t1", "t2"], "left")
        .na.fill({"sxy": 0})
    )
    nhd = F.lit(float(nh))
    num = nhd * F.col("sxy").cast("double") - F.col("s1").cast("double") * F.col("s2").cast("double")
    den = F.sqrt(nhd * F.col("ss1").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double")) * F.sqrt(
        nhd * F.col("ss2").cast("double") - F.col("s2").cast("double") * F.col("s2").cast("double")
    )
    # A constant hourly series makes its sqrt-variance factor 0: Spark's
    # floor(inf/nan)->bigint silently nulls while DuckDB errors on the
    # cast — guard den == 0 to NULL explicitly on both sides (oracle:
    # nullif), so zero-variance pairs return NULL consistently.
    corr = F.when(
        den != F.lit(0.0), F.floor(F.lit(1000000.0) * num / den).cast("bigint")
    ).alias("corr_micro")
    return pairs.select("t1", "t2", F.lit(nh).cast("bigint").alias("n_hours"), corr)


_CRAMERS_ORACLE = """WITH cells AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o FROM documents GROUP BY source, lang
),
marg AS (
  SELECT source, lang, o,
         SUM(o) OVER (PARTITION BY source) AS rs,
         SUM(o) OVER (PARTITION BY lang) AS cs,
         SUM(o) OVER () AS n
  FROM cells
),
q AS (
  SELECT n,
         CAST(floor(1000000.0 * CAST(o * n - rs * cs AS DOUBLE) * CAST(o * n - rs * cs AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(rs AS DOUBLE) * CAST(cs AS DOUBLE))) AS BIGINT) AS chi_q
  FROM marg
)
SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
       (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM cells) AS n_sources,
       (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM cells) AS n_langs,
       CAST(SUM(chi_q) AS BIGINT) AS chi2_micro,
       CAST(floor(1000000.0 * sqrt((CAST(SUM(chi_q) AS DOUBLE) / 1000000.0)
            / (CAST(MAX(n) AS DOUBLE) * CAST(LEAST((SELECT COUNT(DISTINCT source) FROM cells) - 1,
                                                   (SELECT COUNT(DISTINCT lang) FROM cells) - 1) AS DOUBLE)))) AS BIGINT) AS v_micro
FROM q"""


@query("source_lang_cramers_v", _CRAMERS_ORACLE)
def source_lang_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association strength between source and language as chi-squared +
    Cramér's V (micro units) — "is the corpus's language mix confounded
    with its source mix", the check run before attributing a quality
    shift to a source.  Mutual information needs ln (not hash-safe);
    chi-squared is rational and V only adds one sqrt.

    Per-cell contributions are floored to micro ints BEFORE the sum so
    the only cross-row float reduction is exact-integer; the integer core
    o*n - rs*cs stays in bigint range to ~1e9 docs per (floor of) the
    double product.  Everything runs over the |sources| x |langs| cell
    table: three marginal windows + one rollup."""
    from pyspark.sql import Window

    docs = testdata.load(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count("*").cast("bigint").alias("o"))
    marg = (
        cells.withColumn("rs", F.sum("o").over(Window.partitionBy("source")))
        .withColumn("cs", F.sum("o").over(Window.partitionBy("lang")))
        .withColumn("n", F.sum("o").over(Window.partitionBy()))
    )
    d = (F.col("o") * F.col("n") - F.col("rs") * F.col("cs")).cast("double")
    chi_q = F.floor(
        F.lit(1000000.0) * d * d / (F.col("n").cast("double") * F.col("rs").cast("double") * F.col("cs").cast("double"))
    ).cast("bigint")
    q = marg.select("n", chi_q.alias("chi_q"))
    # contingency dims are bounded (|sources| x |langs| enum table): one
    # driver agg, inlined as literals — avoids a 1-row cross join.
    n_sources, n_langs = cells.agg(
        F.countDistinct("source"), F.countDistinct("lang")
    ).first()
    out = q.agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.sum("chi_q").cast("bigint").alias("chi2_micro"),
    )
    k = F.lit(float(min(n_sources - 1, n_langs - 1)))
    return out.select(
        "n_docs",
        F.lit(int(n_sources)).cast("bigint").alias("n_sources"),
        F.lit(int(n_langs)).cast("bigint").alias("n_langs"),
        "chi2_micro",
        F.floor(
            F.lit(1000000.0)
            * F.sqrt((F.col("chi2_micro").cast("double") / F.lit(1000000.0)) / (F.col("n_docs").cast("double") * k))
        )
        .cast("bigint")
        .alias("v_micro"),
    )


# P(first significant digit = d) = log10(1 + 1/d), micro-rounded literals
# (frozen at authoring time; ln/log10 never run inside either engine).
_BENFORD_MICRO = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
                  6: 66947, 7: 57992, 8: 51153, 9: 45757}

_BENFORD_ORACLE = f"""WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
),
counts AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS c FROM digits GROUP BY digit),
tot AS (SELECT digit, c, CAST(SUM(c) OVER () AS BIGINT) AS n FROM counts)
SELECT digit, c AS n_orders,
       CAST((1000000 * c) // n AS BIGINT) AS p_obs_micro,
       CASE digit {' '.join(f'WHEN {d} THEN CAST({p} AS BIGINT)' for d, p in _BENFORD_MICRO.items())} END AS p_benford_micro,
       CAST(abs(1000000 * c - (CASE digit {' '.join(f'WHEN {d} THEN CAST({p} AS BIGINT)' for d, p in _BENFORD_MICRO.items())} END) * n) AS BIGINT) AS dev_scaled
FROM tot"""


@query("benford_first_digit", _BENFORD_ORACLE)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order totals: observed
    first-significant-digit frequencies vs the log-law expectation — the
    classic synthetic-data / fraud smoke test, useful here as a
    data-quality screen on any positive-valued money column.

    The digit comes from the INTEGER part's decimal string (floor ->
    bigint -> varchar), never from float formatting (engine-dependent) or
    log10 (not hash-safe); expected probabilities are frozen micro-int
    literals.  p_obs uses integer division; the deviation column is the
    pure-integer |1e6*c - p*n|.  One digit-agg (9 groups) + one window
    over the 9-row table."""
    from pyspark.sql import Window

    orders = testdata.load(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").cast("bigint").alias("c"))
    tot = counts.withColumn("n", F.sum("c").over(Window.partitionBy()))
    pb = F.element_at(
        F.create_map(*[F.lit(x) for kv in _BENFORD_MICRO.items() for x in kv]),
        F.col("digit").cast("int"),
    ).cast("bigint")
    return tot.select(
        "digit",
        F.col("c").alias("n_orders"),
        F.expr("div(1000000 * c, n)").cast("bigint").alias("p_obs_micro"),
        pb.alias("p_benford_micro"),
        F.abs(F.lit(1000000) * F.col("c") - pb * F.col("n")).cast("bigint").alias("dev_scaled"),
    )


_KEYPROFILE_ORACLE = """WITH l AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM lineitem GROUP BY l_orderkey
), e AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
), d AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY source
)
SELECT 'lineitem.l_orderkey' AS rel_key, CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(MAX(c) AS BIGINT) AS max_mult,
       CAST(SUM(c * c) AS BIGINT) AS selfjoin_card
FROM l
UNION ALL
SELECT 'events.user_id', CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
       CAST(MAX(c) AS BIGINT), CAST(SUM(c * c) AS BIGINT) FROM e
UNION ALL
SELECT 'documents.source', CAST(SUM(c) AS BIGINT), CAST(COUNT(*) AS BIGINT),
       CAST(MAX(c) AS BIGINT), CAST(SUM(c * c) AS BIGINT) FROM d"""


@query("join_key_profile", _KEYPROFILE_ORACLE)
def join_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key multiplicity profile for the three hottest join keys:
    row count, distinct keys, max multiplicity (the skew headline), and
    the predicted self-equi-join cardinality sum(c^2) — the statistics a
    planner (or an engineer sizing a shuffle) reads before scheduling a
    large join; sum(c1*c2) over matching per-key counts generalizes it
    to two-sided estimates.

    Scale shape: one partial-aggregating count per key + a second tiny
    rollup, per relation; union of three 1-row frames.  The per-key count
    table is the only intermediate and it map-side combines."""
    def profile(df: DataFrame, key: str, label: str) -> DataFrame:
        per_key = df.groupBy(key).agg(F.count("*").cast("bigint").alias("c"))
        return per_key.agg(
            F.lit(label).alias("rel_key"),
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.max("c").cast("bigint").alias("max_mult"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("selfjoin_card"),
        ).select("rel_key", "n_rows", "n_keys", "max_mult", "selfjoin_card")

    li = testdata.load(spark, sf_dir, "lineitem")
    ev = testdata.load(spark, sf_dir, "events")
    docs = testdata.load(spark, sf_dir, "documents")
    return (
        profile(li, "l_orderkey", "lineitem.l_orderkey")
        .unionAll(profile(ev, "user_id", "events.user_id"))
        .unionAll(profile(docs, "source", "documents.source"))
    )


_KANON_K = 5

_KANON_ORACLE = f"""WITH qi AS (
  SELECT source, lang, n_chars // 200 AS len_bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang, len_bucket
),
bucketed AS (
  SELECT CASE WHEN c = 1 THEN 'unique'
              WHEN c < {_KANON_K} THEN 'small'
              ELSE 'anonymous' END AS risk_bucket,
         c
  FROM qi
)
SELECT risk_bucket, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(c) AS BIGINT) AS n_docs
FROM bucketed GROUP BY risk_bucket"""


@query("k_anonymity_audit", _KANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (source, lang,
    200-char length bucket): how many documents sit in equivalence
    classes of size 1 (re-identifiable), < k=5 (suppression
    candidates), or >= k — the privacy screen run before releasing a
    derived corpus, next to pii_scrub's content-level pass.

    Scale shape: one partial-aggregating count over the QI tuple (the
    only corpus-sized exchange) + a 3-row rollup.  The audit's output is
    the suppression policy's input: joining the small/unique classes
    back by QI key is a broadcast semi-join."""
    docs = testdata.load(spark, sf_dir, "documents")
    qi = docs.groupBy(
        "source", "lang", F.expr("div(n_chars, 200)").alias("len_bucket")
    ).agg(F.count("*").cast("bigint").alias("c"))
    bucket = (
        F.when(F.col("c") == 1, "unique")
        .when(F.col("c") < _KANON_K, "small")
        .otherwise("anonymous")
    )
    return (
        qi.select(bucket.alias("risk_bucket"), "c")
        .groupBy("risk_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum("c").cast("bigint").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher rule battery + C4 line cleaning (round 6)
# ---------------------------------------------------------------------------

# Mirrors X.gopher_quality_rules exactly: all-integer cross-multiplied
# thresholds (no float division anywhere), lines from the RAW text, the
# t <> upper(t) letter test over already-lowercased tokens.
_GOPHER_ORACLE = r"""WITH norm AS (
  SELECT doc_id, source, text,
         regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
m AS (
  SELECT doc_id, source,
    string_split_regex(t, '\s+') AS tk,
    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                x -> length(x) > 0) AS ls,
    CAST(length(t) - length(replace(t, '#', '')) AS BIGINT) AS n_hash,
    CAST((length(t) - length(replace(t, '...', ''))) / 3 AS BIGINT) AS n_ell
  FROM norm
),
r AS (
  SELECT doc_id, source,
    CAST(len(tk) AS BIGINT) AS n_tokens,
    CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT) AS total_len,
    n_hash, n_ell,
    CAST(len(ls) AS BIGINT) AS n_lines,
    CAST(len(list_filter(ls, x -> x LIKE '-%' OR x LIKE '*%' OR x LIKE '•%')) AS BIGINT) AS n_bullet,
    CAST(len(list_filter(ls, x -> x LIKE '%...' OR x LIKE '%…')) AS BIGINT) AS n_ell_lines,
    CAST(len(list_filter(tk, x -> x <> upper(x))) AS BIGINT) AS n_alpha,
    CAST(CASE WHEN list_contains(tk, 'the') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(tk, 'be') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(tk, 'to') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(tk, 'of') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(tk, 'and') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(tk, 'that') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(tk, 'have') THEN 1 ELSE 0 END
       + CASE WHEN list_contains(tk, 'with') THEN 1 ELSE 0 END AS BIGINT) AS n_stops
  FROM m
),
v AS (
  SELECT doc_id, source, n_tokens,
    (n_tokens >= 50 AND n_tokens <= 100000) AS r_word_count,
    (3 * n_tokens <= total_len AND total_len <= 10 * n_tokens) AS r_mean_word_len,
    (10 * (n_hash + n_ell) <= n_tokens) AS r_symbol_ratio,
    (10 * n_bullet <= 9 * n_lines) AS r_bullet_lines,
    (10 * n_ell_lines <= 3 * n_lines) AS r_ellipsis_lines,
    (10 * n_alpha >= 8 * n_tokens) AS r_alpha_words,
    (n_stops >= 2) AS r_stopwords
  FROM r
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(CASE WHEN NOT r_word_count THEN 1 ELSE 0 END) AS BIGINT) AS f_word_count,
  CAST(SUM(CASE WHEN NOT r_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS f_mean_word_len,
  CAST(SUM(CASE WHEN NOT r_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT) AS f_symbol_ratio,
  CAST(SUM(CASE WHEN NOT r_bullet_lines THEN 1 ELSE 0 END) AS BIGINT) AS f_bullet_lines,
  CAST(SUM(CASE WHEN NOT r_ellipsis_lines THEN 1 ELSE 0 END) AS BIGINT) AS f_ellipsis_lines,
  CAST(SUM(CASE WHEN NOT r_alpha_words THEN 1 ELSE 0 END) AS BIGINT) AS f_alpha_words,
  CAST(SUM(CASE WHEN NOT r_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS f_stopwords,
  CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len AND r_symbol_ratio
                 AND r_bullet_lines AND r_ellipsis_lines AND r_alpha_words
                 AND r_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM v GROUP BY source"""


@query("gopher_rule_failures", _GOPHER_ORACLE)
def gopher_rule_failures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher quality-rule failure accounting (Rae et al. 2021,
    appendix A.1.1): for each of the seven rules, how many documents each
    source loses to it, plus the survivors — the report a curation team
    reads before deciding which rule to tune. Physical shape: the rule
    battery is one map-side projection (X.gopher_quality_rules) with
    source carried through, then a 20-row partial agg — the ONLY exchange
    is the per-source rollup, so 100 TB is a single scan."""
    docs = testdata.load(spark, sf_dir, "documents")
    g = X.gopher_quality_rules(docs, carry_cols=["source"])
    fail = lambda r: F.sum((~F.col(r)).cast("int")).cast("bigint")  # noqa: E731
    return g.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        fail("r_word_count").alias("f_word_count"),
        fail("r_mean_word_len").alias("f_mean_word_len"),
        fail("r_symbol_ratio").alias("f_symbol_ratio"),
        fail("r_bullet_lines").alias("f_bullet_lines"),
        fail("r_ellipsis_lines").alias("f_ellipsis_lines"),
        fail("r_alpha_words").alias("f_alpha_words"),
        fail("r_stopwords").alias("f_stopwords"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_keep"),
    )


# Mirrors X.c4_line_filter: trimmed nonempty lines, a line survives iff it
# ends in terminal punctuation AND has >= 3 whitespace words AND does not
# mention 'javascript'; a page survives iff no 'lorem ipsum', no '{', and
# >= 3 kept lines. The synthetic corpus is single-line so n_kept_lines is
# 0 everywhere here; the multi-line semantics are pinned by unit tests.
_C4_ORACLE = r"""WITH pages AS (
  SELECT doc_id, source,
    (NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')) AS page_ok,
    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                x -> length(x) > 0) AS ls
  FROM documents
),
per_doc AS (
  SELECT doc_id, source, page_ok,
    CAST(len(ls) AS BIGINT) AS n_lines,
    CAST(len(list_filter(ls, x ->
        right(x, 1) IN ('.', '!', '?', '"')
        AND len(string_split_regex(x, '\s+')) >= 3
        AND NOT contains(lower(x), 'javascript'))) AS BIGINT) AS n_kept_lines,
    CAST(coalesce(list_sum(list_transform(list_filter(ls, x ->
        right(x, 1) IN ('.', '!', '?', '"')
        AND len(string_split_regex(x, '\s+')) >= 3
        AND NOT contains(lower(x), 'javascript')), x -> length(x))), 0) AS BIGINT)
      AS n_kept_chars
  FROM pages
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_lines) AS BIGINT) AS total_lines,
  CAST(SUM(n_kept_lines) AS BIGINT) AS kept_lines,
  CAST(SUM(n_kept_chars) AS BIGINT) AS kept_chars,
  CAST(SUM(CASE WHEN page_ok AND n_kept_lines >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
FROM per_doc GROUP BY source"""


@query("c4_line_stats", _C4_ORACLE)
def c4_line_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source C4 line-cleaning accounting (Raffel et al. 2020,
    section 2.2): lines seen / lines surviving the terminal-punctuation +
    min-words + no-javascript rule, chars retained, and pages surviving
    the lorem-ipsum / brace / >= 3-kept-lines page rule. Physical shape:
    X.c4_line_filter's exploded-line Tungsten agg (doc-keyed, evenly
    distributed) then a 20-row per-source partial agg."""
    docs = testdata.load(spark, sf_dir, "documents")
    c = X.c4_line_filter(docs, carry_cols=["source"])
    return c.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_lines").cast("bigint").alias("total_lines"),
        F.sum("n_kept_lines").cast("bigint").alias("kept_lines"),
        F.sum("n_kept_chars").cast("bigint").alias("kept_chars"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_keep"),
    )


# Leakage-safe split accounting: reuses the dedup_clusters recursive-CTE
# fixpoint, assigns each doc the split of its COMPONENT MIN (not its own
# id), and counts — per (split, source) — docs, distinct clusters, and
# the docs a naive per-id hash split would have misplaced relative to
# their cluster's split (the train/test leakage the safe split closes).
_LEAKAGE_SPLIT_ORACLE = rf"""{_CLUSTERS_ORACLE.replace(
    "SELECT src AS id, MIN(node) AS comp FROM reach GROUP BY src",
    ", comps AS (SELECT src AS id, MIN(node) AS comp FROM reach GROUP BY src)",
)},
assigned AS (
  SELECT d.source, c.comp,
    CASE WHEN substring(md5(CAST(c.comp AS VARCHAR)), 1, 1) < 'c' THEN 'train'
         WHEN substring(md5(CAST(c.comp AS VARCHAR)), 1, 1) < 'e' THEN 'val'
         ELSE 'test' END AS split,
    CASE WHEN substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
         WHEN substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
         ELSE 'test' END AS naive_split
  FROM documents d JOIN comps c ON c.id = d.doc_id
)
SELECT split, source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT comp) AS BIGINT) AS n_clusters,
  CAST(SUM(CASE WHEN naive_split <> split THEN 1 ELSE 0 END) AS BIGINT) AS n_rescued
FROM assigned GROUP BY split, source"""


@query("leakage_safe_split_counts", _LEAKAGE_SPLIT_ORACLE)
def leakage_safe_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split accounting: every doc takes the
    split of its duplicate-cluster representative (component min over the
    Jaccard-0.5 pair graph), so near-identical docs can never straddle
    train and test. n_rescued counts the docs whose naive per-id hash
    split disagrees with their cluster's split — exactly the documents
    that would have leaked. Physical shape: one pair search (the adaptive
    Jaccard gate), min-label-propagation components, ONE id-keyed join to
    attach the cluster map, then a ~60-row rollup."""
    from .operators import curation as C

    docs = testdata.load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, n=2, threshold=0.5)
    s = C.leakage_safe_split(docs, pairs)
    from .operators.curation import split_label

    return s.groupBy("split", "source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("comp").cast("bigint").alias("n_clusters"),
        F.sum((split_label("doc_id") != F.col("split")).cast("int"))
        .cast("bigint")
        .alias("n_rescued"),
    )


# Mirrors C.unimax_allocation bit-for-bit: all-integer saturation test
# (cross-multiplied), floor-of-double share division (identical IEEE
# division in both engines at token magnitudes far below 2^53), unique
# (cap, source) ordering so RANGE and ROWS window frames coincide.
_UNIMAX_ORACLE = r"""WITH sizes AS (
  SELECT source,
    CAST(SUM(len(string_split_regex(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), '\s+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
budget AS (SELECT CAST(19 * SUM(n_tokens) // 10 AS BIGINT) AS b FROM sizes),
ranked AS (
  SELECT source, n_tokens, CAST(2 * n_tokens AS BIGINT) AS cap_tokens,
    ROW_NUMBER() OVER (ORDER BY 2 * n_tokens, source) AS j,
    COUNT(*) OVER () AS n,
    SUM(CAST(2 * n_tokens AS BIGINT)) OVER (ORDER BY 2 * n_tokens, source)
      - 2 * n_tokens AS prefix
  FROM sizes
),
marked AS (
  SELECT ranked.*, b,
    (cap_tokens * (n - j + 1) <= b - prefix) AS sat
  FROM ranked, budget
),
agg AS (
  SELECT *,
    SUM(CASE WHEN sat THEN 1 ELSE 0 END) OVER () AS m,
    SUM(CASE WHEN sat THEN cap_tokens ELSE 0 END) OVER () AS spent
  FROM marked
),
shared AS (
  SELECT *,
    CAST(floor((b - spent) / greatest(n - m, 1)) AS BIGINT) AS share
  FROM agg
),
alloc AS (
  SELECT source, n_tokens, cap_tokens,
    CASE WHEN sat THEN cap_tokens
         ELSE share + CASE WHEN n - j < (b - spent) - share * greatest(n - m, 1)
                           THEN 1 ELSE 0 END
    END AS alloc_tokens
  FROM shared
)
SELECT source, n_tokens, cap_tokens,
  CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
  CAST(floor(alloc_tokens * 1000 / n_tokens) AS BIGINT) AS epochs_milli
FROM alloc"""


@query("unimax_allocation", _UNIMAX_ORACLE)
def unimax_allocation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax token-budget allocation (Chung et al. 2023) across sources:
    budget = 1.9x the corpus, per-source cap = 2 epochs; closed-form
    integer waterfilling so small sources saturate at their cap and the
    rest split the remainder to the exact token. The budget scalar comes
    from one bounded 1-row aggregate collect (the rate-table precedent);
    everything after the per-source token sum is window functions over
    the ~20-row source dimension."""
    from .operators import curation as C
    from .operators.text import token_count

    docs = testdata.load(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(token_count(F.col("text"))).cast("bigint").alias("t")
    ).collect()[0]["t"]
    return C.unimax_allocation(
        docs, budget_tokens=int(total) * 19 // 10, max_epochs=2
    )


# Per-cluster best-member selection: reuses the dedup_clusters fixpoint
# and the text-profile quality expression, quantized to integer
# ten-thousandths so the argmax ordering is engine-exact.
_KEEP_BEST_ORACLE = rf"""WITH comp AS ({_CLUSTERS_ORACLE}),
{_NORM}, {_TOKS},
base AS (
  SELECT d.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
         ' ' || n.t || ' ' AS p
  FROM documents d JOIN norm n ON n.id = d.doc_id JOIN toks USING (id)
),
q AS (
  SELECT doc_id AS id,
    CAST(floor((0.4 * least(CAST(n_tokens AS DOUBLE), 100.0) / 100.0
        + 0.3 * CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        + 0.3 * least(CAST(CAST((length(p) - length(replace(p, ' the ', ''))) / 5
            + (length(p) - length(replace(p, ' a ', ''))) / 3
            + (length(p) - length(replace(p, ' of ', ''))) / 4 AS BIGINT) AS DOUBLE)
            * 5.0 / CAST(n_tokens AS DOUBLE), 1.0)) * 10000.0) AS BIGINT) AS qq
  FROM base
),
ranked AS (
  SELECT c.comp, q.id, q.qq,
    ROW_NUMBER() OVER (PARTITION BY c.comp ORDER BY q.qq DESC, q.id ASC) AS rk,
    COUNT(*) OVER (PARTITION BY c.comp) AS n_members
  FROM comp c JOIN q ON q.id = c.id
)
SELECT comp, CAST(n_members AS BIGINT) AS n_members,
       CAST(id AS BIGINT) AS keep_id, qq AS best_q
FROM ranked WHERE rk = 1 AND n_members >= 2"""


@query("dedup_keep_best_clusters", _KEEP_BEST_ORACLE)
def dedup_keep_best_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware duplicate-cluster representatives: for every near-dup
    cluster (Jaccard-0.5 components), the member a curation pipeline
    should KEEP — the highest quality_score, ties to the smaller id —
    with the cluster size alongside. Min-id canonicals (dedup_corpus) are
    the determinism fallback; this is the selection modern pipelines run.
    Physical shape: one struct-max partial agg per cluster, no rank
    window over the corpus (the oracle uses one; Spark does not)."""
    docs = testdata.load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, n=2, threshold=0.5)
    qq = X.quality_score_q(F.col("text"))
    return D.dedup_keep_best(docs, pairs, qq).filter(F.col("n_members") >= 2)


# ANN recall evaluation: both approximate methods' top-5 sets joined
# against the exact brute-force top-5; recall is exact integer hits out
# of k. Reuses the three certified oracles verbatim as nested CTEs.
_ANN_RECALL_ORACLE = f"""WITH exact AS ({_KNN_ORACLE}),
ivf AS ({_IVF_ORACLE}),
lsh AS ({_LSH_TOPK_ORACLE}),
approx AS (
  SELECT 'ivf' AS method, query_id, neighbor_id FROM ivf
  UNION ALL
  SELECT 'lsh' AS method, query_id, neighbor_id FROM lsh
)
SELECT a.method, a.query_id,
  CAST(COUNT(*) AS BIGINT) AS n_returned,
  CAST(SUM(CASE WHEN e.neighbor_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hits,
  CAST(SUM(CASE WHEN e.neighbor_id IS NULL THEN 0 ELSE 1 END) * 200 AS BIGINT) AS recall_milli
FROM approx a
LEFT JOIN exact e ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY a.method, a.query_id"""


@query("ann_recall_eval", _ANN_RECALL_ORACLE)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the two untrained ANN routes (IVF 2-probe, LSH
    same-bucket) against the exact brute-force top-5 — the evaluation a
    serving team publishes before trusting an index. Exact-integer
    recall (hits * 200 = recall in millis for k=5). Physical shape: both
    approximate sets and the exact set are bounded (|queries| * k rows);
    the comparison join and rollup are dimension-sized, so the cost is
    the three searches themselves."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    queries_ = [0, 1, 2, 3, 4]
    exact = S.knn_brute_force(emb, queries_, k=5).select("query_id", "neighbor_id")
    cents = emb.filter(F.col("vec_id").between(8, 15)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    anchors = emb.filter(F.col("vec_id") <= 7).select(
        F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("anchor_vec")
    )
    ivf = S.ivf_ann_topk(emb, cents, queries_, k=5, nprobe=2).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id"
    )
    lsh = S.lsh_ann_topk(emb, anchors, queries_, k=5).select(
        F.lit("lsh").alias("method"), "query_id", "neighbor_id"
    )
    approx = ivf.unionAll(lsh)
    hit = F.when(F.col("e_nid").isNull(), F.lit(0)).otherwise(F.lit(1))
    ex = exact.select(
        F.col("query_id").alias("e_qid"), F.col("neighbor_id").alias("e_nid")
    )
    joined = approx.join(
        F.broadcast(ex),
        (F.col("query_id") == F.col("e_qid")) & (F.col("neighbor_id") == F.col("e_nid")),
        "left",
    )
    return joined.groupBy("method", "query_id").agg(
        F.count("*").cast("bigint").alias("n_returned"),
        F.sum(hit).cast("bigint").alias("n_hits"),
        (F.sum(hit) * F.lit(200)).cast("bigint").alias("recall_milli"),
    )


# MinHash estimator calibration: value-level |estimate - exact| by
# exact-similarity band, over the candidate pairs the banding surfaces.
# All error arithmetic is integer micro-units: est*1e6 = n_eq*62500
# exactly (power-of-two denominator), exact*1e6 rounds onto an integer,
# and the band mean is integer division — no float sum ever crosses an
# aggregation, so the table hash-checks.
_MINHASH_CALIB_ORACLE = rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES},
{_MINHASH_SIGS},
bands AS (
  SELECT id, CAST(seed // 2 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_sig
  FROM sigs GROUP BY id, seed // 2
),
cpair AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.id < b.id
),
est AS (
  SELECT sa.id AS id_a, sb.id AS id_b, COUNT(*) AS n_eq
  FROM sigs sa JOIN sigs sb
    ON sa.seed = sb.seed AND sa.id < sb.id AND sa.minhash = sb.minhash
  GROUP BY sa.id, sb.id
),
cd AS (
  SELECT c.id_a, c.id_b, ROUND(e.n_eq / 16.0, 6) AS est_jaccard
  FROM cpair c JOIN est e ON e.id_a = c.id_a AND e.id_b = c.id_b
),
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
ex AS (
  SELECT id_a, id_b,
         ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS j
  FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
  WHERE ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= 0.1
),
joined AS (
  SELECT CAST(round(cd.est_jaccard * 1000000) AS BIGINT) AS est_micro,
         CAST(round(ex.j * 1000000) AS BIGINT) AS ex_micro
  FROM cd JOIN ex ON ex.id_a = cd.id_a AND ex.id_b = cd.id_b
)
SELECT CAST(least(ex_micro // 200000, 4) AS BIGINT) AS band,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(SUM(abs(est_micro - ex_micro)) // COUNT(*) AS BIGINT) AS mean_abs_err_micro
FROM joined GROUP BY least(ex_micro // 200000, 4)"""


@query("dedup_minhash_calibration", _MINHASH_CALIB_ORACLE)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration: mean |est_jaccard - exact_jaccard|
    (integer micro-units) per exact-similarity quintile band, over the
    LSH candidate pairs with exact similarity >= 0.1 — the value-level
    error table next to the set-level recall/precision evals, telling a
    dedup team whether k=16 signatures estimate well enough to SKIP the
    exact verify step at their threshold. Candidates come from the LOOSE
    8x2 banding (the band sweep's widest config) so the table reaches
    down the similarity range instead of only sampling the near-1 band.
    Physical shape: the two certified pair searches plus one bounded
    join and a 5-row band aggregation; every error is quantized to
    integer micro-units BEFORE the sum (est*1e6 = n_eq*62500 exactly),
    so no float accumulates."""
    docs = testdata.load(spark, sf_dir, "documents")
    cand = D.lsh_candidate_pairs(docs, k=16, bands=8, n=2)
    exact = D.jaccard_pairs(docs, n=2, threshold=0.1)
    est_micro = F.round(F.col("est_jaccard") * F.lit(1000000.0)).cast("bigint")
    ex_micro = F.round(F.col("jaccard") * F.lit(1000000.0)).cast("bigint")
    joined = cand.join(exact, ["id_a", "id_b"]).select(
        est_micro.alias("est_micro"), ex_micro.alias("ex_micro")
    )
    band = F.least(F.expr("ex_micro DIV 200000"), F.lit(4)).cast("bigint")
    return (
        joined.select(
            band.alias("band"),
            F.abs(F.col("est_micro") - F.col("ex_micro")).alias("_err"),
        )
        .groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.expr("CAST(SUM(_err) DIV COUNT(*) AS BIGINT)").alias(
                "mean_abs_err_micro"
            ),
        )
    )


# Strategy cost census: exact index-size and candidate-pair volume each
# sparse pair-search strategy WOULD generate — df/bucket-size arithmetic
# only, no pair explosion runs. The prefix census uses the rarest-first
# (df, shingle) order, the one global order both engines can reproduce.
_COST_CENSUS_ORACLE = rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES},
dfr AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY shingle),
postings AS (
  SELECT 'postings' AS strategy, CAST(SUM(df) AS BIGINT) AS index_rows,
         CAST(SUM(df * (df - 1) // 2) AS BIGINT) AS candidate_pairs
  FROM dfr
),
szs AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY id),
ranked AS (
  SELECT s.id, s.shingle, z.n_sh,
         ROW_NUMBER() OVER (PARTITION BY s.id ORDER BY d.df, s.shingle) AS rk
  FROM sh s JOIN dfr d ON d.shingle = s.shingle JOIN szs z ON z.id = s.id
),
pre AS (
  SELECT shingle FROM ranked
  WHERE rk <= n_sh - CAST(ceil((0.5 - 0.000001) * n_sh) AS BIGINT) + 1
),
pdfr AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS pdf FROM pre GROUP BY shingle),
prefix AS (
  SELECT 'prefix_df' AS strategy, CAST(SUM(pdf) AS BIGINT) AS index_rows,
         CAST(SUM(pdf * (pdf - 1) // 2) AS BIGINT) AS candidate_pairs
  FROM pdfr
),
{_MINHASH_SIGS},
bands AS (
  SELECT id, CAST(seed // 4 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_sig
  FROM sigs GROUP BY id, seed // 4
),
bsz AS (
  SELECT band, band_sig, CAST(COUNT(*) AS BIGINT) AS m
  FROM bands GROUP BY band, band_sig
),
lsh AS (
  SELECT 'lsh_16x4' AS strategy, CAST(SUM(m) AS BIGINT) AS index_rows,
         CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS candidate_pairs
  FROM bsz
)
SELECT * FROM postings UNION ALL SELECT * FROM prefix UNION ALL SELECT * FROM lsh"""


@query("dedup_cost_census", _COST_CENSUS_ORACLE)
def dedup_cost_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-run planner census for the sparse pair-search strategies:
    exact (strategy, index_rows, candidate_pairs) for the full postings
    join, the AllPairs rarest-first prefix filter, and MinHash-LSH 4x4
    banding — candidate_pairs IS the shuffle volume each strategy would
    generate at this corpus, so the sum(df^2)-style arguments the
    strategy gates rely on become a measurable table. Physical shape:
    pure df / prefix-length / bucket-size aggregations (three shingle
    aggregations + one signature pass); the corpus text never moves and
    no pair explosion runs."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.dedup_cost_census(docs, threshold=0.5, k=16, bands=4, n=2)


# Threshold-sensitivity table: one exact pair search at the LOOSEST
# threshold (0.1); every tighter threshold's survivor counts are pure
# filters over the already-scored pairs, so choosing t never costs a
# second corpus-sized pair search. Thresholds are integer millis; the
# comparison j >= t/1000.0 is one correctly-rounded IEEE division in
# both engines over the same ROUND(j, 6) value.
_THRESH_SENS_ORACLE = rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES},
sizes AS (SELECT id, COUNT(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
ex AS (
  SELECT id_a, id_b,
         ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS j
  FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
  WHERE ROUND(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= 0.1
),
th AS (SELECT unnest([100, 300, 500, 900]) AS threshold_milli),
expl AS (
  SELECT t.threshold_milli, e.id_a, e.id_b
  FROM ex e JOIN th t ON e.j >= t.threshold_milli / 1000.0
),
ids AS (
  SELECT threshold_milli, id_a AS id FROM expl
  UNION ALL
  SELECT threshold_milli, id_b FROM expl
)
SELECT CAST(threshold_milli AS BIGINT) AS threshold_milli,
  CAST(COUNT(*) // 2 AS BIGINT) AS n_pairs,
  CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs
FROM ids GROUP BY threshold_milli"""


@query("dedup_threshold_sensitivity", _THRESH_SENS_ORACLE)
def dedup_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard threshold-sensitivity table: surviving near-dup pair and
    member-doc counts at t = 0.1 / 0.3 / 0.5 / 0.9 — the dial a dedup
    team reads before freezing the threshold for a corpus-scale run.
    Physical shape: ONE exact pair search at the loosest threshold;
    every tighter threshold is a map-side filter of the scored pairs
    (the thresholds explode per surviving pair, bounded by 4x the pair
    count), then a single hash aggregation over (threshold, member id)
    rows yields both counts — pairs as count/2 (each pair contributes
    exactly two member rows), docs as the distinct count. No join, no
    second corpus pass, no rank window."""
    docs = testdata.load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, n=2, threshold=0.1)
    th = F.array(*[F.lit(t) for t in (100, 300, 500, 900)])
    surviving = F.filter(
        th, lambda t: F.col("jaccard") >= t.cast("double") / F.lit(1000.0)
    )
    expl = pairs.select(
        F.explode(surviving).alias("threshold_milli"), "id_a", "id_b"
    )
    rows = expl.select(
        "threshold_milli", F.explode(F.array("id_a", "id_b")).alias("id")
    )
    return rows.groupBy(F.col("threshold_milli").cast("bigint").alias("threshold_milli")).agg(
        F.floor(F.count("*") / 2).cast("bigint").alias("n_pairs"),
        F.countDistinct("id").cast("bigint").alias("n_docs"),
    )


# Banding-parameter sweep: per (bands x rows) config of the SAME k=16
# signature, candidate volume + recall/precision vs exact Jaccard >= 0.5.
# The oracle builds every config's bands from one sigs CTE (seed // r is
# the band index; uniform widths since 2/4/8 all divide 16) and the
# config dimension rides the group-by keys end to end.
_LSH_SWEEP_ORACLE = rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES},
{_MINHASH_SIGS},
cfg AS (SELECT * FROM (VALUES (2, 8), (4, 4), (8, 2)) AS t(n_bands, n_rows)),
bands AS (
  SELECT c.n_bands, s.id, CAST(s.seed // c.n_rows AS INT) AS band,
         md5(string_agg(s.minhash, ',' ORDER BY s.seed)) AS band_sig
  FROM sigs s CROSS JOIN cfg c
  GROUP BY c.n_bands, c.n_rows, s.id, s.seed // c.n_rows
),
cand AS (
  SELECT DISTINCT a.n_bands, a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b
    ON a.n_bands = b.n_bands AND a.band = b.band
   AND a.band_sig = b.band_sig AND a.id < b.id
),
ex AS ({_JACCARD_ORACLE}),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs FROM ex),
per AS (
  SELECT c.n_bands,
    CAST(COUNT(*) AS BIGINT) AS n_candidates,
    CAST(SUM(CASE WHEN e.id_a IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_found
  FROM cand c LEFT JOIN ex e ON e.id_a = c.id_a AND e.id_b = c.id_b
  GROUP BY c.n_bands
)
SELECT CAST(p.n_bands AS INT) AS n_bands,
  CAST(16 // p.n_bands AS INT) AS n_rows,
  t.n_true_pairs, p.n_candidates, p.n_found,
  CAST(CASE WHEN t.n_true_pairs = 0 THEN 1000
       ELSE floor(p.n_found * 1000 / t.n_true_pairs) END AS BIGINT) AS recall_milli,
  CAST(CASE WHEN p.n_candidates = 0 THEN 1000
       ELSE floor(p.n_found * 1000 / p.n_candidates) END AS BIGINT) AS precision_milli
FROM per p, t"""


@query("dedup_lsh_band_sweep", _LSH_SWEEP_ORACLE)
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-parameter sweep: recall/precision and candidate volume of
    MinHash-LSH at (2x8), (4x4), and (8x2) bands x rows over the SAME
    k=16 signatures, against exact Jaccard >= 0.5 — the S-curve tuning
    table a dedup team freezes (b, r) from before a corpus-scale run.
    Physical shape: ONE signature aggregation feeds all three configs
    (``lsh_band_sweep``: the configs explode inside one projection, so
    the corpus is scanned and shuffled once, not once per config); the
    exact side runs ``jaccard_pairs``'s adaptive gate (dense-BLAS at
    this fixture scale, the prefix-filtered sparse path past the vocab
    gate); the comparison is one left join + config-keyed rollup, with
    the scalar true-pair count cross-joined funnel-style."""
    docs = testdata.load(spark, sf_dir, "documents")
    # persist: the exact pair table feeds TWO consumers (the true-pair
    # count and the comparison join) and Spark does not share
    # unmaterialized subtrees across DataFrame branches — without the
    # cache the whole exact pair search ran twice, which the round-8
    # scale probe measured as the dominant cost of this query at 8x
    # (2 x 159 s of a ~380 s total). The cache cannot be unpersisted from
    # inside (the query returns a lazy plan; both consumers evaluate in
    # the caller's single action), so it is REGISTERED for post-action
    # drain (round-9 ADVICE: repeated invocations — bench min-of-3 draws,
    # driver runs — otherwise each leak one session-resident cached plan);
    # harness loops call session_cache.release_session_caches between queries.
    from .operators.session_cache import register_session_cache

    exact = register_session_cache(
        D.jaccard_pairs(docs, n=2, threshold=0.5).select("id_a", "id_b").persist()
    )
    cand = D.lsh_band_sweep(docs, band_counts=(2, 4, 8), k=16, n=2)
    n_true = exact.agg(F.count("*").cast("bigint").alias("n_true_pairs"))
    ex = exact.select(
        F.col("id_a").alias("e_a"), F.col("id_b").alias("e_b")
    )
    hit = F.when(F.col("e_a").isNull(), F.lit(0)).otherwise(F.lit(1))
    per = (
        cand.join(
            ex,
            (F.col("id_a") == F.col("e_a")) & (F.col("id_b") == F.col("e_b")),
            "left",
        )
        .groupBy("n_bands")
        .agg(
            F.count("*").cast("bigint").alias("n_candidates"),
            F.sum(hit).cast("bigint").alias("n_found"),
        )
    )
    combined = per.crossJoin(n_true)
    rec = F.when(F.col("n_true_pairs") == 0, F.lit(1000)).otherwise(
        F.floor(F.col("n_found") * F.lit(1000) / F.col("n_true_pairs"))
    )
    prec = F.when(F.col("n_candidates") == 0, F.lit(1000)).otherwise(
        F.floor(F.col("n_found") * F.lit(1000) / F.col("n_candidates"))
    )
    return combined.select(
        F.col("n_bands").cast("int").alias("n_bands"),
        (F.lit(16) / F.col("n_bands")).cast("int").alias("n_rows"),
        "n_true_pairs",
        "n_candidates",
        "n_found",
        rec.cast("bigint").alias("recall_milli"),
        prec.cast("bigint").alias("precision_milli"),
    )


# NOTE: the former single-config `dedup_lsh_recall_eval` registration
# (k=16, 4x4 vs exact Jaccard >= 0.5) was deregistered in round 6: it is
# strictly subsumed by `dedup_lsh_band_sweep`, whose n_bands=4 row
# carries the identical n_true_pairs/n_candidates/n_found and derived
# recall/precision for the same signatures — and the sweep computes the
# other two configs from the SAME signature pass. Its window slot went
# to `window_suite`'s round-6 freshness re-certification (the 50-row
# driver window was exactly full).


# ---------------------------------------------------------------------------
# Round-7 registrations: the two pytest-certified audit tables queued when
# the round-6 window was exactly full (VERDICT r6 "What's missing" #2)
# ---------------------------------------------------------------------------
_LSH_HISTOGRAM_ORACLE = rf"""WITH {_NORM}, {_TOKS}, {_SHINGLES},
{_MINHASH_SIGS},
bands AS (
  SELECT id, CAST(seed // 4 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_sig
  FROM sigs GROUP BY id, seed // 4
),
buckets AS (SELECT band, band_sig, COUNT(*) AS m FROM bands GROUP BY band, band_sig)
SELECT CAST(m AS BIGINT) AS bucket_size, CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM buckets GROUP BY m"""


@query("lsh_bucket_histogram", _LSH_HISTOGRAM_ORACLE)
def lsh_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-size histogram of the MinHash banding (k=16, 4x4): the skew
    census a dedup team reads BEFORE running the LSH pair explosion,
    whose cost is sum over buckets of m*(m-1)/2 — one boilerplate-driven
    degenerate bucket dominates the stage at corpus scale. Bounded
    output (distinct bucket sizes); the corpus shuffles only for the
    signature aggregation the candidate stage needs anyway."""
    docs = testdata.load(spark, sf_dir, "documents")
    return D.lsh_bucket_histogram(docs, k=16, bands=4, n=2)


_IVF_OCCUPANCY_ORACLE = f"""WITH cents AS (
  SELECT vec_id AS cent_id, embedding FROM embeddings WHERE vec_id BETWEEN 8 AND 15
),
assign AS (
  SELECT a.vec_id, b.cent_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND({_COS_SQL}, 6) DESC, b.cent_id ASC
         ) AS rnk
  FROM embeddings a CROSS JOIN cents b
),
cells AS (SELECT vec_id, cent_id FROM assign WHERE rnk = 1),
counts AS (SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n FROM cells GROUP BY cent_id)
SELECT CAST(c.cent_id AS BIGINT) AS cell,
       CAST(COALESCE(ct.n, 0) AS BIGINT) AS n_members
FROM cents c LEFT JOIN counts ct ON ct.cent_id = c.cent_id"""


@query("ivf_cell_occupancy", _IVF_OCCUPANCY_ORACLE)
def ivf_cell_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse-quantizer balance audit: (cell, n_members) with explicit
    zeros for empty cells — the per-cell candidate-volume distribution
    behind ``ann_cost_census``'s per-query samples. Map-side assignment
    (the serving path's own projection), one k-group count, zeros from
    the broadcast centroid dimension; the corpus never shuffles."""
    emb = testdata.load(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id").between(8, 15)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    return S.ivf_cell_occupancy(emb, cents)
