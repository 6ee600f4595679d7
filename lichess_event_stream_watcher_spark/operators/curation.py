"""Training-data curation operators: splits, packing, quotas, decontamination.

The beyond-reference family a 100 TB training-data pipeline needs on top of
dedup/similarity/text (brief: "the operations a large-scale training-data
pipeline would need"). Design rules shared by all four:

- **Determinism via md5 hex, compared lexicographically** — never converted
  to integers, so every assignment has a bit-identical DuckDB oracle twin
  and re-runs are stable across engines, partitionings, and cluster sizes.
- **No global order anywhere.** Packing and quotas window over SHARD or
  SOURCE partitions, so every window is cluster-parallel; nothing funnels
  through a single-partition sort at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import normalize_text, tokens


def _md5_of_id(id_col: str):
    return F.md5(F.col(id_col).cast("string"))


def split_label(id_col: str, train_hex: str = "c", val_hex: str = "e"):
    """The split assignment as a pure Column over the id — usable anywhere
    without joining an assignment table back (membership is a property of
    the id alone)."""
    h = F.substring(_md5_of_id(id_col), 1, 1)
    return F.when(h < train_hex, "train").when(h < val_hex, "val").otherwise("test")


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_hex: str = "c",
    val_hex: str = "e",
) -> DataFrame:
    """Deterministic train/val/test assignment from the id hash.

    The first hex char of md5(id) buckets 16-ways: < ``train_hex`` ->
    train (12/16), < ``val_hex`` -> val (2/16), else test (2/16). Pure
    map-side projection — no shuffle, no state, stable under any
    re-partitioning; membership is a property of the id alone, so late-
    arriving data lands in the same split forever.
    """
    return df.withColumn("split", split_label(id_col, train_hex, val_hex))


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    shard_hex_chars: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining layout).

    Documents are concatenated in deterministic (shard, id) order and cut
    every ``budget`` tokens; a doc's bin is its STARTING token offset div
    budget. The shard (first ``shard_hex_chars`` md5 hex chars →
    16^k shards) bounds every window to a 16^k-th of the corpus — the
    cumulative sum that would otherwise demand a global single-partition
    sort runs per-shard, cluster-parallel, and shards are independent
    training streams. Size k so 16^k comfortably exceeds the cluster's
    parallelism (k=3 → 4096 shards covers a 1000-executor job). Returns one
    row per bin: (shard, bin, n_docs, bin_tokens).
    """
    tok = F.size(tokens(normalize_text(F.col(text_col)))).cast("bigint")
    base = df.select(
        F.col(id_col).alias("id"),
        F.substring(_md5_of_id(id_col), 1, shard_hex_chars).alias("shard"),
        tok.alias("n_tok"),
    )
    w = Window.partitionBy("shard").orderBy("id")
    start = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_off")
    # bin stays BIGINT (floor's native type): a 100 TB shard holds ~1e12
    # tokens, so bin indices exceed 2^31 — an int cast would wrap late
    # bins negative and silently merge them with early ones
    packed = base.select(
        "shard", "id", "n_tok", F.floor(start / budget).alias("bin")
    )
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("bin_tokens")
    )


def source_quota(
    df: DataFrame,
    per_source: int = 20,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source document quota (domain balancing for web corpora).

    Keeps at most ``per_source`` docs per source, chosen by the md5-hex
    order of the id (a deterministic uniform shuffle — NOT arrival order,
    which over-samples whatever was crawled first).

    Physical shape: threshold-pruned top-k
    (operators/sketch.py:grouped_topk_threshold) — per-(source, salt)
    struct-min partials bound every exchange, the rank window runs only
    over the ~O(k) survivors, and a hot source at ANY cardinality never
    concentrates a full sort in one task (the row_number-over-the-raw-
    corpus form did). Result rows identical. Returns (id, source, rk).
    """
    from .sketch import grouped_topk_threshold

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        # hash the ORIGINAL id column, not the lateral alias 'id': on a
        # frame that happens to carry an unrelated 'id' column, Spark
        # binds the string 'id' to that real column and the quota draws
        # by the wrong key
        _md5_of_id(id_col).alias("_hx"),
    )
    return (
        grouped_topk_threshold(base, "source", ["_hx", "id"], per_source)
        .select("id", "source", "rk")
    )


def contamination_check(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train->test n-gram contamination: per test doc, how many of its
    distinct ``n``-gram shingles also appear anywhere in the train split.

    ONE pass over the shingle pipeline, no join: each shingle's posting
    rows aggregate to (train-presence flag, list of test ids) in a single
    shuffle — branching the pipeline into a train-lexicon side and a test
    side of a join would re-run the whole scan+tokenize per branch
    (exchange reuse across join branches is not guaranteed). The split is
    PROJECTED onto the shingle rows (``split_label`` is a pure function of
    the id), never joined back from an assignment table. Skew note: a
    stop-shingle present in most test docs builds one wide test-id list —
    cap frequent shingles upstream (as ``jaccard_pairs`` does with
    ``max_shingle_df``) if the corpus needs it.
    """
    from .dedup import shingles

    sh = shingles(df, n=n, text_col=text_col, id_col=id_col).withColumn(
        "split", split_label("id")
    )
    per_shingle = sh.groupBy("shingle").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias("in_train"),
        # collect_list drops the NULLs the non-test rows produce
        F.collect_list(F.when(F.col("split") == "test", F.col("id"))).alias("test_ids"),
    )
    exploded = per_shingle.select(
        F.explode("test_ids").alias("id"), "in_train"
    )
    return exploded.groupBy("id").agg(
        F.count("*").alias("n_shingles"),
        F.sum("in_train").alias("n_contaminated"),
    )


def temperature_mix_rates(
    df: DataFrame,
    source_col: str = "source",
    quant: int = 1_000_000,
) -> DataFrame:
    """Per-source keep rates for temperature-based mixture rebalancing at
    alpha = 1/2 (the multilingual-C4 / XLM-R recipe: sampling probability
    proportional to share^alpha flattens the source distribution without
    discarding small sources).

    Realized as subsampling with maximum retention: rate_s =
    sqrt(c_min / c_s), so the SMALLEST source keeps everything and a source
    x-times larger keeps 1/sqrt(x) of its docs. alpha is pinned to 1/2
    because sqrt is IEEE correctly-rounded (bit-identical across engines);
    a general pow() would not be. Rates floor-quantize to integer
    parts-per-``quant``.

    One aggregation over source (the source dimension is bounded — a
    broadcastable table at any corpus size). Output: (source, n_docs,
    rate_q)."""
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs")
    )
    cmin = counts.select(F.min("n_docs").alias("_cmin"))
    rate = F.floor(
        F.sqrt(F.col("_cmin").cast("double") / F.col("n_docs").cast("double"))
        * F.lit(float(quant))
    ).cast("bigint")
    return counts.crossJoin(F.broadcast(cmin)).select(
        "source", "n_docs", rate.alias("rate_q")
    )


def _mix_draw(id_col: str, seed: str, quant: int) -> Column:
    """The seeded deterministic keep draw shared by the sample/filter
    forms: first 8 md5 hex chars of "seed|id" as an integer, mod quant."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % quant
    )


def temperature_mix_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "temp",
    quant: int = 1_000_000,
) -> DataFrame:
    """Apply ``temperature_mix_rates`` with a seeded deterministic hash
    draw: doc keeps iff md5-draw mod quant < its source's rate_q. The rate
    table broadcasts (bounded by the source dimension); the draw is pure
    map-side — reproducible across runs, engines, partitionings, and
    cluster sizes, and a late-arriving doc gets the same verdict forever.
    Output: kept rows (id, source, rate_q)."""
    rates = temperature_mix_rates(df, source_col=source_col, quant=quant)
    # NULL-SAFE join on the source key: the rates table computes a rate
    # for the NULL-source group (groupBy keeps it), so an equi-join that
    # silently discarded every NULL-source doc regardless of its draw
    # contradicted the keep contract (round-7 review fix)
    r = rates.select(F.col("source").alias("_rsrc"), "rate_q")
    return (
        df.select(F.col(id_col).alias("id"), F.col(source_col).alias("source"))
        .join(F.broadcast(r), F.col("source").eqNullSafe(F.col("_rsrc")))
        .withColumn("_draw", _mix_draw("id", seed, quant))
        .filter(F.col("_draw") < F.col("rate_q"))
        .select("id", "source", "rate_q")
    )


def temperature_mix_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "temp",
    quant: int = 1_000_000,
) -> DataFrame:
    """The FILTER form of ``temperature_mix_sample``: the identical keep
    decision (same rates, same seeded draw — pinned equal in
    tests/test_pipeline_ops.py) applied directly to ``df``, all original
    columns riding through. For compositions that keep the surviving rows
    themselves, this is the right shape: the only join is the broadcast
    rate table on the source key — never the kept-id frame semi-joined
    back to its own corpus-sized input (which shuffles the corpus twice
    once it outgrows the broadcast threshold)."""
    rates = temperature_mix_rates(df, source_col=source_col, quant=quant)
    # internal alias: the input frame may legitimately carry a rate_q
    # column (e.g. a prior mix pass's output) — joining the broadcast
    # table under the public name would make the filter's reference
    # ambiguous. Any FIXED internal name has the same latent collision
    # (a caller could have materialized it), so suffix until absent.
    rq = "_mix_rate_q"
    while rq in df.columns:
        rq += "_"
    rsrc = "_mix_src"
    while rsrc in df.columns:
        rsrc += "_"
    r = rates.select(
        F.col("source").alias(rsrc), F.col("rate_q").alias(rq)
    )
    # null-safe on the source key — see temperature_mix_sample
    return (
        df.join(F.broadcast(r), F.col(source_col).eqNullSafe(F.col(rsrc)))
        .filter(_mix_draw(id_col, seed, quant) < F.col(rq))
        .select(*df.columns)
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int = 0,
    shard_hex_chars: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch global training order WITHOUT a global sort.

    Each doc hashes to a shard (16^k shards from the first ``k`` md5 hex
    chars of the EPOCH-SEEDED hash) and gets a dense rank within its shard
    by the remaining hash order; the training reader walks shards in name
    order — equivalent in expectation to a uniform shuffle, but the only
    physical operation is a window per shard, every one of which is an
    independent partition (size k so 16^k exceeds cluster parallelism; k=3
    is 4096 shards). Changing ``epoch`` reshuffles everything — both shard
    membership and intra-shard order — with zero state carried between
    epochs. Output: (shard, ord, id)."""
    h = F.md5(F.concat(F.lit(f"epoch{epoch}|"), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col).alias("id"),
        F.substring(h, 1, shard_hex_chars).alias("shard"),
        F.substring(h, shard_hex_chars + 1, 32 - shard_hex_chars).alias("_o"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_o"), F.col("id"))
    return base.select(
        "shard", F.row_number().over(w).cast("bigint").alias("ord"), "id"
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    context-window prep stage (long docs become multiple training rows;
    the overlap preserves cross-boundary context).

    Chunk starts step by ``chunk_tokens - overlap``; the final window is
    whatever remains (>= 1 token; a doc shorter than one chunk yields
    exactly one chunk). Pure map-side explode over a per-doc token array —
    no shuffle, no state, embarrassingly parallel; output order is pinned
    by (id, chunk_idx), never by partition layout.

    ``carry_cols`` ride the explode map-side (every chunk repeats its
    doc's metadata) — callers that need (split, lang, source, ...) on
    each chunk get them for free instead of paying an id join back
    against the document table afterward.

    Output: (id, chunk_idx, chunk_text, n_tokens[, *carry_cols]).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    carry = list(carry_cols or [])
    step = chunk_tokens - overlap
    nt = normalize_text(F.col(text_col))
    # empty/whitespace-only text splits to [''], a phantom 1-token array:
    # gate on the normalized TEXT, not the array size
    base = (
        df.select(F.col(id_col).alias("id"), nt.alias("_nt"), *carry)
        .filter(F.col("_nt") != "")
        .select("id", tokens(F.col("_nt")).alias("_tk"), *carry)
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("_tk") - F.lit(overlap)).cast("double") / F.lit(step)).cast(
            "int"
        ),
    )
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunk = F.explode(idx).alias("chunk_idx")
    piece = F.slice(F.col("_tk"), F.col("chunk_idx") * step + 1, chunk_tokens)
    return (
        base.select("id", "_tk", chunk, *carry)
        .select(
            "id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("bigint").alias("n_tokens"),
            *carry,
        )
    )


def dsir_importance(
    df: DataFrame,
    target_col: str,
    n_buckets: int = 4096,
    quant: int = 1_000_000,
    mode: str = "linear_q",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style data selection with importance resampling (Xie et al.,
    NeurIPS'23): score every document by how much more likely its hashed
    unigram features are under the TARGET distribution (rows where
    boolean ``target_col`` is true — e.g. a trusted reference domain)
    than under the RAW corpus distribution. High scores = "looks like the
    target domain"; sampling proportional to the weights shifts the
    pretraining mixture toward the target without hand-written rules.

    Features are hashed unigrams (``md5('dsir|'||word) % n_buckets``),
    Laplace-smoothed: p(b) = (c_b + 1) / (N + n_buckets).

    ``mode``:
    - ``"linear_q"`` (hash-checkable): per-bucket weight ratio_q(b) =
      floor(quant * (num/den)) with num = (ct_b+1)*(N_r+B) and den =
      (cr_b+1)*(N_t+B), where num/den is ONE double division (quant *
      num as a bigint product would overflow 2^63 at corpus scale, so
      the quotient route is deliberate). Cross-engine stability comes
      from the oracle evaluating the IDENTICAL double expression in the
      identical order — not from integer exactness; the products must
      stay under 2^53 (the double mantissa) for the floor to be exact,
      and a quotient landing within one ulp of an integer can floor one
      below the infinite-precision value ON BOTH engines equally. The
      doc score is then an order-independent INTEGER sum of
      c_b * (ratio_q(b) - quant) — positive when the doc's buckets are
      target-enriched.
    - ``"log"`` (the paper's form): score = sum c_b * (ln p_t(b) - ln
      p_r(b)). Natural log is not bit-reproducible across engines, so
      this form is rows-only for the driver and pinned against a python
      float twin in pytest.

    Scale shape: the token stream maps to (id, bucket) and reduces with
    ONE partial-agg groupBy; both distributions are <= n_buckets rows
    (broadcast); the per-doc score is one more integer-sum groupBy. No
    window, no join bigger than a broadcast.

    Output: (id, n_toks, score_q) for linear_q / (id, n_toks, score) for
    log.
    """
    if mode not in ("linear_q", "log"):
        raise ValueError(f"unknown mode {mode!r}")
    B = n_buckets
    tok = df.select(
        F.col(id_col).alias("id"),
        F.col(target_col).alias("is_target"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"),
    ).filter(F.col("word") != "")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dsir|"), F.col("word"))), 1, 12), 16, 10
        ).cast("bigint")
        % B
    )
    counts = tok.groupBy("id", bucket.alias("b")).agg(
        F.count("*").alias("c"), F.max("is_target").alias("is_target")
    )
    raw = counts.groupBy("b").agg(F.sum("c").alias("cr"))
    tgt = counts.filter("is_target").groupBy("b").agg(F.sum("c").alias("ct"))
    totals = raw.agg(F.sum("cr").cast("bigint").alias("n_r")).crossJoin(
        tgt.agg(F.sum("ct").cast("bigint").alias("n_t"))
    )
    # fail LOUDLY when either distribution is empty: sum() over zero rows
    # is NULL, which would otherwise propagate through every ratio and
    # return a full-size, silently useless all-NULL score column (e.g. a
    # target_col predicate that matches nothing)
    def _nonempty(col: str, what: str):
        return F.when(F.col(col) > 0, F.col(col)).otherwise(
            F.raise_error(
                F.lit(
                    f"dsir_importance: {what} is empty — importance "
                    "weights are undefined"
                )
            )
        )

    totals = totals.select(
        _nonempty("n_r", "the corpus token stream").alias("n_r"),
        _nonempty("n_t", "the target distribution (no target_col rows)").alias("n_t"),
    )
    w = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            "cr",
            "n_t",
            "n_r",
        )
    )
    if mode == "linear_q":
        num = ((F.col("ct") + 1) * (F.col("n_r") + B)).cast("double")
        den = ((F.col("cr") + 1) * (F.col("n_t") + B)).cast("double")
        w = w.select("b", F.floor(F.lit(quant) * (num / den)).alias("ratio_q"))
        scored = (
            counts.join(F.broadcast(w), "b")
            .groupBy("id")
            .agg(
                F.sum("c").cast("bigint").alias("n_toks"),
                F.sum(F.col("c") * (F.col("ratio_q") - quant)).cast("bigint").alias("score_q"),
            )
        )
    else:
        lw = (
            F.log((F.col("ct") + 1).cast("double") / (F.col("n_t") + F.lit(B)))
            - F.log((F.col("cr") + 1).cast("double") / (F.col("n_r") + F.lit(B)))
        )
        w = w.select("b", lw.alias("lw"))
        scored = (
            counts.join(F.broadcast(w), "b")
            .groupBy("id")
            .agg(
                F.sum("c").cast("bigint").alias("n_toks"),
                F.round(F.sum(F.col("c") * F.col("lw")), 6).alias("score"),
            )
        )
    return scored


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot diff for continuous training-data refresh: per
    document id, whether it was added, removed, changed (same id,
    different content fingerprint), or unchanged between two corpus
    versions — the incremental-ingestion report that decides which
    downstream artifacts (dedup indexes, embedding shards, tokenized
    packs) must be rebuilt.

    Physical shape: one md5 fingerprint projection per side (map-side),
    one full-outer sort-merge join on the id — both sides partition on
    the same key, no broadcast of anything corpus-sized, no skew risk
    (ids are unique per side).

    Output: (id, status) for every id present in either snapshot.
    """
    from .text import fingerprint

    o = old.select(
        F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("_fp_old")
    )
    n = new.select(
        F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("_fp_new")
    )
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "id", "full_outer").select("id", status.alias("status"))


def token_budget_prefix_sample(
    docs: DataFrame,
    f_num: int = 2,
    f_den: int = 5,
    bucket_hex_chars: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Mixture construction under a per-source token budget: admit each
    source's documents in deterministic md5 order until the source has
    spent ``f_num/f_den`` of its own token mass — the greedy-prefix rule
    every fixed-token-budget training mix uses (the kept set is a hash
    prefix, so growing the budget only ever ADDS documents: subset
    stability across budget revisions).

    Logical spec: keep doc iff its running token sum over (md5(id), id)
    order within the source is <= budget. Physically the per-source
    global sort that spec names is NEVER run — the same two-pass shape
    as sketch.grouped_exact_quantiles, with token mass as the weight,
    and EXACTLY TWO corpus scans (verified against the AQE final plan;
    the pure-DataFrame form of this DAG re-derived the histogram subtree
    once per consumer — 9 scans, no ReusedExchange):

    1. hash-bucket histogram: 16^k buckets from the md5 prefix (the
       epoch_shuffle shard argument: uniform by construction), per
       (source, bucket) token sums partial-agg map-side. The aggregated
       bucket table — bounded at 16^k rows per source by CONSTRUCTION —
       is collected eagerly (the grouped_exact_quantiles precedent: a
       bounded driver action at compose time) and the cumulative
       admission is replayed over it in plain Python: buckets wholly
       under budget are admitted by their aggregates alone, and the ONE
       crossing bucket per source is noted with its remaining budget.
    2. refine: only crossing-bucket docs (a broadcast literal frame of
       <= 1 row per source) get a per-doc running sum — a window over
       ~n/16^k rows per source, not n.

    Output: (source, total_docs, total_tokens, budget_tokens,
    n_docs_kept, tokens_kept).
    """
    from collections import defaultdict

    from .text import normalize_text, token_count

    spark = docs.sparkSession
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("id"),
        token_count(normalize_text(F.col(text_col))).alias("n_tokens"),
        _md5_of_id(id_col).alias("_h"),
    ).withColumn("_b", F.substring(F.col("_h"), 1, bucket_hex_chars))
    bucket_rows = (
        base.groupBy("source", "_b")
        .agg(F.sum("n_tokens").alias("btok"), F.count("*").alias("bdocs"))
        .collect()
    )

    per: dict = defaultdict(list)
    for r in bucket_rows:
        per[r.source].append((r._b, int(r.btok), int(r.bdocs)))
    summary, crossing = [], []
    for src, lst in per.items():
        lst.sort()
        total_tok = sum(t for _, t, _ in lst)
        total_docs = sum(d for _, _, d in lst)
        # tokens are non-negative, so Python // == truncating div here
        budget = (f_num * total_tok) // f_den
        cum = full_tok = full_docs = 0
        for b, t, d in lst:
            if cum + t <= budget:
                full_tok += t
                full_docs += d
            elif cum <= budget:
                crossing.append((src, b, budget - cum))
            cum += t
        summary.append((src, total_docs, total_tok, budget, full_docs, full_tok))

    summary_df = spark.createDataFrame(
        summary,
        "source string, total_docs long, total_tokens long, "
        "budget_tokens long, full_docs long, full_tok long",
    )
    zero = F.lit(0).cast("bigint")
    if crossing:
        crossing_df = spark.createDataFrame(
            crossing, "source string, _b string, _rem long"
        )
        wd = Window.partitionBy("source").orderBy(F.col("_h"), F.col("id"))
        refined = (
            base.join(F.broadcast(crossing_df), ["source", "_b"])
            .select(
                "source", "n_tokens", "_rem", F.sum("n_tokens").over(wd).alias("_cum")
            )
            .filter(F.col("_cum") <= F.col("_rem"))
            .groupBy("source")
            .agg(F.sum("n_tokens").alias("ref_tok"), F.count("*").alias("ref_docs"))
        )
        out = summary_df.join(refined, "source", "left")
    else:
        out = summary_df.withColumn("ref_tok", zero).withColumn("ref_docs", zero)
    return out.select(
        "source",
        F.col("total_docs").cast("bigint").alias("total_docs"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.col("budget_tokens").cast("bigint").alias("budget_tokens"),
        (F.col("full_docs") + F.coalesce("ref_docs", zero))
        .cast("bigint")
        .alias("n_docs_kept"),
        (F.col("full_tok") + F.coalesce("ref_tok", zero))
        .cast("bigint")
        .alias("tokens_kept"),
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_hex: str = "c",
    val_hex: str = "e",
    components: DataFrame | None = None,
) -> DataFrame:
    """Dataset split that cannot leak through near-duplicates: every member
    of a near-dup cluster draws its split from the CLUSTER representative
    (the component-min id), not its own id, so two near-identical docs can
    never land one-in-train one-in-test — the hole a pure per-id hash
    split (``dataset_split``) leaves open whenever dedup is lossy or runs
    with a similarity threshold above exact. Singletons hash their own id
    (they are their own representative), so on a fully-deduped corpus this
    degrades to ``dataset_split`` exactly.

    Scale shape: the cluster map comes from ``dup_components`` (min-label
    propagation, id-keyed rounds); attaching it is ONE id-keyed shuffle
    join (components cover every node, so an inner join loses nothing),
    and the split label is then a map-side hash of the comp column. The
    component map is corpus-sized — it must NOT be broadcast; AQE picks
    the join strategy.

    Output: df's columns + (comp, split). ``components`` accepts a
    precomputed (id, comp) map so composed pipelines that already ran the
    fixpoint never run it twice.
    """
    from .dedup import dup_components

    comp = (
        components
        if components is not None
        else dup_components(df, pairs, id_col=id_col)
    )
    return df.join(
        comp.withColumnRenamed("id", id_col), id_col
    ).withColumn("split", split_label("comp", train_hex, val_hex))


def unimax_allocation(
    df: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """UniMax mixture allocation (Chung et al. 2023): spread a total token
    budget as uniformly as possible across sources, capping every source
    at ``max_epochs`` passes over its own data — the principled
    alternative to temperature sampling when small sources must not be
    over-epoched into memorization.

    Closed-form waterfilling instead of the paper's iterative loop: with
    sources sorted by cap = max_epochs * n_tokens ascending (ties by
    name), source j saturates iff cap_j * (n - j + 1) <= B - prefix_{j-1}
    — the standard threshold construction; the saturation predicate is
    monotone along the sorted order, so the saturated set is the prefix
    {1..m}. Saturated sources take their full cap; the rest split the
    remainder by integer division, with the LAST ``rem`` of them (sorted
    order — the largest caps) taking one extra token so the allocations
    sum EXACTLY to min(B, sum caps) and stay monotone in cap order.
    Integer arithmetic throughout except the share division (floor of an
    IEEE double both engines compute identically at token magnitudes far
    below 2^53) — the DuckDB oracle hashes bit-identically.

    Physical shape: one corpus scan for per-source token sums (partial
    agg, the only corpus-sized exchange), then window functions over the
    SOURCE DIMENSION — a deliberate single-partition sort of ~#sources
    rows (bounded by the dimension, never by the corpus; same contract as
    the broadcast rate tables). Epochs are reported in exact millis
    (alloc * 1000 div size).

    Output: (source, n_tokens, cap_tokens, alloc_tokens, epochs_milli),
    one row per source.
    """
    from pyspark.sql import Window

    from .text import token_count

    sizes = (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(F.sum(token_count(F.col(text_col))).cast("bigint").alias("n_tokens"))
        .select(
            "source",
            "n_tokens",
            (F.lit(max_epochs) * F.col("n_tokens")).cast("bigint").alias("cap_tokens"),
        )
    )
    w = Window.orderBy("cap_tokens", "source")
    ranked = sizes.select(
        "*",
        F.row_number().over(w).alias("_j"),
        F.count("*").over(Window.partitionBy()).alias("_n"),
        (F.sum("cap_tokens").over(w) - F.col("cap_tokens")).alias("_prefix"),
    )
    b = F.lit(int(budget_tokens)).cast("bigint")
    sat = F.col("cap_tokens") * (F.col("_n") - F.col("_j") + 1) <= (b - F.col("_prefix"))
    marked = ranked.select("*", sat.alias("_sat"))
    # m = size of the saturated prefix; spent = tokens the prefix consumes
    agg = Window.partitionBy()
    marked = marked.select(
        "*",
        F.sum(F.col("_sat").cast("int")).over(agg).alias("_m"),
        F.sum(F.when(F.col("_sat"), F.col("cap_tokens")).otherwise(F.lit(0)))
        .over(agg)
        .alias("_spent"),
    )
    rem_total = b - F.col("_spent")
    # all-saturated (B >= sum caps) leaves n_unsat = 0: greatest(.., 1)
    # keeps the division defined (the unsaturated branch is then dead)
    n_unsat = F.greatest(F.col("_n") - F.col("_m"), F.lit(1).cast("bigint"))
    # integer division + remainder spread: the LAST `rem` unsaturated
    # sources in sorted order take share+1 so the total lands exactly and
    # allocations stay monotone in cap order (share >= cap_m holds by the
    # saturation inequality, so the saturated prefix never overtakes)
    share = F.floor(rem_total / n_unsat).cast("bigint")
    rem = rem_total - share * n_unsat
    alloc = F.when(F.col("_sat"), F.col("cap_tokens")).otherwise(
        share + F.when(F.col("_n") - F.col("_j") < rem, F.lit(1)).otherwise(F.lit(0))
    )
    return marked.select(
        "source",
        "n_tokens",
        "cap_tokens",
        alloc.cast("bigint").alias("alloc_tokens"),
        F.floor(alloc * F.lit(1000) / F.col("n_tokens")).cast("bigint").alias("epochs_milli"),
    )
