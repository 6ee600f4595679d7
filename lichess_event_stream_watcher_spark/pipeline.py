"""The end-to-end corpus curation pipeline: the DAG a training-data team
actually runs, chaining this repo's operators in their production order.

    load -> exact dedup -> near-dup removal (Jaccard + connected
    components) -> quality gate (repetition + lexicon + language) ->
    PII scrub -> temperature mixture rebalancing -> split assignment ->
    context-window chunking -> partitioned parquet write

Stage ordering rationale (each stage shrinks the data the next one pays
for): exact dedup first because it is the cheapest reduction (one
fingerprint shuffle); near-dup second because pair search cost is
quadratic-ish in corpus size, so it must run AFTER the exact shrink but
BEFORE the per-doc scoring passes; quality/PII are map-side so their
order barely matters (gate first so scrubbing skips dropped docs);
sampling and splitting are pure hash decisions on ids; chunking explodes
rows so it goes last before the write.

Every stage is one of the repo's oracle-checked operators — the pipeline
adds composition and accounting, not new semantics. Determinism:
re-running the whole pipeline on the same input produces byte-identical
decisions (all sampling/splitting is seeded md5; dedup canonicals are
min-id).

Scale: stages communicate ONLY through DataFrames (no driver
materialization except the bounded stage-count summary); the text column
is scanned once per text-touching stage and id-only frames flow through
the dedup graph machinery.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import curation as C
from .operators import dedup as D
from .operators import pii as P
from .operators import text as X
from .operators.layout import write_partitioned


def curate_corpus(
    docs: DataFrame,
    out_dir: str | None = None,
    jaccard_threshold: float = 0.5,
    chunk_tokens: int = 64,
    chunk_overlap: int = 8,
    mix_source_col: str = "lang",
    near_dup_keep: str = "min_id",
    stage_seconds: dict[str, float] | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full curation DAG over a ``documents``-shaped frame
    (doc_id, text, lang, source, n_chars).

    Returns (chunks DataFrame, per-stage surviving-count summary). When
    ``out_dir`` is set, the chunks are also written as parquet partitioned
    by split (train/val/test directories prune at the file-index level
    for downstream readers).

    Materialization discipline: each stage's survivor frame is persisted
    (memory-and-disk) before its count so the stage-count actions and the
    final write never re-execute the upstream DAG (the near-dup pair
    search is quadratic-ish — re-running it per action would dominate),
    and each persisted stage unpersists once its successor has
    materialized, so at most two stages hold storage at a time. The id
    frames joined back semi-style are O(surviving docs) — unbounded — so
    they carry NO broadcast hint: AQE picks broadcast when a stage's
    survivor set is actually small and falls back to a shuffled join when
    it is not (a forced broadcast of a corpus-sized id set is a driver
    OOM at real scale). The returned chunks frame stays persisted — the
    caller owns its lifetime.
    """
    # Stage attribution (bench only): each persist+count materializes its
    # stage, so wall time between consecutive counts IS that stage's cost.
    _t = time.perf_counter()

    def _stamp(stage: str) -> None:
        nonlocal _t
        if stage_seconds is not None:
            now = time.perf_counter()
            # UNROUNDED: the bench publisher rounds at publish time with
            # the last phase derived by difference, so the published
            # phases sum exactly to the published total (rounding each
            # independently here would drift by a few ms)
            stage_seconds[stage] = now - _t
            _t = now

    counts: dict[str, int] = {"input": docs.count()}
    _stamp("input")

    # 1. exact dedup: keep the min-id doc per content fingerprint
    keep_exact = D.exact_dedup_groups(docs).select(F.col("keep_id").alias("doc_id"))
    docs1 = docs.join(keep_exact, "doc_id", "left_semi").persist()
    counts["exact_dedup"] = docs1.count()
    _stamp("exact_dedup")

    # 2. near-dup removal: Jaccard pairs -> connected components -> one
    #    representative per cluster. ``near_dup_keep`` picks WHICH member:
    #    "min_id" (the determinism default — id == comp reads straight off
    #    the component map) or "best" (quality-argmax via dedup_keep_best,
    #    reusing the SAME component map so the fixpoint never runs twice —
    #    what modern pipelines keep; FineWeb-style)
    pairs = D.jaccard_pairs(docs1, n=2, threshold=jaccard_threshold)
    comp = D.dup_components_star(docs1, pairs)
    if near_dup_keep == "best":
        canon = D.dedup_keep_best(
            docs1, pairs, X.quality_score_q(F.col("text")), components=comp
        ).select(F.col("keep_id").alias("doc_id"))
    elif near_dup_keep == "min_id":
        canon = comp.filter(F.col("id") == F.col("comp")).select(
            F.col("id").alias("doc_id")
        )
    else:
        raise ValueError(f"unknown near_dup_keep: {near_dup_keep!r}")
    docs2 = docs1.join(canon, "doc_id", "left_semi").persist()
    counts["near_dedup"] = docs2.count()
    _stamp("near_dedup")
    docs1.unpersist()

    # 3. quality gate: repetition + lexicon + language signals, every doc
    #    verdicted; keep only keep=true. Round 11 (guide §1.2): the three
    #    standalone signal operators tokenized the survivor corpus THREE
    #    times and paid repetition's doc-keyed double shuffle, coverage's
    #    id shuffle and two id-keyed joins back — quality_gate_filter
    #    fuses them into two scans (lexicon frequency + one Arrow verdict
    #    pass) with zero shuffles and zero joins, and its docstring
    #    carries the signal-by-signal proof that the kept set is
    #    identical. The standalone operators keep their own oracled
    #    queries (curation_gate et al.) untouched.
    gated = X.quality_gate_filter(docs2).persist()
    counts["quality_gate"] = gated.count()
    _stamp("quality_gate")
    docs2.unpersist()

    # 4. PII scrub — redact() applied as a column in place (the scrub()
    #    REPORT frame exists for pipelines that route on the hit counts;
    #    this one discards them, so joining the report back to its own
    #    input would be a second corpus-sized self-join for nothing)
    scrubbed = gated.withColumn("text", P.redact(F.col("text")))

    # 5. temperature (alpha=1/2) mixture rebalancing over the language dim
    #    — the filter form: the keep decision is a broadcast-rate lookup
    #    plus a map-side hash draw, so it applies directly to scrubbed
    #    (semi-joining the kept-id frame back would re-shuffle the corpus)
    sampled = C.temperature_mix_filter(scrubbed, source_col=mix_source_col).persist()
    counts["mix_sample"] = sampled.count()
    _stamp("mix_sample")
    gated.unpersist()

    # 6. split assignment (pure function of the id)
    split = C.dataset_split(sampled)

    # 7. context-window chunking (explodes rows; goes last) — split/lang/
    #    source ride the explode map-side, no id join back
    chunks = C.chunk_documents(
        split,
        chunk_tokens=chunk_tokens,
        overlap=chunk_overlap,
        carry_cols=["split", "lang", "source"],
    ).persist()
    counts["chunks"] = chunks.count()
    _stamp("chunks")
    sampled.unpersist()

    if out_dir is not None:
        write_partitioned(chunks, out_dir, ["split"], sort_cols=["id", "chunk_idx"])
    return chunks, counts
