"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (round 5+): the FINAL stdout line is ONE compact JSON
summary — {"metric": ..., "value": total_sec, "unit": "sec", "n_queries":
N, "engine_events_per_sec": ..., "streaming_engine_events_per_sec": ...,
"sf": ...} — sized to survive a bounded stdout-tail capture. The full
per-query timing dict (plus the curation pipeline's per-stage breakdown)
is written to BENCH_DETAIL.json at the repo root.

Each query is evaluated through a noop-sink write (full-column evaluation;
see SCALE.md "Benchmark honesty").
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lichess_event_stream_watcher_spark import queries as q  # noqa: E402
from lichess_event_stream_watcher_spark import testdata  # noqa: E402
from lichess_event_stream_watcher_spark.session import get_spark  # noqa: E402

# The headline set: the rule-engine hot path + representative heavy operators.
HEADLINE = [
    "rule_scan",
    "rule_scan_actions",
    "would_fire_counts",
    "crit_code_predicate",
    "geoip_enrich",
    "device_enrich",
    "match_stats",
    "last3_caught",
    "seen_window_counts",
    "tpch_q1_pricing",
    "tpch_q3_revenue",
    "tpch_q5_region_revenue",
    "sessionize",
    "asof_join_orders",
    "text_profile",
    "dedup_jaccard_pairs",
    "dedup_jaccard_inverted",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "knn_cosine_topk",
    "embedding_near_dup",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "repetition_profile",
    "pii_scrub",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q17_small_qty_loss",
    "tpch_q21_waiting_suppliers",
    "windowed_event_rollup",
    "session_window_rollup",
    "dedup_incremental",
    "lexicon_coverage",
    "curation_gate",
    "username_fuzzy_pairs",
    "dedup_containment",
    "paragraph_dedup",
    "fuzzy_graph_triangles",
    "value_outliers_3sigma",
    "purchase_state_attribution",
    "semantic_dedup",
    "semantic_dedup_auto",
    "charlm_quality",
    "embedding_quantize_int8",
    "temperature_mix_sample",
    "epoch_shuffle",
    "bloom_admission",
    "event_rate_anomaly",
    "tf_cosine_pairs",
    "kmv_distinct_sketch",
    "chunk_documents",
    "embedding_feature_stats",
    "embedding_robust_stats",
    "interval_join_attribution",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_kmeans_cells_q",
    "bpe_merge_ranks",
    "bm25_rsj_topk",
    "dsir_importance_q",
    "dup_span_profile",
    "substring_dedup",
    "hll_distinct_sketch",
    "cms_heavy_hitters",
    "hard_negative_mining",
    "boilerplate_ngrams",
    "embedding_random_projection",
    "corpus_token_accounting",
    "corpus_snapshot_diff",
    "zorder_key_events",
    "bpe_encode_pieces",
    "ingestion_admission_counts",
    "bpe_source_token_counts",
    "hybrid_retrieval_rrf",
    "ccnet_quality_buckets",
    "regex_token_counts",
    "ngram_novelty_profile",
    "label_centroid_dispersion",
    "label_centroid_confusion",
    "token_budget_sample",
    "source_overlap_matrix",
    "winnowing_dup_pairs",
    "retrieval_eval",
    "quality_lr_source_scores",
    "zipf_octave_profile",
    "distinctive_terms_by_source",
    "embedding_pca_projection_q",
    "robust_length_outliers",
    "weighted_priority_sample",
    "histogram_drift_tv",
    "source_label_gini",
    "collocation_lift_topk",
    "ols_trend_by_type",
    "cusum_hourly_changepoint",
    "funnel_conversion",
    "event_transition_matrix",
    "hourly_corr_pairs",
    "source_lang_cramers_v",
    "benford_first_digit",
    "join_key_profile",
    "k_anonymity_audit",
    "gopher_rule_failures",
    "c4_line_stats",
    "unimax_allocation",
    "ann_recall_eval",
    "dedup_lsh_band_sweep",
    "dedup_threshold_sensitivity",
    "dedup_cost_census",
    "ann_cost_census",
    "dedup_minhash_calibration",
    "ann_pq_distortion",
    # round-8 registrations: the REAL image decode path (PPM parse,
    # channel sums, NN resample through Arrow-batched mapInPandas) and
    # the hash-comparable sketch error-bound successor to sketch_stats
    "image_stats",
    "resize_image",
    "sketch_error_bounds",
]
# Forced-distributed sweep (round 11, VERDICT r10 task #2): the entries
# whose sf0.1 computation is served by a small-corpus driver tier (or whose
# dense gate's front-end is a single driver collect) are re-timed with
# lesw.smallCorpusCacheBytes=0 so the DISTRIBUTED shapes — the only shapes
# that exist at 100 TB — stay regression-visible in the bench artifact.
# Published as "<name>_dist" under "queries_dist" in BENCH_DETAIL*.json,
# additions-only: the headline "queries"/"value" numbers are untouched, so
# totals stay comparable round over round.
DIST_SWEEP = [
    "dedup_jaccard_pairs",
    "dedup_containment",
    "dedup_incremental",
    "ingestion_admission_counts",
    "dedup_minhash_lsh",
    "dedup_minhash_calibration",
    "dedup_lsh_band_sweep",
    "dedup_threshold_sensitivity",
    "dedup_cost_census",
    "tf_cosine_pairs",
    "username_fuzzy_pairs",
    "robust_length_outliers",
]
# curation_pipeline_counts (the composed end-to-end DAG) is benched once,
# not min-of-3: one full run is itself several pipeline stages of work and
# the stage operators are all min-of-3'd individually above.
# NOTE: dedup_clusters_star / cross_source_dups / dup_graph_pagerank /
# leakage_safe_split_counts / dedup_keep_best_clusters are benched through
# dedup_pipeline_shared below (pairs computed ONCE, five consumers; the
# round-6 pair additionally reuses the shared component map), not as
# standalone headline entries — standalone, each would re-run the full
# pair search (~6x the same work at sf0.1), which no real pipeline does.


def bench_dedup_pipeline_shared(
    spark, sf_dir: str, phase_seconds: dict[str, float] | None = None
) -> float:
    """The realistic consumption shape for the near-dup pair search: pairs
    are computed ONCE and materialized as a WRITTEN parquet table (what
    production does — a localCheckpoint would hold executor-local blocks
    that die with their executor on a real cluster), then FIVE consumers
    read the table — duplicate clustering (large/small-star CC),
    cross-source provenance, pair-graph PageRank, the leakage-safe split
    rollup, and quality-argmax keep selection (the last two reusing the
    shared component map). The timing includes the write + re-read
    round-trip the pipeline actually pays.

    ``phase_seconds`` (bench detail only) receives this draw's per-phase
    split — pair write vs each consumer — so a total-time swing is
    attributable to one phase instead of re-profiling the whole
    composition. The caller keeps the split of whichever draw it reports
    (phases must sum to the published total; per-phase minima across
    draws would not)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lichess_event_stream_watcher_spark import testdata
    from lichess_event_stream_watcher_spark.operators import dedup as D
    from lichess_event_stream_watcher_spark.operators.graph import pagerank

    docs = testdata.load(spark, sf_dir, "documents")
    pair_dir = os.path.join(tempfile.gettempdir(), "bench_pair_table")
    shutil.rmtree(pair_dir, ignore_errors=True)
    t0 = time.perf_counter()
    last = t0

    def _stamp(phase: str) -> None:
        nonlocal last
        now = time.perf_counter()
        if phase_seconds is not None:
            # unrounded; rounded at publish via _publish_phases so the
            # published phases sum exactly to the published total
            phase_seconds[phase] = now - last
        last = now

    D.jaccard_pairs(docs, n=2, threshold=0.5).write.parquet(pair_dir)
    pairs = spark.read.parquet(pair_dir)
    _stamp("pair_write")
    comp = D.dup_components_star(docs, pairs)
    comp.count()
    _stamp("components")
    src = docs.select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("source_a"))
    b = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("source_b"))
    (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("source_a") != F.col("source_b"))
        .count()
    )
    _stamp("provenance")
    pagerank(docs.select(F.col("doc_id").alias("id")), pairs, iters=10).count()
    _stamp("pagerank")
    # round-6 consumers: leakage-safe split + quality-argmax keep — both
    # REUSE the shared component map (the components= parameter), so their
    # marginal cost here is what a real pipeline pays: one id-keyed join
    # + rollup each, never a second pair search or fixpoint
    from lichess_event_stream_watcher_spark.operators import curation as C
    from lichess_event_stream_watcher_spark.operators import text as X

    C.leakage_safe_split(docs, pairs, components=comp).groupBy(
        "split", "source"
    ).count().count()
    _stamp("leakage_split")
    D.dedup_keep_best(
        docs, pairs, X.quality_score_q(F.col("text")), components=comp
    ).filter(F.col("n_members") >= 2).count()
    _stamp("keep_best")
    dt = time.perf_counter() - t0
    shutil.rmtree(pair_dir, ignore_errors=True)
    return dt


def _prev_committed_detail(repo_dir: str) -> dict:
    """The COMMITTED baseline for the boot calibration: HEAD's
    BENCH_DETAIL.json via git, so the published ratio really is
    run-vs-last-committed-artifact. Reading the working-tree file would
    silently rebase onto a previous run from the SAME session (two runs
    per round is normal practice), publishing ~1.0 while the committed
    diff moved 30%. Falls back to the working-tree file only when git is
    unavailable; any malformed content yields {} (ratio None), never an
    exception after a multi-minute bench run."""
    import subprocess

    try:
        blob = subprocess.run(
            ["git", "-C", repo_dir, "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout
    except Exception:
        try:
            with open(os.path.join(repo_dir, "BENCH_DETAIL.json")) as f:
                blob = f.read()
        except OSError:
            return {}
    try:
        prev = json.loads(blob)
        return prev if isinstance(prev, dict) else {}
    except (ValueError, AttributeError):
        return {}


def _eps_ratio(current: float, prev_detail: dict, key: str) -> float | None:
    """current/previous for a single published events-per-sec metric —
    the per-metric calibration the two throughput numbers lacked until
    round 7 (they sat outside the query-median calibration, so a -29%
    read was indistinguishable from boot contention)."""
    prev = prev_detail.get(key)
    if not isinstance(prev, (int, float)) or isinstance(prev, bool) or prev <= 0:
        return None
    return round(current / prev, 3)


def _median_ratio_vs_prev(
    timings: dict[str, float],
    prev: dict[str, float],
    floor: float = 0.2,
    min_n: int = 10,
) -> float | None:
    """Median per-query time ratio vs the previously committed detail —
    the boot-contention calibration published alongside the totals.
    Entries under ``floor`` seconds on EITHER side are skipped (they
    measure fixed overhead, not the query), non-numeric/missing prior
    entries are skipped, and fewer than ``min_n`` comparable entries
    yields None (a median over a handful of queries reads as signal but
    is noise)."""
    ratios = [
        timings[k] / prev[k]
        for k in timings
        if isinstance(prev.get(k), (int, float))
        and not isinstance(prev.get(k), bool)
        and prev[k] >= floor
        and timings[k] >= floor
    ]
    if len(ratios) < min_n:
        return None
    return round(statistics.median(ratios), 3)


def _position_debt_suspects(
    timings: dict[str, float],
    prev: dict[str, float],
    median_ratio: float | None,
    eligible: set[str],
    floor: float = 0.2,
    entry_threshold: float = 2.0,
    flat_median: float = 1.3,
) -> list[str]:
    """Entries whose ratio-vs-committed exceeds ``entry_threshold`` while
    the boot median is FLAT (round-9 fix, VERDICT r8 task #2): a uniform
    boot slowdown moves the median with the entries, so a lone >2x mover
    against a flat median is position debt (GC/shuffle-file/codegen churn
    landing inside one late measurement) until an isolation re-measure
    says otherwise. Only ``eligible`` names (the generic registry-loop
    measurements — custom-harness metrics re-measure differently) with
    >= ``floor`` seconds on both sides qualify; an uncalibrated run
    (median None) flags nothing."""
    if median_ratio is None or median_ratio > flat_median:
        return []
    return sorted(
        k
        for k, cur in timings.items()
        if k in eligible
        and isinstance(prev.get(k), (int, float))
        and not isinstance(prev.get(k), bool)
        and prev[k] >= floor
        and cur >= floor
        and cur / prev[k] > entry_threshold
    )


def _run_isolated(names: list[str], sf_dir: str) -> dict[str, float] | None:
    """Re-measure ``names`` in a FRESH JVM (min-of-3 noop writes each) via
    a subprocess running this file with --isolated. Returns None on any
    subprocess failure — the caller then publishes the in-run numbers,
    flagged as unconfirmed."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--isolated", ",".join(names)],
            capture_output=True,
            text=True,
            timeout=1800,
            env=env,
        )
    except (subprocess.TimeoutExpired, OSError):
        return None
    if r.returncode != 0:
        return None
    try:
        out = json.loads(r.stdout.strip().splitlines()[-1])
        if not isinstance(out, dict) or not isinstance(out.get("isolated"), dict):
            return None
        # "<name>__phases" entries are dicts (composed-entry phase splits);
        # everything else is a scalar timing
        return {
            k: (v if isinstance(v, dict) else float(v))
            for k, v in out["isolated"].items()
        }
    except (ValueError, KeyError, IndexError, TypeError):
        # a crash here would land AFTER the multi-minute bench run and
        # BEFORE the detail write — any malformed subprocess output must
        # degrade to "publish in-run, flagged unconfirmed"
        return None


def _isolated_gc(spark) -> None:
    """Between-draws hygiene for the isolation subprocess: drain
    query-registered caches and force a synchronous full GC (the
    same discipline as the main run's full_gc closure)."""
    from lichess_event_stream_watcher_spark.operators.session_cache import (
        release_session_caches,
    )

    release_session_caches()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 - best effort
        pass


def run_isolated_mode(names_csv: str) -> None:
    """--isolated entrypoint: fresh-JVM min-of-3 measurement of the named
    registry queries, one JSON line on stdout.

    Round 11 (VERDICT r10 task #8): the two custom-harness eps metrics are
    addressable here too, as the sentinel names ``engine_batch_eps`` /
    ``streaming_eps`` — measured with the SAME protocol as the main run
    (engine: min-of-5 batch passes; streaming: 4 draws, first discarded)
    so an in-run eps drop can be adjudicated against a clean-JVM profile."""
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lesw-bench-isolated")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.all_queries()
    requested = [n for n in names_csv.split(",") if n]
    out: dict[str, float] = {}
    eps_names = [n for n in requested if n in ("engine_batch_eps", "streaming_eps")]
    if eps_names:
        # one untimed warmup pass so the eps draws measure the hot path,
        # not first-touch codegen (mirrors the main run, which measures
        # these metrics ~1 warm query into the session)
        bench_engine_batch(spark, sf_dir)
        n_events = testdata.signups_df(spark, sf_dir).count()
    if "engine_batch_eps" in eps_names:
        draws = [bench_engine_batch(spark, sf_dir) for _ in range(5)]
        out["engine_batch_eps"] = round(n_events / min(draws), 1)
    if "streaming_eps" in eps_names:
        s_draws = []
        for _ in range(4):
            sec_i, s_n = bench_streaming_engine(spark, sf_dir, tempfile.gettempdir())
            s_draws.append(sec_i)
        out["streaming_eps"] = round(s_n / min(s_draws[1:]), 1)
    # Round 11: the two COMPOSED entries (min-of-2 + phase split in the
    # main run) re-measure with the same protocol, emitting the winning
    # draw's raw phase split under "<name>__phases" so the publisher can
    # keep phases summing to whichever total it publishes. Motivated by a
    # measured incident: a host-noise window put dedup_pipeline_shared at
    # 49.9 s in-run (its stable value is 7-10 s) with no recourse because
    # only the registry min-of-3 loop was isolation-eligible.
    if "dedup_pipeline_shared" in requested:
        draws, phases = [], {}
        for _ in range(2):
            dp: dict[str, float] = {}
            draws.append(bench_dedup_pipeline_shared(spark, sf_dir, phase_seconds=dp))
            if draws[-1] == min(draws):
                phases = dp
            _isolated_gc(spark)
        out["dedup_pipeline_shared"] = round(min(draws), 3)
        out["dedup_pipeline_shared__phases"] = {k: round(v, 4) for k, v in phases.items()}
    if "curation_pipeline_counts" in requested:
        from lichess_event_stream_watcher_spark.pipeline import curate_corpus

        draws, stages = [], {}
        for _ in range(2):
            ds: dict[str, float] = {}
            t0 = time.perf_counter()
            chunks, _counts = curate_corpus(
                testdata.load(spark, sf_dir, "documents"), stage_seconds=ds
            )
            chunks.unpersist()
            draws.append(time.perf_counter() - t0)
            if draws[-1] == min(draws):
                stages = ds
            _isolated_gc(spark)
        out["curation_pipeline_counts"] = round(min(draws), 3)
        out["curation_pipeline_counts__phases"] = {
            k: round(v, 4) for k, v in stages.items()
        }
    composed = {"dedup_pipeline_shared", "curation_pipeline_counts"}
    names = [n for n in requested if n in registry and n not in composed]
    for i, name in enumerate(names):
        best = float("inf")
        for draw in range(4 if i == 0 else 3):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i == 0 and draw == 0:
                continue  # the very first draw also pays JVM/codegen warmup
            best = min(best, dt)
        out[name] = round(best, 3)
        from lichess_event_stream_watcher_spark.operators.session_cache import (
            release_session_caches,
        )

        release_session_caches()
        spark.sparkContext._jvm.System.gc()
    print(json.dumps({"isolated": out}), flush=True)


def _publish_phases(phases: dict[str, float], total: float) -> dict[str, float]:
    """Round phase seconds for publication so they SUM EXACTLY to the
    already-published (rounded) total: every phase but the last rounds
    independently; the last is derived as the difference, absorbing both
    the rounding drift and any sub-ms residual between the phase stamps
    and the total's own clock span."""
    if not phases:
        return {}
    names = list(phases)
    out = {n: round(phases[n], 3) for n in names[:-1]}
    out[names[-1]] = round(total - sum(out.values()), 3)
    return out


def _drop_table_and_location(spark, table: str) -> None:
    """DROP TABLE IF EXISTS plus physical location cleanup: each bench run
    starts a fresh in-memory metastore, so a table directory orphaned by a
    killed earlier run is invisible to DROP and would fail saveAsTable with
    LOCATION_ALREADY_EXISTS."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = os.path.join(warehouse, table)
    if os.path.exists(loc):
        shutil.rmtree(loc)


def bench_indexed_probe(spark, sf_dir: str) -> tuple[float, float]:
    """Per-batch cost of ingestion dedup against a PRE-BUILT bucketed
    shingle index (save_shingle_index, built untimed — it amortizes over
    every future batch) vs re-shingling the corpus per batch, BOTH with
    broadcast joins disabled. The pin matters: at sf0.1 AQE broadcasts the
    (tiny) corpus side for either path, hiding exactly the shuffle the
    bucketed index exists to remove; at 100 TB neither side broadcasts and
    the sort-merge shapes timed here ARE the plans that run (indexed: 3
    exchanges, zero corpus-side; re-shingle: 5, corpus shuffled+sorted
    per batch — also pinned in tests/test_plans.py).

    Returns (indexed_sec, reshingle_smj_sec)."""
    from pyspark.sql import functions as F

    from lichess_event_stream_watcher_spark import testdata
    from lichess_event_stream_watcher_spark.operators import dedup as D

    docs = testdata.load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    table = "bench_shingle_index"
    _drop_table_and_location(spark, table)
    D.save_shingle_index(old, table, n=2, buckets=32)
    # conf.get returns None for a key that was never set (the adaptive
    # threshold by default); restore must unset those, not set(None)
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        t0 = time.perf_counter()
        D.jaccard_pairs_against_index(new, table, n=2, threshold=0.5).count()
        dt_indexed = time.perf_counter() - t0
        t0 = time.perf_counter()
        # dense_vocab_limit=0 pins the sparse inverted join (round-10:
        # jaccard_pairs_between grew the same dense-BLAS gate as
        # jaccard_pairs, which the sf0.1 corpus admits — letting it fire
        # here would stop this entry measuring the sort-merge shape the
        # broadcast pin exists to time; the measured computation is
        # byte-identical to every earlier round's)
        D.jaccard_pairs_between(
            new, old, n=2, threshold=0.5, dense_vocab_limit=0
        ).count()
        dt_smj = time.perf_counter() - t0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        _drop_table_and_location(spark, table)
    return dt_indexed, dt_smj


def bench_tf_indexed_probe(spark, sf_dir: str) -> tuple[float, float]:
    """The cosine mirror of ``bench_indexed_probe``: per-batch tf-cosine
    ingestion dedup against a PRE-BUILT bucketed token index
    (save_tf_index, built untimed — it amortizes over every future batch,
    norms denormalized onto the postings) vs re-tokenizing the corpus per
    batch, BOTH with broadcast joins disabled so the sort-merge shapes
    timed here are the plans that run at 100 TB.

    Returns (indexed_sec, retokenize_smj_sec)."""
    from pyspark.sql import functions as F

    from lichess_event_stream_watcher_spark import testdata
    from lichess_event_stream_watcher_spark.operators import text as X

    docs = testdata.load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    table = "bench_tf_index"
    _drop_table_and_location(spark, table)
    X.save_tf_index(old, table, buckets=32)
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        t0 = time.perf_counter()
        X.tf_cosine_pairs_against_index(new, table, threshold=0.8).count()
        dt_indexed = time.perf_counter() - t0
        t0 = time.perf_counter()
        X.tf_cosine_pairs_between(new, old, threshold=0.8).count()
        dt_smj = time.perf_counter() - t0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        _drop_table_and_location(spark, table)
    return dt_indexed, dt_smj


def bench_streaming_engine(spark, sf_dir: str, tmp_root: str) -> tuple[float, int]:
    """End-to-end STREAMING throughput: the signup batch serialized to an
    NDJSON landing dir (untimed), then drained through readStream ->
    parse -> enrich -> rule scan -> side effects -> state via the
    foreachBatch runner with a checkpoint — the complete production wiring
    including stream parse and checkpoint commits, availableNow trigger.

    Returns (seconds, n_events)."""
    import json as _json
    import random
    import shutil

    from pyspark.sql import functions as F

    from lichess_event_stream_watcher_spark import fixtures, testdata
    from lichess_event_stream_watcher_spark.control.engine import Engine
    from lichess_event_stream_watcher_spark.control.sinks import CollectingSink
    from lichess_event_stream_watcher_spark.rules.store import SignupRulesManager
    from lichess_event_stream_watcher_spark.streaming import read_ndjson_stream
    from lichess_event_stream_watcher_spark.streaming.runner import run_engine_stream

    land = os.path.join(tmp_root, "bench_landing")
    ckpt = os.path.join(tmp_root, "bench_ckpt")
    for d in (land, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(land)
    rows = testdata.signups_df(spark, sf_dir).select(
        F.to_json(
            F.struct("username", "email", "ip", "user_agent", "finger_print", "susp_ip")
        ).alias("j")
    ).collect()
    n = len(rows)
    with open(os.path.join(land, "events.ndjson"), "w") as f:
        for r in rows:
            d = _json.loads(r.j)
            d["t"] = "signup"
            f.write(_json.dumps(d) + "\n")

    store = SignupRulesManager()
    for r in fixtures.reference_ruleset():
        store.rules.append(r)
    engine = Engine(
        store,
        messages=CollectingSink(),
        mod_api=CollectingSink(),
        geoip_ranges=fixtures.geoip_ranges_df(spark),
        rng=random.Random(0),
    )
    events = read_ndjson_stream(spark, land)
    t0 = time.perf_counter()
    q_ = run_engine_stream(engine, events, ckpt, available_now=True)
    q_.awaitTermination(600)
    dt = time.perf_counter() - t0
    shutil.rmtree(land, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return dt, n


def bench_engine_batch(spark, sf_dir: str) -> float:
    """End-to-end engine pass (enrich + rule scan + side effects + state)
    over the full signup batch — the reference's whole hot path as one
    micro-batch."""
    import random

    from lichess_event_stream_watcher_spark import fixtures, testdata
    from lichess_event_stream_watcher_spark.control.engine import Engine
    from lichess_event_stream_watcher_spark.control.sinks import CollectingSink
    from lichess_event_stream_watcher_spark.rules.store import SignupRulesManager

    store = SignupRulesManager()
    for r in fixtures.reference_ruleset():
        store.rules.append(r)
    engine = Engine(
        store,
        messages=CollectingSink(),
        mod_api=CollectingSink(),
        geoip_ranges=fixtures.geoip_ranges_df(spark),
        rng=random.Random(0),
    )
    batch = testdata.signups_df(spark, sf_dir)
    t0 = time.perf_counter()
    engine.process_batch(batch)
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("lesw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = q.all_queries()
    names = [n for n in HEADLINE if n in registry]

    # Bench action: a noop-sink write, NOT .count(). count() lets Catalyst
    # prune every unused column and ELIMINATE cardinality-preserving
    # outer joins, so map-heavy queries time their scan instead of their
    # work (charlm_quality: 0.2s counted vs ~9s actually evaluated — the
    # scoring subtree behind its left join vanished entirely). The noop
    # sink evaluates every output column on the executors and discards it.
    def evaluate(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM + parquet footer cache once so timings measure the query
    evaluate(registry[names[0]](spark, sf_dir))

    # The incremental-probe pair runs FIRST, in a freshly-warmed JVM:
    # rounds 3-4 showed +30% driver-vs-local swings on this family when it
    # ran ~90 queries deep (accumulated shuffle-file/codegen-cache debt
    # landing inside its measurement). Front-running it separates
    # bench-order debt from real probe cost.
    # Engine batch measures FIRST, min-of-3: round 4's driver run showed
    # -15% (2.87 -> 3.37 s) at its old ~100-queries-deep position while a
    # fresh-JVM profile held 2.84-2.94 s (35.2k ev/s) across 5
    # back-to-back runs — position debt, not code (engine.py was
    # untouched r3->r4). It runs BEFORE the probe pair too: the probes'
    # broadcast-disabled sort-merge shuffles leave enough JVM debt to
    # still cost ~0.4 s (measured 3.32 s after vs 2.94 s before them).
    # min-of-5, not 3: the engine path needs ~2 runs to finish warming
    # its own codegen (fresh-JVM profile: 9.5/3.6/2.9/2.9/2.8), and this
    # box's shared-infra swings (±20%) need more draws for a stable min.
    def full_gc() -> None:
        # Between-measurement hygiene, OUTSIDE every timed region: a
        # ~100-query single-JVM run accumulates broadcast blocks, shuffle
        # files, and codegen/GC debt whose asynchronous cleanup otherwise
        # lands inside LATER queries' measurements (observed +30-50%
        # inflation on late-run entries vs a fresh JVM). A synchronous
        # full GC per entry makes the ContextCleaner's reference-queue
        # processing happen between measurements instead of during them.
        # Also the drain point for query-registered .persist() caches
        # (band sweep's exact-pair table, the charlm scored frame): the
        # queries cannot unpersist their own shared subtrees, so the
        # harness releases them here — between entries, never inside a
        # timed region (within an entry's min-of-N the cache is live,
        # which is the intended warm-draw semantics).
        from lichess_event_stream_watcher_spark.operators.session_cache import (
            release_session_caches,
        )

        release_session_caches()
        spark.sparkContext._jvm.System.gc()

    full_gc()
    engine_draws = []
    for _ in range(5):
        engine_draws.append(bench_engine_batch(spark, sf_dir))
        full_gc()
    engine_sec = round(min(engine_draws), 3)
    # Streaming throughput is the other order-sensitive headline metric
    # (it ran dead-last through round 4, swinging 12.6k -> 21.4k -> 17.5k
    # ev/s round to round): measure it in the same clean early slot.
    import tempfile

    # Steady-state protocol (round-8 fix, r7 verdict watch item): the
    # first streaming draw is warmup-inflated — micro-batch codegen +
    # state-store/checkpoint init land in it, and the round-7 draws
    # trended 4.60 -> 3.65 -> 3.18 WITHIN one run, so a min-of-3 still
    # rode the warming tail and moved round over round. Four draws,
    # DISCARD the first, publish min of the three steady-state draws.
    # All four are recorded in streaming_draws_sec (warmup first) so
    # flatness of the published tail is auditable in the artifact.
    stream_draws = []
    for _ in range(4):
        stream_sec_i, stream_n = bench_streaming_engine(
            spark, sf_dir, tempfile.gettempdir()
        )
        stream_draws.append(stream_sec_i)
        full_gc()
    stream_sec = min(stream_draws[1:])
    probe_runs = [bench_indexed_probe(spark, sf_dir) for _ in range(2)]

    timings: dict[str, float] = {}
    timings["dedup_incremental_indexed"] = round(min(r[0] for r in probe_runs), 3)
    timings["dedup_incremental_smj"] = round(min(r[1] for r in probe_runs), 3)
    # The cosine ingestion pair (bench_tf_indexed_probe) is NOT in the
    # per-round set: on this corpus the unigram token space is 31 hot
    # tokens, so the cross-corpus postings volume is ~n^2 per token —
    # a 67 s/draw adversarial shape no real vocabulary exhibits (and the
    # dense gate absorbs in the self-join form). One-time sf0.1 numbers
    # live in SCALE.md: indexed 19.9 s vs re-tokenize 47.3 s (2.4x);
    # round 7 added a sparse-vocab (20k-token) synthetic measurement on
    # the shape the probe was built for — fixed 5k batch, corpus 20k ->
    # 40k moves the indexed probe +13% vs +32% for re-tokenize (SCALE.md
    # round-7 note).
    # The forced-sparse twin (tf_cosine_pairs_sparse) is excluded for the
    # same reason: with every doc sharing the 31 hot tokens the AllPairs
    # prefix cannot prune (measured 107-118 s/draw at sf0.1) — it exists
    # to certify the REAL-vocabulary scale path, where prefix pruning is
    # the whole point; its correctness rides its own driver hash row.
    for name in names:
        best = float("inf")
        # min-of-3: strip first-touch JIT/codegen noise AND the occasional
        # GC/compaction outlier that min-of-2 lets through (observed 2-3x
        # swings on the pair-search family between otherwise-idle runs)
        for _ in range(3):
            t0 = time.perf_counter()
            evaluate(registry[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        full_gc()
    shared_draws = []
    shared_phases: dict[str, float] = {}
    for _ in range(2):
        draw_phases: dict[str, float] = {}
        shared_draws.append(
            bench_dedup_pipeline_shared(spark, sf_dir, phase_seconds=draw_phases)
        )
        # publish the fastest draw's own split so phases sum to the total
        if shared_draws[-1] == min(shared_draws):
            shared_phases = draw_phases
        full_gc()  # the write+drop churn otherwise lands in draw 2
    timings["dedup_pipeline_shared"] = round(min(shared_draws), 3)
    # The composed pipeline is timed through curate_corpus directly (same
    # work the curation_pipeline_counts query runs) so the ~12-25 s
    # composition is attributable stage by stage in the detail file.
    # min-of-2 with the winning draw's own phase split (the shared-pipeline
    # pattern): a single draw of a composed multi-stage DAG is the
    # noisiest number in the bench — round 6 observed a 2.9 <-> 18.1 s
    # quality_gate swing across single draws whose isolation re-runs sat
    # at 3.4-4.9 s, i.e. pure GC/scheduling landing inside ONE long draw.
    from lichess_event_stream_watcher_spark import testdata as _td
    from lichess_event_stream_watcher_spark.pipeline import curate_corpus

    curation_draws: list[float] = []
    curation_stages: dict[str, float] = {}
    for _ in range(2):
        draw_stages: dict[str, float] = {}
        t0 = time.perf_counter()
        chunks, _counts = curate_corpus(
            _td.load(spark, sf_dir, "documents"), stage_seconds=draw_stages
        )
        chunks.unpersist()
        curation_draws.append(time.perf_counter() - t0)
        if curation_draws[-1] == min(curation_draws):
            curation_stages = draw_stages
        full_gc()
    timings["curation_pipeline_counts"] = round(min(curation_draws), 3)
    timings["engine_batch"] = engine_sec
    full_gc()
    # Forced-distributed sweep (see DIST_SWEEP above): min-of-2 per entry —
    # these are regression tripwires for the 100 TB plan shapes, not
    # headline numbers, so two draws bound the added wall-clock while still
    # absorbing first-touch codegen. Runs AFTER every headline measurement
    # so its JVM debt cannot land inside a published number.
    dist_timings: dict[str, float] = {}
    saved_gate = spark.conf.get("lesw.smallCorpusCacheBytes", None)
    spark.conf.set("lesw.smallCorpusCacheBytes", "0")
    try:
        for name in DIST_SWEEP:
            if name not in registry:
                continue
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                evaluate(registry[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            dist_timings[name + "_dist"] = round(best, 3)
            full_gc()
    finally:
        if saved_gate is None:
            spark.conf.unset("lesw.smallCorpusCacheBytes")
        else:
            spark.conf.set("lesw.smallCorpusCacheBytes", saved_gate)
    # wall-time at small SF is dominated by fixed per-batch overhead;
    # events/sec is the quantity that scales, so report it alongside
    n_events = testdata.signups_df(spark, sf_dir).count()
    total = round(sum(timings.values()), 3)
    engine_eps = round(n_events / engine_sec, 1)
    stream_eps = round(stream_n / stream_sec, 1)
    # Full per-query detail goes to a repo file (the ~3.5 KB queries dict
    # outgrew the driver's stdout-tail capture in round 4 — BENCH_r04.json
    # came back parsed:null); stdout's FINAL line is a compact ~200-byte
    # summary that always fits the tail.
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        # round 4+: full-evaluation noop-sink action (earlier rounds
        # timed .count(), which underreports map-heavy queries — see
        # SCALE.md "Benchmark honesty"); totals are not comparable
        # across that boundary
        "action": "noop-write",
        "n_queries": len(timings),
        "queries": timings,
        "queries_dist": dist_timings,
        "curation_stage_seconds": _publish_phases(
            curation_stages, timings["curation_pipeline_counts"]
        ),
        "shared_pipeline_phase_seconds": _publish_phases(
            shared_phases, timings["dedup_pipeline_shared"]
        ),
        "engine_events_per_sec": engine_eps,
        "streaming_engine_events_per_sec": stream_eps,
        "sf": sf,
    }
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prev_detail = _prev_committed_detail(repo_dir)
    # per-metric calibration for the two throughput numbers (they sit
    # outside the query-median calibration below): >1.0 = faster than
    # the committed artifact
    detail["engine_eps_ratio_vs_prev"] = _eps_ratio(
        engine_eps, prev_detail, "engine_events_per_sec"
    )
    detail["streaming_eps_ratio_vs_prev"] = _eps_ratio(
        stream_eps, prev_detail, "streaming_engine_events_per_sec"
    )
    detail["streaming_draws_sec"] = [round(d, 3) for d in stream_draws]
    # Self-calibration against the previously committed detail file: the
    # bench hosts are virtualized and one boot can run a uniform ~1.5x
    # slower than another with zero code change (SCALE.md, round-6
    # host-variance caveat). Publishing the median per-query ratio vs the
    # last committed BENCH_DETAIL makes that shift self-evident in the
    # artifact, so a reader can separate boot contention (uniform ratio
    # across entries) from a real regression (one entry moving against a
    # flat median). Baseline = HEAD's committed artifact (see
    # _prev_committed_detail); entries under 0.2 s are skipped
    # (dominated by fixed overhead).
    # malformed committed artifacts ("queries": null/list) must yield
    # ratio None, never an exception after a multi-minute bench run
    prev_queries = prev_detail.get("queries")
    if not isinstance(prev_queries, dict):
        prev_queries = {}
    median_ratio = _median_ratio_vs_prev(timings, prev_queries)
    detail["median_ratio_vs_prev_detail"] = median_ratio
    # Position-debt publication fix (round 9, VERDICT r8 task #2): a >2x
    # mover against a FLAT median is re-measured in a fresh JVM and the
    # isolated number is published — otherwise next round's ratios
    # inherit phantom baselines (r8 committed 2-4x position-debt times
    # for tpch_q1/q3, text_profile, sessionize that isolation re-runs
    # contradicted). The in-run number stays in the artifact for audit;
    # a failed isolation run publishes in-run flagged unconfirmed.
    suspects = _position_debt_suspects(
        timings,
        prev_queries,
        median_ratio,
        # Round 11: the two COMPOSED entries are isolation-eligible too —
        # a host-noise window once put dedup_pipeline_shared at 49.9 s
        # in-run (stable value 7-10 s) with no recourse because only the
        # registry min-of-3 loop could be re-measured.
        eligible=set(names) | {"dedup_pipeline_shared", "curation_pipeline_counts"},
    )
    # Round 11 (VERDICT r10 task #8): the two eps metrics get the same
    # position-debt adjudication as the registry queries. A ratio-vs-prev
    # BELOW 0.75 against a flat query median means THIS metric slowed while
    # the boot did not — re-measure it in a fresh JVM and publish
    # max(in_run, isolated) eps (the throughput mirror of the per-query
    # min-of-N: debt only ever depresses eps, so the larger of two real
    # measurements is the better estimate; both raw values stay in the
    # artifact). A uniformly slow boot (median moved too) flags nothing,
    # same as the query rule.
    eps_suspects: list[str] = []
    if median_ratio is not None and median_ratio <= 1.3:
        er = detail["engine_eps_ratio_vs_prev"]
        sr = detail["streaming_eps_ratio_vs_prev"]
        if isinstance(er, (int, float)) and er < 0.75:
            eps_suspects.append("engine_batch_eps")
        if isinstance(sr, (int, float)) and sr < 0.75:
            eps_suspects.append("streaming_eps")
    if suspects or eps_suspects:
        # the parent JVM is done measuring (everything below is file IO)
        # — TERMINATE it before the isolation subprocess boots, so the
        # child's min-of-3 really runs in clean memory instead of beside
        # a ~100-query heap. spark.stop() alone is not enough: it stops
        # the SparkContext but the py4j gateway JVM (and its committed
        # multi-GB heap) lives until the Python process exits, which is
        # exactly the co-residency this path exists to remove. Verified:
        # gateway.proc.terminate() + wait() reaps the JVM (rc 143).
        spark.stop()
        try:
            from pyspark import SparkContext

            gw = SparkContext._gateway
            if gw is not None and getattr(gw, "proc", None) is not None:
                gw.proc.terminate()
                gw.proc.wait(timeout=30)
        except Exception:  # noqa: BLE001 - best effort; child still runs
            pass
        iso = _run_isolated(suspects + eps_suspects, sf_dir)
        isolation: dict[str, dict] = {}
        for name in eps_suspects:
            in_run = engine_eps if name == "engine_batch_eps" else stream_eps
            rec_eps: dict = {"in_run_eps": in_run}
            rec_eps["isolated_eps"] = iso.get(name) if iso else None
            if rec_eps["isolated_eps"] is not None:
                best_eps = max(in_run, rec_eps["isolated_eps"])
                key = (
                    "engine_events_per_sec"
                    if name == "engine_batch_eps"
                    else "streaming_engine_events_per_sec"
                )
                detail[key] = best_eps
                if name == "engine_batch_eps":
                    engine_eps = best_eps
                    detail["engine_eps_ratio_vs_prev"] = _eps_ratio(
                        engine_eps, prev_detail, "engine_events_per_sec"
                    )
                else:
                    stream_eps = best_eps
                    detail["streaming_eps_ratio_vs_prev"] = _eps_ratio(
                        stream_eps, prev_detail, "streaming_engine_events_per_sec"
                    )
            isolation[name] = rec_eps
        for name in suspects:
            rec: dict = {"in_run": timings[name]}
            rec["isolated"] = iso.get(name) if iso else None
            if rec["isolated"] is not None:
                # round-10 measurement fix (declared in OPTIMIZATION_r10.md):
                # publish min(in_run, isolated), not isolated
                # unconditionally — the isolation subprocess is itself a
                # fresh JVM on a shared-infra box and can catch a
                # CPU-steal window (observed: in_run 2.5 s, "isolated"
                # 11.8 s for an entry whose committed baseline is 1.1 s).
                # Position debt means in_run OVER-reads and isolation
                # corrects it; a noisy isolation run over-reads the other
                # way. Min of the two real measurements is the same
                # estimator the per-query min-of-3 already applies; both
                # raw values stay in the artifact for audit.
                timings[name] = min(rec["in_run"], rec["isolated"])
                # composed entries: keep the published phase split summing
                # to the published total — if the isolated draw wins, its
                # own split replaces the in-run one (raw in-run split
                # remains in this record for audit)
                phase_key = {
                    "dedup_pipeline_shared": "shared_pipeline_phase_seconds",
                    "curation_pipeline_counts": "curation_stage_seconds",
                }.get(name)
                if phase_key is not None:
                    rec["in_run_phases"] = detail.get(phase_key)
                    iso_phases = iso.get(name + "__phases") if iso else None
                    if (
                        timings[name] == rec["isolated"]
                        and isinstance(iso_phases, dict)
                        and iso_phases
                    ):
                        detail[phase_key] = _publish_phases(
                            dict(iso_phases), timings[name]
                        )
            isolation[name] = rec
        detail["isolation_remeasured"] = isolation
        total = round(sum(timings.values()), 3)
        detail["value"] = total
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    detail["cpus"] = cpus
    with open(os.path.join(repo_dir, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")
    # Round 11 (VERDICT r10 task #1): a per-core-count copy, so the driver's
    # low-core scaling run no longer clobbers the 32-core per-query detail
    # (PERF_r10.scaling.per_query came back empty because one file served
    # both runs).
    with open(os.path.join(repo_dir, f"BENCH_DETAIL_{cpus}.json"), "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")
    sys.stdout.flush()
    # Round 11 (VERDICT r10 task #1): the printed one-line JSON carries the
    # full per-query timings dict again — the driver's per-query
    # round-over-round and scaling tables read THIS line, and the detail
    # file alone proved insufficient (overwritten by the scaling run).
    # Compact separators keep the line as small as the dict allows.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "action": "noop-write",
                "n_queries": len(timings),
                "queries": timings,
                "engine_events_per_sec": engine_eps,
                "streaming_engine_events_per_sec": stream_eps,
                "engine_eps_ratio_vs_prev": detail["engine_eps_ratio_vs_prev"],
                "streaming_eps_ratio_vs_prev": detail[
                    "streaming_eps_ratio_vs_prev"
                ],
                "sf": sf,
                "cpus": cpus,
                "median_ratio_vs_prev_detail": median_ratio,
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    # dispatch on the flag ALONE: "--isolated" with the names operand
    # forgotten must error, never silently fall through into a
    # multi-minute full bench that overwrites BENCH_DETAIL.json
    if len(sys.argv) >= 2 and sys.argv[1] == "--isolated":
        if len(sys.argv) < 3 or not sys.argv[2]:
            sys.exit("usage: bench.py --isolated name1,name2,...")
        run_isolated_mode(sys.argv[2])
    elif len(sys.argv) >= 2 and sys.argv[1].startswith("-"):
        sys.exit(f"unknown flag {sys.argv[1]!r} (only --isolated is supported)")
    else:
        main()
