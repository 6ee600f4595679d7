"""Driver-facing query registry: Spark implementations + DuckDB oracle SQL.

Every operator from SURVEY.md §2 that is SQL-expressible registers BOTH a
Spark callable ``(spark, sf_dir) -> DataFrame`` and the equivalent DuckDB SQL
over the same parquet tables. Non-SQL-expressible ops (CODE predicates,
custom stateful streaming) register Spark-only (rows-only check) and are
covered by differential pytest oracles instead.

Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fixtures, testdata
from .plans.compile import compile_matches, would_fire

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        if name in QUERIES:  # import-order-dependent shadowing is a silent
            raise ValueError(f"duplicate query registration: {name!r}")  # correctness bug
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _signups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return testdata.signups_df(spark, sf_dir)


_CTE = testdata.signups_cte("duckdb")


# ---------------------------------------------------------------------------
# J1 — the flagship broadcast rule scan (SURVEY.md §2.4 J1, §3.1 step 5)
# ---------------------------------------------------------------------------
@query(
    "rule_scan",
    f"{_CTE}\n{fixtures.oracle_union_sql(with_actions=False)}",
)
def rule_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events x rules -> (event_id, username, rule_name). One map-side
    projection; disabled/expired rules pruned at plan time."""
    df = _signups(spark, sf_dir)
    m = compile_matches(df, fixtures.reference_ruleset())
    return m.select("event_id", "username", "rule_name")


@query(
    "rule_scan_actions",
    f"{_CTE}\n{fixtures.oracle_union_sql(with_actions=True)}",
)
def rule_scan_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule scan exploded to one row per (event, rule, action) —
    the action-dispatch input (src/eventhandler.rs:147-256)."""
    df = _signups(spark, sf_dir)
    m = compile_matches(df, fixtures.reference_ruleset(), with_actions=True)
    return m.select("event_id", "username", "rule_name", "action")


@query(
    "would_fire_counts",
    f"""{_CTE},
matches AS ({fixtures.oracle_union_sql(with_actions=False)})
SELECT s.event_id, COALESCE(m.n, 0) AS n_would_fire
FROM signups s
LEFT JOIN (SELECT event_id, COUNT(*) AS n FROM matches GROUP BY event_id) m
  ON s.event_id = m.event_id""",
)
def would_fire_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dry-run path (src/eventhandler.rs:128-145): per event, how many rules
    WOULD fire — no explosion, no side effects."""
    df = _signups(spark, sf_dir)
    wf = would_fire(df, fixtures.reference_ruleset())
    return wf.select("event_id", F.size("would_fire").cast("bigint").alias("n_would_fire"))


# ---------------------------------------------------------------------------
# F1-F7 — each criterion as a standalone filter (SURVEY.md §2.3)
# ---------------------------------------------------------------------------
def _register_single_criterion_queries() -> None:
    rules = {r.name: r for r in fixtures.reference_ruleset()}
    for rule_name, where in fixtures.SQL_PREDICATES.items():
        rule = rules[rule_name]
        qname = f"crit_{rule.criterion.kind.name.lower()}"
        oracle = f"{_CTE}\nSELECT event_id, username FROM signups WHERE {where}"
        if rule_name == "r_susp_proton":
            qname = "crit_susp_ip_gate"

        def make(rule=rule):
            def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
                df = _signups(spark, sf_dir)
                return compile_matches(df, [rule]).select("event_id", "username")

            fn.__doc__ = f"Criterion {rule.criterion.kind.value}: {rule.criterion.friendly()}"
            return fn

        query(qname, oracle)(make())


_register_single_criterion_queries()


# K2 — the jitter/delay policy as data (src/eventhandler.rs:167-178):
# per (event, rule, action), whether delivery is delayed and the fixed extra.
# The random 30-99s draw itself is per-event at dispatch time (Engine);
# the POLICY columns are deterministic and oracle-checked here.
_DELAYED = "('EngineMark', 'BoostMark', 'IpBan', 'Close')"
_NODELAY_RULES = [r.name for r in fixtures.reference_ruleset() if r.no_delay]
_NODELAY_SQL = "('" + "', '".join(_NODELAY_RULES) + "')"


@query(
    "action_schedule",
    f"""{_CTE},
matches AS ({fixtures.oracle_union_sql(with_actions=True)})
SELECT event_id, username, rule_name, action,
  action IN {_DELAYED} AND rule_name NOT IN {_NODELAY_SQL} AS delayed,
  CASE WHEN action = 'Close' AND rule_name NOT IN {_NODELAY_SQL}
       THEN 1500 ELSE 0 END AS extra_delay_ms
FROM matches""",
)
def action_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 delay policy columns over the exploded action dispatch: the
    delay-queue-table form of jittered delivery (executors never sleep)."""
    df = _signups(spark, sf_dir)
    m = compile_matches(df, fixtures.reference_ruleset(), with_actions=True)
    no_delay = F.col("rule_name").isin(_NODELAY_RULES)
    delayed = F.col("action").isin("EngineMark", "BoostMark", "IpBan", "Close") & ~no_delay
    extra = F.when((F.col("action") == "Close") & ~no_delay, F.lit(1500)).otherwise(
        F.lit(0)
    )
    return m.select(
        "event_id",
        "username",
        "rule_name",
        "action",
        delayed.alias("delayed"),
        extra.cast("int").alias("extra_delay_ms"),
    )


# F8 — CODE predicate. Arbitrary user code is non-SQL-expressible in
# general (covered by the differential oracle in tests/test_lua_compat.py),
# but THIS fixture instance translates exactly: regex() is re.search and
# fp() substitutes the "<NO PRINT>" sentinel for NULL (src/lua.rs:17-20),
# so the whole Python-UDF runtime path gets a hash-checked SQL oracle too.
@query(
    "crit_code_predicate",
    f"""{_CTE}
SELECT event_id, username FROM signups
WHERE regexp_matches(email, '@proton')
  AND COALESCE(finger_print, '<NO PRINT>') <> '<NO PRINT>'""",
)
def crit_code_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: `regex(user.email(), "@proton") and user.fp() != "<NO PRINT>"`
    through the code-predicate runtime (sentinel null semantics)."""
    df = _signups(spark, sf_dir)
    return compile_matches(df, [fixtures.code_rule()]).select("event_id", "username")


# §2.10 TTL — the expiry sweep's 0/1/2 latch state machine as distributed
# batch logic over a pinned scenario table (src/eventhandler.rs:428-487).
# Microsecond-precise to match expiry_sweep_classify's F.lit(now) exactly
# (a whole-second truncation here would diverge on sub-second offsets).
_SWEEP_TS = fixtures.SWEEP_NOW.strftime("%Y-%m-%d %H:%M:%S.%f")


@query(
    "rule_expiry_sweep",
    f"""WITH r AS (SELECT * FROM {fixtures.sweep_scenarios_values_sql()})
SELECT 'warn' AS kind, name FROM r
WHERE expiry < TIMESTAMP '{_SWEEP_TS}' + INTERVAL 1 DAY AND latch = 0
UNION ALL
SELECT 'expired' AS kind, name FROM r
WHERE NOT (expiry < TIMESTAMP '{_SWEEP_TS}' + INTERVAL 1 DAY AND latch = 0)
  AND expiry < TIMESTAMP '{_SWEEP_TS}' AND latch <= 1
UNION ALL
SELECT 'deleted' AS kind, name FROM r
WHERE TIMESTAMP '{_SWEEP_TS}' > expiry + INTERVAL 3 DAY""",
)
def rule_expiry_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expiry lifecycle (warn <1 d before / announce at expiry / delete
    +3 d, with the exp_notification latch and the warn+deleted double
    yield) classified distributedly — one scenario row per branch
    combination of the sweep state machine."""
    from .rules.store import expiry_sweep_classify

    return expiry_sweep_classify(
        fixtures.sweep_scenarios_df(spark), fixtures.SWEEP_NOW
    )


# The driver's CORRECTNESS harness certifies the FIRST 50 registered
# queries per round, so registration order IS the verification budget.
# Round-4 allocation (per VERDICT.md round-3 task #1): the thrice-green
# core shrinks to its 2 anchor slots (rule_scan = the flagship scan path,
# crit_code_predicate = the whole UDF/translator runtime), and the other
# 48 slots go to (a) every query that had NEVER had a driver row in
# rounds 1-3 — the round-3 additions, the TPC-H tail, the rows-only
# trained-ANN twins (now hash-oracled via frozen artifacts), and the
# sampling/packing/layout family — (b) this round's new queries
# (interval_join_attribution, curation_pipeline_counts), and (c) the five
# stalest greens (r1-only: dedup_exact, ann_lsh_buckets; plus the three
# TPC-H r2-only rows VERDICT flagged). Result: after this round every
# registered query has at least one lifetime driver-green row. Rotated-out
# queries (all with >= 1 green row, most with 2-3) keep coverage every
# session through tests/test_oracle_parity.py.
_DRIVER_PRIORITY = [
    # ---- the round-11 50-row driver window ------------------------------
    # Mechanized rotation (tests/test_registry_policy.py): with
    # CORRECTNESS_r10 committed, the staleness horizon reaches round 6,
    # so the 47 r6-vintage rows pre-declared by round 10's group (A)
    # rotate into the window NOW. The other 3 slots go to the queries
    # whose backing code round 11's optimization work changed most — the
    # charlm two-Arrow-pass rewrite, the fused curation quality gate,
    # and semantic_dedup's bounded-block cell scoring — so their r10
    # greens are re-earned on the changed code:
    "charlm_quality",
    "curation_pipeline_counts",
    "semantic_dedup",
    "ann_cost_census",
    "ann_lsh_buckets",
    "ann_pq_distortion",
    "ann_recall_eval",
    "asof_join_orders",
    "c4_line_stats",
    "cube_pricing",
    "date_functions",
    "dedup_cost_census",
    "dedup_keep_best_clusters",
    "dedup_lsh_band_sweep",
    "dedup_minhash_calibration",
    "dedup_threshold_sensitivity",
    "first_event_per_user",
    "json_extract_props",
    "leakage_safe_split_counts",
    "match_stats",
    "max_order_per_cust_subquery",
    "notify_dedup_anti",
    "percentiles_exact",
    "pivot_event_counts",
    "rollup_pricing",
    "scalar_encoding",
    "scalar_suite",
    "seen_lookup_semi",
    "seen_window_counts",
    "sessionize",
    "set_ops",
    "tf_cosine_incremental",
    "tf_cosine_pairs_sparse",
    "topk_recent_events",
    "tpch_q10_returned_items",
    "tpch_q13_custdist",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q19_bracket_revenue",
    "tpch_q1_pricing",
    "tpch_q3_revenue",
    "tpch_q4_priority",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "unimax_allocation",
    "unpivot_measures",
    "window_suite",
    # ---- position 51+: the declared rotation queue -----------------------
    # (A) the round-9/10 window, rotated out whole at the round-11
    # rotation — every row is r10-green (CORRECTNESS_r10: 50/50), valid
    # through round 14. Round 11's operator work (operators/dedup.py,
    # text.py, similarity.py, session_cache.py, pipeline.py and the two
    # queries_pipeline.py explode_outer fixes) preempts many of their
    # closures; all re-verified green at sf0.01 by this session's full
    # driver-sim sweep on the changed code, and declared here so the
    # committed paper trail rotates them through upcoming windows:
    "semantic_dedup_auto",
    "image_stats_jpeg",
    "gopher_rule_failures",
    "ann_ivf_topk",
    "ann_ivf_trained",
    "ann_ivf_trained_q",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "benford_first_digit",
    "boilerplate_ngrams",
    "bpe_encode_pieces",
    "bpe_source_token_counts",
    "ccnet_quality_buckets",
    "collocation_lift_topk",
    "corpus_snapshot_diff",
    "corpus_token_accounting",
    "cusum_hourly_changepoint",
    "dedup_exact",
    "distinctive_terms_by_source",
    "dsir_importance_log",
    "dup_graph_pagerank",
    "embedding_pca_projection_q",
    "embedding_random_projection",
    "event_transition_matrix",
    "funnel_conversion",
    "hard_negative_mining",
    "histogram_drift_tv",
    "hourly_corr_pairs",
    "hybrid_retrieval_rrf",
    "ingestion_admission_counts",
    "join_key_profile",
    "k_anonymity_audit",
    "label_centroid_confusion",
    "label_centroid_dispersion",
    "last3_caught",
    "ngram_novelty_profile",
    "ols_trend_by_type",
    "quality_lr_source_scores",
    "regex_token_counts",
    "retrieval_eval",
    "robust_length_outliers",
    "rule_scan",
    "source_label_gini",
    "source_lang_cramers_v",
    "source_overlap_matrix",
    "token_budget_sample",
    "weighted_priority_sample",
    "winnowing_dup_pairs",
    "zipf_octave_profile",
    "zorder_key_events",
    # (B) the carried-forward changed-since-green declarations from
    # rounds 7-10 (see git history for the per-group narratives), minus
    # the three rows promoted into this round's window head:
    "action_schedule",
    "rule_expiry_sweep",
    "rule_scan_actions",
    "would_fire_counts",
    "contamination_check",
    "curation_gate",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_containment",
    "dedup_incremental",
    "dedup_jaccard_inverted",
    "dedup_jaccard_pairs",
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "fuzzy_graph_kcore",
    "fuzzy_graph_triangles",
    "lexicon_coverage",
    "lsh_bucket_histogram",
    "multimodal_features",
    "multimodal_manifest",
    "paragraph_dedup",
    "repetition_profile",
    "source_quality_scorecard",
    "temperature_mix_sample",
    "text_profile",
    "tf_cosine_pairs",
    "crit_ip_match",
    "crit_print_match",
    "crit_email_contains",
    "crit_email_regex",
    "crit_username_contains",
    "crit_username_regex",
    "crit_useragent_length_lte",
    "crit_susp_ip_gate",
    "ann_lsh_topk",
    "ann_pq_adc",
    "embedding_near_dup",
    "embedding_quantize_int8",
    "ivf_cell_occupancy",
    "knn_cosine_topk",
    "image_stats",
    "resize_image",
    "multimodal_frames",
    "ann_ivfpq_adc",
    "ann_kmeans_cells_q",
    "ann_lsh_multiprobe",
    "bloom_admission",
    "bm25_lucene_topk",
    "bm25_rsj_topk",
    "bpe_merge_ranks",
    "chunk_documents",
    "cross_source_dups",
    "dataset_split_counts",
    "dedup_corpus",
    "dsir_importance_q",
    "dup_graph_pagerank_q",
    "dup_span_profile",
    "embedding_feature_stats",
    "embedding_robust_stats",
    "epoch_shuffle",
    "pack_sequences_bins",
    "pii_scrub",
    "salted_event_type_counts",
    "source_quota_sample",
    "substring_dedup",
    "username_fuzzy_pairs",
]
# Queued round-10 NEW registrations (the r6-r9 precedent — implement +
# pytest-certify mid-round, register at the next window head), each with
# a staged query + frozen oracle + dress-rehearsal pytest already in
# place: `image_stats_lossless` (artifacts_png.staged_query — PNG + GIF
# on one row; lossless, so the oracle derives from recipe rasters with
# no codec in the chain),
# `audio_stats_wav` (artifacts_wav.staged_query — integer PCM
# statistics from integer recipe grids), and `video_frame_stats_avi`
# (artifacts_avi.staged_query — container walk + sampled-frame JPEG
# decode, corrupt-middle-frame pill).


def _ordered(mapping: dict) -> dict:
    head = [k for k in _DRIVER_PRIORITY if k in mapping]
    tail = [k for k in mapping if k not in _DRIVER_PRIORITY]
    return {k: mapping[k] for k in head + tail}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Import registers the extended query families on first use.
    from . import queries_analytics  # noqa: F401
    from . import queries_pipeline  # noqa: F401

    return _ordered(QUERIES)


def all_oracles() -> dict[str, str]:
    from . import queries_analytics  # noqa: F401
    from . import queries_pipeline  # noqa: F401

    return _ordered(ORACLES)
