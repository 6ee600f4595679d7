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
    # ---- the round-8 50-row driver window -------------------------------
    # Head allocation, in priority order:
    # -- (1) changed-file re-certs (VERDICT r7 task #1): enrich.py +
    #    functions/ip.py changed post-rotation in round 7 (octet
    #    validation) AND ip.py changed again in round 8 (leading-zero
    #    gate, with the geoip_enrich oracle updated in lockstep);
    #    retrieval.py changed post-rotation in round 7 (bm25 branch
    #    structure). Their freshest committed rows (r5/r6) predate that
    #    code. bm25_rsj_topk is already in the r4 staleness block below.
    "geoip_enrich",
    "device_enrich",
    "bm25_lucene_topk",
    # -- (2) round-8 new registrations: the real PPM decode/resize paths
    #    earn full hash oracles (VERDICT r7 task #2), and the retired
    #    rows-only sketch_stats is replaced by a hash-comparable
    #    error-bound form (task #3, ROWS_ONLY_ALLOWLIST now empty):
    "image_stats",
    "resize_image",
    "sketch_error_bounds",
    # -- (3) changed-THIS-round re-cert: lua_compat/lua_translate gained
    #    the format-string rejection + brace-depth + not-shift detector
    #    (round-8 ADVICE fixes); crit_code_predicate is the registration
    #    that certifies the whole translator/sandbox runtime:
    "crit_code_predicate",
    # -- (4) the staleness block: all 43 r4-vintage rows (mechanized
    #    rule, STALE_ROUNDS=4 — with CORRECTNESS_r08 committed the
    #    horizon is round 4, so every one of these must re-certify
    #    THIS round), name order — fills the 50 slots exactly
    "ann_ivfpq_adc",
    "ann_kmeans_cells_q",
    "ann_lsh_multiprobe",
    "bloom_admission",
    "bm25_rsj_topk",
    "bpe_merge_ranks",
    "chunk_documents",
    "cms_heavy_hitters",
    "cross_source_dups",
    "curation_pipeline_counts",
    "dataset_split_counts",
    "dedup_corpus",
    "dsir_importance_q",
    "dup_graph_pagerank_q",
    "dup_span_profile",
    "embedding_feature_stats",
    "embedding_robust_stats",
    "epoch_shuffle",
    "event_rate_anomaly",
    "grouping_sets_pricing",
    "hll_distinct_sketch",
    "interval_join_attribution",
    "kmv_distinct_sketch",
    "multimodal_frames",
    "orders_column_stats",
    "pack_sequences_bins",
    "salted_event_type_counts",
    "session_window_rollup",
    "source_quota_sample",
    "source_rate_sample",
    "substring_dedup",
    "tpch_q11_important_values",
    "tpch_q12_late_by_priority",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_loss",
    "tpch_q18_large_orders",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_idle_balances",
    "tpch_q2_min_cost_supplier",
    "username_fuzzy_pairs",
    "value_equidepth_histogram",
    "windowed_event_rollup",
    # ---- position 51+: the round-9 rotation queue ------------------------
    # The 6 remaining changed-in-r7 entries with in-horizon r6 greens
    # (they cede window slots to the mandatory staleness block, same
    # precedent as r6/r7; the changed-since-green policy test accepts
    # declared-queue placement), then the 47 r5 greens that round 9's
    # staleness horizon will demand, name order.
    "gopher_rule_failures",
    "c4_line_stats",
    "tf_cosine_pairs_sparse",
    "tf_cosine_incremental",
    "ann_cost_census",
    "dedup_lsh_band_sweep",
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
    # Changed-since-green preemption (mechanized: tests/registry_freshness.py
    # + test_changed_since_green_queries_are_declared): queries whose
    # backing code changed after their freshest committed green row must
    # appear in this declared rotation. (a) r7 rows on the rule-engine
    # sandbox path, preempted by the round-8 ADVICE fixes
    # (lua_compat/lua_translate/ip/rules.store):
    "rule_scan_actions",
    "would_fire_counts",
    "action_schedule",
    "rule_expiry_sweep",
    # (b) r6 rows whose operator closure (dedup/text/sketch/similarity/
    # curation/util) was touched by round 7's post-rotation review-fix
    # commits — the exact paper-trail gap the round-7 verdict flagged;
    # all re-verified green at sf0.01 by this session's full driver-sim
    # sweep, listed here so the committed artifacts catch up:
    "ann_lsh_buckets",
    "ann_pq_distortion",
    "leakage_safe_split_counts",
    "unimax_allocation",
    "dedup_keep_best_clusters",
    "ann_recall_eval",
    "dedup_minhash_calibration",
    "dedup_cost_census",
    "dedup_threshold_sensitivity",
    # (c) r7 rows preempted by round 8's OWN changes — the dense-vs-
    # postings cost gate in operators/dedup.py (touches every query whose
    # closure includes the jaccard/shingle machinery) and the baseline-
    # JPEG dispatch in operators/multimodal.py. All 25 re-verified
    # hash-green at sf0.01 by this session's final full driver-sim sweep
    # on the changed code; declared here so the committed paper trail
    # rotates them through upcoming windows (freshness horizon: their r7
    # greens stay valid through round 11).
    "charlm_quality",
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
    # (d) the 8 factory-made criterion queries, preempted by the SAME
    # round-8 sandbox/ip changes as group (a) — invisible to the first
    # analyzer cut (their closures have no top-level def; the fixed
    # analyzer fingerprints the enclosing registration factory), surfaced
    # by the round-8 review pass. crit_code_predicate already heads the
    # window; these re-verified green in this session's final sweeps.
    "crit_ip_match",
    "crit_print_match",
    "crit_email_contains",
    "crit_email_regex",
    "crit_username_contains",
    "crit_username_regex",
    "crit_useragent_length_lte",
    "crit_susp_ip_gate",
    # (e) r7 rows preempted by the round-8 semantic_dedup_auto addition
    # to operators/similarity.py (a new function; the existing operators
    # are untouched) — flagged by the module-level closure rule, all
    # re-verified green by this session's final sweeps:
    "ann_lsh_topk",
    "ann_pq_adc",
    "embedding_near_dup",
    "embedding_quantize_int8",
    "ivf_cell_occupancy",
    "knn_cosine_topk",
    "semantic_dedup",
]
# Queued round-9 NEW registration (the r6/r7 precedent — implement +
# pytest-certify mid-round, register at the next window head):
# `semantic_dedup_auto` (operators/similarity.py), the corpus-scaled
# cell-count form of semantic_dedup whose k lever the round-8 scale
# probe measured (SCALE.md); its oracle derives k and the lowest-id
# centroids from COUNT(*), so the hash check is fully deterministic.



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
