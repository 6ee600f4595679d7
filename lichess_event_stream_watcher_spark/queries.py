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
_SWEEP_TS = fixtures.SWEEP_NOW.strftime("%Y-%m-%d %H:%M:%S")


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
    # ---- the round-5 50-row driver window -------------------------------
    # Aim (r4 verdict task #2): close the never-driver-checked backlog —
    # 2 anchors + the 41 round-4 late additions + the last3_caught re-cert
    # + the stalest r1 green (dedup_exact) + 5 re-certs of the ANN serving
    # queries whose final top-k was threshold-pruned this round (r4 task
    # #3 touched their code, so their r4 evidence is stale). Registry
    # growth is FROZEN this round: no new registrations ahead of closure.
    # anchors (the reference parity surface's two highest-leverage paths)
    "rule_scan",
    "crit_code_predicate",
    # round-4 late additions, never driver-checked (the whole backlog).
    # The three the advisor flagged as highest cross-engine-arithmetic
    # risk go first: trained-trajectory + grouping-sets queries.
    "quality_lr_source_scores",
    "embedding_pca_projection_q",
    "ngram_novelty_profile",
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
    "label_centroid_dispersion",
    "label_centroid_confusion",
    "token_budget_sample",
    "source_overlap_matrix",
    "winnowing_dup_pairs",
    "retrieval_eval",
    "zipf_octave_profile",
    "distinctive_terms_by_source",
    "robust_length_outliers",
    "weighted_priority_sample",
    "histogram_drift_tv",
    "source_label_gini",
    "collocation_lift_topk",
    "ols_trend_by_type",       # + round-5 zero-variance NULL guard
    "cusum_hourly_changepoint",
    "funnel_conversion",
    "event_transition_matrix",
    "hourly_corr_pairs",       # + round-5 zero-variance NULL guard
    "source_lang_cramers_v",
    "benford_first_digit",
    "join_key_profile",
    "k_anonymity_audit",
    # formerly rows-only, upgraded to hash oracles round 5 (task #7):
    # float pagerank via a recursive-CTE round-6 twin, log-DSIR via a
    # round-6 ln twin, BM25-ln as a rank-only registration
    "dup_graph_pagerank",
    "dsir_importance_log",
    "bm25_lucene_topk",
    # rows-only by nature (percentile_approx internals) — its weaker
    # rows-only driver row is still a first
    "sketch_stats",
    # re-cert: reworked r4 (threshold-pruned top-3), driver evidence r2
    "last3_caught",
    # stalest green: r1-only evidence, code untouched since
    "dedup_exact",
    # re-certs: ANN serving top-k threshold-pruned this round (the five
    # distinct serving paths; ann_pq_adc / ann_ivfpq_adc / ann_lsh_buckets
    # share the same helper and head the r6 rotation queue below)
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivf_topk",
    "ann_ivf_trained",
    "ann_ivf_trained_q",
    # ---- position 51+: the round-6 rotation queue -----------------------
    # first: the remaining touched-code ANN twins, then the stalest greens
    "ann_pq_adc",
    "ann_ivfpq_adc",
    "ann_lsh_buckets",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    # r2-r4 greens, code untouched, freshest-last
    "dup_graph_pagerank_q",
    "ann_kmeans_cells_q",
    "bloom_admission",
    "kmv_distinct_sketch",
    "event_rate_anomaly",
    "epoch_shuffle",
    "tf_cosine_pairs",
    "chunk_documents",
    "embedding_feature_stats",
    "embedding_robust_stats",
    "dedup_corpus",
    "cross_source_dups",
    "hll_distinct_sketch",
    "cms_heavy_hitters",
    "username_fuzzy_pairs",
    "windowed_event_rollup",
    "session_window_rollup",
    "grouping_sets_pricing",
    "orders_column_stats",
    "value_equidepth_histogram",
    "salted_event_type_counts",
    "multimodal_frames",
    "dataset_split_counts",
    "pack_sequences_bins",
    "source_quota_sample",
    "source_rate_sample",
    "interval_join_attribution",
    "curation_pipeline_counts",
    "bpe_merge_ranks",
    "bm25_rsj_topk",
    "dup_span_profile",
    "dsir_importance_q",
    "substring_dedup",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_values",
    "tpch_q12_late_by_priority",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_loss",
    "tpch_q18_large_orders",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_idle_balances",
    "tpch_q13_custdist",
    "tpch_q6_forecast_revenue",
    "tpch_q15_top_supplier",
    "tpch_q4_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "tpch_q10_returned_items",
    "tpch_q14_promo_effect",
    "tpch_q19_bracket_revenue",
]


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
