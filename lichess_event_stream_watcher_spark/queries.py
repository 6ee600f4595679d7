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
    # ---- the round-6 50-row driver window -------------------------------
    # The backlog is closed (every query holds a lifetime green row), so
    # from this round the window is allocated by the FRESHNESS rotation
    # rule (r5 verdict task #3), mechanically:
    #   1. new registrations and queries whose implementing files changed
    #      this round (they must re-certify through the changed code);
    #   2. the stalest lifetime greens (ascending last-green round, then
    #      name) until the 50 slots fill.
    # tests/test_registry_policy.py::test_no_stale_green_outside_window
    # enforces the result: nothing may sit outside the window with its
    # newest green row more than 3 rounds old.
    # -- (1) changed this round: tf-cosine grew the AllPairs prefix sparse
    #    path (text.py) + a forced-sparse twin registration; the curation
    #    pipeline's quality gate was re-staged (pipeline.py); curation.py
    #    took the _mix_rate_q collision fix; enrich.py grew the generic
    #    from-scratch UA parser.
    "tf_cosine_pairs_sparse",  # new: the at-scale sparse path, own oracle
    "tf_cosine_incremental",  # new: the ingestion-time cross-corpus probe
    "gopher_rule_failures",  # new: Gopher appendix-A rule battery rollup
    "c4_line_stats",  # new: C4 line-cleaning accounting
    "leakage_safe_split_counts",  # new: near-dup-aware split assignment
    "unimax_allocation",  # new: UniMax closed-form token-budget waterfilling
    "dedup_keep_best_clusters",  # new: quality-argmax cluster representatives
    "ann_recall_eval",  # new: recall@5 of IVF/LSH vs the exact baseline
    "dedup_lsh_band_sweep",  # new: (b x r) sweep off one signature pass
    #    (subsumes the former dedup_lsh_recall_eval: its n_bands=4 row IS
    #    that query's recall/precision, off the same signatures)
    "dedup_threshold_sensitivity",  # new: t-sweep off one pair search
    "dedup_cost_census",  # new: strategy cost table, no pair explosion
    "ann_cost_census",  # new: serving-route candidate volume census
    "dedup_minhash_calibration",  # new: estimator error by exact band
    "ann_pq_distortion",  # new: frozen-codebook distortion by subspace
    "device_enrich",  # r2-vintage AND enrich.py changed (UA parser) — both
    #    window triggers fire; the other four changed-file entries hold
    #    r3/r4 greens and yield their slots to the staleness-bound r2
    #    block below (they head the round-7 rotation queue instead; all
    #    four re-verified hash-green at sf0.01 through current code by
    #    this session's three full driver-sim sweeps)
    # -- (2) stalest greens: the r1 row, all 34 remaining r2 rows —
    #    r2 + STALE_ROUNDS = 6, so every r2 row must re-certify THIS
    #    round; with the 14 new registrations + device_enrich that fills
    #    the 50 slots exactly
    "ann_lsh_buckets",  # r1
    "asof_join_orders",  # r2 from here
    "cube_pricing",
    "date_functions",
    "first_event_per_user",
    "geoip_enrich",
    "json_extract_props",
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
    "unpivot_measures",
    "window_suite",
    # ---- position 51+: the round-7 rotation queue ------------------------
    # Round-7 window budget: ~47 names below hit the staleness bound and
    # must rotate in, leaving ~3 head slots for new registrations. Two
    # operators are already implemented + pytest-certified and waiting
    # for slots: similarity.ivf_cell_occupancy (register with the
    # _IVF_ORACLE assign CTE -> GROUP BY + centroid scaffold) and
    # dedup.lsh_bucket_histogram (register with _MINHASH_SIGS + the
    # bands CTE -> two stacked GROUP BYs).
    # First the four changed-this-round entries that ceded head slots to
    # the r2 staleness block (r3/r4 greens; files changed in round 6, so
    # they re-certify at the next window), then the r3 greens in
    # staleness order
    "temperature_mix_sample",  # r3 green; curation.py changed
    "curation_gate",  # r3 green; text/pipeline signals changed
    "tf_cosine_pairs",  # r4 green; text.py grew the prefix sparse path
    "curation_pipeline_counts",  # r4 green; pipeline.py re-staged
    "action_schedule",  # r3 from here
    "ann_lsh_topk",
    "ann_pq_adc",
    "charlm_quality",
    "contamination_check",
    "crit_email_contains",
    "crit_email_regex",
    "crit_ip_match",
    # the remaining r3 greens, staleness order (these hit the staleness
    # bound during round 7/8 and must rotate in; crit_print_match ceded
    # its slot to the new tf_cosine_incremental registration)
    "crit_print_match",
    "crit_susp_ip_gate",
    "crit_useragent_length_lte",
    "crit_username_contains",
    "crit_username_regex",
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
    "embedding_near_dup",
    "embedding_quantize_int8",
    "funnel_view_click_purchase",
    "fuzzy_graph_kcore",
    "fuzzy_graph_triangles",
    "knn_cosine_topk",
    "lexicon_coverage",
    "multimodal_features",
    "multimodal_manifest",
    "paragraph_dedup",
    "pii_scrub",
    "purchase_state_attribution",
    "repetition_profile",
    "retention_cohorts",
    "rule_expiry_sweep",
    "rule_scan_actions",
    "semantic_dedup",
    "source_quality_scorecard",
    "text_profile",
    "user_state_scd2",
    "value_outliers_3sigma",
    "would_fire_counts",
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
