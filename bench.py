"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is collected to the driver (count only) to force full execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lichess_event_stream_watcher_spark import queries as q  # noqa: E402
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
    "dedup_clusters_star",
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
]


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
    # warm the JVM + parquet footer cache once so timings measure the query
    registry[names[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):  # min-of-2: strip first-touch JIT/codegen noise
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    timings["engine_batch"] = round(
        min(bench_engine_batch(spark, sf_dir) for _ in range(2)), 3
    )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
