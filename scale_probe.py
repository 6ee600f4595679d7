"""Empirical scale-exponent probe for the dedup/curation tail (round 8).

SCALE.md's 100x claims are plan-shape arguments pinned by tests; this
one-shot tool adds MEASURED growth exponents: it replicates the sf0.1
``documents``/``embeddings`` tables 4x and 8x into a scratch dir
(``/root/testdata`` is read-only), runs the most expensive operators at
each scale, and fits the log-log slope of runtime vs corpus size. A
well-behaved operator lands near 1.0 (linear in corpus); anything >> 1.2
names a super-linear stage to fix. Results are published in SCALE.md.

Replication is NOT naive copying — k identical copies would plant k-way
exact/near duplicates everywhere and measure an adversarial pair
explosion no real 4x corpus exhibits. Instead each copy keeps the
corpus's own internal duplicate structure while staying dissimilar to
the other copies:

- documents: copy i > 0 applies a per-copy word SUBSTITUTION CIPHER —
  every word w becomes ``md5(w || i)[:8]`` — a bijective rename, so the
  copy's internal structure (shingle document frequencies, the planted
  near-dup pairs, doc lengths in words) is EXACTLY isomorphic to the
  base corpus while cross-copy shingle namespaces are disjoint. Pure
  codegen expressions, no UDF. (A first attempt sorted each doc's words
  by a per-copy key instead; the shared global order concentrated
  bigram dfs — every doc containing two adjacent-sorting words emitted
  the same bigram — and the df^2 candidate fanout measured a fixture
  artifact, not the engine. The cipher has no such concentration.)
  Caveat: ciphered words are not natural language, so the curation
  pipeline's content gates (stopword ratio, lang-id) score copies
  differently than the base — the probe records curate_corpus's
  per-stage seconds at every scale so a selectivity shift is visible
  in the artifact rather than silently folded into the exponent.
- embeddings: copy i flips the sign of a deterministic (md5-seeded)
  half of the dimensions — an isometry, so within-copy distances (and
  the planted semantic near-dups) are EXACTLY preserved while
  cross-copy cosines decorrelate.

Usage:  python scale_probe.py [--scales 1,4,8] [--out /tmp/scale_probe]
Prints one JSON line: {"op": {"k": seconds, ...}, "exponents": {...}}.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import shutil
import time
from functools import reduce

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _replicate_documents(spark, src_dir: str, dst_dir: str, k: int) -> None:
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    stride = (base.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    copies = []
    for i in range(k):
        c = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
        if i > 0:
            c = c.withColumn(
                "text",
                F.expr(
                    "array_join(transform(split(text, ' '), "
                    f"w -> substring(md5(concat(w, '{i}')), 1, 8)), ' ')"
                ),
            )
        copies.append(c)
    out = reduce(DataFrame.union, copies)
    out.write.mode("overwrite").parquet(os.path.join(dst_dir, "documents.parquet"))


def _replicate_embeddings(spark, src_dir: str, dst_dir: str, k: int) -> None:
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    dim = len(base.select("embedding").head()[0])
    stride = (base.agg(F.max("vec_id")).collect()[0][0] or 0) + 1
    copies = []
    for i in range(k):
        c = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * stride))
        if i > 0:
            signs = F.array(
                *[
                    F.lit(
                        1.0
                        if int(hashlib.md5(f"{i}_{d}".encode()).hexdigest(), 16) % 2
                        else -1.0
                    )
                    for d in range(dim)
                ]
            )
            c = c.withColumn(
                "embedding", F.zip_with("embedding", signs, lambda a, b: a * b)
            )
        copies.append(c)
    out = reduce(DataFrame.union, copies)
    out.write.mode("overwrite").parquet(os.path.join(dst_dir, "embeddings.parquet"))


def _build_scale_dir(spark, src_dir: str, root: str, k: int) -> str:
    dst = os.path.join(root, f"x{k}")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        os.symlink(
            os.path.join(src_dir, f"{t}.parquet"), os.path.join(dst, f"{t}.parquet")
        )
    _replicate_documents(spark, src_dir, dst, k)
    _replicate_embeddings(spark, src_dir, dst, k)
    return dst


def _fit_exponent(points: dict[int, float]) -> float:
    xs = [math.log(k) for k in sorted(points)]
    ys = [math.log(points[k]) for k in sorted(points)]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return round(num / den, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,8")
    ap.add_argument("--src", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--ops", default="", help="comma list overriding the query-op set")
    ap.add_argument("--skip-compounds", action="store_true",
                    help="skip the shared-pipeline and curation compounds")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench
    from lichess_event_stream_watcher_spark import testdata
    from lichess_event_stream_watcher_spark.pipeline import curate_corpus
    from lichess_event_stream_watcher_spark.queries import all_queries
    from lichess_event_stream_watcher_spark.session import get_spark

    registry = all_queries()  # pure-Python; validates --ops before any JVM

    # the expensive tail per BENCH_r07 + the two shared-pass compounds,
    # plus the ANN/embedding serving tail (exact kNN, LSH-bucketed ANN,
    # and the embedding near-dup pair search) so the probe covers BOTH
    # corpus-scaling families; --ops narrows the set for re-measures
    query_ops = [
        "dedup_containment",
        "dedup_lsh_band_sweep",
        "dedup_minhash_calibration",
        "knn_cosine_topk",
        "ann_lsh_topk",
        "semantic_dedup",
        # round 9: the formerly-untested tail + the production SemDeDup
        # form (SCALE.md round-9 table carries their current exponents)
        "semantic_dedup_auto",
        "ingestion_admission_counts",
        "substring_dedup",
        "bpe_merge_ranks",
    ]
    if args.ops:
        query_ops = [o for o in args.ops.split(",") if o]
    unknown = [o for o in query_ops if o not in registry]
    if unknown:
        # fail BEFORE the JVM boot and the minutes-long scale-dir build
        ap.error(f"unknown query ops: {unknown}")

    spark = get_spark("lesw-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gc() -> None:
        # drain query-registered persist() caches between measurements
        # (same contract as bench.full_gc — see operators/session_cache.py)
        from lichess_event_stream_watcher_spark.operators.session_cache import (
            release_session_caches,
        )

        release_session_caches()
        spark.sparkContext._jvm.System.gc()

    results: dict[str, dict[int, float]] = {}
    for k in scales:
        t0 = time.perf_counter()
        d = _build_scale_dir(spark, args.src, args.out, k)
        print(f"# built x{k} in {time.perf_counter() - t0:.1f}s", flush=True)
        gc()
        for name in query_ops:
            t0 = time.perf_counter()
            registry[name](spark, d).write.format("noop").mode("overwrite").save()
            results.setdefault(name, {})[k] = round(time.perf_counter() - t0, 3)
            print(f"# {name} x{k}: {results[name][k]}s", flush=True)
            gc()
        if args.skip_compounds:
            continue
        t0 = time.perf_counter()
        bench.bench_dedup_pipeline_shared(spark, d)
        results.setdefault("dedup_pipeline_shared", {})[k] = round(
            time.perf_counter() - t0, 3
        )
        print(f"# dedup_pipeline_shared x{k}: {results['dedup_pipeline_shared'][k]}s", flush=True)
        gc()
        t0 = time.perf_counter()
        stages: dict[str, float] = {}
        chunks, _ = curate_corpus(testdata.load(spark, d, "documents"), stage_seconds=stages)
        chunks.unpersist()
        results.setdefault("curation_pipeline_counts", {})[k] = round(
            time.perf_counter() - t0, 3
        )
        print(
            f"# curation_pipeline_counts x{k}: "
            f"{results['curation_pipeline_counts'][k]}s stages={json.dumps(stages)}",
            flush=True,
        )
        gc()

    # The x1 pass runs first on a cold JIT (single draws, per the probe
    # protocol), which inflates its times and UNDERSTATES the fitted
    # exponent — so publish two fits: the full fit, and a warm fit over
    # the two largest scales (both measured on a warmed JVM), which is
    # the honest headline number.
    exponents = {op: _fit_exponent(pts) for op, pts in results.items()}
    warm = {
        op: _fit_exponent({k: pts[k] for k in sorted(pts)[-2:]})
        for op, pts in results.items()
    }
    print(
        json.dumps(
            {
                "seconds": results,
                "exponents_full": exponents,
                "exponents_warm_tail": warm,
                "src": args.src,
            }
        )
    )


if __name__ == "__main__":
    main()
