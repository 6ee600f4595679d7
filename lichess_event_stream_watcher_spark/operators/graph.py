"""Graph analytics over pair/edge DataFrames (the near-dup pair graph is
the in-repo producer; any (src, dst) edge list works).

Distributed shapes:

- **triangle counting**: the two-path join — edges ordered src < dst,
  join e1.dst = e2.src, then close the wedge with a third edge-table
  join. Two shuffle joins total; the ordering constraint counts each
  triangle exactly once and caps the wedge fanout at the high-degree
  node's ordered degree (the standard compact-forward trick).
- **PageRank**: the canonical iterative join+agg — contributions =
  rank/out-degree joined to edges, new rank = damped sum, lineage
  truncated per round with localCheckpoint (same pattern as
  dedup.dup_components). Fixed iteration count keeps it deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangles(edges: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Distinct triangles (x < y < z) in an undirected edge list.

    Output: (x, y, z), one row per triangle. Input edges may carry either
    orientation and duplicates; they are canonicalized (min, max) and
    deduped first.
    """
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("x"), F.greatest(F.col(a), F.col(b)).alias("y")
        )
        .filter(F.col("x") != F.col("y"))
        .distinct()
    )
    e1 = e.select(F.col("x"), F.col("y"))
    e2 = e.select(F.col("x").alias("y"), F.col("y").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")  # x < y < z by construction
    closing = e.select(F.col("x"), F.col("y").alias("z"))
    return wedges.join(closing, ["x", "z"]).select("x", "y", "z")


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    a: str = "id_a",
    b: str = "id_b",
    iters: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank on the undirected graph (each edge contributes both
    directions). Isolated nodes keep the teleport mass. Fixed ``iters``
    (deterministic); each round is one join (ranks onto edges) + one agg
    (sum contributions per dst); lineage is cut with a localCheckpoint
    every ``checkpoint_every`` rounds (round-10; per-round eager
    checkpoints serialized ``iters`` driver-blocking jobs and
    materialized the full rank table every round — a cadence of 3 fuses
    3 join+agg rounds per job, so the rank table materializes ~iters/3
    times while each round's arithmetic still runs exactly once; plan
    depth stays bounded at 3 rounds). Dangling mass is irrelevant here:
    undirected expansion gives every non-isolated node out-degree >= 1.

    Output: (id, rank), sum(rank) ~ n_nodes (teleport-normalized form).
    """
    from .util import persisted_rdd_ids, unpersist_rdd_ids

    n = nodes.select(F.col(id_col).alias("id")).distinct()
    und = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count("*").alias("deg"))
    # the (src, dst, deg) expansion is iteration-INVARIANT: fold the
    # degree join in once and persist, or every round re-runs the
    # union+distinct shuffle and the degree join from scratch (10
    # iterations = 10 redundant edge shuffles)
    und_deg = und.join(deg, "src").persist()
    # materialize the cache BEFORE the loop: persist() only registers its
    # RDD at first materialization, which otherwise happens inside round
    # 1's eager checkpoint — i.e. inside the before/after id-diff window
    # below — so round 2's cleanup would unpersist und_deg's cache and
    # rounds 3..iters would re-run the edge expansion every round
    # (round-7 review fix; results were correct, the persist was just
    # silently dead after round 1)
    und_deg.count()
    ranks = n.select("id", F.lit(1.0).alias("rank"))
    rank_ids: set[int] = set()
    for i in range(iters):
        contrib = (
            und_deg.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = n.join(sums, "id", "left").select(
            "id",
            (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("s", F.lit(0.0))).alias(
                "rank"
            ),
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            before = persisted_rdd_ids(edges)
            # eager: the checkpoint materializes, so the checkpoint it read
            # from can be unpersisted immediately instead of all cuts
            # piling up in storage until the caller's final action
            ranks = ranks.localCheckpoint(eager=True)
            unpersist_rdd_ids(edges, rank_ids)
            rank_ids = persisted_rdd_ids(edges) - before
    und_deg.unpersist()  # final ranks are checkpointed; edges can go
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def k_core(
    edges: DataFrame,
    k: int,
    a: str = "id_a",
    b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Nodes of the k-core: iteratively peel nodes with degree < k until
    the fixpoint. Each round is one degree agg + one semi join, with a
    localCheckpoint lineage cut and ONE tiny count action to detect
    convergence (node count is monotone decreasing, so ``max_iter`` is a
    backstop, not the driver). Returns (id,) of surviving nodes.
    """
    from .util import persisted_rdd_ids, unpersist_rdd_ids

    base = persisted_rdd_ids(edges)
    e = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur_ids = persisted_rdd_ids(edges) - base  # current e's checkpoint
    prev_ids: set[int] = set()  # generation the current one was derived from
    prev = -1
    for _ in range(max_iter):
        deg = e.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        n = keep.count()  # materializes e's pending checkpoint
        # e is now self-contained: the generation it read from is
        # superseded and leaves storage (long-lived sessions must not
        # accrete one persisted RDD per peel round)
        unpersist_rdd_ids(edges, prev_ids)
        prev_ids = set()
        if n == prev:
            break
        prev = n
        before = persisted_rdd_ids(edges)
        e = (
            e.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
        prev_ids, cur_ids = cur_ids, persisted_rdd_ids(edges) - before
    return e.select(F.col("src").alias("id")).distinct()


def pagerank_quantized(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    a: str = "id_a",
    b: str = "id_b",
    iters: int = 10,
    quant: int = 1_000_000,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Integer-quantized PageRank (damping fixed at the rational 85/100):
    ranks live in micro-units, each edge contribution is the integer
    division (rank_q * 85) div (100 * deg), and a round's new rank is
    0.15*quant + the integer sum of contributions.

    Same distributed shape as ``pagerank`` (one join + one agg per round,
    localCheckpoint lineage cuts every ``checkpoint_every`` rounds — see
    pagerank for the round-10 cadence rationale — superseded checkpoints
    unpersisted). The
    point of quantizing: every per-round sum is an INTEGER sum —
    order-independent, so the full 10-iteration fixpoint is bit-identical
    across engines, partitionings and shuffle orders, and the driver gets
    a FULL hash check (the float variant is rows-only: cross-engine float
    summation differs in last-ulp order). Precision cost vs float: each
    edge floor loses < 1 micro-unit per round — bounded by
    iters * max_degree micro-units, noise at rank scale 1e6.

    Output: (id, rank_q) — divide by ``quant`` for the float-scale rank.
    """
    from .util import persisted_rdd_ids, unpersist_rdd_ids

    n = nodes.select(F.col(id_col).alias("id")).distinct()
    und = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count("*").alias("deg"))
    # iteration-invariant edge expansion persisted once; materialized
    # BEFORE the loop so its cache id never lands in the checkpoint
    # cleanup's id-diff window (see pagerank)
    und_deg = und.join(deg, "src").persist()
    und_deg.count()
    teleport = (quant * 15) // 100
    ranks = n.select("id", F.lit(quant).cast("bigint").alias("rank_q"))
    rank_ids: set[int] = set()
    for i in range(iters):
        contrib = (
            und_deg.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("(rank_q * 85) div (100 * deg)").alias("c"),
            )
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = n.join(sums, "id", "left").select(
            "id",
            (F.lit(teleport) + F.coalesce("s", F.lit(0)))
            .cast("bigint")
            .alias("rank_q"),
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            before = persisted_rdd_ids(edges)
            ranks = ranks.localCheckpoint(eager=True)
            unpersist_rdd_ids(edges, rank_ids)
            rank_ids = persisted_rdd_ids(edges) - before
    und_deg.unpersist()
    return ranks
