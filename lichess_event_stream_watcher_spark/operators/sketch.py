"""Bounded-state distributed sketch primitives.

The KMV (k-minimum-values) distinct-count sketch's defining property is
that its state is k hashes per group NO MATTER how many distinct values
exist.  A naive Spark realization — ``row_number().over(Window.partitionBy
(group).orderBy(h))`` — betrays that contract physically: it ships every
distinct hash of a group into ONE task and sorts there, so one hot group
at 10^9 distinct values means one straggler sorting 10^9 rows, with
parallelism capped at the group count.

``kmin_hashes`` below computes the exact k smallest DISTINCT hashes per
group with bounded state through every exchange, via classic threshold
pruning (the same trick as distributed top-k with a first-pass bound):

1. salt each hash by value (``h % n_salts``) and take ``min(h)`` per
   (group, salt).  ``min`` partial-aggregates perfectly map-side, so the
   exchange carries at most one tiny row per (group, salt, input
   partition) — never the raw rows.
2. the k-th smallest of a group's salt-minima is a PROVABLE upper bound
   on the group's true k-th smallest distinct hash: the k salts owning
   the k smallest minima each contain at least one value <= that bound,
   so at least k values do.  (With fewer than k non-empty salts the bound
   falls back to +inf — only possible when the group's distinct count is
   itself tiny of order n_salts, by hash uniformity.)
3. broadcast the per-group threshold, filter the raw input map-side
   (survivors ~ O(k) expected per group by uniformity of the hash),
   dedup the survivors, and merge the k smallest in one tiny aggregate.

Every step is pure Catalyst (no window over raw data, no Python), exact
(no dependence on partitioning), and the only full-input pass is a
map-side filter.  Result is identical to the row_number form row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmin_hashes(
    df: DataFrame,
    group_col: str,
    hash_col: str,
    k: int,
    hash_ceiling: int,
    n_salts: int = 4096,
) -> DataFrame:
    """Exact k smallest distinct ``hash_col`` values per ``group_col`` as
    a sorted array column ``ks`` — the KMV sketch state, computed with
    bounded per-task state (see module docstring for the proof sketch).

    ``hash_ceiling`` must be any value >= every hash (used as the +inf
    fallback threshold when a group has fewer than k non-empty salts).
    ``n_salts`` trades pass-1 exchange size (more salts = more minima
    rows) against pass-2 survivor count (more salts = tighter threshold);
    it must be >= k for the threshold to ever engage.
    """
    if n_salts < k:
        raise ValueError(f"n_salts ({n_salts}) must be >= k ({k})")
    g, h = F.col(group_col), F.col(hash_col)
    hashed = df.select(g.alias("g"), h.alias("h"))
    mins = (
        hashed.withColumn("salt", F.pmod(F.col("h"), F.lit(n_salts)))
        .groupBy("g", "salt")
        .agg(F.min("h").alias("m"))
    )
    # k-th smallest salt-min per group (<= n_salts rows per group in)
    thr = (
        mins.groupBy("g")
        .agg(F.slice(F.array_sort(F.collect_list("m")), 1, k).alias("ms"))
        .select(
            "g",
            F.when(F.size("ms") >= k, F.element_at("ms", k))
            .otherwise(F.lit(hash_ceiling).cast("bigint"))
            .alias("thr"),
        )
    )
    # map-side prune of the raw input; dedup only the ~O(k) survivors
    surv = (
        hashed.join(F.broadcast(thr), "g")
        .filter(F.col("h") <= F.col("thr"))
        .select("g", "h")
        .distinct()
    )
    return (
        surv.groupBy("g")
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("ks"))
        .select(F.col("g").alias(group_col), "ks")
    )
