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

from pyspark.sql import DataFrame, Window
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


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[tuple[str, int, int]],
    bucket_width: int = 65536,
) -> DataFrame:
    """EXACT type-1 quantiles of an integer value column per group, with
    bounded per-task state — the scale-safe replacement for
    ``row_number().over(partitionBy(group).orderBy(value))``, which ships
    a group's ENTIRE value multiset into one task to sort.

    ``quantiles`` is a list of (name, num, den): each target is the value
    at rank ceil(num*n/den) of the group's sorted multiset (type-1 — no
    interpolation, well-defined under ties, integer-exact).

    Two passes, both bounded by CONSTRUCTION (not by data luck):

    1. histogram: bucket = floor(value / bucket_width); groupBy(group,
       bucket).count() partial-aggregates map-side, so the exchange
       carries at most (value_range / bucket_width) tiny rows per group.
       A cumulative window over that BUCKET TABLE (never the raw rows)
       locates, for each target rank, its containing bucket and in-bucket
       offset.
    2. refine: value-counts restricted to the target buckets via a
       broadcast semi-join (map-side filter of the raw scan). Because
       values are INTEGERS, a bucket spans at most ``bucket_width``
       distinct values — so the per-(group, bucket) cumulative window in
       this pass is over <= bucket_width aggregated rows no matter how
       many raw rows the corpus holds. The answer for each target is the
       smallest value whose in-bucket cumulative count reaches the
       offset.

    "Two passes" is physical, not just logical: all targets are located
    in ONE exploded-spec pass over the bucket table, and the resulting
    target set — bounded by construction at |quantiles| x |groups| rows —
    is collected eagerly (the ``nearest_cells`` precedent: a
    bounded-by-construction driver action at compose time) so pass 2
    joins a literal frame instead of re-deriving the histogram subtree
    per consumer. Exactly 2 scans of ``df`` at any scale.

    Returns (group_col, q, n, val): one row per group per target.
    """
    spark = df.sparkSession
    # NULL values are excluded up front (SQL-quantile semantics): a NULL
    # would form a phantom first bucket that inflates n, shifts every
    # rank, and — when a target rank lands inside it — silently DROPS
    # that (group, quantile) row at the pass-2 join (round-7 review fix)
    vals = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("x")).filter(
        F.col("x").isNotNull()
    )
    bucket = F.floor(F.col("x") / F.lit(bucket_width)).cast("bigint")
    hist = vals.groupBy("g", bucket.alias("b")).agg(F.count("*").alias("c"))
    wb = Window.partitionBy("g").orderBy("b")
    hist = hist.select(
        "g",
        "b",
        (F.sum("c").over(wb) - F.col("c")).alias("cum_before"),
        F.sum("c").over(wb).alias("cum_incl"),
        F.sum("c").over(Window.partitionBy("g")).alias("n"),
    )
    spec = F.array(
        *[
            F.struct(
                F.lit(name).alias("q"),
                F.lit(num).alias("num"),
                F.lit(den).alias("den"),
            )
            for name, num, den in quantiles
        ]
    )
    rank = F.expr("(s.num * n + s.den - 1) div s.den")
    target_rows = (
        hist.select("g", "b", "cum_before", "cum_incl", "n", F.explode(spec).alias("s"))
        .withColumn("rank", rank)
        .filter((F.col("cum_before") < F.col("rank")) & (F.col("rank") <= F.col("cum_incl")))
        .select(
            "g",
            F.col("s.q").alias("q"),
            "b",
            (F.col("rank") - F.col("cum_before")).alias("off"),
            "n",
        )
        .collect()
    )
    targets = spark.createDataFrame(
        [(r.g, r.q, r.b, r.off, r.n) for r in target_rows],
        hist.select(
            "g", F.lit("q").alias("q"), "b", F.col("n").alias("off"), "n"
        ).schema,
    )
    vc = (
        vals.withColumn("b", bucket)
        .join(F.broadcast(targets.select("g", "b").distinct()), ["g", "b"])
        .groupBy("g", "b", "x")
        .agg(F.count("*").alias("c"))
    )
    wv = Window.partitionBy("g", "b").orderBy("x")
    vc = vc.select("g", "b", "x", F.sum("c").over(wv).alias("cum"))
    return (
        F.broadcast(targets).join(vc, ["g", "b"])
        .filter(F.col("cum") >= F.col("off"))
        .groupBy(F.col("g").alias(group_col), "q", "n")
        .agg(F.min("x").alias("val"))
    )


def grouped_topk_threshold(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    k: int,
    n_salts: int = 4096,
    descending: bool = False,
) -> DataFrame:
    """Exact per-group top-k rows by lexicographic ``order_cols``
    ascending, with bounded per-task state — the general-key sibling of
    ``kmin_hashes`` (same threshold-pruning proof, structs instead of
    integer hashes).

    1. rows salt arbitrarily (any assignment preserves the bound) and
       each (group, salt) reduces to its MIN order-key struct — a
       map-side partial min, so the exchange carries one tiny struct per
       group x salt x partition.
    2. the k-th smallest of a group's salt-minima bounds the group's
       true k-th smallest key from above (k salts own a value <= it);
       groups with fewer than k non-empty salts keep a NULL threshold =
       keep everything (only possible when the group is itself of order
       n_salts rows, by salt uniformity).
    3. the raw input filters map-side against the broadcast threshold
       (~O(k) expected survivors per group); ranking runs as a window
       over the SURVIVORS only, never the raw group.

    ``descending=True`` ranks by the key DESCENDING (top-k largest): the
    same proof with max-partials and the k-th LARGEST salt-max as a
    lower bound.

    WHEN TO USE: low-cardinality groups (rules, sources, event types)
    whose per-group cardinality can be huge — the case where a plain
    per-group rank window concentrates one group in one task. For
    HIGH-cardinality groups with small per-group row counts (per-user
    top-k), the plain window is already the right shape: parallelism =
    group count, and this primitive's per-group threshold table would be
    an UNBOUNDED broadcast there.

    Returns the input rows (original columns) of each group's top-k plus
    an ``rk`` rank column (1-based, ties broken by the order key itself
    being total — callers must pass a tie-breaking final column).
    ``order_cols`` must be non-null (struct min/max and comparisons treat
    NULL fields engine-specifically; every current caller keys on
    non-null hashes/ids/timestamps).
    """
    if n_salts < k:
        raise ValueError(f"n_salts ({n_salts}) must be >= k ({k})")
    key = F.struct(*[F.col(c) for c in order_cols])
    # pmod alone: it already returns a non-negative result for negative
    # inputs, and abs(hash(...)) throws ARITHMETIC_OVERFLOW under ANSI
    # (the Spark 4 session default) for the one key in 2^32 that hashes
    # to Integer.MIN_VALUE — deterministic for that key, so retries die
    # too (round-7 review fix)
    salted = df.withColumn("_key", key).withColumn(
        "_salt", F.pmod(F.hash(*order_cols), F.lit(n_salts))
    )
    extremum = F.max("_key") if descending else F.min("_key")
    mins = salted.groupBy(group_col, "_salt").agg(extremum.alias("_m"))
    ms = F.array_sort(F.collect_list("_m"))
    if descending:
        ms = F.reverse(ms)
    thr = (
        mins.groupBy(group_col)
        .agg(F.slice(ms, 1, k).alias("_ms"))
        .select(
            group_col,
            F.when(F.size("_ms") >= k, F.element_at("_ms", k)).alias("_thr"),
        )
    )
    passes = (
        (F.col("_key") >= F.col("_thr"))
        if descending
        else (F.col("_key") <= F.col("_thr"))
    )
    surv = (
        salted.join(F.broadcast(thr), group_col)
        .filter(F.col("_thr").isNull() | passes)
        .drop("_salt", "_thr")
    )
    direction = F.desc if descending else F.asc
    w = Window.partitionBy(group_col).orderBy(*[direction(c) for c in order_cols])
    return (
        surv.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("_key")
    )


def hll_register_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m: int = 256,
) -> DataFrame:
    """HyperLogLog register aggregation per group over 32-bit md5 draws —
    the CONSTANT-state cousin of ``kmin_hashes`` (KMV keeps k hashes; HLL
    keeps m 5-bit registers, period).

    The hash is the first 8 md5-hex chars of ``'hll|' || value`` (a pure
    function both engines compute identically); the low ``log2(m)`` bits
    pick the register, the remaining ``32 - log2(m)`` bits scan for the
    leading 1 (rho). Register state is ``max(rho)`` per (group, register)
    — a perfect map-side partial aggregate whose exchange carries at most
    m tiny rows per group NO MATTER the input cardinality: this is the
    physical realization of the sketch's own bounded-memory contract,
    with zero windows, zero UDFs, zero driver actions.

    Returns one row per group: ``zeros`` (registers never hit) and ``N``
    (the integer-exact harmonic-mean denominator sum(2^(P - M_j)) over
    all m registers, absent registers counting M=0), from which the
    standard bias-corrected / linear-counting estimate is a single
    deterministic division (see ``hll_distinct_sketch``). rho arithmetic
    runs on binary STRINGS (bin + lpad + instr) so the DuckDB oracle can
    replay it character-for-character.
    """
    if m & (m - 1) or m < 2:
        raise ValueError(f"m must be a power of two >= 2, got {m}")
    p = m.bit_length() - 1
    width = 32 - p  # bits scanned for the leading 1
    big_p = width + 1  # rho of an all-zero suffix
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll|"), F.col(value_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    # NULL values hash to a NULL register: groupBy keeps the NULL-reg
    # row, inflating nregs by one and corrupting zeros AND N (by exactly
    # one absent-register 2^big_p term) for the whole group — exclude
    # NULLs up front like every count-distinct semantic does (round-7
    # review fix)
    rows = df.select(F.col(group_col).alias("g"), h.alias("h")).filter(
        F.col("h").isNotNull()
    )
    w = F.expr(f"h div {m}")
    rho = (
        F.when(w == 0, F.lit(big_p))
        .otherwise(F.instr(F.lpad(F.bin(w), width, "0"), "1"))
        .cast("int")
    )
    regs = (
        rows.select("g", F.pmod(F.col("h"), F.lit(m)).alias("reg"), rho.alias("rho"))
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("M"))
    )
    weight = F.expr(f"shiftleft(cast(1 as bigint), cast({big_p} - M as int))")
    return (
        regs.groupBy("g")
        .agg(F.sum(weight).alias("n_present"), F.count("*").alias("nregs"))
        .select(
            F.col("g").alias(group_col),
            (F.lit(m) - F.col("nregs")).cast("bigint").alias("zeros"),
            (
                F.col("n_present")
                + (F.lit(m) - F.col("nregs"))
                * F.lit(1 << big_p).cast("bigint")
            ).alias("N"),
        )
    )


def cms_estimates(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Count-Min-Sketch frequency estimates for every distinct key of
    ``df`` — sketch state is d*w counters REGARDLESS of key cardinality.

    Row i's bucket for a key is the first 8 md5-hex chars of
    ``'i|' || key`` mod w (i a literal, so both engines agree). Build:
    each input row posexplodes to its d (row, bucket) cells and ONE
    groupBy sums them — map-side partial combine means the exchange
    carries at most d*w rows per input partition. Probe: the distinct
    keys recompute their cells map-side and join the d*w-row sketch
    BROADCAST (never a shuffle of the probe side by sketch key), then
    take min over the d rows. Estimates are deterministic integers
    (over-counts only: est >= true count, the CMS one-sided guarantee).
    """
    buckets = F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{i}|"), F.col(key_col).cast("string")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(w),
            )
            for i in range(d)
        ]
    )
    cells = df.select(F.posexplode(buckets).alias("i", "b"))
    sketch = cells.groupBy("i", "b").agg(F.count("*").alias("c"))
    probe = (
        df.select(key_col)
        .distinct()
        .select(key_col, F.posexplode(buckets).alias("i", "b"))
    )
    return (
        probe.join(F.broadcast(sketch), ["i", "b"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est_count"))
    )
