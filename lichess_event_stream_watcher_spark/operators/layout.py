"""Data-layout sinks: hive-partitioned and range-clustered parquet writes.

At 100 TB the cheapest query is the one that never reads the data: a
partition-pruned scan touches only matching directories, and a
range-clustered file layout lets parquet row-group min/max stats skip
whole files. Neither exists in the reference (its sink is a moderation
API, src/eventhandler.rs); these are the batch-sink counterpart a
training-data pipeline needs when it persists curated corpora.

Both writers are thin, deliberate wrappers over the DataFrameWriter —
the value is encoding the layout contract (what to partition on, what to
cluster on, how to bound file counts) in one audited place instead of
ad-hoc `.write` calls per job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet: one directory per distinct
    partition-column tuple, so equality/IN filters on those columns prune
    at the FILE INDEX level (the scan's PartitionFilters — zero bytes read
    for non-matching partitions).

    Within each partition, rows are clustered by ``sort_cols`` so range
    predicates on those columns skip row groups via parquet min/max stats.
    The pre-write repartition on the partition columns gives ONE file per
    partition per shuffle-partition-with-data (instead of every task
    writing every partition — the small-files explosion).

    Choose low-cardinality columns (date, event_type, lang, source):
    directory count = product of distinct values; >100K partitions makes
    listing the bottleneck instead.
    """
    out = df.repartition(*[df[c] for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*[*partition_cols, *sort_cols])
    out.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet: a range repartition on ``cluster_cols``
    (sampled split points, contiguous non-overlapping key ranges per
    output file) + a within-partition sort. File-level and row-group
    min/max stats on the cluster columns then become DISJOINT intervals,
    so a range predicate reads only the files it intersects — the poor
    man's clustered index, with no partition-directory explosion, right
    for high-cardinality keys (timestamps, ids) where ``partitionBy``
    would create millions of directories.

    ``n_files`` bounds the output file count explicitly: size it so each
    file lands near the HDFS/object-store sweet spot (128 MB - 1 GB).
    """
    (
        df.repartitionByRange(n_files, *[df[c] for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_files: int,
    sort_cols: Sequence[str] = (),
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``target_files`` files (optionally re-clustered by ``sort_cols``).
    Streaming sinks and fine-grained partitioned writes accrete kilobyte
    files whose per-file open/footer overhead eventually dominates scan
    time; periodic compaction back to ~128 MB-1 GB files is routine
    maintenance at scale.

    Swap discipline: write to a sibling ``._compact_tmp`` dir, rename the
    live directory ASIDE (``._compact_old``), rename tmp into place, then
    delete the old copy — the dataset path is only ever missing for the
    instant between the two renames (vs delete-then-rename, which leaves a
    crash window with the data only in tmp), and a crash before the final
    cleanup leaves a recoverable ``._compact_old``. LOCAL-FILESYSTEM ONLY:
    this uses os.rename/glob, which assumes POSIX directory renames; on
    HDFS/object stores use the store's atomic-commit primitive (HDFS
    rename, Iceberg/Delta snapshot commit) instead.

    Returns the number of files before compaction. Uses coalesce (narrow,
    no shuffle) when only merging; repartitionByRange when re-sorting —
    sorting requires the shuffle anyway, so it buys the clustered layout.
    """
    import glob as _glob
    import os
    import shutil

    n_before = len(_glob.glob(os.path.join(path, "*.parquet")))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(target_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.coalesce(target_files)
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    out.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_before


def zorder_value(a, b, bits: int = 16):
    """Interleave the low ``bits`` of two non-negative int columns into a
    Morton (Z-order) key — pure Catalyst bit arithmetic, map-side. Callers
    scale/rank their columns into [0, 2^bits) first."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Two-dimensional clustering: files are contiguous runs of the
    Z-order curve over (col_a, col_b), so each file's min/max box is
    small in BOTH columns — a range predicate on EITHER column skips most
    files, where single-column range clustering only helps its own column.

    One tiny 1-row agg computes the two columns' min/max (the scaling
    denominators); everything else is the map-side Morton key + the same
    range-repartition + sort as ``write_range_clustered``. The curve is
    the poor man's multi-dim index — same idea as Delta/Databricks
    Z-ORDER, built from shiftleft/bitwiseOR primitives.
    """
    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    if lo_a is None or lo_b is None:
        # empty input: nothing to cluster; write the (empty) frame as-is
        # instead of crashing on int(None) below
        df.write.mode(mode).parquet(path)
        return
    span = (1 << bits) - 1

    def scaled(c, lo, hi):
        # divide FIRST, in double: (x-lo)*span as a bigint product
        # overflows 2^63 once the column range exceeds ~1.4e14 (e.g.
        # epoch-microsecond timestamps spanning years — exactly the
        # high-cardinality keys this exists for), and under ANSI the
        # overflow kills the whole write. The double route loses nothing
        # that matters: the quotient is in [0, 1] and the curve only
        # needs a monotonic 16-bit quantization per dimension.
        rng = max(int(hi) - int(lo), 1)
        frac = (F.col(c) - F.lit(int(lo))).cast("double") / F.lit(float(rng))
        return (frac * span).cast("long")

    z = zorder_value(scaled(col_a, lo_a, hi_a), scaled(col_b, lo_b, hi_b), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
