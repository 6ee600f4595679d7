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
