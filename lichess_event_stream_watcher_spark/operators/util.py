"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Ensure at least defaultParallelism partitions for CPU-heavy map work.

    Tiny local inputs (single-row-group parquet) arrive as ONE unsplittable
    partition, serializing per-row compute on one core. At real scale the
    scan has >= cores splits and this is a no-op — the repartition (a cheap
    round-robin of the raw rows) only fires on under-split inputs.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
