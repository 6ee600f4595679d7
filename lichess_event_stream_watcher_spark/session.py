"""SparkSession factory tuned for this engine.

Defaults are sized for local[32] testing but every knob is the one you would
set on a real cluster: AQE on (runtime re-planning, skew-join splitting),
Arrow on (vectorized Python interop), modest shuffle partitions for the
test scale (raise to ~2-4x total cores at 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "lesw-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # one BLAS thread per Python worker: mapInPandas runs `cpus` workers
    # concurrently, so per-worker BLAS threading would oversubscribe `cpus`^2
    # threads (workers inherit the driver env in local mode; on a cluster set
    # spark.executorEnv.* to the same effect)
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # keep stdout machine-parseable: console progress bars write \r
        # frames that can interleave with (and truncate) the final JSON
        # line a harness captures from the stdout tail
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
