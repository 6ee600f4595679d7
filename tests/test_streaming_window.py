"""The tumbling-window rollup's streaming twin: the same aggregation
expression under readStream + watermark produces exactly the batch
result once the stream drains (availableNow), proving the batch query
IS the streaming query — one code shape, two execution modes."""

from __future__ import annotations

from pyspark.sql import functions as F

from lichess_event_stream_watcher_spark import testdata


def _rollup(df):
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def test_windowed_rollup_stream_equals_batch(spark, sf_dir, tmp_path):
    # watermarks require TIMESTAMP (tz-aware); the parquet ts is NTZ
    ev = testdata.load(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    land = str(tmp_path / "landing")
    # micro-batches arrive in event-time order per file; watermark 1h
    ev.repartitionByRange(4, "ts").write.parquet(land)

    batch = {tuple(r) for r in _rollup(ev).collect()}

    stream = (
        spark.readStream.schema(spark.read.parquet(land).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
        .withWatermark("ts", "1 hour")
    )
    q = (
        _rollup(stream)
        .writeStream.format("memory")
        .queryName("win_rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM win_rollup").collect()}
    assert got == batch


def _pin_arrival_order(land: str) -> None:
    """Make micro-batch arrival order deterministic AND event-time-ordered:
    the file source processes oldest-modification-time first, and
    repartitionByRange names part files in ascending ts-range order — so
    stamping ascending mtimes in filename order guarantees no micro-batch
    ever carries data older than the advancing watermark (otherwise the
    4 files land with effectively random mtimes and a late file's
    sessions are — correctly — dropped, making the assertion flaky)."""
    import os
    import time

    parts = sorted(
        os.path.join(land, f) for f in os.listdir(land) if f.startswith("part-")
    )
    base = time.time() - len(parts) - 10
    for i, f in enumerate(parts):
        os.utime(f, (base + i, base + i))


def test_session_window_stream_equals_batch(spark, sf_dir, tmp_path):
    """The gap-based session window under readStream + watermark (append
    mode — sessions emit once finalized past the watermark) must produce
    exactly the batch result once the stream drains: merging of
    micro-batch-split sessions is the stateful behavior being proven."""
    ev = (
        testdata.load(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("user_id") % 7 == 0)
    )
    land = str(tmp_path / "landing")
    ev.repartitionByRange(4, "ts").write.parquet(land)
    _pin_arrival_order(land)

    def rollup(df):
        return (
            df.groupBy(
                F.session_window("ts", "30 minutes").alias("sw"), "user_id"
            )
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("sw.start").alias("sess_start"),
                F.col("sw.end").alias("sess_end"),
                "user_id",
                "n_events",
            )
        )

    batch = {tuple(r) for r in rollup(ev).collect()}

    stream = (
        spark.readStream.schema(spark.read.parquet(land).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
        .withWatermark("ts", "1 hour")
    )
    q = (
        rollup(stream)
        .writeStream.format("memory")
        .queryName("sess_rollup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM sess_rollup").collect()}
    # append mode only emits sessions finalized BEFORE the final watermark;
    # the last events' sessions never finalize in a drained run
    assert got, "no finalized sessions emitted"
    assert got <= batch
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    horizon = max_ts - dt.timedelta(hours=1)
    finalized_batch = {t for t in batch if t[1] <= horizon}
    assert finalized_batch <= got
