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
