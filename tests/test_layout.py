"""Layout-sink contracts: partition pruning reaches the file index, and
range clustering yields disjoint per-file min/max intervals (the property
row-group skipping needs). Asserted against real written files — the plan
string for pruning, the parquet footers (via pyarrow) for clustering."""

from __future__ import annotations

import glob
import re

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from lichess_event_stream_watcher_spark import testdata
from lichess_event_stream_watcher_spark.operators.layout import (
    write_partitioned,
    write_range_clustered,
)


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_scan(spark, sf_dir, tmp_path):
    events = testdata.load(spark, sf_dir, "events")
    path = str(tmp_path / "by_type")
    write_partitioned(events, path, ["event_type"], sort_cols=["ts"])

    back = spark.read.parquet(path).filter(F.col("event_type") == "signup")
    p = plan_str(back)
    # the filter must land in PartitionFilters (directory pruning),
    # not PushedFilters (row-group pruning after listing everything)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m and "event_type" in m.group(1), p
    n_types = events.select("event_type").distinct().count()
    m = re.search(r"PartitionCount: (\d+)", p)
    if m:  # Spark prints it for partitioned file indexes
        assert int(m.group(1)) == 1 < n_types, p
    # correctness: partition column round-trips
    assert back.count() == events.filter(F.col("event_type") == "signup").count()


def test_partitioned_write_bounds_file_count(spark, sf_dir, tmp_path):
    events = testdata.load(spark, sf_dir, "events")
    path = str(tmp_path / "files")
    write_partitioned(events, path, ["event_type"])
    n_types = events.select("event_type").distinct().count()
    files = glob.glob(f"{path}/event_type=*/*.parquet")
    # pre-write repartition on the partition key => one file per partition
    # (not one per task per partition — the small-files explosion)
    assert len(files) == n_types, files


def test_range_clustered_files_are_disjoint(spark, sf_dir, tmp_path):
    li = testdata.load(spark, sf_dir, "lineitem")
    path = str(tmp_path / "ranged")
    write_range_clustered(li, path, ["l_shipdate"], n_files=8)

    intervals = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        i = cols["l_shipdate"]
        lo = min(md.row_group(g).column(i).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(i).statistics.max for g in range(md.num_row_groups))
        intervals.append((lo, hi))
    assert len(intervals) >= 2  # the range partitioner actually fanned out
    intervals.sort()
    for (_, hi_prev), (lo_next, _) in zip(intervals, intervals[1:]):
        assert hi_prev <= lo_next, intervals  # disjoint => file-level skipping
    # and the layout round-trips all rows
    assert spark.read.parquet(path).count() == li.count()


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    from lichess_event_stream_watcher_spark.operators.layout import compact_parquet

    events = testdata.load(spark, sf_dir, "events")
    path = str(tmp_path / "shattered")
    n = events.count()
    events.repartition(32).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 32
    n_before = compact_parquet(spark, path, target_files=4)
    assert n_before == 32
    assert len(glob.glob(f"{path}/*.parquet")) <= 4
    assert spark.read.parquet(path).count() == n
    # re-clustering variant: sorted files with disjoint ts ranges
    compact_parquet(spark, path, target_files=3, sort_cols=["ts"])
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) <= 3
    assert spark.read.parquet(path).count() == n


def test_zorder_write_localizes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering: per-file min/max boxes are small in BOTH
    columns, so range predicates on EITHER column skip files — the
    property single-column range clustering only gives its own column
    (where every file spans the other column fully)."""
    from lichess_event_stream_watcher_spark.operators.layout import (
        write_zorder_clustered,
    )

    li = testdata.load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    path = str(tmp_path / "zorder")
    write_zorder_clustered(li, path, "l_partkey", "l_suppkey", n_files=8)

    spans = {"l_partkey": [], "l_suppkey": []}
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for name in spans:
            i = cols[name]
            lo = min(md.row_group(g).column(i).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(i).statistics.max for g in range(md.num_row_groups))
            spans[name].append((lo, hi))
    assert all(len(v) >= 4 for v in spans.values())
    for name, boxes in spans.items():
        glo = max(h for _, h in boxes) - min(l for l, _ in boxes)
        fracs = [(h - l) / glo for l, h in boxes]
        # calibrated on the driver data (observed ~0.57 / ~0.32 means):
        # every dimension's mean span is well under full-width, and not
        # every file spans the whole dimension
        assert sum(fracs) / len(fracs) <= 0.8, (name, fracs)
        assert min(fracs) < 0.9, (name, fracs)
    assert spark.read.parquet(path).count() == li.count()


def test_zorder_survives_huge_ranges_and_empty_input(spark, tmp_path):
    """Round-7 review fix: the Morton scaling divides FIRST in double —
    the old (x-lo)*span bigint product overflowed (ANSI: job-killing)
    once a column range passed ~1.4e14, e.g. epoch-micros keys; and an
    empty frame writes empty instead of crashing on int(None)."""
    from lichess_event_stream_watcher_spark.operators.layout import (
        write_zorder_clustered,
    )

    big = spark.createDataFrame(
        [(0, 0), (10**18, 10**18), (5 * 10**17, 1)], "a long, b long"
    )
    p1 = str(tmp_path / "zo_big")
    write_zorder_clustered(big, p1, "a", "b", n_files=2)
    assert spark.read.parquet(p1).count() == 3

    empty = spark.createDataFrame([], "a long, b long")
    p2 = str(tmp_path / "zo_empty")
    write_zorder_clustered(empty, p2, "a", "b", n_files=2)
    assert spark.read.parquet(p2).count() == 0
