"""Profiler, binned range join, and table compaction semantics."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from python_openetl_spark.operators.profile import profile
from python_openetl_spark.operators.rangejoin import binned_interval_join
from python_openetl_spark.plans.pipelines import ParquetTable


def test_profile_counts_nulls_distincts_ranges(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, -2.0), (3, "b", 8.0)],
        "id long, s string, v double",
    )
    p = {r["col_name"]: r for r in profile(df).collect()}
    assert p["id"]["n_rows"] == 4 and p["id"]["n_nulls"] == 0
    assert p["id"]["n_distinct"] == 3
    assert p["s"]["n_nulls"] == 1 and p["s"]["n_distinct"] == 2
    assert p["v"]["min_value"] == -2.0 and p["v"]["max_value"] == 8.0
    assert p["s"]["min_value"] is None  # non-numeric: no range
    approx = {r["col_name"]: r for r in profile(df, approx=True).collect()}
    assert approx["id"]["n_rows"] == 4  # sketch path runs


def test_binned_join_equals_broadcast_theta_join(spark):
    rng = random.Random(7)
    points = spark.createDataFrame(
        [(i, rng.uniform(-50.0, 150.0)) for i in range(500)], "pid long, x double"
    )
    ivs = [(float(lo), float(lo + rng.randint(1, 40)), f"iv{j}")
           for j, lo in enumerate(rng.sample(range(-60, 140), 25))]
    intervals = spark.createDataFrame(ivs, "lo double, hi double, name string")
    binned = binned_interval_join(
        points, intervals, "x", "lo", "hi", bin_width=10.0
    ).select("pid", "name")
    naive = points.join(
        F.broadcast(intervals),
        (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")),
    ).select("pid", "name")
    assert {tuple(r) for r in binned.collect()} == {tuple(r) for r in naive.collect()}


def test_binned_join_left_keeps_unmatched_points(spark):
    points = spark.createDataFrame([(1, 5.0), (2, 500.0)], "pid long, x double")
    intervals = spark.createDataFrame([(0.0, 10.0, "a")], "lo double, hi double, name string")
    out = binned_interval_join(points, intervals, "x", "lo", "hi", bin_width=5.0, how="left")
    rows = {r["pid"]: r["name"] for r in out.collect()}
    assert rows == {1: "a", 2: None}


def test_binned_join_guards_unbounded_intervals(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid long, x double")
    intervals = spark.createDataFrame(
        [(0.0, 1e12, "huge")], "lo double, hi double, name string"
    )
    with pytest.raises(Exception, match="bins"):
        binned_interval_join(
            points, intervals, "x", "lo", "hi", bin_width=1.0,
            max_bins_per_interval=100,
        ).collect()


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    tbl = ParquetTable(path)
    df = spark.range(10_000).withColumn("k", F.col("id") % 13)
    tbl.overwrite(df.repartition(16))
    before = sum(1 for n in os.listdir(path) if n.endswith(".parquet"))
    assert before == 16
    n_files = tbl.compact(spark, num_files=2)
    assert n_files == 2
    assert tbl.read(spark).count() == 10_000


def test_compact_sorted_layout_prunes(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    tbl = ParquetTable(path)
    tbl.overwrite(spark.range(50_000).withColumn("k", (F.col("id") * 37) % 1000).repartition(8))
    tbl.compact(spark, num_files=4, sort_by=["k"])
    out = tbl.read(spark)
    assert out.count() == 50_000
    # range-partitioned by k: each file holds a disjoint k range
    files = out.select(F.col("k"), F.input_file_name().alias("f"))
    spans = files.groupBy("f").agg(F.min("k").alias("lo"), F.max("k").alias("hi")).collect()
    spans = sorted([(r["lo"], r["hi"]) for r in spans])
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """After a z-order rewrite on (x, y), every file covers a small
    rectangle in BOTH dimensions — the property single-column sort
    cannot give (sorting by x leaves y's per-file range ≈ global)."""
    path = str(tmp_path / "ztbl")
    tbl = ParquetTable(path)
    # 64x64 uniform grid, shuffled across 8 input files
    df = spark.range(4096).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("long").cast("double").alias("y"),
        F.col("id").alias("payload"),
    )
    tbl.overwrite(df.repartition(8))
    n = tbl.compact(spark, num_files=32, zorder_by=["x", "y"])
    assert n == 32
    out = tbl.read(spark)
    assert out.count() == 4096
    spans = (
        out.select("x", "y", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
        )
        .collect()
    )
    avg_xr = sum(r["xr"] for r in spans) / len(spans)
    avg_yr = sum(r["yr"] for r in spans) / len(spans)
    # global range is 63 per dim; 32 z-ordered files of a 64x64 grid each
    # cover ~1-2 morton tiles (≤ ~16x16 straddled bounding box). A
    # single-column sort would leave the other dimension at ~63.
    assert avg_xr < 0.5 * 63, (avg_xr, avg_yr)
    assert avg_yr < 0.5 * 63, (avg_xr, avg_yr)


def test_zorder_key_monotone_in_buckets(spark):
    """Rows identical in all but one dimension order by that dimension
    (bit interleaving preserves per-dimension monotonicity)."""
    from python_openetl_spark.plans.zorder import zorder_key

    df = spark.range(256).select(
        F.col("id").cast("double").alias("x"),
        F.lit(0.0).alias("y"),
    )
    keyed = df.withColumn("z", zorder_key(df, ["x", "y"], bits=4)).collect()
    rows = sorted(keyed, key=lambda r: r["x"])
    zs = [r["z"] for r in rows]
    assert zs == sorted(zs)
