"""SCD2 merge and incremental-rollup semantics on small inline data."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_openetl_spark.operators.rollup import (
    incremental_rollup,
    partial_aggs,
)
from python_openetl_spark.operators.scd import scd2_init, scd2_merge

SCHEMA = "id long, city string, tier long"


def _hist(spark):
    snap = spark.createDataFrame(
        [(1, "berlin", 1), (2, "paris", 2), (3, None, 1)], SCHEMA
    )
    return scd2_init(snap, "2024-01-01 00:00:00")


def test_scd2_change_closes_and_opens(spark):
    delta = spark.createDataFrame([(1, "munich", 1)], SCHEMA)
    out = scd2_merge(_hist(spark), delta, "id", "2024-02-01 00:00:00")
    rows = {(r["id"], r["city"], r["is_current"]): r for r in out.collect()}
    closed = rows[(1, "berlin", False)]
    opened = rows[(1, "munich", True)]
    assert closed["valid_to"] is not None and opened["valid_to"] is None
    assert out.count() == 4  # 3 original versions + 1 new


def test_scd2_unchanged_row_is_noop_and_merge_idempotent(spark):
    delta = spark.createDataFrame([(2, "paris", 2)], SCHEMA)
    out = scd2_merge(_hist(spark), delta, "id", "2024-02-01 00:00:00")
    assert out.count() == 3
    again = scd2_merge(out, delta, "id", "2024-03-01 00:00:00")
    assert again.count() == 3


def test_scd2_null_transitions_are_changes(spark):
    # NULL -> value and value -> NULL must both version
    delta = spark.createDataFrame([(3, "rome", 1), (2, None, 2)], SCHEMA)
    out = scd2_merge(_hist(spark), delta, "id", "2024-02-01 00:00:00")
    cur = {r["id"]: r["city"] for r in out.filter("is_current").collect()}
    assert cur[3] == "rome" and cur[2] is None
    assert out.count() == 5


def test_scd2_new_pk_inserts_open(spark):
    delta = spark.createDataFrame([(9, "oslo", 3)], SCHEMA)
    out = scd2_merge(_hist(spark), delta, "id", "2024-02-01 00:00:00")
    row = out.filter("id = 9").collect()[0]
    assert row["is_current"] and row["valid_to"] is None


def test_scd2_duplicate_pk_delta_latest_wins(spark):
    delta = spark.createDataFrame(
        [(1, "bonn", 1, 10), (1, "koeln", 1, 20)], SCHEMA + ", ver long"
    )
    out = scd2_merge(
        _hist(spark), delta, "id", "2024-02-01 00:00:00", order_col="ver",
    )
    assert out.filter("id = 1 and is_current").collect()[0]["city"] == "koeln"
    assert out.count() == 4  # one close + one open, not one per duplicate


def test_incremental_rollup_matches_full_recompute(spark):
    spec = {"v": ["sum", "min", "max"], "id": ["count"]}
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 5), (3, "b", 7)], "id long, k string, v long"
    )
    delta = spark.createDataFrame(
        [(4, "a", 1), (5, "c", 99)], "id long, k string, v long"
    )
    rollup = partial_aggs(base, ["k"], spec)
    merged = incremental_rollup(rollup, delta, ["k"], spec)
    full = partial_aggs(base.unionByName(delta), ["k"], spec)
    got = {tuple(r) for r in merged.collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want
    assert merged.filter("k = 'c'").count() == 1  # delta-only group appears


def test_snapshot_diff_classifies_iud_and_omits_unchanged(spark):
    from python_openetl_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged -> omitted
         (2, "B", 20.0),      # updated
         (3, "c", 30.0),      # NULL -> value = updated
         (5, "e", 50.0)],     # inserted; 4 deleted
        "id long, s string, v double",
    )
    got = {r["id"]: (r["change_type"], r["s"], r["v"])
           for r in snapshot_diff(old, new, "id").collect()}
    assert got == {
        2: ("U", "B", 20.0),
        3: ("U", "c", 30.0),
        4: ("D", "d", 40.0),  # deleted rows carry OLD values
        5: ("I", "e", 50.0),
    }


def test_snapshot_diff_roundtrips_through_merge(spark):
    from python_openetl_spark.operators.merge import (
        merge_upsert, propagate_deletes, snapshot_diff,
    )

    old = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, s string"
    )
    new = spark.createDataFrame(
        [(i, f"v{i}" if i % 4 else "CH") for i in range(5, 25)], "id long, s string"
    )
    feed = snapshot_diff(old, new, "id")
    upserts = feed.filter("change_type != 'D'").drop("change_type")
    merged = merge_upsert(old, upserts, "id")
    kept, _deleted = propagate_deletes(merged, new, "id")
    # applying the feed converges the target to the new snapshot
    assert {tuple(r) for r in kept.collect()} == {tuple(r) for r in new.collect()}


def test_apply_cdc_reconstructs_new_snapshot(spark):
    from python_openetl_spark.operators.merge import apply_cdc, snapshot_diff

    old = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(30)], "id long, s string, v double"
    )
    new = spark.createDataFrame(
        [(i, "CH" if i % 7 == 0 else f"v{i}", float(i) * (2 if i % 5 == 0 else 1))
         for i in range(10, 40)],
        "id long, s string, v double",
    )
    feed = snapshot_diff(old, new, "id")
    applied = apply_cdc(old, feed, "id")
    assert {tuple(r) for r in applied.collect()} == {tuple(r) for r in new.collect()}
    # empty feed is the identity
    empty = feed.filter("1 = 0")
    assert {tuple(r) for r in apply_cdc(old, empty, "id").collect()} == {
        tuple(r) for r in old.collect()
    }
