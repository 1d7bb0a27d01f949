"""Versioned table: time travel, rollback, vacuum, atomic pointer."""

from __future__ import annotations

import os

import pytest

from python_openetl_spark.plans.versioned import VersionedTable


def _df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_commit_read_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    assert t.current_version() is None
    v1 = t.commit(_df(spark, [1, 2]))
    v2 = t.commit(_df(spark, [1, 2, 3]))
    assert (v1, v2) == (1, 2)
    assert t.current_version() == 2
    assert t.read(spark).count() == 3                    # current
    assert t.read(spark, version=1).count() == 2         # time travel
    assert t.versions() == [1, 2]


def test_snapshot_isolation_scan_unaffected_by_commit(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    t.commit(_df(spark, [1, 2]))
    old_scan = t.read(spark)                 # binds to v1 at plan time
    t.commit(_df(spark, list(range(10))))
    assert old_scan.count() == 2             # racing commit invisible
    assert t.read(spark).count() == 10


def test_rollback_is_zero_copy_and_recommit_continues(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    t.commit(_df(spark, [1]))
    t.commit(_df(spark, [1, 2]))
    t.rollback(1)
    assert t.current_version() == 1
    assert t.read(spark).count() == 1
    # next commit gets a FRESH number (2 still exists as history)
    v3 = t.commit(_df(spark, [7, 8, 9]))
    assert v3 == 3
    assert t.read(spark, version=2).count() == 2
    with pytest.raises(ValueError, match="unknown version"):
        t.rollback(99)


def test_vacuum_keeps_current_and_newest(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    for k in range(1, 5):
        t.commit(_df(spark, list(range(k))))
    t.rollback(2)
    removed = t.vacuum(keep_last=2)
    # keeps v3, v4 (newest 2) and v2 (current); removes v1
    assert removed == [1]
    assert t.versions() == [2, 3, 4]
    assert t.read(spark).count() == 2        # current still readable
    with pytest.raises(ValueError):
        t.read(spark, version=1)
    assert not os.path.exists(str(tmp_path / "vt" / "v1"))


def test_changes_between_versions(spark, tmp_path):
    from python_openetl_spark.plans.versioned import VersionedTable

    vt = VersionedTable(str(tmp_path / "vt"))
    v1 = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double")
    vt.commit(v1)
    v2 = spark.createDataFrame([(1, 10.0), (2, 25.0), (4, 40.0)], "id long, v double")
    vt.commit(v2)
    got = {(r["id"], r["change_type"]) for r in vt.changes(spark, "id", 1).collect()}
    assert got == {(2, "U"), (3, "D"), (4, "I")}
    # explicit to_version + reproducibility on immutable snapshots
    again = {(r["id"], r["change_type"]) for r in vt.changes(spark, "id", 1, 2).collect()}
    assert again == got
    assert vt.changes(spark, "id", 2, 2).count() == 0
