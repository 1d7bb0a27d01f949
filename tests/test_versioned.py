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


def test_clone_deep_and_shallow_lifecycle(spark, tmp_path):
    """m21's operator contract: clones carry history + tokens and
    evolve independently; a shallow clone is zero-copy (borrowed
    absolute dirs) and its vacuum never deletes the source's files;
    cloning into a non-empty destination refuses."""
    import os

    import pytest as _pytest

    from python_openetl_spark.plans.versioned import VersionedTable

    src = VersionedTable(str(tmp_path / "src"))
    df1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    df2 = spark.createDataFrame([(1, 11.0), (2, 20.0), (3, 30.0)], "id long, v double")
    src.commit(df1, txn="t1")
    src.commit(df2)

    deep = src.clone(str(tmp_path / "deep"))
    shallow = src.clone(str(tmp_path / "shallow"), shallow=True)
    assert deep.versions() == shallow.versions() == src.versions() == [1, 2]
    assert deep.has_txn("t1") and shallow.has_txn("t1")  # tokens survive
    # zero-copy: shallow wrote no version directories of its own
    assert not any(
        d.startswith("v") for d in os.listdir(str(tmp_path / "shallow"))
    )
    # independent evolution: the deep clone commits; source unmoved
    deep.commit(spark.createDataFrame([(9, 90.0)], "id long, v double"))
    assert deep.current_version() == 3 and src.current_version() == 2
    assert src.read(spark).count() == 3
    assert shallow.read(spark).count() == 3  # borrowed v2
    # shallow vacuum drops borrowed refs from ITS pointer but never
    # deletes the source's files
    shallow.commit(spark.createDataFrame([(8, 80.0)], "id long, v double"))
    removed = shallow.vacuum(keep_last=1)
    assert removed == [1, 2]
    assert src.read(spark, version=1).count() == 2  # source v1 intact
    assert src.read(spark, version=2).count() == 3
    # time travel on the deep clone reaches copied history
    assert deep.read(spark, version=1).count() == 2
    with _pytest.raises(ValueError, match="not empty"):
        src.clone(str(tmp_path / "deep"))


def test_deep_clone_localizes_borrowed_versions(spark, tmp_path):
    """Round-9 advice: deep-cloning a table that holds BORROWED
    (shallow-clone) versions must localize them — meta['dir'] is an
    absolute path into the SOURCE, and a naive join(dest, dir) would
    copytree the source onto itself. The deep clone of a shallow
    clone is self-contained: it survives a vacuum of the original."""
    import os

    from python_openetl_spark.plans.versioned import VersionedTable

    src = VersionedTable(str(tmp_path / "src"))
    src.commit(spark.createDataFrame([(1, 10.0)], "id long, v double"))
    src.commit(spark.createDataFrame([(1, 11.0), (2, 22.0)], "id long, v double"))

    shallow = src.clone(str(tmp_path / "shallow"), shallow=True)
    # deep clone OF the shallow clone: both versions are borrowed
    deep = shallow.clone(str(tmp_path / "deep"))
    assert deep.versions() == [1, 2]
    # localized: every version dir is relative and lives in the dest
    state = deep._state()
    for meta in state["versions"].values():
        assert not os.path.isabs(meta["dir"]), meta["dir"]
        assert os.path.isdir(os.path.join(str(tmp_path / "deep"), meta["dir"]))
    # self-contained: vacuum the ORIGINAL source to nothing extra,
    # then the deep clone still time-travels
    src.commit(spark.createDataFrame([(9, 90.0)], "id long, v double"))
    src.vacuum(keep_last=1)
    assert deep.read(spark, version=1).count() == 1
    assert deep.read(spark, version=2).count() == 2
    # and the shallow clone's borrowed v1 is now gone from disk —
    # the documented caveat the deep clone exists to escape
    import pytest as _pytest

    with _pytest.raises(Exception):
        shallow.read(spark, version=1).count()


def test_vacuum_keep_last_zero_keeps_only_current(spark, tmp_path):
    """r10 review: keep_last=0 was a silent no-op (lst[-0:] slices the
    whole list); it now means 'current only'."""
    from python_openetl_spark.plans.versioned import VersionedTable

    t = VersionedTable(str(tmp_path / "t"))
    for i in range(3):
        t.commit(spark.createDataFrame([(i,)], "id long"))
    removed = t.vacuum(keep_last=0)
    assert removed == [1, 2]
    assert t.versions() == [3]
    assert t.read(spark).first()["id"] == 2


# ------------------------------------------------- optimistic concurrency --


def test_optimistic_commit_stale_snapshot_rejected(spark, tmp_path):
    """Writer B derived from v1 but A committed v2 first: B's
    expected_version=1 commit must raise ConcurrentCommitError and
    leave the table at A's version; B retries from a fresh read and
    succeeds. Blind commit stays lock-free and unchanged."""
    import pytest as _pytest

    from python_openetl_spark.plans.versioned import (
        ConcurrentCommitError,
        VersionedTable,
    )

    vt = VersionedTable(str(tmp_path / "occ"))
    df1 = spark.range(3).toDF("id")
    v1 = vt.commit(df1)
    assert v1 == 1
    # A commits from v1
    assert vt.commit(spark.range(5).toDF("id"), expected_version=1) == 2
    # B also derived from v1 — stale now
    with _pytest.raises(ConcurrentCommitError, match="moved to v2"):
        vt.commit(spark.range(7).toDF("id"), expected_version=1)
    assert vt.current_version() == 2
    # B retries from the fresh version and wins
    assert vt.commit(spark.range(7).toDF("id"), expected_version=2) == 3
    assert vt.read(spark).count() == 7


def test_optimistic_commit_lock_contention_fails_loud(spark, tmp_path):
    """A held (crashed) lock makes a CAS commit fail with a clear
    message instead of corrupting state; removing the lock unblocks."""
    import os

    import pytest as _pytest

    from python_openetl_spark.plans.versioned import (
        ConcurrentCommitError,
        VersionedTable,
    )

    vt = VersionedTable(str(tmp_path / "occ2"))
    vt.commit(spark.range(2).toDF("id"))
    lock = os.path.join(vt.path, "_commit.lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    import time

    t0 = time.monotonic()
    with _pytest.raises(ConcurrentCommitError, match="lock held"):
        # shrink the wait by monkey-patching time is overkill: the
        # 10s deadline is the contract; assert it bounds
        vt.commit(spark.range(2).toDF("id"), expected_version=1)
    assert time.monotonic() - t0 < 30
    os.unlink(lock)
    assert vt.commit(spark.range(2).toDF("id"), expected_version=1) == 2
