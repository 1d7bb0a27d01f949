"""As-of join edge cases: no prior match, inclusive equal timestamps,
deterministic tie-break among simultaneous right rows."""

from __future__ import annotations

import datetime as dt

from python_openetl_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:05")),   # after two rights
            (2, 10, _ts("2024-01-01 00:00:02")),   # equal ts -> inclusive
            (3, 20, _ts("2024-01-01 00:00:01")),   # no right row at all
            (4, 30, _ts("2024-01-01 00:00:00")),   # right exists only later
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:00:01")),
            (101, 10, _ts("2024-01-01 00:00:02")),
            (102, 10, _ts("2024-01-01 00:00:02")),  # same ts as 101: greatest id wins
            (103, 30, _ts("2024-01-01 00:00:09")),
        ],
        "rid long, user_id long, ts timestamp",
    )
    out = asof_join(left, right, on="ts", by="user_id", seq_col="rid")
    got = {r["event_id"]: r["asof_rid"] for r in out.collect()}
    assert got == {1: 102, 2: 102, 3: None, 4: None}
    assert out.count() == 4  # every left row survives


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:05")),   # no right at-or-after
            (2, 10, _ts("2024-01-01 00:00:02")),   # equal ts -> inclusive, greatest rid
            (3, 20, _ts("2024-01-01 00:00:01")),   # no right row at all
            (4, 30, _ts("2024-01-01 00:00:00")),   # right only later -> matches forward
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:00:01")),
            (101, 10, _ts("2024-01-01 00:00:02")),
            (102, 10, _ts("2024-01-01 00:00:02")),
            (103, 30, _ts("2024-01-01 00:00:09")),
        ],
        "rid long, user_id long, ts timestamp",
    )
    out = asof_join(left, right, on="ts", by="user_id", seq_col="rid", direction="forward")
    got = {r["event_id"]: r["asof_rid"] for r in out.collect()}
    assert got == {1: None, 2: 102, 3: None, 4: 103}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:00:05")), (2, 10, _ts("2024-01-01 00:00:02"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(101, 10, _ts("2024-01-01 00:00:02"))],
        "rid long, user_id long, ts timestamp",
    )
    # backward gap: left1 is 3s after the right row, left2 is 0s
    out = asof_join(left, right, on="ts", by="user_id", seq_col="rid", tolerance=2)
    got = {r["event_id"]: r["asof_rid"] for r in out.collect()}
    assert got == {1: None, 2: 101}
    # forward with a wide-enough tolerance still matches at-or-after only
    out = asof_join(left, right, on="ts", by="user_id", seq_col="rid",
                    direction="forward", tolerance=10)
    got = {r["event_id"]: r["asof_rid"] for r in out.collect()}
    assert got == {1: None, 2: 101}
