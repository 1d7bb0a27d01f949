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


def test_asof_join_nearest(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:05")),   # back gap 3, fwd gap 4 -> backward
            (2, 10, _ts("2024-01-01 00:00:08")),   # back gap 6, fwd gap 1 -> forward
            (3, 20, _ts("2024-01-01 00:00:01")),   # no right row at all
            (4, 30, _ts("2024-01-01 00:00:05")),   # equidistant -> backward wins tie
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:00:02")),
            (101, 10, _ts("2024-01-01 00:00:09")),
            (102, 30, _ts("2024-01-01 00:00:03")),
            (103, 30, _ts("2024-01-01 00:00:07")),
        ],
        "rid long, user_id long, ts timestamp",
    )
    out = asof_join(left, right, on="ts", by="user_id", seq_col="rid", direction="nearest")
    got = {r["event_id"]: r["asof_rid"] for r in out.collect()}
    assert got == {1: 100, 2: 101, 3: None, 4: 102}
    # one Exchange for both carries: same partitioning, two sorts
    # (AQE's toString renders the final AND initial plans — cut to final)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    import re
    assert len(re.findall(r"Exchange hashpartitioning", final)) == 1, final


def test_asof_join_nearest_tolerance_matches_pandas(spark):
    import pandas as pd

    lrows = [(i, 10, _ts(f"2024-01-01 00:00:{s:02d}")) for i, s in enumerate([0, 3, 7, 11, 14])]
    rrows = [(100 + j, 10, _ts(f"2024-01-01 00:00:{s:02d}")) for j, s in enumerate([2, 9, 10])]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "rid long, user_id long, ts timestamp")
    out = asof_join(
        left, right, on="ts", by="user_id", seq_col="rid",
        direction="nearest", tolerance=2,
    )
    got = {r["event_id"]: r["asof_rid"] for r in out.collect()}
    lp = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["rid", "user_id", "ts"]).sort_values("ts")
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="nearest",
        tolerance=pd.Timedelta(seconds=2),
    )
    want = {
        int(r.event_id): (None if pd.isna(r.rid) else int(r.rid))
        for r in want_df.itertuples()
    }
    assert got == want
