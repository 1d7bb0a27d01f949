"""operators/ivm.py — counting-algorithm join-view maintenance
(m22's operator): multiset exactness under duplicates, deletes that
zero out rows, and the ΔA⋈ΔB cross term."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_openetl_spark.operators.ivm import join_view, maintain_join_view


def _v(df):
    return {tuple(r) for r in df.collect()}


def test_maintenance_equals_recompute_under_all_change_kinds(spark):
    """One step with inserts+deletes on BOTH sides, duplicate rows
    included, must equal join_view of the post-delta snapshots —
    including a both-sides-new match that only the ΔA⋈ΔB term sees
    and a delete that removes a view row entirely."""
    a_old = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y"), (3, "z")], "k long, av string"
    )
    b_old = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 20), (9, 90)], "k long, bv long"
    )
    # ΔA: insert (4,'w') twice, delete one duplicate of (1,'x')
    delta_a = spark.createDataFrame(
        [(4, "w", 2), (1, "x", -1)], "k long, av string, mult long"
    )
    # ΔB: insert (4,44) (matches ONLY the new A row: the cross term),
    # insert another (1,10) duplicate, delete both (2,20) copies
    delta_b = spark.createDataFrame(
        [(4, 44, 1), (1, 10, 1), (2, 20, -2)], "k long, bv long, mult long"
    )
    a_new = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (4, "w"), (4, "w")], "k long, av string"
    )
    b_new = spark.createDataFrame(
        [(1, 10), (1, 10), (9, 90), (4, 44)], "k long, bv long"
    )
    got = maintain_join_view(
        join_view(a_old, b_old, "k"), a_old, b_old, delta_a, delta_b, "k"
    )
    want = join_view(a_new, b_new, "k")
    assert _v(got) == _v(want)
    # the (2,'y',20) view row zeroed out and is GONE, not mult=0
    assert got.filter(F.col("k") == 2).count() == 0
    # the both-sides-new (4,'w',44) match exists with mult 2 (dup A row)
    assert _v(got.filter(F.col("k") == 4)) == {(4, "w", 44, 2)}
    # idempotent no-op step: empty deltas change nothing
    empty_a = delta_a.limit(0)
    empty_b = delta_b.limit(0)
    again = maintain_join_view(got, a_new, b_new, empty_a, empty_b, "k")
    assert _v(again) == _v(want)


def test_both_side_deletes_cross_term_adds_back(spark):
    """r10 verdict #4 hostile shape: deleting the MATCHING rows from
    both sides in one step. The naive two-term maintenance counts the
    removal twice ((-1)·1 + 1·(-1) = -2); the ΔA⋈ΔB cross term adds
    (+1) back, landing the view row at exactly mult 0 — gone, not
    negative. Duplicates on one side make the arithmetic non-trivial."""
    a_old = spark.createDataFrame([(1, "x"), (2, "y")], "k long, av string")
    b_old = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 20)], "k long, bv long"
    )
    # view starts as {(1,x,10):2, (2,y,20):1}; delete A(1,x) and BOTH
    # B(1,10) copies in the same step
    delta_a = spark.createDataFrame([(1, "x", -1)], "k long, av string, mult long")
    delta_b = spark.createDataFrame([(1, 10, -2)], "k long, bv long, mult long")
    got = maintain_join_view(
        join_view(a_old, b_old, "k"), a_old, b_old, delta_a, delta_b, "k"
    )
    # terms for (1,x,10): view +2, t1 = -1*2 = -2, t2 = 1*(-2) = -2,
    # t3 = (-1)*(-2) = +2 -> total 0 -> row vanishes
    assert got.filter(F.col("k") == 1).count() == 0
    assert _v(got) == {(2, "y", 20, 1)}
    # and the result still equals a fresh recompute of the post state
    a_new = spark.createDataFrame([(2, "y")], "k long, av string")
    b_new = spark.createDataFrame([(2, 20)], "k long, bv long")
    assert _v(got) == _v(join_view(a_new, b_new, "k"))


def test_cdc_to_counting_delta_bridges_snapshot_diff(spark):
    """m23's glue verb: I → +1 new row, D → -1 old row, U → -1
    before-image AND +1 new row; feeding the converted deltas through
    maintain_join_view equals a recompute from the post snapshots;
    missing before-image columns raise instead of corrupting."""
    import pytest

    from python_openetl_spark.operators.ivm import cdc_to_counting_delta
    from python_openetl_spark.operators.merge import snapshot_diff

    a_old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, av string"
    )
    a_new = spark.createDataFrame(
        [(1, "x"), (2, "Y"), (4, "w")], "k long, av string"  # U on 2, D 3, I 4
    )
    cdc = snapshot_diff(a_old, a_new, "k", include_old=True)
    delta = cdc_to_counting_delta(cdc, "k", ["av"])
    got = {(r["k"], r["av"], r["mult"]) for r in delta.collect()}
    assert got == {(2, "Y", 1), (4, "w", 1), (2, "y", -1), (3, "z", -1)}

    b_old = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, bv long")
    b_new = spark.createDataFrame([(1, 11), (2, 20), (4, 40)], "k long, bv long")
    db = cdc_to_counting_delta(
        snapshot_diff(b_old, b_new, "k", include_old=True), "k", ["bv"]
    )
    view = join_view(a_old, b_old, "k")
    maintained = maintain_join_view(view, a_old, b_old, delta, db, "k")
    assert _v(maintained) == _v(join_view(a_new, b_new, "k"))

    with pytest.raises(ValueError, match="include_old"):
        cdc_to_counting_delta(
            snapshot_diff(a_old, a_new, "k"), "k", ["av"]
        )


def test_narrow_over_pinned_heuristic(spark):
    """The r14 pin-skip: maintain_join_view must NOT re-checkpoint a
    delta that is already a narrow plan over materialized rows (the
    cdc_to_counting_delta shape), and MUST still pin anything with a
    live scan, join, aggregate, window or generator upstream — the
    conservative direction, since a wrongly-skipped pin recomputes an
    expensive subtree per maintenance term."""
    from pyspark.sql import Window

    from python_openetl_spark.operators.ivm import _narrow_over_pinned

    base = spark.createDataFrame(
        [(1, "x", 1), (2, "y", -1)], "k long, av string, mult long"
    )
    pinned = base.localCheckpoint(eager=True)
    # narrow over pinned: filters/projections/unions qualify
    assert _narrow_over_pinned(pinned.filter(F.col("k") > 0))
    assert _narrow_over_pinned(
        pinned.filter(F.col("mult") > 0).unionByName(
            pinned.filter(F.col("mult") < 0)
        ).select("k", "av", "mult")
    )
    # anything wide (or over a live relation) must still pin
    assert not _narrow_over_pinned(pinned.join(pinned.select("k"), "k"))
    assert not _narrow_over_pinned(pinned.groupBy("k").count())
    assert not _narrow_over_pinned(
        pinned.withColumn(
            "rn", F.row_number().over(Window.partitionBy("k").orderBy("av"))
        )
    )
    assert not _narrow_over_pinned(
        pinned.select("k", F.explode(F.array(F.lit(1), F.lit(2))).alias("e"))
    )
