"""PageRank operator: hand-computed ranks, dangling mass, invariants."""

from __future__ import annotations

import pytest


def test_pagerank_hand_computed_with_dangling(spark):
    """Graph: 1->2, 1->3, 2->3; node 3 dangles. One iteration from the
    uniform start, d=0.85, N=3 — computed by hand below."""
    from python_openetl_spark.operators.linkrank import pagerank

    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src long, dst long")
    got = {r.id: r.rank for r in pagerank(e, iters=1).collect()}
    third = round(1 / 3, 12)
    half = round(third / 2, 12)          # node 1's rank split over 2 edges
    dang = third                         # node 3 has no out-edges
    base = 0.15000000000000002 / 3
    exp = {
        1: round(base + 0.85 * (0.0 + dang / 3), 12),
        2: round(base + 0.85 * (half + dang / 3), 12),
        3: round(base + 0.85 * (half + third + dang / 3), 12),
    }
    assert got == pytest.approx(exp, abs=1e-12)


def test_pagerank_ranks_sum_to_one(spark):
    from pyspark.sql import functions as F

    from python_openetl_spark.operators.linkrank import pagerank

    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 11) for i in range(11)] +
        [(i, (i * 5 + 2) % 11) for i in range(11)],
        "src long, dst long",
    )
    for iters in (1, 3):
        total = pagerank(e, iters=iters).agg(F.sum("rank")).collect()[0][0]
        assert abs(total - 1.0) < 1e-9   # probability mass conserved


def test_pagerank_drops_self_loops_and_dup_edges(spark):
    from python_openetl_spark.operators.linkrank import pagerank

    clean = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    noisy = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (1, 1), (2, 2)], "src long, dst long"
    )
    a = {r.id: r.rank for r in pagerank(clean, iters=2).collect()}
    b = {r.id: r.rank for r in pagerank(noisy, iters=2).collect()}
    assert a == b


def test_pagerank_hub_outranks_leaves(spark):
    from python_openetl_spark.operators.linkrank import pagerank

    # 5 leaves all pointing at node 0
    e = spark.createDataFrame([(i, 0) for i in range(1, 6)], "src long, dst long")
    got = {r.id: r.rank for r in pagerank(e, iters=3).collect()}
    assert got[0] > max(v for k, v in got.items() if k != 0)
