"""operators/hierarchy.py — pointer-doubling depth resolution."""

from __future__ import annotations

import pytest

from python_openetl_spark.operators.hierarchy import tree_depths


def _py_depths(edges: dict[int, int]) -> dict[int, tuple[int, int]]:
    out = {}
    for n in edges:
        d, a = 0, n
        while a in edges:
            a, d = edges[a], d + 1
        out[n] = (a, d)
    return out


def test_matches_reference_on_forest(spark):
    # two trees + one long chain (depth 9, forces >3 doubling rounds)
    edges = {i: i // 2 for i in range(2, 30)}  # binary tree rooted at 1
    edges.update({100 + i: 100 + i - 1 for i in range(1, 10)})  # chain at 100
    df = spark.createDataFrame(list(edges.items()), "node long, parent long")
    got = {r["node"]: (r["root"], r["depth"]) for r in tree_depths(df).collect()}
    assert got == _py_depths(edges)


def test_roots_absent_from_output(spark):
    df = spark.createDataFrame([(2, 1), (3, 1)], "node long, parent long")
    rows = tree_depths(df).collect()
    assert {r["node"] for r in rows} == {2, 3}
    assert all(r["root"] == 1 and r["depth"] == 1 for r in rows)


def test_cycle_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "node long, parent long")
    with pytest.raises(ValueError, match="cycle"):
        tree_depths(df, max_rounds=6)
