"""operators/hierarchy.py — pointer-doubling depth resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_ancestor_closure_exact_pairs(spark):
    # chain 1->0, 2->1, 3->2 plus a second root 10 with child 11
    edges = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2), (11, 10)], "node long, parent long"
    )
    from python_openetl_spark.operators.hierarchy import ancestor_closure

    got = {(r["node"], r["anc"], r["dist"]) for r in ancestor_closure(edges).collect()}
    assert got == {
        (1, 0, 1), (2, 1, 1), (2, 0, 2), (3, 2, 1), (3, 1, 2), (3, 0, 3),
        (11, 10, 1),
    }


def test_ancestor_closure_cycle_raises(spark):
    from python_openetl_spark.operators.hierarchy import ancestor_closure

    cyc = spark.createDataFrame([(1, 2), (2, 1)], "node long, parent long")
    with pytest.raises(ValueError, match="cycle"):
        ancestor_closure(cyc, max_rounds=5).collect()


def test_subtree_rollup_counts_self_and_descendants(spark):
    from python_openetl_spark.operators.hierarchy import subtree_rollup

    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "node long, parent long"
    )
    values = spark.createDataFrame([(0,), (1,), (2,), (3,), (9,)], "id long")
    out = {
        (r["id"], r["n"], r["s"])
        for r in subtree_rollup(
            edges,
            values,
            [F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")],
            id_col="id",
        ).collect()
    }
    # 0's subtree = {0,1,2,3}; 1's = {1,3}; leaves and the isolated 9 = self
    assert out == {(0, 4, 6), (1, 2, 4), (2, 1, 2), (3, 1, 3), (9, 1, 9)}


def test_orphan_parent_id_is_a_root_not_an_error(spark):
    """r7 verdict #5 q74 hostile shape: an edge whose parent id exists
    NOWHERE as a node (an orphan pointer — a deleted ancestor after a
    partial reload). The operators must treat it as a forest rim, not
    loop or error: depths terminate at the orphan id, the closure lists
    it as a legitimate ancestor, and a rollup keyed to values simply
    has no value row for it."""
    from python_openetl_spark.operators.hierarchy import (
        ancestor_closure,
        subtree_rollup,
    )

    # 3 -> 1 -> 0 plus 7 -> 999 where 999 is not a node and has no value
    edges = spark.createDataFrame(
        [(1, 0), (3, 1), (7, 999)], "node long, parent long"
    )
    got = {r["node"]: (r["root"], r["depth"]) for r in tree_depths(edges).collect()}
    assert got == {1: (0, 1), 3: (0, 2), 7: (999, 1)}

    closure = {
        (r["node"], r["anc"], r["dist"]) for r in ancestor_closure(edges).collect()
    }
    assert closure == {(1, 0, 1), (3, 1, 1), (3, 0, 2), (7, 999, 1)}

    values = spark.createDataFrame([(0,), (1,), (3,), (7,)], "id long")
    out = {
        (r["id"], r["n"])
        for r in subtree_rollup(
            edges, values, [F.count(F.lit(1)).alias("n")], id_col="id"
        ).collect()
    }
    # 999 aggregates its descendant 7 (it IS an ancestor in the edge
    # relation) even though it has no value row of its own; everything
    # else rolls up exactly as in the orphan-free forest
    assert out == {(0, 3), (1, 2), (3, 1), (7, 1), (999, 1)}
