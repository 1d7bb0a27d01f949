"""Connected-components duplicate clustering vs a driver-side union-find."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from python_openetl_spark.operators.cluster import (
    canonicalize_corpus,
    connected_components,
)


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots: dict[int, list[int]] = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for r, members in roots.items() for n in members}


def _run(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = set(_union_find(edges).items())
    # both strategies: driver union-find (default: small edge set) and
    # the distributed star loop (forced via driver_threshold=0)
    for thr in (2_000_000, 0):
        got = {
            (r["id"], r["cluster_id"])
            for r in connected_components(pairs, driver_threshold=thr).collect()
        }
        assert got == want, f"driver_threshold={thr}"


def test_long_chain_converges(spark):
    # a path graph needs multiple star rounds; diameter >> round count
    _run(spark, [(i, i + 1) for i in range(40)])


def test_chain_given_in_descending_order(spark):
    _run(spark, [(i + 1, i) for i in range(20)])


def test_disjoint_components_and_self_loops(spark):
    _run(spark, [(1, 2), (2, 3), (10, 11), (5, 5), (20, 21), (21, 20)])


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for _ in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        _run(spark, edges)


def test_canonicalize_corpus_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (6, 7)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r["doc_id"] for r in canonicalize_corpus(docs, pairs, "doc_id").collect()
    )
    # clusters {1,3,5} -> keep 1; {6,7} -> keep 6; 0,2,4 untouched
    assert kept == [0, 1, 2, 4, 6]


def test_empty_pair_set_is_identity(spark):
    docs = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert canonicalize_corpus(docs, pairs, "doc_id").count() == 2


def test_nonconvergence_guard(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError):
        connected_components(pairs, max_iter=0, driver_threshold=0)
