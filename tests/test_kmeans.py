"""Semantic/property tests for operators/kmeans.py (spherical k-means
and SemDeDup-style semantic dedup)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from python_openetl_spark.io import load_table
from python_openetl_spark.operators import kmeans
from tests.conftest import SF_DIR

K, ITERS = 8, 3


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_kmeans_shapes_and_unit_centroids(spark):
    emb = _emb(spark)
    n = emb.count()
    cents, assigned = kmeans.spherical_kmeans(emb, k=K, iters=ITERS, probe=2)
    assert cents.shape[0] == K
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    # every vector gets exactly `probe` assignment rows, ranks 0..probe-1
    assert assigned.count() == 2 * n
    per = assigned.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("c"),
        F.min("cell_rank").alias("lo"),
        F.max("cell_rank").alias("hi"),
        F.count_distinct("cell").alias("nc"),
    )
    bad = per.filter(
        (F.col("c") != 2) | (F.col("lo") != 0) | (F.col("hi") != 1) | (F.col("nc") != 2)
    )
    assert bad.count() == 0


def test_kmeans_improves_objective(spark):
    """Lloyd iterations must not worsen the spherical objective (mean
    cosine of each vector to its nearest centroid)."""
    emb = _emb(spark)
    import pandas as pd  # noqa: F401

    mat = np.stack(emb.select("embedding").toPandas()["embedding"].to_numpy()).astype(
        np.float64
    )
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    c0 = kmeans.init_centroids(emb, "vec_id", "embedding", K, 42)
    cf, _ = kmeans.spherical_kmeans(emb, k=K, iters=ITERS)
    obj0 = (mat @ c0.T).max(axis=1).mean()
    objf = (mat @ cf.T).max(axis=1).mean()
    assert objf >= obj0 - 1e-12


def test_kmeans_deterministic(spark):
    emb = _emb(spark)
    c1, _ = kmeans.spherical_kmeans(emb, k=K, iters=ITERS)
    c2, _ = kmeans.spherical_kmeans(emb, k=K, iters=ITERS)
    assert np.array_equal(c1, c2)


def test_kmeans_k_exceeds_n(spark):
    tiny = _emb(spark).limit(3)
    cents, assigned = kmeans.spherical_kmeans(tiny, k=K, iters=1)
    assert cents.shape[0] == 3  # k clamps to n: every row seeds a centroid
    assert assigned.filter(F.col("cell_rank") == 0).count() == 3


def test_semantic_dedup_matches_exact_rule(spark):
    """Cell-pruned pair generation at the pinned fixture settings
    (k=8, probe=4) must reproduce the exact greedy min-id rule."""
    emb = _emb(spark)
    surv = kmeans.semantic_dedup(emb, threshold=0.45, k=K, iters=ITERS, probe=4)
    from python_openetl_spark.operators.similarity import cosine_pairs_exact

    pairs = cosine_pairs_exact(emb, threshold=0.45)
    dropped_exact = {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
    kept = {r["vec_id"] for r in surv.select("vec_id").collect()}
    alln = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert kept == alln - dropped_exact


def test_semantic_dedup_survivor_has_no_earlier_neighbor(spark):
    """Direct property: no surviving pair is similar above threshold
    where both ids survive and one precedes the other... i.e. for every
    dropped id there exists an earlier similar vector (witness check)."""
    emb = _emb(spark)
    surv = kmeans.semantic_dedup(emb, threshold=0.45, k=K, iters=ITERS, probe=4)
    from python_openetl_spark.operators.similarity import cosine_pairs_exact

    surv_pairs = cosine_pairs_exact(surv, threshold=0.45)
    # survivors may still contain pairs where the SMALLER id was dropped
    # by an even earlier witness? No: greedy min-id drops any id with an
    # earlier similar vector, so two surviving similar ids cannot both
    # lack earlier witnesses unless neither has one — impossible for the
    # larger of the pair (the smaller one is its witness).
    assert surv_pairs.count() == 0


def test_bloom_incremental_dedup_identical_to_exact(spark):
    """The Bloom-prefiltered classifier must be row-identical to the
    exact one — including under a deliberately tiny bitmap that forces
    heavy false positives (the confirm join must reject them all)."""
    from python_openetl_spark.functions.text import fingerprint
    from python_openetl_spark.operators.dedup import (
        incremental_dedup,
        incremental_dedup_bloom,
    )
    from python_openetl_spark.io import load_table

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(300)
    batch = d.filter(F.col("doc_id") % 3 == 0).unionByName(
        d.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    store = d.filter(F.col("doc_id") % 2 == 0).select(
        fingerprint("text").alias("fp")
    ).distinct()
    want = sorted(map(tuple, incremental_dedup(batch, store).collect()))
    got = sorted(map(tuple, incremental_dedup_bloom(batch, store).collect()))
    assert got == want
    tiny = sorted(
        map(tuple, incremental_dedup_bloom(batch, store, num_bits=64).collect())
    )
    assert tiny == want


def test_kmeans_and_semantic_dedup_on_empty_corpus(spark):
    import numpy as np
    import pytest as _pt

    empty = _emb(spark).limit(0)
    cents, assigned = kmeans.spherical_kmeans(empty, k=4, iters=2)
    assert cents.shape[0] == 0 and assigned.count() == 0
    assert kmeans.semantic_dedup(empty, threshold=0.5).count() == 0
    from python_openetl_spark.operators import pq

    with _pt.raises(ValueError, match="empty corpus"):
        pq.pq_fit(empty, m=8, ksub=4, iters=1)
