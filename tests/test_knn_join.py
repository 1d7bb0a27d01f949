"""operators/knn_join.py — distributed kNN join (exact block GEMM +
approximate IVF-cell co-partitioned), and the r6-verdict scale
contract for x16: no corpus-proportional driver collect."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_openetl_spark.operators.knn_join import cosine_knn_join, ivf_knn_join
from python_openetl_spark.operators.similarity import cosine_topk
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _queries(emb, mod):
    return emb.filter(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _rows(df):
    return {
        (r["query_id"], r["vec_id"], round(r["cos_sim"], 12), r["rank"])
        for r in df.collect()
    }


def test_block_join_is_exact_multiblock(spark, emb):
    """Tiny blocks force the multi-block path (block-local truncation +
    global re-rank) — results must still be bit-identical to the
    broadcast-exact cosine_topk, ties included."""
    q = _queries(emb, 50)
    exact = _rows(cosine_topk(emb, q, k=3))
    got = _rows(cosine_knn_join(emb, q, k=3, corpus_block_rows=37, query_block_rows=3))
    assert got == exact and len(exact) > 0


def test_block_join_10x_query_set_stays_exact_and_blocked(spark, emb):
    """The r6-verdict perturbation contract: 10x the query set (every
    5th vector instead of every 50th) must mean MORE QUERY BLOCKS, not
    a bigger per-task matrix — same tiny block caps, still exact."""
    q = _queries(emb, 5)
    assert q.count() >= 10 * _queries(emb, 50).count()
    exact = _rows(cosine_topk(emb, q, k=3))
    got = _rows(cosine_knn_join(emb, q, k=3, corpus_block_rows=64, query_block_rows=8))
    assert got == exact


def test_x16_never_collects_the_query_side(spark, monkeypatch):
    """x16's plan must be constructible with DataFrame.toPandas
    disabled entirely — the driver-collect the r6 verdict flagged is
    structurally impossible, not just currently absent."""
    from python_openetl_spark.workload.llm10 import x16_knn_join

    def boom(self, *a, **k):
        raise AssertionError("driver-side collect in x16 plan construction")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    df = x16_knn_join(spark, SF_DIR)  # builds the full plan, no action
    monkeypatch.undo()
    assert df.count() > 0


def test_ivf_join_full_probe_equals_exact(spark, emb):
    q = _queries(emb, 50)
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, q, k=3).collect()}
    full = {
        (r["query_id"], r["vec_id"])
        for r in ivf_knn_join(
            emb, q, k=3, nlist=8, nprobe=8, query_block_rows=4
        ).collect()
    }
    assert full == exact


def test_ivf_join_narrow_probe_recall_floor_and_anchors(spark, emb):
    """Production-probe recall floor on the random fixture, plus the
    deterministic planted-anchor guarantee: a query equal to a stored
    vector always finds it (same cell -> always probed, cos 1.0)."""
    q = _queries(emb, 50)
    anchors = emb.filter(F.col("vec_id").isin(3, 23, 43)).select(
        (F.col("vec_id") + 2_000_000).alias("query_id"), "embedding"
    )
    res = ivf_knn_join(emb, q.unionByName(anchors), k=3, nlist=8, nprobe=2)
    got = {(r["query_id"], r["vec_id"]) for r in res.collect()}
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, q, k=3).collect()}
    hits = len({p for p in got if p[0] < 2_000_000} & exact)
    assert hits / len(exact) >= 0.2  # broad floor: a broken join is ~0
    for src in (3, 23, 43):
        assert (src + 2_000_000, src) in got


def test_empty_sides_degrade_to_empty(spark, emb):
    none = emb.filter(F.lit(False)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert cosine_knn_join(emb, none, k=3).count() == 0
    assert cosine_knn_join(
        emb.filter(F.lit(False)), _queries(emb, 50), k=3
    ).count() == 0
    assert ivf_knn_join(emb.filter(F.lit(False)), _queries(emb, 50), k=3).count() == 0


def test_exclude_self_controls_id_collision_semantics(spark, emb):
    """r7 verdict #3: a query whose id numerically equals an UNRELATED
    corpus row's id must still see that row under exclude_self=False
    (cross-dataset linkage), while exclude_self=True (the dedup
    default) masks it. Planted collision: the query VECTOR is corpus
    row 7's embedding, the query ID is also 7 — so corpus row 7 is the
    cos-1.0 nearest neighbor iff it is not self-masked."""
    target = emb.filter(F.col("vec_id") == 7)
    q = target.select(F.col("vec_id").alias("query_id"), "embedding")
    for join in (
        lambda **kw: cosine_knn_join(emb, q, k=3, corpus_block_rows=64, **kw),
        lambda **kw: ivf_knn_join(emb, q, k=3, nlist=4, nprobe=4, **kw),
    ):
        kept = {(r["query_id"], r["vec_id"], r["rank"]) for r in join(exclude_self=False).collect()}
        masked = {(r["query_id"], r["vec_id"]) for r in join(exclude_self=True).collect()}
        assert (7, 7, 1) in kept  # the colliding row is the top hit
        assert (7, 7) not in masked  # default self-masking unchanged


def test_zero_norm_vectors_score_zero_not_nan(spark):
    """ADVICE r7: an unclamped zero-norm vector yields NaN cosine, and
    Spark sorts NaN as the LARGEST double — a zero corpus vector would
    rank FIRST for every query. With the 1e-300 clamp it scores 0.0 and
    ranks behind any genuinely similar row."""
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 0.0, 0.0]),  # zero-norm row
        ],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.0, 0.0, 0.0])],
        "query_id long, embedding array<float>",
    )
    for res in (
        cosine_knn_join(corpus, queries, k=3, exclude_self=False),
        ivf_knn_join(corpus, queries, k=3, nlist=2, nprobe=2, exclude_self=False),
    ):
        rows = res.collect()
        assert all(r["cos_sim"] == r["cos_sim"] for r in rows)  # no NaN
        by_q = {(r["query_id"], r["rank"]): r["vec_id"] for r in rows}
        assert by_q[(10, 1)] == 1 and by_q[(10, 3)] == 3  # zero row ranks last
        assert all(r["cos_sim"] == 0.0 for r in rows if r["query_id"] == 11)


def test_store_knn_join_exact_filtered_and_recall(spark, emb, tmp_path):
    """x22: the store-backed join at nprobe = nlist equals the exact
    block join over the same (filtered) corpus; at production nprobe
    the planted anchor (query equal to a stored vector) is always
    found; appends become visible to the join without rebuild."""
    from python_openetl_spark.operators.ivf_store import (
        append_to_ivf_store,
        build_ivf_store,
    )
    from python_openetl_spark.operators.knn_join import ivf_store_knn_join

    root = str(tmp_path / "join_store")
    build_ivf_store(
        emb.filter(F.col("vec_id") % 10 != 7), root, nlist=8, attr_cols=("label",)
    )
    append_to_ivf_store(emb.filter(F.col("vec_id") % 10 == 7), root)
    queries = emb.filter(F.col("vec_id") % 30 == 2).select(
        (F.col("vec_id") + 5_000_000).alias("query_id"), "embedding"
    )
    got = ivf_store_knn_join(
        spark, root, queries, k=3, nprobe=8, where="label = 0", exclude_self=False
    )
    want = cosine_knn_join(
        emb.filter(F.col("label") == 0),
        queries,
        k=3,
        corpus_block_rows=128,
        query_block_rows=4,
        exclude_self=False,
    )
    g = {(r["query_id"], r["vec_id"]): (r["rank"], r["cos_sim"]) for r in got.collect()}
    w = {(r["query_id"], r["vec_id"]): (r["rank"], r["cos_sim"]) for r in want.collect()}
    assert g.keys() == w.keys()
    for key, (rank, cos) in g.items():
        # ranks identical; cos within GEMM-shape ULP noise (the store
        # join re-scores winners with the exact JVM expression — THAT
        # value is what the x22 SQL oracle hash-checks bit-for-bit)
        assert rank == w[key][0] and abs(cos - w[key][1]) < 1e-12, (key, g[key], w[key])
    # production nprobe: the anchor (query == appended stored vector 7)
    # lands in its own nearest cell, which is always probed first
    anchor_q = emb.filter(F.col("vec_id") == 7).select(
        F.lit(9_000_007).alias("query_id"), "embedding"
    )
    top = ivf_store_knn_join(
        spark, root, anchor_q, k=1, nprobe=1, exclude_self=False
    ).collect()[0]
    assert top["vec_id"] == 7 and top["cos_sim"] > 0.999999
    # lifecycle: a rebuild (new quantizer, new version dir) and a
    # vacuum of the superseded version leave the join's answer
    # unchanged — the join resolves the pointer per call
    from python_openetl_spark.operators.ivf_store import (
        rebuild_ivf_store,
        vacuum_ivf_store,
    )

    rebuild_ivf_store(spark, root)
    vacuum_ivf_store(root, keep_last=1)
    got2 = ivf_store_knn_join(
        spark, root, queries, k=3, nprobe=8, where="label = 0", exclude_self=False
    )
    assert {(r["query_id"], r["vec_id"], r["rank"]) for r in got2.collect()} == {
        (r["query_id"], r["vec_id"], r["rank"]) for r in got.collect()
    }


def test_shortlist_margin_scales_with_k_under_dense_ties(spark):
    """r9 advice: a fixed +4 shortlist can drop a true top-k neighbor
    when >4 candidates are ULP-tied at the k boundary. The margin now
    scales with k (_shortlist_size = k + max(4, k)). Plant a corpus
    where ALL 24 vectors are exactly tied in cosine (same direction,
    different magnitudes) and k=8 — any shortlist truncation that
    reorders ties would surface as a wrong id set; the exact contract
    is the k lowest ids (the deterministic tiebreak)."""
    from python_openetl_spark.operators.knn_join import _shortlist_size

    assert _shortlist_size(3) == 7  # small k keeps the old +4 floor
    assert _shortlist_size(8) == 16  # large k gets a k-sized margin
    base = [1.0, 2.0, 3.0, 4.0]
    corpus = spark.createDataFrame(
        [(i, [x * (1.0 + i) for x in base]) for i in range(24)],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(1000, base)], "query_id long, embedding array<float>"
    )
    res = cosine_knn_join(
        corpus, q, k=8, corpus_block_rows=5, query_block_rows=4,
        exclude_self=False,
    ).collect()
    assert [r["vec_id"] for r in sorted(res, key=lambda r: r["rank"])] == list(
        range(8)
    )
