"""Distributed kNN JOIN — both sides are DataFrames, nothing is
collected to the driver.

The batched kernel (``similarity.cosine_topk_arrow``) closes over a
driver-side query matrix, which is the right shape only when the query
set is a handful of anchors. A kNN *join* (dataset-vs-dataset linkage:
dedup across snapshots, nearest-example attribution) has a
corpus-proportional query set, so the query side must stay distributed.
Two strategies:

1. :func:`cosine_knn_join` — EXACT block nested-loop GEMM. Corpus and
   queries are hash-split into blocks, each side replicated across the
   other's block axis, and every (corpus-block, query-block) pair meets
   in one cogrouped-Arrow task that does a bounded-size numpy matmul
   and emits its local top-k; a final per-query window keeps the global
   top-k. Exact kNN join is inherently O(n·q) FLOPs — this form
   distributes them with per-task memory capped at
   (corpus_block_rows + query_block_rows) vectors and shuffle volume
   n·QB + q·CB (the classic block-replication trade). Result is
   bit-identical to ``cosine_topk`` (same float64 math, same
   (cos desc, id) tie-break), so exact-SQL oracles stay valid.
2. :func:`ivf_knn_join` — APPROXIMATE cell co-partitioned join, the
   100 TB shape: assign corpus vectors to their nearest IVF cell,
   assign each query to its ``nprobe`` nearest cells, equi-join on the
   cell id (plus a query-block axis to bound hot cells), GEMM within
   each co-partition, exact re-rank per query. FLOPs drop to
   ~``nprobe/nlist`` of the exact join; recall is tunable and must be
   stated as a floor, not equality (see workload/llm10.py x17).

Reference parity: the reference has no vector surface; this extends
its batch-linkage verbs (operations.py:515-609 incremental sync) to
the embedding-similarity join a training-data pipeline needs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_OUT_SCHEMA = "{qid} long, {cid} long, cos_sim double"


def _gemm_topk_kernel(id_col: str, query_id_col: str, vec_col: str, k: int):
    """Cogrouped-Arrow kernel: one bounded GEMM per (corpus-block,
    query-block) co-partition, emitting each query's block-local top-k
    under the global (cos desc, id asc) total order — the same float64
    math and lexsort tie-break as similarity.cosine_topk_arrow, so
    block truncation composes with the final window into the exact
    global answer."""

    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                query_id_col: pd.Series(dtype=np.int64),
                id_col: pd.Series(dtype=np.int64),
                "cos_sim": pd.Series(dtype=np.float64),
            }
        )
        if left.empty or right.empty:
            return empty
        ids = left[id_col].to_numpy(dtype=np.int64)
        mat = np.stack(left[vec_col].to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        qids = right[query_id_col].to_numpy(dtype=np.int64)
        qmat = np.stack(right["__qv"].to_numpy()).astype(np.float64)
        qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        sims = mat @ qnorm.T  # (corpus_block, query_block)
        frames = []
        for qi, qid in enumerate(qids):
            col = sims[:, qi]
            mask = ids != qid
            cand_idx = np.lexsort((ids[mask], -col[mask]))[:k]
            sel = ids[mask][cand_idx]
            frames.append(
                pd.DataFrame(
                    {
                        query_id_col: np.full(len(sel), qid, dtype=np.int64),
                        id_col: sel,
                        "cos_sim": col[mask][cand_idx],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else empty

    return kernel


def _global_topk(local: DataFrame, query_id_col: str, id_col: str, k: int) -> DataFrame:
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def cosine_knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 3,
    corpus_block_rows: int = 65_536,
    query_block_rows: int = 4_096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact distributed kNN join (block nested-loop GEMM).

    Block counts derive from the actual side sizes (two count()
    actions — metadata-scale), so per-task memory is capped no matter
    how the query set grows: 10× more queries means 10× more query
    blocks, not a 10× larger driver matrix. Neither side is ever
    collected."""
    spark = corpus.sparkSession
    n_c, n_q = corpus.count(), queries.count()
    if n_c == 0 or n_q == 0:
        return spark.createDataFrame(
            [], f"{query_id_col} long, {id_col} long, cos_sim double, rank int"
        )
    cb = max(1, math.ceil(n_c / corpus_block_rows))
    qb = max(1, math.ceil(n_q / query_block_rows))
    c = corpus.select(
        id_col,
        vec_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(cb)).cast("int").alias("__cb"),
    ).withColumn("__qb", F.explode(F.sequence(F.lit(0), F.lit(qb - 1))))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        F.pmod(F.xxhash64(F.col(query_id_col)), F.lit(qb)).cast("int").alias("__qb"),
    ).withColumn("__cb", F.explode(F.sequence(F.lit(0), F.lit(cb - 1))))
    local = (
        c.groupBy("__cb", "__qb")
        .cogroup(q.groupBy("__cb", "__qb"))
        .applyInPandas(
            _gemm_topk_kernel(id_col, query_id_col, vec_col, k),
            schema=_OUT_SCHEMA.format(qid=query_id_col, cid=id_col),
        )
    )
    return _global_topk(local, query_id_col, id_col, k)


def ivf_knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 3,
    nlist: int = 16,
    nprobe: int = 4,
    query_block_rows: int = 4_096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate distributed kNN join, co-partitioned by IVF cell.

    Corpus vectors land in their single nearest cell; each query is
    exploded to its ``nprobe`` nearest cells; the equi-join on the cell
    id meets in cogrouped-Arrow GEMM tasks. A secondary query-block
    axis caps hot cells (a cell probed by many queries splits into
    bounded co-partitions instead of one giant task). FLOPs are
    ~``nprobe/nlist`` of the exact join; recall is tunable, so callers
    must state floors, not equality."""
    spark = corpus.sparkSession
    cent_rows = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(nlist)
        .collect()
    )
    n_q = queries.count()
    if not cent_rows or n_q == 0:
        return spark.createDataFrame(
            [], f"{query_id_col} long, {id_col} long, cos_sim double, rank int"
        )
    cmat = np.array([r[vec_col] for r in cent_rows], dtype=np.float64)
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    nprobe = min(nprobe, len(cent_rows))
    qb = max(1, math.ceil(n_q / query_block_rows))

    def assign_corpus(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "__cell": (mat @ cnorm.T).argmax(axis=1).astype(np.int32),
                }
            )

    def assign_queries(batches):
        # each query row fans out to its nprobe nearest cells — the
        # probe list stays distributed (contrast ivf_topk's driver-side
        # probe pairs, fine for anchors, wrong for a join-sized set)
        for pdf in batches:
            if pdf.empty:
                continue
            qmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
            probe = np.argsort(-(qn @ cnorm.T), axis=1)[:, :nprobe]
            idx = np.repeat(np.arange(len(pdf)), nprobe)
            yield pd.DataFrame(
                {
                    query_id_col: pdf[query_id_col].to_numpy()[idx],
                    "__qv": pdf[vec_col].to_numpy()[idx],
                    "__cell": probe.reshape(-1).astype(np.int32),
                }
            )

    c = corpus.select(id_col, vec_col).mapInPandas(
        assign_corpus, schema=f"{id_col} long, {vec_col} array<float>, __cell int"
    ).withColumn("__qb", F.explode(F.sequence(F.lit(0), F.lit(qb - 1))))
    q = queries.select(query_id_col, vec_col).mapInPandas(
        assign_queries,
        schema=f"{query_id_col} long, __qv array<float>, __cell int",
    ).withColumn(
        "__qb", F.pmod(F.xxhash64(F.col(query_id_col)), F.lit(qb)).cast("int")
    )
    local = (
        c.groupBy("__cell", "__qb")
        .cogroup(q.groupBy("__cell", "__qb"))
        .applyInPandas(
            _gemm_topk_kernel(id_col, query_id_col, vec_col, k),
            schema=_OUT_SCHEMA.format(qid=query_id_col, cid=id_col),
        )
    )
    return _global_topk(local, query_id_col, id_col, k)
