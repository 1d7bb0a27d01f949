"""Persisted, incrementally-maintained IVF index — streaming vector
ingest without retraining.

The in-memory IVF operator (operators/similarity.py ivf_topk) rebuilds
its coarse quantizer per call; production vector search cannot — the
corpus arrives continuously. This module persists the index as plain
columnar layout:

    root/centroids.parquet          cell -> centroid vector (nlist rows)
    root/assigned/cell=<c>/...      vectors hive-partitioned by cell

and splits the lifecycle the way the incremental-dedup family does
(operators/dedup.py incremental stores):

- :func:`build_ivf_store` — one corpus scan: deterministic centroid
  sample, Arrow-batched nearest-centroid assignment, partitioned write.
- :func:`append_to_ivf_store` — BATCH-sized cost: new vectors are
  assigned to the EXISTING centroids (no retrain, the FAISS
  ``add``-after-``train`` contract) and appended to their cell
  partitions. The index never re-reads the corpus.
- :func:`ivf_store_topk` — probes ``nprobe`` cells; the cell predicate
  prunes to the matching ``cell=`` partition DIRECTORIES
  (PartitionFilters — the scan reads ~nprobe/nlist of the data from
  disk, not just post-filter).

Drift note: appends shift the true cell distribution away from the
trained centroids; recall degrades gracefully (vectors are still in
their nearest EXISTING cell) until a rebuild. The build/append split
makes the rebuild an explicit, schedulable operation instead of a
per-query cost.

Reference parity: the reference has no vector surface; this extends
its incremental-sync architecture (operations.py:515-609 delta
pattern) to the ANN index the training-data pipeline needs.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_openetl_spark.functions.vectors import cosine

_CENTROIDS = "centroids.parquet"
_ASSIGNED = "assigned"


def _assign_fn(cnorm: np.ndarray, id_col: str, vec_col: str):
    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cell": (mat @ cnorm.T).argmax(axis=1).astype(np.int32),
                }
            )

    return assign


def _read_centroids(spark: SparkSession, root: str) -> tuple[np.ndarray, np.ndarray]:
    rows = spark.read.parquet(os.path.join(root, _CENTROIDS)).collect()
    cells = np.array([r["cell"] for r in rows], dtype=np.int32)
    cmat = np.array([r["centroid"] for r in rows], dtype=np.float64)
    order = np.argsort(cells)
    cmat = cmat[order]
    return cells[order], cmat / np.linalg.norm(cmat, axis=1, keepdims=True)


def build_ivf_store(
    corpus: DataFrame,
    root: str,
    *,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Train (deterministic xxhash64 centroid sample) + assign + write."""
    spark = corpus.sparkSession
    cent_rows = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(nlist)
        .collect()
    )
    if not cent_rows:
        raise ValueError("build_ivf_store: empty corpus — nothing to train on")
    spark.createDataFrame(
        [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(cent_rows)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.parquet(os.path.join(root, _CENTROIDS))
    _, cnorm = _read_centroids(spark, root)
    assigned = corpus.select(id_col, vec_col).mapInPandas(
        _assign_fn(cnorm, id_col, vec_col),
        schema=f"{id_col} long, {vec_col} array<float>, cell int",
    )
    # repartition by cell BEFORE the partitioned write: otherwise every
    # task writes a sliver into every cell directory (tasks x nlist
    # small files — the small-files explosion that drowns later scans)
    assigned.repartition("cell").write.partitionBy("cell").parquet(
        os.path.join(root, _ASSIGNED)
    )


def append_to_ivf_store(
    batch: DataFrame,
    root: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Assign new vectors to the EXISTING centroids and append their
    cell partitions — batch-sized cost, corpus never re-read."""
    spark = batch.sparkSession
    _, cnorm = _read_centroids(spark, root)
    assigned = batch.select(id_col, vec_col).mapInPandas(
        _assign_fn(cnorm, id_col, vec_col),
        schema=f"{id_col} long, {vec_col} array<float>, cell int",
    )
    assigned.repartition("cell").write.mode("append").partitionBy("cell").parquet(
        os.path.join(root, _ASSIGNED)
    )


def ivf_store_topk(
    spark: SparkSession,
    root: str,
    queries_pdf: pd.DataFrame,
    *,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Probe ``nprobe`` cells per query; the ``cell IN (...)`` predicate
    prunes partition directories before any distance math."""
    cells, cnorm = _read_centroids(spark, root)
    if queries_pdf.empty:
        return spark.createDataFrame(
            [], f"{query_id_col} long, {id_col} long, cos_sim double, rank int"
        )
    qids = np.asarray(queries_pdf[query_id_col], dtype=np.int64)
    qmat = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    probe = np.argsort(-(qnorm @ cnorm.T), axis=1)[:, :nprobe]
    pairs = [(int(q), int(cells[c])) for q, row in zip(qids, probe) for c in row]
    probe_df = spark.createDataFrame(pairs, f"{query_id_col} long, cell int")
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in zip(qids, queries_pdf[vec_col])],
        f"{query_id_col} long, __qv array<float>",
    )
    wanted = sorted({c for _, c in pairs})
    assigned = spark.read.parquet(os.path.join(root, _ASSIGNED)).filter(
        F.col("cell").isin(wanted)  # partition-pruned directory scan
    )
    scored = (
        assigned.join(F.broadcast(probe_df), "cell")
        .join(F.broadcast(qdf), query_id_col)
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def rebuild_ivf_store(
    spark: SparkSession,
    root: str,
    *,
    nlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 43,
) -> None:
    """Drift repair: re-train centroids from the CURRENT contents of the
    store (base + every appended batch) and atomically replace the
    index — the explicit, schedulable rebuild the append path defers.
    ``nlist`` defaults to the existing centroid count; a different seed
    than build's keeps the rebuild's sample independent of the original.

    Atomic: the new index is written beside the old one and swapped in
    with two renames, so a concurrent reader sees the old or the new
    index, never a half-written one."""
    import shutil

    current = spark.read.parquet(os.path.join(root, _ASSIGNED)).select(id_col, vec_col)
    if nlist is None:
        nlist = spark.read.parquet(os.path.join(root, _CENTROIDS)).count()
    staging = root + ".rebuild"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    build_ivf_store(
        current, staging, nlist=nlist, id_col=id_col, vec_col=vec_col, seed=seed
    )
    old = root + ".old"
    os.rename(root, old)
    os.rename(staging, root)
    shutil.rmtree(old)
