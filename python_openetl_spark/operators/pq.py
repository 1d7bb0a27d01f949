"""Product quantization (PQ) for embedding columns: Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011.

The 100 TB ANN compression path: split each dim-d vector into ``m``
subvectors, learn a ``ksub``-centroid L2 codebook per subspace, store
each vector as ``m`` one-byte codes plus its norm — 256-byte float32
embeddings become ~16 bytes, so a 100 TB corpus's index fits in ~6 TB
and scans stay memory-bandwidth-bound. Queries score candidates with
ADC (asymmetric distance computation): one ``m x ksub`` lookup table
of query-subvector dots per query, then each candidate's approximate
dot is ``m`` table lookups — no float math per dimension — followed by
an exact re-rank of the shortlist.

Scale shape (mirrors operators/kmeans.py):

- codebooks are ``m x ksub x (d/m)`` doubles — broadcast, never
  shuffled; one Arrow-batched corpus scan per Lloyd iteration emits
  per-batch partial sums for ALL subspaces at once (<= m x ksub rows
  per batch), reduced distributedly via posexplode + groupBy;
- encoding is one scan emitting (id, codes, norm) — the only thing a
  query-time scan ever reads;
- ADC candidate generation is per-batch local top-C (the
  cosine_topk_arrow pattern): the shuffle carries O(batches x q x C)
  candidate rows, never scores;
- the exact re-rank joins the tiny candidate set back to the corpus by
  broadcast and scores with the JVM cosine expression — bit-identical
  to the SQL oracle, which is what lets a full-recall configuration
  hash-match exact top-k.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _empty_topk(spark, query_id_col: str, id_col: str) -> DataFrame:
    """Typed empty result for a zero-query call (the similarity.py
    convention: degrade, don't raise a driver-side stack error)."""
    return spark.createDataFrame(
        [], f"{query_id_col} long, {id_col} long, cos_sim double, rank int"
    )


def pq_fit(
    df: DataFrame,
    *,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Learn per-subspace L2 codebooks; returns ``(m, ksub, d/m)``.

    Seeds are the subvectors of a deterministic xxhash64-ordered sample
    (engine-reproducible); each Lloyd iteration is ONE corpus scan that
    updates every subspace's codebook simultaneously.
    """
    # codes are one byte (array<tinyint>); decoders mask with & 0xFF,
    # so 256 centroids are addressable but no more
    assert 0 < ksub <= 256, f"ksub={ksub} exceeds one-byte code range"
    src = df.select(id_col, vec_col)
    rows = (
        src.withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(ksub)
        .collect()
    )
    if not rows:
        raise ValueError("pq_fit: empty corpus (no vectors to learn codebooks from)")
    sample = np.array([r[vec_col] for r in rows], dtype=np.float64)
    ksub = min(ksub, sample.shape[0])
    d = sample.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    books = np.stack(
        [sample[:, s * dsub : (s + 1) * dsub].copy() for s in range(m)]
    )  # (m, ksub, dsub)

    for _ in range(iters):
        b_bc = books

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                subs, cells, ns, sums = [], [], [], []
                for s in range(m):
                    x = mat[:, s * dsub : (s + 1) * dsub]
                    # ||x-c||^2 argmin == argmax(2x.c - ||c||^2)
                    c = b_bc[s]
                    assign = (2.0 * x @ c.T - (c * c).sum(axis=1)).argmax(axis=1)
                    acc = np.zeros((ksub, dsub))
                    np.add.at(acc, assign, x)
                    cnt = np.bincount(assign, minlength=ksub)
                    live = np.flatnonzero(cnt)
                    subs.append(np.full(live.size, s, dtype=np.int32))
                    cells.append(live.astype(np.int32))
                    ns.append(cnt[live].astype(np.int64))
                    sums.extend(list(acc[live]))
                yield pd.DataFrame(
                    {
                        "sub": np.concatenate(subs),
                        "cell": np.concatenate(cells),
                        "n": np.concatenate(ns),
                        "s": sums,
                    }
                )

        agg = (
            src.mapInPandas(partials, schema="sub int, cell int, n long, s array<double>")
            .select("sub", "cell", "n", F.posexplode("s").alias("pos", "val"))
            .groupBy("sub", "cell", "pos")
            .agg(
                F.sum("val").alias("val"),
                F.sum(F.when(F.col("pos") == 0, F.col("n")).otherwise(0)).alias("n0"),
            )
            .collect()
        )
        sums = np.zeros_like(books)
        counts = np.zeros((m, ksub), dtype=np.int64)
        for r in agg:
            sums[r["sub"], r["cell"], r["pos"]] = r["val"]
            if r["pos"] == 0:
                counts[r["sub"], r["cell"]] = r["n0"]
        new = books.copy()
        live = counts > 0
        new[live] = sums[live] / counts[live][:, None]  # empty cells keep centroid
        books = new
    return books


def pq_encode(
    df: DataFrame,
    books: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One scan -> ``(id, codes array<tinyint>, vnorm double)``.

    Codes for cells 128..255 wrap negative in int8 storage; decoders
    must mask with ``& 0xFF`` before using them as codebook indices.
    """
    m, ksub, dsub = books.shape
    assert ksub <= 256, f"ksub={ksub} exceeds one-byte code range"
    b_bc = books

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int8)
            for s in range(m):
                x = mat[:, s * dsub : (s + 1) * dsub]
                c = b_bc[s]
                codes[:, s] = (2.0 * x @ c.T - (c * c).sum(axis=1)).argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": list(codes),
                    "vnorm": np.linalg.norm(mat, axis=1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} long, codes array<tinyint>, vnorm double"
    )


def pq_topk(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    *,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: ADC shortlist over PQ codes, exact
    JVM-cosine re-rank of the top ``rerank_factor * k`` candidates.

    The re-ranked scores are bit-identical to the exact path, so when
    the shortlist captures the true top-k (fixture settings do — pinned
    in tests), the full result hash-matches the brute-force oracle.
    """
    from python_openetl_spark.operators.ivf_store import _cosine_clamped

    spark = corpus.sparkSession
    if queries_pdf.empty:
        return _empty_topk(spark, query_id_col, id_col)
    books = pq_fit(
        corpus, m=m, ksub=ksub, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    enc = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)

    qids = np.asarray(queries_pdf[query_id_col], dtype=np.int64)
    qmat = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    dsub = books.shape[2]
    # LUT[q, s, c] = dot(q_sub, book[s][c])
    lut = np.einsum("qsd,scd->qsc", qmat.reshape(len(qids), m, dsub), books)
    shortlist = max(k * rerank_factor, k)

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub_idx = np.arange(m)
        for pdf in batches:
            # & 0xFF: int8 storage wraps cells 128..255 negative; mask
            # back to unsigned before LUT indexing
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64) & 0xFF  # (n, m)
            vnorm = pdf["vnorm"].to_numpy()
            ids = pdf[id_col].to_numpy()
            out_q, out_id, out_s = [], [], []
            for qi in range(len(qids)):
                dots = lut[qi][sub_idx, codes].sum(axis=1)
                # zero-norm guard: vnorm 0 / the 1e-300 clamp would
                # inflate the score to ~1e300 and hijack the shortlist
                score = np.where(
                    vnorm * qnorm[qi] == 0.0,
                    0.0,
                    dots / np.maximum(vnorm * qnorm[qi], 1e-300),
                )
                mask = ids != qids[qi]
                cand_ids, cand_sc = ids[mask], score[mask]
                top = np.argsort(-cand_sc, kind="stable")[:shortlist]
                out_q.append(np.full(top.size, qids[qi]))
                out_id.append(cand_ids[top])
                out_s.append(cand_sc[top])
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    id_col: np.concatenate(out_id),
                    "adc_score": np.concatenate(out_s),
                }
            )

    w_short = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_score").desc(), F.col(id_col)
    )
    cand = (
        enc.mapInPandas(adc, schema=f"{query_id_col} long, {id_col} long, adc_score double")
        .withColumn("__r", F.row_number().over(w_short))
        .filter(F.col("__r") <= shortlist)
        .select(query_id_col, id_col)
    )
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in zip(qids, queries_pdf[vec_col])],
        f"{query_id_col} long, __qv array<float>",
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(cand), id_col)
        .join(F.broadcast(qdf), query_id_col)
        .select(
            query_id_col,
            id_col,
            # clamped: a zero-norm shortlist row scores 0.0, not a NaN
            # Spark ranks first; identical for any nonzero pair
            _cosine_clamped(F.col(vec_col), F.col("__qv")).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    *,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """IVF + PQ composed (the FAISS ``IVFPQ`` architecture): a coarse
    inverted-file quantizer prunes WHICH vectors are scored, PQ codes
    shrink WHAT is read per scored vector, ADC scores them with table
    lookups, and an exact re-rank fixes the shortlist.

    At 100 TB this is the only shape that works: ``nprobe/nlist`` of
    the corpus is touched per query (cell = partition key, so probing
    is partition pruning), and what is touched is ~16-byte codes
    instead of kilobyte vectors — the two approximations multiply to
    a ~100-1000x scan reduction, then the exact re-rank touches only
    ``rerank_factor * k`` full vectors per query. Codebooks here are
    trained on raw vectors (FAISS-style residual encoding would reuse
    the same dataflow with ``x - centroid[cell]`` inside the kernels).

    One corpus scan assigns cells AND encodes codes; recall is
    tunable with (nlist, nprobe, m, ksub, rerank_factor) — pinned
    settings and bounds live in tests/test_pq.py.
    """
    from python_openetl_spark.operators.ivf_store import _cosine_clamped

    spark = corpus.sparkSession
    # empty-query guard (same convention as cosine_topk_arrow/ivf_topk):
    # np.stack on zero queries raises; pq_fit raises by contract on an
    # empty CORPUS, so cent_rows below is non-empty whenever we get there
    if queries_pdf.empty:
        return _empty_topk(spark, query_id_col, id_col)
    books = pq_fit(
        corpus, m=m, ksub=ksub, iters=iters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    # coarse centroids: the deterministic xxhash64-ordered sample device
    # (similarity.ivf_topk), offset seed so coarse != PQ seeds
    cent_rows = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed + 1)))
        .orderBy("__h")
        .limit(nlist)
        .collect()
    )
    cmat = np.array([r[vec_col] for r in cent_rows], dtype=np.float64)
    cnorm = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    dsub = books.shape[2]

    def encode_assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            mn = mat / np.maximum(norms[:, None], 1e-300)
            cell = (mn @ cnorm.T).argmax(axis=1).astype(np.int32)
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for s in range(m):
                x = mat[:, s * dsub : (s + 1) * dsub]
                c = books[s]
                codes[:, s] = (2.0 * x @ c.T - (c * c).sum(axis=1)).argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": cell,
                    "codes": list((codes & 0xFF).astype(np.int8)),
                    "vnorm": norms,
                }
            )

    enc = corpus.select(id_col, vec_col).mapInPandas(
        encode_assign, schema=f"{id_col} long, cell int, codes array<tinyint>, vnorm double"
    )

    qids = np.asarray(queries_pdf[query_id_col], dtype=np.int64)
    qmat = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    qnorms = np.linalg.norm(qmat, axis=1)
    qn = qmat / np.maximum(qnorms[:, None], 1e-300)
    probe = np.argsort(-(qn @ cnorm.T), axis=1)[:, :nprobe]
    probe_df = spark.createDataFrame(
        [(int(q), int(c)) for q, row in zip(qids, probe) for c in row],
        f"{query_id_col} long, cell int",
    )
    lut = np.einsum("qsd,scd->qsc", qmat.reshape(len(qids), m, dsub), books)
    qpos = {int(q): i for i, q in enumerate(qids)}
    shortlist = max(k * rerank_factor, k)

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sub_idx = np.arange(m)
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64) & 0xFF
            qidx = pdf[query_id_col].map(qpos).to_numpy()
            dots = lut[qidx[:, None], sub_idx[None, :], codes].sum(axis=1)
            vn = pdf["vnorm"].to_numpy()
            score = np.where(  # zero-norm guard (see adc above)
                vn * qnorms[qidx] == 0.0,
                0.0,
                dots / np.maximum(vn * qnorms[qidx], 1e-300),
            )
            yield pd.DataFrame(
                {
                    query_id_col: pdf[query_id_col],
                    id_col: pdf[id_col],
                    "adc_score": score,
                }
            )

    cand_rows = (
        enc.join(F.broadcast(probe_df), "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, "codes", "vnorm")
        .mapInPandas(adc, schema=f"{query_id_col} long, {id_col} long, adc_score double")
    )
    w_short = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_score").desc(), F.col(id_col)
    )
    cand = (
        cand_rows.withColumn("__r", F.row_number().over(w_short))
        .filter(F.col("__r") <= shortlist)
        .select(query_id_col, id_col)
    )
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in zip(qids, queries_pdf[vec_col])],
        f"{query_id_col} long, __qv array<float>",
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(cand), id_col)
        .join(F.broadcast(qdf), query_id_col)
        .select(
            query_id_col,
            id_col,
            # clamped: a zero-norm shortlist row scores 0.0, not a NaN
            # Spark ranks first; identical for any nonzero pair
            _cosine_clamped(F.col(vec_col), F.col("__qv")).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
