"""Round-4 session-2 LLM-data queries: sparse lexical retrieval.

Registered after ``relational2`` in ``_MODULES`` so the frozen
``_WINDOW_R4`` is unchanged; locally oracle-gated now, rotates into
``_WINDOW_R5``.

d34: BM25 top-k retrieval over an inverted index
(operators/retrieval.py) — the sparse complement of the dense ANN
family (x01–x08) and the retrieval tier of decontamination (e02/e03
find n-gram overlap; BM25 finds lexical near-matches that share no
exact n-gram). The query set is derived deterministically from the
corpus itself (every 211th document's first six tokens), so the
workload needs no external fixture and scales with sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.functions.text import tokens
from python_openetl_spark.operators.retrieval import bm25_topk
from python_openetl_spark.workload.llm3 import _TOKS
from python_openetl_spark.workload.util import t

#: every Nth document seeds a query
_Q_MOD = 211
#: tokens per derived query
_Q_LEN = 6
_K = 5


def _derived_queries(docs: DataFrame) -> DataFrame:
    return docs.filter(F.col("doc_id") % _Q_MOD == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(tokens("text"), 1, _Q_LEN), " ").alias("qtext"),
    )


def d34_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return bm25_topk(docs, _derived_queries(docs), k=_K)


def x09_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF+PQ ANN (operators/pq.py ivf_pq_topk — the FAISS
    IVFPQ architecture: coarse cell pruning × one-byte ADC codes ×
    exact shortlist re-rank). Driver contract is the x05 pattern:
    exact-anchor rows + an in-plan recall-floor boolean, so a broken
    probe or LUT path (recall 0) hash-mismatches while legitimate ANN
    noise cannot. Tight pinned-recall assertions live in
    tests/test_pq.py."""
    from python_openetl_spark.operators import similarity
    from python_openetl_spark.operators.pq import ivf_pq_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(1, 5, 9)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=5).select("query_id", "vec_id")
    approx = ivf_pq_topk(
        emb, queries.toPandas(), k=5, nlist=16, nprobe=12, m=8, ksub=16, rerank_factor=8
    )
    hits = (
        approx.select("query_id", "vec_id")
        .join(exact, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.col("k").cast("int").alias("k"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("k") >= 0.2).alias(
                "recall_ok"
            ),
        )
    )


def mm04_modality_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-corpus modality routing
    (operators/multimodal.py dispatch_modalities): one Arrow pass
    splits each batch by a modality column and runs the matching fake
    decode kernel — image dims from the content hash (the mm02
    device), audio duration / video frame count from byte length.
    Every fake kernel's arithmetic is integer-exact, so the whole
    dispatch (routing, NULL-payload skip, unknown-modality NULLs) is
    value-hash oracle-checked."""
    from python_openetl_spark.operators.multimodal import dispatch_modalities

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video"), F.lit("pdf")),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ).alias("modality"),
    )
    return dispatch_modalities(d, fake=True)


QUERIES = {
    "d34_bm25_topk": d34_bm25_topk,
    "x09_ivf_pq_topk": x09_ivf_pq_topk,
    "mm04_modality_dispatch": mm04_modality_dispatch,
}

# Literals below mirror operators/retrieval.py's expression tree op for
# op (module docstring there has the determinism contract): k1=1.2,
# b=0.75 -> k1+1 = 2.2, 1-b = 0.25 — all exact shortest-repr doubles on
# both parsers.
ORACLE = {
    "d34_bm25_topk": f"""
        WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(len(toks)) AS sum_dl FROM tk),
        dl AS (SELECT doc_id, len(toks) AS dl FROM tk),
        q AS (SELECT doc_id AS query_id, list_slice(toks, 1, {_Q_LEN}) AS qt
              FROM tk WHERE doc_id % {_Q_MOD} = 0),
        qterms AS (SELECT DISTINCT query_id, unnest(qt) AS term FROM q),
        qvocab AS (SELECT DISTINCT term FROM qterms),
        post AS (
          SELECT term, doc_id, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(toks) AS term FROM tk
          ) WHERE term IN (SELECT term FROM qvocab)
          GROUP BY term, doc_id
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
        scored AS (
          SELECT query_id, doc_id,
                 SUM(CAST(ROUND(
                   ROUND(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                            / (CAST(df AS DOUBLE) + 0.5) + 1.0), 9)
                   * (CAST(tf AS DOUBLE) * 2.2
                      / (CAST(tf AS DOUBLE)
                         + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
                                  / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
                 , 7) AS DECIMAL(20,7))) AS score_dec
          FROM post
          JOIN qterms USING (term)
          JOIN dfreq USING (term)
          JOIN dl USING (doc_id)
          CROSS JOIN stats
          GROUP BY query_id, doc_id
        )
        SELECT query_id, doc_id, CAST(score_dec AS DOUBLE) AS score, rank FROM (
          SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id ORDER BY score_dec DESC, doc_id) AS rank
          FROM scored
        ) WHERE rank <= {_K}
    """,
    "x09_ivf_pq_topk": """
        SELECT vec_id AS query_id, CAST(5 AS INT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id IN (1, 5, 9)
    """,
    # mirrors the fake kernels in operators/multimodal.py: image dims =
    # the mm02 sha-hex device; audio = bytes // 32 (16 kHz mono 16-bit
    # PCM ms); video = ceil(bytes / 64) frames; 'pdf' has no kernel ->
    # NULLs; NULL payload -> NULLs
    "mm04_modality_dispatch": """
        WITH b AS (
          SELECT doc_id,
                 octet_length(encode(text)) AS n,
                 sha256(text) AS hx,
                 ['image','audio','video','pdf'][(doc_id % 4 + 1)::INT] AS modality
          FROM documents
        )
        SELECT doc_id, modality,
               CAST(CASE WHEN n IS NULL THEN NULL
                    WHEN modality = 'image' THEN 64 + ('0x' || substr(hx, 1, 2))::INT % 192
                    WHEN modality = 'audio' THEN n // 32
                    WHEN modality = 'video' THEN (n + 63) // 64
                    ELSE NULL END AS BIGINT) AS feat_a,
               CAST(CASE WHEN n IS NULL THEN NULL
                    WHEN modality = 'image' THEN 64 + ('0x' || substr(hx, 3, 2))::INT % 192
                    ELSE NULL END AS BIGINT) AS feat_b
        FROM b
    """,
}
