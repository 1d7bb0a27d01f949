"""Round-3 LLM-data queries: distributed k-means + semantic dedup
(operators/kmeans.py — the SemDeDup scale path).

- d25: spherical k-means assignment, hash-verified as a *differential*:
  the Arrow/numpy kernel's nearest-centroid choice is recomputed in the
  same plan with the independent JVM-expression cosine path
  (functions/vectors.py) over the broadcast final centroids, and the
  query emits per-vector agreement booleans. Two implementations of the
  same math must agree exactly — a broken kernel, a stale broadcast, or
  a tie-break drift all hash-mismatch.
- d26: SemDeDup-style greedy semantic dedup. The drop rule (a vector is
  dropped iff a smaller-id vector is cosine-similar >= threshold) is
  order-free and exactly SQL-expressible, so the oracle is the O(n^2)
  pair join — fine at oracle scale — while the Spark path prunes pair
  generation to k-means cells (multi-probe for seam pairs) and stays
  subquadratic for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_openetl_spark.functions.vectors import cosine
from python_openetl_spark.operators import kmeans, similarity
from python_openetl_spark.workload.util import t

#: Query vectors shared with llm.py's x01/x03/x05 (same fixture ids).
_QUERY_IDS = (1, 5, 9)

_COS_SQL = (
    "list_dot_product(a.v, b.v)"
    " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)


def d25_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    cents, assigned = kmeans.spherical_kmeans(emb, k=8, iters=3, probe=1)
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, cv array<double>",
    )
    # independent JVM-side recheck: cosine against every centroid (k=8
    # broadcast rows), argmax with the same lowest-cell tie-break the
    # numpy kernel uses
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell").asc())
    jvm_best = (
        emb.join(F.broadcast(cent_df))
        .select(
            "vec_id",
            "cell",
            cosine(F.col("embedding"), F.col("cv")).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", F.col("cell").alias("jvm_cell"))
    )
    return (
        assigned.filter(F.col("cell_rank") == 0)
        .join(jvm_best, "vec_id")
        .select("vec_id", (F.col("cell") == F.col("jvm_cell")).alias("nearest_ok"))
    )


def d26_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    out = kmeans.semantic_dedup(emb, threshold=0.45, k=8, iters=3, probe=4)
    return out.select("vec_id", "label")


def x08_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (operators/pq.py): ADC shortlist over
    8-byte PQ codes + exact re-rank, verified like x05 via its own
    guarantee — in-plan recall@k against the exact ranking, emitted as
    a floor boolean. The floor is deliberately modest: the fixture
    embeddings are near-uniform random (incompressible — PQ's known
    worst case, ~0.75 relative reconstruction error), so this pins
    "the ADC+re-rank dataflow works", while tests pin recall 1.0 at
    the scales where the shortlist covers the noise (sf0.001/0.01)."""
    from python_openetl_spark.operators import pq

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=5).select("query_id", "vec_id")
    approx = pq.pq_topk(
        emb, queries.toPandas(), k=5, m=8, ksub=16, iters=3, rerank_factor=20
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
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("k") >= 0.15).alias(
                "recall_ok"
            ),
        )
    )


QUERIES = {
    "d25_kmeans_assign": d25_kmeans_assign,
    "d26_semantic_dedup": d26_semantic_dedup,
    "x08_pq_topk": x08_pq_topk,
}

ORACLE = {
    "d25_kmeans_assign": """
        SELECT vec_id, TRUE AS nearest_ok FROM embeddings
    """,
    "d26_semantic_dedup": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
        drops AS (
          SELECT DISTINCT b.vec_id
          FROM e a JOIN e b ON a.vec_id < b.vec_id
          WHERE {_COS_SQL} >= 0.45
        )
        SELECT vec_id, label FROM e
        WHERE vec_id NOT IN (SELECT vec_id FROM drops)
    """,
    "x08_pq_topk": """
        SELECT vec_id AS query_id, CAST(5 AS INT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id IN (1, 5, 9)
    """,
}


def d27_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span detection (the exact-substring tier
    of dedup, a la Lee et al. "Deduplicating Training Data Makes
    Language Models Better": find 5-token windows occurring in more
    than one document). Per doc: distinct windows, windows shared with
    any other doc, and the shared fraction. Shuffle carries 60-bit
    window hashes, never text; short docs (< n tokens) have zero
    windows and report 0.0."""
    from python_openetl_spark.functions.text import text_shingles, token_hash60
    from python_openetl_spark.session import scan_parallelism

    d = t(spark, sf_dir, "documents")
    win = (
        d.repartition(scan_parallelism(d), F.col("doc_id"))
        .select(
            F.col("doc_id"),
            F.explode(F.array_distinct(text_shingles(F.col("text"), 5))).alias("w"),
        )
        .select("doc_id", token_hash60(F.col("w")).alias("wh"))
    )
    # "shared by >=2 docs" == min(doc) != max(doc): map-side-combinable
    # min/max instead of a COUNT DISTINCT whose per-window distinct state
    # would concentrate on hot (stop-phrase) windows at scale
    docs_per = win.groupBy("wh").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("shared")
    )
    per_doc = (
        win.join(docs_per, "wh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("shared"), 1).otherwise(0)).alias("n_shared"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.round(
                F.when(
                    F.coalesce("n_windows", F.lit(0)) > 0,
                    F.coalesce("n_shared", F.lit(0)) / F.col("n_windows"),
                ).otherwise(0.0),
                6,
            ).alias("shared_frac"),
        )
    )


def d28_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d23's nightly-ingest classification with the Bloom-prefiltered
    store join (operators/dedup.incremental_dedup_bloom): identical
    output by construction — false positives are rejected by the exact
    confirm join, false negatives cannot exist — so it shares d23's
    oracle while the store join's probe side shrinks to the fraction
    of the batch the filter cannot rule out."""
    from python_openetl_spark.functions.text import fingerprint
    from python_openetl_spark.operators import dedup as dd
    from python_openetl_spark.workload.llm3 import _OFF

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    resub = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _OFF).alias("doc_id"), "text"
    )
    fresh = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2 * _OFF).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qqq")).alias("text"),
    )
    fresh_again = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 3 * _OFF).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qqq")).alias("text"),
    )
    batch = resub.unionByName(fresh).unionByName(fresh_again)
    store = d.select(fingerprint("text").alias("fp")).distinct()
    return dd.incremental_dedup_bloom(batch, store)


QUERIES["d27_repeated_ngram_spans"] = d27_repeated_ngram_spans
QUERIES["d28_bloom_incremental_dedup"] = d28_bloom_incremental_dedup

from python_openetl_spark.workload.llm3 import _TOKS, _shingles  # noqa: E402
from python_openetl_spark.workload.llm3 import ORACLE as _L3_ORACLE  # noqa: E402

ORACLE["d27_repeated_ngram_spans"] = f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    win AS (
      SELECT DISTINCT doc_id, unnest(list_distinct({_shingles(5)})) AS w
      FROM tk
    ),
    per_w AS (SELECT w, COUNT(DISTINCT doc_id) AS nd FROM win GROUP BY w),
    per_doc AS (
      SELECT win.doc_id,
             COUNT(*) AS n_windows,
             CAST(SUM(CASE WHEN p.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      FROM win JOIN per_w p ON win.w = p.w
      GROUP BY win.doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_windows, 0) AS n_windows,
           COALESCE(n_shared, 0) AS n_shared,
           ROUND(CASE WHEN COALESCE(n_windows, 0) > 0
                      THEN COALESCE(n_shared, 0) / n_windows ELSE 0.0 END, 6)
             AS shared_frac
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""
ORACLE["d28_bloom_incremental_dedup"] = _L3_ORACLE["d23_incremental_dedup"]


def d29_incremental_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly near-dup ingest (operators/dedup.incremental_near_dedup):
    the documents table's LSH band keys are the store; the batch
    re-submits every 5th doc verbatim (collides with the store), and
    for every 11th doc submits a fresh synthetic text twice under two
    new ids (identical bands: smaller id classifies 'new', larger
    'near_dup_in_batch'). Statuses are defined by band collision — the
    oracle replicates the identical integer MinHash arithmetic, so the
    classification matches bit-for-bit whatever the banding decides."""
    from python_openetl_spark.operators import dedup as dd
    from python_openetl_spark.workload.llm3 import _OFF

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    resub = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _OFF).alias("doc_id"), "text"
    )
    synth_text = F.concat_ws(
        " ",
        *[F.concat(F.lit(w), F.col("doc_id").cast("string")) for w in
          ("zqa", "zqb", "zqc", "zqd", "zqe", "zqf")],
    )
    fresh = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 2 * _OFF).alias("doc_id"), synth_text.alias("text")
    )
    fresh2 = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 3 * _OFF).alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(w), (F.col("doc_id")).cast("string")) for w in
              ("zqa", "zqb", "zqc", "zqd", "zqe", "zqf")],
        ).alias("text"),
    )
    batch = resub.unionByName(fresh).unionByName(fresh2)
    store = dd.minhash_band_keys(d)
    return dd.incremental_near_dedup(batch, store)


QUERIES["d29_incremental_near_dedup"] = d29_incremental_near_dedup

from python_openetl_spark.workload.llm import (  # noqa: E402
    _TOKS_SQL,
    _band_rows_sql,
    _minhash_sig_sql,
)

_SHINGLES3_SQL = """
  CASE WHEN len(toks) >= 3
       THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(list_slice(toks, i, i + 2), ' '))
       ELSE [] END
"""

_BANDS_OF = """
    tk AS (SELECT doc_id, {toks} AS toks FROM {src}),
    shx AS (SELECT doc_id, {sh} AS sh FROM tk),
    shf AS (SELECT doc_id, sh FROM shx WHERE len(sh) > 0),
    ex AS (SELECT doc_id AS doc, unnest(sh) AS shingle FROM shf),
    hashed AS (
      SELECT doc,
             (('0x' || substr(md5(shingle), 1, 15))::UBIGINT % 2147483647)::BIGINT AS h
      FROM ex
    ),
    sigs AS (SELECT doc, {sig} FROM hashed GROUP BY doc),
    bands AS ({bands})
"""

ORACLE["d29_incremental_near_dedup"] = f"""
    WITH store_docs AS (SELECT doc_id, text FROM documents),
    batch AS (
      SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 20000000,
             concat_ws(' ', 'zqa'||doc_id, 'zqb'||doc_id, 'zqc'||doc_id,
                            'zqd'||doc_id, 'zqe'||doc_id, 'zqf'||doc_id)
      FROM documents WHERE doc_id % 11 = 0
      UNION ALL
      SELECT doc_id + 30000000,
             concat_ws(' ', 'zqa'||doc_id, 'zqb'||doc_id, 'zqc'||doc_id,
                            'zqd'||doc_id, 'zqe'||doc_id, 'zqf'||doc_id)
      FROM documents WHERE doc_id % 11 = 0
    ),
    sbands AS (
      WITH {_BANDS_OF.format(toks=_TOKS_SQL, sh=_SHINGLES3_SQL, src="store_docs",
                             sig=_minhash_sig_sql(16), bands=_band_rows_sql(4, 4))}
      SELECT DISTINCT band, k1, k2 FROM bands
    ),
    bbands AS (
      WITH {_BANDS_OF.format(toks=_TOKS_SQL, sh=_SHINGLES3_SQL, src="batch",
                             sig=_minhash_sig_sql(16), bands=_band_rows_sql(4, 4))}
      SELECT doc, band, k1, k2 FROM bands
    ),
    store_hit AS (
      SELECT DISTINCT b.doc FROM bbands b
      JOIN sbands s ON b.band = s.band AND b.k1 = s.k1 AND b.k2 = s.k2
    ),
    batch_hit AS (
      SELECT DISTINCT b.doc FROM bbands a
      JOIN bbands b ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
                   AND a.doc < b.doc
    )
    SELECT bt.doc_id,
           CASE WHEN sh.doc IS NOT NULL THEN 'near_dup_of_store'
                WHEN bh.doc IS NOT NULL THEN 'near_dup_in_batch'
                ELSE 'new' END AS status
    FROM batch bt
    LEFT JOIN store_hit sh ON bt.doc_id = sh.doc
    LEFT JOIN batch_hit bh ON bt.doc_id = bh.doc
"""


def d30_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoding (operators/prep.build_vocab + vocab_encode):
    documents as token-id sequences against the top-1000 vocab, OOV=0.
    The sequences themselves are arrays (which the driver canonicalizer
    cannot sort), so the hash-checked output carries order-sensitive
    scalar checksums: a position-weighted id sum pins content AND
    order; n_tokens/n_oov pin coverage."""
    from python_openetl_spark.operators import prep

    d = t(spark, sf_dir, "documents")
    vocab = prep.build_vocab(d, vocab_size=1000)
    enc = prep.vocab_encode(d, vocab)
    return enc.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        # coalesce: a zero-token doc zips token_ids=[] against sequence
        # [1], padding a NULL tid whose acc+NULL propagates NULL — the
        # oracle COALESCEs to 0, so match it (fixtures currently have
        # >=10 tokens/doc, but testdata regenerates between rounds)
        F.coalesce(
            F.aggregate(
                F.zip_with(
                    F.col("token_ids"),
                    F.sequence(F.lit(1), F.greatest(F.size("token_ids"), F.lit(1))),
                    lambda tid, pos: tid.cast("long") * pos.cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
            F.lit(0).cast("long"),
        ).alias("ids_checksum"),
    )


QUERIES["d30_vocab_encode"] = d30_vocab_encode

ORACLE["d30_vocab_encode"] = f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    counts AS (
      SELECT tok, COUNT(*) AS n
      FROM (SELECT unnest(toks) AS tok FROM tk)
      GROUP BY tok ORDER BY n DESC, tok LIMIT 1000
    ),
    vocab AS (
      SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS INT) AS tid
      FROM counts
    ),
    ex AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(range(1, len(toks) + 1)) AS pos
      FROM tk
    ),
    tagged AS (
      SELECT e.doc_id, e.pos, COALESCE(v.tid, 0) AS tid
      FROM ex e LEFT JOIN vocab v ON e.tok = v.tok
    ),
    enc AS (
      SELECT doc_id,
             COUNT(*) AS n_tokens,
             CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             CAST(SUM(CAST(tid AS BIGINT) * pos) AS BIGINT) AS ids_checksum
      FROM tagged GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_tokens, 0) AS n_tokens,
           COALESCE(n_oov, 0) AS n_oov,
           COALESCE(ids_checksum, 0) AS ids_checksum
    FROM documents d LEFT JOIN enc ON d.doc_id = enc.doc_id
"""
