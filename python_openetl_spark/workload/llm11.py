"""Round-8 LLM-data additions.

- x19: cross-dataset kNN JOIN linkage — the ``exclude_self=False``
  form of the exact block GEMM join (r7 verdict #3): query ids
  deliberately COLLIDE with unrelated corpus ids, and the colliding
  corpus rows must still be retrievable (x16 masks them by design;
  linkage across two id spaces must not).
- s12: STREAMING vector ingest into the persisted IVF store
  (``streaming/sinks.py IvfAppendSink`` → ``operators/ivf_store.py``):
  the index fills from micro-batches — the add-after-train contract
  driven by a real replayed stream — then anchors planted in the
  streamed batches must be retrievable.
- d53: n-gram novelty profile — per-document fraction of distinct
  token trigrams that appear in NO other document; the
  memorization/duplication complement of d18's within-doc repetition.
- e08: temperature-weighted mixture resample
  (``operators/prep.py temperature_mixture``) — per-language weights
  derived from the corpus as ``count^alpha / Σ count^alpha`` (the
  multilingual-LM temperature-sampling rule, over the fixture's
  SKEWED lang stratum), applied with the deterministic content-hash
  device of d22.

Reference parity: the reference (tmccall8829/python-openetl) has no
vector or corpus-prep surface; these extend its batch-linkage and
sync verbs (pyopenetl/operations.py:515-609) to the
embedding-similarity and training-mixture operations a training-data
pipeline needs — the BASELINE.json LLM-data north star.

Registered after ``llm10`` in ``_MODULES``; these are round-8
post-window additions that rotate into ``_WINDOW_R9``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.functions.text import tokens
from python_openetl_spark.workload.llm import _TOKS_SQL
from python_openetl_spark.workload.util import corpus_key, nonempty, t, table_rows


def x19_knn_join_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dataset kNN linkage: every 40th vector queries the corpus
    under a REMAPPED id (``vec_id DIV 2``) that numerically collides
    with an unrelated corpus row's id. With ``exclude_self=False``
    (operators/knn_join.py, r7 verdict #3) the colliding corpus row
    competes like any other — the exact SQL oracle has NO self-
    exclusion clause, so a kernel that silently masked id-equal pairs
    would drop rows and hash-mismatch. Same block nested-loop GEMM and
    (cos desc, id) tie-break as x16, so the result is bit-identical to
    the brute-force oracle."""
    from python_openetl_spark.operators.knn_join import cosine_knn_join

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 40 == 1).select(
        F.expr("vec_id DIV 2").alias("query_id"), "embedding"
    )
    return cosine_knn_join(
        emb,
        queries,
        k=3,
        corpus_block_rows=1024,
        query_block_rows=16,
        exclude_self=False,
    )


#: s12 store memo: sf_dir -> streamed store root (the x15/x18 rule: an
#: index is amortized infrastructure, not per-query cost — bench repeats
#: measure the probe path; the cold build+stream is the first repeat)
_S12_STORES: dict = {}

#: anchors planted in the STREAMED batches (vec_id % 5 == 0)
_S12_ANCHOR_SRCS = (10, 25, 40)
_S12_QID_BASE = 3_000_000


def s12_stream_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming vector ingest into the persisted IVF index: the store
    is built from 80% of the corpus, the remaining 20% arrives as three
    replayed micro-batches through ``foreachBatch(IvfAppendSink)`` —
    each batch assigned to the EXISTING k-means centroids and appended
    to its cell partitions at batch-sized cost, with a marker-file
    replay guard — and the row then probes anchors EQUAL to streamed
    vectors at the production ``nlist/8`` budget. The anchor invariant
    is deterministic (identical vector -> same nearest cell -> always
    probed -> cosine 1.0 -> in top-5), so a broken sink, marker, or
    append path flips the row while ANN approximation noise cannot."""
    import math
    import tempfile

    from python_openetl_spark.operators.ivf_store import (
        build_ivf_store,
        ivf_store_topk,
    )
    from python_openetl_spark.operators.tuning import ivf_params
    from python_openetl_spark.streaming.sinks import IvfAppendSink
    from python_openetl_spark.streaming.sources import (
        read_file_stream,
        stage_replay_dir,
    )

    emb = t(spark, sf_dir, "embeddings")
    if not nonempty(sf_dir, "embeddings"):
        return spark.createDataFrame([], "query_id long, anchor_found boolean")
    p = ivf_params(table_rows(sf_dir, "embeddings"))
    root = _S12_STORES.get(corpus_key(sf_dir))
    if root is None:
        tmp = tempfile.mkdtemp(prefix="poe_s12_")
        root = tmp + "/ivf"
        build_ivf_store(
            emb.filter(F.col("vec_id") % 5 != 0), root, nlist=p["nlist"]
        )
        late = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
        path = stage_replay_dir(
            late, tmp + "/replay", chunks=3, order_col="vec_id"
        )
        q = (
            read_file_stream(spark, path, late.schema)
            .writeStream.foreachBatch(
                IvfAppendSink(root, stream_id=tmp + "/ckpt")
            )
            .option("checkpointLocation", tmp + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        # memoize ONLY a fully-ingested store: awaitTermination(timeout)
        # returns False if the trigger hasn't finished — memoizing then
        # would pin a partial store for the rest of the session
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                "s12: streaming ingest did not finish within 300s"
            )
        _S12_STORES[corpus_key(sf_dir)] = root
    anchors = (
        emb.filter(F.col("vec_id").isin(*_S12_ANCHOR_SRCS))
        .select(
            (F.col("vec_id") + _S12_QID_BASE).cast("long").alias("query_id"),
            "embedding",
        )
        .toPandas()
    )
    approx = ivf_store_topk(
        spark, root, anchors, k=5, nprobe=max(1, p["nlist"] // 8)
    )
    return (
        approx.groupBy("query_id")
        .agg(
            F.max(
                F.col("vec_id") == F.col("query_id") - _S12_QID_BASE
            ).alias("anchor_found")
        )
        .select("query_id", "anchor_found")
    )


def d53_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    DISTINCT token trigrams that appear in no other document — high
    novelty marks unique content, low novelty marks boilerplate or
    near-duplication the dedup family should look at (the cross-doc
    complement of d18's within-doc repetition stats). Dataflow: one
    explode to distinct (doc, trigram) pairs, one count per trigram,
    one semi-aggregated join back — trigram strings shuffle once, raw
    text never does. Documents with fewer than 3 tokens have no
    trigrams and no row (stated, and identical in the oracle)."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", tokens("text").alias("tk"))
    n = F.size("tk")
    tris = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(2)),
            lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i, F.lit(3))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dt = (
        tk.select("doc_id", F.explode(tris).alias("tri"))
        .distinct()
    )
    gram_docs = dt.groupBy("tri").agg(F.count(F.lit(1)).alias("ndocs"))
    return (
        dt.join(gram_docs, "tri")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("ndocs") == 1).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            # floor-scale, not ROUND (the q71/s09 idiom): engines round
            # decimal ties of exact k/n rationals differently
            (F.floor(F.col("n_novel") / F.col("n_grams") * 1e6) / 1e6).alias(
                "novelty"
            ),
        )
    )


def e08_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted language mixture (operators/prep.py
    temperature_mixture): per-language weights DERIVED from the corpus
    as ``sqrt(count_l) / Σ sqrt(count)`` (alpha = 0.5 — the
    multilingual-LM temperature-sampling rule that up-weights small
    languages; the fixture's lang column is the skewed stratum — en
    dominates — where the rule actually bites, unlike the uniform
    source column), then the d22 deterministic content-hash keep. SQRT
    is IEEE-correctly-rounded on both engines (POWER is not) and the
    normalizing sum is decimal, so the accept thresholds are
    bit-identical."""
    from python_openetl_spark.operators.prep import temperature_mixture

    out = temperature_mixture(
        t(spark, sf_dir, "documents"), alpha=0.5, strata_col="lang"
    )
    return out.select("doc_id", "source", "lang")


QUERIES = {
    "x19_knn_join_linkage": x19_knn_join_linkage,
    "s12_stream_ivf_ingest": s12_stream_ivf_ingest,
    "d53_ngram_novelty": d53_ngram_novelty,
    "e08_temperature_mixture": e08_temperature_mixture,
}

ORACLE = {
    "x19_knn_join_linkage": """
        WITH q AS (SELECT vec_id // 2 AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id % 40 = 1),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
          SELECT q.query_id, c.vec_id,
                 list_dot_product(c.v, q.qv)
                   / (sqrt(list_dot_product(c.v, c.v))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
          FROM c, q
        )
        SELECT query_id, vec_id, cos_sim, rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored
        ) WHERE rank <= 3
    """,
    "s12_stream_ivf_ingest": f"""
        SELECT vec_id + {_S12_QID_BASE} AS query_id, TRUE AS anchor_found
        FROM embeddings WHERE vec_id IN {_S12_ANCHOR_SRCS}
    """,
    "d53_ngram_novelty": f"""
        WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        tri AS (
          SELECT DISTINCT doc_id, tri FROM (
            SELECT doc_id,
                   unnest(CASE WHEN len(toks) >= 3
                          THEN list_transform(range(1, len(toks) - 1),
                               i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                          ELSE [] END) AS tri
            FROM tk)
        ),
        gd AS (SELECT tri, COUNT(*) AS ndocs FROM tri GROUP BY tri)
        SELECT t.doc_id,
               COUNT(*) AS n_grams,
               COUNT(*) FILTER (WHERE gd.ndocs = 1) AS n_novel,
               FLOOR((COUNT(*) FILTER (WHERE gd.ndocs = 1))::DOUBLE
                     / COUNT(*) * 1e6) / 1e6 AS novelty
        FROM tri t JOIN gd USING (tri) GROUP BY t.doc_id
    """,
    "e08_temperature_mixture": """
        WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
        -- FLOOR-scaled sqrt (never ROUND: engines split decimal ties
        -- differently); the 1e12 scale cancels in the pw/pw_sum ratio
        w AS (SELECT lang, cnt,
                     CAST(FLOOR(SQRT(cnt) * 1e12) AS DECIMAL(28,0)) AS pw
              FROM c),
        n AS (SELECT SUM(pw) AS pw_sum, SUM(cnt) AS total FROM w),
        acc AS (
          SELECT w.lang,
                 CAST(FLOOR(10000.0 * LEAST(1.0,
                      (CAST(pw AS DOUBLE) / CAST(pw_sum AS DOUBLE))
                      * 0.5 * CAST(total AS DOUBLE) / cnt)) AS BIGINT) AS accept_bp
          FROM w, n
        )
        SELECT d.doc_id, d.source, d.lang
        FROM documents d JOIN acc ON d.lang = acc.lang
        WHERE ('0x' || substr(md5(':' || CAST(d.doc_id AS VARCHAR)), 1, 15))::UBIGINT
              % 10000 < accept_bp
    """,
}


def mm06_video_frame_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup through frame sampling
    (operators/multimodal.py frame_phash_near_dup): every 10th+3
    document's payload is re-ingested whole (the re-uploaded-video
    shape, id + 6M) and every 10th+7 payload long enough for >= 3
    frames is re-ingested TRIMMED to its first two frames (the
    clipped-copy shape, id + 7M). Under ANY frame decoder, identical
    bytes give identical frame hashes, so the full copy matches on
    every frame and the trimmed copy on its shared prefix frames —
    both planted shapes are deterministic, while the frame-level
    banding, Hamming verify, and per-pair rollup are the machinery
    under test (a break in any of them drops planted rows and fails
    the row-count gate). Frame payloads never shuffle; only 8-byte
    hashes do."""
    from python_openetl_spark.operators.multimodal import frame_phash_near_dup

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("text") != ""))
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )
    full_copies = d.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 6_000_000).alias("doc_id"), "payload"
    )
    trimmed = (
        d.filter((F.col("doc_id") % 10 == 7) & (F.length("payload") >= 192))
        .select(
            (F.col("doc_id") + 7_000_000).alias("doc_id"),
            F.substring("payload", 1, 128).alias("payload"),
        )
    )
    pairs = frame_phash_near_dup(
        d.unionByName(full_copies).unionByName(trimmed), "payload", "doc_id"
    )
    return pairs.filter(
        ((F.col("doc_b") == F.col("doc_a") + 6_000_000) & (F.col("doc_a") % 10 == 3))
        | ((F.col("doc_b") == F.col("doc_a") + 7_000_000) & (F.col("doc_a") % 10 == 7))
    ).select(
        "doc_a", "doc_b", (F.col("n_matched_frames") >= 1).alias("matched")
    )


QUERIES["mm06_video_frame_near_dup"] = mm06_video_frame_near_dup

ORACLE["mm06_video_frame_near_dup"] = """
    SELECT doc_id AS doc_a, doc_id + 6000000 AS doc_b, TRUE AS matched
    FROM documents WHERE text IS NOT NULL AND text <> '' AND doc_id % 10 = 3
    UNION ALL
    SELECT doc_id, doc_id + 7000000, TRUE
    FROM documents
    WHERE text IS NOT NULL AND text <> '' AND doc_id % 10 = 7
      AND octet_length(encode(text)) >= 192
"""


#: x20 store memo: sf_dir -> attribute-carrying store root
_X20_STORES: dict = {}


def x20_filtered_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN on the persisted IVF store: the store is built with
    ``attr_cols=("label",)`` so filterable metadata rides inside each
    cell partition (build from 90% + append 10%, binding the
    attribute-append path too), and the probe passes
    ``where="label = 1"`` — the PRE-filter strategy at the store
    level: the predicate lands on the already-partition-pruned scan
    (Catalyst pushes it into the parquet reader), non-matching rows
    die before any distance math, and top-k stays exactly k among the
    matching subset (post-filtering would silently return fewer). The
    row probes EVERY cell (nprobe = nlist — the x07 device), which
    makes the filtered result exact and the brute-force filtered SQL a
    full value-hash oracle for the attribute plumbing, the append
    conformance, and the filter placement; the production nprobe trade
    is x15p's, unchanged by filtering."""
    from python_openetl_spark.operators.ivf_store import (
        append_to_ivf_store,
        build_ivf_store,
        ivf_store_topk,
    )
    from python_openetl_spark.operators.tuning import ivf_params

    emb = t(spark, sf_dir, "embeddings")
    if not nonempty(sf_dir, "embeddings"):
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cos_sim double, rank int"
        )
    p = ivf_params(table_rows(sf_dir, "embeddings"))
    import tempfile

    root = _X20_STORES.get(corpus_key(sf_dir))
    if root is None:
        root = tempfile.mkdtemp(prefix="poe_x20_") + "/ivf"
        build_ivf_store(
            emb.filter(F.col("vec_id") % 10 != 7),
            root,
            nlist=p["nlist"],
            attr_cols=("label",),
        )
        append_to_ivf_store(emb.filter(F.col("vec_id") % 10 == 7), root)
        _X20_STORES[corpus_key(sf_dir)] = root
    queries = (
        emb.filter(F.col("vec_id").isin(2, 4, 8))
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .toPandas()
    )
    return ivf_store_topk(
        spark, root, queries, k=5, nprobe=p["nlist"], where="label = 1"
    )


QUERIES["x20_filtered_store_probe"] = x20_filtered_store_probe

ORACLE["x20_filtered_store_probe"] = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id IN (2, 4, 8)),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE label = 1),
    scored AS (
      SELECT q.query_id, c.vec_id,
             list_dot_product(c.v, q.qv)
               / (sqrt(list_dot_product(c.v, c.v))
                  * sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
      FROM c, q WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 5
"""


def d54_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS plagiarism-detection scheme): hash every token trigram,
    slide a w=4 window over the hash sequence, and select each
    window's minimum (rightmost on ties — the winnowing guarantee:
    any shared substring of length >= w+k-1 tokens yields at least one
    shared selected fingerprint, at ~1/w the storage of d15's full
    rolling-hash stream). Engine-exact selection device: (hash, pos)
    packs into one BIGINT key ``h·2^20 + (2^20-1-pos)`` so a plain
    windowed MIN realizes the argmin with the rightmost tie-break —
    no struct comparison semantics to align across engines; position
    caps at 2^20 grams/doc (stated). One explode + one partitioned
    window + distinct; raw text never shuffles, only 8-byte keys."""
    docs = t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    from python_openetl_spark.functions.text import token_hash60

    tk = docs.select("doc_id", tokens("text").alias("tk"))
    n = F.size("tk")
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(2)),
            lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i, F.lit(3))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = tk.select("doc_id", F.posexplode(grams).alias("pos", "tri"))
    h = token_hash60(F.col("tri")) % F.lit(2_147_483_647)
    key = h * F.lit(1_048_576) + (F.lit(1_048_575) - F.col("pos"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-3, Window.currentRow)
    )
    sel = g.select(
        "doc_id", F.min(key).over(w).alias("k")
    ).distinct()
    return sel.select(
        "doc_id",
        F.expr("k DIV 1048576").alias("fp_hash"),
        (F.lit(1_048_575) - F.pmod(F.col("k"), F.lit(1_048_576))).alias("pos"),
    )


QUERIES["d54_winnowing_fingerprints"] = d54_winnowing_fingerprints

ORACLE["d54_winnowing_fingerprints"] = f"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    g AS (
      SELECT doc_id, u.i - 1 AS pos,
             array_to_string(list_slice(toks, u.i, u.i + 2), ' ') AS tri
      FROM tk, LATERAL unnest(range(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 3
    ),
    keyed AS (
      SELECT doc_id, pos,
             (('0x' || substr(md5(tri), 1, 15))::UBIGINT)::BIGINT % 2147483647
               * 1048576 + (1048575 - pos) AS key
      FROM g
    ),
    sel AS (
      SELECT DISTINCT doc_id,
             MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS k
      FROM keyed
    )
    SELECT doc_id, k // 1048576 AS fp_hash,
           1048575 - (k % 1048576) AS pos
    FROM sel
"""
