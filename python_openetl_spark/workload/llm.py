"""LLM-data-pipeline operators as oracle-checkable queries
(SURVEY §2.3 "LLM-data ops"; BASELINE.json north-star extensions).

Dedup / near-dup semantics need duplicates to demonstrate, and the
fixture `documents` table has none — so the near-dup queries run over
``documents ∪ mutated twins`` (each doc re-appears with id+100000 and
one appended token). Every twin pair is then a deterministic near-dup
the operator must find. The DuckDB oracles re-state the full pipelines
(shingling, MinHash banding, SimHash bit votes) in SQL; the shared hash
scheme (md5 hex) makes the two engines agree exactly.

Float note: cosine values are bit-identical across engines because both
sides fold the dot product sequentially in DOUBLE (verified in
tests/test_similarity.py); Jaccard is an exact int/int division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_openetl_spark.functions.text import LANG_STOPWORDS, token_hash60, tokens
from python_openetl_spark.operators import dedup, similarity, textops
from python_openetl_spark.workload.util import t, table_rows

# ---------------------------------------------------------------- documents --

_TWIN_OFFSET = 100_000


def _docs_with_twins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    twins = d.select(
        (F.col("doc_id") + _TWIN_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    return d.unionByName(twins)


_TWINS_SQL = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_TWIN_OFFSET} AS doc_id, text || ' zzz' AS text FROM documents
"""

# Shared tokenizer/shingler in DuckDB SQL (mirrors functions/text.py).
_TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_SHINGLES_SQL = """
  CASE WHEN len(toks) >= 3
       THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(list_slice(toks, i, i + 2), ' '))
       ELSE [] END
"""


def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups over normalized fingerprints (twins differ by
    one token → remain distinct; identity duplicates collapse)."""
    docs = _docs_with_twins(spark, sf_dir)
    return dedup.exact_dedup(docs, "text", "doc_id")


def d02_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.text_stats(t(spark, sf_dir, "documents"))


def d03_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.language_id(t(spark, sf_dir, "documents"))


def d04_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality(t(spark, sf_dir, "documents"))


def d05_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.fingerprints(t(spark, sf_dir, "documents"))


def d06_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_candidates(
        _docs_with_twins(spark, sf_dir), "text", "doc_id",
        shingle_n=3, num_hashes=16, num_bands=4,
    )


def d07_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _docs_with_twins(spark, sf_dir), "text", "doc_id",
        shingle_n=3, threshold=0.5,
    )


def d08_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(t(spark, sf_dir, "documents"), "text", "doc_id")


def d09_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_candidates(
        _docs_with_twins(spark, sf_dir), "text", "doc_id",
        max_hamming=3, num_bands=4,
    )


# --------------------------------------------------------------- embeddings --

_QUERY_IDS = (1, 5, 9)


def x01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return similarity.cosine_topk(emb, queries, k=5)


def x02_cosine_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_pairs_exact(t(spark, sf_dir, "embeddings"), threshold=0.45)


def x03_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy brute-force top-k (scale path). The numpy matmul's
    fp reduction order differs from a sequential fold by ~1 ulp, so the
    score is rounded to 6 decimals to make the result hash-stable
    against the exact-SQL oracle; ranking happens on the unrounded
    values (bit-equivalence to x01 is asserted in tests)."""
    emb = t(spark, sf_dir, "embeddings")
    qpdf = (
        emb.filter(F.col("vec_id").isin(*_QUERY_IDS))
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .toPandas()
    )
    out = similarity.cosine_topk_arrow(emb, qpdf, k=5)
    return out.withColumn("cos_sim", F.round("cos_sim", 6))


def x04_lsh_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-pairs (approximate scale path). Same
    recall-1.0-on-fixtures settings as d14 (planes=3/tables=20,
    deterministic seeded planes; pinned in tests), so the found pairs
    equal the exact x02 set and the JVM-expression cosine verify makes
    the values bit-identical to the SQL oracle — a full hash row for
    the approximate path."""
    return similarity.lsh_cosine_pairs(
        t(spark, sf_dir, "embeddings"), threshold=0.45, num_planes=3, num_tables=20
    )


def x05_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-quantized approximate top-k (the ANN scale path: probe
    nprobe/nlist of the corpus), hash-verified via its own guarantee:
    the query computes recall@k against the exact x01 ranking in the
    same plan and emits a per-query recall bound boolean. The oracle is
    the invariant (recall >= floor), so a broken pruning path (recall
    0) hash-mismatches while legitimate ANN approximation noise does
    not. Tight recall assertions with pinned settings live in
    tests/test_similarity.py; x07 covers the nprobe=nlist exact case
    with a full value oracle.

    nlist/nprobe are DERIVED from the corpus count
    (operators/tuning.py ivf_params: nlist ~ sqrt(n), nprobe = 0.75 *
    nlist), so a fixture regeneration at a different scale degrades
    recall gracefully instead of flipping the oracle boolean —
    perturbation-tested at 0.5x/2x in tests/test_tuning.py."""
    from python_openetl_spark.operators.tuning import ivf_params

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=5).select("query_id", "vec_id")
    approx = similarity.ivf_topk(emb, queries.toPandas(), k=5, **ivf_params(table_rows(sf_dir, "embeddings")))
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
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("k") >= 0.2).alias("recall_ok"),
        )
    )


def x06_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization round-trip (functions/vectors.py):
    per-vector symmetric scale + the max dequantization error — the 4x
    shuffle/storage shrink for ANN at scale, value-checked against the
    identical floor-arithmetic in DuckDB."""
    from python_openetl_spark.functions.vectors import dequantize_int8, quantize_int8

    emb = t(spark, sf_dir, "embeddings")
    staged = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        quantize_int8(F.col("embedding")).alias("qv"),
    )
    return staged.select(
        "vec_id",
        F.col("qv.scale").alias("scale"),
        F.array_max(
            F.zip_with(
                F.col("v"), dequantize_int8(F.col("qv")), lambda a, b: F.abs(a - b)
            )
        ).alias("max_err"),
    )


# --------------------------------------------------------------- multimodal --

def mm01_binary_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: materialize a binary payload
    (utf-8 bytes of text — stand-in for image/audio blobs), compute
    byte length + content hash. Decode/feature-extract stubs live in
    operators/multimodal.py."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha256"),
    )


def d10_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% hash sample (operators/sampling.py): membership
    by content hash — reproducible under any partitioning or engine,
    stable as the dataset grows (train/test hygiene)."""
    from python_openetl_spark.operators.sampling import hash_sample

    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return hash_sample(d, "doc_id", 0.2)


def d11_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified rates: downsample the dominant language,
    keep rare ones — the standard training-mix rebalancing shape."""
    from python_openetl_spark.operators.sampling import stratified_hash_sample

    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_hash_sample(
        d, "doc_id", "lang", {"en": 0.25, "de": 1.0, "fr": 1.0, "es": 0.5, "zh": 0.5}
    )


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _docs_with_twins(spark, sf_dir), "text", "doc_id", shingle_n=3, threshold=0.5
    )


def d12_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs resolved to duplicate clusters: iterative
    large-star/small-star connected components (operators/cluster.py)
    vs DuckDB's recursive-CTE transitive closure."""
    from python_openetl_spark.operators.cluster import connected_components

    return connected_components(_jaccard_pairs(spark, sf_dir))


def d13_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup deliverable: corpus minus every clustered
    doc except each cluster's min-id member (singletons untouched)."""
    from python_openetl_spark.operators.cluster import canonicalize_corpus

    docs = _docs_with_twins(spark, sf_dir)
    return canonicalize_corpus(docs, _jaccard_pairs(spark, sf_dir), "doc_id")


def d14_embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fifth dedup family end-to-end: embedding-cosine near-dup
    pairs resolved into duplicate clusters — same component resolution
    d12 applies to n-gram Jaccard.

    The pair generator is the LSH-bucketed scale path (bucket join, not
    O(n²) cross join); candidates are verified with exact cosine, so
    precision is 1.0 by construction. planes=3/tables=20 is empirically
    recall-1.0 on the fixture corpora (deterministic seeded planes;
    asserted in tests/test_llm_ops.py::test_d14_lsh_recall_total), which
    keeps the exact-pairs SQL oracle green. At 100 TB recall<1 is the
    accepted trade and planes scales up with corpus density."""
    from python_openetl_spark.operators.cluster import connected_components

    pairs = similarity.lsh_cosine_pairs(
        t(spark, sf_dir, "embeddings"), threshold=0.45, num_planes=3, num_tables=20
    )
    return connected_components(pairs, "id_a", "id_b")


#: Rabin-Karp base/modulus: fold stays exact in 64-bit integer arithmetic
#: in both engines (acc < 2^31, acc*B + h < 2^52).
_RK_B = 1_000_003
_RK_M = 2_147_483_647


def d15_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: a Rabin-Karp polynomial
    rolling hash folded over the token stream (complements d05's
    order-insensitive md5 of normalized text — permuted token order
    changes this one). Single scan, no shuffle; the fold is a JVM
    higher-order ``aggregate``, one md5 per token."""
    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    fold = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(_RK_B) + token_hash60(x) % F.lit(_RK_M)) % F.lit(_RK_M),
    )
    # coalesce: NULL text -> NULL token array -> NULL fold, while the
    # oracle's list_prepend(0, NULL) folds to 0; a NULL here also turns
    # the whole pandas column float64 and dtype-mismatches every row
    # (hostile-fixture suite finding)
    return d.select(
        "doc_id", F.coalesce(fold, F.lit(0).cast("long")).alias("rolling_fp")
    )


def d16_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with frequencies, top-100 — the vocab-building
    pass of a training pipeline. Explode → hash agg on the token (one
    map-side-combined shuffle; tokens are short strings, bounded key
    space) → deterministic top-k by (count desc, token)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "tok")
        .limit(100)
    )


def d17_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms. One explode feeds both the
    per-(doc, token) term frequencies and (reusing that aggregate, not a
    second corpus scan) the document frequencies; IDF joins back on the
    token. Ranking uses the ROUNDED score in both engines so float ulp
    differences in ln() can never flip a tie."""
    d = t(spark, sf_dir, "documents")
    # corpus size as a broadcast scalar inside the one dataflow — not an
    # eager driver-side d.count() (which cost a separate corpus scan)
    n = d.groupBy().agg(F.count(F.lit(1)).alias("__n_docs"))
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log((F.col("__n_docs") + 1) / (F.col("df") + 1)), 6),
        )
        .drop("__n_docs")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "tok", "tf", "tfidf", "rk")
    )


def mm02_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing end-to-end: binary payload → Arrow
    batches → (width, height, channels, thumbnail). The deterministic
    fake decoder derives dimensions from the content sha256, which DuckDB
    reproduces with hex-substring arithmetic — so the whole decode
    dataflow is value-hash oracle-checked, codec stub and all."""
    from python_openetl_spark.operators import multimodal

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    decoded = multimodal.decode_images(d, fake=True)
    return decoded.select(
        "doc_id", "width", "height", "channels",
        F.lower(F.hex("thumbnail")).alias("thumb_hex"),
    )


def mm03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling 1→N expansion (video stub): one row per sampled
    byte offset, via a computed-sequence posexplode."""
    from python_openetl_spark.operators import multimodal

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    out = multimodal.sample_frames(d, fake=True, every_n_bytes=64)
    return out.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("byte_offset").cast("long").alias("byte_offset"),
    )


QUERIES = {
    "d01_exact_dedup": d01_exact_dedup,
    "d02_text_stats": d02_text_stats,
    "d03_language_id": d03_language_id,
    "d04_quality_score": d04_quality_score,
    "d05_fingerprint": d05_fingerprint,
    "d06_minhash_lsh_candidates": d06_minhash_lsh_candidates,
    "d07_ngram_jaccard_pairs": d07_ngram_jaccard_pairs,
    "d08_simhash": d08_simhash,
    "d09_simhash_near_pairs": d09_simhash_near_pairs,
    "d10_hash_sample": d10_hash_sample,
    "d11_stratified_sample": d11_stratified_sample,
    "d12_dup_clusters": d12_dup_clusters,
    "d13_canonical_corpus": d13_canonical_corpus,
    "d14_embedding_dup_clusters": d14_embedding_dup_clusters,
    "d15_rolling_fingerprint": d15_rolling_fingerprint,
    "d16_token_frequency": d16_token_frequency,
    "d17_tfidf_top_terms": d17_tfidf_top_terms,
    "x01_cosine_topk": x01_cosine_topk,
    "x02_cosine_pairs_exact": x02_cosine_pairs_exact,
    "x03_cosine_topk_arrow": x03_cosine_topk_arrow,
    "x04_lsh_cosine_pairs": x04_lsh_cosine_pairs,
    "x05_ivf_topk": x05_ivf_topk,
    "x06_quantize_embeddings": x06_quantize_embeddings,
    "mm01_binary_payload_stats": mm01_binary_payload_stats,
    "mm02_image_decode": mm02_image_decode,
    "mm03_frame_sample": mm03_frame_sample,
}


# ------------------------------------------------------------------ oracles --

def _minhash_sig_sql(num_hashes: int = 16) -> str:
    """Universal-hash MinHash signature columns h0..h{n-1} (mirrors
    operators/dedup.minhash_coeffs — same 64-bit integer arithmetic)."""
    from python_openetl_spark.operators.dedup import MINHASH_P, minhash_coeffs

    return ",\n      ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS h{k}"
        for k, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )


def _band_rows_sql(num_bands: int = 4, rows_per_band: int = 4) -> str:
    """UNION ALL of one row per band: (doc, band, k1, k2) with the
    rows packed into two base-P integers (mirrors the Spark side)."""
    from python_openetl_spark.operators.dedup import MINHASH_P

    half = rows_per_band // 2

    def pack(cols: list[str]) -> str:
        expr = cols[0]
        for c in cols[1:]:
            expr = f"({expr} * {MINHASH_P} + {c})"
        return expr

    parts = [
        f"SELECT doc, {b} AS band, "
        f"{pack([f'h{b * rows_per_band + r}' for r in range(half)])} AS k1, "
        f"{pack([f'h{b * rows_per_band + r}' for r in range(half, rows_per_band)])} AS k2 "
        f"FROM sigs"
        for b in range(num_bands)
    ]
    return "\nUNION ALL\n".join(parts)


def _simhash_sql(source_sql: str, bits: int = 60) -> str:
    """DuckDB SimHash: explode tokens, 60-bit md5-derived hash, per-bit
    ±1 vote, reassemble. Mirrors operators/dedup.simhash exactly."""
    votes = ",\n      ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}" for j in range(bits)
    )
    assemble = " + ".join(f"(CASE WHEN s{j} > 0 THEN {2**j}::BIGINT ELSE 0 END)" for j in range(bits))
    return f"""
      WITH src AS ({source_sql}),
      tok AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM src
      ),
      hashed AS (
        SELECT doc_id, (('0x' || substr(md5(tok), 1, 15))::UBIGINT)::BIGINT AS h FROM tok
      ),
      votes AS (
        SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
      )
      SELECT doc_id, {assemble} AS simhash FROM votes
    """


#: Exact n-gram Jaccard near-dup pairs over the twinned corpus (the d07
#: oracle), shared verbatim by the d12/d13 cluster-resolution oracles.
_JACCARD_PAIRS_SQL = f"""
        WITH docs AS ({_TWINS_SQL}),
        tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM docs),
        shx AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM tk),
        shf AS (SELECT doc_id AS doc, sh FROM shx WHERE len(sh) > 0),
        exs AS (SELECT doc, unnest(sh) AS shingle FROM shf),
        ex AS (
          SELECT DISTINCT doc,
                 (('0x' || substr(md5(shingle), 1, 15))::UBIGINT)::BIGINT AS h
          FROM exs
        ),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM ex GROUP BY doc),
        common AS (
          SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS common
          FROM ex a JOIN ex b ON a.h = b.h AND a.doc < b.doc
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc = doc_a
        JOIN sizes sb ON sb.doc = doc_b
        WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.5
"""

def _components_sql(pairs_sql: str, a_col: str, b_col: str) -> str:
    """Transitive closure of a near-dup pair graph → (id, min-reachable-id).
    DuckDB's recursive CTE is the SQL-side fixpoint that mirrors the
    engine's connected-components operator."""
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        edges AS (
          SELECT {a_col} AS u, {b_col} AS v FROM pairs
          UNION
          SELECT {b_col}, {a_col} FROM pairs
        ),
        reach(id, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
        )
        SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
"""


_COMPONENTS_SQL = _components_sql(_JACCARD_PAIRS_SQL, "doc_a", "doc_b")

_LANG_CASES = []
for _lang, _words in LANG_STOPWORDS.items():
    _inlist = ", ".join(f"'{w}'" for w in _words)
    _LANG_CASES.append((_lang, f"len(list_filter(toks, x -> x IN ({_inlist})))"))
_HITS_SQL = ",\n      ".join(f"{expr} AS hits_{lang}" for lang, expr in _LANG_CASES)
_BEST_SQL = "GREATEST(" + ", ".join(f"hits_{lang}" for lang, _ in _LANG_CASES) + ")"
_PICK_SQL = " ".join(
    f"WHEN hits_{lang} = best THEN '{lang}'" for lang, _ in _LANG_CASES
)

ORACLE = {
    "mm05_phash_near_dup": """
        SELECT doc_id AS doc_a, doc_id + 5000000 AS doc_b, 0 AS hamming
        FROM documents WHERE text IS NOT NULL AND doc_id % 10 = 0
    """,
    "d01_exact_dedup": f"""
        WITH docs AS ({_TWINS_SQL})
        SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
               MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        FROM docs GROUP BY 1
    """,
    "d02_text_stats": f"""
        WITH tk AS (SELECT doc_id, length(text) AS n_chars, lower(text) AS lt,
                           {_TOKS_SQL} AS toks FROM documents)
        SELECT doc_id, n_chars,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_unique_tokens,
               len(regexp_extract_all(lt, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens
        FROM tk
    """,
    "d03_language_id": f"""
        WITH tk AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
        hits AS (SELECT doc_id, text, {_HITS_SQL} FROM tk),
        best AS (SELECT *, {_BEST_SQL} AS best FROM hits)
        SELECT doc_id,
               CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
                    WHEN best = 0 THEN 'und'
                    {_PICK_SQL}
                    ELSE 'und' END AS detected_lang
        FROM best
    """,
    "d04_quality_score": f"""
        WITH tk AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents),
        m AS (
          SELECT doc_id,
                 CAST(len(toks) AS DOUBLE) AS n_tok,
                 CAST(length(text) AS DOUBLE) AS n_char,
                 CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) AS n_punct,
                 CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE) AS en_stop
          FROM tk
        )
        SELECT doc_id,
               0.4 * LEAST(n_tok / 100.0, 1.0)
             + 0.3 * (1.0 - (CASE WHEN n_char > 0 THEN n_punct / n_char ELSE 0.0 END))
             + 0.3 * LEAST((CASE WHEN n_tok > 0 THEN en_stop / n_tok ELSE 0.0 END) * 5.0, 1.0) AS quality
        FROM m
    """,
    "d05_fingerprint": """
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM documents
    """,
    "d06_minhash_lsh_candidates": f"""
        WITH docs AS ({_TWINS_SQL}),
        tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM docs),
        shx AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM tk),
        shf AS (SELECT doc_id, sh FROM shx WHERE len(sh) > 0),
        ex AS (SELECT doc_id AS doc, unnest(sh) AS shingle FROM shf),
        hashed AS (
          SELECT doc,
                 (('0x' || substr(md5(shingle), 1, 15))::UBIGINT % 2147483647)::BIGINT AS h
          FROM ex
        ),
        sigs AS (SELECT doc, {_minhash_sig_sql(16)} FROM hashed GROUP BY doc),
        bands AS ({_band_rows_sql(4, 4)})
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2 AND a.doc < b.doc
    """,
    "d07_ngram_jaccard_pairs": _JACCARD_PAIRS_SQL,
    "d12_dup_clusters": _COMPONENTS_SQL,
    "d13_canonical_corpus": f"""
        WITH comp AS ({_COMPONENTS_SQL}),
        docs AS ({_TWINS_SQL})
        SELECT d.doc_id, d.text
        FROM docs d LEFT JOIN comp ON d.doc_id = comp.id
        WHERE comp.id IS NULL OR comp.id = comp.cluster_id
    """,
    "d14_embedding_dup_clusters": _components_sql(
        """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) a
        JOIN (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) b
          ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45
        """,
        "id_a",
        "id_b",
    ),
    "d15_rolling_fingerprint": f"""
        WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
        SELECT doc_id,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(toks,
                     t -> (('0x' || substr(md5(t), 1, 15))::UBIGINT)::BIGINT % {_RK_M})),
                 (acc, h) -> (acc * {_RK_B} + h) % {_RK_M}) AS rolling_fp
        FROM tk
    """,
    "d16_token_frequency": f"""
        WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
        SELECT tok, COUNT(*) AS n_occurrences
        FROM (SELECT unnest(toks) AS tok FROM tk)
        GROUP BY tok
        ORDER BY n_occurrences DESC, tok
        LIMIT 100
    """,
    "d17_tfidf_top_terms": f"""
        WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        ex AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM ex GROUP BY 1, 2),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, tok, tf, tfidf, rk FROM (
          SELECT tf.doc_id, tf.tok, tf.tf,
                 ROUND(tf.tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf,
                 ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY ROUND(tf.tf * ln((n_docs + 1.0) / (df + 1.0)), 6) DESC, tf.tok
                 ) AS rk
          FROM tf JOIN dfreq USING (tok) CROSS JOIN n
        ) WHERE rk <= 3
    """,
    "d08_simhash": _simhash_sql("SELECT doc_id, text FROM documents"),
    "d09_simhash_near_pairs": f"""
        WITH sim AS ({_simhash_sql(_TWINS_SQL)}),
        banded AS (
          {" UNION ALL ".join(
            f"SELECT doc_id AS doc, simhash, {i} AS band, (simhash >> {i * 15}) & 32767 AS key FROM sim"
            for i in range(4)
          )}
        )
        SELECT doc_a, doc_b, hamming FROM (
          SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
                 bit_count(xor(a.simhash, b.simhash)::UBIGINT) AS hamming
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
        ) WHERE hamming <= 3
    """,
    "d10_hash_sample": """
        SELECT doc_id, lang, source FROM documents
        WHERE ('0x' || substr(md5(':' || doc_id::VARCHAR), 1, 15))::UBIGINT % 10000 < 2000
    """,
    "d11_stratified_sample": """
        WITH b AS (
          SELECT doc_id, lang,
                 (('0x' || substr(md5(':' || doc_id::VARCHAR), 1, 15))::UBIGINT % 10000)::BIGINT AS bucket
          FROM documents
        )
        SELECT doc_id, lang FROM b
        WHERE (lang = 'en' AND bucket < 2500)
           OR (lang = 'de' AND bucket < 10000)
           OR (lang = 'fr' AND bucket < 10000)
           OR (lang = 'es' AND bucket < 5000)
           OR (lang = 'zh' AND bucket < 5000)
    """,
    "x01_cosine_topk": f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id IN {tuple(_QUERY_IDS)}),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
          SELECT q.query_id, c.vec_id,
                 list_dot_product(c.v, q.qv)
                   / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
          FROM c, q WHERE c.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, cos_sim, rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
    "x02_cosine_pairs_exact": """
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos_sim
        FROM c a JOIN c b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45
    """,
    # x04 finds exactly the x02 pair set on the fixtures (recall-1.0 LSH
    # settings, pinned by test) and verifies with the same JVM cosine →
    # the exact-pairs SQL doubles as its oracle
    "x03_cosine_topk_arrow": f"""
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id IN {tuple(_QUERY_IDS)}),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
          SELECT q.query_id, c.vec_id,
                 list_dot_product(c.v, q.qv)
                   / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
          FROM c, q WHERE c.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, ROUND(cos_sim, 6) AS cos_sim, rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
    "x04_lsh_cosine_pairs": """
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos_sim
        FROM c a JOIN c b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45
    """,
    "x05_ivf_topk": """
        SELECT vec_id AS query_id, CAST(5 AS INT) AS k, TRUE AS recall_ok
        FROM embeddings WHERE vec_id IN (1, 5, 9)
    """,
    "x06_quantize_embeddings": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        s AS (
          SELECT vec_id, v,
                 CASE WHEN amax = 0 THEN 1.0 ELSE amax / 127.0 END AS scale
          FROM (SELECT vec_id, v,
                       list_max(list_transform(v, x -> abs(x))) AS amax
                FROM e)
        ),
        q AS (
          SELECT vec_id, v, scale,
                 list_transform(v, x -> floor(x / scale + 0.5)) AS qq
          FROM s
        )
        SELECT vec_id, scale,
               list_max(list_transform(range(1, len(v) + 1),
                        i -> abs(v[i] - qq[i] * scale))) AS max_err
        FROM q
    """,
    "mm01_binary_payload_stats": """
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS content_sha256
        FROM documents
    """,
    "mm02_image_decode": """
        WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents)
        SELECT doc_id,
               64 + ('0x' || substr(hx, 1, 2))::INT % 192 AS width,
               64 + ('0x' || substr(hx, 3, 2))::INT % 192 AS height,
               -- NULL payload decodes to NULL metadata (not a constant 3)
               CAST(CASE WHEN hx IS NULL THEN NULL ELSE 3 END AS INT) AS channels,
               substr(hx, 1, 8) AS thumb_hex
        FROM h
    """,
    "mm03_frame_sample": """
        WITH t AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        o AS (SELECT doc_id, range(0, greatest(n - 1, 0) + 1, 64) AS offs FROM t)
        SELECT doc_id, u.idx AS frame_idx, u.off AS byte_offset FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(offs) + 1),
                                       i -> {'idx': (i - 1)::INT, 'off': offs[i]})) AS u
          FROM o
        )
    """,
}


def mm05_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash media dedup through the decode seam
    (operators/multimodal.py phash_near_dup_pairs): every 10th
    document's payload is re-ingested under a synthetic id — the
    re-uploaded-image shape — and the banded Hamming join must find
    every planted pair at distance 0 (identical bytes -> identical
    pHash under ANY decoder, fake or real). The driver row returns
    exactly the planted pairs (filtered by the synthetic-id offset),
    so a broken kernel, banding, or verify path empties it; organic
    byte-duplicate pairs (dup texts exist in the fixtures) are
    asserted in the hostile suite instead, where their count is
    fixture-defined."""
    from python_openetl_spark.operators.multimodal import phash_near_dup_pairs

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )
    planted = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "payload"
    )
    pairs = phash_near_dup_pairs(d.unionByName(planted), "payload", "doc_id")
    return pairs.filter(
        (F.col("doc_b") == F.col("doc_a") + 5_000_000)
        & (F.col("doc_a") % 10 == 0)
    ).select("doc_a", "doc_b", "hamming")


QUERIES["mm05_phash_near_dup"] = mm05_phash_near_dup
