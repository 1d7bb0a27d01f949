"""Document-level text analysis operators (language ID, quality
scoring, token statistics, fingerprinting) over a documents table.

Thin DataFrame builders over functions/text.py — everything stays in
JVM expressions (no Python UDFs), so these run at scan speed and
pipeline with dedup/similarity in a single pass when composed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_openetl_spark.functions.text import (
    bpe_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = tokens(text_col)
    return df.select(
        id_col,
        F.length(text_col).alias("n_chars"),
        token_count(text_col).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(id_col, lang_id(text_col).alias("detected_lang"))


def quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(id_col, quality_score(text_col).alias("quality"))


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(id_col, fingerprint(text_col).alias("fp"))


def unigram_logprob_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram language-model score: the mean negative log
    probability of the document's tokens under the corpus's own unigram
    distribution (the CCNet/KenLM-filter proxy, one tier above d04's
    surface heuristics — gibberish and boilerplate both score as
    outliers of the corpus distribution).

    Cross-engine determinism: the per-token ``-ln p`` is rounded to 9
    decimals, summed as exact DECIMAL (order-independent under any
    partitioning), and the mean rounded to 6 — the d17 device.

    Scale shape: one explode feeds both the frequency table and the
    scoring join; the frequency side is vocabulary-sized (broadcastable,
    AQE decides), the corpus total is a 1-row broadcast. Zero-token and
    NULL-text documents score (0, 0.0) instead of dropping out.
    """
    ex = df.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("__n"))
    total = ex.groupBy().agg(F.count(F.lit(1)).alias("__total"))
    scored = (
        ex.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn("__nlp", F.round(-F.log(F.col("__n") / F.col("__total")), 9))
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum(F.col("__nlp").cast("decimal(24,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_neglogp"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("avg_neglogp", F.lit(0.0)).alias("avg_neglogp"),
        )
    )


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    context-window chunking step between cleaning (d18-d20) and packing
    (d21): long documents become ``ceil((n - overlap) / stride)``
    chunks of ``chunk_tokens`` tokens, consecutive chunks sharing
    ``overlap`` tokens so no span is ever cut mid-context.

    Pure JVM expressions (sequence + posexplode + slice — the mm03
    1-to-N device applied to token arrays): no shuffle at all, the
    expansion happens inside the scan, so at 100 TB chunking is free
    parallelism. Each chunk carries an md5 fingerprint of its token
    span (the d05 device) so downstream chunk-level dedup composes
    directly. A zero-token document emits one empty chunk (the row is
    kept — dropping it would silently shrink the corpus); NULL text
    emits no rows (there is nothing to train on).
    """
    stride = chunk_tokens - overlap
    assert stride > 0, f"overlap {overlap} must be < chunk_tokens {chunk_tokens}"
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(F.col("__toks")) - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    span = F.slice(F.col("__toks"), F.col("start_tok"), chunk_tokens)
    return (
        df.select(F.col(id_col).alias(id_col), tokens(text_col).alias("__toks"))
        # NULL text -> no rows; without this Spark's NULL-skipping
        # greatest() would fabricate a [1] start list for a NULL array
        .filter(F.col("__toks").isNotNull())
        .select(id_col, "__toks", F.posexplode(starts).alias("chunk_idx", "start_tok"))
        .select(
            id_col,
            "chunk_idx",
            "start_tok",
            F.size(span).alias("chunk_len"),
            F.md5(F.array_join(span, " ")).alias("chunk_fp"),
        )
    )
