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
    # corpus total = sum of the vocabulary counts — derived from the
    # tiny ``freq`` aggregate instead of a third full tokenize+explode
    # pass over the corpus (r14; the d58 DSIR scorer already does this)
    total = freq.groupBy().agg(F.sum("__n").alias("__total"))
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


def dsir_importance_score(
    df: DataFrame,
    target_pred,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") under unigram features:
    per document, the mean log importance ratio
    ``ln p_target(tok) − ln p_source(tok)`` — positive when the doc
    looks more like the target slice than the corpus at large. The
    selection step (resample/top-k by weight) is the caller's; d58
    pairs this with ``ranking.global_ntile`` for an exact, fully
    distributed top-quartile cut.

    ``target_pred`` is a boolean Column marking target-domain rows
    (e.g. ``F.col("lang") == "en"``). The target LM is add-1 smoothed
    over the SOURCE vocabulary (``(n_t + 1) / (total_t + V)``) so
    tokens unseen in the target stay finite; the source LM needs no
    smoothing (every scored token exists in the corpus by definition).

    Cross-engine determinism: per-token log ratio rounded to 9
    decimals, per-doc sum as exact DECIMAL (order-independent), mean
    rounded to 6 — the d17/d32 device. Zero-token documents emit no
    row (no evidence to weigh).

    Scale shape: ONE explode feeds one groupBy that computes BOTH
    frequency tables (count + conditional count — not two passes); the
    token-frequency join is vocabulary-sized (AQE broadcasts it), the
    totals row is a 1-row broadcast, and the per-doc rollup partial-
    aggregates map-side. Same cost as d32's single-LM score."""
    ex = df.select(
        id_col,
        F.coalesce(target_pred.cast("boolean"), F.lit(False)).alias("__tgt"),
        F.explode(tokens(text_col)).alias("tok"),
    )
    freq = ex.groupBy("tok").agg(
        F.count(F.lit(1)).alias("__ns"),
        F.sum(F.col("__tgt").cast("long")).alias("__nt"),
    )
    tot = freq.agg(
        F.sum("__ns").alias("__ts"),
        F.sum("__nt").alias("__tt"),
        F.count(F.lit(1)).alias("__v"),
    )
    scored = (
        ex.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "__lr",
            F.round(
                F.log(
                    (F.col("__nt") + 1).cast("double")
                    / (F.col("__tt") + F.col("__v"))
                )
                - F.log(F.col("__ns").cast("double") / F.col("__ts")),
                9,
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum(F.col("__lr").cast("decimal(24,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dsir_score"),
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


def token_kl_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Distribution drift between two corpora: symmetric pair of
    KL divergences over Laplace-smoothed unigram distributions —
    the standard monitor for "has this month's crawl shifted against
    the training mix" (a large KL on a new snapshot flags topic/spam
    drift BEFORE any model sees the data; the same statistic drives
    mixture re-weighting decisions).

    ``P(t) = (count_a(t)+1) / (N_a+V)`` over the JOINT vocabulary V
    (add-one smoothing keeps both distributions strictly positive, so
    the divergences are finite even for tokens unique to one side).

    Determinism contract (the BM25 convention, retrieval.py module
    docstring): every count is an exact integer; each probability is
    one IEEE division; ``ln(p/q)`` is rounded to 9 decimals, each
    contribution ``p*ln(p/q)`` to 12, summed as DECIMAL(28,12) —
    order-independent, partition-layout-proof, bit-matchable by the
    SQL oracle.

    Scale shape: one explode + hash-agg per side (map-side combined,
    shuffle carries (token, count) rows — bounded by vocab, never the
    corpus); a full outer join on token (vocab-sized); three scalar
    aggregates broadcast via crossJoin. Output is ONE row:
    ``(vocab_size, n_tokens_a, n_tokens_b, kl_a_b, kl_b_a)``.
    """
    from python_openetl_spark.functions.text import tokens

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(text_col)).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca, cb = counts(df_a, "ca"), counts(df_b, "cb")
    joint = ca.join(cb, "token", "full_outer").select(
        "token",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    totals = joint.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
    )
    x = joint.crossJoin(F.broadcast(totals))
    p = (F.col("ca").cast("double") + F.lit(1.0)) / (
        F.col("na").cast("double") + F.col("v").cast("double")
    )
    q = (F.col("cb").cast("double") + F.lit(1.0)) / (
        F.col("nb").cast("double") + F.col("v").cast("double")
    )
    lpq = F.round(F.log(p / q), 9)
    contrib_ab = F.round(p * lpq, 12).cast("decimal(28,12)")
    contrib_ba = F.round(q * (-lpq), 12).cast("decimal(28,12)")
    return x.agg(
        F.max("v").alias("vocab_size"),
        F.max("na").alias("n_tokens_a"),
        F.max("nb").alias("n_tokens_b"),
        F.sum(contrib_ab).cast("double").alias("kl_a_b"),
        F.sum(contrib_ba).cast("double").alias("kl_b_a"),
    )
