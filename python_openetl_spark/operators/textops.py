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
