"""Round-6 LLM-data additions: lexical richness and filtered ANN.

- d51: per-language lexical-richness profile — type/token ratio and
  hapax-legomenon ratio from one token explode + two grouped
  aggregates; the corpus-quality signal next to d02 (surface stats)
  and d16 (raw frequencies).
- x14: attribute-filtered exact top-k
  (``operators/similarity.py filtered_cosine_topk``): each query
  retrieves only among vectors sharing its ``label`` — the
  pre-filter strategy for the filtered-ANN problem, an equi-join on
  the filter attribute instead of a broadcast cross join.

Registered after ``relational6`` in ``_MODULES``; locally
oracle-gated now, rotates into ``_WINDOW_R7``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.functions.text import tokens
from python_openetl_spark.workload.llm import _TOKS_SQL
from python_openetl_spark.workload.util import t

_X14_QUERY_IDS = (2, 4, 8)


def d51_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(tokens("text")).alias("tok"))
    per_type = tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_type.groupBy("lang")
        .agg(
            F.sum("n").alias("total_tokens"),
            F.count(F.lit(1)).alias("distinct_tokens"),
            F.count_if(F.col("n") == 1).alias("hapax_tokens"),
        )
        .select(
            "lang",
            "total_tokens",
            "distinct_tokens",
            "hapax_tokens",
            F.round(F.col("distinct_tokens") / F.col("total_tokens"), 6).alias("ttr"),
            F.round(F.col("hapax_tokens") / F.col("distinct_tokens"), 6).alias(
                "hapax_ratio"
            ),
        )
    )


def x14_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_openetl_spark.operators.similarity import filtered_cosine_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*_X14_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    return filtered_cosine_topk(emb, queries, "label", k=5)


def e06_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget corpus selection
    (operators/prep.py token_budget_selection): each source's quota is
    filled largest-documents-first until the 4000-token budget is hit;
    the report states what survived per source. One partitioned window
    — the deterministic knapsack relaxation of a mixture build."""
    from python_openetl_spark.operators.prep import token_budget_selection

    kept = token_budget_selection(
        t(spark, sf_dir, "documents"), budget=4000, group_col="source"
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
        F.max("cum_tokens").alias("budget_used"),
    )



QUERIES = {
    "d51_lexical_richness": d51_lexical_richness,
    "x14_filtered_topk": x14_filtered_topk,
    "e06_token_budget_selection": e06_token_budget_selection,
}

ORACLE = {
    "e06_token_budget_selection": f"""
        WITH sized AS (
          SELECT source, doc_id, len({_TOKS_SQL})::BIGINT AS n_tokens
          FROM documents
        ),
        run AS (
          SELECT source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source
                   ORDER BY n_tokens DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
          FROM sized
        )
        SELECT source, COUNT(*) AS n_docs_kept,
               SUM(n_tokens)::BIGINT AS tokens_kept,
               MAX(cum_tokens)::BIGINT AS budget_used
        FROM run WHERE cum_tokens <= 4000
        GROUP BY source
    """,
    "d51_lexical_richness": f"""
        WITH tk AS (SELECT lang, unnest({_TOKS_SQL}) AS tok FROM documents),
        per_type AS (SELECT lang, tok, COUNT(*) AS n FROM tk GROUP BY 1, 2)
        SELECT lang,
               SUM(n)::BIGINT AS total_tokens,
               COUNT(*) AS distinct_tokens,
               COUNT(*) FILTER (WHERE n = 1) AS hapax_tokens,
               ROUND(COUNT(*)::DOUBLE / SUM(n), 6) AS ttr,
               ROUND((COUNT(*) FILTER (WHERE n = 1))::DOUBLE / COUNT(*), 6) AS hapax_ratio
        FROM per_type GROUP BY lang
    """,
    "x14_filtered_topk": f"""
        WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                          embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id IN {_X14_QUERY_IDS}),
        c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
          SELECT q.query_id, c.vec_id,
                 list_dot_product(c.v, q.qv)
                   / (sqrt(list_dot_product(c.v, c.v))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS cos_sim
          FROM c JOIN q ON c.label = q.qlabel
          WHERE c.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, cos_sim, rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, vec_id) AS rank
          FROM scored
        ) WHERE rank <= 5
    """,
}
