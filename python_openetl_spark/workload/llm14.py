"""Round-11 LLM-data additions.

- d58: DSIR importance selection (Xie et al. 2023) — unigram-feature
  importance weights (target slice vs corpus LM, add-1 smoothed over
  the source vocabulary) with an exact distributed top-quartile cut
  via ``ranking.global_ntile``. The data-selection verb between d32's
  single-LM scoring and d37's curriculum mixture: "keep what looks
  like the target domain".

Reference parity: tmccall8829/python-openetl has no corpus-selection
surface (row-level ETL only); this extends the LLM-data north-star
family (SURVEY.md §2.3).

Registered after ``incremental4`` in ``_MODULES``; round-11
post-window, rotates into ``_WINDOW_R12``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.workload.util import t

QUERIES: dict = {}
ORACLE: dict = {}

_TOKS_SQL = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"


def d58_dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR with target = English documents: score every document by
    mean log importance ratio under (target LM / corpus LM), rank ALL
    scored documents into exact quartiles (banded two-pass
    global_ntile — no partitionless window, the d57 discipline), and
    flag the top quartile as selected. Ordering is total via
    (dsir_score DESC, doc_id) so ties cannot flip buckets between
    engines; zero-token documents emit no row (no evidence)."""
    from python_openetl_spark.operators.ranking import global_ntile
    from python_openetl_spark.operators.textops import dsir_importance_score

    scored = dsir_importance_score(
        t(spark, sf_dir, "documents"), F.col("lang") == "en"
    )
    ranked = global_ntile(
        scored, "dsir_score", ["doc_id"], k=4, descending=True,
        out_col="quartile",
    )
    return ranked.select(
        "doc_id",
        "n_tokens",
        "dsir_score",
        F.col("quartile").cast("int").alias("quartile"),
        (F.col("quartile") == 1).alias("selected"),
    )


QUERIES["d58_dsir_importance_select"] = d58_dsir_importance_select

ORACLE["d58_dsir_importance_select"] = f"""
    WITH tk AS (
      SELECT doc_id, lang = 'en' AS tgt, {_TOKS_SQL} AS toks FROM documents
    ),
    ex AS (SELECT doc_id, tgt, unnest(toks) AS tok FROM tk),
    freq AS (
      SELECT tok, COUNT(*) AS ns, COUNT(*) FILTER (tgt) AS nt
      FROM ex GROUP BY tok
    ),
    tot AS (SELECT SUM(ns) AS ts, SUM(nt) AS tt, COUNT(*) AS v FROM freq),
    scored AS (
      SELECT e.doc_id,
             round(ln((f.nt + 1)::DOUBLE / (t.tt + t.v))
                   - ln(f.ns::DOUBLE / t.ts), 9) AS lr
      FROM ex e JOIN freq f USING (tok) CROSS JOIN tot t
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             round(CAST(SUM(CAST(lr AS DECIMAL(24,12))) AS DOUBLE)
                   / COUNT(*), 6) AS dsir_score
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, dsir_score,
           CAST(NTILE(4) OVER (ORDER BY dsir_score DESC, doc_id) AS INT)
             AS quartile,
           NTILE(4) OVER (ORDER BY dsir_score DESC, doc_id) = 1 AS selected
    FROM agg
"""
