"""URL-level corpus governance: canonical-URL dedup and per-domain
caps — the two steps every web-scale training pipeline runs BEFORE
content-level dedup (they are orders of magnitude cheaper: string
expressions and one aggregate vs shingling/minhashing the text).

Reference context: the reference engine has no web/URL handling at all
— this is a BASELINE.json north-star extension sitting alongside the
content-dedup families (operators/dedup.py).

Scale shape:
- ``url_dedup``: canonicalization is in-scan expression work
  (functions/urls.py); the dedup itself is one hash aggregate on the
  canonical string (map-side combined; the shuffle carries one row per
  DISTINCT canonical URL, never payloads). Same contract as d01's
  content dedup, keyed on the URL instead of the text hash.
- ``domain_cap_sample``: one window over (domain) ordered by a
  CONTENT hash of the doc id — deterministic under any partitioning
  (the d24 training-shuffle device), so the kept subset is stable
  across runs and engines; no global sort. Skewed mega-domains are the
  point: the cap turns a 10^8-page domain into ``cap`` rows while
  leaving the long tail untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_openetl_spark.functions.text import token_hash60
from python_openetl_spark.functions.urls import canonical_url, url_domain


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One row per canonical URL: ``(canonical_url, keeper_id, n_dups)``
    — keeper is the min id (the d01/d13 canonical-member convention),
    ``n_dups`` counts collapsed variants (1 = no duplicate)."""
    return (
        df.select(F.col(id_col), canonical_url(url_col).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def domain_cap_sample(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id", *, cap: int = 100
) -> DataFrame:
    """Keep at most ``cap`` rows per registrable domain, chosen by the
    deterministic hash order of ``id_col`` (stable under growth for the
    kept set's membership ORDER — adding rows to a domain can displace
    the highest-hash keepers, which is the intended cap semantics).
    Output adds ``domain`` and ``domain_rank`` (1-based)."""
    d = df.withColumn("domain", url_domain(url_col))
    w = Window.partitionBy("domain").orderBy(
        token_hash60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        d.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= cap)
    )
