"""Round-4 LLM-data-pipeline queries.

Registered after the round-3 modules in ``_MODULES`` so the frozen
``_WINDOW_R4`` is unchanged; these are locally oracle-gated now and
rotate into ``_WINDOW_R5``.

d31: leakage-safe train/val/test split — the contamination-control
step between dedup (d12/d13) and sampling (d10/d24): split membership
is decided per dup-CLUSTER so near-duplicate pairs can never straddle
the train/eval boundary. d32: unigram-LM quality scoring — the
corpus-distribution filter proxy one tier above d04's surface
heuristics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_openetl_spark.workload.llm import (
    _COMPONENTS_SQL,
    _TOKS_SQL,
    _TWINS_SQL,
    _docs_with_twins,
    _jaccard_pairs,
)
from python_openetl_spark.workload.util import t


def d31_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level train/val/test assignment over the twinned corpus
    (same dup structure d12 resolves): every document inherits its dup
    cluster representative's hash bucket, so a near-dup pair always
    lands on one side of the split. Composition of d12's connected
    components + d10's deterministic hash bucketing."""
    from python_openetl_spark.operators.sampling import leakage_safe_split

    docs = _docs_with_twins(spark, sf_dir)
    return leakage_safe_split(docs, _jaccard_pairs(spark, sf_dir))


def d32_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score per document (textops module docstring
    has the determinism + scale notes)."""
    from python_openetl_spark.operators.textops import unigram_logprob_score

    return unigram_logprob_score(t(spark, sf_dir, "documents"))


def d33_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy hitters (operators/sketches.py): exact
    top-20 tokens annotated with their CMS estimates. The sketch's
    row-salted md5 hashing is engine-portable, so the oracle rebuilds
    the IDENTICAL sketch in SQL and the driver hash-checks actual
    sketch contents — plus the in-plan one-sided guarantee boolean."""
    from python_openetl_spark.operators.sketches import cms_heavy_hitters

    return cms_heavy_hitters(t(spark, sf_dir, "documents"))


QUERIES = {
    "d31_leakage_safe_split": d31_leakage_safe_split,
    "d32_unigram_logprob": d32_unigram_logprob,
    "d33_cms_heavy_hitters": d33_cms_heavy_hitters,
}

ORACLE = {
    # comps = the exact recursive-CTE transitive closure d12 uses;
    # bucket = the d10 md5 device over the representative id
    "d31_leakage_safe_split": f"""
        WITH comps AS ({_COMPONENTS_SQL}),
        docs AS ({_TWINS_SQL}),
        rep AS (
          SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS rep_id
          FROM docs d LEFT JOIN comps c ON d.doc_id = c.id
        ),
        b AS (
          SELECT doc_id, rep_id,
                 ('0x' || substr(md5(':' || rep_id::VARCHAR), 1, 15))::UBIGINT
                   % 10000 AS bucket
          FROM rep
        )
        SELECT doc_id, rep_id,
               CASE WHEN bucket < 1000 THEN 'test'
                    WHEN bucket < 2000 THEN 'val'
                    ELSE 'train' END AS split
        FROM b
    """,
    "d32_unigram_logprob": f"""
        WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        ex AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
        freq AS (SELECT tok, COUNT(*) AS n FROM ex GROUP BY tok),
        tot AS (SELECT COUNT(*) AS total FROM ex),
        scored AS (
          SELECT e.doc_id, round(-ln(f.n::DOUBLE / t.total), 9) AS nlp
          FROM ex e JOIN freq f USING (tok) CROSS JOIN tot t
        ),
        agg AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 round(CAST(SUM(CAST(nlp AS DECIMAL(24,12))) AS DOUBLE)
                       / COUNT(*), 6) AS avg_neglogp
          FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(n_tokens, 0) AS n_tokens,
               COALESCE(avg_neglogp, 0.0) AS avg_neglogp
        FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """,
    # the oracle rebuilds the sketch itself: same row-salted 60-bit md5
    # buckets, same depth=4/width=2048, so cms_est matches bit-for-bit
    "d33_cms_heavy_hitters": f"""
        WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        ex AS (SELECT unnest(toks) AS tok FROM tk),
        js AS (SELECT unnest(range(4)) AS j),
        cells AS (
          SELECT j,
                 ('0x' || substr(md5('cms' || j || ':' || tok), 1, 15))::UBIGINT
                   % 2048 AS bucket
          FROM ex CROSS JOIN js
        ),
        cms AS (SELECT j, bucket, COUNT(*) AS cnt FROM cells GROUP BY j, bucket),
        top AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count
          FROM ex GROUP BY tok
          ORDER BY true_count DESC, tok LIMIT 20
        ),
        probes AS (
          SELECT t.tok, t.true_count, js.j,
                 ('0x' || substr(md5('cms' || js.j || ':' || t.tok), 1, 15))::UBIGINT
                   % 2048 AS bucket
          FROM top t CROSS JOIN js
        ),
        est AS (
          SELECT p.tok, p.true_count,
                 CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cms_est
          FROM probes p LEFT JOIN cms c ON p.j = c.j AND p.bucket = c.bucket
          GROUP BY p.tok, p.true_count
        )
        SELECT tok, true_count, cms_est,
               cms_est >= true_count AS overestimates
        FROM est
    """,
}
