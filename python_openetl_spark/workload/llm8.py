"""Round-5 LLM-data additions: corpus governance + linkage operators.

- d42: k-anonymity audit over document metadata (operators/privacy.py)
  — the re-identification-risk complement of d20's direct-PII
  redaction.

Registered after ``relational4`` in ``_MODULES`` so the frozen
``_WINDOW_R5`` is unchanged; locally oracle-gated now, rotates into
``_WINDOW_R6``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.workload.util import t


def d42_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the (lang, source, n_chars-bucket) quasi-
    identifier tuple, k=3: the one-row audit plus the violating-group
    detail is the exact artifact a pre-release privacy review wants.
    One hash aggregate; the bucket keeps the combination space dense
    enough that violations exist at every fixture scale (raw n_chars
    would make nearly every row its own group — trivially all-
    violating, testing nothing)."""
    from python_openetl_spark.operators.privacy import k_anonymity_groups

    d = t(spark, sf_dir, "documents").select(
        "lang",
        "source",
        # floor, not a truncating cast: identical to the oracle for
        # negative values too (hostile-fixture proofing)
        F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
    )
    return k_anonymity_groups(d, ["lang", "source", "len_bucket"], k=3).orderBy(
        "lang", "source", "len_bucket"
    )


QUERIES = {"d42_k_anonymity": d42_k_anonymity}

ORACLE = {
    "d42_k_anonymity": """
        SELECT lang, source,
               CAST(floor(n_chars / 100.0) AS BIGINT) AS len_bucket,
               COUNT(*) AS group_size
        FROM documents
        GROUP BY 1, 2, 3
        HAVING COUNT(*) < 3
    """,
}
