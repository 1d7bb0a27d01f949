"""Privacy-risk assessment for training corpora: k-anonymity over
quasi-identifier combinations.

The PII-redaction tier (operators/prep.py redact_pii, d20) removes
DIRECT identifiers; this measures RE-IDENTIFICATION risk from the
attributes that remain: a (quasi-identifier) combination shared by
fewer than ``k`` rows singles those rows out (Sweeney's k-anonymity).
In a training-data pipeline this gates metadata columns a model could
memorize and is the standard pre-release audit for tabular extracts.

Scale shape: one hash aggregate on the quasi-identifier tuple (map-
side combined), then a tiny aggregate over the group sizes — no join,
no sort; the per-group detail is only materialized for the violating
groups (count < k), which a healthy corpus keeps near-empty. NULL
quasi-values form their own group (NULL-safe grouping is the hostile
case: NULL metadata is itself identifying when rare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_groups(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Violating quasi-identifier groups: ``(*quasi_cols, group_size)``
    for every combination shared by fewer than ``k`` rows."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One-row audit summary: total groups, violating groups, rows at
    risk (members of sub-k groups), and the corpus's actual k (the
    smallest group size) — ``is_k_anonymous`` iff min group size >= k."""
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("group_size"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("group_size") < k).cast("long")).alias("n_violating_groups"),
        F.sum(
            F.when(F.col("group_size") < k, F.col("group_size")).otherwise(0)
        ).alias("n_rows_at_risk"),
        F.min("group_size").alias("min_group_size"),
    ).select(
        "n_groups",
        "n_violating_groups",
        "n_rows_at_risk",
        "min_group_size",
        (F.col("min_group_size") >= k).alias("is_k_anonymous"),
    )


def pseudonymize(
    df: DataFrame, cols: list[str], *, salt: str = "", prefix: str = "tok_"
) -> DataFrame:
    """Deterministic pseudonymization of identifier columns: each value
    is replaced by ``prefix + first-12-hex(md5(salt + ':' + value))`` —
    the governance step between full redaction (d20, destroys
    joinability) and leaving identifiers raw: equal values map to equal
    tokens, so grouping/joining on the column still works, while the
    raw value never leaves the scan. A per-dataset ``salt`` prevents
    cross-dataset token linkage (and rainbow-table reversal of
    low-entropy identifiers). NULL stays NULL.

    One in-scan expression per column (md5 is codegen; no UDF, no
    shuffle, no lookup table to manage — the stateless alternative to
    a tokenization vault, trading revocability for zero infrastructure).
    """
    out = df
    for c in cols:
        v = F.col(c).cast("string")
        out = out.withColumn(
            c,
            F.when(
                v.isNotNull(),
                F.concat(
                    F.lit(prefix),
                    F.substring(F.md5(F.concat(F.lit(f"{salt}:"), v)), 1, 12),
                ),
            ),
        )
    return out
