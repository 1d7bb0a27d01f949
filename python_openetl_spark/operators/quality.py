"""Declarative data-quality expectations — the validation tier an ETL
engine runs between ingest and publish (the reference validates only
implicitly, via Postgres constraints on the destination table
`/root/reference/pyopenetl/operations.py:296-355`; this makes the
checks first-class and engine-side, the Deequ/Great-Expectations
shape restated on DataFrames).

Check vocabulary:

- ``not_null(col)`` — NULL count
- ``unique(col)`` — rows minus distinct (duplicate key count)
- ``in_range(col, lo, hi)`` — out-of-range count (NULLs don't count:
  they are not_null's job)
- ``accepted_values(col, values)`` — count outside the allowed set
- ``matches(col, regexp)`` — count not fully matching
- ``ref_integrity(col, other, other_col)`` — orphan count (left-anti)

Scale shape: every non-referential check on a table compiles into ONE
conditional aggregate over ONE scan — adding a check adds a column to
the aggregate, never a pass over the data (the single-pass profile
story of workload q32, generalized). Referential checks each add one
left-anti join against the (broadcast when small) referenced key set.
Output is one row per check: ``(table_name, check, column, n_violations,
passed)`` — tiny, mergeable across tables by union.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    kind: str
    column: str
    params: dict = field(default_factory=dict)

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})"


def not_null(column: str) -> Check:
    return Check("not_null", column)


def unique(column: str) -> Check:
    return Check("unique", column)


def in_range(column: str, lo, hi) -> Check:
    return Check("in_range", column, {"lo": lo, "hi": hi})


def accepted_values(column: str, values: list) -> Check:
    return Check("accepted_values", column, {"values": list(values)})


def matches(column: str, pattern: str) -> Check:
    return Check("matches", column, {"pattern": pattern})


def ref_integrity(column: str, other: DataFrame, other_col: str) -> Check:
    return Check("ref_integrity", column, {"other": other, "other_col": other_col})


def _violation_expr(c: Check):
    col = F.col(c.column)
    if c.kind == "not_null":
        return F.sum(col.isNull().cast("long"))
    if c.kind == "in_range":
        lo, hi = c.params["lo"], c.params["hi"]
        return F.sum(
            (col.isNotNull() & ((col < F.lit(lo)) | (col > F.lit(hi)))).cast("long")
        )
    if c.kind == "accepted_values":
        return F.sum(
            (col.isNotNull() & ~col.isin(c.params["values"])).cast("long")
        )
    if c.kind == "matches":
        return F.sum(
            (col.isNotNull() & ~col.rlike(c.params["pattern"])).cast("long")
        )
    raise ValueError(f"not an aggregate check: {c.kind}")


def run_checks(df: DataFrame, checks: list[Check], table_name: str) -> DataFrame:
    """Evaluate every check; returns one row per check (see module
    docstring for the single-pass compilation contract)."""
    spark = df.sparkSession
    agg_checks = [c for c in checks if c.kind not in ("unique", "ref_integrity")]
    uniq_checks = [c for c in checks if c.kind == "unique"]
    ref_checks = [c for c in checks if c.kind == "ref_integrity"]

    results: list[DataFrame] = []
    aggs = []
    for c in agg_checks:
        aggs.append(_violation_expr(c).alias(c.name))
    for c in uniq_checks:
        # duplicates = rows-with-value minus distinct values: computable
        # in the same single aggregate (no self-join, no second scan)
        aggs.append(
            (
                F.count(F.col(c.column)) - F.count_distinct(F.col(c.column))
            ).alias(c.name)
        )
    if aggs:
        one = df.agg(*aggs)
        rows = one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c.name).alias("check"),
                            F.lit(c.column).alias("column"),
                            F.coalesce(F.col(c.name), F.lit(0))
                            .cast("long")
                            .alias("n_violations"),
                        )
                        for c in agg_checks + uniq_checks
                    ]
                )
            ).alias("r")
        ).select("r.*")
        results.append(rows)
    for c in ref_checks:
        other = c.params["other"].select(
            F.col(c.params["other_col"]).alias(c.column)
        ).distinct()
        orphans = (
            df.filter(F.col(c.column).isNotNull())
            .join(other, c.column, "left_anti")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        results.append(
            orphans.select(
                F.lit(c.name).alias("check"),
                F.lit(c.column).alias("column"),
                F.col("n").cast("long").alias("n_violations"),
            )
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        F.lit(table_name).alias("table_name"),
        "check",
        "column",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def _row_violation(c: Check, df: DataFrame):
    """Row-level predicate: TRUE where this row violates the check.
    ``unique`` needs a per-key window count; ``ref_integrity`` is
    handled by ``quarantine`` itself (one join, not an expression)."""
    col = F.col(c.column)
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "in_range":
        lo, hi = c.params["lo"], c.params["hi"]
        return col.isNotNull() & ((col < F.lit(lo)) | (col > F.lit(hi)))
    if c.kind == "accepted_values":
        return col.isNotNull() & ~col.isin(c.params["values"])
    if c.kind == "matches":
        return col.isNotNull() & ~col.rlike(c.params["pattern"])
    if c.kind == "unique":
        from pyspark.sql.window import Window

        return col.isNotNull() & (
            F.count(F.lit(1)).over(Window.partitionBy(col)) > 1
        )
    raise ValueError(f"no row-level form for check kind: {c.kind}")


def quarantine(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Row-level quality gate: every input row, annotated with
    ``dq_reasons`` (comma-joined names of the checks it fails, in the
    given check order — deterministic) and ``dq_valid``.

    The write-side half of the expectations story: ``run_checks``
    reports table health, ``quarantine`` routes the actual bad rows to
    a dead-letter table instead of poisoning the publish (split with
    :func:`quarantine_split`).

    Scale shape: scan-local checks stay one pass; each ``unique`` adds
    one window (shuffle on that key); each ``ref_integrity`` adds one
    left join against the (broadcast when small) distinct key set —
    never a second scan of the fact table per check.
    """
    reasons = []
    out = df
    for c in checks:
        if c.kind == "ref_integrity":
            other = c.params["other"]
            keys = other.select(
                F.col(c.params["other_col"]).alias(c.column),
                F.lit(True).alias(f"__ref_{c.name}"),
            ).distinct()
            out = out.join(F.broadcast(keys), c.column, "left")
            viol = F.col(c.column).isNotNull() & F.col(f"__ref_{c.name}").isNull()
            out = out.withColumn(f"__v_{c.name}", viol).drop(f"__ref_{c.name}")
        else:
            out = out.withColumn(f"__v_{c.name}", _row_violation(c, df))
        reasons.append(F.when(F.col(f"__v_{c.name}"), F.lit(c.name)))
    out = out.withColumn("dq_reasons", F.concat_ws(",", *reasons))
    out = out.select(
        *df.columns,
        F.when(F.col("dq_reasons") == "", None).otherwise(F.col("dq_reasons")).alias("dq_reasons"),
        (F.col("dq_reasons") == "").alias("dq_valid"),
    )
    return out


def quarantine_split(df: DataFrame, checks: list[Check]) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): good rows with the original schema,
    quarantined rows with ``dq_reasons`` attached."""
    annotated = quarantine(df, checks)
    good = annotated.filter(F.col("dq_valid")).select(*df.columns)
    bad = annotated.filter(~F.col("dq_valid")).drop("dq_valid")
    return good, bad
