"""UDF surface (SURVEY §2.3 last row): the engine's extension points,
replacing the reference's "write raw SQL" escape hatch
(`/root/reference/pyopenetl/operations.py:214-231`, execute_raw_sql).

Three tiers, fastest → slowest, each demonstrated as an
oracle-checkable query:

- u01: **Arrow-batched scalar pandas_udf** — numpy over Arrow columns,
  ~10-100x a row-at-a-time UDF; the right tier when built-in functions
  can't express the math.
- u02: **grouped-map applyInPandas** — whole-group pandas kernels
  (normalization, per-group model scoring); one shuffle on the group
  key, each group materialized as a pandas frame (groups must fit an
  executor — fine for bounded-cardinality keys, NOT for power-law keys).
- u03: **row-at-a-time Python UDF** — the slow path, kept for parity
  and documented as such; serialization per row, never in a hot loop.
- u09: **Arrow-optimized row UDF** (Spark 4 ``useArrow=True``) —
  u03 semantics over Arrow transport; the drop-in upgrade when the
  kernel is branchy per-row logic that cannot vectorize.
- u04: **Python UDTF** (Spark 4 table function) — one input row →
  many output rows from Python, the lateral-join extension point for
  tokenizers/parsers that genuinely need Python; composes with SQL
  (registered + invoked via LATERAL) and aggregates JVM-side after.

Float policy: numpy/pandas use pairwise/BLAS summation while DuckDB
folds sequentially, so double results are rounded (6 decimals) on both
sides before comparison — rounding is part of the query contract here,
not a test-side fudge.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType

from python_openetl_spark.workload.util import t


def l2_norm_udf():
    """Arrow-batched L2 norm over array<float> (float64 accumulate).
    Built lazily — UDF registration needs an active SparkSession."""

    @F.pandas_udf(DoubleType())
    def _l2_norm(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series(np.sqrt((mat * mat).sum(axis=1)))

    return _l2_norm


def u01_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.round(l2_norm_udf()(F.col("embedding")), 6).alias("l2_norm"),
    )


def u02_apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score via grouped-map applyInPandas (sample
    stddev, ddof=1 — matching stddev_samp)."""
    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        z = (pdf["value"] - mu) / sd if sd and not math.isnan(sd) else pdf["value"] * 0.0
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "z": z.round(6)}
        )

    return ev.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, z double"
    )


def priority_rank_udf():
    """Row-at-a-time parse of '1-URGENT' → 1 (slow-path tier demo)."""

    @F.udf(IntegerType())
    def _priority_rank(p):
        if p is None:
            return None
        head = p.split("-", 1)[0]
        return int(head) if head.isdigit() else None

    return _priority_rank


def u03_python_udf_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", priority_rank_udf()(F.col("o_orderpriority")).alias("prio_rank"))
    )


def term_counts_udtf():
    """Python UDTF: text → (term, tf) rows, the engine-wide tokenizer
    (functions/text.py TOKEN_SPLIT_RE) re-expressed as a table function.
    Built lazily — decoration needs an active SparkSession."""

    @F.udtf(returnType="term string, tf int")
    class TermCounts:
        def eval(self, text):
            if text is None:
                return
            import re
            from collections import Counter

            toks = [x for x in re.split("[^a-z0-9]+", text.lower()) if x]
            for term, tf in sorted(Counter(toks).items()):
                yield term, tf

    return TermCounts


def u04_python_udtf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term document/occurrence counts over a deterministic corpus
    slice, exploded by the UDTF in a LATERAL join and aggregated
    JVM-side. The Python boundary handles only the slice (1/13th of
    docs), and each input row crosses it once — the aggregation after
    the explosion is whole-stage-codegen."""
    spark.udtf.register("term_counts", term_counts_udtf())
    t(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0).createOrReplaceTempView(
        "u04_docs"
    )
    return spark.sql(
        """
        SELECT tc.term, COUNT(*) AS n_docs, CAST(SUM(tc.tf) AS BIGINT) AS total_tf
        FROM u04_docs d, LATERAL term_counts(d.text) tc
        GROUP BY tc.term
        """
    )


def u05_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow tier: the batch stays a pyarrow RecordBatch end to
    end — no pandas materialization, no per-row Python — with the
    transformation done by Arrow compute kernels (C++). The cheapest
    Python extension point when the kernel exists in Arrow; here a
    winsorize-style clip of the value column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = t(spark, sf_dir, "events").select("event_id", "value")

    def clip_batches(batches):
        for batch in batches:
            clipped = pc.min_element_wise(
                pc.max_element_wise(batch.column("value"), pa.scalar(10.0)),
                pa.scalar(500.0),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("event_id"), clipped], ["event_id", "value_clipped"]
            )

    return ev.mapInArrow(clip_batches, schema="event_id long, value_clipped double")


def trimmed_mean_udf():
    """Grouped-aggregate pandas UDF: 5% two-sided trimmed mean — the
    robust-statistic shape that has no builtin. Arrow moves each
    group's column once; the kernel is numpy. Built lazily (decoration
    needs an active session)."""

    @F.pandas_udf(DoubleType())
    def _trimmed_mean(v: pd.Series) -> float:
        x = np.sort(v.to_numpy(dtype=np.float64))
        k = len(x) // 20
        core = x[k : len(x) - k] if len(x) - 2 * k > 0 else x
        return float(np.round(core.mean(), 6))

    return _trimmed_mean


def u06_grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped-AGGREGATE pandas UDF tier (completing the ladder:
    scalar pandas_udf / grouped-map / row UDF / UDTF / mapInArrow /
    grouped-agg): per-event-type 5% trimmed mean of value. Trim count
    is n // 20 (integer arithmetic — a float 0.05*n would round
    differently across engines); the mean is rounded per the
    module-wide float policy."""
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").agg(
        trimmed_mean_udf()(F.col("value")).alias("trimmed_mean_value")
    )


def u07_apply_in_arrow_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInArrow tier (Spark 4.0+): each group arrives as ONE
    pyarrow Table — no pandas materialization at all, the zero-copy
    complement of u02's applyInPandas. The kernel computes the
    per-event-type value range (max - min: exact double arithmetic, no
    accumulation order to disagree on) plus the group size with pure
    pyarrow.compute calls."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def value_range(table: pa.Table) -> pa.Table:
        v = table.column("value")
        return pa.table(
            {
                # explicit string type: a NULL-event_type group would
                # otherwise infer pa.null() and trip Spark's
                # RESULT_COLUMN_TYPES_MISMATCH (hostile-fixture find)
                "event_type": pa.array(
                    [table.column("event_type")[0].as_py()], pa.string()
                ),
                "n_events": pa.array([table.num_rows], pa.int64()),
                "value_range": pa.array(
                    [pc.max(v).as_py() - pc.min(v).as_py()], pa.float64()
                ),
            }
        )

    ev = t(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInArrow(
        value_range, schema="event_type string, n_events long, value_range double"
    )



def u08_iterator_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas_udf (Series → Series per Arrow batch behind
    ONE generator call per task): the tier for kernels with expensive
    per-executor initialization — a tokenizer, codec, or model loads
    ONCE before the loop instead of per batch, which at 100 TB is the
    difference between amortized and quadratic setup cost (round-11
    UDF-surface completion). The "model" here is a deterministic
    price table (init counted via a closure cell to prove single-init
    per task); the math (value * tier multiplier, rounded) is
    SQL-mirrorable."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def tiered(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive init happens ONCE per task, not per Arrow batch
        table = {0: 1.0, 1: 1.05, 2: 1.1, 3: 1.2}
        for s in batches:
            yield ((s % 4).map(table) * s).round(6)

    ev = t(spark, sf_dir, "events").select("event_id", "value")
    return ev.select(
        "event_id",
        tiered(F.col("event_id").cast("double")).alias("tiered_id_cost"),
        F.round(F.col("value"), 6).alias("value"),
    )



def u09_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized row UDF (Spark 4 ``useArrow=True``): the SAME
    per-row Python semantics as u03's slow tier, but batched over Arrow
    instead of pickled row-by-row — the drop-in upgrade for existing
    row UDFs that can't be vectorized (branchy string/dict logic). The
    kernel classifies events into a tri-state label from two columns
    with NULL guards — exactly the shape that stays a row UDF in real
    codebases. Per-row Python remains the LAST tier (u01/u08 when the
    math vectorizes); this row pins that the Arrow transport changes
    serialization only, never values."""
    from pyspark.sql.types import StringType

    @F.udf(StringType(), useArrow=True)
    def classify(event_type, value):
        if event_type is None:
            return None
        if value is None:
            return f"{event_type}/none"
        return f"{event_type}/{'hi' if value >= 50.0 else 'lo'}"

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.select(
        "event_id",
        classify(F.col("event_type"), F.col("value")).alias("label"),
    )


QUERIES = {
    "u01_pandas_udf_norm": u01_pandas_udf_norm,
    "u02_apply_in_pandas_zscore": u02_apply_in_pandas_zscore,
    "u03_python_udf_priority": u03_python_udf_priority,
    "u04_python_udtf_terms": u04_python_udtf_terms,
    "u05_map_in_arrow": u05_map_in_arrow,
    "u06_grouped_agg_trimmed_mean": u06_grouped_agg_trimmed_mean,
    "u07_apply_in_arrow_range": u07_apply_in_arrow_range,
    "u08_iterator_pandas_udf": u08_iterator_pandas_udf,
    "u09_arrow_python_udf": u09_arrow_python_udf,
}

ORACLE = {
    "u09_arrow_python_udf": """
        SELECT event_id,
               CASE WHEN event_type IS NULL THEN NULL
                    WHEN value IS NULL THEN event_type || '/none'
                    WHEN value >= 50.0 THEN event_type || '/hi'
                    ELSE event_type || '/lo' END AS label
        FROM events
    """,
    "u07_apply_in_arrow_range": """
        SELECT event_type, COUNT(*) AS n_events,
               MAX(value) - MIN(value) AS value_range
        FROM events GROUP BY event_type
    """,
    "u01_pandas_udf_norm": """
        SELECT vec_id, label,
               ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm
        FROM embeddings
    """,
    "u02_apply_in_pandas_zscore": """
        -- degenerate groups (single row -> NULL stddev, constant values
        -- -> 0 stddev) z-score to 0.0, matching the kernel's guard
        SELECT event_id, event_type,
               ROUND(CASE WHEN COALESCE(
                              STDDEV_SAMP(value) OVER (PARTITION BY event_type), 0
                            ) = 0
                          THEN 0.0
                          ELSE (value - AVG(value) OVER (PARTITION BY event_type))
                               / STDDEV_SAMP(value) OVER (PARTITION BY event_type)
                     END, 6) AS z
        FROM events
    """,
    "u03_python_udf_priority": """
        SELECT o_orderkey,
               CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS prio_rank
        FROM orders
    """,
    "u04_python_udtf_terms": """
        WITH tk AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents WHERE doc_id % 13 = 0
        ),
        per_doc AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(toks) AS term FROM tk)
          GROUP BY doc_id, term
        )
        SELECT term, COUNT(*) AS n_docs, CAST(SUM(tf) AS BIGINT) AS total_tf
        FROM per_doc GROUP BY term
    """,
    # min/max over doubles are exact (no fp accumulation), so the Arrow
    # kernel path compares unrounded
    "u05_map_in_arrow": """
        SELECT event_id, LEAST(GREATEST(value, 10.0), 500.0) AS value_clipped
        FROM events
    """,
    # trim count n // 20 in INTEGER arithmetic on both sides; the mean
    # itself is rounded (numpy pairwise vs sequential fold, ~1 ulp)
    "u06_grouped_agg_trimmed_mean": """
        WITH r AS (
          SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events
        )
        SELECT event_type, ROUND(AVG(value), 6) AS trimmed_mean_value
        FROM r
        WHERE rn > n // 20 AND rn <= n - n // 20
        GROUP BY 1
    """,
    # the tier table is {0:1.0, 1:1.05, 2:1.1, 3:1.2} on event_id % 4;
    # double multiply is a single fp op (no accumulation), rounded 6
    "u08_iterator_pandas_udf": """
        SELECT event_id,
               ROUND(CASE event_id % 4
                     WHEN 0 THEN 1.0 WHEN 1 THEN 1.05
                     WHEN 2 THEN 1.1 ELSE 1.2
                     END * event_id::DOUBLE, 6) AS tiered_id_cost,
               ROUND(value, 6) AS value
        FROM events
    """,
}
