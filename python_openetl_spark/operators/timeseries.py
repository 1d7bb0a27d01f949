"""Time-series regularization: per-group date spines, gap filling,
and forward fill.

The "make the series dense" step every monitoring / feature pipeline
needs before windowed models: a daily aggregate has holes wherever no
events occurred; downstream rolling windows require one row per
(group, day).

Scale shape (100 TB events):

- The spine is built from the per-group ``min/max`` bounds (one
  map-side-combined aggregation over the already-aggregated daily
  frame, which is tiny relative to raw events) and exploded with
  ``sequence()`` **executor-side** — the spine never materializes on
  the driver.
- The left join back to the daily frame shuffles both sides once on
  ``(keys, date)``; the forward-fill window partitions by the same
  keys, so AQE reuses the join's partitioning instead of adding a
  second shuffle of the big side.
- Groups × days can exceed the source row count (that is the point);
  callers bound the spine with ``max_days`` to catch runaway ranges
  from corrupt dates — the guard every production gap-filler needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def date_spine(
    daily: DataFrame,
    keys: Sequence[str],
    date_col: str,
    *,
    max_days: int | None = 100_000,
) -> DataFrame:
    """One row per (group, day) covering each group's [min, max] date
    range. ``max_days`` guards against corrupt far-past/future dates
    exploding the spine (fail fast, executor-side)."""
    keys = list(keys)
    bounds = daily.groupBy(*keys).agg(
        F.min(date_col).alias("__dmin"), F.max(date_col).alias("__dmax")
    )
    if max_days is not None:
        bounds = bounds.withColumn(
            "__span", F.datediff("__dmax", "__dmin") + F.lit(1)
        ).withColumn(
            "__dmax",
            F.when(F.col("__span") <= max_days, F.col("__dmax")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(f"date_spine: group span exceeds max_days={max_days}: "),
                        F.col("__span").cast("string"),
                        F.lit(" days"),
                    )
                )
            ),
        )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence("__dmin", "__dmax", F.expr("interval 1 day"))
        ).alias(date_col),
    )


def gap_fill(
    daily: DataFrame,
    keys: Sequence[str],
    date_col: str,
    *,
    zero_cols: Sequence[str] = (),
    ffill_cols: Sequence[str] = (),
    max_days: int | None = 100_000,
) -> DataFrame:
    """Densify a per-group daily frame onto its date spine.

    - ``zero_cols``: missing days become 0 (counts, sums).
    - ``ffill_cols``: missing days carry the last observed value
      forward (levels, prices); NULL until the first observation.

    Other columns pass through with NULL on filled rows.
    """
    keys = list(keys)
    spine = date_spine(daily, keys, date_col, max_days=max_days)
    out = spine.join(daily, on=[*keys, date_col], how="left")
    for c in zero_cols:
        zero = F.lit(0).cast(out.schema[c].dataType)
        out = out.withColumn(c, F.coalesce(F.col(c), zero))
    if ffill_cols:
        w = (
            Window.partitionBy(*keys)
            .orderBy(date_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in ffill_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
