"""Incremental aggregate maintenance: merge delta partials into a rollup.

The pattern that makes 100 TB aggregation tractable: maintain a
materialized rollup table of decomposable aggregates (count/sum/min/max
— and avg as sum÷count) and fold each incoming delta's *partial*
aggregates into it, instead of re-scanning history. Merging is just
re-aggregation of the union of partial states:

    merged = (rollup ∪ partial_aggs(delta)).groupBy(keys).agg(combine)

so the plan is one map-side-combined shuffle on the group keys, the
same shape Spark uses internally for any aggregate — no join, no
full-history scan. Sums over floating data should be pre-cast to
DECIMAL by the caller for order-independent exactness (see
workload/util.dsum); count/min/max are trivially order-independent.

Generalizes the reference's incremental window (its delta read at
/root/reference/pyopenetl/operations.py:539-541 feeds a row-level
upsert; here the same delta feeds aggregate-level maintenance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate name -> (delta aggregator, partial combiner)
_AGGS = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def _out_name(col: str, how: str) -> str:
    return f"{how}_{col}"


def partial_aggs(
    rows: DataFrame, keys: list[str], spec: dict[str, list[str]]
) -> DataFrame:
    """Aggregate raw rows into partial states: one output column per
    (column, aggregate) pair in ``spec`` ({col: ["sum", "max", ...]}),
    named ``{agg}_{col}``."""
    aggs = [
        _AGGS[how][0](c).alias(_out_name(c, how))
        for c, hows in spec.items()
        for how in hows
    ]
    return rows.groupBy(*keys).agg(*aggs)


def merge_partial_aggs(
    rollup: DataFrame, delta_rollup: DataFrame, keys: list[str], spec: dict[str, list[str]]
) -> DataFrame:
    """Fold a delta's partial aggregates into the maintained rollup.
    Both inputs carry the ``partial_aggs`` schema; groups present on only
    one side pass through via the union (no outer-join null handling)."""
    combiners = [
        _AGGS[how][1](_out_name(c, how)).alias(_out_name(c, how))
        for c, hows in spec.items()
        for how in hows
    ]
    return (
        rollup.unionByName(delta_rollup.select(*rollup.columns))
        .groupBy(*keys)
        .agg(*combiners)
    )


def incremental_rollup(
    rollup: DataFrame, delta_rows: DataFrame, keys: list[str], spec: dict[str, list[str]]
) -> DataFrame:
    """Maintain ``rollup`` with raw delta rows: partial-agg the delta,
    then merge. Equivalent to recomputing over history ∪ delta (asserted
    differentially in tests) at the cost of the delta alone."""
    return merge_partial_aggs(rollup, partial_aggs(delta_rows, keys, spec), keys, spec)


def apply_cdc_rollup(
    rollup: DataFrame,
    cdc: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    *,
    count_name: str = "n_rows",
    change_col: str = "change_type",
    old_prefix: str = "old_",
) -> DataFrame:
    """Maintain a count/sum rollup from a CDC feed WITH retractions —
    the incremental-view-maintenance step ``incremental_rollup`` (append
    -only) cannot do: updates retract the before-image and apply the
    after-image (including rows that MIGRATE between groups when a key
    column changed), deletes retract, groups whose count reaches zero
    disappear.

    ``cdc`` is ``merge.snapshot_diff(old, new, pk, include_old=True)``
    output: I/U rows carry after-images in the value columns, U/D rows
    carry before-images in ``old_<col>``. ``rollup`` carries ``keys``,
    ``count_name``, and ``sum_<c>`` per sum column — with the sums in
    DECIMAL so maintenance stays exact (maintenance == full recompute,
    bit-for-bit; asserted differentially in tests and by the m18
    oracle). Only abelian aggregates (count/sum) are retractable; for
    max/min keep ``incremental_rollup`` + periodic recompute.

    Scale shape: the CDC feed explodes into ≤2 weighted contribution
    rows per change, one map-side-combined groupBy over the DELTA only,
    then a full-outer join with the (comparatively small) maintained
    rollup — history is never re-scanned.
    """
    w = F.col("__w")
    plus = cdc.filter(F.col(change_col).isin("I", "U")).select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(1).alias("__w"),
        *[F.col(c).alias(c) for c in sum_cols],
    )
    minus = cdc.filter(F.col(change_col).isin("U", "D")).select(
        *[F.col(f"{old_prefix}{k}").alias(k) for k in keys],
        F.lit(-1).alias("__w"),
        *[F.col(f"{old_prefix}{c}").alias(c) for c in sum_cols],
    )
    delta = (
        plus.unionByName(minus)
        .groupBy(*keys)
        .agg(
            F.sum(w).alias("__dn"),
            *[
                F.sum(F.col(c).cast("decimal(24,6)") * w).alias(f"__ds_{c}")
                for c in sum_cols
            ],
        )
    )
    joined = rollup.join(delta, keys, "full_outer")
    zero = F.lit(0).cast("decimal(24,6)")
    out_cols = [
        (
            F.coalesce(F.col(count_name), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).cast("long").alias(count_name)
    ] + [
        (
            F.coalesce(F.col(_out_name(c, "sum")).cast("decimal(24,6)"), zero)
            + F.coalesce(F.col(f"__ds_{c}"), zero)
        ).alias(_out_name(c, "sum"))
        for c in sum_cols
    ]
    return (
        joined.select(*keys, *out_cols)
        .filter(F.col(count_name) > 0)
    )
