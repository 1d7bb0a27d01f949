"""Slowly-changing-dimension (type 2) merge: history-preserving upsert.

The reference's upsert (/root/reference/pyopenetl/operations.py:688-730)
is type-1 — ON CONFLICT DO UPDATE overwrites in place and history is
lost. Warehouse dimension maintenance usually needs type 2: when an
attribute changes, *close* the current row (stamp ``valid_to``, clear
``is_current``) and open a new version row. This operator generalizes
``operators.merge.merge_upsert`` to that contract.

Dataflow (pure DataFrame → DataFrame, no writes):

    current  = history where is_current
    changes  = delta ⟕ current on pk, kept when the pk is new OR any
               tracked attribute differs (null-safe ``<=>`` compare —
               NULL→value and value→NULL transitions are real changes)
    closed   = current ⋉ changes     (valid_to = as_of, is_current = F)
    result   = closed-history ∪ (current ∖ changes) ∪ closed ∪ new rows

Scale notes (100 TB): the only wide exchange is the pk equi-join of
current × delta — one shuffle, broadcast when the delta is small (AQE);
the closed-history partition of the table is untouched pass-through, so
with ``is_current`` as a partition column the scan prunes to the live
partition and cost is O(current + delta) regardless of history depth.
Unchanged delta rows are filtered before any union, so re-running the
same delta is a no-op (idempotent merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_openetl_spark.operators.merge import dedupe_latest

#: SCD2 bookkeeping columns added to the business schema.
SCD2_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(snapshot: DataFrame, as_of) -> DataFrame:
    """Open an initial history from a snapshot: every row current as of
    ``as_of`` with an unbounded ``valid_to``."""
    return snapshot.select(
        "*",
        F.lit(as_of).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    history: DataFrame,
    delta: DataFrame,
    pk: str | list[str],
    as_of,
    *,
    compare_cols: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Apply a delta snapshot to an SCD2 history table at time ``as_of``.

    ``history`` carries the business columns plus ``SCD2_COLS``;
    ``delta`` carries the business columns only. ``compare_cols`` limits
    change detection (default: every non-pk business column);
    ``order_col`` resolves duplicate-pk delta rows latest-wins before
    merging (same hazard as merge_upsert).
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    business = [c for c in history.columns if c not in SCD2_COLS]
    tracked = compare_cols or [c for c in business if c not in keys]
    if order_col is not None:
        delta = dedupe_latest(delta, keys, order_col)
    delta = delta.select(*business)

    current = history.filter(F.col("is_current"))
    closed_history = history.filter(~F.col("is_current"))

    # one pk join carries both the existence marker and the compare cols
    cur_cmp = current.select(
        *keys,
        F.lit(True).alias("__exists"),
        *[F.col(c).alias(f"__cur_{c}") for c in tracked],
    )
    joined = delta.join(cur_cmp, on=keys, how="left")
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__cur_{c}"))
    changes = joined.filter(F.col("__exists").isNull() | differs).select(*business)

    change_keys = changes.select(*keys)
    to_close = current.join(change_keys, on=keys, how="left_semi")
    untouched = current.join(change_keys, on=keys, how="left_anti")
    closed = to_close.select(
        *business,
        F.col("valid_from"),
        F.lit(as_of).cast("timestamp").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = scd2_init(changes, as_of)
    return (
        closed_history.select(*business, *SCD2_COLS)
        .unionByName(untouched.select(*business, *SCD2_COLS))
        .unionByName(closed)
        .unionByName(opened)
    )
