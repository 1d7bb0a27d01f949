"""As-of (point-in-time) join — for each left row, the most recent right
row at-or-before its timestamp, per key.

The reference has no as-of join (its only temporal op is the sliding
delta-window read, `/root/reference/pyopenetl/operations.py:539-540`);
this is part of the engine's time-series surface for event/feature
pipelines (e.g. "latest click before each purchase", feature-store
point-in-time correctness).

Spark-first formulation — the **union-merge** shape, not a range join:

1. tag left rows side=1, right rows side=0, union them;
2. one shuffle: partition by the key, sort by (time, side, seq);
3. carry the latest right payload forward with
   ``last(payload, ignoreNulls=True)`` over an unbounded-preceding
   running window;
4. keep left rows; the carried struct is the as-of match.

Cost is a single hash shuffle + per-key sort — O(n log n) per key,
no candidate-pair blowup, which is the property that matters at 100 TB
(a naive ``t_right.ts <= t_left.ts`` theta join is quadratic per key).
Equal timestamps: right sorts before left (side 0 < 1), so matches are
inclusive; ties among right rows resolve to the greatest ``seq_col``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str = "user_id",
    seq_col: str | None = None,
    right_prefix: str = "asof_",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Inclusive as-of join, backward (default) or forward.

    Returns every ``left`` row with ``{right_prefix}{col}`` columns from
    the matched right row — the most recent right row at-or-before the
    left timestamp (``direction="backward"``), or the earliest one
    at-or-after it (``"forward"``); NULL when none exists. ``on`` and
    ``by`` must exist in both inputs; ``seq_col`` (right side) breaks
    timestamp ties deterministically (greatest wins; without one, ties
    resolve by xxhash64 of the right row — arbitrary but reproducible
    across runs and repartitionings). ``tolerance``
    nulls out matches further than the given gap from the left row —
    seconds when ``on`` is a timestamp, same units as ``on`` when it is
    numeric (pandas ``merge_asof`` semantics, engine-side).

    Both directions are the same union-merge dataflow: forward only
    flips the traversal to descending time — still one shuffle + one
    per-key sort, no plan-shape change. ``direction="nearest"`` (pandas
    parity: closest right row in either direction, backward wins exact
    ties) evaluates BOTH carries over the same partitioning — Catalyst
    plans one Exchange and two sorts, not two shuffles — and picks the
    smaller absolute gap per left row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    rpay_cols = [c for c in right.columns if c != by]
    # no seq_col → content-derived tiebreaker: equal-timestamp right rows
    # resolve by xxhash64 of the full right row, which is reproducible
    # across runs, retries, and repartitionings (monotonically_increasing_id
    # would depend on partition layout)
    seq = (
        F.col(seq_col).cast("long")
        if seq_col
        else F.xxhash64(*[F.col(c) for c in right.columns])
    )
    l = left.select(
        F.col(by), F.col(on).alias("__t"), F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lpay"),
        F.lit(None).cast("long").alias("__seq"),
    )
    r = right.select(
        F.col(by), F.col(on).alias("__t"), F.lit(0).alias("__side"),
        F.lit(None).cast(l.schema["__lpay"].dataType.simpleString()).alias("__lpay"),
        seq.alias("__seq"),
        F.struct(*[F.col(c) for c in rpay_cols]).alias("__rpay"),
    )
    l = l.withColumn("__rpay", F.lit(None).cast(r.schema["__rpay"].dataType.simpleString()))
    both = l.unionByName(r)

    from pyspark.sql.types import TimestampNTZType, TimestampType

    is_ts = isinstance(left.schema[on].dataType, (TimestampType, TimestampNTZType))

    def _cmp(c: F.Column) -> F.Column:
        # exact integer micros — a double epoch-seconds compare has
        # ~0.5µs of ulp error at 2024 epoch magnitudes
        return F.unix_micros(c) if is_ts else c.cast("double")

    tol = None
    if tolerance is not None:
        tol = (
            F.lit(int(round(float(tolerance) * 1_000_000)))
            if is_ts
            else F.lit(float(tolerance))
        )

    # traversal order: time toward the left row, rights (side 0) before
    # lefts at equal timestamps (inclusive match), greater seq later so
    # last() resolves right-side ties to the greatest seq
    def _carry(descending: bool) -> F.Column:
        t_order = F.col("__t").desc() if descending else F.col("__t")
        w = (
            Window.partitionBy(by)
            .orderBy(t_order, F.col("__side"), F.col("__seq"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__rpay", ignorenulls=True).over(w)

    if direction in ("backward", "forward"):
        carried = both.withColumn("__match", _carry(direction == "forward"))
        out = carried.filter(F.col("__side") == 1)
        match = F.col("__match")
        if tol is not None:
            lt, rt = _cmp(F.col("__t")), _cmp(F.col(f"__match.{on}"))
            gap = (lt - rt) if direction == "backward" else (rt - lt)
            match = F.when(gap <= tol, F.col("__match"))
    else:  # nearest: both carries over ONE partitioning (two sorts, one shuffle)
        carried = both.withColumn("__mb", _carry(False)).withColumn("__mf", _carry(True))
        out = carried.filter(F.col("__side") == 1)
        lt = _cmp(F.col("__t"))
        gap_b = lt - _cmp(F.col(f"__mb.{on}"))
        gap_f = _cmp(F.col(f"__mf.{on}")) - lt
        mb, mf = F.col("__mb"), F.col("__mf")
        if tol is not None:
            mb, gap_b = F.when(gap_b <= tol, mb), F.when(gap_b <= tol, gap_b)
            mf, gap_f = F.when(gap_f <= tol, mf), F.when(gap_f <= tol, gap_f)
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(gap_b <= gap_f, mb)  # exact tie -> backward (pandas parity)
            .otherwise(mf)
        )
    cols = [F.col(f"__lpay.{c}").alias(c) for c in left.columns]
    out = out.withColumn("__m2", match)
    cols += [F.col(f"__m2.{c}").alias(f"{right_prefix}{c}") for c in rpay_cols]
    return out.select(*cols)
