"""File-level data-skipping manifest: Delta/Iceberg-style min/max file
statistics for a plain-parquet table, enabling file pruning beyond
directory partition pruning.

Parquet already carries row-group min/max, but Spark must still OPEN
every file footer to use them; with millions of files at 100 TB the
footer reads alone dominate short scans. A manifest — one row per file
with per-column min/max/count — lets the planner select the file list
BEFORE any footer is touched: the same reason Delta keeps add-file
stats in the log and Iceberg keeps them in manifest files. Combined
with `ParquetTable.compact(sort_by=...)` (which makes per-file ranges
tight and disjoint), a range predicate on the sort column touches
O(result) files instead of O(table).

The reference's closest concept is rebuilding source btree indexes
after a load (/root/reference/pyopenetl/operations.py:461-471); this
is the columnar-lake equivalent: layout + statistics instead of a
secondary index structure.

Scale shape: the manifest build is one distributed scan (per-file
aggregate keyed by ``input_file_name`` — map-side combined, one row
per file out); the manifest itself is a tiny table you persist next to
the data and UPDATE incrementally on ingest (append new file rows;
drop rows for compacted-away files). Pruning collects only the
matching file PATHS (bounded by file count, never data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_manifest(
    spark: SparkSession, path: str, columns: list[str]
) -> DataFrame:
    """One row per data file: ``(file, n_rows, <c>_min, <c>_max ...)``.

    Stats are collected for ``columns`` only — manifest width is an
    explicit choice (Delta's ``dataSkippingNumIndexedCols``), because
    every indexed column adds two cells per file forever.
    """
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        df.select(F.input_file_name().alias("file"), *columns)
        .groupBy("file")
        .agg(*aggs)
    )


def update_manifest(
    spark: SparkSession,
    manifest: DataFrame,
    columns: list[str],
    *,
    added_files: list[str] | None = None,
    removed_files: list[str] | None = None,
) -> DataFrame:
    """Incrementally maintained manifest: drop the rows of
    ``removed_files`` (compacted/vacuumed away) and append stats rows
    computed by scanning ``added_files`` ONLY — maintenance cost scales
    with the delta, never the table (the add-file side of a Delta
    commit, restated). ``columns`` must match the manifest's indexed
    columns (the new rows must carry the same stat schema).

    An append + compact cycle composes as two calls: ingest ->
    ``added_files=<new files>``; compact -> ``removed_files=<old
    files>, added_files=<rewritten files>``. Equality with a from-
    scratch ``build_manifest`` is asserted in tests.

    File paths must use the same canonicalization Spark's
    ``input_file_name`` emits (``file:///...`` URIs for local paths) —
    pass paths read back from manifest rows or from a stats scan, not
    hand-built strings.

    The returned frame is LAZY: its added-file stats re-scan
    ``added_files`` on every action. Persist it (write to the manifest
    table / checkpoint) BEFORE deleting the files an update replaces —
    the same ordering a Delta commit enforces (log entry durable, then
    vacuum) — or a later action will fail on the vanished inputs.
    """
    out = manifest
    if removed_files:
        out = out.filter(~F.col("file").isin(list(removed_files)))
    if added_files:
        df = spark.read.parquet(*added_files)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in columns:
            aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
        add_rows = (
            df.select(F.input_file_name().alias("file"), *columns)
            .groupBy("file")
            .agg(*aggs)
        )
        out = out.unionByName(add_rows)
    return out


def prune_files(
    manifest: DataFrame, column: str, lo, hi
) -> list[str]:
    """File paths whose ``[min, max]`` range intersects ``[lo, hi]``.

    A file with NULL stats (all-NULL column chunk) cannot satisfy a
    range predicate and is skipped — same convention as parquet
    row-group filtering. The collect is one row per *surviving file
    path* — bounded by file count.
    """
    sel = manifest.filter(
        (F.col(f"{column}_max") >= F.lit(lo)) & (F.col(f"{column}_min") <= F.lit(hi))
    )
    return [r["file"] for r in sel.select("file").collect()]


def pruned_read(
    spark: SparkSession,
    manifest: DataFrame,
    column: str,
    lo,
    hi,
    table_path: str | None = None,
) -> DataFrame:
    """Scan ONLY the files whose stats admit ``column BETWEEN lo AND hi``,
    then re-apply the exact predicate (file stats admit false positives,
    never false negatives — the filter keeps correctness independent of
    manifest staleness in the too-many-files direction).

    Returns an empty, correctly-typed frame when no file qualifies.

    ``table_path`` doubles as the reader's ``basePath`` (r10 review):
    reading leaf files of a HIVE-PARTITIONED table without it makes
    Spark drop the partition columns from the schema — a prune on a
    partition column then fails to resolve, and any prune silently
    returns a narrower schema than the table. Always pass it for
    partitioned tables; without it, flat layouts behave as before.
    """

    def _reader():
        r = spark.read
        if table_path is not None:
            r = r.option("basePath", table_path)
        return r

    files = prune_files(manifest, column, lo, hi)
    if not files:
        # derive the schema from one manifest-listed file (cheap:
        # footer only), or from the table itself for a zero-row table
        # whose manifest is empty (no data files -> no manifest rows)
        any_file = [r["file"] for r in manifest.select("file").limit(1).collect()]
        if not any_file:
            if table_path is None:
                raise ValueError(
                    "pruned_read: empty manifest and no table_path fallback"
                )
            return spark.read.parquet(table_path).filter(F.lit(False))
        return _reader().parquet(any_file[0]).filter(F.lit(False))
    return (
        _reader().parquet(*files)
        .filter((F.col(column) >= F.lit(lo)) & (F.col(column) <= F.lit(hi)))
    )


# ---------------------------------------------------------------- blooms --
#
# min/max stats only serve RANGE-correlated layouts: a point lookup on a
# column the files are NOT sorted by (the "needle in 100 TB" shape —
# find one user_id, one doc_id, one order) matches every file's range
# and prunes nothing. Delta's bloomFilterIndex and Iceberg's
# bloom-filter column metrics solve this with a per-file Bloom filter;
# this is that device over the same manifest table: membership bits per
# file, no false negatives ever, false positives only cost extra reads
# (the exact predicate is re-applied after the scan).

#: Default Bloom geometry: 4096 bits / 3 hashes ≈ 1.2% false-positive
#: rate at 500 distinct values per file, 0.5 KB–2 KB per manifest row.
BLOOM_BITS = 4096
BLOOM_HASHES = 3


def _bloom_positions(value, bits: int, hashes: int):
    """Spark Column -> array of bit positions, using the engine's
    portable md5 scheme (functions.text.token_hash60) so a driver-side
    probe (`_bloom_positions_py`) computes the identical bits."""
    from python_openetl_spark.functions.text import token_hash60

    return F.array(
        *[
            (token_hash60(F.concat(F.lit(f"bf{j}:"), value.cast("string"))) % bits)
            .cast("int")
            for j in range(hashes)
        ]
    )


def _bloom_positions_py(value, bits: int, hashes: int) -> list[int]:
    """Driver-side twin of ``_bloom_positions`` (same md5-60 hash).
    ``value`` is rendered with ``str()`` — identical to Spark's
    string cast for integers and strings (the supported key types)."""
    import hashlib

    return [
        int(hashlib.md5(f"bf{j}:{value}".encode()).hexdigest()[:15], 16) % bits
        for j in range(hashes)
    ]


def build_bloom_manifest(
    spark: SparkSession,
    path: str,
    column: str,
    *,
    bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """One row per data file: ``(file, bloom_bits, bloom_hashes,
    <column>_bloom)`` where the bloom is the SORTED ARRAY of set bit
    positions — self-describing (geometry rides in the row, so a probe
    can't silently use mismatched constants) and readable by any
    engine, at the price of int-array instead of packed-bitset storage
    (≤ ``bits`` ints per file; 4096 bits ≈ 2 KB worst case).

    Scale shape: one distributed scan; per row only the ``hashes``
    positions are emitted, and ``collect_set`` partial-aggregates
    map-side into a per-file set bounded by ``bits`` — the shuffle
    carries at most ``files × bits`` ints regardless of row count.
    """
    df = spark.read.parquet(path)
    return (
        df.select(
            F.input_file_name().alias("file"),
            F.explode(_bloom_positions(F.col(column), bits, hashes)).alias("__pos"),
        )
        .groupBy("file")
        .agg(F.sort_array(F.collect_set("__pos")).alias(f"{column}_bloom"))
        .select(
            "file",
            F.lit(bits).alias("bloom_bits"),
            F.lit(hashes).alias("bloom_hashes"),
            f"{column}_bloom",
        )
    )


def bloom_prune_files(manifest: DataFrame, column: str, value) -> list[str]:
    """File paths whose Bloom filter admits ``column = value``.

    No false negatives: a file containing the value has all ``hashes``
    of its positions set by construction (identical hash scheme on both
    sides). NULL-bloom rows (a file whose column was all-NULL sets no
    bits → empty array) cannot admit any value. The geometry is read
    from the manifest rows themselves; a manifest mixing geometries is
    rejected. The collect is one row per surviving PATH — bounded by
    file count.
    """
    geo = manifest.select("bloom_bits", "bloom_hashes").distinct().collect()
    if not geo:
        return []  # empty manifest (zero-row table): nothing can match
    if len(geo) != 1:
        raise ValueError(
            f"bloom_prune_files: manifest has {len(geo)} distinct geometries"
        )
    bits, hashes = int(geo[0]["bloom_bits"]), int(geo[0]["bloom_hashes"])
    cond = F.lit(True)
    for p in _bloom_positions_py(value, bits, hashes):
        cond = cond & F.array_contains(F.col(f"{column}_bloom"), F.lit(p))
    return [r["file"] for r in manifest.filter(cond).select("file").collect()]


def bloom_pruned_read(
    spark: SparkSession,
    manifest: DataFrame,
    column: str,
    value,
    table_path: str | None = None,
) -> DataFrame:
    """Point-lookup scan reading ONLY the files whose Bloom filter
    admits ``column = value``, with the exact predicate re-applied
    (false positives filtered; false negatives impossible). Same
    empty-result and ``basePath`` conventions as ``pruned_read``."""

    def _reader():
        r = spark.read
        if table_path is not None:
            r = r.option("basePath", table_path)
        return r

    files = bloom_prune_files(manifest, column, value)
    if not files:
        any_file = [r["file"] for r in manifest.select("file").limit(1).collect()]
        if not any_file:
            if table_path is None:
                raise ValueError(
                    "bloom_pruned_read: empty manifest and no table_path fallback"
                )
            return spark.read.parquet(table_path).filter(F.lit(False))
        return _reader().parquet(any_file[0]).filter(F.lit(False))
    return _reader().parquet(*files).filter(F.col(column) == F.lit(value))
