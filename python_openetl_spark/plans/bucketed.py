"""Bucketed catalog tables: shuffle-free co-located joins.

The Spark analogue of the reference's btree-index replication
(`/root/reference/pyopenetl/operations.py:368-402,476-484`, SURVEY §4
P6) has three layers: partitioning (pruning), sort-within-partitions
(row-group skipping) — both on plain parquet via ``plans.pipelines.seed``
— and **bucketing**, which pre-shuffles a table by a key at write time
so that joins and aggregations on that key skip their exchange
entirely. Bucketing needs the session catalog (bucket metadata lives in
the metastore), so these helpers use ``saveAsTable`` rather than path
writes.

At 100 TB this is the difference between re-shuffling a fact table on
every join and shuffling it once at ingest: two tables bucketed by the
same key into the same bucket count sort-merge-join with ZERO Exchange
on either side (asserted in tests/test_bucketed.py against the physical
plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def seed_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str | list[str],
    num_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    ``num_buckets`` should match the join parallelism you want and MUST
    match between tables that join co-located. ``sort_by`` additionally
    sorts each bucket file, turning the downstream sort-merge join's
    sort into a no-op read. ``path`` makes the table external at that
    location instead of the session warehouse directory (use when the
    process cwd must stay clean).
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(num_buckets, *cols)
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*scols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs Catalyst plans a sort-merge join whose
    children read bucket files directly — no Exchange on either side
    (verify with ``df.explain()``: the plan has no shuffle below the
    join)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
