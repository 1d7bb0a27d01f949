"""Incremental-maintenance operators: MERGE upsert, delete propagation,
conflict-checked append, snapshot seed.

Reference semantics being reproduced (Spark-first, not translated):

- **Upsert** (`/root/reference/pyopenetl/operations.py:688-730`): staging
  table + ``INSERT ... ON CONFLICT (pk) DO UPDATE SET <all non-pk cols>``.
  Here: dedup the delta by pk (Postgres applies conflicting rows in
  statement order — we keep the latest explicitly), left-anti join the
  target against the delta, union the delta back. One shuffle on the pk;
  AQE broadcasts the anti-join when the delta is small.
- **Delete propagation** (`operations.py:552-599`): the reference ships
  *every id of both tables to the client* and diffs Python sets — its
  scalability cliff. Here it is a distributed left-anti join on the key,
  which scales to any table size and lets Catalyst pick
  broadcast/shuffle-hash/sort-merge per AQE statistics.
- **Conflict-checked insert** (`safe_insert`, `operations.py:751-791`):
  raises on pk conflict instead of upserting → left-semi join to detect
  conflicts, then append.
- **Seed** (`seed_table`, `operations.py:404-474`): drop + chunked COPY
  + deferred index build → a single declarative overwrite write; the
  "index replication" step (`operations.py:476-484`) maps to write-layout
  options (partitioning/bucketing/sorting), see :func:`snapshot_seed`.

All functions are pure DataFrame → DataFrame (no writes); the
write/commit side lives in plans.pipelines so these compose with any
sink (parquet dir, catalog table, foreachBatch streaming sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class PrimaryKeyConflict(Exception):
    """Raised by safe_append when incoming rows collide with existing pks
    (parity with the reference's IntegrityError re-raise,
    /root/reference/pyopenetl/operations.py:786-789)."""


def dedupe_latest(delta: DataFrame, pk: str | list[str], order_col: str) -> DataFrame:
    """Keep the latest row per pk, ordered by ``order_col`` descending.

    Postgres ON CONFLICT applies duplicate-pk delta rows sequentially so
    the last write wins; a set-oriented MERGE must make that explicit
    (SURVEY §7 hard-parts register). ``order_col`` ties are broken by
    the remaining columns (name-sorted, descending) so the winner is
    content-determined — stable across partitionings, retries, and
    engines — never by arrival order.
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    others = sorted(c for c in delta.columns if c not in keys and c != order_col)
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc() for c in others]
    )
    return (
        delta.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    delta: DataFrame,
    pk: str | list[str],
    order_col: str | None = None,
    *,
    evolve_schema: bool = False,
) -> DataFrame:
    """MERGE: whenMatched → replace all non-pk columns, whenNotMatched →
    insert (exact ON CONFLICT DO UPDATE semantics,
    /root/reference/pyopenetl/operations.py:713-724).

    Implementation: ``target ANTI⋈ delta ∪ delta``. The anti-join
    shuffles both sides on the pk once; with a small delta AQE converts
    it to a broadcast anti-join, so cost ≈ one pass over the target —
    the same asymptotics as an index-assisted MERGE, but distributed.

    ``evolve_schema``: Delta/Iceberg ``mergeSchema`` semantics on plain
    DataFrames — delta-only columns appear as NULL on untouched target
    rows (the add-a-column deploy without a backfill rewrite), and
    target-only columns are PRESERVED on matched rows (updateAll only
    updates columns the source actually has; the extra join that
    fetches them shuffles only ``keys + target_only`` columns, and AQE
    broadcasts the small side). Off by default: silent schema drift is
    usually a bug, so the strict path projects the delta onto the
    target's columns.
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    if order_col is not None:
        delta = dedupe_latest(delta, keys, order_col)
    if evolve_schema:
        # incompatible type changes fail HERE with a clear message, not
        # at execution time as an ANSI cast error deep in the union
        # (Spark resolves long|string to bigint and only explodes when
        # a non-numeric string flows through). Numeric widening
        # (int->long->double, decimal->double) is allowed — Spark's
        # least-common-type union handles it, same as Delta mergeSchema.
        from pyspark.sql.types import NumericType

        delta_fields = {f.name: f.dataType for f in delta.schema.fields}
        for f in target.schema.fields:
            other = delta_fields.get(f.name)
            if other is not None and other != f.dataType and not (
                isinstance(f.dataType, NumericType) and isinstance(other, NumericType)
            ):
                raise ValueError(
                    f"merge_upsert(evolve_schema=True): column {f.name!r} has "
                    f"incompatible types target={f.dataType.simpleString()} "
                    f"delta={other.simpleString()}"
                )
        kept = target.join(delta.select(*keys), on=keys, how="left_anti")
        target_only = [c for c in target.columns if c not in delta.columns]
        if target_only:
            delta = delta.join(
                target.select(*keys, *target_only), on=keys, how="left"
            )
        return kept.unionByName(delta, allowMissingColumns=True)
    delta = delta.select(*target.columns)  # positional/naming hygiene
    return target.join(delta, on=keys, how="left_anti").unionByName(delta)


def propagate_deletes(
    target: DataFrame, source: DataFrame, pk: str | list[str]
) -> tuple[DataFrame, DataFrame]:
    """Rows of ``target`` whose pk vanished from ``source`` are deleted.

    Returns ``(kept, deleted_keys)``. Distributed restatement of the
    reference's client-side set difference + DELETE WHERE id IN (...)
    (/root/reference/pyopenetl/operations.py:552-599, including the R6
    IN-list — which an anti-join subsumes at any cardinality).
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    source_keys = source.select(*keys)
    deleted_keys = target.select(*keys).join(source_keys, on=keys, how="left_anti")
    kept = target.join(source_keys, on=keys, how="left_semi")
    return kept, deleted_keys


def conflicting_keys(target: DataFrame, rows: DataFrame, pk: str | list[str]) -> DataFrame:
    """Pks of ``rows`` already present in ``target`` (left-semi join)."""
    keys = [pk] if isinstance(pk, str) else list(pk)
    return rows.select(*keys).join(target.select(*keys), on=keys, how="left_semi").distinct()


def safe_append(target: DataFrame, rows: DataFrame, pk: str | list[str]) -> DataFrame:
    """Append with pk-conflict detection: raise PrimaryKeyConflict if any
    incoming pk exists (parity with safe_insert's IntegrityError,
    /root/reference/pyopenetl/operations.py:751-791); else target ∪ rows.

    The conflict probe collects only the *conflicting keys* (bounded by
    the incoming batch size), never the tables.
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    conflicts = conflicting_keys(target, rows, keys).limit(21).collect()
    if conflicts:
        sample = [tuple(r) for r in conflicts[:20]]
        raise PrimaryKeyConflict(f"pk conflict on {keys}: {sample}" + (" ..." if len(conflicts) > 20 else ""))
    return target.unionByName(rows.select(*target.columns))


def snapshot_diff(
    old: DataFrame, new: DataFrame, pk: str | list[str], *, include_old: bool = False
) -> DataFrame:
    """Change-data-capture feed from two snapshots: the new snapshot's
    rows tagged ``change_type`` ∈ {I, U, D} (inserted / updated /
    deleted keys; unchanged rows are omitted). Deleted keys carry the
    OLD row's values. With ``include_old`` each value column also ships
    its before-image as ``old_<col>`` (NULL on I rows) — the retraction
    half that downstream incremental aggregate maintenance
    (``rollup.apply_cdc_rollup``) needs for U/D rows.

    This is the reference's whole update pipeline (delta upsert +
    delete propagation, /root/reference/pyopenetl/operations.py:515-599)
    inverted into a *produced* artifact: feed the I/U rows to
    merge_upsert and the D keys to propagate_deletes, or publish the
    feed itself (the Debezium-style contract). One full-outer join on
    the pk — a single co-partitioned shuffle of both snapshots; change
    detection is a null-safe column compare, no second pass.
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    vals = [c for c in new.columns if c not in keys]
    differs = F.lit(False)
    for c in vals:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__old_{c}"))
    # explicit presence markers: an all-NULL value row is still present
    o_marked = old.select(*keys, F.lit(True).alias("__in_old"),
                          *[F.col(c).alias(f"__old_{c}") for c in vals])
    n_marked = new.select(*keys, F.lit(True).alias("__in_new"), *vals)
    j = n_marked.join(o_marked, on=keys, how="full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(differs, F.lit("U"))
    )
    out_vals = [
        F.when(F.col("__in_new").isNull(), F.col(f"__old_{c}")).otherwise(F.col(c)).alias(c)
        for c in vals
    ]
    old_vals = (
        [
            F.when(F.col("__in_old").isNotNull(), F.col(f"__old_{c}")).alias(f"old_{c}")
            for c in vals
        ]
        if include_old
        else []
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, *out_vals, *old_vals, "change_type")
    )


def apply_cdc(snapshot: DataFrame, feed: DataFrame, pk: str | list[str]) -> DataFrame:
    """Apply an I/U/D change feed (the :func:`snapshot_diff` contract)
    to a snapshot: delete the D keys, MERGE the I/U rows. Inverse of
    snapshot_diff — ``apply_cdc(old, snapshot_diff(old, new), pk)``
    reconstructs ``new`` exactly (round-trip test in
    tests/test_scd_rollup.py).

    Two anti/merge joins on the pk against the feed — typically a day's
    changes, far smaller than the snapshot, so AQE plans both as
    broadcast joins and the snapshot itself is never shuffled (no forced
    hint: a backfill-sized feed degrades gracefully to a shuffle join).
    """
    keys = [pk] if isinstance(pk, str) else list(pk)
    deletes = feed.filter(F.col("change_type") == "D").select(*keys)
    upserts = feed.filter(F.col("change_type") != "D").drop("change_type")
    kept = snapshot.join(deletes, on=keys, how="left_anti")
    return merge_upsert(kept, upserts, pk)


def temporal_delta(df: DataFrame, ts_col: str, anchor, hours: int) -> DataFrame:
    """R5 incremental-read predicate: rows touched in the last N hours
    (/root/reference/pyopenetl/operations.py:539-540). ``anchor`` is an
    explicit timestamp (the reference's NOW()) so runs are reproducible;
    the filter pushes down to the scan."""
    anchor_col = F.lit(anchor).cast("timestamp")
    return df.filter(F.col(ts_col) >= anchor_col - F.expr(f"INTERVAL {int(hours)} HOURS"))
