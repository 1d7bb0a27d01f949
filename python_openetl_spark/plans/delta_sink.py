"""Gated Delta Lake sink: transactional MERGE / delete propagation
(r10 verdict #5, SURVEY §7 M2 "use Delta MERGE INTO only if available").

The engine's native sink is the atomic staged-swap parquet table
(``plans.pipelines`` / ``plans.txn``) — correct under a SINGLE writer.
The reference's ON CONFLICT upsert
(/root/reference/pyopenetl/operations.py:713-724) is concurrency-safe
because Postgres serializes it; the open-table-format answer on Spark
is Delta Lake's optimistic-concurrency ``MERGE INTO`` /
``whenNotMatchedBySourceDelete``. This module routes the same
``upsert_sync`` semantics through Delta WHEN the ``delta-spark``
package and its jars are present, mirroring the BigQuery gating
pattern (``sources/registry.py``): registered, probed by ``doctor()``,
and failing with the production coordinate — never a hard dependency,
and the parquet path is untouched.

Scale note: Delta MERGE shuffles the source on the join keys against
the matched target files only (file-pruned by min/max stats); the
semantics below are the exact ones ``operators/merge.py`` implements
for plain parquet, so a green m09/m10 oracle run through this path
certifies parity (the skip-gated test in tests/test_delta_sink.py
does exactly that when the package exists).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Production config (Spark 4 = Scala 2.13). Delta also needs the two
#: session extensions below — new sessions only; an existing session
#: cannot retrofit the SQL extension.
DELTA_PACKAGE_COORDINATE = "io.delta:delta-spark_2.13:4.0.0"
DELTA_SESSION_CONF = {
    "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
    "spark.sql.catalog.spark_catalog": (
        "org.apache.spark.sql.delta.catalog.DeltaCatalog"
    ),
}


class DeltaGateError(RuntimeError):
    """Raised when the Delta path is requested but not available."""


def delta_available(spark: SparkSession | None = None) -> bool:
    """True iff the ``delta`` python package imports AND (when a
    session is given) the JVM classpath carries the Delta data source.
    Both halves are required: the pip package without the jars fails at
    ``DeltaTable.forPath``; the jars without the package fail at
    ``import delta``."""
    try:
        import delta  # noqa: F401
    except Exception:
        return False
    if spark is None:
        return True
    try:
        spark.sparkContext._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.spark.sql.delta.sources.DeltaDataSource", False, False
        )
        return True
    except Exception:
        return False


def require_delta(spark: SparkSession | None = None) -> None:
    if not delta_available(spark):
        raise DeltaGateError(
            "Delta Lake path requested but delta-spark is not available. "
            f"Activate with pip install delta-spark, spark.jars.packages="
            f"{DELTA_PACKAGE_COORDINATE}, and session confs "
            f"{DELTA_SESSION_CONF} (new session required)."
        )


def merge_condition(pk: "str | list[str]") -> str:
    """The MERGE ON clause for a pk (pure — pinned by tests without the
    package present): null-safe equality per key column, matching
    ``operators.merge.merge_upsert``'s join semantics."""
    keys = [pk] if isinstance(pk, str) else list(pk)
    return " AND ".join(f"t.{k} <=> s.{k}" for k in keys)


def seed_delta(df: DataFrame, dest_path: str) -> None:
    """m09's seed verb on Delta: drop-and-replace the table content in
    one transactional overwrite (Delta's commit protocol supplies the
    atomicity the parquet path gets from the staged swap)."""
    require_delta(df.sparkSession)
    df.write.format("delta").mode("overwrite").option(
        "overwriteSchema", "true"
    ).save(dest_path)


def merge_upsert_delta(
    spark: SparkSession,
    dest_path: str,
    delta_df: DataFrame,
    pk: "str | list[str]",
    order_col: str | None = None,
) -> None:
    """R8 on Delta: ``MERGE INTO`` with updateAll/insertAll — the exact
    ON CONFLICT DO UPDATE semantics of ``operators.merge.merge_upsert``,
    executed under Delta's optimistic concurrency control (safe with
    concurrent writers, which the staged-swap parquet path is not).
    ``order_col`` pre-dedupes the delta latest-wins, as MERGE requires
    a pk-unique source."""
    require_delta(spark)
    from delta.tables import DeltaTable

    from python_openetl_spark.operators.merge import dedupe_latest

    keys = [pk] if isinstance(pk, str) else list(pk)
    if order_col is not None:
        delta_df = dedupe_latest(delta_df, keys, order_col)
    (
        DeltaTable.forPath(spark, dest_path)
        .alias("t")
        .merge(delta_df.alias("s"), merge_condition(pk))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def propagate_deletes_delta(
    spark: SparkSession,
    dest_path: str,
    source: DataFrame,
    pk: "str | list[str]",
) -> int:
    """R9 on Delta: rows whose pk vanished from the source are deleted
    via ``whenNotMatchedBySourceDelete`` — one transactional MERGE, no
    read-modify-write of the whole table. Returns the deleted count
    (computed as an anti-join BEFORE the merge; Delta's own metrics
    live in the table history, but the reference's report wants the
    number synchronously)."""
    require_delta(spark)
    from delta.tables import DeltaTable

    keys = [pk] if isinstance(pk, str) else list(pk)
    tbl = DeltaTable.forPath(spark, dest_path)
    # the count must use the SAME null-safe key equality as the MERGE
    # condition below — a plain anti-join never matches NULL keys, so a
    # NULL-pk row still present in the source would be counted as
    # deleted while whenNotMatchedBySourceDelete (<=>) keeps it
    src_keys = source.select(
        *[F.col(k).alias(f"__s_{k}") for k in keys]
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__s_{k}"))
        cond = c if cond is None else (cond & c)
    n = (
        tbl.toDF()
        .select(*keys)
        .join(src_keys, on=cond, how="left_anti")
        .count()
    )
    if n:
        (
            tbl.alias("t")
            .merge(source.select(*keys).distinct().alias("s"), merge_condition(pk))
            .whenNotMatchedBySourceDelete()
            .execute()
        )
    return n


def upsert_sync_delta(
    spark: SparkSession,
    source: DataFrame,
    dest_path: str,
    *,
    pk: str = "id",
    ts_col: str = "updated_at",
    anchor=None,
    data_interval_hours: int = 1,
    propagate: bool = True,
):
    """C2 through the Delta path: delta read → MERGE INTO → delete
    propagation → metrics, the same contract (and return type) as
    ``plans.pipelines.upsert_sync``. Routed automatically by
    ``upsert_sync(..., table_format="delta")``."""
    from python_openetl_spark.operators.merge import temporal_delta
    from python_openetl_spark.plans.pipelines import SyncMetrics

    require_delta(spark)
    t0 = time.time()
    if anchor is None:
        anchor = time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())
    delta_df = temporal_delta(source, ts_col, anchor, data_interval_hours)
    n_delta = delta_df.count()
    if n_delta:
        merge_upsert_delta(spark, dest_path, delta_df, pk, order_col=ts_col)
    rows_deleted = 0
    if propagate:
        rows_deleted = propagate_deletes_delta(spark, dest_path, source, pk)
    return SyncMetrics(
        rows_added=n_delta,
        rows_deleted=rows_deleted,
        execution_duration=round(time.time() - t0, 3),
        execution_date=time.strftime("%Y-%m-%d"),
    )
