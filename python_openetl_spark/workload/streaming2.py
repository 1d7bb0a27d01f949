"""Round-2 streaming queries: the join paths (streaming/joins.py),
oracle-checked through their batch equivalents the same way s01–s04
check the window operators — ``enrich_with_static`` and
``interval_join`` run the identical plan on batch input (``withWatermark``
is a no-op there), so DuckDB states the semantics; the genuinely
streaming behaviors (state eviction, late-data drop) are covered by the
real micro-batch replays in tests/test_streaming.py.

Registered last in ``_MODULES`` (window-neutral this round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.streaming.joins import (
    enrich_with_static,
    interval_join,
    interval_join_outer,
)
from python_openetl_spark.operators.materialize import pin
from python_openetl_spark.workload.util import corpus_key, nonempty, stream_state_partitions, t


def s05_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment: events joined to the customer
    dimension per micro-batch (batch-equivalent here). The dim side
    broadcasts — no shuffle of the stream, no state."""
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    dim = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_mktsegment"
    )
    return enrich_with_static(ev, dim, "user_id")


def s06_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded stream-stream interval join, batch twin:
    each purchase matched to the same user's clicks in the preceding
    hour. State in the streaming run is bounded by watermark + the
    two-sided time range; the batch plan is the same join condition."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", F.col("ts").alias("r_ts")
    )
    out = interval_join(
        purchases, clicks, by="user_id", left_ts="ts", right_ts="r_ts", max_delay="1 hour"
    )
    return out.select(
        "p_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "c_id",
        F.unix_micros("r_ts").alias("click_us"),
    )


def s07_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer stream-stream interval join, batch twin: EVERY
    purchase emitted exactly once, with NULL click columns when no
    click preceded it within the hour. The genuinely-streaming part —
    NULL emission deferred until the watermark proves no match can
    still arrive — is exercised by the sentinel-flushed replay in
    tests/test_streaming.py; the batch plan is a plain left join on
    the same condition, which is what DuckDB states."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", F.col("ts").alias("r_ts")
    )
    out = interval_join_outer(
        purchases, clicks, by="user_id", left_ts="ts", right_ts="r_ts", max_delay="1 hour"
    )
    return out.select(
        "p_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "c_id",
        F.unix_micros("r_ts").alias("click_us"),
    )


def s08_watermark_scoped_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``dropDuplicatesWithinWatermark`` (streaming/
    dedup.py): duplicates arriving within the 10-minute state-retention
    window are dropped; a re-arrival after the watermark has evicted
    the key's state is kept as a new first arrival.

    The planted stream re-emits every event at +2 minutes (inside the
    window → dropped) and at +40 minutes (state evicted → kept). With
    at most one duplicate inside any 10-minute horizon, the
    anchor-based streaming semantics and this lag-gap sessionization
    coincide exactly (a chain of duplicates each <10 min apart but
    spanning >10 min total would diverge — the true state-based
    behavior for that shape is exercised by the micro-batch replay in
    tests/test_streaming.py)."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select("event_id", "ts", "value")
    near = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 MINUTES")).withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    far = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 40 MINUTES")).withColumn(
        "value", F.col("value") + F.lit(2000.0)
    )
    stream = ev.unionByName(near).unionByName(far)
    w = Window.partitionBy("event_id").orderBy("ts", "value")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = stream.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "sid",
        F.sum(
            F.when(
                F.col("prev_ts").isNull()
                | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 10 MINUTES")),
                1,
            ).otherwise(0)
        ).over(run),
    )
    ws = Window.partitionBy("event_id", "sid").orderBy("ts", "value")
    return (
        sess.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") == 1)
        .select("event_id", F.unix_micros("ts").alias("ts_us"), "value")
    )


def s09_chained_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two CHAINED stateful aggregations in one query
    (streaming/windows.py chained_window_agg): per-(hour, user) counts,
    then a per-hour distribution over those counts — Spark's
    multiple-stateful-operators pipeline (3.4+), where the first agg's
    window column feeds the second groupBy so the watermark threads
    through both stages. Batch twin here; the streaming run (append
    mode, in-order replay, watermark-gated emission) is exercised in
    tests/test_streaming.py. avg is floor-scaled, not ROUNDed: the
    ratio doubles are bit-identical across engines but decimal
    rounding of a tie is not."""
    from python_openetl_spark.streaming.windows import chained_window_agg

    out = chained_window_agg(t(spark, sf_dir, "events"))
    return out.select(
        "window_start",
        "n_active_keys",
        "max_events_per_key",
        "total_value",
        (F.floor(F.col("avg_events_per_key") * 1_000_000.0) / 1_000_000.0).alias(
            "avg_events_per_key"
        ),
    )


QUERIES = {
    "s05_stream_static_enrichment": s05_stream_static_enrichment,
    "s06_interval_join": s06_interval_join,
    "s07_outer_interval_join": s07_outer_interval_join,
    "s08_watermark_scoped_dedup": s08_watermark_scoped_dedup,
    "s09_chained_window_stats": s09_chained_window_stats,
}

ORACLE = {
    "s09_chained_window_stats": """
        WITH per_key AS (
          SELECT date_trunc('hour', ts) AS w, user_id,
                 COUNT(*) AS n_events,
                 SUM(CAST(value AS DECIMAL(24,2))) AS key_value
          FROM events GROUP BY 1, 2
        )
        SELECT epoch_us(w) // 1000000 AS window_start,
               COUNT(*) AS n_active_keys,
               MAX(n_events) AS max_events_per_key,
               CAST(SUM(key_value) AS DOUBLE) AS total_value,
               FLOOR((SUM(n_events)::DOUBLE / COUNT(*)) * 1000000) / 1000000
                 AS avg_events_per_key
        FROM per_key GROUP BY 1
    """,
    "s05_stream_static_enrichment": """
        SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_name, c.c_mktsegment
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    # the range compare runs on epoch MICROseconds on both engines: the
    # parquet timestamps are nanos, Spark's session truncates to micros,
    # so a raw nano-domain compare in DuckDB could flip boundary rows
    "s06_interval_join": """
        SELECT p.event_id AS p_id, p.user_id,
               epoch_us(p.ts) AS purchase_us,
               c.event_id AS c_id,
               epoch_us(c.ts) AS click_us
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND epoch_us(c.ts) <= epoch_us(p.ts)
         AND epoch_us(c.ts) > epoch_us(p.ts) - 3600000000
    """,
    "s07_outer_interval_join": """
        SELECT p.event_id AS p_id, p.user_id,
               epoch_us(p.ts) AS purchase_us,
               c.event_id AS c_id,
               epoch_us(c.ts) AS click_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND epoch_us(c.ts) <= epoch_us(p.ts)
         AND epoch_us(c.ts) > epoch_us(p.ts) - 3600000000
    """,
    "s08_watermark_scoped_dedup": """
        WITH ev AS (SELECT event_id, ts, value FROM events),
        stream AS (
          SELECT event_id, ts, value FROM ev
          UNION ALL
          SELECT event_id, ts + INTERVAL 2 MINUTE, value + 1000.0 FROM ev
          UNION ALL
          SELECT event_id, ts + INTERVAL 40 MINUTE, value + 2000.0 FROM ev
        ),
        lagged AS (
          SELECT *, lag(ts) OVER (PARTITION BY event_id ORDER BY ts, value) AS prev_ts
          FROM stream
        ),
        sess AS (
          SELECT *, SUM(CASE WHEN prev_ts IS NULL
                              OR ts > prev_ts + INTERVAL 10 MINUTE
                             THEN 1 ELSE 0 END) OVER (
                   PARTITION BY event_id ORDER BY ts, value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM lagged
        )
        SELECT event_id, epoch_us(ts) AS ts_us, value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id, sid ORDER BY ts, value) AS rn
          FROM sess
        ) WHERE rn = 1
    """,
}


def s10_stream_versioned_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert into the versioned store — the batch twin
    of streaming/sinks.py VersionedCdcSink (the real replayed-stream
    run is tests/test_streaming.py): three micro-batches (base /
    updates on every 3rd key / inserts echoing every 5th key at +1M)
    merge-commit one immutable version each, then batch 1 REPLAYS —
    foreachBatch is at-least-once — and must no-op because its
    idempotence token rides in the same atomic pointer commit (the
    Delta txnAppId pattern). The report proves exactly-once end to
    end: version count unmoved by the replay, final row count and an
    exact decimal value checksum over the live table."""
    import tempfile

    from python_openetl_spark.plans.versioned import VersionedTable
    from python_openetl_spark.streaming.sinks import VersionedCdcSink

    # the base micro-batch feeds b1, b2 and two sink calls — pin the
    # aggregate once instead of recomputing it per derived batch (r14)
    b0 = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("event_id").alias("id"))
        .agg(
            F.max("ts").alias("ts"),
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double").alias("v"),
        )
    )
    b0 = pin(b0)  # delta-sized rollup, consumed by 3 derived batches
    b1 = b0.filter(F.col("id") % 3 == 0).select(
        "id",
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("ts"),
        (F.col("v") + F.lit(1000.0)).alias("v"),
    )
    b2 = b0.filter(F.col("id") % 5 == 0).select(
        (F.col("id") + 1_000_000).alias("id"), "ts", "v"
    )
    path = tempfile.mkdtemp(prefix="poe_s10_") + "/vcdc"
    sink = VersionedCdcSink(path, pk="id", order_col="ts")
    sink(b0, batch_id=0)
    sink(b1, batch_id=1)
    sink(b2, batch_id=2)
    sink(b1, batch_id=1)  # at-least-once replay: must not commit v4
    vt = VersionedTable(path)
    n_versions = len(vt.versions())
    return vt.read(spark).agg(
        F.lit(n_versions).cast("int").alias("n_versions"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("v").cast("decimal(24,6)")).cast("double").alias("value_checksum"),
    )


QUERIES["s10_stream_versioned_cdc"] = s10_stream_versioned_cdc

ORACLE["s10_stream_versioned_cdc"] = """
    WITH b0 AS (
      SELECT event_id AS id,
             CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS v
      FROM events GROUP BY event_id
    ),
    fin AS (
      SELECT id, CASE WHEN id % 3 = 0 THEN v + 1000.0 ELSE v END AS v FROM b0
      UNION ALL
      SELECT id + 1000000, v FROM b0 WHERE id % 5 = 0
    )
    SELECT 3 AS n_versions, COUNT(*)::BIGINT AS n_rows,
           CAST(SUM(CAST(v AS DECIMAL(24,6))) AS DOUBLE) AS value_checksum
    FROM fin
"""


#: staged replay dirs per sf_dir — the s13/s14/s15 convention: the
#: replay INPUT is a deterministic function of the fixture, so staging
#: it once per session is fixture setup, not result caching (each run
#: still replays the full stream through the state machine)
_S11_STAGED: dict = {}


def s11_stateful_running_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (streaming/stateful.py
    running_user_totals, applyInPandasWithState) executed as a REAL
    replayed stream inside the driver row: events re-arrive as three
    out-of-order micro-batches through a file-source stream, the
    per-user state machine accumulates across batches in the state
    store, and the row reports each user's FINAL state. Only the
    order-insensitive state fields are compared (event count,
    last-event timestamp — exact integers on both engines); the float
    running total is asserted with tolerance in
    tests/test_streaming.py, because a cross-batch float accumulation
    order is kernel-defined, not SQL-defined."""
    import tempfile

    from pyspark.sql import Window

    from python_openetl_spark.streaming.sources import (
        read_file_stream,
        stage_replay_dir,
    )
    from python_openetl_spark.streaming.stateful import running_user_totals

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    if not nonempty(sf_dir, "events"):
        return spark.createDataFrame(
            [], "user_id long, n_events long, last_ts_us long"
        )
    path = _S11_STAGED.get(corpus_key(sf_dir))
    if path is None:
        tmp = tempfile.mkdtemp(prefix="poe_s11_")
        path = stage_replay_dir(ev, tmp + "/replay", chunks=3)
        _S11_STAGED[corpus_key(sf_dir)] = path
    stream = read_file_stream(spark, path, ev.schema)
    name = "poe_s11_state"
    # state-partition sizing derived from the staged replay volume
    # (python_state: applyInPandasWithState pays a Python-worker
    # round-trip per partition-batch, so it targets smaller
    # rows/partition than the JVM stateful rows); pinned around the
    # stream and restored after
    from python_openetl_spark.streaming.sources import replay_rows_per_batch

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(
            stream_state_partitions(
                replay_rows_per_batch(path), python_state=True
            )
        ),
    )
    try:
        q = (
            running_user_totals(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            # fresh checkpoint per invocation: a reused one would resume
            # a finished stream and emit nothing
            .option("checkpointLocation", tempfile.mkdtemp(prefix="poe_s11_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        # a timed-out trigger would leave the memory table partial — fail
        # loudly instead of returning a truncated final state (s12 rule)
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("s11: replayed stream did not finish within 300s")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    emitted = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        emitted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.unix_micros("last_ts").alias("last_ts_us"),
        )
    )


QUERIES["s11_stateful_running_state"] = s11_stateful_running_state

ORACLE["s11_stateful_running_state"] = """
    SELECT user_id, COUNT(*) AS n_events,
           epoch_us(MAX(ts)) AS last_ts_us
    FROM events GROUP BY user_id
"""
