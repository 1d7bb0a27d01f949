"""Round-5 relational additions, batch 2: time-series regularization.

- q63: per-nation daily order series densified onto its date spine
  (operators/timeseries.py ``gap_fill``) — zero-fill for counts and
  revenue, forward-fill for the price level. The oracle builds the
  same spine with DuckDB's scalar ``generate_series`` and fills with
  ``last_value(... IGNORE NULLS)``.

Registered after ``llm9`` in ``_MODULES``; locally oracle-gated now,
rotates into ``_WINDOW_R6``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_openetl_spark.workload.util import davg, dsum, t


def q63_gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_openetl_spark.operators.timeseries import gap_fill

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation_key"),
            F.to_date("o_orderdate").alias("obs_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            dsum("o_totalprice").alias("revenue"),
            davg("o_totalprice").alias("avg_price"),
        )
    )
    filled = gap_fill(
        daily,
        ["nation_key"],
        "obs_day",
        zero_cols=["order_cnt", "revenue"],
        ffill_cols=["avg_price"],
    )
    return filled.select(
        "nation_key",
        F.date_format("obs_day", "yyyy-MM-dd").alias("obs_day"),
        "order_cnt",
        "revenue",
        F.col("avg_price").alias("avg_price_ffill"),
    )


def q64_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (operators/asof.py): each purchase
    matched to the same user's closest click in EITHER direction within
    a 30-minute tolerance; exact-distance ties prefer the backward
    match (pandas ``merge_asof(direction='nearest')`` parity, pinned in
    tests/test_asof.py). One shuffle, two per-key sorts."""
    from python_openetl_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), "user_id", "ts", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        seq_col="c_id",
        direction="nearest",
        tolerance=1800,
    )
    return out.select(
        "p_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.col("asof_c_id").alias("c_id"),
        F.unix_micros("asof_ts").alias("click_us"),
        F.col("asof_value").alias("click_value"),
    )


QUERIES = {
    "q63_gap_fill_daily_revenue": q63_gap_fill_daily_revenue,
    "q64_asof_nearest": q64_asof_nearest,
}

ORACLE = {
    "q63_gap_fill_daily_revenue": """
        WITH daily AS (
          SELECT c_nationkey AS nation_key, o_orderdate::DATE AS obs_day,
                 COUNT(*) AS order_cnt,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS avg_price
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2
        ),
        bounds AS (
          SELECT nation_key, MIN(obs_day) AS dmin, MAX(obs_day) AS dmax
          FROM daily GROUP BY 1
        ),
        spine AS (
          SELECT nation_key,
                 unnest(generate_series(dmin, dmax, INTERVAL 1 DAY))::DATE AS obs_day
          FROM bounds
        ),
        j AS (
          SELECT s.nation_key, s.obs_day,
                 COALESCE(d.order_cnt, 0) AS order_cnt,
                 COALESCE(d.revenue, 0.0) AS revenue,
                 d.avg_price
          FROM spine s LEFT JOIN daily d USING (nation_key, obs_day)
        )
        SELECT nation_key, STRFTIME(obs_day, '%Y-%m-%d') AS obs_day,
               order_cnt, revenue,
               last_value(avg_price IGNORE NULLS) OVER (
                 PARTITION BY nation_key ORDER BY obs_day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS avg_price_ffill
        FROM j
    """,
    # candidate semantics mirror the operator: the latest click <= the
    # purchase IS the nearest backward candidate (and symmetrically
    # forward), so a bounded left join + argmin(gap) states "nearest
    # within tolerance"; ties prefer backward, then the greatest c_id
    # (the operator's seq_col) among equal-timestamp clicks
    "q64_asof_nearest": """
        WITH p AS (SELECT event_id AS p_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT event_id AS c_id, user_id, ts, value FROM events
              WHERE event_type = 'click'),
        cand AS (
          SELECT p.p_id, p.user_id, epoch_us(p.ts) AS purchase_us,
                 c.c_id, epoch_us(c.ts) AS click_us, c.value AS click_value,
                 abs(epoch_us(p.ts) - epoch_us(c.ts)) AS gap,
                 CASE WHEN epoch_us(c.ts) <= epoch_us(p.ts) THEN 0 ELSE 1 END AS fwd
          FROM p LEFT JOIN c
            ON p.user_id = c.user_id
           AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 1800000000
        )
        SELECT p_id, user_id, purchase_us, c_id, click_us, click_value FROM (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY p_id
                   ORDER BY gap NULLS LAST, fwd, c_id DESC) AS rn
          FROM cand
        ) WHERE rn = 1
    """,
}
