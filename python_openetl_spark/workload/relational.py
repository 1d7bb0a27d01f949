"""Relational query surface (SURVEY §2.1 R1-R15 generalized + §2.3 core).

The reference's relational semantics live in SQL strings pushed to
Postgres (projection/filter/sort: `/root/reference/pyopenetl/operations.py:49,
272-281,381-392,539-540,557`) plus client-side set ops (`:562-574`).
Here each becomes a first-class declarative DataFrame query that
Catalyst optimizes: filters/projections reach the parquet scan
(PushedFilters/ReadSchema), dimension joins are broadcast, aggregates
are partial (map-side) before the shuffle.

Every query has a DuckDB oracle in ``ORACLE`` with identical output
column names (driver hash-compares after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from python_openetl_spark.workload.util import davg, dsum, t


# --- R1/R11/R12: full scan + projection --------------------------------------
def q00_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * full-table scan (reference S1, operations.py:39-51)."""
    return t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


# --- group-by aggregation with exact decimal sums -----------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter → partial agg → shuffle on
    2 low-cardinality keys. Decimal-cast sums are order-independent, so
    the result is stable under any partitioning (and matches the oracle
    bit-for-bit)."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- R5: temporal sliding-window filter (the incremental-read predicate) ------
def q02_delta_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`WHERE updated_at >= NOW() - INTERVAL` (operations.py:539-540),
    restated with a fixed anchor so the oracle agrees. Pure pushed-down
    range filter — no shuffle."""
    ev = t(spark, sf_dir, "events")
    anchor = F.lit("2024-01-28 00:00:00").cast("timestamp")
    return ev.filter(F.col("ts") >= anchor - F.expr("INTERVAL 48 HOURS")).select(
        "event_id", "user_id", "event_type", "value"
    )


# --- join + agg + topk ---------------------------------------------------------
def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue top-10: fact-fact join lineitem⋈orders (shuffle on orderkey),
    broadcast customer dim, deterministic top-k via (revenue desc, key)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    rev = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(rev, o.o_orderkey == rev.l_orderkey)
        .select(
            F.col("o_orderkey"),
            F.col("c_name"),
            F.col("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q04_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: lineitem⋈orders⋈customer⋈nation⋈region with all dims
    broadcast — a single shuffle for the big-big join, zero for dims."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# --- window functions ----------------------------------------------------------
def q05_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number over (partition by customer order by totalprice desc, key)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q06_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running decimal sum + lag per user over event time (frame:
    unbounded preceding → current row). Decimal accumulation keeps the
    running values exact and engine-independent."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(24,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.lag("event_type", 1).over(w).alias("prev_event_type"),
        F.row_number().over(w).alias("seq"),
    )


# --- set operations (R9/R10 generalized) ---------------------------------------
def q07_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: machinery-segment customers minus those with an open order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey")
    )
    open_cust = (
        o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey")).distinct()
    )
    return machinery.exceptAll(open_cust)


def q08_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation per group."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- semi/anti joins (R9 delete-propagation shape) ------------------------------
def q09_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the distributed restatement of the reference's
    client-side id-set difference (operations.py:556-574)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q10_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (sum(case when ...))."""
    ev = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(24,2)")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", dec).otherwise(F.lit(0).cast("decimal(24,2)")))
        .cast("double")
        .alias("purchase_value"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"),
        F.max(F.when(F.col("event_type") == "error", F.col("value"))).alias("max_error_value"),
    )


# --- scalar functions (R13 generalized) -----------------------------------------
def q11_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function coverage: lower/upper/substr/replace/split/length/concat."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower(F.col("p_name")).alias("name_lower"),
        F.upper(F.col("p_type")).alias("type_upper"),
        F.length(F.col("p_name")).alias("name_len"),
        F.regexp_replace(F.col("p_brand"), "[^0-9]", "").cast("int").alias("brand_num"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.substring(F.col("p_name"), 1, 3).alias("name_prefix"),
    )


def q12_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing: events per day + decimal sum. The bucket is
    emitted as an ISO string so engines with different date/pandas
    bridges compare identically."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar access on the jsonb-like `props` column
    (reference type map: jsonb, operations.py:252)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
    )


def q14_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 IN-list filter (operations.py:591-596), incl. the 1-element case."""
    li = t(spark, sf_dir, "lineitem")
    keys = [1, 2, 3, 5, 8, 13, 21, 34]
    return (
        li.filter(F.col("l_orderkey").isin(keys))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


def q15_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName + distinct over two heterogeneous key sources."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    a = c.select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b).distinct()


def q16_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregation with subtotal/grand-total rows."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", 2).alias("qty"))
    )


def q17_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING (post-aggregation filter)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_spend"))
        .filter(F.col("n_orders") >= 3)
    )


def q18_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the engine's SQL path (spark.sql)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM v_customer c
        WHERE EXISTS (
          SELECT 1 FROM v_orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        """
    )


def q19_theta_join_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: price-band classification via broadcast
    of a tiny bands table — a theta join that stays shuffle-free."""
    bands = spark.createDataFrame(
        [(0.0, 100_000.0, "low"), (100_000.0, 300_000.0, "mid"), (300_000.0, 1e12, "high")],
        "lo double, hi double, band string",
    )
    from python_openetl_spark.session import default_parallelism

    # single-file source → repartition so the nested-loop probe uses all cores
    o = t(spark, sf_dir, "orders").repartition(default_parallelism())
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
            "inner",
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total"))
    )


QUERIES = {
    "q00_full_scan": q00_full_scan,
    "q01_pricing_summary": q01_pricing_summary,
    "q02_delta_scan": q02_delta_scan,
    "q03_top_orders": q03_top_orders,
    "q04_revenue_by_nation": q04_revenue_by_nation,
    "q05_top_order_per_customer": q05_top_order_per_customer,
    "q06_running_total": q06_running_total,
    "q07_set_ops": q07_set_ops,
    "q08_distinct_counts": q08_distinct_counts,
    "q09_customers_without_orders": q09_customers_without_orders,
    "q10_conditional_agg": q10_conditional_agg,
    "q11_string_functions": q11_string_functions,
    "q12_daily_rollup": q12_daily_rollup,
    "q13_json_extract": q13_json_extract,
    "q14_in_list": q14_in_list,
    "q15_union_distinct": q15_union_distinct,
    "q16_rollup": q16_rollup,
    "q17_having": q17_having,
    "q18_exists_subquery": q18_exists_subquery,
    "q19_theta_join_ranges": q19_theta_join_ranges,
}

ORACLE = {
    "q00_full_scan": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_delta_scan": """
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-28 00:00:00' - INTERVAL 48 HOURS
    """,
    "q03_top_orders": """
        WITH rev AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT o_orderkey, c_name, revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN rev ON o_orderkey = rev.l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q04_revenue_by_nation": """
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS line_count
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "q05_top_order_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn = 1
    """,
    "q06_running_total": """
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(24,2))) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
               LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        FROM events
    """,
    "q07_set_ops": """
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        EXCEPT ALL
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "q08_distinct_counts": """
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(DISTINCT o_orderpriority) AS n_priorities,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    "q09_customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q10_conditional_agg": """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(24,2))
                             ELSE CAST(0 AS DECIMAL(24,2)) END) AS DOUBLE) AS purchase_value,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
               MAX(CASE WHEN event_type = 'error' THEN value END) AS max_error_value
        FROM events GROUP BY user_id
    """,
    "q11_string_functions": """
        SELECT p_partkey,
               LOWER(p_name) AS name_lower,
               UPPER(p_type) AS type_upper,
               LENGTH(p_name) AS name_len,
               CAST(REGEXP_REPLACE(p_brand, '[^0-9]', '', 'g') AS INT) AS brand_num,
               STR_SPLIT(p_name, ' ')[1] AS first_word,
               p_brand || '|' || p_type AS brand_type,
               SUBSTRING(p_name, 1, 3) AS name_prefix
        FROM part
    """,
    "q12_daily_rollup": """
        SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(24,2))) AS DOUBLE) AS total_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1
    """,
    "q13_json_extract": """
        SELECT event_type,
               SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_high
        FROM events GROUP BY event_type
    """,
    "q14_in_list": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem WHERE l_orderkey IN (1,2,3,5,8,13,21,34)
    """,
    "q15_union_distinct": """
        SELECT DISTINCT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey FROM supplier
        )
    """,
    "q16_rollup": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(24,2))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q17_having": """
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    """,
    "q18_exists_subquery": """
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
    """,
    "q19_theta_join_ranges": """
        WITH bands(lo, hi, band) AS (
          VALUES (0.0, 100000.0, 'low'), (100000.0, 300000.0, 'mid'), (300000.0, 1e12, 'high')
        )
        SELECT band, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total
        FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
    """,
}
