"""Round-10 relational additions.

- q81: 4-step strict-sequence funnel with per-transition time bounds —
  the parameterized ``operators/funnel.py match_sequence`` exercised
  beyond q80's fixed 3-step shape (r9 verdict #8): arbitrary step
  predicates (the last step also requires a non-NULL ``value``) and a
  DIFFERENT gap bound per transition, returning match-level rows
  rather than a per-user rollup.

Reference parity: tmccall8829/python-openetl has no event-pattern
operator (row-level ETL only, openetl/etl.py); this family is part of
the beyond-reference analytics surface (SURVEY.md §2).

Registered after ``llm12`` in ``_MODULES``; round-10 post-window,
rotates into ``_WINDOW_R11``.

Round-11 additions (post-window, rotate into ``_WINDOW_R12``):

- q83: the same 4-step funnel under RELAXED ("eventually-after")
  first-touch semantics (r10 verdict #2) — chained running-min windows
  over one sort-shuffle, per-entity first-touch times + depth.
- q84: the drop-off report in first-touch mode, NULL entity group
  kept in to pin the n_matches/n_entities divergence.
- q86: TPC-H Q11 shape (global scalar-subquery threshold in HAVING)
  adapted to the partsupp-less fixture schema — the one classic TPC-H
  pattern the q-family hadn't pinned.
- q87: TPC-H Q21 with its faithful sole-blame semantics (per-supplier
  lateness + "no other supplier also failed"), complementing q35's
  latest-shipper proxy; one window pass replaces both correlated
  EXISTS probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_openetl_spark.workload.util import t

QUERIES: dict = {}
ORACLE: dict = {}


def q81_multi_step_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → view → click → purchase as ADJACENT events per user,
    with per-transition bounds (48 h to first view, 24 h between the
    rest) and a predicate beyond the event type on the final step
    (``value IS NOT NULL`` — a purchase without an amount is not a
    conversion). One shuffle: the step predicates project to booleans
    BEFORE the user-partitioned window, so lead() carries 4 booleans
    + micros, never the payload; the filter is one codegen span.
    Match-level output (start/end micros + duration), ordered for the
    driver hash by (user_id, start_us)."""
    from python_openetl_spark.operators.funnel import match_sequence

    m = match_sequence(
        t(spark, sf_dir, "events"),
        [
            F.col("event_type") == "signup",
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
        ],
        max_gap_us=[172_800_000_000, 86_400_000_000, 86_400_000_000],
    )
    return m.select(
        "user_id",
        "start_us",
        "end_us",
        (F.col("end_us") - F.col("start_us")).alias("duration_us"),
    )


QUERIES["q81_multi_step_funnel"] = q81_multi_step_funnel

ORACLE["q81_multi_step_funnel"] = """
    WITH x AS (
      SELECT user_id, event_type, value, epoch_us(ts) AS us,
             LEAD(event_type, 1) OVER w AS t1,
             LEAD(epoch_us(ts), 1) OVER w AS us1,
             LEAD(event_type, 2) OVER w AS t2,
             LEAD(epoch_us(ts), 2) OVER w AS us2,
             LEAD(event_type, 3) OVER w AS t3,
             LEAD(value, 3) OVER w AS v3,
             LEAD(epoch_us(ts), 3) OVER w AS us3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, us AS start_us, us3 AS end_us, us3 - us AS duration_us
    FROM x
    WHERE event_type = 'signup' AND t1 = 'view' AND t2 = 'click'
      AND t3 = 'purchase' AND v3 IS NOT NULL
      AND us1 - us <= 172800000000
      AND us2 - us1 <= 86400000000
      AND us3 - us2 <= 86400000000
"""


def q82_funnel_dropoff_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel DROP-OFF report over q81's 4-step pattern
    (operators/funnel.py funnel_report): per step prefix, total
    strict-sequence matches and distinct converting users — the
    numbers a funnel chart plots. All four prefixes are evaluated on
    ONE lead frame behind ONE user-partitioned shuffle (a prefix match
    is the full condition truncated at step i), then a single global
    aggregate + stack; counts stay exact longs, ratios are the
    caller's division."""
    from python_openetl_spark.operators.funnel import funnel_report

    return funnel_report(
        t(spark, sf_dir, "events"),
        [
            F.col("event_type") == "signup",
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
        ],
        max_gap_us=[172_800_000_000, 86_400_000_000, 86_400_000_000],
    )


QUERIES["q82_funnel_dropoff_report"] = q82_funnel_dropoff_report

def q83_first_touch_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q81's 4-step funnel under RELAXED ("eventually-after")
    semantics — the definition conversion funnels actually use: step i
    counts if it happened any time strictly after the entity's
    first-touch of step i-1 (within the same per-transition bounds),
    not as the adjacent next event (r10 verdict #2). Chained running-
    min windows over ONE user-partitioned sort-shuffle
    (operators/funnel.py funnel_first_touch); per-entity output of
    first-touch micros per step + depth. NULL users are filtered on
    BOTH engines so the oracle can chain plain equi-joins (NULL keys
    never match in SQL)."""
    from python_openetl_spark.operators.funnel import funnel_first_touch

    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return funnel_first_touch(
        ev,
        [
            F.col("event_type") == "signup",
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
        ],
        max_gap_us=[172_800_000_000, 86_400_000_000, 86_400_000_000],
    )


QUERIES["q83_first_touch_funnel"] = q83_first_touch_funnel

ORACLE["q83_first_touch_funnel"] = """
    WITH e AS (
      SELECT user_id, event_type, value, epoch_us(ts) AS us
      FROM events WHERE user_id IS NOT NULL
    ),
    s1 AS (
      SELECT user_id, MIN(us) AS t1 FROM e
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 USING (user_id)
      WHERE event_type = 'view' AND us > t1 AND us - t1 <= 172800000000
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 USING (user_id)
      WHERE event_type = 'click' AND us > t2 AND us - t2 <= 86400000000
      GROUP BY e.user_id
    ),
    s4 AS (
      SELECT e.user_id, MIN(us) AS t4 FROM e JOIN s3 USING (user_id)
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND us > t3 AND us - t3 <= 86400000000
      GROUP BY e.user_id
    )
    SELECT s1.user_id,
           t1 AS step_us_1, t2 AS step_us_2, t3 AS step_us_3, t4 AS step_us_4,
           CAST((t1 IS NOT NULL) AS INT) + CAST((t2 IS NOT NULL) AS INT)
           + CAST((t3 IS NOT NULL) AS INT) + CAST((t4 IS NOT NULL) AS INT)
             AS depth
    FROM s1
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    LEFT JOIN s4 USING (user_id)
"""


def q84_first_touch_dropoff_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drop-off report under first-touch semantics
    (funnel_report(mode="first_touch")): per step, converting-entity
    counts. NULL users stay IN on purpose — they form one group that
    counts in n_matches but never in n_entities (q82's COUNT(DISTINCT)
    rule), so the two columns differ and the oracle pins the NULL-group
    path with IS NOT DISTINCT FROM joins."""
    from python_openetl_spark.operators.funnel import funnel_report

    return funnel_report(
        t(spark, sf_dir, "events"),
        [
            F.col("event_type") == "signup",
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
        ],
        max_gap_us=[172_800_000_000, 86_400_000_000, 86_400_000_000],
        mode="first_touch",
    )


QUERIES["q84_first_touch_dropoff_report"] = q84_first_touch_dropoff_report

ORACLE["q84_first_touch_dropoff_report"] = """
    WITH e AS (
      SELECT user_id, event_type, value, epoch_us(ts) AS us FROM events
    ),
    s1 AS (
      SELECT user_id, MIN(us) AS t1 FROM e
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id AS user_id, MIN(us) AS t2
      FROM e JOIN s1 ON e.user_id IS NOT DISTINCT FROM s1.user_id
      WHERE event_type = 'view' AND us > t1 AND us - t1 <= 172800000000
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id AS user_id, MIN(us) AS t3
      FROM e JOIN s2 ON e.user_id IS NOT DISTINCT FROM s2.user_id
      WHERE event_type = 'click' AND us > t2 AND us - t2 <= 86400000000
      GROUP BY e.user_id
    ),
    s4 AS (
      SELECT e.user_id AS user_id, MIN(us) AS t4
      FROM e JOIN s3 ON e.user_id IS NOT DISTINCT FROM s3.user_id
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND us > t3 AND us - t3 <= 86400000000
      GROUP BY e.user_id
    ),
    f AS (
      SELECT s1.user_id, t1, t2, t3, t4
      FROM s1
      LEFT JOIN s2 ON s1.user_id IS NOT DISTINCT FROM s2.user_id
      LEFT JOIN s3 ON s1.user_id IS NOT DISTINCT FROM s3.user_id
      LEFT JOIN s4 ON s1.user_id IS NOT DISTINCT FROM s4.user_id
    )
    SELECT 1 AS step, CAST(COUNT(*) FILTER (t1 IS NOT NULL) AS BIGINT) AS n_matches,
           CAST(COUNT(user_id) FILTER (t1 IS NOT NULL) AS BIGINT) AS n_entities
    FROM f
    UNION ALL
    SELECT 2, CAST(COUNT(*) FILTER (t2 IS NOT NULL) AS BIGINT),
           CAST(COUNT(user_id) FILTER (t2 IS NOT NULL) AS BIGINT) FROM f
    UNION ALL
    SELECT 3, CAST(COUNT(*) FILTER (t3 IS NOT NULL) AS BIGINT),
           CAST(COUNT(user_id) FILTER (t3 IS NOT NULL) AS BIGINT) FROM f
    UNION ALL
    SELECT 4, CAST(COUNT(*) FILTER (t4 IS NOT NULL) AS BIGINT),
           CAST(COUNT(user_id) FILTER (t4 IS NOT NULL) AS BIGINT) FROM f
"""


ORACLE["q82_funnel_dropoff_report"] = """
    WITH x AS (
      SELECT user_id, event_type, value, epoch_us(ts) AS us,
             LEAD(event_type, 1) OVER w AS t1,
             LEAD(epoch_us(ts), 1) OVER w AS us1,
             LEAD(event_type, 2) OVER w AS t2,
             LEAD(epoch_us(ts), 2) OVER w AS us2,
             LEAD(event_type, 3) OVER w AS t3,
             LEAD(value, 3) OVER w AS v3,
             LEAD(epoch_us(ts), 3) OVER w AS us3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
      SELECT user_id,
             (event_type = 'signup') AS m1,
             (event_type = 'signup' AND t1 = 'view'
              AND us1 - us <= 172800000000) AS m2,
             (event_type = 'signup' AND t1 = 'view'
              AND us1 - us <= 172800000000
              AND t2 = 'click' AND us2 - us1 <= 86400000000) AS m3,
             (event_type = 'signup' AND t1 = 'view'
              AND us1 - us <= 172800000000
              AND t2 = 'click' AND us2 - us1 <= 86400000000
              AND t3 = 'purchase' AND v3 IS NOT NULL
              AND us3 - us2 <= 86400000000) AS m4
      FROM x
    )
    SELECT 1 AS step, CAST(COUNT(*) FILTER (m1) AS BIGINT) AS n_matches,
           CAST(COUNT(DISTINCT user_id) FILTER (m1) AS BIGINT) AS n_entities
    FROM m
    UNION ALL
    SELECT 2, CAST(COUNT(*) FILTER (m2) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) FILTER (m2) AS BIGINT) FROM m
    UNION ALL
    SELECT 3, CAST(COUNT(*) FILTER (m3) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) FILTER (m3) AS BIGINT) FROM m
    UNION ALL
    SELECT 4, CAST(COUNT(*) FILTER (m4) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) FILTER (m4) AS BIGINT) FROM m
"""


def q85_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transition conversion-latency report over the first-touch
    funnel: for each step 2..4, how many (non-NULL) users reached it
    and the average + median first-touch gap from the previous step —
    the "how long does conversion take" numbers next to q84's "how
    many convert". Exactness: gaps are integer micros; the average is
    an exact DECIMAL sum / count (order-independent), the median is
    the standard linear-interpolated percentile, identical halves on
    both engines. One stack over q83's per-entity frame, then a tiny
    4-group aggregate."""
    from python_openetl_spark.operators.funnel import funnel_first_touch

    ft = funnel_first_touch(
        t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull()),
        [
            F.col("event_type") == "signup",
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
        ],
        max_gap_us=[172_800_000_000, 86_400_000_000, 86_400_000_000],
    )
    gaps = ft.select(
        F.expr(
            "stack(3, 2, step_us_2 - step_us_1, 3, step_us_3 - step_us_2, "
            "4, step_us_4 - step_us_3) as (step, gap_us)"
        )
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy(F.col("step").cast("int").alias("step")).agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(
            F.sum(F.col("gap_us").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_gap_us"),
        F.percentile("gap_us", F.lit(0.5)).alias("median_gap_us"),
    )


QUERIES["q85_funnel_time_to_convert"] = q85_funnel_time_to_convert

ORACLE["q85_funnel_time_to_convert"] = """
    WITH e AS (
      SELECT user_id, event_type, value, epoch_us(ts) AS us
      FROM events WHERE user_id IS NOT NULL
    ),
    s1 AS (
      SELECT user_id, MIN(us) AS t1 FROM e
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 USING (user_id)
      WHERE event_type = 'view' AND us > t1 AND us - t1 <= 172800000000
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 USING (user_id)
      WHERE event_type = 'click' AND us > t2 AND us - t2 <= 86400000000
      GROUP BY e.user_id
    ),
    s4 AS (
      SELECT e.user_id, MIN(us) AS t4 FROM e JOIN s3 USING (user_id)
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND us > t3 AND us - t3 <= 86400000000
      GROUP BY e.user_id
    ),
    f AS (
      SELECT s1.user_id, t1, t2, t3, t4
      FROM s1
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
      LEFT JOIN s4 USING (user_id)
    ),
    g AS (
      SELECT 2 AS step, t2 - t1 AS gap_us FROM f WHERE t2 IS NOT NULL
      UNION ALL
      SELECT 3, t3 - t2 FROM f WHERE t3 IS NOT NULL
      UNION ALL
      SELECT 4, t4 - t3 FROM f WHERE t4 IS NOT NULL
    )
    SELECT CAST(step AS INT) AS step,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           round(CAST(SUM(CAST(gap_us AS DECIMAL(38,0))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_gap_us,
           median(gap_us) AS median_gap_us
    FROM g GROUP BY step
"""


def q86_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape adapted to the fixture's partsupp-less schema
    (value from shipped line items instead of stock): the revenue
    share of each part supplied from one nation, keeping only parts
    whose share of the national total exceeds a threshold — the global
    scalar-subquery-in-HAVING pattern. Spark plan: the per-part
    aggregate crossJoins the broadcast 1-row national total (one
    shuffle for the groupBy; the threshold is applied map-side after
    it, never a second pass over lineitem)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    ).select("n_nationkey")
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .select("l_partkey", val.cast("decimal(24,6)").alias("__v"))
    )
    per_part = base.groupBy("l_partkey").agg(F.sum("__v").alias("__dec"))
    # grand total = sum of the per-part DECIMAL sums (exact, order-free):
    # the threshold branch shares the grouped exchange with the groups
    # (AQE ReusedExchange — plan-pinned), so lineitem is physically
    # scanned once, not re-joined for the scalar subquery
    total = per_part.agg(
        (F.sum("__dec") * F.lit(0.001)).cast("double").alias("__cut")
    )
    per_part = per_part.select(
        "l_partkey", F.col("__dec").cast("double").alias("part_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__cut"))
        .select(
            "l_partkey",
            F.round("part_value", 6).alias("part_value"),
        )
    )


QUERIES["q86_important_parts"] = q86_important_parts

ORACLE["q86_important_parts"] = """
    WITH base AS (
      SELECT l_partkey,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)) AS v
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    )
    SELECT l_partkey, round(CAST(SUM(v) AS DOUBLE), 6) AS part_value
    FROM base
    GROUP BY l_partkey
    HAVING CAST(SUM(v) AS DOUBLE)
           > (SELECT CAST(SUM(v) AS DOUBLE) * 0.001 FROM base)
"""


def q87_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 with its FAITHFUL sole-blame semantics, adapted to the
    fixture's commitdate-less schema: on finished orders, a supplier is
    *late* when its last shipment left more than 60 days after the
    order date (the stand-in for ``l_receiptdate > l_commitdate``);
    count per supplier the multi-supplier orders where it was the ONLY
    late one. Distinct from q35_waiting_supplier, which pins the
    latest-shipper PROXY of Q21 (who holds the strictly-latest ship
    date) — q87 pins the real thing: a per-supplier lateness predicate
    plus Q21's "no other supplier also failed" NOT EXISTS. The oracle
    keeps the classic double-correlated EXISTS / NOT EXISTS self-join
    form, so the two paths really differ; the Spark plan replaces both
    correlated probes with ONE order-partitioned window over the
    collapsed (order, supplier) rows:

    - the only lineitem-sized exchange is the (l_orderkey, l_suppkey)
      groupBy, which gets a map-side partial max — at 100 TB that is
      the floor for this question, and it is also where the 6-B-row
      table collapses to ~order-count rows;
    - the orders join and the count/sum window both key on l_orderkey:
      when that join is a sort-merge (100 TB — orders is not
      broadcastable) the window reuses its hash partitioning; at
      fixture scale AQE broadcasts orders instead, so the plan shows
      exactly one Exchange per distinct key ((order, supplier) for the
      partial-agg groupBy, order for the window, name for the final
      rollup) — verified on the executed plan;
    - EXISTS(other supplier) becomes ``n_supp >= 2`` and NOT
      EXISTS(other late supplier) becomes ``n_late == 1`` (self is
      late), computed in the same window pass;
    - supplier is the broadcast dim.

    Reference parity: beyond-reference relational surface (the engine's
    arbitrary-SQL scan (`pyopenetl/operations.py` sql_to_dataframe /
    table_to_dataframe, ~lines 48-66) would push this
    whole statement to Postgres; here it is a native plan)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("__ms")
    )
    j = per.join(o, per["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("__ms") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("__late"),
    )
    w = Window.partitionBy("l_orderkey")
    flagged = j.select(
        "l_suppkey",
        "__late",
        F.count(F.lit(1)).over(w).alias("__n_supp"),
        F.sum(F.col("__late").cast("int")).over(w).alias("__n_late"),
    )
    blamed = flagged.filter(
        F.col("__late") & (F.col("__n_supp") >= 2) & (F.col("__n_late") == 1)
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(supp), blamed["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


QUERIES["q87_waiting_suppliers"] = q87_waiting_suppliers

ORACLE["q87_waiting_suppliers"] = """
    WITH osl AS (
      SELECT l_orderkey AS ok, l_suppkey AS sk, max(l_shipdate) AS ms
      FROM lineitem GROUP BY 1, 2
    ), j AS (
      SELECT osl.ok, osl.sk,
             (osl.ms > o_orderdate + INTERVAL 60 DAY) AS late
      FROM osl JOIN orders ON ok = o_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM j l1
    JOIN supplier ON l1.sk = s_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM j l2
                  WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
      AND NOT EXISTS (SELECT 1 FROM j l3
                      WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.late)
    GROUP BY s_name
"""
