"""Round-5 relational additions: declarative data-quality expectations.

q60: the validation tier (operators/quality.py) run against the
orders table — the engine-side restatement of the constraint surface
the reference delegates to Postgres DDL (NOT NULL / PRIMARY KEY /
FOREIGN KEY, `/root/reference/pyopenetl/operations.py:296-355`), plus
the range/set/regexp checks an ETL pipeline wants BEFORE publish.
All non-referential checks compile into one conditional aggregate
over one scan; the FK check is one left-anti join against the
broadcast customer key set.

Registered after ``llm7`` in ``_MODULES`` so the frozen ``_WINDOW_R5``
is unchanged; locally oracle-gated now, rotates into ``_WINDOW_R6``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_openetl_spark.workload.util import t


def q60_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_openetl_spark.operators import quality as Q

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return Q.run_checks(
        o,
        [
            Q.not_null("o_orderkey"),
            Q.unique("o_orderkey"),
            Q.not_null("o_totalprice"),
            Q.in_range("o_totalprice", 0.0, 600000.0),
            Q.accepted_values("o_orderstatus", ["O", "F", "P"]),
            Q.matches("o_orderpriority", r"^[0-9]-[A-Z ]+$"),
            Q.ref_integrity("o_custkey", c, "c_custkey"),
        ],
        "orders",
    )


QUERIES = {"q60_data_quality_report": q60_data_quality_report}

ORACLE = {
    "q60_data_quality_report": """
        WITH agg AS (
          SELECT
            COALESCE(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS nn_key,
            COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS uq_key,
            COALESCE(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS nn_price,
            COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL
                      AND (o_totalprice < 0.0 OR o_totalprice > 600000.0)
                     THEN 1 ELSE 0 END), 0) AS rg_price,
            COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                      AND o_orderstatus NOT IN ('O', 'F', 'P')
                     THEN 1 ELSE 0 END), 0) AS av_status,
            COALESCE(SUM(CASE WHEN o_orderpriority IS NOT NULL
                      AND NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$')
                     THEN 1 ELSE 0 END), 0) AS re_prio
          FROM orders
        ),
        fk AS (
          SELECT COUNT(*) AS orphans FROM orders
          WHERE o_custkey IS NOT NULL
            AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                  WHERE c_custkey IS NOT NULL)
        )
        SELECT 'orders' AS table_name, v.check, v."column",
               v.n_violations, v.n_violations = 0 AS passed
        FROM (
          SELECT 'not_null(o_orderkey)' AS check, 'o_orderkey' AS "column",
                 CAST(nn_key AS BIGINT) AS n_violations FROM agg
          UNION ALL
          SELECT 'unique(o_orderkey)', 'o_orderkey',
                 CAST(uq_key AS BIGINT) FROM agg
          UNION ALL
          SELECT 'not_null(o_totalprice)', 'o_totalprice',
                 CAST(nn_price AS BIGINT) FROM agg
          UNION ALL
          SELECT 'in_range(o_totalprice)', 'o_totalprice',
                 CAST(rg_price AS BIGINT) FROM agg
          UNION ALL
          SELECT 'accepted_values(o_orderstatus)', 'o_orderstatus',
                 CAST(av_status AS BIGINT) FROM agg
          UNION ALL
          SELECT 'matches(o_orderpriority)', 'o_orderpriority',
                 CAST(re_prio AS BIGINT) FROM agg
          UNION ALL
          SELECT 'ref_integrity(o_custkey)', 'o_custkey',
                 CAST(orphans AS BIGINT) FROM fk
        ) v
    """,
}
