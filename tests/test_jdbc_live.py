"""Live JDBC roundtrip through Derby (bundled with Spark's distribution).

The jdbc module's other tests assert reader/writer *options*; this one
executes a real JDBC write + read against an in-memory Derby database
(`jdbc:derby:memory:`), elevating S1/S2/K1 from plan-level to executed
code without any network. Reference analogue: the Postgres engine
roundtrips in `/root/reference/pyopenetl/operations.py:39-67,130-212`.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_openetl_spark import io as poe_io
from python_openetl_spark.sources.jdbc import (
    JdbcSource,
    derive_partition_bounds,
    read_query,
    read_table,
    write_table,
)
from tests.conftest import SF_DIR

DERBY = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby(spark):
    src = JdbcSource(url="jdbc:derby:memory:poetest;create=true", driver=DERBY)
    yield src
    # drop the in-memory database (Derby signals success via SQLException)
    try:
        read_query(spark, JdbcSource(url="jdbc:derby:memory:poetest;drop=true", driver=DERBY), "VALUES 1").collect()
    except Exception:
        pass


def test_write_then_read_roundtrip(spark, derby):
    """K1 bulk append executes: Spark creates the Derby table from the
    DataFrame schema, batch-inserts, and a full-table scan returns the
    same rows."""
    orders = poe_io.load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    n = orders.count()
    write_table(orders, derby, "ORDERS_RT", mode="overwrite", batch_size=500)
    back = read_table(spark, derby, "ORDERS_RT")
    assert back.count() == n
    a = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(24,6)")).alias("s"),
        F.sum("o_orderkey").alias("k"),
    ).first()
    b = back.agg(
        F.sum(F.col("o_totalprice").cast("decimal(24,6)")).alias("s"),
        F.sum("o_orderkey").alias("k"),
    ).first()
    assert (a["s"], a["k"]) == (b["s"], b["k"])


def test_partitioned_parallel_scan(spark, derby):
    """S1's distributed form executes: derived min/max bounds produce a
    range-partitioned scan whose partitions cover every row exactly once."""
    lo, hi = derive_partition_bounds(spark, derby, "ORDERS_RT", "o_orderkey")
    assert hi > lo
    df = read_table(
        spark,
        derby,
        "ORDERS_RT",
        partition_column="o_orderkey",
        lower_bound=lo,
        upper_bound=hi,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    plain = read_table(spark, derby, "ORDERS_RT")
    assert df.count() == plain.count()
    assert df.select(F.countDistinct("o_orderkey")).first()[0] == plain.count()


def test_query_pushdown_executes(spark, derby):
    """S2: the aggregate runs inside Derby; only 1 row crosses JDBC."""
    agg = read_query(
        spark,
        derby,
        # Spark-written JDBC tables have QUOTED identifiers (Derby
        # case-folds unquoted ones to uppercase) and map StringType to
        # CLOB, which Derby cannot GROUP BY — hence the VARCHAR cast
        'SELECT CAST("o_orderstatus" AS VARCHAR(4)) AS "st", COUNT(*) AS "n" '
        'FROM "ORDERS_RT" GROUP BY CAST("o_orderstatus" AS VARCHAR(4))',
    )
    rows = {r["st"]: r["n"] for r in agg.collect()}
    orders = poe_io.load_table(spark, SF_DIR, "orders")
    want = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    assert rows == want


def test_filter_pushed_to_jdbc_source(spark, derby):
    """Catalyst pushes the filter into the JDBC scan (PushedFilters in
    the physical plan), so the database — not Spark — prunes rows."""
    df = read_table(spark, derby, "ORDERS_RT").filter(F.col("o_totalprice") > 100000.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(o_totalprice" in plan, plan
    n_pruned = df.count()
    assert 0 < n_pruned < read_table(spark, derby, "ORDERS_RT").count()


def test_bounds_fall_back_to_unquoted_for_case_folded_tables(spark, derby):
    """A table created UNQUOTED by a non-Spark tool lives case-folded in
    the catalog (uppercase on Derby); callers addressing it in lowercase
    must still derive bounds — the quoted probe misses, the default
    fallback retries unquoted (r6 advice: quoting-only was a silent
    regression for pre-existing tables)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(derby.url)
    try:
        st = conn.createStatement()
        try:
            st.execute("DROP TABLE bounds_cf")
        except Exception:
            pass
        st.execute("CREATE TABLE bounds_cf (pk INT PRIMARY KEY)")
        st.execute("INSERT INTO bounds_cf VALUES (3), (11), (42)")
        st.close()
    finally:
        conn.close()
    # default: quoted-then-unquoted fallback finds the folded table
    assert derive_partition_bounds(spark, derby, "bounds_cf", "pk") == (3, 42)
    # explicit modes: unquoted hits, quoted (exact-case) misses
    assert derive_partition_bounds(
        spark, derby, "bounds_cf", "pk", quote_identifiers=False
    ) == (3, 42)
    with pytest.raises(Exception):
        derive_partition_bounds(
            spark, derby, "bounds_cf", "pk", quote_identifiers=True
        )
