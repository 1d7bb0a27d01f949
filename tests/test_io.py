"""Fixture IO: all tables load, ns timestamps convert, views register."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from python_openetl_spark.io import TABLES, load_table, register_views
from tests.conftest import SF_DIR


def test_all_tables_load_with_rows(spark):
    for name in TABLES:
        df = load_table(spark, SF_DIR, name)
        assert df.count() > 0, name


def test_events_ns_timestamp_converted(spark, duck):
    df = load_table(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = df.orderBy("event_id").limit(3).collect()
    want = duck.execute(
        "SELECT event_id, ts FROM events ORDER BY event_id LIMIT 3"
    ).fetchall()
    for row, (eid, ts) in zip(got, want):
        assert row["event_id"] == eid
        assert row["ts"].replace(tzinfo=None) == ts.replace(tzinfo=None), (row, ts)


def test_register_views_sql_path(spark):
    register_views(spark, SF_DIR)
    n = spark.sql("SELECT count(*) AS c FROM lineitem").collect()[0]["c"]
    assert n == 6000


def test_embeddings_vector_column(spark):
    df = load_table(spark, SF_DIR, "embeddings")
    t = df.schema["embedding"].dataType
    assert isinstance(t, T.ArrayType) and isinstance(t.elementType, T.FloatType)
