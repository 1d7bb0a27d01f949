"""doctor() — the capability report must agree with the actual gates.

Each row's ``available`` flag is cross-checked against the behavior it
claims to describe: if the report says a tier is unavailable, the tier
must raise/skip; if it says available, the tier must work. This keeps
the report honest when the environment changes (e.g. a protobuf wheel
or connector jar appears).
"""

from __future__ import annotations

import importlib

import pytest

from python_openetl_spark.doctor import Capability, doctor


def _row(rows, name) -> Capability:
    got = [r for r in rows if r.name == name]
    assert len(got) == 1, f"expected exactly one {name} row, got {got}"
    return got[0]


def test_report_shape(spark):
    rows = doctor(spark)
    names = [r.name for r in rows]
    assert names == sorted(set(names), key=names.index)  # unique, ordered
    for r in rows:
        assert isinstance(r.available, bool) and r.detail


def test_transform_with_state_row_matches_gate(spark):
    from python_openetl_spark.streaming.stateful_v2 import (
        transform_with_state_available,
    )

    assert _row(doctor(spark), "transform_with_state").available == (
        transform_with_state_available()
    )


def test_image_codec_row_matches_import(spark):
    try:
        importlib.import_module("PIL")
        has_pil = True
    except ImportError:
        has_pil = False
    assert _row(doctor(spark), "image_codecs").available == has_pil


def test_secret_manager_row_matches_provider_gate(spark):
    from python_openetl_spark.sources.connections import (
        SecretManagerCredentialProvider,
    )

    row = _row(doctor(spark), "gcp_secret_manager")
    if not row.available:
        with pytest.raises(ImportError):
            SecretManagerCredentialProvider("proj")
    else:
        SecretManagerCredentialProvider("proj")


def test_derby_row_matches_live_jdbc(spark):
    """The Derby row must be True wherever the live JDBC integration
    tests can run (Spark bundles the jars)."""
    assert _row(doctor(spark), "jdbc_derby_embedded").available


def test_bigquery_row_matches_registry_gate(spark):
    """If the report says no BigQuery jar, the registry handler must
    raise its gated error rather than attempt a read."""
    row = _row(doctor(spark), "bigquery_connector")
    if row.available:
        pytest.skip("connector jar present; gated-error branch not reachable")
    from python_openetl_spark.sources import registry

    with pytest.raises(Exception) as ei:
        registry.read(spark, {"format": "bigquery", "table": "d.t"})
    assert "bigquery" in str(ei.value).lower()


def test_sessionless_report_is_conservative():
    rows = doctor(None)
    bq = _row(rows, "bigquery_connector")
    assert not bq.available and "undetermined" in bq.detail


def test_engine_method_matches_module(spark):
    from python_openetl_spark.engine import Engine

    eng = Engine(spark)
    assert {r.name for r in eng.doctor()} == {r.name for r in doctor(spark)}
