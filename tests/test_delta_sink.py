"""plans/delta_sink.py — the gated Delta Lake MERGE route
(r10 verdict #5: SURVEY §7 M2's 'use Delta MERGE INTO only if
available'). This sandbox has no delta-spark, so the live-execution
test self-skips; everything else pins the gate, the routing, and the
pure merge-plan pieces without the package."""

from __future__ import annotations

import pytest

from python_openetl_spark.plans.delta_sink import (
    DELTA_PACKAGE_COORDINATE,
    DeltaGateError,
    delta_available,
    merge_condition,
    require_delta,
)


def test_gate_is_conservative_without_package(spark):
    """No delta-spark here: the gate reports False both with and
    without a session, and require_delta raises the production
    coordinate (never an ImportError mid-pipeline)."""
    if delta_available():
        pytest.skip("delta-spark present in this environment")
    assert delta_available(spark) is False
    with pytest.raises(DeltaGateError, match="delta-spark"):
        require_delta(spark)
    try:
        require_delta()
    except DeltaGateError as e:
        assert DELTA_PACKAGE_COORDINATE in str(e)
        assert "spark.sql.extensions" in str(e)
    else:
        pytest.fail("require_delta() must raise without the package")


def test_upsert_sync_routes_and_validates(spark, tmp_path):
    """table_format='delta' reaches the gated path (clear error here),
    rejects ParquetTable dests, and unknown formats raise; the default
    parquet path is untouched by the new parameter."""
    from python_openetl_spark.plans.pipelines import ParquetTable, upsert_sync

    src = spark.createDataFrame(
        [(1, "a", "2024-01-01 00:30:00")], "id long, v string, updated_at string"
    ).selectExpr("id", "v", "cast(updated_at as timestamp) updated_at")
    if not delta_available():
        with pytest.raises(DeltaGateError, match=DELTA_PACKAGE_COORDINATE.split(":")[0]):
            upsert_sync(
                spark, src, str(tmp_path / "d"), pk="id",
                anchor="2024-01-01 01:00:00", table_format="delta",
            )
    with pytest.raises(ValueError, match="table_format"):
        upsert_sync(spark, src, str(tmp_path / "p"), table_format="iceberg")
    with pytest.raises(ValueError, match="ParquetTable"):
        upsert_sync(
            spark, src, ParquetTable(str(tmp_path / "p2")), table_format="delta"
        )


def test_merge_condition_is_null_safe_per_key():
    """The MERGE ON clause (pure, pinned without the package): <=> per
    key so NULL pks match themselves — merge_upsert's join semantics."""
    assert merge_condition("id") == "t.id <=> s.id"
    assert merge_condition(["k1", "k2"]) == "t.k1 <=> s.k1 AND t.k2 <=> s.k2"


def test_doctor_reports_delta_gate(spark):
    from python_openetl_spark.doctor import doctor

    rows = [r for r in doctor(spark) if r.name == "delta_lake_sink"]
    assert len(rows) == 1
    assert rows[0].available == delta_available(spark)
    assert DELTA_PACKAGE_COORDINATE in rows[0].detail


@pytest.mark.skipif(
    not delta_available(), reason="delta-spark not installed in this sandbox"
)
def test_live_delta_merge_matches_parquet_path(spark, tmp_path):
    """In an environment WITH delta-spark: the m09/m10 semantics run
    through Delta — seed, then one upsert_sync step with an update, an
    insert, and a delete — and the final table equals the parquet
    path's result row-for-row."""
    from python_openetl_spark.plans.delta_sink import seed_delta, upsert_sync_delta
    from python_openetl_spark.plans.pipelines import upsert_sync

    base = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 00:00:00"),
            (2, "b", "2024-01-01 00:00:00"),
            (3, "c", "2024-01-01 00:00:00"),
        ],
        "id long, v string, updated_at string",
    ).selectExpr("id", "v", "cast(updated_at as timestamp) updated_at")
    # post state: update 1, drop 3, insert 4 (inside the delta window)
    src = spark.createDataFrame(
        [
            (1, "A", "2024-01-01 00:45:00"),
            (2, "b", "2024-01-01 00:00:00"),
            (4, "d", "2024-01-01 00:50:00"),
        ],
        "id long, v string, updated_at string",
    ).selectExpr("id", "v", "cast(updated_at as timestamp) updated_at")

    dpath = str(tmp_path / "delta_tbl")
    seed_delta(base, dpath)
    m = upsert_sync_delta(
        spark, src, dpath, pk="id", anchor="2024-01-01 01:00:00"
    )
    assert (m.rows_added, m.rows_deleted) == (2, 1)

    ppath = str(tmp_path / "parquet_tbl")
    from python_openetl_spark.plans.pipelines import seed

    seed(base, ppath, normalize=False)
    upsert_sync(spark, src, ppath, pk="id", anchor="2024-01-01 01:00:00")
    got = {
        tuple(r)
        for r in spark.read.format("delta").load(dpath).collect()
    }
    want = {tuple(r) for r in spark.read.parquet(ppath).collect()}
    assert got == want
