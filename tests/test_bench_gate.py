"""bench.py regression-gate units: the box-state io-probe (r13 verdict
weak #1 — a flag list produced on a loaded box is mostly noise, and the
gate had no signal to tell box state from plan state) and the --merge
per-query provenance (r13 advice: a query present in only one of K
merged runs must not silently inherit K-run provenance)."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("bench", bench)
_spec.loader.exec_module(bench)


# --- gate_regressions: probe-ratio routing ---------------------------

def test_idle_box_flags_pass_through():
    out = bench.gate_regressions(["d40_pagerank"], probe_ratio=1.1)
    assert out["regressions"] == ["d40_pagerank"]
    assert "regressions_suppressed_by_probe" not in out
    assert out["io_probe_ratio"] == 1.1


def test_loaded_box_flags_suppressed_but_visible():
    out = bench.gate_regressions(["d40_pagerank", "e10_x"], probe_ratio=2.3)
    assert out["regressions"] == []
    assert out["regressions_suppressed_by_probe"] == ["d40_pagerank", "e10_x"]
    assert out["io_probe_ratio"] == 2.3


def test_no_probe_baseline_behaves_like_before():
    out = bench.gate_regressions(["q03_top_orders"], probe_ratio=None)
    assert out["regressions"] == ["q03_top_orders"]
    assert "io_probe_ratio" not in out


def test_empty_flags_never_suppressed():
    out = bench.gate_regressions([], probe_ratio=9.9)
    assert out["regressions"] == []
    assert "regressions_suppressed_by_probe" not in out


def test_threshold_boundary_is_exclusive():
    out = bench.gate_regressions(["x"], probe_ratio=1.5)
    assert out["regressions"] == ["x"]


# --- _trend_vs_snapshot: probe ratio extraction -----------------------

def _snap(tmp_path, **extra) -> str:
    snap = {
        "sf": 0.1,
        "queries": {"qa": 1.0, "qb": 2.0},
        "queries_median": {"qa": 1.2, "qb": 2.2},
        **extra,
    }
    p = tmp_path / "snap.json"
    p.write_text(json.dumps(snap))
    return str(p)


def test_trend_reports_probe_ratio_and_flags(tmp_path):
    path = _snap(tmp_path, io_probe_sec=0.2)
    # qa regressed on BOTH median and min (>40% and >0.3s); qb flat
    flags, ratio = bench._trend_vs_snapshot(
        timings={"qa": 1.8, "qb": 2.0},
        medians={"qa": 2.2, "qb": 2.2},
        sf=0.1,
        io_probe=0.5,
        snap_path=path,
    )
    assert flags == ["qa"]
    assert ratio == pytest.approx(2.5)


def test_trend_without_snapshot_probe_yields_none_ratio(tmp_path):
    path = _snap(tmp_path)  # legacy snapshot: no io_probe_sec
    flags, ratio = bench._trend_vs_snapshot(
        timings={"qa": 1.0}, medians={"qa": 1.2}, sf=0.1,
        io_probe=0.5, snap_path=path,
    )
    assert flags == [] and ratio is None


def test_trend_sf_mismatch_returns_none(tmp_path):
    path = _snap(tmp_path, io_probe_sec=0.2)
    assert (
        bench._trend_vs_snapshot(
            timings={}, medians={}, sf=0.01, io_probe=0.5, snap_path=path
        )
        is None
    )


# --- merge_runs: per-query provenance + probe floor -------------------

def _run(tmp_path, name, queries, probe=None, medians=None):
    run = {
        "sf": 0.1,
        "queries": queries,
        "queries_median": medians or queries,
        "repeats": 5,
    }
    if probe is not None:
        run["io_probe_sec"] = probe
    p = tmp_path / name
    p.write_text(json.dumps(run))
    return str(p)


def test_merge_records_thin_provenance(tmp_path):
    r1 = _run(tmp_path, "r1.json", {"qa": 1.0, "qb": 2.0}, probe=0.3)
    r2 = _run(tmp_path, "r2.json", {"qa": 0.9, "qb": 2.1}, probe=0.2)
    r3 = _run(tmp_path, "r3.json", {"qa": 1.1, "qb": 1.9, "qnew": 4.0}, probe=0.4)
    out = bench.merge_runs([r1, r2, r3])
    assert out["merged_runs"] == 3
    assert out["queries"]["qa"] == 0.9
    assert out["queries_runs"] == {"qnew": 1}  # thin row is visible
    assert out["io_probe_sec"] == 0.2  # probe floors like any row


def test_merge_full_provenance_omits_queries_runs(tmp_path):
    r1 = _run(tmp_path, "r1.json", {"qa": 1.0}, probe=0.3)
    r2 = _run(tmp_path, "r2.json", {"qa": 0.8}, probe=0.25)
    out = bench.merge_runs([r1, r2])
    assert "queries_runs" not in out
    assert out["queries"]["qa"] == 0.8


def test_merge_legacy_runs_without_probe(tmp_path):
    r1 = _run(tmp_path, "r1.json", {"qa": 1.0})
    r2 = _run(tmp_path, "r2.json", {"qa": 0.8})
    out = bench.merge_runs([r1, r2])
    assert "io_probe_sec" not in out
