"""COVERAGE.md is the driver-evidence source of truth — its ledger and
totals must stay machine-checkably consistent with the declared
workload (r6 verdict #5: the totals line drifted by one when a query
landed after the totals commit)."""

from __future__ import annotations

import re
from pathlib import Path

from python_openetl_spark.workload import all_queries

COVERAGE = Path(__file__).resolve().parent.parent / "COVERAGE.md"


def test_totals_line_matches_declared_workload():
    text = COVERAGE.read_text()
    m = re.search(r"^Totals: (\d+) queries", text, re.M)
    assert m, "COVERAGE.md totals line missing"
    assert int(m.group(1)) == len(all_queries())


def test_ledger_lists_every_query_exactly_once():
    text = COVERAGE.read_text()
    start = text.index("| query | last driver-green | scheduled |")
    end = text.index("Totals:", start)
    rows = re.findall(r"^\| `([a-z0-9_]+)` \|", text[start:end], re.M)
    declared = set(all_queries())
    assert sorted(rows) == sorted(declared)
    assert len(rows) == len(set(rows))


def test_query_index_header_count_matches():
    text = COVERAGE.read_text()
    m = re.search(r"## Appendix: query index \((\d+) queries", text)
    assert m and int(m.group(1)) == len(all_queries())
