"""Differential-testing helpers: Spark result vs DuckDB oracle.

Mirrors the driver's correctness gate (row-count + column set +
order-insensitive value comparison, columns sorted by name) so every
``queries()`` / ``oracle_sql()`` pair is validated locally before the
driver ever sees it. Floats are compared with a small relative
tolerance; everything else must match exactly.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sort_key(row: tuple) -> tuple:
    key = []
    for v in row:
        if v is None:
            key.append((0, ""))
        elif isinstance(v, (int, float, decimal.Decimal)):
            key.append((1, f"{float(v):+.10e}"))
        elif isinstance(v, (_dt.date, _dt.datetime)):
            key.append((2, v.isoformat()))
        else:
            key.append((3, str(v)))
    return tuple(key)


def normalize_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=_sort_key)
    return cols, rows


def _cells_equal(a: Any, b: Any, rel: float = 1e-9, abs_: float = 1e-9) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y, rel, abs_) for x, y in zip(a, b))
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
        # driver-faithful: cells are hashed STRINGIFIED, so a Spark
        # DECIMAL ('205941.60') against the oracle's float64
        # ('205941.6') is a red even when numerically equal (r3
        # k01/k03). A query that wants numeric comparison must cast
        # both sides to DOUBLE (module design rule).
        return str(a) == str(b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        # dtype-strict: the driver hashes STRINGIFIED values, so an integer
        # column on one engine vs float on the other ("12" vs "12.0") is a
        # hash mismatch even when numerically identical (round-1 q10/q13/q37:
        # DuckDB SUM(int)→HUGEINT→float64). Fail it here, before the driver.
        if isinstance(a, int) != isinstance(b, int):
            return False
        fa, fb = float(a), float(b)
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        return math.isclose(fa, fb, rel_tol=rel, abs_tol=abs_)
    if isinstance(a, _dt.datetime) and isinstance(b, _dt.datetime):
        return a.replace(tzinfo=None) == b.replace(tzinfo=None)
    return a == b


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    """Raise AssertionError with a readable diff if results differ."""
    scols, srows = normalize_frame(spark_pdf)
    ocols, orows = normalize_frame(oracle_pdf)
    assert scols == ocols, f"{name}: column mismatch spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), (
        f"{name}: row count mismatch spark={len(srows)} oracle={len(orows)}\n"
        f"spark head: {srows[:3]}\noracle head: {orows[:3]}"
    )
    for i, (sr, orow) in enumerate(zip(srows, orows)):
        if not _cells_equal(sr, orow):
            raise AssertionError(
                f"{name}: first differing row #{i} (cols {scols}):\n  spark : {sr}\n  oracle: {orow}"
            )


def latest_green_rounds(repo_root: str | Path | None = None) -> dict[str, int]:
    """Per-query latest driver-green round, computed from the driver's own
    ``CORRECTNESS_r*.json`` artifacts (r7 verdict #4: COVERAGE.md's evidence
    ledger must be generated from these files so it can never drift).

    Green = the driver recorded the row with no error, matching row counts,
    and — when the query has a SQL oracle — a matching value hash. Rounds
    1-2 predate the current fixture generation but still count as evidence;
    staleness policy (what counts as *too old*) lives in COVERAGE.md.
    """
    import json
    import re

    root = Path(repo_root) if repo_root else Path(__file__).resolve().parent.parent
    latest: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r0*(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.loads(path.read_text()).items():
            green = (
                row.get("err") is None
                and row.get("rows_match") is True
                and row.get("hash_match") is not False
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest
