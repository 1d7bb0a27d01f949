"""Differential robustness for the RELATIONAL workload: every query
that reads only the TPC-H-ish star tables (+ events) runs against its
DuckDB oracle on a HOSTILE synthetic fixture — the star-schema
counterpart of test_hostile_fixtures.py's documents/embeddings suite.

Planted shapes a regenerated fixture could legally contain:
- a region with no nations, a nation with no customers/suppliers,
  orphan FK values (nationkey 99, lineitems whose order is absent)
- a customer with no orders; an order with NO lineitems
- zero quantities, zero/100% discounts, 0.0 prices and balances,
  negative account balances
- date rows sitting EXACTLY on every predicate boundary the workload
  uses (1996-07-01, 1996-10-01, 1997-01-01, the m-query cutoff
  2000-01-01 / overlap 1999-01-01, and a lineitem shipped exactly
  90 days after its order for q54's strict >)
- event streams with a single-event user, same-timestamp ties, a gap
  of exactly 30 minutes (q37's session threshold is strict >), and
  props JSON edges (empty object, missing keys, null values, empty
  string)

Any divergence is a latent driver red: both engines run the same
semantics over the same rows.
"""

from __future__ import annotations

import datetime as dt
import re

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from python_openetl_spark.testing import assert_frames_match
from python_openetl_spark.workload import all_oracles, all_queries

# Whole-workload robustness soak: slow tier, run by the full suite
# (`pytest -m ""`) and the end-of-round cadence, not the fast gate.
pytestmark = pytest.mark.slow

QUERIES = all_queries()
ORACLE = all_oracles()

_STAR_TABLES = {"region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events"}
_DOC_TABLES = re.compile(r"\b(documents|embeddings)\b")
_ANY_TABLE = re.compile(
    r"\b(region|nation|customer|supplier|part|orders|lineitem|events|documents|embeddings)\b"
)

#: Every oracle-checked query whose SQL references only star tables.
STAR_QUERIES = sorted(
    name
    for name, sql in ORACLE.items()
    if not _DOC_TABLES.search(sql) and _ANY_TABLE.search(sql)
)

SKIP: dict[str, str] = {}


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _star_tables() -> dict[str, pa.Table]:
    region = {
        "r_regionkey": [0, 1, 2],  # 2 = region with no nations
        "r_name": ["AMERICA", "EUROPE", "EMPTYREG"],
    }
    nation = {
        "n_nationkey": [0, 1, 2, 3],
        "n_name": ["USA", "FRANCE", "GERMANY", "LONELY"],  # LONELY: no members
        "n_regionkey": [0, 1, 1, 99],  # 99 = orphan region
    }
    customer = {
        "c_custkey": list(range(1, 9)),
        "c_name": [f"Customer#{i}" for i in range(1, 8)] + ["Customer#1"],  # dup name
        "c_nationkey": [0, 0, 1, 1, 2, 2, 99, 0],  # 99 = orphan nation
        "c_acctbal": [100.0, -50.0, 0.0, 9999.99, 1.5, -0.01, 42.0, 7.0],
        "c_mktsegment": ["BUILDING", "AUTOMOBILE", "BUILDING", "MACHINERY",
                         "HOUSEHOLD", "FURNITURE", "BUILDING", "AUTOMOBILE"],
        # c_custkey 8 will have NO orders
    }
    supplier = {
        "s_suppkey": [1, 2, 3, 4],
        "s_name": [f"Supplier#{i:09d}" for i in range(1, 5)],
        "s_nationkey": [0, 1, 2, 99],
        "s_acctbal": [10.0, -5.0, 0.0, 3.3],  # negative = q56's NOT IN branch
    }
    part = {
        "p_partkey": list(range(1, 9)),
        "p_name": ["blue rod", "blue widget", "large bolt", "small bolt",
                   "red widget", "green gear", "blue bolt", "cold gear"],
        "p_brand": ["Brand#13", "Brand#13", "Brand#1", "Brand#2",
                    "Brand#1", "Brand#2", "Brand#13", "Brand#9"],
        "p_type": ["ECONOMY", "LARGE", "SMALL", "STANDARD", "PROMO", "PROMO",
                   "MEDIUM", "ECONOMY"],
        "p_size": [1, 50, 25, 26, 10, 10, 3, 7],  # 25/26 straddle q56's <= 25
        "p_retailprice": [0.0, 10.5, 99.99, 1.0, 2.5, 1000.0, 5.0, 3.0],
    }

    # orders: boundary dates + one customer with many orders + statuses
    o_rows = [
        # (okey, ckey, status, totalprice, orderdate, priority)
        (1, 1, "F", 100.0, "1996-07-01", "1-URGENT"),    # ON q54's >= boundary
        (2, 1, "O", 0.0, "1996-09-30", "2-HIGH"),        # zero price, in range
        (3, 1, "F", 50.5, "1996-10-01", "3-MEDIUM"),     # ON q54's < bound (excluded)
        (4, 2, "P", 10.0, "1997-01-01", "4-NOT SPECIFIED"),  # q55 >= boundary
        (5, 2, "F", 20.0, "1997-12-31", "5-LOW"),
        (6, 3, "O", 30.0, "1998-01-01", "1-URGENT"),     # q55 < bound (excluded)
        (7, 4, "F", 1e7, "1995-01-01", "2-HIGH"),        # huge price, range min
        (8, 5, "F", 40.0, "1999-01-01", "3-MEDIUM"),     # ON overlap boundary
        (9, 6, "O", 60.0, "1999-12-31", "1-URGENT"),
        (10, 6, "F", 70.0, "2000-01-01", "2-HIGH"),      # ON m-cutoff boundary
        (11, 7, "F", 80.0, "2001-08-01", "5-LOW"),       # range max
        (12, 1, "F", 90.0, "1996-08-15", "1-URGENT"),    # no lineitems at all
        (13, 1, "O", 15.0, "1996-08-15", "1-URGENT"),    # same date tie
        # merge-family hostile shapes (r5 verdict item 6): a duplicate
        # pk arriving twice in the SAME delta batch (both post-cutoff,
        # so the dup exercises the insert path of m01/m04/m06/m12
        # without target-side multiplicity), and an orphan customer FK
        # flowing through the merge/report joins
        (20, 2, "O", 11.0, "2000-06-15", "1-URGENT"),    # dup-pk delta v1
        (20, 3, "F", 22.0, "2000-06-15", "2-HIGH"),      # dup-pk delta v2
        (21, 777, "O", 33.0, "2000-07-01", "3-MEDIUM"),  # orphan o_custkey
        # r6-verdict q73 shape: an all-NULL divisor group — every one
        # of these keys is divisible by 3, so try_divide's divisor is
        # 0.0 for the whole group and the NULL must propagate (not
        # error under ANSI mode) on both engines; "1" additionally
        # gives try_cast(o_orderstatus) its only non-NULL row
        (30, 4, "1", 12.0, "2000-08-01", "4-NOT SPECIFIED"),
        (33, 5, "F", 0.0, "2000-08-02", "5-LOW"),
        # q87 sole-blame shapes: order 34 has one supplier shipping at
        # EXACTLY orderdate+60d (strict > ⇒ NOT late) and another at
        # +61d (late) — an >= slip on either engine flips n_late from
        # 1 to 2 and silently un-blames the late supplier; order 35 is
        # a LATE single-supplier order, which must NOT count (no other
        # supplier EXISTS)
        (34, 1, "F", 25.0, "1996-08-01", "3-MEDIUM"),
        (35, 2, "F", 35.0, "1996-08-01", "4-NOT SPECIFIED"),
    ]
    orders = {
        "o_orderkey": [r[0] for r in o_rows],
        "o_custkey": [r[1] for r in o_rows],
        "o_orderstatus": [r[2] for r in o_rows],
        "o_totalprice": [r[3] for r in o_rows],
        "o_orderdate": [_ts(r[4]) for r in o_rows],
        "o_orderpriority": [r[5] for r in o_rows],
    }

    # lineitem: every numeric edge + exact q54 90-day boundary + orphan
    l_rows = [
        # (okey, pkey, skey, ln, qty, extprice, disc, tax, rf, ls, shipdate)
        (1, 1, 1, 1, 0.0, 0.0, 0.0, 0.0, "A", "F", "1996-09-29"),      # 90d exactly
        (1, 2, 2, 2, 5.0, 55.5, 1.0, 0.08, "N", "O", "1996-12-30"),    # 100% discount
        (2, 3, 1, 1, 49.0, 100.0, 0.5, 0.0, "R", "F", "1996-10-05"),
        (2, 4, 3, 2, 1.0, 1.0, 0.0, 0.07, "A", "F", "1997-01-01"),     # q55 boundary
        (3, 5, 2, 1, 30.0, 300.0, 0.1, 0.02, "N", "O", "1996-10-02"),
        (4, 6, 1, 1, 260.0, 2600.0, 0.0, 0.0, "R", "F", "1996-06-01"), # q57 >250 blue? p6=green
        (4, 1, 4, 2, 300.0, 900.0, 0.2, 0.01, "A", "F", "1996-05-05"), # blue rod, >250
        (5, 7, 2, 1, 251.0, 50.0, 0.3, 0.03, "N", "O", "1996-03-03"),  # blue bolt, just over
        (6, 8, 3, 1, 250.0, 75.0, 0.0, 0.0, "R", "F", "1996-04-04"),   # exactly 250 (excluded)
        (7, 2, 1, 1, 7.0, 10.0, 0.05, 0.04, "A", "F", "1995-06-06"),
        (8, 3, 2, 1, 2.0, 4.0, 0.0, 0.0, "N", "F", "1999-02-02"),
        (9, 4, 3, 1, 3.0, 6.0, 0.15, 0.0, "R", "O", "2000-02-02"),
        (10, 5, 1, 1, 4.0, 8.0, 0.0, 0.06, "A", "F", "2000-03-03"),
        (11, 6, 2, 1, 6.0, 12.0, 0.25, 0.0, "N", "O", "2001-11-04"),   # shipdate max
        (999, 7, 1, 1, 9.0, 18.0, 0.0, 0.0, "R", "F", "1997-07-07"),   # ORPHAN order
        # q87 order 34: supplier 1 ships EXACTLY +60d (1996-08-01 →
        # 1996-09-30, boundary ⇒ not late under strict >), supplier 2
        # ships +61d (late, sole blame)
        (34, 1, 1, 1, 8.0, 16.0, 0.0, 0.0, "N", "F", "1996-09-30"),
        (34, 2, 2, 2, 9.0, 18.0, 0.0, 0.0, "N", "F", "1996-10-01"),
        # q87 order 35: single supplier, very late — EXISTS(other
        # supplier) fails, must never be counted
        (35, 3, 3, 1, 2.0, 4.0, 0.0, 0.0, "R", "F", "1996-11-30"),
    ]
    lineitem = {
        "l_orderkey": [r[0] for r in l_rows],
        "l_partkey": [r[1] for r in l_rows],
        "l_suppkey": [r[2] for r in l_rows],
        "l_linenumber": [r[3] for r in l_rows],
        "l_quantity": [r[4] for r in l_rows],
        "l_extendedprice": [r[5] for r in l_rows],
        "l_discount": [r[6] for r in l_rows],
        "l_tax": [r[7] for r in l_rows],
        "l_returnflag": [r[8] for r in l_rows],
        "l_linestatus": [r[9] for r in l_rows],
        "l_shipdate": [_ts(r[10]) for r in l_rows],
    }

    # events: session/tie/JSON edges
    base = _ts("2024-01-01 00:00:00")

    def mins(m: float) -> dt.datetime:
        return base + dt.timedelta(minutes=m)

    e_rows = [
        # (eid, ts, user, type, value, props)
        (1, mins(0), 1, "click", 1.0, '{"page": "a", "ms": 120}'),
        (2, mins(29), 1, "view", 0.0, '{"page": "b"}'),          # < 30min gap
        (3, mins(59), 1, "click", -1.0, '{}'),                   # exactly 30min gap
        (4, mins(90), 1, "purchase", 2.5, '{"page": null}'),     # 31min gap: new session
        (5, mins(0), 2, "click", 5.0, ''),                       # single... no, user 2 two rows
        (6, mins(0), 2, "click", 5.0, '{"ms": "notanint"}'),     # full (ts,value) tie
        (7, mins(500), 3, "signup", 0.0, '{"deep": {"k": 1}}'),  # single-event user
        (8, mins(1000), 4, "error", 1e9, '{"page": "x", "ms": 0}'),
        (9, mins(1001), 4, "click", -1e9, '{"page": "x"}'),
        # same-pk same-timestamp tie: m02's latest-wins dedup must
        # resolve it by CONTENT (value desc), not arrival order —
        # nondeterministic on either engine otherwise
        (12, mins(2000), 5, "tick", 2.0, '{}'),
        (12, mins(2000), 5, "tick", 3.0, '{}'),
        # r6-verdict q72 shape: NULL event_type inside a window frame —
        # Spark's collect_list and DuckDB's windowed DISTINCT aggregate
        # must both ignore the NULL, and a user whose frame is ONLY
        # NULLs must report 0 distinct types, not 1
        (13, mins(3000), 6, None, 1.0, '{}'),
        (14, mins(3001), 6, "click", 2.0, '{"page": "y"}'),
        (15, mins(3100), 7, None, 0.5, '{}'),            # all-NULL user
        # r7-advice q75 shape: MALFORMED JSON props — Spark's
        # try_parse_json / get_json_object degrade to NULL; the DuckDB
        # oracles must degrade identically via their json_valid guards
        # (q13/q75) instead of erroring
        (16, mins(3200), 8, "click", 1.0, '{bad json'),
    ]
    events = {
        "event_id": [r[0] for r in e_rows],
        "ts": [r[1] for r in e_rows],
        "user_id": [r[2] for r in e_rows],
        "event_type": [r[3] for r in e_rows],
        "value": [r[4] for r in e_rows],
        "props": [r[5] for r in e_rows],
    }

    def tbl(d: dict, int32_cols: tuple = ()) -> pa.Table:
        arrays = {}
        for k, v in d.items():
            if v and isinstance(v[0], dt.datetime):
                arrays[k] = pa.array(v, pa.timestamp("us"))
            elif k in int32_cols:
                arrays[k] = pa.array(v, pa.int32())
            elif v and isinstance(v[0], bool):
                arrays[k] = pa.array(v, pa.bool_())
            elif v and isinstance(v[0], float):
                arrays[k] = pa.array(v, pa.float64())
            elif v and isinstance(v[0], int):
                arrays[k] = pa.array(v, pa.int64())
            else:
                arrays[k] = pa.array(v, pa.string())
        return pa.table(arrays)

    return {
        "region": tbl(region, ("r_regionkey",)),
        "nation": tbl(nation, ("n_nationkey", "n_regionkey")),
        "customer": tbl(customer, ("c_nationkey",)),
        "supplier": tbl(supplier, ("s_nationkey",)),
        "part": tbl(part, ("p_size",)),
        "orders": tbl(orders),
        "lineitem": tbl(lineitem, ("l_linenumber",)),
        "events": tbl(events),
    }


@pytest.fixture(scope="module")
def star_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile_star")
    for name, table in _star_tables().items():
        pq.write_table(table, str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def star_duck(star_dir):
    con = duckdb.connect()
    for t in _STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{star_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_star_query_selection_is_nontrivial():
    assert len(STAR_QUERIES) >= 50, STAR_QUERIES
    for must in ("q01_pricing_summary", "q37_sessionize", "m01_merge_upsert",
                 "q54_order_priority_checking"):
        assert must in STAR_QUERIES


@pytest.mark.parametrize("name", STAR_QUERIES)
def test_query_survives_hostile_star(name, spark, star_dir, star_duck):
    if name in SKIP:
        pytest.skip(SKIP[name])
    spark_pdf = QUERIES[name](spark, star_dir).toPandas()
    oracle_pdf = star_duck.execute(ORACLE[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, f"hostile-star:{name}")


# ---------------------------------------------------------------- empty --

#: Engine-level divergences on EMPTY input, impossible on generated
#: fixtures (the driver always emits rows) and intractable to paper
#: over: Spark's rollup/cube/grouping-sets emit NO grand-total row over
#: empty input, while DuckDB follows the SQL standard (the () grouping
#: set yields one all-NULL row with count 0).
EMPTY_SKIP = {
    "q16_rollup": "Spark rollup emits no grand-total row on empty input",
    "q20_cube": "Spark cube emits no grand-total row on empty input",
    "q21_grouping_sets": "Spark grouping sets emit no () row on empty input",
}


@pytest.fixture(scope="module")
def empty_star_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_star")
    for name, table in _star_tables().items():
        pq.write_table(table.slice(0, 0), str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def empty_star_duck(empty_star_dir):
    con = duckdb.connect()
    for t in _STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{empty_star_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", STAR_QUERIES)
def test_query_survives_empty_tables(name, spark, empty_star_dir, empty_star_duck):
    """Zero-row tables: aggregates, joins, windows, and the write paths
    must all degrade to empty (or standard-NULL) results identically on
    both engines — no crashes, no schema loss."""
    if name in EMPTY_SKIP:
        pytest.skip(EMPTY_SKIP[name])
    spark_pdf = QUERIES[name](spark, empty_star_dir).toPandas()
    oracle_pdf = empty_star_duck.execute(ORACLE[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, f"empty-star:{name}")
