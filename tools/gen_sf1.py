"""Generate an sf1 fixture (10x sf0.1, seed 42) for the heavy-family
scale bench (r10 verdict #3): documents, embeddings, events, orders,
lineitem — the five tables the top-10 bench rows read.

NOT a replacement for /root/testdata (read-only, driver-owned): this
is bench-only data whose DISTRIBUTIONS match the sf0.1 fixture in the
dimensions that drive cost — row counts (10x), per-entity event rates
(constant: 10x users), key cardinalities (10x), vocabulary, word- and
value-ranges, duplicate rates (10x the 8 planted exact-dup texts),
isotropic unit embeddings (sf0.1 has zero planted near-dup vectors —
measured), and the non-unique (l_orderkey, l_linenumber) shape.
Distribution parameters were measured from /root/testdata/sf0.1 (see
COVERAGE.md round-11 scale notes).

Usage: python tools/gen_sf1.py [out_dir]   (default /root/repo/.sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# measured from sf0.1 documents
VOCAB = None  # loaded from sf0.1 below
LANG_P = {"en": 0.4118, "zh": 0.1506, "es": 0.1488, "fr": 0.1484, "de": 0.1404}

DAY_US = 86_400_000_000


def _load_vocab(sf01_dir: str) -> list[str]:
    import duckdb

    texts = (
        duckdb.connect()
        .execute(
            "select text from read_parquet(?) limit 3000",
            [os.path.join(sf01_dir, "documents.parquet")],
        )
        .df()
        .text
    )
    words = sorted({w for t in texts for w in t.split()})
    assert 20 <= len(words) <= 60, f"unexpected vocab size {len(words)}"
    return words


def gen_documents(out: str, n: int, rng: np.random.Generator, vocab: list[str]):
    n_words = rng.integers(10, 101, n)
    langs = rng.choice(list(LANG_P), n, p=np.array(list(LANG_P.values())) / sum(LANG_P.values()))
    v = np.array(vocab)
    texts = []
    for k in n_words:
        texts.append(" ".join(v[rng.integers(0, len(v), k)]) + " ")
    # plant exact duplicates at the sf0.1 rate (8 per 5000 docs)
    for _ in range(round(n * 8 / 5000)):
        dst, src = rng.integers(0, n, 2)
        texts[dst] = texts[src]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_embeddings(out: str, n: int, rng: np.random.Generator, dim: int = 64):
    E = rng.standard_normal((n, dim)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(E), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def gen_events(out: str, n: int, n_users: int, rng: np.random.Generator):
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = base + rng.integers(0, 30 * DAY_US, n)
    types = np.array(["signup", "view", "click", "purchase", "error"])
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.sort(ts).view("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
            "event_type": pa.array(types[rng.integers(0, 5, n)], pa.string()),
            "value": pa.array(np.round(rng.uniform(0, 500, n), 2), pa.float64()),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, n)], pa.string()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def gen_orders(out: str, n: int, n_cust: int, rng: np.random.Generator):
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    d1 = np.datetime64("2001-08-02", "us").astype(np.int64)
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    stat = np.array(["O", "F", "P"])
    tbl = pa.table(
        {
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n), pa.int64()),
            "o_orderstatus": pa.array(stat[rng.integers(0, 3, n)], pa.string()),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 500000, n), 2), pa.float64()
            ),
            "o_orderdate": pa.array(
                (d0 + (rng.integers(0, (d1 - d0) // DAY_US, n)) * DAY_US).view(
                    "datetime64[us]"
                )
            ),
            "o_orderpriority": pa.array(prios[rng.integers(0, 5, n)], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "orders.parquet"))


def gen_lineitem(out: str, n: int, n_orders: int, rng: np.random.Generator):
    d0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    d1 = np.datetime64("2001-11-05", "us").astype(np.int64)
    rf = np.array(["R", "A", "N"])
    ls = np.array(["O", "F"])
    tbl = pa.table(
        {
            "l_orderkey": pa.array(rng.integers(0, n_orders, n), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_orders // 75 * 10, n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_orders // 150, n), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, n), pa.int32()),
            "l_quantity": pa.array(
                rng.integers(1, 51, n).astype(np.float64), pa.float64()
            ),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900, 100000, n), 2), pa.float64()
            ),
            "l_discount": pa.array(
                np.round(rng.uniform(0, 0.1, n), 2), pa.float64()
            ),
            "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n), 2), pa.float64()),
            "l_returnflag": pa.array(rf[rng.integers(0, 3, n)], pa.string()),
            "l_linestatus": pa.array(ls[rng.integers(0, 2, n)], pa.string()),
            "l_shipdate": pa.array(
                (d0 + (rng.integers(0, (d1 - d0) // DAY_US, n)) * DAY_US).view(
                    "datetime64[us]"
                )
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "lineitem.parquet"))


def gen_dims(out: str, scale: int, rng: np.random.Generator) -> None:
    """region/nation are fixed; customer/supplier/part scale 10x with
    the sf0.1 value domains (measured)."""
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
                    pa.string(),
                ),
            }
        ),
        os.path.join(out, "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        os.path.join(out, "nation.parquet"),
    )
    nc = 15_000 * scale
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(nc), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(nc)], pa.string()
                ),
                "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-999, 10000, nc), 2), pa.float64()
                ),
                "c_mktsegment": pa.array(
                    np.array(
                        ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
                    )[rng.integers(0, 5, nc)],
                    pa.string(),
                ),
            }
        ),
        os.path.join(out, "customer.parquet"),
    )
    ns = 1_000 * scale
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(ns), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(ns)], pa.string()
                ),
                "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-999, 10000, ns), 2), pa.float64()
                ),
            }
        ),
        os.path.join(out, "supplier.parquet"),
    )
    npart = 20_000 * scale
    adj = np.array(["small", "new", "red", "cold", "blue", "old", "large", "hot"])
    noun = np.array(["gizmo", "ring", "gear", "widget", "bolt", "plate", "rod", "anvil"])
    types = np.array(["ECONOMY", "SMALL", "LARGE", "STANDARD", "MEDIUM", "PROMO"])
    names = [
        f"{a} {b}"
        for a, b in zip(
            adj[rng.integers(0, 8, npart)], noun[rng.integers(0, 8, npart)]
        )
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(npart), pa.int64()),
                "p_name": pa.array(names, pa.string()),
                "p_brand": pa.array(
                    [f"Brand#{k}" for k in rng.integers(1, 26, npart)], pa.string()
                ),
                "p_type": pa.array(types[rng.integers(0, 6, npart)], pa.string()),
                "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
                "p_retailprice": pa.array(
                    np.round(900 + (np.arange(npart) % 10_000) * 0.1, 2),
                    pa.float64(),
                ),
            }
        ),
        os.path.join(out, "part.parquet"),
    )


def main(out: str = "/root/repo/.sf1", scale: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    vocab = _load_vocab("/root/testdata/sf0.1")
    gen_documents(out, 5_000 * scale, rng, vocab)
    gen_embeddings(out, 2_000 * scale, rng)
    gen_events(out, 100_000 * scale, 1_500 * scale, rng)
    gen_orders(out, 150_000 * scale, 15_000 * scale, rng)
    gen_lineitem(out, 600_000 * scale, 150_000 * scale, rng)
    gen_dims(out, scale, rng)
    print(f"sf{scale/10:g} fixture written to {out}")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/root/repo/.sf1"]))
