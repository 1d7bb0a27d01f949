"""Alternated A/B of named queries under SQL-conf variants (guide §1).

Usage:
    python tools/ab_conf.py NAME[,NAME...] --confs "k=v;k2=v2" \
        [--repeats 5] [--rounds 3] [--cpus N] [--sf DIR]

Runs each named query ``repeats`` times per round, alternating
baseline / variant across ``rounds`` rounds in ONE session (confs are
runtime-settable SQL confs, restored between legs), and prints
min/median per leg. Alternation + min-of-N is the box's documented
defense against its episodic scratch-latency spikes; the io-probe
brackets each round.
"""

from __future__ import annotations

import argparse
import os
import statistics
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--confs", required=True, help="k=v;k2=v2 variant confs")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from python_openetl_spark.session import get_spark
    from python_openetl_spark.workload import all_queries

    cores = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("ab_conf", master=f"local[{cores}]", shuffle_partitions=max(cores, 16))
    spark.sparkContext.setLogLevel("ERROR")

    variant = dict(
        kv.split("=", 1) for kv in args.confs.split(";") if kv.strip()
    )
    baseline = {k: spark.conf.get(k, None) for k in variant}

    queries = all_queries()
    needles = [s.strip() for s in args.names.split(",") if s.strip()]
    names = [n for n in sorted(queries) if any(s in n for s in needles)]
    if not names:
        raise SystemExit(f"no queries match {needles}")

    from python_openetl_spark.io import load_tables

    for df in load_tables(spark, args.sf).values():
        df.count()

    import bench

    results: dict[tuple[str, str], list[float]] = {}
    for rnd in range(args.rounds):
        probe = bench._io_probe(spark, repeats=3)
        print(f"# round {rnd}: io_probe={probe}s", flush=True)
        for leg, confs in (("base", baseline), ("variant", variant)):
            for k, v in confs.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            for name in names:
                fn = queries[name]
                spark.sparkContext.setJobDescription(f"ab:{leg}:{name}")
                for _ in range(args.repeats):
                    t0 = time.time()
                    fn(spark, args.sf).count()
                    results.setdefault((name, leg), []).append(
                        round(time.time() - t0, 3)
                    )
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()

    for name in names:
        line = [name]
        for leg in ("base", "variant"):
            runs = sorted(results[(name, leg)])
            line.append(
                f"{leg}: min={runs[0]} med={statistics.median(runs)} ({runs})"
            )
        print("  ".join(line), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
