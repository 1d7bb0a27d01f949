"""Per-query profiler for the optimization rounds (guide §1).

Usage:
    python tools/profile_query.py NAME[,NAME...] [--repeats N] [--sf DIR]
        [--plan-dir plans/r14 --plan-suffix before]

For each named query: runs it ``repeats`` times with the same action the
bench uses (``df.count()``), plus once with the noop sink (computes every
column, guide §1.4) so we can see when count() under-reports; prints both
timings; optionally writes ``{plan_dir}/{name}_{suffix}.txt`` with the
``explain("formatted")`` output. Jobs are labelled with
``setJobDescription`` (guide §1.5).
"""

from __future__ import annotations

import argparse
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan-dir", default=None)
    ap.add_argument("--plan-suffix", default="before")
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink run")
    ap.add_argument("--plan-only", action="store_true", help="skip timing; just write plans")
    args = ap.parse_args()

    from python_openetl_spark.session import get_spark
    from python_openetl_spark.workload import all_queries

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("profile", master=f"local[{cores}]", shuffle_partitions=max(cores, 16))
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    needles = [s.strip() for s in args.names.split(",") if s.strip()]
    names = [n for n in sorted(queries) if any(s in n for s in needles)]
    if not names:
        raise SystemExit(f"no queries match {needles}")

    # same warmup tables the bench counts, so scan setup is off the clock
    from python_openetl_spark.io import load_tables

    for df in load_tables(spark, args.sf).values():
        df.count()

    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs = []
        rows = 0
        for _ in range(0 if args.plan_only else args.repeats):
            t0 = time.time()
            df = fn(spark, args.sf)
            rows = df.count()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        runs.sort()
        runs = runs or [0.0]
        noop_s = ""
        if args.noop:
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            noop_s = f"  noop={round(time.time() - t0, 3)}s"
            spark.catalog.clearCache()
        print(f"{name}: rows={rows} min={runs[0]}s runs={runs}{noop_s}", flush=True)
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(args.plan_dir, f"{name}_{args.plan_suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"  plan -> {path}", flush=True)
        spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
