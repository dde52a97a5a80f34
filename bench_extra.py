#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times each declared query with
BOTH the driver's methodology (.collect()) and a noop sink (computation
only, no driver row transfer), so compute cost and collect cost separate.

Usage:
  python bench_extra.py [--sf-dir D] [--trials N] [--queries a,b,c]
                        [--explain-dir plans/r06] [--suffix _before]

Writes one JSON line per query to stdout and (optionally) the
.explain("formatted") text to <explain-dir>/<query><suffix>.txt.

This file is NOT bench.py: the frozen driver bench is untouched; numbers
here are cited in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from airbyte_module_spark import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def time_query(spark, fn, sf_dir, trials, mode):
    times = []
    for _ in range(trials):
        t0 = time.time()
        df = fn(spark, sf_dir)
        if mode == "collect":
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--queries", default="")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--modes", default="collect,noop")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    qs = entry_mod.queries()
    names = [n for n in args.queries.split(",") if n] or list(qs)
    modes = args.modes.split(",")

    out = {}
    for name in names:
        fn = qs[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            plan = fn(spark, args.sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        rec = {}
        for mode in modes:
            spark.sparkContext.setJobDescription(f"{name}:{mode}")
            ts = time_query(spark, fn, args.sf_dir, args.trials, mode)
            rec[mode] = {"min": min(ts), "trials": ts}
            spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
    print(json.dumps({"summary": {n: {m: v[m]["min"] for m in v} for n, v in out.items()},
                      "sf_dir": args.sf_dir, "cpus": cpus}), flush=True)


if __name__ == "__main__":
    main()
