#!/usr/bin/env python
"""Parallel Flight read throughput evidence (round-5 item).

get_flight_info on a lake-table asset returns one endpoint PER LIVE BUCKET
(server.py) — a parallel-read shape the reference's single ticket/endpoint
structurally cannot express (abm/server.py:253; union-equality of the
slices is pinned by tests/test_server.py). This bench measures what that
structure BUYS: aggregate MB/s of N concurrent clients, one per bucket
endpoint, versus ONE client draining the whole asset on a single stream.

Why parallel wins: a single do_get stream is serialized end to end — one
toLocalIterator with one partition in flight, one gRPC stream, one client
deserializer. Per-bucket streams overlap executor scan, driver IPC hop,
gRPC transfer and client decode across buckets; on a real cluster each
endpoint would additionally be served from a different node.

Method: table populated once (upsert of synthetic wide rows), then each
mode runs to steady state (best of --repeats trials; first trials pay the
sandbox's throttled JIT). Bytes counted = sum of Arrow batch nbytes on the
client side — identical payload both modes, asserted. Results ->
BENCH/parallel_read.json.

Usage: python scripts/parallel_read_bench.py [--rows 400000] [--buckets 16]
                                             [--repeats 4] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def drain(client, ticket) -> tuple[int, int]:
    """Read one stream fully; return (rows, bytes)."""
    rows = nbytes = 0
    for chunk in client.do_get(ticket):
        b = chunk.data
        rows += b.num_rows
        nbytes += b.nbytes
    return rows, nbytes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import pyarrow.flight as fl

    from airbyte_module_spark import Engine, get_spark
    from airbyte_module_spark.server import EngineFlightServer

    spark = get_spark(
        app_name="parallel-read-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    work = tempfile.mkdtemp(prefix="ams_pread_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    try:
        eng = Engine(
            spark, os.path.join(work, "t"), key_columns=["id"], n_buckets=args.buckets
        )
        # ~300 B/row of compressible-but-not-constant payload
        df = spark.range(args.rows).selectExpr(
            "cast(id as string) AS id",
            "sha2(cast(id as string), 256) AS h1",
            "sha2(cast(id + 1 as string), 256) AS h2",
            "repeat(cast(id % 97 as string), 60) AS pad",
            "cast(id % 1000 as double) AS score",
        )
        eng.write(df, mode="upsert")

        with EngineFlightServer({"asset": eng}) as server:
            loc = f"grpc://127.0.0.1:{server.port}"
            info = fl.connect(loc).get_flight_info(
                fl.FlightDescriptor.for_command(b"asset")
            )
            endpoints = list(info.endpoints)
            single_ticket = fl.Ticket(json.dumps({"asset_name": "asset"}).encode())

            def run_single() -> tuple[float, int, int]:
                c = fl.connect(loc)
                t0 = time.time()
                rows, nbytes = drain(c, single_ticket)
                return time.time() - t0, rows, nbytes

            def run_parallel() -> tuple[float, int, int]:
                clients = [fl.connect(loc) for _ in endpoints]
                t0 = time.time()
                with ThreadPoolExecutor(max_workers=len(endpoints)) as pool:
                    parts = list(
                        pool.map(
                            lambda ce: drain(ce[0], ce[1].ticket),
                            zip(clients, endpoints),
                        )
                    )
                dt = time.time() - t0
                return dt, sum(p[0] for p in parts), sum(p[1] for p in parts)

            out = {
                "rows": args.rows,
                "n_buckets": args.buckets,
                "n_endpoints": len(endpoints),
                "cpus": args.cpus,
                "modes": {},
            }
            totals = {}
            for mode, fn in (("single_stream", run_single), ("parallel_buckets", run_parallel)):
                trials = []
                for _ in range(args.repeats):
                    dt, rows, nbytes = fn()
                    trials.append(round(dt, 3))
                    totals[mode] = (rows, nbytes)
                best = min(trials)
                rows, nbytes = totals[mode]
                out["modes"][mode] = {
                    "trials_sec": trials,
                    "best_sec": best,
                    "rows": rows,
                    "payload_mb": round(nbytes / 1e6, 1),
                    "mb_per_sec": round(nbytes / 1e6 / best, 1),
                    "rows_per_sec": round(rows / best, 1),
                }
                print(f"{mode}: {out['modes'][mode]}", file=sys.stderr)

            s, p = out["modes"]["single_stream"], out["modes"]["parallel_buckets"]
            assert s["rows"] == p["rows"], "slices must union to the full asset"
            out["speedup_parallel_vs_single"] = round(
                p["mb_per_sec"] / s["mb_per_sec"], 2
            )
            os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
            with open(os.path.join(REPO, "BENCH", "parallel_read.json"), "w") as f:
                json.dump(out, f, indent=1)
            print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
