#!/usr/bin/env python
"""Hardware-ceiling calibration for the sandbox scaling protocol.

The north rule demands >= 0.8 throughput scaling efficiency from N to 4N
executors. Before attributing any Spark measurement to the engine, measure
what THIS BOX can physically deliver between the same two parallelism
levels, because two environment properties put a hard ceiling on high-level
pairs that no engine code can beat (measured, see BENCH/BASELINE.md):

1. multiprocess pure-CPU scaling (python sha256 workers, one process per
   core) — the "ideal cluster" ceiling: separate address spaces, like real
   executors on separate nodes;
2. single-process multithread scaling (plain Java arithmetic threads, no
   allocation, no locks) — the ceiling for ONE local-mode Spark JVM, which
   is what the sandbox substitutes for a cluster. On this box threads in
   one process scale distinctly worse than processes at high counts
   (guest "32 cores" behave like 16 physical cores + SMT for port-bound
   code, and the sandboxed kernel's trapped futex/mmap penalizes
   thread-dense processes) — a local[32] JVM is NOT 4x a local[8] JVM
   even for pure register arithmetic.

Usage: python scripts/calibrate_box.py [--levels 2,8,32] [--out BENCH/calibration.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time
from multiprocessing import Process

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUSY_JAVA = """
public class Busy {
    public static void main(String[] a) throws Exception {
        int n = Integer.parseInt(a[0]);
        long iters = 2_000_000_000L;
        Thread[] ts = new Thread[n];
        long t0 = System.nanoTime();
        for (int i = 0; i < n; i++) {
            ts[i] = new Thread(() -> {
                long s = 0;
                for (long j = 0; j < iters; j++) s += j % 7 + j % 13;
                if (s == 42) System.out.println("x");
            });
            ts[i].start();
        }
        for (Thread t : ts) t.join();
        double dt = (System.nanoTime() - t0) / 1e9;
        System.out.printf("%.4f%n", n * iters / dt / 1e9);
    }
}
"""


def _sha_worker(iters: int) -> None:
    b = b"x" * 65536
    for _ in range(iters):
        b = hashlib.sha256(b).digest() + b[:65504]


def python_procs_rate(nproc: int, iters: int = 20000) -> float:
    """Aggregate sha256 rate of ``nproc`` pinned worker PROCESSES."""
    os.sched_setaffinity(0, set(range(nproc)))
    t0 = time.time()
    ps = [Process(target=_sha_worker, args=(iters,)) for _ in range(nproc)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return nproc * iters / (time.time() - t0)


def java_threads_rate(nthreads: int, workdir: str) -> float:
    """Aggregate arithmetic rate (Gop/s) of ``nthreads`` threads in ONE JVM."""
    java = os.path.join(os.environ.get("JAVA_HOME", "/usr"), "bin", "java")
    src = os.path.join(workdir, "Busy.java")
    if not os.path.exists(src):
        with open(src, "w") as f:
            f.write(BUSY_JAVA)
    out = subprocess.run(
        ["taskset", "-c", f"0-{nthreads - 1}", java, src, str(nthreads)],
        capture_output=True,
        text=True,
        cwd=workdir,
        check=True,
    )
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8,32")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "calibration.json"))
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    work = tempfile.mkdtemp(prefix="ams_calib_")
    result: dict = {"levels": levels, "python_procs": {}, "java_threads": {}}
    for lv in levels:
        pp = max(python_procs_rate(lv) for _ in range(args.trials))
        jt = max(java_threads_rate(lv, work) for _ in range(args.trials))
        result["python_procs"][str(lv)] = round(pp, 1)
        result["java_threads"][str(lv)] = round(jt, 3)
        print(f"level {lv}: python_procs {pp:.0f} sha/s, java_threads {jt:.2f} Gop/s",
              file=sys.stderr)

    def eff(table: dict, lo: int, hi: int) -> float:
        return round(table[str(hi)] / table[str(lo)] / (hi / lo), 3)

    pairs = [(levels[i], levels[j]) for i in range(len(levels))
             for j in range(len(levels)) if levels[j] == 4 * levels[i]]
    result["pair_efficiency"] = {
        f"{lo}->{hi}": {
            "python_procs": eff(result["python_procs"], lo, hi),
            "java_threads": eff(result["java_threads"], lo, hi),
        }
        for lo, hi in pairs
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
