#!/usr/bin/env python
"""Multi-batch tail bench (round-5 item: quantify per-batch fixed costs).

The 30M-event scaling evidence replays in ONE availableNow micro-batch
(`lineage_batches: 1`), so per-batch fixed costs — schema-probe collect,
lineage aggregation, snapshot commit, offset/commit log writes — are paid
once and amortized over the whole feed. A production tail pays them per
micro-batch. This bench replays the SAME feed twice at local[32]:

  single : availableNow, no rate limit            -> 1 micro-batch
  multi  : availableNow + maxFilesPerTrigger=F/16 -> >= 16 micro-batches

both to steady state (bench.replay_until_steady's stop rule — the sandbox's
throttled JIT makes early trials measure compilation), and reports
throughput at both shapes plus the derived per-batch overhead:

  overhead_per_batch = (t_multi - t_single) / (n_batches - 1)

Feed, tables and checkpoints live on /dev/shm (the node-local-SSD analogue
scaling_bench.py documents); results go to BENCH/multibatch.json.

Usage: python scripts/multibatch_bench.py [--events 30000000] [--files 64]
                                          [--batches 16] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=30_000_000)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    # shuffle scratch + work dir on tmpfs (see scaling_bench.py: the
    # sandbox's virtualized disk adds fixed per-commit syscall costs no
    # production deployment sees — fatal to a bench whose whole point is
    # isolating per-batch fixed costs)
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        scratch = "/dev/shm/ams_spark_scratch"
        os.makedirs(scratch, exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = scratch
    work_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="ams_multibatch_", dir=work_root)

    from airbyte_module_spark import get_spark
    from airbyte_module_spark.sources.generator import generate_feed_spark
    from bench import replay_until_steady

    spark = get_spark(
        app_name="multibatch",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    try:
        feed = os.path.join(work, "feed")
        t0 = time.time()
        generate_feed_spark(
            spark,
            args.events,
            n_keys=max(args.events // 20, 1000),
            content_bytes=200,
        ).repartition(args.files).write.mode("overwrite").text(feed)
        gen_sec = round(time.time() - t0, 1)
        print(f"generated {args.events} events in {gen_sec}s", file=sys.stderr)

        max_files = max(1, args.files // args.batches)
        out = {
            "n_events": args.events,
            "n_feed_files": args.files,
            "cpus": args.cpus,
            "modes": {},
        }
        for mode, mft in (("single", None), ("multi", max_files)):
            trials, eng = replay_until_steady(
                spark,
                feed,
                work,
                tag=mode,
                min_runs=args.repeats,
                max_runs=args.repeats + 4,
                max_files_per_trigger=mft,
            )
            best = min(range(len(trials)), key=lambda i: trials[i])
            n_batches = len(eng.lineage())
            # r6 attribution: per-batch engine phases accumulated across
            # the LAST trial (pipeline.batch_profiles) + Structured
            # Streaming's own per-trigger durationMs breakdown
            # (StreamingQueryProgress) — latestOffset is the per-trigger
            # file-source listing, walCommit/commitOffsets the checkpoint
            # log writes, addBatch wraps the foreachBatch sink (our
            # apply_batch + post-commit), triggerExecution the whole
            # trigger; trigger gaps = replay wall minus triggerExecution.
            phases: dict[str, float] = {}
            for p in eng.pipeline.batch_profiles:
                for k, v in p.items():
                    phases[k] = round(phases.get(k, 0.0) + v, 3)
            stream: dict[str, float] = {}
            for pr in eng.pipeline.stream_progress:
                for k, v in pr.get("durationMs", {}).items():
                    stream[k] = round(stream.get(k, 0.0) + v / 1000.0, 3)
            out["modes"][mode] = {
                "max_files_per_trigger": mft,
                "n_batches": n_batches,
                "replay_sec": min(trials),
                "events_per_sec": round(args.events / min(trials), 1),
                "trials": [round(t, 3) for t in trials],
                "final_rows": eng.read().count(),
                # NB: phase sums describe the LAST trial (profiles reset
                # per replay), not the best one — a representative steady-
                # state attribution, while replay_sec stays min-of-trials
                "last_trial_engine_phases": phases,
                "last_trial_stream_duration_sec": stream,
            }
            print(f"{mode}: {out['modes'][mode]}", file=sys.stderr)

        single = out["modes"]["single"]
        multi = out["modes"]["multi"]
        extra_batches = multi["n_batches"] - single["n_batches"]
        out["overhead_per_batch_sec"] = round(
            (multi["replay_sec"] - single["replay_sec"]) / max(extra_batches, 1), 3
        )
        out["throughput_ratio_multi_vs_single"] = round(
            multi["events_per_sec"] / single["events_per_sec"], 3
        )
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "multibatch.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
