#!/usr/bin/env python3
"""Multi-JVM aggregate-throughput proxy (reproducible form of the
BENCH.md "multi-JVM proxy" measurement).

The 8→32 scaling analysis attributes the 32-wide shortfall to the
sandbox's single shared driver JVM — one Arrow/scheduler/result-fetch
service pool feeding all 32 Python workers — which a real cluster
multiplies per executor.  This harness makes that claim re-runnable:
it splits the same silicon into ``--jvms`` taskset-pinned slices, runs
one ``local[cores/jvms]`` Spark JVM per slice over the SAME sf0.1
extraction workload, synchronizes measurement with a filesystem
barrier (every JVM warms up first, then all measure the same wall
window — no startup stagger inflating anyone's quiet time), and
reports per-JVM and aggregate turns/s.

    python3 tools/multi_jvm_bench.py --jvms 2        # two local[16]
    python3 tools/multi_jvm_bench.py --jvms 1        # local[32] control

Run both in one session and compare aggregates; BENCH.md round 4
measured 25,934 (one JVM) vs 28,576 (two) on the same 32 cores.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(slice_idx: int, cores: int, barrier_dir: str, passes: int) -> None:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from html_parser_spark.fixtures import ensure_transcripts
    from html_parser_spark.operators.pipeline import run_extraction
    from html_parser_spark.plans.session import get_spark

    spark = get_spark(
        app_name=f"mjvm-{slice_idx}", master=f"local[{cores}]"
    )
    transcripts = spark.read.parquet(ensure_transcripts(0.1))
    n_turns = transcripts.count()

    def one_pass() -> float:
        t0 = time.time()
        agg = run_extraction(transcripts).select(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("main_text"))
        ).first()
        assert agg["n"] == n_turns
        return time.time() - t0

    one_pass()  # warm: Python workers fork+import, JVM C2 compiles
    # barrier: signal ready, then wait for the parent's go file so every
    # JVM measures the same wall window (fully overlapped contention)
    open(os.path.join(barrier_dir, f"ready{slice_idx}"), "w").close()
    go = os.path.join(barrier_dir, "go")
    while not os.path.exists(go):
        time.sleep(0.2)
    span0 = time.time()
    walls = [one_pass() for _ in range(passes)]
    print(
        json.dumps(
            {
                "slice": slice_idx,
                "cores": cores,
                "walls": [round(w, 2) for w in walls],
                "turns_per_sec": round(n_turns * passes / sum(walls), 1),
                "span": [round(span0, 2), round(time.time(), 2)],
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jvms", type=int, default=2)
    ap.add_argument("--total-cores", type=int, default=os.cpu_count())
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--cores", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--barrier", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        _worker(args.worker, args.cores, args.barrier, args.passes)
        return

    per = args.total_cores // args.jvms
    barrier = tempfile.mkdtemp(prefix="mjvm_")
    procs = []
    for i in range(args.jvms):
        lo, hi = i * per, (i + 1) * per - 1
        procs.append(
            subprocess.Popen(
                [
                    "taskset", "-c", f"{lo}-{hi}",
                    sys.executable, os.path.abspath(__file__),
                    "--worker", str(i), "--cores", str(per),
                    "--barrier", barrier, "--passes", str(args.passes),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
            )
        )
    # release the barrier once every JVM has warmed up; a worker that
    # died before signaling ready must fail the run, not hang it — and
    # a failed run must not strand the surviving JVMs polling a "go"
    # file that will never appear (they'd hold their pinned cores +
    # heap until killed by hand)
    results = []
    try:
        while sum(
            os.path.exists(os.path.join(barrier, f"ready{i}"))
            for i in range(args.jvms)
        ) < args.jvms:
            for i, p in enumerate(procs):
                if p.poll() is not None and not os.path.exists(
                    os.path.join(barrier, f"ready{i}")
                ):
                    raise RuntimeError(
                        f"worker {i} exited {p.returncode} before warmup"
                    )
            time.sleep(0.5)
        open(os.path.join(barrier, "go"), "w").close()
        for i, p in enumerate(procs):
            out, _ = p.communicate()
            got = [
                json.loads(line)
                for line in (ln.strip() for ln in out.splitlines())
                if line.startswith("{")
            ]
            if not got:
                # a worker that died mid-measurement must fail the run:
                # summing the survivors would report an undercounted
                # aggregate as a valid scaling number
                raise RuntimeError(
                    f"worker {i} produced no result (exit {p.returncode})"
                )
            results.extend(got)
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
    agg = round(sum(r["turns_per_sec"] for r in results), 1)
    spans = [r["span"] for r in results]
    overlap = round(
        max(0.0, min(s[1] for s in spans) - max(s[0] for s in spans)), 1
    )
    print(
        json.dumps(
            {
                "metric": "multi_jvm_aggregate_turns_per_sec",
                "jvms": args.jvms,
                "cores_per_jvm": per,
                "per_jvm": {str(r["slice"]): r["turns_per_sec"] for r in results},
                "aggregate": agg,
                "overlap_sec": overlap,
            }
        )
    )


if __name__ == "__main__":
    main()
