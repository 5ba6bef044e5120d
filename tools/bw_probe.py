#!/usr/bin/env python3
"""Aggregate-DRAM-bandwidth probe (STREAM-triad convention).

Measures the box's *aggregate* memory bandwidth at 1/2/4/8/16 pinned cores so the
dedup pipeline's parallel-scaling ceiling can be compared against the memory
system's own saturation point. Each worker process is pinned to its own CPU and
runs `a = b + 0.5*c` over arrays far larger than LLC; traffic is counted STREAM
style (3 x 8 bytes/element/iteration). Workers barrier-sync, run a warm-up pass
first (this VM's first-touch host paging runs ~40x slower than warm pages — see
BASELINE.md), then time a fixed iteration count.

Usage: python tools/bw_probe.py [--elems 16777216] [--iters 20] [--out file.jsonl]

Evidence context: BASELINE.json's north_rule asks for >=0.8 throughput scaling
efficiency N->4N *executors*. On this single box every executor shares one DRAM
system; if aggregate bandwidth saturates between 4 and 16 cores, a 4->16
executor pair measures the memory wall, not the plan's scalability. This probe
makes that a measurement instead of an argument.
"""
import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np


def _worker(cpu, elems, iters, barrier, out_q, kernel):
    os.sched_setaffinity(0, {cpu})
    rng = np.random.default_rng(cpu)
    a = np.zeros(elems, dtype=np.float64)
    b = rng.random(elems)
    if kernel == "triad":
        c = np.random.default_rng(cpu + 1000).random(elems)
        # warm-up: fault every page of all three arrays (numpy is AOT, no JIT)
        for _ in range(2):
            np.add(b, 0.5 * c, out=a)
        barrier.wait()
        t0 = time.perf_counter()
        for _ in range(iters):
            np.multiply(c, 0.5, out=a)   # a = 0.5*c   (read c, write a)
            np.add(a, b, out=a)          # a += b      (read a, read b, write a)
        t1 = time.perf_counter()
        # STREAM triad convention is 24 B/element/iter; our two-op form moves
        # (8+8) + (8+8+8) = 40 B/element/iter without RFO accounting.
        bytes_moved = 40 * elems * iters
    else:  # gather: random-index reads — the shuffle/hash-join access shape.
        idx = rng.integers(0, elems, size=elems, dtype=np.int64)
        for _ in range(2):
            np.take(b, idx, out=a)
        barrier.wait()
        t0 = time.perf_counter()
        for _ in range(iters):
            np.take(b, idx, out=a)       # read idx (8B) + random-read b + write a
        t1 = time.perf_counter()
        # Useful bytes: 8 (idx) + 8 (b element, ignoring the 64B line actually
        # pulled) + 8 (a write) per element — report useful-byte throughput;
        # the point is the *scaling shape*, not the absolute number.
        bytes_moved = 24 * elems * iters
    out_q.put((cpu, t1 - t0, bytes_moved))


def run_width(n_cores, elems, iters, kernel="triad"):
    barrier = mp.Barrier(n_cores)
    out_q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(cpu, elems, iters, barrier, out_q, kernel))
        for cpu in range(n_cores)
    ]
    for p in procs:
        p.start()
    results = [out_q.get() for _ in range(n_cores)]
    for p in procs:
        p.join()
    # Aggregate bandwidth over the synced window: total bytes / slowest worker.
    total_bytes = sum(r[2] for r in results)
    wall = max(r[1] for r in results)
    return total_bytes / wall / 1e9, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elems", type=int, default=16 * 1024 * 1024)  # 128 MiB/array
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--widths", type=str, default="1,2,4,8,16")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--kernel", choices=["triad", "gather"], default="triad")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument(
        "--quick", action="store_true",
        help="1-core triad only, 1 repeat, print the bare GB/s number — the "
        "scaling harness's DRAM-interference gate (co-tenant bandwidth "
        "pressure does NOT show up as steal time; a depressed 1-core triad "
        "is the cheap observable for it — BASELINE.md 'Measurement noise')",
    )
    args = ap.parse_args()
    if args.quick:
        gbs, _ = run_width(1, args.elems, max(args.iters, 10))
        print(round(gbs, 2))
        return

    desc = {
        "triad": "triad(a=b+0.5c), 40B/elem/iter, 128MiB arrays",
        "gather": "gather(a=b[randidx]), 24 useful B/elem/iter, 128MiB arrays",
    }[args.kernel]
    rows = []
    for w in [int(x) for x in args.widths.split(",")]:
        best = 0.0
        for _ in range(args.repeats):
            gbs, wall = run_width(w, args.elems, args.iters, args.kernel)
            best = max(best, gbs)
        row = {
            "metric": f"aggregate_dram_bandwidth_{args.kernel}",
            "unit": "GB/s",
            "cores": w,
            "value": round(best, 2),
            "per_core": round(best / w, 2),
            "kernel": "%s, best-of-%d" % (desc, args.repeats),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
