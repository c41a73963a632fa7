"""Multi-core host-cleanliness gate for scaling campaigns.

The sandbox VM throttles sustained MULTI-core load on an hours scale while
single-core probes keep reading clean (BENCH/BASELINE.md, rounds 2-4).  A
campaign launched into a throttled window burns 10+ minutes and yields only
garbage legs.  This probe runs N independent pure-Python ALU processes
(fixed work each, no memory traffic, no Spark) and reports the wall clock —
the cheapest observable that actually co-varies with the throttle.

Usage:  python tools/host_gate.py [nprocs] [iters]
Prints one JSON line {"nprocs": .., "wall_s": .., "clean": bool}.
Exit code 0 if clean (wall <= GATE_CLEAN_SEC), 1 otherwise.

Calibration 2026-08-17 (this VM, clean window): 16 procs x 2M iters ≈
0.75-0.95 s.  Threshold 1.4 s leaves headroom for scheduler jitter while
rejecting the 2-3x throttled windows this round measured.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

GATE_CLEAN_SEC = 1.4


def _work(iters: int) -> int:
    x = 0x9E3779B97F4A7C15
    for i in range(iters):
        x = ((x ^ (x >> 13)) * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF
        x ^= i
    return x


def measure(nprocs: int = 16, iters: int = 2_000_000) -> float:
    with mp.Pool(nprocs) as pool:
        t0 = time.perf_counter()
        pool.map(_work, [iters] * nprocs)
        return time.perf_counter() - t0


def main() -> int:
    nprocs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    wall = measure(nprocs, iters)
    # the calibration is per-process work (ALU-bound, ~linear in iters and
    # flat in nprocs up to the 16-21 honest cores) — scale the threshold so
    # non-default arguments keep a meaningful gate
    threshold = GATE_CLEAN_SEC * (iters / 2_000_000) * max(1.0, nprocs / 16.0)
    clean = wall <= threshold
    print(json.dumps({"nprocs": nprocs, "iters": iters,
                      "wall_s": round(wall, 3),
                      "threshold_s": round(threshold, 3), "clean": clean}))
    return 0 if clean else 1


if __name__ == "__main__":
    sys.exit(main())
