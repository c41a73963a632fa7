"""Round-5 clean-window measurement orchestrator.

Runs the round's measurement backlog inside Spark-pilot-verified clean
windows (the only probe that sees the JVM throttle — see spark_pilot.py),
re-gating before each unit of work and looping so the strong-scaling series
accumulate best-pairs across windows (SCALING_MERGE=1):

  1. realistic-profile scaling @ 1.2M   — write-heavy-fraction hypothesis
                                          (1.4% planted rate vs 39.8%)
  2. phase profile local[16] @ 1.2M     — retry (first attempt throttled)
  3. sf1 bench                          — once, first clean cycle
  4. scaling @ 2.4M convs (61M turns)
  5. scaling @ 1.2M convs (30.6M turns) — fresh r5-code series (r4 series
                                          archived under BENCH/r4/)
  6. scaling @ 4.8M convs (122M turns)  — the bigger-input hypothesis leg
  7. phase profile 4/16 @ 1.2M          — once, first clean cycle
  8. bucketed-input scaling @ 1.2M      — once per run

Usage: python tools/r5_campaign.py [max_hours]
Env: PILOT_MIN_TPS (default from spark_pilot), R5_SKIP (comma list of task
names to skip: realistic,phase16,sf1,scaling24,scaling12,scaling48,phase,
bucketed).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIN_TPS = float(os.environ.get("PILOT_MIN_TPS", "850000"))


def pilot() -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "spark_pilot.py")],
        capture_output=True, text=True, timeout=600)
    try:
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        rec = json.loads(line)
        print("pilot:", json.dumps(rec), flush=True)
        return rec["tps"]
    except (IndexError, json.JSONDecodeError, KeyError):
        print("pilot failed:", out.stdout[-300:], out.stderr[-300:], flush=True)
        return 0.0


def gate(deadline: float) -> bool:
    """Wait for a clean pilot; False once the deadline passes.

    Backs off exponentially (300 → 1200 s) between dirty probes: the pilot
    itself is ~2-3 min of 16-core work, and under the burst-credit throttle
    model a 40% probe duty cycle could itself prevent the credit refill the
    gate is waiting for.
    """
    wait = 300
    while time.time() < deadline:
        tps = pilot()
        if tps >= MIN_TPS:
            return True
        print(f"host dirty ({tps:.0f} tps < {MIN_TPS:.0f}) — retry in {wait}s",
              flush=True)
        time.sleep(min(wait, max(0.0, deadline - time.time())))
        wait = min(wait * 2, 1200)
    return False


def scaling(n_convs: int, bucketed: bool = False, profile: str | None = None) -> None:
    env = dict(os.environ, SCALING_N_CONVS=str(n_convs), SCALING_N_LO="4",
               SCALING_ROUNDS="1", SCALING_PASSES="3", SCALING_MERGE="1")
    if bucketed:
        env["SCALING_BUCKETED"] = "1"
    if profile:
        env["SCALING_PROFILE"] = profile
    try:
        subprocess.run([sys.executable, os.path.join(REPO, "tools", "scaling_run.py")],
                       env=env, timeout=7200)
    except subprocess.TimeoutExpired:
        print(f"scaling n_convs={n_convs} timed out; continuing", flush=True)


def phase_profile(cpu_list: tuple[int, ...] = (4, 16)) -> None:
    for cpus in cpu_list:
        out = os.path.join(REPO, "BENCH", f"phase_scaling_r5_local{cpus}.json")
        try:
            subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "phase_profile.py"),
                 str(cpus), "1200000", out], timeout=3600)
        except subprocess.TimeoutExpired:
            print(f"phase profile local[{cpus}] timed out", flush=True)


def sf1() -> None:
    try:
        subprocess.run([sys.executable, os.path.join(REPO, "tools", "sf1_bench.py")],
                       timeout=7200)
    except subprocess.TimeoutExpired:
        print("sf1 bench timed out", flush=True)


def main() -> None:
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    skip = set(os.environ.get("R5_SKIP", "").split(","))
    deadline = time.time() + max_hours * 3600
    done_once: set[str] = set()
    cycle = 0
    while time.time() < deadline:
        cycle += 1
        print(f"=== cycle {cycle} ===", flush=True)
        tasks = [
            # realistic-rate series first: the round-5 write-heavy-fraction
            # hypothesis test (1.4% planted violation rate vs the default
            # adversarial 39.8%).  Repeats every cycle — the merge protocol
            # folds best pairs across windows like the headline series.
            ("realistic", lambda: scaling(1_200_000, profile="realistic")),
            # 16-core phase profile retry: the first attempt ran inside a
            # drained window (seq 19.8s vs 12.2s at 4 cores) and is marked
            # non-evidentiary; the local[4] profile is already clean.
            ("phase16", lambda: phase_profile((16,))),
            ("sf1", sf1),
            ("scaling24", lambda: scaling(2_400_000)),
            ("scaling12", lambda: scaling(1_200_000)),
            ("scaling48", lambda: scaling(4_800_000)),
            ("phase", phase_profile),
            ("bucketed", lambda: scaling(1_200_000, bucketed=True)),
        ]
        progressed = False
        for name, fn in tasks:
            if name in skip:
                continue
            if name in ("phase", "phase16", "sf1", "bucketed") and name in done_once:
                continue
            if not gate(deadline):
                print("deadline while waiting for clean window", flush=True)
                return
            print(f"--- {name} ---", flush=True)
            fn()
            done_once.add(name)
            progressed = True
        if not progressed:
            return
    print("deadline reached", flush=True)


if __name__ == "__main__":
    main()
