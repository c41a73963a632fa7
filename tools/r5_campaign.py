"""Round-5 clean-window measurement orchestrator (v2).

The host's burst-credit throttle (quantified in BENCH/BASELINE.md round-5
section) makes 16/32-core legs a lottery outside pilot-verified clean
windows, while 1-4-core legs essentially never throttle.  v2 therefore
splits the backlog by core budget and turns dirty windows into useful work
instead of sleep:

  pilot clean (>= PILOT_MIN_TPS) -> one GATED task, rotating:
      hi-core ladder legs (8,16,32) adversarial / realistic,
      realistic 4->16 merge pair, phase16 (once), sf1 (once)
  pilot dirty -> one UNGATED low-core ladder pass (1,2,4,8; <= LOW_CAP
      attempts per core per profile) — ~15-20 min of mostly-idle-box work
      that doubles as the retry backoff and barely drains the credit
      bucket; when the low ladders are full, plain sleep.

The ladder (tools/core_ladder.py) is the round's criterion instrument: the
north rule fixes the RATIO (N -> 4N), not N, and on this single socket the
measured ratio depends on where N sits relative to the DRAM wall.  All
pairs (1->4, 2->8, 4->16, 8->32) come out of one merged record.

Usage: python tools/r5_campaign.py [max_hours]
Env: PILOT_MIN_TPS (default from spark_pilot), R5_SKIP (comma list of
gated task names: hi_adv,hi_real,real416,phase16,sf1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from spark_pilot import min_tps, run_subprocess_pilot  # noqa: E402

MIN_TPS = min_tps()
LOW_CORES = (1, 2, 4, 8)
# credit-hungriest first: a clean window's budget is finite, and the 32-core
# leg needs it most (the first hi_adv window showed the 8-core legs draining
# the bucket before the 16/32 legs ran)
HI_CORES = (32, 16, 8)
LOW_CAP = 5  # max ungated attempts per core per profile


def pilot() -> float:
    try:
        rec = run_subprocess_pilot()
        print("pilot:", json.dumps(rec), flush=True)
        return rec["tps"]
    except (subprocess.TimeoutExpired, IndexError,
            json.JSONDecodeError, KeyError) as e:
        print("pilot failed:", type(e).__name__, flush=True)
        return 0.0


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


def ladder(cores: tuple[int, ...], profile: str | None = None) -> None:
    env = dict(os.environ, LADDER_CORES=",".join(map(str, cores)),
               LADDER_N_CONVS="1200000", SCALING_PASSES="3")
    if profile:
        env["SCALING_PROFILE"] = profile
    try:
        subprocess.run([sys.executable, os.path.join(REPO, "tools", "core_ladder.py")],
                       env=env, timeout=7200)
    except subprocess.TimeoutExpired:
        print(f"ladder {cores} {profile or 'adversarial'} timed out", flush=True)


def ladder_attempt_counts(profile: str | None) -> dict[int, int]:
    tag = "" if not profile or profile == "adversarial" else f"_{profile}"
    path = os.path.join(REPO, "BENCH", f"scaling_ladder{tag}.json")
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as f:
            rec = json.load(f)
        return {int(c): len(a) for c, a in rec.get("attempts", {}).items()}
    except (json.JSONDecodeError, KeyError, ValueError):
        return {}


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
    once = {"phase16", "sf1"}
    done_once: set[str] = set()
    gated = [
        ("hi_real", lambda: ladder(HI_CORES, "realistic")),
        ("hi_adv", lambda: ladder(HI_CORES)),
        ("real416", lambda: scaling(1_200_000, profile="realistic")),
        ("phase16", lambda: phase_profile((16,))),
        ("sf1", sf1),
    ]
    gi = 0  # rotating index into gated
    low_profiles = [None, "realistic"]
    li = 0
    gated_exhausted = False
    while time.time() < deadline:
        tps = pilot()
        ran_gated = False
        if tps >= MIN_TPS:
            # pick the next gated task not skipped/exhausted
            for _ in range(len(gated)):
                name, fn = gated[gi]
                gi = (gi + 1) % len(gated)
                if name in skip or (name in once and name in done_once):
                    continue
                print(f"--- gated: {name} (pilot {tps:.0f}) ---", flush=True)
                fn()
                done_once.add(name)
                ran_gated = True
                break
            else:
                # all gated tasks skipped/exhausted — FALL THROUGH to the
                # low-ladder fill below (the docstring's promise) instead of
                # returning with the low ladders possibly unfilled
                gated_exhausted = True
                print("gated backlog exhausted", flush=True)
        if not ran_gated:
            # dirty window (or exhausted gated backlog): run a low-core
            # ladder pass for whichever profile still needs samples; the
            # pass itself is the backoff
            ran = False
            for _ in range(len(low_profiles)):
                profile = low_profiles[li]
                li = (li + 1) % len(low_profiles)
                counts = ladder_attempt_counts(profile)
                need = tuple(c for c in LOW_CORES if counts.get(c, 0) < LOW_CAP)
                if need:
                    print(f"--- low ladder ({tps:.0f} tps): {need} "
                          f"{profile or 'adversarial'} ---", flush=True)
                    ladder(need, profile)
                    ran = True
                    break
            if not ran:
                if gated_exhausted:
                    print("gated backlog AND low ladders done", flush=True)
                    return
                print(f"host dirty ({tps:.0f}), low ladders full — sleep 900s",
                      flush=True)
                time.sleep(min(900, max(0.0, deadline - time.time())))
    print("deadline reached", flush=True)


if __name__ == "__main__":
    main()
