"""Round-6 clean-window measurement orchestrator.

Backlog = the r5 verdict's asks, in priority order.  Every ladder attempt
is now self-stamped by tools/core_ladder.py (per-leg Spark pilot ->
pilot_tps + clean on the attempt record), so this campaign's outer pilot
only chooses WHAT to run; the evidence trail lives in the ladder JSONs.

  pilot clean (>= PILOT_MIN_TPS) -> the first UNMET gated task:
      hi_real   realistic strong-ladder legs 32/16/8 until each has
                >= 3 clean-stamped samples (the #1 ask)
      lo_real   realistic strong-ladder legs 1/2/4 until each has
                >= 2 clean-stamped samples (the r5 attempts carry no
                stamps, so the qualified pair dict needs fresh legs)
      weak      weak-scaling ladder (fixed 300k convs/core) legs
                8/4/2/1 until each has >= 2 clean samples (ask #7)
      minhash   stage decomposition in a clean window (ask #2), once
      phase     phase profiles local[4] + local[16] (ask #5), once
      sf1       sf1 bench re-run (ask #4), once
  pilot dirty -> fill low-core legs (strong realistic then weak, caps
      below) — low-core legs are throttle-insensitive in practice and the
      per-leg stamp records the window either way; else sleep.

Usage: python tools/r6_campaign.py [max_hours]
Env: PILOT_MIN_TPS, R6_SKIP (comma list: hi_real,lo_real,weak,minhash,
phase,sf1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOLS = os.path.join(REPO, "tools")
if _TOOLS not in sys.path:
    sys.path.insert(0, _TOOLS)
from spark_pilot import min_tps, run_subprocess_pilot  # noqa: E402

MIN_TPS = min_tps()
HI_CLEAN_TARGET = 3
LO_CLEAN_TARGET = 3  # symmetric with hi: every strong leg gets >=3 clean
# 1 clean sample per weak leg is enough to publish the weak pairs (n=1,
# noted in the exhibit); grinding to 2 starved the one-shot gated tasks.
# Once the one-shots are done, raise via env to deepen the weak samples.
WEAK_CLEAN_TARGET = int(os.environ.get("WEAK_CLEAN_TARGET", "1"))
LOW_FILL_CAP = 10  # total attempts (any cleanliness) per low core leg


def pilot() -> float:
    try:
        rec = run_subprocess_pilot()
        print("pilot:", json.dumps(rec), flush=True)
        return rec["tps"]
    except (subprocess.TimeoutExpired, IndexError,
            json.JSONDecodeError, KeyError) as e:
        print("pilot failed:", type(e).__name__, flush=True)
        return 0.0


def _ladder_counts(weak: bool) -> tuple[dict[int, int], dict[int, int]]:
    """(clean_count, total_count) per core from the realistic ladder file."""
    fname = "scaling_ladder_weak_realistic.json" if weak \
        else "scaling_ladder_realistic.json"
    path = os.path.join(REPO, "BENCH", fname)
    clean: dict[int, int] = {}
    total: dict[int, int] = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                rec = json.load(f)
            for c, atts in rec.get("attempts", {}).items():
                total[int(c)] = len(atts)
                clean[int(c)] = sum(1 for a in atts if a.get("clean") is True)
        except (json.JSONDecodeError, KeyError, ValueError):
            pass
    return clean, total


def ladder(cores: tuple[int, ...], weak: bool = False,
           pre_tps: float | None = None) -> None:
    env = dict(os.environ, LADDER_CORES=",".join(map(str, cores)),
               LADDER_N_CONVS="1200000", SCALING_PASSES="3",
               SCALING_PROFILE="realistic", LADDER_PILOT="1")
    if pre_tps is not None:
        # hand the gating pilot's reading to the ladder so the first leg
        # reuses it instead of burning a second back-to-back pilot
        env["LADDER_PILOT_PRE_TPS"] = str(pre_tps)
    if weak:
        env["LADDER_WEAK"] = "1"
    try:
        subprocess.run([sys.executable, os.path.join(_TOOLS, "core_ladder.py")],
                       env=env, timeout=7200)
    except subprocess.TimeoutExpired:
        print(f"ladder {cores} weak={weak} timed out", flush=True)


def run_tool(script: str, *args: str, timeout: float = 7200) -> None:
    try:
        subprocess.run([sys.executable, os.path.join(_TOOLS, script), *args],
                       timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"{script} timed out", flush=True)


def main() -> None:
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    skip = set(os.environ.get("R6_SKIP", "").split(","))
    deadline = time.time() + max_hours * 3600
    done_once: set[str] = set()

    def hi_need() -> tuple[int, ...]:
        clean, _ = _ladder_counts(weak=False)
        return tuple(c for c in (32, 16, 8)
                     if clean.get(c, 0) < HI_CLEAN_TARGET)

    def lo_need() -> tuple[int, ...]:
        clean, _ = _ladder_counts(weak=False)
        return tuple(c for c in (4, 2, 1)
                     if clean.get(c, 0) < LO_CLEAN_TARGET)

    def weak_need() -> tuple[int, ...]:
        clean, _ = _ladder_counts(weak=True)
        # 16 completes the weak 4->16 pair — the model-test leg: the strong
        # ladder's ~1.7M turns/s saturation predicts its wall (~72s for
        # 122.4M turns) BEFORE measurement; see NOTES_ROUND6.md.
        return tuple(c for c in (16, 8, 4, 2, 1)
                     if clean.get(c, 0) < WEAK_CLEAN_TARGET)

    while time.time() < deadline:
        tps = pilot()
        ran = False
        if tps >= MIN_TPS:
            # clean window: first unmet gated task, priority order
            if "hi_real" not in skip and hi_need():
                print(f"--- gated hi_real {hi_need()} (pilot {tps:.0f})",
                      flush=True)
                ladder(hi_need(), pre_tps=tps)
                ran = True
            elif "lo_real" not in skip and lo_need():
                print(f"--- gated lo_real {lo_need()} (pilot {tps:.0f})",
                      flush=True)
                ladder(lo_need(), pre_tps=tps)
                ran = True
            elif "minhash" not in skip and "minhash" not in done_once:
                print(f"--- gated minhash (pilot {tps:.0f})", flush=True)
                run_tool("minhash_profile.py", "/root/testdata/sf0.1", "32",
                         os.path.join(REPO, "BENCH", "minhash_decomposition.json"),
                         timeout=1800)
                done_once.add("minhash")
                ran = True
            elif "phase" not in skip and "phase" not in done_once:
                # r6b: post-anti-join-fix re-run (commit a36998b) — written
                # under new names so the pre-fix pair stays on disk beside it
                print(f"--- gated phase (pilot {tps:.0f})", flush=True)
                for cpus in (4, 16):
                    run_tool("phase_profile.py", str(cpus), "1200000",
                             os.path.join(REPO, "BENCH",
                                          f"phase_scaling_r6b_local{cpus}.json"),
                             timeout=3600)
                done_once.add("phase")
                ran = True
            elif "sf1" not in skip and "sf1" not in done_once:
                print(f"--- gated sf1 (pilot {tps:.0f})", flush=True)
                run_tool("sf1_bench.py", timeout=7200)
                done_once.add("sf1")
                ran = True
            elif "bench" not in skip and "bench" not in done_once:
                # full driver-style battery inside a clean window, so the
                # round carries a gated record of every headline query
                # (minhash post-fuse especially) independent of the
                # driver's own scheduling
                print(f"--- gated bench (pilot {tps:.0f})", flush=True)
                out = os.path.join(REPO, "BENCH", "bench_r6_gated.json")
                try:
                    res = subprocess.run(
                        [sys.executable, os.path.join(REPO, "bench.py")],
                        capture_output=True, text=True, timeout=3600)
                    last = [ln for ln in res.stdout.splitlines()
                            if ln.startswith("{")]
                    if last:
                        with open(out, "w") as f:
                            f.write(last[-1] + "\n")
                    print("bench:", (last[-1][:300] if last else res.stderr[-300:]),
                          flush=True)
                except subprocess.TimeoutExpired:
                    print("bench timed out", flush=True)
                done_once.add("bench")
                ran = True
            elif "weak" not in skip and weak_need():
                # after the one-shots: weak legs are cheap (~2.5 min each)
                # but each clean window tends to yield only 1-2 clean legs
                print(f"--- gated weak {weak_need()} (pilot {tps:.0f})",
                      flush=True)
                ladder(weak_need(), weak=True, pre_tps=tps)
                ran = True
            else:
                print("gated backlog exhausted", flush=True)
                return
        if not ran:
            # dirty window: by default SLEEP — the remaining targets need
            # CLEAN stamps, so a dirty attempt can't advance them, and
            # running the box continuously starves the burst-credit bucket
            # whose refill is the only way the next pilot lands clean.
            # R6_DIRTY_FILL=1 restores the fill behavior for data-gathering.
            if os.environ.get("R6_DIRTY_FILL") == "1":
                _, lo_total = _ladder_counts(weak=False)
                fill = tuple(c for c in lo_need()
                             if lo_total.get(c, 0) < LOW_FILL_CAP)
                _, weak_total = _ladder_counts(weak=True)
                weak_fill = tuple(c for c in weak_need() if c != 8
                                  and weak_total.get(c, 0) < LOW_FILL_CAP)
                if fill:
                    print(f"--- dirty ({tps:.0f}): lo_real fill {fill}",
                          flush=True)
                    ladder(fill)
                    continue
                if weak_fill:
                    print(f"--- dirty ({tps:.0f}): weak fill {weak_fill}",
                          flush=True)
                    ladder(weak_fill, weak=True)
                    continue
            print(f"dirty ({tps:.0f}) — sleep 600s for credit refill",
                  flush=True)
            time.sleep(min(600, max(0.0, deadline - time.time())))
    print("deadline reached", flush=True)


if __name__ == "__main__":
    main()
