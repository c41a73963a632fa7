"""Full core ladder for the strong-scaling criterion.

Runs the IDENTICAL validation job (same input, same code,
`scaling_run.run_one` — fresh JVM per leg, 3 passes, best warm wall) at
every core count in LADDER_CORES, and derives every N->4N efficiency pair
the ladder contains.  Attempts merge across invocations (the host throttle
varies on an hours scale; per-core best-of-merged picks each leg's
least-throttled observation, same protocol as scaling_run.py).

Why a ladder instead of one pair: the north rule says "N and 4N executors"
without fixing N.  On this single-socket box the 16/32-core legs are bound
by the shared memory system (documented since round 2; the round-5 kernel
speedup cut the 4-core wall 19% and the 16-core wall ~1%), so the measured
N->4N ratio depends strongly on where N sits relative to the DRAM wall.
The ladder shows the whole curve — where scaling is near-ideal, where the
box saturates — which is both the honest presentation and the one that
transfers to the criterion's real regime (4N executors on a cluster add
DRAM channels with every node; a single socket cannot).

The partial record is rewritten after EVERY leg so a deadline kill loses
nothing.

Env: LADDER_CORES (default "1,2,4,8,16,32"), LADDER_N_CONVS (default
1200000), SCALING_PROFILE (adversarial|realistic, reaches the worker),
SCALING_PASSES (default 3, reaches the worker).
Output: BENCH/scaling_ladder[_convs{N}][_{profile}].json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_run import REPO, alu_probe, run_one  # noqa: E402


def _report(attempts: dict[str, list], n_convs: int, profile: str) -> dict:
    best = {c: min(a, key=lambda r: r["wall_s"]) for c, a in attempts.items() if a}
    pairs = {}
    for c_str, lo in sorted(best.items(), key=lambda kv: int(kv[0])):
        hi = best.get(str(int(c_str) * 4))
        if hi:
            pairs[f"{c_str}->{int(c_str) * 4}"] = round(
                hi["turns_per_sec"] / lo["turns_per_sec"] / 4.0, 3)
    return {
        "n_convs": n_convs,
        "input_profile": profile,
        "protocol": "fresh JVM per leg, best warm wall of SCALING_PASSES, "
                    "merged across invocations",
        "best": {c: best[c] for c in sorted(best, key=int)},
        "efficiency_N_to_4N": pairs,
        "attempts": {c: attempts[c] for c in sorted(attempts, key=int)},
    }


def main() -> None:
    cores = [int(c) for c in os.environ.get("LADDER_CORES", "1,2,4,8,16,32").split(",")]
    n_convs = int(os.environ.get("LADDER_N_CONVS", "1200000"))
    profile = os.environ.get("SCALING_PROFILE", "adversarial")
    fname = "scaling_ladder"
    if n_convs != 1_200_000:
        fname += f"_convs{n_convs}"
    if profile != "adversarial":
        fname += f"_{profile}"
    out_path = os.path.join(REPO, "BENCH", fname + ".json")

    attempts: dict[str, list] = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            if (prev.get("n_convs") == n_convs
                    and prev.get("input_profile", "adversarial") == profile):
                attempts = prev.get("attempts", {})
        except (json.JSONDecodeError, KeyError):
            pass

    for cpus in cores:
        probe = alu_probe()
        res = run_one(cpus, n_convs)
        res["probe_sec"] = probe
        attempts.setdefault(str(cpus), []).append(res)
        print(f"ladder local[{cpus}]:", json.dumps(res), flush=True)
        with open(out_path, "w") as f:
            json.dump(_report(attempts, n_convs, profile), f, indent=2)

    print(json.dumps(_report(attempts, n_convs, profile)))


if __name__ == "__main__":
    main()
