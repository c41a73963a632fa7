"""Fold the 4->16 pair-series attempts into the core-ladder records.

BENCH/scaling.json / scaling_realistic.json hold attempts of the IDENTICAL
job + input + protocol (fresh JVM, SCALING_PASSES warm passes, best warm
wall) as BENCH/scaling_ladder*.json — they differ only in which core counts
they sampled.  This one-off folds those attempts into the ladder files so
the per-core `best` and every derived N->4N pair rest on ALL same-code
samples.  Each folded attempt gets a `source` tag for provenance; the fold
is idempotent (attempts already tagged from a source file are replaced, not
duplicated).

Run ONLY while no core_ladder.py invocation is active (it rewrites the
ladder file per leg from its own start-of-run snapshot).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from core_ladder import _report  # noqa: E402
from scaling_run import REPO  # noqa: E402

FOLDS = [
    ("scaling.json", "scaling_ladder.json", "adversarial"),
    ("scaling_realistic.json", "scaling_ladder_realistic.json", "realistic"),
]


def main() -> None:
    for pair_name, ladder_name, profile in FOLDS:
        pair_path = os.path.join(REPO, "BENCH", pair_name)
        ladder_path = os.path.join(REPO, "BENCH", ladder_name)
        if not (os.path.exists(pair_path) and os.path.exists(ladder_path)):
            print(f"skip {pair_name} -> {ladder_name} (missing file)")
            continue
        with open(pair_path) as f:
            pair = json.load(f)
        with open(ladder_path) as f:
            ladder = json.load(f)
        if (pair.get("n_convs") != ladder.get("n_convs")
                or pair.get("input_profile", "adversarial") != profile
                or pair.get("bucketed_input") or pair.get("weak_scaling")):
            print(f"skip {pair_name}: shape mismatch")
            continue
        attempts = ladder.get("attempts", {})
        for cpus, recs in pair.get("attempts", {}).items():
            kept = [a for a in attempts.get(cpus, [])
                    if a.get("source") != pair_name]
            kept.extend({**a, "source": pair_name} for a in recs)
            attempts[cpus] = kept
        report = _report(attempts, ladder["n_convs"], profile)
        report["protocol"] += f"; {pair_name} attempts folded (same job/input/protocol)"
        with open(ladder_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"folded {pair_name} -> {ladder_name}:",
              json.dumps(report["efficiency_N_to_4N"]))


if __name__ == "__main__":
    main()
