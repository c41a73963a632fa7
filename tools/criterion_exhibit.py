"""Render the scaling-criterion exhibit tables from the ladder JSONs.

Reads BENCH/scaling_ladder_realistic.json, BENCH/scaling_ladder.json
(adversarial, r5 — unstamped, kept as the violation-sink stress series)
and BENCH/scaling_ladder_weak_realistic.json, and prints the markdown
tables that BENCH/BASELINE.md's round-6 criterion section embeds.  Keeping
the renderer separate from the prose means the tables can be regenerated
whenever a campaign lands a better clean leg, without hand-editing
numbers.

Usage: python tools/criterion_exhibit.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str) -> dict | None:
    path = os.path.join(REPO, "BENCH", name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _fmt_tps(tps: float) -> str:
    return f"{tps / 1e6:.3f}M" if tps >= 1e6 else f"{tps / 1e3:.0f}k"


def strong_table(rec: dict) -> list[str]:
    lines = ["| cores | best clean wall | turns/sec | clean samples | "
             "tps/core |", "|---|---|---|---|---|"]
    atts = rec.get("attempts", {})
    for c_str, leg in sorted(rec["best_clean"].items(),
                             key=lambda kv: int(kv[0])):
        n_clean = sum(1 for a in atts.get(c_str, [])
                      if a.get("clean") is True)
        lines.append(
            f"| local[{c_str}] | {leg['wall_s']:.1f} s | "
            f"**{_fmt_tps(leg['turns_per_sec'])}** | {n_clean} | "
            f"{leg['turns_per_sec'] / int(c_str) / 1e3:.0f}k |")
    return lines


def pairs_table(real: dict, adv: dict | None) -> list[str]:
    lines = ["| pair | realistic (clean-stamped) | adversarial (r5, "
             "unstamped) |", "|---|---|---|"]
    adv_any = {}
    if adv:
        adv_any = {k: (v["efficiency"] if isinstance(v, dict) else v)
                   for k, v in (adv.get("efficiency_N_to_4N_any")
                                or adv.get("efficiency_N_to_4N")
                                or {}).items()}
    clean = real.get("efficiency_N_to_4N", {})
    for pair in ("1->4", "2->8", "4->16", "8->32"):
        r = clean.get(pair)
        a = adv_any.get(pair)
        r_s = f"**{r:.3f}**" if r is not None else "—"
        a_s = f"{a:.3f}" if a is not None else "—"
        lines.append(f"| {pair.replace('->', '→')} | {r_s} | {a_s} |")
    return lines


def weak_table(rec: dict) -> list[str]:
    lines = ["| cores | input (turns) | best clean wall | tps/core | "
             "clean samples |", "|---|---|---|---|---|"]
    atts = rec.get("attempts", {})
    best = rec.get("best_clean", {})
    for c_str in sorted(set(list(best) + list(atts)), key=int):
        leg = best.get(c_str)
        n_clean = sum(1 for a in atts.get(c_str, [])
                      if a.get("clean") is True)
        if leg:
            lines.append(
                f"| local[{c_str}] | {leg['n_turns'] / 1e6:.2f}M | "
                f"{leg['wall_s']:.1f} s | "
                f"**{leg['turns_per_sec'] / int(c_str) / 1e3:.0f}k** | "
                f"{n_clean} |")
        else:
            lines.append(f"| local[{c_str}] | — | — | — | {n_clean} |")
    return lines


def main() -> None:
    real = _load("scaling_ladder_realistic.json")
    adv = _load("scaling_ladder.json")
    weak = _load("scaling_ladder_weak_realistic.json")
    print("### Strong-scaling ladder — realistic profile, clean-stamped "
          f"legs ({real['n_convs'] // 1000}k convs = "
          f"{real['best_clean']['1']['n_turns'] / 1e6:.1f}M turns, "
          "identical input every leg)\n")
    print("\n".join(strong_table(real)))
    print("\n### N→4N efficiency pairs (criterion formula "
          "(tps_4N/tps_N)/4)\n")
    print("\n".join(pairs_table(real, adv)))
    if weak and weak.get("best_clean"):
        cpc = 300000
        print(f"\n### Weak-scaling ladder — {cpc // 1000}k convs/core "
              "(~7.65M turns/core), realistic profile\n")
        print("\n".join(weak_table(weak)))


if __name__ == "__main__":
    main()
