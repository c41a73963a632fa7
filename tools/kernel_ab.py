"""Bit-exactness harness for kernel optimizations.

Usage:
  python tools/kernel_ab.py capture   # record detect_series outputs -> /tmp/kernel_ab_baseline.pkl
  python tools/kernel_ab.py compare   # re-run and require BIT-EXACT equality vs the capture
  python tools/kernel_ab.py bench     # time the battery

The battery sweeps series shapes that exercise every kernel path: short/long,
periodic (several periods), trending, flat-majority, spiky, NaN-free floats.
Optimizations to stl.py/esd.py must keep `compare` green — the golden corpus
checks request-level parity, this checks raw per-point bitwise parity so even
tolerance-masked drift is caught.
"""

from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = "/tmp/kernel_ab_baseline.pkl"


def battery():
    rng = np.random.default_rng(1234)
    cases = []
    for n in (30, 61, 120, 288, 300, 720, 1200, 2000):
        base = 50 + 10 * np.sin(np.arange(n) * 2 * np.pi / 24) + rng.normal(0, 2, n)
        cases.append((f"periodic24_n{n}", base.copy()))
        spiked = base.copy()
        spiked[:: max(n // 9, 1)] += 40
        cases.append((f"spiky_n{n}", spiked))
        trend = base + np.linspace(0, 30, n)
        cases.append((f"trend_n{n}", trend))
    for n in (60, 400, 1200):
        flat = np.full(n, 7.0)
        flat[n // 2] = 90.0
        cases.append((f"flat_majority_n{n}", flat))
        noise = rng.normal(100, 15, n)
        cases.append((f"noise_n{n}", noise))
        weekly = 20 + 5 * np.sin(np.arange(n) * 2 * np.pi / 7) + rng.normal(0, 1, n)
        cases.append((f"periodic7_n{n}", weekly))
    return cases


def run_all():
    from anomaly_detector_spark.kernels.detect import detect_series

    out = {}
    for name, vals in battery():
        idx = list(range(len(vals)))
        results, period, trend, model_id, extra = detect_series(
            list(map(float, vals)), idx, granularity="hourly", interval=1,
            threshold=3.5, max_anomaly_ratio=0.25,
        )
        out[name] = {
            "period": period,
            "model_id": model_id,
            "results": {k: np.asarray(v) for k, v in results.items()},
        }
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if mode == "capture":
        t0 = time.time()
        out = run_all()
        with open(PATH, "wb") as f:
            pickle.dump(out, f)
        print(f"captured {len(out)} cases in {time.time()-t0:.1f}s -> {PATH}")
        return 0
    if mode == "bench":
        t0 = time.time()
        run_all()
        print(f"battery wall: {time.time()-t0:.2f}s")
        return 0
    with open(PATH, "rb") as f:
        base = pickle.load(f)
    t0 = time.time()
    new = run_all()
    wall = time.time() - t0
    bad = []
    for name, b in base.items():
        nw = new[name]
        if b["period"] != nw["period"] or b["model_id"] != nw["model_id"]:
            bad.append((name, "period/model", b["period"], nw["period"], b["model_id"], nw["model_id"]))
            continue
        for col, arr in b["results"].items():
            narr = nw["results"][col]
            a1 = np.asarray(arr, dtype=float)
            a2 = np.asarray(narr, dtype=float)
            if a1.shape != a2.shape or not np.array_equal(a1, a2, equal_nan=True):
                i = int(np.argmax(~np.isclose(a1, a2, equal_nan=True, rtol=0, atol=0))) if a1.shape == a2.shape else -1
                bad.append((name, col, i, a1[i] if i >= 0 else None, a2[i] if i >= 0 else None))
    if bad:
        for row in bad[:20]:
            print("MISMATCH", row)
        print(f"FAIL: {len(bad)} mismatching case-columns (battery wall {wall:.2f}s)")
        return 1
    print(f"OK: {len(base)} cases bit-exact (battery wall {wall:.2f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
