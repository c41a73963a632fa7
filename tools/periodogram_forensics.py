"""Forensics for the `seasonal.periodogram_peaks` reconstruction gap.

For each xfailed golden case: capture the array(s) passed to
guess_trended_period, then brute-force which returned period values make the
whole case pass.  The feasible sets constrain the unknown periodogram
semantics; candidate reconstructions are then scored offline against the
captured inputs (tools-only; never imported by the engine).

Usage: python tools/periodogram_forensics.py [sweep|capture]
"""

from __future__ import annotations

import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anomaly_detector_spark.kernels import trend as trend_mod  # noqa: E402
from tests.test_golden_corpus import CASES_DIR, compare  # noqa: E402

GAP_CASES = [
    "json_dsat_test.cases.dsat_case13_0.json",
    "json_dsat_test.cases.dsat_case18_0.json",
    "json_dsat_test.cases.dsat_case19_0.json",
    "json_dsat_test.cases.dsat_case26_0.json",
    "json_dsat_test.cases.dsat_case27_0.json",
    "json_dsat_test.cases.dsat_case31_0.json",
    "json_entire_cases.period_fix_data_hourly_yahoo_2.json",
    "json_entire_cases.period_fix_data_hourly_yahoo_60.json",
    "json_last_cases.test_d_0.json",
    "json_last_cases.test_e_0.json",
    "json_spectrum_period.last_0.json",
]

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "periodogram_captures.pkl")

_orig_guess = trend_mod.guess_trended_period


def run_case(case_file):
    with open(os.path.join(CASES_DIR, case_file), encoding="utf-8", errors="replace") as f:
        return compare(json.load(f))


def capture():
    captures = {}
    for case in GAP_CASES:
        calls = []

        def spy(data, _calls=calls):
            _calls.append(np.array(data, dtype=float))
            return _orig_guess(data)

        trend_mod.guess_trended_period = spy
        try:
            errs = run_case(case)
        finally:
            trend_mod.guess_trended_period = _orig_guess
        captures[case] = {"calls": calls, "errors_with_current": errs}
        print(f"{case}: {len(calls)} guess calls, current errors: {errs}")
    with open(OUT, "wb") as f:
        pickle.dump(captures, f)


def _try_one(args):
    case, p = args

    def fixed(data, _p=p):
        return _p

    trend_mod.guess_trended_period = fixed
    try:
        errs = run_case(case)
    except Exception as e:  # a bad period can trip length checks
        errs = [f"exception {e}"]
    finally:
        trend_mod.guess_trended_period = _orig_guess
    return case, p, not errs


def sweep():
    """Which constant guess-period values make each case pass?  Fans the
    (case, period) grid over all cores."""
    from concurrent.futures import ProcessPoolExecutor

    tasks = []
    for case in GAP_CASES:
        with open(os.path.join(CASES_DIR, case), encoding="utf-8", errors="replace") as f:
            n = len(json.load(f)["request"]["series"])
        tasks.extend((case, p) for p in range(2, min(n // 2 + 2, 520)))
    results = {c: [] for c in GAP_CASES}
    with ProcessPoolExecutor(max_workers=os.cpu_count()) as pool:
        for case, p, ok in pool.map(_try_one, tasks, chunksize=8):
            if ok:
                results[case].append(p)
    for case in GAP_CASES:
        results[case].sort()
        print(f"{case}: feasible periods {summ(results[case])}")
    with open(OUT.replace(".pkl", "_feasible.json"), "w") as f:
        json.dump(results, f, indent=1)


def summ(xs):
    if not xs:
        return "NONE"
    runs, start = [], None
    for i, x in enumerate(xs):
        if start is None:
            start = x
        if i + 1 == len(xs) or xs[i + 1] != x + 1:
            runs.append((start, x))
            start = None
    return ",".join(f"{a}-{b}" if a != b else str(a) for a, b in runs)




def _try_pair(args):
    case, p0, p1 = args
    seq = {"i": 0}

    def fixed(data):
        p = p0 if seq["i"] == 0 else p1
        seq["i"] += 1
        return p

    trend_mod.guess_trended_period = fixed
    try:
        errs = run_case(case)
    except Exception as e:
        errs = [f"exception {e}"]
    finally:
        trend_mod.guess_trended_period = _orig_guess
    return case, p0, p1, not errs


def sweep2d():
    """2-call cases with empty 1D feasible sets: sweep (p0, p1) pairs."""
    from concurrent.futures import ProcessPoolExecutor

    cases = [c for c in sys.argv[2:]] or [
        "json_dsat_test.cases.dsat_case26_0.json",
        "json_dsat_test.cases.dsat_case27_0.json",
        "json_dsat_test.cases.dsat_case31_0.json",
        "json_last_cases.test_d_0.json",
        "json_last_cases.test_e_0.json",
        "json_spectrum_period.last_0.json",
    ]
    results = {}
    with ProcessPoolExecutor(max_workers=os.cpu_count()) as pool:
        for case in cases:
            with open(os.path.join(CASES_DIR, case), encoding="utf-8", errors="replace") as f:
                n = len(json.load(f)["request"]["series"])
            hi = min(n // 2 + 2, 60)
            tasks = [(case, p0, p1) for p0 in range(2, hi) for p1 in range(2, hi)]
            ok_pairs = [(p0, p1) for _, p0, p1, ok in pool.map(_try_pair, tasks, chunksize=16) if ok]
            results[case] = ok_pairs
            print(f"{case}: {len(ok_pairs)} feasible pairs: {ok_pairs[:40]}")
    with open(OUT.replace(".pkl", "_feasible2d.json"), "w") as f:
        json.dump({k: v for k, v in results.items()}, f, indent=1)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "capture"
    if mode == "capture":
        capture()
    elif mode == "sweep2d":
        sweep2d()
    else:
        sweep()
