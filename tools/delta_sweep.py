"""Delta-pass inverse sweep for the last-mode xfail family.

Hypothesis chain: reference last-mode EV at the final index was produced by
merge_with_delta (detect_model.py:73-97) replacing row n-1, so
EV = ori_trend[n-2] + delta_trend[n-1] — sweep the FULL de-anom subset space
of the delta series for the needed delta_trend value.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo")

import xfail_inverse as X  # noqa: E402


def sweep_array(y, targets, at, tol=1e-9, label=""):
    n = len(y)
    total = 1 << n
    ws = X.windows_for(n)
    hits = []
    targets = np.asarray(targets)
    CHUNK = 1 << 17
    col = np.arange(n)
    for start in range(0, total, CHUNK):
        masks = np.arange(start, min(start + CHUNK, total), dtype=np.int64)
        nm = ((masks[:, None] >> col[None, :]) & 1).astype(bool)
        Z = np.tile(y, (len(masks), 1))
        Z[nm] = np.nan
        valid = ~np.isnan(Z).all(axis=1)
        Z = X.interp_rows(Z)
        for w in ws:
            ev = X.spline_ev_last(Z, w, at=at)
            m = valid & (np.abs(ev[:, None] - targets[None, :]) < tol).any(axis=1)
            for i in np.nonzero(m)[0]:
                hits.append((int(masks[i]), w, float(ev[i])))
        if start % (CHUNK * 8) == 0:
            print(f"  {label} {start:,}/{total:,} hits={len(hits)}", flush=True)
    print(f"DONE {label}: {len(hits)} hits", flush=True)
    for mask, w, ev in hits[:40]:
        print(f"  S={[i for i in range(n) if mask >> i & 1]} w={w} ev={ev!r}", flush=True)
    return hits


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "d"
    if which == "d":
        dd = np.load("/tmp/delta_d.npy")
        sweep_array(dd, [0.2567019879955588], at=22, label="delta_d")
    else:
        de = np.load("/tmp/delta_e.npy")
        sweep_array(de, [0.27251458621177305], at=23, label="delta_e")
