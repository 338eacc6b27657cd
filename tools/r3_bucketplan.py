"""Offline capacity-bucket planner sweep over dumped nji distributions
(tools/r3_nji.py writes /tmp/nji_{cold,hot}.npy).

Scores each candidate (quantiles, margin) plan by total padded
j16-slots Σ n_k·c_k — the force kernel's pair count and the row
gather's issue count are both proportional to it — evaluated on the
HOT distribution but required to HOLD (no bucket overflow) when units
are assigned by sorted nji on BOTH distributions, mirroring
attach_bucket_maps' sorted assignment.
"""

from __future__ import annotations

import itertools
import sys

import numpy as np


def pad8(x):
    return max(8, (int(x) + 7) // 8 * 8)


def plan(nji, cap, share, quantiles, margin, frac=0.99):
    nu = nji.shape[0]
    gran = max(128 // share, 8)
    srt = np.sort(nji) + margin
    cand = [8] + [pad8(srt[min(int(q * nu), nu - 1)]) for q in quantiles]
    sizes, caps = [], []
    used = 0
    for c_k in sorted(set(cand)):
        if c_k >= cap:
            break
        n_fit = int((srt <= c_k).sum() * frac) // gran * gran - used
        if n_fit >= gran:
            sizes.append(n_fit)
            caps.append(c_k)
            used += n_fit
    if not sizes:
        return None
    n_c = max(gran, (nu - used + gran - 1) // gran * gran)
    sizes.append(n_c)
    caps.append(cap)
    return tuple(sizes), tuple(caps)


def holds(nji, sizes, caps):
    """Sorted assignment: the sizes[k] smallest-nji units go to bucket
    k; overflow iff any assigned unit's nji > its bucket cap."""
    srt = np.sort(nji)
    off = 0
    for n_k, c_k in zip(sizes, caps):
        hi = min(off + n_k, srt.shape[0])
        if hi > off and srt[hi - 1] > c_k:
            return False
        off = hi
    return off >= srt.shape[0] or srt[-1] <= caps[-1]


def score(sizes, caps):
    return sum(n * c for n, c in zip(sizes, caps))


def main():
    cold = np.load("/tmp/nji_cold.npy")
    hot = np.load("/tmp/nji_hot.npy")
    share = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    exact = int(hot.sum())
    print("hot exact slots=%d  flat(icap=%d)=%d (x%.2f)"
          % (exact, cap, hot.shape[0] * cap, hot.shape[0] * cap / exact))

    qsets = {
        "current": (0.30, 0.55, 0.75, 0.90, 0.985),
        "6tier": (0.20, 0.40, 0.60, 0.75, 0.90, 0.985),
        "8tier": (0.15, 0.30, 0.45, 0.60, 0.75, 0.875, 0.95, 0.99),
        "10tier": (0.10, 0.20, 0.30, 0.42, 0.54, 0.66, 0.78, 0.88,
                   0.95, 0.99),
        "dense-top": (0.30, 0.55, 0.75, 0.85, 0.92, 0.96, 0.985),
    }
    rows = []
    for name, qs in qsets.items():
        for margin in (0, 2, 4):
            for basis in ("cold", "hot"):
                p = plan(cold if basis == "cold" else hot, cap, share,
                         qs, margin)
                if p is None:
                    continue
                sizes, caps = p
                ok_c = holds(cold, sizes, caps)
                ok_h = holds(hot, sizes, caps)
                rows.append((score(sizes, caps), name, margin, basis,
                             ok_c, ok_h, sizes, caps))
    rows.sort()
    for sc, name, margin, basis, ok_c, ok_h, sizes, caps in rows:
        print("%8d x%.2f %-9s m=%d basis=%s hold(cold=%s hot=%s) "
              "k=%d caps=%s" % (sc, sc / exact, name, margin, basis,
                                ok_c, ok_h, len(sizes), caps))


if __name__ == "__main__":
    main()
