"""Verlet-scheme headline at the benchmark workload (131k, 200 steps),
single chip, rowlist fast path — golden-gated on the same DP reference
temperature trace as bench.py.

    python tools/r4_vbench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import GOLDEN_TEMP_131K

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine import Simulation

    p = Params(precision="sp", scheme="verlet", kernel="rowlist",
               dense_thermo=False)
    sim = Simulation(p)
    out = sim.run()
    for step, t_gold in GOLDEN_TEMP_131K.items():
        t = float(out.temps[step - 1])
        rel = abs(t - t_gold) / abs(t_gold)
        tol = 1e-3 if step <= 60 else 2e-2
        assert rel < tol, (step, t, t_gold, rel)
    mups = 1e-6 * sim.natoms * p.ntimes / out.total_time
    print("verlet rowlist headline: %.1f M upd/s (total %.3f s) "
          "golden PASS" % (mups, out.total_time))
    print("rcap=%d ccap=%d ukr=%d ucl=%d ghost=%d buckets=%s"
          % (sim.rcap, sim.ccap, sim.ukr, sim.ucl, sim.caps.ghost,
             sim.rbuckets))


if __name__ == "__main__":
    main()
