"""Headline benchmark: the reference's default workload — Cu-like FCC
32x32x32 cells = 131,072 atoms, LJ sigma=eps=1.0, 200 steps, cutoff 2.5,
skin 0.3, reneighbor every 20 (reference: parameter.c:27-50, README.md:60-62).

Metric: million atom-updates per second = 1e-6 * Natoms * ntimes / TOTAL
(reference: src/verletlist/main.c:337-338). Baseline: 500 M/s north-star
target on one v5e chip (BASELINE.md).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import ClusterSimulation

    # benchmark axis: SP + cluster scheme + Pallas kernel (the fast path;
    # DP/verlet is the parity axis)
    params = Params(precision="sp", scheme="cluster", dense_thermo=False)
    sim = ClusterSimulation(params)
    out = sim.run()
    mups = 1e-6 * sim.natoms * params.ntimes / out.total_time

    baseline = 500.0  # M atom-updates/s, BASELINE.md north star
    print(
        json.dumps(
            {
                "metric": "atom_updates_per_second",
                "value": round(mups * 1e6),
                "unit": "atom-updates/s",
                "vs_baseline": round(mups / baseline, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
