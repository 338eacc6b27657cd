"""Round-3 scale check: the 1M-atom (nx=ny=nz=64) LJ cluster workload
with the current fast paths, single chip. Round-2 recorded 33 M
updates/s flat from 131k; re-measure after the round-3 step/rebuild
work.

    python tools/r3_scale.py [nx] [ntimes]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import ClusterSimulation

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ntimes = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    p = Params(precision="sp", scheme="cluster", dense_thermo=False,
               nx=nx, ny=nx, nz=nx, ntimes=ntimes)
    sim = ClusterSimulation(p)
    out = sim.run()
    mups = 1e-6 * sim.natoms * ntimes / out.total_time
    print(
        "scale natoms=%d ntimes=%d total=%.3f s -> %.1f M updates/s "
        "(temp[re]=%.6e)"
        % (sim.natoms, ntimes, out.total_time, mups,
           float(out.temps[p.reneigh_every - 1]))
    )


if __name__ == "__main__":
    main()
