"""Round-4 domain-engine throughput at the FULL 131k benchmark box on
the real chip (VERDICT r3 item 5 'done' bar: mesh(1) within 15% of the
single-chip headline for both schemes, with the calibrated caps +
capacity-bucketed force ported to the domain engines).

    python tools/r4_domain.py [verlet] [cluster]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run_one(scheme: str):
    from mdbench_tpu.config import Params

    nt = 200
    mk = lambda: Params(precision="sp", dense_thermo=False, ntimes=nt)
    if scheme == "verlet":
        from mdbench_tpu.engine import Simulation
        from mdbench_tpu.parallel.verlet_domain import DomainSimulation

        dom = DomainSimulation(mk(), ndev=1)
        out = dom.run()
        single = Simulation(mk()).run()
        caps = "rcap=%d ccap=%d buckets=%s" % (
            dom.rcap, dom.ccap, dom.rbuckets,
        )
    else:
        from mdbench_tpu.engine_cluster import ClusterSimulation
        from mdbench_tpu.parallel.cluster_domain import (
            ClusterDomainSimulation,
        )

        dom = ClusterDomainSimulation(mk(), ndev=1)
        out = dom.run()
        single = ClusterSimulation(mk()).run()
        caps = "icap=%d list_cap=%d buckets=%s" % (
            dom.icap, dom.list_cap, dom.buckets,
        )
    # bench params run dense_thermo=False: the single-chip engine emits
    # real temps only at reneighbor boundaries (zeros between) while the
    # domain engine computes thermo every step — compare boundaries only
    every = mk().reneigh_every
    td = np.asarray(out.temps)[every - 1 :: every]
    ts = np.asarray(single.temps)[every - 1 :: every]
    rel = float(np.abs(td - ts).max()) / float(np.abs(ts).max())
    natoms = dom.natoms
    mups_d = 1e-6 * natoms * nt / out.total_time
    mups_s = 1e-6 * natoms * nt / single.total_time
    print(
        "%s-domain ndev=1 @131k: %.1f M upd/s vs single %.1f "
        "(%.0f%% of single), temp rel err %.2e\n  %s"
        % (scheme, mups_d, mups_s, 100 * mups_d / mups_s, rel, caps)
    )
    assert rel < 5e-3, rel


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"verlet", "cluster"}
    if "cluster" in which:
        run_one("cluster")
    if "verlet" in which:
        run_one("verlet")
