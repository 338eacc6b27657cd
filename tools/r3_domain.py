"""Round-3 domain-engine run on the real chip (VERDICT r2 item 5):
compose shard_map + ppermute + the device force kernels on hardware
with a mesh of 1, assert trajectory parity vs the single-chip engines,
and record the glue overhead.

    python tools/r3_domain.py [verlet] [cluster]

The multi-chip program is the SAME program at any mesh size — running
it at ndev=1 on the real TPU proves the Mosaic-under-shard_map
composition executes outside the virtual-CPU rig.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run_verlet():
    from mdbench_tpu.config import Params
    from mdbench_tpu.engine import Simulation
    from mdbench_tpu.parallel.verlet_domain import DomainSimulation

    # kernel=auto: the per-device ROWLIST fast path + Pallas kernel
    # under shard_map — the composition this tool exists to prove
    mk = lambda: Params(nx=16, ny=16, nz=16, ntimes=40, reneigh_every=20,
                        precision="sp")
    dom = DomainSimulation(mk(), ndev=1)
    out = dom.run()
    single = Simulation(mk()).run()
    err = float(np.abs(np.asarray(out.temps) - np.asarray(single.temps)).max())
    rel = err / float(np.abs(np.asarray(single.temps)).max())
    natoms = dom.natoms
    mups_d = 1e-6 * natoms * 40 / out.total_time
    mups_s = 1e-6 * natoms * 40 / single.total_time
    glue = (
        100 * (out.total_time / single.total_time - 1)
        if single.total_time else 0.0
    )  # +N% = the domain program is N% SLOWER than the plain engine
    print(
        "verlet-domain ndev=1: %.1f M upd/s vs single %.1f (glue %+.0f%%), "
        "temp parity rel err %.2e" % (mups_d, mups_s, glue, rel)
    )
    assert rel < 2e-4, rel


def run_cluster():
    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import ClusterSimulation
    from mdbench_tpu.parallel.cluster_domain import ClusterDomainSimulation

    mk = lambda: Params(nx=16, ny=16, nz=16, ntimes=40, reneigh_every=20,
                        precision="sp")
    dom = ClusterDomainSimulation(mk(), ndev=1)
    out = dom.run()
    single = ClusterSimulation(mk()).run()
    err = float(np.abs(np.asarray(out.temps) - np.asarray(single.temps)).max())
    rel = err / float(np.abs(np.asarray(single.temps)).max())
    natoms = dom.natoms
    mups_d = 1e-6 * natoms * 40 / out.total_time
    mups_s = 1e-6 * natoms * 40 / single.total_time
    print(
        "cluster-domain ndev=1 (ilist kernel): %.1f M upd/s vs single "
        "%.1f, temp parity rel err %.2e"
        % (mups_d, mups_s, rel)
    )
    assert rel < 2e-4, rel


def run_eam():
    """EAM at mesh(1): the two-pass force + mid-force fp ppermute
    composed with Pallas under shard_map on hardware (cluster-domain
    EAM; the verlet-domain EAM is the planar twin of the same
    exchange)."""
    from mdbench_tpu.config import FF_EAM, Params
    from mdbench_tpu.engine_cluster import ClusterSimulation
    from mdbench_tpu.parallel.cluster_domain import ClusterDomainSimulation

    mk = lambda: Params(nx=12, ny=12, nz=12, ntimes=40, reneigh_every=20,
                        precision="sp", force_field=FF_EAM,
                        eam_file="/root/reference/data/Cu_u3.eam")
    dom = ClusterDomainSimulation(mk(), ndev=1)
    out = dom.run()
    single = ClusterSimulation(mk()).run()
    err = float(np.abs(np.asarray(out.temps) - np.asarray(single.temps)).max())
    rel = err / float(np.abs(np.asarray(single.temps)).max())
    natoms = dom.natoms
    mups_d = 1e-6 * natoms * 40 / out.total_time
    mups_s = 1e-6 * natoms * 40 / single.total_time
    print(
        "cluster-domain EAM ndev=1: %.1f M upd/s vs single %.1f, "
        "temp parity rel err %.2e" % (mups_d, mups_s, rel)
    )
    assert rel < 2e-4, rel


def main():
    which = sys.argv[1:] or ["verlet", "cluster", "eam"]
    for name in which:
        t0 = time.time()
        {"verlet": run_verlet, "cluster": run_cluster,
         "eam": run_eam}[name]()
        print("  (%s wall %.0f s incl. compiles)" % (name, time.time() - t0))


if __name__ == "__main__":
    main()
