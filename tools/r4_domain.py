"""Round-4 domain-engine throughput at the FULL 131k benchmark box on
the real chip (VERDICT r3 item 5 'done' bar: mesh(1) within 15% of the
single-chip headline for both schemes, with the calibrated caps +
capacity-bucketed force ported to the domain engines).

    python tools/r4_domain.py [verlet] [cluster] [--nosingle] [--nt N]

--nosingle (round 5): skip the single-chip comparison run — the
single-chip engine costs a second full AOT compile + calibration on
the tunnel (~4 min), which blew the per-process measurement budget in
round 5. In this mode the domain trajectory is parity-gated against
the DP reference golden temperature trace (bench.GOLDEN_TEMP_131K, the
same oracle bench.py gates on) instead of a fresh single-chip run, and
the %%-of-single column uses a caller-supplied reference number
(--single-mups, default the current official bench.py headline).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run_one(scheme: str, nosingle: bool, nt: int, single_mups: float):
    from mdbench_tpu.config import Params

    mk = lambda: Params(precision="sp", dense_thermo=False, ntimes=nt)
    if scheme == "verlet":
        from mdbench_tpu.engine import Simulation
        from mdbench_tpu.parallel.verlet_domain import DomainSimulation

        dom = DomainSimulation(mk(), ndev=1)
        out = dom.run()
        single = None if nosingle else Simulation(mk()).run()
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
        single = None if nosingle else ClusterSimulation(mk()).run()
        caps = "icap=%d list_cap=%d buckets=%s" % (
            dom.icap, dom.list_cap, dom.buckets,
        )
    every = mk().reneigh_every
    td = np.asarray(out.temps)[every - 1 :: every]
    natoms = dom.natoms
    mups_d = 1e-6 * natoms * nt / out.total_time
    if single is not None:
        # bench params run dense_thermo=False: the single-chip engine
        # emits real temps only at reneighbor boundaries (zeros
        # between) while the domain engine computes thermo every step —
        # compare boundaries only
        ts = np.asarray(single.temps)[every - 1 :: every]
        rel = float(np.abs(td - ts).max()) / float(np.abs(ts).max())
        mups_s = 1e-6 * natoms * nt / single.total_time
        src = "single"
    else:
        # gate on the DP reference oracle instead (bench.py's trace);
        # SP-vs-DP tolerance ladder per bench.check_golden
        from bench import GOLDEN_TEMP_131K, check_golden

        check_golden(np.asarray(out.temps), every)
        rel = max(
            abs(float(td[s // every - 1]) - g) / abs(g)
            for s, g in GOLDEN_TEMP_131K.items()
            if s <= nt and s % every == 0
        )
        mups_s = single_mups
        src = "official-bench ref"
    print(
        "%s-domain ndev=1 @131k: %.1f M upd/s vs %s %.1f "
        "(%.0f%% of single), temp rel err %.2e\n  %s"
        % (scheme, mups_d, src, mups_s, 100 * mups_d / mups_s, rel, caps)
    )
    if single is not None:
        assert rel < 5e-3, rel


if __name__ == "__main__":
    args = sys.argv[1:]
    nosingle = "--nosingle" in args
    nt = int(args[args.index("--nt") + 1]) if "--nt" in args else 200
    single_mups = (
        float(args[args.index("--single-mups") + 1])
        if "--single-mups" in args
        else 59.5  # official bench.py headline, round 5
    )
    which = {a for a in args if not a.startswith("--")
             and not a.replace(".", "").isdigit()} or {"verlet", "cluster"}
    if "cluster" in which:
        run_one("cluster", nosingle, nt, single_mups)
    if "verlet" in which:
        run_one("verlet", nosingle, nt, single_mups)
