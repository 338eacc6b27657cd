"""Split derive_rowlists_from_cells (99.7 ms at 131k) into its stages
on the real chip: bin-rows table, candidate fetch + dedup (stage 3-4
lax.map), exact prune (stage 5 lax.map).

    python tools/r3_vrows.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import timeit, tunnel_rtt  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine import Simulation
    from mdbench_tpu.ops.cells import build_cells
    from mdbench_tpu.ops import verlet as V

    p = Params(precision="sp", dense_thermo=False)
    sim = Simulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st.x)
    sim._calibrate_melted(st)
    st = sim.initial_state()
    jax.block_until_ready(st.x)
    caps = sim.caps
    print("rcap=%d ccap=%d ucl=%d ubr=%d" % (sim.rcap, sim.ccap,
                                             sim.ucl, sim.ubr))
    print("TUNNEL rtt   : %.3f ms" % (tunnel_rtt() * 1e3))
    cl = jax.jit(lambda x: build_cells(sim.grid, x))(st.x)
    jax.block_until_ready(cl.cells)

    # instrument by re-running the function body in pieces: we copy the
    # staging structure via a stage argument threaded through a probe
    # wrapper added below (verlet._rowbuild_stages)
    for stage in ("binrows", "fetch", "gap", "sort1", "cand", "all"):
        def f(x, stage=stage):
            return V.derive_rowlists_from_cells(
                sim.grid, cl, x, sim.nlocal, caps.nlocal_pad, sim.rcap,
                p.cutneigh, brcap=sim.ubr, ucol=sim.ucl, zw=sim.zw,
                ccap=sim.ccap,
                _probe_stage=None if stage == "all" else stage,
            )

        print("%-8s : %.3f ms" % (stage, timeit(f, st.x) * 1e3))


if __name__ == "__main__":
    main()
