"""Decompose derive_rowlists_from_ranges (10.1 ms at 131k) on the chip:
start tables, candidate assembly (ranges + K-select), exact prune.
Also prints the candidate-count distribution (prune-bucketing input).

    python tools/r4_vranges.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import timeit, tunnel_rtt  # noqa: E402


def main():
    import jax
    import numpy as np

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine import Simulation
    from mdbench_tpu.ops.verlet import derive_rowlists_from_ranges

    p = Params(precision="sp", dense_thermo=False)
    sim = Simulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st.x)
    sim._calibrate_melted(st)
    st = sim.initial_state()
    jax.block_until_ready(st.x)
    caps = sim.caps
    print("rcap=%d ccap=%d ucl=%d ukr=%d ghost=%d"
          % (sim.rcap, sim.ccap, sim.ucl, sim.ukr, caps.ghost))
    tunnel_rtt()

    for stage in ("tables", "cand", "all"):
        def f(x, stage=stage):
            return derive_rowlists_from_ranges(
                sim.grid, x, sim.nlocal, caps.nlocal_pad, caps.ghost,
                sim.rcap, p.cutneigh, ucol=sim.ucl, kcap=sim.ukr,
                ccap=sim.ccap,
                _probe_stage=None if stage == "all" else stage,
            )[0]

        print("%-7s : %.3f ms" % (stage, timeit(f, st.x) * 1e3))

    rows, numrows, ncmax, ovf = jax.jit(
        lambda x: derive_rowlists_from_ranges(
            sim.grid, x, sim.nlocal, caps.nlocal_pad, caps.ghost,
            sim.rcap, p.cutneigh, ucol=sim.ucl, kcap=sim.ukr,
            ccap=sim.ccap, _probe_stage="cand",
        )
    )(st.x)
    tot = np.asarray(numrows)  # stage "cand": per-unit candidate count
    nreal = (sim.nlocal + 15) // 16
    print("cand counts (cold): mean %.1f p50 %d p90 %d max %d (ccap %d)"
          % (tot[:nreal].mean(), int(np.percentile(tot[:nreal], 50)),
             int(np.percentile(tot[:nreal], 90)), tot[:nreal].max(),
             sim.ccap))


if __name__ == "__main__":
    main()
