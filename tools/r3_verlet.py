"""Round-3 verlet-scheme measurement on the real chip: the packed-row
fast path (kernel=rowlist) vs the planar oracle, at the 131k benchmark
workload.

    python tools/r3_verlet.py [variant ...]

Variants: rowlist xla eam (default: rowlist + eam). Prints headline
M updates/s plus force / rebuild phase decompositions (chained inside
one dispatch — tunnel-safe).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import fence, timeit, tunnel_rtt  # noqa: E402


def run_variant(name, overrides, probe_phases=True):
    import jax
    import numpy as np

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine import Simulation

    p = Params(precision="sp", scheme="verlet", dense_thermo=False,
               **overrides)
    sim = Simulation(p)
    out = sim.run()
    mups = 1e-6 * sim.nlocal * p.ntimes / out.total_time
    print(
        "%-10s natoms=%d ntimes=%d total=%.3f s  -> %.1f M updates/s"
        % (name, sim.nlocal, p.ntimes, out.total_time, mups)
    )
    re = p.reneigh_every
    print(
        "%-10s temp[re-bound]=%.6e  maxneighs=%d rcap=%d"
        % (name, float(out.temps[re - 1]), sim.caps.maxneighs, sim.rcap)
    )
    if name.startswith("eam"):
        from tools.r3_eamc import check_golden

        check_golden(name, out.temps)
    elif p.ntimes == 200:  # the default 131k LJ workload
        import bench

        try:
            bench.check_golden(out.temps, p.reneigh_every)
            print("%-10s golden gate: PASS" % name)
        except SystemExit as e:
            print("%-10s golden gate: FAIL (%s)" % (name, e))

    if not probe_phases:
        return

    # phase decomposition, chained in-dispatch
    st = sim.initial_state()
    jax.block_until_ready(st)

    def f_force(x):
        return sim._force(x, st.types, st.nlist, st.halo)

    print("%-10s force       : %.3f ms" % (name, timeit(f_force, st.x) * 1e3))

    def f_reneigh(x):
        xo, _t, _h, nl, _o = sim._reneighbor(x, st.v, st.types)
        n = nl.numneigh.shape[0]
        return xo[:n, 0] + nl.numneigh.astype(xo.dtype)

    print("%-10s reneighbor  : %.3f ms" % (name, timeit(f_reneigh, st.x) * 1e3))

    # rebuild sub-phases
    from mdbench_tpu.ops.cells import build_cells
    from mdbench_tpu.ops.pbc import setup_pbc, update_pbc
    from mdbench_tpu.ops.verlet import derive_rowlists_from_cells

    pp = sim.params
    caps = sim.caps

    def f_halo(x):
        h = setup_pbc(
            x, sim.nlocal, caps.nlocal_pad, caps.ghost, sim.prd,
            (pp.pbc_x, pp.pbc_y, pp.pbc_z), pp.cutneigh,
            sort_grid=sim.grid if sim._rowlist else None,
        )
        return update_pbc(x, h, caps.nlocal_pad)

    print("%-10s  halo+upd   : %.3f ms" % (name, timeit(f_halo, st.x) * 1e3))

    def f_cells(x):
        cl = build_cells(sim.grid, x)
        return (x[cl.cells[:, 0], 0].sum()
                + cl.bin_of.sum().astype(x.dtype)).reshape(1)

    print("%-10s  cells      : %.3f ms" % (name, timeit(f_cells, st.x) * 1e3))

    cl0 = build_cells(sim.grid, st.x)

    if sim._rowlist:

        def f_rows(x):
            rows, numrows, _nc, _o = derive_rowlists_from_cells(
                sim.grid, cl0, x, sim.nlocal, caps.nlocal_pad,
                sim.rcap, pp.cutneigh, brcap=sim.ubr,
                ucol=sim.ucl, zw=sim.zw, ccap=sim.ccap,
            )
            return x[: numrows.shape[0], 0] + numrows.astype(x.dtype)

        print(
            "%-10s  rowbuild   : %.3f ms"
            % (name, timeit(f_rows, st.x) * 1e3)
        )
        rows, numrows, _nc, _ = derive_rowlists_from_cells(
            sim.grid, cl0, st.x, sim.nlocal, caps.nlocal_pad,
            sim.rcap, pp.cutneigh, brcap=sim.ubr, ucol=sim.ucl, zw=sim.zw,
            ccap=sim.ccap,
        )
        nrh = np.asarray(numrows)
        print(
            "%-10s  numrows mean=%.1f max=%d (rcap %d ccap %d)"
            % (name, nrh.mean(), nrh.max(), sim.rcap, sim.ccap)
        )


def main():
    which = sys.argv[1:] or ["rowlist", "eam"]
    for name in which:
        if name == "rowlist":
            run_variant("rowlist", {"kernel": "rowlist"})
        elif name == "xla":
            run_variant("xla", {"kernel": "xla"})
        elif name in ("eam", "eam_poly"):
            from mdbench_tpu.config import FF_EAM

            run_variant(
                name,
                {
                    "force_field": FF_EAM,
                    "eam_file": "/root/reference/data/Cu_u3.eam",
                    "ntimes": 60,
                    # "eam" = per-pair spline gathers (issue-bound);
                    # "eam_poly" = gather-free polynomial evaluation
                    "eam_eval": "spline" if name == "eam" else "poly",
                },
            )
        else:
            raise SystemExit("unknown variant " + name)


if __name__ == "__main__":
    main()
