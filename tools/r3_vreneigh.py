"""Decompose the verlet rowlist reneighbor (70.7 ms at 131k) into its
phases on the real chip: wrap, resort, setup_pbc, ghost/update, cells,
direct row build, bucket maps. Chained in-dispatch (tunnel-safe).

    python tools/r3_vreneigh.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import timeit, tunnel_rtt  # noqa: E402


def main():
    import jax

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine import Simulation
    from mdbench_tpu.ops.cells import build_cells, sort_atoms_device
    from mdbench_tpu.ops.cluster import bucket_maps_core
    from mdbench_tpu.ops.integrate import wrap_into_box
    from mdbench_tpu.ops.pbc import ghost_types, setup_pbc, update_pbc
    from mdbench_tpu.ops.verlet import derive_rowlists_from_cells

    p = Params(precision="sp", dense_thermo=False)
    sim = Simulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st.x)
    sim._calibrate_melted(st)
    st = sim.initial_state()
    jax.block_until_ready(st.x)
    caps = sim.caps
    print("rcap=%d ccap=%d rbuckets=%s" % (sim.rcap, sim.ccap, sim.rbuckets))
    print("TUNNEL rtt   : %.3f ms" % (tunnel_rtt() * 1e3))

    def f_wrap(x):
        return wrap_into_box(x, sim.prd, sim.nlocal)

    print("wrap         : %.3f ms" % (timeit(f_wrap, st.x) * 1e3))

    def f_sort(x):
        x2, _v, _t = sort_atoms_device(sim.grid, x, st.v, st.types,
                                       sim.nlocal)
        return x2

    print("resort       : %.3f ms" % (timeit(f_sort, st.x) * 1e3))

    def f_setup(x):
        h = setup_pbc(x, sim.nlocal, caps.nlocal_pad, caps.ghost,
                      sim.prd, (1, 1, 1), p.cutneigh,
                      sort_grid=sim.grid)
        return h.border_map

    print("setup_pbc    : %.3f ms" % (timeit(f_setup, st.x) * 1e3))

    def f_ghost(x):
        t2 = ghost_types(st.types, st.halo, caps.nlocal_pad)
        x2 = update_pbc(x, st.halo, caps.nlocal_pad)
        return x2[0, 0] + t2[0]

    print("ghost+upd    : %.3f ms" % (timeit(f_ghost, st.x) * 1e3))

    def f_cells(x):
        return build_cells(sim.grid, x).cells

    print("cells        : %.3f ms" % (timeit(f_cells, st.x) * 1e3))

    cl = jax.jit(lambda x: build_cells(sim.grid, x))(st.x)
    jax.block_until_ready(cl.cells)

    def f_rows(x):
        rows, numrows, ncmax, rovf = derive_rowlists_from_cells(
            sim.grid, cl, x, sim.nlocal, caps.nlocal_pad, sim.rcap,
            p.cutneigh, brcap=sim.ubr, ucol=sim.ucl, zw=sim.zw, ccap=sim.ccap,
        )
        return rows

    print("row build    : %.3f ms" % (timeit(f_rows, st.x) * 1e3))

    if getattr(sim, "_rowbuild_ranges", False):
        from mdbench_tpu.ops.verlet import derive_rowlists_from_ranges

        def f_ranges(x):
            rows, numrows, ncmax, rovf = derive_rowlists_from_ranges(
                sim.grid, x, sim.nlocal, caps.nlocal_pad, caps.ghost,
                sim.rcap, p.cutneigh, ucol=sim.ucl, kcap=sim.ukr,
                ccap=sim.ccap,
            )
            return rows

        print("range build  : %.3f ms" % (timeit(f_ranges, st.x) * 1e3))

    if sim.rbuckets is not None:
        rows0 = st.nlist.rows
        nr0 = st.nlist.numrows

        def f_buckets(x):
            brows, bcrows, binv, bovf = bucket_maps_core(
                rows0, nr0, caps.nlocal_pad // 8, 2, x.shape[0] // 8,
                *sim.rbuckets,
            )
            return brows

        print("bucket maps  : %.3f ms" % (timeit(f_buckets, st.x) * 1e3))

    # the whole reneighbor closure as the engine runs it
    def f_full(x):
        x2, t2, h2, nl2, ovf = sim._reneighbor(x, st.v, st.types)
        return nl2.rows

    print("reneighbor   : %.3f ms" % (timeit(f_full, st.x) * 1e3))


if __name__ == "__main__":
    main()
