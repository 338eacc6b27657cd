"""Round-3 verlet-step gap probe: r3_verlet measured force 2.7 ms and
rebuild 7.3 ms at 131k, but the composed run executes at 13.1 ms/step
— ~10 ms/step is unaccounted. This times every piece of the step AND
the composed scan units so the gap has a name.

    python tools/r3_vprobe.py

Pieces (chained in-dispatch, tunnel RTT subtracted): force, update_pbc
alone, setup_pbc alone, integrate pair, one full plain step, the
19-step inner scan, one interval (19 plain + reneighbor), and the
compiled full-run slope (ntimes 40 vs 200 wall clock).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import fence, timeit, tunnel_rtt  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine import Simulation
    from mdbench_tpu.ops.integrate import final_integrate, initial_integrate
    from mdbench_tpu.ops.pbc import setup_pbc, update_pbc

    p = Params(precision="sp", scheme="verlet", dense_thermo=False,
               kernel="rowlist")
    sim = Simulation(p)
    # trigger the same calibration path the benchmark run takes
    st = sim.initial_state()
    jax.block_until_ready(st)
    if sim._calibrate_rcap(st):
        st = sim.initial_state()
        jax.block_until_ready(st)
    caps, pp = sim.caps, sim.params
    print("rcap=%d ccap=%d maxneighs=%d ghostcap=%d buckets=%s"
          % (sim.rcap, sim.ccap, caps.maxneighs, caps.ghost,
             sim.rbuckets))
    tunnel_rtt()

    def f_force(x):
        return sim._force(x, st.types, st.nlist, st.halo)

    print("force          : %.3f ms" % (timeit(f_force, st.x) * 1e3))

    def f_upd(x):
        return update_pbc(x, st.halo, caps.nlocal_pad)

    print("update_pbc     : %.3f ms" % (timeit(f_upd, st.x) * 1e3))

    def f_setup(x):
        h = setup_pbc(
            x, sim.nlocal, caps.nlocal_pad, caps.ghost, sim.prd,
            (pp.pbc_x, pp.pbc_y, pp.pbc_z), pp.cutneigh,
            sort_grid=sim.grid if sim._rowlist else None,
        )
        return h.border_map.astype(x.dtype) + x[0, 0]

    print("setup_pbc      : %.3f ms" % (timeit(f_setup, st.x) * 1e3))

    dt, dtf, nl = pp.dt, sim.dtforce, sim.nlocal

    def f_integ(x):
        x2, v2 = initial_integrate(x, st.v, st.f, dt, dtf, nl)
        v3 = final_integrate(v2, st.f, dtf, nl)
        return x2 + 1e-30 * v3.sum()

    print("integrate pair : %.3f ms" % (timeit(f_integ, st.x) * 1e3))

    def f_step(x):
        x2, v2 = initial_integrate(x, st.v, st.f, dt, dtf, nl)
        x2 = update_pbc(x2, st.halo, caps.nlocal_pad)
        f = sim._force(x2, st.types, st.nlist, st.halo)
        v3 = final_integrate(v2, f, dtf, nl)
        return x2 + 1e-30 * v3.sum()

    print("one plain step : %.3f ms" % (timeit(f_step, st.x) * 1e3))

    # the composed units, exactly as _make_run_fn builds them: carry
    # (x, v, f), lists closed over
    def f_scan19(x):
        def body(mv, _):
            xx, vv, ff = mv
            xx, vv = initial_integrate(xx, vv, ff, dt, dtf, nl)
            xx = update_pbc(xx, st.halo, caps.nlocal_pad)
            ff = sim._force(xx, st.types, st.nlist, st.halo)
            vv = final_integrate(vv, ff, dtf, nl)
            return (xx, vv, ff), ()

        (xo, vo, fo), _ = jax.lax.scan(
            body, (x, st.v, st.f), None, length=19)
        return xo + 1e-30 * (vo + fo).sum()

    t19 = timeit(f_scan19, st.x, reps=4)
    print("19-step scan   : %.3f ms  (%.3f ms/step)"
          % (t19 * 1e3, t19 * 1e3 / 19))

    def f_reneigh(x):
        xo, _t, _h, nlist, _o = sim._reneighbor(x, st.v, st.types)
        n = nlist.numrows.shape[0] if sim._rowlist else \
            nlist.numneigh.shape[0]
        cnt = nlist.numrows if sim._rowlist else nlist.numneigh
        return xo[:n, 0] + cnt.astype(xo.dtype)

    print("reneighbor     : %.3f ms" % (timeit(f_reneigh, st.x) * 1e3))

    # compiled full-run slope: fixed overhead vs per-step cost
    wall = {}
    for nt in (40, 200):
        run_fn = sim._make_run_fn(nt)
        flags = jnp.asarray(np.arange(1, nt + 1) % pp.reneigh_every == 0)
        s0 = sim.initial_state()
        compiled = run_fn.lower(s0, flags).compile()
        warm = compiled(sim.initial_state(), flags)
        fence(warm[0].v)
        del warm
        s1 = sim.initial_state()
        jax.block_until_ready(s1)
        t0 = time.perf_counter()
        out = compiled(s1, flags)
        fence(out[0].v)
        wall[nt] = time.perf_counter() - t0
        print("full run n=%-3d : %.3f s  (%.3f ms/step)"
              % (nt, wall[nt], wall[nt] / nt * 1e3))
    slope = (wall[200] - wall[40]) / 160
    print("run slope      : %.3f ms/step (fixed %.1f ms)"
          % (slope * 1e3, (wall[40] - slope * 40) * 1e3))


if __name__ == "__main__":
    main()
