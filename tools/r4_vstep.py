"""Round-4 verlet PLAIN-STEP decomposition at the engine's REAL
benchmark configuration (melted-probe calibration + capacity buckets),
on the chip. r3_vprobe measured the un-melt-calibrated flat path; the
headline runs this one.

    python tools/r4_vstep.py
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
    from mdbench_tpu.ops.integrate import final_integrate, initial_integrate
    from mdbench_tpu.ops.pbc import update_pbc
    from mdbench_tpu.ops.verlet import compute_force_lj_rowlist

    p = Params(precision="sp", scheme="verlet", dense_thermo=False,
               kernel="rowlist")
    sim = Simulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st.x)
    sim._calibrate_melted(st)
    st = sim.initial_state()
    jax.block_until_ready(st.x)
    caps, pp = sim.caps, sim.params
    print("rcap=%d ccap=%d zw=%d buckets=%s"
          % (sim.rcap, sim.ccap, sim.zw, sim.rbuckets))
    print("TUNNEL rtt     : %.3f ms" % (tunnel_rtt() * 1e3))

    def f_force(x):
        return sim._force(x, st.types, st.nlist, st.halo)

    print("force bucketed : %.3f ms" % (timeit(f_force, st.x) * 1e3))

    def f_flat(x):
        return compute_force_lj_rowlist(
            x, st.nlist.rows, caps.nlocal_pad, sim.cutforcesq,
            pp.sigma6, pp.epsilon, backend="pallas",
            approx_rcp=pp.approx_rcp,
        )

    print("force flat     : %.3f ms" % (timeit(f_flat, st.x) * 1e3))

    def f_upd(x):
        return update_pbc(x, st.halo, caps.nlocal_pad)

    print("update_pbc     : %.3f ms" % (timeit(f_upd, st.x) * 1e3))

    dt, dtf, nl = pp.dt, sim.dtforce, sim.nlocal

    def f_step(x):
        x2, v2 = initial_integrate(x, st.v, st.f, dt, dtf, nl)
        x2 = update_pbc(x2, st.halo, caps.nlocal_pad)
        f = sim._force(x2, st.types, st.nlist, st.halo)
        v3 = final_integrate(v2, f, dtf, nl)
        return x2 + 1e-30 * v3.sum()

    print("one plain step : %.3f ms" % (timeit(f_step, st.x) * 1e3))

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

    import numpy as np
    nr = np.asarray(st.nlist.numrows)
    nreal = (sim.nlocal + 15) // 16
    print("numrows real units: mean %.1f p50 %d p90 %d max %d (cold)"
          % (nr[:nreal].mean(), int(np.percentile(nr[:nreal], 50)),
             int(np.percentile(nr[:nreal], 90)), nr[:nreal].max()))


if __name__ == "__main__":
    main()
