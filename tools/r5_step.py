"""Round-5 IN-CONTEXT plain-step decomposition: scan N real steps per
variant inside one jit (exactly the run program's shape — no chained
timeit, whose arg-invariant hoisting undercounted the step by ~0.4 ms),
fence, time the second call. The 100-vs-200-step RUN slope measured the
true in-program step at ~1.86 ms avg incl. rebuilds; this localizes it.

    python tools/r5_step.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import ClusterSimulation
    from mdbench_tpu.ops.cluster import update_cluster_pbc

    p = Params(precision="sp", dense_thermo=False)
    sim = ClusterSimulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st)
    if sim._calibrate_list_cap(st):
        st = sim.initial_state()
        jax.block_until_ready(st)
    npad = sim.n_clusters_pad
    dt, dtf = p.dt, sim.dtforce
    N = 100

    def timed(name, mkbody, st0):
        """jit a scan of N iterations of body over the lean carry."""
        cl0 = st0.clusters
        halo, pairs = st0.halo, st0.pairs
        body = mkbody(cl0, halo, pairs)

        @jax.jit
        def prog(mv0):
            mv, _ = jax.lax.scan(body, mv0, None, length=N)
            return mv

        mv0 = (cl0.xc, cl0.yc, cl0.zc, st0.vxc, st0.vyc, st0.vzc,
               st0.fxc, st0.fyc, st0.fzc)
        out = prog(mv0)
        jax.block_until_ready(out)
        _ = float(out[0][0, 0])
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            out = prog(mv0)
            _ = float(out[0][0, 0])
            best = min(best, time.perf_counter() - t0)
        print("%-28s: %.3f ms/step" % (name, best / N * 1e3))
        return best / N

    # (a) the REAL lean body (mirror of _plain_scan's)
    def mk_real(cl0, halo, pairs):
        def body(mv, _):
            xc, yc, zc, vx, vy, vz, fx, fy, fz = mv
            vx = vx + dtf * fx
            vy = vy + dtf * fy
            vz = vz + dtf * fz
            xc = xc.at[:npad].add(dt * vx)
            yc = yc.at[:npad].add(dt * vy)
            zc = zc.at[:npad].add(dt * vz)
            cl = cl0._replace(xc=xc, yc=yc, zc=zc)
            cl = update_cluster_pbc(cl, halo, npad, False)
            fx, fy, fz = sim._force_from(cl, pairs, halo)
            vx = vx + dtf * fx
            vy = vy + dtf * fy
            vz = vz + dtf * fz
            return (cl.xc, cl.yc, cl.zc, vx, vy, vz, fx, fy, fz), ()
        return body

    # (b) minus update_cluster_pbc (ghosts stale — timing only)
    def mk_nopbc(cl0, halo, pairs):
        def body(mv, _):
            xc, yc, zc, vx, vy, vz, fx, fy, fz = mv
            vx = vx + dtf * fx
            vy = vy + dtf * fy
            vz = vz + dtf * fz
            xc = xc.at[:npad].add(dt * vx)
            yc = yc.at[:npad].add(dt * vy)
            zc = zc.at[:npad].add(dt * vz)
            cl = cl0._replace(xc=xc, yc=yc, zc=zc)
            fx, fy, fz = sim._force_from(cl, pairs, halo)
            vx = vx + dtf * fx
            vy = vy + dtf * fy
            vz = vz + dtf * fz
            return (cl.xc, cl.yc, cl.zc, vx, vy, vz, fx, fy, fz), ()
        return body

    # (c) minus the [:npad] dynamic-update-slices (full-array adds;
    # ghost rows get junk velocity increments — timing only)
    def mk_fulladd(cl0, halo, pairs):
        def body(mv, _):
            xc, yc, zc, vx, vy, vz, fx, fy, fz = mv
            vx = vx + dtf * fx
            vy = vy + dtf * fy
            vz = vz + dtf * fz
            xc = xc.at[:npad].add(dt * vx)
            yc = yc.at[:npad].add(dt * vy)
            zc = zc.at[:npad].add(dt * vz)
            cl = cl0._replace(xc=xc, yc=yc, zc=zc)
            cl = update_cluster_pbc(cl, halo, npad, False)
            fx, fy, fz = sim._force_from(cl, pairs, halo)
            return (cl.xc, cl.yc, cl.zc, vx, vy, vz, fx, fy, fz), ()
        return body

    # (d) force only (tiny data-dependent perturbation defeats CSE)
    def mk_force(cl0, halo, pairs):
        def body(mv, _):
            xc, yc, zc, vx, vy, vz, fx, fy, fz = mv
            xc = xc + 1e-30 * fx
            cl = cl0._replace(xc=xc, yc=yc, zc=zc)
            fx, fy, fz = sim._force_from(cl, pairs, halo)
            return (xc, yc, zc, vx, vy, vz, fx, fy, fz), ()
        return body

    # (e) force with identity bucket perms (upper bound on what killing
    # the bcrows/binv permutation gathers would save; iota gather is the
    # fast-gather floor)
    def mk_force_iperm(cl0, halo, pairs):
        iota = jnp.arange(pairs.bcrows.shape[0], dtype=pairs.bcrows.dtype)
        pairs2 = pairs._replace(bcrows=iota, binv=iota)

        def body(mv, _):
            xc, yc, zc, vx, vy, vz, fx, fy, fz = mv
            xc = xc + 1e-30 * fx
            cl = cl0._replace(xc=xc, yc=yc, zc=zc)
            fx, fy, fz = sim._force_from(cl, pairs2, halo)
            return (xc, yc, zc, vx, vy, vz, fx, fy, fz), ()
        return body

    a = timed("(a) real step", mk_real, st)
    b = timed("(b) - update_pbc", mk_nopbc, st)
    c = timed("(c) - final integrate", mk_fulladd, st)
    d = timed("(d) force only", mk_force, st)
    e = timed("(e) force, identity perms", mk_force_iperm, st)
    print("update_pbc in-context       : %.3f ms" % ((a - b) * 1e3))
    print("final-int in-context        : %.3f ms" % ((a - c) * 1e3))
    print("integrate+pbc glue          : %.3f ms" % ((a - d) * 1e3))
    print("perm gathers (<=)           : %.3f ms" % ((d - e) * 1e3))

    # rebuild in-context: scan 20 cheap reneighbor steps
    def mk_reneigh():
        @jax.jit
        def prog(st0):
            def body(s, _):
                s, _tp = sim._reneigh_step_cheap(s)
                return s, ()
            s, _ = jax.lax.scan(body, st0, None, length=20)
            return s

        return prog

    prog = mk_reneigh()
    out = prog(st)
    jax.block_until_ready(out)
    _ = float(out.clusters.xc[0, 0])
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        out = prog(st)
        _ = float(out.clusters.xc[0, 0])
        best = min(best, time.perf_counter() - t0)
    print("%-28s: %.3f ms" % ("cheap rebuild in-context", best / 20 * 1e3))


if __name__ == "__main__":
    main()
