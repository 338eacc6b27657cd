"""Round-4 cluster-domain plain-step decomposition at mesh(1), 131k, on
the chip: where do the ~3.5 ms/step of domain-vs-single overhead go?
Phases timed chained-in-dispatch under shard_map, exactly as the run
executes them.

    python tools/r4_dprobe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import timeit, tunnel_rtt  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from mdbench_tpu.config import Params
    from mdbench_tpu.ops.cluster import update_cluster_pbc
    from mdbench_tpu.parallel.cluster_domain import (
        AXIS,
        ClusterDomainSimulation,
    )

    dom = ClusterDomainSimulation(
        Params(precision="sp", dense_thermo=False, ntimes=200), ndev=1
    )
    dom._calibrate(200)
    spec = P(AXIS)
    mesh = dom.mesh

    def init_dev(x, v, nloc):
        x, v, nloc = x[0], v[0], nloc[0]
        cl, (vx, vy, vz), halo, maps, pairs, nloc2, _ovf = (
            dom._reneighbor_dev(x, v, nloc)
        )
        fx, fy, fz = dom._force_dev(cl, pairs, halo, maps)
        out = (cl, (vx, vy, vz), (fx, fy, fz), halo, maps, pairs,
               nloc2)
        return jax.tree_util.tree_map(lambda a: a[None], out)

    init = jax.jit(jax.shard_map(
        init_dev, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec, check_vma=False,
    ))
    cl, vel, frc, halo, maps, pairs, nloc = init(dom.x0, dom.v0, dom.n0)
    jax.block_until_ready(cl.xc)
    print("ncl_pad=%d nrows_cl=%d gcap_rows=%d xcap16=%d icap=%d "
          "list_cap=%d buckets=%s"
          % (dom.ncl_pad, dom.nrows_cl, dom.gcap_rows, dom.xcap16,
             dom.icap, dom.list_cap, dom.buckets))
    tunnel_rtt()

    def mk(fn_dev, n_extra):
        return jax.shard_map(
            fn_dev, mesh=mesh, in_specs=(spec,) * (1 + n_extra),
            out_specs=spec, check_vma=False,
        )

    # 1. force alone
    def d_force(xc, cl, pairs, halo, maps):
        cl = jax.tree_util.tree_map(lambda a: a[0], cl)
        pairs = jax.tree_util.tree_map(lambda a: a[0], pairs)
        halo = jax.tree_util.tree_map(lambda a: a[0], halo)
        maps = (maps[0][0], maps[1][0])
        cl = cl._replace(xc=xc[0])
        fx, fy, fz = dom._force_dev(cl, pairs, halo, maps)
        return fx[None]

    f1 = mk(d_force, 4)
    print("force_dev     : %.3f ms" % (
        timeit(f1, cl.xc, cl, pairs, halo, maps) * 1e3))

    # 2. interior ghost refresh (update_cluster_pbc)
    def d_upd(xc, cl, halo):
        cl = jax.tree_util.tree_map(lambda a: a[0], cl)
        halo = jax.tree_util.tree_map(lambda a: a[0], halo)
        cl = cl._replace(xc=xc[0])
        cl = update_cluster_pbc(cl, halo, dom.ncl_pad, False)
        return cl.xc[None]

    f2 = mk(d_upd, 2)
    print("update_pbc    : %.3f ms" % (
        timeit(f2, cl.xc, cl, halo) * 1e3))

    # 3. x-border exchange (_exchange_rows)
    def d_exch(xc, cl, maps):
        cl = jax.tree_util.tree_map(lambda a: a[0], cl)
        maps = (maps[0][0], maps[1][0])
        cl = cl._replace(xc=xc[0])
        cl = dom._exchange_rows(cl, maps[0], maps[1], False)
        return cl.xc[None]

    f3 = mk(d_exch, 2)
    print("exchange_rows : %.3f ms" % (
        timeit(f3, cl.xc, cl, maps) * 1e3))

    # 4. one full plain step (as the scan body runs it)
    dt, dtf = dom.params.dt, dom.dtforce

    def d_step(xc, cl, vel, frc, halo, maps, pairs):
        cl = jax.tree_util.tree_map(lambda a: a[0], cl)
        vel = jax.tree_util.tree_map(lambda a: a[0], vel)
        frc = jax.tree_util.tree_map(lambda a: a[0], frc)
        halo = jax.tree_util.tree_map(lambda a: a[0], halo)
        pairs = jax.tree_util.tree_map(lambda a: a[0], pairs)
        maps = (maps[0][0], maps[1][0])
        cl = cl._replace(xc=xc[0])
        vx, vy, vz = vel
        fx, fy, fz = frc
        vx = vx + dtf * fx
        vy = vy + dtf * fy
        vz = vz + dtf * fz
        xc2 = cl.xc.at[: dom.ncl_pad].add(dt * vx)
        yc2 = cl.yc.at[: dom.ncl_pad].add(dt * vy)
        zc2 = cl.zc.at[: dom.ncl_pad].add(dt * vz)
        cl = cl._replace(xc=xc2, yc=yc2, zc=zc2)
        cl = update_cluster_pbc(cl, halo, dom.ncl_pad, False)
        cl = dom._exchange_rows(cl, maps[0], maps[1], False)
        fx, fy, fz = dom._force_dev(cl, pairs, halo, maps)
        # force must feed the output or XLA dead-code-eliminates it
        return (cl.xc + 1e-30 * fx[0, 0])[None]

    f4 = mk(d_step, 6)
    print("plain step    : %.3f ms" % (
        timeit(f4, cl.xc, cl, vel, frc, halo, maps, pairs) * 1e3))

    # 4b. the composed 19-step scan, exactly as plain_scan builds it
    dense = dom.params.dense_thermo

    def d_scan19(xc, cl, vel, frc, halo, maps, pairs):
        cl0 = jax.tree_util.tree_map(lambda a: a[0], cl)
        vel = jax.tree_util.tree_map(lambda a: a[0], vel)
        frc = jax.tree_util.tree_map(lambda a: a[0], frc)
        halo = jax.tree_util.tree_map(lambda a: a[0], halo)
        pairs = jax.tree_util.tree_map(lambda a: a[0], pairs)
        maps = (maps[0][0], maps[1][0])
        cl0 = cl0._replace(xc=xc[0])

        def body(mv, _):
            xc, yc, zc, vx, vy, vz, fx, fy, fz = mv
            vx = vx + dtf * fx
            vy = vy + dtf * fy
            vz = vz + dtf * fz
            xc = xc.at[: dom.ncl_pad].add(dt * vx)
            yc = yc.at[: dom.ncl_pad].add(dt * vy)
            zc = zc.at[: dom.ncl_pad].add(dt * vz)
            c = cl0._replace(xc=xc, yc=yc, zc=zc)
            c = update_cluster_pbc(c, halo, dom.ncl_pad, False)
            c = dom._exchange_rows(c, maps[0], maps[1], False)
            fx, fy, fz = dom._force_dev(c, pairs, halo, maps)
            return (c.xc, c.yc, c.zc, vx, vy, vz, fx, fy, fz), ()

        mv0 = (cl0.xc, cl0.yc, cl0.zc, vel[0], vel[1], vel[2],
               frc[0], frc[1], frc[2])
        mv, _ = jax.lax.scan(body, mv0, None, length=19)
        return (mv[0] + 1e-30 * mv[6][0, 0])[None]

    f4b = mk(d_scan19, 6)
    import time as _t
    jf4b = jax.jit(f4b)
    r = jf4b(cl.xc, cl, vel, frc, halo, maps, pairs)
    jax.block_until_ready(r)
    float(jnp.ravel(r)[0])
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        float(jnp.ravel(
            jf4b(cl.xc, cl, vel, frc, halo, maps, pairs))[0])
        best = min(best, _t.perf_counter() - t0)
    print("19-step scan  : %.3f ms (%.3f ms/step)"
          % (best * 1e3, best / 19 * 1e3))

    # 4c. flatten (the reneigh_step's cluster->atom regather)
    def d_flat(xc, cl, vel):
        cl = jax.tree_util.tree_map(lambda a: a[0], cl)
        vel = jax.tree_util.tree_map(lambda a: a[0], vel)
        cl = cl._replace(xc=xc[0])
        x_flat, v_flat = dom._flatten_dev(cl, *vel)
        return (xc[0] + 1e-30 * x_flat[0, 0])[None]

    f4c = mk(d_flat, 2)
    print("flatten       : %.3f ms" % (
        timeit(f4c, cl.xc, cl, vel) * 1e3))

    # 5. reneighbor
    def d_ren(x, v, nloc):
        x, v, nloc = x[0], v[0], nloc[0]
        cl, _v3, halo, maps, pairs, nloc2, _ovf = (
            dom._reneighbor_dev(x, v, nloc)
        )
        return cl.xc[None]

    f5 = mk(d_ren, 2)
    print("reneighbor    : %.3f ms" % (
        timeit(f5, dom.x0, dom.v0, dom.n0) * 1e3))


if __name__ == "__main__":
    main()
