"""Round-3 phase probe: decompose the cheap rebuild and the plain step
at the 131k benchmark workload on the real chip.

    python tools/r3_probe.py [phase ...]

Phases: plain cheap pairs derive force repack all (default: all).
Every timed region is chained inside one dispatch (tunnel-safe) via
tools.tpu_microbench.timeit.
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

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import GROUP, ClusterSimulation
    from mdbench_tpu.ops.cluster import (
        bin_clusters, build_cluster_pairs, compute_bboxes, derive_ilists,
        make_j16_bboxes, setup_cluster_pbc, update_cluster_pbc,
    )

    which = set(sys.argv[1:]) or {"all"}

    def want(name):
        return "all" in which or name in which

    p = Params(precision="sp", dense_thermo=False)
    sim = ClusterSimulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st)
    if sim._calibrate_list_cap(st):
        st = sim.initial_state()
        jax.block_until_ready(st)
    npad = sim.n_clusters_pad
    cutsq = p.cutforce**2
    print("CAPS list_cap=%d icap=%d npad=%d buckets=%s ishare=%d"
          % (sim.list_cap, sim.icap, npad, sim.buckets, sim.ishare))
    cl, pairs = st.clusters, st.pairs

    args = (cl.xc, cl.yc, cl.zc)

    if want("plain"):
        # full plain step (scan-fused, includes carry glue)
        @jax.jit
        def plain_reps(st0):
            def body(stx, _):
                stx, _tp = sim._plain_step(stx, None)
                return stx, ()
            stx, _ = jax.lax.scan(body, st0, None, length=24)
            return stx.vxc

        fence(plain_reps(st))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fence(plain_reps(st))
            best = min(best, time.perf_counter() - t0)
        print("PLAIN step (scan)    : %.3f ms" % ((best - tunnel_rtt()) / 24 * 1e3))

        # force only (includes gather+planarize+kernel)
        def f_force(xc, yc, zc):
            return sim._force_from(
                cl._replace(xc=xc, yc=yc, zc=zc), pairs, st.halo
            )

        print("  force total        : %.3f ms" % (timeit(f_force, *args) * 1e3))

        # gather + planarize only (the ilist row fetch). Every bucket's
        # output feeds the probe result — a tail-only return lets XLA
        # DCE the other buckets and report fantasy numbers.
        from mdbench_tpu.ops.pallas.lj_cluster import gather_ilist_rows

        def _buckets_iter():
            if pairs.bijlist is not None:
                off = 0
                for n_k, c_k in zip(*sim.buckets):
                    if c_k > 0:  # zero_tier buckets run no kernel
                        yield pairs.bijlist[off:off + n_k, :c_k]
                    off += n_k
            else:
                yield pairs.ijlist

        def f_gather(xc, yc, zc):
            acc = 0.0
            for bl in _buckets_iter():
                acc = acc + gather_ilist_rows(xc, yc, zc, bl)[0, 0, 0]
            return acc

        print("  gather rows        : %.3f ms" % (timeit(f_gather, *args) * 1e3))

        def f_planar(xc, yc, zc):
            acc = 0.0
            for bl in _buckets_iter():
                rows = gather_ilist_rows(xc, yc, zc, bl)
                nu, icap = bl.shape
                W = icap * 16
                acc = acc + (
                    rows[:, :, 0:16].reshape(nu, W)
                    + rows[:, :, 16:32].reshape(nu, W)
                    + rows[:, :, 32:48].reshape(nu, W)
                )[0, 0]
            return acc

        print("  gather+planarize   : %.3f ms" % (timeit(f_planar, *args) * 1e3))

        if pairs.bcrows is not None:
            def f_xip(xc, yc, zc):
                return (xc[pairs.bcrows][0, 0] + yc[pairs.bcrows][0, 0]
                        + zc[pairs.bcrows][0, 0])

            print("  xiP gathers        : %.3f ms"
                  % (timeit(f_xip, *args) * 1e3))

            def f_binv(xc, yc, zc):
                inv = pairs.binv
                return (xc[:npad][inv][0, 0] + yc[:npad][inv][0, 0]
                        + zc[:npad][inv][0, 0])

            print("  binv out-gathers   : %.3f ms"
                  % (timeit(f_binv, *args) * 1e3))

        # integrate + ghost refresh only
        def f_intg(xc, yc, zc):
            c = cl._replace(
                xc=xc.at[:npad].add(1e-7),
                yc=yc.at[:npad].add(1e-7),
                zc=zc.at[:npad].add(1e-7),
            )
            c = update_cluster_pbc(c, st.halo, npad, False)
            return c.xc

        print("  integrate+ghost    : %.3f ms" % (timeit(f_intg, *args) * 1e3))

        # the scan WITHOUT the force kernel: everything else the body
        # does (v kicks, x drift DUS, ghost refresh, carry threading) —
        # the force stub keeps a data dependence so nothing DCEs
        dt, dtf = p.dt, sim.dtforce

        @jax.jit
        def glue_reps(st0):
            def body(mv, _):
                xc, yc, zc, vx, vy, vz, fx, fy, fz = mv
                vx = vx + dtf * fx
                vy = vy + dtf * fy
                vz = vz + dtf * fz
                xc = xc.at[:npad].add(dt * vx)
                yc = yc.at[:npad].add(dt * vy)
                zc = zc.at[:npad].add(dt * vz)
                c = cl._replace(xc=xc, yc=yc, zc=zc)
                c = update_cluster_pbc(c, st.halo, npad, False)
                fx = fx + 1e-30 * c.xc[:npad]
                fy = fy + 1e-30 * c.yc[:npad]
                fz = fz + 1e-30 * c.zc[:npad]
                vx = vx + dtf * fx
                vy = vy + dtf * fy
                vz = vz + dtf * fz
                return (c.xc, c.yc, c.zc, vx, vy, vz, fx, fy, fz), ()

            mv0 = (st0.clusters.xc, st0.clusters.yc, st0.clusters.zc,
                   st0.vxc, st0.vyc, st0.vzc, st0.fxc, st0.fyc, st0.fzc)
            mv, _ = jax.lax.scan(body, mv0, None, length=24)
            return mv[3]

        fence(glue_reps(st))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fence(glue_reps(st))
            best = min(best, time.perf_counter() - t0)
        print("  scan minus force   : %.3f ms" % ((best - tunnel_rtt()) / 24 * 1e3))

    if want("cheap"):
        @jax.jit
        def cheap_reps(st0):
            def body(stx, _):
                stx, _tp = sim._reneigh_step_cheap(stx)
                return stx._replace(overflow=st0.overflow), ()
            stx, _ = jax.lax.scan(body, st0, None, length=8)
            return stx.vxc

        fence(cheap_reps(st))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fence(cheap_reps(st))
            best = min(best, time.perf_counter() - t0)
        print("CHEAP rebuild step   : %.3f ms" % ((best - tunnel_rtt()) / 8 * 1e3))

        # sub-phases of the cheap rebuild, from current coords
        def ph_bbox_halo_bins(xc, yc, zc):
            c = cl._replace(xc=xc, yc=yc, zc=zc)
            bbox_l = compute_bboxes(xc[:npad], yc[:npad], zc[:npad])
            bbox = c.bbox.at[:npad].set(bbox_l)
            c = c._replace(bbox=bbox)
            h = setup_cluster_pbc(c, npad, npad, sim.ghost_cap, sim.prd,
                                  (1, 1, 1), p.cutneigh)
            c = update_cluster_pbc(c, h, npad, True)
            bb16 = make_j16_bboxes(c.bbox)
            cells, bbc, _ = bin_clusters(sim.grid, bb16)
            return cells

        print("  bbox+halo+bins     : %.3f ms"
              % (timeit(ph_bbox_halo_bins, *args) * 1e3))

    if want("pairs") or want("cheap"):
        bb16 = make_j16_bboxes(cl.bbox)
        cells, bbc, _ = bin_clusters(sim.grid, bb16)
        cells = jax.block_until_ready(cells)

        def ph_pairs(xc, yc, zc):
            c = cl._replace(xc=xc, yc=yc, zc=zc)
            pr = build_cluster_pairs(
                sim.grid, cells, bbc, c.bbox, npad, GROUP, sim.list_cap,
                need_ranges=not sim._ilist)
            return pr.jlist

        print("  build_pairs        : %.3f ms" % (timeit(ph_pairs, *args) * 1e3))

    if want("derive") or want("cheap"):
        def ph_derive(xc, yc, zc):
            c = cl._replace(xc=xc, yc=yc, zc=zc)
            pr = derive_ilists(c, pairs, npad, GROUP, p.cutneigh,
                               sim.icap, share=sim.ishare)
            return pr.ijlist

        print("  derive_ilists      : %.3f ms" % (timeit(ph_derive, *args) * 1e3))

    print("nj stats: mean=%.1f max=%d  nji mean=%.1f max=%d"
          % (float(jnp.mean(pairs.nj)), int(jnp.max(pairs.nj)),
             float(jnp.mean(pairs.nji)), int(jnp.max(pairs.nji))))


if __name__ == "__main__":
    main()
