"""Round-5 probe: decompose derive_ilists into its internal phases
(candidate gather, rsq+min math, compaction sort) and measure the
run-glue gap (bench total vs sum-of-phases) at the 131k workload.

    python tools/r5_probe.py [derive glue drift all]

Chained in-dispatch timing via tools.tpu_microbench.timeit.
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
    from mdbench_tpu.engine_cluster import GROUP, ClusterSimulation
    from mdbench_tpu.ops.cluster import attach_bucket_maps, derive_ilists

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
    print("CAPS list_cap=%d icap=%d npad=%d ishare=%d buckets=%s"
          % (sim.list_cap, sim.icap, npad, sim.ishare, sim.buckets))
    cl, pairs = st.clusters, st.pairs
    args = (cl.xc, cl.yc, cl.zc)
    L = pairs.jlist.shape[2]
    ng = pairs.jlist.shape[0]
    share = sim.ishare
    gs_units = GROUP // share
    chunk = 128
    cjn = cl.xc.shape[0] // 2
    cutsq = p.cutneigh * p.cutneigh

    if want("derive"):
        def ph_derive(xc, yc, zc):
            c = cl._replace(xc=xc, yc=yc, zc=zc)
            pr = derive_ilists(c, pairs, npad, GROUP, p.cutneigh,
                               sim.icap, share=share)
            return pr.ijlist

        print("derive_ilists total  : %.3f ms" % (timeit(ph_derive, *args) * 1e3))

        # (a) candidate gather + plane split only (same lax.map chunking)
        jl_all = pairs.jlist.reshape(ng, L)

        def ph_gather(xc, yc, zc):
            packed48 = jnp.concatenate(
                [xc.reshape(cjn, 16), yc.reshape(cjn, 16),
                 zc.reshape(cjn, 16)], axis=1)

            def cfn(g0):
                gi = g0 + jnp.arange(chunk, dtype=jnp.int32)
                gsafe = jnp.where(gi < ng, gi, 0)
                jl = jl_all[gsafe]
                rows = packed48[jl]  # (chunk, L, 48)
                pl3 = jnp.transpose(
                    rows.reshape(chunk, L, 3, 16), (0, 2, 1, 3)
                ).reshape(chunk, 3, L * 16)
                return pl3[:, :, 0]

            ngpad = ((ng + chunk - 1) // chunk) * chunk
            starts = jnp.arange(0, ngpad, chunk, dtype=jnp.int32)
            out = jax.lax.map(cfn, starts)
            return out

        print("  (a) cand gather    : %.3f ms" % (timeit(ph_gather, *args) * 1e3))

        # (b) gather + rsq + two-stage min + keep mask (no sort)
        xi_all = cl.xc[:npad].reshape(ng, GROUP * 8)
        yi_all = cl.yc[:npad].reshape(ng, GROUP * 8)
        zi_all = cl.zc[:npad].reshape(ng, GROUP * 8)
        nj_all = pairs.nj
        from mdbench_tpu.state import SENTINEL_COORD

        def ph_mind(xc, yc, zc):
            packed48 = jnp.concatenate(
                [xc.reshape(cjn, 16), yc.reshape(cjn, 16),
                 zc.reshape(cjn, 16)], axis=1)
            lpos = jnp.arange(L, dtype=jnp.int32)

            def cfn(g0):
                gi = g0 + jnp.arange(chunk, dtype=jnp.int32)
                gsafe = jnp.where(gi < ng, gi, 0)
                jl = jl_all[gsafe]
                rows = packed48[jl]
                pl3 = jnp.transpose(
                    rows.reshape(chunk, L, 3, 16), (0, 2, 1, 3)
                ).reshape(chunk, 3, 1, 1, L * 16)
                xj, yj, zj = pl3[:, 0], pl3[:, 1], pl3[:, 2]
                S_half = SENTINEL_COORD * 0.5

                def iplane(a_all):
                    a = a_all[gsafe]
                    a = jnp.where(jnp.abs(a) < S_half, a, -a)
                    return a.reshape(chunk, gs_units, share * 8, 1)

                dx = iplane(xi_all) - xj
                dy = iplane(yi_all) - yj
                dz = iplane(zi_all) - zj
                rsq = dx * dx + dy * dy + dz * dz
                mina = jnp.min(rsq, axis=2)
                mind = jnp.min(mina.reshape(chunk, gs_units, L, 16), axis=3)
                keep = (mind <= cutsq) & (
                    lpos[None, None, :] < nj_all[gsafe][:, None, None])
                return jnp.sum(keep, axis=2).astype(jnp.int32)

            ngpad = ((ng + chunk - 1) // chunk) * chunk
            starts = jnp.arange(0, ngpad, chunk, dtype=jnp.int32)
            return jax.lax.map(cfn, starts)

        print("  (b) gather+mind    : %.3f ms" % (timeit(ph_mind, *args) * 1e3))
        print("  => sort+pack = total - (b)")

        # attach_bucket_maps cost
        if sim.buckets is not None:
            def ph_attach(xc, yc, zc):
                pr = pairs._replace(nji=pairs.nji + (xc[0, 0] * 0).astype(jnp.int32))
                pr = attach_bucket_maps(pr, npad, share, cl.xc.shape[0],
                                        *sim.buckets)
                return pr.bcrows

            print("  attach_buckets     : %.3f ms"
                  % (timeit(ph_attach, *args) * 1e3))

    if want("glue"):
        # whole-run slope vs phase sum: run the full compiled program at
        # two lengths; the difference isolates per-interval cost
        for nt in (100, 200):
            run_fn = sim._make_run_fn(nt).lower(st).compile()
            w = run_fn(sim.initial_state())
            fence(w[0].vxc)
            del w
            best = float("inf")
            for _ in range(2):
                s0 = sim.initial_state()
                jax.block_until_ready(s0)
                t0 = time.perf_counter()
                out = run_fn(s0)
                fence(out[0].vxc)
                best = min(best, time.perf_counter() - t0)
                del out
            print("RUN ntimes=%d        : %.1f ms" % (nt, best * 1e3))

    if want("drift"):
        # max per-atom displacement per 20-step interval on the melted
        # 131k workload (sets the seeded-rebuild delta margin)
        @jax.jit
        def probe(st0):
            def interval(carry, _):
                stx, _d = carry
                x0, y0, z0 = (stx.clusters.xc[:npad], stx.clusters.yc[:npad],
                              stx.clusters.zc[:npad])

                def body(s, _):
                    s, _tp = sim._plain_step(s, None)
                    return s, ()

                stx, _ = jax.lax.scan(body, stx, None, length=19)
                stx, _tp = sim._reneigh_step_cheap(stx)
                dx = stx.clusters.xc[:npad] - x0
                dy = stx.clusters.yc[:npad] - y0
                dz = stx.clusters.zc[:npad] - z0
                d2 = dx * dx + dy * dy + dz * dz
                # exclude wrap jumps (|d| ~ box) — wrap shifts whole
                # clusters by a box period; measure the 99.9% quantile
                # by masking those
                d2 = jnp.where(d2 > 4.0, 0.0, d2)
                return (stx, jnp.maximum(_d, jnp.sqrt(jnp.max(d2)))), jnp.sqrt(jnp.max(d2))

            (_stx, dmax), per = jax.lax.scan(
                interval, (st0, jnp.zeros((), st0.vxc.dtype)), None, length=10
            )
            return dmax, per

        dmax, per = probe(st)
        print("DRIFT max/interval   : %.3f  per-interval: %s"
              % (float(dmax), np.round(np.asarray(per), 3)))


if __name__ == "__main__":
    main()
