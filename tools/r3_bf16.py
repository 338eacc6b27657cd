"""Round-3 bf16 pair-math experiment (VERDICT r2 stretch item 10):
a self-contained twin of the ilist force kernel that runs the pair
tile in bfloat16 (dx/dy/dz computed in f32 first — the |xi-xj|
cancellation cannot survive bf16 — then converted; accumulation back
in f32). If bf16 VPU ops pack 2x on the (8, 256) tile, the kernel's
padded-pair cost roughly halves; the question is whether the golden
temperature gate still passes.

    python tools/r3_bf16.py            # force error + kernel timing A/B
    python tools/r3_bf16.py golden     # + full 131k golden-gated run

The kernel lives HERE, not in the library: unmeasured variants are
maintenance surface (round-2 lesson). Adopt into ops/pallas/lj_cluster
only if this measures faster AND the gate passes.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_microbench import timeit  # noqa: E402


def make_bf16_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mdbench_tpu.ops.pallas.lj_cluster import (
        ILIST_UNIT,
        gather_ilist_rows,
    )

    def _kernel(
        xj_ref, yj_ref, zj_ref, xi_ref, yi_ref, zi_ref,
        fx_ref, fy_ref, fz_ref, ax, ay, az,
        *, share, W, cutforcesq, sigma6, epsilon,
    ):
        b = jnp.bfloat16
        gb = ILIST_UNIT // share
        nf = W // 128
        sig_b = b(sigma6)
        e48 = b(48.0 * epsilon)
        for k in range(gb):
            xj = xj_ref[k : k + 1, :]
            yj = yj_ref[k : k + 1, :]
            zj = zj_ref[k : k + 1, :]
            for ic in range(share):
                i = k * share + ic
                xi = xi_ref[i, :].reshape(8, 1)
                yi = yi_ref[i, :].reshape(8, 1)
                zi = zi_ref[i, :].reshape(8, 1)
                # subtract in f32 (cancellation), then drop to bf16
                dx = (xi - xj).astype(b)
                dy = (yi - yj).astype(b)
                dz = (zi - zj).astype(b)
                rsq = dx * dx + dy * dy + dz * dz
                # v5e Mosaic rejects bf16 vector compares ("Target does
                # not support this comparison") — run the cutoff mask in
                # f32 on the upcast the reciprocal needs anyway
                rs32 = rsq.astype(jnp.float32)
                mask = (rs32 < cutforcesq) & (rs32 > 0.0)
                sr2 = pl.reciprocal(
                    jnp.where(mask, rs32, 1.0), approx=True
                ).astype(b)
                sr6 = sr2 * sr2 * sr2 * sig_b
                gf = jnp.where(
                    mask, e48 * sr6 * (sr6 - b(0.5)) * sr2, b(0.0)
                )
                px = (dx * gf).astype(jnp.float32)
                py = (dy * gf).astype(jnp.float32)
                pz = (dz * gf).astype(jnp.float32)
                fx = px[:, 0:128]
                fy = py[:, 0:128]
                fz = pz[:, 0:128]
                for f in range(1, nf):
                    fx = fx + px[:, f * 128 : (f + 1) * 128]
                    fy = fy + py[:, f * 128 : (f + 1) * 128]
                    fz = fz + pz[:, f * 128 : (f + 1) * 128]
                r0 = i * 8
                ax[r0 : r0 + 8, :] = fx
                ay[r0 : r0 + 8, :] = fy
                az[r0 : r0 + 8, :] = fz
        ones = jnp.ones((1, 128), ax.dtype)
        dn = (((1,), (1,)), ((), ()))
        row = pl.program_id(0) % 8
        fx_ref[0, row, :] = jax.lax.dot_general(
            ones, ax[:], dn, preferred_element_type=ax.dtype)[0]
        fy_ref[0, row, :] = jax.lax.dot_general(
            ones, ay[:], dn, preferred_element_type=ay.dtype)[0]
        fz_ref[0, row, :] = jax.lax.dot_general(
            ones, az[:], dn, preferred_element_type=az.dtype)[0]

    def force_bf16(xc, yc, zc, ijlist, n_clusters_pad, cutforcesq,
                   sigma6, epsilon, share=2, interpret=False):
        nu, icap = ijlist.shape
        W = icap * 16
        nb = n_clusters_pad // ILIST_UNIT
        gb = ILIST_UNIT // share
        dtype = xc.dtype
        rows = gather_ilist_rows(xc, yc, zc, ijlist)
        xjp = rows[:, :, 0:16].reshape(nu, W)
        yjp = rows[:, :, 16:32].reshape(nu, W)
        zjp = rows[:, :, 32:48].reshape(nu, W)
        kern = functools.partial(
            _kernel, share=share, W=W, cutforcesq=float(cutforcesq),
            sigma6=float(sigma6), epsilon=float(epsilon),
        )
        xj_block = pl.BlockSpec((gb, W), lambda bk: (bk, 0),
                                memory_space=pltpu.VMEM)
        xi_block = pl.BlockSpec((ILIST_UNIT, 8), lambda bk: (bk, 0),
                                memory_space=pltpu.VMEM)
        out_block = pl.BlockSpec((1, 8, 128), lambda bk: (bk // 8, 0, 0),
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[xj_block] * 3 + [xi_block] * 3,
            out_specs=[out_block] * 3,
            out_shape=[jax.ShapeDtypeStruct((nb // 8, 8, 128), dtype)] * 3,
            scratch_shapes=[pltpu.VMEM((128, 128), dtype)] * 3,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xjp, yjp, zjp, xc[:n_clusters_pad], yc[:n_clusters_pad],
          zc[:n_clusters_pad])
        fx, fy, fz = out
        return (fx.reshape(n_clusters_pad, 8),
                fy.reshape(n_clusters_pad, 8),
                fz.reshape(n_clusters_pad, 8))

    return force_bf16


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mdbench_tpu.config import Params
    from mdbench_tpu.engine_cluster import ClusterSimulation
    from mdbench_tpu.ops.pallas.lj_cluster import (
        lj_cluster_force_ilist_pallas,
        lj_cluster_force_xla_ilist,
    )

    force_bf16 = make_bf16_kernel()
    p = Params(precision="sp", dense_thermo=False)
    sim = ClusterSimulation(p)
    st = sim.initial_state()
    jax.block_until_ready(st)
    if sim._calibrate_list_cap(st):
        st = sim.initial_state()
        jax.block_until_ready(st)
    cl, pairs = st.clusters, st.pairs
    npad = sim.n_clusters_pad
    cutsq = p.cutforce**2
    share = sim.ishare
    print("icap=%d share=%d npad=%d" % (sim.icap, share, npad))

    # accuracy vs the f32 exact-list oracle
    ox, oy, oz = jax.jit(lambda: lj_cluster_force_xla_ilist(
        cl.xc, cl.yc, cl.zc, pairs.ijlist, npad, cutsq, p.sigma6,
        p.epsilon, share=share))()
    bx, by, bz = jax.jit(lambda: force_bf16(
        cl.xc, cl.yc, cl.zc, pairs.ijlist, npad, cutsq, p.sigma6,
        p.epsilon, share=share))()
    on = np.linalg.norm(
        np.stack([np.asarray(ox), np.asarray(oy), np.asarray(oz)], -1),
        axis=-1,
    )
    dn_ = np.linalg.norm(
        np.stack([np.asarray(bx - ox), np.asarray(by - oy),
                  np.asarray(bz - oz)], -1), axis=-1)
    scale = max(float(np.median(on[on > 0])), 1e-30)
    print("bf16 force err: max/typ %.3e  mean/typ %.3e"
          % (dn_.max() / scale, dn_.mean() / scale))

    # kernel timing A/B (gather included in both)
    t32 = timeit(lambda x: lj_cluster_force_ilist_pallas(
        x, cl.yc, cl.zc, pairs.ijlist, npad, cutsq, p.sigma6, p.epsilon,
        share=share, approx_rcp=True), cl.xc)
    tbf = timeit(lambda x: force_bf16(
        x, cl.yc, cl.zc, pairs.ijlist, npad, cutsq, p.sigma6, p.epsilon,
        share=share), cl.xc)
    print("force f32(approx-rcp): %.3f ms   bf16: %.3f ms"
          % (t32 * 1e3, tbf * 1e3))

    if "golden" in sys.argv[1:]:
        # full 131k run with the bf16 kernel monkey-patched in, through
        # the bench's golden temperature gate
        import mdbench_tpu.engine_cluster as ec

        orig = ec.lj_cluster_force_ilist_pallas

        def patched(xc, yc, zc, ijlist, n_pad, cutsq_, sig6, eps,
                    share=2, **kw):
            if kw.get("xi") is not None or kw.get("tc") is not None:
                return orig(xc, yc, zc, ijlist, n_pad, cutsq_, sig6,
                            eps, share=share, **kw)
            return force_bf16(xc, yc, zc, ijlist, n_pad, cutsq_, sig6,
                              eps, share=share)

        ec.lj_cluster_force_ilist_pallas = patched
        from bench import GOLDEN_TEMP_131K, check_golden

        p2 = Params(precision="sp", dense_thermo=False)
        sim2 = ClusterSimulation(p2)
        # flat lists so the patched (bucket-less) kernel runs everywhere
        # — run()'s calibration would RE-plan buckets (and the bucketed
        # xi= path would silently fall back to the f32 kernel), so
        # disable the planner itself, not just the current plan
        sim2.buckets = None
        sim2._plan_buckets = lambda nji: False
        out = sim2.run()
        mups = 1e-6 * sim2.natoms * p2.ntimes / out.total_time
        try:
            check_golden(out.temps, p2.reneigh_every)
            print("bf16 GOLDEN GATE: PASS   headline %.1f M upd/s" % mups)
        except SystemExit as e:
            print("bf16 GOLDEN GATE: FAIL — %s" % e)
        for s in (20, 100, 200):
            print("  step %d: temp %.6e (golden %.6e)"
                  % (s, out.temps[s - 1], GOLDEN_TEMP_131K[s]))


if __name__ == "__main__":
    main()
