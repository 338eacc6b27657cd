"""Pallas single-pass kernels for cluster-scheme EAM — the TPU fast
path twin of ops/eam_cluster.eam_cluster_force_xla.

Same dataflow as the LJ exact-list kernel (ops/pallas/lj_cluster.
_kernel_ilist): per-step XLA row gathers repack the exact-list
coordinate (+fp for pass 2) rows into dense planar (NIC/share, icap*16)
tiles; each kernel streams them via BlockSpec with zero in-kernel
dynamic slices and computes every pair tile once. The EAM pair
functions are STATIC-coefficient Horner polynomials
(models/eam_tables.fit_eam_poly) — compile-time constants, zero
in-kernel table lookups. Between the passes, the per-atom frho spline
and the ghost-fp refresh run as (cheap) XLA ops.

The reference's clusterpair EAM is a dead stub (force_eam.c:20-37);
the two-pass structure mirrors verletlist/force_eam.c:20-231.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdbench_tpu.ops.eam import EamDevice, _grid_index
from mdbench_tpu.ops.eam import _horner as _horner_static
from mdbench_tpu.ops.eam_cluster import _fp_ghost_refresh
from mdbench_tpu.ops.pallas.lj_cluster import ILIST_UNIT


def _mapped_t(rsq, mask, mid, iscale):
    r = jnp.sqrt(jnp.where(mask, rsq, 1.0))
    return jnp.clip((r - mid) * iscale, -1.0, 1.0)


def _fold128(p, nf):
    out = p[:, 0:128]
    for f in range(1, nf):
        out = out + p[:, f * 128 : (f + 1) * 128]
    return out


def _kernel_eam_rho(
    xj_ref, yj_ref, zj_ref, xi_ref, yi_ref, zi_ref, rho_ref, acc,
    *, share: int, W: int, cutforcesq: float, dens_coefs,
    mid: float, iscale: float, j3d: bool = True,
):
    """Pass 1: per-atom embedding density. One (8, W) pair tile per
    i-cluster; dens(r) via static Horner; lane-fold + ones-dot
    contraction into a revolving (1, 8, 128) output block (the same
    output scheme as the LJ force kernel, one component)."""
    gb = ILIST_UNIT // share
    nf = W // 128
    for k in range(gb):
        if j3d:
            xj = xj_ref[0, k, :].reshape(1, W)
            yj = yj_ref[0, k, :].reshape(1, W)
            zj = zj_ref[0, k, :].reshape(1, W)
        else:
            xj = xj_ref[k : k + 1, :]
            yj = yj_ref[k : k + 1, :]
            zj = zj_ref[k : k + 1, :]
        for ic in range(share):
            i = k * share + ic
            xi = xi_ref[i, :].reshape(8, 1)
            yi = yi_ref[i, :].reshape(8, 1)
            zi = zi_ref[i, :].reshape(8, 1)
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            rsq = dx * dx + dy * dy + dz * dz
            mask = (rsq < cutforcesq) & (rsq > 0.0)
            t = _mapped_t(rsq, mask, mid, iscale)
            dens = jnp.where(mask, _horner_static(dens_coefs, t), 0.0)
            acc[i * 8 : i * 8 + 8, :] = _fold128(dens, nf)
    ones = jnp.ones((1, 128), acc.dtype)
    dn = (((1,), (1,)), ((), ()))
    row = pl.program_id(0) % 8
    rho_ref[0, row, :] = jax.lax.dot_general(
        ones, acc[:], dn, preferred_element_type=acc.dtype
    )[0]


def _kernel_eam_force(
    xj_ref, yj_ref, zj_ref, fpj_ref, xi_ref, yi_ref, zi_ref, fpi_ref,
    fx_ref, fy_ref, fz_ref, ax, ay, az,
    *, share: int, W: int, cutforcesq: float, g1_coefs, g2_coefs,
    mid: float, iscale: float, j3d: bool = True,
):
    """Pass 2: pair forces fpair = -((fp_i + fp_j) g1(r) + g2(r));
    distances, both Horner chains, and all three component
    accumulations in one pass per tile."""
    gb = ILIST_UNIT // share
    nf = W // 128
    for k in range(gb):
        if j3d:
            xj = xj_ref[0, k, :].reshape(1, W)
            yj = yj_ref[0, k, :].reshape(1, W)
            zj = zj_ref[0, k, :].reshape(1, W)
            fpj = fpj_ref[0, k, :].reshape(1, W)
        else:
            xj = xj_ref[k : k + 1, :]
            yj = yj_ref[k : k + 1, :]
            zj = zj_ref[k : k + 1, :]
            fpj = fpj_ref[k : k + 1, :]
        for ic in range(share):
            i = k * share + ic
            xi = xi_ref[i, :].reshape(8, 1)
            yi = yi_ref[i, :].reshape(8, 1)
            zi = zi_ref[i, :].reshape(8, 1)
            fpi = fpi_ref[i, :].reshape(8, 1)
            dx = xi - xj
            dy = yi - yj
            dz = zi - zj
            rsq = dx * dx + dy * dy + dz * dz
            mask = (rsq < cutforcesq) & (rsq > 0.0)
            t = _mapped_t(rsq, mask, mid, iscale)
            fpair = jnp.where(
                mask,
                -((fpi + fpj) * _horner_static(g1_coefs, t)
                  + _horner_static(g2_coefs, t)),
                0.0,
            )
            r0 = i * 8
            ax[r0 : r0 + 8, :] = _fold128(dx * fpair, nf)
            ay[r0 : r0 + 8, :] = _fold128(dy * fpair, nf)
            az[r0 : r0 + 8, :] = _fold128(dz * fpair, nf)
    ones = jnp.ones((1, 128), ax.dtype)
    dn = (((1,), (1,)), ((), ()))
    row = pl.program_id(0) % 8
    fx_ref[0, row, :] = jax.lax.dot_general(
        ones, ax[:], dn, preferred_element_type=ax.dtype
    )[0]
    fy_ref[0, row, :] = jax.lax.dot_general(
        ones, ay[:], dn, preferred_element_type=ay.dtype
    )[0]
    fz_ref[0, row, :] = jax.lax.dot_general(
        ones, az[:], dn, preferred_element_type=az.dtype
    )[0]


def _pass_call(kern, n_out, W, share, dtype, j_planes, i_planes,
               n_outputs, interpret):
    """One pallas_call of either pass: j_planes are planarized
    (n_units, W) gathered rows, i_planes are (n_out, 8) cluster-row
    planes. Returns n_outputs (n_out, 8) planes."""
    assert W % 128 == 0
    nb = n_out // ILIST_UNIT
    assert nb % 8 == 0 and nb * ILIST_UNIT == n_out
    gb = ILIST_UNIT // share
    # j-plane layout: 2-D (gb, W) blocks are the FAST form (measured
    # force 5.1 vs 8.3 ms at 131k — the 3-D in-kernel reads relayout)
    # but Mosaic requires gb % 8 == 0 for them; share=4 (gb=4) falls
    # back to 3-D (nb, gb, W) blocks whose trailing dims equal the
    # array's, which Mosaic accepts for any gb.
    j3d = gb % 8 != 0
    kern = functools.partial(kern, j3d=j3d)
    if j3d:
        xj_block = pl.BlockSpec(
            (1, gb, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        xj_block = pl.BlockSpec(
            (gb, W), lambda b: (b, 0), memory_space=pltpu.VMEM
        )
    xi_block = pl.BlockSpec(
        (ILIST_UNIT, 8), lambda b: (b, 0), memory_space=pltpu.VMEM
    )
    out_block = pl.BlockSpec(
        (1, 8, 128), lambda b: (b // 8, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[xj_block] * len(j_planes) + [xi_block] * len(i_planes),
        out_specs=[out_block] * n_outputs,
        out_shape=[
            jax.ShapeDtypeStruct((nb // 8, 8, 128), dtype)
            for _ in range(n_outputs)
        ],
        scratch_shapes=[
            pltpu.VMEM((128, 128), dtype) for _ in range(n_outputs)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*j_planes, *i_planes)
    return [o.reshape(n_out, 8) for o in out]


def _planarize(rows, icap, parts, gb):
    nu = rows.shape[0]
    W = icap * 16
    if gb % 8 == 0:  # fast 2-D layout (see _pass_call)
        return [
            rows[:, :, 16 * p : 16 * (p + 1)].reshape(nu, W)
            for p in range(parts)
        ]
    return [
        rows[:, :, 16 * p : 16 * (p + 1)].reshape(nu // gb, gb, W)
        for p in range(parts)
    ]


def eam_cluster_force_pallas(
    xc, yc, zc,  # (C_total, 8) coordinate planes
    ijlist,  # (NIC/share, icap) int32 — exact per-i-unit j16 ids
    border_map,  # (gcap16,) cluster halo owner map
    n_clusters_pad: int,
    cutforcesq: float,
    eam: EamDevice,
    poly,  # models.eam_tables.EamPoly
    share: int = 2,
    interpret: bool = False,
    fp_exchange=None,
    buckets=None,  # (sizes, caps) + bpairs -> capacity-bucketed passes
    bpairs=None,  # (bijlist, bcrows, binv) from attach_bucket_maps
):
    """Two (per-bucket) pallas_calls around the XLA frho + ghost-fp
    middle section. Returns (fx, fy, fz, fp_plane) — same contract as
    the XLA twin, including the fp_exchange override for multi-chip fp
    refresh.

    With buckets, both passes run nji-sorted units through
    capacity-matched kernels (the LJ _force_buckets scheme) — for EAM
    this double-dips: tighter caps cut BOTH the padded pair math AND
    the per-step row gathers, which EAM pays twice (48-wide coords,
    then 64-wide [x|y|z|fp])."""
    nu, icap = ijlist.shape
    assert ILIST_UNIT % share == 0
    dtype = xc.dtype
    cjn = xc.shape[0] // 2
    common = dict(
        share=share, cutforcesq=float(cutforcesq),
        mid=float(poly.mid), iscale=float(poly.iscale),
    )
    dens_coefs = tuple(float(c) for c in poly.dens)
    g1_coefs = tuple(float(c) for c in poly.g1)
    g2_coefs = tuple(float(c) for c in poly.g2)

    if buckets is not None:
        assert bpairs is not None
        sizes, caps = buckets
        bijlist, bcrows, binv = bpairs
        # one packed 24-wide permutation gather (narrow (n, 8) row
        # gathers are issue-bound-inefficient; r4 probe, see
        # engine_cluster._force_buckets)
        xiP3 = jnp.concatenate([xc, yc, zc], axis=1)[bcrows]
        xiP = (xiP3[:, 0:8], xiP3[:, 8:16], xiP3[:, 16:24])
    else:
        assert nu * share == n_clusters_pad
        sizes, caps = (nu,), (icap,)
        bijlist, binv = ijlist, None
        xiP = (xc[:n_clusters_pad], yc[:n_clusters_pad],
               zc[:n_clusters_pad])

    def run_pass(packed, parts, kern_fn, coef_kwargs, i_extra, n_outputs):
        """parts=3 coords (pass 1) or 4 incl fp (pass 2); i_extra maps
        a (rows, 8) plane to per-bucket i-side rows (fp_i for pass 2)."""
        outs = None
        off = 0
        for n_k, c_k in zip(sizes, caps):
            n_out = n_k * share
            if c_k == 0:
                # structurally-empty units (zero_tier): no kernel;
                # rho = 0 for padding units is exact (empty list)
                z = jnp.zeros((n_out, 8), dtype)
                res = [z] * n_outputs
                outs = res if outs is None else [
                    jnp.concatenate([a, b], axis=0)
                    for a, b in zip(outs, res)
                ]
                off += n_k
                continue
            W = c_k * 16
            r0, r1 = off * share, (off + n_k) * share
            ijl = bijlist[off : off + n_k, :c_k]
            rows = packed[ijl.reshape(-1)].reshape(n_k, c_k, 16 * parts)
            j_planes = _planarize(rows, c_k, parts, ILIST_UNIT // share)
            i_planes = [p[r0:r1] for p in xiP]
            if i_extra is not None:
                i_planes.append(i_extra[r0:r1])
            kern = functools.partial(
                kern_fn, W=W, **coef_kwargs, **common
            )
            res = _pass_call(
                kern, n_out, W, share, dtype, j_planes, i_planes,
                n_outputs, interpret,
            )
            outs = res if outs is None else [
                jnp.concatenate([a, b], axis=0) for a, b in zip(outs, res)
            ]
            off += n_k
        if binv is not None:
            if n_outputs > 1:
                # packed inverse-permutation gather (one wide row fetch
                # instead of n_outputs narrow ones)
                o3 = jnp.concatenate(outs, axis=1)[binv]
                outs = [
                    o3[:, 8 * k : 8 * (k + 1)] for k in range(n_outputs)
                ]
            else:
                outs = [o[binv] for o in outs]
        return outs

    # ---- pass 1: density ------------------------------------------------
    packed48 = jnp.concatenate(
        [xc.reshape(cjn, 16), yc.reshape(cjn, 16), zc.reshape(cjn, 16)],
        axis=1,
    )
    (rho,) = run_pass(
        packed48, 3, _kernel_eam_rho, dict(dens_coefs=dens_coefs),
        None, 1,
    )

    # ---- frho spline + ghost fp (XLA; per-atom, cheap) -------------------
    mf, pf = _grid_index(rho, eam.rdrho, eam.nrho)
    fs = eam.frho[mf]
    fp_local = (fs[..., 0] * pf + fs[..., 1]) * pf + fs[..., 2]
    fp_plane = jnp.zeros((xc.shape[0], 8), dtype)
    fp_plane = fp_plane.at[:n_clusters_pad].set(fp_local)
    if fp_exchange is None:
        fp_plane = _fp_ghost_refresh(fp_plane, border_map, n_clusters_pad)
    else:
        fp_plane = fp_exchange(fp_plane)

    # ---- pass 2: forces ([x|y|z|fp] 64-wide row gather) ------------------
    packed64 = jnp.concatenate(
        [packed48, fp_plane.reshape(cjn, 16)], axis=1
    )
    fpiP = fp_plane[bcrows] if buckets is not None else fp_local
    fx, fy, fz = run_pass(
        packed64, 4, _kernel_eam_force,
        dict(g1_coefs=g1_coefs, g2_coefs=g2_coefs), fpiP, 3,
    )
    return fx, fy, fz, fp_plane
